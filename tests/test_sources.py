"""JSON / JSONL sources land in the mandated corpus schema and feed the
same extraction pipeline (reference S1/S3 parity)."""

import json

import pytest

from json_time_series_extractor_ray.corpus import CORPUS_SCHEMA
from json_time_series_extractor_ray.pipelines.timeseries import extract_pipeline
from json_time_series_extractor_ray.sources.jsonfiles import (
    corpus_from_json_files,
    corpus_from_jsonl,
)

PAYLOADS = [
    {"time": "2024-01-01T00:00:00Z", "temp": 19.5, "ok": True},
    {"time": "2024-01-01T00:01:00Z", "temp": 20.5, "ok": False},
    {"time": "2024-01-01T00:02:00Z", "temp": 21.5, "note": "x"},
]


@pytest.fixture(scope="module")
def json_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("json_src")
    jsonl = d / "docs.jsonl"
    jsonl.write_text("\n".join(json.dumps(p, separators=(",", ":")) for p in PAYLOADS))
    for i, p in enumerate(PAYLOADS):
        (d / f"doc{i}.json").write_text(json.dumps(p, separators=(",", ":")))
    return d


def test_jsonl_source(ray_session, json_tree):
    ds = corpus_from_jsonl(str(json_tree / "docs.jsonl"))
    t = ds.take_all()
    assert len(t) == 3
    assert ds.schema().names == CORPUS_SCHEMA.names
    samples = extract_pipeline(ds, dict(recursive=True)).to_pandas()
    # 3 docs x 2 non-timestamp fields
    assert len(samples) == 6
    assert set(samples["series_key"]) == {"temp", "ok", "note"}


def test_json_files_source(ray_session, json_tree):
    paths = [str(json_tree / f"doc{i}.json") for i in range(3)]
    ds = corpus_from_json_files(paths)
    rows = ds.take_all()
    assert len(rows) == 3
    assert all(r["doc_id"].endswith(".json") for r in rows)
    samples = extract_pipeline(ds, dict(recursive=True)).to_pandas()
    assert len(samples) == 6


def test_sources_are_deterministic(ray_session, json_tree):
    a = corpus_from_jsonl(str(json_tree / "docs.jsonl")).to_pandas()
    b = corpus_from_jsonl(str(json_tree / "docs.jsonl")).to_pandas()
    a = a.sort_values("doc_id", ignore_index=True)
    b = b.sort_values("doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tok"].tolist() == b["n_tok"].tolist()
