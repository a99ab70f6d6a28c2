"""Deterministic synthesis of the mandated tokenized-corpus table.

Physical schema (BASELINE.json ``input_hint``; FIXTURES.md F0):

    doc_id : string        unique, deterministic
    tokens : list<int32>   reversible tokenization of the JSON payload text
    n_tok  : int32         len(tokens)
    source : string        payload-shape / skew dimension

Two corpus families:

* :func:`render_iot_block` — seeded IoT-shaped payloads (FIXTURES.md F4/F5
  shape: device envelope + array of per-timestamp readings, nested
  timestamps, controlled gaps, Zipf-skewed hot devices).  Used by bench and
  the kernel-oracle tests.  Generation is block-deterministic: block ``b`` of
  a corpus seeded ``s`` is identical no matter which worker renders it, so
  corpus synthesis itself runs as a Ray Data pipeline
  (``ray.data.range(n_blocks).map_batches(...)``).
* :func:`events_to_corpus` — payloads derived 1:1 from the driver's
  ``events`` table, which makes the *full tokenized pipeline*
  (detokenize -> parse -> extract -> rollup) checkable against a DuckDB SQL
  oracle over the original table (see ``__ray_entry__.oracle_sql``).

Payloads are rendered as compact canonical JSON (no spaces) so raw-JSON-text
value parity holds end-to-end (see ``functions/rawtext.py``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .tokenizer import get_tokenizer

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

_COMPACT = {"separators": (",", ":"), "ensure_ascii": False}

# Base instant for synthetic timelines: 2024-01-01T00:00:00Z.
BASE_TS_NS = 1_704_067_200 * 10**9

IOT_DEFAULTS = dict(
    n_devices=256,          # distinct series envelopes
    readings_per_doc=4,     # array elements per payload (F4 shape)
    step_s=15,              # seconds between consecutive docs of one device
    gap_prob=0.05,          # probability a doc's slot is skipped (gap-fill fodder)
    zipf_a=1.3,             # device skew: low exponent = heavy hot keys
    block_size=8192,        # docs per deterministic render block
)


def _iso_utc(seconds: np.ndarray, micros: np.ndarray) -> list:
    """Vectorized-ish ISO rendering: 'YYYY-MM-DDTHH:MM:SS.ffffffZ'."""
    base = seconds.astype("datetime64[s]").astype("datetime64[us]") + micros.astype(
        "timedelta64[us]"
    )
    # numpy renders datetime64[us] exactly in this format (sans trailing Z)
    return [s + "Z" for s in np.datetime_as_string(base, unit="us")]


def render_iot_block(block_idx: int, seed: int = 42, cfg: dict | None = None):
    """Render one deterministic block of IoT payloads.

    Returns ``(doc_ids, payload_texts, sources)`` lists.  Determinism: the
    RNG is keyed by ``(seed, block_idx)`` only.
    """
    c = dict(IOT_DEFAULTS, **(cfg or {}))
    rng = np.random.default_rng([seed, block_idx])
    n = c["block_size"]
    start = block_idx * n

    # Zipf-skewed device choice (hot devices are low ids).
    devices = (np.random.default_rng([seed, block_idx, 1]).zipf(c["zipf_a"], size=n) - 1) % c[
        "n_devices"
    ]
    # Each doc advances its device's local clock deterministically from the
    # global doc index; gaps skip whole slots.
    slot = start + np.arange(n)
    gap_skip = rng.random(n) < c["gap_prob"]
    base_s = BASE_TS_NS // 10**9 + slot * c["step_s"] // max(1, c["n_devices"] // 8)
    micros = rng.integers(0, 1_000_000, size=n)
    doc_iso = _iso_utc(base_s, micros)

    readings = c["readings_per_doc"]
    temp = np.round(15 + 10 * rng.random((n, readings)), 2)
    hum = np.round(30 + 40 * rng.random((n, readings)), 2)
    r_offsets = rng.integers(1, 5_000_000, size=(n, readings))

    doc_ids = [f"doc-{seed}-{start + i:010d}" for i in range(n)]
    payloads = []
    sources = []
    for i in range(n):
        if gap_skip[i]:
            # A gap doc: device envelope with no readings array -> no samples
            # in the rollup windows this slot would have covered.
            payload = {
                "device": f"dev-{devices[i]:04d}",
                "time": doc_iso[i],
                "status": "idle",
            }
            sources.append("iot-gap")
        else:
            base_us = int(base_s[i]) * 1_000_000 + int(micros[i])
            data = []
            for r in range(readings):
                us = base_us + int(r_offsets[i][r])
                sec, mic = divmod(us, 1_000_000)
                iso = (
                    np.datetime_as_string(
                        np.datetime64(sec, "s").astype("datetime64[us]")
                        + np.timedelta64(mic, "us"),
                        unit="us",
                    )
                    + "Z"
                )
                data.append(
                    {"time": iso, "temperature": float(temp[i][r]), "humidity": float(hum[i][r])}
                )
            payload = {
                "device": f"dev-{devices[i]:04d}",
                "time": doc_iso[i],
                "data": data,
            }
            sources.append("iot")
        payloads.append(json.dumps(payload, **_COMPACT))
    return doc_ids, payloads, sources


def texts_to_corpus_table(doc_ids, texts, sources, tokenizer="utf8") -> pa.Table:
    """Tokenize payload texts into the mandated corpus schema (F0)."""
    tok = get_tokenizer(tokenizer)
    if tok.name == "utf8":
        # Vectorized: one big byte buffer + offsets.
        encoded = [t.encode("utf-8") for t in texts]
        lengths = np.fromiter((len(e) for e in encoded), dtype=np.int32, count=len(encoded))
        offsets = np.zeros(len(encoded) + 1, dtype=np.int32)
        np.cumsum(lengths, out=offsets[1:])
        values = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, pa.int32()))
    else:
        enc = [tok.encode(t) for t in texts]
        lengths = np.fromiter((len(e) for e in enc), dtype=np.int32, count=len(enc))
        tokens = pa.array(enc, pa.list_(pa.int32()))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths, pa.int32()),
            "source": pa.array(sources, pa.string()),
        },
        schema=CORPUS_SCHEMA,
    )


def iot_corpus_table(n_docs: int, seed: int = 42, cfg: dict | None = None,
                     tokenizer: str = "utf8") -> pa.Table:
    """Serial helper: render a whole IoT corpus in-process (tests, small runs)."""
    c = dict(IOT_DEFAULTS, **(cfg or {}))
    tables = []
    n_blocks = (n_docs + c["block_size"] - 1) // c["block_size"]
    for b in range(n_blocks):
        ids, texts, srcs = render_iot_block(b, seed=seed, cfg=cfg)
        take = min(c["block_size"], n_docs - b * c["block_size"])
        tables.append(
            texts_to_corpus_table(ids[:take], texts[:take], srcs[:take], tokenizer)
        )
    return pa.concat_tables(tables)


class RenderIotCorpus:
    """Ray ``map_batches`` stage: block indices in, corpus rows out.

    Used as ``ray.data.range(n_blocks).map_batches(RenderIotCorpus(seed, cfg),
    batch_size=1, batch_format="pyarrow")`` so corpus synthesis itself scales
    with the cluster; each block is identical no matter where it renders.
    """

    def __init__(self, seed: int = 42, cfg: dict | None = None, tokenizer: str = "utf8"):
        self.seed = seed
        self.cfg = cfg
        self.tokenizer = tokenizer

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for block_idx in batch.column("id").to_pylist():
            ids, texts, srcs = render_iot_block(int(block_idx), self.seed, self.cfg)
            out.append(texts_to_corpus_table(ids, texts, srcs, self.tokenizer))
        return pa.concat_tables(out)


def events_to_nested_corpus(batch: pa.Table, tokenizer="utf8") -> pa.Table:
    """Events -> payloads with a nested readings array (F4-ish shape):

    ``{"time": iso, "type": t, "data": [{"time": iso+1s, "v": value},
    {"time": iso+2s, "v": value*2}]}``

    Exercises array traversal + nested timestamps (reference M4/M5 +
    ``AllowNestedTimestamps``) on a payload whose extraction is still
    expressible in ANSI SQL over the original table.
    """
    ts = batch.column("ts").cast(pa.timestamp("us"))
    ts_np = ts.to_numpy()
    iso0 = [s + "Z" for s in np.datetime_as_string(ts_np, unit="us")]
    iso1 = [s + "Z" for s in np.datetime_as_string(ts_np + np.timedelta64(1, "s"), unit="us")]
    iso2 = [s + "Z" for s in np.datetime_as_string(ts_np + np.timedelta64(2, "s"), unit="us")]
    event_ids = batch.column("event_id").to_pylist()
    etypes = batch.column("event_type").to_pylist()
    values = batch.column("value").to_pylist()
    doc_ids = [f"evtn-{i:010d}" for i in event_ids]
    texts = [
        json.dumps(
            {
                "time": iso0[i],
                "type": etypes[i],
                "data": [
                    {"time": iso1[i], "v": values[i]},
                    {"time": iso2[i], "v": values[i] * 2},
                ],
            },
            **_COMPACT,
        )
        for i in range(len(event_ids))
    ]
    return texts_to_corpus_table(doc_ids, texts, ["events-nested"] * len(doc_ids), tokenizer)


def events_to_corpus(batch: pa.Table, tokenizer="utf8") -> pa.Table:
    """Derive corpus rows 1:1 from the driver's ``events`` table.

    Payload shape: ``{"time": iso-us, "type": ..., "user": ..., "value": ...,
    "props": {...}}`` — compact JSON whose extraction + rollup is expressible
    in ANSI SQL over the original table (the correctness bridge between the
    tokenized pipeline and the DuckDB oracle).
    """
    ts = batch.column("ts").cast(pa.timestamp("us"))
    iso = [s + "Z" for s in np.datetime_as_string(ts.to_numpy(), unit="us")]
    event_ids = batch.column("event_id").to_pylist()
    users = batch.column("user_id").to_pylist()
    etypes = batch.column("event_type").to_pylist()
    values = batch.column("value").to_pylist()
    props = batch.column("props").to_pylist()
    doc_ids = [f"evt-{i:010d}" for i in event_ids]
    texts = [
        json.dumps(
            {
                "time": iso[i],
                "type": etypes[i],
                "user": users[i],
                "value": values[i],
                "props": json.loads(props[i]),
            },
            **_COMPACT,
        )
        for i in range(len(event_ids))
    ]
    return texts_to_corpus_table(doc_ids, texts, ["events"] * len(doc_ids), tokenizer)


def events_to_corpus_nots(batch: pa.Table, tokenizer="utf8") -> pa.Table:
    """Corpus rows whose payloads carry NO ``/time`` property, plus an
    ``ingest_ts`` sidecar column — the shape that exercises the per-row
    deterministic fallback timestamp (``fallback_ts_column``, reference T3:
    ``GetDefaultTimestamp`` / ``DateTimeOffset.UtcNow`` at
    ``TimeSeriesExtractor.cs:458-463``, replaced by an injected ingest
    watermark for distributed determinism, SURVEY.md §7.3.5)."""
    event_ids = batch.column("event_id").to_pylist()
    users = batch.column("user_id").to_pylist()
    etypes = batch.column("event_type").to_pylist()
    values = batch.column("value").to_pylist()
    props = batch.column("props").to_pylist()
    doc_ids = [f"evtf-{i:010d}" for i in event_ids]
    texts = [
        json.dumps(
            {
                "type": etypes[i],
                "user": users[i],
                "value": values[i],
                "props": json.loads(props[i]),
            },
            **_COMPACT,
        )
        for i in range(len(event_ids))
    ]
    out = texts_to_corpus_table(doc_ids, texts, ["events"] * len(doc_ids), tokenizer)
    return out.append_column(
        "ingest_ts", batch.column("ts").cast(pa.timestamp("ns"))
    )


def events_to_corpus_sparse(batch: pa.Table, tokenizer="utf8") -> pa.Table:
    """Corpus rows where only EVEN ``event_id`` payloads carry a root
    ``site`` property (``"s<user_id % 4>"``) — the shape that exercises
    unresolved-template handling end-to-end (reference K6,
    ``JsonTimeSeriesExtractorTests.cs:672-705``): a ``{site}`` template
    placeholder resolves for half the corpus and, with
    ``allow_unresolved_template_replacements=False``, skips every sample
    of the other half."""
    ts = batch.column("ts").cast(pa.timestamp("us"))
    iso = [s + "Z" for s in np.datetime_as_string(ts.to_numpy(), unit="us")]
    event_ids = batch.column("event_id").to_pylist()
    users = batch.column("user_id").to_pylist()
    etypes = batch.column("event_type").to_pylist()
    values = batch.column("value").to_pylist()
    props = batch.column("props").to_pylist()
    doc_ids = [f"evts-{i:010d}" for i in event_ids]
    texts = []
    for i, eid in enumerate(event_ids):
        payload = {
            "time": iso[i],
            "type": etypes[i],
            "user": users[i],
            "value": values[i],
            "props": json.loads(props[i]),
        }
        if eid % 2 == 0:
            payload["site"] = f"s{users[i] % 4}"
        texts.append(json.dumps(payload, **_COMPACT))
    return texts_to_corpus_table(doc_ids, texts, ["events"] * len(doc_ids), tokenizer)


def events_to_corpus_unixsec(batch: pa.Table, tokenizer="utf8") -> pa.Table:
    """Corpus rows whose ``/time`` property is a unix-SECONDS integer —
    the shape that exercises the custom ``timestamp_parser`` hook end to
    end (reference T2: ``TimeSeriesExtractorOptions.TimestampParser``,
    ``JsonTimeSeriesExtractorTests.cs:743-776``): the default numeric
    rule would read the value as unix milliseconds, so only a
    user-supplied parser extracts the intended instants."""
    secs = (
        batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        .to_numpy() // 1_000_000
    )
    event_ids = batch.column("event_id").to_pylist()
    users = batch.column("user_id").to_pylist()
    etypes = batch.column("event_type").to_pylist()
    values = batch.column("value").to_pylist()
    props = batch.column("props").to_pylist()
    doc_ids = [f"evtu-{i:010d}" for i in event_ids]
    texts = [
        json.dumps(
            {
                "time": int(secs[i]),
                "type": etypes[i],
                "user": users[i],
                "value": values[i],
                "props": json.loads(props[i]),
            },
            **_COMPACT,
        )
        for i in range(len(event_ids))
    ]
    return texts_to_corpus_table(doc_ids, texts, ["events"] * len(doc_ids), tokenizer)
