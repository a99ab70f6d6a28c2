"""Keyness (log-odds z): planted vocabulary shift between two sources."""

import numpy as np
import pandas as pd
import pytest

from json_time_series_extractor_ray.pipelines.keyness import (
    _top2_sources,
    source_keyness,
)


def _docs():
    # source A over-uses 'alpha', B over-uses 'beta'; 'common' is shared.
    rows = []
    for i in range(40):
        rows.append(("A", "alpha common " + ("alpha" if i % 2 else "zz")))
    for i in range(40):
        rows.append(("B", "beta common " + ("beta" if i % 2 else "zz")))
    rows.append(("C", "tiny third source"))  # must be ignored (not top-2)
    return pd.DataFrame(rows, columns=["source", "text"])


def test_top2_pick(ray_session):
    import ray

    ds = ray.data.from_pandas(_docs())
    assert _top2_sources(ds) == ("A", "B")


def test_keyness_directions(ray_session):
    import ray

    out = source_keyness(ray.data.from_pandas(_docs()), k=3).to_pandas()
    # with a tiny vocabulary a word may appear on BOTH leaning lists
    # (mirroring the SQL's UNION ALL) — collapse for the lookups
    by_word = out.drop_duplicates("word").set_index("word")
    assert by_word.loc["alpha", "lean"] == "A"
    assert by_word.loc["alpha", "z"] > 1
    assert by_word.loc["beta", "lean"] == "B"
    assert by_word.loc["beta", "z"] < -1
    # the third source's vocabulary never enters the comparison
    assert "tiny" not in by_word.index
    # shared word scores near zero relative to the planted markers
    if "common" in by_word.index:
        assert abs(by_word.loc["common", "z"]) < 0.5


def test_keyness_z_formula(ray_session):
    import ray

    out = source_keyness(ray.data.from_pandas(_docs()), k=3).to_pandas()
    r = out.set_index("word").loc["alpha"]
    y1, y2 = int(r["y1"]), int(r["y2"])
    n1 = 40 * 3  # every A doc has exactly 3 words
    n2 = 40 * 3
    delta = (np.log((y1 + 0.5) / (n1 - y1 + 0.5))
             - np.log((y2 + 0.5) / (n2 - y2 + 0.5)))
    var = (1 / (y1 + 0.5) + 1 / (n1 - y1 + 0.5)
           + 1 / (y2 + 0.5) + 1 / (n2 - y2 + 0.5))
    assert r["z"] == pytest.approx(delta / np.sqrt(var), abs=1e-6)


def test_single_source_raises(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({
        "source": ["only"], "text": ["x"]}))
    with pytest.raises(ValueError, match="two sources"):
        source_keyness(ds)


def test_burrows_delta_symmetric_styles(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import (
        burrows_delta,
    )

    # A and B share style; C over-uses 'zzz' heavily
    rows = []
    for i in range(30):
        rows.append(("A", "the quick fox jumps"))
        rows.append(("B", "the quick fox runs"))
        rows.append(("C", "zzz zzz zzz the"))
    df = pd.DataFrame(rows, columns=["source", "text"])
    out = burrows_delta(ray.data.from_pandas(df), top_n=6).to_pandas()
    d = {(r.source_a, r.source_b): r.delta for r in out.itertuples()}
    assert set(d) == {("A", "B"), ("A", "C"), ("B", "C")}
    # the odd-one-out is farther from both A and B than they are from
    # each other
    assert d[("A", "C")] > d[("A", "B")]
    assert d[("B", "C")] > d[("A", "B")]
    assert all(v >= 0 for v in d.values())


def test_source_ngram_overlap_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.containment import (
        source_ngram_overlap,
    )

    shared = "alpha beta gamma delta epsilon"          # one 5-gram
    rows = [("A", shared + " zeta"), ("B", shared + " eta"),
            ("C", "totally different words here now")]
    df = pd.DataFrame(rows, columns=["source", "text"])
    out = source_ngram_overlap(ray.data.from_pandas(df)).to_pandas()
    d = {(r.source_a, r.source_b): (r.shared_ngrams, r.jaccard)
         for r in out.itertuples()}
    # A and B share exactly the one leading 5-gram (their tails differ)
    assert d[("A", "B")][0] == 1
    assert d[("A", "B")][1] == pytest.approx(1 / 3, abs=1e-6)
    assert ("A", "C") not in d and ("B", "C") not in d  # zero overlap
