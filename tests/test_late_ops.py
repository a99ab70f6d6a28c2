"""Planted-shape tests for the late round-3 operators (each also has an
exact DuckDB oracle through the driver gate; these pin the semantics
with hand-computable inputs)."""

import numpy as np
import pandas as pd
import pytest


def _docs(rows):
    return pd.DataFrame(rows, columns=["source", "text"])


def test_hapax_rate_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import hapax_rate

    df = _docs([("A", "a a b c"), ("A", "c d")])
    # A: counts a=2, b=1, c=2, d=1 -> vocab 4, hapax 2, tokens 6
    out = hapax_rate(ray.data.from_pandas(df)).to_pandas()
    r = out.set_index("source").loc["A"]
    assert r["vocab"] == 4 and r["hapax"] == 2 and r["tokens"] == 6
    assert r["hapax_share"] == 0.5
    assert r["ttr"] == pytest.approx(4 / 6, abs=1e-6)


def test_zipf_slope_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import zipf_slope

    # true Zipf: count = 48 / rank -> ln(c) = ln(48) - 1 * ln(rank),
    # so the fit is perfect with slope exactly -1
    words = (["w1"] * 48 + ["w2"] * 24 + ["w3"] * 16 + ["w4"] * 12)
    df = _docs([("S", " ".join(words))])
    out = zipf_slope(ray.data.from_pandas(df)).to_pandas()
    r = out.set_index("source").loc["S"]
    assert r["n_ranks"] == 4
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)
    assert r["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)


def test_token_budget_epochs(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.mixture import (
        token_budget_plan,
    )

    docs = pd.DataFrame({
        "source": ["big"] * 90 + ["small"] * 10,
        "n_chars": [100] * 90 + [100] * 10,
    })
    out = token_budget_plan(ray.data.from_pandas(docs),
                            budget=10_000).to_pandas().set_index("source")
    # temperature smoothing hands 'small' more than its 10% raw share
    assert out.loc["small", "weight"] > 0.1
    assert out["planned_tokens"].sum() == pytest.approx(10_000, rel=1e-3)
    # small has 1000 available tokens; its plan implies > 1 epoch
    assert out.loc["small", "epochs"] > 1.0


def test_vocab_topk_share_monotone(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import (
        vocab_topk_share,
    )

    words = ["x"] * 50 + ["y"] * 30 + [f"rare{i}" for i in range(20)]
    df = pd.DataFrame({"text": [" ".join(words)]})
    out = vocab_topk_share(ray.data.from_pandas(df),
                           ks=(1, 2, 10)).to_pandas().set_index("k")
    assert out.loc[1, "covered"] == 50
    assert out.loc[2, "covered"] == 80
    assert out.loc[10, "covered"] == 88  # +8 distinct rares
    assert (out["share"].diff().dropna() >= 0).all()


def test_silhouette_separated_clusters(ray_session):
    import pyarrow as pa
    import ray

    from json_time_series_extractor_ray.pipelines.similarity import (
        embedding_silhouette,
    )

    rng = np.random.default_rng(6)
    a = rng.normal(0, 0.1, size=(40, 8))
    b = rng.normal(5, 0.1, size=(40, 8))
    tbl = pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in np.vstack([a, b])],
            pa.list_(pa.float32())),
        "label": pa.array([0] * 40 + [1] * 40, pa.int32()),
    })
    out = embedding_silhouette(ray.data.from_arrow(tbl)).to_pandas()
    # far-apart tight clusters: silhouette near 1 for both labels
    assert (out["silhouette"] > 0.9).all()
    assert sorted(out["n_vectors"]) == [40, 40]


def test_longest_streak_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.ranktests import (
        longest_streak,
    )

    vals = [1, 9, 9, 9, 1, 9, 1, 1]  # median 5: streaks 3 and 1
    df = pd.DataFrame({
        "series_key": ["s"] * len(vals),
        "ts": pd.to_datetime(np.arange(len(vals), dtype=np.int64),
                             unit="s"),
        "doc_id": [f"d{i}" for i in range(len(vals))],
        "sample_ordinal": np.zeros(len(vals), dtype=np.int32),
        "value_num": np.asarray(vals, dtype=np.float64),
    })
    df["ts"] = df["ts"].astype("datetime64[ns]")
    out = longest_streak(ray.data.from_pandas(df)).to_pandas()
    assert out["longest_streak"].iloc[0] == 3


def test_wilson_interval_shape(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.windows import (
        funnel_wilson,
    )

    rows = []
    for i in range(100):
        rows.append((i, "view", i))
        if i < 30:
            rows.append((i, "click", i + 1000))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    out = funnel_wilson(ray.data.from_pandas(df))
    assert out["n_base"].iloc[0] == 100
    assert out["n_converted"].iloc[0] == 30
    assert out["rate"].iloc[0] == pytest.approx(0.3, abs=1e-6)
    lo, hi = out["wilson_lo"].iloc[0], out["wilson_hi"].iloc[0]
    assert 0 < lo < 0.3 < hi < 1
    # Wilson at n=100, p=0.3 is roughly [0.218, 0.397]
    assert lo == pytest.approx(0.218, abs=0.01)
    assert hi == pytest.approx(0.397, abs=0.01)


def test_abc_classes_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.relational import (
        _q_parts_abc,  # noqa: F401  (registered callable import sanity)
    )
    from json_time_series_extractor_ray.pipelines.registry import (
        extra_queries,
    )

    # run the registered callable on the fixtures: classes partition the
    # part set and revenue decreases A >= B >= C per part on average
    out = extra_queries()["parts_abc_classes"](
        "/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert set(df["abc_class"]) == {"A", "B", "C"}
    by = df.set_index("abc_class")
    assert by.loc["A", "revenue"] > by.loc["B", "revenue"] \
        > by.loc["C", "revenue"]
    # A holds ~80% of revenue by construction
    share_a = by.loc["A", "revenue"] / df["revenue"].sum()
    assert 0.75 < share_a <= 0.81


def test_vocab_gini_extremes(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import vocab_gini

    # uniform usage -> Gini 0; one dominant word -> high Gini
    df = _docs([
        ("flat", "a b c d"),                      # every count = 1
        ("skew", " ".join(["z"] * 97 + ["a", "b", "c"])),
    ])
    out = vocab_gini(ray.data.from_pandas(df)).to_pandas() \
        .set_index("source")
    assert out.loc["flat", "gini"] == 0.0
    # exact: counts (1,1,1,97), n=4, tot=100 ->
    # (-3*1 + -1*1 + 1*1 + 3*97) / 400 = 288/400 = 0.72
    assert out.loc["skew", "gini"] == pytest.approx(0.72, abs=1e-6)
    assert out.loc["skew", "vocab"] == 4
    assert out.loc["skew", "tokens"] == 100


def test_word_cond_entropy_deterministic_text(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.keyness import (
        word_conditional_entropy,
    )

    # fully deterministic bigrams: every word decides its successor
    # -> H(Y|X) = 0, perplexity 1
    det = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    out = word_conditional_entropy(ray.data.from_pandas(det))
    assert out["cond_entropy"].iloc[0] == 0.0
    assert out["perplexity"].iloc[0] == 1.0
    assert out["n_bigrams"].iloc[0] == 4  # 2 docs x 2 adjacencies

    # 'a' followed by b or c equally often -> H = ln(2)
    mixed = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a c"]})
    out2 = word_conditional_entropy(ray.data.from_pandas(mixed))
    assert out2["cond_entropy"].iloc[0] == pytest.approx(np.log(2),
                                                         abs=1e-6)


def test_lognormal_fit_recovers_parameters(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.registry import (
        extra_queries,
    )

    out = extra_queries()["orders_lognormal_fit"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # five priorities, all with sane lognormal params and medians
    assert len(df) == 5
    assert (df["sigma"] > 0).all()
    assert (df["median_price"] > 0).all()
    # median_price == exp(mu) rounded to cents
    for r in df.itertuples():
        assert r.median_price == pytest.approx(np.exp(r.mu), rel=1e-4)


def test_rank_stability_bounds(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.registry import (
        extra_queries,
    )

    out = extra_queries()["parts_rank_stability"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    rho = df["spearman_rho"].iloc[0]
    assert -1.0 <= rho <= 1.0
    assert df["n_parts"].iloc[0] > 0
