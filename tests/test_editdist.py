"""Edit-distance similarity join: exact DP parity with DuckDB's
``levenshtein``, losslessness of the deletion-neighborhood blocking
(FastSS / SymSpell), and the scale guards."""

import random

import duckdb
import pandas as pd
import pytest

from json_time_series_extractor_ray.pipelines.editdist import (
    EDIT_DIST_MAX,
    MAX_BUCKET_NAMES,
    _deletion_variants,
    _emit_variants,
    _levenshtein,
    _verify_bucket,
    edit_distance_pairs,
)


def test_levenshtein_matches_duckdb():
    rng = random.Random(7)
    words = ["cold widget", "small widget", "blue rod", "", "a", "ab",
             "widget", "wídget", "rod blue"]
    for _ in range(200):
        n = rng.randint(0, 12)
        words.append("".join(rng.choice("abcde ") for _ in range(n)))
    con = duckdb.connect()
    for _ in range(400):
        a, b = rng.choice(words), rng.choice(words)
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


def test_deletion_blocking_is_lossless():
    """Any pair within distance d shares a <=d-deletion variant."""
    rng = random.Random(11)
    for _ in range(300):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
        b = list(a)
        # apply up to 2 random edits
        for _ in range(rng.randint(0, 2)):
            op = rng.choice("ids")
            pos = rng.randint(0, max(0, len(b) - 1))
            if op == "i":
                b.insert(pos, rng.choice("abc"))
            elif b:
                if op == "d":
                    del b[pos]
                else:
                    b[pos] = rng.choice("abc")
        b = "".join(b)
        d = _levenshtein(a, b)
        if d <= EDIT_DIST_MAX:
            assert _deletion_variants(a, EDIT_DIST_MAX) & \
                _deletion_variants(b, EDIT_DIST_MAX), (a, b, d)


def test_verify_bucket_exact_pairs():
    df = pd.DataFrame({
        "vhash": [1] * 4,
        "name": ["cold rod", "gold rod", "blue rod", "cold rod x"],
        "n_parts": [3, 1, 2, 5],
    })
    out = _verify_bucket(df, 2)
    pairs = set(zip(out["name_a"], out["name_b"], out["dist"]))
    assert ("cold rod", "gold rod", 1) in pairs
    assert ("cold rod", "cold rod x", 2) in pairs
    # blue<->cold is distance 4: excluded
    assert not any("blue rod" in (a, b) for a, b, _ in pairs
                   if {a, b} == {"blue rod", "cold rod"})
    assert out["n_parts_a"].dtype == "int64"


def test_long_name_guard():
    df = pd.DataFrame({"name": ["x" * 600], "n_parts": [1]})
    with pytest.raises(ValueError, match="MAX_NAME_LEN"):
        _emit_variants(df, 2)


def test_bucket_guard():
    df = pd.DataFrame({
        "vhash": [1] * (MAX_BUCKET_NAMES + 1),
        "name": [f"n{i}" for i in range(MAX_BUCKET_NAMES + 1)],
        "n_parts": [1] * (MAX_BUCKET_NAMES + 1),
    })
    with pytest.raises(ValueError, match="MAX_BUCKET_NAMES"):
        _verify_bucket(df, 2)


def test_pipeline_matches_bruteforce(ray_session):
    import ray

    rng = random.Random(3)
    vocab = ["cold", "gold", "bold", "blue", "blve", "rod", "rodz", "widget"]
    names = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(120)]
    ds = ray.data.from_pandas(pd.DataFrame({"p_name": names}))
    got = edit_distance_pairs(ds).to_pandas()
    got_pairs = {(r.name_a, r.name_b, r.dist, r.n_parts_a, r.n_parts_b)
                 for r in got.itertuples()}
    # brute force over distinct names
    from collections import Counter
    cnt = Counter(names)
    uniq = sorted(cnt)
    want = set()
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            dd = _levenshtein(uniq[i], uniq[j])
            if dd <= EDIT_DIST_MAX:
                want.add((uniq[i], uniq[j], dd, cnt[uniq[i]], cnt[uniq[j]]))
    assert got_pairs == want and len(want) > 0


def test_entity_clusters_transitive(ray_session):
    import pandas as pd
    import ray

    from json_time_series_extractor_ray.pipelines.editdist import (
        entity_clusters,
    )

    # chain: "aaaa" -1- "aaab" -1- "aabb": one transitive cluster even
    # though lev("aaaa","aabb") = 2 <= d links them directly too;
    # "zzzz" is a singleton
    names = ["aaaa", "aaab", "aabb", "aaaa", "zzzz"]
    ds = ray.data.from_pandas(pd.DataFrame({"p_name": names}))
    out = entity_clusters(ds).to_pandas().set_index("cluster_rep")
    assert len(out) == 2
    assert out.loc["aaaa", "n_names"] == 3
    assert out.loc["aaaa", "n_parts"] == 4  # "aaaa" appears twice
    assert out.loc["zzzz", "n_names"] == 1


def test_entity_clusters_edge_guard(ray_session):
    import pandas as pd
    import pytest
    import ray

    from json_time_series_extractor_ray.pipelines.editdist import (
        entity_clusters,
    )

    ds = ray.data.from_pandas(pd.DataFrame(
        {"p_name": [f"aa{i}" for i in range(10)]}))
    with pytest.raises(ValueError, match="near-pair edges"):
        entity_clusters(ds, max_edges=3)
