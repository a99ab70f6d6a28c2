"""Memory-calibration tests for the chunked pairwise-cosine kernel.

Round-3 verdict item 1: ``semdedup`` / ``embedding_near_dups`` used to
materialize the full ``n x n`` cosine matrix (320 GB at the 200k-vector
time bound) — the loud guard protected quadratic *time* but not the
memory that actually OOMed first.  ``cosine_pairs_chunked`` bounds peak
memory to a fixed strip size; these tests pin:

1. value/pair/order equality vs the unchunked reference expression, at a
   size where the unchunked path is feasible, across several strip sizes
   (including strips that don't divide n);
2. a 50k-vector single cluster processed inside a subprocess whose
   address space is hard-capped far below the 20 GB the unchunked matrix
   would need — planted near-dup pairs must come back exactly.
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

from json_time_series_extractor_ray.pipelines._util import round_half_away
from json_time_series_extractor_ray.pipelines.dedup import (
    PAIR_STRIP_BYTES,
    cosine_pairs_chunked,
)


def _normalize(E):
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    return E / np.where(norms == 0, 1.0, norms)


def _unchunked_reference(En, tau):
    S = round_half_away(En @ En.T, 6)
    a_idx, b_idx = np.triu_indices(len(En), k=1)
    keep = S[a_idx, b_idx] >= tau
    return a_idx[keep], b_idx[keep], S[a_idx, b_idx][keep]


@pytest.mark.parametrize("strip_bytes", [
    1 << 12,   # 4 KiB -> strip of 64 rows (floor), many strips
    200_000,   # strip that does not divide n
    PAIR_STRIP_BYTES,  # production default -> single strip at this n
])
def test_chunked_matches_unchunked(strip_bytes):
    rng = np.random.default_rng(41)
    n, d = 937, 24
    E = rng.normal(size=(n, d))
    # plant exact duplicates and near-duplicates so hits exist
    E[100] = E[7]
    E[512] = E[33] + rng.normal(scale=1e-3, size=d)
    En = _normalize(E)
    tau = 0.3
    a_ref, b_ref, s_ref = _unchunked_reference(En, tau)
    a, b, s = cosine_pairs_chunked(En, tau, strip_bytes=strip_bytes)
    assert a.tolist() == a_ref.tolist()
    assert b.tolist() == b_ref.tolist()
    # identical rounding discipline -> bit-equal values
    assert s.tolist() == s_ref.tolist()
    assert len(a) > 0  # the planted dups actually exercised the kernel


def test_chunked_empty_and_tiny():
    empty = cosine_pairs_chunked(np.empty((0, 8)), 0.5)
    assert all(len(x) == 0 for x in empty)
    one = cosine_pairs_chunked(np.ones((1, 8)) / np.sqrt(8), 0.5)
    assert all(len(x) == 0 for x in one)
    two = cosine_pairs_chunked(_normalize(np.ones((2, 8))), 0.5)
    assert two[0].tolist() == [0] and two[1].tolist() == [1]
    assert two[2].tolist() == [1.0]


_CAPPED_SCRIPT = textwrap.dedent("""
    import resource, sys
    import numpy as np
    # Hard-cap the address space at 4 GiB: the unchunked 50k x 50k float64
    # cosine matrix alone would need 20 GB and die here.
    resource.setrlimit(resource.RLIMIT_AS, (4 << 30, 4 << 30))
    sys.path.insert(0, "@REPO@")
    from json_time_series_extractor_ray.pipelines.dedup import (
        cosine_pairs_chunked)

    rng = np.random.default_rng(7)
    n, d = 50_000, 16
    E = rng.normal(size=(n, d))
    planted = [(123, 40_123), (9_999, 25_000), (0, 49_999)]
    for a, b in planted:
        E[b] = E[a]  # exact duplicate -> cosine 1.0
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    En = E / np.where(norms == 0, 1.0, norms)
    # tau high enough that random 16-dim pairs almost never hit, so the
    # output stays small while every row-strip still scans all columns.
    a_idx, b_idx, sim = cosine_pairs_chunked(En, 0.9999, strip_bytes=1 << 26)
    hit = {(int(a), int(b)): float(s)
           for a, b, s in zip(a_idx, b_idx, sim)}
    for pair in planted:
        assert pair in hit, "planted duplicate %r missing" % (pair,)
        assert hit[pair] == 1.0, (pair, hit[pair])
    print("OK", len(hit))
""")


def test_50k_single_cluster_under_memory_cap():
    """A 50k-vector cluster (the verdict's done-criterion) completes in a
    4 GiB-capped subprocess and returns the planted duplicates exactly."""
    import json_time_series_extractor_ray as pkg
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    script = _CAPPED_SCRIPT.replace("@REPO@", repo)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.startswith("OK")
