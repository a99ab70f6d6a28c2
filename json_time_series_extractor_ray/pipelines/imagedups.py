"""Image near-duplicate detection: difference hash (dHash) over decoded
pixels.

The standard cheap perceptual near-dup signal: downsample the image to
a 9x8 luma grid, hash the SIGN of each horizontal gradient (64 bits).
Brightness shifts, re-encodes, and minor noise preserve most gradient
signs, so near-duplicate images collide.

EXACTNESS: luma and block statistics stay in INTEGER arithmetic — luma
is ``299r + 587g + 114b`` (no division), and "mean(left block) >
mean(right block)" is evaluated as the cross-multiplication
``sum_l * n_r > sum_r * n_l``.  A constant brightness offset ``+k``
adds exactly ``1000*k*n`` to each block sum, which cancels from both
sides of the cross-product, so the hash is PROVABLY invariant under
uniform brightness shifts (no float-ULP edge cases) — the property the
oracle pins.

Scale shape: decode + hash is an actor-pool ``map_batches`` over binary
payloads with payload-aware batch sizing (`multimodal.media_batch_size`);
only (media_id, 16-char hash) leaves the stage, so the ONE groupby
shuffles ~24 bytes per image regardless of payload size.

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated dedup + multimodal families.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.mediacodecs import decode_bmp, encode_bmp
from .multimodal import media_batch_size
from .registry import register

_LUMA = np.array([299, 587, 114], dtype=np.int64)

#: dHash grid: 9 columns x 8 rows of luma blocks -> 64 gradient bits.
_GRID_W, _GRID_H = 9, 8

#: Deterministic dup-image synthesis knobs (SQL-expressible grouping).
DUP_GROUPS = 16
DUP_SIDE = 32
DUP_SEED = 7


def dhash64(px: np.ndarray) -> str:
    """64-bit difference hash of an (H, W, 3) uint8 image, as 16 hex
    chars.  Integer-exact (see module docstring)."""
    h, w = px.shape[:2]
    if w < _GRID_W or h < _GRID_H:
        raise ValueError(
            f"dhash64 needs at least {_GRID_W}x{_GRID_H} pixels, got "
            f"{w}x{h}; resize tiny images up first (ResizeStage)"
        )
    lum = (px.astype(np.int64) * _LUMA).sum(axis=2)
    ce = np.floor(np.linspace(0, w, _GRID_W + 1)).astype(np.int64)
    re = np.floor(np.linspace(0, h, _GRID_H + 1)).astype(np.int64)
    colsum = np.add.reduceat(lum, ce[:-1], axis=1)
    block = np.add.reduceat(colsum, re[:-1], axis=0)      # 8 x 9 sums
    n = np.outer(np.diff(re), np.diff(ce))                # 8 x 9 sizes
    # mean_l > mean_r  <=>  sum_l * n_r > sum_r * n_l  (integer-exact)
    bits = (block[:, :-1] * n[:, 1:]) > (block[:, 1:] * n[:, :-1])
    return np.packbits(bits.ravel()).tobytes().hex()


class DHashStage:
    """Actor-pool stage: BMP payload -> (media_id, dhash).  Pure-Python
    decode state is trivial, but the class keeps the decode+hash hot
    path off per-batch setup like every other media stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            dhash64(decode_bmp(p))
            for p in batch.column("payload").to_pylist()
        ]
        return pa.table({
            "media_id": batch.column("media_id"),
            "dhash": pa.array(hashes, pa.string()),
        })


def image_dhash_clusters(media_ds, *, avg_payload_bytes: int = 1 << 20,
                         concurrency=(1, 4)):
    """Group images by dHash: one row per distinct hash with the
    representative (minimum) media id and the cluster size."""
    hashed = media_ds.map_batches(
        DHashStage,
        batch_size=media_batch_size(avg_payload_bytes),
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _cluster(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["media_id"].astype(np.int64)
        return pd.DataFrame({
            "rep_doc": pd.Series([ids.min()], dtype="int64"),
            "cluster_size": pd.Series([len(ids)], dtype="int64"),
        })

    return hashed.groupby("dhash").map_groups(_cluster,
                                              batch_format="pandas")


def synthesize_dup_image_table(doc_ids, *, n_groups: int = DUP_GROUPS,
                               side: int = DUP_SIDE,
                               seed: int = DUP_SEED) -> pa.Table:
    """Deterministic BMP rows with PLANTED duplicate clusters: even doc
    ids only; content depends ONLY on ``(doc_id // 2) % n_groups``, and
    every third member gets a uniform +8 brightness offset (pixels are
    synthesized in 0..239, so the offset never clips) — a near-dup the
    hash must treat as identical."""
    ids, payloads = [], []
    for doc_id in doc_ids:
        doc_id = int(doc_id)
        if doc_id % 2:
            continue
        gid = (doc_id // 2) % n_groups
        rng = np.random.default_rng([seed, gid])
        px = rng.integers(0, 240, size=(side, side, 3), dtype=np.uint8)
        if (doc_id // 2) % 3 == 0:
            px = px + np.uint8(8)
        ids.append(str(doc_id))
        payloads.append(encode_bmp(px))
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


def _q_image_dhash_dups(sf_dir: str):
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        return synthesize_dup_image_table(batch.column("doc_id").to_pylist())

    bmp_bytes = 54 + DUP_SIDE * DUP_SIDE * 3 + DUP_SIDE * (-3 * DUP_SIDE % 4)
    media = docs.map_batches(_synth, batch_format="pyarrow",
                             zero_copy_batch=True)
    return image_dhash_clusters(media, avg_payload_bytes=bmp_bytes,
                                concurrency=(1, 2))


register(
    "media_image_dhash_dups",
    _q_image_dhash_dups,
    f"""
    SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM documents
    WHERE doc_id % 2 = 0
    GROUP BY (doc_id // 2) % {DUP_GROUPS}
    """,
)
