"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with
typed metadata columns beside them — the Ray-side plumbing (schema, actor
signature, batch sizing, output layout) is real and tested; the actual
codec work is stubbed because no image/audio libraries exist in this
container:

* :class:`DecodeStage` raises ``NotImplementedError`` unless constructed
  with ``fake=True``, in which case it runs :func:`fake_decode` — a
  deterministic stand-in (payload bytes -> shape + checksum + a small
  feature vector) with the same signature a real decoder would have.
* Batch size guidance: large binary payloads need SMALL batches —
  ``media_batch_size(avg_bytes)`` targets ~64 MB per batch so
  batch x concurrency fits a worker heap.

Payload synthesis (:func:`synthesize_media_table`) builds a deterministic
media table from the ``documents`` table (payload = seeded bytes, length
from ``n_chars``) so the plumbing is testable without real media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .registry import register

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),          # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

TARGET_BATCH_BYTES = 64 * 1024 * 1024


def media_batch_size(avg_payload_bytes: int) -> int:
    """Rows per batch so one batch ~= TARGET_BATCH_BYTES of payload."""
    return max(1, TARGET_BATCH_BYTES // max(1, avg_payload_bytes))


def synthesize_media_table(doc_ids, sizes, kind: str = "image",
                           seed: int = 7) -> pa.Table:
    """Deterministic fake media rows (seeded payload bytes per doc)."""
    payloads = []
    for doc_id, size in zip(doc_ids, sizes):
        # blake2b, not hash(): Python string hashing is salted per process,
        # which would break cross-worker determinism.
        stable = int.from_bytes(
            hashlib.blake2b(str(doc_id).encode(), digest_size=4).digest(), "big"
        )
        rng = np.random.default_rng([seed, stable])
        payloads.append(rng.integers(0, 256, size=int(size), dtype=np.uint8).tobytes())
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array([str(d) for d in doc_ids], pa.string()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic decoder stand-in: pretends to decode, returns shape +
    checksum + an 8-dim feature vector derived from the payload bytes."""
    digest = hashlib.blake2b(payload, digest_size=16).digest()
    arr = np.frombuffer(payload[:4096], dtype=np.uint8).astype(np.float64)
    feats = np.array(
        [arr[i::8].mean() if len(arr) > i else 0.0 for i in range(8)]
    )
    side = int(np.sqrt(max(1, len(payload))))
    return {
        "checksum": digest.hex(),
        "width": side,
        "height": side,
        "n_bytes": len(payload),
        "features": feats,
    }


class DecodeStage:
    """Actor-pool decode/feature-extract stage for media batches.

    Real decoders (PIL / libsndfile / ffmpeg) are NOT available in this
    container: constructing with ``fake=False`` (the production signature)
    raises ``NotImplementedError`` at init — clearly marked stub — while
    ``fake=True`` runs the deterministic stand-in so every other part of
    the pipeline (schema, batches, actor lifecycle, output layout) is
    exercised for real.
    """

    def __init__(self, *, fake: bool = False, feature_dim: int = 8):
        if not fake:
            raise NotImplementedError(
                "Media decoding requires image/audio codecs not present in "
                "this environment; construct DecodeStage(fake=True) for the "
                "deterministic stand-in."
            )
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        checksums, widths, heights, nbytes, feats = [], [], [], [], []
        for payload, kind in zip(payloads, kinds):
            d = fake_decode(payload, kind)
            checksums.append(d["checksum"])
            widths.append(d["width"])
            heights.append(d["height"])
            nbytes.append(d["n_bytes"])
            feats.append(d["features"][: self.feature_dim])
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "checksum": pa.array(checksums, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def decode_media_dataset(media_ds, *, avg_payload_bytes: int = 1 << 20,
                         concurrency=(1, 4), fake: bool = True):
    """Attach the decode actor pool with payload-aware batch sizing."""
    return media_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs=dict(fake=fake),
        batch_size=media_batch_size(avg_payload_bytes),
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class ResizeStage:
    """Image-resize stage (actor pool): payload in, resized payload out.

    Real resizing needs an image codec (absent here): ``fake=False``
    raises at init; the fake path deterministically re-samples the payload
    bytes to the target pixel count so downstream schema/size behaviour is
    exercised for real (output payloads shrink/grow exactly as a resize
    would).
    """

    def __init__(self, width: int, height: int, *, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "Image resize requires codecs not present in this "
                "environment; construct ResizeStage(..., fake=True)."
            )
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        target = self.width * self.height
        out = []
        for payload in batch.column("payload").to_pylist():
            src = np.frombuffer(payload, dtype=np.uint8)
            if len(src) == 0:
                out.append(b"")
                continue
            idx = np.linspace(0, len(src) - 1, target).astype(np.int64)
            out.append(src[idx].tobytes())
        result = batch.drop_columns(["payload", "width", "height"])
        result = result.append_column("payload", pa.array(out, pa.large_binary()))
        result = result.append_column(
            "width", pa.array([self.width] * batch.num_rows, pa.int32())
        )
        return result.append_column(
            "height", pa.array([self.height] * batch.num_rows, pa.int32())
        )

# ---------------------------------------------------------------------------
# Driver-visible queries: media synthesized deterministically from the
# ``documents`` table (payload length = n_chars), decoded / frame-sampled
# through the real actor-pool stages.  The checksum + feature columns are
# non-SQL (blake2b) and pinned by tests; the metadata the decode derives
# (width/height = floor(sqrt(bytes)), frame byte counts) IS SQL-expressible,
# so those queries get exact DuckDB oracles.
# ---------------------------------------------------------------------------

_FRAMES, _EVERY_K = 8, 2


def _media_dataset(sf_dir: str):
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _synth(batch: pa.Table) -> pa.Table:
        return synthesize_media_table(
            batch.column("doc_id").to_pylist(),
            batch.column("n_chars").to_pylist(),
        )

    return docs.map_batches(_synth, batch_format="pyarrow", zero_copy_batch=True)


def _media_decode_meta(sf_dir: str):
    decoded = decode_media_dataset(
        _media_dataset(sf_dir), avg_payload_bytes=4096, concurrency=(1, 2)
    )
    return decoded.select_columns(["media_id", "kind", "width", "height", "n_bytes"])


def _media_frame_sample(sf_dir: str):
    import pyarrow.compute as pc

    frames = _media_dataset(sf_dir).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(n_frames=_FRAMES, every_k=_EVERY_K, fake=True),
        batch_size=media_batch_size(4096),
        concurrency=(1, 2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _lens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "frame_index": batch.column("frame_index"),
                "frame_bytes": pc.binary_length(batch.column("frame")),
            }
        )

    return frames.map_batches(_lens, batch_format="pyarrow", zero_copy_batch=True)


register(
    "media_decode_meta",
    _media_decode_meta,
    """
    SELECT CAST(doc_id AS VARCHAR) AS media_id, 'image' AS kind,
           CAST(floor(sqrt(GREATEST(n_chars, 1))) AS INTEGER) AS width,
           CAST(floor(sqrt(GREATEST(n_chars, 1))) AS INTEGER) AS height,
           n_chars AS n_bytes
    FROM documents
    """,
)

register(
    "media_frame_sample",
    _media_frame_sample,
    f"""
    WITH f AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               GREATEST(1, n_chars // {_FRAMES}) AS fsize, n_chars,
               unnest(generate_series(0, {_FRAMES - 1}, {_EVERY_K})) AS fi
        FROM documents
    )
    SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
           CAST(GREATEST(0, LEAST(fsize, n_chars - fi * fsize)) AS BIGINT)
               AS frame_bytes
    FROM f
    """,
)


class FrameSampleStage:
    """Video frame-sampling stage: one media row -> ``n_frames`` rows.

    The fake path slices the payload into equal-length "frames" and emits
    every k-th one — the real row-expansion plumbing (one input row fans
    out to N output rows with frame indexes) without a video codec.
    """

    def __init__(self, n_frames: int, every_k: int = 1, *, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "Frame sampling requires a video decoder; construct "
                "FrameSampleStage(..., fake=True)."
            )
        self.n_frames = n_frames
        self.every_k = max(1, every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames, indexes = [], [], [], []
        for media_id, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            size = max(1, len(payload) // self.n_frames)
            for fi in range(0, self.n_frames, self.every_k):
                ids.append(media_id)
                kinds.append(kind)
                indexes.append(fi)
                frames.append(payload[fi * size : (fi + 1) * size])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "frame_index": pa.array(indexes, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


_RESIZE_W, _RESIZE_H = 32, 16


def _media_resize_meta(sf_dir: str):
    """Resize plumbing through the driver gate: synthesized payloads run
    the real ``ResizeStage`` actor pool (fake resampler), and the derived
    metadata — fixed target dims, exact output byte count (W*H, empty
    payloads stay empty) — is SQL-expressible for the oracle."""
    import pyarrow.compute as pc

    resized = _media_dataset(sf_dir).map_batches(
        ResizeStage,
        fn_constructor_kwargs=dict(width=_RESIZE_W, height=_RESIZE_H,
                                   fake=True),
        batch_size=media_batch_size(4096),
        concurrency=(1, 2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _meta(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "out_bytes": pc.binary_length(batch.column("payload"))
                .cast(pa.int64()),
        })

    return resized.map_batches(_meta, batch_format="pyarrow",
                               zero_copy_batch=True)


register(
    "media_resize_meta",
    _media_resize_meta,
    f"""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST({_RESIZE_W} AS INTEGER) AS width,
           CAST({_RESIZE_H} AS INTEGER) AS height,
           CAST(CASE WHEN n_chars = 0 THEN 0
                     ELSE {_RESIZE_W * _RESIZE_H} END AS BIGINT) AS out_bytes
    FROM documents
    """,
)
