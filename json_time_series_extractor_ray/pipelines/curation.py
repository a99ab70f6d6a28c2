"""Flagship corpus-curation pipeline: the training-data operators composed
end-to-end over the ``documents`` table.

One streaming pass computes content fingerprint (md5 of whitespace-
normalized text), quality score, and the deterministic md5-prefix
train/val tag per document; ONE sharded groupby then performs exact
keep-first dedup (min ``doc_id`` per fingerprint) and the quality filter.

Scale shape: the scoring stage is a stateless vectorized ``map_batches``
combiner that projects each block down to 5 narrow columns before the
shuffle; the dedup groupby keys on ``shard = int(fp[:4], 16) % N`` rather
than the raw fingerprint (near-singleton groups are catastrophically slow
as Ray groups — the per-shard sweep drops duplicates vectorized in
pandas).  Nothing materializes: documents stream in, curated ids stream
out.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from .dedup import _norm_text
from .registry import register
from .split import VAL_HEX
from .textstats import _STOP_SQL, _WS, quality_batch

MIN_QUALITY = 0.75
N_SHARDS = 64


def curate_corpus(docs_ds, *, min_quality: float = MIN_QUALITY,
                  n_shards: int = N_SHARDS, val_hex=VAL_HEX):
    """documents(doc_id, text, lang) -> curated (doc_id, lang, quality,
    split): exact-deduped (keep min doc_id), quality-filtered, split-tagged."""

    def _score(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in _norm_text(batch.column("text")).to_pylist()
        ]
        split = [
            "val" if hashlib.md5(str(i).encode()).hexdigest()[0] in val_hex
            else "train"
            for i in batch.column("doc_id").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "fingerprint": pa.array(fps, pa.string()),
                "shard": pa.array(
                    [int(fp[:4], 16) % n_shards for fp in fps], pa.int32()
                ),
                "quality": q.column("quality"),
                "split": pa.array(split, pa.string()),
            }
        )

    scored = docs_ds.map_batches(_score, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def _curate_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fingerprint", "doc_id"], ignore_index=True)
        kept = df[~df.duplicated("fingerprint")]  # first = min doc_id
        kept = kept[kept["quality"] >= min_quality]
        return kept[["doc_id", "lang", "quality", "split"]]

    return scored.groupby("shard").map_groups(_curate_shard,
                                              batch_format="pandas")


def _q_curation(sf_dir: str):
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return curate_corpus(docs)


register(
    "corpus_curation",
    _q_curation,
    rf"""
    WITH w AS (
        SELECT doc_id, lang,
               md5(regexp_replace(regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}', ' ', 'g')) AS fp,
               regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}') AS words
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang, fp,
               round(0.4 * least(CAST(len(words) AS DOUBLE) / 50.0, 1.0)
                     + 0.3 * (1.0 - CAST(len(list_filter(words,
                                    x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                              / len(words))
                     + 0.3 * CAST(len(list_distinct(words)) AS DOUBLE)
                       / len(words), 6) AS quality
        FROM w
    ),
    k AS (
        SELECT * FROM q
        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT doc_id, lang, quality,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ({', '.join(f"'{h}'" for h in VAL_HEX)})
                THEN 'val' ELSE 'train' END AS split
    FROM k
    WHERE quality >= {MIN_QUALITY}
    """,
)
