"""End-to-end pipelines + training-data operator families.

Importing the operator modules (dedup, similarity, textstats) registers
their driver-visible queries in :mod:`.registry`.
"""

from .timeseries import (
    events_corpus_dataset,
    extract_and_rollup,
    extract_pipeline,
    gorilla_roundtrip_stats,
    rollup_tier_for_compare,
    samples_for_compare,
    write_tiers,
)

__all__ = [
    "events_corpus_dataset", "extract_and_rollup", "extract_pipeline",
    "gorilla_roundtrip_stats", "rollup_tier_for_compare",
    "samples_for_compare", "write_tiers",
]
