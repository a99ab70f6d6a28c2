"""json_time_series_extractor_ray — a Ray-Data-native time-series extraction
and rollup engine.

A from-scratch engine with the query/data-processing capabilities of the
reference library ``wazzamatazz/json-time-series-extractor`` (a C#
single-process lazy-iterator library), rebuilt Ray-Data-first:

* ``extractor``           — the pure-Python semantic kernel (per-document
                            JSON -> samples), conformant to the reference's
                            29-test corpus.
* ``functions/``          — pointer, match-rule, template, timestamp and
                            raw-text primitives.
* ``tokenizer`` / ``corpus`` — the mandated physical input table
                            ``(doc_id, tokens:list<int32>, n_tok, source)``
                            and its deterministic synthesis.
* ``stages/``             — Ray Data ``map_batches`` stages: extraction
                            actor pool, rollup ladder (raw->1m->1h->1d),
                            gap-fill, Gorilla compression.
* ``pipelines/``          — end-to-end pipelines plus training-data
                            operators (dedup, similarity search, text
                            analysis, multimodal plumbing).
* ``state/``              — checkpoint manifests, lineage, resume.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the test fixture).
"""

from .extractor import (
    ExtractionPlan,
    ExtractorOptions,
    OptionsValidationError,
    Sample,
    ValueKind,
    extract_samples,
)
from .functions.jsonio import JsonDepthError, JsonParseOptions
from .functions.match import MatchRule, make_pointer_filter
from .functions.pointer import parse_pointer, pointer_to_string
from .functions.timestamps import TimestampSource

__all__ = [
    "ExtractionPlan",
    "ExtractorOptions",
    "OptionsValidationError",
    "Sample",
    "ValueKind",
    "extract_samples",
    "JsonDepthError",
    "JsonParseOptions",
    "MatchRule",
    "make_pointer_filter",
    "parse_pointer",
    "pointer_to_string",
    "TimestampSource",
]
