"""Referential-integrity report: planted orphans and null-FK rules."""

import pandas as pd
import pyarrow as pa

from json_time_series_extractor_ray.pipelines.integrity import (
    orphan_counts,
)


def _ds(ray, col, values, typ=pa.int64()):
    return ray.data.from_arrow(pa.table({col: pa.array(values, typ)}))


class TestOrphanCounts:
    def test_planted_orphans_counted_once(self, ray_session):
        # fk values: 1,2 valid; 7,9 orphans (9 repeated); nulls ignored
        fact = _ds(ray_session, "fk",
                   [1, 2, 2, 7, 9, 9, 9, None, None])
        dim = _ds(ray_session, "pk", [1, 2, 3, 4])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert n_keys == 4      # distinct non-null: 1, 2, 7, 9
        assert n_orphans == 2   # 7 and 9, each counted once

    def test_no_orphans(self, ray_session):
        fact = _ds(ray_session, "fk", [1, 1, 2, 3])
        dim = _ds(ray_session, "pk", [1, 2, 3])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert (n_keys, n_orphans) == (3, 0)

    def test_all_orphans_when_dim_empty_of_matches(self, ray_session):
        fact = _ds(ray_session, "fk", [5, 6])
        dim = _ds(ray_session, "pk", [1])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert (n_keys, n_orphans) == (2, 2)
