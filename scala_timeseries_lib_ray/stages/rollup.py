"""Tier rollup stages — the distributed continuous-aggregate operator.

Pattern (see SURVEY.md §3.2): a stateless ``map_batches`` computes per-batch partial
aggregates (splitting entries at bucket boundaries first), shrinking the rows from
#points to #(series × touched buckets); a ``groupby(keys, bucket_ts)`` then combines
the *partials* — the all-to-all shuffle moves only the small aggregate vectors, never
the raw points. Coarser tiers re-aggregate the previous tier's partials
(count/sum/min/max/Σv·d/Σd are algebraic; mean is re-derived at finalize).
"""

from __future__ import annotations

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..functions.bucket import (
    finalize_tier_table,
    reaggregate_partials_table,
    rollup_partials_table,
)

PARTIAL_AGGS = lambda: [
    Sum("count", alias_name="count"),
    Min("min", alias_name="min"),
    Max("max", alias_name="max"),
    Sum("sum", alias_name="sum"),
    Sum("wsum", alias_name="wsum"),
    Sum("wdur", alias_name="wdur"),
]


def _combine_partials(ds: ray.data.Dataset, keys: tuple[str, ...]) -> ray.data.Dataset:
    out = ds.groupby(list(keys) + ["bucket_ts"]).aggregate(*PARTIAL_AGGS())
    return out.map_batches(finalize_tier_table, batch_format="pyarrow")


def rollup_tier(
    points: ray.data.Dataset,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
) -> ray.data.Dataset:
    """raw points -> tier table at bucket ``width`` (ms)."""
    partials = points.map_batches(
        lambda t: rollup_partials_table(t, width, origin, keys), batch_format="pyarrow"
    )
    return _combine_partials(partials, keys)


def reaggregate_tier(
    tier: ray.data.Dataset,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
) -> ray.data.Dataset:
    """tier at fine width -> tier at coarser ``width`` using partials only."""
    partials = tier.map_batches(
        lambda t: reaggregate_partials_table(t, width, origin, keys), batch_format="pyarrow"
    )
    return _combine_partials(partials, keys)
