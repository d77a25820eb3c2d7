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


def _tree_combine(
    partials: ray.data.Dataset,
    keys: tuple[str, ...],
    fanin: tuple[int, ...] = (16, 1),
) -> ray.data.Dataset:
    """Map-only tree reduction of algebraic partials: coalesce blocks, combine rows
    with equal (keys, bucket_ts) inside each block, repeat. Correct regardless of key
    placement (the aggregate vector is associative/commutative), and avoids Ray's
    sort-based groupby shuffle entirely — measured ~20s fixed overhead per groupby on
    this Ray version vs <1s for the tree.

    The root fan-in of 1 assumes the combined tier fits one block (aggregates only:
    #sources × #buckets rows). For larger key spaces, raise the root fan-in and write
    per-block outputs — rows with the same key then stay split across at most
    root-fan-in blocks; callers that need exact per-key rows at huge scale combine
    per key-range output file instead (see stages/manifest.py)."""
    ds = partials
    for k in fanin:
        ds = ds.repartition(k).map_batches(
            lambda t: reaggregate_partials_table(t, 1, 0, keys),
            batch_size=None,
            batch_format="pyarrow",
        )
    return ds


def _combine_partials(
    ds: ray.data.Dataset, keys: tuple[str, ...], combine: str
) -> ray.data.Dataset:
    if combine == "groupby":
        out = ds.groupby(list(keys) + ["bucket_ts"]).aggregate(*PARTIAL_AGGS())
    else:
        out = _tree_combine(ds, keys)
    return out.map_batches(finalize_tier_table, batch_format="pyarrow")


def _combine_edges(partials_tagged: ray.data.Dataset, keys: tuple[str, ...]) -> ray.data.Dataset:
    """Interior/edge combine (the 10^12-scale path): partial rows whose bucket is
    strictly inside their batch's per-series time range are FINAL tier rows and stay
    fully distributed; only the per-series first/last-bucket rows of each batch
    (O(#series × #shards), tiny) can collide across shards and go through one small
    combine task. No all-to-all anywhere, serial work is O(edges).

    Precondition (documented on ``rollup_partials_table(mark_edges=True)``): each
    batch's rows per series form a contiguous time range and batch ranges don't
    overlap except at their ends — true for shard-clustered inputs (the token table
    layout) and for whole-series-per-batch groups."""
    import pyarrow.compute as pc

    tagged = partials_tagged.materialize()  # tier-sized (aggregates only)
    interior = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("_edge"))).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )
    edges = tagged.map_batches(
        lambda t: t.filter(t.column("_edge")).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )
    edges_combined = edges.repartition(1).map_batches(
        lambda t: reaggregate_partials_table(t, 1, 0, keys),
        batch_size=None,
        batch_format="pyarrow",
    )
    return interior.union(edges_combined).map_batches(
        finalize_tier_table, batch_format="pyarrow"
    )


def rollup_tier(
    points: ray.data.Dataset,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
    combine: str = "tree",
) -> ray.data.Dataset:
    """raw points -> tier table at bucket ``width`` (ms). ``combine``:
    'edges' (no-shuffle interior/edge split — requires time-clustered batches),
    'tree' (map-only tree reduction — any layout), 'groupby' (Ray groupby)."""
    partials = points.map_batches(
        lambda t: rollup_partials_table(t, width, origin, keys, mark_edges=(combine == "edges")),
        batch_format="pyarrow",
    )
    if combine == "edges":
        return _combine_edges(partials, keys)
    return _combine_partials(partials, keys, combine)


def reaggregate_tier(
    tier: ray.data.Dataset,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
    combine: str = "tree",
) -> ray.data.Dataset:
    """tier at fine width -> tier at coarser ``width`` using partials only."""
    partials = tier.map_batches(
        lambda t: reaggregate_partials_table(t, width, origin, keys), batch_format="pyarrow"
    )
    return _combine_partials(partials, keys, combine)
