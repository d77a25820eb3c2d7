"""Canonical re-fit: erase the shard-local-compression divergence.

Shard/block-local stages (``fit_shards``, ``merge_pair_blocks``,
``sliding_window_halo``) may leave an equal-value run split at a shard or block
edge. Canonical global compression is restored with O(batch-edges) serial work:

1. pass 1 — batch-local fit (merges/trims everything inside each batch);
2. pass 2 — the FIRST and LAST row of each series in each batch (the only rows that
   can interact across batches) go through one small global fit; interior rows are
   final and stay distributed.

Fitting the collected edge set as one sorted sequence is safe: the fitter only
merges/trims rows whose domains actually meet, and rows that meet across batches
are exactly (last of batch k, first of batch k+1) — both edges by construction;
edge rows with interior rows between them have a time gap and pass through
untouched.

Result: ``refit_canonical(fit_shards(ds))`` ≡ ``fit_per_series(ds)`` exactly
(block splitting is also undone: the halves of a split entry are contiguous and
equal-valued, so the fitter re-merges them).

Contract: input batches must already be non-overlapping ACROSS batches beyond the
adjacent boundary rows (true for every shard-local stage output here). Arbitrary
raw overlapping input needs ``fit_per_series`` / ``fit_blocks`` instead.

CAVEAT (union layouts): a dataset built as ``big.union(tiny_edge_batch)`` — e.g.
``events_to_points_sharded``'s output, whose repaired-boundary batch holds rows
temporally INTERIOR to the other batches — violates the contract: the tiny
batch's middle rows are not in the edge set, so equal-value runs touching them
stay unmerged. For spliced events series use
``shardedderive.spliced_points_canonical`` (fused derive+splice+canonical fit)
instead of composing this over ``append_blocks``/``prepend_blocks``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.fit import fit_table

POINT_COLS = ["source", "ts", "value", "validity"]


def _sorted_points(t: pa.Table, value_cols: tuple[str, ...] = ("value",)) -> pa.Table:
    t = t.select(["source", "ts", *value_cols, "validity"])
    order = pa.compute.sort_indices(
        t, sort_keys=[("source", "ascending"), ("ts", "ascending")]
    )
    return t.take(order)


def refit_canonical(
    points: ray.data.Dataset,
    compress: bool = True,
    value_cols: tuple[str, ...] = ("value",),
    cache: bool = True,
) -> ray.data.Dataset:
    """Points (any batch layout, per-series-sorted within batches after sorting)
    -> canonically fitted points equal to a whole-series fit. ``value_cols``
    supports tuple-valued series (e.g. strictZip outputs): runs merge only when
    every component matches.

    ``cache=False`` streams: two passes over the (lazy) upstream plan — the
    interior pass is the main stream, the edge pass re-runs the upstream and
    keeps only the O(batches x series) edge rows — instead of materializing
    every fitted point through the object store. Use it when the upstream is a
    cheap deterministic map chain over a read (same plan -> same blocks). Keep
    the default ``cache=True`` when the upstream is expensive (a shuffle/merge
    output): the materialize then pays for itself by running it once."""

    def _fit(t: pa.Table) -> pa.Table:
        return fit_table(_sorted_points(t, value_cols), keys=("source",),
                         compress=compress, validate=False, value_cols=value_cols)

    def _edge_mask(fitted: pa.Table) -> np.ndarray:
        src = np.asarray(fitted.column("source").to_numpy(zero_copy_only=False))
        n = len(src)
        edge = np.zeros(n, dtype=bool)
        if n:
            first = np.concatenate([[True], src[1:] != src[:-1]])
            edge[np.flatnonzero(first)] = True
            edge[np.append(np.flatnonzero(first)[1:] - 1, n - 1)] = True
        return edge

    if cache:
        def local_fit(t: pa.Table) -> pa.Table:
            fitted = _fit(t)
            return fitted.append_column("_edge", pa.array(_edge_mask(fitted)))

        tagged = points.map_batches(
            local_fit, batch_size=None, batch_format="pyarrow"
        ).materialize()
        interior = tagged.map_batches(
            lambda t: t.filter(pa.compute.invert(t.column("_edge"))).drop_columns(["_edge"]),
            batch_format="pyarrow",
        )
        edges = tagged.map_batches(
            lambda t: t.filter(t.column("_edge")).drop_columns(["_edge"]),
            batch_format="pyarrow",
        )
    else:
        def local_interior(t: pa.Table) -> pa.Table:
            fitted = _fit(t)
            return fitted.filter(pa.array(~_edge_mask(fitted)))

        def local_edges(t: pa.Table) -> pa.Table:
            fitted = _fit(t)
            return fitted.filter(pa.array(_edge_mask(fitted)))

        interior = points.map_batches(local_interior, batch_size=None, batch_format="pyarrow")
        edges = points.map_batches(local_edges, batch_size=None, batch_format="pyarrow")
    edges_fitted = edges.repartition(1).map_batches(
        lambda t: fit_table(_sorted_points(t, value_cols), keys=("source",),
                            compress=compress, validate=False, value_cols=value_cols),
        batch_size=None,
        batch_format="pyarrow",
    )
    return interior.union(edges_fitted)
