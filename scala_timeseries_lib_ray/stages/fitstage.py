"""Distributed fitting (trim + compress) of points.

Two strategies (SURVEY.md §4.3, §7.3 — the fit/compress carry across partition edges
is the one inherently order-coupled step):

- ``fit_per_series``: ``groupby(source).map_groups`` — exact global ``TimeSeries.apply``
  semantics per series. Fine when single series fit in memory; skew-prone for hot
  sources at 10^12 scale.
- ``fit_blocks``: rows are split at coarse block boundaries (``block_width``), then
  fitted within ``(source, block)`` groups. Compression is *block-local* — equal-value
  runs never merge across a block edge. This mirrors the reference's own tiling of
  long series into bucket-aligned blocks (``NestedTimeSeries`` /
  ``bucketing/TimeBucketer.scala:24-46``: entries are split at bucket boundaries
  before per-block Gorilla compression), makes every group bounded
  (hot sources are spread over time blocks → no skew), and is embarrassingly
  parallel. The engine's scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.bucket import bucket_split_arrays
from ..functions.core import table_to_arrays
from ..functions.fit import fit_table

DEFAULT_BLOCK_WIDTH = 3_600_000  # 1h blocks


def _sorted_by(t: pa.Table, keys: tuple[str, ...]) -> bool:
    """O(n) probe: rows sorted by (keys..., ts)? String keys only need adjacent
    equality plus int-key monotonicity, so check via dictionary codes."""
    import pyarrow.compute as pc

    arrs = []
    for k in list(keys) + ["ts"]:
        col = t.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = pc.dictionary_encode(col).indices
        arrs.append(np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64))
    n = len(t)
    if n <= 1:
        return True
    ok = np.ones(n - 1, dtype=bool)
    tie = np.ones(n - 1, dtype=bool)
    for a in arrs:
        d = a[1:] - a[:-1]
        ok &= np.where(tie, d >= 0, True)
        tie = tie & (d == 0)
    return bool(ok.all())


def _sort_block_fit(t: pa.Table, keys: tuple[str, ...], compress: bool) -> pa.Table:
    if not _sorted_by(t, keys):
        order = pa.compute.sort_indices(
            t, sort_keys=[(k, "ascending") for k in keys] + [("ts", "ascending")]
        )
        t = t.take(order)
    return fit_table(t, keys=keys, compress=compress)


def fit_per_series(
    points: ray.data.Dataset,
    keys: tuple[str, ...] = ("source",),
    compress: bool = True,
) -> ray.data.Dataset:
    """Exact global fit: one group per series."""

    def fit_group(t: pa.Table) -> pa.Table:
        return _sort_block_fit(t, keys, compress)

    return points.groupby(list(keys)).map_groups(fit_group, batch_format="pyarrow")


def split_at_blocks(t: pa.Table, block_width: int = DEFAULT_BLOCK_WIDTH) -> pa.Table:
    """Stateless kernel: split rows at block boundaries and tag the block id."""
    arrs = table_to_arrays(t)
    new_ts, new_validity, block_ts, src = bucket_split_arrays(
        arrs["ts"], arrs["validity"], block_width
    )
    cols = {}
    for name in t.column_names:
        if name == "ts":
            cols[name] = pa.array(new_ts, pa.int64())
        elif name == "validity":
            cols[name] = pa.array(new_validity, pa.int64())
        else:
            cols[name] = t.column(name).take(pa.array(src, type=pa.int64()))
    cols["block_ts"] = pa.array(block_ts, pa.int64())
    return pa.table(cols)


def fit_shards(
    points: ray.data.Dataset,
    keys: tuple[str, ...] = ("source",),
    compress: bool = True,
    block_width: int = DEFAULT_BLOCK_WIDTH,
) -> ray.data.Dataset:
    """Shard-local fit: fit each incoming Ray block as-is (segment keys = (keys,
    fine block)), with NO shuffle at all.

    Correct and exact when the input layout is (source, time)-clustered — the token
    table is written as one file per (source, ordinal-range) shard, and parquet row
    groups preserve that order — because then every shard is a contiguous slice of
    one series and fitting is sequential only *within* the slice. An equal-value run
    that crosses a shard boundary stays as two entries (compression is shard-local,
    exactly like the reference's per-builder/per-block compression,
    ``archive/GorillaBlock.scala:162-300``); overlap trims never cross shards for
    non-overlapping inputs. Use ``fit_blocks``/``fit_per_series`` when the input is
    not clustered or canonical global compression is required."""
    split = points.map_batches(
        lambda t: split_at_blocks(t, block_width), batch_format="pyarrow"
    )

    def fit_batch(t: pa.Table) -> pa.Table:
        return _sort_block_fit(t, tuple(keys) + ("block_ts",), compress)

    return split.map_batches(fit_batch, batch_size=None, batch_format="pyarrow")


def fit_blocks(
    points: ray.data.Dataset,
    keys: tuple[str, ...] = ("source",),
    compress: bool = True,
    block_width: int = DEFAULT_BLOCK_WIDTH,
    group_blocks: int = 168,
) -> ray.data.Dataset:
    """Block-local fit: split at block boundaries, group by (keys, coarse chunk),
    fit all fine blocks inside the chunk in ONE vectorized kernel call.

    Grouping by the coarse chunk (``group_blocks`` fine blocks, default 168 = one
    week of 1h blocks) amortizes Ray's per-group dispatch overhead (~10ms/group)
    while keeping groups bounded: a hot source is still spread across time chunks, so
    skew stays bounded by (chunk span × max rate). Fit semantics are identical —
    the kernel's segment key is the FINE (keys, block_ts), so compression never
    crosses a fine block edge regardless of the grouping granularity.

    The output keeps the ``block_ts`` column (the engine's partitioning key: reuse it
    for the tier groupby, merges and Gorilla blocks so the data is shuffled ONCE)."""
    chunk_width = block_width * group_blocks

    def tag_and_split(t: pa.Table) -> pa.Table:
        out = split_at_blocks(t, block_width)
        chunk = pa.compute.multiply(
            pa.compute.floor(pa.compute.divide(out.column("block_ts"), chunk_width)),
            chunk_width,
        )
        return out.append_column("chunk_ts", chunk.cast(pa.int64()))

    split = points.map_batches(tag_and_split, batch_format="pyarrow")

    def fit_group(t: pa.Table) -> pa.Table:
        fitted = _sort_block_fit(t, tuple(keys) + ("block_ts",), compress)
        return fitted.drop_columns(["chunk_ts"])

    return split.groupby(list(keys) + ["chunk_ts"]).map_groups(
        fit_group, batch_format="pyarrow"
    )
