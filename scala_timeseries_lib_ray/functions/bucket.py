"""Bucketing & rollup — the continuous-aggregate primitives.

Reference: ``TimeSeries.bucket`` / ``rollup`` (``TimeSeries.scala:471-508``), engine
``bucketing/TimeBucketer.scala:24-110``. Entries straddling a bucket boundary are
*split* at the boundary (``TimeBucketer.scala:81-83`` via ``entry.split``); output
timestamps of a rollup are driven by the bucket grid, not the data, and the grid must
start at or before the first entry (throws otherwise, ``TimeSeriesSpec.scala:520-523``).

The distributed tier operator uses a uniform grid ``origin + k*width`` and computes the
algebraic aggregate vector (count, min, max, sum, Σv·d, Σd) per (series, bucket) —
these partials compose across tiers: 1m → 1h → 1d re-aggregate partials only
(mean is re-derived as Σv·d / Σd, the duration-weighted mean of
``window/BasicAggregators.scala:41-64``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import TIER_SCHEMA, table_to_arrays



def _key_codes(t: pa.Table, keys: tuple[str, ...]):
    """Dictionary-encode key columns -> (int32 code arrays, dictionary arrays).
    Avoids numpy object-string arrays entirely (C-speed encode + final take)."""
    codes, dicts = [], []
    for k in keys:
        col = t.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_dictionary(col.type):
            enc = col
        else:
            enc = pa.compute.dictionary_encode(col)
        codes.append(np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64))
        dicts.append(enc.dictionary)
    return codes, dicts


def bucket_split_arrays(
    ts: np.ndarray,
    validity: np.ndarray,
    width: int,
    origin: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split entries at uniform bucket boundaries ``origin + k*width``.

    Returns (new_ts, new_validity, bucket_ts, src_index). Entirely vectorized: a row
    spanning k buckets becomes k rows (same math as ``splitEntriesLongerThan`` with
    grid phase, reference ``immutable/TSEntry.scala:241-267`` + ``TimeBucketer``
    boundary splitting).
    """
    n = len(ts)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    ts = np.asarray(ts, dtype=np.int64)
    end = ts + np.asarray(validity, dtype=np.int64)
    first_b = (ts - origin) // width  # bucket index of entry start
    last_b = (end - 1 - origin) // width  # bucket index of last covered instant
    pieces = last_b - first_b + 1
    src = np.repeat(np.arange(n, dtype=np.int64), pieces)
    offs = np.arange(len(src), dtype=np.int64) - np.repeat(np.cumsum(pieces) - pieces, pieces)
    b = first_b[src] + offs
    bucket_ts = origin + b * width
    new_ts = np.maximum(ts[src], bucket_ts)
    new_end = np.minimum(end[src], bucket_ts + width)
    return new_ts, new_end - new_ts, bucket_ts, src


def rollup_partials_table(
    t: pa.Table,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
    mark_edges: bool = False,
) -> pa.Table:
    """Per-batch partial rollup: split at boundaries then aggregate per (keys, bucket)
    WITHIN the batch. Emits the algebraic vector — rows shrink from #points to
    #(series × touched buckets), making the downstream groupby shuffle small.
    """
    ts_a = np.asarray(t.column("ts").combine_chunks().to_numpy(zero_copy_only=False))
    dur_a = np.asarray(t.column("validity").combine_chunks().to_numpy(zero_copy_only=False))
    new_ts, new_validity, bucket_ts, src = bucket_split_arrays(ts_a, dur_a, width, origin)
    value = np.asarray(
        t.column("value").combine_chunks().to_numpy(zero_copy_only=False), dtype=np.float64
    )[src]
    key_codes, key_dicts = _key_codes(t, keys)
    key_cols = [c[src] for c in key_codes]

    m = len(src)
    if m == 0:
        return pa.table(
            {
                **{k: pa.array([], type=pa.string()) for k in keys},
                "bucket_ts": pa.array([], type=pa.int64()),
                "count": pa.array([], type=pa.int64()),
                "min": pa.array([], type=pa.float64()),
                "max": pa.array([], type=pa.float64()),
                "sum": pa.array([], type=pa.float64()),
                "wsum": pa.array([], type=pa.float64()),
                "wdur": pa.array([], type=pa.int64()),
            }
        )
    # group within batch: lexsort by (key codes..., bucket), with an O(n)
    # already-sorted fast path (shard-clustered inputs arrive sorted)
    order = None
    lex_keys = (bucket_ts, *key_cols[::-1])
    ok = np.ones(m - 1, dtype=bool) if m > 1 else np.zeros(0, dtype=bool)
    tie = np.ones(m - 1, dtype=bool) if m > 1 else ok
    for arr in key_cols + [bucket_ts]:
        d = arr[1:] - arr[:-1]
        ok &= np.where(tie, d >= 0, True)
        tie = tie & (d == 0)
    if m > 1 and not ok.all():
        order = np.lexsort(lex_keys)
    if order is not None:
        b_sorted = bucket_ts[order]
        v_sorted = value[order]
        d_sorted = new_validity[order]
        k_sorted = [k[order] for k in key_cols]
    else:
        b_sorted, v_sorted, d_sorted, k_sorted = bucket_ts, value, new_validity, key_cols

    change = np.zeros(m, dtype=bool)
    change[0] = True
    change[1:] = b_sorted[1:] != b_sorted[:-1]
    for k in k_sorted:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], m)

    wd = v_sorted * d_sorted
    out = {
        **{
            name: dic.take(pa.array(k[starts], type=pa.int64()))
            for name, k, dic in zip(keys, k_sorted, key_dicts)
        },
        "bucket_ts": pa.array(b_sorted[starts], type=pa.int64()),
        "count": pa.array(ends - starts, type=pa.int64()),
        "min": pa.array(np.minimum.reduceat(v_sorted, starts), type=pa.float64()),
        "max": pa.array(np.maximum.reduceat(v_sorted, starts), type=pa.float64()),
        "sum": pa.array(np.add.reduceat(v_sorted, starts), type=pa.float64()),
        "wsum": pa.array(np.add.reduceat(wd, starts), type=pa.float64()),
        "wdur": pa.array(np.add.reduceat(d_sorted, starts), type=pa.int64()),
    }
    if mark_edges:
        # A (keys, bucket) can receive contributions from another batch ONLY if it is
        # this batch's first or last bucket of that series (requires per-series rows
        # of a batch to be a contiguous time range, and batch ranges to be disjoint —
        # true for shard-clustered layouts). Everything else is FINAL already.
        g = len(starts)
        edge = np.zeros(g, dtype=bool)
        if g:
            kb = [k[starts] for k in k_sorted]
            run_change = np.ones(g, dtype=bool)
            run_change[1:] = np.zeros(g - 1, dtype=bool)
            for k in kb:
                run_change[1:] |= k[1:] != k[:-1]
            edge[np.flatnonzero(run_change)] = True  # first bucket of each series run
            edge[np.append(np.flatnonzero(run_change)[1:] - 1, g - 1)] = True  # last
        out["_edge"] = pa.array(edge)
    return pa.table(out)


def reaggregate_partials_table(
    t: pa.Table,
    width: int,
    origin: int = 0,
    keys: tuple[str, ...] = ("source",),
) -> pa.Table:
    """Coarsen a tier/partials table to a wider bucket grid by combining the algebraic
    aggregate vector WITHIN the batch (count/sum/wsum/wdur add; min/max fold). The
    output feeds the same groupby-of-partials as ``rollup_partials_table`` — this is
    how 1m → 1h → 1d reuse partial sums instead of re-reading raw data."""
    m = len(t)
    if m == 0:
        return t.drop_columns([c for c in ("mean",) if c in t.column_names])
    bucket_raw = np.asarray(t.column("bucket_ts").combine_chunks().to_numpy(zero_copy_only=False))
    bucket_ts = origin + ((bucket_raw - origin) // width) * width
    key_codes, key_dicts = _key_codes(t, keys)
    order = np.lexsort((bucket_ts, *key_codes[::-1]))
    b = bucket_ts[order]
    k_sorted = [k[order] for k in key_codes]
    change = np.zeros(m, dtype=bool)
    change[0] = True
    change[1:] = b[1:] != b[:-1]
    for k in k_sorted:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    col_np = lambda name: np.asarray(
        t.column(name).combine_chunks().to_numpy(zero_copy_only=False)
    )
    red = lambda col, ufunc: ufunc.reduceat(col_np(col)[order], starts)
    return pa.table(
        {
            **{
                name: dic.take(pa.array(k[starts], type=pa.int64()))
                for name, k, dic in zip(keys, k_sorted, key_dicts)
            },
            "bucket_ts": pa.array(b[starts], type=pa.int64()),
            "count": pa.array(red("count", np.add), type=pa.int64()),
            "min": pa.array(red("min", np.minimum), type=pa.float64()),
            "max": pa.array(red("max", np.maximum), type=pa.float64()),
            "sum": pa.array(red("sum", np.add), type=pa.float64()),
            "wsum": pa.array(red("wsum", np.add), type=pa.float64()),
            "wdur": pa.array(red("wdur", np.add), type=pa.int64()),
        }
    )


def finalize_tier_table(t: pa.Table) -> pa.Table:
    """Attach the derived ``mean = wsum / wdur`` column after the groupby-of-partials."""
    arrs = table_to_arrays(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.asarray(arrs["wsum"], dtype=np.float64) / np.asarray(arrs["wdur"], dtype=np.float64)
    if "mean" in t.column_names:
        return t.set_column(t.schema.get_field_index("mean"), "mean", pa.array(mean, pa.float64()))
    return t.append_column("mean", pa.array(mean, pa.float64()))


# ------------------------------------------------------- faithful single-series forms


def bucket_entries(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    buckets: np.ndarray,
) -> list[tuple[int, tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Faithful ``TimeBucketer.bucketEntries`` (``bucketing/TimeBucketer.scala:57-85``)
    over ONE series with an explicit boundary array ``buckets = [b0, b1, ..., bm]``:
    returns one (bucket_start, sub-series) per ``[b_i, b_{i+1})`` — empty buckets
    included. Requires ``b0 <= first entry timestamp``."""
    n = len(ts)
    buckets = np.asarray(buckets, dtype=np.int64)
    if n and buckets[0] > ts[0]:
        raise ValueError(
            f"Bucket Stream MUST start at or before the first entry. First bucket was: "
            f"{buckets[0]}, first entry timestamp was: {ts[0]}"
        )
    out = []
    end = np.asarray(ts) + np.asarray(validity)
    for b_lo, b_hi in zip(buckets[:-1], buckets[1:]):
        keep = np.flatnonzero((ts < b_hi) & (end > b_lo))
        s_ts = np.maximum(ts[keep], b_lo)
        s_end = np.minimum(end[keep], b_hi)
        out.append((int(b_lo), (s_ts, value[keep], s_end - s_ts)))
    return out


def rollup(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    buckets: np.ndarray,
    aggregator,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Faithful ``TimeSeries.rollup`` (``TimeSeries.scala:484-508``): one output entry
    per bucket ``[b_i, b_{i+1})`` with value ``aggregator(sub_series)`` and validity
    equal to the bucket width; output timestamps driven by the grid. ``aggregator``
    takes (ts, value, validity) arrays and returns a scalar (or None to omit)."""
    out_ts, out_val, out_validity = [], [], []
    for (b_lo, sub), b_hi in zip(
        bucket_entries(ts, value, validity, buckets), np.asarray(buckets)[1:]
    ):
        r = aggregator(*sub)
        if r is not None:
            out_ts.append(b_lo)
            out_val.append(r)
            out_validity.append(int(b_hi) - b_lo)
    return (
        np.array(out_ts, dtype=np.int64),
        np.array(out_val),
        np.array(out_validity, dtype=np.int64),
    )


def group_entries_by_count(n: int, max_entries: int) -> tuple[np.ndarray, np.ndarray]:
    """``TimeSeries.groupEntries`` (``TimeSeries.scala:571-586``): chunk n entries into
    groups of at most ``max_entries``; returns (group_starts, group_ends) index arrays.
    Used to cap Gorilla block sizes (two-level tiling, ``TimeBucketer.scala:24-46``)."""
    starts = np.arange(0, n, max_entries, dtype=np.int64)
    ends = np.minimum(starts + max_entries, n)
    return starts, ends


def tier_table_to_points(t: pa.Table, width: int) -> pa.Table:
    """View a tier table as a points table (value = duration-weighted mean, validity =
    tier width — rollup semantics ``TimeSeries.scala:484-508``)."""
    arrs = table_to_arrays(t)
    return pa.table(
        {
            "source": pa.array(arrs["source"]),
            "ts": pa.array(arrs["bucket_ts"], type=pa.int64()),
            "value": pa.array(np.asarray(arrs["mean"], dtype=np.float64)),
            "validity": pa.array(np.full(len(t), width), type=pa.int64()),
        }
    )
