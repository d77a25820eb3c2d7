"""Per-entry maps / filters / fills / splitting / step integral.

Reference: ``TimeSeries.scala:93-161`` (map/mapEntries/filter/filterMap/fill),
``TimeSeries.scala:337-370`` + ``immutable/TSEntry.scala:241-287`` (splitEntriesLongerThan,
integral), ``NumericTimeSeries.scala:76-91`` (stepIntegral).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import seg_bounds, same_seg_pairwise, seg_ids_from_keys, table_to_arrays
from .fit import fit_sorted

# ---------------------------------------------------------------------------- fill


def fill_sorted(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    seg: np.ndarray | None = None,
    fill_value=None,
    last_known: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Plug every internal gap of each series with a filler entry
    ``(prev.definedUntil, fv, next.ts - prev.definedUntil)`` — reference ``fill``
    (``TimeSeries.scala:154-161``, tested ``TimeSeriesTestBench.scala:426-473``).

    ``last_known=True`` implements gap-fill by last-known-value: the filler takes the
    *preceding* entry's value instead of a constant (the north-star gap-fill; composes
    like ``fallback`` in ``TimeSeries.scala:523-534``). The result is re-fitted with
    compression, as the reference builds the filled series through a compressing builder.

    Returns (ts, value, validity, seg) of the filled + compressed series.
    """
    n = len(ts)
    if n == 0:
        return ts, value, validity, (seg if seg is not None else None)
    end = ts + validity
    same = same_seg_pairwise(seg, n)
    gap = same & (ts[1:] > end[:-1])
    idx = np.flatnonzero(gap)  # filler goes after input row idx
    if len(idx) == 0:
        f = fit_sorted(ts, value, validity, seg, compress=True, validate=False)
        out_seg = seg[f[3]] if seg is not None else None
        return f[0], f[1], f[2], out_seg

    g_ts = end[idx]
    g_validity = ts[idx + 1] - end[idx]
    g_val = value[idx] if last_known else np.full(len(idx), fill_value, dtype=value.dtype)
    g_seg = seg[idx] if seg is not None else None

    order_ts = np.concatenate([ts, g_ts])
    order_val = np.concatenate([value, g_val])
    order_validity = np.concatenate([validity, g_validity])
    order_seg = np.concatenate([seg, g_seg]) if seg is not None else None
    if order_seg is not None:
        perm = np.lexsort((order_ts, order_seg))
    else:
        perm = np.argsort(order_ts, kind="stable")
    order_ts, order_val, order_validity = order_ts[perm], order_val[perm], order_validity[perm]
    if order_seg is not None:
        order_seg = order_seg[perm]
    f_ts, f_val, f_validity, keep = fit_sorted(
        order_ts, order_val, order_validity, order_seg, compress=True, validate=False
    )
    out_seg = order_seg[keep] if order_seg is not None else None
    return f_ts, f_val, f_validity, out_seg


def fill_table(
    t: pa.Table,
    keys: tuple[str, ...] = ("source",),
    fill_value=None,
    last_known: bool = False,
) -> pa.Table:
    arrs = table_to_arrays(t)
    key_arrays = [arrs[k] for k in keys]
    seg = seg_ids_from_keys(*key_arrays) if keys else None
    starts, _ = seg_bounds(seg, len(arrs["ts"]))
    f_ts, f_val, f_validity, f_seg = fill_sorted(
        arrs["ts"], arrs["value"], arrs["validity"], seg,
        fill_value=fill_value, last_known=last_known,
    )
    cols = {}
    for k in keys:
        per_seg = arrs[k][starts]
        cols[k] = per_seg[f_seg] if f_seg is not None else np.repeat(per_seg[:1], len(f_ts))
    cols.update({"ts": f_ts, "value": f_val, "validity": f_validity})
    return pa.table(
        {
            **{k: pa.array(v) for k, v in cols.items() if k in keys},
            "ts": pa.array(f_ts, pa.int64()),
            "value": pa.array(f_val, type=t.schema.field("value").type),
            "validity": pa.array(f_validity, pa.int64()),
        }
    )


# ------------------------------------------------------------- splitEntriesLongerThan


def split_longer_than_arrays(
    ts: np.ndarray, validity: np.ndarray, max_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split entries longer than ``max_len`` into chunks of at most ``max_len``
    (reference ``immutable/TSEntry.scala:241-267``: chunks start at
    ``ts + k*max_len``, the last chunk is the remainder; no compression).

    Returns (new_ts, new_validity, src_index).
    """
    if max_len <= 0:
        raise ValueError("The max length of entries must be > 0")
    n = len(ts)
    if n == 0:
        return ts, validity, np.zeros(0, dtype=np.int64)
    pieces = (validity + max_len - 1) // max_len
    src = np.repeat(np.arange(n, dtype=np.int64), pieces)
    offs = np.arange(len(src), dtype=np.int64) - np.repeat(
        np.cumsum(pieces) - pieces, pieces
    )  # 0..pieces_i-1 within each source row
    new_ts = ts[src] + offs * max_len
    end = (ts + validity)[src]
    new_validity = np.minimum(max_len, end - new_ts)
    return new_ts, new_validity, src


def split_longer_than_table(t: pa.Table, max_len: int) -> pa.Table:
    arrs = table_to_arrays(t)
    new_ts, new_validity, src = split_longer_than_arrays(arrs["ts"], arrs["validity"], max_len)
    out = t.take(pa.array(src, type=pa.int64()))
    out = out.set_column(out.schema.get_field_index("ts"), "ts", pa.array(new_ts, pa.int64()))
    return out.set_column(
        out.schema.get_field_index("validity"), "validity", pa.array(new_validity, pa.int64())
    )


# ---------------------------------------------------------------------- step integral


def _seconds_factor(time_unit: str) -> float:
    # reference entry integral: value * (validity converted to seconds)
    # (``immutable/TSEntry.scala:269-287``)
    if time_unit in ("ms", "milliseconds"):
        return 1.0 / 1000.0
    if time_unit in ("s", "seconds"):
        return 1.0
    raise ValueError(f"unsupported time unit {time_unit!r}")


def entry_integral(value: np.ndarray, validity: np.ndarray, time_unit: str = "ms") -> np.ndarray:
    return value * (validity * _seconds_factor(time_unit))


def step_integral_sorted(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    seg: np.ndarray | None = None,
    step_length: int | None = None,
    time_unit: str = "ms",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Running cumulative integral as a step function, per series.

    Reference ``TimeSeries.stepIntegral`` (``TimeSeries.scala:337-349``): first split
    entries longer than ``step_length``, then each output value is the prefix sum of
    ``entry.integral`` up to and including itself (``NumericTimeSeries.scala:76-91``).

    Returns (ts, integral_value, validity, src_index_into_split_input).
    """
    if step_length is not None:
        new_ts, new_validity, src = split_longer_than_arrays(ts, validity, step_length)
        value = np.asarray(value)[src]
        seg = seg[src] if seg is not None else None
        ts, validity = new_ts, new_validity
    contrib = entry_integral(np.asarray(value, dtype=np.float64), validity, time_unit)
    csum = np.cumsum(contrib)
    starts, ends = seg_bounds(seg, len(ts))
    # subtract the cumulative total of all preceding segments (vectorized)
    if len(starts) > 1:
        seg_row = np.repeat(np.arange(len(starts)), ends - starts)
        seg_base = np.concatenate([[0.0], csum[starts[1:] - 1]])
        csum = csum - seg_base[seg_row]
    return ts, csum, validity, np.arange(len(ts), dtype=np.int64)
