"""The fitter: trim + compress semantics of the reference's ``TSEntryFitter``.

Reimplements, vectorized over whole batches of many series at once:

- overlap trimming: a previous entry's validity is clamped to the next entry's start
  (reference ``validation/TSEntryFitter.scala:28-53`` via ``TSEntry.appendEntry`` /
  ``trimEntryRight``, ``immutable/TSEntry.scala:173-213``),
- compression: consecutive entries with strictly equal values whose domains overlap or
  are contiguous are merged into one entry whose end-of-validity is the *last* entry's
  ``definedUntil`` (reference ``immutable/TSEntry.scala:187-199`` ``extendOrTrim``:
  both the extension and the shrink case yield ``(prev.ts, v, elem.definedUntil - prev.ts)``),
- validation: strictly increasing timestamps within a series
  (``validation/TimestampValidator.scala:89-94``).

The run-merge condition is pairwise: entry ``i+1`` joins entry ``i``'s run iff
``value[i+1] == value[i] and ts[i+1] <= ts[i] + validity[i]`` — correct because after a
merge the run's definedUntil is exactly the last absorbed entry's definedUntil.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import (
    check_points,
    same_seg_pairwise,
    seg_ids_from_keys,
    table_to_arrays,
)


def fit_sorted(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    seg: np.ndarray | None = None,
    compress: bool = True,
    validate: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fit entries sorted by (series, ts). Returns (ts, value, validity, keep_index)
    where ``keep_index`` maps each output row to the input row that started its run
    (use it to gather key columns). ``value`` may be 1-D, or 2-D (n, m) for
    tuple-valued series (strictZip outputs): a run merges only when ALL value
    components are equal."""
    n = len(ts)
    ts = np.asarray(ts)
    validity = np.asarray(validity)
    value = np.asarray(value)
    if n == 0:
        return ts, value, validity, np.zeros(0, dtype=np.int64)
    if validate:
        check_points(ts, validity, seg)

    end = ts + validity
    if compress and n > 1:
        same = same_seg_pairwise(seg, n)
        with np.errstate(invalid="ignore"):
            eq = value[1:] == value[:-1]
            if eq.ndim == 2:
                eq = eq.all(axis=1)
        mergeable = same & eq & (ts[1:] <= end[:-1])
    else:
        mergeable = np.zeros(max(n - 1, 0), dtype=bool)

    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.logical_not(mergeable, out=new_run[1:])
    first = np.flatnonzero(new_run)
    last = np.append(first[1:], n) - 1

    r_ts = ts[first]
    r_val = value[first]
    r_end = end[last].copy()

    if len(first) > 1:
        r_seg = seg[first] if seg is not None else None
        same_r = same_seg_pairwise(r_seg, len(first))
        np.minimum(r_end[:-1], np.where(same_r, r_ts[1:], np.iinfo(np.int64).max), out=r_end[:-1])

    return r_ts, r_val, r_end - r_ts, first


def fit_table(
    t: pa.Table,
    keys: tuple[str, ...] = ("source",),
    compress: bool = True,
    validate: bool = True,
    value_cols: tuple[str, ...] = ("value",),
) -> pa.Table:
    """Fit a points table sorted by (*keys, ts). Usable directly in map_batches.
    ``value_cols`` lists the value components (several for tuple-valued series —
    a run merges only when all components are equal)."""
    arrs = table_to_arrays(t)
    seg = seg_ids_from_keys(*(arrs[k] for k in keys)) if keys else None
    if len(value_cols) == 1:
        value = arrs[value_cols[0]]
    else:
        value = np.column_stack(
            [np.asarray(t.column(c).to_numpy(zero_copy_only=False)) for c in value_cols]
        )
    r_ts, r_val, r_validity, keep = fit_sorted(
        arrs["ts"], value, arrs["validity"], seg, compress=compress, validate=validate
    )
    cols = {}
    for name in t.column_names:
        if name == "ts":
            cols[name] = pa.array(r_ts, type=pa.int64())
        elif name in value_cols:
            j = value_cols.index(name)
            v = r_val if r_val.ndim == 1 else r_val[:, j]
            cols[name] = pa.array(v, type=t.schema.field(name).type)
        elif name == "validity":
            cols[name] = pa.array(r_validity, type=pa.int64())
        else:
            cols[name] = t.column(name).take(pa.array(keep, type=pa.int64()))
    return pa.table(cols)


def series_flags(
    ts: np.ndarray,
    validity: np.ndarray,
    seg: np.ndarray | None = None,
    compress: bool = True,
) -> dict[str, np.ndarray]:
    """Per-segment bookkeeping flags over *fitted* entries, mirroring the reference's
    ``isCompressed`` / ``isDomainContinuous`` (``TimeSeries.scala:88-91,541-545``).

    ``domain_continuous[k]`` is True iff every adjacent pair of fitted entries in
    segment k is contiguous (``prev.definedUntil == next.ts`` — after fitting there can
    be no overlap, so contiguity is equality). All-pairs semantics.
    """
    n = len(ts)
    if n == 0:
        return {
            "compressed": np.zeros(0, dtype=bool),
            "domain_continuous": np.zeros(0, dtype=bool),
        }
    from .core import seg_bounds

    starts, ends = seg_bounds(seg, n)
    k = len(starts)
    cont = np.ones(k, dtype=bool)
    if n > 1:
        same = same_seg_pairwise(seg, n)
        pair_cont = (ts[:-1] + validity[:-1]) == ts[1:]
        bad = same & ~pair_cont
        if bad.any():
            # a segment is discontinuous if any of its pairs has a hole
            bad_seg = (seg[:-1] if seg is not None else np.zeros(n - 1, dtype=np.int64))[bad]
            seg_of_start = seg[starts] if seg is not None else np.zeros(k, dtype=np.int64)
            cont[np.isin(seg_of_start, bad_seg)] = False
    return {
        "compressed": np.full(k, bool(compress)),
        "domain_continuous": cont,
    }
