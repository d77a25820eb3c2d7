"""Array/table plumbing shared by all kernels.

The canonical *points* layout (one row == one ``TSEntry``, cf. reference
``immutable/TSEntry.scala:17``; entry defined on ``[ts, ts+validity)`` per
``immutable/TSEntry.scala:131-136``):

    source:string  ts:int64  value:float64  validity:int64 (> 0)

Kernels take parallel numpy arrays plus an optional ``seg`` array: ``seg[i]`` is an
integer segment id that changes whenever the series key changes (rows sorted by
``(source, ts)``). ``seg=None`` means "single series".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

POINTS_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("ts", pa.int64()),
        pa.field("value", pa.float64()),
        pa.field("validity", pa.int64()),
    ]
)

TIER_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("bucket_ts", pa.int64()),
        pa.field("count", pa.int64()),
        pa.field("min", pa.float64()),
        pa.field("max", pa.float64()),
        pa.field("sum", pa.float64()),
        pa.field("wsum", pa.float64()),  # sum(value * validity)
        pa.field("wdur", pa.int64()),  # sum(validity)
        pa.field("mean", pa.float64()),  # wsum / wdur  (duration-weighted)
    ]
)


def seg_ids_from_keys(*key_arrays: np.ndarray) -> np.ndarray:
    """Integer segment ids (0..k-1) for rows sorted by the given key columns.

    A new segment starts whenever any key column changes between consecutive rows.
    """
    n = len(key_arrays[0])
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for arr in key_arrays:
        a = np.asarray(arr)
        change[1:] |= a[1:] != a[:-1]
    return np.cumsum(change) - 1


def seg_bounds(seg: np.ndarray | None, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) index arrays for each segment; single segment if seg is None."""
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    if seg is None:
        return np.array([0], dtype=np.int64), np.array([n], dtype=np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(seg[1:], seg[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return starts, ends


def same_seg_pairwise(seg: np.ndarray | None, n: int) -> np.ndarray:
    """Boolean array of length n-1: True where row i and i+1 are in the same segment."""
    if n <= 1:
        return np.zeros(max(n - 1, 0), dtype=bool)
    if seg is None:
        return np.ones(n - 1, dtype=bool)
    return seg[1:] == seg[:-1]


def table_to_arrays(t: pa.Table) -> dict[str, np.ndarray]:
    """Table -> dict of numpy arrays (zero-copy where possible)."""
    out = {}
    for name in t.column_names:
        col = t.column(name)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            out[name] = col.combine_chunks().to_numpy(zero_copy_only=False)
        else:
            out[name] = col.combine_chunks().to_numpy(zero_copy_only=False)
    return out


def arrays_to_table(arrs: dict[str, np.ndarray], schema: pa.Schema | None = None) -> pa.Table:
    if schema is not None:
        cols = [pa.array(arrs[f.name], type=f.type) for f in schema]
        return pa.Table.from_arrays(cols, schema=schema)
    return pa.table({k: pa.array(v) for k, v in arrs.items()})


def check_points(ts: np.ndarray, validity: np.ndarray, seg: np.ndarray | None = None) -> None:
    """Well-formedness assertions per reference ``validation/TimestampValidator.scala:89-94``
    (strictly increasing timestamps within a series) and ``immutable/TSEntry.scala:19``
    (strictly positive validity). Raises ValueError on violation."""
    n = len(ts)
    if n and not np.all(validity > 0):
        bad = int(np.flatnonzero(validity <= 0)[0])
        raise ValueError(f"Validity must be strictly positive ({validity[bad]} at row {bad})")
    if n > 1:
        same = same_seg_pairwise(seg, n)
        inc = ts[1:] > ts[:-1]
        viol = same & ~inc
        if viol.any():
            i = int(np.flatnonzero(viol)[0])
            raise ValueError(
                f"The timestamps need to be strictly increasing, was {ts[i]} before {ts[i + 1]}."
            )
