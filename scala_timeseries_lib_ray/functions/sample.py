"""Resampling — ``TimeSeries.sample`` (reference trait ``TimeSeries.scala:445-469``,
engine ``TimeSeries.scala:598-646``).

Re-grid the step function at fixed sample points ``start + k*rate``:

- **strict mode** (``useClosestInWindow=False``): the sampled value is exactly the value
  of the series at the sample point, or nothing. Vectorized (a strict sample is just a
  step-function evaluation on the grid).
- **closest mode**: the value of the entry that *starts* closest to the sample point
  among those starting within ``[p - rate/2, p + rate/2[`` wins; an entry still defined
  at ``p`` wins when the next entry starts out of the window. Tie (equidistant starts)
  goes to the later entry. Implemented as a faithful transcription of the reference's
  5-case recursion (``TimeSeries.scala:608-643``), cursor never moving backwards.

All emitted entries have ``validity = rate``; with ``compress=True`` equal contiguous
entries merge into multiples of ``rate`` (golden: ``TimeSeriesSpec.scala:499-507``).
"""

from __future__ import annotations

import numpy as np

from .fit import fit_sorted


def _sample_closest_ranges(
    ts: np.ndarray, end: np.ndarray, last_end: int, start: int, rate: int
) -> tuple[np.ndarray, np.ndarray]:
    """Closest-mode sampling in O(n) cursor steps (independent of grid length).

    The 5-case recursion (``TimeSeries.scala:608-643``) collapses per cursor entry c
    to a contiguous range of grid points it serves:

      drop(c) at grid point p  ⟺  p >= D(c) := max(mid(c), min(end[c], ts[c+1]-W))
      where mid(c) = ceil((ts[c]+ts[c+1])/2)   (tie goes to the later entry)
      emit c for p in [max(cursor_p, ts[c]-W) aligned-up, D(c))   (last entry:
      [.., end[c]) then stop)

    Each loop iteration either drops the cursor once or finishes a serve range, so
    iterations <= 2n; emitted grid points are materialized vectorized per range."""
    n = len(ts)
    W = rate // 2  # Scala integer division (rate/2)
    seg_ts: list[np.ndarray] = []
    seg_idx: list[int] = []
    seg_cnt: list[int] = []

    def align_up(x: int, p: int) -> int:
        """first grid point >= max(x, p)"""
        x = max(x, p)
        k = (x - start + rate - 1) // rate
        return start + max(k, 0) * rate

    p = align_up(start, start)
    c = 0
    while p < last_end:
        tc = int(ts[c])
        if c == n - 1:
            hi = min(int(end[c]), last_end)
            lo = align_up(tc - W, p)
            if lo < hi:
                pts = np.arange(lo, hi, rate, dtype=np.int64)
                seg_ts.append(pts)
                seg_idx.append(c)
                seg_cnt.append(len(pts))
            break
        tn = int(ts[c + 1])
        mid = -((-(tc + tn)) // 2)  # ceil
        D = max(mid, min(int(end[c]), tn - W))
        lo = align_up(tc - W, p)
        if lo < D:
            hi = min(D, last_end)
            if lo < hi:
                pts = np.arange(lo, hi, rate, dtype=np.int64)
                seg_ts.append(pts)
                seg_idx.append(c)
                seg_cnt.append(len(pts))
            p = align_up(hi, hi)  # first grid point >= hi (the drop point)
        # cursor drops at the current p (either no serve range, or range exhausted)
        c += 1
    if not seg_ts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return (
        np.concatenate(seg_ts),
        np.repeat(np.array(seg_idx, dtype=np.int64), np.array(seg_cnt, dtype=np.int64)),
    )


def sample_series(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    start: int,
    rate: int,
    use_closest: bool = False,
    compress: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample ONE fitted series. Returns (ts, value, validity)."""
    n = len(ts)
    e_int = np.zeros(0, dtype=np.int64)
    if n == 0:
        return e_int, np.zeros(0, dtype=value.dtype if hasattr(value, "dtype") else np.float64), e_int
    ts = np.asarray(ts)
    value = np.asarray(value)
    end = ts + np.asarray(validity)
    last_end = int(end[-1])

    if not use_closest:
        # first grid point where anything can be defined
        if ts[0] > start:
            p0 = start + ((int(ts[0]) - start + rate - 1) // rate) * rate
        else:
            p0 = start
        if p0 >= last_end:
            return e_int, value[:0], e_int
        grid = np.arange(p0, last_end, rate, dtype=np.int64)
        i = np.searchsorted(ts, grid, side="right") - 1
        ic = np.clip(i, 0, None)
        defined = (i >= 0) & (grid < end[ic])
        out_ts = grid[defined]
        out_val = value[ic[defined]]
    else:
        out_ts, out_idx = _sample_closest_ranges(ts, end, int(last_end), start, rate)
        out_val = value[out_idx] if len(out_idx) else value[:0]

    out_validity = np.full(len(out_ts), rate, dtype=np.int64)
    if compress and len(out_ts):
        f_ts, f_val, f_validity, _ = fit_sorted(
            out_ts, out_val, out_validity, None, compress=True, validate=False
        )
        return f_ts, f_val, f_validity
    return out_ts, out_val, out_validity
