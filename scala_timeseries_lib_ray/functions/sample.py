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
        W = rate // 2  # Scala integer division (rate/2)
        out_ts_l: list[int] = []
        out_idx: list[int] = []
        p = start
        c = 0
        while p < last_end:
            tc = int(ts[c])
            if tc > p + W:
                # entry too far in the future: advance the sample point
                k = (tc - W - p + rate - 1) // rate
                p += max(k, 1) * rate
                continue
            if c == n - 1:
                if p < end[c]:
                    out_ts_l.append(p)
                    out_idx.append(c)
                    p += rate
                else:
                    break
                continue
            tn = int(ts[c + 1])
            if (p < end[c] and tn > p + W) or abs(tc - p) < abs(tn - p):
                out_ts_l.append(p)
                out_idx.append(c)
                p += rate
            else:
                c += 1
        out_ts = np.array(out_ts_l, dtype=np.int64)
        out_val = value[np.array(out_idx, dtype=np.int64)] if out_idx else value[:0]

    out_validity = np.full(len(out_ts), rate, dtype=np.int64)
    if compress and len(out_ts):
        f_ts, f_val, f_validity, _ = fit_sorted(
            out_ts, out_val, out_validity, None, compress=True, validate=False
        )
        return f_ts, f_val, f_validity
    return out_ts, out_val, out_validity
