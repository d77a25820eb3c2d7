"""Sliding / dynamic windows — event-driven sweep, vectorized.

Reference engine: ``window/WindowSlider.scala:44-172`` with the cursor state machine
``whatToUpdate`` (``:195-269``). The recursion emits one output entry per add/remove
event; an entry is *in* the window at cursor ``t`` iff ``e.ts <= t < e.definedUntil +
windowWidth`` ("all entries whose domain intersects any window ending in the output
entry's domain"). The stream starts at the first entry's timestamp and stops at the
last entry's ``definedUntil``.

We reproduce this with a difference-array event sweep: event times are the union of
all entry starts and ``definedUntil + width`` clipped to the series hull; on each
elementary interval the member set is the contiguous index range
``[#removals<=t, #adds<=t)``. Aggregates follow ``window/BasicAggregators.scala``:

- ``sum``     time-unaware; defined on every interval (0 for an empty window)
- ``min/max`` time-unaware; undefined (gap) when the window is empty
- ``mean``    duration-weighted Σv·d/Σd, undefined when Σd == 0 (``:41-64``)
- ``std``     duration-weighted biased std via E[X²]−E[X]² (``:71-96``)
- ``integral``Σ value·validity_seconds, always defined (``IntegralAggregator.scala:17-33``)

Time-aware aggregators (mean/std/integral) are applied to *sampled* entries
(``TimeSeries.scala:420-436``): see ``sliding_window`` with ``rate``.
The output series is built with a compressing builder (``TimeSeries.scala:438-443``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .fit import fit_sorted
from .sample import sample_series
from .transform import _seconds_factor

TIME_AWARE = {"mean", "std", "integral"}
TIME_UNAWARE = {"sum", "min", "max"}


def _sparse_table(vals: np.ndarray):
    """Sparse table for O(1) range-min queries (built O(n log n))."""
    n = len(vals)
    k = max(1, n.bit_length())
    table = [vals]
    j = 1
    while (1 << j) <= n:
        prev = table[-1]
        half = 1 << (j - 1)
        table.append(np.minimum(prev[: n - (1 << j) + 1], prev[half : n - half + 1]))
        j += 1
    return table


def _range_min(table, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """min over [lo, hi) for arrays of ranges; caller guarantees lo < hi."""
    length = hi - lo
    j = np.floor(np.log2(np.maximum(length, 1))).astype(np.int64)
    # guard against float rounding at exact powers of two
    j = np.where((np.int64(1) << j) > length, j - 1, j)
    out = np.empty(len(lo), dtype=table[0].dtype)
    for jj in np.unique(j):
        m = j == jj
        t = table[int(jj)]
        out[m] = np.minimum(t[lo[m]], t[hi[m] - (1 << int(jj))])
    return out


def sliding_window_events(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    width: int,
    agg: str,
    time_unit: str = "ms",
    compress: bool = True,
    horizon: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Event sweep over ONE fitted series (already sampled for time-aware aggs).
    Returns the compressed output series (ts, value, validity).

    ``horizon`` overrides the sweep's stop time (default: the last entry's
    definedUntil, the reference's termination). A larger horizon keeps emitting
    intervals (empty-window / residual-member values) up to it — used by the
    chunk+halo distributed layout where the series continues in the next chunk."""
    if width <= 0:
        raise ValueError("Needs a strictly positive window size")
    n = len(ts)
    e = np.zeros(0, dtype=np.int64)
    if n == 0:
        return e, np.zeros(0, dtype=np.float64), e
    ts = np.asarray(ts, dtype=np.int64)
    value = np.asarray(value, dtype=np.float64)
    validity = np.asarray(validity, dtype=np.int64)
    end = ts + validity
    rem_t = end + width  # removal event of entry i (sorted: ends increase)
    last_end = int(end[-1]) if horizon is None else int(horizon)

    events = np.unique(np.concatenate([ts, rem_t, [last_end]]))
    events = events[(events >= ts[0]) & (events <= last_end)]
    t_left = events[:-1]
    t_right = events[1:]
    lo = np.searchsorted(rem_t, t_left, side="right")
    hi = np.searchsorted(ts, t_left, side="right")
    nonempty = hi > lo

    if agg == "sum":
        pref = np.concatenate([[0.0], np.cumsum(value)])
        out = pref[hi] - pref[lo]
        defined = np.ones(len(t_left), dtype=bool)
    elif agg in ("min", "max"):
        v = value if agg == "min" else -value
        table = _sparse_table(v)
        out = np.zeros(len(t_left), dtype=np.float64)
        out[nonempty] = _range_min(table, lo[nonempty], hi[nonempty])
        if agg == "max":
            out = -out
        defined = nonempty
    elif agg in ("mean", "std"):
        wd = value * validity
        pref_wd = np.concatenate([[0.0], np.cumsum(wd)])
        pref_d = np.concatenate([[0], np.cumsum(validity)])
        dur = pref_d[hi] - pref_d[lo]
        defined = dur > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = (pref_wd[hi] - pref_wd[lo]) / dur
            if agg == "std":
                pref_w2 = np.concatenate([[0.0], np.cumsum(value * wd)])
                sq = (pref_w2[hi] - pref_w2[lo]) / dur
                out = np.sqrt(np.maximum(sq - mean * mean, 0.0))
            else:
                out = mean
    elif agg == "integral":
        fac = _seconds_factor(time_unit)
        pref = np.concatenate([[0.0], np.cumsum(value * validity * fac)])
        out = pref[hi] - pref[lo]
        defined = np.ones(len(t_left), dtype=bool)
    elif callable(agg):
        # QueueAggregator escape hatch (window/BasicAggregators.scala:127-136 /
        # Aggregator.queueAggregator): arbitrary fn over the whole window content,
        # called once per event interval with the member slices. O(events * window).
        out = np.zeros(len(t_left), dtype=np.float64)
        defined = np.zeros(len(t_left), dtype=bool)
        for j in range(len(t_left)):
            r = agg(value[lo[j] : hi[j]], validity[lo[j] : hi[j]])
            if r is not None:
                out[j] = r
                defined[j] = True
    else:
        raise ValueError(f"unknown aggregator {agg!r}")

    keep = np.flatnonzero(defined)
    o_ts = t_left[keep]
    o_val = out[keep]
    o_validity = t_right[keep] - o_ts
    if not compress:
        # NumericTimeSeries.slidingIntegral returns the raw event-interval entries
        # without the compressing builder (NumericTimeSeries.scala:111-130)
        return o_ts, o_val, o_validity
    return fit_sorted(o_ts, o_val, o_validity, None, compress=True, validate=False)[:3]


def sliding_window(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    width: int,
    agg: str,
    rate: int | None = None,
    use_closest: bool = True,
    time_unit: str = "ms",
    compress: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``TimeSeries.slidingWindow`` (``TimeSeries.scala:396-436``). Time-aware
    aggregators (mean/std/integral) require ``rate`` and sample first."""
    if agg in TIME_AWARE:
        if rate is None:
            raise ValueError(f"aggregator {agg!r} is time-aware and needs a sample rate")
        if len(ts) == 0:
            e = np.zeros(0, dtype=np.int64)
            return e, np.zeros(0, dtype=np.float64), e
        s_ts, s_val, s_validity = sample_series(
            ts, value, validity, int(ts[0]), rate, use_closest=use_closest, compress=False
        )
        return sliding_window_events(s_ts, s_val, s_validity, width, agg, time_unit, compress)
    return sliding_window_events(ts, value, validity, width, agg, time_unit, compress)


def sliding_integral(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    window: int,
    rate: int,
    time_unit: str = "ms",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``TimeSeries.slidingIntegral`` (``TimeSeries.scala:372-394``,
    ``NumericTimeSeries.scala:111-130``): sample (closest mode), then windowed integral."""
    if window < rate:
        raise ValueError("The window must be as least as large as the sample rate.")
    return sliding_window(
        ts, value, validity, window, "integral", rate, True, time_unit, compress=False
    )


def dynamic_window(
    ts: np.ndarray,
    value: np.ndarray,
    validity: np.ndarray,
    start_mask: np.ndarray,
    stop_mask: np.ndarray,
    agg: str | Callable = "sum",
    time_unit: str = "ms",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sessionization — ``WindowSlider.dynamicWindow`` (``window/WindowSlider.scala:286-319``):
    a window opens at the first entry where ``start`` holds and ``stop`` does not, and
    extends up to (excluding) the next entry where ``stop`` holds. The output entry is
    ``(first.ts, agg(window), last.definedUntil - first.ts)``. ``agg`` may be a named
    aggregator or a callable over (values, validities) returning a scalar or None."""
    n = len(ts)
    end = np.asarray(ts) + np.asarray(validity)
    out_ts, out_val, out_validity = [], [], []
    i = 0
    while i < n:
        if not start_mask[i] or stop_mask[i]:
            i += 1
            continue
        j = i + 1
        while j < n and not stop_mask[j]:
            j += 1
        vals = np.asarray(value[i:j], dtype=np.float64)
        durs = np.asarray(validity[i:j], dtype=np.int64)
        if callable(agg):
            r = agg(vals, durs)
        elif agg == "sum":
            r = float(vals.sum())
        elif agg == "min":
            r = float(vals.min())
        elif agg == "max":
            r = float(vals.max())
        elif agg == "mean":
            r = float((vals * durs).sum() / durs.sum())
        elif agg == "integral":
            r = float((vals * durs).sum() * _seconds_factor(time_unit))
        elif agg == "count":
            r = float(len(vals))
        else:
            raise ValueError(f"unknown aggregator {agg!r}")
        if r is not None:
            out_ts.append(int(ts[i]))
            out_val.append(r)
            out_validity.append(int(end[j - 1] - ts[i]))
        i = j  # the stopping entry itself is skipped by the next dropWhile
    return (
        np.array(out_ts, dtype=np.int64),
        np.array(out_val, dtype=np.float64),
        np.array(out_validity, dtype=np.int64),
    )
