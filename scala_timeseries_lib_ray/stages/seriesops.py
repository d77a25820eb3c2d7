"""Per-series operator stages: sample / sliding windows / integrals / sessionization
applied independently to each series via ``groupby(source).map_groups``.

Each group is ONE series sorted by ts; the kernels are the conformance-tested
functions from ``functions/``. For series too long for one group at 10^12 scale the
windowed operators move to the bucket+halo layout (each (series, time-bucket) group
reads ``window`` worth of preceding rows), see SURVEY.md §2.5 — the group-per-series
form here is exact and is the right shape for post-rollup tier series, which are
small by construction.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.sample import sample_series
from ..functions.transform import step_integral_sorted
from ..functions.window import dynamic_window, sliding_integral, sliding_window


def _split_series(t: pa.Table):
    src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
    ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
    val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))
    dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
    order = np.lexsort((ts, src))
    src, ts, val, dur = src[order], ts[order], val[order], dur[order]
    bounds = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    bounds = np.append(bounds, len(src))
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        yield src[s], ts[s:e], val[s:e], dur[s:e]


def per_series_stage(
    points: ray.data.Dataset,
    kernel: Callable,  # (ts, value, validity) -> (ts, value, validity)
) -> ray.data.Dataset:
    """Run a single-series kernel on every series; output points schema."""

    def fn(t: pa.Table) -> pa.Table:
        outs = {"source": [], "ts": [], "value": [], "validity": []}
        for name, ts, val, dur in _split_series(t):
            r_ts, r_val, r_dur = kernel(ts, val, dur)
            outs["source"].append(np.repeat(name, len(r_ts)))
            outs["ts"].append(r_ts)
            outs["value"].append(np.asarray(r_val, dtype=np.float64))
            outs["validity"].append(r_dur)
        if not outs["ts"]:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "validity": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "source": pa.array(np.concatenate(outs["source"])),
                "ts": pa.array(np.concatenate(outs["ts"]), pa.int64()),
                "value": pa.array(np.concatenate(outs["value"]), pa.float64()),
                "validity": pa.array(np.concatenate(outs["validity"]), pa.int64()),
            }
        )

    return points.groupby("source").map_groups(fn, batch_format="pyarrow")


def sample_stage(points, rate: int, use_closest: bool = False, compress: bool = False, start: int | None = None):
    """Per-series ``TimeSeries.sample``; grid starts at each series' first entry
    unless ``start`` is given."""
    return per_series_stage(
        points,
        lambda ts, v, d: sample_series(
            ts, v, d, int(ts[0]) if start is None else start, rate, use_closest, compress
        ),
    )


def sliding_window_stage(points, width: int, agg: str, rate: int | None = None, use_closest: bool = True):
    return per_series_stage(
        points, lambda ts, v, d: sliding_window(ts, v, d, width, agg, rate, use_closest)
    )


def sliding_integral_stage(points, window: int, rate: int, time_unit: str = "ms"):
    return per_series_stage(
        points, lambda ts, v, d: sliding_integral(ts, v, d, window, rate, time_unit)
    )


def step_integral_stage(points, step_length: int | None = None, time_unit: str = "ms"):
    def kernel(ts, v, d):
        r_ts, r_v, r_d, _ = step_integral_sorted(ts, v, d, None, step_length, time_unit)
        return r_ts, r_v, r_d

    return per_series_stage(points, kernel)


def dynamic_window_stage(points, start_pred, stop_pred, agg: str = "sum"):
    """start_pred/stop_pred: vectorized (value) -> bool mask."""
    return per_series_stage(
        points,
        lambda ts, v, d: dynamic_window(ts, v, d, start_pred(v), stop_pred(v), agg),
    )


def domain_stage(points: ray.data.Dataset) -> ray.data.Dataset:
    """Distributed loose-domain + support ratio: per-batch per-series partials
    (min start, max end, validity sum — no sort, no whole-series group), then a
    tiny groupby-of-partials over O(blocks x series) rows and a vectorized
    finalize. Scale shape: the only exchange moves partial rows, never points."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(src, return_inverse=True)
        k = len(uniq)
        t0 = np.full(k, np.iinfo(np.int64).max)
        np.minimum.at(t0, inv, ts)
        t1 = np.full(k, np.iinfo(np.int64).min)
        np.maximum.at(t1, inv, ts + dur)
        d = np.bincount(inv, weights=dur.astype(np.float64), minlength=k).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(uniq),
                "t0": pa.array(t0, pa.int64()),
                "t1": pa.array(t1, pa.int64()),
                "d": pa.array(d, pa.int64()),
            }
        )

    parts = points.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("source").aggregate(
        Min("t0", alias_name="domain_start"),
        Max("t1", alias_name="domain_end"),
        Sum("d", alias_name="defined_ms"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("domain_start").to_numpy(zero_copy_only=False))
        e = np.asarray(t.column("domain_end").to_numpy(zero_copy_only=False))
        d = np.asarray(t.column("defined_ms").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "source": t.column("source"),
                "domain_start": pa.array(s, pa.int64()),
                "domain_end": pa.array(e, pa.int64()),
                "defined_ms": pa.array(d, pa.int64()),
                "support_ratio": pa.array(d / np.maximum(e - s, 1), pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
