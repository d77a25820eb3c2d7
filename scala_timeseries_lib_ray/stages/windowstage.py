"""Halo-based sliding windows — the scale path for series too long for one group.

SURVEY.md §2.5: windowed operators over a series that cannot sit in one group run
per ``(source, chunk)`` where each chunk also reads a HALO of preceding rows wide
enough to cover every window that intersects the chunk:

    halo = window_width + max_validity

Mechanics (all exact, no whole-series state):
1. flat-map: each row goes to its own chunk, plus a copy to the NEXT chunk when it
   is within ``halo`` of that chunk's start (so removal events landing in the next
   chunk are computable there);
2. per (source, chunk): run the event sweep with ``horizon = min(chunk_end,
   series_end)`` (the sweep keeps emitting through trailing gaps — empty-window /
   residual-member intervals — exactly like the global sweep would);
3. clip every output interval to the owned ``[chunk_start, chunk_end)`` range.

The union over chunks equals the whole-series sweep except that (a) intervals
spanning a chunk edge arrive as two rows (equal value, contiguous) — the standard
shard-local-compression divergence, restored by a final fit pass when canonical
form is needed — and (b) for aggregators that are DEFINED on empty windows
(sum/integral emit 0), chunks that contain zero rows (a series gap swallowing a
whole chunk) carry no group and emit nothing; aggregators undefined on empty
windows (min/max/mean/std) are exact unconditionally. Per-source series bounds
come from a tiny pre-aggregation broadcast via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.window import sliding_window_events


def _halo_tag(t: pa.Table, chunk_width: int, halo: int) -> pa.Table:
    """Replicate each row into every later chunk whose windows it can influence —
    up to ceil(halo / chunk_width) chunks ahead (a window wider than the chunk
    reaches further than the adjacent chunk)."""
    ts = np.asarray(t.column("ts").combine_chunks().to_numpy(zero_copy_only=False))
    n = len(ts)
    own = (ts // chunk_width) * chunk_width
    max_ahead = (halo + chunk_width - 1) // chunk_width
    idx_parts = [np.arange(n, dtype=np.int64)]
    chunk_parts = [own]
    for k in range(1, max_ahead + 1):
        target = own + k * chunk_width
        carry = np.flatnonzero(ts + halo >= target)
        if len(carry) == 0:
            break
        idx_parts.append(carry)
        chunk_parts.append(target[carry])
    idx = np.concatenate(idx_parts)
    chunk = np.concatenate(chunk_parts)
    out = t.take(pa.array(idx, type=pa.int64()))
    return out.append_column("chunk_ts", pa.array(chunk, pa.int64()))


def sliding_window_halo(
    points: ray.data.Dataset,
    width: int,
    agg: str,
    chunk_width: int,
    max_validity: int,
    time_unit: str = "ms",
    group_chunks: int = 64,
) -> ray.data.Dataset:
    """Time-unaware sliding window over arbitrary-length series, chunk-parallel."""
    halo = width + max_validity

    # tiny pre-pass: per-source series bounds (the sweep's global start/stop points)
    from ray.data.aggregate import Max, Min

    def partial_bounds(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        tsv = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        endv = tsv + np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
        order = np.argsort(src, kind="stable")
        src, tsv, endv = src[order], tsv[order], endv[order]
        b = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
        return pa.table(
            {
                "source": pa.array(src[b]),
                "s": pa.array(np.minimum.reduceat(tsv, b), pa.int64()),
                "e": pa.array(np.maximum.reduceat(endv, b), pa.int64()),
            }
        )

    bounds_rows = (
        points.map_batches(partial_bounds, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
        .take_all()
    )
    series_bounds = {r["source"]: (int(r["s"]), int(r["e"])) for r in bounds_rows}
    ref = ray.put(series_bounds)

    tagged = points.map_batches(
        lambda t: _halo_tag(t, chunk_width, halo), batch_format="pyarrow"
    )

    empty_ok = agg in ("sum", "integral")  # aggs defined on empty windows (value 0)

    def per_group(t: pa.Table) -> pa.Table:
        bounds_map = ray.get(ref)
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        chunk = np.asarray(t.column("chunk_ts").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
        order = np.lexsort((ts, chunk, src))
        src, chunk, ts, val, dur = (a[order] for a in (src, chunk, ts, val, dur))
        bounds = np.flatnonzero(
            np.concatenate([[True], (src[1:] != src[:-1]) | (chunk[1:] != chunk[:-1])])
        )
        bounds = np.append(bounds, len(src))
        outs = {"source": [], "ts": [], "value": [], "validity": []}
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            c_lo = int(chunk[s])
            c_hi = c_lo + chunk_width
            g_start, g_end = bounds_map[src[s]]
            horizon = min(c_hi, g_end)
            if horizon <= int(ts[s]):
                continue
            r_ts, r_v, r_d = sliding_window_events(
                ts[s:e], val[s:e], dur[s:e], width, agg, time_unit,
                compress=False, horizon=horizon,
            )
            r_end = r_ts + r_d
            keep = (r_end > c_lo) & (r_ts < c_hi)
            r_ts, r_v, r_end = r_ts[keep], r_v[keep], r_end[keep]
            r_ts = np.maximum(r_ts, c_lo)
            r_end = np.minimum(r_end, c_hi)
            if empty_ok:
                # the global sweep emits 0-valued empty-window intervals through
                # gaps; prepend the uncovered prefix of the owned range (a gap that
                # outruns the halo). Whole chunks with zero rows remain the caller's
                # responsibility (they carry no group) — see module docstring.
                lo_bound = max(c_lo, g_start)
                first_ev = int(r_ts[0]) if len(r_ts) else min(c_hi, g_end)
                if first_ev > lo_bound:
                    r_ts = np.concatenate([[lo_bound], r_ts])
                    r_v = np.concatenate([[0.0], r_v])
                    r_end = np.concatenate([[first_ev], r_end])
            outs["source"].append(np.repeat(src[s], len(r_ts)))
            outs["ts"].append(r_ts)
            outs["value"].append(r_v)
            outs["validity"].append(r_end - r_ts)
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

    coarse = group_chunks * chunk_width

    def tag_coarse(t: pa.Table) -> pa.Table:
        g = (
            np.asarray(t.column("chunk_ts").combine_chunks().to_numpy(zero_copy_only=False))
            // coarse
        ) * coarse
        return t.append_column("_g", pa.array(g, pa.int64()))

    return (
        tagged.map_batches(tag_coarse, batch_format="pyarrow")
        .groupby(["source", "_g"])
        .map_groups(lambda t: per_group(t.drop_columns(["_g"])), batch_format="pyarrow")
    )
