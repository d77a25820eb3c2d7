"""Distributed temporal joins and prefix scans over keyed event streams.

As-of join, range join and the running (prefix) aggregate are the three
temporal shapes the Dataset API lacks. The reference expresses their
single-series analogues through ``TimeSeries.sample`` / ``merge`` /
``slidingIntegral`` (TimeSeries.scala:608-643, NumericTimeSeries.scala); at
corpus scale the join key is a real column (``user_id``) with unbounded
cardinality, so the operators here are built key-partitioned:

- ``asof_join`` / ``range_join_agg``: both sides get a bounded partition key
  ``part = key % P`` (every row of a key lands in exactly one part — no halo
  rows needed), a side tag, and go through ONE exchange on the 64-value part
  key (Ray sort-groupby on a bounded key — the exchange shape proven out by
  ``exact_dedup`` / ``duplicate_ngrams``: never sort on an unbounded key).
  Each group then runs a fully vectorized lexsort + searchsorted kernel.
  Parallelism = P, independent of key skew; a hot key only grows one part's
  O(n log n) vectorized sort. At 256 nodes raise P to ~8-16x the worker count.

- ``prefix_sum_sharded``: the events log is globally ts-sorted, so row-range
  blocks are time ranges; a per-key running sum decomposes into (block-local
  segmented cumsum) + (sum of same-key values in earlier blocks). One counting
  pre-pass emits O(blocks x keys) partial sums, their per-key prefix sums are
  broadcast via ``ray.put``, and the scan itself is a stateless map — two
  streaming passes, no shuffle at all (same shape as
  ``tokens_from_documents_sharded``, shardedderive.py:389).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

N_JOIN_PARTS = 64


def _ts_ms(t: pa.Table, col: str = "ts") -> np.ndarray:
    ts_col = t.column(col)
    if pa.types.is_timestamp(ts_col.type):
        return np.asarray(ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)) // 1000
    return np.asarray(ts_col.to_numpy(zero_copy_only=False))


def _round_half_away(v: np.ndarray) -> np.ndarray:
    # SQL ROUND is half-away-from-zero; np.round is half-even.
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _tag_events_side(
    t: pa.Table, probe_type: str, build_type: str, n_parts: int
) -> pa.Table:
    """One pass over the raw events log emits both join sides with a uniform
    schema: (part, side, key, ts, event_id, value). side 0 = build, 1 = probe."""
    et = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
    is_probe = et == probe_type
    sel = is_probe | (et == build_type)
    key = np.asarray(t.column("user_id").to_numpy(zero_copy_only=False))[sel]
    return pa.table(
        {
            "part": pa.array((key % n_parts).astype(np.int32)),
            "side": pa.array(is_probe[sel].astype(np.int8)),
            "key": pa.array(key, pa.int64()),
            "ts": pa.array(_ts_ms(t)[sel], pa.int64()),
            "event_id": pa.array(
                np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))[sel],
                pa.int64(),
            ),
            "value": pa.array(
                np.asarray(t.column("value").to_numpy(zero_copy_only=False))[sel],
                pa.float64(),
            ),
        }
    )


def _asof_group_kernel(t: pa.Table) -> pa.Table:
    """Vectorized as-of within one key partition: sort (key, ts, side) with
    build rows first at equal ts (inclusive probe.ts >= build.ts), forward-fill
    the last build row index, and keep probes whose fill has the same key."""
    side = np.asarray(t.column("side").to_numpy(zero_copy_only=False))
    key = np.asarray(t.column("key").to_numpy(zero_copy_only=False))
    ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
    eid = np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))
    val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))
    order = np.lexsort((side, ts, key))
    side, key, ts, eid, val = side[order], key[order], ts[order], eid[order], val[order]
    n = len(side)
    last_build = np.maximum.accumulate(
        np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
    )
    probe = np.flatnonzero(side == 1)
    m = last_build[probe]
    ok = (m >= 0) & (key[np.maximum(m, 0)] == key[probe])
    probe, m = probe[ok], m[ok]
    return pa.table(
        {
            "event_id": pa.array(eid[probe], pa.int64()),
            "user_id": pa.array(key[probe], pa.int64()),
            "ts": pa.array(ts[probe], pa.int64()),
            "click_ts": pa.array(ts[m], pa.int64()),
            "click_value": pa.array(val[m], pa.float64()),
            "lag_ms": pa.array(ts[probe] - ts[m], pa.int64()),
        }
    )


def asof_join(
    events: ray.data.Dataset,
    probe_type: str,
    build_type: str,
    n_parts: int = N_JOIN_PARTS,
) -> ray.data.Dataset:
    """For each ``probe_type`` event, the latest ``build_type`` event by the
    same user at build.ts <= probe.ts (inner semantics — probes with no prior
    build row are dropped, like DuckDB's default ASOF JOIN)."""
    tagged = events.map_batches(
        lambda t: _tag_events_side(t, probe_type, build_type, n_parts),
        batch_format="pyarrow",
    )
    return tagged.groupby("part").map_groups(_asof_group_kernel, batch_format="pyarrow")


def _range_group_kernel(t: pa.Table, window_ms: int) -> pa.Table:
    """Per key partition: for every probe row, count/sum build rows of the same
    key with ts in [probe.ts - window, probe.ts] (inclusive both ends). Build
    rows are sorted per key; bounds come from two searchsorteds over a composite
    (dense key rank << 42 | ts-offset) axis; sums are cumsum differences."""
    side = np.asarray(t.column("side").to_numpy(zero_copy_only=False))
    key = np.asarray(t.column("key").to_numpy(zero_copy_only=False))
    ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
    eid = np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))
    val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))

    _, rank = np.unique(key, return_inverse=True)
    ts0 = int(ts.min()) if len(ts) else 0
    off = ts - ts0
    # 2^42 ms ≈ 139 years of span per exchange — assert rather than corrupt.
    if len(off) and (off.max() >= (1 << 42) or rank.max() >= (1 << 21)):
        raise ValueError("range_join_agg: composite key overflow (span/keys too large)")
    comp = (rank.astype(np.int64) << 42) | off

    b = side == 0
    b_comp = np.sort(comp[b])
    b_order = np.argsort(comp[b], kind="stable")
    b_val = _round_half_away(val[b][b_order])
    csum = np.concatenate([[0], np.cumsum(b_val)])

    p = np.flatnonzero(side == 1)
    p_comp = comp[p]
    lo = np.searchsorted(b_comp, p_comp - window_ms, side="left")
    hi = np.searchsorted(b_comp, p_comp, side="right")
    # window lower bound clamped within the probe's own key segment
    seg_lo = np.searchsorted(b_comp, (rank[p].astype(np.int64) << 42), side="left")
    lo = np.maximum(lo, seg_lo)
    return pa.table(
        {
            "event_id": pa.array(eid[p], pa.int64()),
            "user_id": pa.array(key[p], pa.int64()),
            "ts": pa.array(ts[p], pa.int64()),
            "n_clicks": pa.array((hi - lo).astype(np.int64)),
            "sum_click": pa.array(csum[hi] - csum[lo], pa.int64()),
        }
    )


def range_join_agg(
    events: ray.data.Dataset,
    probe_type: str,
    build_type: str,
    window_ms: int,
    n_parts: int = N_JOIN_PARTS,
) -> ray.data.Dataset:
    """Windowed range join with aggregation pushed into the join: per probe
    event, (count, sum of rounded values) of same-user build events within the
    trailing window. Left semantics — probes with no build rows report 0/0.
    The aggregate never materializes the joined pairs (at 100 TB the pair set
    can be quadratic in hot keys; count/sum via cumsum differences is O(n))."""
    tagged = events.map_batches(
        lambda t: _tag_events_side(t, probe_type, build_type, n_parts),
        batch_format="pyarrow",
    )
    return tagged.groupby("part").map_groups(
        lambda t: _range_group_kernel(t, window_ms), batch_format="pyarrow"
    )


# ---------------------------------------------------------------- prefix scan


def prefix_sum_sharded(events: ray.data.Dataset) -> ray.data.Dataset:
    """Running sum of ROUND(value) per event_type over the ts-sorted events log
    (the continuous-counter view a TSDB derives rates from). Two streaming
    passes, no shuffle: a counting pre-pass emits O(blocks x types) partial
    sums keyed by each block's min event_id (row order == ts order — the same
    layout contract events_to_points_sharded relies on); their per-type prefix
    sums are broadcast, and the scan pass does a block-local segmented cumsum
    plus the broadcast carry-in."""

    def partials(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
        eid = np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))
        v = _round_half_away(
            np.asarray(t.column("value").to_numpy(zero_copy_only=False))
        )
        uniq, inv = np.unique(et, return_inverse=True)
        sums = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "block_min": pa.array(
                    np.full(len(uniq), eid.min() if len(eid) else 0, np.int64)
                ),
                "source": pa.array(uniq),
                "s": pa.array(sums),
            }
        )

    tiny = events.map_batches(partials, batch_size=None, batch_format="pyarrow").take_all()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in tiny:
        by_src.setdefault(r["source"], []).append((r["block_min"], r["s"]))
    offsets: dict[tuple[int, str], int] = {}
    for s, entries in by_src.items():
        acc = 0
        for bmin, tot in sorted(entries):
            offsets[(bmin, s)] = acc
            acc += tot
    ref = ray.put(offsets)

    def scan(t: pa.Table) -> pa.Table:
        off = ray.get(ref)
        et = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
        eid = np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))
        n = len(et)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                    "cum_value": pa.array([], pa.int64()),
                }
            )
        v = _round_half_away(
            np.asarray(t.column("value").to_numpy(zero_copy_only=False))
        )
        tsm = _ts_ms(t)
        bmin = int(eid.min())
        # segmented cumsum in file (== ts) order: sort by type (stable keeps ts
        # order inside each segment), cumsum, subtract segment-start carry,
        # scatter back.
        order = np.argsort(et, kind="stable")
        sv = v[order]
        s_et = et[order]
        newseg = np.r_[True, s_et[1:] != s_et[:-1]]
        run = np.cumsum(sv)
        # segment base per row = run value just before the segment started
        seg_start_val = (run - sv)[newseg]
        segid = np.cumsum(newseg) - 1
        local = run - seg_start_val[segid]
        try:
            carry = np.array(
                [off[(bmin, s)] for s in s_et[newseg]], dtype=np.int64
            )
        except KeyError as e:
            raise KeyError(
                f"prefix_sum_sharded: no pre-pass offset for (block_min={bmin}, "
                f"{e.args[0]!r}); partials/scan blocking mismatch"
            ) from None
        cum_sorted = local + carry[segid]
        cum = np.empty(n, dtype=np.int64)
        cum[order] = cum_sorted
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "source": pa.array(et),
                "ts": pa.array(tsm, pa.int64()),
                "cum_value": pa.array(cum, pa.int64()),
            }
        )

    return events.map_batches(scan, batch_size=None, batch_format="pyarrow")
