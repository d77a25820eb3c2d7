"""Sharded source derivations — no whole-series groups anywhere.

Replaces the ``groupby(source).map_groups`` derivations (parallelism = #series,
hot Zipf series become one unbounded group) with shard-local kernels plus a tiny
boundary exchange, the same shape as ``fitstage.fit_shards`` /
``canonical.refit_canonical``:

- ``events_to_points_sharded``: the events log is globally time-sorted, so Ray's
  row-range blocks are time ranges. Each shard derives its points locally (the
  per-series LEAD is exact for interior rows); only each shard's per-series FIRST
  and LAST rows (O(shards x series)) go through one small repair task that fixes
  the last-row validities against the next shard's first event. Parallelism =
  #shards, independent of series count or skew.

- ``tokens_from_documents_sharded``: the documents catalog is globally
  doc_id-sorted, so per-source dense ranks decompose into (block-local rank) +
  (count of same-source docs in earlier blocks). One counting pre-pass emits
  O(blocks x sources) rows; their prefix sums are broadcast and the derivation
  itself is a stateless map. Two streaming passes, no shuffle.

Both rely on the stated global sort order of the input file (time for events,
doc_id for documents) — the standard layout contract for an ingest log / catalog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.events import EVENT_VALIDITY_CAP, events_to_points
from ..sources.tokens import tokens_from_documents


def _series_edges(src: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(is_first, is_last) flags per row for rows sorted by series."""
    n = len(src)
    first = np.ones(n, dtype=bool)
    last = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = src[1:] != src[:-1]
        last[:-1] = src[1:] != src[:-1]
    return first, last


def events_to_points_sharded(
    events: ray.data.Dataset, quantize: str | None = None
) -> ray.data.Dataset:
    """events (globally ts-sorted file, row-range blocks) -> points, shard-local
    LEAD + boundary repair. Exactly equals the whole-series groupby derivation."""

    # Two STREAMING passes over the (lazy) events plan — no whole-dataset
    # materialize (r02 verdict: the old tagged.materialize() pushed every
    # derived point through the object store on the hot ev_* path). The interior
    # pass is the main stream; the edge pass re-derives the same shards and
    # keeps only the O(shards x series) per-series first/last rows. Both passes
    # execute the SAME deterministic plan (same parquet read, same block
    # layout), so the interior/edge split is consistent between them.

    def local_interior(t: pa.Table) -> pa.Table:
        out = events_to_points(t, quantize)  # sorts (source, ts) within the shard
        src = np.asarray(out.column("source").to_numpy(zero_copy_only=False))
        first, last = _series_edges(src)
        return out.filter(pa.array(~(first | last)))

    def local_edges(t: pa.Table) -> pa.Table:
        out = events_to_points(t, quantize)
        src = np.asarray(out.column("source").to_numpy(zero_copy_only=False))
        first, last = _series_edges(src)
        out = out.append_column("_last", pa.array(last))
        return out.filter(pa.array(first | last))

    interior = events.map_batches(local_interior, batch_size=None, batch_format="pyarrow")
    edges = events.map_batches(local_edges, batch_size=None, batch_format="pyarrow")

    def repair(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False)).copy()
        is_last = np.asarray(t.column("_last").to_numpy(zero_copy_only=False))
        order = np.lexsort((ts, src))
        src, ts, dur, is_last = src[order], ts[order], dur[order], is_last[order]
        n = len(src)
        if n > 1:
            # successor of a shard-last row in this edge set is the next shard's
            # first row of the same series (shards are disjoint time ranges)
            same = src[:-1] == src[1:]
            gap = np.minimum(ts[1:] - ts[:-1], EVENT_VALIDITY_CAP)
            fix = is_last[:-1] & same
            dur[:-1] = np.where(fix, gap, dur[:-1])
        out = pa.table(
            {
                "source": pa.array(src),
                "ts": pa.array(ts, pa.int64()),
                "value": pa.array(
                    np.asarray(t.column("value").to_numpy(zero_copy_only=False))[order],
                    pa.float64(),
                ),
                "validity": pa.array(dur, pa.int64()),
            }
        )
        return out

    repaired = edges.repartition(1).map_batches(
        repair, batch_size=None, batch_format="pyarrow"
    )
    return interior.union(repaired)


def splice_cut_from_events(events: ray.data.Dataset, source_b: str, mode: str) -> int:
    """Closed-form splice cut for events-derived points, from a 2-column scan of
    the raw log (no derivation needed):

    - append cut  = b.first.timestamp = min event ts of ``source_b`` (the
      derivation maps an event's ts through unchanged).
    - prepend cut = b.last.definedUntil = max event ts of ``source_b`` +
      ``EVENT_VALIDITY_CAP``: every interior point's end is
      ``min(next_ts, ts + CAP) <= last_ts``, and the series-last point's end is
      exactly ``last_ts + CAP`` — so the max end is the last event's end.

    Empty ``source_b`` returns the identity sentinel (append: beyond any ts;
    prepend: before any ts), matching reference append/prepend on an empty
    argument."""

    def b_ts(t: pa.Table) -> pa.Table:
        ts_col = t.column("ts")
        if pa.types.is_timestamp(ts_col.type):
            tsm = np.asarray(ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)) // 1000
        else:
            tsm = np.asarray(ts_col.to_numpy(zero_copy_only=False))
        m = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False)) == source_b
        sub = tsm[m]
        if len(sub) == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        # per-batch partial: one row per batch, final min/max over partials
        v = sub.min() if mode == "append" else sub.max()
        return pa.table({"t": pa.array([v], pa.int64())})

    tiny = events.map_batches(b_ts, batch_format="pyarrow")
    if mode == "append":
        lo = tiny.min("t")
        return int(lo) if lo is not None else np.iinfo(np.int64).max // 2
    hi = tiny.max("t")
    return int(hi) + EVENT_VALIDITY_CAP if hi is not None else np.iinfo(np.int64).min // 2


def spliced_points_canonical(
    events: ray.data.Dataset,
    source_a: str,
    source_b: str,
    mode: str,
    out_source: str | None = None,
    quantize: str | None = None,
) -> ray.data.Dataset:
    """Fused derive + splice + canonical fit for events-derived series:
    ``refit_canonical(append/prepend_blocks(events_to_points_sharded(events)))``
    in exactly TWO streaming passes over the raw log (plus the 2-column cut
    scan) instead of six derive executions of the composed plans.

    Per shard (both passes run the same deterministic kernel):
    derive -> tag per-series raw first/last rows (``E``: the only rows whose
    validity can be wrong pre-repair) -> splice at the precomputed cut ->
    batch-local fit of kept non-E rows with segment breaks at every E position
    (so no run ever spans an unrepaired row) -> interior runs are final; each
    segment's boundary runs plus the raw E rows go to one tiny edge task that
    repairs validities across shards, re-splices, and fits the O(shards x
    series) edge set globally.

    Safe because post-splice rows overlap at most their immediate successor
    (side ``a`` ends at/before the cut, side ``b`` starts at/after it, and
    within a series validity never exceeds the gap), so batch-local trims are
    exact, and every run that can interact with an E row or across a shard
    boundary is in the edge set by construction."""
    if mode not in ("append", "prepend"):
        raise ValueError(f"unknown splice mode {mode!r}")
    out_source = out_source or (
        f"{source_a}+{source_b}" if mode == "append" else f"{source_b}+{source_a}"
    )
    cut = splice_cut_from_events(events, source_b, mode)

    from ..functions.fit import fit_sorted
    from ..functions.splice import splice_arrays_at_cut

    def shard_kernel(t: pa.Table, emit: str) -> pa.Table:
        out = events_to_points(t, quantize)  # sorted by (source, ts)
        src = np.asarray(out.column("source").to_numpy(zero_copy_only=False))
        sel = (src == source_a) | (src == source_b)
        src = src[sel]
        ts = np.asarray(out.column("ts").to_numpy(zero_copy_only=False))[sel]
        val = np.asarray(out.column("value").to_numpy(zero_copy_only=False))[sel]
        dur = np.asarray(out.column("validity").to_numpy(zero_copy_only=False))[sel]
        first, last = _series_edges(src)
        edge_row = first | last
        is_a = src == source_a
        keep, ts2, dur2 = splice_arrays_at_cut(mode, cut, is_a, ts, dur)

        # post-splice single-series order; E rows (kept or dropped) break
        # segments at their post-splice position
        order = np.argsort(ts2, kind="stable")
        e_o = edge_row[order]
        seg_all = np.cumsum(e_o)
        fit_sel = (keep[order]) & ~e_o
        f_ts, f_val, f_dur, first_idx = fit_sorted(
            ts2[order][fit_sel], val[order][fit_sel], dur2[order][fit_sel],
            seg_all[fit_sel], compress=True, validate=False,
        )
        seg_runs = seg_all[fit_sel][first_idx] if len(first_idx) else np.zeros(0, np.int64)
        nr = len(f_ts)
        if nr:
            brk = seg_runs[1:] != seg_runs[:-1]
            run_is_edge = np.ones(nr, dtype=bool)
            if nr > 2:
                run_is_edge[1:-1] = brk[:-1] | brk[1:]
        else:
            run_is_edge = np.zeros(0, dtype=bool)

        if emit == "interior":
            m = ~run_is_edge
            return pa.table(
                {
                    "source": pa.array(np.repeat(out_source, int(m.sum()))),
                    "ts": pa.array(f_ts[m], pa.int64()),
                    "value": pa.array(f_val[m], pa.float64()),
                    "validity": pa.array(f_dur[m], pa.int64()),
                }
            )
        # edges: boundary runs (post-splice, fitted) + raw E rows (pre-splice,
        # pre-repair, with their original series identity)
        m = run_is_edge
        runs = pa.table(
            {
                "kind": pa.array(np.repeat("run", int(m.sum()))),
                "source": pa.array(np.repeat(out_source, int(m.sum()))),
                "ts": pa.array(f_ts[m], pa.int64()),
                "value": pa.array(f_val[m], pa.float64()),
                "validity": pa.array(f_dur[m], pa.int64()),
                "_last": pa.array(np.zeros(int(m.sum()), dtype=bool)),
            }
        )
        raw = pa.table(
            {
                "kind": pa.array(np.repeat("raw", int(edge_row.sum()))),
                "source": pa.array(src[edge_row]),
                "ts": pa.array(ts[edge_row], pa.int64()),
                "value": pa.array(val[edge_row], pa.float64()),
                "validity": pa.array(dur[edge_row], pa.int64()),
                "_last": pa.array(last[edge_row]),
            }
        )
        return pa.concat_tables([runs, raw])

    interior = events.map_batches(
        lambda t: shard_kernel(t, "interior"), batch_size=None, batch_format="pyarrow"
    )
    edges = events.map_batches(
        lambda t: shard_kernel(t, "edges"), batch_size=None, batch_format="pyarrow"
    )

    def finish(t: pa.Table) -> pa.Table:
        kind = np.asarray(t.column("kind").to_numpy(zero_copy_only=False))
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False)).copy()
        is_last = np.asarray(t.column("_last").to_numpy(zero_copy_only=False))
        raw = kind == "raw"
        # 1. repair raw validities across shards (same rule as the sharded
        #    derivation: a shard-last row's validity is the capped gap to the
        #    next event of the same original series)
        r_idx = np.flatnonzero(raw)
        if len(r_idx):
            ro = r_idx[np.lexsort((ts[r_idx], src[r_idx]))]
            rs, rt = src[ro], ts[ro]
            if len(ro) > 1:
                same = rs[:-1] == rs[1:]
                gap = np.minimum(rt[1:] - rt[:-1], EVENT_VALIDITY_CAP)
                fix = is_last[ro[:-1]] & same
                dur[ro[:-1]] = np.where(fix, gap, dur[ro[:-1]])
        # 2. splice the repaired raw rows
        keep2, ts2, dur2 = splice_arrays_at_cut(
            mode, cut, src == source_a, ts, dur
        )
        use = np.where(raw, keep2, True)
        ts_f = np.where(raw, ts2, ts)[use]
        dur_f = np.where(raw, dur2, dur)[use]
        val_f = val[use]
        # 3. global fit of the tiny edge set (boundary runs + repaired raws)
        order = np.argsort(ts_f, kind="stable")
        f_ts, f_val, f_dur, _ = fit_sorted(
            ts_f[order], val_f[order], dur_f[order], None, compress=True, validate=False
        )
        return pa.table(
            {
                "source": pa.array(np.repeat(out_source, len(f_ts))),
                "ts": pa.array(f_ts, pa.int64()),
                "value": pa.array(f_val, pa.float64()),
                "validity": pa.array(f_dur, pa.int64()),
            }
        )

    finished = edges.repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )
    return interior.union(finished)


def source_rank_offsets(docs: ray.data.Dataset) -> "ray.ObjectRef":
    """Counting pre-pass for cross-block per-source dense ranks: one streaming
    pass emits O(blocks x sources) (block_min, source, n) rows; their per-source
    prefix sums are broadcast (ray.put). offset[(block_min, source)] = number of
    same-source docs in blocks with smaller block_min."""

    def count(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        did = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {
                "block_min": pa.array(np.full(len(uniq), did.min() if len(did) else 0, np.int64)),
                "source": pa.array(uniq),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    tiny = docs.map_batches(count, batch_size=None, batch_format="pyarrow").take_all()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in tiny:
        by_src.setdefault(r["source"], []).append((r["block_min"], r["n"]))
    offsets: dict[tuple[int, str], int] = {}
    for s, entries in by_src.items():
        acc = 0
        for bmin, n in sorted(entries):
            offsets[(bmin, s)] = acc
            acc += n
    return ray.put(offsets)


def label_points_sharded(
    docs: ray.data.Dataset, value_col: str = "lang", interval: int = 60_000
) -> ray.data.Dataset:
    """documents (globally doc_id-sorted) -> a GENERIC-valued (string) step
    series per source: ts = per-source dense rank * interval, value = the label
    column, validity = interval. Reference values are generic ``T``
    (TimeSeries.scala:14; Boolean/String conformance in TimeSeriesTestBench) —
    this derivation feeds fit/merge/splice with a non-numeric value column
    (the fitter compresses equal-label runs). Same two-streaming-pass shape as
    tokens_from_documents_sharded; a missing pre-pass key raises."""
    ref = source_rank_offsets(docs)

    def derive(t: pa.Table) -> pa.Table:
        off = ray.get(ref)
        did = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        lab = t.column(value_col)
        n = len(did)
        if n == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                    "value": pa.array([], pa.string()),
                    "validity": pa.array([], pa.int64()),
                }
            )
        bmin = int(did.min())
        order = np.lexsort((did, src))
        s_src = src[order]
        newseg = np.r_[True, s_src[1:] != s_src[:-1]]
        segstart = np.flatnonzero(newseg)
        segid = np.cumsum(newseg) - 1
        local = np.arange(n) - segstart[segid]
        base = np.array([off[(bmin, s)] for s in s_src[segstart]], dtype=np.int64)
        ts = (base[segid] + local) * interval
        return pa.table(
            {
                "source": pa.array(s_src),
                "ts": pa.array(ts, pa.int64()),
                "value": lab.take(pa.array(order, pa.int64())),
                "validity": pa.array(np.full(n, interval, np.int64)),
            }
        )

    return docs.map_batches(derive, batch_size=None, batch_format="pyarrow")


def tokens_from_documents_sharded(
    docs: ray.data.Dataset, with_tokens: bool = False, seed: int = 42
) -> ray.data.Dataset:
    """documents (globally doc_id-sorted, row-range blocks) -> token table with
    exact per-source dense ranks, via a counting pre-pass + broadcast offsets."""
    ref = source_rank_offsets(docs)

    def derive(t: pa.Table) -> pa.Table:
        off = ray.get(ref)
        did = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        bmin = int(did.min()) if len(did) else 0
        def rank_offset(s: str) -> int:
            try:
                return off[(bmin, s)]
            except KeyError:
                # A miss means the count and derive passes saw different
                # blocking — silent 0 would yield wrong dense ranks.
                raise KeyError(
                    f"tokens_from_documents_sharded: no pre-pass offset for "
                    f"(block_min={bmin}, source={s!r}); count/derive blocking mismatch"
                ) from None

        out = tokens_from_documents(t, seed=seed, with_tokens=with_tokens,
                                    rank_offset=rank_offset)
        return out

    return docs.map_batches(derive, batch_size=None, batch_format="pyarrow")
