"""Distributed merge of two series / two keyed datasets.

Two layouts (SURVEY.md §2.4):

- ``merge_pair_exact``: both series gathered into one group — exact global
  reference semantics (trim+compress across the whole timeline). Right shape for
  pairs of tier/rollup series (small by construction).
- ``merge_pair_blocks``: both sides are split at time-block boundaries and merged
  independently per block (co-partitioned interval join; entries pre-split at the
  edges so the sweep is block-local, exactly the reference's TimeBucketer trick of
  splitting entries at bucket boundaries). Scale path: the only divergence from the
  global form is that equal-value runs are not compressed across block edges
  (shard-local compression again). A final ``fit`` of adjacent block outputs
  restores canonical compression when needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.bucket import bucket_split_arrays
from ..functions.merge import MergeOp, merge_sweep


def _series_from_table(t: pa.Table, name: str):
    src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
    m = src == name
    ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))[m]
    val = np.asarray(t.column("value").to_numpy(zero_copy_only=False))[m]
    dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))[m]
    order = np.argsort(ts, kind="stable")
    return ts[order], val[order], dur[order]


def _value_array(v) -> pa.Array:
    """Numeric merge outputs stay float64 (the engine's numeric column type);
    generic values (bool / string / object — reference values are generic ``T``,
    TimeSeries.scala:14) keep their own type."""
    v = np.asarray(v)
    if v.dtype.kind in "uifc":
        return pa.array(v.astype(np.float64), pa.float64())
    return pa.array(v)


def _merged_table(out_source: str, r):
    r_ts, r_val, r_dur = r
    cols = {
        "source": pa.array(np.repeat(out_source, len(r_ts))),
        "ts": pa.array(r_ts, pa.int64()),
    }
    if isinstance(r_val, dict):
        for k, v in r_val.items():
            cols[k] = _value_array(v)
    else:
        cols["value"] = _value_array(r_val)
    cols["validity"] = pa.array(r_dur, pa.int64())
    return pa.table(cols)


def merge_pair_exact(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    op: MergeOp,
    out_source: str | None = None,
    compress: bool = True,
    max_rows: int = 20_000_000,
) -> ray.data.Dataset:
    """Exact whole-timeline merge of two named series from a points dataset.

    TIER-SIZED INPUTS ONLY: the constant grouping key funnels both series into
    ONE task (a deliberate exact path for rolled-up tiers). ``max_rows`` guards
    against reaching for this on raw points — the group task refuses oversized
    inputs and points the caller at the block-co-partitioned ``merge_blocks``
    (the scale path the driver queries gate)."""
    out_source = out_source or f"{source_a}+{source_b}"
    filtered = points.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("source"), value_set=pa.array([source_a, source_b]))
        ),
        batch_format="pyarrow",
    )

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows > max_rows:
            raise ValueError(
                f"merge_pair_exact is the single-task tier-sized path; got "
                f"{t.num_rows} rows > max_rows={max_rows}. Use merge_blocks "
                f"(block-co-partitioned) for raw-point-scale series."
            )
        a = _series_from_table(t, source_a)
        b = _series_from_table(t, source_b)
        return _merged_table(out_source, merge_sweep([a, b], op, compress))

    # single group: add a constant grouping key
    tagged = filtered.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(len(t), dtype=np.int64))),
        batch_format="pyarrow",
    )
    return tagged.groupby("_g").map_groups(
        lambda t: fn(t.drop_columns(["_g"])), batch_format="pyarrow"
    )


def merge_blocks(
    points: ray.data.Dataset,
    sources: list[str],
    op: MergeOp,
    out_source: str | None = None,
    block_width: int = 86_400_000,
) -> ray.data.Dataset:
    """N-ary block-co-partitioned merge (the scale path): every side's entries are
    split at time-block boundaries (the reference's TimeBucketer trick,
    ``TimeBucketer.scala``), tagged with their block, and merged independently per
    block — the all-to-all moves each point once, keyed by block_ts, with
    parallelism = number of blocks regardless of series length.

    Divergences from the global ``merge_pair_exact`` form, both repairable:

    - compression is block-local: run ``canonical.refit_canonical`` on the output
      to restore exact global compression (O(series x blocks) edge rows);
    - each per-block sweep covers only that block's local data hull, so an
      operator defined on (None, None) (e.g. ``op_minus`` with BOTH defaults)
      would not fill gaps spanning entirely-empty blocks. Every built-in OPS
      entry is undefined on (None, None), for which this path is exact; for a
      gap-filling op use ``merge_pair_exact`` (ADVICE r01)."""
    out_source = out_source or "+".join(sources)

    def split_tag(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_in(t.column("source"), value_set=pa.array(sources)))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
        n_ts, n_dur, b_ts, src_idx = bucket_split_arrays(ts, dur, block_width)
        out = t.take(pa.array(src_idx, pa.int64()))
        out = out.set_column(out.schema.get_field_index("ts"), "ts", pa.array(n_ts, pa.int64()))
        out = out.set_column(
            out.schema.get_field_index("validity"), "validity", pa.array(n_dur, pa.int64())
        )
        return out.append_column("block_ts", pa.array(b_ts, pa.int64()))

    def fn(t: pa.Table) -> pa.Table:
        series = [_series_from_table(t, s) for s in sources]
        return _merged_table(out_source, merge_sweep(series, op, compress=True))

    split = points.map_batches(split_tag, batch_format="pyarrow")
    return split.groupby("block_ts").map_groups(
        lambda t: fn(t.drop_columns(["block_ts"])), batch_format="pyarrow"
    )


def merge_pair_blocks(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    op: MergeOp,
    out_source: str | None = None,
    block_width: int = 86_400_000,
) -> ray.data.Dataset:
    """Binary convenience wrapper over :func:`merge_blocks` (see its caveats)."""
    return merge_blocks(points, [source_a, source_b], op, out_source, block_width)


def append_blocks(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    out_source: str | None = None,
) -> ray.data.Dataset:
    """Distributed append (reference ``TimeSeries.scala:216-231``): everything of
    ``a`` defined at ``t >= b.first.timestamp`` is overwritten by ``b``.

    Scale shape: one tiny pre-pass finds b's first timestamp (broadcast scalar);
    the splice itself is then a stateless per-batch map — no grouping at all.
    Junction compression (equal-value contiguous runs across the cut) is restored
    by ``refit_canonical`` on the output — but ONLY when the input's batch layout
    satisfies refit's cross-batch contract (see canonical.py's union-layout
    caveat); for events-derived series prefer the fused
    ``shardedderive.spliced_points_canonical``."""
    out_source = out_source or f"{source_a}+{source_b}"

    def only(src):
        return lambda t: t.filter(pa.compute.equal(t.column("source"), src))

    cut = points.map_batches(only(source_b), batch_format="pyarrow").min("ts")
    if cut is None:
        # b has no rows: reference append on an empty argument is identity —
        # keep all of a (cut beyond any timestamp; //2 avoids cut-ts overflow).
        cut = np.iinfo(np.int64).max // 2

    def splice(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.compute.is_in(t.column("source"), value_set=pa.array([source_a, source_b]))
        )
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False)).copy()
        is_a = src == source_a
        keep = ~is_a | (ts < cut)
        np.minimum(dur, np.where(is_a, cut - ts, np.iinfo(np.int64).max), out=dur)
        out = pa.table(
            {
                "source": pa.array(np.repeat(out_source, int(keep.sum()))),
                "ts": pa.array(ts[keep], pa.int64()),
                "value": t.column("value").filter(pa.array(keep)),
                "validity": pa.array(dur[keep], pa.int64()),
            }
        )
        return out

    return points.map_batches(splice, batch_format="pyarrow")


def prepend_blocks(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    out_source: str | None = None,
) -> ray.data.Dataset:
    """Distributed prepend (reference ``TimeSeries.scala:233-246``): everything of
    ``a`` defined at ``t < b.last.definedUntil`` is overwritten by ``b``. Same
    scale shape as :func:`append_blocks` (scalar pre-pass + stateless map)."""
    out_source = out_source or f"{source_b}+{source_a}"

    def ends_of_b(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("source"), source_b))
        return pa.table(
            {
                "end": pa.compute.add(
                    pa.compute.cast(t.column("ts"), pa.int64()),
                    pa.compute.cast(t.column("validity"), pa.int64()),
                )
            }
        )

    cut = points.map_batches(ends_of_b, batch_format="pyarrow").max("end")
    if cut is None:
        # b has no rows: prepend on an empty argument is identity — keep all
        # of a untrimmed (cut before any timestamp).
        cut = np.iinfo(np.int64).min // 2

    def splice(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.compute.is_in(t.column("source"), value_set=pa.array([source_a, source_b]))
        )
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        dur = np.asarray(t.column("validity").to_numpy(zero_copy_only=False))
        end = ts + dur
        is_a = src == source_a
        keep = ~is_a | (end > cut)
        n_ts = np.where(is_a, np.maximum(ts, cut), ts)
        n_dur = end - n_ts
        out = pa.table(
            {
                "source": pa.array(np.repeat(out_source, int(keep.sum()))),
                "ts": pa.array(n_ts[keep], pa.int64()),
                "value": t.column("value").filter(pa.array(keep)),
                "validity": pa.array(n_dur[keep], pa.int64()),
            }
        )
        return out

    return points.map_batches(splice, batch_format="pyarrow")
