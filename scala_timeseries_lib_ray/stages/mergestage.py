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


def _merged_table(out_source: str, r):
    r_ts, r_val, r_dur = r
    cols = {
        "source": pa.array(np.repeat(out_source, len(r_ts))),
        "ts": pa.array(r_ts, pa.int64()),
    }
    if isinstance(r_val, dict):
        for k, v in r_val.items():
            cols[k] = pa.array(np.asarray(v, dtype=np.float64), pa.float64())
    else:
        cols["value"] = pa.array(np.asarray(r_val, dtype=np.float64), pa.float64())
    cols["validity"] = pa.array(r_dur, pa.int64())
    return pa.table(cols)


def merge_pair_exact(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    op: MergeOp,
    out_source: str | None = None,
    compress: bool = True,
) -> ray.data.Dataset:
    """Exact whole-timeline merge of two named series from a points dataset."""
    out_source = out_source or f"{source_a}+{source_b}"
    filtered = points.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("source"), value_set=pa.array([source_a, source_b]))
        ),
        batch_format="pyarrow",
    )

    def fn(t: pa.Table) -> pa.Table:
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


def merge_pair_blocks(
    points: ray.data.Dataset,
    source_a: str,
    source_b: str,
    op: MergeOp,
    out_source: str | None = None,
    block_width: int = 86_400_000,
) -> ray.data.Dataset:
    """Block-co-partitioned merge: split each side's entries at block edges, merge
    per block. Compression is block-local."""
    out_source = out_source or f"{source_a}+{source_b}"

    def split_tag(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.compute.is_in(t.column("source"), value_set=pa.array([source_a, source_b]))
        )
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
        a = _series_from_table(t, source_a)
        b = _series_from_table(t, source_b)
        return _merged_table(out_source, merge_sweep([a, b], op, compress=True))

    split = points.map_batches(split_tag, batch_format="pyarrow")
    return split.groupby("block_ts").map_groups(
        lambda t: fn(t.drop_columns(["block_ts"])), batch_format="pyarrow"
    )
