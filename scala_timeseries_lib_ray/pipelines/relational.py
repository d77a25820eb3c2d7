"""Relational equi-join surface: the two join shapes a 100-TB pipeline needs.

- :func:`broadcast_join` — map-side join against a BOUNDED dimension table
  (the `ray.put`-once / gather-per-batch pattern): the small side is staged in
  the object store a single time and every task reads it zero-copy; the fact
  table streams through one stateless ``map_batches`` with NO shuffle. This is
  the correct plan whenever one side fits a worker heap (catalog, dimension,
  vocabulary, model table) — an all-to-all exchange for such a join would move
  the entire fact table for nothing.
- :func:`shuffle_join` — large-large equi-join via Ray Data's native
  partitioned hash join (``Dataset.join``), partition count sized by the
  caller to bound per-partition memory. Both sides move once; this is the
  fallback when neither side is broadcastable.

Joins compose with the engine's partial-aggregation idiom: join first inside
the same streaming pass, pre-aggregate per batch, and only then run the tiny
``groupby`` over partials (see ``q_part_brand_revenue``) — never shuffle joined
fact rows when a per-key reduction follows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _key_array(t: pa.Table, key: str) -> np.ndarray:
    return np.asarray(t.column(key).to_numpy(zero_copy_only=False))


def broadcast_join(
    large: ray.data.Dataset,
    small: ray.data.Dataset,
    key: str,
    right_key: str | None = None,
    columns: Sequence[str] | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Map-side equi-join: stream ``large``, gather matching ``small`` columns.

    ``small`` must be bounded (a dimension table): it is collected once into a
    (sorted keys, payload table) pair and broadcast via ``ray.put``; each task
    probes it with a vectorized ``searchsorted``. ``how`` is ``"inner"`` (drop
    unmatched fact rows) or ``"left"`` (keep them, null payload). Duplicate
    keys on the small side are rejected — a multi-valued dimension needs the
    shuffle join."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rk = right_key or key
    tables = [ray.get(r) for r in small.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        raise ValueError("broadcast_join: small side is empty")
    small_tbl = pa.concat_tables(tables)
    if columns is not None:
        small_tbl = small_tbl.select([rk, *columns])
    keys = _key_array(small_tbl, rk)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
        raise ValueError(f"broadcast_join: duplicate keys in small side on {rk!r}")
    payload = small_tbl.drop_columns([rk]).take(pa.array(order))
    clash = set(payload.column_names) & set(large.schema().names)
    if clash:
        raise ValueError(
            f"broadcast_join: payload columns {sorted(clash)} collide with the "
            f"large side — rename or prune via columns=[...]"
        )
    ref = ray.put((skeys, payload))

    def probe(t: pa.Table) -> pa.Table:
        sk, pl = ray.get(ref)
        k = _key_array(t, key)
        pos = np.searchsorted(sk, k)
        pos_c = np.minimum(pos, max(len(sk) - 1, 0))
        hit = (pos < len(sk)) & (sk[pos_c] == k) if len(sk) else np.zeros(len(k), bool)
        if how == "inner":
            t = t.filter(pa.array(hit))
            rows = pl.take(pa.array(pos_c[hit]))
        else:  # left: unmatched fact rows keep null payload via a masked take
            idx = pc.if_else(
                pa.array(hit), pa.array(pos_c, pa.int64()), pa.scalar(None, pa.int64())
            )
            rows = pl.take(idx)
        for name, col in zip(rows.column_names, rows.columns):
            t = t.append_column(name, col)
        return t

    return large.map_batches(probe, batch_format="pyarrow")


def shuffle_join(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large-large equi-join via Ray Data's partitioned hash join. Both sides
    are exchanged once, partitioned by key hash; ``num_partitions`` bounds the
    per-partition working set (size it to corpus / worker-heap). Prefer
    :func:`broadcast_join` whenever one side is a bounded dimension table."""
    return a.join(
        b,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )
