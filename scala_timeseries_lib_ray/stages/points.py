"""Points derivation stages: token table -> points, events/documents -> points.

The token-table path is shuffle-free: the per-source ordinal is parsed from
``doc_id`` (O(1) per row) and ts/validity are closed-form. Only the tiny per-source
max-ordinal table is broadcast (``ray.put`` once, read inside each task) so the final
doc of a source gets its terminal validity — the documented small-side-broadcast
pattern instead of a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.tokens import derive_points_batch, parse_ordinal


def derive_points(tokens: ray.data.Dataset) -> ray.data.Dataset:
    """tokens dataset -> points dataset (source, ts, value, validity)."""
    # tiny pre-pass: per-source max ordinal (aggregated from per-batch partials)
    def partial_max(t: pa.Table) -> pa.Table:
        from ..sources.tokens import DROP_EVERY

        r = parse_ordinal(t.column("doc_id"))
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        kept = (r % DROP_EVERY) != (DROP_EVERY - 1)  # max over KEPT ordinals
        r, src = r[kept], src[kept]
        order = np.argsort(src, kind="stable")
        s, r = src[order], r[order]
        change = np.ones(len(s), dtype=bool)
        change[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(change)
        mx = np.maximum.reduceat(r, starts) if len(starts) else np.zeros(0, np.int64)
        return pa.table({"source": pa.array(s[starts]), "mx": pa.array(mx, pa.int64())})

    from ray.data.aggregate import Max

    partials = tokens.select_columns(["doc_id", "source"]).map_batches(
        partial_max, batch_format="pyarrow"
    )
    small = partials.groupby("source").aggregate(Max("mx", alias_name="mx")).take_all()
    last_rank = {row["source"]: int(row["mx"]) for row in small}
    ref = ray.put(last_rank)

    def kernel(t: pa.Table) -> pa.Table:
        return derive_points_batch(t, ray.get(ref))

    return tokens.select_columns(["doc_id", "n_tok", "source"]).map_batches(
        kernel, batch_format="pyarrow"
    )
