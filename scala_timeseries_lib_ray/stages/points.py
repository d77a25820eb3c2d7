"""Points derivation stage: token table -> points.

Fully shuffle-free: the per-source ordinal is parsed from ``doc_id`` (O(1) per row)
and ts/validity are closed forms of the ordinal — one stateless ``map_batches``, no
pre-pass, no broadcast, no groupby. This is what makes the derivation viable at
10^12 sequences: the read is the only data movement.
"""

from __future__ import annotations

import ray.data

from ..sources.tokens import derive_points_batch


def derive_points(tokens: ray.data.Dataset) -> ray.data.Dataset:
    """tokens dataset -> points dataset (source, ts, value, validity)."""
    cols = ["doc_id", "n_tok", "source"]
    have = tokens.schema().names
    keep = [c for c in cols if c in have]
    return tokens.select_columns(keep).map_batches(
        derive_points_batch, batch_format="pyarrow"
    )
