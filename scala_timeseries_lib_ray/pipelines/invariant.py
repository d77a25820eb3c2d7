"""The per-row token-array-equality invariant (BASELINE.json ``input_hint``).

The token payload column must pass through the engine untouched. Because the payload
is a deterministic closed form of ``(doc_id, n_tok)``, any table that still carries
``doc_id``/``tokens`` can be audited at any point of the pipeline by regenerating the
expected array per row and comparing — a stateless, shuffle-free ``map_batches``
audit that scales to the full input (no driver-side materialization; the result is a
per-batch violation count folded by a tiny aggregation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.tokens import VOCAB, parse_ordinal


def check_tokens_batch(t: pa.Table, seed: int = 42) -> pa.Table:
    """-> one row per batch: (rows, mismatches)."""
    r = parse_ordinal(t.column("doc_id"))
    tok = t.column("tokens").combine_chunks()
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.chunk(0)
    offsets = np.asarray(tok.offsets)
    flat = np.asarray(tok.values)
    n_tok = np.asarray(t.column("n_tok").to_numpy(zero_copy_only=False), dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    bad_len = int(np.sum(lens != n_tok))
    j = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), lens)
    expect = (seed * np.repeat(r, lens) + j) % VOCAB
    mism_rows = np.zeros(len(t), dtype=bool)
    bad = flat != expect
    if bad.any():
        row_of = np.repeat(np.arange(len(t)), lens)
        mism_rows[np.unique(row_of[bad])] = True
    return pa.table(
        {
            "rows": pa.array([len(t)], pa.int64()),
            "mismatches": pa.array([bad_len + int(mism_rows.sum())], pa.int64()),
        }
    )


def verify_tokens(tokens: ray.data.Dataset, seed: int = 42) -> dict[str, int]:
    """Audit the whole dataset; returns {'rows': n, 'mismatches': m}."""
    from ray.data.aggregate import Sum

    per_batch = tokens.map_batches(
        lambda t: check_tokens_batch(t, seed), batch_format="pyarrow"
    )
    row = per_batch.aggregate(Sum("rows", alias_name="rows"), Sum("mismatches", alias_name="mismatches"))
    return {"rows": int(row["rows"]), "mismatches": int(row["mismatches"])}
