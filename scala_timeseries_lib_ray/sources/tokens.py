"""The pre-tokenized-sequence input table and its derivation into points.

Input schema (BASELINE.json ``input_hint``):
    doc_id:string  tokens:list<int32>  n_tok:int32  source:string

Everything here is deterministic and closed-form so that the derivation is
embarrassingly parallel at 10^12-sequence scale (no shuffle needed when the
per-source ordinal is parseable from ``doc_id``) and exactly mirrorable in ANSI SQL
for the DuckDB oracle.

Derivation rules (engine-wide constants):
- ordinal ``r`` = rank of the doc within its source (dense, 0-based)
- ``ts   = T0 + 2800*r + (r*37) % 250``           (deterministic jitter; 2800 is not a
  divisor of any tier width, so entries drift across bucket boundaries and the
  boundary-splitting path is exercised)
- rows with ``r % 17 == 16`` are dropped           (deliberate holes)
- ``validity = min(ts(next_kept_ordinal) - ts, 4000)`` for EVERY row (closed form —
  the last kept doc of a source uses the same formula, so the derivation needs no
  per-source state at all and is a single stateless map_batches)
- ``value = n_tok`` (the numeric signal rolled up across tiers; the reference archive
  layer is Double-only, ``archive/package.scala:32-35``)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

T0 = 1_700_000_000_000  # epoch-ms origin of the synthetic timeline
JITTER_MOD = 250
JITTER_MUL = 37
SPACING = 2800
DROP_EVERY = 17  # ordinal r with r % 17 == 16 is dropped
VALIDITY_CAP = 4000
VOCAB = 50257
NTOK_MIN, NTOK_MOD = 16, 2033  # n_tok = 16 + mix % 2033  -> [16, 2048]


def _rank_ts(r: np.ndarray) -> np.ndarray:
    return T0 + SPACING * r + (r * JITTER_MUL) % JITTER_MOD


def synth_token_batch(source: str, r_lo: int, r_hi: int, seed: int = 42) -> pa.Table:
    """Deterministic token rows for ordinals [r_lo, r_hi) of one source.

    ``n_tok = 16 + (r*31 + seed*7) % 2033``; ``tokens[j] = (seed*r + j) % 50257``
    (FIXTURES.md §1). Same bytes at every invocation.
    """
    r = np.arange(r_lo, r_hi, dtype=np.int64)
    n_tok = (NTOK_MIN + (r * 31 + seed * 7) % NTOK_MOD).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
    total = int(offsets[-1])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    flat = ((seed * np.repeat(r, n_tok) + j) % VOCAB).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat))
    doc_id = pa.array([f"{source}-{int(x):08d}" for x in r])
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array([source] * len(r)),
        }
    )


def zipf_source_counts(n_docs: int, n_sources: int = 8) -> dict[str, int]:
    """Zipf-ish skewed per-source row counts summing to ~n_docs (hot first source)."""
    w = 1.0 / np.arange(1, n_sources + 1)
    w /= w.sum()
    counts = np.maximum((w * n_docs).astype(np.int64), 1)
    return {f"src{i}": int(c) for i, c in enumerate(counts)}


def write_synth_token_table(path: str, n_docs: int, n_sources: int = 8, seed: int = 42,
                            rows_per_file: int = 250_000) -> dict[str, int]:
    """Materialize the synthetic token table as a partitioned parquet dir (one file
    per (source, ordinal-range) shard — the resumable layout). Returns counts."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    counts = zipf_source_counts(n_docs, n_sources)
    for source, cnt in counts.items():
        for lo in range(0, cnt, rows_per_file):
            hi = min(lo + rows_per_file, cnt)
            fn = os.path.join(path, f"{source}-{lo:010d}.parquet")
            if not os.path.exists(fn):
                pq.write_table(synth_token_batch(source, lo, hi, seed), fn)
    return counts


def parse_ordinal(doc_id_col) -> np.ndarray:
    """Parse the per-source ordinal out of ``doc_id = '<source>-<r:08d>'`` (O(1) per
    row, no shuffle — 'time-bucket derived from doc_id order'). The ordinal is the
    suffix after the LAST '-', regardless of width: '%08d' grows past 8 digits
    beyond 10^8 ordinals, so a fixed-width slice would silently truncate at
    10^12-sequence scale (ADVICE r01)."""
    import pyarrow.compute as pc

    parts = pc.replace_substring_regex(doc_id_col, r"^.*-", "")
    return np.asarray(parts.cast(pa.int64()))


def derive_points_batch(batch: pa.Table) -> pa.Table:
    """token rows -> points rows (fully stateless map_batches kernel; validity is a
    closed form of the ordinal so no per-source state or broadcast is needed)."""
    r = parse_ordinal(batch.column("doc_id"))
    keep = (r % DROP_EVERY) != (DROP_EVERY - 1)
    r = r[keep]
    src = np.asarray(batch.column("source").to_numpy(zero_copy_only=False))[keep]
    value = np.asarray(batch.column("n_tok").to_numpy(zero_copy_only=False), dtype=np.float64)[keep]
    ts = _rank_ts(r)
    # next kept ordinal: r+1 unless dropped, then r+2
    nxt = np.where(((r + 1) % DROP_EVERY) == (DROP_EVERY - 1), r + 2, r + 1)
    validity = np.minimum(_rank_ts(nxt) - ts, VALIDITY_CAP)
    return pa.table(
        {
            "source": pa.array(src),
            "ts": pa.array(ts, type=pa.int64()),
            "value": pa.array(value, type=pa.float64()),
            "validity": pa.array(validity.astype(np.int64), type=pa.int64()),
        }
    )


def tokens_from_documents(
    doc_batch: pa.Table,
    seed: int = 42,
    with_tokens: bool = True,
    rank_offset=None,
) -> pa.Table:
    """Derive a token table deterministically from the driver's ``documents`` table
    (doc_id:int64, source, n_chars): ``n_tok = 16 + (31*n_chars + 7*doc_id) % 2033``,
    ``doc_id_str = '<source>-<dense_rank:08d>'`` — needs per-source dense ranks:
    either the caller groups by source first (whole-series groups; test scale), or
    passes ``rank_offset(source) -> int`` with the count of same-source docs in
    earlier shards (the sharded two-pass path, stages/shardedderive.py)."""

    src = np.asarray(doc_batch.column("source").to_numpy(zero_copy_only=False))
    did = np.asarray(doc_batch.column("doc_id").to_numpy(zero_copy_only=False))
    nch = np.asarray(doc_batch.column("n_chars").to_numpy(zero_copy_only=False))
    order = np.lexsort((did, src))
    src, did, nch = src[order], did[order], nch[order]
    # dense rank within source (input grouped by source, or shard-local + offset)
    new_src = np.ones(len(src), dtype=bool)
    if len(src) > 1:
        new_src[1:] = src[1:] != src[:-1]
    idx = np.arange(len(src), dtype=np.int64)
    r = idx - np.maximum.accumulate(np.where(new_src, idx, 0))
    if rank_offset is not None and len(src):
        starts = np.flatnonzero(new_src)
        offs = np.asarray([rank_offset(src[i]) for i in starts], dtype=np.int64)
        r = r + np.repeat(offs, np.diff(np.append(starts, len(src))))
    n_tok = (NTOK_MIN + (31 * nch + 7 * did) % NTOK_MOD).astype(np.int32)
    cols = {
        "doc_id": pa.array([f"{s}-{int(x):08d}" for s, x in zip(src, r)]),
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(src),
    }
    if with_tokens:
        # token payload keyed by the per-source ordinal (same closed form as
        # synth_token_batch) so the array is regenerable from doc_id alone — the
        # per-row token-array-equality invariant is checkable at any tier
        offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
        j = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
        flat = ((seed * np.repeat(r, n_tok) + j) % VOCAB).astype(np.int32)
        cols["tokens"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(flat)
        )
    return pa.table(cols)
