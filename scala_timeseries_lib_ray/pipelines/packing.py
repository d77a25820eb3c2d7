"""Sequence packing for LLM pretraining — concat-and-chunk over the corpus.

The standard GPT-style data layout concatenates every tokenized document in a
fixed global order and slices the stream into fixed-length training examples
(``ctx`` tokens each).  At 100 TB the only thing that must be global is each
document's OFFSET into the concatenated token stream — a prefix sum.  Everything
else is a stateless closed form of that offset:

    first_example = offset // ctx
    last_example  = (offset + n_tok - 1) // ctx

So the whole operator is the engine's standard two-streaming-pass shape (the
same one ``stages/shardedderive.tokens_from_documents_sharded`` and
``stages/joinstage.prefix_sum_sharded`` use):

  pass 1  counting pre-pass: per row-range block, one row ``(block_min_doc_id,
          sum(n_tok))`` — O(blocks) rows total, broadcast via ``ray.put`` as
          cumulative carry-ins keyed by block_min.
  pass 2  stateless map: block-local cumsum + broadcast carry-in → per-doc
          offsets and example spans.  No shuffle anywhere; parallelism is
          #blocks, independent of document sizes.

Both passes rely on the documents catalog's stated global doc_id sort order
(row-range blocks of a sorted file are contiguous doc_id ranges) — the same
layout contract as the other sharded derivations; a blocking mismatch between
the passes raises instead of mis-packing (ADVICE r02).

Token counts are the engine's deterministic derivation from the documents
table (``sources/tokens.py``): ``n_tok = 16 + (31*n_chars + 7*doc_id) % 2033``,
exactly mirrorable in the DuckDB oracle.

Reference parity note: the reference library has no packing operator (it is a
time-series engine); this belongs to the training-data-pipeline surface the
builder brief adds on top of SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.tokens import NTOK_MIN, NTOK_MOD


def _ntok_from_docs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, n_tok) for a documents block — the closed-form token counts."""
    did = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False), dtype=np.int64)
    nch = np.asarray(t.column("n_chars").to_numpy(zero_copy_only=False), dtype=np.int64)
    n_tok = NTOK_MIN + (31 * nch + 7 * did) % NTOK_MOD
    return did, n_tok


def _block_token_offsets(docs: ray.data.Dataset) -> tuple[object, int]:
    """Counting pre-pass: cumulative token carry-in per block (keyed by the
    block's min doc_id), plus the corpus-total token count.

    Returns ``(ray.put(dict block_min -> carry_in), total_tokens)``.
    """

    def partial(t: pa.Table) -> pa.Table:
        did, n_tok = _ntok_from_docs(t)
        if len(did) == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"block_min": empty, "block_max": empty,
                             "n_docs": empty, "s": empty})
        return pa.table(
            {
                "block_min": pa.array([int(did.min())], pa.int64()),
                "block_max": pa.array([int(did.max())], pa.int64()),
                "n_docs": pa.array([len(did)], pa.int64()),
                "s": pa.array([int(n_tok.sum())], pa.int64()),
            }
        )

    tiny = docs.map_batches(partial, batch_size=None, batch_format="pyarrow").take_all()
    # carry-in keyed by the full block fingerprint (min, max, n_docs): a scan
    # block whose doc_id range merely SHARES a recorded min (re-blocked or
    # reordered ranges) must fail the lookup, not silently mis-pack (ADVICE r03)
    carry: dict[int, tuple[int, int, int]] = {}
    acc = 0
    prev_max = None
    for row in sorted(tiny, key=lambda r: r["block_min"]):
        if row["block_min"] in carry or (
            prev_max is not None and row["block_min"] <= prev_max
        ):
            raise ValueError(
                "pack pre-pass: overlapping doc_id ranges between blocks — the "
                "documents catalog is not globally doc_id-sorted"
            )
        carry[row["block_min"]] = (acc, row["block_max"], row["n_docs"])
        prev_max = row["block_max"]
        acc += row["s"]
    return ray.put(carry), acc


def _carry_base(carry: dict, did: np.ndarray, op: str) -> int:
    """Look up a scan block's carry-in, asserting the block matches the
    pre-pass fingerprint (min, max, n_docs) exactly."""
    bmin = int(did.min())
    try:
        base, bmax, nd = carry[bmin]
    except KeyError:
        # Count and scan passes saw different blocking — a silent 0 would
        # mis-pack every document in the block.
        raise KeyError(
            f"{op}: no pre-pass carry-in for block_min={bmin}; "
            f"count/scan blocking mismatch"
        ) from None
    if int(did.max()) != bmax or len(did) != nd:
        raise ValueError(
            f"{op}: scan block (min={bmin}, max={int(did.max())}, "
            f"n_docs={len(did)}) does not match the pre-pass block "
            f"(max={bmax}, n_docs={nd}); count/scan blocking mismatch"
        )
    return base


def pack_sequences(docs: ray.data.Dataset, ctx: int = 1024) -> ray.data.Dataset:
    """Per-document packing map: where each document lands in the
    concatenated-and-chunked example stream.

    Output (one row per document — the manifest a loader needs to locate any
    document's tokens inside the packed examples):
        doc_id, n_tok, tok_offset, first_example, last_example
    """
    if ctx <= 0:
        raise ValueError(f"ctx must be positive, got {ctx}")
    ref, _total = _block_token_offsets(docs)

    def scan(t: pa.Table) -> pa.Table:
        carry = ray.get(ref)
        did, n_tok = _ntok_from_docs(t)
        n = len(did)
        if n == 0:
            empty = pa.array([], pa.int64())
            return pa.table(
                {"doc_id": empty, "n_tok": empty, "tok_offset": empty,
                 "first_example": empty, "last_example": empty}
            )
        base = _carry_base(carry, did, "pack_sequences")
        order = np.argsort(did, kind="stable")
        s_did, s_tok = did[order], n_tok[order]
        off = base + np.concatenate([[0], np.cumsum(s_tok[:-1])])
        return pa.table(
            {
                "doc_id": pa.array(s_did, pa.int64()),
                "n_tok": pa.array(s_tok, pa.int64()),
                "tok_offset": pa.array(off, pa.int64()),
                "first_example": pa.array(off // ctx, pa.int64()),
                "last_example": pa.array((off + s_tok - 1) // ctx, pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_size=None, batch_format="pyarrow")


def pack_examples(docs: ray.data.Dataset, ctx: int = 1024) -> ray.data.Dataset:
    """Per-example summary of the packed stream: for each ctx-token training
    example, how many documents contribute to it and how many tokens it holds
    (= ctx except possibly the tail example).

    Scale shape: each block emits PARTIAL per-example doc counts (examples are
    contiguous within a block, so a block of B tokens emits ~B/ctx partial
    rows); a small ``groupby(example_id)`` over those partials finalizes.  The
    shuffle moves O(total_tokens/ctx) 16-byte rows, never the corpus.
    """
    if ctx <= 0:
        raise ValueError(f"ctx must be positive, got {ctx}")
    ref, total = _block_token_offsets(docs)

    def partial(t: pa.Table) -> pa.Table:
        carry = ray.get(ref)
        did, n_tok = _ntok_from_docs(t)
        n = len(did)
        if n == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"example_id": empty, "n_docs": empty})
        base = _carry_base(carry, did, "pack_examples")
        order = np.argsort(did, kind="stable")
        s_tok = n_tok[order]
        off = base + np.concatenate([[0], np.cumsum(s_tok[:-1])])
        first = off // ctx
        last = (off + s_tok - 1) // ctx
        # Each doc contributes +1 to every example in [first, last] — a
        # difference array over the block's contiguous example range turns the
        # interval-add into two scatters + one cumsum (no per-doc loop).
        lo, hi = int(first.min()), int(last.max())
        diff = np.zeros(hi - lo + 2, dtype=np.int64)
        np.add.at(diff, first - lo, 1)
        np.add.at(diff, last - lo + 1, -1)
        counts = np.cumsum(diff[:-1])
        ex = np.arange(lo, hi + 1, dtype=np.int64)
        keep = counts > 0
        return pa.table(
            {"example_id": pa.array(ex[keep], pa.int64()),
             "n_docs": pa.array(counts[keep], pa.int64())}
        )

    partials = docs.map_batches(partial, batch_size=None, batch_format="pyarrow")
    summed = partials.groupby("example_id").sum("n_docs")

    def finalize(t: pa.Table) -> pa.Table:
        ex = np.asarray(t.column("example_id").to_numpy(zero_copy_only=False))
        nd = np.asarray(t.column("sum(n_docs)").to_numpy(zero_copy_only=False))
        n_tokens = np.minimum(ctx, total - ex * ctx)
        return pa.table(
            {
                "example_id": pa.array(ex, pa.int64()),
                "n_docs": pa.array(nd.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            }
        )

    return summed.map_batches(finalize, batch_size=None, batch_format="pyarrow")
