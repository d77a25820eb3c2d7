"""1M-doc stress harness (the BASELINE.md "stress scale" corpus recipe).

Deterministic zipf-ish synthetic corpus — 1M docs, ~74.5M words over a 5k
vocab with pareto(1.1) rank skew, so the duplicated-gram candidate path is
genuinely boilerplate-loaded. Generates once to /tmp parquet (reused across
runs), then times the requested operator solo (one Ray cluster per process —
see NEXT.md measurement-discipline note).

Usage: python tools/stress_corpus.py --op dup_gram_fraction [--docs 1000000]
Ops: dup_gram_fraction | dup_ngrams | doc_top_terms | repetition_stats |
dedup_lines | dedup_spans | scrub_text | token_rarity | cross_source_dups
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# same host mitigations as bench.py (this VM serializes first-touch page
# faults — see BASELINE.md hardware notes); must be set before Ray spawns
os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "68719476736")
try:
    for _f in ("enabled", "defrag"):
        with open(f"/sys/kernel/mm/transparent_hugepage/{_f}", "w") as _fh:
            _fh.write("never")
except OSError:
    pass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_path(n_docs: int) -> str:
    path = f"/tmp/stress_corpus_{n_docs}.parquet"
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(5000)], dtype=object)
    t0 = time.time()
    lens = rng.integers(40, 110, n_docs)
    total = int(lens.sum())
    # zipf-ish: low ids much more frequent -> plenty of real duplicated 5-grams
    ranks = (rng.pareto(1.1, total) * 50).astype(np.int64) % 5000
    words = pa.array(vocab[ranks], pa.string())
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    import pyarrow.compute as pc

    texts = pc.binary_join(lists, " ")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "source": pa.array([f"s{i % 20}" for i in range(n_docs)]),
            "text": texts,
        }
    )
    pq.write_table(t, path, row_group_size=8192)
    print(f"generated {n_docs} docs / {total} words in {time.time()-t0:.1f}s -> {path}")
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    path = corpus_path(args.docs)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    from scala_timeseries_lib_ray.pipelines import corpus as C

    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    t0 = time.time()
    if args.op == "dup_gram_fraction":
        out = C.dup_gram_fraction(docs)
        n = out.count()
    elif args.op == "dup_ngrams":
        out = C.duplicate_ngrams(docs)
        n = out.count()
    elif args.op == "doc_top_terms":
        out = C.doc_top_terms(docs)
        n = out.count()
    elif args.op == "repetition_stats":
        out = C.repetition_stats(docs)
        n = out.count()
    elif args.op == "dedup_lines":
        # re-line the single-line corpus deterministically (every 12 words ->
        # one line) so line counts/winners are genuinely loaded
        def reline(t):
            import pyarrow.compute as pc

            x = pc.replace_substring_regex(
                t.column("text"), r"((?:\S+ ){11}\S+) ", "\\1\n"
            )
            return pa.table({"doc_id": t.column("doc_id"), "text": x})

        out = C.dedup_lines(docs.map_batches(reline, batch_format="pyarrow"))
        n = out.count()
    elif args.op == "scrub_text":
        out = C.scrub_text(docs)
        n = out.count()
    elif args.op == "dedup_spans":
        out = C.dedup_spans(docs)
        n = out.count()
    elif args.op == "token_rarity":
        out = C.token_rarity(docs)
        n = out.count()
    elif args.op == "cross_source_dups":
        # needs the source column: re-read with it (same cached corpus)
        docs2 = ray.data.read_parquet(path, columns=["source", "text"])
        out = C.cross_source_dups(docs2)
        n = out.count()
    else:
        raise SystemExit(f"unknown op {args.op}")
    wall = time.time() - t0
    print(f"{args.op}: {wall:.1f}s, {n} rows, {args.docs/wall/1000:.0f}k docs/s")
    ray.shutdown()


if __name__ == "__main__":
    main()
