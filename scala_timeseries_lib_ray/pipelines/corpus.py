"""Corpus-statistics operators for the training-data pipeline surface.

Three exact, oracle-checkable operations a 100-TB text pipeline runs routinely:

- :func:`token_topk` — global top-k token frequencies (tokenizer-vocabulary
  building / heavy hitters). Canonical combiner shape: a vectorized per-batch
  ``value_counts`` partial shrinks each batch to its DISTINCT words before the
  ``groupby(word)`` shuffle, so the all-to-all moves |batch vocabulary| rows,
  not |tokens|. Top-k selection is two-level (per-block k then a k×blocks
  merge), never a full vocabulary sort.
- :func:`value_quantiles` — exact per-key quantiles of a bounded-cardinality
  value column via a distributed counting histogram: per-batch (key, value)
  counts -> ``groupby`` sum -> closed-form rank lookup per key. Exact whenever
  value cardinality is bounded (lengths, counts, scores on a grid); for
  unbounded floats use a sketch instead (reservoir in ``functions/stats.py``).
- :func:`hash_sample` — deterministic hash-based corpus sampling (keep
  ``md5(doc_id) % mod == keep``): the standard reproducible downsampling and
  train/eval split primitive. Stateless filter map_batches — no shuffle, no
  randomness, resumable by construction.

All three mirror DuckDB closed forms for the driver's exact-hash oracle
(md5_number_lower parity per ``dataprep.md5_u64``; quantile rule = smallest
value with CDF >= p, DuckDB ``quantile_disc``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dataprep import _WORD_SPLIT_RE, md5_u64, md5_u64_strings, size_parts


def _token_counts_batch(t: pa.Table) -> pa.Table:
    """Per-batch (word, cnt) partials: Arrow tokenizer + value_counts — the
    map-side combiner (C-speed, no Python per-token work)."""
    low = pc.utf8_lower(t.column("text"))
    flat = pc.list_flatten(pc.split_pattern_regex(low, _WORD_SPLIT_RE))
    flat = flat.filter(pc.not_equal(pc.utf8_length(flat), 0))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    vc = pc.value_counts(flat)
    return pa.table(
        {"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
    )


def _topk_table(t: pa.Table, k: int) -> pa.Table:
    """Deterministic top-k rows by (cnt desc, word asc)."""
    w = np.asarray(t.column("word").to_numpy(zero_copy_only=False))
    c = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False))
    order = np.lexsort((w, -c))[:k]
    return pa.table({"word": pa.array(w[order]), "cnt": pa.array(c[order], pa.int64())})


def _combine_counts(t: pa.Table, keys: tuple[str, ...] = ("word",)) -> pa.Table:
    """Block-local (keys)->sum(cnt) combine via Arrow's C++ hash aggregation."""
    g = t.group_by(list(keys)).aggregate([("cnt", "sum")])
    return g.rename_columns(list(keys) + ["cnt"])


def token_topk(
    docs: ray.data.Dataset,
    k: int = 100,
    fanin: tuple[int, ...] = (32, 1),
    combine: str = "tree",
) -> ray.data.Dataset:
    """Global top-k word frequencies with a deterministic (cnt desc, word asc)
    tie-break.

    Scale shape: per-batch ``value_counts`` partials (|batch vocab| rows each),
    then a map-only TREE combine (Arrow hash-aggregate inside each coalesced
    block — counts are associative, so key placement never matters), then top-k
    in the root task. Ray's sort-based ``groupby(word)`` was measured 25x
    slower on the same 11M partial rows (63 s vs 2.5 s of useful work at 1M
    docs — string-key sort shuffle), so the tree is the default here exactly as
    in ``stages/rollup._tree_combine``. The root fan-in of 1 bounds the last
    task at ``fanin[-2] × |vocab|`` rows — fine for any real tokenizer
    vocabulary; for an unbounded key space pass ``combine="groupby"``: a
    word-hash exchange co-locates each key exactly once, per-block top-k
    candidates then merge exactly in the root (a global top-k word is by
    definition in its own block's top-k), so no task ever holds the full
    vocabulary."""
    counts = docs.map_batches(_token_counts_batch, batch_format="pyarrow")
    if combine == "groupby":
        from ray.data.aggregate import Sum

        g = counts.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
        cands = g.map_batches(lambda t: _topk_table(t, k), batch_format="pyarrow")
        return cands.repartition(1).map_batches(
            lambda t: _topk_table(t, k), batch_size=None, batch_format="pyarrow"
        )
    for f in fanin[:-1]:
        counts = counts.repartition(f).map_batches(
            _combine_counts, batch_size=None, batch_format="pyarrow"
        )
    return counts.repartition(fanin[-1]).map_batches(
        lambda t: _topk_table(_combine_counts(t), k),
        batch_size=None,
        batch_format="pyarrow",
    )


def _key_value_counts_batch(t: pa.Table, key: str, value_col: str) -> pa.Table:
    """Per-batch (key, value, cnt) histogram partials."""
    karr = t.column(key)
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    codes_arr = pc.dictionary_encode(karr)
    codes = np.asarray(codes_arr.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    vocab = codes_arr.dictionary
    vals = np.asarray(t.column(value_col).to_numpy(zero_copy_only=False), dtype=np.int64)
    pairs, cnt = np.unique(np.stack([codes, vals], axis=1), axis=0, return_counts=True)
    return pa.table(
        {
            key: vocab.take(pa.array(pairs[:, 0], pa.int64())),
            value_col: pa.array(pairs[:, 1], pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def value_quantiles(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    names: tuple[str, ...] = ("p50", "p90", "p99"),
) -> ray.data.Dataset:
    """Exact per-key quantiles of an integer-valued column via a distributed
    counting histogram (quantile rule: smallest value with CDF >= p, i.e.
    1-based rank ``ceil(p*n)`` — matching DuckDB ``quantile_disc``).

    The exchanges move (key, value, cnt) histogram rows — bounded by value
    cardinality × keys, independent of row count — through the same map-only
    tree combine as :func:`token_topk` (Ray's sort-based groupby measured 25x
    slower on string-keyed partials). Per-key extraction is a closed-form rank
    lookup over the combined histogram in the root task."""

    hist = ds.map_batches(
        lambda t: _key_value_counts_batch(t, key, value_col), batch_format="pyarrow"
    )
    hist = hist.repartition(32).map_batches(
        lambda t: _combine_counts(t, (key, value_col)),
        batch_size=None,
        batch_format="pyarrow",
    )

    def extract(t: pa.Table) -> pa.Table:
        t = _combine_counts(t, (key, value_col))
        karr = np.asarray(t.column(key).to_numpy(zero_copy_only=False))
        vals = np.asarray(t.column(value_col).to_numpy(zero_copy_only=False))
        cnts = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False))
        order = np.lexsort((vals, karr))
        karr, vals, cnts = karr[order], vals[order], cnts[order]
        starts = np.flatnonzero(np.r_[True, karr[1:] != karr[:-1]])
        ends = np.append(starts[1:], len(karr))
        out: dict[str, list] = {key: [], "n": [], **{m: [] for m in names}}
        for s, e in zip(starts, ends):
            cum = np.cumsum(cnts[s:e])
            n = int(cum[-1])
            out[key].append(karr[s])
            out["n"].append(n)
            for p, name in zip(ps, names):
                # discrete quantile = smallest value with CDF >= p: 1-based rank
                # ceil(p*n) in float64, mirroring quantile_disc's double math
                rank = max(1, int(np.ceil(p * n)))
                j = int(np.searchsorted(cum, rank, side="left"))
                out[name].append(int(vals[s + j]))
        return pa.table(
            {
                key: pa.array(out[key], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                **{m: pa.array(out[m], pa.int64()) for m in names},
            }
        )

    return hist.repartition(1).map_batches(
        extract, batch_size=None, batch_format="pyarrow"
    )


def token_trends(
    docs_ts: ray.data.Dataset,
    width: int,
    k: int = 3,
    fanin: tuple[int, ...] = (32,),
    combine: str = "tree",
) -> ray.data.Dataset:
    """Top-k tokens PER TIME BUCKET (trending-vocabulary / drift monitoring):
    the windowed composition of :func:`token_topk` with the engine's bucket
    grid. Input needs (ts, text) columns; output is (bucket_ts, word, cnt),
    ≤ k rows per bucket, deterministic (cnt desc, word asc) within a bucket.

    Same scale shape as token_topk: per-batch Arrow hash-aggregate partials on
    (bucket, word), map-only tree combine, per-bucket top-k extracted in the
    root task (bounded at fanin[-1] × |buckets × vocab| rows). When the
    bucket × vocab cross product outgrows one block, pass ``combine="groupby"``:
    the (bucket, word) exchange makes every key globally unique, so per-block
    per-bucket top-k candidates merge exactly in a (buckets × k)-sized root."""

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t.column("ts").to_numpy(zero_copy_only=False))
        bucket = (ts // width) * width
        low = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(low, _WORD_SPLIT_RE)
        counts = np.asarray(pc.list_value_length(lists).to_numpy(zero_copy_only=False))
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(pc.utf8_length(flat), 0)
        row_bucket = np.repeat(bucket, counts)[
            np.asarray(keep.to_numpy(zero_copy_only=False))
        ]
        flat = flat.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        raw = pa.table(
            {
                "bucket_ts": pa.array(row_bucket, pa.int64()),
                "word": flat,
                "cnt": pa.array(np.ones(len(row_bucket), dtype=np.int64)),
            }
        )
        return _combine_counts(raw, ("bucket_ts", "word"))

    hist = docs_ts.map_batches(partial, batch_format="pyarrow")
    if combine == "groupby":
        from ray.data.aggregate import Sum

        hist = hist.groupby(["bucket_ts", "word"]).aggregate(Sum("cnt", alias_name="cnt"))
    else:
        for f in fanin:
            hist = hist.repartition(f).map_batches(
                lambda t: _combine_counts(t, ("bucket_ts", "word")),
                batch_size=None,
                batch_format="pyarrow",
            )

    def per_bucket_topk(t: pa.Table) -> pa.Table:
        t = _combine_counts(t, ("bucket_ts", "word"))
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket_ts": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        b = np.asarray(t.column("bucket_ts").to_numpy(zero_copy_only=False))
        w = np.asarray(t.column("word").to_numpy(zero_copy_only=False))
        c = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False))
        order = np.lexsort((w, -c, b))
        b, w, c = b[order], w[order], c[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        gid = np.cumsum(np.r_[True, b[1:] != b[:-1]]) - 1
        off = np.arange(len(b)) - starts[gid]
        m = off < k
        return pa.table(
            {
                "bucket_ts": pa.array(b[m], pa.int64()),
                "word": pa.array(w[m]),
                "cnt": pa.array(c[m], pa.int64()),
            }
        )

    if combine == "groupby":
        # keys are globally unique post-exchange: per-block per-bucket top-k
        # candidates bound the root at |blocks| x |buckets| x k rows
        hist = hist.map_batches(per_bucket_topk, batch_format="pyarrow")
    return hist.repartition(1).map_batches(
        per_bucket_topk, batch_size=None, batch_format="pyarrow"
    )


def hash_sample(
    docs: ray.data.Dataset, mod: int = 20, keep: int = 0, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic hash sampling: keep rows where ``md5(str(id)) % mod == keep``.

    Reproducible (no RNG, no state), stream-safe, and composable into disjoint
    train/eval splits by varying ``keep``. The md5-of-decimal-string key is the
    oracle-parity form; a production variant over int64 ids would use a
    vectorized integer mix (splitmix64) with identical structure."""

    def f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        h = md5_u64_strings(pc.cast(t.column(id_col), pa.string()))
        return t.filter(pa.array((h % np.uint64(mod)) == np.uint64(keep)))

    return docs.map_batches(f, batch_format="pyarrow")


def _word_codes_batch(t: pa.Table) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Shared tokenizer front-end: (doc_ids, flat word array, per-word doc index,
    per-doc word counts) — empty tokens already dropped, everything vectorized."""
    ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
    low = pc.utf8_lower(t.column("text"))
    lists = pc.split_pattern_regex(low, _WORD_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    wcounts = np.asarray(pc.list_value_length(lists).to_numpy(zero_copy_only=False), np.int64)
    words = lists.flatten()
    nonempty = np.asarray(
        pc.not_equal(pc.binary_length(words), 0).to_numpy(zero_copy_only=False)
    )
    W = words.filter(pa.array(nonempty))
    docpos = np.repeat(np.arange(len(ids), dtype=np.int64), wcounts)[nonempty]
    counts = (
        np.bincount(docpos, minlength=len(ids)).astype(np.int64)
        if len(docpos)
        else np.zeros(len(ids), np.int64)
    )
    return ids, W, docpos, counts


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc repetition/quality metrics in the Gopher-rules family: word count,
    distinct-word count, the top word's occurrence count, bigram count and the
    top bigram's occurrence count, plus the derived fractions (top_word_frac,
    distinct_ratio, top_bigram_frac — exact int/int IEEE divisions, denominator
    clamped to >=1 so empty docs emit zeros, mirroring the SQL oracle verbatim).

    High top_word_frac / top_bigram_frac or low distinct_ratio flags the
    boilerplate and looped text a pretraining filter drops. Stateless
    map_batches — no shuffle, embarrassingly parallel at any scale."""

    def f(t: pa.Table) -> pa.Table:
        ids, W, docpos, counts = _word_codes_batch(t)
        nd = len(ids)
        codes_arr = pc.dictionary_encode(W)
        codes = (
            np.asarray(codes_arr.indices.to_numpy(zero_copy_only=False), np.int64)
            if len(W)
            else np.empty(0, np.int64)
        )
        n_words = counts
        n_distinct = np.zeros(nd, np.int64)
        top_word = np.zeros(nd, np.int64)
        if len(codes):
            order = np.lexsort((codes, docpos))
            d, c = docpos[order], codes[order]
            new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
            gid = np.cumsum(new) - 1
            run = np.arange(len(d)) - np.flatnonzero(new)[gid]  # 0-based pos in run
            cnt_per = np.bincount(gid)  # occurrences of each (doc, word)
            gdoc = d[new]
            n_distinct = np.bincount(gdoc, minlength=nd).astype(np.int64)
            np.maximum.at(top_word, gdoc, cnt_per)
        n_bigrams = np.maximum(counts - 1, 0)
        top_bigram = np.zeros(nd, np.int64)
        if len(codes) > 1:
            a, b = codes[:-1], codes[1:]
            same = docpos[:-1] == docpos[1:]
            bd, ba, bb = docpos[:-1][same], a[same], b[same]
            order = np.lexsort((bb, ba, bd))
            bd, ba, bb = bd[order], ba[order], bb[order]
            new = np.r_[True, (bd[1:] != bd[:-1]) | (ba[1:] != ba[:-1]) | (bb[1:] != bb[:-1])]
            gid = np.cumsum(new) - 1
            cnt_per = np.bincount(gid)
            np.maximum.at(top_bigram, bd[new], cnt_per)
        denw = np.maximum(n_words, 1).astype(np.float64)
        denb = np.maximum(n_bigrams, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "top_word_cnt": pa.array(top_word, pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "top_bigram_cnt": pa.array(top_bigram, pa.int64()),
                "top_word_frac": pa.array(top_word / denw),
                "distinct_ratio": pa.array(n_distinct / denw),
                "top_bigram_frac": pa.array(top_bigram / denb),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def _auto_parted_partials(
    partials: ray.data.Dataset, n_parts: "int | str", bytes_per_row: int = 24
) -> "tuple[ray.data.Dataset, int]":
    """Validate or auto-size the hash-part count and append the part key to a
    (h, cnt, ...) hash-pass partial stream.

    ``n_parts="auto"`` (the default across the hash2pass family) materializes
    the partials — they ARE the exchange payload, and the sort-shuffle barrier
    right after holds all of them regardless, so this adds no asymptotic
    memory and no extra corpus scan — and sizes a power-of-two part count from
    the MEASURED row count via :func:`size_parts` (VERDICT r04 #2: fixed
    n_parts=64 means a multi-TB per-part group at 100 TB). An explicit int
    keeps the original fully streaming single-stage plan; the part key is
    appended in a map_batches that Ray fuses with the hash pass.

    Returns ``(parted_dataset, n_parts)`` with n_parts resolved to an int;
    every downstream probe must key with THIS value."""
    if n_parts == "auto":
        partials = partials.materialize()
        n_parts = size_parts(partials.count(), bytes_per_row=bytes_per_row)
    elif not isinstance(n_parts, int) or n_parts <= 0 or n_parts & (n_parts - 1):
        raise ValueError(f"n_parts must be a power of two or 'auto', got {n_parts}")
    mask = np.uint64(n_parts - 1)

    def add_part(t: pa.Table) -> pa.Table:
        hv = np.asarray(t.column("h").to_numpy(zero_copy_only=False), np.int64).view(
            np.uint64
        )
        return t.append_column("part", pa.array((hv & mask).astype(np.int32)))

    return partials.map_batches(add_part, batch_format="pyarrow"), n_parts


_VIEW_CACHE: dict[tuple, dict] = {}


def _membership_refs(parted: ray.data.Dataset) -> tuple:
    """Plasma-resident block refs of a part-keyed membership table.

    The per-part sorted membership arrays are produced INSIDE their own
    ``map_groups`` tasks and stay in the object store; the driver only ever
    holds the block refs (VERDICT r03 #2 — previously the candidate arrays
    transited the driver via ``iter_batches`` + Python concat, a bottleneck
    once the summed candidate set outgrows one process at 100 TB)."""
    return tuple(parted.materialize().to_arrow_refs())


def _membership_views(
    block_refs: tuple,
    sort_col: str = "h",
    payload_col: str | None = None,
    unsigned: bool = True,
) -> dict[int, list]:
    """part -> [(sorted key run, payload run | None), ...] zero-copy views over
    the membership blocks. Each run is one map_groups group's contiguous,
    task-side-sorted slice (a part spans >1 run only if Ray split the block);
    probes binary-search every run. Cached per worker process — map tasks in
    the same worker reuse the views instead of re-slicing per batch."""
    key = (tuple(r.hex() for r in block_refs), sort_col, payload_col, unsigned)
    hit = _VIEW_CACHE.get(key)
    if hit is not None:
        return hit
    views: dict[int, list] = {}
    for tb in ray.get(list(block_refs)):
        if not tb.num_rows:
            continue
        ps = np.asarray(tb.column("part").to_numpy(zero_copy_only=False))
        ks = np.asarray(tb.column(sort_col).to_numpy(zero_copy_only=False), np.int64)
        if unsigned:
            ks = ks.view(np.uint64)
        pl = (
            np.asarray(tb.column(payload_col).to_numpy(zero_copy_only=False), np.int64)
            if payload_col
            else None
        )
        # a block may CONCATENATE several map_groups outputs; when the emitted
        # part key is not the group key (e.g. drop sets keyed by doc-part from
        # gram-part groups), same-part rows from different groups can sit
        # adjacent — each group's slice is sorted but the stitch is not. Split
        # runs on part change OR a descending key step (stitch points only).
        desc = ks[1:] < ks[:-1]
        seg = np.flatnonzero(np.r_[True, (ps[1:] != ps[:-1]) | desc])
        seg_end = np.r_[seg[1:], len(ps)]
        for lo, hi in zip(seg, seg_end):
            views.setdefault(int(ps[lo]), []).append(
                (ks[lo:hi], pl[lo:hi] if pl is not None else None)
            )
    while len(_VIEW_CACHE) >= 4:  # bound plasma pinning from stale entries
        _VIEW_CACHE.pop(next(iter(_VIEW_CACHE)))
    _VIEW_CACHE[key] = views
    return views


def _codes(strings: pa.Array) -> np.ndarray:
    """Per-batch integer codes for a string array (dictionary indices)."""
    enc = pc.dictionary_encode(strings)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)


def _probe_sorted_runs(runs: list, keys: np.ndarray) -> np.ndarray:
    """Membership mask of ``keys`` against a part's sorted runs."""
    m = np.zeros(len(keys), dtype=bool)
    for vh, _ in runs:
        if not len(vh):
            continue
        pos = np.searchsorted(vh, keys)
        pos[pos >= len(vh)] = 0
        m |= vh[pos] == keys
    return m


def duplicate_ngrams(
    docs: ray.data.Dataset,
    n: int = 5,
    min_count: int = 2,
    k: int = 50,
    combine: str = "hash2pass",
    fanin: tuple[int, ...] = (32,),
    n_parts: "int | str" = "auto",
) -> ray.data.Dataset:
    """Corpus-wide repeated word-n-gram heavy hitters: every n-word window of
    every doc (all occurrences, not per-doc distinct), counted across the whole
    corpus; returns the top-k grams with count >= min_count, ordered
    (cnt desc, gram asc). The C4/Gopher-style signal for cross-document
    boilerplate — the grams worth stripping or down-weighting.

    Unlike a token vocabulary, the distinct-n-gram space GROWS with the corpus
    (random text makes nearly every 5-gram unique), so neither a tree combine
    (root task holds |all grams| — OOM'd at 1M random-vocab docs, ~73M grams)
    nor a string-keyed groupby (measured 383 s at 1M docs: the exchange moves
    every distinct ~30 B gram string) is the scale shape. The DEFAULT
    ``combine='hash2pass'`` is exact and candidate-bounded, the same
    broadcast-verify pattern as the minhash verify pass:

    1. hash pass: per-batch distinct (uint64 gram-hash, cnt) partials ->
       ``groupby(h)`` sum (fixed-width int exchange, ~4x lighter and far
       cheaper to sort than strings) -> hashes with total cnt >= min_count.
       A true duplicate gram always duplicates its hash, so this candidate
       set is a superset (collisions only add false candidates).
    2. gram pass: re-scan the corpus keeping only grams whose hash is in the
       broadcast candidate set, count exactly BY STRING, re-apply min_count
       (killing collision-merged false candidates) and take top-k — all over
       a candidate-bounded table.

    ``combine='groupby'`` (string-key exchange) and ``combine='tree'``
    (bounded gram spaces only) remain as explicit alternatives."""

    def _gram_strings(t: pa.Table):
        _, W, docpos, _ = _word_codes_batch(t)
        total = len(W)
        if total < n:
            return None
        parts = [W.slice(j, total - n + 1) for j in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = docpos[: total - n + 1] == docpos[n - 1 :]
        if not valid.any():
            return None
        return joined.filter(pa.array(valid))

    _EMPTY_GC = pa.table({"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        grams = _gram_strings(t)
        if grams is None:
            return _EMPTY_GC
        vc = pc.value_counts(grams)
        return pa.table(
            {"gram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    counts = docs.map_batches(partial, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        t = _combine_counts(t, ("gram",))
        t = t.filter(pc.greater_equal(t.column("cnt"), min_count))
        g = np.asarray(t.column("gram").to_numpy(zero_copy_only=False))
        c = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False))
        order = np.lexsort((g, -c))[:k]
        return pa.table({"gram": pa.array(g[order]), "cnt": pa.array(c[order], pa.int64())})

    if combine == "hash2pass":

        def hash_partial(t: pa.Table) -> pa.Table:
            grams = _gram_strings(t)
            if grams is None:
                return pa.table(
                    {"h": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
                )
            h = md5_u64_strings(grams)
            vals, cnts = np.unique(h, return_counts=True)
            # int64 bit-cast (Ray pickles uint64 keys); the part key appended
            # by _auto_parted_partials bounds the exchange cardinality:
            # sorting 70M DISTINCT int keys measured 285 s on this host, the
            # 64-value part sort ~20 s for the same rows
            return pa.table(
                {
                    "h": pa.array(vals.view(np.int64), pa.int64()),
                    "cnt": pa.array(cnts.astype(np.int64)),
                }
            )

        def part_dups(t: pa.Table) -> pa.Table:
            part = t.column("part")[0]
            g = t.drop_columns(["part"]).group_by(["h"]).aggregate([("cnt", "sum")])
            g = g.filter(pc.greater_equal(g.column("cnt_sum"), min_count))
            hv = np.asarray(
                g.column("h").to_numpy(zero_copy_only=False), np.int64
            ).view(np.uint64)
            order = np.argsort(hv, kind="stable")  # uint64 order for searchsorted
            return pa.table(
                {
                    "part": pa.array(np.full(len(hv), part.as_py(), np.int32)),
                    "h": pa.array(hv[order].view(np.int64), pa.int64()),
                }
            )

        # Candidate membership stays SHARDED per part AND in plasma: each
        # part's sorted uint64 array is produced inside its own map_groups
        # task and the driver only handles block REFS — no single object, no
        # driver-side pull/concat, ever holds the full duplicated-gram set.
        # A boilerplate-heavy corpus at 100 TB can push |duplicated grams|
        # past one process as a whole; per part it is 1/n_parts of that, and
        # pass 2 probes zero-copy views out of the object store. n_parts
        # auto-sizes with the measured corpus (floor 64).
        parted, n_parts = _auto_parted_partials(
            docs.map_batches(hash_partial, batch_format="pyarrow"), n_parts
        )
        mrefs = _membership_refs(
            parted.groupby("part").map_groups(part_dups, batch_format="pyarrow")
        )

        def gram_partial(t: pa.Table) -> pa.Table:
            grams = _gram_strings(t)
            if grams is None:
                return _EMPTY_GC
            views = _membership_views(mrefs)
            if not views:
                return _EMPTY_GC
            h = md5_u64_strings(grams)
            part = (h & np.uint64(n_parts - 1)).astype(np.int32)
            # one argsort groups rows by part; each part's probe is then a
            # contiguous slice (not n_parts full boolean passes over the batch)
            order = np.argsort(part, kind="stable")
            h_s = h[order]
            part_s = part[order]
            seg = np.flatnonzero(np.r_[True, part_s[1:] != part_s[:-1]])
            seg_end = np.r_[seg[1:], len(part_s)]
            m_s = np.zeros(len(h), dtype=bool)
            for lo, hi in zip(seg, seg_end):
                runs = views.get(int(part_s[lo]))
                if runs:
                    m_s[lo:hi] = _probe_sorted_runs(runs, h_s[lo:hi])
            m = np.zeros(len(h), dtype=bool)
            m[order] = m_s
            if not m.any():
                return _EMPTY_GC
            vc = pc.value_counts(grams.filter(pa.array(m)))
            return pa.table(
                {"gram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
            )

        cand_counts = docs.map_batches(gram_partial, batch_format="pyarrow")
        return cand_counts.repartition(1).map_batches(
            finalize, batch_size=None, batch_format="pyarrow"
        )
    if combine == "groupby":
        from ray.data.aggregate import Sum

        g = counts.groupby("gram").aggregate(Sum("cnt", alias_name="cnt"))
        # per-block candidates: keep top-k by count among grams >= min_count
        cands = g.map_batches(
            lambda t: finalize(t), batch_format="pyarrow"
        )
        return cands.repartition(1).map_batches(
            finalize, batch_size=None, batch_format="pyarrow"
        )
    for f in fanin:
        counts = counts.repartition(f).map_batches(
            lambda t: _combine_counts(t, ("gram",)), batch_size=None, batch_format="pyarrow"
        )
    return counts.repartition(1).map_batches(
        finalize, batch_size=None, batch_format="pyarrow"
    )


def salient_terms(
    docs: ray.data.Dataset, k: int = 10, fanin: tuple[int, ...] = (32, 1)
) -> ray.data.Dataset:
    """Per-source salient vocabulary: the k words with the highest tf/df ratio
    (tf = occurrences within the source, df = corpus-wide document frequency) —
    the tf-idf-style distinctive-terms profile a corpus audit runs per domain,
    with an integer-exact ordering (tf/df is one IEEE division of two int64s on
    both engine and oracle; ties break by word asc; output carries integer
    ranks and counts, never float scores).

    Scale shape: one streaming pass emits per-batch (source, word, tf, dfp)
    partials (dfp = docs of the batch containing the word — additive because a
    doc lives in exactly one batch); a map-only tree combine sums both by
    (source, word) exactly as :func:`token_topk` (counts are associative, vocab
    is tokenizer-bounded); the root task derives df(word) by a bincount over
    the combined vocab and takes the per-source top-k."""

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(low, _WORD_SPLIT_RE)
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists)
        mask = pc.not_equal(pc.utf8_length(flat), 0)
        flat, par = flat.filter(mask), par.filter(mask)
        src = t.column("source").take(par)
        pairs = pa.table({"source": src, "word": flat, "d": par})
        tf = pairs.group_by(["source", "word"]).aggregate([("d", "count")])
        dfp = (
            pairs.group_by(["d", "source", "word"])
            .aggregate([])
            .group_by(["source", "word"])
            .aggregate([("d", "count")])
        )
        out = tf.rename_columns(["source", "word", "tf"]).join(
            dfp.rename_columns(["source", "word", "dfp"]), keys=["source", "word"]
        )
        return pa.table(
            {
                "source": out.column("source"),
                "word": out.column("word"),
                "tf": out.column("tf").cast(pa.int64()),
                "dfp": out.column("dfp").cast(pa.int64()),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "word"]).aggregate([("tf", "sum"), ("dfp", "sum")])
        return g.rename_columns(["source", "word", "tf", "dfp"])

    def topk(t: pa.Table) -> pa.Table:
        t = combine(t)
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        w = np.asarray(t.column("word").to_numpy(zero_copy_only=False))
        tf = np.asarray(t.column("tf").to_numpy(zero_copy_only=False))
        dfp = np.asarray(t.column("dfp").to_numpy(zero_copy_only=False))
        _, winv = np.unique(w, return_inverse=True)
        df = np.bincount(winv, weights=dfp).astype(np.int64)[winv]
        ratio = tf.astype(np.float64) / df
        _, sinv = np.unique(src, return_inverse=True)
        order = np.lexsort((w, -ratio, sinv))
        s_sorted = sinv[order]
        newseg = np.r_[True, s_sorted[1:] != s_sorted[:-1]]
        segstart = np.flatnonzero(newseg)
        segid = np.cumsum(newseg) - 1
        rank = np.arange(len(order)) - segstart[segid] + 1
        keep = order[rank <= k]
        return pa.table(
            {
                "source": pa.array(src[keep]),
                "rank": pa.array(rank[rank <= k], pa.int64()),
                "word": pa.array(w[keep]),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df[keep], pa.int64()),
            }
        )

    counts = docs.map_batches(partial, batch_format="pyarrow")
    for f in fanin[:-1]:
        counts = counts.repartition(f).map_batches(
            combine, batch_size=None, batch_format="pyarrow"
        )
    return counts.repartition(fanin[-1]).map_batches(
        topk, batch_size=None, batch_format="pyarrow"
    )


def _doc_gram_strings(
    t: pa.Table, n: int
) -> tuple[np.ndarray, pa.Array | None, np.ndarray | None]:
    """(doc_ids, flat n-gram string array, per-gram doc index) for a batch.

    Every n-word window of every doc (all occurrences); grams never cross a
    document boundary. Entirely Arrow-vectorized (shared tokenizer front-end +
    join-element-wise windows, same construction as ``duplicate_ngrams``)."""
    ids, W, docpos, _ = _word_codes_batch(t)
    total = len(W)
    if total < n:
        return ids, None, None
    parts = [W.slice(j, total - n + 1) for j in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    valid = docpos[: total - n + 1] == docpos[n - 1 :]
    if not valid.any():
        return ids, None, None
    return ids, joined.filter(pa.array(valid)), docpos[: total - n + 1][valid]


def dup_gram_fraction(
    docs: ray.data.Dataset, n: int = 5, n_parts: "int | str" = "auto", hash_fn=None
) -> ray.data.Dataset:
    """Per-document cross-corpus boilerplate score: of the doc's DISTINCT word
    n-grams, the fraction that occur in at least one OTHER document (document
    frequency >= 2). The per-doc complement of :func:`duplicate_ngrams` — the
    score a RefinedWeb/C4-style filter thresholds to drop template pages —
    and of :func:`repetition_stats` (which is within-doc only).

    Exact at any scale via the same candidate-bounded hash2pass shape as
    ``duplicate_ngrams`` (a string-duplicate gram is always a hash-duplicate,
    so the hash pass yields a superset; string-level verification kills
    collisions):

    1. hash-df pass: per-batch per-doc-distinct gram hashes -> part-keyed
       ``groupby`` (bounded key cardinality) -> hashes with df >= 2, kept as
       per-part sorted membership arrays produced INSIDE their map_groups
       tasks (plasma block refs — never one object, and never the driver,
       holding the full set).
    2. candidate pass: re-scan emitting one union-schema stream into a
       single part-keyed exchange — candidate (gram, doc) pairs keyed by
       gram-part, plus per-doc stats rows (doc_id, distinct-gram count,
       candidate count) keyed by doc-part, riding the same shuffle. A gram's
       candidacy depends only on its hash, so ALL pairs of any string with
       df >= 2 are candidates — the pair count per gram string inside its
       part IS the true document frequency. Each part task emits only the
       FAILURES (pairs of strings with true df == 1, i.e. hash-collision
       false candidates — a tiny set) keyed by doc-part, passing the stats
       rows through; the pair rows (and their gram strings) die inside the
       exchange and are never materialized again.
    3. assembly: a map over the materialized stats+failures (corpus-row- and
       collision-sized only) subtracts each doc's failure count:
       n_dup = n_candidates - n_failed. No tokenize, no doc-keyed barrier
       (an earlier union + groupby(doc_id) merge measured ~2x the wall time
       from the extra AllToAll span on this host).

    TWO tokenize scans (was three — VERDICT r03 #4), two part-keyed
    exchanges over candidate-bounded pairs / collision-sized failures, zero
    corpus-sized shuffles.

    ``hash_fn`` (tests only) substitutes the gram hash so a deliberately
    colliding hash can exercise the failure path, which real 64-bit md5
    never hits at test scale.
    """
    ghash = hash_fn if hash_fn is not None else md5_u64_strings

    _EMPTY_H = pa.table(
        {"h": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def _distinct_mask(codes: np.ndarray, gdoc: np.ndarray) -> np.ndarray:
        """First occurrence of each (doc, gram-code) pair."""
        order = np.lexsort((codes, gdoc))
        c_s, d_s = codes[order], gdoc[order]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        mask = np.zeros(len(codes), dtype=bool)
        mask[order] = new
        return mask

    def hash_partial(t: pa.Table) -> pa.Table:
        ids, grams, gdoc = _doc_gram_strings(t, n)
        if grams is None:
            return _EMPTY_H
        keep = _distinct_mask(_codes(grams), gdoc)
        h = ghash(grams.filter(pa.array(keep)))
        vals, cnts = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(vals.view(np.int64), pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    def part_dups(t: pa.Table) -> pa.Table:
        part = t.column("part")[0]
        g = t.drop_columns(["part"]).group_by(["h"]).aggregate([("cnt", "sum")])
        g = g.filter(pc.greater_equal(g.column("cnt_sum"), 2))
        hv = np.asarray(
            g.column("h").to_numpy(zero_copy_only=False), np.int64
        ).view(np.uint64)
        order = np.argsort(hv, kind="stable")
        return pa.table(
            {
                "part": pa.array(np.full(len(hv), part.as_py(), np.int32)),
                "h": pa.array(hv[order].view(np.int64), pa.int64()),
            }
        )

    parted, n_parts = _auto_parted_partials(
        docs.map_batches(hash_partial, batch_format="pyarrow"), n_parts
    )
    hrefs = _membership_refs(
        parted.groupby("part").map_groups(part_dups, batch_format="pyarrow")
    )

    _KIND_PAIR, _KIND_STAT, _KIND_FAIL = 0, 1, 2

    def _union_table(
        part: np.ndarray,
        kind: int,
        gram: pa.Array | None,
        doc_id: np.ndarray,
        ng: np.ndarray | None = None,
        nc: np.ndarray | None = None,
        nf: np.ndarray | None = None,
    ) -> pa.Table:
        z = np.zeros(len(doc_id), np.int64)
        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                "kind": pa.array(np.full(len(doc_id), kind, np.int32)),
                "gram": gram if gram is not None else pa.nulls(len(doc_id), pa.string()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "ng": pa.array(ng if ng is not None else z, pa.int64()),
                "nc": pa.array(nc if nc is not None else z, pa.int64()),
                "nf": pa.array(nf if nf is not None else z, pa.int64()),
            }
        )

    def scan2(t: pa.Table) -> pa.Table:
        # union-schema output: candidate pair rows (keyed by GRAM-part) plus
        # one stats row per doc (keyed by DOC-part) — one tokenize serves
        # both, and the tiny stats rows ride the unavoidable pairs exchange
        # instead of forcing their own pass (or a second tokenize).
        ids, grams, gdoc = _doc_gram_strings(t, n)
        doc_ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
        n_docs = len(doc_ids)
        ng = np.zeros(n_docs, np.int64)
        nc = np.zeros(n_docs, np.int64)
        pair_part = np.empty(0, np.int32)
        pair_doc = np.empty(0, np.int64)
        pair_gram = pa.array([], pa.string())
        if grams is not None:
            keep = _distinct_mask(_codes(grams), gdoc)
            grams = grams.filter(pa.array(keep))
            gdoc = gdoc[keep]
            ng = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
            views = _membership_views(hrefs)
            if views:
                h = ghash(grams)
                part = (h & np.uint64(n_parts - 1)).astype(np.int32)
                order = np.argsort(part, kind="stable")
                h_s, part_s = h[order], part[order]
                seg = np.flatnonzero(np.r_[True, part_s[1:] != part_s[:-1]])
                seg_end = np.r_[seg[1:], len(part_s)]
                m_s = np.zeros(len(h), dtype=bool)
                for lo, hi in zip(seg, seg_end):
                    runs = views.get(int(part_s[lo]))
                    if runs:
                        m_s[lo:hi] = _probe_sorted_runs(runs, h_s[lo:hi])
                m = np.zeros(len(h), dtype=bool)
                m[order] = m_s
                if m.any():
                    nc = np.bincount(gdoc[m], minlength=n_docs).astype(np.int64)
                    pair_part = part[m]
                    pair_doc = doc_ids[gdoc[m]]
                    pg = grams.filter(pa.array(m))
                    pair_gram = pg.combine_chunks() if isinstance(pg, pa.ChunkedArray) else pg
        dpart = (doc_ids.astype(np.uint64) & np.uint64(n_parts - 1)).astype(np.int32)
        return pa.concat_tables(
            [
                _union_table(pair_part, _KIND_PAIR, pair_gram, pair_doc),
                _union_table(dpart, _KIND_STAT, None, doc_ids, ng=ng, nc=nc),
            ]
        )

    def part_split(t: pa.Table) -> pa.Table:
        # one exchange part holds: candidate pairs of its GRAM-part + stats
        # rows of its DOC-part. Pair count per gram string IS the true df
        # (all pairs of a candidate string are candidates) — emit only the
        # per-doc counts of FAILED pairs (df == 1: hash-collision false
        # candidates, empty in the common case) keyed by doc-part, and pass
        # the stats rows through. Pair rows (and their gram strings) die
        # here — they are never materialized a second time.
        kinds = np.asarray(t.column("kind").to_numpy(zero_copy_only=False))
        stats = t.filter(pa.array(kinds == _KIND_STAT)).drop_columns(["gram"])
        pairs = t.filter(pa.array(kinds == _KIND_PAIR))
        if not pairs.num_rows:
            return stats
        grams = pairs.column("gram").combine_chunks()
        codes = _codes(grams)
        fail = np.bincount(codes)[codes] < 2
        if not fail.any():
            return stats
        fd = np.asarray(
            pairs.column("doc_id").to_numpy(zero_copy_only=False), np.int64
        )[fail]
        ud, ucnt = np.unique(fd, return_counts=True)
        fails = _union_table(
            (ud.astype(np.uint64) & np.uint64(n_parts - 1)).astype(np.int32),
            _KIND_FAIL,
            None,
            ud,
            nf=ucnt.astype(np.int64),
        ).drop_columns(["gram"])
        return pa.concat_tables([stats, fails])

    # materialized ONCE, pairs excluded: stats rows are corpus-row-sized
    # (4 ints/doc) and failure partials are collision-sized.
    split = (
        docs.map_batches(scan2, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_split, batch_format="pyarrow")
        .materialize()
    )

    def only_fails(t: pa.Table) -> pa.Table:
        kinds = np.asarray(t.column("kind").to_numpy(zero_copy_only=False))
        return t.filter(pa.array(kinds == _KIND_FAIL)).select(["part", "doc_id", "nf"])

    def part_fail_combine(t: pa.Table) -> pa.Table:
        # doc-part shard: sum failure counts per doc, sorted by doc_id for the
        # assembly probe's binary search
        part = t.column("part")[0]
        g = t.drop_columns(["part"]).group_by(["doc_id"]).aggregate([("nf", "sum")])
        d = np.asarray(g.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(g.column("nf_sum").to_numpy(zero_copy_only=False), np.int64)
        order = np.argsort(d, kind="stable")
        return pa.table(
            {
                "part": pa.array(np.full(len(d), part.as_py(), np.int32)),
                "doc_id": pa.array(d[order], pa.int64()),
                "nf": pa.array(v[order], pa.int64()),
            }
        )

    # failures are hash-collision artifacts — zero in the common case; skip
    # the (fixed-cost) sort barrier entirely when none exist
    fails = split.map_batches(only_fails, batch_format="pyarrow").materialize()
    frefs: tuple = ()
    if fails.count():  # metadata-only on a materialized dataset — no row pull
        frefs = _membership_refs(
            fails.groupby("part").map_groups(part_fail_combine, batch_format="pyarrow")
        )

    def assemble(t: pa.Table) -> pa.Table:
        kinds = np.asarray(t.column("kind").to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(kinds == _KIND_STAT))
        doc = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
        ng = np.asarray(t.column("ng").to_numpy(zero_copy_only=False), np.int64)
        nd = np.asarray(t.column("nc").to_numpy(zero_copy_only=False), np.int64).copy()
        fviews = (
            _membership_views(frefs, sort_col="doc_id", payload_col="nf", unsigned=False)
            if len(doc) and frefs
            else None
        )
        if fviews:
            dpart = (doc.astype(np.uint64) & np.uint64(n_parts - 1)).astype(np.int32)
            order = np.argsort(dpart, kind="stable")
            d_s, p_s = doc[order], dpart[order]
            seg = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
            seg_end = np.r_[seg[1:], len(p_s)]
            nf_s = np.zeros(len(doc), np.int64)
            for lo, hi in zip(seg, seg_end):
                for vd, vnf in fviews.get(int(p_s[lo]), ()):
                    if not len(vd):
                        continue
                    pos = np.searchsorted(vd, d_s[lo:hi])
                    pos_c = np.minimum(pos, len(vd) - 1)
                    hitm = vd[pos_c] == d_s[lo:hi]
                    nf_s[lo:hi][hitm] += vnf[pos_c[hitm]]
            nf = np.zeros(len(doc), np.int64)
            nf[order] = nf_s
            nd -= nf
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_grams": pa.array(ng),
                "n_dup": pa.array(nd),
                "dup_frac": pa.array(nd / np.maximum(ng, 1).astype(np.float64)),
            }
        )

    return split.map_batches(assemble, batch_format="pyarrow")


def _doc_lines_batch(
    t: pa.Table,
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """(doc_ids, flat line array, per-line doc index, per-line 0-based index
    within its doc) — lines split on bare '\\n', nothing dropped (empty lines
    keep their position so reconstruction is loss-free)."""
    ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
    if not len(ids):
        e = np.empty(0, np.int64)
        return ids, pa.array([], pa.string()), e, e
    lists = pc.split_pattern(t.column("text"), "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lcounts = np.asarray(pc.list_value_length(lists).to_numpy(zero_copy_only=False), np.int64)
    lines = lists.flatten()
    docpos = np.repeat(np.arange(len(ids), dtype=np.int64), lcounts)
    starts = np.concatenate([[0], np.cumsum(lcounts[:-1])])
    idx = np.arange(len(docpos), dtype=np.int64) - np.repeat(starts, lcounts)
    return ids, lines, docpos, idx


_DOCKEY_IDX_BITS = 21  # default: idx < 2^21 positions/doc; doc_id < 2^43 — asserted per batch


def _dockeys(
    doc_ids: np.ndarray, idx: np.ndarray, idx_bits: int = _DOCKEY_IDX_BITS
) -> np.ndarray:
    """Pack (doc_id, position) into one uint64 occurrence key. ``idx_bits``
    splits the 64-bit budget: raise it for corpora with book-length documents
    (e.g. 24 -> 16.7M positions/doc, still 2^40 = 1.1e12 doc ids)."""
    if len(idx) and (
        int(idx.max()) >> idx_bits or int(doc_ids.max()) >> (64 - idx_bits)
    ):
        raise ValueError(
            f"dockey overflow: idx must be < 2^{idx_bits} and doc_id < "
            f"2^{64 - idx_bits}; raise idx_bits for longer documents"
        )
    return (doc_ids.astype(np.uint64) << np.uint64(idx_bits)) | idx.astype(np.uint64)


def dedup_lines(
    docs: ray.data.Dataset,
    min_count: int = 2,
    min_len: int = 10,
    n_parts: "int | str" = "auto",
    idx_bits: int = _DOCKEY_IDX_BITS,
) -> ray.data.Dataset:
    """C4-style corpus-wide LINE deduplication: any line of >= ``min_len``
    chars occurring >= ``min_count`` times across the whole corpus is removed
    from every document EXCEPT its globally first occurrence (ordered by
    (doc_id, line index)); short lines always stay. Returns
    (doc_id, text, n_dropped) with the surviving lines rejoined by '\\n' in
    original order — the boilerplate-stripping rewrite step of a C4/RefinedWeb
    cleaning pipeline (C4 deduplicated repeated three-sentence spans the same
    way: keep one occurrence corpus-wide).

    Exact at any scale via the hash2pass shape shared with
    :func:`duplicate_ngrams` / :func:`dup_gram_fraction`:

    1. hash pass: per-batch counts of eligible-line hashes -> part-keyed int
       exchange -> hashes with total count >= min_count (a superset under
       collisions), as per-part sorted plasma membership (block refs, no
       driver transit).
    2. decision pass: re-scan emitting candidate (line, dockey) pairs keyed
       by line-hash part (dockey = doc_id << 21 | idx — one uint64 per
       occurrence). Each part task groups its pairs BY STRING — a string's
       occurrences all land in its part, so the group count is the true
       corpus count and min(dockey) the true winner — and emits the DROP
       dockeys (non-winner occurrences of strings with true count >=
       min_count), sorted, keyed by doc-part. Collisions die here: a false
       candidate's string group has count < min_count and emits nothing.
    3. rewrite pass: one stateless scan probes each line's dockey against the
       sharded drop membership and rebuilds each doc's text from the kept
       lines (vectorized list re-offsets + Arrow binary_join).

    The drop set is bounded by the number of duplicate-line OCCURRENCES
    (corpus-boilerplate-sized, far below corpus size) and lives sharded in
    plasma; no stage materializes line text outside the one candidate
    exchange."""
    _EMPTY_H = pa.table(
        {"h": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def _eligible(lines: pa.Array) -> np.ndarray:
        return np.asarray(
            pc.greater_equal(pc.utf8_length(lines), min_len).to_numpy(
                zero_copy_only=False
            )
        )

    def hash_partial(t: pa.Table) -> pa.Table:
        _, lines, _, _ = _doc_lines_batch(t)
        elig = _eligible(lines)
        if not elig.any():
            return _EMPTY_H
        h = md5_u64_strings(lines.filter(pa.array(elig)))
        vals, cnts = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(vals.view(np.int64), pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    def part_dups(t: pa.Table) -> pa.Table:
        part = t.column("part")[0]
        g = t.drop_columns(["part"]).group_by(["h"]).aggregate([("cnt", "sum")])
        g = g.filter(pc.greater_equal(g.column("cnt_sum"), min_count))
        hv = np.asarray(
            g.column("h").to_numpy(zero_copy_only=False), np.int64
        ).view(np.uint64)
        order = np.argsort(hv, kind="stable")
        return pa.table(
            {
                "part": pa.array(np.full(len(hv), part.as_py(), np.int32)),
                "h": pa.array(hv[order].view(np.int64), pa.int64()),
            }
        )

    parted, n_parts = _auto_parted_partials(
        docs.map_batches(hash_partial, batch_format="pyarrow"), n_parts
    )
    hrefs = _membership_refs(
        parted.groupby("part").map_groups(part_dups, batch_format="pyarrow")
    )

    _EMPTY_PAIR = pa.table(
        {
            "part": pa.array([], pa.int32()),
            "line": pa.array([], pa.string()),
            "dockey": pa.array([], pa.int64()),
        }
    )

    def pair_scan(t: pa.Table) -> pa.Table:
        ids, lines, docpos, idx = _doc_lines_batch(t)
        elig = _eligible(lines)
        if not elig.any():
            return _EMPTY_PAIR
        views = _membership_views(hrefs)
        if not views:
            return _EMPTY_PAIR
        lines = lines.filter(pa.array(elig))
        docpos, idx = docpos[elig], idx[elig]
        h = md5_u64_strings(lines)
        part = (h & np.uint64(n_parts - 1)).astype(np.int32)
        order = np.argsort(part, kind="stable")
        h_s, part_s = h[order], part[order]
        seg = np.flatnonzero(np.r_[True, part_s[1:] != part_s[:-1]])
        seg_end = np.r_[seg[1:], len(part_s)]
        m_s = np.zeros(len(h), dtype=bool)
        for lo, hi in zip(seg, seg_end):
            runs = views.get(int(part_s[lo]))
            if runs:
                m_s[lo:hi] = _probe_sorted_runs(runs, h_s[lo:hi])
        m = np.zeros(len(h), dtype=bool)
        m[order] = m_s
        if not m.any():
            return _EMPTY_PAIR
        keys = _dockeys(ids[docpos[m]], idx[m], idx_bits)
        return pa.table(
            {
                "part": pa.array(part[m], pa.int32()),
                "line": lines.filter(pa.array(m)),
                "dockey": pa.array(keys.view(np.int64), pa.int64()),
            }
        )

    def part_drops(t: pa.Table) -> pa.Table:
        # one line-hash part's candidate pairs: group by STRING (true counts,
        # true winners — collisions separate here), emit non-winner dockeys of
        # strings with count >= min_count, grouped by doc-part and sorted so
        # each emitted run is probe-ready
        lines = t.column("line").combine_chunks()
        codes = _codes(lines)
        keys = np.asarray(
            t.column("dockey").to_numpy(zero_copy_only=False), np.int64
        ).view(np.uint64)
        cnts = np.bincount(codes)
        order = np.lexsort((keys, codes))
        c_s, k_s = codes[order], keys[order]
        first = np.r_[True, c_s[1:] != c_s[:-1]]
        drop = (~first) & (cnts[c_s] >= min_count)
        dk = k_s[drop]
        empty = pa.array([], pa.int64())
        if not len(dk):
            return pa.table(
                {"part": pa.array([], pa.int32()), "h": empty}
            )
        dpart = ((dk >> np.uint64(idx_bits)) & np.uint64(n_parts - 1)).astype(
            np.int32
        )
        o = np.lexsort((dk, dpart))
        return pa.table(
            {
                "part": pa.array(dpart[o], pa.int32()),
                "h": pa.array(dk[o].view(np.int64), pa.int64()),
            }
        )

    drefs = _membership_refs(
        docs.map_batches(pair_scan, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_drops, batch_format="pyarrow")
    )

    def rewrite(t: pa.Table) -> pa.Table:
        ids, lines, docpos, idx = _doc_lines_batch(t)
        keep = np.ones(len(docpos), dtype=bool)
        views = _membership_views(drefs) if len(docpos) else None
        if views:
            keys = _dockeys(ids[docpos], idx, idx_bits)
            dpart = ((keys >> np.uint64(idx_bits)) & np.uint64(n_parts - 1)).astype(
                np.int32
            )
            order = np.argsort(dpart, kind="stable")
            k_s, p_s = keys[order], dpart[order]
            seg = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
            seg_end = np.r_[seg[1:], len(p_s)]
            m_s = np.zeros(len(keys), dtype=bool)
            for lo, hi in zip(seg, seg_end):
                runs = views.get(int(p_s[lo]))
                if runs:
                    m_s[lo:hi] = _probe_sorted_runs(runs, k_s[lo:hi])
            dropped = np.zeros(len(keys), dtype=bool)
            dropped[order] = m_s
            keep = ~dropped
        kept_lines = lines.filter(pa.array(keep))
        kept_counts = (
            np.bincount(docpos[keep], minlength=len(ids))
            if len(docpos)
            else np.zeros(len(ids), np.int64)
        )
        offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
        if isinstance(kept_lines, pa.ChunkedArray):
            kept_lines = kept_lines.combine_chunks()
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_lines
        )
        text = pc.binary_join(lists, "\n")
        n_dropped = (
            np.bincount(docpos[~keep], minlength=len(ids)).astype(np.int64)
            if len(docpos)
            else np.zeros(len(ids), np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": text.cast(pa.string()) if not pa.types.is_string(text.type) else text,
                "n_dropped": pa.array(n_dropped),
            }
        )

    return docs.map_batches(rewrite, batch_format="pyarrow")


def dedup_spans(
    docs: ray.data.Dataset,
    n: int = 5,
    min_count: int = 2,
    n_parts: "int | str" = "auto",
    idx_bits: int = _DOCKEY_IDX_BITS,
) -> ray.data.Dataset:
    """ExactSubstr-style duplicate-SPAN removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): any n-token
    span occurring >= ``min_count`` times corpus-wide is removed from every
    document except its globally first occurrence — every token covered by a
    non-winner duplicate span is dropped and the document is rebuilt from the
    survivors. Operates on the NORMALIZED token stream (the shared tokenizer:
    lowercase, alnum runs), so the rewritten text is space-joined normalized
    tokens; returns (doc_id, text, n_tokens, n_removed).

    Same three-pass candidate-bounded hash2pass shape as :func:`dedup_lines`
    (span hash exchange -> per-part string-exact winners by global
    (doc_id, pos) order -> sharded drop-span membership), plus a vectorized
    difference-array expansion from dropped span STARTS to covered TOKENS in
    the final rewrite (spans never cross documents, so the flat cumsum is
    exact). Zero corpus-sized shuffles; the drop set is bounded by duplicate
    span occurrences."""
    if n < 2:
        raise ValueError(f"span length n must be >= 2, got {n}")

    def _grams_with_pos(t: pa.Table):
        """(doc_ids, flat words, word docpos, word pos-in-doc, span strings,
        span docpos, span pos-in-doc) — spans = every n-word window."""
        ids, W, docpos, counts = _word_codes_batch(t)
        total = len(W)
        starts = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
        tpos = (
            np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            if total
            else np.empty(0, np.int64)
        )
        if total < n:
            return ids, W, docpos, tpos, None, None, None
        parts = [W.slice(j, total - n + 1) for j in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = docpos[: total - n + 1] == docpos[n - 1 :]
        if not valid.any():
            return ids, W, docpos, tpos, None, None, None
        v = pa.array(valid)
        return (
            ids, W, docpos, tpos,
            joined.filter(v),
            docpos[: total - n + 1][valid],
            tpos[: total - n + 1][valid],
        )

    _EMPTY_H = pa.table(
        {"h": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def hash_partial(t: pa.Table) -> pa.Table:
        _, _, _, _, grams, _, _ = _grams_with_pos(t)
        if grams is None:
            return _EMPTY_H
        h = md5_u64_strings(grams)
        vals, cnts = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(vals.view(np.int64), pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    def part_dups(t: pa.Table) -> pa.Table:
        part = t.column("part")[0]
        g = t.drop_columns(["part"]).group_by(["h"]).aggregate([("cnt", "sum")])
        g = g.filter(pc.greater_equal(g.column("cnt_sum"), min_count))
        hv = np.asarray(
            g.column("h").to_numpy(zero_copy_only=False), np.int64
        ).view(np.uint64)
        order = np.argsort(hv, kind="stable")
        return pa.table(
            {
                "part": pa.array(np.full(len(hv), part.as_py(), np.int32)),
                "h": pa.array(hv[order].view(np.int64), pa.int64()),
            }
        )

    parted, n_parts = _auto_parted_partials(
        docs.map_batches(hash_partial, batch_format="pyarrow"), n_parts
    )
    hrefs = _membership_refs(
        parted.groupby("part").map_groups(part_dups, batch_format="pyarrow")
    )

    _EMPTY_PAIR = pa.table(
        {
            "part": pa.array([], pa.int32()),
            "line": pa.array([], pa.string()),
            "dockey": pa.array([], pa.int64()),
        }
    )

    def pair_scan(t: pa.Table) -> pa.Table:
        ids, _, _, _, grams, gdoc, gpos = _grams_with_pos(t)
        if grams is None:
            return _EMPTY_PAIR
        views = _membership_views(hrefs)
        if not views:
            return _EMPTY_PAIR
        h = md5_u64_strings(grams)
        part = (h & np.uint64(n_parts - 1)).astype(np.int32)
        order = np.argsort(part, kind="stable")
        h_s, part_s = h[order], part[order]
        seg = np.flatnonzero(np.r_[True, part_s[1:] != part_s[:-1]])
        seg_end = np.r_[seg[1:], len(part_s)]
        m_s = np.zeros(len(h), dtype=bool)
        for lo, hi in zip(seg, seg_end):
            runs = views.get(int(part_s[lo]))
            if runs:
                m_s[lo:hi] = _probe_sorted_runs(runs, h_s[lo:hi])
        m = np.zeros(len(h), dtype=bool)
        m[order] = m_s
        if not m.any():
            return _EMPTY_PAIR
        keys = _dockeys(ids[gdoc[m]], gpos[m], idx_bits)
        return pa.table(
            {
                "part": pa.array(part[m], pa.int32()),
                "line": grams.filter(pa.array(m)),
                "dockey": pa.array(keys.view(np.int64), pa.int64()),
            }
        )

    def part_drops(t: pa.Table) -> pa.Table:
        # identical winner logic to dedup_lines.part_drops: true counts and
        # winners by STRING inside the span-hash part; emit non-winner span
        # dockeys keyed by doc-part, sorted probe-ready
        lines = t.column("line").combine_chunks()
        codes = _codes(lines)
        keys = np.asarray(
            t.column("dockey").to_numpy(zero_copy_only=False), np.int64
        ).view(np.uint64)
        cnts = np.bincount(codes)
        order = np.lexsort((keys, codes))
        c_s, k_s = codes[order], keys[order]
        first = np.r_[True, c_s[1:] != c_s[:-1]]
        drop = (~first) & (cnts[c_s] >= min_count)
        dk = k_s[drop]
        if not len(dk):
            return pa.table(
                {"part": pa.array([], pa.int32()), "h": pa.array([], pa.int64())}
            )
        dpart = ((dk >> np.uint64(idx_bits)) & np.uint64(n_parts - 1)).astype(
            np.int32
        )
        o = np.lexsort((dk, dpart))
        return pa.table(
            {
                "part": pa.array(dpart[o], pa.int32()),
                "h": pa.array(dk[o].view(np.int64), pa.int64()),
            }
        )

    drefs = _membership_refs(
        docs.map_batches(pair_scan, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_drops, batch_format="pyarrow")
    )

    def rewrite(t: pa.Table) -> pa.Table:
        ids, W, docpos, tpos, grams, gdoc, gpos = _grams_with_pos(t)
        total = len(W)
        covered = np.zeros(total, dtype=bool)
        if grams is not None:
            views = _membership_views(drefs)
            if views:
                keys = _dockeys(ids[gdoc], gpos, idx_bits)
                dpart = (
                    (keys >> np.uint64(idx_bits)) & np.uint64(n_parts - 1)
                ).astype(np.int32)
                order = np.argsort(dpart, kind="stable")
                k_s, p_s = keys[order], dpart[order]
                seg = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
                seg_end = np.r_[seg[1:], len(p_s)]
                m_s = np.zeros(len(keys), dtype=bool)
                for lo, hi in zip(seg, seg_end):
                    runs = views.get(int(p_s[lo]))
                    if runs:
                        m_s[lo:hi] = _probe_sorted_runs(runs, k_s[lo:hi])
                dropped = np.zeros(len(keys), dtype=bool)
                dropped[order] = m_s
                if dropped.any():
                    # difference-array expansion: span start -> n covered
                    # tokens; spans never cross docs, flat indices are exact.
                    # The span at (gdoc[i], gpos[i]) starts at flat index
                    # start(gdoc[i]) + gpos[i].
                    counts = np.bincount(docpos, minlength=len(ids)).astype(np.int64)
                    starts = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(
                        np.int64
                    )
                    flat = starts[gdoc[dropped]] + gpos[dropped]
                    diff = np.zeros(total + n, np.int64)
                    np.add.at(diff, flat, 1)
                    np.subtract.at(diff, flat + n, 1)
                    covered = np.cumsum(diff[:total]) > 0
        keep = ~covered
        kept = W.filter(pa.array(keep)) if total else W
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        kept_counts = (
            np.bincount(docpos[keep], minlength=len(ids)).astype(np.int64)
            if total
            else np.zeros(len(ids), np.int64)
        )
        offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept)
        text = pc.binary_join(lists, " ")
        n_tokens = (
            np.bincount(docpos, minlength=len(ids)).astype(np.int64)
            if total
            else np.zeros(len(ids), np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": text.cast(pa.string())
                if not pa.types.is_string(text.type)
                else text,
                "n_tokens": pa.array(n_tokens),
                "n_removed": pa.array(n_tokens - kept_counts),
            }
        )

    return docs.map_batches(rewrite, batch_format="pyarrow")


def source_mix(
    docs: ray.data.Dataset,
    rates: dict[str, float],
    mod: int = 1000,
    default: float = 1.0,
    id_col: str = "doc_id",
    key_col: str = "source",
) -> ray.data.Dataset:
    """Deterministic weighted source mixing (domain reweighting): keep a row
    when ``md5(str(id)) % mod < round(rates[source] * mod)``. The standard
    way a pretraining pipeline downsamples over-represented domains to hit a
    target mixture — reproducible (no RNG), stream-safe, resumable, and
    composable with :func:`hash_sample` splits.

    Stateless filter map_batches; the rates dict is captured in the closure
    (tiny — ship it per task, no shuffle). Per-row lookup is vectorized:
    sources are dictionary-encoded per batch and only the batch's DISTINCT
    sources hit the Python dict."""
    if not 0 < mod:
        raise ValueError(f"mod must be positive, got {mod}")
    thr = {k: int(round(v * mod)) for k, v in rates.items()}
    dthr = int(round(default * mod))

    def f(t: pa.Table) -> pa.Table:
        h = md5_u64_strings(pc.cast(t.column(id_col), pa.string())) % np.uint64(mod)
        enc = pc.dictionary_encode(t.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        lut = np.array([thr.get(s, dthr) for s in uniq], dtype=np.int64)
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        return t.filter(pa.array(h.astype(np.int64) < lut[codes]))

    return docs.map_batches(f, batch_format="pyarrow")


def _per_key_smallest(
    keys: np.ndarray, h: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Indices of the k smallest (h, id) rows per key, plus their 1-based rank.

    One lexsort + run-position arithmetic — no per-key loop."""
    order = np.lexsort((ids, h, keys))
    ks = keys[order]
    new = np.r_[True, ks[1:] != ks[:-1]]
    starts = np.flatnonzero(new)
    rank = np.arange(len(ks), dtype=np.int64) - starts[np.cumsum(new) - 1] + 1
    m = rank <= k
    return order[m], rank[m]


def stratified_sample(
    docs: ray.data.Dataset,
    k: int = 10,
    key_col: str = "source",
    id_col: str = "doc_id",
    combine: str = "root",
) -> ray.data.Dataset:
    """Deterministic per-group sampling: for every ``key_col`` value keep the
    ``k`` rows with the smallest ``(md5(str(id)), id)`` — a reproducible
    stratified sample (per-domain eval sets, balanced inspection slices)
    that needs no RNG and is stable under re-partitioning.

    Scale shape = two-level top-k (same argument as ``token_topk``): a row in
    the global per-key smallest-k is in its batch's smallest-k, so each batch
    emits at most k rows per key present and the merge only sees those
    candidates — k x |keys| x |batches| rows, never the corpus. The default
    ``combine="root"`` merges them in one task (right for a bounded key space
    like sources/domains; Ray's sort-based groupby costs a multi-second
    barrier for the same tiny exchange on this host); ``combine="groupby"``
    co-locates per key for unbounded key spaces.

    Output: (id_col, key_col, sample_rank) with rank 1..k in hash order."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if combine not in ("root", "groupby"):
        raise ValueError(f"combine must be 'root' or 'groupby', got {combine!r}")

    def _emit(t: pa.Table, idx: np.ndarray, rank: np.ndarray) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col).take(pa.array(idx)).cast(pa.int64()),
                key_col: t.column(key_col).take(pa.array(idx)),
                "h": pa.array(
                    md5_u64_strings(
                        pc.cast(t.column(id_col).take(pa.array(idx)), pa.string())
                    ).view(np.int64),
                    pa.int64(),
                ),
                "sample_rank": pa.array(rank, pa.int64()),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        h = md5_u64_strings(pc.cast(t.column(id_col), pa.string()))
        enc = pc.dictionary_encode(t.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        idx, rank = _per_key_smallest(codes, h, ids, k)
        return _emit(t, idx, rank)

    def final(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        h = np.asarray(t.column("h").to_numpy(zero_copy_only=False), np.int64).view(
            np.uint64
        )
        # single key per group, but stay general: re-encode
        enc = pc.dictionary_encode(t.column(key_col).combine_chunks())
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        idx, rank = _per_key_smallest(codes, h, ids, k)
        out = pa.table(
            {
                id_col: t.column(id_col).take(pa.array(idx)).cast(pa.int64()),
                key_col: t.column(key_col).take(pa.array(idx)),
                "sample_rank": pa.array(rank, pa.int64()),
            }
        )
        return out

    cands = docs.map_batches(partial, batch_format="pyarrow")
    if combine == "groupby":
        return cands.groupby(key_col).map_groups(final, batch_format="pyarrow")
    return cands.repartition(1).map_batches(
        final, batch_size=None, batch_format="pyarrow"
    )


def normalize_text(
    docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Canonical text normalization pass (the pre-hash cleanup every dedup
    pipeline runs first): lowercase, collapse every non-alphanumeric run to a
    single space, trim. Pure Arrow regex kernels, stateless map, no shuffle.

    Output: (id_col, text_norm, n_chars_norm)."""

    def f(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column(text_col))
        x = pc.replace_substring_regex(x, "[^a-z0-9]+", " ")
        x = pc.utf8_trim(x, " ")
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "text_norm": x,
                "n_chars_norm": pc.utf8_length(x).cast(pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


# PII/URL scrubbing patterns — RE2 syntax (identical engine on Arrow's
# replace_substring_regex and DuckDB's regexp_replace, so the oracle mirrors
# byte-for-byte). Deliberately simple, deterministic patterns: the point is
# exact, auditable redaction, not maximal recall.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
)


def scrub_text(
    docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """PII/URL scrubbing (the redaction pass a pretraining pipeline runs before
    publication): replace emails, URLs and phone-like digit runs with typed
    placeholder tokens, counting each redaction class per document. Pure Arrow
    RE2 kernels, stateless map, no shuffle; patterns apply in a fixed order
    (email -> url -> phone) so the output is deterministic.

    Output: (id_col, text, n_email, n_url, n_phone)."""

    def f(t: pa.Table) -> pa.Table:
        x = t.column(text_col)
        counts = {}
        for name, pat, repl in SCRUB_PATTERNS:
            counts[name] = pc.count_substring_regex(x, pat).cast(pa.int64())
            x = pc.replace_substring_regex(x, pat, repl)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "text": x,
                "n_email": counts["email"],
                "n_url": counts["url"],
                "n_phone": counts["phone"],
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def doc_top_terms(
    docs: ray.data.Dataset, k: int = 3, fanin: tuple[int, ...] = (32,)
) -> ray.data.Dataset:
    """Per-document top-k distinctive terms — rank words by (tf desc, df asc,
    term asc): high in-doc frequency, low corpus document-frequency. The
    per-doc keyword-extraction complement of :func:`salient_terms` (which is
    per-source) and the integer-exact stand-in for tf-idf ordering (log is
    monotone in df, so the (tf, df) lexicographic rank needs no floats).

    Scale shape: document frequencies are a tokenizer-vocabulary-bounded
    table — built with the same map-only tree combine as :func:`token_topk`
    (per-batch per-doc-DISTINCT word counts, vocabulary-sized exchanges) and
    broadcast once via ``ray.put``; the scoring pass is then stateless, with
    df lookup through Arrow's C++ ``index_in`` against the broadcast vocab.
    No doc-keyed shuffle anywhere.

    Output: (doc_id, term, tf, df, term_rank) with rank 1..k."""
    import ray as _ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    _EMPTY_DF = pa.table(
        {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def _doc_word_pairs(t: pa.Table):
        """(doc_ids, distinct (doc,word) rows as (gdoc, sorted-unique word
        strings, per-pair tf)) — one lexsort segment count per batch."""
        ids, W, docpos, _ = _word_codes_batch(t)
        if len(W) == 0:
            return ids, None, None, None
        words = np.asarray(W.to_numpy(zero_copy_only=False))
        uniq, codes = np.unique(words, return_inverse=True)  # codes in STRING order
        order = np.lexsort((codes, docpos))
        d_s, c_s = docpos[order], codes[order]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        gid = np.cumsum(new) - 1
        tf = np.bincount(gid).astype(np.int64)
        return ids, uniq, (d_s[new], c_s[new]), tf

    def df_partial(t: pa.Table) -> pa.Table:
        ids, uniq, pairs, _tf = _doc_word_pairs(t)
        if uniq is None:
            return _EMPTY_DF
        _, pc_codes = pairs
        cnt = np.bincount(pc_codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq), "cnt": pa.array(cnt)})

    counts = docs.map_batches(df_partial, batch_format="pyarrow")
    for f in fanin:
        counts = counts.repartition(f).map_batches(
            _combine_counts, batch_size=None, batch_format="pyarrow"
        )
    final_df = counts.repartition(1).map_batches(
        _combine_counts, batch_size=None, batch_format="pyarrow"
    )
    vocab_parts, df_parts = [], []
    for tb in final_df.iter_batches(batch_size=None, batch_format="pyarrow"):
        vocab_parts.append(tb.column("word").combine_chunks())
        df_parts.append(
            np.asarray(tb.column("cnt").to_numpy(zero_copy_only=False), np.int64)
        )
    if vocab_parts:
        vocab = pa.concat_arrays(vocab_parts)
        dfv = np.concatenate(df_parts)
    else:
        vocab = pa.array([], pa.string())
        dfv = np.empty(0, np.int64)
    ref = _ray.put((vocab, dfv))

    _EMPTY_OUT = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "term_rank": pa.array([], pa.int64()),
        }
    )

    def score(t: pa.Table) -> pa.Table:
        voc, dfl = _ray.get(ref)
        ids, uniq, pairs, tf = _doc_word_pairs(t)
        if uniq is None or len(voc) == 0:
            return _EMPTY_OUT
        p_doc, p_code = pairs
        terms = pa.array(uniq).take(pa.array(p_code))
        pos = np.asarray(
            pc.index_in(terms, value_set=voc).to_numpy(zero_copy_only=False)
        )
        dfr = dfl[pos]  # every term is in the vocab by construction
        # rank per doc by (tf desc, df asc, term asc); p_code IS string order
        order = np.lexsort((p_code, dfr, -tf, p_doc))
        d_o = p_doc[order]
        new = np.r_[True, d_o[1:] != d_o[:-1]]
        starts = np.flatnonzero(new)
        rank = np.arange(len(d_o), dtype=np.int64) - starts[np.cumsum(new) - 1] + 1
        m = rank <= k
        sel = order[m]
        return pa.table(
            {
                "doc_id": pa.array(ids[p_doc[sel]], pa.int64()),
                "term": terms.take(pa.array(sel)),
                "tf": pa.array(tf[sel]),
                "df": pa.array(dfr[sel]),
                "term_rank": pa.array(rank[m]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def token_rarity(
    docs: ray.data.Dataset,
    thresholds: tuple[int, ...] = (1, 10, 100),
    fanin: tuple[int, ...] = (32,),
) -> ray.data.Dataset:
    """CCNet/Gopher-family corpus-statistics quality profile: per document, how
    much of its text is built from corpus-RARE tokens (the integer-exact
    sibling of a unigram-LM perplexity score).

    Scale shape: pass 1 builds the corpus-wide token frequency table (token
    INSTANCES, not document frequency) with the same map-only tree combine as
    :func:`token_topk` — every exchange is tokenizer-vocabulary-bounded, never
    corpus-sized — and broadcasts it once via ``ray.put`` (one plasma copy per
    node, exactly how CCNet ships its LM to workers). Pass 2 is a stateless
    ``map_batches``: corpus counts looked up per token instance through
    Arrow's C++ ``index_in``, then per-doc reductions via ``bincount`` /
    ``minimum.reduceat``. No doc-keyed shuffle anywhere; all outputs are
    integers, so the DuckDB oracle matches hash-exactly.

    Output (docs with >= 1 token): ``doc_id, n_tokens, n_rare_T`` per
    threshold (token instances whose corpus count <= T) and ``min_cnt`` (the
    corpus count of the doc's rarest token). A pretraining filter drops docs
    whose n_rare_1/n_tokens is high (OCR noise, gibberish, mangled encodings)
    or whose min_cnt is implausibly high (pure boilerplate)."""
    import ray as _ray

    if not thresholds or any(x <= 0 for x in thresholds):
        raise ValueError(f"thresholds must be positive, got {thresholds}")

    counts = docs.map_batches(_token_counts_batch, batch_format="pyarrow")
    for f in fanin:
        counts = counts.repartition(f).map_batches(
            _combine_counts, batch_size=None, batch_format="pyarrow"
        )
    final = counts.repartition(1).map_batches(
        _combine_counts, batch_size=None, batch_format="pyarrow"
    )
    vocab_parts, cnt_parts = [], []
    # vocabulary-bounded pull (same contract as doc_top_terms' df table)
    for tb in final.iter_batches(batch_size=None, batch_format="pyarrow"):
        vocab_parts.append(tb.column("word").combine_chunks())
        cnt_parts.append(
            np.asarray(tb.column("cnt").to_numpy(zero_copy_only=False), np.int64)
        )
    vocab = pa.concat_arrays(vocab_parts) if vocab_parts else pa.array([], pa.string())
    cntv = np.concatenate(cnt_parts) if cnt_parts else np.empty(0, np.int64)
    ref = _ray.put((vocab, cntv))

    cols = ["doc_id", "n_tokens"] + [f"n_rare_{x}" for x in thresholds] + ["min_cnt"]
    _EMPTY = pa.table({c: pa.array([], pa.int64()) for c in cols})

    def score(t: pa.Table) -> pa.Table:
        voc, cv = _ray.get(ref)
        ids, W, docpos, ntok = _word_codes_batch(t)
        if len(W) == 0 or len(voc) == 0:
            return _EMPTY
        pos = np.asarray(
            pc.index_in(W, value_set=voc).to_numpy(zero_copy_only=False), np.int64
        )
        ccnt = cv[pos]  # corpus count per token instance (always present)
        have = ntok > 0
        out = {"doc_id": pa.array(ids[have], pa.int64()), "n_tokens": pa.array(ntok[have])}
        for x in thresholds:
            rare = np.bincount(docpos, weights=ccnt <= x, minlength=len(ids))
            out[f"n_rare_{x}"] = pa.array(rare[have].astype(np.int64))
        starts = np.flatnonzero(np.r_[True, docpos[1:] != docpos[:-1]])
        out["min_cnt"] = pa.array(np.minimum.reduceat(ccnt, starts))
        return pa.table(out)

    return docs.map_batches(score, batch_format="pyarrow")


def cross_source_dups(
    docs: ray.data.Dataset, n_parts: "int | str" = "auto"
) -> ray.data.Dataset:
    """Cross-source duplicate-content matrix: for every unordered source pair
    (a < b), how many DISTINCT document contents appear in both — the
    provenance/contamination report a corpus audit runs before mixing sources
    (which crawls plagiarize which, where licensed text leaked into a scrape).

    Scale shape: per batch, distinct (source, content-hash-u64) rows (64-bit
    md5, same collision contract as the dedup family); the exchange is keyed
    by the measured-sized hash partition (:func:`_auto_parted_partials`) so
    each ``map_groups`` task holds 1/n_parts of the distinct (source, hash)
    space. Pair expansion is vectorized (two ragged-arange passes over the
    multi-source runs) and bounded by n_sources^2 per hash; per-part partial
    counts then collapse in ONE bounded reduce (the pair key space is
    n_sources^2, thousands of rows at most — never corpus-scale).

    Output: (source_a, source_b, n_shared), source_a < source_b."""

    def hash_partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        h = md5_u64_strings(low)
        src = t.column("source")
        enc = pc.dictionary_encode(
            src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        )
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        pairs = np.unique(np.stack([h.view(np.int64), codes], axis=1), axis=0)
        return pa.table(
            {
                "h": pa.array(pairs[:, 0], pa.int64()),
                "source": enc.dictionary.take(pa.array(pairs[:, 1], pa.int64())),
            }
        )

    _EMPTY_PAIRS = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_shared": pa.array([], pa.int64()),
        }
    )

    def part_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_PAIRS
        h = np.asarray(t.column("h").to_numpy(zero_copy_only=False), np.int64)
        src = np.asarray(t.column("source").to_numpy(zero_copy_only=False))
        # sources in sorted-string code order -> pair (a_code < b_code) is
        # lexicographic (source_a < source_b), matching the SQL oracle
        uniq, codes = np.unique(src, return_inverse=True)
        hs, cs = np.unique(np.stack([h, codes], axis=1), axis=0).T  # cross-batch dedup
        runs = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        L = np.diff(np.r_[runs, len(hs)])
        multi = L >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        starts2, L2 = runs[multi], L[multi]
        # ragged arange #1: per run, j = 1..L-1
        nj = L2 - 1
        joff = np.r_[0, np.cumsum(nj)]
        js = np.arange(joff[-1], dtype=np.int64) - np.repeat(joff[:-1], nj) + 1
        run_of_j = np.repeat(np.arange(len(L2)), nj)
        # ragged arange #2: each j expands to pairs (i=0..j-1, j)
        ioff = np.r_[0, np.cumsum(js)]
        i_flat = np.arange(ioff[-1], dtype=np.int64) - np.repeat(ioff[:-1], js)
        j_flat = np.repeat(js, js)
        run_flat = np.repeat(run_of_j, js)
        base = starts2[run_flat]
        a = cs[base + i_flat]
        b = cs[base + j_flat]
        key = a * len(uniq) + b
        kk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source_a": pa.array(uniq[kk // len(uniq)]),
                "source_b": pa.array(uniq[kk % len(uniq)]),
                "n_shared": pa.array(cnt.astype(np.int64)),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_PAIRS
        g = t.group_by(["source_a", "source_b"]).aggregate([("n_shared", "sum")])
        return g.rename_columns(["source_a", "source_b", "n_shared"])

    parted, _ = _auto_parted_partials(
        docs.map_batches(hash_partial, batch_format="pyarrow"), n_parts
    )
    partials = parted.groupby("part").map_groups(
        lambda t: part_pairs(t.drop_columns(["part"])), batch_format="pyarrow"
    )
    # partials are n_parts x n_sources^2-bounded (never corpus-scale): safe to
    # pin for the count that keeps a dup-free corpus schema-stable (an
    # all-empty map_groups stream would otherwise surface as schema-less)
    partials = partials.materialize()
    if partials.count() == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    # pair key space is n_sources^2-bounded -> one tiny root combine
    return partials.repartition(1).map_batches(
        combine, batch_size=None, batch_format="pyarrow"
    )
