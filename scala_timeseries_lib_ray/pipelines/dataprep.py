"""Training-data pipeline operators over the documents/embeddings tables:
text analysis, fingerprinting, dedup family (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine), and brute-force ANN.

All hashing is deterministic (hashlib / fixed-constant mixers — never Python's
seeded ``hash``). Every stage is a vectorized ``map_batches`` kernel; wide steps
(bucket groupbys for LSH bands, candidate verification) state their shuffle keys.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ------------------------------------------------------------------- text analysis

# language marker word sets for the n-gram/stopword heuristic (checked as whole
# words, lowercase). Deterministic argmax with this tie-break order.
LANG_MARKERS = [
    ("en", r"\b(the|and|of|to|a)\b"),
    ("de", r"\b(der|die|das|und|ist)\b"),
    ("fr", r"\b(le|la|et|les|des)\b"),
    ("es", r"\b(el|los|las|y|una)\b"),
    ("zh", r"[\x{4e00}-\x{9fff}]"),
]

_PUNCT_RE = r"[.,;:!?]"
_TOKEN_RE = r"\S+"
_WORD_RE = r"[a-z0-9]+"


def text_stats_batch(t: pa.Table) -> pa.Table:
    """Quality metrics per doc: token count (whitespace tokens), punctuation count,
    mean token length, and a simple quality score — all with formulas the SQL oracle
    states verbatim (integer counts + one exact division)."""
    text = t.column("text")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE)
    n_punct = pc.count_substring_regex(text, _PUNCT_RE)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]")
    quality = pc.divide(
        pc.cast(n_alpha, pa.float64()),
        pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
    )
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "alpha_ratio": quality,
        }
    )


def lang_id_batch(t: pa.Table) -> pa.Table:
    """Marker-stopword language heuristic: count matches per language regex over the
    lowercased text, predict the argmax (ties -> earlier entry in LANG_MARKERS)."""
    low = pc.utf8_lower(t.column("text"))
    scores = [
        np.asarray(pc.count_substring_regex(low, rx).to_numpy(zero_copy_only=False))
        for _, rx in LANG_MARKERS
    ]
    S = np.stack(scores, axis=0)  # (lang, doc)
    best = np.argmax(S, axis=0)  # first max wins = LANG_MARKERS order
    names = np.array([name for name, _ in LANG_MARKERS])
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_pred": pa.array(names[best]),
            "score": pa.array(S[best, np.arange(S.shape[1])], pa.int64()),
        }
    )


FP_BASE = 1_000_003
FP_MOD = (1 << 61) - 1


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Two document fingerprints: md5 hex (oracle-checkable via SQL md5()) and a
    polynomial rolling hash of the bytes mod 2^61-1 (the streaming-friendly form)."""
    texts = t.column("text").to_pylist()
    md5s = [hashlib.md5(s.encode()).hexdigest() for s in texts]
    rolls = []
    for s in texts:
        h = 0
        for b in s.encode():
            h = (h * FP_BASE + b) % FP_MOD
        rolls.append(h)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "md5": pa.array(md5s),
            "rolling": pa.array(np.array(rolls, dtype=np.uint64).astype(np.int64)),
        }
    )


# ------------------------------------------------------------------------ dedup: exact


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup by content hash: hash in a vectorized map_batches, keep the min
    doc_id per hash. Shuffle key: the content hash (uniform — no skew)."""
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.lower().encode()).hexdigest() for s in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "text_hash": pa.array(h)})

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------- dedup: minhash/LSH

_M31 = (1 << 31) - 1  # Mersenne modulus: a*x+b stays < 2^62, so uint64 suffices


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles -> stable 31-bit hashes (md5-based, deterministic)."""
    words = re.findall(_WORD_RE, text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") % _M31
    return out


# fixed affine permutations a*x+b mod 2^31-1 (constants from a seeded generator —
# deterministic across runs and processes)
_PERM_RNG = np.random.default_rng(20240817)
N_HASHES = 64
_PERM_A = _PERM_RNG.integers(1, _M31, N_HASHES, dtype=np.int64).astype(np.uint64)
_PERM_B = _PERM_RNG.integers(0, _M31, N_HASHES, dtype=np.int64).astype(np.uint64)


def minhash_signature(text: str) -> np.ndarray:
    h = _shingle_hashes(text)
    if len(h) == 0:
        return np.full(N_HASHES, _M31, dtype=np.uint64)
    # fully vectorized (n_hashes, n_shingles) affine transform in uint64
    prods = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % np.uint64(_M31)
    return np.min(prods, axis=1)


def minhash_batch(t: pa.Table, bands: int = 16) -> pa.Table:
    """docs -> exploded (band, band_hash, doc_id) rows for the LSH bucket groupby."""
    rows_per_band = N_HASHES // bands
    doc_ids, band_ids, band_hashes = [], [], []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        sig = minhash_signature(text)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bh = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
            doc_ids.append(doc_id)
            band_ids.append(b)
            band_hashes.append(bh)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes),
        }
    )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    bands: int = 16,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup pairs: shingle->minhash per batch, explode to band
    buckets, groupby (band, band_hash) -> candidate pairs, verify exact Jaccard.
    Shuffle key: (band, band_hash) — uniform by construction. The text needed for
    verification rides along; at 10^12 scale the verify step re-reads texts by id
    from the source instead (broadcast-join on the candidate id set)."""
    sigs = docs.map_batches(lambda t: minhash_batch(t, bands), batch_format="pyarrow")
    with_text = sigs  # need the text for verification: join back via broadcast below

    # small-side broadcast of texts (documents catalog is the small side here)
    texts = {r["doc_id"]: r["text"] for r in docs.select_columns(["doc_id", "text"]).take_all()}
    import ray as _ray

    text_ref = _ray.put(texts)

    def emit_pairs(t: pa.Table) -> pa.Table:
        tx = _ray.get(text_ref)
        ids = sorted(set(t.column("doc_id").to_pylist()))
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(tx[ids[i]], tx[ids[j]])
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    pairs = with_text.groupby(["band", "band_hash"]).map_groups(
        emit_pairs, batch_format="pyarrow"
    )

    # candidate pairs can surface from several bands -> distinct. The pair set is
    # tiny relative to the corpus (near-dup pairs only), so a single-block dedupe
    # beats a second all-to-all groupby by ~10s on this Ray version.
    def dedupe(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return pairs.repartition(1).map_batches(dedupe, batch_size=None, batch_format="pyarrow")


# -------------------------------------------------------------------- dedup: simhash


def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit SimHash over word tokens (md5-based word hashes, unweighted)."""
    out = []
    for text in t.column("text").to_pylist():
        words = re.findall(_WORD_RE, text.lower())
        acc = np.zeros(64, dtype=np.int64)
        for w in set(words):
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits == 1, 1, -1)
        sh = 0
        for b in range(64):
            if acc[b] > 0:
                sh |= 1 << b
        out.append(sh)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "simhash": pa.array(np.array(out, dtype=np.uint64).astype(np.int64)),
        }
    )


def simhash_near_pairs(docs: ray.data.Dataset, max_hamming: int = 8) -> ray.data.Dataset:
    """SimHash near-dup pairs via 4-segment pigeonhole: pairs within Hamming
    distance d must share one of 4 16-bit segments if d <= 3·… (standard banding);
    groupby segment value -> candidate pairs -> exact popcount verify."""
    hashed = docs.map_batches(simhash_batch, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        sh = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False)).view(np.uint64)
        rows = {"doc_id": [], "seg": [], "seg_val": [], "simhash": []}
        for s in range(4):
            seg = (sh >> np.uint64(16 * s)) & np.uint64(0xFFFF)
            rows["doc_id"].append(ids)
            rows["seg"].append(np.full(len(ids), s, dtype=np.int32))
            rows["seg_val"].append(seg.astype(np.int64))
            rows["simhash"].append(sh.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(rows["doc_id"])),
                "seg": pa.array(np.concatenate(rows["seg"])),
                "seg_val": pa.array(np.concatenate(rows["seg_val"])),
                "simhash": pa.array(np.concatenate(rows["simhash"])),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sh = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False)).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        out_a, out_b, out_d = [], [], []
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if ids[i] == ids[j]:
                    continue
                d = int(bin(int(sh[i]) ^ int(sh[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    cand = hashed.map_batches(explode, batch_format="pyarrow")

    def dedupe(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        cand.groupby(["seg", "seg_val"])
        .map_groups(pairs, batch_format="pyarrow")
        .repartition(1)
        .map_batches(dedupe, batch_size=None, batch_format="pyarrow")
    )


# --------------------------------------------------------------- embeddings: ANN etc.


def _emb_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t.column("vec_id").to_numpy(zero_copy_only=False))
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    X = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(ids), -1
    )
    return ids, X


def ann_topk(
    embeddings: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 5,
) -> ray.data.Dataset:
    """Brute-force cosine top-k: the query matrix (vec_id < n_queries) is broadcast
    once via ray.put; every batch computes its partial top-k by matmul; a final
    single-block reduce merges partials. Scale path: per-batch partials keep the
    shuffle at (n_queries × k × n_batches) rows regardless of corpus size; an
    IVF/LSH-bucketed variant narrows the scanned set per query."""
    import ray as _ray

    q_rows = embeddings.filter(lambda r: r["vec_id"] < n_queries).take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = _ray.put((q_ids, Qn))

    def partial(t: pa.Table) -> pa.Table:
        qi, Qm = _ray.get(ref)
        ids, X = _emb_matrix(t)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        S = Qm @ Xn.T  # (q, n)
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        kk = min(k + 1, S.shape[1])
        for qrow, qid in enumerate(qi):
            idx = np.argpartition(-S[qrow], kk - 1)[:kk]
            rows["query_id"].append(np.full(len(idx), qid, dtype=np.int64))
            rows["neighbor_id"].append(ids[idx])
            rows["score"].append(S[qrow, idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows["query_id"])),
                "neighbor_id": pa.array(np.concatenate(rows["neighbor_id"])),
                "score": pa.array(np.concatenate(rows["score"]), pa.float64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("query_id").to_numpy(zero_copy_only=False))
        nb = np.asarray(t.column("neighbor_id").to_numpy(zero_copy_only=False))
        sc = np.asarray(t.column("score").to_numpy(zero_copy_only=False))
        out = {"query_id": [], "neighbor_id": [], "rank": []}
        for qid in np.unique(q):
            m = (q == qid) & (nb != qid)  # exclude self
            # deterministic: score desc, neighbor_id asc
            order = np.lexsort((nb[m], -sc[m]))[:k]
            out["query_id"].append(np.full(len(order), qid, dtype=np.int64))
            out["neighbor_id"].append(nb[m][order])
            out["rank"].append(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out["query_id"])),
                "neighbor_id": pa.array(np.concatenate(out["neighbor_id"])),
                "rank": pa.array(np.concatenate(out["rank"])),
            }
        )

    partials = embeddings.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(final, batch_size=None, batch_format="pyarrow")


def ann_topk_lsh(
    embeddings: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 8,
    max_probe_hamming: int = 3,
) -> ray.data.Dataset:
    """LSH-bucketed ANN — the scale path next to the brute-force baseline.

    Seeded random hyperplanes give every vector a sign-bit bucket id; a query only
    scores vectors whose bucket is within ``max_probe_hamming`` bits of its own
    (multi-probe). The probe mask is applied INSIDE each batch against the
    broadcast query buckets — candidate pruning with no shuffle; per-batch partial
    top-k rows (≤ queries × k per batch) reduce at the root as in ``ann_topk``.
    Approximate by construction; recall is tested against the brute-force baseline."""
    import ray as _ray

    rng = np.random.default_rng(20240817)
    q_rows = embeddings.filter(lambda r: r["vec_id"] < n_queries).take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    dim = Q.shape[1]
    planes = rng.normal(size=(dim, n_planes))
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    q_buckets = ((Qn @ planes) > 0).astype(np.uint64) @ (
        np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    )
    ref = _ray.put((q_ids, Qn, q_buckets, planes))

    def partial(t: pa.Table) -> pa.Table:
        qi, Qm, qb, P = _ray.get(ref)
        ids, X = _emb_matrix(t)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        xb = ((Xn @ P) > 0).astype(np.uint64) @ (
            np.uint64(1) << np.arange(P.shape[1], dtype=np.uint64)
        )
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qrow, qid in enumerate(qi):
            ham = np.bitwise_count((xb ^ qb[qrow]).astype(np.uint64)) if hasattr(
                np, "bitwise_count"
            ) else np.array([bin(int(x)).count("1") for x in (xb ^ qb[qrow])])
            cand = np.flatnonzero(ham <= max_probe_hamming)
            if len(cand) == 0:
                continue
            S = Qm[qrow] @ Xn[cand].T
            kk = min(k + 1, len(cand))
            top = np.argpartition(-S, kk - 1)[:kk]
            rows["query_id"].append(np.full(len(top), qid, dtype=np.int64))
            rows["neighbor_id"].append(ids[cand][top])
            rows["score"].append(S[top])
        if not rows["query_id"]:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows["query_id"])),
                "neighbor_id": pa.array(np.concatenate(rows["neighbor_id"])),
                "score": pa.array(np.concatenate(rows["score"]), pa.float64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("query_id").to_numpy(zero_copy_only=False))
        nb = np.asarray(t.column("neighbor_id").to_numpy(zero_copy_only=False))
        sc = np.asarray(t.column("score").to_numpy(zero_copy_only=False))
        out = {"query_id": [], "neighbor_id": [], "rank": []}
        for qid in np.unique(q):
            m = (q == qid) & (nb != qid)
            order = np.lexsort((nb[m], -sc[m]))[:k]
            out["query_id"].append(np.full(len(order), qid, dtype=np.int64))
            out["neighbor_id"].append(nb[m][order])
            out["rank"].append(np.arange(1, len(order) + 1, dtype=np.int64))
        if not out["query_id"]:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out["query_id"])),
                "neighbor_id": pa.array(np.concatenate(out["neighbor_id"])),
                "rank": pa.array(np.concatenate(out["rank"])),
            }
        )

    partials = embeddings.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(final, batch_size=None, batch_format="pyarrow")


def embedding_centroids(embeddings: ray.data.Dataset, round_to: int = 4) -> ray.data.Dataset:
    """Per-label, per-dimension centroid: partial (label, dim-sums, count) per batch,
    map-only tree combine, finalize mean (long format: label, pos, centroid)."""

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column("label").to_numpy(zero_copy_only=False))
        _ids, X = _emb_matrix(t)
        out_l, out_p, out_s, out_c = [], [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            s = X[m].sum(axis=0)
            out_l.append(np.full(X.shape[1], lab, dtype=np.int64))
            out_p.append(np.arange(X.shape[1], dtype=np.int64))
            out_s.append(s)
            out_c.append(np.full(X.shape[1], int(m.sum()), dtype=np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(out_l)),
                "pos": pa.array(np.concatenate(out_p)),
                "s": pa.array(np.concatenate(out_s), pa.float64()),
                "n": pa.array(np.concatenate(out_c)),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().groupby(["label", "pos"], as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        c = df["s"] / df["n"]
        df["centroid"] = np.sign(c) * np.floor(np.abs(c) * 10**round_to + 0.5) / 10**round_to
        return pa.Table.from_pandas(
            df[["label", "pos", "centroid", "n"]], preserve_index=False
        )

    partials = embeddings.map_batches(partial, batch_format="pyarrow")
    return (
        partials.repartition(1)
        .map_batches(combine, batch_size=None, batch_format="pyarrow")
        .map_batches(final, batch_format="pyarrow")
    )


def embedding_near_dup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.92
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs: broadcast the (normalized) corpus matrix —
    small here; at scale LSH-bucket by random hyperplane signs first — and scan
    batches against it with one matmul per batch."""
    import ray as _ray

    rows = embeddings.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    ref = _ray.put((ids, Xn))

    def scan(t: pa.Table) -> pa.Table:
        cid, C = _emb_matrix(t)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
        aid, A = _ray.get(ref)
        S = Cn @ A.T
        ii, jj = np.nonzero(S >= threshold)
        a = cid[ii]
        b = aid[jj]
        keep = a < b  # dedupe (a,b)/(b,a) and self
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(S[ii, jj][keep], pa.float64()),
            }
        )

    return embeddings.map_batches(scan, batch_format="pyarrow")
