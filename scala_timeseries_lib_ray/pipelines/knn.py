"""Exact k-nearest-neighbor graph over an embedding column.

``knn_graph`` computes, for EVERY vector, its top-k cosine neighbors — the
all-pairs generalization of ``dataprep.ann_topk`` (fixed small query set) and
the building block for embedding-based curation (near-dup clustering seeds,
diversity sampling, label propagation).

Scale shape — block-nested loop with a broadcast corpus, zero shuffle:

- The corpus is normalized once and staged into the object store as C
  fixed-size chunks (one ``ray.put`` per chunk; the driver streams batches
  through, never holding more than one chunk).
- One streaming ``map_batches`` pass over the same dataset treats each batch
  as the query side: for each corpus chunk it runs a (batch x chunk) matmul
  and keeps a per-query running candidate set of k+1 rows per chunk; the
  final per-query top-k (score desc, neighbor_id asc — deterministic under
  float ties) comes from one vectorized lexsort over the <= (k+1)*C
  candidates per query. Each task reads chunks zero-copy from the local
  object store; nothing is re-shipped per batch.

Memory contract: one chunk (chunk_rows x dim float64) plus one batch resident
per task at a time — independent of corpus size. The object store holds the
corpus once (it would anyway, as the input blocks). Compute is the honest
O(n^2 d) of exact KNN; for corpora where that is too hot, the pruned-read IVF
index (``pipelines/annindex.py``) is the approximate scale path — this
operator is the exact baseline it is measured against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dataprep import _emb_matrix


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)


def knn_graph(
    embeddings: ray.data.Dataset, k: int = 5, chunk_rows: int = 65536
) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank) for every vector's top-k cosine neighbors,
    rank 1..k ordered (similarity desc, neighbor_id asc), self excluded."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    refs = []
    for t in embeddings.iter_batches(batch_size=chunk_rows, batch_format="pyarrow"):
        ids, X = _emb_matrix(t)
        refs.append(ray.put((ids, _normalize(X))))
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )

    def partial(t: pa.Table) -> pa.Table:
        qids, Q = _emb_matrix(t)
        Qn = _normalize(Q)
        nq = len(qids)
        cand_ids, cand_sc = [], []
        for r in refs:
            ids, Xn = ray.get(r)
            S = Qn @ Xn.T  # (nq, chunk)
            kk = min(k + 1, S.shape[1])  # +1 so self-exclusion never costs a hit
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            cand_ids.append(ids[idx])
            cand_sc.append(np.take_along_axis(S, idx, axis=1))
        CI = np.concatenate(cand_ids, axis=1)  # (nq, <= (k+1)*C)
        CS = np.concatenate(cand_sc, axis=1)
        nc = CI.shape[1]
        qrow = np.repeat(np.arange(nq, dtype=np.int64), nc)
        ci, cs = CI.ravel(), CS.ravel()
        keep = ci != qids[qrow]  # drop self
        qrow, ci, cs = qrow[keep], ci[keep], cs[keep]
        # per-query rank: one global lexsort, then position within each query run
        order = np.lexsort((ci, -cs, qrow))
        qs, cis = qrow[order], ci[order]
        new = np.r_[True, qs[1:] != qs[:-1]]
        starts = np.flatnonzero(new)
        rank = np.arange(len(qs), dtype=np.int64) - starts[np.cumsum(new) - 1] + 1
        m = rank <= k
        return pa.table(
            {
                "query_id": pa.array(qids[qs[m]], pa.int64()),
                "neighbor_id": pa.array(cis[m], pa.int64()),
                "rank": pa.array(rank[m]),
            }
        )

    return embeddings.map_batches(partial, batch_format="pyarrow")
