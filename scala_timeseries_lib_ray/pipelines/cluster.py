"""Distributed k-means over the embedding corpus — exact, oracle-checkable.

Lloyd's algorithm is the canonical iterative fan-out/reduce: broadcast the k
centroids, every batch computes assignments + per-cluster partial sums (the
only data movement is O(k x dim) partials per block), a tiny driver-side
reduce updates the centroids, repeat. The corpus is streamed once per
iteration and never materialized.

Exactness protocol (the whole run is hash-identical to an unrolled-CTE DuckDB
oracle, see __ray_entry__._sql_embedding_kmeans):

- inputs quantized once: q = round_half_away(CAST(x AS DOUBLE) * 1000) — an
  int64 grid, so every distance is an exact integer (|q| <= ~5e3, squared
  diffs x 64 dims < 2^53: exact in both int64 and DOUBLE).
- init: centroids = the quantized vectors with vec_id 0..k-1 (deterministic).
- assignment: argmin over integer distances, ties to the smallest cluster id.
- update: c = round_half_away(sum / count) per dim — back on the int64 grid
  each iteration, so float summation order never matters anywhere. Empty
  clusters keep their previous centroid.

distance computation is BLAS (float64 matmul — products < 2^53 stay exact),
not a Python loop; the per-iteration reduce moves k x dim x n_blocks rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

QUANT = 1000.0


def _round_half_away(v: np.ndarray) -> np.ndarray:
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _quant_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t.column("vec_id").to_numpy(zero_copy_only=False))
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    X = flat.reshape(len(ids), -1)
    return ids, _round_half_away(X * QUANT)

def _assign(Q: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer argmin distances via float64 BLAS (all values < 2^53 — exact).
    Ties go to the smallest cluster id (np.argmin picks the first minimum)."""
    Qf = Q.astype(np.float64)
    Cf = C.astype(np.float64)
    d = (
        (Qf * Qf).sum(axis=1)[:, None]
        - 2.0 * Qf @ Cf.T
        + (Cf * Cf).sum(axis=1)[None, :]
    )
    a = np.argmin(d, axis=1)
    return a, d[np.arange(len(a)), a].astype(np.int64)


def _init_centroids(embeddings: ray.data.Dataset, k: int) -> np.ndarray:
    seed = embeddings.filter(
        expr=f"vec_id < {k}"
    ).to_pandas()  # k rows only — tiny by construction
    seed = seed.sort_values("vec_id")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in seed["embedding"]])
    return _round_half_away(X * QUANT)


def kmeans_fit(
    embeddings: ray.data.Dataset, k: int = 8, iters: int = 3
) -> np.ndarray:
    """Run `iters` Lloyd iterations; returns the final (k x dim) int64 centroid
    matrix. Per iteration: one streaming pass emitting (cluster, dim-sums,
    count) partials per batch; the k x dim reduce happens on the driver (it is
    smaller than a single block)."""
    C = _init_centroids(embeddings, k)

    for _ in range(iters):
        ref = ray.put(C)

        def partials(t: pa.Table) -> pa.Table:
            Cb = ray.get(ref)
            _ids, Q = _quant_matrix(t)
            a, _d = _assign(Q, Cb)
            kk, dim = Cb.shape
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, a, Q)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        rows = embeddings.map_batches(
            partials, batch_format="pyarrow"
        ).take_all()
        kk, dim = C.shape
        sums = np.zeros((kk, dim), dtype=np.int64)
        cnt = np.zeros(kk, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
            cnt[r["cluster"]] += r["n"]
        upd = cnt > 0
        newC = C.copy()
        newC[upd] = _round_half_away(
            sums[upd].astype(np.float64) / cnt[upd][:, None].astype(np.float64)
        )
        C = newC

    return C


def embedding_kmeans(
    embeddings: ray.data.Dataset, k: int = 8, iters: int = 3
) -> ray.data.Dataset:
    """Final assignment table (vec_id, cluster, dist) after `iters` exact
    integer-grid Lloyd iterations — dist is the exact integer squared distance
    on the quantized grid."""
    C = kmeans_fit(embeddings, k=k, iters=iters)
    ref = ray.put(C)

    def assign_batch(t: pa.Table) -> pa.Table:
        Cb = ray.get(ref)
        ids, Q = _quant_matrix(t)
        a, d = _assign(Q, Cb)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(d, pa.int64()),
            }
        )

    return embeddings.map_batches(assign_batch, batch_format="pyarrow")
