"""Integer-grid Lloyd k-means (pipelines/cluster.py): planted-cluster recovery,
empty-cluster handling, DuckDB unrolled-CTE parity."""

import numpy as np
import pyarrow as pa


def mk_emb(X):
    return pa.table(
        {
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array([row.tolist() for row in np.asarray(X, np.float32)],
                                  pa.list_(pa.float32())),
        }
    )


def test_kmeans_recovers_planted_mixture(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.cluster import embedding_kmeans

    rng = np.random.default_rng(3)
    centers = rng.normal(0, 10, (4, 16))
    labels = np.repeat(np.arange(4), 50)
    # ensure vec_id 0..3 (the init seeds) are one from each planted cluster
    labels = labels[np.r_[np.arange(0, 200, 50), np.delete(np.arange(200), np.arange(0, 200, 50))]]
    X = centers[labels] + rng.normal(0, 0.1, (200, 16))
    ds = ray.data.from_arrow([mk_emb(X).slice(i, 40) for i in range(0, 200, 40)])
    out = embedding_kmeans(ds, k=4, iters=3).to_pandas().sort_values("vec_id")
    # every planted group maps to exactly one kmeans cluster
    for g in range(4):
        assert out["cluster"][np.flatnonzero(labels == g)].nunique() == 1
    assert out["cluster"].nunique() == 4


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.cluster import kmeans_fit

    # seed vec 1 is a far outlier: after iteration 1 every point assigns to
    # cluster 0's neighborhood except the outlier itself; make the outlier
    # closer to centroid 0 after update so cluster 1 empties in iter 2 and must
    # keep its previous centroid (not NaN / crash).
    X = np.array(
        [[0.0, 0.0], [100.0, 100.0], [0.1, 0.1], [0.2, 0.0], [0.0, 0.2]],
        dtype=np.float64,
    )
    ds = ray.data.from_arrow(mk_emb(X))
    C = kmeans_fit(ds, k=2, iters=4)
    assert C.shape == (2, 2)
    assert not np.isnan(C.astype(np.float64)).any()
    # outlier centroid survives: cluster 1 stays at the outlier's position
    assert (np.abs(C[1]) > 1000).all()


def test_kmeans_duckdb_parity_fuzz(ray_session):
    import duckdb
    import ray.data

    import __ray_entry__ as e
    from scala_timeseries_lib_ray.pipelines.cluster import embedding_kmeans

    rng = np.random.default_rng(17)
    X = rng.normal(0, 2, (300, 8)).astype(np.float32)
    t = mk_emb(X)
    ds = ray.data.from_arrow([t.slice(i, 64) for i in range(0, 300, 64)])
    out = (
        embedding_kmeans(ds, k=5, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    ora = (
        con.execute(e._sql_embedding_kmeans(k=5, iters=2, dim=8) + " ORDER BY vec_id")
        .df()
    )
    assert out.equals(ora)
