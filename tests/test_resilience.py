"""Transient-failure resilience: a map_batches task that crashes once is retried
by Ray and the pipeline still produces the exact result — the property a
multi-hour 100-TB run depends on (spot preemptions, OOM-killed workers)."""

import os
import tempfile

import numpy as np
import pyarrow as pa


def test_transient_task_failure_is_retried_exactly(ray_session):
    import ray.data

    sentinel = os.path.join(tempfile.mkdtemp(), "failed_once")

    def flaky_double(t: pa.Table) -> pa.Table:
        # first attempt anywhere in the pool dies mid-stream; retries succeed
        if not os.path.exists(sentinel):
            with open(sentinel, "w") as f:
                f.write("x")
            raise RuntimeError("injected transient failure")
        v = np.asarray(t.column("value").to_numpy(zero_copy_only=False))
        return pa.table({"value": pa.array(v * 2.0)})

    t = pa.table({"value": pa.array(np.arange(1000, dtype=np.float64))})
    ds = ray.data.from_arrow(t).repartition(8)
    out = ds.map_batches(
        flaky_double,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    ).to_pandas()
    assert os.path.exists(sentinel)  # the failure really happened
    assert sorted(out["value"]) == list(np.arange(1000, dtype=np.float64) * 2.0)


def test_transient_failure_in_rollup_pipeline(ray_session):
    """Same property through a real pipeline stage (points -> 1m tier)."""
    import ray.data

    from scala_timeseries_lib_ray.stages.rollup import rollup_tier

    sentinel = os.path.join(tempfile.mkdtemp(), "failed_once")
    n = 5000
    pts = pa.table(
        {
            "source": pa.array(np.repeat(["a", "b"], n // 2)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000),
            "value": pa.array(np.ones(n)),
            "validity": pa.array(np.full(n, 1000, dtype=np.int64)),
        }
    )

    def flaky_identity(t: pa.Table) -> pa.Table:
        if not os.path.exists(sentinel):
            with open(sentinel, "w") as f:
                f.write("x")
            raise RuntimeError("injected transient failure")
        return t

    ds = ray.data.from_arrow(pts).repartition(4).map_batches(
        flaky_identity,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    )
    tier = rollup_tier(ds, 60_000, combine="tree").to_pandas()
    assert os.path.exists(sentinel)
    assert int(tier["count"].sum()) == n
    assert float(tier["sum"].sum()) == float(n)
