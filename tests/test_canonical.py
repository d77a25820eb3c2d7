"""refit_canonical must turn shard-local outputs into exactly the whole-series fit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.sources.tokens import synth_token_batch, derive_points_batch


@pytest.fixture(scope="module")
def quantized_points(ray_session):
    """Points with frequent equal-value runs (quantized) so compression matters,
    split across many small Ray blocks."""
    import ray.data

    tabs = []
    for si, n in (("a", 3000), ("b", 1200)):
        t = derive_points_batch(synth_token_batch(si if si == "a" else "b", 0, n))
        v = np.floor(
            np.asarray(t.column("value").to_numpy(zero_copy_only=False)) / 512.0
        )
        t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(v, pa.float64()))
        # rename source to si
        t = t.set_column(
            t.schema.get_field_index("source"), "source",
            pa.array([si] * len(t)),
        )
        tabs.append(t)
    return ray.data.from_arrow(tabs).repartition(13)


def _df(ds):
    return ds.to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)


def test_refit_shards_equals_global_fit(quantized_points):
    from scala_timeseries_lib_ray.stages.canonical import refit_canonical
    from scala_timeseries_lib_ray.stages.fitstage import fit_per_series, fit_shards

    shardwise = fit_shards(quantized_points, block_width=600_000)
    canonical = _df(refit_canonical(shardwise))
    globally = _df(fit_per_series(quantized_points))
    pd.testing.assert_frame_equal(canonical, globally)
    # and the shard-local form really did differ (otherwise this test proves nothing)
    raw = _df(fit_shards(quantized_points, block_width=600_000).map_batches(
        lambda t: t.select(["source", "ts", "value", "validity"]), batch_format="pyarrow"
    ))
    assert len(raw) > len(globally)


def test_refit_idempotent(quantized_points):
    from scala_timeseries_lib_ray.stages.canonical import refit_canonical
    from scala_timeseries_lib_ray.stages.fitstage import fit_shards

    once = refit_canonical(fit_shards(quantized_points, block_width=600_000))
    twice = refit_canonical(once)
    pd.testing.assert_frame_equal(_df(once), _df(twice))


def test_hot_source_skew_bounded(ray_session):
    """One pathologically hot source: the shard path never concentrates the series
    into one task (bounded batches) yet still yields the exact global fit."""
    import ray.data

    from scala_timeseries_lib_ray.stages.canonical import refit_canonical
    from scala_timeseries_lib_ray.stages.fitstage import fit_per_series, fit_shards

    t = derive_points_batch(synth_token_batch("hot", 0, 60_000))
    v = np.floor(np.asarray(t.column("value").to_numpy(zero_copy_only=False)) / 512.0)
    t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(v, pa.float64()))
    ds = ray.data.from_arrow(t).repartition(16)

    # observe per-batch sizes through the shard path: bounded by the partitioning,
    # NOT by the (single) series
    sizes = (
        fit_shards(ds, block_width=600_000)
        .map_batches(
            lambda b: pa.table({"n": pa.array([len(b)], pa.int64())}),
            batch_size=None,
            batch_format="pyarrow",
        )
        .to_pandas()["n"]
    )
    assert len(sizes) >= 8 and sizes.max() < len(t)  # spread across many tasks

    got = _df(refit_canonical(fit_shards(ds, block_width=600_000)))
    want = _df(fit_per_series(ds))
    pd.testing.assert_frame_equal(got, want)
