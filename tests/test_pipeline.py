"""End-to-end Ray Data pipeline tests: distributed results must equal the local
kernel results computed single-threaded on the same input (multi-partition semantics:
the shuffle/groupby layout must not change any value)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.functions.bucket import (
    bucket_split_arrays,
    finalize_tier_table,
    rollup_partials_table,
)
from scala_timeseries_lib_ray.sources.tokens import (
    derive_points_batch,
    synth_token_batch,
    zipf_source_counts,
)


@pytest.fixture(scope="module")
def token_ds(ray_session):
    import ray.data

    counts = zipf_source_counts(2000, 4)
    tables = []
    for s, c in counts.items():
        # several shards per source to force multi-block layout
        step = max(c // 3, 1)
        for lo in range(0, c, step):
            tables.append(synth_token_batch(s, lo, min(lo + step, c)))
    ds = ray.data.from_arrow(tables)
    return ds.repartition(8), counts


def local_points(counts) -> pa.Table:
    tabs = []
    for s, c in counts.items():
        tabs.append(derive_points_batch(synth_token_batch(s, 0, c)))
    return pa.concat_tables(tabs)


def test_derive_points_distributed_equals_local(token_ds):
    from scala_timeseries_lib_ray.stages.points import derive_points

    ds, counts = token_ds
    got = derive_points(ds).to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    want = (
        local_points(counts).to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_cascade_distributed_equals_local(token_ds):
    from scala_timeseries_lib_ray.pipelines.cascade import MS_1M, cascade_from_points
    from scala_timeseries_lib_ray.stages.points import derive_points

    ds, counts = token_ds
    tiers = cascade_from_points(derive_points(ds))
    got = (
        tiers["tier_1m"]
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        finalize_tier_table(rollup_partials_table(local_points(counts), MS_1M))
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True, rtol=1e-12, atol=1e-9)
    # wdur conservation: every tier redistributes the same defined time
    t1h = tiers["tier_1h"].to_pandas()
    t1d = tiers["tier_1d"].to_pandas()
    assert t1h["wdur"].sum() == want["wdur"].sum() == t1d["wdur"].sum()


def test_fit_blocks_distributed(token_ds):
    from scala_timeseries_lib_ray.functions.fit import fit_table
    from scala_timeseries_lib_ray.stages.fitstage import fit_blocks, split_at_blocks
    from scala_timeseries_lib_ray.stages.points import derive_points

    ds, counts = token_ds
    got = (
        fit_blocks(derive_points(ds), block_width=3_600_000)
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    # local: same block-split then per-(source, block) fit
    lp = local_points(counts)
    split = split_at_blocks(lp, 3_600_000)
    order = pa.compute.sort_indices(
        split,
        sort_keys=[("source", "ascending"), ("block_ts", "ascending"), ("ts", "ascending")],
    )
    want = (
        fit_table(split.take(order), keys=("source", "block_ts"))
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "ts", "value", "validity"]],
        want[["source", "ts", "value", "validity"]],
    )


def test_tokens_invariant(token_ds):
    from scala_timeseries_lib_ray.pipelines.invariant import verify_tokens

    ds, _ = token_ds
    res = verify_tokens(ds)
    assert res["mismatches"] == 0 and res["rows"] == ds.count()


def test_tokens_invariant_detects_corruption(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.invariant import verify_tokens

    t = synth_token_batch("src0", 0, 50)
    # corrupt one token of one row
    tok = t.column("tokens").combine_chunks()
    flat = np.asarray(tok.values).copy()
    flat[5] = (flat[5] + 1) % 50257
    corrupted = t.set_column(
        t.schema.get_field_index("tokens"),
        "tokens",
        pa.ListArray.from_arrays(tok.offsets, pa.array(flat, pa.int32())),
    )
    res = verify_tokens(ray.data.from_arrow(corrupted))
    assert res["mismatches"] == 1
