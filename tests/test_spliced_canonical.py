"""Fused derive+splice+canonical-fit (stages/shardedderive.spliced_points_canonical)
must exactly equal the whole-series reference kernel (functions/splice.py
append_series/prepend_series with compression) applied to globally derived
points — including run compression across the junction, across shard edges, and
around repaired shard-last rows.

(The older composition refit_canonical(append_blocks(events_to_points_sharded))
is NOT the conformance target: the sharded derivation's union places the
repaired shard-boundary rows in one batch whose rows are temporally interior to
other batches, violating refit_canonical's cross-batch contract — equal-value
runs touching a shard boundary stay unmerged. The fused op exists precisely to
make the exact semantics streamable.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(n=4000, n_types=3, seed=7, coarse=True):
    """ts-sorted events; ``coarse`` quantizes values to few levels so equal
    adjacent values (compression work) are common."""
    rng = np.random.default_rng(seed)
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 3 * 10**8, n))
    et = rng.choice([f"t{i}" for i in range(n_types)], size=n)
    val = rng.normal(10, 1, n)
    if coarse:
        val = np.round(val)  # few distinct levels -> frequent equal runs
    return pa.table(
        {
            "event_type": pa.array(et),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(val, pa.float64()),
        }
    )


def _sharded(t, shard=400):
    import ray.data

    return ray.data.from_arrow([t.slice(i, shard) for i in range(0, t.num_rows, shard)])


def _canon(ds):
    return ds.to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)


def _series(t, name):
    from scala_timeseries_lib_ray.sources.events import events_to_points

    df = events_to_points(t).to_pandas()
    s = df[df.source == name]
    return s.ts.to_numpy(), s.value.to_numpy(), s.validity.to_numpy()


@pytest.mark.parametrize("mode", ["append", "prepend"])
@pytest.mark.parametrize("coarse", [True, False])
def test_fused_equals_exact_kernel(ray_session, mode, coarse):
    from scala_timeseries_lib_ray.functions.splice import append_series, prepend_series
    from scala_timeseries_lib_ray.stages.shardedderive import spliced_points_canonical

    t = _events_table(coarse=coarse)
    got = _canon(spliced_points_canonical(_sharded(t), "t0", "t1", mode))
    fn = append_series if mode == "append" else prepend_series
    r_ts, r_val, r_dur = fn(_series(t, "t0"), _series(t, "t1"), compress=True)
    out_source = "t0+t1" if mode == "append" else "t1+t0"
    want = pd.DataFrame(
        {"source": out_source, "ts": r_ts, "value": r_val, "validity": r_dur}
    ).sort_values(["source", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


@pytest.mark.parametrize("mode", ["append", "prepend"])
def test_fused_empty_b_is_compressed_identity(ray_session, mode):
    """Splicing against an absent series keeps all of ``a`` (reference append/
    prepend on an empty argument is identity), canonically compressed (the
    query-level islands semantics)."""
    from scala_timeseries_lib_ray.functions.fit import fit_sorted
    from scala_timeseries_lib_ray.stages.shardedderive import spliced_points_canonical

    t = _events_table(n=500, n_types=2)
    got = _canon(spliced_points_canonical(_sharded(t, 100), "t0", "zzz", mode))
    a_ts, a_val, a_dur = _series(t, "t0")
    r_ts, r_val, r_dur, _ = fit_sorted(a_ts, a_val, a_dur, None, compress=True, validate=False)
    out_source = "t0+zzz" if mode == "append" else "zzz+t0"
    want = pd.DataFrame(
        {"source": out_source, "ts": r_ts, "value": r_val, "validity": r_dur}
    ).sort_values(["source", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.integers(0, 10_000),  # seed
    st.integers(1, 7),  # number of shards
    st.sampled_from(["append", "prepend"]),
)
def test_fused_fuzz_equals_exact_kernel(ray_session, seed, n_shards, mode):
    """Random shard cuts + coarse values (frequent equal runs): the fused op
    must equal the whole-series reference kernel for any shard layout."""
    import ray.data

    from scala_timeseries_lib_ray.functions.splice import append_series, prepend_series
    from scala_timeseries_lib_ray.stages.shardedderive import spliced_points_canonical

    t = _events_table(n=300, n_types=3, seed=seed, coarse=True)
    cut = max(1, t.num_rows // n_shards)
    shards = ray.data.from_arrow([t.slice(i, cut) for i in range(0, t.num_rows, cut)])
    got = _canon(spliced_points_canonical(shards, "t0", "t1", mode))
    fn = append_series if mode == "append" else prepend_series
    r_ts, r_val, r_dur = fn(_series(t, "t0"), _series(t, "t1"), compress=True)
    out_source = "t0+t1" if mode == "append" else "t1+t0"
    want = pd.DataFrame(
        {"source": out_source, "ts": r_ts, "value": r_val, "validity": r_dur}
    ).sort_values(["source", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fused_plan_is_streaming(ray_session):
    """Both passes of the fused splice root directly at the parquet read — no
    materialize of the derived points anywhere in the plan."""
    import ray.data

    from scala_timeseries_lib_ray.stages.shardedderive import spliced_points_canonical

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = spliced_points_canonical(ds, "click", "view", "append")

    leaves = []

    def walk(op):
        if not op.input_dependencies:
            leaves.append(type(op).__name__)
        for c in op.input_dependencies:
            walk(c)

    walk(out._logical_plan.dag)
    assert leaves == ["Read", "Read"], leaves


def test_cut_closed_form_matches_derived_points(ray_session):
    """append cut = min b point ts; prepend cut = max b point end — the
    closed forms from the raw log must equal the values computed from the
    actual derived points."""
    from scala_timeseries_lib_ray.stages.shardedderive import splice_cut_from_events

    t = _events_table(n=1000, n_types=2)
    ev = _sharded(t, 200)
    b_ts, _, b_dur = _series(t, "t1")
    assert splice_cut_from_events(ev, "t1", "append") == int(b_ts.min())
    assert splice_cut_from_events(ev, "t1", "prepend") == int((b_ts + b_dur).max())
