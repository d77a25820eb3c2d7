"""Sharded source derivations: exact equivalence with the whole-series grouped
forms, including skewed series and shard-boundary cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(n=5000, n_types=4, seed=11, hot_frac=0.7):
    """ts-sorted synthetic events with one hot type (skew)."""
    rng = np.random.default_rng(seed)
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 10**9, n))
    p = np.full(n_types, (1 - hot_frac) / (n_types - 1))
    p[0] = hot_frac
    et = rng.choice([f"t{i}" for i in range(n_types)], size=n, p=p)
    val = np.round(rng.normal(10, 3, n), 3)
    return pa.table(
        {
            "event_type": pa.array(et),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(val, pa.float64()),
        }
    )


def _canon(ds):
    df = ds.to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    return df


@pytest.mark.parametrize("quantize", [None, "int"])
def test_events_sharded_equals_grouped(ray_session, quantize):
    import ray.data

    from scala_timeseries_lib_ray.sources.events import events_to_points
    from scala_timeseries_lib_ray.stages.shardedderive import events_to_points_sharded

    t = _events_table()
    sharded_in = ray.data.from_arrow([t.slice(i, 500) for i in range(0, t.num_rows, 500)])
    got = _canon(events_to_points_sharded(sharded_in, quantize))
    want = (
        ray.data.from_arrow(t)
        .groupby("event_type")
        .map_groups(lambda g: events_to_points(g, quantize), batch_format="pyarrow")
    )
    want = _canon(want)
    pd.testing.assert_frame_equal(got, want)


def test_events_sharded_series_missing_from_shards(ray_session):
    # a series absent from interior shards: its boundary gap spans several shards
    import ray.data

    from scala_timeseries_lib_ray.sources.events import events_to_points
    from scala_timeseries_lib_ray.stages.shardedderive import events_to_points_sharded

    rows = []
    for i in range(40):
        rows.append(("a", 1_700_000_000_000 + i * 1000, 1.0))
    rows.append(("b", 1_700_000_000_000 + 500, 2.0))
    rows.append(("b", 1_700_000_000_000 + 35_500, 3.0))  # next b is 35s later
    rows.sort(key=lambda r: r[1])
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    sharded = ray.data.from_arrow([t.slice(i, 7) for i in range(0, t.num_rows, 7)])
    got = _canon(events_to_points_sharded(sharded))
    want = _canon(
        ray.data.from_arrow(t)
        .groupby("event_type")
        .map_groups(lambda g: events_to_points(g, None), batch_format="pyarrow")
    )
    pd.testing.assert_frame_equal(got, want)
    # the early 'b' event's validity reflects the cross-shard gap (capped)
    b = got[got["source"] == "b"].reset_index(drop=True)
    assert b.loc[0, "validity"] == min(35_000, 600_000)


def test_tokens_sharded_ranks_match_grouped(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.sources.tokens import tokens_from_documents
    from scala_timeseries_lib_ray.stages.shardedderive import tokens_from_documents_sharded

    rng = np.random.default_rng(5)
    n = 3000
    src = rng.choice(["s0", "s1", "s2"], size=n, p=[0.8, 0.15, 0.05])  # hot source
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(src),
            "n_chars": pa.array(rng.integers(10, 500, n), pa.int64()),
        }
    )
    sharded = ray.data.from_arrow([t.slice(i, 250) for i in range(0, n, 250)])
    got = (
        tokens_from_documents_sharded(sharded, with_tokens=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        ray.data.from_arrow(t)
        .groupby("source")
        .map_groups(
            lambda g: tokens_from_documents(g, with_tokens=False), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_events_sharded_edge_cases(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.stages.shardedderive import events_to_points_sharded

    # single event: validity = cap
    t = pa.table(
        {
            "event_type": pa.array(["a"]),
            "ts": pa.array([1_700_000_000_000], pa.int64()),
            "value": pa.array([1.5], pa.float64()),
        }
    )
    out = events_to_points_sharded(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1 and out.loc[0, "validity"] == 600_000

    # empty input
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
        }
    )
    out2 = events_to_points_sharded(ray.data.from_arrow(empty)).to_pandas()
    assert len(out2) == 0


def test_tokens_sharded_single_block(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.stages.shardedderive import tokens_from_documents_sharded

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "source": pa.array(["s", "s", "s"]),
            "n_chars": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = tokens_from_documents_sharded(ray.data.from_arrow(t)).to_pandas()
    assert list(out.sort_values("doc_id")["doc_id"]) == ["s-00000000", "s-00000001", "s-00000002"]


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.integers(0, 10_000),  # seed
    st.integers(1, 6),  # number of shards
    st.integers(2, 5),  # number of event types
)
def test_events_sharded_fuzz_equivalence(ray_session, seed, n_shards, n_types):
    import ray.data

    from scala_timeseries_lib_ray.sources.events import events_to_points
    from scala_timeseries_lib_ray.stages.shardedderive import events_to_points_sharded

    t = _events_table(n=300, n_types=n_types, seed=seed, hot_frac=0.6)
    cut = max(1, t.num_rows // n_shards)
    shards = ray.data.from_arrow([t.slice(i, cut) for i in range(0, t.num_rows, cut)])
    got = _canon(events_to_points_sharded(shards))
    want = _canon(
        ray.data.from_arrow(t)
        .groupby("event_type")
        .map_groups(lambda g: events_to_points(g, None), batch_format="pyarrow")
    )
    pd.testing.assert_frame_equal(got, want)


def test_events_sharded_plan_is_streaming(ray_session):
    """The ev derivation must not materialize the derived points (r02 verdict):
    both union branches root directly at the parquet read — a whole-dataset
    materialize would surface as an InputData leaf instead."""
    import ray.data

    from scala_timeseries_lib_ray.stages.shardedderive import events_to_points_sharded

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = events_to_points_sharded(ds)

    leaves = []

    def walk(op):
        if not op.input_dependencies:
            leaves.append(type(op).__name__)
        for c in op.input_dependencies:
            walk(c)

    walk(out._logical_plan.dag)
    assert leaves == ["Read", "Read"], leaves
