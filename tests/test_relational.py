"""broadcast_join / shuffle_join: pandas-merge parity, left-join nulls,
duplicate-key rejection, empty small side."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _fact(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 60, n).astype(np.int64)),
            "v": pa.array(rng.normal(size=n)),
        }
    )


def _dim():
    # keys 0..49 -> fact keys 50..59 are unmatched
    return pa.table(
        {
            "dk": pa.array(np.arange(50, dtype=np.int64)),
            "name": pa.array([f"n{i}" for i in range(50)]),
            "w": pa.array(np.arange(50, dtype=np.int64) * 10),
        }
    )


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(ray_session, how):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.relational import broadcast_join

    f, d = _fact(), _dim()
    fds = ray.data.from_arrow([f.slice(i, 100) for i in range(0, f.num_rows, 100)])
    got = broadcast_join(
        fds, ray.data.from_arrow(d), key="k", right_key="dk", how=how
    ).to_pandas()
    want = f.to_pandas().merge(
        d.to_pandas().rename(columns={"dk": "k"}), on="k", how=how
    )
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_broadcast_join_column_pruning_and_dup_rejection(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.relational import broadcast_join

    f, d = _fact(), _dim()
    fds = ray.data.from_arrow(f)
    got = broadcast_join(
        fds, ray.data.from_arrow(d), key="k", right_key="dk", columns=["name"]
    ).to_pandas()
    assert set(got.columns) == {"k", "v", "name"}
    dup = pa.concat_tables([d, d.slice(0, 3)])
    with pytest.raises(ValueError, match="duplicate keys"):
        broadcast_join(fds, ray.data.from_arrow(dup), key="k", right_key="dk")
    empty = d.slice(0, 0)
    with pytest.raises(ValueError, match="empty"):
        broadcast_join(fds, ray.data.from_arrow(empty), key="k", right_key="dk")
    with pytest.raises(ValueError, match="how"):
        broadcast_join(fds, ray.data.from_arrow(d), key="k", right_key="dk", how="outer")


def test_shuffle_join_matches_pandas(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.relational import shuffle_join

    f, d = _fact(), _dim()
    got = shuffle_join(
        ray.data.from_arrow(f),
        ray.data.from_arrow(d),
        on=("k",),
        right_on=("dk",),
        num_partitions=4,
    ).to_pandas()
    want = f.to_pandas().merge(d.to_pandas(), left_on="k", right_on="dk")
    if "dk" not in got.columns:
        want = want.drop(columns=["dk"])
    pd.testing.assert_frame_equal(
        _canon(got[sorted(got.columns)]), _canon(want[sorted(want.columns)]), check_dtype=False
    )


def test_shuffle_join_multivalued_right_side(ray_session):
    """Duplicate keys on the right side fan out (1:N join) — the case
    broadcast_join rejects by contract."""
    import ray.data

    from scala_timeseries_lib_ray.pipelines.relational import shuffle_join

    f = pa.table(
        {"k": pa.array([0, 1, 2, 2], pa.int64()), "v": pa.array([1.0, 2.0, 3.0, 4.0])}
    )
    d = pa.table(
        {
            "dk": pa.array([2, 2, 0], pa.int64()),
            "name": pa.array(["a", "b", "c"]),
        }
    )
    got = shuffle_join(
        ray.data.from_arrow(f), ray.data.from_arrow(d), on=("k",), right_on=("dk",),
        num_partitions=2,
    ).to_pandas()
    want = f.to_pandas().merge(d.to_pandas(), left_on="k", right_on="dk")
    if "dk" not in got.columns:
        want = want.drop(columns=["dk"])
    pd.testing.assert_frame_equal(
        _canon(got[sorted(got.columns)]),
        _canon(want[sorted(want.columns)]),
        check_dtype=False,
    )


def test_broadcast_join_rejects_column_collision(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.relational import broadcast_join

    f = _fact(50)
    d = pa.table(
        {"dk": pa.array(np.arange(50, dtype=np.int64)), "v": pa.array(np.arange(50.0))}
    )
    with pytest.raises(ValueError, match="collide"):
        broadcast_join(ray.data.from_arrow(f), ray.data.from_arrow(d), key="k", right_key="dk")
