"""Generic (non-float64) value types through fit / merge / splice / fill.

Reference values are generic ``T`` (``TimeSeries.scala:14``); the merger spec
merges Boolean prod data (``TimeSeriesMergerSpec.scala:399-420`` — strict AND of
two boolean series whose definedness never overlaps yields the empty series) and
the conformance bench instantiates String series (``TimeSeriesTestBench.scala``).
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from scala_timeseries_lib_ray.functions.fit import fit_sorted, fit_table
from scala_timeseries_lib_ray.functions.merge import OPS, merge_sweep
from scala_timeseries_lib_ray.functions.splice import append_series
from scala_timeseries_lib_ray.functions.transform import fill_sorted


def _arr(entries):
    ts = np.array([e[0] for e in entries], dtype=np.int64)
    val = np.array([e[1] for e in entries])
    dur = np.array([e[2] for e in entries], dtype=np.int64)
    return ts, val, dur


def test_bool_strict_and_disjoint_is_empty():
    """The reference prod-data regression shape: strict AND where the left
    series' domain falls entirely in a definedness gap of the right series."""
    left = _arr([(1000, True, 500)])
    # right toggles around the left's domain but is undefined on [900, 1600)
    right = _arr([(0, True, 400), (400, False, 500), (1600, True, 300)])
    ts, val, dur = merge_sweep([left, right], OPS["and_strict"])
    assert len(ts) == 0
    assert val.dtype == np.bool_ or val.dtype == object


def test_bool_strict_and_golden():
    a = _arr([(0, True, 1000)])
    b = _arr([(0, True, 300), (300, False, 400), (700, True, 600)])
    ts, val, dur = merge_sweep([a, b], OPS["and_strict"])
    # [0,300) T&T=T ; [300,700) T&F=F ; [700,1000) T&T=T ; [1000,1300) a undefined
    assert ts.tolist() == [0, 300, 700]
    assert [bool(v) for v in val] == [True, False, True]
    assert dur.tolist() == [300, 400, 300]


def test_bool_or_compresses_runs():
    a = _arr([(0, False, 500)])
    b = _arr([(0, True, 250), (250, True, 250)])
    ts, val, dur = merge_sweep([a, b], OPS["or_strict"])
    assert ts.tolist() == [0] and dur.tolist() == [500]
    assert bool(val[0]) is True


def test_string_fit_compresses_and_trims():
    t = pa.table(
        {
            "source": pa.array(["s", "s", "s", "s"]),
            "ts": pa.array([0, 100, 200, 350], pa.int64()),
            "value": pa.array(["a", "a", "b", "b"]),
            # second entry overlaps the third: trimmed at 200
            "validity": pa.array([100, 150, 150, 100], pa.int64()),
        }
    )
    out = fit_table(t, keys=("source",))
    assert out.column("value").to_pylist() == ["a", "b"]
    assert out.column("ts").to_pylist() == [0, 200]
    assert out.column("validity").to_pylist() == [200, 250]
    assert out.schema.field("value").type == pa.string()


def test_string_fallback_merge():
    a = _arr([(0, "up", 100), (300, "down", 100)])
    b = _arr([(0, "unknown", 500)])
    ts, val, dur = merge_sweep([a, b], OPS["fallback"])
    assert ts.tolist() == [0, 100, 300, 400]
    assert val.tolist() == ["up", "unknown", "down", "unknown"]
    assert dur.tolist() == [100, 200, 100, 100]


def test_string_append_splice():
    a = _arr([(0, "x", 400)])
    b = _arr([(200, "y", 100)])
    ts, val, dur = append_series(a, b)
    assert ts.tolist() == [0, 200]
    assert val.tolist() == ["x", "y"]
    assert dur.tolist() == [200, 100]


def test_string_fill_last_known():
    ts = np.array([0, 500], dtype=np.int64)
    val = np.array(["a", "b"])
    dur = np.array([100, 100], dtype=np.int64)
    f_ts, f_val, f_dur, _ = fill_sorted(ts, val, dur, None, last_known=True)
    # LKV filler 'a' over [100,500) merges with the first run
    assert f_ts.tolist() == [0, 500]
    assert f_val.tolist() == ["a", "b"]
    assert f_dur.tolist() == [500, 100]


def test_bool_fit_sorted_roundtrip():
    ts = np.array([0, 100, 200], dtype=np.int64)
    val = np.array([True, True, False])
    dur = np.array([100, 100, 100], dtype=np.int64)
    r_ts, r_val, r_dur, _ = fit_sorted(ts, val, dur, None)
    assert r_ts.tolist() == [0, 200]
    assert [bool(v) for v in r_val] == [True, False]
    assert r_dur.tolist() == [200, 100]


def test_bool_merge_blocks_stage(ray_session):
    """Boolean values through the BLOCK-co-partitioned merge stage: output
    column keeps bool type, results equal the whole-series sweep."""
    import ray.data

    from scala_timeseries_lib_ray.stages.mergestage import merge_pair_blocks

    a = [(i * 1000, i % 3 != 0, 1000) for i in range(50)]
    b = [(500 + i * 1000, i % 2 == 0, 1000) for i in range(50)]
    rows = [("a", *e) for e in a] + [("b", *e) for e in b]
    t = pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows]),
            "validity": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    assert t.schema.field("value").type == pa.bool_()
    ds = ray.data.from_arrow(t).repartition(4)
    got = (
        merge_pair_blocks(ds, "a", "b", OPS["and_strict"], block_width=10_000)
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got["value"].dtype == bool or got["value"].dtype == object
    want_ts, want_val, want_dur = merge_sweep(
        [_arr(a), _arr(b)], OPS["and_strict"]
    )
    # block-local compression may split runs at block edges; compare the step
    # function pointwise on the boundary union
    gt = got["ts"].to_numpy()
    gv = got["value"].to_numpy()
    gd = got["validity"].to_numpy()
    probes = np.unique(np.concatenate([want_ts, want_ts + want_dur - 1, gt, gt + gd - 1]))

    def at(ts_, val_, dur_, x):
        i = np.searchsorted(ts_, x, side="right") - 1
        if i < 0 or x >= ts_[i] + dur_[i]:
            return None
        return bool(val_[i])

    for x in probes:
        assert at(gt, gv, gd, x) == at(want_ts, want_val, want_dur, x), x
