"""fill / append / prepend / queue-aggregator conformance —
goldens from TimeSeriesTestBench.scala:426-696."""

import numpy as np

from scala_timeseries_lib_ray.functions.splice import append_series, prepend_series
from scala_timeseries_lib_ray.functions.transform import fill_sorted
from scala_timeseries_lib_ray.functions.window import sliding_window

from conftest import entries, as_triples

TRI_GAPPED = [(1, 111.0, 9), (20, 222.0, 10), (40, 444.0, 10)]
TRI = [(1, 111.0, 10), (11, 222.0, 10), (21, 444.0, 10)]


def fill(triples, fv):
    ts, v, d = entries(*triples)
    f_ts, f_v, f_d, _ = fill_sorted(ts, v, d, fill_value=fv)
    return as_triples(f_ts, f_v, f_d)


def test_fill_contiguous_noop():
    another_three = [(1, 111.0, 9), (10, 222.0, 10), (20, 444.0, 10)]
    assert fill(another_three, 333.0) == another_three


def test_fill_goldens():
    assert fill(TRI_GAPPED, 333.0) == [
        (1, 111.0, 9),
        (10, 333.0, 10),
        (20, 222.0, 10),
        (30, 333.0, 10),
        (40, 444.0, 10),
    ]
    assert fill(TRI_GAPPED, 111.0) == [
        (1, 111.0, 19),
        (20, 222.0, 10),
        (30, 111.0, 10),
        (40, 444.0, 10),
    ]
    assert fill(TRI_GAPPED, 222.0) == [(1, 111.0, 9), (10, 222.0, 30), (40, 444.0, 10)]
    assert fill(TRI_GAPPED, 444.0) == [
        (1, 111.0, 9),
        (10, 444.0, 10),
        (20, 222.0, 10),
        (30, 444.0, 20),
    ]


def test_append_goldens():
    # TimeSeriesTestBench.scala:511-545 (compress=false variants use distinct values
    # so compression has no effect — our splice always re-fits)
    a = entries(*TRI)

    def app(ts0, val=999.0, dur=10):
        b = entries((ts0, val, dur))
        return as_triples(*append_series(a, b))

    assert app(32) == [(1, 111.0, 10), (11, 222.0, 10), (21, 444.0, 10), (32, 999.0, 10)]
    assert app(31) == [(1, 111.0, 10), (11, 222.0, 10), (21, 444.0, 10), (31, 999.0, 10)]
    assert app(30) == [(1, 111.0, 10), (11, 222.0, 10), (21, 444.0, 9), (30, 999.0, 10)]
    assert app(22) == [(1, 111.0, 10), (11, 222.0, 10), (21, 444.0, 1), (22, 999.0, 10)]
    assert app(21) == [(1, 111.0, 10), (11, 222.0, 10), (21, 999.0, 10)]
    assert app(11) == [(1, 111.0, 10), (11, 999.0, 10)]
    assert app(1) == [(1, 999.0, 10)]


def test_append_compresses_at_seam():
    a = entries((0, 5.0, 10))
    b = entries((5, 5.0, 10))
    assert as_triples(*append_series(a, b)) == [(0, 5.0, 15)]


def test_prepend_goldens():
    a = entries(*TRI)

    def pre(ts0, dur=10):
        b = entries((ts0, 999.0, dur))
        return as_triples(*prepend_series(a, b))

    # b ends before a starts -> simple concat
    assert pre(-10) == [(-10, 999.0, 10)] + TRI
    # b overlaps a's first entry -> a trimmed left at b's end
    assert pre(-5) == [(-5, 999.0, 10), (5, 111.0, 6), (11, 222.0, 10), (21, 444.0, 10)]
    # b covers a's first entry entirely
    assert pre(1) == [(1, 999.0, 10), (11, 222.0, 10), (21, 444.0, 10)]


def test_queue_aggregator_udf_median():
    # Aggregator.queueAggregator escape hatch: median over the window content
    ts, v, d = entries((0, 1.0, 10), (10, 5.0, 10), (20, 3.0, 10))

    def median(vals, durs):
        return float(np.median(vals)) if len(vals) else None

    r_ts, r_v, r_d = sliding_window(ts, v, d, 5, median)
    # member iff e.ts <= t < e.definedUntil + width:
    # [0,10):{1} [10,15):{1,5} [15,20):{5} [20,25):{5,3} [25,30):{3}
    assert as_triples(r_ts, r_v, r_d) == [
        (0, 1.0, 10),
        (10, 3.0, 5),
        (15, 5.0, 5),
        (20, 4.0, 5),
        (25, 3.0, 5),
    ]


def test_merge_ordered_seqs_stable_ties():
    import numpy as np

    from scala_timeseries_lib_ray.functions.splice import merge_ordered_seqs

    a = (np.array([1, 5, 9]), np.array([10.0, 11.0, 12.0]), np.array([1, 1, 1]))
    b = (np.array([1, 5, 7]), np.array([20.0, 21.0, 22.0]), np.array([2, 2, 2]))
    ts, val, dur = merge_ordered_seqs(a, b)
    assert ts.tolist() == [1, 1, 5, 5, 7, 9]
    # ties: left sequence's element first (TimeSeriesMerger.scala lteq)
    assert val.tolist() == [10.0, 20.0, 11.0, 21.0, 22.0, 12.0]
    assert dur.tolist() == [1, 2, 1, 2, 2, 1]


def test_append_prepend_blocks_empty_b_is_identity(ray_session):
    """Reference append/prepend with an empty argument is identity (ADVICE r02:
    Dataset.min('ts') returns None for an empty side — must not crash)."""
    import pyarrow as pa
    import ray.data

    from scala_timeseries_lib_ray.stages.mergestage import append_blocks, prepend_blocks

    t = pa.table(
        {
            "source": pa.array(["a", "a"]),
            "ts": pa.array([1000, 3000], pa.int64()),
            "value": pa.array([1.0, 2.0]),
            "validity": pa.array([1000, 500], pa.int64()),
        }
    )
    pts = ray.data.from_arrow(t)
    got_app = append_blocks(pts, "a", "b").to_pandas().sort_values("ts").reset_index(drop=True)
    got_pre = prepend_blocks(pts, "a", "b").to_pandas().sort_values("ts").reset_index(drop=True)
    for got in (got_app, got_pre):
        assert got["ts"].tolist() == [1000, 3000]
        assert got["value"].tolist() == [1.0, 2.0]
        assert got["validity"].tolist() == [1000, 500]
