"""Sliding windows / integral conformance — goldens from NumericTimeSeriesSpec.scala:147-292
(slidingIntegral with TimeUnit.SECONDS) and stepIntegral goldens."""

import numpy as np
import pytest

from scala_timeseries_lib_ray.functions.transform import step_integral_sorted
from scala_timeseries_lib_ray.functions.window import (
    dynamic_window,
    sliding_integral,
    sliding_window,
)

from conftest import entries, as_triples


def sint(triples, window, rate, unit="s"):
    ts, v, d = entries(*triples)
    return as_triples(*sliding_integral(ts, v, d, window, rate, unit))


SINGLE = [(10, 1.0, 10)]
TWO_A = [(10, 1.0, 5), (15, 2.0, 10)]
TWO_B = [(10, 1.0, 10), (20, 2.0, 5)]
TRI_A = [(10, 1.0, 10), (20, 2.0, 2), (22, 3.0, 10)]
NC = [(10, 1.0, 5), (17, 2.0, 10)]


def test_window_smaller_than_rate_raises():
    with pytest.raises(ValueError):
        sint(SINGLE, 1, 10)


def test_single_entry():
    assert sint([], 10, 10) == []
    assert sint(SINGLE, 10, 10) == [(10, 10.0, 10)]
    assert sint(SINGLE, 20, 10) == [(10, 10.0, 10)]


def test_two_contiguous_a():
    assert sint(TWO_A, 3, 3) == [
        (10, 3.0, 3),
        (13, 6.0, 3),
        (16, 9.0, 3),
        (19, 12.0, 3),
        (22, 12.0, 3),
    ]
    assert sint(TWO_A, 5, 5) == [(10, 5.0, 5), (15, 15.0, 5), (20, 20.0, 5)]
    assert sint(TWO_A, 10, 5) == [(10, 5.0, 5), (15, 15.0, 5), (20, 25.0, 5)]
    assert sint(TWO_A, 12, 5) == [(10, 5.0, 5), (15, 15.0, 5), (20, 25.0, 5)]


def test_two_contiguous_b():
    assert sint(TWO_B, 4, 2) == [
        (10, 2.0, 2),
        (12, 4.0, 2),
        (14, 6.0, 2),
        (16, 6.0, 2),
        (18, 6.0, 2),
        (20, 8.0, 2),
        (22, 10.0, 2),
        (24, 12.0, 2),
    ]
    assert sint(TWO_B, 5, 5) == [(10, 5.0, 5), (15, 10.0, 5), (20, 15.0, 5)]
    assert sint(TWO_B, 9, 5) == [(10, 5.0, 5), (15, 10.0, 5), (20, 20.0, 4), (24, 15.0, 1)]
    assert sint(TWO_B, 10, 5) == [(10, 5.0, 5), (15, 10.0, 5), (20, 20.0, 5)]
    assert sint(TWO_B, 15, 5) == [(10, 5.0, 5), (15, 10.0, 5), (20, 20.0, 5)]


def test_tri():
    assert sint(TRI_A, 2, 2) == [
        (10, 2.0, 2),
        (12, 4.0, 2),
        (14, 4.0, 2),
        (16, 4.0, 2),
        (18, 4.0, 2),
        (20, 6.0, 2),
        (22, 10.0, 2),
        (24, 12.0, 2),
        (26, 12.0, 2),
        (28, 12.0, 2),
        (30, 12.0, 2),
    ]
    assert sint(TRI_A, 4, 2) == [
        (10, 2.0, 2),
        (12, 4.0, 2),
        (14, 6.0, 2),
        (16, 6.0, 2),
        (18, 6.0, 2),
        (20, 8.0, 2),
        (22, 12.0, 2),
        (24, 16.0, 2),
        (26, 18.0, 2),
        (28, 18.0, 2),
        (30, 18.0, 2),
    ]
    assert sint(TRI_A, 9, 3) == [
        (10, 3.0, 3),
        (13, 6.0, 3),
        (16, 9.0, 3),
        (19, 15.0, 3),
        (22, 21.0, 3),
        (25, 27.0, 3),
        (28, 33.0, 3),
        (31, 36.0, 3),
    ]
    assert sint(TRI_A, 12, 8) == [(10, 8.0, 8), (18, 24.0, 8), (26, 48.0, 4), (30, 40.0, 4)]


def test_non_contiguous():
    assert sint(NC, 2, 2) == [
        (10, 2.0, 2),
        (12, 4.0, 2),
        (14, 4.0, 2),
        (16, 6.0, 2),
        (18, 8.0, 2),
        (20, 8.0, 2),
        (22, 8.0, 2),
        (24, 8.0, 2),
        (26, 8.0, 2),
    ]
    assert sint(NC, 5, 5) == [(10, 5.0, 5), (15, 15.0, 5), (20, 20.0, 5), (25, 20.0, 5)]
    assert sint(NC, 12, 5) == [
        (10, 5.0, 5),
        (15, 15.0, 5),
        (20, 25.0, 5),
        (25, 35.0, 2),
        (27, 30.0, 3),
    ]


def test_step_integral():
    # TimeSeriesTestBench.scala:697-711: SECONDS
    ts, v, d = entries((100, 1.0, 10), (110, 2.0, 10), (120, 3.0, 10))
    r_ts, r_v, r_d, _ = step_integral_sorted(ts, v, d, step_length=10, time_unit="s")
    assert as_triples(r_ts, r_v, r_d) == [(100, 10.0, 10), (110, 30.0, 10), (120, 60.0, 10)]


def test_step_integral_multi_series():
    ts = np.array([100, 110, 100], dtype=np.int64)
    v = np.array([1.0, 2.0, 5.0])
    d = np.array([10, 10, 10], dtype=np.int64)
    seg = np.array([0, 0, 1])
    r_ts, r_v, r_d, _ = step_integral_sorted(ts, v, d, seg, time_unit="s")
    assert list(r_v) == [10.0, 30.0, 50.0]


def test_sliding_window_unaware_sum_and_minmax():
    # hand-derived from the event semantics: entries (0,1,10),(10,2,10), width 5
    ts, v, d = entries((0, 1.0, 10), (10, 2.0, 10))
    r = sliding_window(ts, v, d, 5, "sum")
    assert as_triples(*r) == [(0, 1.0, 10), (10, 3.0, 5), (15, 2.0, 5)]
    r = sliding_window(ts, v, d, 5, "max")
    assert as_triples(*r) == [(0, 1.0, 10), (10, 2.0, 10)]
    r = sliding_window(ts, v, d, 5, "min")
    assert as_triples(*r) == [(0, 1.0, 15), (15, 2.0, 5)]


def test_sliding_window_empty_interval_emits_zero_sum():
    # gap larger than window: sum emits 0-valued entries in the empty stretch
    ts, v, d = entries((0, 1.0, 10), (100, 2.0, 10))
    r = sliding_window(ts, v, d, 5, "sum")
    assert as_triples(*r) == [(0, 1.0, 15), (15, 0.0, 85), (100, 2.0, 10)]
    # min leaves a gap instead
    r = sliding_window(ts, v, d, 5, "min")
    assert as_triples(*r) == [(0, 1.0, 15), (100, 2.0, 10)]


def test_dynamic_window_sessionization():
    # windows open where value > 2, close at value <= 2 (WindowSlider.scala:286-319)
    ts, v, d = entries((0, 3.0, 5), (5, 4.0, 5), (10, 1.0, 5), (15, 5.0, 5), (20, 2.0, 5))
    start = v > 2
    stop = v <= 2
    r_ts, r_v, r_d = dynamic_window(ts, v, d, start, stop, "sum")
    assert as_triples(r_ts, r_v, r_d) == [(0, 7.0, 10), (15, 5.0, 5)]
