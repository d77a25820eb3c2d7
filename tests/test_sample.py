"""Sampling conformance — goldens from TimeSeriesSpec.scala:382-507."""

from scala_timeseries_lib_ray.functions.sample import sample_series

from conftest import entries, as_triples

SERIES = [(100, 0.123, 90), (190, 0.234, 50), (200, 0.345, 10), (250, 0.456, 100)]


def sample(triples, start, rate, closest=False, compress=False):
    ts, v, d = entries(*triples)
    return as_triples(*sample_series(ts, v, d, start, rate, closest, compress))


def test_empty():
    assert sample([], 1000, 10) == []
    assert sample([], 1000, 10, closest=True) == []


def test_strict_rate100():
    assert sample(SERIES, 0, 100) == [(100, 0.123, 100), (200, 0.345, 100), (300, 0.456, 100)]
    assert sample(SERIES, 20, 100) == [(120, 0.123, 100), (320, 0.456, 100)]


def test_strict_rate35():
    assert sample(SERIES, 20, 35) == [
        (125, 0.123, 35),
        (160, 0.123, 35),
        (195, 0.234, 35),
        (265, 0.456, 35),
        (300, 0.456, 35),
        (335, 0.456, 35),
    ]


def test_strict_domain_edges():
    s = [(1, 0.123, 9)]
    assert sample(s, 1, 10) == [(1, 0.123, 10)]
    assert sample(s, 1, 9) == [(1, 0.123, 9)]
    assert sample(s, 1, 8) == [(1, 0.123, 8), (9, 0.123, 8)]


def test_closest_splits_long_entries():
    assert sample([(10, 0.789, 100)], 5, 25, closest=True) == [
        (5, 0.789, 25),
        (30, 0.789, 25),
        (55, 0.789, 25),
        (80, 0.789, 25),
        (105, 0.789, 25),
    ]


def test_closest_when_undefined_at_point():
    assert sample([(0, 0.123, 5), (10, 0.234, 6)], 7, 8, closest=True) == [
        (7, 0.234, 8),
        (15, 0.234, 8),
    ]


def test_closest_next_in_half_window():
    assert sample([(4, 0.123, 7), (14, 0.234, 8), (23, 0.345, 8)], 0, 10, closest=True) == [
        (0, 0.123, 10),
        (10, 0.234, 10),
        (20, 0.345, 10),
        (30, 0.345, 10),
    ]


def test_closest_tie_breaks():
    assert sample([(7, 0.123, 2), (14, 0.234, 6)], 0, 10, closest=True) == [(10, 0.123, 10)]
    assert sample([(6, 0.123, 3), (13, 0.234, 6)], 0, 10, closest=True) == [(10, 0.234, 10)]
    assert sample([(6, 0.123, 1), (7, 0.234, 1), (11, 0.345, 1)], 0, 10, closest=True) == [
        (10, 0.345, 10)
    ]


def test_closest_drops_short_entries():
    s = [
        (1, 0.012, 2),
        (5, 0.123, 1),
        (6, 0.234, 3),
        (10, 0.345, 2),
        (14, 0.456, 4),
        (21, 0.567, 4),
    ]
    assert sample(s, 0, 10, closest=True) == [(0, 0.012, 10), (10, 0.345, 10), (20, 0.567, 10)]


def test_closest_compress_flag():
    assert sample(
        [(4, 0.123, 7), (14, 0.234, 8), (23, 0.345, 8)], 0, 10, closest=True, compress=True
    ) == [(0, 0.123, 10), (10, 0.234, 10), (20, 0.345, 20)]
