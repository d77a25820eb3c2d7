"""Extended merge conformance — the SeqMergingSingleToMultiple / gap-handling
scenarios from TimeSeriesMergerSpec.scala:27-96,245-280 (nonStrictPlus op)."""

from scala_timeseries_lib_ray.functions.merge import OPS, merge_sweep

from conftest import entries, as_triples


def merge(a, b):
    r = merge_sweep([entries(*a), entries(*b)], OPS["plus"])
    return as_triples(r[0], r[1], r[2])


def test_single_to_single_within_domain():
    s1 = [(1, 2.0, 20)]
    m1 = [(5, 1.0, 10)]
    expect = [(1, 2.0, 4), (5, 3.0, 10), (15, 2.0, 6)]
    assert merge(s1, m1) == expect
    assert merge(m1, s1) == expect


def test_two_entries_wholly_contained():
    s3 = [(1, 2.0, 20)]
    m3 = [(5, 1.0, 5), (10, 2.0, 5)]
    expect = [(1, 2.0, 4), (5, 3.0, 5), (10, 4.0, 5), (15, 2.0, 6)]
    assert merge(s3, m3) == expect
    assert merge(m3, s3) == expect


def test_contained_with_internal_gap():
    s4 = [(1, 2.0, 20)]
    m4 = [(5, 1.0, 5), (11, 2.0, 5)]
    expect = [(1, 2.0, 4), (5, 3.0, 5), (10, 2.0, 1), (11, 4.0, 5), (16, 2.0, 5)]
    assert merge(s4, m4) == expect
    assert merge(m4, s4) == expect


def test_three_entries_exceeding_domain():
    s5 = [(1, 2.0, 20)]
    m5 = [(0, 1.0, 5), (5, 2.0, 5), (16, 3.0, 10)]
    expect = [
        (0, 1.0, 1),
        (1, 3.0, 4),
        (5, 4.0, 5),
        (10, 2.0, 6),
        (16, 5.0, 5),
        (21, 3.0, 5),
    ]
    assert merge(s5, m5) == expect
    assert merge(m5, s5) == expect


def test_four_entries_outside_domain():
    s6 = [(1, 2.0, 20)]
    m6 = [(-10, -1.0, 10), (0, 1.0, 5), (6, 2.0, 5), (16, 3.0, 10), (26, 4.0, 10)]
    expect = [
        (-10, -1.0, 10),
        (0, 1.0, 1),
        (1, 3.0, 4),
        (5, 2.0, 1),
        (6, 4.0, 5),
        (11, 2.0, 5),
        (16, 5.0, 5),
        (21, 3.0, 5),
        (26, 4.0, 10),
    ]
    assert merge(s6, m6) == expect
    assert merge(m6, s6) == expect


def test_perfectly_aligned_continuous():
    l1 = [(-20, 1.0, 10), (-10, 2.0, 10), (0, 3.0, 10), (10, 4.0, 10)]
    r1 = [(-20, 5.0, 10), (-10, 6.0, 10), (0, 7.0, 10), (10, 8.0, 10)]
    expect = [(-20, 6.0, 10), (-10, 8.0, 10), (0, 10.0, 10), (10, 12.0, 10)]
    assert merge(l1, r1) == expect
    assert merge(r1, l1) == expect
