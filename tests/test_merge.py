"""Merge conformance — goldens from NumericTimeSeriesSpec.scala:16-69 and selected
TimeSeriesMergerSpec scenarios (definedness cases, gap handling, compression)."""

import numpy as np

from scala_timeseries_lib_ray.functions.merge import OPS, merge_sweep, op_minus, op_python

from conftest import entries, as_triples

TSA = [(1, 1.0, 10), (12, 2.0, 10)]
TSB = [(6, 3.0, 10)]


def merge(a, b, op, compress=True):
    r = merge_sweep([entries(*a), entries(*b)], op, compress=compress)
    return as_triples(r[0], r[1], r[2])


def test_strict_plus():
    expect = [(6, 4.0, 5), (12, 5.0, 4)]
    assert merge(TSA, TSB, OPS["plus_strict"]) == expect
    assert merge(TSB, TSA, OPS["plus_strict"]) == expect  # commutative


def test_nonstrict_plus():
    assert merge(TSA, TSB, OPS["plus"]) == [
        (1, 1.0, 5),
        (6, 4.0, 5),
        (11, 3.0, 1),
        (12, 5.0, 4),
        (16, 2.0, 6),
    ]


def test_strict_minus():
    assert merge(TSA, TSB, op_minus(None, None)) == [(6, -2.0, 5), (12, -1.0, 4)]
    assert merge(TSB, TSA, op_minus(None, None)) == [(6, 2.0, 5), (12, 1.0, 4)]


def test_minus_left_default():
    assert merge(TSA, TSB, op_minus(l_default=0.0)) == [
        (6, -2.0, 5),
        (11, -3.0, 1),
        (12, -1.0, 4),
    ]


def test_minus_right_default():
    assert merge(TSA, TSB, op_minus(r_default=10.0)) == [
        (1, -9.0, 5),
        (6, -2.0, 5),
        (12, -1.0, 4),
        (16, -8.0, 6),
    ]


def test_minus_both_defaults():
    assert merge(TSA, TSB, op_minus(0.5, 10.0)) == [
        (1, -9.0, 5),
        (6, -2.0, 5),
        (11, -2.5, 1),
        (12, -1.0, 4),
        (16, -8.0, 6),
    ]


def test_strict_multiply():
    expect = [(6, 3.0, 5), (12, 6.0, 4)]
    assert merge(TSA, TSB, OPS["multiply"]) == expect
    assert merge(TSB, TSA, OPS["multiply"]) == expect


def test_fallback():
    # left wins where defined, right fills the hole (TimeSeries.scala:523-534)
    a = [(0, 1.0, 10)]
    b = [(5, 9.0, 10)]
    assert merge(a, b, OPS["fallback"]) == [(0, 1.0, 10), (10, 9.0, 5)]


def test_merge_compresses_output():
    # two entries merging to the same value compress (TimeSeriesMergerSpec.scala:206)
    a = [(0, 1.0, 10)]
    b = [(10, 2.0, 10)]
    r = merge(a, b, op_python(lambda x, y: 42.0 if (x is not None or y is not None) else None))
    assert r == [(0, 42.0, 20)]


def test_gap_op_none_none_internal_only():
    # op(None, None) is applied on internal gaps only (TimeSeriesMergerSpec.scala:245-280)
    a = [(0, 1.0, 5)]
    b = [(20, 2.0, 5)]
    seen = []

    def op(x, y):
        seen.append((x, y))
        if x is None and y is None:
            return -1.0
        return (x or 0.0) + (y or 0.0)

    r = merge(a, b, op_python(op))
    assert r == [(0, 1.0, 5), (5, -1.0, 15), (20, 2.0, 5)]


def test_strict_zip():
    r_ts, vals, r_d = merge_sweep(
        [entries(*TSA), entries(*TSB)], OPS["strict_zip"], compress=True
    )
    assert list(r_ts) == [6, 12]
    assert list(vals["value_a"]) == [1.0, 2.0]
    assert list(vals["value_b"]) == [3.0, 3.0]
    assert list(r_d) == [5, 4]


def test_merge_with_empty_side():
    assert merge(TSA, [], OPS["plus"]) == [(1, 1.0, 10), (12, 2.0, 10)]
    assert merge([], [], OPS["plus"]) == []


def test_large_epoch_millis():
    # prod regression flavor: epoch-millisecond timestamps (TimeSeriesMergerSpec.scala:399-420)
    a = [(1574346201068, 1.0, 1430000)]
    b = [(1574346210000, 2.0, 10000000)]
    got = merge(a, b, OPS["plus"])
    assert got == [
        (1574346201068, 1.0, 8932),
        (1574346210000, 3.0, 1421068),
        (1574347631068, 2.0, 8578932),
    ]


def test_associativity_of_nary_plus():
    c = [(3, 7.0, 4)]

    def via(pair_order):
        x = merge(pair_order[0], pair_order[1], OPS["plus"])
        return merge(x, pair_order[2], OPS["plus"])

    assert via((TSA, TSB, c)) == via((TSB, c, TSA)) == via((c, TSA, TSB))


def test_strict_zip_tuple_compression():
    # equal (a, b) tuples across a shared boundary merge into one run; a change
    # in EITHER component breaks the run (reference: zip rides the compressing
    # builder, equal case-class tuples merge)
    import numpy as np

    a = (np.array([0, 10, 20]), np.array([1.0, 1.0, 2.0]), np.array([10, 10, 10]))
    b = (np.array([0, 15]), np.array([5.0, 5.0]), np.array([15, 15]))
    ts, vals, dur = merge_sweep([a, b], OPS["strict_zip"], compress=True)
    # elementary intervals 0-10-15-20-30 collapse to 0-20 (tuple (1,5)) + 20-30 (2,5)
    assert ts.tolist() == [0, 20]
    assert vals["value_a"].tolist() == [1.0, 2.0]
    assert vals["value_b"].tolist() == [5.0, 5.0]
    assert dur.tolist() == [20, 10]
    # uncompressed form keeps the elementary intervals
    ts_u, vals_u, _ = merge_sweep([a, b], OPS["strict_zip"], compress=False)
    assert len(ts_u) == 4
