"""Trim / slice / split conformance — goldens from TimeSeriesTestBench.scala:80-260
over the bench fixtures contig2 / discon2 / three."""

import numpy as np
import pyarrow as pa

from scala_timeseries_lib_ray.functions.trim import (
    slice_arrays,
    slice_discrete_arrays,
    slice_table,
    split_table,
    trim_left_table,
    trim_right_table,
)
from scala_timeseries_lib_ray.functions.domain import at, loose_domain, support_ratio

from conftest import entries, as_triples

CONTIG2 = [(1, 111.0, 10), (11, 222.0, 10)]
DISCON2 = [(1, 111.0, 10), (12, 222.0, 10)]
THREE = [(1, 111.0, 10), (12, 222.0, 10), (22, 333.0, 10)]


def tbl(triples):
    ts, v, d = entries(*triples)
    return pa.table({"ts": pa.array(ts), "value": pa.array(v), "validity": pa.array(d)})


def rows(t):
    return as_triples(
        t.column("ts").to_numpy(), t.column("value").to_numpy(), t.column("validity").to_numpy()
    )


def trim_left(triples, t_at):
    return rows(trim_left_table(tbl(triples), t_at))


def trim_right(triples, t_at):
    return rows(trim_right_table(tbl(triples), t_at))


def test_at_lookup():
    ts, v, d = entries(*CONTIG2)
    assert at(ts, v, d, 0) is None
    assert at(ts, v, d, 1) == 111.0
    assert at(ts, v, d, 10) == 111.0
    assert at(ts, v, d, 11) == 222.0
    assert at(ts, v, d, 20) == 222.0
    assert at(ts, v, d, 21) is None
    ts, v, d = entries(*DISCON2)
    assert at(ts, v, d, 11) is None
    assert at(ts, v, d, 12) == 222.0


def test_trim_left_contiguous():
    assert trim_left(CONTIG2, 0) == CONTIG2
    assert trim_left(CONTIG2, 1) == CONTIG2
    assert trim_left(CONTIG2, 2) == [(2, 111.0, 9), (11, 222.0, 10)]
    assert trim_left(CONTIG2, 10) == [(10, 111.0, 1), (11, 222.0, 10)]
    assert trim_left(CONTIG2, 11) == [(11, 222.0, 10)]
    assert trim_left(CONTIG2, 12) == [(12, 222.0, 9)]
    assert trim_left(CONTIG2, 20) == [(20, 222.0, 1)]
    assert trim_left(CONTIG2, 21) == []


def test_trim_left_discontiguous():
    assert trim_left(DISCON2, 10) == [(10, 111.0, 1), (12, 222.0, 10)]
    assert trim_left(DISCON2, 11) == [(12, 222.0, 10)]
    assert trim_left(DISCON2, 12) == [(12, 222.0, 10)]
    assert trim_left(DISCON2, 13) == [(13, 222.0, 9)]
    assert trim_left(THREE, 21) == [(21, 222.0, 1), (22, 333.0, 10)]
    assert trim_left(THREE, 22) == [(22, 333.0, 10)]
    assert trim_left(THREE, 32) == []


def test_trim_left_discrete():
    ts, v, d = entries(*CONTIG2)
    # include=True keeps the straddler whole
    keep = slice_discrete_arrays(ts, d, t_from=2, include_left=True)
    assert as_triples(ts[keep], v[keep], d[keep]) == CONTIG2
    keep = slice_discrete_arrays(ts, d, t_from=2, include_left=False)
    assert as_triples(ts[keep], v[keep], d[keep]) == [(11, 222.0, 10)]
    # at the boundary: entry starting exactly at `at` is kept either way
    for inc in (True, False):
        keep = slice_discrete_arrays(ts, d, t_from=11, include_left=inc)
        assert as_triples(ts[keep], v[keep], d[keep]) == [(11, 222.0, 10)]
    keep = slice_discrete_arrays(ts, d, t_from=12, include_left=True)
    assert as_triples(ts[keep], v[keep], d[keep]) == [(11, 222.0, 10)]
    keep = slice_discrete_arrays(ts, d, t_from=12, include_left=False)
    assert list(keep) == []
    assert list(slice_discrete_arrays(ts, d, t_from=21, include_left=True)) == []


def test_trim_right_contiguous():
    assert trim_right(CONTIG2, 22) == CONTIG2
    assert trim_right(CONTIG2, 21) == CONTIG2
    assert trim_right(CONTIG2, 20) == [(1, 111.0, 10), (11, 222.0, 9)]
    assert trim_right(CONTIG2, 12) == [(1, 111.0, 10), (11, 222.0, 1)]
    assert trim_right(CONTIG2, 11) == [(1, 111.0, 10)]
    assert trim_right(CONTIG2, 1) == []


def test_slice_and_split():
    t = tbl(THREE)
    assert rows(slice_table(t, 5, 25)) == [(5, 111.0, 6), (12, 222.0, 10), (22, 333.0, 3)]
    left, right = split_table(t, 15)
    assert rows(left) == [(1, 111.0, 10), (12, 222.0, 3)]
    assert rows(right) == [(15, 222.0, 7), (22, 333.0, 10)]


def test_loose_domain_support_ratio():
    ts, v, d = entries(*DISCON2)
    assert loose_domain(ts, d) == (1, 22)
    assert abs(support_ratio(ts, d) - 20 / 21) < 1e-12
    ts, v, d = entries(*CONTIG2)
    assert support_ratio(ts, d) == 1.0
