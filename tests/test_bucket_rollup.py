"""Bucket / rollup conformance — goldens from TimeSeriesSpec.scala:509-524 (rollup),
TimeSeriesTestBench.scala:713-745 (splitEntriesLongerThan, bucket),
TimeSeriesSpec.scala:354-380 (groupEntries)."""

import numpy as np
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.functions.bucket import (
    bucket_entries,
    bucket_split_arrays,
    finalize_tier_table,
    group_entries_by_count,
    rollup,
    rollup_partials_table,
)
from scala_timeseries_lib_ray.functions.transform import (
    fill_sorted,
    split_longer_than_arrays,
)

from conftest import entries, as_triples


def test_rollup_grid_from_zero():
    ts, v, d = entries((0, 0.0, 10), (10, 1.0, 10), (20, 2.0, 10))
    buckets = np.arange(0, 40, 10)
    r = rollup(ts, v, d, buckets, lambda t, vv, dd: vv[0] if len(vv) else None)
    assert as_triples(*r) == [(0, 0.0, 10), (10, 1.0, 10), (20, 2.0, 10)]


def test_rollup_grid_from_minus5():
    ts, v, d = entries((0, 0.0, 10), (10, 1.0, 10), (20, 2.0, 10))
    buckets = np.arange(-5, 40, 10)
    r = rollup(ts, v, d, buckets, lambda t, vv, dd: vv[0] if len(vv) else None)
    assert as_triples(*r) == [(-5, 0.0, 10), (5, 0.0, 10), (15, 1.0, 10), (25, 2.0, 10)]


def test_rollup_grid_after_first_entry_raises():
    ts, v, d = entries((0, 0.0, 10))
    with pytest.raises(ValueError):
        rollup(ts, v, d, np.arange(10, 30, 10), lambda t, vv, dd: 0)


def test_bucket_with_empty_buckets():
    # TimeSeriesTestBench.scala:727-745
    ts, v, d = entries((10, 1.0, 10), (20, 2.0, 5), (25, 3.0, 5))
    out = bucket_entries(ts, v, d, np.arange(0, 50, 10))
    starts = [b for b, _ in out]
    assert starts == [0, 10, 20, 30]
    assert as_triples(*out[0][1]) == []
    assert as_triples(*out[1][1]) == [(10, 1.0, 10)]
    assert as_triples(*out[2][1]) == [(20, 2.0, 5), (25, 3.0, 5)]
    assert as_triples(*out[3][1]) == []


def test_split_longer_than():
    # TimeSeriesTestBench.scala:713-725 flavor: no compression of the pieces
    ts, v, d = entries((0, 1.0, 25))
    n_ts, n_d, src = split_longer_than_arrays(ts, d, 10)
    assert list(n_ts) == [0, 10, 20]
    assert list(n_d) == [10, 10, 5]
    assert list(src) == [0, 0, 0]


def test_group_entries_by_count():
    s, e = group_entries_by_count(5, 2)
    assert list(s) == [0, 2, 4] and list(e) == [2, 4, 5]
    s, e = group_entries_by_count(5, 10)
    assert list(s) == [0] and list(e) == [5]


def test_bucket_split_uniform_grid():
    ts, v, d = entries((5, 1.0, 10), (55, 2.0, 5))
    n_ts, n_d, b_ts, src = bucket_split_arrays(ts, d, 10)
    assert list(n_ts) == [5, 10, 55]
    assert list(n_d) == [5, 5, 5]
    assert list(b_ts) == [0, 10, 50]
    assert list(src) == [0, 0, 1]


def test_rollup_partials_and_finalize():
    t = pa.table(
        {
            "source": pa.array(["a", "a", "a", "b"]),
            "ts": pa.array([5, 10, 25, 5], type=pa.int64()),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
            "validity": pa.array([5, 10, 5, 10], type=pa.int64()),
        }
    )
    out = finalize_tier_table(rollup_partials_table(t, 10))
    d = out.to_pydict()
    rows = sorted(zip(d["source"], d["bucket_ts"], d["count"], d["min"], d["max"], d["sum"], d["wsum"], d["wdur"], d["mean"]))
    # a: bucket 0: (5,1,5) -> count1; bucket 10: (10,2,10); bucket 20: (25,4,5)
    assert rows[0] == ("a", 0, 1, 1.0, 1.0, 1.0, 5.0, 5, 1.0)
    assert rows[1] == ("a", 10, 1, 2.0, 2.0, 2.0, 20.0, 10, 2.0)
    assert rows[2] == ("a", 20, 1, 4.0, 4.0, 4.0, 20.0, 5, 4.0)
    # b: entry (5,8,10) splits across buckets 0 and 10
    assert rows[3] == ("b", 0, 1, 8.0, 8.0, 8.0, 40.0, 5, 8.0)
    assert rows[4] == ("b", 10, 1, 8.0, 8.0, 8.0, 40.0, 5, 8.0)


def test_tier_reaggregation_is_exact():
    # 1m -> 1h style: re-aggregating the fine tier's partials equals aggregating the
    # coarse tier directly over the *finest-tier-split* fragments. (Cascade semantics:
    # raw entries are split once at the finest tier's boundaries; every coarser tier is
    # a pure re-aggregation of the algebraic partials.)
    rng = np.random.default_rng(7)
    n = 500
    ts = np.sort(rng.choice(np.arange(0, 100000, 7), size=n, replace=False)).astype(np.int64)
    v = rng.normal(50, 10, n)
    d = np.minimum(np.diff(np.append(ts, ts[-1] + 7)), 7).astype(np.int64)
    t = pa.table(
        {
            "source": pa.array(["s"] * n),
            "ts": pa.array(ts),
            "value": pa.array(v),
            "validity": pa.array(d),
        }
    )
    fine = rollup_partials_table(t, 100)
    # re-aggregate 100 -> 1000 by summing partials
    import pandas as pd

    f = fine.to_pandas()
    f["bucket_ts"] = (f["bucket_ts"] // 1000) * 1000
    re = (
        f.groupby(["source", "bucket_ts"])
        .agg(
            count=("count", "sum"),
            min=("min", "min"),
            max=("max", "max"),
            sum=("sum", "sum"),
            wsum=("wsum", "sum"),
            wdur=("wdur", "sum"),
        )
        .reset_index()
    )
    # direct coarse aggregation over the fragments pre-split at the fine grid
    s_ts, s_d, _, s_src = bucket_split_arrays(ts, d, 100)
    t_split = pa.table(
        {
            "source": pa.array(np.array(["s"] * n, dtype=object)[s_src]),
            "ts": pa.array(s_ts),
            "value": pa.array(v[s_src]),
            "validity": pa.array(s_d),
        }
    )
    direct = rollup_partials_table(t_split, 1000).to_pandas()
    m = re.merge(direct, on=["source", "bucket_ts"], suffixes=("_re", "_d"))
    assert len(m) == len(direct) == len(re)
    for c in ["count", "min", "max", "wdur"]:
        assert (m[f"{c}_re"] == m[f"{c}_d"]).all()
    for c in ["sum", "wsum"]:
        assert np.allclose(m[f"{c}_re"], m[f"{c}_d"], rtol=1e-12)


def test_fill_constant_and_lkv():
    ts, v, d = entries((0, 1.0, 5), (10, 2.0, 5))
    f_ts, f_v, f_d, _ = fill_sorted(ts, v, d, fill_value=9.0)
    assert as_triples(f_ts, f_v, f_d) == [(0, 1.0, 5), (5, 9.0, 5), (10, 2.0, 5)]
    f_ts, f_v, f_d, _ = fill_sorted(ts, v, d, last_known=True)
    # filler takes previous value 1.0 and compresses with it
    assert as_triples(f_ts, f_v, f_d) == [(0, 1.0, 10), (10, 2.0, 5)]
    # fill with a value equal to the next entry compresses with it
    f_ts, f_v, f_d, _ = fill_sorted(ts, v, d, fill_value=2.0)
    assert as_triples(f_ts, f_v, f_d) == [(0, 1.0, 5), (5, 2.0, 10)]
