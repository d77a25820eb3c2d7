"""Fitter conformance — goldens from reference TSEntryFitterSpec.scala:10-136 and
TimeSeriesBuilderTestBench.scala:19-141."""

import numpy as np
import pytest

from scala_timeseries_lib_ray.functions.fit import fit_sorted, series_flags
from scala_timeseries_lib_ray.functions.core import seg_ids_from_keys

from conftest import entries, as_triples


def fit(triples, compress=True, seg=None):
    ts, v, d = entries(*triples)
    r_ts, r_v, r_d, _ = fit_sorted(ts, v, d, seg, compress=compress)
    return as_triples(r_ts, r_v, r_d)


def test_compress_two_overlapping_equal_entries():
    assert fit([(1, 77, 10), (5, 77, 10)]) == [(1, 77.0, 14)]


def test_compress_two_contiguous_equal_entries():
    assert fit([(1, 77, 4), (5, 77, 5)]) == [(1, 77.0, 9)]


def test_no_compress_with_gap():
    assert fit([(1, 77, 5), (10, 77, 10)]) == [(1, 77.0, 5), (10, 77.0, 10)]


def test_overlap_trim_when_not_compressing():
    assert fit([(1, 77, 20), (10, 77, 10)], compress=False) == [(1, 77.0, 9), (10, 77.0, 10)]


def test_overlap_trim_unequal_values():
    assert fit([(1, 1.0, 20), (10, 2.0, 10)]) == [(1, 1.0, 9), (10, 2.0, 10)]


def test_compression_shrinks_when_absorbed_entry_ends_earlier():
    # extendOrTrim extension < 0 branch (immutable/TSEntry.scala:187-199)
    assert fit([(0, 5.0, 100), (10, 5.0, 5)]) == [(0, 5.0, 15)]


def test_sequential_run_semantics():
    # after absorbing (10,..,5) the run's definedUntil shrinks to 15 (extendOrTrim
    # extension < 0, immutable/TSEntry.scala:187-199); (20,..) then has a gap -> no merge
    assert fit([(0, 5.0, 100), (10, 5.0, 5), (20, 5.0, 5)]) == [(0, 5.0, 15), (20, 5.0, 5)]


def test_empty_input():
    assert fit([]) == []
    assert fit([], compress=False) == []


def test_non_chronological_raises():
    with pytest.raises(ValueError):
        fit([(5, 77, 5), (1, 77, 4)])


def test_duplicate_timestamp_raises():
    with pytest.raises(ValueError):
        fit([(5, 1.0, 5), (5, 2.0, 4)])


def test_nonpositive_validity_raises():
    with pytest.raises(ValueError):
        fit([(5, 1.0, 0)])


def test_multi_series_segments_do_not_interact():
    src = np.array(["a", "a", "b", "b"])
    seg = seg_ids_from_keys(src)
    ts, v, d = entries((1, 77, 10), (5, 77, 10), (1, 77, 4), (5, 77, 5))
    r_ts, r_v, r_d, keep = fit_sorted(ts, v, d, seg)
    assert as_triples(r_ts, r_v, r_d) == [(1, 77.0, 14), (1, 77.0, 9)]
    assert list(src[keep]) == ["a", "b"]
    # timestamps may restart across segment boundary without raising
    ts2, v2, d2 = entries((10, 1.0, 5), (1, 2.0, 5))
    fit_sorted(ts2, v2, d2, np.array([0, 1]))  # must not raise


def test_domain_continuity_flags():
    # gap -> discontinuous (TSEntryFitterSpec "entries with a gap")
    ts, v, d = entries((1, 77, 5), (10, 77, 5))
    f_ts, f_v, f_d, _ = fit_sorted(ts, v, d)
    flags = series_flags(f_ts, f_d)
    assert not flags["domain_continuous"][0]
    # overlap -> continuous after trim
    ts, v, d = entries((1, 77, 5), (2, 78, 5))
    f_ts, f_v, f_d, _ = fit_sorted(ts, v, d)
    flags = series_flags(f_ts, f_d)
    assert flags["domain_continuous"][0]
    # contiguous -> continuous
    ts, v, d = entries((1, 77, 4), (5, 78, 5))
    f_ts, f_v, f_d, _ = fit_sorted(ts, v, d)
    assert series_flags(f_ts, f_d)["domain_continuous"][0]


def test_string_values_compress():
    ts = np.array([1, 11], dtype=np.int64)
    v = np.array(["x", "x"], dtype=object)
    d = np.array([10, 10], dtype=np.int64)
    r_ts, r_v, r_d, _ = fit_sorted(ts, v, d)
    assert list(r_ts) == [1] and list(r_d) == [20] and list(r_v) == ["x"]
