"""Property-based fuzzing of the kernel invariants (hypothesis).

The reference test suite is purely example-based (property testing is its explicit
TODO, README.md:166) — these properties harden the vectorized kernels beyond the
golden corpus.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from scala_timeseries_lib_ray.functions.fit import fit_sorted
from scala_timeseries_lib_ray.functions.gorilla import (
    compress_tuple_block,
    decompress_tuple_block,
)
from scala_timeseries_lib_ray.functions.merge import OPS, merge_sweep
from scala_timeseries_lib_ray.functions.sample import sample_series
from scala_timeseries_lib_ray.functions.trim import slice_arrays


@st.composite
def series(draw, max_len=40, values=None):
    n = draw(st.integers(1, max_len))
    gaps = draw(st.lists(st.integers(1, 30), min_size=n, max_size=n))
    ts = np.cumsum(np.array(gaps, dtype=np.int64)) + 1
    validity = np.array(
        draw(st.lists(st.integers(1, 40), min_size=n, max_size=n)), dtype=np.int64
    )
    vals = np.array(
        draw(
            st.lists(
                values or st.sampled_from([1.0, 2.0, 3.0]), min_size=n, max_size=n
            )
        )
    )
    return ts, vals, validity


def fitted(s):
    return fit_sorted(*s, None, compress=True, validate=False)[:3]


@settings(max_examples=200, deadline=None)
@given(series())
def test_fit_idempotent_and_wellformed(s):
    ts, v, d = fitted(s)
    # well-formed: strictly increasing, positive validity, no overlap
    assert (d > 0).all()
    if len(ts) > 1:
        assert (ts[1:] > ts[:-1]).all()
        assert (ts[:-1] + d[:-1] <= ts[1:]).all()
        # compressed: no equal-value contiguous neighbors remain
        contig = ts[:-1] + d[:-1] == ts[1:]
        assert not (contig & (v[:-1] == v[1:])).any()
    ts2, v2, d2 = fit_sorted(ts, v, d, None, compress=True, validate=False)[:3]
    assert np.array_equal(ts, ts2) and np.array_equal(v, v2) and np.array_equal(d, d2)


@settings(max_examples=150, deadline=None)
@given(series(), series())
def test_merge_commutative_and_domain(a, b):
    fa, fb = fitted(a), fitted(b)
    r1 = merge_sweep([fa, fb], OPS["plus"])
    r2 = merge_sweep([fb, fa], OPS["plus"])
    assert np.array_equal(r1[0], r2[0])
    assert np.array_equal(r1[1], r2[1])
    assert np.array_equal(r1[2], r2[2])
    # result defined on [min(starts), max(ends)) hull
    lo = min(fa[0][0], fb[0][0])
    hi = max(fa[0][-1] + fa[2][-1], fb[0][-1] + fb[2][-1])
    assert r1[0][0] >= lo and r1[0][-1] + r1[2][-1] <= hi


@settings(max_examples=150, deadline=None)
@given(series())
def test_merge_with_self_doubles(s):
    f = fitted(s)
    r_ts, r_v, r_d = merge_sweep([f, f], OPS["plus"])
    assert np.array_equal(r_ts, f[0])
    assert np.array_equal(r_v, f[1] * 2)
    assert np.array_equal(r_d, f[2])


@settings(max_examples=150, deadline=None)
@given(series(), st.integers(0, 60), st.integers(1, 80))
def test_slice_within_bounds(s, lo_off, width):
    ts, v, d = fitted(s)
    t_from = int(ts[0]) + lo_off
    t_to = t_from + width
    n_ts, n_d, keep = slice_arrays(ts, d, t_from, t_to)
    assert (n_ts >= t_from).all() and ((n_ts + n_d) <= t_to).all()
    if len(n_ts):
        assert (n_d > 0).all()
    # slicing to the full hull is identity
    f_ts, f_d, _ = slice_arrays(ts, d, int(ts[0]), int(ts[-1] + d[-1]))
    assert np.array_equal(f_ts, ts) and np.array_equal(f_d, d)


@settings(max_examples=100, deadline=None)
@given(series(values=st.floats(-1e6, 1e6, allow_nan=False)), st.integers(1, 25))
def test_sample_strict_matches_step_function(s, rate):
    ts, v, d = fitted(s)
    s_ts, s_v, s_d = sample_series(ts, v, d, int(ts[0]), rate, use_closest=False)
    # every sampled value equals the step-function value at the sample point
    from scala_timeseries_lib_ray.functions.domain import at

    for p, val in zip(s_ts, s_v):
        assert at(ts, v, d, int(p)) == val
    # and every grid point inside the domain that is defined was sampled
    end = ts + d
    got = set(int(x) for x in s_ts)
    for p in range(int(ts[0]), int(end[-1]), rate):
        if at(ts, v, d, p) is not None:
            assert p in got


@settings(max_examples=100, deadline=None)
@given(series(values=st.floats(-1e9, 1e9, allow_nan=False)))
def test_gorilla_roundtrip_random(s):
    ts, v, d = fitted(s)
    data = compress_tuple_block(ts, v, d)
    r_ts, r_v, r_d = decompress_tuple_block(data)
    assert np.array_equal(r_ts, ts)
    assert np.array_equal(
        np.asarray(r_v).view(np.uint64), np.asarray(v, dtype=np.float64).view(np.uint64)
    )
    assert np.array_equal(r_d, d)


def _sample_closest_reference(ts, value, validity, start, rate):
    """Direct transcription of the reference 5-case recursion (TimeSeries.scala:608-643)."""
    n = len(ts)
    end = ts + validity
    last_end = int(end[-1])
    W = rate // 2
    out_ts, out_idx = [], []
    p, c = start, 0
    while p < last_end:
        tc = int(ts[c])
        if tc > p + W:
            k = (tc - W - p + rate - 1) // rate
            p += max(k, 1) * rate
            continue
        if c == n - 1:
            if p < end[c]:
                out_ts.append(p); out_idx.append(c); p += rate
            else:
                break
            continue
        tn = int(ts[c + 1])
        if (p < end[c] and tn > p + W) or abs(tc - p) < abs(tn - p):
            out_ts.append(p); out_idx.append(c); p += rate
        else:
            c += 1
    return np.array(out_ts, dtype=np.int64), np.array(out_idx, dtype=np.int64)


@settings(max_examples=300, deadline=None)
@given(series(values=st.floats(-100, 100, allow_nan=False)), st.integers(1, 30),
       st.integers(-10, 10))
def test_sample_closest_vectorized_equals_reference_recursion(s, rate, start_off):
    ts, v, d = fitted(s)
    start = int(ts[0]) + start_off
    got_ts, got_v, got_d = sample_series(ts, v, d, start, rate, use_closest=True)
    ref_ts, ref_idx = _sample_closest_reference(ts, v, d, start, rate)
    assert np.array_equal(got_ts, ref_ts)
    assert np.array_equal(got_v, v[ref_idx] if len(ref_idx) else v[:0])
    assert (got_d == rate).all()


@settings(max_examples=120, deadline=None)
@given(series(), series(), st.sampled_from(["plus", "multiply", "fallback", "left"]),
       st.integers(20, 120))
def test_block_merge_plus_refit_equals_global(sa, sb, op_name, block_width):
    """The scale path's algebra in pure kernels: split both sides at block edges,
    sweep each block independently, then one canonical fit — must equal the
    whole-timeline sweep (for ops undefined on (None, None))."""
    from scala_timeseries_lib_ray.functions.bucket import bucket_split_arrays

    fa, fb = fitted(sa), fitted(sb)
    want = merge_sweep([fa, fb], OPS[op_name], compress=True)

    blocks = {}
    for src_idx, (ts, v, d) in enumerate((fa, fb)):
        n_ts, n_dur, b_ts, take = bucket_split_arrays(ts, d, block_width)
        n_val = v[take]
        for j in range(len(n_ts)):
            blocks.setdefault(int(b_ts[j]), [[], []])[src_idx].append(
                (int(n_ts[j]), float(n_val[j]), int(n_dur[j]))
            )
    parts = []
    for b in sorted(blocks):
        sides = []
        for rows in blocks[b]:
            if rows:
                a = np.array(rows)
                sides.append((a[:, 0].astype(np.int64), a[:, 1], a[:, 2].astype(np.int64)))
            else:
                sides.append((np.zeros(0, np.int64), np.zeros(0), np.zeros(0, np.int64)))
        r = merge_sweep(sides, OPS[op_name], compress=True)
        if len(r[0]):
            parts.append(r)
    if not parts:
        assert len(want[0]) == 0
        return
    ts = np.concatenate([p[0] for p in parts])
    v = np.concatenate([p[1] for p in parts])
    d = np.concatenate([p[2] for p in parts])
    order = np.argsort(ts, kind="stable")
    got = fit_sorted(ts[order], v[order], d[order], None, compress=True, validate=False)[:3]
    assert np.array_equal(got[0], want[0]), (got[0], want[0])
    assert np.array_equal(got[1], want[1])
    assert np.array_equal(got[2], want[2])
