"""Gorilla codec round-trip conformance — contract per GorillaBlockSpec.scala:37-117,
GorillaArraySpec.scala and TimestampValidatorSpec.scala (identity, corrupt/empty
rejection, timestamp constraints)."""

import numpy as np
import pytest

from scala_timeseries_lib_ray.functions.gorilla import (
    MAX_FIRST_OFFSET,
    MAX_GAP,
    compress_payloads,
    compress_sampled_block,
    compress_tuple_block,
    compress_value_block,
    decompress_payloads,
    decompress_sampled_block,
    decompress_tuple_block,
    decompress_value_block,
)


def roundtrip(ts, vals, validities):
    data = compress_tuple_block(np.array(ts), np.array(vals, dtype=np.float64), np.array(validities))
    r_ts, r_v, r_d = decompress_tuple_block(data)
    assert list(r_ts) == list(ts)
    # bit-exact payload identity (NaN-safe)
    assert np.array_equal(
        np.asarray(r_v).view(np.uint64),
        np.asarray(vals, dtype=np.float64).view(np.uint64),
    )
    assert list(r_d) == list(validities)
    return data


def test_simple_roundtrip():
    roundtrip([1, 2, 3], [1.0, 2.0, 3.0], [1, 1, 1])


def test_roundtrip_with_gaps_and_jitter():
    rng = np.random.default_rng(42)
    ts = np.cumsum(rng.integers(1, 5000, 500)) + 1_700_000_000_000
    vals = np.round(rng.normal(100, 25, 500), 3)
    validities = rng.integers(1, 4000, 500)
    data = roundtrip(ts, vals, validities)
    # compression actually compresses vs 24 raw bytes/point
    assert len(data) < 500 * 24


def test_constant_series_compresses_tightly():
    ts = 1_000_000 + np.arange(1000, dtype=np.int64) * 60_000
    vals = np.full(1000, 42.5)
    data = compress_value_block(ts, vals)
    r_ts, r_v = decompress_value_block(data)
    assert np.array_equal(r_ts, ts) and np.array_equal(r_v, vals)
    # uniform deltas + constant values -> ~2 bits/point
    assert len(data) < 1000  # bytes, vs 16000 raw


def test_long_valued_doubles():
    # GorillaBlockSpec: long values stored as doubles
    roundtrip([1, 10, 100], [1e18, -4.35e-120, float(2**52)], [9, 90, 100])
    roundtrip([5], [float("nan")], [7])  # single NaN payload survives bit-exactly


def test_single_point():
    roundtrip([1700000000000], [3.25], [1000])


def test_epoch_millis_scale():
    ts = np.array([1574346201068, 1574346211068, 1574347631068])
    roundtrip(ts, [0.1, 0.2, 0.2], [1430000, 1420000, 8578932])


def test_sampled_block():
    ts = 1_000 + np.arange(50, dtype=np.int64) * 100
    vals = np.sin(np.arange(50)).round(6)
    data = compress_sampled_block(ts, vals)
    r_ts, r_v, r_d = decompress_sampled_block(data, 100)
    assert np.array_equal(r_ts, ts) and np.array_equal(r_v, vals)
    assert (r_d == 100).all()
    with pytest.raises(ValueError):
        decompress_sampled_block(data, 0)


def test_empty_rejected():
    with pytest.raises(ValueError):
        compress_payloads(np.array([], dtype=np.int64), np.array([], dtype=np.uint64))


def test_corrupt_rejected():
    good = compress_tuple_block(np.array([1, 2, 3]), np.array([1.0, 2.0, 3.0]), np.array([1, 1, 1]))
    with pytest.raises(ValueError):
        decompress_tuple_block(good[:5])
    with pytest.raises(ValueError):
        decompress_tuple_block(b"\x00\x00\x00\x02ab")
    with pytest.raises(ValueError):
        decompress_payloads(b"")


def test_timestamp_constraints():
    with pytest.raises(ValueError):  # non-increasing
        compress_value_block(np.array([5, 5]), np.array([1.0, 2.0]))
    with pytest.raises(ValueError):  # negative / zero ts
        compress_value_block(np.array([0, 5]), np.array([1.0, 2.0]))
    with pytest.raises(ValueError):  # gap >= 2^31
        compress_value_block(np.array([1, 1 + MAX_GAP]), np.array([1.0, 2.0]))
    with pytest.raises(ValueError):  # first offset too large
        compress_value_block(np.array([MAX_FIRST_OFFSET + 10]), np.array([1.0]), block_ts=1)
    # block header after first entry
    with pytest.raises(ValueError):
        compress_value_block(np.array([100]), np.array([1.0]), block_ts=200)


def test_block_ts_header():
    ts = np.array([1000, 2000, 3500])
    data = compress_value_block(ts, np.array([1.0, 1.0, 2.0]), block_ts=500)
    r_ts, r_v = decompress_value_block(data)
    assert list(r_ts) == [1000, 2000, 3500]


def test_pack_bits_matches_tree_packer():
    import numpy as np

    from scala_timeseries_lib_ray.functions.gorilla import _pack_fields, pack_bits

    rng = np.random.default_rng(42)
    for _ in range(100):
        m = int(rng.integers(1, 50))
        nb = rng.integers(1, 65, m)
        vals = [
            int(rng.integers(0, 1 << 63, dtype=np.uint64)) | (1 << 63)
            if b == 64 and rng.random() < 0.5
            else int(rng.integers(0, min(1 << int(b), 1 << 62)))
            for b in nb
        ]
        vals = [v & ((1 << int(b)) - 1) for v, b in zip(vals, nb)]
        assert _pack_fields(vals, [int(b) for b in nb]) == pack_bits(
            np.array(vals, dtype=np.uint64), nb
        )


def test_two_pass_decode_matches_sequential():
    import numpy as np

    from scala_timeseries_lib_ray.functions.gorilla import (
        _decompress_payloads_seq,
        compress_value_block,
        decompress_payloads,
    )

    rng = np.random.default_rng(7)
    for kind in range(3):
        n = int(rng.integers(2, 400))
        ts = 1_700_000_000_000 + np.cumsum(rng.integers(1, 10_000, n))
        vals = [
            np.round(rng.normal(0, 100, n), 2),
            np.repeat(rng.normal(), n),
            rng.normal(0, 1e300, n),
        ][kind]
        data = compress_value_block(ts, np.asarray(vals), int(ts[0]))
        t1, p1 = decompress_payloads(data)
        t2, p2 = _decompress_payloads_seq(data)
        assert np.array_equal(t1, t2) and np.array_equal(p1, p2)
