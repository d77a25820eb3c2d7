"""Gorilla Ray stages, reservoir stats, and resumable manifests."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.functions.stats import UniformReservoir
from scala_timeseries_lib_ray.sources.tokens import (
    derive_points_batch,
    synth_token_batch,
)


def test_reservoir_small_exact():
    r = UniformReservoir(size=100, seed=1)
    vals = np.arange(10, dtype=np.float64)
    s = r.update_many(vals).snapshot()
    assert s.min == 0.0 and s.max == 9.0 and s.mean == 4.5
    # sample std (n-1): std of 0..9 = sqrt(110/12... ) compute directly
    assert abs(s.std_dev - np.std(vals, ddof=1)) < 1e-12
    # interpolated median: pos=.5*11=5.5 -> idx 5 -> s[4] + .5*(s[5]-s[4]) = 4.5
    assert s.median == 4.5


def test_reservoir_large_is_uniformish():
    r = UniformReservoir(size=500, seed=7)
    r.update_many(np.random.default_rng(0).normal(100, 10, 50_000))
    s = r.snapshot()
    assert abs(s.mean - 100) < 2 and abs(s.std_dev - 10) < 2
    assert r.count == 50_000


def test_reservoir_merge():
    a = UniformReservoir(size=100, seed=1).update_many(np.full(1000, 1.0))
    b = UniformReservoir(size=100, seed=2).update_many(np.full(3000, 5.0))
    m = a.merge(b)
    s = m.snapshot()
    assert s.min == 1.0 and s.max == 5.0 and m.count == 4000
    assert 3.0 < s.mean <= 5.0  # ~75% of slots from b


def _points_ds(ray):
    import ray.data

    t = derive_points_batch(synth_token_batch("src0", 0, 3000))
    return ray.data.from_arrow(t).repartition(4), t


def test_gorilla_encode_decode_roundtrip(ray_session):
    from scala_timeseries_lib_ray.stages.gorillastage import decode_blocks, encode_blocks

    ds, t = _points_ds(ray_session)
    blocks = encode_blocks(ds, block_width=3_600_000)
    bdf = blocks.to_pandas()
    assert (bdf["block_type"] == "tuple").any() or (bdf["block_type"] == "sampled").any()
    # round trip
    back = (
        decode_blocks(encode_blocks(ds, block_width=3_600_000))
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)
    # compression actually compresses
    raw_bytes = len(want) * 24
    comp_bytes = bdf["bytes"].map(len).sum()
    assert comp_bytes < raw_bytes * 0.7


def test_gorilla_ingest_actor():
    from scala_timeseries_lib_ray.stages.gorillastage import (
        GorillaIngestActor,
        decode_blocks,
    )
    from scala_timeseries_lib_ray.functions.gorilla import decompress_sampled_block, decompress_tuple_block

    t = derive_points_batch(synth_token_batch("src0", 0, 500))
    actor = GorillaIngestActor(block_width=600_000)
    # feed in two ordered chunks as a stream would
    out1 = actor(t.slice(0, 200))
    out2 = actor(t.slice(200))
    tail = actor.flush_all()
    blocks = pa.concat_tables([out1, out2, tail]).to_pylist()
    tss, vals, durs = [], [], []
    for row in blocks:
        if row["block_type"] == "sampled":
            b = decompress_sampled_block(row["bytes"], row["sample_rate"])
        else:
            b = decompress_tuple_block(row["bytes"])
        tss.append(b[0]); vals.append(b[1]); durs.append(b[2])
    got = np.concatenate(tss)
    order = np.argsort(got)
    assert np.array_equal(got[order], t.column("ts").to_numpy())
    assert np.array_equal(np.concatenate(vals)[order], t.column("value").to_numpy())
    assert np.array_equal(np.concatenate(durs)[order], t.column("validity").to_numpy())


def test_resumable_cascade(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from scala_timeseries_lib_ray.stages.manifest import run_cascade_resumable, unit_complete

    tokens_path = str(tmp_path / "tokens")
    os.makedirs(tokens_path)
    for s in ("src0", "src1"):
        pq.write_table(synth_token_batch(s, 0, 2000), f"{tokens_path}/{s}.parquet")
    out_dir = str(tmp_path / "out")

    m1 = run_cascade_resumable(tokens_path, out_dir)
    assert not m1["tier_1m"]["skipped"] and not m1["tier_1d"]["skipped"]
    assert all(unit_complete(out_dir, n) for n in ("tier_1m", "tier_1h", "tier_1d"))
    assert m1["tier_1m"]["rows"] > 0 and m1["tier_1m"]["value_checksum"]
    assert m1["tier_1m"]["stats"]["min"] > 0

    # second run: everything skipped
    m2 = run_cascade_resumable(tokens_path, out_dir)
    assert all(m2[n]["skipped"] for n in m2)
    # kill one tier -> only that tier recomputes, checksum identical (determinism)
    import shutil

    shutil.rmtree(os.path.join(out_dir, "tier_1h"))
    m3 = run_cascade_resumable(tokens_path, out_dir)
    assert m3["tier_1m"]["skipped"] and not m3["tier_1h"]["skipped"] and m3["tier_1d"]["skipped"]
    assert m3["tier_1h"]["value_checksum"] == m1["tier_1h"]["value_checksum"]


def test_reservoir_merge_weighting_and_determinism():
    from scala_timeseries_lib_ray.functions.stats import UniformReservoir

    import numpy as np

    a1 = UniformReservoir(size=200, seed=1).update_many(np.full(500, 1.0))
    b1 = UniformReservoir(size=200, seed=2).update_many(np.full(500, 5.0))
    m1 = a1.merge(b1).snapshot()
    # equal counts -> roughly half the slots from each side
    assert 2.0 < m1.mean < 4.0
    # deterministic: same seeds, same inputs -> identical snapshot
    a2 = UniformReservoir(size=200, seed=1).update_many(np.full(500, 1.0))
    b2 = UniformReservoir(size=200, seed=2).update_many(np.full(500, 5.0))
    m2 = a2.merge(b2).snapshot()
    assert m1.as_dict() == m2.as_dict()


def test_read_block_range_prunes(ray_session, tmp_path):
    """Selective decode: the filtered read must fetch only blocks overlapping the
    range (parquet statistics pruning), and the clipped points must equal an
    in-memory slice of the full decode."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scala_timeseries_lib_ray.functions.trim import slice_table
    from scala_timeseries_lib_ray.stages.gorillastage import (
        decode_blocks,
        encode_blocks,
        read_block_range,
    )

    n = 5000
    ts = 1_700_000_000_000 + np.arange(n, dtype=np.int64) * 1000
    t = pa.table(
        {
            "source": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array((np.arange(n) % 97).astype(np.float64)),
            "validity": pa.array(np.full(n, 1000, dtype=np.int64)),
        }
    )
    pts = ray.data.from_arrow(t)
    blocks = encode_blocks(pts, block_width=60_000)
    path = str(tmp_path / "blocks")
    blocks.write_parquet(path)

    lo = 1_700_000_000_000 + 120_000
    hi = lo + 120_000  # 2 one-minute buckets
    # pruned read touches only overlapping blocks
    import pyarrow.dataset as pads

    flt = (pads.field("bucket_end") > lo) & (pads.field("bucket_ts") < hi)
    pruned = ray.data.read_parquet(path, filter=flt)
    total = ray.data.read_parquet(path).count()
    touched = pruned.count()
    assert touched < total / 10, (touched, total)
    assert touched == 6  # 2 sources x 3 buckets (the unaligned range straddles 3)

    got = read_block_range(path, lo, hi).to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    full = decode_blocks(ray.data.read_parquet(path))
    want = (
        full.map_batches(lambda b: slice_table(b, lo, hi), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) and (got["ts"] >= lo).all() and ((got["ts"] + got["validity"]) <= hi).all()


def test_read_block_range_entry_spanning_block_edge(ray_session, tmp_path):
    """An entry whose validity extends past its block's nominal end must stay
    visible to statistics pruning: a window falling entirely inside the tail
    validity (in a LATER block's time range) must return the trimmed entry,
    not 0 rows (ADVICE r02 high: bucket_end widened to max(ts+validity))."""
    import pyarrow as pa
    import ray.data

    from scala_timeseries_lib_ray.stages.gorillastage import encode_blocks, read_block_range

    base = 1_700_000_000_000
    # block width 60s; entry starts 10s into block 0 with 190s validity ->
    # valid until base+200_000, spanning blocks 1..3 entirely.
    t = pa.table(
        {
            "source": pa.array(["a", "a"]),
            "ts": pa.array([base + 10_000, base + 200_000], pa.int64()),
            "value": pa.array([7.0, 9.0]),
            "validity": pa.array([190_000, 1_000], pa.int64()),
        }
    )
    blocks = encode_blocks(ray.data.from_arrow(t), block_width=60_000)
    path = str(tmp_path / "blocks_span")
    blocks.write_parquet(path)

    # window fully inside the first entry's tail validity, two blocks later
    lo, hi = base + 130_000, base + 150_000
    got = read_block_range(path, lo, hi).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "ts"] == lo and got.loc[0, "validity"] == hi - lo
    assert got.loc[0, "value"] == 7.0


def test_encode_blocks_cluster_consolidates(ray_session):
    """Source-interleaved shards: cluster=True yields one block per
    (source, bucket) and decodes to the same points as the fragmented form."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scala_timeseries_lib_ray.stages.gorillastage import decode_blocks, encode_blocks

    n = 2000
    ts = 1_700_000_000_000 + np.arange(n, dtype=np.int64) * 1000
    t = pa.table(
        {
            "source": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array((np.arange(n) % 7).astype(np.float64)),
            "validity": pa.array(np.full(n, 1000, dtype=np.int64)),
        }
    )
    # 4 interleaved shards -> the no-shuffle form fragments blocks
    shards = ray.data.from_arrow([t.slice(i, 500) for i in range(0, n, 500)])
    frag = encode_blocks(shards, block_width=600_000)
    cons = encode_blocks(shards, block_width=600_000, cluster=True)
    n_frag, n_cons = frag.count(), cons.count()
    buckets = 2 * len(np.unique(ts // 600_000))
    assert n_cons == buckets < n_frag
    a = decode_blocks(cons).to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    b = decode_blocks(frag).to_pandas().sort_values(["source", "ts"]).reset_index(drop=True)
    assert a.equals(b)
