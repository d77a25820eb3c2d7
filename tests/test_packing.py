"""Sequence packing (concat-and-chunk): sharded two-pass offsets exactly match
a single-threaded reference, per-example doc counts and tail length are right."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.sources.tokens import NTOK_MIN, NTOK_MOD


def _docs_table(n=700, seed=5):
    rng = np.random.default_rng(seed)
    did = np.arange(n, dtype=np.int64)
    n_chars = rng.integers(1, 9000, n).astype(np.int64)
    return pa.table({"doc_id": pa.array(did), "n_chars": pa.array(n_chars)})


def _ref_pack(t: pa.Table, ctx: int) -> pd.DataFrame:
    """Single-threaded reference: global cumsum in doc_id order."""
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    n_tok = NTOK_MIN + (31 * df.n_chars + 7 * df.doc_id) % NTOK_MOD
    off = n_tok.cumsum().shift(1, fill_value=0)
    return pd.DataFrame(
        {
            "doc_id": df.doc_id,
            "n_tok": n_tok.astype(np.int64),
            "tok_offset": off.astype(np.int64),
            "first_example": (off // ctx).astype(np.int64),
            "last_example": ((off + n_tok - 1) // ctx).astype(np.int64),
        }
    )


def _sharded(t: pa.Table, shard=97):
    import ray.data

    return ray.data.from_arrow([t.slice(i, shard) for i in range(0, t.num_rows, shard)])


@pytest.mark.parametrize("ctx", [1024, 64])
def test_pack_sequences_matches_reference(ray_session, ctx):
    from scala_timeseries_lib_ray.pipelines.packing import pack_sequences

    t = _docs_table()
    got = (
        pack_sequences(_sharded(t), ctx=ctx)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_pack(t, ctx))


def test_pack_examples_matches_reference(ray_session):
    from scala_timeseries_lib_ray.pipelines.packing import pack_examples

    ctx = 256
    t = _docs_table(n=300, seed=9)
    ref = _ref_pack(t, ctx)
    total = int(ref.n_tok.sum())
    # per-example doc counts by brute force
    counts: dict[int, int] = {}
    for f, l in zip(ref.first_example, ref.last_example):
        for e in range(int(f), int(l) + 1):
            counts[e] = counts.get(e, 0) + 1
    want = pd.DataFrame(
        sorted(counts.items()), columns=["example_id", "n_docs"]
    ).astype(np.int64)
    want["n_tokens"] = np.minimum(ctx, total - want.example_id * ctx)

    got = (
        pack_examples(_sharded(t, shard=41), ctx=ctx)
        .to_pandas()
        .sort_values("example_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # every example up to the last is present, and the tail is short or full
    assert got.example_id.iloc[0] == 0
    assert (np.diff(got.example_id) == 1).all()
    assert got.n_tokens.iloc[-1] == total - (len(got) - 1) * ctx


def test_pack_invalid_ctx_raises(ray_session):
    from scala_timeseries_lib_ray.pipelines.packing import pack_examples, pack_sequences

    t = _docs_table(n=10)
    with pytest.raises(ValueError):
        pack_sequences(_sharded(t), ctx=0)
    with pytest.raises(ValueError):
        pack_examples(_sharded(t), ctx=-5)


def test_pack_sequences_with_filtered_empty_blocks(ray_session):
    """A block emptied by an upstream filter must not break the carry-in keying
    (the clean_pack composite shape)."""
    import ray.data

    from scala_timeseries_lib_ray.pipelines.packing import pack_sequences

    t = _docs_table(n=300, seed=11)
    ds = ray.data.from_arrow([t.slice(i, 50) for i in range(0, t.num_rows, 50)])
    # kill doc_ids 50..99 entirely -> the second block becomes empty
    filt = ds.map_batches(
        lambda b: b.filter(
            pa.compute.or_(
                pa.compute.less(b.column("doc_id"), 50),
                pa.compute.greater_equal(b.column("doc_id"), 100),
            )
        ),
        batch_format="pyarrow",
    )
    got = (
        pack_sequences(filt, ctx=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    keep = t.filter(
        pa.compute.or_(
            pa.compute.less(t.column("doc_id"), 50),
            pa.compute.greater_equal(t.column("doc_id"), 100),
        )
    )
    pd.testing.assert_frame_equal(got, _ref_pack(keep, 512))
