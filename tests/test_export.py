"""export_corpus: bucket partitioning, resume-skips-finished, content equality."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=500):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array((np.arange(n) * 7 % 100).astype(np.int64)),
        }
    )


def test_export_roundtrip_and_resume(ray_session, tmp_path):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.export import (
        export_corpus,
        finished_buckets,
        read_export,
    )

    out = str(tmp_path / "exp")
    t = _docs()
    ds = ray.data.from_arrow([t.slice(i, 100) for i in range(0, t.num_rows, 100)])
    m1 = export_corpus(ds, out, n_buckets=8)
    assert set(m1) == set(range(8)) == finished_buckets(out, 8)
    assert sum(m["rows"] for m in m1.values()) == 500
    assert not any(m["skipped"] for m in m1.values())

    back = read_export(out).to_pandas()
    want = t.to_pandas()
    pd.testing.assert_frame_equal(
        back.drop(columns=["bucket"]).sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    # bucket column matches the deterministic assignment
    from scala_timeseries_lib_ray.pipelines.dataprep import md5_u64_strings

    h = md5_u64_strings(pa.array([str(i) for i in back.doc_id]))
    assert (back.bucket.to_numpy() == (h % np.uint64(8)).astype(np.int64)).all()

    # simulate a killed run: delete three buckets, re-export -> only they rewrite
    for b in (1, 4, 6):
        shutil.rmtree(os.path.join(out, f"bucket={b}"))
    m2 = export_corpus(ds, out, n_buckets=8)
    assert {b for b, m in m2.items() if m["skipped"]} == set(range(8)) - {1, 4, 6}
    assert {b for b, m in m2.items() if not m["skipped"]} == {1, 4, 6}
    assert sum(m["rows"] for m in m2.values()) == 500
    back2 = read_export(out).to_pandas()
    pd.testing.assert_frame_equal(
        back2.sort_values("doc_id").reset_index(drop=True),
        back.sort_values("doc_id").reset_index(drop=True),
    )

    # fully-complete export is a no-op
    m3 = export_corpus(ds, out, n_buckets=8)
    assert all(m["skipped"] for m in m3.values())

    # pruned read of a bucket subset
    part = read_export(out, buckets=[0, 2]).to_pandas()
    assert set(part.bucket) <= {0, 2}
    assert len(part) == sum(m1[b]["rows"] for b in (0, 2))

    with pytest.raises(ValueError):
        export_corpus(ds, out, n_buckets=0)


def test_export_manifest_counts_match_files(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from scala_timeseries_lib_ray.pipelines.export import export_corpus

    out = str(tmp_path / "exp2")
    ds = ray.data.from_arrow(_docs(123))
    ms = export_corpus(ds, out, n_buckets=4)
    for b, m in ms.items():
        d = os.path.join(out, f"bucket={b}")
        with open(os.path.join(d, "MANIFEST.json")) as f:
            on_disk = json.load(f)
        assert on_disk["rows"] == m["rows"]
        got = sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in on_disk["files"]
        )
        assert got == m["rows"]


def test_export_clears_stale_staging(ray_session, tmp_path):
    """A _staging dir left by a killed run must be discarded, not absorbed."""
    import ray.data

    from scala_timeseries_lib_ray.pipelines.export import export_corpus, read_export

    out = str(tmp_path / "exp3")
    os.makedirs(os.path.join(out, "_staging", "bucket=0"))
    with open(os.path.join(out, "_staging", "bucket=0", "junk.parquet"), "w") as f:
        f.write("not parquet")
    ds = ray.data.from_arrow(_docs(80))
    ms = export_corpus(ds, out, n_buckets=4)
    assert sum(m["rows"] for m in ms.values()) == 80
    assert not os.path.exists(os.path.join(out, "_staging"))
    assert len(read_export(out).to_pandas()) == 80
