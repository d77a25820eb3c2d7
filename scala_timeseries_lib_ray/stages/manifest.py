"""Checkpoint manifests + resumable writes (reference analogue: the GorillaSuperBlock
offset index + Thrift footer as the durable completion record,
``archive/GorillaSuperBlock.scala:159-229`` — here a JSON manifest next to each
partitioned parquet output directory).

Layout per written unit (a tier, a blocks table, ...):

    <out_dir>/<name>/part-*.parquet        (written via a temp dir + atomic rename)
    <out_dir>/<name>/MANIFEST.json        {rows, value_checksum, per-source rows,
                                           min/max bucket, reservoir stats, lineage}

A unit whose manifest exists and matches is SKIPPED on re-run — `resume` means a
killed job re-executes only the units without a complete manifest. Determinism of
the pipelines (fixed seeds, closed-form derivations) makes re-runs byte-stable."""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.stats import UniformReservoir

MANIFEST = "MANIFEST.json"


def _checksum(df) -> str:
    """Order-insensitive content checksum: sum of row-wise md5-derived uint64s."""
    import hashlib

    total = 0
    cols = sorted(df.columns)
    # row-wise stable string encoding
    for row in df[cols].itertuples(index=False):
        h = hashlib.md5(repr(tuple(row)).encode()).digest()[:8]
        total = (total + int.from_bytes(h, "big")) % (1 << 64)
    return f"{total:016x}"


def write_unit(
    ds: ray.data.Dataset,
    out_dir: str,
    name: str,
    value_col: str = "mean",
    lineage: list[str] | None = None,
    force: bool = False,
) -> dict:
    """Write one unit with manifest; skip if already complete. Returns the manifest
    (with ``skipped: True`` when the existing manifest was reused)."""
    unit_dir = os.path.join(out_dir, name)
    mpath = os.path.join(unit_dir, MANIFEST)
    if os.path.exists(mpath) and not force:
        with open(mpath) as f:
            m = json.load(f)
        m["skipped"] = True
        return m

    tmp_dir = unit_dir + f".tmp.{os.getpid()}"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    ds.write_parquet(tmp_dir)

    # manifest computed from what was actually written (audits the files themselves)
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(tmp_dir, f) for f in os.listdir(tmp_dir) if f.endswith(".parquet")
    )
    tables = [pq.read_table(f) for f in files]
    t = pa.concat_tables(tables) if tables else None
    res = UniformReservoir(seed=42)
    per_source: dict[str, int] = {}
    rows = 0
    bmin = bmax = None
    df = None
    if t is not None and len(t):
        df = t.to_pandas()
        rows = len(df)
        if "source" in df.columns:
            per_source = df.groupby("source").size().to_dict()
        for c in ("bucket_ts", "ts"):
            if c in df.columns:
                bmin, bmax = int(df[c].min()), int(df[c].max())
                break
        if value_col in df.columns:
            res.update_many(df[value_col].to_numpy(dtype=np.float64))
    manifest = {
        "name": name,
        "rows": rows,
        "files": [os.path.basename(f) for f in files],
        "per_source_rows": per_source,
        "min_ts": bmin,
        "max_ts": bmax,
        "value_checksum": _checksum(df) if df is not None else None,
        "stats": res.snapshot().as_dict(),
        "lineage": lineage or [],
        "written_at": time.time(),
        "skipped": False,
    }
    with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(unit_dir):
        shutil.rmtree(unit_dir)
    os.rename(tmp_dir, unit_dir)  # atomic completion
    return manifest


def read_unit(out_dir: str, name: str) -> ray.data.Dataset:
    unit_dir = os.path.join(out_dir, name)
    files = sorted(
        os.path.join(unit_dir, f) for f in os.listdir(unit_dir) if f.endswith(".parquet")
    )
    return ray.data.read_parquet(files)


def unit_complete(out_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(out_dir, name, MANIFEST))


def run_cascade_resumable(tokens_path: str, out_dir: str) -> dict[str, dict]:
    """The flagship cascade with per-tier checkpointing: a completed tier (manifest
    present) is read back instead of recomputed; a killed run resumes where it
    stopped. Tier N+1 consumes tier N's WRITTEN output, so lineage is the actual
    file chain."""
    import ray.data as rd

    from ..pipelines.cascade import MS_1D, MS_1H, MS_1M
    from ..stages.fitstage import fit_shards
    from ..stages.points import derive_points
    from ..stages.rollup import reaggregate_tier, rollup_tier

    manifests = {}
    if not unit_complete(out_dir, "tier_1m"):
        tokens = rd.read_parquet(tokens_path, columns=["doc_id", "n_tok", "source"])
        t1m = rollup_tier(fit_shards(derive_points(tokens)), MS_1M)
        manifests["tier_1m"] = write_unit(t1m, out_dir, "tier_1m", lineage=[tokens_path])
    else:
        manifests["tier_1m"] = write_unit(None, out_dir, "tier_1m")  # skip path
    for prev, name, width in (("tier_1m", "tier_1h", MS_1H), ("tier_1h", "tier_1d", MS_1D)):
        if not unit_complete(out_dir, name):
            tier = reaggregate_tier(read_unit(out_dir, prev), width)
            manifests[name] = write_unit(
                tier, out_dir, name, lineage=[os.path.join(out_dir, prev)]
            )
        else:
            manifests[name] = write_unit(None, out_dir, name)
    return manifests
