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


CHECKSUM_VERSION = 2


def _checksum(t: pa.Table) -> str:
    """Order-insensitive content checksum (format v2): each column is md5-hashed
    to uint64 independently, combined per row with a distinct odd multiplier per
    (name-sorted) column position, and the row hashes are summed. No separator
    join, so adjacent values that shift content across a separator (e.g.
    ('a\\x1f','b') vs ('a','\\x1fb')) cannot collide. v2 is NOT comparable to
    the v1 joined-string format — manifests record ``checksum_version`` so old
    manifests are never re-verified against the wrong algorithm."""
    import pyarrow.compute as pc

    from ..pipelines.dataprep import md5_u64_strings

    cols = sorted(t.column_names)
    if not cols or not len(t):
        return f"{0:016x}"
    total = np.zeros(len(t), dtype=np.uint64)
    golden = np.uint64(0x9E3779B97F4A7C15)  # odd; odd*odd stays odd (invertible mod 2^64)
    for i, c in enumerate(cols):
        enc = pc.fill_null(pc.cast(t.column(c), pa.string()), "\x00null")
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        total += md5_u64_strings(enc) * (np.uint64(2 * i + 1) * golden)
    return f"{int(total.sum(dtype=np.uint64)):016x}"


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
    import pyarrow.compute as pc

    res = UniformReservoir(seed=42)
    per_source: dict[str, int] = {}
    rows = 0
    bmin = bmax = None
    if t is not None and len(t):
        rows = len(t)
        names = t.column_names
        if "source" in names:
            vc = pc.value_counts(t.column("source").combine_chunks())
            per_source = dict(
                sorted(
                    (v.as_py(), int(c.as_py()))
                    for v, c in zip(vc.field("values"), vc.field("counts"))
                )
            )
        for c in ("bucket_ts", "ts"):
            if c in names:
                mm = pc.min_max(t.column(c))
                bmin, bmax = int(mm["min"].as_py()), int(mm["max"].as_py())
                break
        if value_col in names:
            res.update_many(
                np.asarray(
                    t.column(value_col).to_numpy(zero_copy_only=False), np.float64
                )
            )
    manifest = {
        "name": name,
        "rows": rows,
        "files": [os.path.basename(f) for f in files],
        "per_source_rows": per_source,
        "min_ts": bmin,
        "max_ts": bmax,
        "value_checksum": _checksum(t) if t is not None and len(t) else None,
        "checksum_version": CHECKSUM_VERSION,
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
