"""Job entrypoints for ``ray job submit`` (north rule: "run via ray job submit
on a fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- \
        python -m scala_timeseries_lib_ray.cli rollup \
            --input /data/tokens --out /data/tiers

Subcommands:

- ``rollup``: the flagship raw -> 1m -> 1h -> 1d cascade with per-tier
  checkpoint manifests (a killed job resumes where it stopped; lineage is the
  written file chain). Prints one JSON metrics line per tier.
- ``synth``: materialize the deterministic synthetic token table (for smoke
  runs on a fresh cluster).

Inside a Ray job the cluster is already initialised; standalone invocations
fall back to a local session (guarded — library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        # inside `ray job submit` the runtime connects automatically via
        # RAY_ADDRESS; standalone falls back to a local session
        ray.init(include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_rollup(args: argparse.Namespace) -> int:
    ray = _ensure_ray()
    from .stages.manifest import run_cascade_resumable

    t0 = time.time()
    manifests = run_cascade_resumable(args.input, args.out)
    wall = time.time() - t0
    for tier, m in manifests.items():
        print(json.dumps({"tier": tier, **{k: m[k] for k in ("rows", "skipped", "value_checksum") if k in m}}))
    print(json.dumps({"metric": "rollup_job_sec", "value": round(wall, 3), "out": args.out}))
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    from .sources.tokens import write_synth_token_table

    counts = write_synth_token_table(args.out, args.docs, n_sources=args.sources)
    print(json.dumps({"out": args.out, "docs": sum(counts.values()), "sources": len(counts)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="scala_timeseries_lib_ray.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("rollup", help="resumable raw->1m->1h->1d cascade")
    p.add_argument("--input", required=True, help="token table parquet dir")
    p.add_argument("--out", required=True, help="tier output dir (manifests live here)")
    p.set_defaults(fn=cmd_rollup)

    p = sub.add_parser("synth", help="write the synthetic token table")
    p.add_argument("--out", required=True)
    p.add_argument("--docs", type=int, default=100_000)
    p.add_argument("--sources", type=int, default=8)
    p.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
