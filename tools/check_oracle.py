"""Driver-sim: run every queries()[name] against oracle_sql()[name] via DuckDB and
compare row count + schema (column names) + order-insensitive values, the way the
driver's correctness gate does. Exact equality is the bar; a tolerance diagnostic is
printed when exact fails so float-sum-order issues are distinguishable from bugs.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rows: ray={len(ray_df)} oracle={len(ora_df)}")
        return problems
    a, b = canon(ray_df), canon(ora_df)
    for col in a.columns:
        # The driver hashes value representations, so 7200 (int64) != 7200.0
        # (float64) even when values agree — but int32 vs int64 passed the driver's
        # r01 hash (embedding_centroids, ev_sample_strict), so only a *kind*
        # mismatch (int vs float vs object) is a real failure.
        if a[col].dtype.kind != b[col].dtype.kind:
            problems.append(f"col {col}: DTYPE ray={a[col].dtype} oracle={b[col].dtype}")
        x, y = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(np.asarray(x).dtype, np.floating) or np.issubdtype(
            np.asarray(y).dtype, np.floating
        ):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            exact = np.array_equal(x, y, equal_nan=True)
            if not exact:
                close = np.allclose(x, y, rtol=1e-9, atol=1e-9, equal_nan=True)
                worst = float(np.nanmax(np.abs(x - y))) if len(x) else 0.0
                problems.append(
                    f"col {col}: exact={exact} close={close} max_abs_diff={worst:.3e}"
                )
        else:
            if not (x == y).all():
                i = int(np.flatnonzero(x != y)[0])
                problems.append(f"col {col}: first diff at row {i}: ray={x[i]} oracle={y[i]}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if hasattr(entrymod, "extra_queries"):  # bench-only extras: still checked here
        qs.update(entrymod.extra_queries())
        oracles.update(entrymod.extra_oracle_sql())
    names = args.only.split(",") if args.only else sorted(qs)
    failures = 0
    for name in names:
        import time

        t0 = time.time()
        try:
            ray_df = to_pandas(qs[name](args.sf))
        except Exception as e:
            print(f"[FAIL] {name}: ray side raised: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle raised: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, ray_df, ora_df)
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({len(ray_df)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"[ok]   {name}: {len(ray_df)} rows match ({time.time()-t0:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
