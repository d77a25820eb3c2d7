"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship raw->1m->1h->1d cascade on sf0.001; ``queries()`` maps
operator names to callables over ``sf_dir``; ``oracle_sql()`` gives the DuckDB-
equivalent SQL per query (run on the same parquet tables, views pre-registered).

Ray is initialised by the driver BEFORE this module is imported: nothing here calls
``ray.init()`` / ``ray.shutdown()``.

The documents-derived token/points tables use the engine-wide deterministic
derivation constants from ``scala_timeseries_lib_ray.sources.tokens`` — the SQL below
mirrors them exactly (same closed forms) so results match value-for-value.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# shared SQL fragments (mirror scala_timeseries_lib_ray/sources/tokens.py)
# ---------------------------------------------------------------------------

# documents -> derived points: dense rank within source by doc_id; drop every 17th;
# ts = T0 + 2800*r + (r*37)%250 ; validity = min(next_ts - ts, 4000), last = 2800
SQL_DOC_POINTS = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS r
  FROM documents
), tok AS (
  SELECT source, r,
         16 + (31 * n_chars + 7 * doc_id) % 2033 AS n_tok,
         1700000000000 + 2800 * r + (r * 37) % 250 AS ts
  FROM ranked
), kept AS (
  SELECT source, ts, CAST(n_tok AS DOUBLE) AS value, r,
         CASE WHEN (r + 1) % 17 = 16 THEN r + 2 ELSE r + 1 END AS nxt
  FROM tok WHERE r % 17 <> 16
)
SELECT source, ts, value,
       LEAST(1700000000000 + 2800 * nxt + (nxt * 37) % 250 - ts, 4000) AS validity
FROM kept
"""


def _sql_tier(width: int, fine: int = 60000) -> str:
    """Tier aggregate SQL: split entries once at the FINEST tier grid (1m), then
    group by the requested tier width (cascade semantics: coarser tiers re-aggregate
    the finest tier's fragments)."""
    return f"""
WITH pts AS ({SQL_DOC_POINTS}),
expl AS (
  SELECT p.*, unnest(generate_series(ts // {fine} * {fine},
                                     (ts + validity - 1) // {fine} * {fine},
                                     {fine})) AS fb
  FROM pts p
), frag AS (
  SELECT source, value, fb // {width} * {width} AS bucket_ts,
         GREATEST(ts, fb) AS fts, LEAST(ts + validity, fb + {fine}) AS fend
  FROM expl
)
SELECT source, bucket_ts,
       COUNT(*) AS "count", MIN(value) AS "min", MAX(value) AS "max",
       SUM(value) AS "sum", SUM(value * (fend - fts)) AS "wsum",
       SUM(fend - fts) AS "wdur",
       SUM(value * (fend - fts)) / SUM(fend - fts) AS "mean"
FROM frag GROUP BY 1, 2
"""


# fit with compression (global per series) over quantized doc points — islands SQL
SQL_DOC_FIT = f"""
WITH pts0 AS ({SQL_DOC_POINTS}),
pts AS (SELECT source, ts, CAST(FLOOR(value / 256) AS DOUBLE) AS value, validity FROM pts0),
c AS (
  SELECT source, ts, value, validity,
         CASE WHEN value = LAG(value) OVER w
                   AND ts <= LAG(ts + validity) OVER w
              THEN 0 ELSE 1 END AS brk
  FROM pts WINDOW w AS (PARTITION BY source ORDER BY ts)
), i AS (
  SELECT *, SUM(brk) OVER (PARTITION BY source ORDER BY ts) AS island FROM c
), runs AS (
  SELECT source, island, MIN(ts) AS ts, ANY_VALUE(value) AS value,
         arg_max(ts + validity, ts) AS run_end
  FROM i GROUP BY 1, 2
), t AS (
  SELECT source, ts, value, run_end,
         LEAD(ts) OVER (PARTITION BY source ORDER BY ts) AS nts
  FROM runs
)
SELECT source, ts, value, LEAST(run_end, COALESCE(nts, run_end)) - ts AS validity FROM t
"""

# last-known-value gap-fill of the 1m tier means + compression of equal runs
SQL_DOC_GAPFILL = f"""
WITH t1m AS ({_sql_tier(60000)}),
e AS (
  SELECT source, bucket_ts AS ts, "mean" AS value,
         COALESCE(LEAD(bucket_ts) OVER w - bucket_ts, 60000) AS validity
  FROM t1m WINDOW w AS (PARTITION BY source ORDER BY bucket_ts)
), c AS (
  SELECT source, ts, value, validity,
         CASE WHEN value = LAG(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM e WINDOW w AS (PARTITION BY source ORDER BY ts)
), i AS (
  SELECT *, SUM(brk) OVER (PARTITION BY source ORDER BY ts) AS island FROM c
)
SELECT source, MIN(ts) AS ts, ANY_VALUE(value) AS value, SUM(validity) AS validity
FROM i GROUP BY source, island
"""

SQL_DOC_DOMAIN = f"""
WITH pts AS ({SQL_DOC_POINTS})
SELECT source, MIN(ts) AS domain_start, MAX(ts + validity) AS domain_end,
       SUM(validity) AS defined_ms,
       CAST(SUM(validity) AS DOUBLE) /
         GREATEST(MAX(ts + validity) - MIN(ts), 1) AS support_ratio
FROM pts GROUP BY source
"""


# ---------------------------------------------------------------------------
# Ray-side pipelines
# ---------------------------------------------------------------------------


def _read_documents(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )


def _doc_tokens_ds(sf_dir: str, with_tokens: bool = False):
    """documents -> deterministic token table (dense rank per source needs a groupby —
    cheap: documents is the small catalog side; the synthetic token table path parses
    ordinals straight from doc_id with no shuffle)."""
    from scala_timeseries_lib_ray.sources.tokens import tokens_from_documents

    docs = _read_documents(sf_dir)
    return docs.groupby("source").map_groups(
        lambda t: tokens_from_documents(t, with_tokens=with_tokens),
        batch_format="pyarrow",
    )


def _doc_points_ds(sf_dir: str):
    from scala_timeseries_lib_ray.stages.points import derive_points

    return derive_points(_doc_tokens_ds(sf_dir))


def q_doc_points(sf_dir: str):
    return _doc_points_ds(sf_dir)


def _tiers(sf_dir: str):
    from scala_timeseries_lib_ray.pipelines.cascade import cascade_from_points

    return cascade_from_points(_doc_points_ds(sf_dir))


def q_doc_tier_1m(sf_dir: str):
    return _tiers(sf_dir)["tier_1m"]


def q_doc_tier_1h(sf_dir: str):
    return _tiers(sf_dir)["tier_1h"]


def q_doc_tier_1d(sf_dir: str):
    return _tiers(sf_dir)["tier_1d"]


def q_doc_fit_compress(sf_dir: str):
    from scala_timeseries_lib_ray.stages.fitstage import fit_per_series

    def quantize(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t.column("value").to_numpy(zero_copy_only=False)) / 256.0)
        return t.set_column(
            t.schema.get_field_index("value"), "value", pa.array(v, pa.float64())
        )

    pts = _doc_points_ds(sf_dir).map_batches(quantize, batch_format="pyarrow")
    return fit_per_series(pts)


def q_doc_gapfill_1m_lkv(sf_dir: str):
    from scala_timeseries_lib_ray.pipelines.cascade import MS_1M, gapfill_tier_lkv

    return gapfill_tier_lkv(_tiers(sf_dir)["tier_1m"], MS_1M)


def q_doc_domain(sf_dir: str):
    from scala_timeseries_lib_ray.functions.domain import domain_table

    def per_series(t: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            t, sort_keys=[("source", "ascending"), ("ts", "ascending")]
        )
        return domain_table(t.take(order))

    return _doc_points_ds(sf_dir).groupby("source").map_groups(
        per_series, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> token table ->
    points -> block-local fit -> 1m -> 1h -> 1d cascade; returns the 1d tier."""
    from scala_timeseries_lib_ray.pipelines.cascade import cascade

    tokens = _doc_tokens_ds("/root/testdata/sf0.001", with_tokens=True)
    tiers = cascade(tokens)
    return tiers["tier_1d"]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_points": q_doc_points,
        "doc_tier_1m": q_doc_tier_1m,
        "doc_tier_1h": q_doc_tier_1h,
        "doc_tier_1d": q_doc_tier_1d,
        "doc_fit_compress": q_doc_fit_compress,
        "doc_gapfill_1m_lkv": q_doc_gapfill_1m_lkv,
        "doc_domain": q_doc_domain,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_points": SQL_DOC_POINTS,
        "doc_tier_1m": _sql_tier(60000),
        "doc_tier_1h": _sql_tier(3600000),
        "doc_tier_1d": _sql_tier(86400000),
        "doc_fit_compress": SQL_DOC_FIT,
        "doc_gapfill_1m_lkv": SQL_DOC_GAPFILL,
        "doc_domain": SQL_DOC_DOMAIN,
    }
