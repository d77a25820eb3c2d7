"""Temporal joins + prefix scan (stages/joinstage.py): edge cases and a
random-events DuckDB parity fuzz. Single-series analogue in the reference:
TimeSeries.sample last-known-value (TimeSeries.scala:585-606)."""

import numpy as np
import pyarrow as pa
import pytest


def mk_events(eids, tss, uids, types, vals):
    return pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array(tss, pa.int64()),  # already ms (joinstage accepts int ts)
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )


def test_asof_edges(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.stages.joinstage import asof_join

    # user 1: click@10 click@30, purchases@5 (no prior -> dropped), @10 (equal
    # ts inclusive), @20 (->10), @40 (->30)
    # user 2: no clicks at all -> its purchase dropped
    # user 65: same part as user 1 (65 % 64 == 1) -> must not cross-match
    t = mk_events(
        [0, 1, 2, 3, 4, 5, 6, 7],
        [10, 30, 5, 10, 20, 40, 15, 12],
        [1, 1, 1, 1, 1, 1, 2, 65],
        ["click", "click", "purchase", "purchase", "purchase", "purchase",
         "purchase", "purchase"],
        [1.0, 2.0, 0, 0, 0, 0, 0, 0],
    )
    out = (
        asof_join(ray.data.from_arrow(t), "purchase", "click")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [3, 4, 5]
    assert list(out["click_ts"]) == [10, 10, 30]
    assert list(out["click_value"]) == [1.0, 1.0, 2.0]
    assert list(out["lag_ms"]) == [0, 10, 10]


def test_range_agg_edges(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.stages.joinstage import range_join_agg

    W = 100
    # user 1: clicks at 50(v1.5->2), 100(v2.4->2), 201(v-0.5->-1)
    #   error@200: window [100,200] -> click@100 only (50 excluded: 200-100=100,
    #   inclusive lower bound -> WAIT 200-W=100 so click@100 in, click@50 out)
    #   error@201: window [101,201] -> click@201 (equal ts inclusive)
    # user 2: error with zero clicks -> 0/0 row kept (left semantics)
    # user 65 shares part with user 1 -> clamp must stop cross-key windows
    t = mk_events(
        [0, 1, 2, 3, 4, 5, 6, 7],
        [50, 100, 201, 200, 201, 150, 10, 20],
        [1, 1, 1, 1, 1, 2, 65, 65],
        ["click", "click", "click", "error", "error", "error", "click", "error"],
        [1.5, 2.4, -0.5, 0, 0, 0, 9.0, 0],
    )
    out = (
        range_join_agg(ray.data.from_arrow(t), "error", "click", window_ms=W)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [3, 4, 5, 7]
    # error@200: [100,200] -> click@100; error@201: [101,201] -> click@201 only
    assert list(out["n_clicks"]) == [1, 1, 0, 1]
    # sums: round(2.4)=2; round(-0.5) away from zero = -1; 0; round(9.0)=9
    assert list(out["sum_click"]) == [2, -1, 0, 9]


def test_joins_duckdb_fuzz(ray_session):
    import duckdb
    import ray.data

    from scala_timeseries_lib_ray.stages.joinstage import (
        asof_join,
        prefix_sum_sharded,
        range_join_agg,
    )

    rng = np.random.default_rng(7)
    n = 4000
    # unique ts per (user, type) is guaranteed by globally unique ts
    tss = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(np.int64)
    t = mk_events(
        np.arange(n, dtype=np.int64),
        tss,
        rng.integers(0, 97, n).astype(np.int64),
        rng.choice(["click", "purchase", "error"], n),
        np.round(rng.normal(0, 50, n), 2),
    )
    shards = ray.data.from_arrow([t.slice(i, 500) for i in range(0, n, 500)])

    con = duckdb.connect()
    con.register("ev", t)

    asof = (
        asof_join(shards, "purchase", "click")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ora = con.execute(
        """
        WITH p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type='purchase'),
             b AS (SELECT user_id, ts, value FROM ev WHERE event_type='click')
        SELECT p.event_id, p.user_id, p.ts, b.ts AS click_ts, b.value AS click_value,
               p.ts - b.ts AS lag_ms
        FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
        ORDER BY p.event_id
        """
    ).df()
    assert asof.equals(ora)

    rj = (
        range_join_agg(shards, "error", "click", window_ms=250_000)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ora = con.execute(
        """
        WITH p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type='error'),
             b AS (SELECT user_id, ts, ROUND(value) AS v FROM ev WHERE event_type='click')
        SELECT p.event_id, p.user_id, p.ts, CAST(COUNT(b.ts) AS BIGINT) AS n_clicks,
               CAST(COALESCE(SUM(b.v),0) AS BIGINT) AS sum_click
        FROM p LEFT JOIN b ON b.user_id = p.user_id
           AND b.ts BETWEEN p.ts - 250000 AND p.ts
        GROUP BY 1,2,3 ORDER BY 1
        """
    ).df()
    assert rj.equals(ora)

    cs = (
        prefix_sum_sharded(shards)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ora = con.execute(
        """
        SELECT event_id, event_type AS source, ts,
               CAST(SUM(ROUND(value)) OVER (PARTITION BY event_type ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value
        FROM ev ORDER BY event_id
        """
    ).df()
    assert cs.equals(ora)


def test_prefix_sum_empty_and_single_block(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.stages.joinstage import prefix_sum_sharded

    t = mk_events([0, 1, 2], [5, 6, 7], [1, 1, 1],
                  ["click", "click", "error"], [1.5, -2.5, 0.4])
    out = prefix_sum_sharded(ray.data.from_arrow(t)).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # half-away rounding: 1.5->2, -2.5->-3, 0.4->0
    assert list(out["cum_value"]) == [2, -1, 0]

    empty = t.slice(0, 0)
    out2 = prefix_sum_sharded(ray.data.from_arrow(empty)).to_pandas()
    assert len(out2) == 0
