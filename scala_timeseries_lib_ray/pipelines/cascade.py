"""The flagship pipeline: raw token table -> points -> 1m -> 1h -> 1d continuous
aggregates with retention trims and last-known-value gap-fill.

North-star shape (BASELINE.json): streaming Dataset pipeline end to end — read,
derive, fit (block-local compress), rollup partials, groupby-of-partials per tier,
write partitioned parquet. No stage materializes the raw points; tiers N+1 re-use
tier N's algebraic partials.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.bucket import tier_table_to_points
from ..functions.transform import fill_table
from ..functions.trim import slice_table
from ..stages.fitstage import fit_blocks, fit_shards
from ..stages.points import derive_points
from ..stages.rollup import reaggregate_tier, rollup_tier

MS_1M = 60_000
MS_1H = 3_600_000
MS_1D = 86_400_000

TIER_WIDTHS = {"1m": MS_1M, "1h": MS_1H, "1d": MS_1D}


def cascade(
    tokens: ray.data.Dataset,
    compress: bool = True,
    fit_block_width: int = MS_1H,
    fit_mode: str = "shards",
) -> dict[str, ray.data.Dataset]:
    """token table -> {'points': fitted points, 'tier_1m','tier_1h','tier_1d'}.

    ``fit_mode``: 'shards' (no-shuffle, shard-local compression — the scale path for
    the (source, time)-clustered token layout) or 'blocks' (grouped, exact
    block-local compression for arbitrary layouts)."""
    points = derive_points(tokens)
    fit = fit_shards if fit_mode == "shards" else fit_blocks
    fitted = fit(points, compress=compress, block_width=fit_block_width)
    tier_1m = rollup_tier(fitted, MS_1M, combine="edges")
    tier_1h = reaggregate_tier(tier_1m, MS_1H)
    tier_1d = reaggregate_tier(tier_1h, MS_1D)
    return {"points": fitted, "tier_1m": tier_1m, "tier_1h": tier_1h, "tier_1d": tier_1d}


def cascade_from_points(
    points: ray.data.Dataset, combine: str = "edges"
) -> dict[str, ray.data.Dataset]:
    """Same cascade for an already-derived points dataset (events-based pipelines).
    ``combine='edges'`` assumes time-clustered batches (see rollup_tier)."""
    tier_1m = rollup_tier(points, MS_1M, combine=combine)
    tier_1h = reaggregate_tier(tier_1m, MS_1H)
    tier_1d = reaggregate_tier(tier_1h, MS_1D)
    return {"tier_1m": tier_1m, "tier_1h": tier_1h, "tier_1d": tier_1d}


def apply_retention(
    tiers: dict[str, ray.data.Dataset],
    horizons: dict[str, tuple[int, int]],
) -> dict[str, ray.data.Dataset]:
    """Retention trims per tier: keep only buckets within [lo, hi) per tier name.

    Tier rows are whole buckets — the discrete trim (keep/drop whole entries,
    reference ``trimLeftDiscrete``/``trimRightDiscrete``) is a pushdown-friendly
    filter on ``bucket_ts``."""
    out = {}
    for name, ds in tiers.items():
        if name in horizons:
            lo, hi = horizons[name]
            out[name] = ds.map_batches(
                lambda t, lo=lo, hi=hi: t.filter(
                    pa.compute.and_(
                        pa.compute.greater_equal(t.column("bucket_ts"), lo),
                        pa.compute.less(t.column("bucket_ts"), hi),
                    )
                ),
                batch_format="pyarrow",
            )
        else:
            out[name] = ds
    return out


def gapfill_tier_lkv(tier: ray.data.Dataset, width: int) -> ray.data.Dataset:
    """Last-known-value gap-fill of a tier's mean series, per source (the north-star
    gap-fill; composes the reference ``fill`` + ``fallback`` semantics). One group per
    source: tier rows are already aggregated, so groups are small even at scale."""

    def fill_group(t: pa.Table) -> pa.Table:
        pts = tier_table_to_points(t, width)
        order = pa.compute.sort_indices(pts, sort_keys=[("source", "ascending"), ("ts", "ascending")])
        return fill_table(pts.take(order), last_known=True)

    return tier.groupby("source").map_groups(fill_group, batch_format="pyarrow")


def write_tiers(tiers: dict[str, ray.data.Dataset], out_dir: str) -> dict[str, str]:
    """Write each tier as a partitioned parquet directory (resumable layout)."""
    paths = {}
    for name, ds in tiers.items():
        path = f"{out_dir}/{name}"
        ds.write_parquet(path)
        paths[name] = path
    return paths
