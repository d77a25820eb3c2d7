"""Halo-chunked sliding windows must equal the whole-series computation (after a
canonicalizing fit, since chunked outputs may split intervals at chunk edges)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.functions.fit import fit_table
from scala_timeseries_lib_ray.stages.seriesops import sliding_window_stage
from scala_timeseries_lib_ray.stages.windowstage import sliding_window_halo


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    t = pa.Table.from_pandas(
        df.sort_values(["source", "ts"]).reset_index(drop=True), preserve_index=False
    )
    return (
        fit_table(t, keys=("source",), validate=False)
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def gappy_points(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    tabs = []
    for si in range(3):
        n = 4000
        gaps = rng.integers(500, 30_000, n)  # gaps up to 30s, sometimes > halo
        ts = 1_000_000 + np.cumsum(gaps)
        validity = np.minimum(gaps[1:] if len(gaps) > 1 else gaps, 5_000)
        validity = np.append(np.minimum(np.diff(ts), 5_000), 5_000)
        vals = np.round(rng.normal(100, 20, n))
        tabs.append(
            pa.table(
                {
                    "source": pa.array([f"s{si}"] * n),
                    "ts": pa.array(ts, pa.int64()),
                    "value": pa.array(vals, pa.float64()),
                    "validity": pa.array(validity, pa.int64()),
                }
            )
        )
    return ray.data.from_arrow(tabs).repartition(6)


@pytest.mark.parametrize("agg", ["min", "max", "sum"])
def test_halo_equals_whole_series(gappy_points, agg):
    width = 60_000
    whole = _canon(sliding_window_stage(gappy_points, width, agg).to_pandas())
    halo = _canon(
        sliding_window_halo(
            gappy_points, width, agg, chunk_width=600_000, max_validity=5_000
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(whole, halo)


def test_halo_window_wider_than_chunk(gappy_points):
    # window wider than the chunk itself: halo must still cover it
    width = 900_000
    whole = _canon(sliding_window_stage(gappy_points, width, "max").to_pandas())
    halo = _canon(
        sliding_window_halo(
            gappy_points, width, "max", chunk_width=600_000, max_validity=5_000
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(whole, halo)
