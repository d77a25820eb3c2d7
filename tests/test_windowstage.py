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


@pytest.mark.parametrize("width", [60_000, 900_000])
def test_sampled_mean_halo_equals_whole_series(gappy_points, width):
    """The sampled time-aware composition (strict sample -> sliding mean)
    through the halo path, incl. window WIDER than the chunk — the end-to-end
    shape gated by the ev_sliding_mean_halo oracle query (VERDICT r03 #5)."""
    from scala_timeseries_lib_ray.functions.sample import sample_series
    from scala_timeseries_lib_ray.functions.window import sliding_window_events
    from scala_timeseries_lib_ray.stages.seriesops import per_series_stage, sample_stage

    rate = 10_000

    def whole_kernel(ts, v, d):
        s_ts, s_v, s_d = sample_series(ts, v, d, int(ts[0]), rate, use_closest=False)
        if len(s_ts) == 0:
            return s_ts, s_v, s_d
        return sliding_window_events(s_ts, s_v, s_d, width, "mean", compress=False)

    whole = _canon(per_series_stage(gappy_points, whole_kernel).to_pandas())
    sampled = sample_stage(gappy_points, rate=rate, use_closest=False)
    halo = _canon(
        sliding_window_halo(
            sampled, width, "mean", chunk_width=600_000, max_validity=rate
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(whole, halo)
