"""stratified_sample / normalize_text: python-reference parity, mode equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=300, seed=2):
    rng = np.random.default_rng(seed)
    src = np.array([f"s{i}" for i in rng.integers(0, 7, n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(src),
        }
    )


def _ref_sample(t: pa.Table, k: int) -> pd.DataFrame:
    from scala_timeseries_lib_ray.pipelines.dataprep import md5_u64_strings

    df = t.to_pandas()
    df["h"] = md5_u64_strings(pa.array([str(i) for i in df.doc_id]))
    df = df.sort_values(["source", "h", "doc_id"]).reset_index(drop=True)
    df["sample_rank"] = df.groupby("source").cumcount() + 1
    out = df[df.sample_rank <= k][["doc_id", "source", "sample_rank"]]
    return out.sort_values(["source", "sample_rank"]).reset_index(drop=True)


@pytest.mark.parametrize("combine", ["root", "groupby"])
def test_stratified_sample_matches_reference(ray_session, combine):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import stratified_sample

    t = _docs()
    ds = ray.data.from_arrow([t.slice(i, 50) for i in range(0, t.num_rows, 50)])
    got = (
        stratified_sample(ds, k=4, combine=combine)
        .to_pandas()
        .sort_values(["source", "sample_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_sample(t, 4))


def test_stratified_sample_validation(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import stratified_sample

    ds = ray.data.from_arrow(_docs(20))
    with pytest.raises(ValueError):
        stratified_sample(ds, k=0)
    with pytest.raises(ValueError):
        stratified_sample(ds, k=3, combine="tree")
    # k exceeding a group's size returns the whole group, ranks still 1..n
    got = stratified_sample(ds, k=1000).to_pandas()
    assert len(got) == 20
    assert got.groupby("source").sample_rank.max().ge(1).all()


def test_normalize_text(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import normalize_text

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["  Hello,   WORLD!! 42 ", "a--b__c", "", "###"]
            ),
        }
    )
    got = normalize_text(ray.data.from_arrow(t)).to_pandas()
    assert got.text_norm.tolist() == ["hello world 42", "a b c", "", ""]
    assert got.n_chars_norm.tolist() == [14, 5, 0, 0]
