"""Entity/label catalog layer: TsId codec, unit mapping, columnar bridge."""

import numpy as np
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.functions.entity import (
    StaticUnitMapper,
    SuffixUnitMapper,
    TimeSeriesEntityId,
    TsId,
    TsLabel,
    attach_source,
    split_source,
)


def test_ts_id_roundtrip_and_units():
    ent = TimeSeriesEntityId("plant7")
    tsid = ent.build_ts_id(TsLabel("engine_power_kW"))
    assert tsid.source == "plant7:engine_power_kW"
    back = TsId.from_source(tsid.source)
    assert back == tsid

    static = StaticUnitMapper({"engine_power_kW": "kW"})
    assert tsid.label.unit(static) == "kW"
    assert TsLabel("unknown").unit(static) is None
    suffix = SuffixUnitMapper({"kW", "degC"})
    assert tsid.label.unit(suffix) == "kW"
    assert TsLabel("rpm_total").unit(suffix) is None

    with pytest.raises(ValueError):
        TimeSeriesEntityId("bad:key")


def test_columnar_bridge_through_engine_kernel():
    # (entity, label)-keyed rows flow through a source-keyed kernel and split back
    from scala_timeseries_lib_ray.functions.fit import fit_table

    t = pa.table(
        {
            "entity": pa.array(["e1", "e1", "e2", "e2"]),
            "label": pa.array(["temp", "temp", "temp", "power"]),
            "ts": pa.array([1000, 2000, 1000, 1000], pa.int64()),
            "value": pa.array([5.0, 5.0, 7.0, 9.0]),
            "validity": pa.array([1000, 1000, 1000, 1000], pa.int64()),
        }
    )
    keyed = attach_source(t).drop_columns(["entity", "label"])
    order = pa.compute.sort_indices(keyed, sort_keys=[("source", "ascending"), ("ts", "ascending")])
    fitted = fit_table(keyed.take(order), keys=("source",), validate=False)
    # e1:temp compresses into one run; the two entities' "temp" series stay apart
    assert fitted.num_rows == 3
    back = split_source(fitted)
    assert set(zip(back["entity"].to_pylist(), back["label"].to_pylist())) == {
        ("e1", "temp"),
        ("e2", "temp"),
        ("e2", "power"),
    }
    e1 = fitted.filter(pa.compute.equal(fitted["source"], "e1:temp"))
    assert e1["validity"].to_pylist() == [2000]


def test_split_source_label_may_contain_separator():
    t = pa.table({"source": pa.array(["e1:a:b"])})
    out = split_source(t)
    assert out["entity"].to_pylist() == ["e1"]
    assert out["label"].to_pylist() == ["a:b"]


def test_attach_source_rejects_separator_in_entity():
    import pytest

    t = pa.table(
        {
            "entity": pa.array(["e:2"]),
            "label": pa.array(["c"]),
        }
    )
    with pytest.raises(ValueError, match="must not contain"):
        attach_source(t)
