"""Domains, lookups, support ratio.

Reference: ``TimeSeries.scala:14-18`` (at/entryAt), ``TimeSeries.scala:510-545`` +
``immutable/TimeDomain.scala`` (looseDomain / supportRatio), ``TimeSeries.scala:648-671``
(union/intersection of loose domains).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import seg_bounds, table_to_arrays


def at(ts: np.ndarray, value: np.ndarray, validity: np.ndarray, t: int):
    """Step-function lookup: value of the entry covering ``t`` or None (binary search,
    reference ``immutable/VectorTimeSeries.scala:183-224``)."""
    i = int(np.searchsorted(ts, t, side="right")) - 1
    if i < 0 or t >= ts[i] + validity[i]:
        return None
    return value[i]


def loose_domain(ts: np.ndarray, validity: np.ndarray) -> tuple[int, int] | None:
    """[first.timestamp, last.definedUntil) hull or None for an empty series."""
    if len(ts) == 0:
        return None
    return int(ts[0]), int(ts[-1] + validity[-1])


def support_ratio(ts: np.ndarray, validity: np.ndarray) -> float:
    """defined-time / loose-domain-size (``TimeSeries.scala:536-539``)."""
    dom = loose_domain(ts, validity)
    if dom is None:
        return 0.0
    return float(np.sum(validity)) / (dom[1] - dom[0])


def union_loose_domains(domains) -> tuple[int, int] | None:
    ds = [d for d in domains if d is not None]
    if not ds:
        return None
    return min(d[0] for d in ds), max(d[1] for d in ds)


def intersect_loose_domains(domains) -> tuple[int, int] | None:
    out = None
    for d in domains:
        if d is None:
            return None
        if out is None:
            out = d
        else:
            out = (max(out[0], d[0]), min(out[1], d[1]))
        if out[0] >= out[1]:
            return None
    return out


def domain_table(t: pa.Table, keys: tuple[str, ...] = ("source",)) -> pa.Table:
    """Per-series loose domain + support ratio over a sorted points table."""
    arrs = table_to_arrays(t)
    from .core import seg_ids_from_keys

    seg = seg_ids_from_keys(*(arrs[k] for k in keys))
    starts, ends = seg_bounds(seg, len(t))
    ts, validity = arrs["ts"], arrs["validity"]
    first_ts = ts[starts]
    last_end = ts[ends - 1] + validity[ends - 1]
    defined = np.add.reduceat(validity, starts) if len(starts) else np.zeros(0, np.int64)
    return pa.table(
        {
            **{k: pa.array(arrs[k][starts]) for k in keys},
            "domain_start": pa.array(first_ts, pa.int64()),
            "domain_end": pa.array(last_end, pa.int64()),
            "defined_ms": pa.array(defined, pa.int64()),
            "support_ratio": pa.array(
                defined / np.maximum(last_end - first_ts, 1), pa.float64()
            ),
        }
    )
