"""events table -> points derivation.

The driver's ``events`` table is the stream-shaped input: one row per event with a
real timestamp. Derivation (mirrored in the oracle SQL):

    source   = event_type
    ts       = epoch milliseconds of the event timestamp
    value    = the event's value (optionally quantized for integer-exact aggregates)
    validity = min(next event ts - ts, 600_000)   (gap to the next event in the same
               series, capped at 10 minutes; the last event gets the cap) — the
               classic "state valid until the next reading, at most T" rule.

Ordering contract: per-series LEAD requires the series grouped+sorted; callers run
this through ``groupby(source).map_groups`` (events are a keyed log, reference
streaming-ingest analog ``TimeSeriesBuilder``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EVENT_VALIDITY_CAP = 600_000


def events_to_points(t: pa.Table, quantize: str | None = None) -> pa.Table:
    """One GROUP (or a whole sorted table) of events -> points. ``quantize``:
    None (raw doubles), 'int' (round(value)), 'cents' (round(value*100))."""
    ts_col = t.column("ts")
    if pa.types.is_timestamp(ts_col.type):
        tsm = np.asarray(ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)) // 1000
    else:
        tsm = np.asarray(ts_col.to_numpy(zero_copy_only=False))
    src = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
    val = np.asarray(t.column("value").to_numpy(zero_copy_only=False), dtype=np.float64)
    order = np.lexsort((tsm, src))
    src, tsm, val = src[order], tsm[order], val[order]
    same = np.zeros(len(src) - 1, dtype=bool) if len(src) else np.zeros(0, bool)
    if len(src) > 1:
        same = src[1:] == src[:-1]
    validity = np.full(len(src), EVENT_VALIDITY_CAP, dtype=np.int64)
    if len(src) > 1:
        gap = tsm[1:] - tsm[:-1]
        validity[:-1] = np.where(same, np.minimum(gap, EVENT_VALIDITY_CAP), EVENT_VALIDITY_CAP)
    # half-away-from-zero rounding to match SQL ROUND (np.round is half-even)
    if quantize == "int":
        val = np.sign(val) * np.floor(np.abs(val) + 0.5)
    elif quantize == "cents":
        v100 = val * 100
        val = np.sign(v100) * np.floor(np.abs(v100) + 0.5)
    return pa.table(
        {
            "source": pa.array(src),
            "ts": pa.array(tsm, pa.int64()),
            "value": pa.array(val, pa.float64()),
            "validity": pa.array(validity, pa.int64()),
        }
    )
