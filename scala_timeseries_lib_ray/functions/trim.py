"""Trim / slice / split kernels.

Reference semantics (``TimeSeries.scala:20-74``, entry math ``immutable/TSEntry.scala:46-129``):

- ``trimLeft(at)``: drop everything before ``at``; an entry straddling ``at`` is split —
  it becomes ``(at, v, definedUntil - at)`` (``trimEntryLeft``, ``immutable/TSEntry.scala:104-112``).
- ``trimRight(at)``: drop everything at/after ``at``; a straddling entry becomes
  ``(ts, v, at - ts)`` (``trimEntryRight``, ``immutable/TSEntry.scala:68-76``).
- ``slice(from, to) == trimLeft(from).trimRight(to)`` (``TimeSeries.scala:32``).
- Discrete variants never split: the straddling entry is kept whole or dropped whole
  depending on ``includeEntry`` (``TimeSeries.scala:59-74``, ``immutable/TSEntry.scala:58-99``).
  ``trimLeftDiscrete`` keeps a straddler whose timestamp equals ``at`` regardless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import table_to_arrays

_I64MIN = np.iinfo(np.int64).min
_I64MAX = np.iinfo(np.int64).max


def slice_arrays(
    ts: np.ndarray,
    validity: np.ndarray,
    t_from: int = _I64MIN,
    t_to: int = _I64MAX,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Continuous slice with entry splitting. Returns (new_ts, new_validity, keep_index)."""
    end = ts + validity
    keep = np.flatnonzero((ts < t_to) & (end > t_from))
    new_ts = np.maximum(ts[keep], t_from)
    new_end = np.minimum(end[keep], t_to)
    return new_ts, new_end - new_ts, keep


def slice_discrete_arrays(
    ts: np.ndarray,
    validity: np.ndarray,
    t_from: int = _I64MIN,
    t_to: int = _I64MAX,
    include_left: bool = True,
    include_right: bool = True,
) -> np.ndarray:
    """Discrete slice (no splitting). Returns keep_index.

    ``include_left`` controls the entry straddling ``t_from`` (kept whole if True, unless
    its timestamp equals ``t_from`` in which case it is always kept); ``include_right``
    controls the entry straddling ``t_to``.
    """
    end = ts + validity
    keep = (ts < t_to) & (end > t_from)
    if not include_left:
        # straddles the left bound strictly (defined at t_from but starts before it)
        keep &= ~((ts < t_from) & (end > t_from))
    if not include_right:
        keep &= ~((ts < t_to) & (end > t_to))
    return np.flatnonzero(keep)


def slice_table(
    t: pa.Table,
    t_from: int = _I64MIN,
    t_to: int = _I64MAX,
    discrete: bool = False,
    include_left: bool = True,
    include_right: bool = True,
) -> pa.Table:
    arrs = table_to_arrays(t)
    if discrete:
        keep = slice_discrete_arrays(
            arrs["ts"], arrs["validity"], t_from, t_to, include_left, include_right
        )
        return t.take(pa.array(keep, type=pa.int64()))
    new_ts, new_validity, keep = slice_arrays(arrs["ts"], arrs["validity"], t_from, t_to)
    out = t.take(pa.array(keep, type=pa.int64()))
    out = out.set_column(out.schema.get_field_index("ts"), "ts", pa.array(new_ts, pa.int64()))
    return out.set_column(
        out.schema.get_field_index("validity"), "validity", pa.array(new_validity, pa.int64())
    )


def trim_left_table(t: pa.Table, at: int, discrete: bool = False, include: bool = True) -> pa.Table:
    return slice_table(t, t_from=at, discrete=discrete, include_left=include)


def trim_right_table(t: pa.Table, at: int, discrete: bool = False, include: bool = True) -> pa.Table:
    return slice_table(t, t_to=at, discrete=discrete, include_right=include)


def split_table(t: pa.Table, at: int) -> tuple[pa.Table, pa.Table]:
    """``split(at)`` == (trimRight(at), trimLeft(at)), reference ``TimeSeries.scala:38-44``."""
    return trim_right_table(t, at), trim_left_table(t, at)
