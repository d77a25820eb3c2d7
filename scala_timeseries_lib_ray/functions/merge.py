"""Merge — the full-outer, interval-aligned zip of N step functions.

Reference engine: ``TimeSeriesMerger.scala:49-130`` (2/3/N-ary via tuple encoding) and
the sweep ``mergeEitherSeq`` (``TimeSeriesMerger.scala:155-196``): cut both series at
every change point (any entry start or definedUntil), apply the merge operator on each
homogeneous sub-interval with the 4 definedness cases, invoke ``op(None, None)`` on
*internal* gaps only (``TimeSeriesMerger.scala:221-226``), then fit + compress the
output (``TimeSeriesMerger.scala:117-130``).

This implementation replaces the two-pointer recursion with a vectorized
boundary-union sweep: the set of elementary intervals is identical to the reference's
cut points, so results match entry-for-entry (validated against the
``TimeSeriesMergerSpec`` corpus).

Result domain: ``[min(starts), max(definedUntils))`` (``TimeSeries.scala:256-259``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from .fit import fit_sorted

Arrays = tuple[np.ndarray, np.ndarray, np.ndarray]  # (ts, value, validity)


@dataclass
class MergeOp:
    """Vectorized merge operator.

    ``fn(defined, values) -> (out_defined, out_values)`` where ``defined`` and
    ``values`` are lists (one per input series) of equal-length arrays giving, for each
    elementary interval, whether that series is defined there and with which value.
    ``out_values`` may be a single array or a dict of named arrays (multi-column
    output, e.g. strictZip).
    """

    name: str
    fn: Callable

    def __call__(self, defined, values):
        return self.fn(defined, values)


def _two(defined, values):
    (da, db), (va, vb) = defined, values
    return da, db, va, vb


def _op_plus_strict(defined, values):
    da, db, va, vb = _two(defined, values)
    return da & db, va + vb


def _op_plus_nonstrict(defined, values):
    # reference NumericTimeSeries.nonStrictPlus (NumericTimeSeries.scala:18-26)
    da, db, va, vb = _two(defined, values)
    out = np.where(da & db, va + vb, np.where(da, va, vb))
    return da | db, out


def _op_multiply_strict(defined, values):
    da, db, va, vb = _two(defined, values)
    return da & db, va * vb


def _op_fallback(defined, values):
    # reference TimeSeries.fallback (TimeSeries.scala:523-534): left wins where defined
    da, db, va, vb = _two(defined, values)
    return da | db, np.where(da, va, vb)


def _op_left(defined, values):
    da, db, va, vb = _two(defined, values)
    return da, va


def _op_strict_zip(defined, values):
    # reference strictZip (TimeSeries.scala:330-335): tuple series on common domain
    da, db, va, vb = _two(defined, values)
    return da & db, {"value_a": va, "value_b": vb}


def _op_and_strict(defined, values):
    # Boolean strict AND — the reference's prod-data merge regression op
    # (TimeSeriesMergerSpec.scala:399-420: case (Some(l), Some(r)) => Some(l && r))
    da, db, va, vb = _two(defined, values)
    return da & db, va.astype(bool) & vb.astype(bool)


def _op_or_strict(defined, values):
    da, db, va, vb = _two(defined, values)
    return da & db, va.astype(bool) | vb.astype(bool)


def op_minus(l_default: float | None = None, r_default: float | None = None) -> MergeOp:
    """reference NumericTimeSeries.nonStrictMinus (NumericTimeSeries.scala:37-45):
    a missing side falls back to its default; undefined where the needed default is
    absent. Note (None, None) yields ``l_default - r_default`` when BOTH defaults are
    given — internal gaps then get filled."""

    def fn(defined, values):
        da, db, va, vb = _two(defined, values)
        la = np.where(da, va, np.nan if l_default is None else l_default)
        rb = np.where(db, vb, np.nan if r_default is None else r_default)
        out_def = (da | (l_default is not None)) & (db | (r_default is not None))
        return out_def, la - rb

    return MergeOp(f"minus(l={l_default},r={r_default})", fn)


def op_python(py_op: Callable, arity: int = 2) -> MergeOp:
    """UDF escape hatch: ``py_op(*optional_values) -> value | None`` applied per
    elementary interval (reference's arbitrary merge operator surface,
    ``TimeSeries.scala:248-265``)."""

    def fn(defined, values):
        m = len(defined[0])
        out_def = np.zeros(m, dtype=bool)
        out_val = np.empty(m, dtype=object)
        for j in range(m):
            args = [values[k][j] if defined[k][j] else None for k in range(arity)]
            r = py_op(*args)
            if r is not None:
                out_def[j] = True
                out_val[j] = r
        return out_def, out_val

    return MergeOp("python", fn)


def _op_plus_nary(defined, values):
    """N-ary non-strict plus (tuple-encoded N-ary merge, TimeSeriesMerger.scala:85-130
    with nonStrictPlus folded over the tuple)."""
    any_def = defined[0].copy()
    total = np.where(defined[0], values[0], 0.0)
    for d, v in zip(defined[1:], values[1:]):
        any_def |= d
        total = total + np.where(d, v, 0.0)
    return any_def, total


OPS: dict[str, MergeOp] = {
    "plus_nary": MergeOp("plus_nary", _op_plus_nary),
    "plus_strict": MergeOp("plus_strict", _op_plus_strict),
    "plus": MergeOp("plus", _op_plus_nonstrict),
    "multiply": MergeOp("multiply", _op_multiply_strict),
    "fallback": MergeOp("fallback", _op_fallback),
    "left": MergeOp("left", _op_left),
    "strict_zip": MergeOp("strict_zip", _op_strict_zip),
    "and_strict": MergeOp("and_strict", _op_and_strict),
    "or_strict": MergeOp("or_strict", _op_or_strict),
}


def merge_sweep(
    series: Sequence[Arrays],
    op: MergeOp,
    compress: bool = True,
):
    """Merge N fitted single-series entry arrays. Returns (ts, values, validity) where
    ``values`` is an array or a dict of arrays (for multi-column ops)."""
    nonempty = [s for s in series if len(s[0])]
    if not nonempty:
        e = np.zeros(0, dtype=np.int64)
        dt = series[0][1].dtype if series else np.float64
        return e, np.zeros(0, dtype=dt), e
    ends = [s[0] + s[2] for s in series]
    lo = min(s[0][0] for s in nonempty)
    hi = max(e[-1] for e, s in zip(ends, series) if len(s[0]))
    bounds = np.unique(np.concatenate([np.concatenate([s[0], e]) for s, e in zip(series, ends)]))
    bounds = bounds[(bounds >= lo) & (bounds <= hi)]
    left = bounds[:-1]
    right = bounds[1:]

    defined, values = [], []
    for (ts, val, _v), end in zip(series, ends):
        if len(ts) == 0:
            defined.append(np.zeros(len(left), dtype=bool))
            # dtype-matched placeholder: generic (bool/string/object) series
            # must not be coerced to float by an absent sibling
            values.append(np.zeros(len(left), dtype=val.dtype))
            continue
        i = np.searchsorted(ts, left, side="right") - 1
        ic = np.clip(i, 0, None)
        defined.append((i >= 0) & (left < end[ic]))
        values.append(val[ic])

    out_def, out_val = op(defined, values)
    keep = np.flatnonzero(out_def)
    m_ts = left[keep]
    m_validity = right[keep] - m_ts

    if isinstance(out_val, dict):
        # multi-column output: a run compresses only when EVERY component matches
        # (the reference funnels zip through the compressing builder and equal
        # case-class tuples merge) — fit_sorted handles 2-D values
        if compress:
            keys = list(out_val)
            V = np.column_stack([out_val[k][keep] for k in keys])
            f_ts, f_val, f_validity, _ = fit_sorted(
                m_ts, V, m_validity, None, compress=True, validate=False
            )
            return f_ts, {k: f_val[:, j] for j, k in enumerate(keys)}, f_validity
        return m_ts, {k: v[keep] for k, v in out_val.items()}, m_validity

    m_val = out_val[keep]
    if compress:
        f_ts, f_val, f_validity, _ = fit_sorted(
            m_ts, m_val, m_validity, None, compress=True, validate=False
        )
        return f_ts, f_val, f_validity
    return m_ts, m_val, m_validity


def merge_sweep_keyed(
    series_a: dict[str, Arrays],
    series_b: dict[str, Arrays],
    op: MergeOp,
    compress: bool = True,
) -> dict[str, tuple]:
    """Merge two keyed collections of series (full outer on the key set)."""
    out = {}
    for k in sorted(set(series_a) | set(series_b)):
        empty = (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.float64),
            np.zeros(0, dtype=np.int64),
        )
        out[k] = merge_sweep([series_a.get(k, empty), series_b.get(k, empty)], op, compress)
    return out
