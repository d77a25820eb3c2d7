"""Append / prepend splices — reference ``TimeSeries.scala:216-246`` +
``immutable/TSEntry.scala:163-213``, golden behavior ``TimeSeriesTestBench.scala:511-696``.

- ``append(a, b)``: everything of ``a`` defined at ``t >= b.first.timestamp`` is
  overwritten by ``b`` (a's straddling entry is trimmed); result re-fitted through a
  compressing builder.
- ``prepend(a, b)``: everything of ``a`` defined at ``t < b.last.definedUntil`` is
  overwritten by ``b``.
"""

from __future__ import annotations

import numpy as np

from .fit import fit_sorted
from .trim import slice_arrays

Arrays = tuple[np.ndarray, np.ndarray, np.ndarray]


def _concat_fit(parts: list[Arrays], compress: bool = True) -> Arrays:
    ts = np.concatenate([p[0] for p in parts])
    val = np.concatenate([p[1] for p in parts])
    dur = np.concatenate([p[2] for p in parts])
    order = np.argsort(ts, kind="stable")
    f = fit_sorted(ts[order], val[order], dur[order], None, compress=compress, validate=False)
    return f[0], f[1], f[2]


def append_series(a: Arrays, b: Arrays, compress: bool = True) -> Arrays:
    if len(b[0]) == 0:
        return a
    cut = int(b[0][0])
    a_ts, a_dur, keep = slice_arrays(a[0], a[2], t_to=cut)
    return _concat_fit([(a_ts, a[1][keep], a_dur), b], compress)


def prepend_series(a: Arrays, b: Arrays, compress: bool = True) -> Arrays:
    if len(b[0]) == 0:
        return a
    cut = int(b[0][-1] + b[2][-1])
    a_ts, a_dur, keep = slice_arrays(a[0], a[2], t_from=cut)
    return _concat_fit([b, (a_ts, a[1][keep], a_dur)], compress)


def splice_arrays_at_cut(
    mode: str, cut: int, is_a: np.ndarray, ts: np.ndarray, validity: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-level append/prepend splice against a precomputed cut scalar
    (reference ``TimeSeries.scala:216-246``): returns ``(keep, new_ts,
    new_validity)`` over ALL rows (dropped rows get degenerate values — callers
    filter by ``keep``). ``is_a`` marks rows of the overwritten side ``a``;
    other rows (side ``b``) pass through untouched.

    - append:  a-rows defined at ``t >= cut`` are dropped; a straddling entry is
      trimmed to end at ``cut``.
    - prepend: a-rows defined strictly before ``cut`` are dropped; a straddling
      entry's start is advanced to ``cut``.
    """
    ts = np.asarray(ts)
    validity = np.asarray(validity)
    is_a = np.asarray(is_a)
    if mode == "append":
        keep = ~is_a | (ts < cut)
        new_dur = np.minimum(
            validity, np.where(is_a, cut - ts, np.iinfo(np.int64).max)
        )
        return keep, ts, new_dur
    if mode == "prepend":
        end = ts + validity
        keep = ~is_a | (end > cut)
        new_ts = np.where(is_a, np.maximum(ts, cut), ts)
        return keep, new_ts, end - new_ts
    raise ValueError(f"unknown splice mode {mode!r}")


def merge_ordered_seqs(a: Arrays, b: Arrays) -> Arrays:
    """Stable two-way merge of two ts-ordered entry sequences — reference
    ``TimeSeriesMerger.mergeOrderedSeqs`` (TimeSeriesMerger.scala:136-152):
    ties keep the left sequence's element first (``o.lteq``). No fitting or
    compression — this is the raw ordered interleave the reference feeds into
    ``mergeEntries``. (The reference's ZIO ``StreamMerger`` variant is dead,
    commented-out code and is intentionally not ported.)"""
    ts = np.concatenate([a[0], b[0]])
    val = np.concatenate([a[1], b[1]])
    dur = np.concatenate([a[2], b[2]])
    # stable sort with a's rows first in input order == reference tie behavior
    order = np.argsort(ts, kind="stable")
    return ts[order], val[order], dur[order]
