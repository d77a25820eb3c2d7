"""Entity/label catalog — the reference's ``entity`` package re-expressed for a
columnar engine (reference ``entity/TimeSeriesEntityId.scala``, ``TsId.scala:10``,
``TsLabel.scala:8``, ``LabelUnitMapper.scala:10-17``).

The reference keys a series by ``TsId(entityId, label)``; this engine keys every
row by the single ``source`` column. The bridge is a canonical, order-preserving
string codec ``<entity>:<label>`` plus vectorized attach/split helpers, so any
(entity, label)-keyed dataset flows through every operator unchanged and can be
re-split at the edges. Unit derivation mirrors ``LabelUnitMapper.deriveUnit``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

SEP = ":"  # entity/label separator in the engine's source encoding


@dataclass(frozen=True)
class TsLabel:
    """A signal kind, e.g. "power output" (``TsLabel.scala:8``)."""

    value: str

    def unit(self, unit_mapper: "LabelUnitMapper") -> str | None:
        return unit_mapper.derive_unit(self)


@dataclass(frozen=True)
class TimeSeriesEntityId:
    """An entity that time series attach to (``TimeSeriesEntityId.scala``).
    The identifying representation is left to the user; ``key`` must be stable
    and must not contain the ``:`` separator."""

    key: str

    def __post_init__(self):
        if SEP in self.key:
            raise ValueError(f"entity key must not contain {SEP!r}: {self.key!r}")

    def build_ts_id(self, signal: TsLabel) -> "TsId":
        return TsId(self, signal)


@dataclass(frozen=True)
class TsId:
    """Fully identifies one series: (entity, signal) (``TsId.scala:10``)."""

    entity_id: TimeSeriesEntityId
    label: TsLabel

    @property
    def source(self) -> str:
        """Canonical engine key for the ``source`` column."""
        return f"{self.entity_id.key}{SEP}{self.label.value}"

    @classmethod
    def from_source(cls, source: str) -> "TsId":
        ent, _, lab = source.partition(SEP)
        return cls(TimeSeriesEntityId(ent), TsLabel(lab))


class LabelUnitMapper:
    """Label -> optional unit (``LabelUnitMapper.scala:10-17``). Subclass or use
    the provided static / suffix implementations."""

    def derive_unit(self, label: TsLabel) -> str | None:
        raise NotImplementedError


class StaticUnitMapper(LabelUnitMapper):
    """Fixed label->unit dictionary."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def derive_unit(self, label: TsLabel) -> str | None:
        return self.mapping.get(label.value)


class SuffixUnitMapper(LabelUnitMapper):
    """Derives the unit from a label suffix after the last '_', against an
    allow-list of known units (e.g. "engine_power_kW" -> "kW")."""

    def __init__(self, known_units: set[str]):
        self.known = set(known_units)

    def derive_unit(self, label: TsLabel) -> str | None:
        suffix = label.value.rsplit("_", 1)[-1]
        return suffix if suffix in self.known else None


# ------------------------------------------------------------- columnar bridge


def attach_source(t: pa.Table, entity_col: str = "entity", label_col: str = "label") -> pa.Table:
    """(entity, label) columns -> canonical ``source`` key column (vectorized).

    Enforces the separator-free entity invariant (mirrors
    ``TimeSeriesEntityId.__post_init__``): an entity containing ``SEP`` would
    round-trip through ``split_source`` as a different (entity, label) pair."""
    bad = pc.match_substring(pc.cast(t.column(entity_col), pa.string()), SEP)
    if pc.any(bad).as_py():
        offender = pc.filter(t.column(entity_col), bad)[0].as_py()
        raise ValueError(f"entity key must not contain {SEP!r}: {offender!r}")
    src = pc.binary_join_element_wise(
        pc.cast(t.column(entity_col), pa.string()),
        pc.cast(t.column(label_col), pa.string()),
        SEP,
    )
    return t.append_column("source", src)


def split_source(t: pa.Table, source_col: str = "source") -> pa.Table:
    """``source`` key column -> (entity, label) columns (vectorized; splits on
    the FIRST separator so labels may contain ':')."""
    src = t.column(source_col)
    ent = pc.replace_substring_regex(src, f"{SEP}.*$", "")
    lab = pc.replace_substring_regex(src, f"^[^{SEP}]*{SEP}", "")
    return t.append_column("entity", ent).append_column("label", lab)
