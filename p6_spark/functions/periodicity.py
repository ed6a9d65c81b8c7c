"""Frequency-modifier vocabulary (phenotypic occurrence rates) — the
F13 stub, shipped at reference parity.

Reference (/root/reference/src/P6/periodicity.py:11-51): a
FrequencyModifier enum mirroring HP:0040280-HP:0040285 (the HPO
"Frequency" subclass) with a label normalizer, plus a Periodicity
wrapper dataclass. The reference TESTS this module but never wires it
into the pipeline; this port keeps exactly that status — documented,
unit-tested, unwired (OPERATORS.md F13) — so a reference user migrating
cohort-frequency code finds the same vocabulary here.

Spark-first shape: alongside the driver-side enum, the label mapping is
exposed as a Column expression (``frequency_modifier_col``) built from
``create_map`` literals, so a cohort table can be coded in-plan when a
future pipeline wires it; unknown labels fail loudly in both forms
(ValueError driver-side, raise_error in-plan), matching the reference's
strictness.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum, auto
from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F


class FrequencyModifier(Enum):
    """HP:0040280-HP:0040285 frequency modifiers, most to least frequent
    (plus EXCLUDED)."""

    OBLIGATE = auto()
    VERY_FREQUENT = auto()
    FREQUENT = auto()
    OCCASIONAL = auto()
    VERY_RARE = auto()
    EXCLUDED = auto()

    @classmethod
    def from_label(cls, label: str) -> "FrequencyModifier":
        """Normalize a human label (trim, lowercase, spaces to
        underscores, parentheses stripped) and map it to the enum;
        unknown labels raise ValueError (reference periodicity.py:24-42
        semantics)."""
        key = _normalize(label)
        try:
            return cls[key.upper()]
        except KeyError:
            raise ValueError(f"Unknown frequency modifier label: {label!r}") from None


def _normalize(label: str) -> str:
    return label.strip().lower().replace(" ", "_").replace("(", "").replace(")", "")


@dataclass
class Periodicity:
    """Thin wrapper carrying a FrequencyModifier in data models
    (reference periodicity.py:45-51)."""

    frequency_modifier: FrequencyModifier


def frequency_modifier_col(label: Column) -> Column:
    """In-plan twin of ``FrequencyModifier.from_label``: returns the
    enum NAME for a label column, raising at execution on unknown
    labels. The mapping is a ``create_map`` over literal pairs — pure
    codegen, no Python in the hot path."""
    mapping = {m.name.lower(): m.name for m in FrequencyModifier}
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    key = F.replace(
        F.replace(
            F.replace(F.lower(F.trim(label)), F.lit(" "), F.lit("_")),
            F.lit("("),
            F.lit(""),
        ),
        F.lit(")"),
        F.lit(""),
    )
    hit = m[key]
    return F.when(hit.isNotNull(), hit).otherwise(
        F.raise_error(
            F.concat(F.lit("Unknown frequency modifier label: "), F.coalesce(label, F.lit("NULL")))
        )
    )
