"""Controlled vocabularies for Darwin Core terms.

Parity target: reference ``dwc_validator/vocab.py:6-181`` — two in-memory
sets used for case-insensitive membership checks
(``validate.py:286-293``).  The geodetic-datum set is the 9 named datums
plus five contiguous EPSG UTM/AMG code ranges; we generate those ranges
instead of listing 152 literals.

At this size the right Spark realization is a literal ``Column.isin``
list (Catalyst folds it to a hash-set via ``OptimizeIn``).  If a
vocabulary ever grows past a few thousand entries, switch to a broadcast
dimension table + left-semi join (see ``operators/validate.py``).
"""

from __future__ import annotations

# Darwin Core "basisOfRecord" controlled vocabulary
# (reference vocab.py:6-15)
basis_of_record_vocabulary: frozenset[str] = frozenset({
    "PreservedSpecimen",
    "FossilSpecimen",
    "LivingSpecimen",
    "HumanObservation",
    "MachineObservation",
    "Observation",
    "MaterialSample",
    "Occurrence",
})

_NAMED_DATUMS = (
    "WGS84", "NAD83", "ETRS89", "ITRF", "GDA94",
    "ED50", "NAD27", "AGD66", "AGD84",
)

# EPSG code ranges present in the reference set (vocab.py:19-181):
# AGD66/AGD84 AMG zones and WGS84 UTM zones.
_EPSG_RANGES = (
    (20248, 20258),  # AGD66 / AMG zones 48-58
    (20348, 20358),  # AGD84 / AMG zones 48-58
    (28348, 28357),  # GDA94 / MGA zones 48-57
    (32601, 32660),  # WGS84 / UTM North 1-60
    (32701, 32760),  # WGS84 / UTM South 1-60
)

# Darwin Core "geodeticDatum" vocabulary (reference vocab.py:19-181)
geodetic_datum_vocabulary: frozenset[str] = frozenset(_NAMED_DATUMS) | frozenset(
    f"EPSG:{code}"
    for lo, hi in _EPSG_RANGES
    for code in range(lo, hi + 1)
)


def lowered(vocab: frozenset[str]) -> list[str]:
    """Lower-cased, sorted vocabulary for case-insensitive isin() matching
    (reference validate.py:286 lowers both sides)."""
    return sorted(v.lower() for v in vocab)
