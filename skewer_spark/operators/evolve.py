"""Schema evolution: reconcile frames written under drifting schemas.

The Iceberg schema-evolution analog (add column / widen type are
metadata-safe changes there) for the snapshot/bucket store in
``plans/checkpoint.py``: a long-lived pipeline re-reads months of
committed buckets whose schemas drifted — columns added, an int32
counter widened to int64, a numeric field that became a double.  A
blind ``unionByName`` fails on the type conflicts and
``mergeSchema`` reads fail on int→double; this operator computes the
widened target schema ONCE (driver-side — schemas are metadata, never
data) and unions casted projections.

Widening lattice (smallest common ancestor, Iceberg's safe-promotion
set plus the string top):

    boolean → string
    tinyint → smallint → int → bigint → double → string
    float → double → string
    date → timestamp[_ntz] → string
    everything else → exact match or string

A column absent from a frame reads as typed NULL (exactly how a
column added by evolution reads for pre-addition Iceberg snapshots).
Complex types (array/map/struct) must match exactly — mixed complex
evolution falls back to the JSON-string carry documented in
CLAUDE.md (properties-as-JSON), by design, and raises here.

Zero data movement beyond the union itself: casts are codegen
projections, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

_CHAIN = [
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "double",
    "string",
]
_RANK = {t: i for i, t in enumerate(_CHAIN)}


def widen_type(a: str, b: str) -> str:
    """Smallest common ancestor of two simple type names."""
    if a == b:
        return a
    fa, fb = _coerce(a), _coerce(b)
    if fa in _RANK and fb in _RANK:
        return _CHAIN[max(_RANK[fa], _RANK[fb])]
    ts = {"date", "timestamp", "timestamp_ntz"}
    if fa in ts and fb in ts:
        # date widens to either timestamp flavor; mixed tz-ness of
        # timestamps is NOT safely mergeable → string
        if "date" in (fa, fb):
            return fb if fa == "date" else fa
        return "string"
    if "string" in (fa, fb) and not (a.startswith(("array", "map", "struct"))
                                     or b.startswith(("array", "map", "struct"))):
        return "string"
    raise ValueError(f"no safe widening for {a!r} vs {b!r}")


def _coerce(t: str) -> str:
    # float joins the numeric chain at double; boolean tops to string
    if t == "float":
        return "double"
    if t == "boolean":
        return "string"
    if t.startswith("decimal"):
        return "double"
    return t


def unified_schema(schemas: list[StructType]) -> list[tuple[str, str]]:
    """Ordered (name, widened simpleString type) union of the input
    schemas — first-seen column order, so the oldest snapshot's layout
    leads and evolved columns append (Iceberg field-order behavior)."""
    out: dict[str, str] = {}
    order: list[str] = []
    for sch in schemas:
        for f in sch.fields:
            t = f.dataType.simpleString()
            if f.name not in out:
                out[f.name] = t
                order.append(f.name)
            else:
                out[f.name] = widen_type(out[f.name], t)
    return [(nm, out[nm]) for nm in order]


def reconcile_frames(frames: list[DataFrame]) -> DataFrame:
    """Union frames under the widened schema; absent columns read as
    typed NULLs.  One narrow projection per frame, then unionByName."""
    if not frames:
        raise ValueError("reconcile_frames needs at least one frame")
    target = unified_schema([f.schema for f in frames])
    casted = []
    for fr in frames:
        have = set(fr.columns)
        casted.append(
            fr.select(
                *[
                    (F.col(nm) if nm in have else F.lit(None))
                    .cast(ty)
                    .alias(nm)
                    for nm, ty in target
                ]
            )
        )
    out = casted[0]
    for fr in casted[1:]:
        out = out.unionByName(fr)
    return out
