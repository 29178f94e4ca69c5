"""ES Geohash.longEncode as a pure JVM column expression (no Python workers).

Same bit algorithm as geo/geohash.py's numpy version (Lucene axis
quantization → sign-flip → morton interleave → keep top 5·level bits → pack
level low), expressed with Spark's long bit ops so the clustering hot path
stays inside whole-stage codegen — the Arrow UDF round-trip disappears
entirely from geo_cell_aggregate's plan.

Valid for precision 1..11: at level 12 the packed key uses bit 63 and the
signed-long shifts would need extra care, so that (rare, max-zoom) case
stays on the Arrow/numpy path.  Out-of-range coordinates produce undefined
keys here (the numpy path raises); callers own range-filtering, which the
reference's mapper enforces at index time anyway.

Java's long shifts/or/and/xor are bit-identical to the numpy uint64 ops for
these masked values — pinned against the numpy implementation on edge and
random coordinates by tests/test_geohash.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .geohash import LATITUDE_DECODE, LONGITUDE_DECODE

_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

#: the +edge coordinate steps down one ulp before quantization
_LAT_MAX = float(np.nextafter(90.0, -np.inf))
_LON_MAX = float(np.nextafter(180.0, -np.inf))


def _encode_axis_expr(deg: Column, decode_step: float, edge_max: float) -> Column:
    """Lucene encodeLatitude/encodeLongitude, sign-flipped to unsigned order."""
    clamped = F.least(deg.cast("double"), F.lit(edge_max))
    q = F.floor(clamped / F.lit(decode_step))
    return q.bitwiseXOR(F.lit(0x80000000)).bitwiseAND(F.lit(0xFFFFFFFF))


def _spread_bits_expr(x: Column) -> Column:
    """Spread the low 32 bits to even bit positions (5-step magic masks)."""
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def cell_expr(lon: Column, lat: Column, precision: int, *, validate: bool = True) -> Column:
    """``Geohash.longEncode(lon, lat, precision)`` as a codegen-able Column.

    Bit-identical to geo.geohash.long_encode for precision 1..11.

    With ``validate`` (default) an out-of-range or NaN coordinate raises at
    execution time instead of silently producing an undefined cell key — the
    same failure mode as the Arrow/numpy path at precision 12, and the loud
    analog of the range check ES's geo_point mapper applies at index time.
    A NULL coordinate yields a NULL key (an absent value, not an invalid
    one — the reference skips docs with no value, and the raw expression
    would otherwise silently encode NULL as the +edge cell because Spark's
    ``least`` SKIPS nulls).  The guard is a codegen'd CASE branch — set
    ``validate=False`` only when the input is already range-checked and
    null-free upstream and the branch shows up in a profile; the unvalidated
    expression maps NULL to the +edge cell and out-of-range to undefined
    keys.
    """
    if not 1 <= precision <= 11:
        raise ValueError(f"cell_expr supports precision 1..11: {precision}")
    lon_d, lat_d = lon.cast("double"), lat.cast("double")
    lat_e = _encode_axis_expr(lat_d, LATITUDE_DECODE, _LAT_MAX)
    lon_e = _encode_axis_expr(lon_d, LONGITUDE_DECODE, _LON_MAX)
    # morton: lat on even bits, lon on odd — lon<<1 may set bit 63 (negative
    # long, correct bit pattern); the unsigned shift right restores a
    # non-negative key for precision <= 11 (shift >= 9)
    morton = _spread_bits_expr(lat_e).bitwiseOR(
        F.shiftleft(_spread_bits_expr(lon_e), 1)
    )
    shift = 4 + 5 * (12 - precision)
    key = F.shiftleft(F.shiftrightunsigned(morton, shift), 4).bitwiseOR(
        F.lit(precision)
    ).cast("long")
    if not validate:
        return key
    # the validator rides OUTSIDE the heavy key expression as an additive
    # term: `key + CASE(...)`.  Putting `key` inside a CASE branch would
    # disable codegen common-subexpression elimination (conditional branches
    # are evaluated lazily, so the ~32 textual copies of FLOOR(least(...))
    # in the spread-bits expansion each re-evaluate per row — measured 4x
    # slower).  Here key stays unconditional (CSE collapses the copies),
    # while NULL coords null-propagate through the addition, and the raise
    # fires when the validator term is evaluated on a bad row.
    return key + _validator_expr(lon_d, lat_d)


def _validator_expr(lon_d: Column, lat_d: Column) -> Column:
    """Additive coordinate guard: NULL when absent, raises when out of
    range/NaN, else 0 — add it to a key expression to validate without
    nesting the key inside a CASE branch."""
    absent = lon_d.isNull() | lat_d.isNull()
    bad = (
        (lon_d < F.lit(-180.0)) | (lon_d > F.lit(180.0))
        | (lat_d < F.lit(-90.0)) | (lat_d > F.lit(90.0))
        | F.isnan(lon_d) | F.isnan(lat_d)
    )
    err = F.raise_error(
        F.concat(
            F.lit("geo coordinate out of range: lon="),
            lon_d.cast("string"),
            F.lit(" lat="),
            lat_d.cast("string"),
        )
    )
    return (
        F.when(absent, F.lit(None).cast("long"))
        .when(bad, err.cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )


def with_cell_column(
    df,
    lon_col: str,
    lat_col: str,
    precision: int,
    out_col: str = "cell",
    *,
    validate: bool = True,
):
    """``cell_expr`` as STAGED projections: same bits, linear-size codegen.

    The single-Column form textually expands the 5 spread steps 2^5-fold
    (each step references its input twice); runtime CSE collapses the
    evaluations, but janino still has to compile the expanded source —
    ~2 s of one-time latency per distinct precision.  Staging each spread
    step as its own projection keeps the generated source linear (fast
    compile, identical fused eval): Catalyst's CollapseProject leaves the
    chain alone because merging would duplicate non-cheap expressions, and
    whole-stage codegen fuses the Projects into one function with local
    variables anyway.
    """
    if not 1 <= precision <= 11:
        raise ValueError(f"with_cell_column supports precision 1..11: {precision}")
    lon_d, lat_d = F.col(lon_col).cast("double"), F.col(lat_col).cast("double")
    tlat, tlon = f"_gh_{out_col}_lat", f"_gh_{out_col}_lon"
    df = df.withColumns(
        {
            tlat: _encode_axis_expr(lat_d, LATITUDE_DECODE, _LAT_MAX),
            tlon: _encode_axis_expr(lon_d, LONGITUDE_DECODE, _LON_MAX),
        }
    )
    for shift, mask in _SPREAD_STEPS:
        df = df.withColumns(
            {
                c: F.col(c).bitwiseOR(F.shiftleft(F.col(c), shift)).bitwiseAND(F.lit(mask))
                for c in (tlat, tlon)
            }
        )
    morton = F.col(tlat).bitwiseOR(F.shiftleft(F.col(tlon), 1))
    kshift = 4 + 5 * (12 - precision)
    key = (
        F.shiftleft(F.shiftrightunsigned(morton, kshift), 4)
        .bitwiseOR(F.lit(precision))
        .cast("long")
    )
    if validate:
        key = key + _validator_expr(lon_d, lat_d)
    return df.withColumn(out_col, key).drop(tlat, tlon)
