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


def cell_expr(lon: Column, lat: Column, precision: int) -> Column:
    """``Geohash.longEncode(lon, lat, precision)`` as a codegen-able Column.

    Bit-identical to geo.geohash.long_encode for precision 1..11.
    """
    if not 1 <= precision <= 11:
        raise ValueError(f"cell_expr supports precision 1..11: {precision}")
    lat_e = _encode_axis_expr(lat, LATITUDE_DECODE, _LAT_MAX)
    lon_e = _encode_axis_expr(lon, LONGITUDE_DECODE, _LON_MAX)
    # morton: lat on even bits, lon on odd — lon<<1 may set bit 63 (negative
    # long, correct bit pattern); the unsigned shift right restores a
    # non-negative key for precision <= 11 (shift >= 9)
    morton = _spread_bits_expr(lat_e).bitwiseOR(
        F.shiftleft(_spread_bits_expr(lon_e), 1)
    )
    shift = 4 + 5 * (12 - precision)
    return F.shiftleft(F.shiftrightunsigned(morton, shift), 4).bitwiseOR(
        F.lit(precision)
    ).cast("long")
