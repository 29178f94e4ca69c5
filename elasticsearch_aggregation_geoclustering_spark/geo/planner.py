"""Plan-time parameter derivation for geo_point_clustering.

Reproduces the coordinator-side constant folding the reference does once per
request (GeoPointClusteringAggregationBuilder.java:198-253):

* parameter validation and defaults (zoom=1, extent=256, radius=40 px,
  ratio=0, size=10000 — GeoPointClusteringAggregationBuilder.java:40-44,
  GeoPointClusteringParams.java:18-23),
* the shard over-fetch heuristic ``shard_size ≈ size·1.5 + 10`` clamped to
  ``>= size`` (GeoPointClusteringAggregationBuilder.java:205-223) — only used
  in parity mode, since the Spark engine truncates once, globally,
* pixel radius -> ground meters: ``radius_m = radius_px · EARTH_EQUATOR /
  (extent · 2^zoom)`` (GeoPointClusteringAggregationBuilder.java:225-232),
* meters -> geohash precision (GeoUtils.geoHashLevelsForPrecision):
  reconstructed from public geohash cell-dimension math and pinned by the
  reference goldens — zoom 9 must give precision 5 (the 5-char cells in
  README.md:117-141), zoom 11 precision 6, zoom 25 precision 12.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .distance import EARTH_EQUATOR, EARTH_POLAR_DISTANCE
from .geohash import MAX_PRECISION

DEFAULT_ZOOM = 1
DEFAULT_EXTENT = 256
DEFAULT_MAX_NUM_CELLS = 10_000
DEFAULT_RADIUS = 40
DEFAULT_RATIO = 0.0


def geohash_levels_for_precision(meters: float) -> int:
    """Smallest geohash level whose cell (by diagonal estimate) fits ``meters``.

    Matches ES GeoUtils.geoHashLevelsForPrecision behavior on all observable
    pins: the diagonal/width ratio is approximated by
    ``1 + EARTH_POLAR_DISTANCE / EARTH_EQUATOR``; the required longitude bit
    count is ``floor(log2(ceil(EARTH_EQUATOR / width)))``; a geohash level
    ``l`` provides ``ceil(5l/2)`` longitude bits, so the level is
    ``ceil(2·bits/5)``, clamped to [1, 12].
    """
    if meters < 0:
        raise ValueError(f"precision meters must be >= 0: {meters}")
    if meters == 0:
        return MAX_PRECISION
    ratio = 1.0 + (EARTH_POLAR_DISTANCE / EARTH_EQUATOR)
    width = meters / ratio
    part = math.ceil(EARTH_EQUATOR / width)
    bits = part.bit_length() - 1  # floor(log2)
    level = -(-2 * bits // 5)  # ceil(2*bits/5)
    return max(1, min(MAX_PRECISION, level))


def suggest_shard_side_queue_size(size: int) -> int:
    """ES BucketUtils.suggestShardSideQueueSize: size·1.5 + 10."""
    if size < 1:
        raise ValueError("size must be positive")
    return int(size * 1.5 + 10)


@dataclass(frozen=True)
class ClusteringPlan:
    """Folded constants for one clustering request (the 'logical plan')."""

    zoom: int
    extent: int
    radius_px: float
    ratio: float
    size: int
    shard_size: int
    radius_m: float
    precision: int


def plan_clustering(
    zoom: int = DEFAULT_ZOOM,
    *,
    extent: int = DEFAULT_EXTENT,
    radius: float = DEFAULT_RADIUS,
    ratio: float = DEFAULT_RATIO,
    size: int = DEFAULT_MAX_NUM_CELLS,
    shard_size: int | None = None,
) -> ClusteringPlan:
    """Validate params and fold the plan-time constants.

    Validation mirrors GeoPointClusteringAggregationBuilder.java:123-184 and
    GeoPointClusteringParams.checkZoom (zoom in [0, 25]).
    """
    if not 0 <= zoom <= 25:
        raise ValueError(f"[zoom] must be in [0, 25]. Found [{zoom}]")
    if extent <= 0:
        raise ValueError(f"[extent] must be greater than 0. Found [{extent}]")
    if radius <= 0:
        raise ValueError(f"[radius] must be greater than 0. Found [{radius}]")
    if ratio > 2:
        raise ValueError(f"[ratio] must be lower or equal than 2. Found [{ratio}]")
    if size <= 0:
        raise ValueError(f"[size] must be greater than 0. Found [{size}]")
    if shard_size is not None and shard_size <= 0:
        raise ValueError(f"[shard_size] must be greater than 0. Found [{shard_size}]")

    if shard_size is None:
        shard_size = suggest_shard_side_queue_size(size)
    shard_size = max(shard_size, size)

    map_width_height = extent * math.pow(2.0, zoom)
    ground_resolution = EARTH_EQUATOR / map_width_height  # meters per pixel
    radius_m = radius * ground_resolution
    precision = geohash_levels_for_precision(radius_m)

    return ClusteringPlan(
        zoom=zoom,
        extent=extent,
        radius_px=radius,
        ratio=ratio,
        size=size,
        shard_size=shard_size,
        radius_m=radius_m,
        precision=precision,
    )
