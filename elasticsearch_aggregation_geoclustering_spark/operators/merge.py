"""Greedy distance-based cluster merge (the reduce-time heart of the plugin).

Reimplements InternalGeoPointClustering.mergeBuckets/computeDistance
(InternalGeoPointClustering.java:225-248, 366-415):

* candidates are visited in geohash-key-DESCENDING order (the reference pops
  a key-ordered priority queue into a descending array,
  InternalGeoPointClustering.java:311-315, comparator :448-459),
* the first unvisited bucket absorbs every later unvisited bucket whose
  centroid lies within ``radius_m · cos(radians(mean lat))``
  (:380-387); merged centroid is the doc-count-weighted mean (:392-399) and
  the absorbed cell keys accumulate into ``geohashes`` (:409),
* a second pass revisits buckets that just missed the radius when
  ``ratio > 0`` and ``distance / fixedRadius < ratio`` (:411-414) — the
  centroid may have moved toward them during the first pass,
* sub-aggregation payloads merge additively (InternalAggregations.reduce for
  the doc-count-style metrics we support, :401-406).

This is inherently sequential and order-dependent, so it deliberately runs on
the driver over at most ``size`` (default 10,000) collected cluster rows —
O(k²) distance checks, exactly the complexity envelope the reference accepts.
It is NOT a distributed operator and must not become one without changing
semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..geo.distance import EARTH_MEAN_RADIUS


def _arc_distance(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar haversine in meters (see geo.distance.arc_distance)."""
    x1 = math.radians(lat1)
    x2 = math.radians(lat2)
    h1 = 1.0 - math.cos(x1 - x2)
    h2 = 1.0 - math.cos(math.radians(lon1 - lon2))
    h = h1 + math.cos(x1) * math.cos(x2) * h2
    return EARTH_MEAN_RADIUS * 2.0 * math.asin(min(1.0, math.sqrt(h * 0.5)))


@dataclass
class Cluster:
    """A merged cluster: the Spark-side analog of InternalGeoPointClustering.Bucket."""

    cell: int  # geohash long key of the surviving bucket
    lat: float
    lon: float
    doc_count: int
    cells: list[int] = field(default_factory=list)  # all absorbed geohash keys
    metrics: dict[str, float] = field(default_factory=dict)  # additive sub-aggs
    visited: bool = False

    def __post_init__(self) -> None:
        if not self.cells:
            self.cells = [self.cell]


def merge_clusters(
    candidates: list[Cluster], radius_m: float, ratio: float
) -> list[Cluster]:
    """Run the two-pass greedy merge over key-descending candidates.

    ``candidates`` must already be sorted by ``cell`` descending and truncated
    to ``size`` (the caller does the reference's P13 truncate-by-key).
    Mutates and returns the surviving clusters in visit order.
    """

    def try_merge(bucket: Cluster, other: Cluster, revisit: list[Cluster] | None) -> None:
        # InternalGeoPointClustering.computeDistance(...)
        if other.visited:
            return
        dist = _arc_distance(bucket.lat, bucket.lon, other.lat, other.lon)
        avg_lat = (bucket.lat + other.lat) / 2.0
        fixed_radius = radius_m * math.cos(math.radians(avg_lat))
        if dist <= fixed_radius:
            other.visited = True
            merged = bucket.doc_count + other.doc_count
            bucket.lat = (bucket.lat * bucket.doc_count + other.lat * other.doc_count) / merged
            bucket.lon = (bucket.lon * bucket.doc_count + other.lon * other.doc_count) / merged
            bucket.doc_count = merged
            for key, val in other.metrics.items():
                bucket.metrics[key] = bucket.metrics.get(key, 0) + val
            bucket.cells.append(other.cell)
        elif revisit is not None and ratio > 0 and fixed_radius > 0 and dist / fixed_radius < ratio:
            revisit.append(other)

    final: list[Cluster] = []
    for bucket in candidates:
        if bucket.visited:
            continue
        bucket.visited = True
        revisit: list[Cluster] = []
        for other in candidates:
            try_merge(bucket, other, revisit)
        for other in revisit:
            try_merge(bucket, other, None)
        final.append(bucket)
    return final
