"""Pure-numpy reference implementation of geo_point_clustering.

This is the executable spec (SURVEY.md §7 M0): it reproduces the plugin's
whole pipeline — cell bucketing (GeoPointClusteringAggregator.java:106-154),
per-cell centroid (the running mean :140-143 combined with the reduce-time
doc-count-weighted combine, BucketReducer.java:41-46, which together equal the
plain per-cell mean), truncate-by-key (InternalGeoPointClustering.java:295-314,
largest geohash keys kept, result ordered key-descending) and the greedy merge
(shared code in operators.merge) — without Spark.  The Spark operator is
tested for equality against this oracle on randomized inputs, replacing the
upstream randomized InternalGeoPointClusteringTests absent from the checkout.
"""

from __future__ import annotations

import numpy as np

from ..geo.geohash import long_encode
from ..geo.planner import ClusteringPlan, plan_clustering
from .merge import Cluster, merge_clusters


def cluster_points_oracle(
    lons: np.ndarray,
    lats: np.ndarray,
    zoom: int,
    merge_fn=merge_clusters,
    **params,
) -> list[Cluster]:
    """Cluster raw points exactly like the reference aggregation.

    Returns clusters in the reference's output order (visit order over the
    key-descending candidate array).
    """
    plan: ClusteringPlan = plan_clustering(zoom, **params)
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if lons.size == 0:
        return []

    cells = long_encode(lons, lats, plan.precision)

    # per-cell doc_count + centroid (mean of member points)
    order = np.argsort(cells, kind="stable")
    sorted_cells = cells[order]
    uniq, start = np.unique(sorted_cells, return_index=True)
    counts = np.diff(np.append(start, sorted_cells.size))
    sum_lat = np.add.reduceat(lats[order], start)
    sum_lon = np.add.reduceat(lons[order], start)

    # truncate-by-key: keep min(size, n) LARGEST keys, order key-descending
    keep = min(plan.size, uniq.size)
    desc = np.argsort(uniq)[::-1][:keep]

    candidates = [
        Cluster(
            cell=int(uniq[i]),
            lat=float(sum_lat[i] / counts[i]),
            lon=float(sum_lon[i] / counts[i]),
            doc_count=int(counts[i]),
        )
        for i in desc
    ]
    return merge_fn(candidates, plan.radius_m, plan.ratio)
