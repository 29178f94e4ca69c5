"""Randomized partial/final-reduce equivalence (SURVEY.md §5.3).

Replaces the upstream randomized InternalGeoPointClusteringTests absent from
the checkout: random point sets must cluster identically regardless of how
they are partitioned (the Spark analog of the reference's deliberate 3-shard
test index, 20_geo_clustering.yml:13), and the distributed result must match
the pure-numpy oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_aggregation_geoclustering_spark.operators.clustering import (
    geo_point_clustering,
)
from elasticsearch_aggregation_geoclustering_spark.operators.oracle import (
    cluster_points_oracle,
)
from elasticsearch_aggregation_geoclustering_spark.testing import random_points


def _make_df(spark, lons, lats, n_partitions):
    rows = [(int(i), float(lons[i]), float(lats[i])) for i in range(len(lons))]
    return spark.createDataFrame(
        rows, "doc_id long, lon double, lat double"
    ).repartition(n_partitions, "doc_id")


def _signature(clusters):
    return [
        (c.cell, c.doc_count, round(c.lat, 9), round(c.lon, 9), tuple(sorted(c.cells)))
        for c in clusters
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("zoom", [3, 7])
def test_partition_invariance_and_oracle_match(spark, seed, zoom):
    lons, lats = random_points(seed, n=1000)
    oracle = cluster_points_oracle(lons, lats, zoom, ratio=0.8)

    one = geo_point_clustering(_make_df(spark, lons, lats, 1), zoom=zoom, ratio=0.8)
    eight = geo_point_clustering(_make_df(spark, lons, lats, 8), zoom=zoom, ratio=0.8)

    assert _signature(one.clusters) == _signature(eight.clusters)
    assert _signature(one.clusters) == _signature(oracle)


@pytest.mark.parametrize("seed", [3, 4])
def test_size_truncation_matches_oracle(spark, seed):
    lons, lats = random_points(seed, n=500)
    oracle = cluster_points_oracle(lons, lats, 6, size=20)
    result = geo_point_clustering(_make_df(spark, lons, lats, 8), zoom=6, size=20)
    assert _signature(result.clusters) == _signature(oracle)
    # truncation keeps the LARGEST keys (P13) — every kept candidate key
    # must exceed every dropped one; cluster count ≤ size
    assert len(result.clusters) <= 20
