"""P10 shard_size parity mode (GeoPointClusteringAggregator.java:206-244).

In the reference, each shard truncates its cell buckets to the shard_size
LARGEST geohash keys before shipping partials to the coordinator — so with
multiple shards and more cells per shard than shard_size, small-key cells are
silently dropped even though a single-shard (or exact) run would keep them.
Exact mode (the default) truncates once, globally, and is strictly more
accurate; parity mode reproduces the ES output.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_aggregation_geoclustering_spark.geo.geohash import long_encode
from elasticsearch_aggregation_geoclustering_spark.operators.clustering import (
    geo_cell_aggregate,
)

ZOOM = 9  # precision 5


def _grid_points(n_lon: int, n_lat: int, lon0: float, lat0: float, step: float):
    """n_lon × n_lat points, one per distinct precision-5 cell."""
    pts = []
    for i in range(n_lon):
        for j in range(n_lat):
            pts.append((lon0 + i * step, lat0 + j * step))
    return pts


@pytest.fixture(scope="module")
def sharded(spark):
    # shard 0: 30 distinct cells far apart; shards 1/2: 5 cells each.
    # step 0.1° >> precision-5 cell (~4.9 km) => all cells distinct.
    rows = []
    for k, (lon, lat) in enumerate(_grid_points(6, 5, 10.0, 40.0, 0.1)):
        rows.append((0, lon, lat))
    for k, (lon, lat) in enumerate(_grid_points(5, 1, -30.0, -20.0, 0.1)):
        rows.append((1, lon, lat))
    for k, (lon, lat) in enumerate(_grid_points(5, 1, 60.0, 10.0, 0.1)):
        rows.append((2, lon, lat))
    return spark.createDataFrame(rows, "shard long, lon double, lat double")


def _cells(df):
    return {r["cell"] for r in df.collect()}


def test_parity_truncates_per_shard_exact_does_not(sharded):
    # NB: the planner clamps shard_size = max(shard_size, size) like ES, so
    # size must not exceed the wanted shard_size here
    shard_size = 10
    exact = geo_cell_aggregate(sharded, zoom=ZOOM, size=shard_size)
    parity = geo_cell_aggregate(
        sharded,
        zoom=ZOOM,
        shard_parity=True,
        shard_col="shard",
        size=shard_size,
        shard_size=shard_size,
    )
    exact_cells, parity_cells = _cells(exact), _cells(parity)
    # exact keeps all 40 cells; parity keeps 10 + 5 + 5
    assert len(exact_cells) == 40
    assert len(parity_cells) == 20
    assert parity_cells < exact_cells

    # the dropped cells are exactly shard 0's smallest 20 keys (ES drops the
    # tail of the key-descending per-shard queue)
    pts0 = [(r["lon"], r["lat"]) for r in sharded.where("shard = 0").collect()]
    lons = np.array([p[0] for p in pts0])
    lats = np.array([p[1] for p in pts0])
    keys0 = sorted(int(c) for c in long_encode(lons, lats, 5))
    expected_dropped = set(keys0[: len(keys0) - shard_size])
    assert exact_cells - parity_cells == expected_dropped


def test_parity_equals_exact_when_under_shard_size(sharded):
    big = geo_cell_aggregate(
        sharded, zoom=ZOOM, shard_parity=True, shard_col="shard", size=100
    )
    exact = geo_cell_aggregate(sharded, zoom=ZOOM, size=100)
    rows_p = {
        (r["cell"], r["doc_count"], round(r["centroid_lat"], 9), round(r["centroid_lon"], 9))
        for r in big.collect()
    }
    rows_e = {
        (r["cell"], r["doc_count"], round(r["centroid_lat"], 9), round(r["centroid_lon"], 9))
        for r in exact.collect()
    }
    assert rows_p == rows_e


def test_parity_counts_survive_combine(sharded):
    # duplicate every shard-1 point 3×: per-cell counts must combine across
    # the shard partials (weighted centroid, summed doc_count)
    dup = sharded.union(sharded.where("shard = 1")).union(sharded.where("shard = 1"))
    parity = geo_cell_aggregate(
        dup, zoom=ZOOM, shard_parity=True, shard_col="shard", size=100
    )
    counts = {r["cell"]: r["doc_count"] for r in parity.collect()}
    assert sum(1 for v in counts.values() if v == 3) == 5
    assert sum(1 for v in counts.values() if v == 1) == 35
