"""Bit-exact centroid parity vs the reference YAML goldens.

``20_geo_clustering.yml`` asserts FULL rendered centroid doubles on a
3-shard index.  The es_association mode reproduces the reference's exact
association arithmetic: Lucene doc_values grid quantization → per-shard
running mean in docID order → shard-ordered weighted combine → greedy
merge.  Shard routing comes from the reimplemented ES murmur3 id routing
(geo/es_routing.py).  Assertions here are EXACT float equality — no
tolerance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_aggregation_geoclustering_spark.geo.es_routing import (
    default_routing_num_shards,
    es_shard_id,
    murmur3_x86_32,
)
from elasticsearch_aggregation_geoclustering_spark.operators.clustering import (
    geo_point_clustering,
)
from elasticsearch_aggregation_geoclustering_spark.testing import PARIS_POINTS

# goldens from the reference's own rest test (20_geo_clustering.yml)
GOLD_Z1 = (15, 48.8468417795375, 2.331401154398918)
GOLD_Z9 = [
    (9, 48.83695897646248, 2.380013056099415),
    (6, 48.86166598415002, 2.258483301848173),
]
NUM_SHARDS = 3  # the YAML index setting


def test_murmur3_reference_vectors():
    # public murmur3_x86_32 test vectors (seed 0)
    assert murmur3_x86_32(b"") == 0
    assert murmur3_x86_32(b"hello") == 0x248BFA47
    assert murmur3_x86_32(b"Hello, world!") == 0xC0363E43


def test_default_routing_num_shards():
    assert default_routing_num_shards(1) == 1024
    assert default_routing_num_shards(3) == 768
    assert default_routing_num_shards(5) == 640
    assert default_routing_num_shards(1024) == 1024
    assert default_routing_num_shards(2000) == 2000


def test_routing_table_matches_es():
    # pinned from reproducing the YAML goldens: any drift here breaks the
    # exact-double assertions below, so keep it visible
    table = {}
    for i in range(1, 16):
        table.setdefault(es_shard_id(str(i), NUM_SHARDS), []).append(i)
    assert {s: table[s] for s in sorted(table)} == {
        0: [5, 7, 13],
        1: [2, 3, 4, 10, 12, 14, 15],
        2: [1, 6, 8, 9, 11],
    }


@pytest.fixture(scope="module")
def paris_sharded(spark):
    rows = [
        (doc_id, lon, lat, es_shard_id(str(doc_id), NUM_SHARDS))
        for doc_id, lon, lat in PARIS_POINTS
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lon double, lat double, shard int"
    ).repartition(4)


def test_zoom1_exact_double(spark, paris_sharded):
    res = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=1,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    assert len(res.clusters) == 1
    c = res.clusters[0]
    assert (c.doc_count, c.lat, c.lon) == GOLD_Z1


def test_zoom9_exact_doubles(spark, paris_sharded):
    res = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=9,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    got = sorted(
        ((c.doc_count, c.lat, c.lon) for c in res.clusters), reverse=True
    )
    assert got == sorted(GOLD_Z9, reverse=True)


def test_es_association_validates_args(spark, paris_sharded):
    with pytest.raises(ValueError, match="shard_col"):
        geo_point_clustering(paris_sharded, "lon", "lat", zoom=9, es_association=True)
    with pytest.raises(ValueError, match="composes"):
        geo_point_clustering(
            paris_sharded, "lon", "lat", zoom=9,
            es_association=True, shard_col="shard", order_col="doc_id",
            quantize_wire=True,
        )


def test_single_shard_matches_exact_mode_counts(spark, paris_sharded):
    # association order changes only fp association, never membership
    es = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=9,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    exact = geo_point_clustering(paris_sharded, "lon", "lat", zoom=9)
    assert sorted(c.doc_count for c in es.clusters) == sorted(
        c.doc_count for c in exact.clusters
    )
    for a, b in zip(
        sorted(es.clusters, key=lambda c: c.doc_count),
        sorted(exact.clusters, key=lambda c: c.doc_count),
    ):
        assert a.lat == pytest.approx(b.lat, abs=1e-6)
        assert a.lon == pytest.approx(b.lon, abs=1e-6)


def test_zoom11_bucket_structure(spark, paris_sharded):
    # the YAML zoom-11 scenario asserts 9 buckets with the top-by-key bucket
    # counts 1 and 2 (no exact centroids); es_association reproduces the
    # bucket structure too
    res = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=11,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    assert len(res.clusters) == 9
    by_key_desc = sorted(res.clusters, key=lambda c: c.cell, reverse=True)
    assert by_key_desc[0].doc_count == 1
    assert by_key_desc[1].doc_count == 2
    assert sum(c.doc_count for c in res.clusters) == 15


def test_zoom25_and_zoom0_structure(spark, paris_sharded):
    r25 = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=25,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    assert len(r25.clusters) == 15  # max precision: every point its own bucket
    r0 = geo_point_clustering(
        paris_sharded, "lon", "lat", zoom=0,
        es_association=True, shard_col="shard", order_col="doc_id",
    )
    assert len(r0.clusters) == 1 and r0.clusters[0].doc_count == 15
