"""Near-dup cluster resolution (connected components + fuzzy keep-one) and
the bucket-size caps that bound the LSH pair generators at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_aggregation_geoclustering_spark.extras import dedup, similarity


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_connected_components_basic(spark):
    # two chains and one singleton edge: {1,2,3,4}, {10,11}, {20,21}
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)])
    got = {r["doc_id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_chain_diameter(spark):
    # a long path graph exercises multi-round propagation (diameter 9)
    pairs = _pairs(spark, [(i, i + 1) for i in range(9, 0, -1)])
    got = {r["doc_id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, 11)}


def test_connected_components_empty(spark):
    pairs = _pairs(spark, [])
    assert dedup.connected_components(pairs).count() == 0


def test_fuzzy_keep_one(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters {1,2,3} and {5,6}; 4 and 7 untouched singletons
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_fuzzy_keep_one(df, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5, 7]


def test_simhash_pairs_bucket_cap(spark):
    # 4 identical docs -> identical fingerprints -> one 4-member bucket per
    # chunk; cap=3 drops every bucket, cap=1000 keeps all 6 pairs
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(4)], "doc_id long, text string"
    )
    full = dedup.simhash_near_pairs(df, "text", "doc_id", max_bucket_size=1000)
    assert full.count() == 6
    capped = dedup.simhash_near_pairs(df, "text", "doc_id", max_bucket_size=3)
    assert capped.count() == 0


def test_rp_band_pairs_bucket_cap(spark):
    vec = [1.0, 0.5, -0.25, 2.0]
    df = spark.createDataFrame(
        [(i, vec) for i in range(5)], "vec_id long, embedding array<double>"
    )
    full = similarity.rp_band_near_pairs(
        df, "vec_id", "embedding", threshold=0.9, n_planes=16, bands=4,
        max_bucket_size=1000,
    )
    assert full.count() == 10  # all 5 identical vectors pair up
    capped = similarity.rp_band_near_pairs(
        df, "vec_id", "embedding", threshold=0.9, n_planes=16, bands=4,
        max_bucket_size=4,
    )
    assert capped.count() == 0


def test_rp_band_wide_defaults_match_narrow_semantics(spark):
    # the >64-plane path (per-band keys straight from the UDF) still finds
    # exact duplicates — every band agrees for identical vectors
    vec = [0.1 * i for i in range(8)]
    df = spark.createDataFrame(
        [(1, vec), (2, vec), (3, [float(7 - i) for i in range(8)])],
        "vec_id long, embedding array<double>",
    )
    pairs = similarity.rp_band_near_pairs(df, "vec_id", "embedding", threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_cell_expr_out_of_range_raises(spark):
    from elasticsearch_aggregation_geoclustering_spark.geo.geohash_expr import cell_expr

    bad = spark.createDataFrame([(181.0, 0.0)], "lon double, lat double")
    with pytest.raises(Exception, match="out of range"):
        bad.select(cell_expr(F.col("lon"), F.col("lat"), 9)).collect()
    # NULL coordinates propagate (absent, not invalid)
    nul = spark.createDataFrame([(None, 10.0)], "lon double, lat double")
    assert nul.select(cell_expr(F.col("lon"), F.col("lat"), 9).alias("c")).collect()[0]["c"] is None


def test_dropped_bucket_stats_observability(spark):
    # the cap's truncation is observable: dropped_bucket_stats reports the
    # exact buckets (and sizes) a given cap would drop
    from pyspark.sql import functions as F

    rows = [(i, "bucket_a" if i < 8 else "bucket_b") for i in range(10)]
    buckets = spark.createDataFrame(rows, "doc_id long, band_key string")
    dropped = dedup.dropped_bucket_stats(buckets, ["band_key"], 5).collect()
    assert [(r["band_key"], r["n"]) for r in dropped] == [("bucket_a", 8)]
    assert dedup.dropped_bucket_stats(buckets, ["band_key"], 100).count() == 0
