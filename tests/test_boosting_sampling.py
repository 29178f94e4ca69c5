"""Unit tests: boosting query demotion, deterministic hash sampling."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_aggregation_geoclustering_spark.extras import sampling


@pytest.fixture(scope="module")
def boost_index(spark, tmp_path_factory):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
    from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

    rows = [
        (1, "apple banana"),
        (2, "apple banana legacy"),   # matches negative -> demoted
        (3, "apple"),
        (4, "legacy junk"),           # negative only -> never selected
    ]
    docs = spark.createDataFrame(rows, "orig_id long, text string")
    d = str(tmp_path_factory.mktemp("boostidx"))
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",))
    return InvertedIndex.open(spark, d)


def test_boosting_demotes_but_never_selects(boost_index):
    idx = boost_index
    base = {r["doc_id"]: r["score"] for r in idx.search(["apple", "banana"], k=10).collect()}
    out = {
        r["doc_id"]: r["score"]
        for r in idx.boosting_search(
            ["apple", "banana"], ["legacy"], k=10, negative_boost=0.25
        ).collect()
    }
    assert set(out) == set(base)  # negative never changes the hit set
    docmap = {r["doc_id"]: r["orig_id"] for r in idx.docmap().collect()}
    for d, s in out.items():
        factor = 0.25 if docmap[d] == 2 else 1.0
        assert s == pytest.approx(base[d] * factor, rel=1e-12)
    with pytest.raises(ValueError):
        idx.boosting_search(["apple"], ["legacy"], negative_boost=1.5)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(20_000).select(F.col("id").alias("k"))
    s10 = sampling.hash_sample(df, "k", 0.10)
    s30 = sampling.hash_sample(df, "k", 0.30)
    n10, n30 = s10.count(), s30.count()
    # binomial(20000, p): 4-sigma bands
    assert abs(n10 - 2000) < 4 * (20_000 * 0.1 * 0.9) ** 0.5
    assert abs(n30 - 6000) < 4 * (20_000 * 0.3 * 0.7) ** 0.5
    # nested: the 10% sample is a strict subset of the 30% sample
    assert s10.exceptAll(s30).count() == 0
    # deterministic across partitionings
    again = sampling.hash_sample(df.repartition(13), "k", 0.10)
    assert s10.exceptAll(again).count() == 0 and again.exceptAll(s10).count() == 0
    # salt decorrelates
    salted = sampling.hash_sample(df, "k", 0.10, salt="x")
    overlap = s10.intersect(salted).count()
    assert abs(overlap - 200) < 4 * (20_000 * 0.01) ** 0.5 + 20
    with pytest.raises(ValueError):
        sampling.hash_sample(df, "k", 1.5)


def test_stratified_hash_sample(spark):
    df = spark.range(9000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("g"),
    )
    out = sampling.stratified_hash_sample(
        df, "k", "g", {"a": 1.0, "b": 0.1}, default_fraction=0.0
    )
    counts = {r["g"]: r["cnt"] for r in out.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    assert counts["a"] == 3000           # keep-all stratum is exact
    assert "c" not in counts             # default 0 drops the stratum
    assert abs(counts["b"] - 300) < 4 * (3000 * 0.1 * 0.9) ** 0.5
    with pytest.raises(ValueError):
        sampling.stratified_hash_sample(df, "k", "g", {"a": 2.0})
