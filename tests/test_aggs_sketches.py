"""Unit tests: ES search aggregations (plans/aggs.py), the HLL cardinality
sketch (extras/sketches.py), and search_after / filter-context on the index.
"""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_aggregation_geoclustering_spark.extras import sketches
from elasticsearch_aggregation_geoclustering_spark.plans import aggs

SF_DIR = "/root/testdata/sf0.001"


# --- histogram ---------------------------------------------------------------


def test_histogram_floor_semantics_negative_values(spark):
    df = spark.createDataFrame(
        [(-25.0,), (-1.0,), (0.0,), (9.9,), (10.0,), (19.9,)], "v double"
    )
    out = {r["key"]: r["doc_count"] for r in aggs.histogram(df, "v", 10.0).collect()}
    # ES floor semantics: -1.0 buckets at -10, not 0
    assert out == {-30.0: 1, -10.0: 1, 0.0: 2, 10.0: 2}


def test_histogram_min_doc_count_and_validation(spark):
    df = spark.createDataFrame([(1.0,), (1.5,), (25.0,)], "v double")
    out = aggs.histogram(df, "v", 10.0, min_doc_count=2).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [(0.0, 2)]
    with pytest.raises(ValueError):
        aggs.histogram(df, "v", 0.0)
    with pytest.raises(ValueError):
        aggs.histogram(df, "v", 10.0, min_doc_count=0)


def test_date_histogram_day_buckets(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 01:00:00",),
            ("2024-01-01 23:59:59",),
            ("2024-01-03 12:00:00",),
        ],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    out = [(str(r["key"]), r["doc_count"]) for r in aggs.date_histogram(df, "ts").collect()]
    assert out == [("2024-01-01", 2), ("2024-01-03", 1)]
    with pytest.raises(ValueError):
        aggs.date_histogram(df, "ts", "fortnight")


# --- stats / percentiles -----------------------------------------------------


def test_extended_stats_matches_closed_form(spark):
    vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]  # classic sigma=2 example
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = aggs.extended_stats(df, "v", round_to=6).collect()[0]
    assert row["count"] == 8 and row["min"] == 2.0 and row["max"] == 9.0
    assert row["avg"] == 5.0 and row["sum"] == 40.0
    assert row["variance"] == 4.0 and row["std_deviation"] == 2.0
    assert row["std_upper"] == 9.0 and row["std_lower"] == 1.0
    assert row["sum_of_squares"] == sum(v * v for v in vals)


def test_percentiles_exact_linear_interpolation(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], "v double")
    out = {r["percent"]: r["value"] for r in aggs.percentiles(df, "v", [25.0, 50.0, 100.0]).collect()}
    # numpy 'linear' / SQL quantile_cont: 25% of [1,2,3,4] = 1.75
    assert out == {25.0: 1.75, 50.0: 2.5, 100.0: 4.0}


def test_percentiles_approximate_path_and_validation(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1000)], "v double")
    out = {
        r["percent"]: r["value"]
        for r in aggs.percentiles(df, "v", [50.0], approximate=True).collect()
    }
    assert abs(out[50.0] - 499.5) <= 5.0  # t-digest-style bounded error
    with pytest.raises(ValueError):
        aggs.percentiles(df, "v", [101.0]).collect()


# --- top_hits ----------------------------------------------------------------


def test_top_hits_per_bucket(spark):
    rows = [("a", 1, 9.0), ("a", 2, 9.0), ("a", 3, 1.0), ("b", 4, 5.0)]
    df = spark.createDataFrame(rows, "lang string, doc_id int, score double")
    out = aggs.top_hits(df, "lang", [F.desc("score"), F.asc("doc_id")], 2).collect()
    got = sorted((r["lang"], r["doc_id"]) for r in out)
    assert got == [("a", 1), ("a", 2), ("b", 4)]
    with pytest.raises(ValueError):
        aggs.top_hits(df, "lang", [F.desc("score")], 0)


# --- significant_terms -------------------------------------------------------


def test_significant_terms_jlh_hand_checked(spark):
    # foreground: 2 docs, both contain "x"; background: "x" in 2/10 docs,
    # "common" in 10/10 docs (not significant: fg_pct == bg_pct)
    hits_terms = spark.createDataFrame(
        [(1, "x"), (2, "x"), (1, "common"), (2, "common")], "doc_id int, term string"
    )
    background = spark.createDataFrame(
        [("x", 2), ("common", 10)], "term string, df long"
    )
    out = aggs.significant_terms_jlh(
        hits_terms, background, fg_size=2, bg_size=10, min_doc_count=2
    ).collect()
    assert [r["term"] for r in out] == ["x"]
    r = out[0]
    fg_pct, bg_pct = 2 / 2, 2 / 10
    assert r["score"] == round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
    assert r["fg_df"] == 2 and r["bg_df"] == 2


# --- HLL cardinality sketch --------------------------------------------------


def test_hll_accuracy_at_scale(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = sketches.hll_cardinality(df, "v", 12).collect()[0]["estimate"]
    # standard error 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(4096)


def test_hll_merge_is_lossless(spark):
    df = spark.range(5000).select(F.col("id").alias("v"))
    whole = sketches.hll_registers(df, "v")
    parts = [
        sketches.hll_registers(df.where(F.col("v") % 3 == i), "v") for i in range(3)
    ]
    merged = sketches.hll_merge(*parts)
    assert (
        merged.exceptAll(whole).count() == 0 and whole.exceptAll(merged).count() == 0
    ), "register-wise max merge must equal the whole-input sketch"


def test_hll_empty_nulls_and_validation(spark):
    empty = spark.createDataFrame([], "v long")
    assert sketches.hll_cardinality(empty, "v").collect()[0]["estimate"] == 0.0
    withnull = spark.createDataFrame([(1,), (None,)], "v long")
    one = sketches.hll_cardinality(withnull, "v").collect()[0]["estimate"]
    assert abs(one - 1.0) < 0.01
    with pytest.raises(ValueError):
        sketches.hll_registers(empty, "v", p=3)
    with pytest.raises(ValueError):
        sketches.hll_alpha(64)


def test_hll_estimate_matches_python_reference(spark):
    """The full estimator against an independent per-value Python HLL."""
    import hashlib

    n, p = 3000, 12
    m = 1 << p
    regs = [0] * m
    for v in range(n):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, w = h % m, h >> p
        rank = (60 - p) + 1 if w == 0 else (60 - p) + 1 - w.bit_length()
        regs[j] = max(regs[j], rank)
    zeros = sum(1 for r in regs if r == 0)
    alpha = sketches.hll_alpha(m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    expected = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    df = spark.range(n).select(F.col("id").alias("v"))
    est = sketches.hll_cardinality(df, "v", p, round_to=None).collect()[0]["estimate"]
    assert est == pytest.approx(expected, rel=1e-9)


# --- search_after + filter context on the index ------------------------------


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
    from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.col("doc_id").alias("orig_id"), "text")
    )
    d = str(tmp_path_factory.mktemp("idx"))
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",))
    return InvertedIndex.open(spark, d)


def test_search_after_pagination(spark, small_index):
    terms = ["table", "value"]
    k = 20
    all40 = small_index.search(terms, k=2 * k).collect()
    page1 = small_index.search(terms, k=k).collect()
    cursor = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
    page2 = small_index.search(terms, k=k, search_after=cursor).collect()
    got = [(r["doc_id"], r["score"]) for r in page1 + page2]
    want = [(r["doc_id"], r["score"]) for r in all40]
    assert got == want, "page1 + page2 must equal the top-2k in order"
    ids1, ids2 = {r["doc_id"] for r in page1}, {r["doc_id"] for r in page2}
    assert not ids1 & ids2


def test_filter_context_equals_post_filter(spark, small_index):
    terms = ["table", "value"]
    scored = small_index.score_matches(terms)
    keep = scored.select("doc_id").where(F.col("doc_id") % 2 == 0)
    filtered = small_index.search(terms, k=10, doc_id_filter=keep).collect()
    # ES filter context: same scores as the unfiltered query (corpus-level
    # stats), membership restricted
    post = (
        scored.join(keep, on="doc_id", how="left_semi")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in filtered] == [
        (r["doc_id"], r["score"]) for r in post
    ]
    assert all(r["doc_id"] % 2 == 0 for r in filtered)
