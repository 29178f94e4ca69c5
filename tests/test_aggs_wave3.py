"""Unit tests: the third r5 surface wave — range/filters/weighted_avg/
rare_terms/composite aggregations, geo_bounds/geo_centroid metrics
(plans/aggs.py), dis_max (plans/multimatch.py), field collapsing and the
term suggester (plans/query.py).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_aggregation_geoclustering_spark.plans import aggs
from elasticsearch_aggregation_geoclustering_spark.plans.multimatch import dis_max
from elasticsearch_aggregation_geoclustering_spark.plans.query import (
    collapse_top_hits,
)

# --- range_agg ---------------------------------------------------------------


def test_range_agg_edges_open_and_overlap(spark):
    df = spark.createDataFrame([(100.0,), (200.0,), (250.0,), (300.0,)], "v double")
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.range_agg(
            df,
            "v",
            [
                ("lo", None, 200.0),      # from-open, to exclusive: 100 only
                ("mid", 200.0, 300.0),    # from inclusive: 200, 250
                ("hi", 300.0, None),      # 300
                ("all", None, None),      # overlapping range: every doc
                ("empty", 900.0, 999.0),  # empty bucket STILL returned (ES)
            ],
        ).collect()
    }
    assert out == {"lo": 1, "mid": 2, "hi": 1, "all": 4, "empty": 0}


def test_range_agg_skips_nulls_and_validates(spark):
    df = spark.createDataFrame([(None,), (10.0,)], "v double")
    out = aggs.range_agg(df, "v", [("all", None, None)]).collect()
    assert out[0]["doc_count"] == 1  # null never lands in a bucket (ES)
    with pytest.raises(ValueError):
        aggs.range_agg(df, "v", [])


# --- filters_agg -------------------------------------------------------------


def test_filters_agg_one_pass_named_buckets(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 7)], "k string, v int"
    )
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.filters_agg(
            df,
            {
                "is_a": F.col("k") == "a",
                "big": F.col("v") >= 5,
                "none": F.col("v") > 100,  # empty bucket kept, doc_count 0
            },
        ).collect()
    }
    assert out == {"is_a": 2, "big": 2, "none": 0}
    with pytest.raises(ValueError):
        aggs.filters_agg(df, {})


# --- weighted_avg ------------------------------------------------------------


def test_weighted_avg_skips_rows_missing_either_side(spark):
    df = spark.createDataFrame(
        [(10.0, 1.0), (20.0, 3.0), (None, 5.0), (99.0, None)],
        "v double, w double",
    )
    got = aggs.weighted_avg(df, "v", "w").collect()[0]["value"]
    # only the first two rows count: (10*1 + 20*3) / (1+3) = 17.5
    assert got == pytest.approx(17.5)


# --- rare_terms --------------------------------------------------------------


def test_rare_terms_order_and_dedup(spark):
    rows = [
        (1, "x"), (1, "x"),          # dup (doc, term) counts once
        (2, "x"),                     # x: df 2
        (3, "y"),                     # y: df 1
        (4, "z"), (5, "z"), (6, "z"),  # z: df 3 — excluded at max 2
        (7, "a"),                     # a: df 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, term string")
    out = [
        (r["term"], r["doc_count"])
        for r in aggs.rare_terms(df, max_doc_count=2, size=10).collect()
    ]
    # doc_count asc, term asc
    assert out == [("a", 1), ("y", 1), ("x", 2)]
    with pytest.raises(ValueError):
        aggs.rare_terms(df, max_doc_count=0)


# --- composite_page ----------------------------------------------------------


def test_composite_page_after_cursor_matches_offset(spark):
    df = spark.createDataFrame(
        [(lang, b) for lang in ("de", "en", "fr") for b in (0, 100, 200)],
        "lang string, v int",
    )
    sources = [("lang", F.col("lang")), ("bucket", F.col("v"))]
    all_rows = aggs.composite_page(df, sources, size=100).collect()
    page1 = aggs.composite_page(df, sources, size=4).collect()
    assert [(r["lang"], r["bucket"]) for r in page1] == [
        (r["lang"], r["bucket"]) for r in all_rows[:4]
    ]
    cursor = (page1[-1]["lang"], page1[-1]["bucket"])
    page2 = aggs.composite_page(df, sources, size=4, after=cursor).collect()
    assert [(r["lang"], r["bucket"]) for r in page2] == [
        (r["lang"], r["bucket"]) for r in all_rows[4:8]
    ]
    with pytest.raises(ValueError):
        aggs.composite_page(df, sources, after=("en",))  # arity mismatch
    with pytest.raises(ValueError):
        aggs.composite_page(df, [])


# --- geo_bounds / geo_centroid ----------------------------------------------


def test_geo_bounds_and_centroid(spark):
    df = spark.createDataFrame(
        [(10.0, -20.0), (30.0, 40.0), (-5.0, 0.0)], "lat double, lon double"
    )
    b = aggs.geo_bounds(df).collect()[0]
    assert (b["top_left_lat"], b["top_left_lon"]) == (30.0, -20.0)
    assert (b["bottom_right_lat"], b["bottom_right_lon"]) == (-5.0, 40.0)
    c = aggs.geo_centroid(df).collect()[0]
    assert c["centroid_lat"] == pytest.approx(35.0 / 3.0)
    assert c["centroid_lon"] == pytest.approx(20.0 / 3.0)
    assert c["count"] == 3


# --- dis_max -----------------------------------------------------------------


def test_dis_max_combine_and_missing_subscores(spark):
    a = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(1, 3.0), (3, 4.0)], "doc_id long, score double")
    out = {
        r["doc_id"]: r["score"]
        for r in dis_max([a, b], tie_breaker=0.5, k=10).collect()
    }
    # doc 1: max(2,3) + 0.5*2 = 4.0 ; doc 2: only a ; doc 3: only b
    assert out == {1: 4.0, 2: 1.0, 3: 4.0}
    with pytest.raises(ValueError):
        dis_max([a], tie_breaker=1.5)
    with pytest.raises(ValueError):
        dis_max([])


def test_dis_max_pure_best_is_max(spark):
    a = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    b = spark.createDataFrame([(1, 3.0)], "doc_id long, score double")
    assert dis_max([a, b], tie_breaker=0.0, k=1).collect()[0]["score"] == 3.0


# --- collapse_top_hits -------------------------------------------------------


def test_collapse_keeps_best_per_group_then_global_topk(spark):
    rows = [
        (1, "en", 9.0),
        (2, "en", 8.0),   # loses to doc 1 inside 'en'
        (3, "fr", 7.0),
        (4, "de", 6.0),
        (5, "zh", 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = [(r["doc_id"], r["lang"]) for r in collapse_top_hits(df, "lang", 3).collect()]
    # one hit per lang, globally ranked, k=3 cuts 'zh'
    assert out == [(1, "en"), (3, "fr"), (4, "de")]
    with pytest.raises(ValueError):
        collapse_top_hits(df, "lang", 0)


def test_collapse_tiebreak_doc_id_asc(spark):
    df = spark.createDataFrame(
        [(7, "en", 1.0), (3, "en", 1.0)], "doc_id long, lang string, score double"
    )
    assert collapse_top_hits(df, "lang", 1).collect()[0]["doc_id"] == 3


# --- term suggester ----------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_index(spark, tmp_path_factory):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import (
        build_index,
    )
    from elasticsearch_aggregation_geoclustering_spark.plans.query import (
        InvertedIndex,
    )

    docs = spark.createDataFrame(
        [
            (1, "value value table"),
            (2, "value spark"),
            (3, "table scale vale_x"),
        ],
        "orig_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("suggest_idx"))
    build_index(spark, docs, path, content_col="text", key_cols=("orig_id",))
    return InvertedIndex.open(spark, path)


def test_suggest_ranks_distance_then_df(tiny_index):
    out = [
        (r["candidate"], r["distance"], r["df"])
        for r in tiny_index.suggest("vale", size=5).collect()
    ]
    # distance 1: value (df 2); distance 2 ranked df desc then term asc:
    # table (df 2), then scale / vale_x (df 1 each)
    assert out == [
        ("value", 1, 2),
        ("table", 2, 2),
        ("scale", 2, 1),
        ("vale_x", 2, 1),
    ]
    assert "vale" not in [c for c, _, _ in out]


def test_suggest_mode_missing_empty_for_known_term(tiny_index):
    assert tiny_index.suggest("value", suggest_mode="missing").count() == 0
    assert tiny_index.suggest("vale", suggest_mode="missing").count() > 0


def test_suggest_validation(tiny_index):
    with pytest.raises(ValueError):
        tiny_index.suggest("")
    with pytest.raises(ValueError):
        tiny_index.suggest("x", max_edits=3)
    with pytest.raises(ValueError):
        tiny_index.suggest("x", size=0)
    with pytest.raises(ValueError):
        tiny_index.suggest("x", suggest_mode="popular")
