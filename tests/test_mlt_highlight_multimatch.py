"""Unit tests: more_like_this, plain-highlighter snippets, multi_match."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_aggregation_geoclustering_spark.functions.highlight import (
    highlight_first_match,
)
from elasticsearch_aggregation_geoclustering_spark.plans.multimatch import (
    multi_match_best_fields,
    score_field,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toy_index(spark, tmp_path_factory):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
    from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

    rows = [
        (1, "apple apple banana cherry"),
        (2, "apple banana banana date"),
        (3, "cherry cherry cherry apple"),
        (4, "date egg fig grape"),
        (5, "apple banana cherry date egg"),
        (6, "banana cherry date egg fig"),
        (7, "apple apple apple banana"),
    ]
    docs = spark.createDataFrame(rows, "orig_id long, text string")
    d = str(tmp_path_factory.mktemp("mltidx"))
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",))
    return InvertedIndex.open(spark, d)


# --- more_like_this ----------------------------------------------------------


def test_mlt_term_selection_filters_and_ranks(toy_index):
    # tf: apple 2, banana 1, cherry 1 -> min_term_freq=2 keeps only apple
    terms = toy_index.more_like_this_terms(
        "apple apple banana cherry", min_term_freq=2, min_doc_freq=1
    )
    assert terms == ["apple"]
    # min_doc_freq prunes corpus-rare terms: "zebra" appears in 0 docs
    terms = toy_index.more_like_this_terms(
        "zebra zebra apple apple", min_term_freq=2, min_doc_freq=1
    )
    assert terms == ["apple"]
    # ranking: tf*(ln(N/(df+1))+1) — higher tf with equal df wins the cap
    terms = toy_index.more_like_this_terms(
        "fig fig fig date date", min_term_freq=2, min_doc_freq=1, max_query_terms=1
    )
    # fig tf=3 df=2; date tf=2 df=4 -> fig scores higher
    assert terms == ["fig"]
    with pytest.raises(ValueError):
        toy_index.more_like_this_terms("x", max_query_terms=0)


def test_mlt_excludes_source_and_ranks(toy_index):
    out = toy_index.more_like_this(
        "apple apple banana", k=10, exclude_doc_ids=None,
        min_term_freq=1, min_doc_freq=1,
    )
    ids = [r["doc_id"] for r in out.collect()]
    assert len(ids) >= 5  # apple or banana docs
    internal = ids[0]
    out2 = toy_index.more_like_this(
        "apple apple banana", k=10, exclude_doc_ids=[internal],
        min_term_freq=1, min_doc_freq=1,
    ).collect()
    assert internal not in {r["doc_id"] for r in out2}
    # no interesting terms -> empty frame, stable schema
    empty = toy_index.more_like_this("zzz qqq", min_term_freq=2, min_doc_freq=1)
    assert empty.count() == 0 and empty.columns == ["doc_id", "score"]


# --- highlight ---------------------------------------------------------------


def test_highlight_wraps_first_match(spark):
    df = spark.createDataFrame(
        [
            (1, "The QUICK brown-fox jumps; spark window functions rule"),
            (2, "no match here at all"),
            (3, "window spark"),  # window occurs first -> window wrapped
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["snip"]
        for r in df.select(
            "doc_id",
            highlight_first_match(F.col("text"), ["spark", "window"]).alias("snip"),
        ).collect()
    }
    assert "<em>spark</em>" in out[1] and "<em>window</em>" not in out[1]
    assert out[2] is None
    assert "<em>window</em>" in out[3] and "<em>spark</em>" not in out[3]


def test_highlight_fragment_window_and_validation(spark):
    long_text = ("x " * 200) + "needle" + (" y" * 200)
    df = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    snip = df.select(
        highlight_first_match(
            F.col("text"), ["needle"], frag_size=50, pad=10
        ).alias("s")
    ).collect()[0]["s"]
    assert len(snip) <= 50 + len("<em></em>")
    assert "<em>needle</em>" in snip
    with pytest.raises(ValueError):
        highlight_first_match(F.col("text"), [])
    with pytest.raises(ValueError):
        highlight_first_match(F.col("text"), ["x"], frag_size=10, pad=10)


# --- multi_match -------------------------------------------------------------


def test_score_field_matches_index_scores(spark, toy_index):
    """Per-field scorer reproduces the index's BM25 exactly on the same field."""
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "apple banana banana date"),
            (3, "cherry cherry cherry apple"),
            (4, "date egg fig grape"),
            (5, "apple banana cherry date egg"),
            (6, "banana cherry date egg fig"),
            (7, "apple apple apple banana"),
        ],
        "doc_id long, text string",
    )
    mine = {
        r["doc_id"]: r["score"]
        for r in score_field(docs, ["apple", "banana"]).collect()
    }
    topk = toy_index.search(["apple", "banana"], k=10)
    mapped = topk.join(toy_index.docmap(), on="doc_id").select("orig_id", "score")
    theirs = {r["orig_id"]: r["score"] for r in mapped.collect()}
    assert set(mine) == set(theirs)
    for d in mine:
        assert mine[d] == pytest.approx(theirs[d], rel=1e-12)


def test_multi_match_tie_breaker_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple", "banana"),   # matches f1 only on 'apple'
            (2, "banana", "apple"),   # matches f2 only
            (3, "apple", "apple"),    # matches both
        ],
        "doc_id long, f1 string, f2 string",
    )
    s1 = {r["doc_id"]: r["score"] for r in score_field(docs, ["apple"], text_col="f1").collect()}
    s2 = {r["doc_id"]: r["score"] for r in score_field(docs, ["apple"], text_col="f2").collect()}
    for tie in (0.0, 0.5):
        got = {
            r["doc_id"]: r["score"]
            for r in multi_match_best_fields(
                docs, ["apple"], ["f1", "f2"], k=10, tie_breaker=tie
            ).collect()
        }
        for d in (1, 2, 3):
            a, b = s1.get(d, 0.0), s2.get(d, 0.0)
            want = max(a, b) + tie * (a + b - max(a, b))
            assert got[d] == pytest.approx(want, rel=1e-12), (d, tie)
    with pytest.raises(ValueError):
        multi_match_best_fields(docs, ["apple"], ["f1"], tie_breaker=1.5)
    with pytest.raises(ValueError):
        multi_match_best_fields(docs, ["apple"], [])
