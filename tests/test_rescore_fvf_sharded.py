"""Unit tests: rescore, function_score field_value_factor, sharded terms agg."""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_aggregation_geoclustering_spark.plans import aggs
from elasticsearch_aggregation_geoclustering_spark.plans.query import field_value_factor


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
    from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

    rows = [
        (1, "red fox jumps red fox"),      # phrase "red fox" twice
        (2, "red dog fox cat"),            # both terms, no phrase
        (3, "red red red red"),            # one term only, high tf
        (4, "fox fox fox"),
        (5, "red fox"),                    # phrase once, short doc
        (6, "cat dog bird"),
    ]
    docs = spark.createDataFrame(rows, "orig_id long, text string")
    d = str(tmp_path_factory.mktemp("rescidx"))
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",))
    return InvertedIndex.open(spark, d)


def test_rescore_combines_window_scores(phrase_index):
    idx = phrase_index
    base = {r["doc_id"]: r["score"] for r in idx.search(["red", "fox"], k=10).collect()}
    ph = {
        r["doc_id"]: r["score"]
        for r in idx.phrase_score_matches(["red", "fox"]).collect()
    }
    out = idx.rescore_phrase(
        ["red", "fox"], ["red", "fox"], k=6, window_size=10, rescore_weight=2.0
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert set(got) == set(base)  # every window doc survives, re-ranked
    for d, s in got.items():
        assert s == pytest.approx(base[d] + 2.0 * ph.get(d, 0.0), rel=1e-12)
    # phrase docs must outrank equal-base non-phrase docs
    ranked = [r["doc_id"] for r in out]
    assert ranked.index(
        max(ph, key=lambda d: ph[d])
    ) == 0 or out[0]["score"] >= out[1]["score"]
    with pytest.raises(ValueError):
        idx.rescore_phrase(["red"], ["red", "fox"], k=20, window_size=10)


def test_rescore_window_bounds_rescoring(phrase_index):
    """A doc ranked outside the window never enters the rescored result,
    even if the phrase would boost it in (ES window semantics)."""
    idx = phrase_index
    win1 = idx.rescore_phrase(
        ["red", "fox"], ["red", "fox"], k=1, window_size=1
    ).collect()
    base_top = idx.search(["red", "fox"], k=1).collect()[0]["doc_id"]
    assert win1[0]["doc_id"] == base_top  # window of 1 = only the base top-1


def test_field_value_factor_modifiers(spark):
    scored = spark.createDataFrame([(1, 2.0), (2, 3.0)], "doc_id long, score double")
    meta = spark.createDataFrame([(1, 100), (2, 0)], "doc_id long, n long")
    for modifier, f in [
        ("none", lambda x: x),
        ("ln1p", lambda x: math.log(1 + x)),
        ("log1p", lambda x: math.log10(1 + x)),
        ("sqrt", math.sqrt),
        ("square", lambda x: x * x),
    ]:
        got = {
            r["doc_id"]: r["score"]
            for r in field_value_factor(
                scored, meta, "n", factor=0.5, modifier=modifier
            ).collect()
        }
        assert got[1] == pytest.approx(2.0 * f(0.5 * 100), rel=1e-12), modifier
        assert got[2] == pytest.approx(3.0 * f(0.0), rel=1e-12), modifier
    got = {
        r["doc_id"]: r["score"]
        for r in field_value_factor(
            scored, meta, "n", modifier="none", boost_mode="sum"
        ).collect()
    }
    assert got[1] == 102.0
    got = {
        r["doc_id"]: r["score"]
        for r in field_value_factor(
            scored, meta, "n", modifier="none", boost_mode="replace"
        ).collect()
    }
    assert got[1] == 100.0
    with pytest.raises(ValueError):
        field_value_factor(scored, meta, "n", modifier="exp").collect()
    with pytest.raises(ValueError):
        field_value_factor(scored, meta, "n", boost_mode="avg").collect()


def test_terms_agg_sharded_error_bound(spark):
    """Crafted skew: a term popular on one shard but unreported on others
    gets a positive doc_count_error, and the bound really bounds the true
    count; exhaustive shard_size recovers the exact answer with zero error."""
    # 2 shards (doc_id % 2); vocabulary of 4 terms with asymmetric placement
    rows = []
    # 'a' on every doc; 'b' mostly on even docs; 'c' mostly on odd; 'd' rare
    for d in range(40):
        rows.append((d, "a"))
        if d % 2 == 0 or d in (1, 3):
            rows.append((d, "b"))
        if d % 2 == 1 or d in (0,):
            rows.append((d, "c"))
        if d in (2, 4, 5):
            rows.append((d, "d"))
    ht = spark.createDataFrame(rows, "doc_id long, term string")
    exact = {
        r["term"]: r["doc_count"]
        for r in aggs.terms_agg_sharded(
            ht, n_shards=2, size=4, shard_size=10
        ).collect()
    }
    trunc = aggs.terms_agg_sharded(ht, n_shards=2, size=3, shard_size=3).collect()
    got = {r["term"]: (r["doc_count"], r["doc_count_error"]) for r in trunc}
    for term, (cnt, err) in got.items():
        assert cnt <= exact[term] <= cnt + err, (term, cnt, err, exact[term])
    # exhaustive shard_size -> exact, zero error
    full = aggs.terms_agg_sharded(ht, n_shards=2, size=4, shard_size=100).collect()
    assert all(r["doc_count_error"] == 0 for r in full)
    assert {r["term"]: r["doc_count"] for r in full} == exact
    with pytest.raises(ValueError):
        aggs.terms_agg_sharded(ht, n_shards=2, size=5, shard_size=3)
    with pytest.raises(ValueError):
        aggs.terms_agg_sharded(ht, n_shards=0, size=1)
