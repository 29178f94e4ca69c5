"""Plan-shape guards for the third r5 wave — the properties that matter at
100 TB, pinned at the physical-plan level:

- range_agg / filters_agg are ONE aggregation pass however many ranges /
  filters are requested (no per-bucket scan, no data-row exchange — the
  only exchange moves one partial-agg row per partition);
- dis_max never plans a cartesian/nested-loop join;
- collapse_top_hits prunes to one row per group BEFORE the global top-k
  (TakeOrderedAndProject sees the window output, and the plan has exactly
  one hash exchange for the group window);
- suggest's length-window prefilter reaches the term_stats parquet scan as
  a pushed filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_aggregation_geoclustering_spark.plans import aggs
from elasticsearch_aggregation_geoclustering_spark.plans.multimatch import dis_max
from elasticsearch_aggregation_geoclustering_spark.plans.query import (
    collapse_top_hits,
)

BAD_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_agg_single_pass_any_range_count(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    ranges = [(f"r{i}", float(i * 7), float(i * 7 + 20)) for i in range(12)]
    plan = _plan(aggs.range_agg(df, "v", ranges))
    # one partial+final agg pair around one single-partition exchange —
    # NOT one scan or one aggregate per range
    assert plan.count("Scan ") + plan.count("Range (") <= 2
    assert plan.count("HashAggregate") <= 2
    for bad in BAD_NODES:
        assert bad not in plan


def test_filters_agg_single_pass(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    filters = {f"f{i}": F.col("v") % (i + 2) == 0 for i in range(8)}
    plan = _plan(aggs.filters_agg(df, filters))
    assert plan.count("HashAggregate") <= 2
    assert plan.count("Range (") <= 1  # the input is scanned once


def test_dis_max_no_cartesian(spark):
    a = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    b = spark.createDataFrame([(1, 3.0)], "doc_id long, score double")
    c = spark.createDataFrame([(2, 1.0)], "doc_id long, score double")
    plan = _plan(dis_max([a, b, c], tie_breaker=0.2, k=5))
    for bad in BAD_NODES:
        assert bad not in plan, plan
    assert "TakeOrderedAndProject" in plan  # exact distributed top-k


def test_collapse_prunes_before_global_topk(spark):
    rows = [(i, "g%d" % (i % 5), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    plan = _plan(collapse_top_hits(df, "lang", 3))
    # the global top-k is TakeOrderedAndProject and it consumes the
    # group-window's rank filter (one row per group), not the raw hits
    assert "TakeOrderedAndProject" in plan
    assert "Window" in plan
    i_win, i_top = plan.index("Window"), plan.index("TakeOrderedAndProject")
    assert i_top < i_win  # physical plans print top-down: top-k ABOVE window
    # exactly one hash exchange (the window's); the top-k needs none
    assert plan.count("Exchange hashpartitioning") == 1


def test_suggest_pushes_length_window_into_scan(spark, tmp_path):
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import (
        build_index,
    )
    from elasticsearch_aggregation_geoclustering_spark.plans.query import (
        InvertedIndex,
    )

    docs = spark.createDataFrame(
        [(1, "value table spark"), (2, "value scan")], "orig_id long, text string"
    )
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",))
    idx = InvertedIndex.open(spark, d)
    plan = _plan(idx.suggest("vale", size=5))
    # the |len(term)-len(q)| <= max_edits window appears as a pushed filter
    # over the parquet term_stats scan (length() is not parquet-pushable as
    # a row-group filter, but it must at least run IN the scan stage's
    # Filter, before the sort/limit — no collect, no python)
    assert "levenshtein" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
