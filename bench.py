#!/usr/bin/env python
"""Headline benchmark suite — one JSON line on stdout.

Runs the engine's flagship operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints::

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1, "extra": {...}}

Query set: inverted-index build (throughput headline, files/sec), BM25 top-k
(latency headline over a query batch), match counts, geo_point_clustering over
100k derived points, the dedup family, ANN top-k, and text quality — the
SURVEY.md §2 inventory exercised end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from elasticsearch_aggregation_geoclustering_spark.extras import dedup, similarity, textstats
from elasticsearch_aggregation_geoclustering_spark.operators.clustering import (
    geo_point_clustering,
)
from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

BM25_QUERY_BATCH = [
    ["spark", "window", "merge"],
    ["table", "value", "customer"],
    ["join", "hash"],
    ["scan", "filter", "row"],
    ["vector", "stream"],
    ["agg", "group", "key"],
    ["batch", "order", "column"],
    ["big", "small", "fast", "slow"],
    ["query", "line"],
    ["sort", "data", "part"],
]


def _session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("geoclustering-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_docs = docs.count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    index_dir = tempfile.mkdtemp(prefix="bench_idx_")

    warm: dict[str, float] = {}

    def timed(name: str, fn, *, rerun: bool = True) -> None:
        """Time ``fn`` cold (first run: includes codegen/janino compile and
        Arrow python-worker spinup) and once more warm (steady state).

        ``queries`` keeps the COLD figure — comparable with earlier rounds'
        single-shot protocol; ``extra.queries_warm`` carries the warm figure,
        which is what a long-running cluster actually pays per query (the
        one-time compile amortizes to zero at 100 TB).  Mutating operators
        (index build) are cold-only.
        """
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        if rerun:
            t0 = time.perf_counter()
            fn()
            warm[name] = round(time.perf_counter() - t0, 4)

    # 1) index build throughput (the north_rule headline)
    def _build():
        build_index(
            spark,
            docs.select(F.col("doc_id").alias("orig_id"), "text"),
            index_dir,
            content_col="text",
            key_cols=("orig_id",),
            docs_per_segment=max(256, n_docs // (4 * int(cpus))),
            resume=False,
        )

    timed("index_build", _build, rerun=False)
    extra["index_files_per_sec"] = round(n_docs / timings["index_build"], 2)

    index = InvertedIndex.open(spark, index_dir)

    # 2) BM25 top-k latency.  A warmed search node serves postings from
    #    memory (Lucene leans on the OS page cache); the engine's explicit
    #    analog is cache_postings() — decoded rows pinned once, per-query
    #    plans pure JVM (r5; bit-identity pinned by tests).  Build cost is
    #    reported separately; the per-query series measures the serving
    #    path a warmed node runs.  An UNCACHED series (fresh reader, scan +
    #    Arrow decode per query, the r3/r4-comparable number) is kept as
    #    bm25_p95_uncached_sec.  search_batch remains the batched gate.
    t0 = time.perf_counter()
    index.cache_postings()
    extra["postings_cache_build_sec"] = round(time.perf_counter() - t0, 4)
    lat = []
    t0 = time.perf_counter()
    for terms in BM25_QUERY_BATCH:
        tq = time.perf_counter()
        index.search(terms, k=10).collect()
        lat.append(time.perf_counter() - tq)
    timings["bm25_topk_batch"] = round(time.perf_counter() - t0, 4)
    extra["bm25_p95_sec"] = round(sorted(lat)[max(0, int(len(lat) * 0.95) - 1)], 4)
    extra["bm25_mean_sec"] = round(sum(lat) / len(lat), 4)
    # uncached comparability series: a FRESH reader (no decoded cache) pays
    # the parquet scan + Arrow decode per query like r3/r4 did
    uncached = InvertedIndex.open(spark, index_dir)
    uncached.df_of(["table"])  # warm the tiny df dict like the cached path
    lat_u = []
    for terms in BM25_QUERY_BATCH:
        tq = time.perf_counter()
        uncached.search(terms, k=10).collect()
        lat_u.append(time.perf_counter() - tq)
    extra["bm25_p95_uncached_sec"] = round(
        sorted(lat_u)[max(0, int(len(lat_u) * 0.95) - 1)], 4
    )
    # warm per-query pass: steady-state latency once codegen/worker spinup
    # has amortized (what a long-running cluster pays)
    lat_w = []
    for terms in BM25_QUERY_BATCH:
        tq = time.perf_counter()
        index.search(terms, k=10).collect()
        lat_w.append(time.perf_counter() - tq)
    extra["bm25_p95_warm_sec"] = round(
        sorted(lat_w)[max(0, int(len(lat_w) * 0.95) - 1)], 4
    )

    t0 = time.perf_counter()
    index.search_batch(BM25_QUERY_BATCH, k=10).collect()
    timings["bm25_batched_onescan"] = round(time.perf_counter() - t0, 4)
    extra["bm25_batched_per_query_sec"] = round(
        timings["bm25_batched_onescan"] / len(BM25_QUERY_BATCH), 4
    )
    # the gate number: amortized per-query latency of the batched shape,
    # steady state
    t0 = time.perf_counter()
    index.search_batch(BM25_QUERY_BATCH, k=10).collect()
    extra["bm25_batched_per_query_warm_sec"] = round(
        (time.perf_counter() - t0) / len(BM25_QUERY_BATCH), 4
    )
    extra["bm25_gate_metric"] = "bm25_batched_per_query_sec"

    timed("match_count_and", lambda: index.match_count(["table", "value", "customer"], "AND"))

    # release the pinned decoded-postings cache before the dedup/ANN sections
    # (their own persists shouldn't compete with the serving cache; a real
    # cluster separates serving and pipeline executors)
    index = index.refresh()

    # 3) geo_point_clustering over derived points (full operator incl merge)
    pts = events.select(
        (((F.col("event_id") * 7919) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("event_id") * 104729) % 17000) / 100.0 - 85.0).alias("lat"),
    )
    timed("geo_cluster_z9", lambda: geo_point_clustering(pts, zoom=9))
    timed("geo_cluster_z5", lambda: geo_point_clustering(pts, zoom=5, ratio=1.2))

    # 4) dedup family
    timed("dedup_exact", lambda: dedup.exact_dup_groups(docs, "text", "doc_id").count())
    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, "text", "doc_id").count())
    timed("dedup_simhash", lambda: dedup.simhash(docs, "text", "doc_id").count())
    timed(
        "dedup_ngram_minhash",
        lambda: dedup.ngram_jaccard_pairs_minhash(
            docs, "text", "doc_id", shingle_k=1, threshold=0.25
        ).count(),
    )
    # each ngram call persists its shingle/signature frame; drop them so
    # later queries aren't squeezed by two cached copies
    spark.catalog.clearCache()
    timed(
        "dedup_simhash_pairs",
        lambda: dedup.simhash_near_pairs(docs, "text", "doc_id").count(),
    )

    # 5) similarity search
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    timed("ann_cosine_topk", lambda: similarity.cosine_topk(emb, "vec_id", "embedding", qv, 10).collect())
    timed("ann_lsh_topk", lambda: similarity.rp_lsh_topk(emb, "vec_id", "embedding", qv, 10).collect())
    # amortized ANN: build the signature index once, probe a query batch
    # against it (no per-query signature UDF over the corpus)
    sig_dir = tempfile.mkdtemp(prefix="bench_sig_")
    t0 = time.perf_counter()
    similarity.build_signature_index(emb, "vec_id", "embedding", sig_dir, n_planes=16, seed=42)
    extra["sig_index_build_sec"] = round(time.perf_counter() - t0, 4)
    qbatch = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 8).collect()
    ]
    t0 = time.perf_counter()
    alat = []
    for q in qbatch:
        tq = time.perf_counter()
        similarity.rp_lsh_topk_indexed(
            spark, sig_dir, emb, "vec_id", "embedding", q, 10
        ).collect()
        alat.append(time.perf_counter() - tq)
    timings["ann_lsh_indexed_batch"] = round(time.perf_counter() - t0, 4)
    extra["ann_indexed_mean_sec"] = round(sum(alat) / len(alat), 4)
    # same 8 probes as ONE job (literal signature array + single window)
    t0 = time.perf_counter()
    similarity.rp_lsh_topk_indexed_batch(
        spark, sig_dir, emb, "vec_id", "embedding", qbatch, 10
    ).collect()
    timings["ann_lsh_batched_onescan"] = round(time.perf_counter() - t0, 4)
    shutil.rmtree(sig_dir, ignore_errors=True)

    # headline: the PRODUCTION parameterization (128 planes x 8 bands,
    # 16-bit keys) — what the operator ships with; r3 benched only the
    # narrow driver-gate params (16 values/band), whose few-distinct-key
    # window was a self-inflicted skew, not the operator's cost
    # IVF-flat: the third ANN path (coarse lists, vectors carried in-list)
    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    t0 = time.perf_counter()
    similarity.build_ivf_index(emb, "vec_id", "embedding", ivf_dir, n_lists=16)
    extra["ivf_index_build_sec"] = round(time.perf_counter() - t0, 4)
    timed(
        "ann_ivf_topk",
        lambda: similarity.ivf_topk(spark, ivf_dir, qv, k=10, nprobe=4).collect(),
    )
    shutil.rmtree(ivf_dir, ignore_errors=True)

    timed(
        "ann_band_near_dup",
        lambda: similarity.rp_band_near_pairs(
            emb, "vec_id", "embedding", threshold=0.95,
        ).count(),
    )
    spark.catalog.clearCache()  # the anti_join cap persists its band rows
    # secondary: the narrow sf-pinned oracle params, kept for round-over-
    # round comparability (cap now runs as a broadcast anti-join, no window)
    timed(
        "ann_band_near_dup_narrow16",
        lambda: similarity.rp_band_near_pairs(
            emb, "vec_id", "embedding", threshold=0.4,
            n_planes=16, bands=4, max_bucket_size=1000,
        ).count(),
    )
    spark.catalog.clearCache()

    # 6) text analysis
    timed("text_quality", lambda: textstats.quality_features(docs, "text", "doc_id").count())
    timed("text_lang_id", lambda: textstats.lang_id(docs, "text", "doc_id").count())

    # 7) ES search aggregations over hits + r5 query types
    from elasticsearch_aggregation_geoclustering_spark.extras import sketches
    from elasticsearch_aggregation_geoclustering_spark.plans import aggs, multimatch

    def _aggs_over_hits():
        scored = index.score_matches(["table", "value", "customer"])
        hits = scored.join(index.docmap(), on="doc_id").join(
            docs.select(F.col("doc_id").alias("orig_id"), "n_chars", "lang"),
            on="orig_id",
        )
        aggs.extended_stats(hits, "n_chars", round_to=4).collect()
        aggs.histogram(hits, "n_chars", 50.0).collect()
        aggs.top_hits(hits, "lang", [F.desc("score"), F.asc("orig_id")], 2).collect()

    timed("agg_hits_stats_hist_tophits", _aggs_over_hits)
    timed(
        "cardinality_hll",
        lambda: sketches.hll_cardinality(events, "user_id").collect(),
    )

    def _mm():
        d2 = docs.withColumn("title", F.substring("text", 1, 60))
        multimatch.multi_match_best_fields(
            d2, ["table", "value"], ["title", "text"], k=10, tie_breaker=0.3
        ).collect()

    timed("multi_match_best_fields", _mm)

    # 8) third r5 wave: dis_max / collapse / composite paging / suggester
    def _wave3():
        from elasticsearch_aggregation_geoclustering_spark.plans.query import (
            collapse_top_hits,
        )

        a = index.score_matches(["spark", "window", "merge"])
        b = index.score_matches(["table", "value", "customer"])
        multimatch.dis_max([a, b], tie_breaker=0.3, k=50).collect()
        hits = (
            index.score_matches(["spark", "window", "merge"])
            .join(index.docmap(), on="doc_id")
            .join(docs.select(F.col("doc_id").alias("orig_id"), "lang"), on="orig_id")
        )
        collapse_top_hits(hits, "lang", 5, id_col="orig_id").collect()
        sources = [
            ("lang", F.col("lang")),
            ("bucket", (F.floor(F.col("n_chars") / 100) * 100).cast("long")),
        ]
        aggs.composite_page(docs, sources, size=5, after=("en", 100)).collect()
        index.suggest("vale", size=5).collect()

    timed("dismax_collapse_composite_suggest", _wave3)

    shutil.rmtree(index_dir, ignore_errors=True)
    extra["queries_warm"] = warm
    extra["suite_warm_sec"] = round(sum(warm.values()), 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
