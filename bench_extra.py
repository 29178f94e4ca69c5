#!/usr/bin/env python
"""Round-6 micro-benchmarks (guide §1.4): per-operator isolation with the
noop sink / direct actions, finer-grained than the frozen ``bench.py``.

Prints one JSON line: {"extra_metrics": {...sec...}, "sf": ...}.  Used to
attribute suite time to phases (e.g. index_build's exchange vs Python
tokenize; bm25 per-query p50/p95 cached vs uncached) and to A/B library
changes without touching the frozen driver bench.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py
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

from elasticsearch_aggregation_geoclustering_spark.extras import dedup, similarity
from elasticsearch_aggregation_geoclustering_spark.plans import multimatch
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("geoclustering-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_docs = docs.count()
    m: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        m[name] = round(time.perf_counter() - t0, 4)
        sc.setJobDescription(None)

    # --- index build ------------------------------------------------------
    idx_dir = tempfile.mkdtemp(prefix="bx_idx_")
    timed(
        "index_build_total",
        lambda: build_index(
            spark,
            docs.select(F.col("doc_id").alias("orig_id"), "text"),
            idx_dir,
            content_col="text",
            key_cols=("orig_id",),
            docs_per_segment=max(256, n_docs // (4 * int(cpus))),
            resume=False,
        ),
    )

    index = InvertedIndex.open(spark, idx_dir)

    # --- bm25 serving path ------------------------------------------------
    lat_u = []
    index.df_of(["table"])  # warm the df dict
    for terms in BM25_QUERY_BATCH:
        t0 = time.perf_counter()
        index.search(terms, k=10).collect()
        lat_u.append(time.perf_counter() - t0)
    m["bm25_uncached_mean"] = round(sum(lat_u) / len(lat_u), 4)
    t0 = time.perf_counter()
    index.cache_postings()
    m["postings_cache_build"] = round(time.perf_counter() - t0, 4)
    lat_c = []
    for _ in range(2):  # second pass = steady state
        lat_c = []
        for terms in BM25_QUERY_BATCH:
            t0 = time.perf_counter()
            index.search(terms, k=10).collect()
            lat_c.append(time.perf_counter() - t0)
    m["bm25_cached_warm_mean"] = round(sum(lat_c) / len(lat_c), 4)
    m["bm25_cached_warm_p95"] = round(sorted(lat_c)[max(0, int(len(lat_c) * 0.95) - 1)], 4)
    timed("bm25_batched", lambda: index.search_batch(BM25_QUERY_BATCH, k=10).collect())

    # aggs-over-hits building block: score_matches collected 3x like the
    # bench's _aggs_over_hits section does
    def _score3():
        for _ in range(3):
            index.score_matches(["table", "value", "customer"]).count()

    timed("score_matches_x3_cached", _score3)
    index.refresh()
    timed("score_matches_x3_uncached", _score3)
    shutil.rmtree(idx_dir, ignore_errors=True)

    # --- multi_match ------------------------------------------------------
    d2 = docs.withColumn("title", F.substring("text", 1, 60))
    timed(
        "multi_match",
        lambda: multimatch.multi_match_best_fields(
            d2, ["table", "value"], ["title", "text"], k=10, tie_breaker=0.3
        ).collect(),
    )

    # --- dedup_ngram sub-stages ------------------------------------------
    from pyspark import StorageLevel

    coeffs = dedup.minhash_coefficients(16, 42)
    base = docs.select("doc_id", "text").mapInPandas(
        dedup._minhash_arrow_fn(coeffs, "text", "doc_id", 1, with_sets=True),
        "doc_id long, sig array<long>, sset array<long>",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    timed("ngram_base_materialize", lambda: base.count())
    buckets = dedup.lsh_bands(base.select("doc_id", "sig"), bands=4, num_hashes=16)
    pairs = dedup._bucket_pairs(buckets, ["band", "band_key"], 1000)
    timed("ngram_candidate_pairs", lambda: pairs.count())
    spark.catalog.clearCache()
    timed(
        "ngram_full",
        lambda: dedup.ngram_jaccard_pairs_minhash(
            docs, "text", "doc_id", shingle_k=1, threshold=0.25
        ).count(),
    )
    spark.catalog.clearCache()

    # --- ANN builds -------------------------------------------------------
    sig_dir = tempfile.mkdtemp(prefix="bx_sig_")
    timed(
        "sig_index_build",
        lambda: similarity.build_signature_index(
            emb, "vec_id", "embedding", sig_dir, n_planes=16, seed=42
        ),
    )
    shutil.rmtree(sig_dir, ignore_errors=True)
    ivf_dir = tempfile.mkdtemp(prefix="bx_ivf_")
    timed(
        "ivf_index_build",
        lambda: similarity.build_ivf_index(emb, "vec_id", "embedding", ivf_dir, n_lists=16),
    )
    shutil.rmtree(ivf_dir, ignore_errors=True)

    timed(
        "ann_band_narrow16",
        lambda: similarity.rp_band_near_pairs(
            emb, "vec_id", "embedding", threshold=0.4,
            n_planes=16, bands=4, max_bucket_size=1000,
        ).count(),
    )
    spark.catalog.clearCache()

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    print(json.dumps({"extra_metrics": m, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
