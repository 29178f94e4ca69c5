"""Cause-split for the round-4 dedup warm regressions (VERDICT r4 task 2).

`dedup_ngram_minhash` and `dedup_simhash_pairs` read slower in BENCH_r04
(warm 2.80→6.12 s, 1.59→3.19 s vs r3) although `git diff 45df7d9..HEAD`
shows their entire call path unchanged (the only touch is the new
`cap_method` parameter on `_bucket_pairs`, defaulting to the r3 "window"
branch verbatim) — so a code-level A/B would compare identical plans.

The two remaining hypotheses are (a) ambient load on the shared VM during
the r4 recording and (b) session context: bench.py r4 runs extra BM25
passes (warm per-query loop + second search_batch) before the dedup
section, accumulating JVM heap/codegen state.  This script measures both
queries in a FRESH session, with and without a bench-shaped BM25 preamble,
interleaved A/B/A/B within one process so ambient drift hits both arms
equally.  Run on an idle box:

    python scripts/ab_dedup_regression.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from elasticsearch_aggregation_geoclustering_spark.extras import dedup


def run_queries(spark, docs):
    out = {}
    t0 = time.perf_counter()
    dedup.ngram_jaccard_pairs_minhash(
        docs, "text", "doc_id", shingle_k=1, threshold=0.25
    ).count()
    out["dedup_ngram_minhash"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    dedup.simhash_near_pairs(docs, "text", "doc_id").count()
    out["dedup_simhash_pairs"] = round(time.perf_counter() - t0, 4)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("ab_dedup")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    results = []
    for r in range(rounds):
        la0 = os.getloadavg()[0]
        res = run_queries(spark, docs)
        res["round"] = r
        res["load1_before"] = round(la0, 2)
        res["load1_after"] = round(os.getloadavg()[0], 2)
        results.append(res)
        print(json.dumps(res), flush=True)
    summary = {
        q: {
            "cold": results[0][q],
            "warm_min": min(x[q] for x in results[1:]) if rounds > 1 else None,
        }
        for q in ("dedup_ngram_minhash", "dedup_simhash_pairs")
    }
    print(json.dumps({"summary": summary, "sf_dir": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
