"""Where does the per-query BM25 second go?  (VERDICT r4 task 3.)

Breaks one `InvertedIndex.search` into its layers at sf0.1 and times each
across the bench query batch, cold then warm:

  A  postings parquet scan only (term-pruned, no decode)      [JVM only]
  B  A + mapInPandas varbyte decode (term_doc_rows.count)     [+Arrow]
  C  full search(): B + groupBy fold + TakeOrdered            [+shuffle]
  D  search() against a persisted decoded-postings cache      [no scan/decode]

Run on an idle box: python scripts/profile_bm25.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

BM25_QUERY_BATCH = [
    ["table", "value"],
    ["customer", "join", "hash"],
    ["spark", "window", "merge"],
    ["filter", "scan"],
    ["group", "order", "sort"],
    ["batch", "stream"],
    ["big", "small", "fast", "slow"],
    ["column", "row"],
    ["query", "data"],
    ["vector", "line", "part"],
]


def main():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("profile_bm25")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    index = entry._index_for(spark, sf_dir)
    index.df_of(["table"])  # warm the df cache like bench does implicitly

    def run(tag, fn):
        times = []
        for terms in BM25_QUERY_BATCH:
            t0 = time.perf_counter()
            fn(terms)
            times.append(round(time.perf_counter() - t0, 4))
        p95 = sorted(times)[max(0, int(len(times) * 0.95) - 1)]
        print(json.dumps({"tag": tag, "p95": p95, "mean": round(sum(times) / len(times), 4), "times": times}), flush=True)

    for rep in ("cold", "warm"):
        run(f"A_scan_{rep}", lambda ts: index.postings(ts).count())
        run(f"B_decode_{rep}", lambda ts: index.term_doc_rows(ts).count())
        run(f"C_search_{rep}", lambda ts: index.search(ts, k=10).collect())

    spark.stop()


if __name__ == "__main__":
    main()
