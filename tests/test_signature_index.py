"""Persisted RP-LSH signature index: probe-equivalence and rebuild identity."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
    build_signature_index,
    rp_lsh_topk,
    rp_lsh_topk_indexed,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i), [float(x) for x in rng.normal(size=16)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def sig_dir(spark, vectors):
    d = tempfile.mkdtemp(prefix="sigidx_")
    build_signature_index(vectors, "vec_id", "embedding", d, n_planes=16, seed=42)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_indexed_matches_direct(spark, vectors, sig_dir):
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = [float(x) for x in rng.normal(size=16)]
        direct = rp_lsh_topk(
            vectors, "vec_id", "embedding", q, k=5, n_planes=16, seed=42
        ).collect()
        indexed = rp_lsh_topk_indexed(
            spark, sig_dir, vectors, "vec_id", "embedding", q, k=5
        ).collect()
        assert [(r["vec_id"], r["cosine"]) for r in direct] == [
            (r["vec_id"], r["cosine"]) for r in indexed
        ]


def test_rebuild_is_value_identical(spark, vectors, sig_dir):
    d2 = tempfile.mkdtemp(prefix="sigidx2_")
    try:
        build_signature_index(vectors, "vec_id", "embedding", d2, n_planes=16, seed=42)
        a = sorted(
            (r["vec_id"], r["sig"])
            for r in spark.read.parquet(f"{sig_dir}/signatures").collect()
        )
        b = sorted(
            (r["vec_id"], r["sig"])
            for r in spark.read.parquet(f"{d2}/signatures").collect()
        )
        assert a == b and len(a) == 300
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_dim_mismatch_raises(spark, vectors, sig_dir):
    with pytest.raises(ValueError, match="dim"):
        rp_lsh_topk_indexed(
            spark, sig_dir, vectors, "vec_id", "embedding", [1.0, 2.0], k=5
        )


def test_probe_prunes_scan(spark, vectors, sig_dir):
    # the probe's candidate set must be a strict subset at tight hamming
    sigs = spark.read.parquet(f"{sig_dir}/signatures")
    total = sigs.count()
    q = [1.0] * 16
    res = rp_lsh_topk_indexed(
        spark, sig_dir, vectors, "vec_id", "embedding", q, k=total,
        max_probe_hamming=1,
    )
    assert res.count() < total


def test_indexed_batch_matches_per_query(spark, vectors, sig_dir):
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        rp_lsh_topk_indexed_batch,
    )

    rng = np.random.default_rng(23)
    qs = [[float(x) for x in rng.normal(size=16)] for _ in range(4)]
    batch = rp_lsh_topk_indexed_batch(
        spark, sig_dir, vectors, "vec_id", "embedding", qs, k=5
    ).collect()
    per_q = {}
    for r in batch:
        per_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for qid, q in enumerate(qs):
        want = [
            (r["vec_id"], r["cosine"])
            for r in rp_lsh_topk_indexed(
                spark, sig_dir, vectors, "vec_id", "embedding", q, k=5
            ).collect()
        ]
        have = sorted(per_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        # same ranked ids; cosines equal to fp-association noise (einsum vs
        # the JVM fold associate differently)
        assert [v for v, _ in have] == [v for v, _ in want], qid
        for (_, a), (_, b) in zip(have, want):
            assert abs(a - b) < 1e-9

    assert (
        rp_lsh_topk_indexed_batch(
            spark, sig_dir, vectors, "vec_id", "embedding", [], k=5
        ).count()
        == 0
    )
