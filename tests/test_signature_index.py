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


# --- banded persisted layout -------------------------------------------------


def _real_embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_banded_probe_matches_numpy_reference(spark, vectors):
    """Banded candidates = vectors agreeing on >= 1 band key; the probe's
    exact-scored top-k must equal a numpy implementation of that set."""
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        rp_band_topk_indexed,
        rp_planes,
    )

    d = tempfile.mkdtemp(prefix="bandidx_")
    try:
        build_signature_index(
            vectors, "vec_id", "embedding", d, n_planes=32, seed=42, bands=4
        )
        rows = sorted(
            (r["vec_id"], r["embedding"]) for r in vectors.collect()
        )
        M = np.array([v for _, v in rows], dtype=np.float64)
        ids = np.array([i for i, _ in rows], dtype=np.int64)
        planes = rp_planes(M.shape[1], 32, 42)
        bits = ((M @ planes.T) > 0).astype(np.int64)
        keys = bits.reshape(len(M), 4, 8) @ (1 << np.arange(8, dtype=np.int64))
        rng = np.random.default_rng(3)
        for _ in range(3):
            q = rng.normal(size=M.shape[1])
            qb = ((planes @ q) > 0).astype(np.int64)
            qk = qb.reshape(4, 8) @ (1 << np.arange(8, dtype=np.int64))
            cand = np.flatnonzero((keys == qk).any(axis=1))
            norm = np.linalg.norm
            cos = (M[cand] @ q) / (norm(M[cand], axis=1) * norm(q))
            order = np.lexsort((ids[cand], -cos))[:5]
            expect = [(int(ids[cand][i]), float(cos[i])) for i in order]
            got = rp_band_topk_indexed(
                spark, d, vectors, "vec_id", "embedding", [float(x) for x in q], k=5
            ).collect()
            assert [(r["vec_id"], round(r["cosine"], 9)) for r in got] == [
                (i, round(c, 9)) for i, c in expect
            ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_banded_recall_at_equal_budget(spark):
    """The banded probe's recall@20 must be >= the hamming probe's on the
    real sf0.01 embeddings WITHOUT a larger candidate budget — the
    recall-at-scale claim, measured not asserted from theory.

    Parameters: hamming = 16 planes, h<=3 (~1.1% expected random-candidate
    rate, measured 7.7 candidates/probe here); banded = 24 planes x 3 bands
    (8-bit keys, 3/256 ~ 1.2%, measured 7.5 candidates/probe — the same
    budget, slightly SMALLER).  Everything is deterministic (fixed planes
    seed, fixed probe set, fixed data), so this is a pinned measurement,
    not a statistical assertion."""
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        rp_band_topk_indexed,
    )

    emb = _real_embeddings(spark)
    rows = sorted((r["vec_id"], r["embedding"]) for r in emb.collect())
    M = np.array([v for _, v in rows], dtype=np.float64)
    ids = np.array([i for i, _ in rows], dtype=np.int64)
    nrm = M / np.linalg.norm(M, axis=1, keepdims=True)

    dh = tempfile.mkdtemp(prefix="hamidx_")
    db = tempfile.mkdtemp(prefix="bandidx_")
    try:
        build_signature_index(emb, "vec_id", "embedding", dh, n_planes=16, seed=42)
        build_signature_index(
            emb, "vec_id", "embedding", db, n_planes=24, seed=42, bands=3
        )
        k = 20
        rng = np.random.default_rng(0)
        probe_ids = rng.choice(ids, 12, replace=False)
        rec_h, rec_b = [], []
        for pid in probe_ids:
            qi = int(np.flatnonzero(ids == pid)[0])
            q = [float(x) for x in M[qi]]
            truth = ids[np.argsort(-(nrm @ nrm[qi]))]
            truth = [t for t in truth if t != pid][:k]
            got_h = [
                r["vec_id"]
                for r in rp_lsh_topk_indexed(
                    spark, dh, emb, "vec_id", "embedding", q, k=k + 1,
                    max_probe_hamming=3,
                ).collect()
                if r["vec_id"] != pid
            ][:k]
            got_b = [
                r["vec_id"]
                for r in rp_band_topk_indexed(
                    spark, db, emb, "vec_id", "embedding", q, k=k + 1
                ).collect()
                if r["vec_id"] != pid
            ][:k]
            rec_h.append(len(set(got_h) & set(truth)) / k)
            rec_b.append(len(set(got_b) & set(truth)) / k)
        assert sum(rec_b) >= sum(rec_h)
        # the candidate budget really is equal-or-smaller for the banded
        # probe (mirror of the probes' pushed filters, computed in numpy)
        from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
            rp_planes,
        )

        ph = rp_planes(M.shape[1], 16, 42)
        bits_h = (M @ ph.T) > 0
        pb = rp_planes(M.shape[1], 24, 42)
        bits_b = ((M @ pb.T) > 0).astype(np.int64)
        keys = bits_b.reshape(len(M), 3, 8) @ (1 << np.arange(8, dtype=np.int64))
        cand_h = cand_b = 0
        for pid in probe_ids:
            qi = int(np.flatnonzero(ids == pid)[0])
            cand_h += int(((bits_h != bits_h[qi]).sum(1) <= 3).sum())
            cand_b += int((keys == keys[qi]).any(axis=1).sum())
        assert cand_b <= cand_h
    finally:
        shutil.rmtree(dh, ignore_errors=True)
        shutil.rmtree(db, ignore_errors=True)


def test_band_probe_requires_banded_layout(spark, vectors, sig_dir):
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        rp_band_topk_indexed,
    )

    with pytest.raises(ValueError, match="banded layout"):
        rp_band_topk_indexed(
            spark, sig_dir, vectors, "vec_id", "embedding", [0.0] * 16, k=5
        )


def test_wide_planes_require_bands(spark, vectors):
    d = tempfile.mkdtemp(prefix="wideidx_")
    try:
        with pytest.raises(ValueError, match="banded layout"):
            build_signature_index(
                vectors, "vec_id", "embedding", d, n_planes=128, seed=42
            )
        # with bands it works, and skips the unpackable signatures table
        build_signature_index(
            vectors, "vec_id", "embedding", d, n_planes=128, seed=42, bands=8
        )
        import os

        assert os.path.isdir(os.path.join(d, "bands"))
        assert not os.path.isdir(os.path.join(d, "signatures"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- IVF-flat ----------------------------------------------------------------


def test_ivf_full_probe_equals_bruteforce(spark, vectors):
    """nprobe = n_lists scans every list → must equal brute-force top-k."""
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk,
    )

    d = tempfile.mkdtemp(prefix="ivfidx_")
    try:
        build_ivf_index(vectors, "vec_id", "embedding", d, n_lists=8)
        rng = np.random.default_rng(9)
        for _ in range(3):
            q = [float(x) for x in rng.normal(size=16)]
            want = [
                (r["vec_id"], round(r["cosine"], 9))
                for r in cosine_topk(vectors, "vec_id", "embedding", q, 7).collect()
            ]
            got = [
                (r["vec_id"], round(r["cosine"], 9))
                for r in ivf_topk(spark, d, q, k=7, nprobe=8).collect()
            ]
            assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_partial_probe_matches_numpy_mirror(spark, vectors):
    """nprobe < n_lists: candidates = members of the nprobe nearest lists,
    reproduced independently in numpy (same centers-by-smallest-id rule)."""
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        build_ivf_index,
        ivf_topk,
    )

    d = tempfile.mkdtemp(prefix="ivfidx2_")
    try:
        n_lists, nprobe, k = 8, 3, 6
        build_ivf_index(vectors, "vec_id", "embedding", d, n_lists=n_lists)
        rows = sorted((r["vec_id"], r["embedding"]) for r in vectors.collect())
        ids = np.array([i for i, _ in rows])
        M = np.array([v for _, v in rows], dtype=np.float64)
        cmat = M[np.argsort(ids)[:n_lists]]  # smallest ids are the centers
        nrm = lambda A: A / np.linalg.norm(A, axis=-1, keepdims=True)
        assign = np.argmax(nrm(M) @ nrm(cmat).T, axis=1)
        rng = np.random.default_rng(5)
        for _ in range(3):
            q = rng.normal(size=16)
            probe = np.argsort(-(nrm(cmat) @ q / np.linalg.norm(q)), kind="stable")[:nprobe]
            cand = np.isin(assign, probe)
            cos = nrm(M[cand]) @ (q / np.linalg.norm(q))
            order = np.lexsort((ids[cand], -cos))[:k]
            want = [(int(ids[cand][i]), round(float(cos[i]), 9)) for i in order]
            got = [
                (r["vec_id"], round(r["cosine"], 9))
                for r in ivf_topk(spark, d, [float(x) for x in q], k=k, nprobe=nprobe).collect()
            ]
            assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_probe_prunes_scan_and_errors(spark, vectors):
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        build_ivf_index,
        ivf_topk,
    )

    d = tempfile.mkdtemp(prefix="ivfidx3_")
    try:
        build_ivf_index(vectors, "vec_id", "embedding", d, n_lists=8)
        df = ivf_topk(spark, d, [0.1] * 16, k=5, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "In(list_id" in plan or "list_id IN" in plan  # pushed probe
        with pytest.raises(ValueError, match="dim"):
            ivf_topk(spark, d, [0.1] * 7, k=5)
        with pytest.raises(ValueError, match="IVF"):
            bad = tempfile.mkdtemp(prefix="notivf_")
            try:
                import json
                import os

                with open(os.path.join(bad, "meta.json"), "w") as fh:
                    json.dump({"kind": "other"}, fh)
                ivf_topk(spark, bad, [0.1] * 16, k=5)
            finally:
                shutil.rmtree(bad, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_kmeans_balances_clustered_corpus(spark):
    """Deterministic Lloyd refinement (kmeans_rounds): on a corpus whose
    smallest-id vectors ALL sit in one cluster, id-order seeding funnels
    the other cluster's mass through one giant list; two k-means rounds
    separate the centers, shrinking the largest list — measured via
    ivf_list_stats, not assumed.  Full-probe exactness and determinism
    must survive refinement."""
    from elasticsearch_aggregation_geoclustering_spark.extras.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_list_stats,
        ivf_topk,
    )

    rng = np.random.default_rng(7)
    # ids 0..3 (the n_lists=2 seeds) all in cluster A around +e0; ids 40+
    # in cluster B around +e1
    a = rng.normal(scale=0.05, size=(40, 8)) + np.array([1.0] + [0.0] * 7)
    b = rng.normal(scale=0.05, size=(40, 8)) + np.array([0.0, 1.0] + [0.0] * 6)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(list(a) + list(b))]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    d0 = tempfile.mkdtemp(prefix="ivfseed_")
    d1 = tempfile.mkdtemp(prefix="ivfkm_")
    d2 = tempfile.mkdtemp(prefix="ivfkm2_")
    try:
        build_ivf_index(vecs, "vec_id", "embedding", d0, n_lists=2)
        build_ivf_index(vecs, "vec_id", "embedding", d1, n_lists=2, kmeans_rounds=2)
        sizes0 = {r["list_id"]: r["n_vecs"] for r in ivf_list_stats(spark, d0).collect()}
        sizes1 = {r["list_id"]: r["n_vecs"] for r in ivf_list_stats(spark, d1).collect()}
        # seeded-only: both seeds in cluster A -> cluster B all lands in one
        # list (80-vector corpus, worst list >= 40); refined: 40/40 split
        assert max(sizes0.values()) > max(sizes1.values())
        assert sorted(sizes1.values()) == [40, 40]
        # nprobe=1 from a cluster-B query now scans ~half the corpus
        qb = [0.0, 1.0] + [0.0] * 6
        want = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in cosine_topk(vecs, "vec_id", "embedding", qb, 5).collect()
        ]
        got1 = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ivf_topk(spark, d1, qb, k=5, nprobe=1).collect()
        ]
        assert got1 == want  # cluster B is one pure list after refinement
        # full probe stays exact after refinement
        got_full = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ivf_topk(spark, d1, qb, k=5, nprobe=2).collect()
        ]
        assert got_full == want
        # determinism: a rebuild is byte-for-byte the same assignment
        build_ivf_index(vecs, "vec_id", "embedding", d2, n_lists=2, kmeans_rounds=2)
        l1 = sorted(
            map(tuple, spark.read.parquet(d1 + "/lists").select("list_id", "vec_id").collect())
        )
        l2 = sorted(
            map(tuple, spark.read.parquet(d2 + "/lists").select("list_id", "vec_id").collect())
        )
        assert l1 == l2
        import pytest as _pytest

        with _pytest.raises(ValueError, match="kmeans_rounds"):
            build_ivf_index(vecs, "vec_id", "embedding", d2, n_lists=2, kmeans_rounds=-1)
    finally:
        shutil.rmtree(d0, ignore_errors=True)
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
