"""Size-aware (tiered) segment merge planning — H4's incremental story.

After uneven ``append_index`` batches the segment size distribution is
skewed; ``tiered_merge_buckets`` must pack contiguous seg_id runs by size
(so giants aren't rewritten to absorb mites), and ``merge_segments`` over
the resulting plan must produce an index that answers every query
identically — including a SECOND merge over the merged dir (the contiguity
rule exists exactly so the docID-order invariant survives compaction
chains).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from elasticsearch_aggregation_geoclustering_spark.plans.index_build import (
    append_index,
    build_index,
    merge_segments,
    tiered_merge_buckets,
)
from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex
from elasticsearch_aggregation_geoclustering_spark.sources.segments import (
    load_manifest,
    load_manifest_parts,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _doc(i: int, n_words: int) -> tuple[int, str]:
    return (i, " ".join(WORDS[(i + j) % len(WORDS)] for j in range(n_words)))


@pytest.fixture()
def uneven_index(spark):
    d = tempfile.mkdtemp(prefix="tiered_")
    # base build: 16 docs -> 8 segments of 2 docs
    base = spark.createDataFrame([_doc(i, 6) for i in range(16)], "orig_id long, text string")
    build_index(spark, base, d, content_col="text", key_cols=("orig_id",), docs_per_segment=2)
    # two appends: one LARGE batch (fat segments), one tiny
    big = spark.createDataFrame(
        [_doc(i, 40) for i in range(100, 112)], "orig_id long, text string"
    )
    append_index(spark, big, d, content_col="text", key_cols=("orig_id",))
    tiny = spark.createDataFrame([_doc(200, 3)], "orig_id long, text string")
    append_index(spark, tiny, d, content_col="text", key_cols=("orig_id",))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _seg_sizes(d):
    manifest = load_manifest(d)
    segs = {int(s): int(m["postings_bytes"]) for s, m in manifest.segments.items()}
    for s, m in load_manifest_parts(d).items():
        segs.setdefault(int(s), int(m["postings_bytes"]))
    return segs


def test_tiered_buckets_contiguous_and_size_bounded(spark, uneven_index):
    sizes = _seg_sizes(uneven_index)
    cap = max(sizes.values())  # every single segment fits; giants = none
    buckets = tiered_merge_buckets(uneven_index, fanin=4, max_merged_bytes=cap)
    assert set(buckets) == set(sizes)
    # contiguous nondecreasing over seg_id order
    ordered = [buckets[s] for s in sorted(buckets)]
    assert ordered == sorted(ordered)
    # every bucket obeys both bounds (singleton giants exempt from the cap)
    from collections import defaultdict

    groups = defaultdict(list)
    for s, b in buckets.items():
        groups[b].append(s)
    for members in groups.values():
        assert len(members) <= 4
        if len(members) > 1:
            assert sum(sizes[s] for s in members) <= cap


def test_tiered_giant_stays_singleton(spark, uneven_index):
    sizes = _seg_sizes(uneven_index)
    # choose a cap below the fattest segment: it must become a singleton
    cap = max(sizes.values())
    buckets = tiered_merge_buckets(uneven_index, fanin=8, max_merged_bytes=cap - 1)
    from collections import defaultdict

    groups = defaultdict(list)
    for s, b in buckets.items():
        groups[b].append(s)
    for members in groups.values():
        if any(sizes[s] >= cap - 1 for s in members):
            assert len(members) == 1


def test_tiered_merge_roundtrip_and_chain(spark, uneven_index):
    src = InvertedIndex.open(spark, uneven_index)
    probes = (["alpha"], ["beta", "gamma"], ["delta"])
    want = {
        " ".join(t): sorted(
            (r["doc_id"], round(r["score"], 6)) for r in src.search(t, k=20).collect()
        )
        for t in probes
    }
    sizes = _seg_sizes(uneven_index)
    buckets = tiered_merge_buckets(
        uneven_index, fanin=4, max_merged_bytes=max(sizes.values())
    )
    out1 = tempfile.mkdtemp(prefix="tiered_m1_")
    out2 = tempfile.mkdtemp(prefix="tiered_m2_")
    try:
        merge_segments(spark, uneven_index, out1, buckets=buckets)
        m1 = InvertedIndex.open(spark, out1)
        for t in probes:
            got = sorted(
                (r["doc_id"], round(r["score"], 6)) for r in m1.search(t, k=20).collect()
            )
            assert got == want[" ".join(t)]
        # a second (plain fanin) merge over the merged dir still works —
        # the contiguity rule kept doc ranges ordered
        merge_segments(spark, out1, out2, fanin=8)
        m2 = InvertedIndex.open(spark, out2)
        for t in probes:
            got = sorted(
                (r["doc_id"], round(r["score"], 6)) for r in m2.search(t, k=20).collect()
            )
            assert got == want[" ".join(t)]
        # phrase queries survive the chain (positions re-concatenated)
        assert m2.phrase_match_count(["alpha", "beta"]) == src.phrase_match_count(
            ["alpha", "beta"]
        )
    finally:
        shutil.rmtree(out1, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)


def test_non_contiguous_buckets_rejected(spark, uneven_index):
    sizes = _seg_sizes(uneven_index)
    sids = sorted(sizes)
    bad = {s: i % 2 for i, s in enumerate(sids)}  # alternating -> decreasing run
    out = tempfile.mkdtemp(prefix="tiered_bad_")
    try:
        with pytest.raises(ValueError, match="nondecreasing contiguous"):
            merge_segments(spark, uneven_index, out, buckets=bad)
    finally:
        shutil.rmtree(out, ignore_errors=True)
