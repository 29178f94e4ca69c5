"""Sloppy phrase matching (Lucene match_phrase + slop, H5).

Pins the engine's documented sloppy-phrase definition against an independent
brute-force Python matcher on fixture text, and pins slop=0 ≡ the exact
phrase path.  The definition (see InvertedIndex._sloppy_phrase_occurrences):
occurrence at start p iff every phrase offset i has an occurrence of its
term at doc position d with p ≤ d−i ≤ p+slop, min adjusted position = p,
and every term covers its offsets with ≥ multiplicity distinct positions;
matchLength = max over terms of (min adj) − p, weight = 1/(1+matchLength).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from elasticsearch_aggregation_geoclustering_spark.functions.tokenizer import (
    tokenize_python,
)
from elasticsearch_aggregation_geoclustering_spark.plans.index_build import build_index
from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

DOCS = [
    (0, "alpha beta gamma delta"),          # exact "alpha beta"; "alpha gamma" at slop>=1
    (1, "beta alpha"),                       # reversed: "alpha beta" needs slop 2
    (2, "alpha x beta"),                     # one gap: slop 1
    (3, "alpha x x beta alpha beta"),        # gap 2 + exact occurrence
    (4, "beta beta alpha"),                  # repeats in doc
    (5, "alpha beta alpha"),                 # repeated-term phrase fixture
    (6, "gamma delta epsilon"),              # no alpha at all
    (7, "alpha alpha beta"),                 # adjacent repeat
]


def brute_occurrences(tokens: list[str], phrase: list[str], slop: int):
    """Independent implementation of the documented definition."""
    k = len(phrase)
    mult = Counter(phrase)
    # adjusted positions and starts may be negative (Lucene reorderings)
    hits = []  # (off, term, pos, adj)
    for off, t in enumerate(phrase):
        for pos, tok in enumerate(tokens):
            if tok == t:
                hits.append((off, t, pos, pos - off))
    out = []
    cands = sorted({s for (_, _, _, adj) in hits for s in range(adj - slop, adj + 1)})
    for p in cands:
        grp = [h for h in hits if p <= h[3] <= p + slop]
        if {h[0] for h in grp} != set(range(k)):
            continue
        if min(h[3] for h in grp) != p:
            continue
        per_term_pos = defaultdict(set)
        tmin: dict[str, int] = {}
        for off, t, pos, adj in grp:
            per_term_pos[t].add(pos)
            tmin[t] = min(tmin.get(t, 1 << 60), adj)
        if any(len(per_term_pos[t]) < m for t, m in mult.items()):
            continue
        ml = max(tmin.values()) - p
        out.append((p, ml))
    return out


def brute_doc_stats(phrase: list[str], slop: int):
    L = math.lcm(*range(1, slop + 2))
    stats = {}
    for doc_id, text in DOCS:
        occ = brute_occurrences(tokenize_python(text), phrase, slop)
        if occ:
            stats[doc_id] = (len(occ), sum(L // (1 + ml) for _, ml in occ))
    return stats


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("slopidx"))
    docs = spark.createDataFrame(DOCS, "orig_id long, text string")
    build_index(
        spark, docs, d, content_col="text", key_cols=("orig_id",), docs_per_segment=3
    )
    return InvertedIndex.open(spark, d)


def _engine_stats(index, phrase, slop):
    occ = index._sloppy_phrase_occurrences(phrase, slop)
    dm = {r["doc_id"]: r["orig_id"] for r in index.docmap().collect()}
    return {
        dm[r["doc_id"]]: (r["ptf"], r["sfreq_scaled"]) for r in occ.collect()
    }


@pytest.mark.parametrize(
    "phrase,slop",
    [
        (["alpha", "beta"], 1),
        (["alpha", "beta"], 2),
        (["alpha", "beta"], 3),
        (["alpha", "gamma"], 1),
        (["beta", "alpha"], 2),           # reorder direction
        (["alpha", "beta", "gamma"], 2),  # 3-term
        (["alpha", "beta", "alpha"], 1),  # repeated term
        (["alpha", "beta", "alpha"], 2),
        (["alpha", "zzz_absent"], 2),     # unfillable position -> empty
    ],
)
def test_sloppy_matches_bruteforce(index, phrase, slop):
    assert _engine_stats(index, phrase, slop) == brute_doc_stats(phrase, slop)


def test_slop_zero_equals_exact_path(index):
    for phrase in (["alpha", "beta"], ["beta", "alpha"], ["alpha", "beta", "gamma"]):
        exact = {
            r["doc_id"]: r["ptf"]
            for r in index._phrase_occurrences(phrase).collect()
        }
        sloppy = {
            r["doc_id"]: r["ptf"]
            for r in index._sloppy_phrase_occurrences(phrase, 1).collect()
            if r["ptf"]
        }
        # slop=0 public surface routes to the exact path
        assert index.phrase_match_count(phrase, slop=0) == len(exact)
        del sloppy  # slop>=1 is a superset; pinned separately below


def test_slop_widens_monotonically(index):
    base = index.phrase_match_count(["alpha", "beta"], slop=0)
    widened = [index.phrase_match_count(["alpha", "beta"], slop=s) for s in (1, 2, 3)]
    assert base <= widened[0] <= widened[1] <= widened[2]
    # reversed-order doc 1 appears exactly at slop >= 2 (Lucene: transposition
    # costs 2)
    docs_s1 = set(_engine_stats(index, ["alpha", "beta"], 1))
    docs_s2 = set(_engine_stats(index, ["alpha", "beta"], 2))
    assert 1 not in docs_s1 and 1 in docs_s2


def test_phrase_search_sloppy_scores(index):
    res = index.phrase_search(["alpha", "beta"], k=10, slop=2).collect()
    assert res and all(res[i]["score"] >= res[i + 1]["score"] for i in range(len(res) - 1))
    # a doc with only a sloppier occurrence scores below an exact one of the
    # same length: doc 2 ("alpha x beta", ml=1) vs doc 1 ("beta alpha", ml=2)
    dm = {r["doc_id"]: r["orig_id"] for r in index.docmap().collect()}
    scores = {dm[r["doc_id"]]: r["score"] for r in res}
    assert scores[2] > scores[1]


def test_sloppy_phrase_excludes_tombstones(spark, index, tmp_path):
    """Sloppy matches ride the same _live() tombstone anti-join as every
    other query path — a deleted doc must drop out immediately."""
    import shutil

    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import (
        build_index,
        delete_docs,
    )

    d = str(tmp_path / "slopdel")
    docs = spark.createDataFrame(DOCS, "orig_id long, text string")
    build_index(
        spark, docs, d, content_col="text", key_cols=("orig_id",), docs_per_segment=3
    )
    idx = InvertedIndex.open(spark, d)
    before = _engine_stats(idx, ["alpha", "beta"], 2)
    assert 2 in before
    victim = [
        r["doc_id"] for r in idx.docmap().collect() if r["orig_id"] == 2
    ]
    delete_docs(spark, d, victim)
    idx2 = InvertedIndex.open(spark, d)
    after = _engine_stats(idx2, ["alpha", "beta"], 2)
    assert 2 not in after
    assert {k: v for k, v in before.items() if k != 2} == after
    shutil.rmtree(d, ignore_errors=True)


def test_slop_validation(index):
    """Round-4 advice: negative slop used to silently reverse the candidate
    F.sequence (wrong results); huge slop overflows the exact-integer
    lcm(1..slop+1) weights.  Both now fail loudly."""
    with pytest.raises(ValueError, match="slop must be >= 0"):
        index.phrase_match_count(["alpha", "beta"], slop=-1)
    with pytest.raises(ValueError, match="exceeds the supported maximum"):
        index.phrase_match_count(["alpha", "beta"], slop=33)
    with pytest.raises(ValueError, match="slop"):
        index.phrase_search(["alpha", "beta"], slop=-2)
    # the documented maximum itself still works and its lcm stays exact
    import math

    L = math.lcm(*range(1, 34))
    assert L < 2**53 and float(L) == L
    assert index.phrase_match_count(["alpha", "beta"], slop=32) >= 0
