"""BM25 formula + tokenizer + norm-quantization unit pins."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_aggregation_geoclustering_spark.functions import bm25
from elasticsearch_aggregation_geoclustering_spark.functions.tokenizer import (
    doc_term_frequencies,
    tokenize_pandas,
    tokenize_python,
)


def test_idf_formula():
    # ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene BM25
    assert bm25.idf(100, 10) == pytest.approx(math.log(1 + (100 - 10 + 0.5) / 10.5))
    assert float(bm25.idf(1, 1)) == pytest.approx(math.log(1 + 0.5 / 1.5))
    # idf decreasing in df
    assert float(bm25.idf(1000, 1)) > float(bm25.idf(1000, 500))


def test_tf_weight_saturates():
    w1 = float(bm25.tf_weight(1, 100, 100.0))
    w10 = float(bm25.tf_weight(10, 100, 100.0))
    w100 = float(bm25.tf_weight(100, 100, 100.0))
    assert w1 < w10 < w100 < 1.0


def test_tf_weight_length_normalization():
    # longer docs are penalized
    assert float(bm25.tf_weight(5, 50, 100.0)) > float(bm25.tf_weight(5, 500, 100.0))


def test_hand_computed_score():
    # one term, N=4, df=2, tf=3, dl=10, avgdl=8
    idf = math.log(1 + (4 - 2 + 0.5) / 2.5)
    tfw = 3 / (3 + 1.2 * (1 - 0.75 + 0.75 * 10 / 8))
    assert bm25.explain_score(tf=3, df=2, dl=10, n_docs=4, avgdl=8.0) == pytest.approx(idf * tfw)


def test_norm_quantization_properties():
    dl = np.arange(0, 100_000)
    q = bm25.quantize_doc_length(dl)
    # exact for small values
    assert (q[:24] == dl[:24]).all()
    # monotone non-decreasing, never above the true value's next bucket
    assert (np.diff(q) >= 0).all()
    assert (q <= dl).all()  # floor-style quantization
    # idempotent
    assert (bm25.quantize_doc_length(q) == q).all()
    # lossy above the exact range
    assert len(np.unique(q)) < len(np.unique(dl))


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_norm_quantization_idempotent(v):
    q = bm25.quantize_doc_length(np.array([v]))[0]
    assert bm25.quantize_doc_length(np.array([q]))[0] == q
    assert q <= v


# --- tokenizer ------------------------------------------------------------


def test_tokenizer_spec():
    assert tokenize_python("Hello, World! foo_bar x1 __init__") == [
        "hello", "world", "foo_bar", "x1", "__init__",
    ]
    assert tokenize_python("a.b(c)=d") == ["a", "b", "c", "d"]
    assert tokenize_python("") == []
    assert tokenize_python("!!!") == []


def test_tokenize_pandas_matches_python():
    texts = pd.Series(["Hello, World!", "def f(x): return x+1", "", None, "UPPER_case"])
    out = tokenize_pandas(texts)
    for i, t in enumerate(texts.fillna("")):
        assert list(out.iloc[i]) == tokenize_python(t)


def test_doc_term_frequencies():
    tf = doc_term_frequencies(pd.Series(["a b a", "b", ""]))
    got = {(r.row, r.term): r.tf for r in tf.itertuples()}
    assert got == {(0, "a"): 2, (0, "b"): 1, (1, "b"): 1}


# --- oracle scorer ---------------------------------------------------------


def _tiny_corpus():
    docs = {
        0: "spark query engine",
        1: "spark spark spark",
        2: "query planner for the engine",
        3: "unrelated text entirely",
    }
    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    dls = np.zeros(4, np.int64)
    from collections import Counter

    for d, text in docs.items():
        toks = tokenize_python(text)
        dls[d] = len(toks)
        for t, c in Counter(toks).items():
            ids, tfs = postings.get(t, (np.empty(0, np.int64), np.empty(0, np.int64)))
            postings[t] = (np.append(ids, d), np.append(tfs, c))
    return postings, dls


def test_oracle_topk_or_and():
    postings, dls = _tiny_corpus()
    avgdl = dls.mean()
    res = bm25.score_topk_numpy(postings, dls, 4, avgdl, ["spark", "query"], k=4)
    ids = [d for d, _ in res]
    assert set(ids) == {0, 1, 2}
    assert ids[0] == 0  # contains both terms, short doc

    res_and = bm25.score_topk_numpy(postings, dls, 4, avgdl, ["spark", "query"], k=4, mode="AND")
    assert [d for d, _ in res_and] == [0]

    # missing term: OR ignores, AND empties
    assert bm25.score_topk_numpy(postings, dls, 4, avgdl, ["spark", "zzz"], k=4, mode="AND") == []
    assert len(bm25.score_topk_numpy(postings, dls, 4, avgdl, ["spark", "zzz"], k=4)) == 2


def test_oracle_tie_break_by_doc_id():
    postings = {"t": (np.array([5, 2]), np.array([1, 1]))}
    dls = np.zeros(6, np.int64) + 3
    res = bm25.score_topk_numpy(postings, dls, 6, 3.0, ["t"], k=2)
    assert [d for d, _ in res] == [2, 5]
    assert res[0][1] == res[1][1]


def test_explain_contributions_sum_to_score(spark, tmp_path):
    """ES _explain parity: per-term contributions sum EXACTLY to the doc's
    search score (same expression tree, deterministic fold)."""
    from elasticsearch_aggregation_geoclustering_spark.plans.index_build import (
        build_index,
    )
    from elasticsearch_aggregation_geoclustering_spark.plans.query import InvertedIndex

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha"),
            (1, "alpha beta"),
            (2, "gamma delta alpha"),
            (3, "beta beta beta"),
        ],
        "orig_id long, text string",
    )
    d = str(tmp_path / "expidx")
    build_index(spark, docs, d, content_col="text", key_cols=("orig_id",), docs_per_segment=2)
    idx = InvertedIndex.open(spark, d)
    terms = ["alpha", "beta", "gamma"]
    for row in idx.search(terms, k=10).collect():
        exp = idx.explain(row["doc_id"], terms).collect()
        assert exp, row
        # deterministic fold order in search = sorted by term; python sum
        # over the sorted terms reproduces it bit for bit
        total = 0.0
        for e in sorted(exp, key=lambda r: r["term"]):
            total += e["contribution"]
        assert total == row["score"], (row, exp)
    # absent term contributes nothing; unknown doc -> empty
    assert idx.explain(10**9, terms).count() == 0
    only_missing = idx.explain(0, ["zzz_absent"])
    assert only_missing.count() == 0
