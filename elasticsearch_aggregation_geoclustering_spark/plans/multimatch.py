"""ES ``multi_match`` (best_fields / dis_max) — per-field BM25 combined.

ES scores each field with that FIELD's own statistics (per-field postings,
df, avgdl) and combines per-doc with Lucene's DisjunctionMaxQuery:

    score(doc) = max_f s_f(doc) + tie_breaker * sum_{f != argmax} s_f(doc)

``tie_breaker=0`` is pure dis_max (best_fields default); ``1`` degenerates to
a bool-OR sum (most_fields-ish).

Spark shape: one tokenize+aggregate pass per field (per-field stats are the
point — same work ES's per-field inverted lists represent), then a single
full-outer join on doc id and a codegen'd combine expression.  Each field
pass is one shuffle on doc id; the join co-partitions on the same key, so
AQE usually plans it shuffle-free after the aggs.  Nothing collects besides
two scalar stats rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bm25
from ..functions.tokenizer import tokenize_column

__all__ = ["score_field", "multi_match_best_fields", "dis_max"]


def score_field(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: bm25.Bm25Params = bm25.Bm25Params(),
) -> DataFrame:
    """Full per-field BM25 scoring: (doc_id, score) for EVERY matching doc.

    Same math and sorted-term fold order as ``InvertedIndex.search`` /
    ``bm25_search_docs``, but lazy and unlimited — the building block
    ``multi_match_best_fields`` combines.  ``text_col`` may be any string
    expression name already present on ``docs``.
    """
    terms = sorted(set(terms))
    if not terms:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokenize_column(F.col(text_col))).alias("term"),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count("term").alias("dl"),
        *[
            F.count(F.when(F.col("term") == F.lit(t), True)).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    avgdl = float(stats["total"]) / n_docs
    idfs = [
        math.log(
            1.0
            + (n_docs - int(stats[f"_df{i}"]) + 0.5) / (int(stats[f"_df{i}"]) + 0.5)
        )
        for i in range(len(terms))
    ]
    dl_d = F.col("dl").cast("double")
    norm = F.lit(params.k1) * (
        F.lit(1.0) - F.lit(params.b) + F.lit(params.b) * dl_d / F.lit(avgdl)
    )
    score = F.lit(0.0)
    matched = F.lit(False)
    for i in range(len(terms)):  # sorted terms => deterministic fold order
        tf_d = F.col(f"_tf{i}").cast("double")
        score = score + F.lit(idfs[i]) * (tf_d / (tf_d + norm))
        matched = matched | (F.col(f"_tf{i}") > 0)
    return per_doc.where(matched).select("doc_id", score.alias("score"))


def multi_match_best_fields(
    docs: DataFrame,
    terms: list[str],
    fields: list[str],
    *,
    id_col: str = "doc_id",
    k: int = 10,
    tie_breaker: float = 0.0,
    params: bm25.Bm25Params = bm25.Bm25Params(),
) -> DataFrame:
    """ES ``multi_match`` type ``best_fields``: top-k (doc_id, score) where
    ``score = max over fields + tie_breaker * sum of the rest``."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1]: {tie_breaker}")
    if not fields:
        raise ValueError("need at least one field")
    combined: DataFrame | None = None
    for i, f in enumerate(fields):
        sf = score_field(docs, terms, id_col=id_col, text_col=f, params=params).select(
            "doc_id", F.col("score").alias(f"_s{i}")
        )
        combined = sf if combined is None else combined.join(sf, on="doc_id", how="full")
    cols = [F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) for i in range(len(fields))]
    best = F.greatest(*cols) if len(cols) > 1 else cols[0]
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    score = best + F.lit(tie_breaker) * (total - best)
    return (
        combined.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def dis_max(
    scored_frames: list[DataFrame],
    *,
    tie_breaker: float = 0.0,
    k: int = 10,
) -> DataFrame:
    """ES ``dis_max`` compound query over ARBITRARY sub-queries (Lucene
    DisjunctionMaxQuery): each input frame is one sub-query's full scored
    hit set ``(doc_id, score)`` — a match, a phrase, a fuzzy expansion,
    anything — and a doc's final score is

        max(sub-scores) + tie_breaker * sum(the other sub-scores)

    over the sub-queries that matched it (ES semantics: a doc matches if ANY
    sub-query matches; missing sub-scores contribute nothing — NOT zero-
    imputed into the max, which matters only for negative scores that BM25
    never produces, so coalesce(0) is exact here).

    This differs from ``multi_match_best_fields`` (same combine, but that
    one derives its sub-queries as the SAME terms over different fields);
    ``dis_max`` is the general compound ES exposes directly.

    Scale: n−1 full-outer joins on doc_id — after each sub-query's agg the
    frames are already hash-partitioned on doc_id, so AQE plans the joins
    shuffle-free; the combine is one codegen'd projection; exact global
    top-k via TakeOrderedAndProject.
    """
    if not scored_frames:
        raise ValueError("need at least one sub-query frame")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1]: {tie_breaker}")
    combined: DataFrame | None = None
    for i, sf in enumerate(scored_frames):
        sf = sf.select("doc_id", F.col("score").alias(f"_q{i}"))
        combined = sf if combined is None else combined.join(sf, on="doc_id", how="full")
    cols = [F.coalesce(F.col(f"_q{i}"), F.lit(0.0)) for i in range(len(scored_frames))]
    best = F.greatest(*cols) if len(cols) > 1 else cols[0]
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    score = best + F.lit(tie_breaker) * (total - best)
    return (
        combined.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
