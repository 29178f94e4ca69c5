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


def _per_doc_tf(
    docs: DataFrame, terms: list[str], id_col: str, text_col: str
) -> DataFrame:
    """ONE tokenize pass: per-doc ``(doc_id, dl, _tf0.._tfN)`` for sorted
    ``terms``.  Both the field statistics aggregate and the scoring
    projection read this frame — persist it so the corpus is tokenized once
    per field, not once per consumer."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokenize_column(F.col(text_col))).alias("term"),
    )
    # count("term") skips the explode_outer null: empty docs get dl=0 but
    # still count toward N (BM25's N is ALL docs)
    return toks.groupBy("doc_id").agg(
        F.count("term").alias("dl"),
        *[
            F.count(F.when(F.col("term") == F.lit(t), True)).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )


def _field_stats(per_doc: DataFrame, n_terms: int):
    """(n_docs, avgdl, idfs) from one scalar aggregation over ``per_doc``."""
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(n_terms)
        ],
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        return 0, 0.0, []
    avgdl = float(stats["total"]) / n_docs
    idfs = [
        math.log(
            1.0
            + (n_docs - int(stats[f"_df{i}"]) + 0.5) / (int(stats[f"_df{i}"]) + 0.5)
        )
        for i in range(n_terms)
    ]
    return n_docs, avgdl, idfs


def _field_score_frame(
    per_doc: DataFrame, idfs: list[float], avgdl: float, params: bm25.Bm25Params
) -> DataFrame:
    """(doc_id, score) over every matching doc — the scoring projection."""
    dl_d = F.col("dl").cast("double")
    norm = F.lit(params.k1) * (
        F.lit(1.0) - F.lit(params.b) + F.lit(params.b) * dl_d / F.lit(avgdl)
    )
    score = F.lit(0.0)
    matched = F.lit(False)
    for i in range(len(idfs)):  # sorted terms => deterministic fold order
        tf_d = F.col(f"_tf{i}").cast("double")
        score = score + F.lit(idfs[i]) * (tf_d / (tf_d + norm))
        matched = matched | (F.col(f"_tf{i}") > 0)
    return per_doc.where(matched).select("doc_id", score.alias("score"))


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

    NOTE: the lazy return means the tokenize+aggregate lineage re-runs on
    every downstream action (the stats pass here is one, the caller's is
    another).  ``multi_match_best_fields`` avoids that by persisting the
    per-doc tf frame; standalone callers with several actions should
    persist this result themselves.
    """
    terms = sorted(set(terms))
    if not terms:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    per_doc = _per_doc_tf(docs, terms, id_col, text_col)
    n_docs, avgdl, idfs = _field_stats(per_doc, len(terms))
    if n_docs == 0:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    return _field_score_frame(per_doc, idfs, avgdl, params)


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
    ``score = max over fields + tie_breaker * sum of the rest``.

    Plan shape (round 6): every field's tf/dl is computed IN-ROW on one
    shared projection — ``dl = size(tokens)``, ``tf(t) = size(tokens) −
    size(array_remove(tokens, t))``, all native array builtins with the
    tokenize subexpression CSE'd once per field — so the whole query is
    ONE tokenize pass over the corpus, independent of the field count.
    The numeric projection (1 + F·(T+1) longs per doc — orders of
    magnitude smaller than the text it summarizes) is persisted spillable
    for the duration of the query: the stats aggregate materializes it and
    the scoring projection + TakeOrderedAndProject reads the cached
    numbers instead of re-tokenizing the corpus (the lazy lineage used to
    re-run per action).  Zero shuffles either way.  The earlier shape ran
    per field an explode → groupBy(doc) shuffle TWICE (stats pass +
    scoring pass) and full-outer-joined the per-field frames: for F
    fields, 2F corpus scans, 2F shuffles and F−1 joins versus 1 scan and
    0 shuffles now.

    Scores are bit-identical: a zero-tf term contributes ``idf · 0/(0 +
    norm) = +0.0`` exactly (the old per-field sum included the same +0.0
    terms), and a doc that missed a field entirely scored ``coalesce(NULL,
    0.0)`` there — equal to the in-row field score ``Σ +0.0 = 0.0``.

    Assumes ``id_col`` is unique per row (the doc-id contract everywhere in
    this engine); duplicate ids would previously have been merged into one
    pseudo-doc by the groupBy, and now score per row.
    """
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1]: {tie_breaker}")
    if not fields:
        raise ValueError("need at least one field")
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = docs.sparkSession
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    nf, nt = len(fields), len(terms)
    proj_cols = [F.col(id_col).alias("doc_id")]
    for i, f in enumerate(fields):
        toks = tokenize_column(F.col(f))
        # CSE evaluates `toks` once per row per field within this Project
        proj_cols.append(F.coalesce(F.size(toks), F.lit(0)).alias(f"_dl{i}"))
        for j, t in enumerate(terms):
            tf = F.size(toks) - F.size(F.array_remove(toks, t))
            proj_cols.append(F.coalesce(tf, F.lit(0)).alias(f"_tf{i}_{j}"))
    from pyspark import StorageLevel

    proj = docs.select(*proj_cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stats = proj.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.coalesce(F.sum(f"_dl{i}"), F.lit(0)).alias(f"_total{i}") for i in range(nf)],
            *[
                F.sum((F.col(f"_tf{i}_{j}") > 0).cast("long")).alias(f"_df{i}_{j}")
                for i in range(nf)
                for j in range(nt)
            ],
        ).collect()[0]
        n_docs = int(stats["n"])
        if n_docs == 0:
            return spark.createDataFrame([], "doc_id long, score double")

        field_scores = []
        matched = F.lit(False)
        for i in range(nf):
            avgdl = float(stats[f"_total{i}"]) / n_docs
            dl_d = F.col(f"_dl{i}").cast("double")
            norm = F.lit(params.k1) * (
                F.lit(1.0) - F.lit(params.b) + F.lit(params.b) * dl_d / F.lit(avgdl)
            )
            score_i = F.lit(0.0)
            for j in range(nt):  # sorted terms => deterministic fold order
                df_j = int(stats[f"_df{i}_{j}"])
                idf = math.log(1.0 + (n_docs - df_j + 0.5) / (df_j + 0.5))
                tf_d = F.col(f"_tf{i}_{j}").cast("double")
                score_i = score_i + F.lit(idf) * (tf_d / (tf_d + norm))
                matched = matched | (F.col(f"_tf{i}_{j}") > 0)
            field_scores.append(score_i)

        best = F.greatest(*field_scores) if nf > 1 else field_scores[0]
        total = field_scores[0]
        for c in field_scores[1:]:
            total = total + c
        score = best + F.lit(tie_breaker) * (total - best)
        result_schema = StructType(
            [
                StructField("doc_id", docs.schema[id_col].dataType),
                StructField("score", DoubleType()),
            ]
        )
        rows = (
            proj.where(matched)
            .select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        return spark.createDataFrame(
            [(r["doc_id"], r["score"]) for r in rows], result_schema
        )
    finally:
        proj.unpersist()


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
