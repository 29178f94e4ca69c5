"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All pure JVM column expressions over the pinned tokenizer
(functions/tokenizer.py) — whole-stage codegen end to end, zero shuffles
(every op is a per-row projection).  Deterministic by construction so the
DuckDB oracle reproduces each output exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_column

#: tiny pinned stopword lists per language for the n-gram/stopword-vote
#: heuristic language ID.  Order matters: ties resolve to the first listed.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "y", "que", "los", "una"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
}

#: generic stopwords for the quality score (English-centric, pinned)
QUALITY_STOPWORDS: tuple[str, ...] = tuple(sorted(set(LANG_STOPWORDS["en"] + ("it", "on", "for"))))


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace+punctuation token count per doc: ``(doc_id, n_tokens)``."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_column(F.col(text_col))).alias("n_tokens"),
    )


def _in_set(tok: Column, words: tuple[str, ...]) -> Column:
    return tok.isin(*words)


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features for corpus filtering.

    ``(doc_id, n_chars, n_tokens, uniq_token_ratio, mean_token_len,
    stopword_ratio, alnum_ratio)`` — ratios are exact rationals of ints, so
    they hash-match the SQL oracle bit-for-bit.
    """
    text = F.col(text_col)
    toks = tokenize_column(text)
    n_tokens = F.size(toks)
    n_tokens_d = n_tokens.cast("double")
    uniq = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    stop = F.size(F.filter(toks, lambda t: _in_set(t, QUALITY_STOPWORDS)))
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, uniq.cast("double") / n_tokens_d).otherwise(F.lit(0.0)).alias("uniq_token_ratio"),
        F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens_d).otherwise(F.lit(0.0)).alias("mean_token_len"),
        F.when(n_tokens > 0, stop.cast("double") / n_tokens_d).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(
            F.length(text) > 0, alnum.cast("double") / F.length(text).cast("double")
        ).otherwise(F.lit(0.0)).alias("alnum_ratio"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID by stopword vote: ``(doc_id, lang_guess)``.

    Scores each pinned language's stopword hits over the token array; the
    winner is the highest count with ties resolved to the lexicographically
    first language code; zero hits anywhere → ``und``.
    """
    toks = tokenize_column(F.col(text_col))

    def _counter(words: tuple[str, ...]):
        return lambda t: _in_set(t, words)

    scores = {
        lang: F.size(F.filter(toks, _counter(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = sorted(LANG_STOPWORDS)  # lexicographic = tie-break order
    best = F.greatest(*[scores[lang] for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(guess)
    return df.select(F.col(id_col).alias("doc_id"), guess.alias("lang_guess"))


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized document fingerprint: md5 over the sorted distinct token
    set — invariant to token order and repetition (the classic
    "fingerprint" dedup key): ``(doc_id, fp)``."""
    toks = tokenize_column(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp"),
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-LM quality score: mean unigram log-probability per doc.

    The standard language-model quality filter shape (a doc whose tokens are
    all corpus-common scores high; gibberish or off-domain docs score low),
    with the corpus ITSELF as the model: p(t) = count(t) / total_tokens over
    the whole input.

    Returns ``(doc_id, n_tokens, mean_logprob)`` with mean_logprob = 0.0 for
    empty docs.  Plan: one explode → per-(doc, term) counts → broadcast-able
    join against the global term-frequency table (itself one groupBy over
    the same exploded rows) → per-doc weighted mean.  Two shuffles over
    (doc, term) rows, never over raw text; at corpus scale the global term
    table is the only broadcast-or-shuffle-join decision, which AQE sizes.

    ``ln`` of an exact integer ratio on both engines — the DuckDB oracle
    matches at rounding level (see __spark_entry__).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_column(F.col(text_col))).alias("term"),
    )
    doc_tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    global_tf = doc_tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    # total token count rides a scalar subplan via a broadcast cross join of
    # the 1-row aggregate (no driver action needed)
    total_df = doc_tf.agg(F.sum("tf").alias("total"))
    scored = (
        doc_tf.join(global_tf, on="term")
        .crossJoin(F.broadcast(total_df))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(
                    F.col("tf").cast("double")
                    * F.log(F.col("ctf").cast("double") / F.col("total").cast("double"))
                )
                / F.sum("tf")
            ).alias("mean_logprob"),
        )
    )
    # docs with zero tokens never reach the explode: re-join to keep them
    all_ids = df.select(F.col(id_col).alias("doc_id"))
    return all_ids.join(scored, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("mean_logprob"), F.lit(0.0)).alias("mean_logprob"),
    )
