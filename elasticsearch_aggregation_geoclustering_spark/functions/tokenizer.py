"""The engine's analyzer: a pinned, deterministic code-aware tokenizer (H2).

Spec (documented so the SQL oracle and the numpy oracle can reproduce it
exactly — determinism is required for BM25 rank-identity, SURVEY.md §7):

* lowercase the text,
* tokens are maximal runs of ``[a-z0-9_]`` (so identifiers like ``snake_case``
  stay whole, and punctuation/operators split — suited to source code),
* empty tokens dropped; no stemming, no stopwords, no length cap.

Equivalent DuckDB SQL::

    unnest(string_split_regex(lower(text), '[^a-z0-9_]+'))  ... WHERE tok <> ''

Equivalent Spark SQL (JVM-side, used on the hot path)::

    explode(split(lower(text), '[^a-z0-9_]+'))  ... WHERE tok <> ''
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: bump when the tokenizer spec changes; recorded in index manifests
TOKENIZER_VERSION = "code-v1"

TOKEN_SPLIT_REGEX = "[^a-z0-9_]+"
_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def tokenize_column(text: Column) -> Column:
    """Array-of-tokens column using only JVM built-ins (no Python)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_REGEX), lambda t: t != "")


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized pandas tokenization: Series[str] -> Series[list[str]]."""
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def doc_term_frequencies(texts: pd.Series) -> pd.DataFrame:
    """Per-document term frequencies for a batch of texts.

    Returns a DataFrame ``(row, term, tf)`` where ``row`` is the positional
    index into ``texts``; plus doc length is ``groupby(row).tf.sum()``.
    All pandas/numpy column ops — no per-row Python loop.
    """
    tokens = tokenize_pandas(texts.reset_index(drop=True))
    exploded = tokens.explode().dropna()
    if exploded.empty:
        return pd.DataFrame({"row": np.empty(0, np.int64), "term": [], "tf": np.empty(0, np.int64)})
    rows = exploded.index.to_numpy(np.int64)
    # factorize(sort=True) + packed-key bincount ≈ 5-10x faster than an
    # object-dtype groupby; output order (row asc, term asc) is identical
    codes, uniques = pd.factorize(exploded.to_numpy(), sort=True)
    n_terms = len(uniques)
    pair = rows * np.int64(n_terms) + codes
    uk, tf = np.unique(pair, return_counts=True)
    return pd.DataFrame(
        {
            "row": uk // n_terms,
            "term": uniques[uk % n_terms],
            "tf": tf.astype(np.int64),
        }
    )


def pack_term_frequencies(texts: pd.Series) -> pd.DataFrame:
    """Per-doc packed term frequencies in shuffle-friendly FLAT form.

    Returns a DataFrame with one row per input text::

        terms_blob : str    space-joined sorted-unique tokens ("" if none)
        tfs_vb     : bytes  LEB128 varbyte of the aligned tf counts
        n_terms    : int64  number of distinct terms

    This is what the index build ships through its shuffle instead of raw
    content: repeated tokens collapse to (term, count) before any wire, and
    the flat encoding avoids per-token Python objects on both the Arrow
    serialize and deserialize sides (a list<string> column would materialize
    every token as a Python object twice).  Tokens match ``[a-z0-9_]+`` so a
    single space is an unambiguous separator.
    """
    from . import codec

    tf = doc_term_frequencies(texts)
    n = len(texts)
    nt = np.zeros(n, dtype=np.int64)
    if tf.empty:
        return pd.DataFrame(
            {"terms_blob": [""] * n, "tfs_vb": [b""] * n, "n_terms": nt}
        )
    rows = tf["row"].to_numpy(np.int64)
    nt = np.bincount(rows, minlength=n).astype(np.int64)
    bounds = np.cumsum(nt)[:-1]
    chunks = np.split(tf["term"].to_numpy(), bounds)
    blobs = [" ".join(c) for c in chunks]  # one join per doc, not per token
    buf, ends = codec.varbyte_encode_all(tf["tf"].to_numpy(np.uint64))
    cum = np.cumsum(nt)
    byte_ends = np.where(cum > 0, ends[np.maximum(cum - 1, 0)], 0)
    byte_starts = np.concatenate(([0], byte_ends[:-1]))
    tfs_vb = [buf[s:e].tobytes() for s, e in zip(byte_starts, byte_ends)]
    return pd.DataFrame({"terms_blob": blobs, "tfs_vb": tfs_vb, "n_terms": nt})


def packed_term_frequencies(
    blobs: pd.Series, tfs_vb: pd.Series, n_terms: pd.Series
) -> pd.DataFrame:
    """Rebuild the (row, term, tf) frame from the flat packed columns.

    Inverse of ``pack_term_frequencies`` — same output shape and ordering as
    ``doc_term_frequencies`` (row asc, term asc within row), so the segment
    builder is agnostic to whether it got raw text or packed rows.  One
    string split and one varbyte decode per batch — no per-token Python.
    """
    from . import codec

    nt = n_terms.to_numpy(np.int64)
    total = int(nt.sum())
    if total == 0:
        return pd.DataFrame(
            {"row": np.empty(0, np.int64), "term": [], "tf": np.empty(0, np.int64)}
        )
    nonempty = nt > 0
    joined = " ".join(blobs.to_numpy()[nonempty])
    term_flat = np.array(joined.split(" "), dtype=object)
    rows = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
    tf_flat = codec.varbyte_decode(b"".join(tfs_vb)).astype(np.int64)
    return pd.DataFrame({"row": rows, "term": term_flat, "tf": tf_flat})


def tokenize_python(text: str) -> list[str]:
    """Scalar tokenizer for oracles and tests."""
    return _TOKEN_RE.findall(text.lower())
