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

    This is the positions-FREE fast path (``index_options='freqs'`` builds):
    it skips ``doc_term_positions``'s extra per-occurrence work (the position
    arange and the stable argsort over every token occurrence) — only the
    factorize/unique pass over distinct (row, term) pairs runs.  Output rows
    and ordering are identical to ``doc_term_positions()[0]`` (pinned by
    tests/test_index_options.py).
    """
    empty = pd.DataFrame(
        {"row": np.empty(0, np.int64), "term": [], "tf": np.empty(0, np.int64)}
    )
    tokens = tokenize_pandas(texts.reset_index(drop=True))
    exploded = tokens.explode().dropna()
    if exploded.empty:
        return empty
    rows = exploded.index.to_numpy(np.int64)
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


def doc_term_positions(texts: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
    """Term frequencies PLUS token positions for a batch of texts.

    Returns ``(frame, pos_flat)``: ``frame`` is the ``(row, term, tf)``
    DataFrame of doc_term_frequencies, and ``pos_flat`` the 0-based token
    positions of every occurrence, concatenated in frame order — the
    positions of frame row i are ``pos_flat[cum_tf[i-1]:cum_tf[i]]``,
    ascending within each (row, term).  Same vectorized factorize/unique
    pass as before; positions cost one extra arange-difference.
    """
    empty = pd.DataFrame(
        {"row": np.empty(0, np.int64), "term": [], "tf": np.empty(0, np.int64)}
    )
    tokens = tokenize_pandas(texts.reset_index(drop=True))
    exploded = tokens.explode().dropna()
    if exploded.empty:
        return empty, np.empty(0, np.int64)
    rows = exploded.index.to_numpy(np.int64)
    # token position within its doc: explode preserves per-row order, so the
    # position is the global index minus the row's first global index
    idx = np.arange(rows.size, dtype=np.int64)
    row_change = np.flatnonzero(np.concatenate(([True], rows[1:] != rows[:-1])))
    row_lens = np.diff(np.append(row_change, rows.size))
    pos = idx - np.repeat(idx[row_change], row_lens)
    # factorize(sort=True) + packed-key unique ≈ 5-10x faster than an
    # object-dtype groupby; output order (row asc, term asc) is identical
    codes, uniques = pd.factorize(exploded.to_numpy(), sort=True)
    n_terms = len(uniques)
    pair = rows * np.int64(n_terms) + codes
    uk, tf = np.unique(pair, return_counts=True)
    # stable sort by pair groups occurrences in frame order with positions
    # ascending inside each (row, term) run
    order = np.argsort(pair, kind="stable")
    frame = pd.DataFrame(
        {
            "row": uk // n_terms,
            "term": uniques[uk % n_terms],
            "tf": tf.astype(np.int64),
        }
    )
    return frame, pos[order]


def pack_term_frequencies(
    texts: pd.Series, with_positions: bool = True
) -> pd.DataFrame:
    """Per-doc packed term frequencies in shuffle-friendly FLAT form.

    Returns a DataFrame with one row per input text::

        terms_blob : str    space-joined sorted-unique tokens ("" if none)
        tfs_vb     : bytes  LEB128 varbyte of the aligned tf counts
        pos_vb     : bytes  LEB128 varbyte of token positions, delta-encoded
                            per (doc, term) run, runs in terms_blob order
        n_terms    : int64  number of distinct terms

    This is what the index build ships through its shuffle instead of raw
    content: repeated tokens collapse to (term, count, positions) before any
    wire, and the flat encoding avoids per-token Python objects on both the
    Arrow serialize and deserialize sides (a list<string> column would
    materialize every token as a Python object twice).  Tokens match
    ``[a-z0-9_]+`` so a single space is an unambiguous separator.

    ``with_positions=False`` (ES ``index_options: freqs``) skips the
    position computation and omits the ``pos_vb`` column entirely — the
    packed payload over the shuffle shrinks by roughly the token count.
    """
    from . import codec

    if with_positions:
        tf, pos_flat = doc_term_positions(texts)
    else:
        tf = doc_term_frequencies(texts)
    n = len(texts)
    nt = np.zeros(n, dtype=np.int64)
    if tf.empty:
        cols = {"terms_blob": [""] * n, "tfs_vb": [b""] * n, "n_terms": nt}
        if with_positions:
            cols["pos_vb"] = [b""] * n
        return pd.DataFrame(cols)
    rows = tf["row"].to_numpy(np.int64)
    tf_vals = tf["tf"].to_numpy(np.int64)
    nt = np.bincount(rows, minlength=n).astype(np.int64)
    bounds = np.cumsum(nt)[:-1]
    chunks = np.split(tf["term"].to_numpy(), bounds)
    blobs = [" ".join(c) for c in chunks]  # one join per doc, not per token

    def _slice_per_doc(buf: np.ndarray, ends: np.ndarray, counts: np.ndarray) -> list[bytes]:
        """Slice one encoded stream into per-doc bytes by value counts."""
        cum = np.cumsum(counts)
        byte_ends = np.where(cum > 0, ends[np.maximum(cum - 1, 0)], 0)
        byte_starts = np.concatenate(([0], byte_ends[:-1]))
        return [buf[s:e].tobytes() for s, e in zip(byte_starts, byte_ends)]

    buf, ends = codec.varbyte_encode_all(tf_vals.astype(np.uint64))
    tfs_vb = _slice_per_doc(buf, ends, nt)
    out = {"terms_blob": blobs, "tfs_vb": tfs_vb, "n_terms": nt}
    if with_positions:
        # positions: delta restart per (doc, term) run; per-doc value count = dl
        pair_starts = np.concatenate(([0], np.cumsum(tf_vals)[:-1]))
        pdeltas = codec.segmented_delta_encode(pos_flat.astype(np.uint64), pair_starts)
        dl = np.bincount(rows, weights=tf_vals, minlength=n).astype(np.int64)
        pbuf, pends = codec.varbyte_encode_all(pdeltas)
        out["pos_vb"] = _slice_per_doc(pbuf, pends, dl)
    return pd.DataFrame(out)


def packed_term_frequencies(
    blobs: pd.Series,
    tfs_vb: pd.Series,
    n_terms: pd.Series,
    pos_vb: pd.Series | None = None,
) -> pd.DataFrame | tuple[pd.DataFrame, np.ndarray]:
    """Rebuild the (row, term, tf) frame from the flat packed columns.

    Inverse of ``pack_term_frequencies`` — same output shape and ordering as
    ``doc_term_frequencies`` (row asc, term asc within row), so the segment
    builder is agnostic to whether it got raw text or packed rows.  One
    string split and one varbyte decode per batch — no per-token Python.
    With ``pos_vb`` also returns the absolute flat positions array, aligned
    exactly like ``doc_term_positions``.
    """
    from . import codec

    nt = n_terms.to_numpy(np.int64)
    total = int(nt.sum())
    if total == 0:
        empty = pd.DataFrame(
            {"row": np.empty(0, np.int64), "term": [], "tf": np.empty(0, np.int64)}
        )
        return empty if pos_vb is None else (empty, np.empty(0, np.int64))
    nonempty = nt > 0
    joined = " ".join(blobs.to_numpy()[nonempty])
    term_flat = np.array(joined.split(" "), dtype=object)
    rows = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
    tf_flat = codec.varbyte_decode(b"".join(tfs_vb)).astype(np.int64)
    frame = pd.DataFrame({"row": rows, "term": term_flat, "tf": tf_flat})
    if pos_vb is None:
        return frame
    pdeltas = codec.varbyte_decode(b"".join(pos_vb))
    pair_starts = np.concatenate(([0], np.cumsum(tf_flat)[:-1]))
    pos_flat = codec.segmented_delta_decode(pdeltas, pair_starts).astype(np.int64)
    return frame, pos_flat


def tokenize_python(text: str) -> list[str]:
    """Scalar tokenizer for oracles and tests."""
    return _TOKEN_RE.findall(text.lower())
