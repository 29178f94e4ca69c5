"""Lucene-compatible BM25 scoring formulas + the numpy oracle scorer (H7).

Formulas (public Lucene BM25Similarity, the defaults Elasticsearch uses):

* ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``
* ``score = sum_t idf_t * tf / (tf + k1 * (1 - b + b * dl / avgdl))``
* ``k1 = 1.2``, ``b = 0.75``; modern Lucene omits the rank-neutral ``(k1+1)``
  numerator factor.
* ``avgdl = total token count / N``.

Two document-length modes (SURVEY.md §7 hard-part 3):

* ``exact_dl`` (default): dl is the exact token count.
* ``lucene_norms``: dl is first round-tripped through a SmallFloat-style
  1-byte norm (4-bit-mantissa float encoding with the low byte values used
  to represent small lengths exactly) — the lossy per-document norm Lucene
  stores, which can change ranks vs exact dl.

Ties are broken by ascending docID everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

# SmallFloat-style 4-bit-mantissa byte encoding of positive ints:
# longToInt4(Integer.MAX_VALUE) == 231, so 255-231 = 24 byte states are free
# to encode 0..23 exactly.
_NUM_FREE_VALUES = 24


def _long_to_int4(v: np.ndarray) -> np.ndarray:
    """4-bit-mantissa encoding of non-negative int64 values (vectorized)."""
    v = np.asarray(v, dtype=np.int64)
    out = np.empty(v.shape, dtype=np.int64)
    # number of significant bits
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for k in (32, 16, 8, 4, 2, 1):
        big = tmp >= (np.int64(1) << np.int64(k))
        nbits += np.where(big, k, 0)
        tmp = np.where(big, tmp >> np.int64(k), tmp)
    nbits += (v > 0).astype(np.int64)
    sub = nbits < 4  # subnormal: exact
    out[sub] = v[sub]
    shift = nbits - 4
    enc = (v >> np.maximum(shift, 0)) & 0x07
    out[~sub] = (enc | ((shift + 1) << 3))[~sub]
    return out


def _int4_to_long(enc: np.ndarray) -> np.ndarray:
    enc = np.asarray(enc, dtype=np.int64)
    bits = enc & 0x07
    shift = (enc >> 3) - 1
    return np.where(shift < 0, bits, (bits | 0x08) << np.maximum(shift, 0))


def quantize_doc_length(dl: np.ndarray) -> np.ndarray:
    """Round-trip doc lengths through the 1-byte norm (lucene_norms mode)."""
    dl = np.asarray(dl, dtype=np.int64)
    small = dl < _NUM_FREE_VALUES
    out = dl.copy()
    big = ~small
    out[big] = _NUM_FREE_VALUES + _int4_to_long(_long_to_int4(dl[big] - _NUM_FREE_VALUES))
    return out


def idf(n_docs: int, df: np.ndarray | int):
    """Lucene BM25 idf."""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight(tf, dl, avgdl: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT):
    """Length-normalized term-frequency factor."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass(frozen=True)
class Bm25Params:
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    lucene_norms: bool = False


def score_topk_numpy(
    postings: dict[str, tuple[np.ndarray, np.ndarray]],
    dl_by_doc: np.ndarray,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int,
    mode: str = "OR",
    params: Bm25Params = Bm25Params(),
) -> list[tuple[int, float]]:
    """Reference scorer over in-memory postings (the M0 oracle).

    ``postings[term] = (doc_ids, tfs)``; ``dl_by_doc[doc_id] = dl``.
    Per-doc scores sum term contributions in SORTED TERM ORDER — the same
    deterministic association the distributed path uses — so the two are
    bit-identical, not merely close.  Returns [(doc_id, score)] ranked by
    (score desc, doc_id asc), AND mode keeps docs containing every term.
    """
    terms = sorted(set(terms))
    acc: dict[int, float] = {}
    seen_count: dict[int, int] = {}
    dl = np.asarray(dl_by_doc, dtype=np.int64)
    if params.lucene_norms:
        dl = quantize_doc_length(dl)
    for term in terms:
        if term not in postings:
            continue
        doc_ids, tfs = postings[term]
        term_idf = float(idf(n_docs, len(doc_ids)))
        w = term_idf * tf_weight(tfs, dl[doc_ids], avgdl, params.k1, params.b)
        for d, s in zip(doc_ids.tolist(), w.tolist()):
            acc[d] = acc.get(d, 0.0) + s
            seen_count[d] = seen_count.get(d, 0) + 1
    if mode.upper() == "AND":
        present = [t for t in terms if t in postings]
        if len(present) < len(terms):
            return []
        acc = {d: s for d, s in acc.items() if seen_count[d] == len(terms)}
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(int(d), float(s)) for d, s in ranked[:k]]


def idf_map(n_docs: int, df_by_term: dict[str, int]) -> dict[str, float]:
    """Driver-side idf folding (broadcast to executors)."""
    return {t: float(idf(n_docs, d)) for t, d in df_by_term.items()}


def explain_score(
    tf: int, df: int, dl: int, n_docs: int, avgdl: float, params: Bm25Params = Bm25Params()
) -> float:
    """Single (term, doc) contribution — for tests/debugging."""
    d = quantize_doc_length(np.array([dl]))[0] if params.lucene_norms else dl
    return float(idf(n_docs, df) * tf_weight(tf, d, avgdl, params.k1, params.b))
