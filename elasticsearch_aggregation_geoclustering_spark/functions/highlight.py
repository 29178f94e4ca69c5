"""ES ``highlight`` (plain highlighter) as pure JVM column expressions.

ES's plain highlighter RE-ANALYZES the stored field per hit (no term vectors
needed) and wraps matched tokens in ``<em>`` inside a fragment window.  The
Spark-first rendering: normalize the text with the SAME regex the tokenizer
splits on (so a "token occurrence" is exactly a `` term `` substring of the
normalized form), locate the first query-term occurrence, cut a fixed-width
fragment around it, and wrap the found term.

Everything is built-in string functions (lower / regexp_replace / locate /
substring / replace) — whole-stage codegen, no UDFs, and each function has an
exact DuckDB twin, so the driver oracle reproduces snippets byte-for-byte.

Scale: per-row string ops over the TOP-K hits only (highlight runs after the
top-k truncation, like ES) — O(k × doc length), no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenizer import TOKEN_SPLIT_REGEX

__all__ = ["highlight_first_match"]


def highlight_first_match(
    text: Column,
    terms: list[str],
    *,
    frag_size: int = 100,
    pad: int = 30,
) -> Column:
    """Snippet around the first occurrence of any query term (NULL if none).

    The "first" term is the one whose token occurrence starts earliest in
    the normalized text; distinct terms cannot start at the same offset
    (both matches would need the same padded span), so the choice is
    deterministic.  The fragment is ``frag_size`` chars of the normalized
    form starting ``pad`` chars before the match, with the matched token
    wrapped as ``<em>term</em>``.
    """
    if not terms:
        raise ValueError("need at least one term")
    if frag_size < 1 or pad < 0 or pad >= frag_size:
        raise ValueError(f"need 0 <= pad < frag_size: pad={pad} frag_size={frag_size}")
    terms = sorted(set(t.lower() for t in terms))
    norm = F.regexp_replace(F.lower(text), TOKEN_SPLIT_REGEX, " ")
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    # locate() is 1-based, 0 = absent (same as DuckDB strpos)
    positions = [F.locate(f" {t} ", padded) for t in terms]
    minpos = None
    for p in positions:
        p_or_inf = F.when(p > 0, p).otherwise(F.lit(2_147_483_647))
        minpos = p_or_inf if minpos is None else F.least(minpos, p_or_inf)
    found = minpos != F.lit(2_147_483_647)
    start = F.greatest(F.lit(1), minpos - F.lit(pad))
    frag = F.substring(padded, start, frag_size)
    # wrap ONLY the term that produced the first match
    chosen = None
    for t, p in zip(reversed(terms), reversed(positions)):
        cond_expr = F.replace(frag, F.lit(f" {t} "), F.lit(f" <em>{t}</em> "))
        if chosen is None:
            chosen = cond_expr
        else:
            chosen = F.when(p == minpos, cond_expr).otherwise(chosen)
    return F.when(found, chosen).otherwise(F.lit(None).cast("string"))
