"""Deterministic hash-based sampling — the reproducible kind training-data
pipelines need.

``df.sample()`` is seed-and-partitioning dependent (rerun the job with a
different partition count and the sample changes); content-addressed
sampling — keep a row iff ``hash(key) % B < fraction·B`` — is reproducible
across runs, clusters, partitionings AND engines, supports consistent
subsetting (a 1 % sample is a subset of the 10 % sample), and lets holdout
splits be recomputed from scratch anywhere.  The hash is the same md5-60-bit
used across this package (cross-engine deterministic, see
``oracles_sql.md5_long_sql``), so the DuckDB oracle reproduces the sample
row-for-row.

Scale: a pure JVM filter expression — predicate evaluated at the scan, no
shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_sample", "stratified_hash_sample", "HASH_BUCKETS"]

HASH_BUCKETS = 1_000_000  # fraction resolution: 1e-6


def _bucket(key: Column, salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(HASH_BUCKETS)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of bucket
    space.  Nested property: ``hash_sample(f1) ⊆ hash_sample(f2)`` whenever
    ``f1 <= f2`` (same salt) — consistent sub-sampling for scaling-law runs.
    ``salt`` decorrelates independent samples (e.g. train vs eval)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    cut = int(round(fraction * HASH_BUCKETS))
    return df.where(_bucket(F.col(key_col), salt) < F.lit(cut))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-heavy
    languages, keep all rare ones): ``fractions`` maps stratum value →
    fraction; strata not listed get ``default_fraction``."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]: {default_fraction}")
    cut = F.lit(int(round(default_fraction * HASH_BUCKETS)))
    for s, f in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(f * HASH_BUCKETS)))
        ).otherwise(cut)
    return df.where(_bucket(F.col(key_col), salt) < cut)
