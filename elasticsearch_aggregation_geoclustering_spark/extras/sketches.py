"""Distributed cardinality sketch (HyperLogLog) — what ES ``cardinality`` runs.

ES's cardinality aggregation is HyperLogLog++ (Heule et al. 2013, itself an
engineering pass over Flajolet et al. 2007's HLL); this module implements the
classic HLL estimator as pure Spark SQL expressions so the sketch state is a
tiny mergeable DataFrame and the whole thing stays JVM-side (no UDFs):

- hash: first 60 bits of md5 of the value — deterministic and identical in
  Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
  (``('0x'||substr(md5(x),1,15))::BIGINT``), so the driver oracle can run
  the SAME sketch and hash-match the estimate (see
  ``oracles_sql.hll_cardinality_sql``).
- register index: low ``p`` bits; rank: leading-zero count of the remaining
  ``60-p`` bits plus one, via ``length(bin(w))`` (both engines strip leading
  zeros).
- state: ``(register, max rank)`` rows — at most ``m = 2**p`` of them
  regardless of input size.  That is the whole point at 100 TB: each
  executor partially aggregates its partition to ≤ m rows (Catalyst
  map-side combine on the groupBy), the shuffle moves ≤ m rows per
  partition, and two sketches merge by register-wise max — the same
  mergeable-state design ES uses to reduce per-shard sketches on the
  coordinator.

Estimator: alpha_m * m^2 / sum_j 2^(-M_j) with Flajolet's small-range
linear-counting correction (E <= 2.5m and empty registers present).  The
large-range (hash-collision) correction is unnecessary at a 60-bit hash
below ~10^15 distinct values and is omitted; standard error is
~1.04/sqrt(m) (±1.6 % at the default p=12).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_merge", "hll_estimate", "hll_cardinality", "hll_alpha"]

HLL_HASH_BITS = 60  # 15 hex chars of md5 — sign-safe in int64, cross-engine


def hll_alpha(m: int) -> float:
    """Flajolet's bias-correction constant (m >= 128 branch)."""
    if m < 128:
        raise ValueError(f"p too small for the m>=128 alpha branch: m={m}")
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(col: Column) -> Column:
    """First 60 bits of md5(value) as a non-negative long (JVM-side)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """The sketch state: DataFrame ``(register int, rank int)``, ≤ 2**p rows.

    ``rank`` is the max over values hashing to the register of
    (leading zeros of the top ``60-p`` hash bits) + 1.  NULLs are skipped
    (ES cardinality ignores missing values).
    """
    if not 7 <= p <= 18:
        raise ValueError(f"p must be in 7..18: {p}")
    m = 1 << p
    h = _hash60(F.col(col))
    w = F.shiftright(h, p)  # top 60-p hash bits (h is non-negative)
    wbits = HLL_HASH_BITS - p
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(col).isNotNull())
        .select((h % F.lit(m)).cast("int").alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch states: register-wise max.  Lossless — merging per-split
    sketches equals sketching the union (the distributed-reduce property)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rank").alias("rank"))


def hll_estimate(registers: DataFrame, p: int = 12, *, round_to: int | None = 2) -> DataFrame:
    """One-row DataFrame ``(estimate double)`` from a sketch state."""
    m = 1 << p
    alpha = hll_alpha(m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("v_present"),
    )
    zeros = F.lit(m) - F.col("v_present")
    # absent registers hold rank 0 => each contributes 2^0 = 1 to the sum
    raw = F.lit(alpha * m * m) / (F.col("s_present") + zeros.cast("double"))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    # empty input: no registers at all -> estimate 0
    est = F.when(F.col("v_present") == 0, F.lit(0.0)).otherwise(est)
    if round_to is not None:
        est = F.round(est, round_to)
    return agg.select(est.alias("estimate"))


def hll_cardinality(
    df: DataFrame, col: str, p: int = 12, *, round_to: int | None = 2
) -> DataFrame:
    """ES ``cardinality`` aggregation: one-row ``(estimate double)``."""
    return hll_estimate(hll_registers(df, col, p), p, round_to=round_to)
