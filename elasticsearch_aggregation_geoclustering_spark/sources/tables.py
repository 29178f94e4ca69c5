"""Input-table resolution: filesystem parquet or catalog (Iceberg/Hive) tables.

The north-rule input is "an Iceberg table of source-code repositories
(repo, path, commit, lang, content)".  Iceberg reads in Spark are plain
``spark.table("catalog.db.tbl")`` / ``spark.read.format("iceberg")`` calls —
the engine itself needs no Iceberg-specific code, and every operator here
takes a DataFrame, so it is storage-agnostic by construction.  This helper
is the one seam: resolve a user-supplied source string to a DataFrame,
preferring a catalog table name and falling back to a parquet path, so the
same pipeline config runs against testdata parquet locally and an Iceberg
catalog on a real cluster (where partition pruning / hidden partitioning /
snapshot reads come from the Iceberg Spark runtime transparently).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, source: str) -> DataFrame:
    """Resolve ``source`` to a DataFrame.

    * an existing local path, a URI, or anything ending in ``.parquet`` is
      read as parquet,
    * otherwise it is treated as a catalog table name (Iceberg, Hive, or a
      registered view) — ``spark.table`` lets the configured catalog supply
      the format, snapshots, and pruning.
    """
    looks_like_path = (
        os.path.exists(source) or "://" in source or source.endswith(".parquet")
    )
    if looks_like_path:
        return spark.read.parquet(source)
    return spark.table(source)
