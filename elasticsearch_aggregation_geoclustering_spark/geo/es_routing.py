"""Elasticsearch document-to-shard routing, reimplemented from public ES
semantics (OperationRouting / Murmur3HashFunction / IndexMetadata).

Needed by the bit-exact centroid parity mode: the reference's YAML goldens
(``20_geo_clustering.yml``) run on a 3-shard index, and the per-shard
running-mean association order depends on exactly which shard each ``_id``
routes to.

Routing rule (ES 7+): ``shard = floorMod(murmur3(_id), routing_num_shards)
/ routing_factor`` where ``routing_num_shards`` defaults to the largest
``num_shards * 2^k`` not exceeding 1024 (so an index can later be split),
and ``routing_factor = routing_num_shards / num_shards``.  The hash is
murmur3_x86_32 (seed 0) over the id's UTF-16 code units serialized as two
little-endian bytes each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Standard murmur3 32-bit hash; returns an unsigned 32-bit int."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def default_routing_num_shards(num_shards: int) -> int:
    """IndexMetadata's default: largest ``num_shards * 2^k`` ≤ 1024 (or
    ``num_shards`` itself when it already exceeds 1024)."""
    if num_shards >= 1024:
        return num_shards
    k = int(np.floor(np.log2(1024 / num_shards)))
    return num_shards * (1 << k)


def es_shard_id(doc_id: str, num_shards: int, routing_num_shards: int | None = None) -> int:
    """The shard the given ``_id`` routes to (default hash routing)."""
    if routing_num_shards is None:
        routing_num_shards = default_routing_num_shards(num_shards)
    # Java serializes each UTF-16 code unit as two little-endian bytes
    # (surrogate pairs included) — exactly python's utf-16-le encoding
    h = murmur3_x86_32(doc_id.encode("utf-16-le"))
    if h >= 2**31:
        h -= 2**32  # to Java signed int
    factor = routing_num_shards // num_shards
    return (h % routing_num_shards) // factor  # python % == Math.floorMod here


def es_shard_column(ids, num_shards: int, routing_num_shards: int | None = None):
    """Pandas-UDF column: shard id per document ``_id`` (string column)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _shard(s: pd.Series) -> pd.Series:
        return s.astype(str).map(
            lambda x: es_shard_id(x, num_shards, routing_num_shards)
        ).astype(np.int32)

    return _shard(ids)
