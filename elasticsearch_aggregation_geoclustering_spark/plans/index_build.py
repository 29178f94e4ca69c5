"""Batch inverted-index build: documents DataFrame -> segmented postings.

The Spark-first shape of Elasticsearch's bulk-index path (SURVEY.md §3.2),
designed so the LARGE column (``content``) is read once, never shuffled, and
never persisted — everything global rides key-only column-pruned jobs:

1. **deterministic key buckets** — two cheap jobs over ONLY the natural-key
   columns (Catalyst prunes ``content`` out of both scans): a fixed-seed
   sample picks ~equi-depth key boundaries on the driver, and a
   ``groupBy(bucket).count()`` yields exact per-bucket row counts.  The
   bucket is a PURE FUNCTION of the key (a chain of struct comparisons
   against literal boundaries), so — unlike ``repartitionByRange``'s
   per-action sampled boundaries — every job in the build sees the same
   assignment without persisting anything.  Cumulative bucket counts give
   each bucket's starting docID; docIDs depend only on the global key order,
   never on where boundaries fall, so ids are identical across runs and
   parallelism levels (resume-stable).
2. **tokenize placement is a measured choice** (``pack_before_shuffle``):
   by default tokenization runs fused inside the segment builder (one Python
   stage per doc — fastest when Python CPU is the bottleneck, e.g. local
   shuffle through the page cache); with ``pack_before_shuffle=True`` a
   map-side ``mapInPandas`` collapses each doc to flat packed rows
   (space-joined sorted-unique terms blob + varbyte tf bytes + varbyte
   position deltas + sha256) and DROPS the raw content before the shuffle —
   the right trade when the shuffle crosses a real network and content
   bytes dominate the wire.  Segment bytes are identical in both modes
   (tested).
3. **segmenting** — ``seg_id = doc_id // docs_per_segment``: contiguous,
   disjoint docID ranges, the analog of Lucene segments.  Segments partition
   by DOCUMENT, not by term, so Zipf-hot terms ("the", "import") cannot
   concentrate on one reducer — each segment holds at most
   ``docs_per_segment`` entries of any term (structural salting; see
   merge_segments for the bucketed term-keyed merge).
4. **segment build** — the ONE full-data job: rows arrive range-partitioned
   by bucket and sorted by key; a bucket's rows all land in one partition, so
   per-bucket running counters reproduce the exact global docIDs in-stream.
   Every segment fully contained in the partition is built in place (postings
   parquet sorted by term + docmap part + manifest part, atomic deterministic
   bytes); only the ≤2 boundary partial segments per partition are emitted
   into a tiny ``groupBy(seg_id)`` fragment shuffle.  Doc lengths are
   denormalized into each posting (``dls_vb``) — Lucene-norm style — so
   scoring never joins a doc-length table.
5. **global stats** — ``groupBy(term).sum(df)`` over the per-segment df rows
   (tiny: one row per distinct (term, segment)), written range-partitioned by
   term (parallel writers, per-file sorted order, min/max pruning intact).

Resumability (north_rule): completed segment ids are recorded in
``manifest.json`` and filtered out of step 4 on re-run; files are written
atomically with deterministic bytes and sha256 recorded
(tests/test_index_build.py asserts byte-identical resume).

Scale notes: the bucket expression is O(#buckets) struct comparisons per row
(#buckets = 2·partitions); at many thousands of target partitions switch the
assignment to a range-join against a broadcast boundary table instead.  The
two key-only jobs are metadata-cheap on columnar sources at any scale.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.tokenizer import (
    TOKENIZER_VERSION,
    doc_term_frequencies,
    doc_term_positions,
    pack_term_frequencies,
    packed_term_frequencies,
)
from ..sources import segments as seg_store
from ..sources.segments import (
    SEGMENT_MANIFEST_SPARK_SCHEMA,
    IndexManifest,
    load_manifest,
    load_stats,
    save_manifest,
    save_stats,
)

DEFAULT_DOCS_PER_SEGMENT = 8192
_SAMPLES_PER_BUCKET = 48


def _key_struct(key_cols: tuple[str, ...]) -> Column:
    return F.struct(*[F.col(c) for c in key_cols])


def _sample_key_boundaries(
    df: DataFrame,
    key_cols: tuple[str, ...],
    n_rows: int,
    n_buckets: int,
    seed: int = 42,
) -> list[tuple]:
    """~Equi-depth key boundaries from a fixed-seed key-only sample.

    Returns at most ``n_buckets - 1`` strictly increasing key tuples; rows
    with key <= boundaries[i] (and > boundaries[i-1]) fall in bucket i.
    Boundary *placement* only affects balance — docIDs are invariant to it.
    """
    if n_rows == 0 or n_buckets <= 1:
        return []
    target = n_buckets * _SAMPLES_PER_BUCKET
    fraction = min(1.0, (target * 1.2) / n_rows)
    keys = sorted(
        tuple(r) for r in df.select(*key_cols).sample(fraction=fraction, seed=seed).collect()
    )
    if not keys:
        return []
    bounds: list[tuple] = []
    for i in range(1, n_buckets):
        cand = keys[min(int(i * len(keys) / n_buckets), len(keys) - 1)]
        if not bounds or cand > bounds[-1]:
            bounds.append(cand)
    return bounds


def _bucket_column(
    key_cols: tuple[str, ...], bounds: list[tuple], dtypes: dict[str, str]
) -> Column:
    """bucket(key) = #{boundaries < key} — a pure, literal-folded expression.

    Boundary literals are cast to the key columns' exact types so the struct
    comparison resolves (lit(int) would otherwise be int32 vs a bigint key).
    """
    ks = _key_struct(key_cols)
    b: Column = F.lit(0)
    for t in bounds:
        lit_struct = F.struct(
            *[F.lit(v).cast(dtypes[c]) for c, v in zip(key_cols, t)]
        )
        b = b + (ks > lit_struct).cast("int")
    return b.cast("int")


def _bucket_offsets(counts: dict[int, int]) -> dict[int, int]:
    """Cumulative starting docID per bucket (bucket-ascending prefix sum)."""
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    return offsets


def _murmur3_hash_int(value: int, seed: int = 42) -> int:
    """Murmur3 x86_32 of one 4-byte int — EXACTLY Spark's ``hash()`` /
    ``HashPartitioning`` for an IntegerType column (seed 42), reimplemented
    from the public algorithm so the driver can predict which partition a
    literal int lands in.  Returns the signed 32-bit hash."""
    m = 0xFFFFFFFF
    k1 = (value * 0xCC9E2D51) & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = (k1 * 0x1B873593) & m
    h1 = (seed ^ k1) & m
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 4  # fmix with length 4
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _slot_values(num_partitions: int) -> list[int]:
    """For each partition p, a small int v with ``pmod(murmur3(v), P) == p``
    — so hash-repartitioning on a column holding v routes rows EXACTLY to
    partition p.  Found by scanning upward; expected O(P log P) probes."""
    vals: list[int | None] = [None] * num_partitions
    found = 0
    v = 0
    while found < num_partitions:
        p = _murmur3_hash_int(v) % num_partitions
        if vals[p] is None:
            vals[p] = v
            found += 1
        v += 1
    return vals  # type: ignore[return-value]


def _partition_slot_expr(counts: dict[int, int], num_partitions: int) -> Column:
    """Driver-planned replacement for ``repartitionByRange(P, "_b")``: map
    each bucket to a crafted int whose Spark hash lands on the packed target
    partition, preserving the builder's contract (each partition holds a
    CONTIGUOUS, balanced run of whole buckets) with a plain hash exchange.

    ``repartitionByRange`` launches a range-boundary SAMPLING job that
    re-executes the exchange's whole child plan — for the index build that
    is a second full pass over the corpus including sha256 (and tokenize in
    pack mode).  The bucket counts are already EXACT (they drive the docID
    offsets), so the driver can pack buckets into partitions itself and
    skip the sampling pass entirely; placement balance is identical
    (both pack the same exact counts toward total/P per partition).
    """
    total = sum(counts.values())
    if not counts or total == 0:
        return F.lit(0)
    target = max(1, -(-total // num_partitions))  # ceil
    slot_vals = _slot_values(num_partitions)
    mapping: dict[int, int] = {}
    slot = 0
    acc = 0
    for b in sorted(counts):
        if acc >= target and slot < num_partitions - 1:
            slot += 1
            acc = 0
        mapping[b] = slot_vals[slot]
        acc += counts[b]
    pairs = [x for b in sorted(mapping) for x in (F.lit(b), F.lit(mapping[b]))]
    return F.element_at(F.create_map(*pairs), F.col("_b").cast("int"))


#: fine proxy-bucket resolution: counts are exact per 2^16 contiguous key
#: ranges, then packed into ~2x num_partitions balanced coarse buckets
_FINE_BITS = 16
_PROXY_BYTES = 7

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _encoded_key_expr(key_cols: tuple[str, ...], dtypes: dict[str, str]) -> Column:
    """Order-preserving string encoding of the key tuple.

    String columns compare bytewise (UTF-8 order == Spark string order);
    non-negative integers are zero-padded to 19 digits so lexical order is
    numeric order.  NUL separates columns — it sorts below every other byte,
    so shorter prefixes order before their extensions, matching tuple order.
    """
    parts = []
    for c in key_cols:
        if dtypes[c] in _INT_TYPES:
            parts.append(F.lpad(F.col(c).cast("string"), 19, "0"))
        else:
            parts.append(F.col(c).cast("string"))
    return F.concat_ws("\x00", *parts)


def _fine_bucket_expr(encoded: Column, prefix_len: int) -> Column:
    """Top ``_FINE_BITS`` bits of the 7 key bytes after the corpus-wide
    common prefix — a pure JVM long, monotone (non-strict) in key order.

    Any key between min and max shares their common prefix, so skipping it
    spends the proxy's resolution where keys actually diverge (e.g. every
    repo key starting "github.com/").  7 bytes = 14 hex digits < 2^56, so
    ``conv`` is exact in a long.
    """
    seg = F.substring(F.encode(encoded, "UTF-8"), prefix_len + 1, _PROXY_BYTES)
    padded = F.rpad(seg, _PROXY_BYTES, F.lit(b"\x00"))
    v = F.coalesce(F.conv(F.hex(padded), 16, 10).cast("long"), F.lit(0))
    return F.shiftright(v, _PROXY_BYTES * 8 - _FINE_BITS)


def _pack_fine_counts(
    fine_counts: dict[int, int], n_buckets: int
) -> tuple[list[int], dict[int, int]]:
    """Pack contiguous fine buckets into ≤ n_buckets coarse buckets of
    near-equal EXACT counts.  Returns (fine boundaries, coarse counts);
    coarse bucket of a row = #{boundaries < fine(row)}."""
    total = sum(fine_counts.values())
    if total == 0:
        return [], {}
    target = max(1, -(-total // n_buckets))  # ceil
    bounds: list[int] = []
    counts: dict[int, int] = {}
    acc = 0
    last_fine = None
    for f in sorted(fine_counts):
        if acc >= target and last_fine is not None and len(bounds) < n_buckets - 1:
            bounds.append(last_fine)
            acc = 0
        acc += fine_counts[f]
        counts[len(bounds)] = counts.get(len(bounds), 0) + fine_counts[f]
        last_fine = f
    return bounds, counts


def _rank_plan(
    df: DataFrame, key_cols: tuple[str, ...], num_partitions: int
) -> tuple[Column, dict[int, int], int]:
    """The docID pre-plan: (bucket expression, exact per-bucket counts,
    n_docs) in exactly TWO key-only jobs, no sampling.

    Job 1 is one aggregation (count + min/max encoded key + per-int-column
    min); job 2 counts rows per fine proxy bucket (≤ 2^16 groups) and the
    driver packs them into balanced coarse buckets with exact offsets.
    docIDs are invariant to where the boundaries fall — the bucket is
    monotone in key and offsets are exact prefix counts, so
    ``offset[bucket] + within-bucket key rank`` IS the global key rank
    regardless of balance.  Negative integer keys break the zero-pad
    encoding's order, so they fall back to the legacy sampled-bounds path
    (one extra sample job) — same docIDs either way.
    """
    dtypes = dict(df.dtypes)
    enc = _encoded_key_expr(key_cols, dtypes)
    int_cols = [c for c in key_cols if dtypes[c] in _INT_TYPES]
    str_cols = [c for c in key_cols if dtypes[c] not in _INT_TYPES]
    # a NUL inside a key string would collide with the encoding's column
    # separator (breaking tuple-order monotonicity) — detect in the same agg
    nul_checks = [F.instr(F.col(c).cast("string"), "\x00") for c in str_cols]
    if not nul_checks:
        nul_probe = F.lit(0)
    elif len(nul_checks) == 1:
        nul_probe = F.max(nul_checks[0])
    else:
        nul_probe = F.max(F.greatest(*nul_checks))
    # NULL key values have no deterministic place in ANY of the orderings
    # (concat_ws silently drops NULL columns so (NULL,'b') and ('b',NULL)
    # encode identically; struct comparisons against a NULL yield NULL; the
    # sampled-bounds python sort raises) — so the docID contract requires
    # non-null keys, enforced here in the same single aggregation.
    null_key_probe = F.max(
        F.greatest(*[F.col(c).isNull().cast("int") for c in key_cols])
        if len(key_cols) > 1
        else F.col(key_cols[0]).isNull().cast("int")
    )
    row = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(enc).alias("_min"),
        F.max(enc).alias("_max"),
        nul_probe.alias("_nul"),
        null_key_probe.alias("_nullkey"),
        *[F.min(F.col(c)).alias(f"_imin_{c}") for c in int_cols],
    ).collect()[0]
    n_docs = int(row["_n"])
    if n_docs == 0:
        return F.lit(0).cast("int"), {}, 0
    if (row["_nullkey"] or 0) > 0:
        raise ValueError(
            f"key columns {list(key_cols)} contain NULL values: docID "
            "assignment requires a total order over non-null unique keys — "
            "filter or fill the key columns before indexing"
        )
    needs_fallback = (row["_nul"] or 0) > 0 or any(
        row[f"_imin_{c}"] is not None and row[f"_imin_{c}"] < 0 for c in int_cols
    )
    if needs_fallback:
        bounds = _sample_key_boundaries(df, key_cols, n_docs, 2 * num_partitions)
        bexpr = _bucket_column(key_cols, bounds, dtypes)
        counts = {
            r["_b"]: r["cnt"]
            for r in df.select(bexpr.alias("_b"))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        return bexpr, counts, n_docs
    prefix_len = len(os.path.commonprefix([row["_min"].encode(), row["_max"].encode()]))
    fine = _fine_bucket_expr(enc, prefix_len)
    fine_counts = {
        int(r["_f"]): int(r["cnt"])
        for r in df.select(fine.alias("_f"))
        .groupBy("_f")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    bounds, counts = _pack_fine_counts(fine_counts, 2 * num_partitions)
    bexpr: Column = F.lit(0)
    for b in bounds:
        bexpr = bexpr + (fine > F.lit(b)).cast("int")
    return bexpr.cast("int"), counts, n_docs


def assign_doc_ids(
    df: DataFrame, key_cols: tuple[str, ...], num_partitions: int | None = None
) -> DataFrame:
    """Dense rank over ``key_cols`` without a single-task window or persist.

    Requires the key to be unique per row (true for (repo, path, commit)).
    Deterministic by construction: the bucket is a pure function of the key
    and the per-bucket offsets are exact counts, so every action over the
    result sees the same ids (no reliance on how any shuffle sampled its
    boundaries).
    """
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bexpr, counts, _ = _rank_plan(df, key_cols, num_partitions)
    offsets = _bucket_offsets(counts)
    # hash exchange on a driver-planned slot (see _partition_slot_expr): same
    # contiguous-bucket placement as repartitionByRange, WITHOUT its
    # boundary-sampling job (a second full pass over the input)
    ranged = (
        df.withColumn("_b", bexpr)
        .withColumn("_slot", _partition_slot_expr(counts, num_partitions))
        .repartition(num_partitions, F.col("_slot"))
        .drop("_slot")
        .sortWithinPartitions("_b", *[F.col(c) for c in key_cols])
    )
    out_cols = [c for c in df.columns]
    schema = ", ".join(
        ["doc_id long"] + [f"`{n}` {t}" for n, t in ranged.drop("_b").dtypes]
    )

    def run(batches):
        next_id: dict[int, int] = {}
        for raw in batches:
            if raw.empty:
                continue
            ids = _assign_ids_for_batch(raw["_b"].to_numpy(np.int64), next_id, offsets)
            pdf = raw.drop(columns=["_b"])
            pdf.insert(0, "doc_id", ids)
            yield pdf

    return ranged.mapInPandas(run, schema).select("doc_id", *out_cols)


def _assign_ids_for_batch(
    bvals: np.ndarray, next_id: dict[int, int], offsets: dict[int, int]
) -> np.ndarray:
    """Global docIDs for one sorted batch via per-bucket running counters.

    All rows of a bucket live in one partition (range partitioning cannot
    split equal values), arrive bucket- and key-sorted, and bucket offsets
    are cumulative exact counts — so ``offset[b] + seen[b]`` IS the global
    dense rank.
    """
    ids = np.empty(len(bvals), dtype=np.int64)
    change = np.flatnonzero(np.concatenate(([True], bvals[1:] != bvals[:-1])))
    ends = np.concatenate((change[1:], [len(bvals)]))
    for s, e in zip(change, ends):
        b = int(bvals[s])
        start = next_id.get(b, offsets[b])
        ids[s:e] = np.arange(start, start + (e - s), dtype=np.int64)
        next_id[b] = start + int(e - s)
    return ids


def _pack_fn(content_col: str, passthrough: list[str], with_positions: bool = True):
    """mapInPandas: tokenize + collapse to flat packed term rows; DROP content."""

    cols = (
        ["terms_blob", "codes_pk", "n_terms", "dl"]
        if with_positions
        else ["terms_blob", "tfs_vb", "n_terms"]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            packed = pack_term_frequencies(pdf[content_col], with_positions)
            out = pdf[passthrough].reset_index(drop=True)
            out[cols] = packed[cols]
            yield out

    return run


def _build_one_segment(
    index_dir: str,
    seg_id: int,
    pdf: pd.DataFrame,
    content_col: str,
    docmap_cols: tuple[str, ...],
    with_positions: bool = True,
) -> dict:
    """Pack one segment; write postings + docmap part atomically; return the
    manifest/lineage dict.  Shared by the interior (in-partition) and
    fragment (shuffled-boundary) build paths — identical bytes either way.
    Accepts either raw content (fused tokenize path) or pre-packed term rows
    (pack_before_shuffle path); both yield the same tf frame, so segment
    bytes are identical across the two modes.
    """
    import pyarrow as pa

    t0 = seg_store.now()
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    doc_ids = pdf["doc_id"].to_numpy(np.int64)

    if "terms_blob" in pdf.columns:
        if with_positions:
            tf_frame, pos_flat = packed_term_frequencies(
                pdf["terms_blob"], pdf["n_terms"],
                codes_pk=pdf["codes_pk"], dl=pdf["dl"],
            )
        else:
            tf_frame = packed_term_frequencies(
                pdf["terms_blob"], pdf["n_terms"], tfs_vb=pdf["tfs_vb"]
            )
            pos_flat = np.empty(0, dtype=np.int64)
    elif with_positions:
        tf_frame, pos_flat = doc_term_positions(pdf[content_col])
    else:
        tf_frame = doc_term_frequencies(pdf[content_col])
        pos_flat = np.empty(0, dtype=np.int64)
    dl_by_row = np.zeros(len(pdf), dtype=np.int64)
    if not tf_frame.empty:
        np.add.at(dl_by_row, tf_frame["row"].to_numpy(np.int64), tf_frame["tf"].to_numpy(np.int64))

    if tf_frame.empty:
        terms_u = np.empty(0, dtype=object)
        starts = np.empty(0, dtype=np.int64)
        run_lens = np.empty(0, dtype=np.int64)
        total = 0
        ids_all = np.empty(0, dtype=np.int64)
        tf_vals = np.empty(0, dtype=np.int64)
        dls_all = np.empty(0, dtype=np.int64)
        pos_sorted = np.empty(0, dtype=np.int64)
        pos_starts = np.empty(0, dtype=np.int64)
        pair_pos_starts = np.empty(0, dtype=np.int64)
    else:
        # postings order: (term asc, doc_id asc); rows within a term are
        # already doc-ordered because packed_term_frequencies emits row-major
        term_sorted = tf_frame.sort_values(["term", "row"], kind="stable")
        perm = term_sorted.index.to_numpy(np.int64)  # frame-order -> postings-order
        term_sorted = term_sorted.reset_index(drop=True)
        terms_arr = term_sorted["term"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], terms_arr[1:] != terms_arr[:-1]))
        )
        terms_u = terms_arr[starts]
        total = len(terms_arr)
        run_lens = np.diff(np.append(starts, total))
        row_idx = term_sorted["row"].to_numpy(np.int64)
        tf_vals = term_sorted["tf"].to_numpy(np.int64)
        ids_all = doc_ids[row_idx]
        dls_all = dl_by_row[row_idx]
        if with_positions:
            # permute the flat positions into postings order: gather each
            # pair's position run via one repeat+arange fancy index
            lens_orig = tf_frame["tf"].to_numpy(np.int64)
            starts_orig = np.concatenate(([0], np.cumsum(lens_orig)[:-1]))
            lens_p = lens_orig[perm]
            pair_pos_starts = np.concatenate(([0], np.cumsum(lens_p)[:-1]))
            n_pos = int(lens_p.sum())
            gather = (
                np.repeat(starts_orig[perm] - pair_pos_starts, lens_p)
                + np.arange(n_pos, dtype=np.int64)
            )
            pos_sorted = pos_flat[gather]
            pos_starts = pair_pos_starts[starts]  # per-TERM run starts
        else:
            # index_options=freqs: every pos_vb cell is the empty byte string
            pos_sorted = np.empty(0, dtype=np.int64)
            pair_pos_starts = np.empty(0, dtype=np.int64)
            pos_starts = np.zeros(len(terms_u), dtype=np.int64)

    # all binary columns come out of one vectorized encode each; position
    # deltas restart per (term, doc) pair, and the binary cells slice per term
    deltas = codec.segmented_delta_encode(ids_all.astype(np.uint64), starts)
    pdeltas = codec.segmented_delta_encode(pos_sorted.astype(np.uint64), pair_pos_starts)
    table = pa.table(
        {
            "term": pa.array(terms_u, pa.string()),
            "seg_id": pa.array(np.full(len(terms_u), seg_id, dtype=np.int64)),
            "df": pa.array(run_lens.astype(np.int64)),
            "doc_ids_vb": codec.segmented_varbyte_binary(deltas, starts, total),
            "tfs_vb": codec.segmented_varbyte_binary(tf_vals.astype(np.uint64), starts, total),
            "dls_vb": codec.segmented_varbyte_binary(dls_all.astype(np.uint64), starts, total),
            "pos_vb": codec.segmented_varbyte_binary(
                pdeltas, pos_starts, int(pos_sorted.size)
            ),
        },
        schema=seg_store.POSTINGS_ARROW_SCHEMA,
    )
    path = seg_store.segment_postings_path(index_dir, seg_id)
    size, digest = seg_store.write_segment_file(path, table)

    docmap_table = pa.Table.from_pandas(
        pdf[["doc_id", *docmap_cols, "sha256"]], preserve_index=False
    )
    seg_store.write_segment_file(
        seg_store.docmap_part_path(index_dir, seg_id), docmap_table
    )
    return {
        "seg_id": seg_id,
        "n_docs": len(pdf),
        "n_terms": len(terms_u),
        "n_postings": int(total),
        "total_tokens": int(dl_by_row.sum()),
        "postings_bytes": size,
        "sha256": digest,
        "build_wall_sec": seg_store.now() - t0,
    }


def _build_segment_fn(
    index_dir: str,
    content_col: str,
    docmap_cols: tuple[str, ...],
    with_positions: bool = True,
):
    """applyInPandas wrapper over _build_one_segment (the fragment path)."""

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        meta = _build_one_segment(
            index_dir, int(key[0]), pdf, content_col, docmap_cols, with_positions
        )
        return pd.DataFrame([meta])

    return build


def _partition_builder_fn(
    index_dir: str,
    offsets: dict[int, int],
    docs_per_segment: int,
    content_col: str,
    docmap_cols: tuple[str, ...],
    done: frozenset[int],
    with_positions: bool = True,
):
    """mapInPandas builder: assign ids in-stream (per-bucket counters), build
    every segment FULLY CONTAINED in this partition in place (writing
    postings + docmap part + a manifest-part json, no shuffle), and emit only
    the boundary rows (head/tail partial segments) for the tiny fragment
    stage.

    Because a partition holds whole buckets with contiguous cumulative
    offsets, its docIDs form one contiguous span — so a segment is interior
    iff the stream contains its complete id range: a chunk starting before
    the partition's first id is a head fragment, a chunk still incomplete
    when the stream ends is a tail fragment, and everything else either
    completes in-stream (built here) or waits in the buffer for the next
    Arrow batch.
    """

    def run(batches):
        buffer: list[pd.DataFrame] = []
        buffered = 0
        base: int | None = None  # partition's first doc id
        next_id: dict[int, int] = {}

        def flush_complete(force_tail: bool):
            nonlocal buffer, buffered
            if not buffer:
                return
            pdf = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
            buffer, buffered = [], 0
            first_id = int(pdf["doc_id"].iloc[0])
            out_frags = []
            i = 0
            n = len(pdf)
            while i < n:
                sid = (first_id + i) // docs_per_segment
                seg_start = sid * docs_per_segment
                seg_end = seg_start + docs_per_segment
                take = min(n - i, seg_end - (first_id + i))
                chunk = pdf.iloc[i : i + take]
                complete_here = (first_id + i) == seg_start and take == (seg_end - seg_start)
                if complete_here:
                    if sid not in done:
                        meta = _build_one_segment(
                            index_dir, sid, chunk, content_col, docmap_cols,
                            with_positions,
                        )
                        seg_store.save_manifest_part(index_dir, meta)
                elif seg_start < base or force_tail:
                    # head partial (rows before base live elsewhere) or tail
                    # partial at stream end -> boundary fragment
                    if sid not in done:
                        out_frags.append(chunk)
                else:
                    # incomplete interior chunk: wait for more batches
                    buffer.append(chunk.copy())
                    buffered = len(chunk)
                    break
                i += take
            if out_frags:
                yield pd.concat(out_frags, ignore_index=True)

        for raw in batches:
            if raw.empty:
                continue
            ids = _assign_ids_for_batch(raw["_b"].to_numpy(np.int64), next_id, offsets)
            if base is None:
                base = int(ids[0])
            pdf = raw.drop(columns=["_b"])
            pdf.insert(0, "doc_id", ids)
            pdf["seg_id"] = ids // docs_per_segment
            buffer.append(pdf)
            buffered += len(pdf)
            if buffered >= docs_per_segment:
                yield from flush_complete(force_tail=False)
        yield from flush_complete(force_tail=True)

    return run


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    docmap_cols: tuple[str, ...] = (),
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    resume: bool = True,
    num_partitions: int | None = None,
    pack_before_shuffle: bool = False,
    n_docs_hint: int | None = None,
    index_options: str = "positions",
) -> dict:
    """Build (or resume) the inverted index; returns the stats dict.

    ``index_options`` mirrors the ES mapping setting of the same name:
    ``"positions"`` (the Lucene text-field default) stores token positions
    per posting (pos_vb), enabling phrase/proximity queries; ``"freqs"``
    omits them — segments and the (pack-mode) shuffle payload shrink by
    roughly the token count, and phrase queries raise, exactly as ES errors
    on a field "indexed without position data".  A resumed build keeps the
    original index's setting.

    ``docmap_cols``: extra columns carried into the docmap table (e.g. lang,
    lon, lat) for query-time joins.  The docmap also records
    ``sha256(content)`` per row — the input_hint per-row invariant.

    ``pack_before_shuffle`` chooses where tokenization runs relative to the
    one full-data shuffle — segment bytes are identical either way:

    * False (default): ship raw content, tokenize inside the segment builder.
      ONE fused Python stage per doc; on a single box (local[N], shuffle via
      page cache) this is strictly faster because Python CPU, not shuffle
      bytes, is the bottleneck, and the fused stage pipelines perfectly with
      the JVM shuffle.
    * True: tokenize+pack map-side and shuffle flat packed term rows instead
      of content.  Two Python stages per doc (~+50% Python/Arrow work), but
      shuffle volume drops to the distinct-term payload — the right trade on
      a real multi-executor cluster where the shuffle crosses a network and
      content bytes dominate the wire.
    """
    if index_options not in ("positions", "freqs"):
        raise ValueError(f"index_options must be positions|freqs: {index_options}")
    os.makedirs(index_dir, exist_ok=True)
    manifest = load_manifest(index_dir) if resume else None
    if manifest is not None:
        docs_per_segment = manifest.docs_per_segment
        index_options = manifest.index_options
    with_positions = index_options == "positions"

    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    # TWO key-only pre-jobs total (content pruned out of both scans), no
    # sampling: one agg for count + min/max key, one exact fine-bucket count
    # -> literal boundaries + exact offsets (see _rank_plan).  n_docs_hint is
    # retained for API compatibility; the count now rides the first agg for
    # free, so the hint changes nothing.
    bexpr, counts, n_docs = _rank_plan(docs, key_cols, num_partitions)
    if n_docs_hint is not None and n_docs_hint != n_docs:
        warnings.warn(
            f"build_index: n_docs_hint={n_docs_hint} != measured {n_docs}; using measured"
        )
    offsets = _bucket_offsets(counts)

    if manifest is None:
        manifest = IndexManifest(
            docs_per_segment=docs_per_segment,
            tokenizer_version=TOKENIZER_VERSION,
            num_segments_expected=(n_docs + docs_per_segment - 1) // docs_per_segment,
            index_options=index_options,
        )
        save_manifest(index_dir, manifest)

    # a crash can leave interior manifest parts not yet folded into
    # manifest.json — both count as claimed, but a segment is only DONE if
    # its artifacts actually exist on disk (a deleted/corrupt segment gets
    # rebuilt even when still listed)
    parts = seg_store.load_manifest_parts(index_dir) if resume else {}
    claimed = manifest.completed_segment_ids() | {int(k) for k in parts}
    done = frozenset(
        sid
        for sid in claimed
        if os.path.exists(seg_store.segment_postings_path(index_dir, sid))
        and os.path.exists(seg_store.docmap_part_path(index_dir, sid))
    )
    stale = {str(s) for s in claimed - done}
    if stale:
        manifest.segments = {k: v for k, v in manifest.segments.items() if k not in stale}
        parts = {k: v for k, v in parts.items() if k not in stale}

    if len(done) < max(1, manifest.num_segments_expected):
        dm_cols = tuple([*key_cols, *docmap_cols])
        # sha256 JVM-side so the python workers never hash
        work = docs.select(*key_cols, *docmap_cols, content_col).withColumn(
            "sha256", F.sha2(F.col(content_col).cast("binary"), 256)
        )
        if pack_before_shuffle:
            packed_fields = (
                ["terms_blob string", "codes_pk binary", "n_terms long", "dl long"]
                if with_positions
                else ["terms_blob string", "tfs_vb binary", "n_terms long"]
            )
            pack_schema = ", ".join(
                [f"`{n}` {t}" for n, t in work.drop(content_col).dtypes] + packed_fields
            )
            work = work.mapInPandas(
                _pack_fn(content_col, [*dm_cols, "sha256"], with_positions), pack_schema
            )
        # hash exchange on a driver-planned slot: identical placement to
        # repartitionByRange (contiguous balanced buckets per partition)
        # minus the range-boundary SAMPLING job, which re-ran this whole
        # child — scan + sha256 (+ tokenize/pack in pack mode) — once more
        # over every row (guide §2.4: remove shuffles/passes outright)
        ranged = (
            work.withColumn("_b", bexpr)
            .withColumn("_slot", _partition_slot_expr(counts, num_partitions))
            .repartition(num_partitions, F.col("_slot"))
            .drop("_slot")
            .sortWithinPartitions("_b", *[F.col(c) for c in key_cols])
        )
        frag_schema = ", ".join(
            ["doc_id long"]
            + [f"`{n}` {t}" for n, t in ranged.drop("_b").dtypes]
            + ["seg_id long"]
        )
        frags = ranged.mapInPandas(
            _partition_builder_fn(
                index_dir, offsets, docs_per_segment, content_col, dm_cols, done,
                with_positions,
            ),
            frag_schema,
        )
        # the ONE full-data job: interior segments are written as side
        # effects inside the partitions above; only boundary rows reach this
        # tiny shuffle (≲ 2·docs_per_segment rows per partition)
        frag_rows = (
            frags.groupBy("seg_id")
            .applyInPandas(
                _build_segment_fn(index_dir, content_col, dm_cols, with_positions),
                SEGMENT_MANIFEST_SPARK_SCHEMA,
            )
            .collect()
        )
        for row in frag_rows:
            manifest.segments[str(row["seg_id"])] = row.asDict()
        parts = seg_store.load_manifest_parts(index_dir)

    for sid, meta in parts.items():
        manifest.segments.setdefault(sid, meta)
    save_manifest(index_dir, manifest)

    # global term stats: one input row per distinct (term, segment) — the
    # parquet scan is pruned to (term, df); partial aggregation collapses hot
    # terms map-side, so no skewed reducer.
    postings = spark.read.parquet(seg_store.segments_glob(index_dir))
    term_stats_dir = os.path.join(index_dir, "term_stats")
    # the groupBy's exchange already hash-partitions by term, so the write
    # rides THAT partitioning: each file is term-sorted (row-group min/max
    # stats prune point lookups within every file) and AQE sizes the file
    # count from the data.  The earlier repartitionByRange(term) bought
    # cross-file range disjointness at the price of a SECOND exchange plus
    # its boundary-sampling job (one more full pass over the aggregated
    # dictionary) — per-lookup cost is a footer-stats check per file either
    # way, so the extra exchange was pure overhead.
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(term_stats_dir)
    )

    n_docs_total = sum(m["n_docs"] for m in manifest.segments.values())
    total_tokens = sum(m["total_tokens"] for m in manifest.segments.values())
    stats = {
        "n_docs": int(n_docs_total),
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / n_docs_total) if n_docs_total else 0.0,
        "n_segments": len(manifest.segments),
        "tokenizer_version": manifest.tokenizer_version,
        "index_options": manifest.index_options,
    }
    save_stats(index_dir, stats)
    return stats


def append_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    docmap_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
    pack_before_shuffle: bool = False,
    n_docs_hint: int | None = None,
    batch_id: int | None = None,
    content_xor: int | None = None,
    allow_key_reuse: bool = False,
) -> dict:
    """Append a batch of NEW documents to an existing index (ES ``_bulk``).

    Elasticsearch indexing is incremental: each refresh adds small segments
    and background merges compact them.  Same shape here: the batch gets
    fresh docIDs starting at the next segment boundary after the existing
    maximum (``base_sid·docs_per_segment`` — the gap of < docs_per_segment
    unused ids keeps the segment-range invariant without rewriting the last
    partial segment), builds its own segments with the same deterministic
    bucket machinery, and the global term stats are recomputed from the
    per-segment df rows (tiny).  Compact with ``merge_segments`` when small
    segments accumulate.

    Append-only semantics: keys are assumed NEW (no upsert — dedupe upstream,
    e.g. dedup.dedup_exact).  Batches are resumable AND idempotent: the
    manifest's append ledger records each batch's exact fingerprint
    (n_docs, min/max key) with its reserved base segment id, so a killed
    append re-run completes only the missing segments byte-identically, and
    an at-least-once redelivery (foreachBatch retry) is a no-op — without
    the ledger, a resume would recompute the id base from its own half-built
    segments and duplicate the batch under shifted ids.

    Batch identity beyond keys: the key-only fingerprint cannot tell a
    REPLAY of a batch from a NEW batch that legitimately reuses the same
    key set (``upsert_index``'s update path).  Two optional disambiguators,
    recorded in the ledger entry when provided:

    - ``batch_id``: an external batch identity.  Structured Streaming's
      ``foreachBatch`` guarantees a redelivered micro-batch reuses the same
      ``batch_id``, so identical keys + a DIFFERENT batch_id is a new batch
      (gets a fresh base_sid), identical batch_id is a replay (resumes).
    - ``content_xor``: an order-insensitive 64-bit fold of
      ``xxhash64(*key_cols, content)`` over the batch, for ad-hoc callers
      with no external identity (``upsert_index`` computes it when no
      batch_id is given).  Same keys + different content ⇒ different xor ⇒
      new batch.  When the caller supplies NEITHER, append_index folds it
      itself in the fingerprint pass (reading content there once) so every
      ledger entry carries content identity — otherwise a later upsert of
      the exact same key set could not tell replay from re-upsert and would
      silently drop the update.

    ``allow_key_reuse=True`` (set by ``upsert_index``) additionally relaxes
    the keys-globally-unique contract: a (n, min, max)-colliding entry with
    a different ``key_xor`` is treated as a distinct batch instead of an
    error, because upserted key sets may legitimately overlap old ones.
    """
    manifest = load_manifest(index_dir)
    if manifest is None:
        return build_index(
            spark,
            docs,
            index_dir,
            content_col=content_col,
            key_cols=key_cols,
            docmap_cols=docmap_cols,
            num_partitions=num_partitions,
            pack_before_shuffle=pack_before_shuffle,
            n_docs_hint=n_docs_hint,
        )
    docs_per_segment = manifest.docs_per_segment
    with_positions = manifest.index_options == "positions"
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    n_new = n_docs_hint if n_docs_hint is not None else docs.select(*key_cols).count()
    if n_new == 0:
        return load_stats(index_dir)
    bounds = _sample_key_boundaries(docs, key_cols, n_new, 2 * num_partitions)
    bexpr = _bucket_column(key_cols, bounds, dict(docs.dtypes))
    ks = _key_struct(key_cols)
    # content identity: when the caller did not supply a content_xor, fold
    # one into this same fingerprint pass (bit_xor is associative and
    # commutative, so XOR of per-bucket folds equals upsert_index's
    # whole-frame fold bit for bit).  Recording it on EVERY ledger entry is
    # what lets a later upsert of the exact same key set distinguish
    # replay from re-upsert — without it, upsert_index._is_replay degrades
    # to key identity and silently drops the update.  Cost: this scan then
    # reads the content column once; pass content_xor explicitly to skip.
    fold_content = content_xor is None
    count_rows = (
        docs.select(
            bexpr.alias("_b"),
            ks.alias("_k"),
            F.xxhash64(*[F.col(c) for c in key_cols]).alias("_kh"),
            *(
                [
                    F.xxhash64(
                        *[F.col(c) for c in key_cols], F.col(content_col)
                    ).alias("_ch")
                ]
                if fold_content
                else []
            ),
        )
        .groupBy("_b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("_k").alias("kmin"),
            F.max("_k").alias("kmax"),
            *([F.bit_xor(F.col("_ch")).alias("cxor")] if fold_content else []),
            # order-insensitive 64-bit fold of every key in the bucket: the
            # same key-only scan (content still pruned), but the ledger match
            # now distinguishes batches that agree on (n, min, max) while
            # differing in interior keys.  Content is deliberately NOT folded
            # in — that would force a second full content read per append;
            # same-key-different-content is a violation of the keys-globally-
            # unique contract and is surfaced by the replay warning below.
            F.bit_xor(F.col("_kh")).alias("kxor"),
            # same non-null-keys contract as _rank_plan, same free ride on
            # the existing key-only aggregation
            F.max(
                F.greatest(*[F.col(f"_k.{c}").isNull().cast("int") for c in key_cols])
                if len(key_cols) > 1
                else F.col(f"_k.{key_cols[0]}").isNull().cast("int")
            ).alias("knull"),
        )
        .collect()
    )
    if not count_rows:  # hint said rows exist but the batch is actually empty
        return load_stats(index_dir)
    if any((r["knull"] or 0) > 0 for r in count_rows):
        raise ValueError(
            f"key columns {list(key_cols)} contain NULL values: docID "
            "assignment requires a total order over non-null unique keys — "
            "filter or fill the key columns before indexing"
        )
    counts = {r["_b"]: r["cnt"] for r in count_rows}
    n_new = sum(counts.values())
    key_xor = 0
    for r in count_rows:
        key_xor ^= int(r["kxor"])
    if fold_content:
        cx = 0
        for r in count_rows:
            cx ^= int(r["cxor"])
        content_xor = cx
    batch_fp = {
        "n_docs": int(n_new),
        "min_key": list(min(tuple(r["kmin"]) for r in count_rows)),
        "max_key": list(max(tuple(r["kmax"]) for r in count_rows)),
        "key_xor": key_xor,
    }

    # the ledger makes resumes/replays id-stable: a killed or re-delivered
    # batch MUST NOT recompute base_sid from the segments it already half
    # wrote (that would shift every remaining doc's id and duplicate docs).
    # Keys are globally unique by contract, so an identical (n, min, max,
    # key_xor) fingerprint identifies the same batch.
    existing = manifest.completed_segment_ids() | {
        int(k) for k in seg_store.load_manifest_parts(index_dir)
    }
    _legacy = ("n_docs", "min_key", "max_key")
    prior = None
    for e in manifest.appends:
        if not all(e[k] == batch_fp[k] for k in _legacy):
            continue
        if e.get("key_xor") is not None and e["key_xor"] != batch_fp["key_xor"]:
            if allow_key_reuse:
                continue  # upsert: a distinct batch colliding on (n,min,max)
            raise ValueError(
                "append batch matches a prior ledger entry on (n_docs, min_key,"
                f" max_key) but not on key_xor ({e['key_xor']} != "
                f"{batch_fp['key_xor']}): a different batch is reusing a prior"
                " fingerprint — the keys-globally-unique contract is violated"
            )
        # identical key set — disambiguate replay vs legitimate re-upsert
        if (
            batch_id is not None
            and e.get("batch_id") is not None
            and e["batch_id"] != batch_id
        ):
            continue  # same keys, different external batch ⇒ new batch
        if (
            content_xor is not None
            and e.get("content_xor") is not None
            and e["content_xor"] != content_xor
        ):
            continue  # same keys, different content ⇒ new batch
        prior = e
        break
    if prior is not None:
        prior.setdefault("key_xor", batch_fp["key_xor"])  # backfill old ledgers
        import warnings

        warnings.warn(
            f"append_index: batch fingerprint {batch_fp['n_docs']} docs / "
            f"key_xor={batch_fp['key_xor']} matches ledger entry base_sid="
            f"{prior['base_sid']} — treating as a resume/replay of that batch"
            " (already-built segments will be skipped)",
            stacklevel=2,
        )
        base_sid = int(prior["base_sid"])
    else:
        base_sid = max((max(existing) + 1) if existing else 0, manifest.num_segments_expected)
        entry = {**batch_fp, "base_sid": base_sid}
        if batch_id is not None:
            entry["batch_id"] = int(batch_id)
        if content_xor is not None:
            entry["content_xor"] = int(content_xor)
        manifest.appends.append(entry)
    id_offset = base_sid * docs_per_segment

    offsets = {b: off + id_offset for b, off in _bucket_offsets(counts).items()}
    manifest.num_segments_expected = max(
        manifest.num_segments_expected,
        base_sid + ((n_new + docs_per_segment - 1) // docs_per_segment),
    )
    save_manifest(index_dir, manifest)

    # a resumed append skips batch segments whose artifacts already exist
    done = frozenset(
        sid
        for sid in existing
        if os.path.exists(seg_store.segment_postings_path(index_dir, sid))
    )

    dm_cols = tuple([*key_cols, *docmap_cols])
    work = docs.select(*key_cols, *docmap_cols, content_col).withColumn(
        "sha256", F.sha2(F.col(content_col).cast("binary"), 256)
    )
    if pack_before_shuffle:
        packed_fields = (
            ["terms_blob string", "codes_pk binary", "n_terms long", "dl long"]
            if with_positions
            else ["terms_blob string", "tfs_vb binary", "n_terms long"]
        )
        pack_schema = ", ".join(
            [f"`{n}` {t}" for n, t in work.drop(content_col).dtypes] + packed_fields
        )
        work = work.mapInPandas(
            _pack_fn(content_col, [*dm_cols, "sha256"], with_positions), pack_schema
        )
    # driver-planned hash exchange instead of repartitionByRange — drops the
    # boundary-sampling pass (see build_index)
    ranged = (
        work.withColumn("_b", bexpr)
        .withColumn("_slot", _partition_slot_expr(counts, num_partitions))
        .repartition(num_partitions, F.col("_slot"))
        .drop("_slot")
        .sortWithinPartitions("_b", *[F.col(c) for c in key_cols])
    )
    frag_schema = ", ".join(
        ["doc_id long"]
        + [f"`{n}` {t}" for n, t in ranged.drop("_b").dtypes]
        + ["seg_id long"]
    )
    frags = ranged.mapInPandas(
        _partition_builder_fn(
            index_dir, offsets, docs_per_segment, content_col, dm_cols, done,
            with_positions,
        ),
        frag_schema,
    )
    frag_rows = (
        frags.groupBy("seg_id")
        .applyInPandas(
            _build_segment_fn(index_dir, content_col, dm_cols, with_positions),
            SEGMENT_MANIFEST_SPARK_SCHEMA,
        )
        .collect()
    )
    for row in frag_rows:
        manifest.segments[str(row["seg_id"])] = row.asDict()
    for sid, meta in seg_store.load_manifest_parts(index_dir).items():
        manifest.segments.setdefault(sid, meta)
    save_manifest(index_dir, manifest)

    postings = spark.read.parquet(seg_store.segments_glob(index_dir))
    # ride the groupBy's own hash partitioning (see build_index): term-sorted
    # files without a second exchange or its sampling pass
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "term_stats"))
    )
    n_docs_total = sum(m["n_docs"] for m in manifest.segments.values())
    total_tokens = sum(m["total_tokens"] for m in manifest.segments.values())
    stats = {
        "n_docs": int(n_docs_total),
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / n_docs_total) if n_docs_total else 0.0,
        "n_segments": len(manifest.segments),
        "tokenizer_version": manifest.tokenizer_version,
        "index_options": manifest.index_options,
    }
    save_stats(index_dir, stats)
    return stats


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> None:
    """Soft-delete documents by INTERNAL doc id (ES ``_bulk`` delete, H1).

    Lucene-style tombstones: a parquet batch of deleted ids is appended under
    ``<index_dir>/deletes/``; segments are untouched.  Queries exclude
    tombstoned docs from matches, but — exactly like Lucene soft deletes —
    corpus statistics (N, df, avgdl) keep counting them until a merge
    compacts them away (``merge_segments(apply_deletes=True)``).  Deleting an
    id twice is harmless (the query-side anti-join is idempotent).

    ``doc_ids``: a DataFrame with a ``doc_id`` column, or an iterable of ints.
    """
    if not isinstance(doc_ids, DataFrame):
        doc_ids = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long")
    (
        doc_ids.select(F.col("doc_id").cast("long"))
        .write.mode("append")
        .parquet(os.path.join(index_dir, "deletes"))
    )


def delete_by_keys(
    spark: SparkSession,
    index_dir: str,
    keys: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> None:
    """Soft-delete by natural key: resolve keys through the docmap, then
    tombstone the matching internal ids (the key-addressed ES delete)."""
    docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
    ids = docmap.join(keys.select(*key_cols).distinct(), on=list(key_cols)).select(
        "doc_id"
    )
    delete_docs(spark, index_dir, ids)


def upsert_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    docmap_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
    pack_before_shuffle: bool = False,
    batch_id: int | None = None,
) -> dict:
    """ES ``_bulk`` index action: update-or-insert by natural key.

    Spark/Lucene shape: tombstone any existing docs holding the incoming
    keys (delete_by_keys), then append the batch as fresh segments with new
    docIDs (append_index) — documents are immutable, updates are
    delete+reinsert, exactly Lucene's model.  The key resolution is one
    docmap join (key-pruned columns only); the append reuses the resumable
    ledger machinery.

    Replay-safe: the delete step consults the append ledger FIRST.  On an
    at-least-once redelivery (or a resume after a mid-append crash that
    already recorded the ledger entry), the batch's docs from the first
    attempt are ALREADY in the docmap — an unconditional delete_by_keys
    would tombstone them, and the subsequent ledger-matched append would
    skip rebuilding their segments, silently losing the whole batch to the
    next ``merge_segments(apply_deletes=True)``.  A batch whose fingerprint
    matches a prior ledger entry therefore skips the delete entirely (the
    first attempt already tombstoned the superseded docs; tombstoning is
    idempotent, so crash-between-delete-and-ledger replays simply re-delete).

    Replay vs re-upsert: keys alone cannot distinguish a REDELIVERY of a
    batch from a legitimate second upsert that updates the SAME key set
    with NEW content — treating the latter as a replay would silently drop
    the update.  Disambiguation (see ``append_index``): pass ``batch_id``
    when the caller has an external batch identity (``stream_upsert`` passes
    the foreachBatch micro-batch id, which Spark reuses on redelivery);
    without one, a content fingerprint (order-insensitive
    ``bit_xor(xxhash64(*key_cols, content))``) is folded into the same
    fingerprint scan and ledger entry, so same-keys-new-content classifies
    as a new batch: the delete runs and fresh segments are built.
    """
    manifest = load_manifest(index_dir)
    content_xor: int | None = None
    if manifest is not None:
        ks = _key_struct(key_cols)
        # content identity rides the same scan even when batch_id is given:
        # a later ad-hoc upsert (no batch_id) can then still compare against
        # this entry instead of falling back to key-only legacy matching
        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ks).alias("kmin"),
            F.max(ks).alias("kmax"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in key_cols])).alias("kxor"),
            F.bit_xor(
                F.xxhash64(*[F.col(c) for c in key_cols], F.col(content_col))
            ).alias("cxor"),
        ).collect()[0]
        fp = {
            "n_docs": int(row["n"]),
            "min_key": None if row["kmin"] is None else list(row["kmin"]),
            "max_key": None if row["kmax"] is None else list(row["kmax"]),
            "key_xor": None if row["kxor"] is None else int(row["kxor"]),
        }
        content_xor = None if row["cxor"] is None else int(row["cxor"])

        def _is_replay(e: dict) -> bool:
            if not all(e[k] == fp[k] for k in ("n_docs", "min_key", "max_key")):
                return False
            if e.get("key_xor") is not None and e["key_xor"] != fp["key_xor"]:
                return False  # different interior keys ⇒ different batch
            if batch_id is not None and e.get("batch_id") is not None:
                return e["batch_id"] == batch_id
            if content_xor is not None and e.get("content_xor") is not None:
                return e["content_xor"] == content_xor
            return True  # legacy entry: key identity is all we have

        replay = fp["n_docs"] > 0 and any(_is_replay(e) for e in manifest.appends)
        if fp["n_docs"] > 0 and not replay:
            delete_by_keys(spark, index_dir, docs.select(*key_cols), key_cols)
    return append_index(
        spark,
        docs,
        index_dir,
        content_col=content_col,
        key_cols=key_cols,
        docmap_cols=docmap_cols,
        num_partitions=num_partitions,
        pack_before_shuffle=pack_before_shuffle,
        batch_id=batch_id,
        content_xor=content_xor,
        allow_key_reuse=True,
    )


def tiered_merge_buckets(
    index_dir: str,
    *,
    fanin: int = 8,
    max_merged_bytes: int | None = None,
) -> dict[int, int]:
    """Size-aware merge grouping — Lucene TieredMergePolicy's goal under
    this engine's docID-order invariant.

    A blind ``seg_id // fanin`` grouping re-merges giants with mites: after
    many ``append_index`` batches the segment size distribution is wildly
    uneven, and rewriting a huge already-merged segment to absorb a tiny
    fresh one costs its full byte volume every compaction (Lucene's merge
    policy exists precisely to avoid this).  This planner greedily packs
    the seg_id-ORDERED segment list into contiguous runs, closing a run
    when it would exceed ``fanin`` members or ``max_merged_bytes`` combined
    postings bytes; a segment that alone reaches ``max_merged_bytes`` stays
    a singleton (it is re-encoded but not combined — merged output is
    byte-stable for it).

    Contiguity is NOT an implementation convenience: docIDs are never
    remapped (unlike Lucene), so ``merge_segments``'s linear concat relies
    on each group covering a contiguous, ordered seg_id range — an
    arbitrary (Lucene-style) subset would interleave doc ranges and break
    the strictly-increasing docID encode.  Sizes come from the manifest's
    per-segment lineage (``postings_bytes``), no filesystem scan.
    """
    manifest = load_manifest(index_dir)
    if manifest is None:
        raise ValueError(f"no manifest at {index_dir}")
    segs = {int(s): m for s, m in manifest.segments.items()}
    for s, m in seg_store.load_manifest_parts(index_dir).items():
        segs.setdefault(int(s), m)
    buckets: dict[int, int] = {}
    b, count, size = 0, 0, 0
    for sid in sorted(segs):
        sz = int(segs[sid]["postings_bytes"])
        giant = max_merged_bytes is not None and sz >= max_merged_bytes
        over = max_merged_bytes is not None and size + sz > max_merged_bytes
        if count and (count >= fanin or giant or over):
            b, count, size = b + 1, 0, 0
        buckets[sid] = b
        count, size = count + 1, size + sz
        if giant:
            b, count, size = b + 1, 0, 0
    return buckets


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    *,
    fanin: int = 8,
    apply_deletes: bool = False,
    buckets: dict[int, int] | None = None,
) -> None:
    """Merge segments ``fanin``-at-a-time into larger ones (H4).

    Groups by ``(term, merge_bucket)`` where ``merge_bucket = seg_id //
    fanin`` — or an explicit ``buckets`` mapping from
    ``tiered_merge_buckets`` (size-aware compaction after uneven appends).
    The bucket is the salt: a Zipf-hot term's postings stay split
    across buckets instead of landing on one reducer.  Because segment doc
    ranges are disjoint and ordered by seg_id, concatenating per-segment
    postings in seg_id order preserves global docID order, so re-encoding is
    a linear concat, no re-sort; explicit buckets must therefore be
    CONTIGUOUS nondecreasing runs over the seg_id order (validated).

    ``apply_deletes=True`` compacts soft deletes away Lucene-style: rows of
    tombstoned docs are dropped while merging (ids/tfs/dls masked, position
    runs filtered by the same occurrence mask), df re-counted.  The deleted
    set ships to executors as a broadcast sorted array (np.isin per bucket);
    at a deleted-fraction where that array itself is big, rewrite via an
    anti-join on exploded postings instead.
    """
    postings = spark.read.parquet(seg_store.segments_glob(index_dir))
    if "pos_vb" not in postings.columns:
        # legacy pre-positions segment layout: normalize to the current
        # schema with empty positional payloads (≡ index_options="freqs")
        postings = postings.withColumn("pos_vb", F.lit(b""))
    if buckets is None:
        bucket_expr = (F.col("seg_id") / F.lit(fanin)).cast("long")
    else:
        prev = None
        for sid in sorted(buckets):
            if prev is not None and buckets[sid] < prev:
                raise ValueError(
                    "merge buckets must be nondecreasing contiguous runs in"
                    f" seg_id order (seg {sid}: bucket {buckets[sid]} < {prev})"
                    " — docIDs are not remapped, so a non-contiguous group"
                    " would interleave doc ranges"
                )
            prev = buckets[sid]
        # literal map lookup: segment counts are thousands at most (each is
        # docs_per_segment docs); swap for a broadcast join beyond that.
        # A segment absent from the mapping fails loudly, not as a NULL key.
        mapped = F.element_at(
            F.create_map(
                *[F.lit(x) for sid, b in sorted(buckets.items()) for x in (sid, b)]
            ),
            F.col("seg_id"),
        )
        bucket_expr = F.when(mapped.isNotNull(), mapped).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("segment missing from merge buckets: "),
                    F.col("seg_id").cast("string"),
                )
            )
        )
    bucketed = postings.withColumn("merge_bucket", bucket_expr)

    deleted_bc = None
    if apply_deletes:
        ddir = os.path.join(index_dir, "deletes")
        if os.path.isdir(ddir):
            arr = np.sort(
                np.array(
                    [r["doc_id"] for r in spark.read.parquet(ddir).distinct().collect()],
                    dtype=np.int64,
                )
            )
            if arr.size:
                deleted_bc = spark.sparkContext.broadcast(arr)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg_id")
        ids = np.concatenate([codec.decode_posting_ids(b) for b in pdf["doc_ids_vb"]])
        tfs = np.concatenate([codec.varbyte_decode(b) for b in pdf["tfs_vb"]])
        dls = np.concatenate([codec.varbyte_decode(b) for b in pdf["dls_vb"]])
        if deleted_bc is None:
            # position deltas restart per doc and varbyte streams are
            # self-delimiting, so seg-ordered byte concatenation IS the
            # merged positional list (boundaries recovered from the
            # concatenated tfs) — no decode/re-encode needed
            pos_vb = b"".join(pdf["pos_vb"])
        elif not any(len(b) for b in pdf["pos_vb"]):
            # index_options=freqs: no positions to filter
            mask = ~np.isin(ids.astype(np.int64), deleted_bc.value)
            ids, tfs, dls = ids[mask], tfs[mask], dls[mask]
            if ids.size == 0:
                return pd.DataFrame(
                    [], columns=["term", "seg_id", "df", "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb"]
                )
            pos_vb = b""
        else:
            mask = ~np.isin(ids.astype(np.int64), deleted_bc.value)
            pdeltas = codec.varbyte_decode(b"".join(pdf["pos_vb"]))
            starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
            pos_abs = codec.segmented_delta_decode(pdeltas, starts)
            keep_occ = np.repeat(mask, tfs.astype(np.int64))
            ids, tfs, dls = ids[mask], tfs[mask], dls[mask]
            if ids.size == 0:
                return pd.DataFrame(
                    [], columns=["term", "seg_id", "df", "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb"]
                )
            new_starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
            pos_vb = codec.varbyte_encode(
                codec.segmented_delta_encode(pos_abs[keep_occ], new_starts)
            )
        return pd.DataFrame(
            [
                {
                    "term": key[0],
                    "seg_id": int(key[1]),
                    "df": len(ids),
                    "doc_ids_vb": codec.encode_posting_ids(ids),
                    "tfs_vb": codec.varbyte_encode(tfs),
                    "dls_vb": codec.varbyte_encode(dls),
                    "pos_vb": pos_vb,
                }
            ]
        )

    merged = bucketed.groupBy("term", "merge_bucket").applyInPandas(
        merge, seg_store.POSTINGS_SPARK_SCHEMA
    )
    n_buckets = max(1, bucketed.select("merge_bucket").distinct().count())
    (
        merged.repartitionByRange(n_buckets, "seg_id", "term")
        .sortWithinPartitions("seg_id", "term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "segments"))
    )

    # --- finalize: make out_dir a fully-openable index ------------------
    # (stats.json + term_stats + docmap).  The merged dir is a read-
    # optimized snapshot — per-segment build lineage (manifest) stays with
    # the source index; resume/append continue against index_dir.
    merged_read = spark.read.parquet(os.path.join(out_dir, "segments"))
    (
        merged_read.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .repartitionByRange(n_buckets, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
    docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
    old_stats = seg_store.load_stats(index_dir)
    if deleted_bc is not None:
        ddf = spark.createDataFrame(
            [(int(i),) for i in deleted_bc.value], "doc_id long"
        )
        docmap = docmap.join(F.broadcast(ddf), on="doc_id", how="left_anti")
        docmap.write.mode("overwrite").parquet(os.path.join(out_dir, "docmap"))
        n_docs = spark.read.parquet(os.path.join(out_dir, "docmap")).count()
        # Σ tf over merged postings counts every surviving token occurrence
        # exactly once; one Arrow-batched decode per posting cell
        tf_sum = F.pandas_udf(
            lambda s: s.map(lambda b: int(codec.varbyte_decode(b).sum())), "long"
        )
        total_tokens = (
            merged_read.select(tf_sum("tfs_vb").alias("t")).agg(F.sum("t")).collect()[0][0]
            or 0
        )
    else:
        # stats are unchanged (soft deletes keep counting, Lucene-style);
        # carry any tombstones forward so the merged index still masks them
        docmap.write.mode("overwrite").parquet(os.path.join(out_dir, "docmap"))
        n_docs = int(old_stats["n_docs"])
        total_tokens = int(old_stats["total_tokens"])
        src_deletes = os.path.join(index_dir, "deletes")
        if os.path.isdir(src_deletes):
            spark.read.parquet(src_deletes).write.mode("overwrite").parquet(
                os.path.join(out_dir, "deletes")
            )
    seg_store.save_stats(
        out_dir,
        {
            "n_docs": int(n_docs),
            "total_tokens": int(total_tokens),
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_segments": n_buckets,
            "tokenizer_version": old_stats["tokenizer_version"],
            "index_options": old_stats.get("index_options", "positions"),
        },
    )


def build_term_gram_index(
    spark: SparkSession,
    index_dir: str,
    *,
    n: int = 2,
    num_partitions: int | None = None,
) -> dict:
    """Persist a character-n-gram secondary index over the TERM DICTIONARY
    (``<index_dir>/term_grams``) — the scale path for fuzzy expansion.

    Lucene intersects a Levenshtein automaton with the terms dictionary;
    the Spark-shaped analog is q-gram filtering (Gravano et al., VLDB'01):
    a term within edit distance ``k`` of the query must share at least
    ``|distinct n-grams(q)| − k·n`` of the query's distinct n-grams (each
    edit destroys at most ``n`` gram types).  The index stores one row per
    (gram, term) with the term's df CARRIED IN-ROW, range-partitioned and
    sorted by gram so a probe's ``gram IN (...)`` prunes to ~len(query)
    gram groups — the Levenshtein DP then runs over the tiny candidate set
    instead of sweeping a 10⁸-term dictionary.

    Derived entirely from term_stats: rebuild after index mutations (the
    same point-in-time contract as every other reader artifact).
    """
    if n < 1:
        raise ValueError(f"gram size must be >= 1: {n}")
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
    grams = stats.select(
        "term",
        "df",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.length("term") - n, F.lit(0))
                    ),
                    lambda i: F.col("term").substr(i + F.lit(1), F.lit(n)),
                )
            )
        ).alias("gram"),
    ).where(F.length("gram") == n)
    out = os.path.join(index_dir, "term_grams")
    (
        grams.repartitionByRange(max(1, num_partitions // 4), "gram")
        .sortWithinPartitions("gram", "term")
        .write.mode("overwrite")
        .parquet(out)
    )
    meta = {"n": int(n), "kind": "term_grams"}
    import json

    with open(os.path.join(index_dir, "term_grams_meta.json"), "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    return meta
