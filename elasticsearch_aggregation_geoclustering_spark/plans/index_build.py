"""Batch inverted-index build: documents DataFrame -> segmented postings.

The Spark-first shape of Elasticsearch's bulk-index path (SURVEY.md §3.2),
designed so the FULL data (the large ``content`` column) is read once and
shuffled exactly twice, with everything else riding cheap column-pruned jobs:

1. **docID assignment** — dense rank over the natural key
   ``(repo, path, commit)``, the deterministic BM25 tie-break order.  A
   window over an unpartitioned ORDER BY would serialize on one task, so we
   use the scalable two-pass idiom: ``repartitionByRange`` on the key (global
   range sort), count rows per partition on a KEY-ONLY projection (Catalyst
   prunes ``content`` out of this shuffle), broadcast the partition offsets,
   then assign ``offset[pid] + local_row`` inside ``mapInPandas``.  The rank
   depends only on the global key order — never on where the range
   boundaries fall — so ids are deterministic across runs and parallelisms.
2. **segmenting** — ``seg_id = doc_id // docs_per_segment``: contiguous,
   disjoint docID ranges, the analog of Lucene segments.  Because segments
   partition by DOCUMENT, not by term, no term-keyed shuffle ever carries
   raw postings, so Zipf-hot terms ("the", "import") cannot concentrate on
   one reducer — each segment holds at most ``docs_per_segment`` entries of
   any term.  (The term-keyed shuffles that do exist — global df stats and
   segment merging — aggregate/are bucketed per segment, i.e. pre-salted;
   see merge_segments.)
3. **segment build** — one ``applyInPandas`` group per segment: tokenize
   (vectorized pandas), per-doc term frequencies, delta+varbyte pack, write
   one postings parquet sorted by term (row-group stats prune term lookups)
   PLUS the segment's docmap part (doc_id, keys, sha256, extras) — both
   atomic, deterministic bytes — and return a manifest row with lineage +
   metrics.  Doc lengths are denormalized into each posting (``dls_vb``) —
   Lucene-norm style — so scoring never joins a doc-length table.
4. **global stats** — ``groupBy(term).sum(df)`` over the per-segment df
   rows (tiny: one row per distinct (term, segment), column-pruned to two
   columns), plus N/avgdl.

Resumability (north_rule): completed segment ids are recorded in
``manifest.json`` and filtered out of step 3 on re-run; files are written
atomically with deterministic bytes and sha256 recorded
(tests/test_index_build.py asserts byte-identical resume).
"""

from __future__ import annotations

import os


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.tokenizer import TOKENIZER_VERSION, doc_term_frequencies
from ..sources import segments as seg_store
from ..sources.segments import (
    SEGMENT_MANIFEST_SPARK_SCHEMA,
    IndexManifest,
    load_manifest,
    save_manifest,
    save_stats,
)

DEFAULT_DOCS_PER_SEGMENT = 8192


def _ranged_with_pid(df: DataFrame, key_cols: tuple[str, ...], num_partitions: int) -> DataFrame:
    """Range-partition + sort by key, tagged with the partition id.

    MUST be persisted before running more than one action over it:
    ``repartitionByRange`` samples its range boundaries with a seed derived
    from the RDD id, so two separate jobs over the same *lineage* can place
    rows in DIFFERENT partitions.  Anything that collects per-partition counts
    in one job and applies them in another (doc_id assignment, the segment
    build) would silently corrupt ids without the persist.  MEMORY_AND_DISK
    pins one materialized partitioning that every downstream action reuses —
    at cluster scale this is one extra local spill of the data, the price of
    a deterministic two-phase prefix sum.  (On a real cluster with executor
    loss, use a reliable checkpoint instead; recomputation after block loss
    would re-sample the boundaries.)
    """
    from pyspark import StorageLevel

    keys = [F.col(c) for c in key_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    return ranged.persist(StorageLevel.MEMORY_AND_DISK)


def _partition_offsets(ranged: DataFrame) -> tuple[dict[int, int], dict[int, int], int]:
    """Rows-before-this-partition offsets + total count.

    Catalyst prunes every column but ``_pid`` out of this job, so the shuffle
    carries only the range keys — cheap even when ``content`` is huge.
    """
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return offsets, counts, acc


_MID_LOCAL_MASK = (1 << 33) - 1  # monotonically_increasing_id = pid<<33 | local_row


def _with_doc_ids(ranged: DataFrame, offsets: dict[int, int]) -> DataFrame:
    """doc_id = offset[partition] + local row index — pure JVM, no Python pass.

    ``monotonically_increasing_id`` is exactly ``(pid << 33) | local_row``
    with local_row counted in evaluation order, i.e. the sortWithinPartitions
    order — so offset + low-33-bits is the global dense rank.  The offsets
    literal map is one entry per range partition (broadcast-sized; switch to
    a broadcast join if partition counts ever reach millions).
    """
    offset_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    mid = F.monotonically_increasing_id()
    doc_id = (
        F.coalesce(F.element_at(offset_map, F.col("_pid")), F.lit(0))
        + mid.bitwiseAND(F.lit(_MID_LOCAL_MASK))
    ).alias("doc_id")
    rest = [c for c in ranged.columns if c != "_pid"]
    return ranged.select(doc_id, *rest)


def assign_doc_ids(
    df: DataFrame, key_cols: tuple[str, ...], num_partitions: int | None = None
) -> DataFrame:
    """Dense rank over ``key_cols`` without a single-task window.

    Requires the key to be unique per row (true for (repo, path, commit)).
    The returned DataFrame reads a persisted partitioning (see
    _ranged_with_pid) — every action over it sees the same consistent ids.
    The cache is released by ``spark.catalog.clearCache()`` or session end.
    """
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(df, key_cols, num_partitions)
    offsets, _counts, _ = _partition_offsets(ranged)
    return _with_doc_ids(ranged, offsets)


def _build_one_segment(
    index_dir: str,
    seg_id: int,
    pdf: pd.DataFrame,
    content_col: str,
    docmap_cols: tuple[str, ...],
) -> dict:
    """Tokenize + pack one segment; write postings + docmap part atomically;
    return the manifest/lineage dict.  Shared by the interior (in-partition)
    and fragment (shuffled-boundary) build paths — identical bytes either way.
    """
    import pyarrow as pa

    t0 = seg_store.now()
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    doc_ids = pdf["doc_id"].to_numpy(np.int64)

    tf_frame = doc_term_frequencies(pdf[content_col])
    # doc length per positional row, then per doc_id
    dl_by_row = np.zeros(len(pdf), dtype=np.int64)
    if not tf_frame.empty:
        dl_sums = tf_frame.groupby("row")["tf"].sum()
        dl_by_row[dl_sums.index.to_numpy(np.int64)] = dl_sums.to_numpy(np.int64)

    if tf_frame.empty:
        terms_u = np.empty(0, dtype=object)
        starts = np.empty(0, dtype=np.int64)
        run_lens = np.empty(0, dtype=np.int64)
        total = 0
        ids_all = np.empty(0, dtype=np.int64)
        tf_vals = np.empty(0, dtype=np.int64)
        dls_all = np.empty(0, dtype=np.int64)
    else:
        # postings order: (term asc, doc_id asc); rows within a term are
        # already doc-ordered because doc_term_frequencies sorts by row
        term_sorted = tf_frame.sort_values(["term", "row"], kind="stable").reset_index(drop=True)
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

    # all three binary columns come out of one vectorized encode each
    deltas = codec.segmented_delta_encode(ids_all.astype(np.uint64), starts)
    table = pa.table(
        {
            "term": pa.array(terms_u, pa.string()),
            "seg_id": pa.array(np.full(len(terms_u), seg_id, dtype=np.int64)),
            "df": pa.array(run_lens.astype(np.int64)),
            "doc_ids_vb": codec.segmented_varbyte_binary(deltas, starts, total),
            "tfs_vb": codec.segmented_varbyte_binary(tf_vals.astype(np.uint64), starts, total),
            "dls_vb": codec.segmented_varbyte_binary(dls_all.astype(np.uint64), starts, total),
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
):
    """applyInPandas wrapper over _build_one_segment (the fragment path)."""

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        meta = _build_one_segment(index_dir, int(key[0]), pdf, content_col, docmap_cols)
        return pd.DataFrame([meta])

    return build


def _partition_builder_fn(
    index_dir: str,
    offsets: dict[int, int],
    counts: dict[int, int],
    docs_per_segment: int,
    content_col: str,
    docmap_cols: tuple[str, ...],
    done: frozenset[int],
):
    """mapInPandas builder: assign ids locally, build every segment FULLY
    CONTAINED in this partition's doc range in place (writing postings +
    docmap part + a manifest-part json, no shuffle), and emit only the
    boundary rows (head/tail partial segments) for the tiny fragment stage.

    This is what makes the build a single full-data shuffle: segment
    boundaries are global multiples of ``docs_per_segment``, a range
    partition covers a contiguous id span, so at most ~2 segments' worth of
    rows per partition ever leave the partition.
    """
    from collections.abc import Iterator as _It

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        buffer: list[pd.DataFrame] = []
        buffered = 0
        pid = None
        base = 0
        seen = 0

        def flush_complete(force_tail: bool):
            nonlocal buffer, buffered
            if not buffer:
                return
            pdf = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
            buffer, buffered = [], 0
            first_id = int(pdf["doc_id"].iloc[0])
            pend = base + counts[pid]  # partition's exclusive id end
            out_frags = []
            i = 0
            n = len(pdf)
            while i < n:
                sid = (first_id + i) // docs_per_segment
                seg_start = sid * docs_per_segment
                seg_end = seg_start + docs_per_segment
                take = min(n - i, seg_end - (first_id + i))
                chunk = pdf.iloc[i : i + take]
                contained = seg_start >= base and seg_end <= pend
                complete_here = (first_id + i) == seg_start and take == (seg_end - seg_start)
                if contained and complete_here:
                    if sid not in done:
                        meta = _build_one_segment(
                            index_dir, sid, chunk, content_col, docmap_cols
                        )
                        seg_store.save_manifest_part(index_dir, meta)
                elif contained and not complete_here and not force_tail:
                    # incomplete interior chunk: wait for more batches
                    buffer.append(chunk.copy())
                    buffered = len(chunk)
                    break
                else:
                    if sid not in done:
                        out_frags.append(chunk)
                i += take
            if out_frags:
                yield pd.concat(out_frags, ignore_index=True)

        for raw in batches:
            if raw.empty:
                continue
            if pid is None:
                pid = int(raw["_pid"].iloc[0])
                base = offsets[pid]
            ids = np.arange(base + seen, base + seen + len(raw), dtype=np.int64)
            seen += len(raw)
            pdf = raw.drop(columns=["_pid"])
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
) -> dict:
    """Build (or resume) the inverted index; returns the stats dict.

    ``docmap_cols``: extra columns carried into the docmap table (e.g. lang,
    lon, lat) for query-time joins.  The docmap also records
    ``sha256(content)`` per row — the input_hint per-row invariant.
    """
    os.makedirs(index_dir, exist_ok=True)
    manifest = load_manifest(index_dir) if resume else None
    if manifest is not None:
        docs_per_segment = manifest.docs_per_segment

    # sha256 JVM-side so the python workers never hash; carried through the
    # shuffle alongside the docmap columns
    work = docs.select(*key_cols, *docmap_cols, content_col).withColumn(
        "sha256", F.sha2(F.col(content_col).cast("binary"), 256)
    )
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(work, key_cols, num_partitions)
    # this job also materializes the persisted partitioning that the segment
    # build below reuses — offsets/counts are guaranteed to describe the
    # exact partitions mapInPandas will iterate
    offsets, counts, n_docs = _partition_offsets(ranged)

    if manifest is None:
        manifest = IndexManifest(
            docs_per_segment=docs_per_segment,
            tokenizer_version=TOKENIZER_VERSION,
            num_segments_expected=(n_docs + docs_per_segment - 1) // docs_per_segment,
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
        frag_schema = ", ".join(
            ["doc_id long"]
            + [f"`{name}` {dtype}" for name, dtype in ranged.drop("_pid").dtypes]
            + ["seg_id long"]
        )
        frags = ranged.mapInPandas(
            _partition_builder_fn(
                index_dir, offsets, counts, docs_per_segment, content_col, dm_cols, done
            ),
            frag_schema,
        )
        # the ONE full-data job: interior segments are written as side
        # effects inside the partitions above; only boundary rows reach this
        # tiny shuffle (≲ 2·docs_per_segment rows per partition)
        frag_rows = (
            frags.groupBy("seg_id")
            .applyInPandas(
                _build_segment_fn(index_dir, content_col, dm_cols),
                SEGMENT_MANIFEST_SPARK_SCHEMA,
            )
            .collect()
        )
        for row in frag_rows:
            manifest.segments[str(row["seg_id"])] = row.asDict()
        parts = seg_store.load_manifest_parts(index_dir)
    ranged.unpersist()

    for sid, meta in parts.items():
        manifest.segments.setdefault(sid, meta)
    save_manifest(index_dir, manifest)

    # global term stats: one input row per distinct (term, segment) — the
    # parquet scan is pruned to (term, df); partial aggregation collapses hot
    # terms map-side, so no skewed reducer.
    postings = spark.read.parquet(seg_store.segments_glob(index_dir))
    term_stats_dir = os.path.join(index_dir, "term_stats")
    # range-partitioned by term: each output file is term-sorted and files
    # cover disjoint term ranges, so point lookups still prune via row-group
    # min/max stats — but the write runs on stats_parts tasks instead of one
    # reducer (at source-code scale the dictionary is 10^8+ terms; a single
    # repartition(1) writer was the build's only serial stage).
    stats_parts = max(1, min(num_partitions, len(manifest.segments)))
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .repartitionByRange(stats_parts, "term")
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
    }
    save_stats(index_dir, stats)
    return stats


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    *,
    fanin: int = 8,
) -> None:
    """Merge segments ``fanin``-at-a-time into larger ones (H4).

    Groups by ``(term, merge_bucket)`` where ``merge_bucket = seg_id //
    fanin`` — the bucket is the salt: a Zipf-hot term's postings stay split
    across buckets instead of landing on one reducer.  Because segment doc
    ranges are disjoint and ordered by seg_id, concatenating per-segment
    postings in seg_id order preserves global docID order, so re-encoding is
    a linear concat, no re-sort.
    """
    postings = spark.read.parquet(seg_store.segments_glob(index_dir))
    bucketed = postings.withColumn("merge_bucket", (F.col("seg_id") / F.lit(fanin)).cast("long"))

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg_id")
        ids = np.concatenate([codec.decode_posting_ids(b) for b in pdf["doc_ids_vb"]])
        tfs = np.concatenate([codec.varbyte_decode(b) for b in pdf["tfs_vb"]])
        dls = np.concatenate([codec.varbyte_decode(b) for b in pdf["dls_vb"]])
        return pd.DataFrame(
            [
                {
                    "term": key[0],
                    "seg_id": int(key[1]),
                    "df": len(ids),
                    "doc_ids_vb": codec.encode_posting_ids(ids),
                    "tfs_vb": codec.varbyte_encode(tfs),
                    "dls_vb": codec.varbyte_encode(dls),
                }
            ]
        )

    merged = bucketed.groupBy("term", "merge_bucket").applyInPandas(
        merge, seg_store.POSTINGS_SPARK_SCHEMA
    )
    (
        merged.repartitionByRange(max(1, bucketed.select("merge_bucket").distinct().count()), "seg_id", "term")
        .sortWithinPartitions("seg_id", "term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "segments"))
    )
