"""foreachBatch bridge: streaming document source → incremental index build."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.index_build import append_index


def stream_index(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    *,
    schema: str,
    checkpoint_dir: str,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    docmap_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a streaming index-ingestion query.

    Reads parquet files appearing under ``input_path`` as a stream; every
    micro-batch appends segments to ``index_dir`` via ``append_index`` (the
    first batch creates the index).  With ``available_now=True`` the query
    processes everything currently available and stops — the batch-ingest
    shape ES's ``_bulk`` loop has; pass ``False`` to keep it running and
    call ``.stop()``/``.awaitTermination()`` yourself.

    Returns the ``StreamingQuery``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch redelivers a failed micro-batch under the SAME
        # batch_id — recording it in the append ledger makes replay
        # detection exact instead of key-fingerprint-only
        append_index(
            spark,
            batch_df,
            index_dir,
            content_col=content_col,
            key_cols=key_cols,
            docmap_cols=docmap_cols,
            num_partitions=num_partitions,
            batch_id=batch_id,
        )

    reader = spark.readStream.schema(schema).parquet(input_path)
    writer = (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def stream_upsert(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    *,
    schema: str,
    checkpoint_dir: str,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    docmap_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """Streaming update-or-insert by natural key (the CDC-shaped ingest).

    Same bridge as ``stream_index`` but each micro-batch goes through
    ``upsert_index``: existing docs holding the batch's keys are
    tombstoned, the batch appends as fresh segments.  Correct under
    foreachBatch's at-least-once delivery — ``upsert_index`` consults the
    append ledger before deleting, so a redelivered batch neither
    re-tombstones its own first attempt nor appends twice (the replay
    becomes a pure no-op; see plans.index_build.upsert_index).

    Within ONE micro-batch, keys must be unique (dedupe upstream — e.g.
    keep the latest change per key with a window before the sink); across
    batches, later batches supersede earlier ones, in batch order.
    """
    from ..plans.index_build import upsert_index

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch_id disambiguates an at-least-once REDELIVERY (same id ⇒
        # replay, no-op) from a later upsert updating the same key set with
        # new content (different id ⇒ delete + fresh segments)
        upsert_index(
            spark,
            batch_df,
            index_dir,
            content_col=content_col,
            key_cols=key_cols,
            docmap_cols=docmap_cols,
            num_partitions=num_partitions,
            batch_id=batch_id,
        )

    reader = spark.readStream.schema(schema).parquet(input_path)
    writer = (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query
