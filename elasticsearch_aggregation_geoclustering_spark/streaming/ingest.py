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
        append_index(
            spark,
            batch_df,
            index_dir,
            content_col=content_col,
            key_cols=key_cols,
            docmap_cols=docmap_cols,
            num_partitions=num_partitions,
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
