"""Structured Streaming ingestion for the inverted index.

Elasticsearch's indexing surface is a continuous ``_bulk`` stream with
periodic refreshes making new segments searchable; the Spark-native analog
is a Structured Streaming source feeding ``foreachBatch`` into the
incremental segment build (`plans.index_build.append_index`).  Each
micro-batch becomes a set of new immutable segments (ES "refresh"); the
query layer sees them on the next segments-glob read; ``merge_segments``
plays the background merge.  Exactly-once-ish semantics come from the
build's own resumability: a micro-batch killed mid-append completes only
its missing segments byte-identically on retry, and the streaming
checkpoint prevents batch replays after commit.
"""

from .ingest import stream_index, stream_upsert

__all__ = ["stream_index", "stream_upsert"]
