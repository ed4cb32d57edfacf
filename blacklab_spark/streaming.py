"""Streaming ingest: Structured Streaming -> delta index segments.

The reference has NO streaming engine — incremental ingest is repeated batch
document addition through Lucene segments + merges
(engine/.../index/IndexerImpl.java:476-508; SURVEY.md §2.7). The idiomatic
Spark counterpart keeps those exact semantics: a `readStream` of pages drives
`foreachBatch`, and every micro-batch becomes one delta segment via the SAME
`add_segment` path batch ingest uses (ids continue after existing segments;
`compact` later merges). Checkpointing is Structured Streaming's own offset
log + the build's per-segment parquet checkpoints.

At scale: segment-per-microbatch matches Lucene's NRT model; a compaction
cadence (e.g. every N segments) bounds query-side segment fan-out exactly
like the reference's background merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .build import add_segment, compact, merge_segments


def stream_pages_from_parquet_dir(spark: SparkSession, path: str) -> DataFrame:
    """File-arrival stream of pages parquet (drop-a-file = ingest)."""
    from .sources import PAGES_SCHEMA

    return spark.readStream.schema(PAGES_SCHEMA).parquet(path)


def stream_build(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    compact_every: int | None = None,
    trigger_available_now: bool = True,
    compact_strategy: str = "merge",
):
    """Run the ingest stream. Each micro-batch -> one delta segment
    `stream-<batch_id>`; optionally compact every N batches.
    compact_strategy: 'merge' (posting-level merge_segments — no
    re-tokenize/re-encode, the steady-state choice) or 'rebuild'
    (compact()'s forward-index rebuild).

    Returns the StreamingQuery (call .awaitTermination(); with
    trigger_available_now=True the query drains pending input and stops —
    the incremental-batch mode the reference's IndexTool add corresponds to).
    """
    spark = pages_stream.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_segment(spark, batch_df, out_dir, f"stream-{batch_id}", n_shards=n_shards)
        if compact_every and (batch_id + 1) % compact_every == 0:
            if compact_strategy == "merge":
                import json as _json
                import os as _os

                with open(_os.path.join(out_dir, "segments.json")) as f:
                    n_segs = len(_json.load(f)["segments"])
                if n_segs >= 2:
                    merge_segments(spark, out_dir, segment=f"merged-{batch_id}")
            else:
                compact(spark, out_dir, n_shards=n_shards)

    w = pages_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
