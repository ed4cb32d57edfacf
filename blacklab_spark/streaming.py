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
    compact_strategy: str = "tiered",
):
    """Run the ingest stream. Each micro-batch -> one delta segment
    `stream-<batch_id>`; optionally compact every N batches.
    compact_strategy:
    - 'tiered' (default): Lucene-TieredMergePolicy-style leveled merge —
      segments bucket by log_merge_factor(n_docs); only a level holding
      >= merge_factor segments merges (into the next level). Total bytes
      moved over T batches is O(T log T), vs O(T^2 / compact_every) for
      always-merge-everything — the policy that survives an unbounded
      stream.
    - 'merge': posting-level merge of EVERYTHING into one segment.
    - 'rebuild': compact()'s forward-index rebuild.

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
            if compact_strategy == "tiered":
                tiered_compact(spark, out_dir, tag=str(batch_id))
            elif compact_strategy == "merge":
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


def tiered_compact(
    spark: SparkSession,
    out_dir: str,
    merge_factor: int = 4,
    tag: str = "",
) -> list[dict]:
    """Size-tiered merge pass (the scalable analog of Lucene's
    TieredMergePolicy, reference engine merges run under it): bucket the
    registry's segments by size level = floor(log_merge_factor(n_docs)),
    and merge every level that holds >= merge_factor segments into ONE
    next-level segment. Repeats until no level is full (a merge can fill
    the next level). Only same-order-of-magnitude segments ever merge, so
    a long-running stream moves O(T log T) total bytes instead of
    re-merging the full index on every cadence.

    Returns the list of merge metas performed (possibly empty)."""
    import json as _json
    import os as _os

    from .build import merge_segments as _merge

    merged: list[dict] = []
    round_i = 0
    while True:
        with open(_os.path.join(out_dir, "segments.json")) as f:
            segs = _json.load(f)["segments"]
        levels: dict[int, list[tuple[str, int]]] = {}
        for s in segs:
            with open(
                _os.path.join(out_dir, "segments", s, "meta.json")
            ) as mf:
                nd = int(_json.load(mf)["n_docs"])
            # integer level computation — float log lands one level off on
            # exact powers of merge_factor (e.g. log(16,4)=1.999..., ADVICE r4)
            lvl, v = 0, max(nd, 1)
            while v >= merge_factor:
                v //= merge_factor
                lvl += 1
            levels.setdefault(lvl, []).append((s, nd))
        full = [
            (lvl, members)
            for lvl, members in sorted(levels.items())
            if len(members) >= merge_factor
        ]
        if not full:
            return merged
        lvl, members = full[0]
        # merge the merge_factor SMALLEST members of the fullest low level
        members.sort(key=lambda x: x[1])
        names = [s for s, _ in members[:merge_factor]]
        seg_name = f"tier{lvl}-{tag}-{round_i}" if tag else f"tier{lvl}-{round_i}"
        merged.append(
            _merge(spark, out_dir, segment=seg_name, segments=names)
        )
        round_i += 1
