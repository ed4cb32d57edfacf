"""Streaming analytics operators (streaming_ops.py): watermarked windowed
aggregation and the applyInPandasWithState sessionizer, reconciled against
the batch operators on a drained stream."""

import pyspark.sql.functions as F


def _split_events(spark, tmp_path_factory, n_users=20):
    """Events for a user subset, split into two time-ordered parquet files
    (chronological split -> nothing is late beyond the watermark)."""
    src = "/root/testdata/sf0.01/events.parquet"
    e = spark.read.parquet(src).filter(F.col("user_id") < n_users)
    lohi = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = F.lit(str(lohi["lo"] + (lohi["hi"] - lohi["lo"]) / 2)).cast(
        e.schema["ts"].dataType.typeName()
    )
    d = tmp_path_factory.mktemp("ev_stream")
    e.filter(F.col("ts") <= mid).coalesce(1).write.parquet(str(d / "f1"))
    e.filter(F.col("ts") > mid).coalesce(1).write.parquet(str(d / "f2"))
    # stream dir with flat files
    sd = tmp_path_factory.mktemp("ev_stream_flat")
    import shutil
    from pathlib import Path

    for i, sub in enumerate(("f1", "f2")):
        for p in Path(d / sub).glob("*.parquet"):
            shutil.copy(p, sd / f"part{i}.parquet")
    return e, str(sd)


def test_stream_window_counts_matches_batch(spark, tmp_path_factory):
    from blacklab_spark.streaming_ops import (
        stream_events_from_parquet_dir,
        stream_window_counts,
    )

    e, sd = _split_events(spark, tmp_path_factory)
    batch = {
        (r["ws"], r["event_type"]): (r["n"], r["sv"])
        for r in (
            e.groupBy(
                F.window("ts", "5 minutes").getField("start").alias("ws"),
                "event_type",
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
            .collect()
        )
    }
    st = stream_window_counts(stream_events_from_parquet_dir(spark, sd))
    q = (
        st.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(tmp_path_factory.mktemp("ckpt_win")),
        )
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["event_type"]): (r["n"], r["sv"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # append mode emits only windows finalized by the watermark; every
    # emitted window must match batch exactly, and most windows must emit
    assert got, "no windows finalized"
    for k, v in got.items():
        assert batch[k] == v, k
    assert len(got) >= len(batch) // 2


def test_stream_sessionize_matches_batch(spark, tmp_path_factory):
    """Closed-session counts per user equal the batch gap-sessionizer after
    a far-future sentinel event forces every real session closed."""
    from blacklab_spark.streaming_ops import (
        stream_events_from_parquet_dir,
        stream_sessionize,
    )

    e, sd = _split_events(spark, tmp_path_factory)
    # batch oracle (same as entry_queries.ev_sessionize)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    gap = secs(F.col("ts")) - secs(F.lag("ts").over(w))
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in (
            e.withColumn(
                "new_sess", F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
            )
            .groupBy("user_id")
            .agg(F.sum("new_sess").cast("long").alias("n_sessions"))
            .collect()
        )
    }
    # sentinel file: one far-future event per user closes the last session
    # ONE fixed far-future ts for every user: all sentinel-opened sessions
    # start in 2030 (filterable) and none can be closed by another user's
    # watermark advance
    sent = e.select("user_id").distinct().select(
        F.lit(10**9).alias("event_id"),
        F.lit("2030-01-01 00:00:00").cast(
            e.schema["ts"].dataType.typeName()
        ).alias("ts"),
        "user_id",
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import shutil
    from pathlib import Path

    tmp = tmp_path_factory.mktemp("sentinel")
    sent.coalesce(1).write.parquet(str(tmp / "s"))
    for p in Path(tmp / "s").glob("*.parquet"):
        shutil.copy(p, Path(sd) / "part9.parquet")

    st = stream_sessionize(stream_events_from_parquet_dir(spark, sd))
    q = (
        st.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(tmp_path_factory.mktemp("ckpt_sess")),
        )
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # sessions OPENED by the sentinel may also flush via the processing-time
    # timeout before the drain ends — they are not part of the real data
    rows = [r for r in rows if r["session_start"].year < 2029]
    got = {}
    for r in rows:
        got[r["user_id"]] = got.get(r["user_id"], 0) + 1
    assert got == batch
    # spot-check session integrity: ends never precede starts, counts > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_sessionize_late_out_of_order_cross_batch(spark, tmp_path_factory):
    """Late-but-above-watermark events arriving in a LATER micro-batch
    (ADVICE r4 / verdict #8): one lands just before the open session's start
    (must extend session_start backwards), one lands far before it (must
    become its own closed session). maxFilesPerTrigger=1 forces one file per
    micro-batch so the late rows genuinely cross a batch boundary."""
    import os
    from datetime import datetime

    from blacklab_spark.streaming_ops import stream_sessionize

    T = lambda s: datetime.fromisoformat(s)  # noqa: E731
    mk = lambda i, ts: (i, T(ts), 1, "e", 1.0, "{}")  # noqa: E731
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    sd = tmp_path_factory.mktemp("late_stream")
    # batch 1: open session 10:00-10:01
    spark.createDataFrame(
        [mk(1, "2026-01-01 10:00:00"), mk(2, "2026-01-01 10:01:00")], schema
    ).coalesce(1).write.parquet(str(sd / "b1"))
    # batch 2: 09:59 (within gap -> extends start), 08:00 (beyond gap -> own
    # closed session), 2031 sentinel (closes the open session in-batch)
    spark.createDataFrame(
        [
            mk(3, "2026-01-01 09:59:00"),
            mk(4, "2026-01-01 08:00:00"),
            mk(5, "2031-01-01 00:00:00"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(sd / "b2"))
    import shutil
    from pathlib import Path

    flat = tmp_path_factory.mktemp("late_flat")
    for i, sub in enumerate(("b1", "b2")):
        for p in Path(sd / sub).glob("*.parquet"):
            dst = flat / f"part{i}.parquet"
            shutil.copy(p, dst)
            os.utime(dst, (1000000000 + i * 100, 1000000000 + i * 100))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    # 10h watermark keeps both late events above the watermark after batch 1
    st = stream_sessionize(src, watermark="10 hours")
    q = (
        st.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_late")))
        .start()
    )
    q.awaitTermination(180)
    rows = [
        r
        for r in spark.sql("SELECT * FROM late_sessions").collect()
        if r["session_start"].year < 2030
    ]
    got = {
        (
            r["session_start"].isoformat(sep=" "),
            r["session_end"].isoformat(sep=" "),
            r["n_events"],
        )
        for r in rows
    }
    assert got == {
        ("2026-01-01 08:00:00", "2026-01-01 08:00:00", 1),
        ("2026-01-01 09:59:00", "2026-01-01 10:01:00", 3),
    }, got
