import json

from pyspark.sql import functions as F

from blacklab_spark.fixtures import pages_df
from blacklab_spark.iceberg import IcebergTable
from blacklab_spark.iceberg_stream import (
    read_pages_from_iceberg,
    stream_pages_from_iceberg,
)


def _drain(spark, loc, checkpoint, out_rows):
    """Run the stream with availableNow into a collecting foreachBatch."""
    def handle(batch_df, batch_id):
        out_rows.append((batch_id, [r.url for r in batch_df.collect()]))

    q = (
        stream_pages_from_iceberg(spark, loc)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_datasource_batch_and_stream(spark, tmp_path):
    loc = str(tmp_path / "pages")
    t = IcebergTable.create(
        loc, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    t.append(spark, pages_df(spark, "tiny"))

    # batch read through the python datasource
    df = read_pages_from_iceberg(spark, loc)
    assert df.count() == 6
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert df.filter(F.col("text").contains("quick")).count() >= 1

    ckpt = str(tmp_path / "ckpt")
    got = []
    _drain(spark, loc, ckpt, got)
    urls1 = sorted(u for _, us in got for u in us)
    assert urls1 == sorted(r.url for r in pages_df(spark, "tiny").collect())

    # no new commits: a re-run ingests NOTHING (offsets checkpointed)
    got2 = []
    _drain(spark, loc, ckpt, got2)
    assert [u for _, us in got2 for u in us] == []

    # two more commits while the stream is DOWN -> exactly the new rows
    extra = spark.createDataFrame(
        [("http://s.test/a", None, None, "alpha", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    t.append(spark, extra)
    extra2 = spark.createDataFrame(
        [("http://s.test/b", None, None, "beta", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    t.append(spark, extra2)
    got3 = []
    _drain(spark, loc, ckpt, got3)
    assert sorted(u for _, us in got3 for u in us) == [
        "http://s.test/a", "http://s.test/b",
    ]


def test_stream_build_from_iceberg_source(spark, tmp_path):
    """Full streaming ingestion: table commits -> micro-batches ->
    delta segments via the SAME stream_build path file-arrival uses;
    queries see rows from both commits."""
    from blacklab_spark.query import Index
    from blacklab_spark.streaming import stream_build

    loc = str(tmp_path / "pages")
    t = IcebergTable.create(
        loc, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    t.append(spark, pages_df(spark, "tiny"))
    t.append(spark, spark.createDataFrame(
        [("http://sb.test/x", None, None, "zebra streamdoc", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ))

    out = str(tmp_path / "ix")
    q = stream_build(
        stream_pages_from_iceberg(spark, loc),
        out,
        str(tmp_path / "ckpt"),
        n_shards=2,
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    ix = Index(spark, out)
    assert ix.docs.count() == 7
    assert ix.term_hits("streamdoc").count() == 1
    segs = json.load(open(f"{out}/segments.json"))["segments"]
    assert len(segs) >= 1


def test_stream_start_seq_latest(spark, tmp_path):
    """start_seq='latest': pre-existing commits are skipped; only commits
    made after the query's first start are ingested."""
    from blacklab_spark.iceberg_stream import register

    loc = str(tmp_path / "pages")
    t = IcebergTable.create(
        loc, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    t.append(spark, pages_df(spark, "tiny"))  # must be skipped
    register(spark)
    got = []

    def handle(batch_df, batch_id):
        got.extend(r.url for r in batch_df.collect())

    def drain(ck):
        q = (
            spark.readStream.format("iceberg_pages")
            .option("location", loc).option("start_seq", "latest")
            .load()
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ck = str(tmp_path / "ck")
    drain(ck)
    assert got == []
    t.append(spark, spark.createDataFrame(
        [("http://late/1", None, None, "late", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ))
    drain(ck)
    assert got == ["http://late/1"]
