"""Input sources -> the canonical pages schema.

The reference ingests many formats through its DocIndexer family (YAML-driven
XML/XPath, TSV/CSV, CoNLL-U, CHAT, plain text — indexers/config/DocIndexer*.java,
engine/src/main/resources/formats/; SURVEY.md §2.5). Here every source
normalizes to the ONE canonical input table the engine builds from
(input_hint shape):

    url string, warc_ts timestamp, html binary, text string, lang string

All readers are plain `spark.read` declarations — Catalyst owns pushdown and
split planning; no custom per-row parsing outside the existing tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _normalize(
    df: DataFrame,
    url: str = "url",
    text: str = "text",
    lang: str | None = None,
    html: str | None = None,
    ts: str | None = None,
) -> DataFrame:
    return df.select(
        F.col(url).cast("string").alias("url"),
        (F.col(ts).cast("timestamp") if ts else F.lit(None).cast("timestamp")).alias("warc_ts"),
        (F.col(html).cast("binary") if html else F.lit(None).cast("binary")).alias("html"),
        F.col(text).cast("string").alias("text"),
        (F.col(lang).cast("string") if lang else F.lit("und")).alias("lang"),
    )


def pages_from_parquet(spark: SparkSession, path: str, **cols) -> DataFrame:
    """Parquet already in (or mappable to) the pages shape."""
    return _normalize(spark.read.parquet(path), **cols)


def pages_from_jsonl(spark: SparkSession, path: str, **cols) -> DataFrame:
    """JSON-lines corpus (one doc per line)."""
    return _normalize(spark.read.json(path), **cols)


def pages_from_csv(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True, **cols
) -> DataFrame:
    """CSV/TSV corpus (reference: DocIndexerTabular)."""
    df = spark.read.option("header", str(header).lower()).option("sep", sep).csv(path)
    return _normalize(df, **cols)


def pages_from_text_dir(spark: SparkSession, path: str, lang: str = "und") -> DataFrame:
    """Directory of plain-text files, one doc per file (reference:
    DocIndexerPlainText): file path becomes the url."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .withColumn("url", F.input_file_name())
    )
    return df.select(
        F.col("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("value").alias("text"),
        F.lit(lang).alias("lang"),
    )


def pages_from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's synthetic `documents` table -> pages (doc:// urls keep
    doc_id recoverable as the dense rank)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.col("source").alias("lang"),
    )
