"""Structured Streaming FROM the Iceberg table: a PySpark 4 Python
DataSource whose streaming offsets are the table's snapshot SEQUENCE
NUMBERS.

`spark.readStream.format("iceberg_pages").option("location", ...)` turns
every committed snapshot range into a micro-batch: latestOffset() is the
table's last-sequence-number, partitions(start, end) is the incremental
file set (the same manifest-range-pruned plan index_iceberg_delta uses),
and read(partition) streams one data file's rows as Arrow batches on the
executor. Offsets live in Structured Streaming's own checkpoint log, so a
restarted query resumes exactly after the last committed snapshot range —
exactly-once ingestion driven by table commits instead of file arrival
(compare stream_pages_from_parquet_dir, streaming.py).

The batch side (`spark.read.format("iceberg_pages")`) plans the current
snapshot the same way; `option("snapshot_id", ...)` time-travels.

This is the sandbox-native analog of the iceberg-spark-runtime streaming
source; on a cluster with the jar, `readStream.format("iceberg")` replaces
it with identical offset semantics (Iceberg's streaming source also keys
on snapshots).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .iceberg import IcebergTable, spark_ddl


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[tuple]):
        self.path = path
        self.columns = columns  # [(name, spark_ddl_type)]


def _arrow_type(ddl: str):
    import pyarrow as pa

    return {
        "string": pa.string(), "bigint": pa.int64(), "int": pa.int32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(), "boolean": pa.bool_(),
        "double": pa.float64(), "float": pa.float32(), "date": pa.date32(),
    }[ddl]


def _read_file(part: _FilePartition):
    """Executor-side: one data file -> Arrow batches in schema order.
    Old files may predate an add_column evolution: missing columns are
    filled with typed nulls (the spec's read-time projection)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(part.path)
    cols, names = [], []
    for name, ddl in part.columns:
        t = _arrow_type(ddl)
        if name in tbl.column_names:
            cols.append(tbl.column(name).cast(t))
        else:
            cols.append(pa.nulls(len(tbl), type=t))
        names.append(name)
    out = pa.table(dict(zip(names, cols)))
    for batch in out.to_batches(max_chunksize=8192):
        yield batch


class _IcebergBatchReader(DataSourceReader):
    def __init__(self, options: dict, columns: list[str]):
        self.location = options["location"]
        self.snapshot_id = options.get("snapshot_id")
        self.columns = columns

    def partitions(self):
        t = IcebergTable(self.location)
        sid = int(self.snapshot_id) if self.snapshot_id is not None else None
        return [
            _FilePartition(f["path"], self.columns) for f in t.data_files(sid)
        ] or [_FilePartition("", self.columns)]

    def read(self, partition):
        if not partition.path:  # empty table
            return iter(())
        return _read_file(partition)


class _IcebergStreamReader(DataSourceStreamReader):
    """Offsets = {"seq": last ingested sequence number}. Each micro-batch
    covers (start_seq, end_seq] — the append scan by data sequence number,
    so a batch is exactly the data files of the snapshots committed since
    the previous batch."""

    def __init__(self, options: dict, columns: list[str]):
        self.location = options["location"]
        self.columns = columns
        # start_seq: begin AFTER this sequence number (default 0 = ingest
        # the whole table on the first batch); "latest" = only commits
        # made after the query starts
        s = options.get("start_seq", "0")
        if s == "latest":
            self.start_seq = IcebergTable(self.location).metadata[
                "last-sequence-number"
            ]
        else:
            self.start_seq = int(s)

    def initialOffset(self) -> dict:
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        t = IcebergTable(self.location)
        return {"seq": t.metadata["last-sequence-number"]}

    def partitions(self, start: dict, end: dict):
        if end["seq"] <= start["seq"]:
            return [_FilePartition("", self.columns)]
        t = IcebergTable(self.location)
        files = [
            f
            for f in t.data_files(min_sequence_exclusive=start["seq"])
            if f["sequence_number"] <= end["seq"]
        ]
        return [
            _FilePartition(f["path"], self.columns) for f in files
        ] or [_FilePartition("", self.columns)]

    def read(self, partition):
        if not partition.path:
            return iter(())
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        # Structured Streaming's checkpoint log owns the offsets; nothing
        # table-side to persist.
        pass


class IcebergPagesDataSource(DataSource):
    """format("iceberg_pages"): batch + streaming reads of a local Iceberg
    table through the pure-python planner. Register once per session:
    `spark.dataSource.register(IcebergPagesDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_pages"

    def schema(self) -> str:
        t = IcebergTable(self.options["location"])
        return spark_ddl(t.metadata["schemas"][t.metadata["current-schema-id"]])

    def _columns(self) -> list[tuple]:
        from .iceberg import _ICE_TO_SPARK

        t = IcebergTable(self.options["location"])
        sch = t.metadata["schemas"][t.metadata["current-schema-id"]]
        return [(f["name"], _ICE_TO_SPARK[f["type"]]) for f in sch["fields"]]

    def reader(self, schema) -> DataSourceReader:
        return _IcebergBatchReader(self.options, self._columns())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IcebergStreamReader(self.options, self._columns())


def register(spark) -> None:
    spark.dataSource.register(IcebergPagesDataSource)


def stream_pages_from_iceberg(spark, location: str):
    """readStream of an Iceberg pages table: one micro-batch per committed
    snapshot range. Feed into streaming.stream_build's foreachBatch for
    segment-per-batch ingestion with SS checkpointing."""
    register(spark)
    return spark.readStream.format("iceberg_pages").option("location", location).load()


def read_pages_from_iceberg(spark, location: str, snapshot_id: int | None = None):
    """Batch read through the registered python datasource (prefer
    IcebergTable.read / pages_from_iceberg unless you specifically want
    the DataSource path, e.g. for SQL `CREATE TABLE ... USING`)."""
    register(spark)
    r = spark.read.format("iceberg_pages").option("location", location)
    if snapshot_id is not None:
        r = r.option("snapshot_id", str(snapshot_id))
    return r.load()
