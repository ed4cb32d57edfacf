"""Global ranking without single-partition windows.

The reference pages/sorts hits after materializing them in memory
(results/HitsAbstract.java:157,279-293); the naive Spark translation — a
row_number() over an unpartitioned Window — moves EVERY hit to one partition
(WindowExec warns, and at 100x scale it is a straight OOM). These helpers keep
ranking distributed:

- rank_head:  orderBy().limit(first+n) plans as TakeOrderedAndProject
  (per-partition top-k + one merge of <= first+n rows); ranks assigned in one
  Arrow kernel over the small head.
- ranked_all: the assign_dense_ids pattern (build.py:145-186) generalized to
  arbitrary multi-column sort keys — range repartition, per-partition sort,
  one n_partitions-row count collect, offsets added map-side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

# keys spec: list of column name (ascending) or (name, ascending) tuples
_KeySpec = "list[str | tuple[str, bool]]"


def _norm_keys(keys) -> list[tuple[str, bool]]:
    return [(k, True) if isinstance(k, str) else (k[0], bool(k[1])) for k in keys]


def rank_head(
    df: DataFrame, keys, first: int, n: int, rank_col: str | None = None
) -> DataFrame:
    """Rows globally ranked first+1 .. first+n by `keys`, WITHOUT a
    single-partition WindowExec: orderBy().limit(first+n) plans as
    TakeOrderedAndProject (per-partition top-k, one merge of <= first+n
    rows), then ranks are assigned in one Arrow kernel over that head.

    Keys must make row order deterministic (include a unique tiebreak).
    Use ranked_all() when first+n is too large to gather to one task."""
    ks = _norm_keys(keys)
    cols = [F.col(k).asc() if a else F.col(k).desc() for k, a in ks]
    head = df.orderBy(*cols).limit(first + n).withColumn("_g", F.lit(1))
    names, asc = [k for k, _ in ks], [a for _, a in ks]
    fields = list(df.schema.fields)
    if rank_col:
        fields.append(StructField(rank_col, IntegerType()))
    schema = StructType(fields)

    def kernel(pdf):
        pdf = pdf.drop(columns=["_g"]).sort_values(names, ascending=asc, kind="mergesort")
        pdf = pdf.iloc[first : first + n]
        if rank_col:
            pdf = pdf.assign(
                **{rank_col: np.arange(first + 1, first + 1 + len(pdf), dtype=np.int32)}
            )
        return pdf

    return head.groupBy("_g").applyInPandas(kernel, schema)


def ranked_all(df: DataFrame, keys, rank_col: str = "rank") -> DataFrame:
    """Global rank over ALL rows without a single-partition window: the
    assign_dense_ids pattern (build.py:145-186) — range-repartition by the
    sort keys, sort within partitions, collect the n_partitions-row count
    table, add per-partition offsets in an Arrow kernel. Scales to any row
    count (the only driver traffic is one count per partition)."""
    ks = _norm_keys(keys)
    cols = [F.col(k).asc() if a else F.col(k).desc() for k, a in ks]
    spark = df.sparkSession
    n_parts = max(4, spark.sparkContext.defaultParallelism)
    d = (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)
    schema = StructType(list(df.schema.fields) + [StructField(rank_col, LongType())])

    def add_rank(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = boff.value.get(int(pdf["_pid"].iloc[0]), 0)
            ranks = np.arange(seen + 1, seen + 1 + len(pdf), dtype=np.int64) + base
            seen += len(pdf)
            yield pdf.drop(columns=["_pid"]).assign(**{rank_col: ranks})

    return d.mapInPandas(add_rank, schema)
