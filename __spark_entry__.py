"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (inverted-index build over the
sf0.001 documents corpus -> multi-term BM25 top-k). `queries()` /
`oracle_sql()` expose every implemented operator with a DuckDB-checkable
oracle (see blacklab_spark/entry_queries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from blacklab_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over /root/testdata/sf0.001
    documents, run a multi-term BM25 top-k through block-max scoring."""
    return entry_queries._ix_topk(
        spark, "/root/testdata/sf0.001", ["table", "vector", "merge"], 10
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.build_queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.build_oracles()
