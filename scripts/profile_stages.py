"""Micro-profiles to isolate WHERE thread-scaling is lost inside the two
heavy build stages. Runs a matrix of sub-jobs at one parallelism level.

usage: python scripts/profile_stages.py <cpus> [n_docs]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from blacklab_spark.session import get_spark  # noqa: E402

CPUS = sys.argv[1] if len(sys.argv) > 1 else "32"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
WORK = "/dev/shm/blacklab_profile"
PAGES = f"{WORK}/pages_{N_DOCS}"


def main() -> None:
    spark = get_spark(
        f"local[{CPUS}]",
        app_name=f"prof_stages_{CPUS}",
        shuffle_partitions=128,
        extra_conf={
            "spark.local.dir": f"{WORK}/spark_local",
            "spark.driver.memory": "32g",
        },
    )
    from pyspark.sql import functions as F

    from blacklab_spark.build import _encode_shard_kernel, tokenized_docs, BLOCKS_SCHEMA

    pages = spark.read.parquet(PAGES)
    pages.limit(100).count()
    res = {}

    def t(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        res[name] = round(best, 2)

    # 0. plain parquet scan + cheap agg (read parallelism baseline)
    t("scan_pages", lambda: pages.agg(F.sum(F.length("text"))).collect())

    # 1. tokenize WITHOUT write (python kernel + arrow both ways, no sink)
    ids = pages.select("url").withColumn("doc_id", F.xxhash64("url")).withColumn(
        "shard", (F.abs(F.col("doc_id")) % 128).cast("int")
    )
    p0 = pages.join(ids.hint("broadcast"), "url")
    t("tokenize_agg", lambda: tokenized_docs(p0).agg(F.sum("doc_len")).collect())

    # 2. tokenize + parquet write (the real docs stage shape)
    def tok_write():
        shutil.rmtree(f"{WORK}/prof_docs", ignore_errors=True)
        tokenized_docs(p0).write.mode("overwrite").parquet(f"{WORK}/prof_docs")

    t("tokenize_write", tok_write)

    docs = spark.read.parquet(f"{WORK}/prof_docs")

    # 3. docs scan only
    t("scan_docs", lambda: docs.agg(F.sum("doc_len")).collect())

    # 4. shuffle only (repartition + count, no python kernel)
    t(
        "shuffle_only",
        lambda: docs.select("shard", "doc_id", "doc_len", "tokens")
        .repartitionByRange(128, "shard")
        .agg(F.sum("doc_len"))
        .collect(),
    )

    # 5. shuffle + encode kernel, no write
    def blocks_agg():
        rows = docs.select("shard", "doc_id", "doc_len", "tokens").repartitionByRange(128, "shard")
        rows.mapInArrow(_encode_shard_kernel(128), schema=BLOCKS_SCHEMA).agg(
            F.sum("doc_count")
        ).collect()

    t("blocks_agg", blocks_agg)

    # 6. full blocks stage (shuffle + kernel + write)
    def blocks_write():
        shutil.rmtree(f"{WORK}/prof_blocks", ignore_errors=True)
        rows = docs.select("shard", "doc_id", "doc_len", "tokens").repartitionByRange(128, "shard")
        rows.mapInArrow(_encode_shard_kernel(128), schema=BLOCKS_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{WORK}/prof_blocks")

    t("blocks_write", blocks_write)

    print(json.dumps({"cpus": CPUS, "n_docs": N_DOCS, **res}))
    spark.stop()


if __name__ == "__main__":
    main()
