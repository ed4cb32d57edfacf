"""Per-round benchmark: index build throughput + headline query latencies.

Runs on `local[$SPARK_GRAFT_CPUS]` against `$SPARK_GRAFT_SF_DIR` (default
/root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

The build is timed fresh (no cache); queries run against the just-built
index through the same code paths the driver's correctness gate uses
(blacklab_spark/entry_queries.py). Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from blacklab_spark import entry_queries  # noqa: E402
from blacklab_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline query set: engine span/rank ops + the training-data pipeline ops
HEADLINE = [
    "ix_topk_single",
    "ix_topk_multi",
    "ix_topk_filtered",
    "ix_topk_phrase",
    "ix_term_hits",
    "ix_or_hits",
    "ix_regex_hits",
    "ix_phrase",
    "ix_near",
    "ix_and_docs",
    "ix_kwic",
    "ix_rel_full",
    "ix_align",
    "ix_multi_value",
    "ix_merged_term",
    "ft_termfreq_top20",
    "dd_minhash_sig",
    "dd_lsh_pairs",
    "dd_simhash",
    "sim_cosine_topk",
    "txt_quality",
    "txt_pii_scrub",
    "txt_filter_pipeline",
    "ev_sessionize",
]


def main() -> None:
    spark = get_spark(f"local[{CPUS}]", app_name="blacklab_bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # ---- timed fresh index build (docs/sec) ----
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    pages = docs.select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.col("source").alias("lang"),
    )
    # Untimed warm-up build (100 docs): triggers JVM JIT + codegen for every
    # build stage so the timed reps measure steady-state engine throughput —
    # the quantity that matters at cluster scale — instead of one-time JVM
    # warm-up (measured ~2x inflation cold->warm at sf0.1; NOTES_r3.md).
    n_shards = int(CPUS) if CPUS.isdigit() else 8
    out = f"/tmp/blacklab_bench_ix_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, pages.limit(100), out, n_shards=4)

    # Best-of-2 timed builds (both walls reported in build_walls_sec): this
    # sandbox host has multi-x background slow phases (NOTES_r1/r2); min of
    # two reps guards the headline number against landing in one.
    build_walls = []
    for _ in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build_index(spark, pages, out, n_shards=n_shards)
        build_walls.append(round(time.time() - t0, 3))
    build_s = min(build_walls)

    # Second timed build at the FULL driver config (word/lemma/pos
    # annotations + relations — what get_index and the correctness gate
    # use). Kept separate so build_index stays comparable with r1-r3;
    # the relation headline queries (ix_rel_full) need this index.
    full_pages = docs.select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        F.make_date(
            (F.lit(1970) + F.col("doc_id") % 60).cast("int"), F.lit(1), F.lit(1)
        ).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.col("source").alias("lang"),
    )
    out_full = f"{out}_full"
    full_walls = []
    for _ in range(2):
        shutil.rmtree(out_full, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, full_pages, out_full, n_shards=n_shards,
            annotations=("word", "lemma", "pos"), index_relations=True,
        )
        full_walls.append(round(time.time() - t0, 3))

    # point the shared query cache at the freshly built full-config index
    from blacklab_spark.query import Index

    entry_queries._IX_CACHE[os.path.abspath(SF_DIR)] = Index(spark, out_full)

    # Queries get the same protocol as the build (r3 verdict item 1): one
    # untimed warm-up execution (absorbs JIT/codegen + any fixture-index
    # build for the variant-index queries), then best-of-2 timed reps with
    # BOTH walls published per query in query_walls_sec.
    qs = entry_queries.build_queries()
    timings: dict[str, float] = {
        "build_index": round(build_s, 3),
        "build_index_full": min(full_walls),
    }
    query_walls: dict[str, list[float]] = {
        "build_index": build_walls,
        "build_index_full": full_walls,
    }
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # untimed warm-up
        walls = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).count()  # force full execution
            walls.append(round(time.time() - t0, 3))
        query_walls[name] = walls
        timings[name] = min(walls)

    total = round(sum(timings.values()), 3)
    lat = sorted(v for k, v in timings.items() if not k.startswith("build_index"))
    p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))] if lat else 0.0
    result = {
        "metric": "index build + headline query latency (blacklab_spark)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / build_s, 1),
        "build_walls_sec": build_walls,
        "query_walls_sec": query_walls,
        "query_p95_sec": p95,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out_full, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
