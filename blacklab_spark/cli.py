"""CLI entrypoints: build / add / compact / query / bench.

spark-submit usage (north rule: launched via spark-submit --py-files):

    zip -r blacklab_spark.zip blacklab_spark
    spark-submit --py-files blacklab_spark.zip -m blacklab_spark.cli ...
    # or locally:
    python -m blacklab_spark build  --pages /path/pages.parquet --out /path/ix
    python -m blacklab_spark add    --pages delta.parquet --out /path/ix --segment seg1
    python -m blacklab_spark compact --out /path/ix
    python -m blacklab_spark query  --out /path/ix --topk "term1 term2" -k 10
    python -m blacklab_spark query  --out /path/ix --bcql '"fast" []{1,2} "scan"'
    python -m blacklab_spark bench  --out /tmp/ix --pages /path/pages.parquet

Mirrors the reference's IndexTool / BatchQuery tools
(tools/.../tools/IndexTool.java:50, tools/.../performance/BatchQuery.java:10-19).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="blacklab_spark")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_build = sub.add_parser("build", help="build an index from a pages parquet")
    p_build.add_argument("--pages", required=True)
    p_build.add_argument("--out", required=True)
    p_build.add_argument("--shards", type=int, default=32)
    p_build.add_argument("--block-size", type=int, default=128)
    p_build.add_argument("--resume", action="store_true")

    p_add = sub.add_parser("add", help="add a delta segment")
    p_add.add_argument("--pages", required=True)
    p_add.add_argument("--out", required=True)
    p_add.add_argument("--segment", required=True)
    p_add.add_argument("--shards", type=int, default=32)

    p_compact = sub.add_parser("compact", help="merge all segments into one")
    p_compact.add_argument("--out", required=True)
    p_compact.add_argument("--shards", type=int, default=32)
    p_compact.add_argument(
        "--strategy", choices=("merge", "rebuild"), default="merge",
        help="merge = posting-level segment merge (no re-tokenize/encode); "
        "rebuild = forward-index rebuild (uniform re-shard/re-block)",
    )

    p_query = sub.add_parser("query", help="run a query against a built index")
    p_query.add_argument("--out", required=True)
    p_query.add_argument("--topk", help="space-separated terms for BM25 top-k")
    p_query.add_argument("--bcql", help="BCQL query string")
    p_query.add_argument("--contextql", help="ContextQL (SRU CQL) query string")
    p_query.add_argument("--phrase", help="space-separated phrase terms")
    p_query.add_argument("-k", type=int, default=10)
    p_query.add_argument("--limit", type=int, default=20)
    p_query.add_argument(
        "--output", help="write results to this path via df.write (distributed "
        "sink, no driver collect) instead of printing JSON lines"
    )
    p_query.add_argument(
        "--output-format", choices=("json", "csv", "parquet", "xml"),
        default="json",
        help="sink format for --output (reference: DataStreamJson/Csv/Xml "
        "response writers)",
    )

    p_ice = sub.add_parser(
        "iceberg-index",
        help="build the index from an Iceberg table at a pinned snapshot "
        "(resumable: same snapshot re-reads the same file set)",
    )
    p_ice.add_argument("--table", required=True, help="iceberg table location")
    p_ice.add_argument("--out", required=True)
    p_ice.add_argument("--snapshot-id", type=int, default=None)
    p_ice.add_argument("--shards", type=int, default=32)
    p_ice.add_argument("--resume", action="store_true")

    p_follow = sub.add_parser(
        "iceberg-follow",
        help="drain new table commits into delta segments (+ tiered "
        "compaction); --watch keeps polling",
    )
    p_follow.add_argument("--table", required=True)
    p_follow.add_argument("--out", required=True)
    p_follow.add_argument("--shards", type=int, default=32)
    p_follow.add_argument("--poll-s", type=float, default=5.0)
    p_follow.add_argument("--watch", action="store_true",
                          help="keep polling instead of drain-and-exit")

    p_ingw = sub.add_parser(
        "iceberg-ingest-warc",
        help="parse WARC/WET shards and commit one append snapshot into "
        "the Iceberg corpus table (created partitioned on first use)",
    )
    p_ingw.add_argument("--warc", required=True, help="shard glob, e.g. 'dir/*.warc.gz'")
    p_ingw.add_argument("--table", required=True)

    p_bench = sub.add_parser("bench", help="timed build + query set")
    p_bench.add_argument("--pages", required=True)
    p_bench.add_argument("--out", required=True)
    p_bench.add_argument("--shards", type=int, default=32)

    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark(args.master, app_name=f"blacklab_{args.cmd}")
    try:
        return _run(spark, args)
    finally:
        spark.stop()


def _run(spark, args) -> int:
    from .build import add_segment, build_index, compact

    if args.cmd == "build":
        pages = spark.read.parquet(args.pages)
        meta = build_index(
            spark, pages, args.out, n_shards=args.shards,
            block_size=args.block_size, resume=args.resume,
        )
        print(json.dumps(meta))
        return 0

    if args.cmd == "add":
        pages = spark.read.parquet(args.pages)
        meta = add_segment(spark, pages, args.out, args.segment, n_shards=args.shards)
        print(json.dumps(meta))
        return 0

    if args.cmd == "compact":
        if args.strategy == "merge":
            from .build import merge_segments

            try:
                meta = merge_segments(spark, args.out)
            except ValueError as e:
                print(json.dumps({"skipped": str(e)}))
                return 0
        else:
            meta = compact(spark, args.out, n_shards=args.shards)
        print(json.dumps(meta))
        return 0

    if args.cmd == "iceberg-ingest-warc":
        from .iceberg import ingest_warc_to_iceberg

        snap = ingest_warc_to_iceberg(spark, args.warc, args.table)
        print(json.dumps({"snapshot_id": snap}))
        return 0

    if args.cmd == "iceberg-index":
        from .iceberg import index_iceberg

        meta = index_iceberg(
            spark, args.table, args.out, snapshot_id=args.snapshot_id,
            n_shards=args.shards, resume=args.resume,
        )
        print(json.dumps(meta))
        return 0

    if args.cmd == "iceberg-follow":
        from .iceberg import follow_iceberg

        metas = follow_iceberg(
            spark, args.table, args.out, n_shards=args.shards,
            poll_s=args.poll_s, stop_when_current=not args.watch,
        )
        print(json.dumps({"delta_segments": [m["segment"] for m in metas]}))
        return 0

    from .query import Index

    if args.cmd == "query":
        ix = Index(spark, args.out)
        capped = True  # hit queries print --limit rows; top-k prints all k
        if args.topk:
            df = ix.topk(args.topk.split(), k=args.k)
            capped = False
        elif args.bcql:
            from . import bcql

            df = bcql.find(ix, args.bcql)
        elif args.contextql:
            from . import contextql

            df = contextql.find(ix, args.contextql)
        elif args.phrase:
            df = ix.phrase_hits(args.phrase.split())
        else:
            print("need --topk, --bcql, --contextql or --phrase", file=sys.stderr)
            return 2
        if args.output:
            w = df
            if args.output_format == "csv":
                # CSV cannot hold array/struct columns (capture lists etc.)
                # — serialize them to JSON strings, like the reference's
                # flat DataStreamCsv rows
                from pyspark.sql import functions as F
                from pyspark.sql.types import ArrayType, MapType, StructType

                for f in df.schema.fields:
                    if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                        w = w.withColumn(f.name, F.to_json(f.name))
                w.write.mode("overwrite").option("header", "true").csv(args.output)
            elif args.output_format == "parquet":
                w.write.mode("overwrite").parquet(args.output)
            elif args.output_format == "xml":
                # Spark 4 native XML sink (reference: DataStreamXml response
                # format, <hits><hit>...</hit></hits>)
                (
                    w.write.mode("overwrite").format("xml")
                    .option("rootTag", "hits").option("rowTag", "hit")
                    .save(args.output)
                )
            else:
                w.write.mode("overwrite").json(args.output)
            print(json.dumps({"written": args.output, "format": args.output_format}))
            return 0
        if capped:
            df = df.limit(args.limit)
        for row in df.collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    if args.cmd == "bench":
        pages = spark.read.parquet(args.pages)
        n = pages.count()
        t0 = time.time()
        build_index(spark, pages, args.out, n_shards=args.shards)
        build_s = time.time() - t0
        ix = Index(spark, args.out)
        t0 = time.time()
        ix.topk(["the"], k=10).collect()
        q_s = time.time() - t0
        print(json.dumps({
            "n_docs": n, "build_s": round(build_s, 2),
            "docs_per_sec": round(n / build_s, 1), "topk_s": round(q_s, 3),
        }))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
