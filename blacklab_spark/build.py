"""Index build pipeline: pages -> docs / terms / postings / manifest (+ meta).

Spark-first re-expression of the reference's index build (IndexTool ->
IndexerImpl -> BlackLab40PostingsWriter, see SURVEY.md §3.3): where the
reference inverts term vectors through a two-pass temp file per Lucene segment
(engine/.../codec/BlackLab40PostingsWriter.java:246-330), we do ONE declarative
shuffle — `repartition(shard)` + `sortWithinPartitions(shard, term_id, doc_id,
pos)` — and stream the sorted run through a bounded-memory Arrow kernel that
emits delta+varint posting blocks.

Sharding = skew handling: postings are partitioned by contiguous doc-id range
("shard", FIXTURES column name `salt`). A head term's mega posting list is
split across all shards by construction; every shard holds all terms for its
doc range, so phrase intersection, WAND scoring and KWIC are shard-local with
no query-time shuffle of the posting data.

Scale notes (100 TB / 10^12 docs):
- n_shards scales with corpus size (target: one shard's postings ~ a few
  hundred MB so the sorted run streams through an executor comfortably).
- the only big shuffles are (a) the doc-id range sort (once), (b) the
  token->term_id dictionary join (sort-merge at scale, broadcast when small),
  (c) the shard repartition. All are on evenly-distributed keys.
- the encode kernel is streaming: state is one pending posting group
  (< block_size docs) + one pending doc, never a whole shard.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .codec import varint_encode
from .tokenize import (
    TOKENIZER_VERSION,
    extract_text_series,
    fold_series,
    sentence_spans_series,
    tokenize_series,
)

DEFAULT_BLOCK = 128
FORMAT_VERSION = 2  # bumped on any docs/terms/postings schema change

DOCS_SCHEMA = (
    "doc_id long, shard int, url string, lang string, text string, "
    "doc_len int, tokens array<string>, tokens_fold array<string>, "
    "sents array<array<int>>"
)
POSTINGS_SCHEMA = (
    "shard int, term_id long, block_id int, doc_count int, first_doc long, "
    "last_doc long, max_tf int, min_dl int, doc_ids binary, tfs binary, "
    "dls binary, positions binary"
)


# ------------------------------------------------------------ tokenization --
def tokenized_docs(pages: DataFrame) -> DataFrame:
    """pages -> (url, lang, text, doc_len, tokens, tokens_fold), vectorized."""

    def kernel(batches):
        for pdf in batches:
            text = extract_text_series(pdf["html"], pdf["text"])
            toks = tokenize_series(text)
            folded = toks.map(lambda ts: fold_series(pd.Series(ts, dtype=object)).tolist() if len(ts) else [])
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "text": text,
                    "doc_len": toks.map(len).astype("int32"),
                    "tokens": toks,
                    "tokens_fold": folded,
                    "sents": sentence_spans_series(text),
                }
            )

    return pages.mapInPandas(
        kernel,
        schema="url string, lang string, text string, doc_len int, "
        "tokens array<string>, tokens_fold array<string>, sents array<array<int>>",
    )


# -------------------------------------------------------- dense id assigner --
def assign_dense_ids(df: DataFrame, order_col: str, id_col: str, n_parts: int) -> tuple[DataFrame, int, DataFrame]:
    """Deterministic dense ids = row_number over global sort of `order_col`,
    without a single-partition window: range-repartition + per-partition
    offsets (two light passes). Values of `order_col` must be unique.

    The repartitioned frame is persisted before counting: the id pass MUST see
    the exact partitions the count pass saw (repartitionByRange samples its
    boundaries from upstream row order, which is not deterministic across
    recomputations after a groupBy). Returns (df_with_ids, total, cached_df) —
    caller unpersists cached_df once downstream results are materialized.

    Scale: the per-partition count table collected to the driver is
    n_parts rows — trivially small at any corpus size.
    """
    d = df.repartitionByRange(n_parts, order_col).sortWithinPartitions(order_col)
    d = d.withColumn("_pid", F.spark_partition_id()).persist()
    counts = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields if f.name != "_pid"
    ) + f", {id_col} long"

    def add_ids(batches):
        seen = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = boff.value.get(pid, 0)
            ids = np.arange(seen, seen + len(pdf), dtype=np.int64) + base
            seen += len(pdf)
            yield pdf.drop(columns=["_pid"]).assign(**{id_col: ids})

    return d.mapInPandas(add_ids, schema=out_schema), acc, d


# ---------------------------------------------------------- posting encoder --
def _encode_blocks_kernel(block_size: int):
    """Streaming kernel over rows sorted by (shard, term_id, doc_id, pos).

    Emits one output row per posting block. Bounded state: the open posting
    group's partial block (+ the last, possibly incomplete, doc's rows).
    """

    def kernel(batches):
        # row-level leftovers (possibly mid-doc)
        rs = None  # dict of np arrays: shard, term_id, doc_id, doc_len, pos
        # doc-level open group state
        cur = None  # (shard, term_id)
        cur_block0 = 0
        cd, ct, cl, cp = (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )  # docs, tfs, dls, positions(concat)

        def flush_group(shard, term, docs, tfs, dls, poss, block0, out):
            """Encode `docs` into consecutive blocks starting at block0."""
            pos_ends = np.cumsum(tfs)
            pos_starts = pos_ends - tfs
            n = len(docs)
            for bi in range(0, n, block_size):
                bj = min(bi + block_size, n)
                d, t, dl = docs[bi:bj], tfs[bi:bj], dls[bi:bj]
                p = poss[pos_starts[bi] : pos_ends[bj - 1]] if len(poss) else poss
                # delta+varint encode (positions delta'd within each doc)
                from .codec import delta_encode, delta_encode_segmented

                out.append(
                    (
                        int(shard),
                        int(term),
                        block0 + bi // block_size,
                        int(bj - bi),
                        int(d[0]),
                        int(d[-1]),
                        int(t.max()),
                        int(dl.min()),
                        varint_encode(delta_encode(d)),
                        varint_encode(t),
                        varint_encode(dl),
                        varint_encode(delta_encode_segmented(p, t)) if len(p) else b"",
                    )
                )

        def process(released, final, out):
            nonlocal cur, cur_block0, cd, ct, cl, cp
            if released is not None and len(released["doc_id"]):
                sh, tm, dc, dl, ps = (
                    released["shard"],
                    released["term_id"],
                    released["doc_id"],
                    released["doc_len"],
                    released["pos"],
                )
                # doc-level aggregation over the sorted run
                change = np.empty(len(dc), dtype=bool)
                change[0] = True
                np.logical_or(
                    np.logical_or(sh[1:] != sh[:-1], tm[1:] != tm[:-1]),
                    dc[1:] != dc[:-1],
                    out=change[1:],
                )
                starts = np.flatnonzero(change)
                tfs = np.diff(np.append(starts, len(dc)))
                g_sh, g_tm, g_dc, g_dl = sh[starts], tm[starts], dc[starts], dl[starts]
                # group (shard, term) runs over the doc-level arrays
                gchange = np.empty(len(starts), dtype=bool)
                gchange[0] = True
                np.logical_or(
                    g_sh[1:] != g_sh[:-1], g_tm[1:] != g_tm[:-1], out=gchange[1:]
                )
                gstarts = np.flatnonzero(gchange)
                gends = np.append(gstarts[1:], len(starts))
                pos_ends = np.cumsum(tfs)
                for gi, (a, b) in enumerate(zip(gstarts, gends)):
                    key = (int(g_sh[a]), int(g_tm[a]))
                    docs, tfg, dlg = g_dc[a:b], tfs[a:b], g_dl[a:b]
                    p0 = pos_ends[a] - tfs[a]
                    p1 = pos_ends[b - 1]
                    poss = ps[p0:p1]
                    last_group = gi == len(gstarts) - 1
                    if cur is not None and key != cur:
                        # previous open group is finished: flush it fully
                        flush_group(cur[0], cur[1], cd, ct, cl, cp, cur_block0, out)
                        cur = None
                    if cur is None:
                        cur, cur_block0 = key, 0
                        cd = np.empty(0, np.int64)
                        ct = np.empty(0, np.int64)
                        cl = np.empty(0, np.int64)
                        cp = np.empty(0, np.int64)
                    cd = np.concatenate([cd, docs])
                    ct = np.concatenate([ct, tfg])
                    cl = np.concatenate([cl, dlg])
                    cp = np.concatenate([cp, poss])
                    if not last_group:
                        flush_group(cur[0], cur[1], cd, ct, cl, cp, cur_block0, out)
                        cur = None
                    else:
                        # stream out any full blocks of the still-open group
                        nfull = (len(cd) // block_size) * block_size
                        if nfull:
                            flush_group(
                                cur[0], cur[1], cd[:nfull], ct[:nfull], cl[:nfull],
                                cp[: int(np.cumsum(ct)[nfull - 1])] if len(cp) else cp,
                                cur_block0, out,
                            )
                            cur_block0 += nfull // block_size
                            poff = int(np.cumsum(ct)[nfull - 1]) if len(cp) else 0
                            cd, ct, cl, cp = cd[nfull:], ct[nfull:], cl[nfull:], cp[poff:]
            if final and cur is not None and len(cd):
                flush_group(cur[0], cur[1], cd, ct, cl, cp, cur_block0, out)
                cur = None

        cols = ["shard", "term_id", "doc_id", "doc_len", "pos"]
        out_cols = [
            "shard", "term_id", "block_id", "doc_count", "first_doc", "last_doc",
            "max_tf", "min_dl", "doc_ids", "tfs", "dls", "positions",
        ]
        for pdf in batches:
            arrs = {c: pdf[c].to_numpy(dtype=np.int64, copy=False) for c in cols}
            if rs is not None:
                arrs = {c: np.concatenate([rs[c], arrs[c]]) for c in cols}
            if len(arrs["doc_id"]) == 0:
                continue
            # hold back the trailing (shard, term, doc) triple — it may continue
            sh, tm, dc = arrs["shard"], arrs["term_id"], arrs["doc_id"]
            same_as_last = (sh == sh[-1]) & (tm == tm[-1]) & (dc == dc[-1])
            # rows of the last triple form a suffix (sorted input)
            cut = len(dc) - int(same_as_last[::-1].argmin()) if not same_as_last.all() else 0
            released = {c: a[:cut] for c, a in arrs.items()}
            rs = {c: a[cut:] for c, a in arrs.items()}
            out: list[tuple] = []
            process(released, False, out)
            yield pd.DataFrame(out, columns=out_cols)
        # final flush
        out = []
        process(rs, True, out)
        rs = None
        yield pd.DataFrame(out, columns=out_cols)

    return kernel


# ------------------------------------------------------------------- build --
def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    block_size: int = DEFAULT_BLOCK,
    segment: str = "seg0",
    base_doc_id: int = 0,
    id_parts: int | None = None,
) -> dict:
    """Build one index segment from a pages DataFrame. Returns meta dict."""
    t0 = time.time()
    spark_ = spark
    seg_dir = os.path.join(out_dir, "segments", segment)

    docs0 = tokenized_docs(pages)
    docs0, n_docs, cache0 = assign_dense_ids(docs0, "url", "doc_id", id_parts or max(4, n_shards))
    if base_doc_id:
        docs0 = docs0.withColumn("doc_id", F.col("doc_id") + F.lit(base_doc_id))
    per_shard = max(1, -(-n_docs // n_shards))  # ceil

    docs0 = docs0.withColumn(
        "shard",
        F.least(
            ((F.col("doc_id") - F.lit(base_doc_id)) / F.lit(per_shard)).cast("int"),
            F.lit(n_shards - 1),
        ),
    ).select("doc_id", "shard", "url", "lang", "text", "doc_len", "tokens", "tokens_fold", "sents")
    docs0.repartition("shard").write.mode("overwrite").parquet(f"{seg_dir}/docs")
    cache0.unpersist()
    # read-back = lineage cut: every later stage sees one stable snapshot
    docs = spark_.read.parquet(f"{seg_dir}/docs")
    sum_dl = int(docs.agg(F.sum("doc_len")).collect()[0][0] or 0)

    # ---- terms dictionary (sensitive surface + folded stats) ----
    ex = docs.select(
        "doc_id", "shard", "doc_len",
        F.posexplode("tokens").alias("pos", "term"),
    )
    ex_fold = docs.select("doc_id", F.posexplode("tokens_fold").alias("pos", "term_fold"))

    surf = ex.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )
    folds = (
        ex_fold.groupBy("term_fold")
        .agg(F.countDistinct("doc_id").alias("fold_df"), F.count("*").alias("fold_cf"))
    )
    # term_fold per surface term (deterministic re-fold of the distinct terms)
    def refold(batches):
        for pdf in batches:
            yield pdf.assign(term_fold=fold_series(pdf["term"]))

    surf = surf.mapInPandas(refold, schema="term string, df long, cf long, term_fold string")
    terms0 = surf.join(folds, "term_fold", "left")
    terms0, n_terms, cache1 = assign_dense_ids(terms0, "term", "term_id", max(4, n_shards))
    # sensitive sort position == term_id (ids are rank over sorted surface term)
    terms0 = terms0.withColumn("sort_pos_s", F.col("term_id"))
    terms0.write.mode("overwrite").parquet(f"{seg_dir}/terms_tmp")
    cache1.unpersist()
    terms_tmp = spark_.read.parquet(f"{seg_dir}/terms_tmp")
    # insensitive sort position: rank over (term_fold, term) — the collator
    # sort order for the folded layer (reference: integrated.md:148-153)
    fold_rank, _, cache2 = assign_dense_ids(
        terms_tmp.select("term_id", F.concat_ws(chr(0), "term_fold", "term").alias("_k")),
        "_k", "sort_pos_i", max(4, n_shards),
    )
    fold_rank = fold_rank.select("term_id", "sort_pos_i")
    (
        terms_tmp.join(fold_rank, "term_id")
        .coalesce(max(1, n_shards // 4))
        .write.mode("overwrite").parquet(f"{seg_dir}/terms")
    )
    cache2.unpersist()
    import shutil

    shutil.rmtree(f"{seg_dir}/terms_tmp", ignore_errors=True)
    terms = spark_.read.parquet(f"{seg_dir}/terms")

    # ---- postings: ONE shuffle (repartition by shard) + sorted streaming encode
    dict_df = terms.select("term", "term_id")
    if n_terms <= 2_000_000:
        dict_df = F.broadcast(dict_df)
    rows = (
        ex.join(dict_df, "term")
        .select("shard", "term_id", "doc_id", "doc_len", "pos")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "term_id", "doc_id", "pos")
    )
    postings = rows.mapInPandas(_encode_blocks_kernel(block_size), schema=POSTINGS_SCHEMA)
    postings.write.mode("overwrite").parquet(f"{seg_dir}/postings")

    # ---- manifest: per-shard lineage + metrics
    man = (
        spark.read.parquet(f"{seg_dir}/postings")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("doc_count").alias("n_postings"),
            F.countDistinct("term_id").alias("n_terms"),
        )
        .withColumn("segment_id", F.lit(segment))
        .withColumn("status", F.lit("committed"))
        .withColumn("wall_ms", F.lit(int((time.time() - t0) * 1000)))
    )
    man.coalesce(1).write.mode("overwrite").parquet(f"{seg_dir}/manifest")

    meta = {
        "format_version": FORMAT_VERSION,
        "segment": segment,
        "n_docs": int(n_docs),
        "sum_dl": sum_dl,
        "n_terms": int(n_terms),
        "n_shards": n_shards,
        "per_shard": int(per_shard),
        "base_doc_id": base_doc_id,
        "block_size": block_size,
        "tokenizer_version": TOKENIZER_VERSION,
        "k1": K1,
        "b": B,
        "build_wall_s": time.time() - t0,
    }
    os.makedirs(seg_dir, exist_ok=True)
    with open(f"{seg_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    # segment registry at the index root
    _register_segment(out_dir, segment)
    return meta


def _register_segment(out_dir: str, segment: str) -> None:
    reg_path = os.path.join(out_dir, "segments.json")
    reg = {"segments": []}
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            reg = json.load(f)
    if segment not in reg["segments"]:
        reg["segments"].append(segment)
    with open(reg_path, "w") as f:
        json.dump(reg, f, indent=2)


def add_segment(spark, pages: DataFrame, out_dir: str, segment: str, **kw) -> dict:
    """Incremental ingest: add a delta segment (mirrors Lucene's add-only
    segment model, reference engine/.../index/IndexerImpl.java:476-508).
    New docs get ids after all existing segments'."""
    base = 0
    reg_path = os.path.join(out_dir, "segments.json")
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            for seg in json.load(f)["segments"]:
                with open(os.path.join(out_dir, "segments", seg, "meta.json")) as mf:
                    base += json.load(mf)["n_docs"]
    return build_index(spark, pages, out_dir, segment=segment, base_doc_id=base, **kw)


def compact(spark: SparkSession, out_dir: str, n_shards: int = 8, block_size: int = DEFAULT_BLOCK) -> dict:
    """Merge all segments into one (reference:
    BlackLab40PostingsWriter.merge, codec/BlackLab40PostingsWriter.java:102-140).

    v1 strategy: rebuild from the segments' forward indexes (docs tables hold
    the token arrays), which guarantees the merged index is byte-identical to
    a one-shot build over the union. A block-level merge that avoids
    re-tokenization is a later-round optimization; re-encode cost here is the
    shard shuffle only (extraction/tokenization is NOT redone).
    """
    reg_path = os.path.join(out_dir, "segments.json")
    with open(reg_path) as f:
        segs = json.load(f)["segments"]
    docs = None
    for seg in segs:
        d = spark.read.parquet(f"{out_dir}/segments/{seg}/docs")
        docs = d if docs is None else docs.unionByName(d)
    # re-derive a pages-shaped frame (text already extracted; html unused)
    pages = docs.select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    meta = build_index(
        spark, pages, out_dir, n_shards=n_shards, block_size=block_size,
        segment="compacted",
    )
    with open(reg_path, "w") as f:
        json.dump({"segments": ["compacted"]}, f, indent=2)
    return meta
