"""Multi-value token positions (reference: payload-flagged values at one
position, PayloadUtils.java:14-26): annotated input 'a|b|c' posts every value
at the same position in the word layer while the forward index (and every
derived layer) keeps the FIRST value — the reference's forward-index
behavior."""

import pytest

from blacklab_spark import bcql


@pytest.fixture(scope="module")
def mv_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [
            ("doc://0", ["The|DOH|ZZZ", "quick", "fox|animal"]),
            ("doc://1", ["animal", "fox"]),
            # primary and secondary fold to the same term: one folded term
            # query matches this position through TWO values
            ("doc://2", ["cat|CAT", "runs"]),
        ],
        "url string, tokens array<string>",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("und").alias("lang"),
        "tokens",
    )
    out = str(tmp_path_factory.mktemp("ix_mv"))
    build_index(spark, pages, out, n_shards=1, block_size=4)
    return Index(spark, out)


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_secondary_values_match(mv_index):
    # every value matches at the shared position (insensitive fold applies)
    assert hs(mv_index.term_hits("doh")) == {(0, 0, 1)}
    assert hs(mv_index.term_hits("zzz")) == {(0, 0, 1)}
    assert hs(mv_index.term_hits("the")) == {(0, 0, 1)}
    assert hs(mv_index.term_hits("animal")) == {(0, 2, 3), (1, 0, 1)}


def test_phrase_through_secondary_value(mv_index):
    # sequence intersects postings by position, so secondary values chain
    assert hs(bcql.find(mv_index, '"zzz" "quick"')) == {(0, 0, 2)}
    assert hs(bcql.find(mv_index, '"quick" "animal"')) == {(0, 1, 3)}


def test_forward_index_keeps_first_value(mv_index):
    rows = {r["doc_id"]: list(r["tokens"]) for r in mv_index.docs.collect()}
    assert rows[0] == ["The", "quick", "fox"]
    # doc_len counts POSITIONS, not values
    lens = {r["doc_id"]: r["doc_len"] for r in
            mv_index.docs.select("doc_id", "doc_len").collect()}
    assert lens[0] == 3 and lens[1] == 2


def test_df_counts_positions_not_values(mv_index):
    # 'fox' appears at one position in each doc (primary in doc0, 'animal'
    # secondary shares the position) -> df 2
    assert mv_index.term_df("fox") == 2
    # 'animal' in doc0 (secondary) + doc1 (primary) -> df 2
    assert mv_index.term_df("animal") == 2


def rows(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_mv_flag_in_meta(mv_index):
    # the build detected secondary values and recorded the meta flag
    assert mv_index.has_mv is True
    assert all(s.meta["multi_value"] for s in mv_index.segments)


def test_no_duplicate_spans_on_mv_index(mv_index):
    """A position can satisfy one query through two of its values; the hit
    producers must still emit each (doc, start, end) once, or the
    guarantees-driven no-dedupe physical paths downstream (and_spans
    semi-join, and_not dedupe-skip) would propagate duplicates."""
    # folded term query: 'cat' and 'CAT' are distinct surface terms (two
    # term_ids) posting at the SAME position
    assert rows(mv_index.term_hits("cat")) == [(2, 0, 1)]
    # OR of distinct terms that share a position via primary + secondary
    assert rows(mv_index.or_hits(["the", "doh"])) == [(0, 0, 1)]
    assert rows(bcql.find(mv_index, '"the"|"doh"')) == [(0, 0, 1)]
    # regex matching several values at one position
    assert rows(mv_index.regex_hits(".*h.*")) == [(0, 0, 1)]
    # phrase whose first slot matches through two fold variants
    assert rows(mv_index.phrase_hits(["cat", "runs"])) == [(2, 0, 2)]
    # near: same two-variant slot through the gap kernel
    assert rows(mv_index.near_hits("cat", "runs", 0, 2)) == [(2, 0, 2)]


def test_mv_on_doc_without_primary_tokens(spark, tmp_path_factory):
    """A doc with ZERO primary tokens but a non-empty mv column is
    malformed input (every 'a|b' position has a primary): its extras are
    dropped rather than gathering the NEXT doc's input-layer values — or,
    for the last doc in the stream, reading one past the end and crashing
    the kernel's take()."""
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [
            ("doc://0", ["real", "words"], ["lem0", "lem1"], []),
            # zero primary tokens + a ghost secondary at position 0;
            # LAST doc in url order = the out-of-bounds case
            ("doc://1", [], [], [(0, "ghost")]),
        ],
        "url string, tokens array<string>, tokens_lemma array<string>, "
        "mv array<struct<p:int,v:string>>",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("und").alias("lang"),
        "tokens", "tokens_lemma", "mv",
    )
    out = str(tmp_path_factory.mktemp("ix_mv_ghost"))
    build_index(
        spark, pages, out, n_shards=1, block_size=4,
        annotations=("word", "lemma"),
    )
    ix = Index(spark, out)
    assert hs(ix.term_hits("ghost")) == set()
    assert hs(ix.term_hits("real")) == {(0, 0, 1)}
    # the real doc's lemma layer is untouched by the dropped extras
    assert hs(ix.term_hits("lem1", annot="lemma")) == {(0, 1, 2)}


def test_single_value_index_not_flagged(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [("doc://0", "plain text here")], "url string, text string"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
    )
    out = str(tmp_path_factory.mktemp("ix_sv"))
    build_index(spark, pages, out, n_shards=1)
    ix = Index(spark, out)
    assert ix.has_mv is False
    assert ix.segments[0].meta["multi_value"] is False


def test_compact_preserves_multivalues(spark, mv_index, tmp_path_factory):
    import shutil

    from blacklab_spark.build import compact
    from blacklab_spark.query import Index

    src = mv_index.dir
    out = str(tmp_path_factory.mktemp("ix_mv_compact"))
    shutil.copytree(src, out, dirs_exist_ok=True)
    compact(spark, out, n_shards=1, block_size=4)
    ix2 = Index(spark, out)
    assert hs(ix2.term_hits("zzz")) == {(0, 0, 1)}
    assert hs(ix2.term_hits("animal")) == {(0, 2, 3), (1, 0, 1)}


def test_stale_meta_without_mv_flag_falls_back_conservative(
    spark, tmp_path_factory
):
    """A pre-v11 segment meta lacking the `multi_value` key must load with
    has_mv=True (always dedupe — an extra shuffle, never silent duplicate
    hits; ADVICE r4), while a v11 meta trusts its explicit flag."""
    import json
    import os

    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [("doc://0", "plain text here")], "url string, text string"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
    )
    out = str(tmp_path_factory.mktemp("ix_stale_meta"))
    build_index(spark, pages, out, n_shards=1)
    mpath = os.path.join(out, "segments", "seg0", "meta.json")
    with open(mpath) as f:
        meta = json.load(f)
    assert meta["format_version"] >= 12 and meta["multi_value"] is False
    assert Index(spark, out).has_mv is False  # explicit flag trusted
    # a meta missing the key (hand-edited) falls back conservatively
    del meta["multi_value"]
    with open(mpath, "w") as f:
        json.dump(meta, f)
    assert Index(spark, out).has_mv is True  # conservative fallback
    # a pre-12 segment has UNTAGGED posting blobs — tag dispatch would
    # decode garbage, so load must refuse loudly, not fall back
    meta["format_version"] = 10
    with open(mpath, "w") as f:
        json.dump(meta, f)
    import pytest as _pt

    with _pt.raises(ValueError, match="format_version"):
        Index(spark, out)
