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
