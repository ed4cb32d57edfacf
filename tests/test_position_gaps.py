"""Position-increment ingestion parity (reference AnnotationWriter.addValue
(value, increment), AnnotationWriter.java:238-267): an annotated-input token
of "" is the position-gap sentinel — it advances the position counter (the
increment) without posting a value. Following tokens keep shifted positions,
adjacency across the hole fails, and `[]` (doc-length n-grams) still covers
hole positions — the reference's semantics for increment > 1."""

import pytest

from blacklab_spark import bcql


@pytest.fixture(scope="module")
def gap_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [
            # doc0: gap between "quick" and "fox" (positions 0,1,_,3)
            ("doc://0", ["the", "quick", "", "fox"]),
            # doc1: no gaps — the adjacency control
            ("doc://1", ["the", "quick", "fox"]),
            # doc2: leading gap + two consecutive gaps
            ("doc://2", ["", "start", "", "", "end"]),
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
    out = str(tmp_path_factory.mktemp("ix_gaps"))
    build_index(spark, pages, out, n_shards=1, block_size=4)
    return Index(spark, out)


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_gap_shifts_following_positions(gap_index):
    # "fox" sits at position 3 in doc0 (after the hole), 2 in doc1
    assert hs(gap_index.term_hits("fox")) == {(0, 3, 4), (1, 2, 3)}
    assert hs(gap_index.term_hits("start")) == {(2, 1, 2)}
    assert hs(gap_index.term_hits("end")) == {(2, 4, 5)}


def test_doc_len_includes_gaps(gap_index):
    lens = {r["doc_id"]: r["doc_len"] for r in gap_index.doc_lens().collect()}
    assert lens == {0: 4, 1: 3, 2: 5}


def test_gap_breaks_adjacency(gap_index):
    # "quick fox" adjacent only in doc1; the doc0 hole breaks it
    assert hs(gap_index.phrase_hits(["quick", "fox"])) == {(1, 1, 3)}
    assert hs(bcql.find(gap_index, '"quick" "fox"')) == {(1, 1, 3)}


def test_any_token_covers_hole(gap_index):
    # `[]` is doc-length generated, so the hole position matches it —
    # "quick" [] "fox" matches EXACTLY the gapped doc
    assert hs(bcql.find(gap_index, '"quick" [] "fox"')) == {(0, 1, 4)}
    # and {0,1} covers both docs
    assert hs(bcql.find(gap_index, '"quick" []{0,1} "fox"')) == {
        (0, 1, 4),
        (1, 1, 3),
    }


def test_no_empty_term_in_dictionary(gap_index):
    terms = {r["term"] for r in gap_index.term_freqs().collect()}
    assert "" not in terms
    # count_hits over a gapped doc counts real tokens only
    assert gap_index.count_hits("the") == 2


def test_forward_index_keeps_hole(gap_index):
    # the stored token array preserves "" at hole positions (KWIC renders
    # an empty slot; constraints dereference "" there)
    rows = {
        r["doc_id"]: r["tokens"]
        for r in gap_index.docs.select("doc_id", "tokens").collect()
    }
    assert rows[0] == ["the", "quick", "", "fox"]
    assert rows[2] == ["", "start", "", "", "end"]
