"""SpanFuzzyQuery parity (reference SpanFuzzyQuery.java:29-34 delegating to
Lucene FuzzyQuery): prefix_length (exact prefix, distance on the remainder)
and transpositions (OSA metric — adjacent swap = ONE edit, Lucene's
transpositions=true automaton), verified against hand-computed expansions
on a small dict."""

import pytest

from blacklab_spark.query import osa_distance


@pytest.fixture(scope="module")
def fuzzy_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    text = "table tbale tale tble atable tuble fable stable tablle bable zzz"
    pages = spark.createDataFrame(
        [("doc://0", text)], "url string, text string"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
    )
    out = str(tmp_path_factory.mktemp("ix_fuzzy"))
    build_index(spark, pages, out, n_shards=1, block_size=4)
    return Index(spark, out)


# token positions:
# 0 table  1 tbale  2 tale  3 tble  4 atable  5 tuble
# 6 fable  7 stable  8 tablle  9 bable  10 zzz


def starts(df):
    return {r["start"] for r in df.collect()}


def test_osa_metric():
    assert osa_distance("ab", "ba", 2) == 1          # one transposition
    assert osa_distance("ca", "abc", 3) == 3         # OSA, not true DL (2)
    assert osa_distance("table", "table", 1) == 0
    assert osa_distance("tbale", "table", 1) == 1
    assert osa_distance("x", "xyzzy", 1) == 2        # cap+1 early exit


def test_default_transpositions_on(fuzzy_index):
    # Lucene default: adjacent swap counts one edit -> tbale matches
    got = starts(fuzzy_index.fuzzy_hits("table", 1))
    assert got == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}


def test_transpositions_off(fuzzy_index):
    # plain levenshtein: tbale is 2 edits away
    got = starts(fuzzy_index.fuzzy_hits("table", 1, transpositions=False))
    assert got == {0, 2, 3, 4, 5, 6, 7, 8, 9}


def test_prefix_length_one(fuzzy_index):
    # first char must be 't' exactly; distance on the remainder
    got = starts(fuzzy_index.fuzzy_hits("table", 1, prefix_length=1))
    assert got == {0, 1, 2, 3, 5, 8}
    got = starts(
        fuzzy_index.fuzzy_hits("table", 1, prefix_length=1, transpositions=False)
    )
    assert got == {0, 2, 3, 5, 8}


def test_prefix_length_two(fuzzy_index):
    # exact 'ta' prefix: table, tale, tablle qualify on the remainder
    got = starts(fuzzy_index.fuzzy_hits("table", 1, prefix_length=2))
    assert got == {0, 2, 8}


def test_zero_edits_is_exact(fuzzy_index):
    assert starts(fuzzy_index.fuzzy_hits("table", 0)) == {0}
