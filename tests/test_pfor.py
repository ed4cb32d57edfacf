"""codec="pfor" build path: a PForDelta-encoded index must be
query-identical to the default varint index over the same corpus (the
blobs differ, every decoded posting is the same), merges must mix codecs
freely (blobs self-describe via the tag byte), and the pfor blocks should
actually be smaller on posting-shaped data."""

import pytest

from blacklab_spark import bcql

QUERIES = [
    lambda ix: ix.term_hits("the"),
    lambda ix: ix.phrase_hits(["of", "the"]),
    lambda ix: ix.regex_hits("th.*"),
    lambda ix: ix.topk(["the", "data"], k=10),
    lambda ix: bcql.find(ix, '[pos="nn"]'),
    lambda ix: bcql.find(ix, '"the" []{0,2} [pos="nn"]'),
]


def hs(df):
    cols = [c for c in ("doc_id", "start", "end", "score") if c in df.columns]
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


@pytest.fixture(scope="module")
def codec_pair(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    pages = pages_df(spark, "small")
    kw = dict(n_shards=2, block_size=8, annotations=("word", "lemma", "pos"))
    d_v = str(tmp_path_factory.mktemp("ix_codec_varint"))
    d_p = str(tmp_path_factory.mktemp("ix_codec_pfor"))
    build_index(spark, pages, d_v, codec="varint", **kw)
    build_index(spark, pages, d_p, codec="pfor", **kw)
    return Index(spark, d_v), Index(spark, d_p), d_v, d_p


def test_pfor_identical_queries(codec_pair):
    ix_v, ix_p, _, _ = codec_pair
    for i, q in enumerate(QUERIES):
        r = hs(q(ix_v))
        assert r == hs(q(ix_p)) and r, f"query {i}"


def test_pfor_identical_dictionary_and_stats(codec_pair):
    ix_v, ix_p, _, _ = codec_pair
    cols = ["annot", "term", "term_id", "df", "cf"]

    def terms(ix):
        return sorted(
            tuple(r) for s in ix.segments for r in s.terms.select(cols).collect()
        )

    tv, tp = terms(ix_v), terms(ix_p)
    assert tv == tp and tv


def test_pfor_blocks_smaller(codec_pair, spark):
    from pyspark.sql import functions as F

    _, _, d_v, d_p = codec_pair

    def blob_bytes(d):
        df = spark.read.parquet(f"{d}/segments/seg0/postings")
        return df.select(
            F.sum(
                F.octet_length("doc_ids") + F.octet_length("tfs")
                + F.octet_length("dls") + F.octet_length("positions")
            ).alias("b")
        ).collect()[0]["b"]

    v, p = blob_bytes(d_v), blob_bytes(d_p)
    assert p < v, f"pfor {p} B should beat varint {v} B"


def test_mixed_codec_merge(spark, tmp_path_factory):
    """A varint delta segment merged into a pfor base must produce exact
    results — merge moves tagged blobs verbatim, decode dispatches per blob."""
    from blacklab_spark.build import add_segment, build_index, merge_segments
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    from pyspark.sql import functions as F

    pages = pages_df(spark, "small")
    a = pages.filter(F.abs(F.hash("url")) % 2 == 0)
    b = pages.filter(F.abs(F.hash("url")) % 2 == 1)
    dst = str(tmp_path_factory.mktemp("ix_mixed"))
    ref = str(tmp_path_factory.mktemp("ix_mixed_ref"))
    kw = dict(n_shards=2, block_size=8)

    def two_seg(d, codec_a, codec_b):
        build_index(spark, a, d, codec=codec_a, **kw)
        add_segment(spark, b, d, "delta1", codec=codec_b, **kw)
        merge_segments(spark, d)

    two_seg(dst, "pfor", "varint")  # mixed codecs
    two_seg(ref, "varint", "varint")  # uniform reference, SAME split/ids
    ix_m, ix_r = Index(spark, dst), Index(spark, ref)
    assert ix_m.segments[0].meta["codec"] == "mixed"
    assert ix_r.segments[0].meta["codec"] == "varint"
    for q in (
        lambda ix: ix.term_hits("the"),
        lambda ix: ix.topk(["the"], k=10),
        lambda ix: ix.phrase_hits(["of", "the"]),
    ):
        assert hs(q(ix_m)) == hs(q(ix_r))
