"""Parallel corpora: parallel token streams + `==>field` alignment operator
(reference: RelationOperatorInfo.java:25-70, SpansOverrideField,
SpanQueryCaptureRelationsBetweenSpans)."""

import pytest

from blacklab_spark import bcql


def hs(df):
    return {
        (r["doc_id"], r["start"], r["end"])
        for r in df.select("doc_id", "start", "end").collect()
    }

PAR_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "tokens array<string>, tokens_nl array<string>, "
    "relations array<struct<rclass:string,rtype:string,src_start:int,src_end:int,"
    "tgt_start:int,tgt_end:int>>"
)


def _align(n):
    """Word-by-word alignment relations i -> i (rclass al:nl)."""
    return [("al:nl", "word", i, i + 1, i, i + 1) for i in range(n)]


@pytest.fixture(scope="module")
def par_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    rows = [
        ("doc://0", None, None, None, "en",
         ["the", "dog", "sleeps"], ["de", "hond", "slaapt"], _align(3)),
        ("doc://1", None, None, None, "en",
         ["a", "cat"], ["een", "kat"], _align(2)),
    ]
    pages = spark.createDataFrame(rows, PAR_SCHEMA)
    out = str(tmp_path_factory.mktemp("ix_parallel"))
    build_index(spark, pages, out, n_shards=2, block_size=4)
    return Index(spark, out)


def test_parallel_fields_meta(par_index):
    assert par_index.parallel_fields() == ["nl"]


def test_parallel_term_hits(par_index):
    assert hs(par_index.parallel_term_hits("nl", term="hond")) == {(0, 1, 2)}
    assert hs(par_index.parallel_term_hits("nl", regex="h.*")) == {(0, 1, 2)}
    with pytest.raises(ValueError, match="unknown parallel field"):
        par_index.parallel_term_hits("de", term="x")


def test_alignment_operator(par_index):
    assert hs(bcql.find(par_index, '"dog" ==>nl "hond"')) == {(0, 1, 2)}
    assert hs(bcql.find(par_index, '"dog" ==>nl "kat"')) == set()
    assert hs(bcql.find(par_index, '"dog" ==>nl _')) == {(0, 1, 2)}
    assert hs(bcql.find(par_index, '"cat" ==>nl "kat"')) == {(1, 1, 2)}


def test_alignment_rtype_filter(par_index):
    assert hs(bcql.find(par_index, '"dog" =word=>nl "hond"')) == {(0, 1, 2)}
    assert hs(bcql.find(par_index, '"dog" =sent=>nl _')) == set()


def test_alignment_sequence_target(par_index):
    got = hs(bcql.find(par_index, '"the" "dog" ==>nl "de" "hond"'))
    assert got == {(0, 0, 2)}


def test_alignment_survives_compact(spark, tmp_path_factory, par_index):
    import shutil

    from blacklab_spark.build import compact
    from blacklab_spark.query import Index

    out = str(tmp_path_factory.mktemp("ix_parallel_compact"))
    shutil.copytree(par_index.dir, out, dirs_exist_ok=True)
    compact(spark, out, n_shards=2, block_size=4)
    ix2 = Index(spark, out)
    assert ix2.parallel_fields() == ["nl"]
    assert hs(bcql.find(ix2, '"dog" ==>nl "hond"')) == {(0, 1, 2)}


def test_alignment_capture(par_index):
    # capture label: target span rides along in nl token space
    df = bcql.find(par_index, '"dog" A:==>nl "hond"')
    rows = {
        (r["doc_id"], r["start"], r["end"], r["A_start"], r["A_end"])
        for r in df.collect()
    }
    assert rows == {(0, 1, 2, 1, 2)}
    # multi-token source: enclosing span of all matched relations' targets
    df = bcql.find(par_index, '"the" "dog" A:==>nl _')
    rows = {
        (r["doc_id"], r["start"], r["end"], r["A_start"], r["A_end"])
        for r in df.collect()
    }
    assert rows == {(0, 0, 2, 0, 2)}


def test_alignment_optional(par_index):
    # `==>nl?`: left side kept even with no alignment match on the right
    assert hs(bcql.find(par_index, '"dog" ==>nl? "kat"')) == {(0, 1, 2)}
    df = bcql.find(par_index, '"dog" A:==>nl? "kat"')
    rows = {
        (r["doc_id"], r["start"], r["end"], r["A_start"], r["A_end"])
        for r in df.collect()
    }
    assert rows == {(0, 1, 2, None, None)}


def test_nested_settings_prefix_rejected(par_index):
    # a nested @field= would leak into the shared settings and silently
    # rescope the whole query — reject it (settingsQuery wraps the whole
    # query in the reference grammar too)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="start of the query"):
        bcql.parse('"dog" (@field=nl "hond")')


def test_purely_variadic_function():
    bcql.register_function(
        "_orall", ("Q*",), lambda a: bcql.TPOr(list(a)) if len(a) > 1 else a[0]
    )
    tp = bcql.parse('_orall("a", "b")')
    assert isinstance(tp, bcql.TPOr) and len(tp.clauses) == 2
    assert isinstance(bcql.parse('_orall("a")'), bcql.TPTerm)
    del bcql.QUERY_FUNCTIONS["_orall"]


def test_field_override(par_index):
    # @field=nl evaluates the whole pattern in the parallel field's token
    # space (SpansOverrideField analog)
    assert hs(bcql.find(par_index, '@field=nl "hond"')) == {(0, 1, 2)}
    assert hs(bcql.find(par_index, '@field=nl "de" "hond"')) == {(0, 0, 2)}
    assert hs(bcql.find(par_index, '@field=nl "dog"')) == set()  # main-field term
    tp = bcql.parse('@field=nl "hond"')
    assert isinstance(tp, bcql.TPFieldOverride)
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp


def test_alignment_rels_excluded_from_dependency_queries(par_index):
    # rclass 'al:<field>' targets live in the PARALLEL field's token space;
    # generic relation queries must never see them
    assert par_index.rel_spans().count() == 0
    assert hs(bcql.find(par_index, '_ -word-> _')) == set()
    assert par_index.rel_spans(include_alignments=True).count() == 5


def test_parallel_regex_pattern_not_lowercased(par_index):
    # fold lowers the COLUMN, not the pattern (\W etc. would corrupt)
    assert hs(par_index.parallel_term_hits("nl", regex="h.nd")) == {(0, 1, 2)}
    assert hs(par_index.parallel_term_hits("nl", regex="HOND")) == set()


def test_alignment_serialization():
    for q in (
        '"dog" =word=>nl "hond"',
        '"dog" A:==>nl "hond"',
        '"dog" A:==>nl? "kat"',
        '"x" B:-nsubj-> _',
    ):
        tp = bcql.parse(q)
        assert bcql.from_dict(bcql.to_dict(tp)) == tp, q
        assert bcql.parse(bcql.to_cql(tp)) == tp, q
    tp = bcql.parse('"dog" =word=>nl "hond"')
    assert isinstance(tp, bcql.TPAlignment)
    assert tp.field == "nl" and tp.rtype == "word"
