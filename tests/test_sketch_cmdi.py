"""Sketch-WPL + CMDI readers (reference format configs:
engine/src/main/resources/formats/{sketch-wpl,cmdi}.blf.yaml; legacy
DocIndexerXmlSketch / MetadataFetcherSonarCmdi): the last two reference
ingestion formats. WPL normalizes to the annotated+tagged pages shape
(word/pos/lemma columns, inline tags, glue tags, doc attrs as a whole-doc
tag span); CMDI is metadata-only and joins onto content pages."""

import pytest

WPL = """<doc id="47040" lang="nl" bron="NRC">
<s>
De\tART\tde
WTO\tN\twto
zal\tV\tzullen
<g/>
.\tPUNCT\t.
</s>
<s n="2">
Acht\tNUM\tacht
jaar\tN\tjaar
</s>
</doc>
<doc id="47041" lang="en">
<p>
<s>
Hello\tUH\thello
world\tN\tworld
</s>
</p>
</doc>
"""

WPL_NO_DOC = """One\tNUM\tone
line\tN\tline
"""

CMDI = """<?xml version="1.0"?>
<CMD xmlns="http://www.clarin.eu/cmd/" CMDVersion="1.1">
  <Header><MdProfile>clarin.eu:cr1:p_12345</MdProfile></Header>
  <Components>
    <Session>
      <Name>session-7</Name>
      <Language><iso-639-3-code>nld</iso-639-3-code></Language>
      <Actor><Name>Ann</Name><Age>34</Age></Actor>
      <Actor><Name>Bob</Name></Actor>
    </Session>
  </Components>
</CMD>
"""


def test_sketch_wpl_reader(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_sketch_wpl

    d = tmp_path_factory.mktemp("wpl_in")
    (d / "corpus.wpl").write_text(WPL)
    rows = sorted(pages_from_sketch_wpl(spark, str(d)).collect(),
                  key=lambda r: r["url"])
    assert len(rows) == 2
    a, b = rows
    assert list(a["tokens"]) == ["De", "WTO", "zal", ".", "Acht", "jaar"]
    assert list(a["tokens_pos"]) == ["ART", "N", "V", "PUNCT", "NUM", "N"]
    assert list(a["tokens_lemma"]) == ["de", "wto", "zullen", ".", "acht", "jaar"]
    # <s> tags drive both the sentence layer and tag spans; glue tag is
    # consumed without a token
    assert [list(s) for s in a["sents"]] == [[0, 4], [4, 6]]
    tags_a = [(t["name"], t["start"], t["end"], dict(t["attrs"])) for t in a["tags"]]
    assert tags_a[0] == ("doc", 0, 6, {"id": "47040", "lang": "nl", "bron": "NRC"})
    assert ("s", 0, 4, {}) in tags_a and ("s", 4, 6, {"n": "2"}) in tags_a
    # doc attrs feed lang; all inline tags (here <p>) are indexed
    assert a["lang"] == "nl" and b["lang"] == "en"
    tags_b = {(t["name"], t["start"], t["end"]) for t in b["tags"]}
    assert ("p", 0, 2) in tags_b


def test_sketch_wpl_no_doc_tag_is_one_doc(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_sketch_wpl

    d = tmp_path_factory.mktemp("wpl_nodoc")
    (d / "x.wpl").write_text(WPL_NO_DOC)
    rows = pages_from_sketch_wpl(spark, str(d)).collect()
    assert len(rows) == 1
    assert list(rows[0]["tokens"]) == ["One", "line"]


def test_sketch_wpl_doc_attrs_queryable(spark, tmp_path_factory):
    from blacklab_spark import bcql
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import pages_from_sketch_wpl

    d = tmp_path_factory.mktemp("wpl_in2")
    (d / "corpus.wpl").write_text(WPL)
    out = str(tmp_path_factory.mktemp("ix_wpl"))
    build_index(
        spark, pages_from_sketch_wpl(spark, str(d)), out,
        n_shards=1, block_size=8, index_tags=("doc", "s"),
        annotations=("word", "lemma", "pos"),
    )
    ix = Index(spark, out)
    # doc attribute filter (the reference's attribute->metadata indexing)
    got = {
        (r["start"], r["end"])
        for r in bcql.find(ix, '<doc bron="NRC"/> containing "wto"').collect()
    }
    assert got == {(0, 6)}
    # input lemma layer is live
    assert bcql.find(ix, '[lemma="zullen"]').count() == 1


def test_cmdi_metadata(spark, tmp_path_factory):
    from blacklab_spark.sources import cmdi_metadata

    d = tmp_path_factory.mktemp("cmdi_in")
    (d / "sess.cmdi").write_text(CMDI)
    rows = cmdi_metadata(spark, str(d)).collect()
    assert len(rows) == 1
    f = dict(rows[0]["fields"])
    # all leaf elements with text, keyed by local name (namespace ignored);
    # repeated leaves concatenate in document order
    assert f["iso-639-3-code"] == "nld"
    assert f["Name"] == "session-7; Ann; Bob"
    assert f["Age"] == "34"
    # header is outside /CMD/Components (documentPath)
    assert "MdProfile" not in f


def test_enrich_pages_with_cmdi(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.sources import cmdi_metadata, enrich_pages_with_cmdi

    d = tmp_path_factory.mktemp("cmdi_in2")
    (d / "sess.cmdi").write_text(CMDI)
    meta = cmdi_metadata(spark, str(d)).withColumn("doc_key", F.lit("k1"))
    pages = spark.createDataFrame(
        [("u1", "some text", "und", "k1"), ("u2", "other", "und", "k2")],
        "url string, text string, lang string, doc_key string",
    )
    out = enrich_pages_with_cmdi(
        pages, meta, key="doc_key", fields={"lang": "iso-639-3-code"}
    )
    got = {r["url"]: r["lang"] for r in out.collect()}
    # matched page takes the CMDI value; unmatched keeps its own
    assert got == {"u1": "nld", "u2": "und"}
    with pytest.raises(ValueError, match="not representable"):
        enrich_pages_with_cmdi(pages, meta, key="doc_key", fields={"title": "Name"})


TSV_NAMED = """word\tlemma\tpos
The\tthe\tDET
cat\tcat\tNOUN

sleeps\tsleep\tVERB
"""

FROG = """1\tDe\tde\t[de]\tLID(bep)\t0.99
2\tkat\tkat\t[kat]\tN(soort)\t0.98

1\tslaapt\tslapen\t[slaap]\tWW(pv)\t0.97
"""


def test_tabular_tsv_named_columns(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_tabular_dir

    d = tmp_path_factory.mktemp("tsv_in")
    (d / "doc.tsv").write_text(TSV_NAMED)
    rows = pages_from_tabular_dir(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(r["tokens"]) == ["The", "cat", "sleeps"]
    assert list(r["tokens_lemma"]) == ["the", "cat", "sleep"]
    assert list(r["tokens_pos"]) == ["DET", "NOUN", "VERB"]
    # blank line separates sentences
    assert [list(s) for s in r["sents"]] == [[0, 2], [2, 3]]


def test_tabular_frog_indexes(spark, tmp_path_factory):
    # tsv-frog.blf.yaml: no header, 1-based valuePath word=2 lemma=3 pos=5
    from blacklab_spark.sources import pages_from_tabular_dir

    d = tmp_path_factory.mktemp("frog_in")
    (d / "doc.tsv").write_text(FROG)
    rows = pages_from_tabular_dir(
        spark, str(d), column_names=False, word=2, lemma=3, pos=5
    ).collect()
    r = rows[0]
    assert list(r["tokens"]) == ["De", "kat", "slaapt"]
    assert list(r["tokens_lemma"]) == ["de", "kat", "slapen"]
    assert list(r["tokens_pos"]) == ["LID(bep)", "N(soort)", "WW(pv)"]
    assert [list(s) for s in r["sents"]] == [[0, 2], [2, 3]]


def test_tabular_csv_quoted(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_tabular_dir

    d = tmp_path_factory.mktemp("csv_in")
    (d / "doc.csv").write_text('word,lemma,pos\n"hello, world",hello,UH\n')
    r = pages_from_tabular_dir(spark, str(d), fmt="csv").collect()[0]
    assert list(r["tokens"]) == ["hello, world"]
