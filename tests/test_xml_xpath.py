"""Namespaced-XML ingestion via the XPath config path (reference:
DocIndexerSaxon, DocIndexerSaxon.java:199-272): a TEI document with a default
namespace round-trips — document split, token stream, inline-tag spans at
exact token positions, attributes, sentence spans, XPath metadata — where the
regex-scan pages_from_xml_dir cannot match namespaced tags at all."""

import pytest

from blacklab_spark import bcql

TEI = """<?xml version="1.0"?>
<teiCorpus xmlns="http://www.tei-c.org/ns/1.0">
  <TEI>
    <teiHeader><profileDesc><langUsage>
      <language ident="nl">nl</language>
    </langUsage></profileDesc></teiHeader>
    <text><body>
      <p rend="first"><s>the quick fox</s> <s>jumps high</s></p>
      <p>over lazy dogs</p>
    </body></text>
  </TEI>
  <TEI>
    <teiHeader><profileDesc><langUsage>
      <language ident="en">en</language>
    </langUsage></profileDesc></teiHeader>
    <text><body><p>second document here</p></body></text>
  </TEI>
</teiCorpus>
"""

FMT = {
    "documentPath": ".//tei:TEI",
    "contentPath": ".//tei:text",
    "namespaces": {"tei": "http://www.tei-c.org/ns/1.0"},
    "inlineTags": ("p", "s"),
    "metadata": {"lang": ".//tei:language"},
}


@pytest.fixture(scope="module")
def tei_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import build_kwargs_from_format, pages_from_xml_xpath

    d = tmp_path_factory.mktemp("tei_in")
    (d / "corpus.xml").write_text(TEI)
    pages = pages_from_xml_xpath(spark, str(d), FMT)
    out = str(tmp_path_factory.mktemp("ix_tei"))
    build_index(
        spark, pages, out, n_shards=1, block_size=8,
        **build_kwargs_from_format(FMT),
    )
    return Index(spark, out)


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_documents_split_and_metadata(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_xml_xpath

    d = tmp_path_factory.mktemp("tei_in2")
    (d / "corpus.xml").write_text(TEI)
    rows = pages_from_xml_xpath(spark, str(d), FMT).collect()
    assert len(rows) == 2
    by_lang = {r["lang"]: r for r in rows}
    assert set(by_lang) == {"nl", "en"}
    assert list(by_lang["nl"]["tokens"]) == [
        "the", "quick", "fox", "jumps", "high", "over", "lazy", "dogs",
    ]
    assert list(by_lang["en"]["tokens"]) == ["second", "document", "here"]
    # sentence spans from <s> elements; doc 2 has none -> whole doc
    assert [list(s) for s in by_lang["nl"]["sents"]] == [[0, 3], [3, 5]]
    assert [list(s) for s in by_lang["en"]["sents"]] == [[0, 3]]
    tags = sorted(
        (t["name"], t["start"], t["end"], dict(t["attrs"]))
        for t in by_lang["nl"]["tags"]
    )
    assert ("p", 0, 5, {"rend": "first"}) in tags
    assert ("p", 5, 8, {}) in tags
    assert ("s", 0, 3, {}) in tags and ("s", 3, 5, {}) in tags


def test_tag_queries_on_tei(tei_index):
    # attribute-filtered tag query over real namespaced markup
    got = hs(bcql.find(tei_index, '<p rend="first"/>'))
    assert len(got) == 1 and {(s, e) for (_, s, e) in got} == {(0, 5)}
    # containing over the indexed spans
    assert len(hs(bcql.find(tei_index, '<p/> containing "lazy"'))) == 1
    # term positions line up with the walked token stream
    assert {(s, e) for (_, s, e) in hs(bcql.find(tei_index, '"jumps"'))} == {(3, 4)}


def test_whole_file_mode(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_xml_xpath

    d = tmp_path_factory.mktemp("tei_in3")
    (d / "one.xml").write_text(
        '<doc xmlns="urn:x"><p>alpha beta</p></doc>'
    )
    rows = pages_from_xml_xpath(
        spark, str(d), {"inlineTags": ("p",), "documentPath": None}
    ).collect()
    assert len(rows) == 1
    assert list(rows[0]["tokens"]) == ["alpha", "beta"]
    assert [
        (t["name"], t["start"], t["end"]) for t in rows[0]["tags"]
    ] == [("p", 0, 2)]


def test_root_is_document_element(spark, tmp_path_factory):
    # documentPath matching the root element itself (findall never matches
    # its starting element — the probe wrapper must)
    from blacklab_spark.sources import pages_from_xml_xpath

    d = tmp_path_factory.mktemp("tei_in4")
    (d / "one.xml").write_text(
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>'
        "<p>only doc</p></body></text></TEI>"
    )
    rows = pages_from_xml_xpath(spark, str(d), FMT).collect()
    assert len(rows) == 1 and list(rows[0]["tokens"]) == ["only", "doc"]
