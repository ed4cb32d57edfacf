"""EAF / TCF / NAF readers (reference format configs:
engine/src/main/resources/formats/{eaf,tcf,naf}.blf.yaml): each normalizes to
the annotated-pages shape — tokens, sentence spans, lemma/POS layers where the
format carries them, dependency relations, tag spans for EAF utterances."""

import pytest

EAF = """<?xml version="1.0"?>
<ANNOTATION_DOCUMENT AUTHOR="" DATE="2001-01-01" FORMAT="3.0" VERSION="3.0">
  <TIME_ORDER>
    <TIME_SLOT TIME_SLOT_ID="ts1" TIME_VALUE="0"/>
    <TIME_SLOT TIME_SLOT_ID="ts2" TIME_VALUE="1000"/>
    <TIME_SLOT TIME_SLOT_ID="ts3" TIME_VALUE="2000"/>
    <TIME_SLOT TIME_SLOT_ID="ts4" TIME_VALUE="3000"/>
  </TIME_ORDER>
  <TIER TIER_ID="A-words" PARTICIPANT="ANN">
    <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a1"
        TIME_SLOT_REF1="ts1" TIME_SLOT_REF2="ts2">
      <ANNOTATION_VALUE>hello there world</ANNOTATION_VALUE>
    </ALIGNABLE_ANNOTATION></ANNOTATION>
  </TIER>
  <TIER TIER_ID="B-words" PARTICIPANT="BOB">
    <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a2"
        TIME_SLOT_REF1="ts3" TIME_SLOT_REF2="ts4">
      <ANNOTATION_VALUE>good morning</ANNOTATION_VALUE>
    </ALIGNABLE_ANNOTATION></ANNOTATION>
  </TIER>
</ANNOTATION_DOCUMENT>
"""

TCF = """<?xml version="1.0"?>
<D-Spin xmlns="http://www.dspin.de/data" version="0.4">
<TextCorpus xmlns="http://www.dspin.de/data/textcorpus" lang="de">
  <tokens>
    <token ID="t1">Der</token>
    <token ID="t2">Hund</token>
    <token ID="t3">bellt</token>
  </tokens>
  <sentences><sentence ID="s1" tokenIDs="t1 t2 t3"/></sentences>
  <lemmas>
    <lemma ID="l1" tokenIDs="t1">der</lemma>
    <lemma ID="l2" tokenIDs="t2">hund</lemma>
    <lemma ID="l3" tokenIDs="t3">bellen</lemma>
  </lemmas>
  <POStags tagset="stts">
    <tag ID="pt1" tokenIDs="t1">ART</tag>
    <tag ID="pt2" tokenIDs="t2">NN</tag>
    <tag ID="pt3" tokenIDs="t3">VVFIN</tag>
  </POStags>
  <depparsing>
    <parse><dependency func="SB" govIDs="t3" depIDs="t2"/></parse>
  </depparsing>
</TextCorpus>
</D-Spin>
"""

NAF = """<?xml version="1.0"?>
<NAF xml:lang="en" version="v3">
  <text>
    <wf id="w1" sent="1">cats</wf>
    <wf id="w2" sent="1">sleep</wf>
    <wf id="w3" sent="2">dogs</wf>
    <wf id="w4" sent="2">bark</wf>
  </text>
  <terms>
    <term id="t1" lemma="cat" pos="N"><span><target id="w1"/></span></term>
    <term id="t2" lemma="sleep" pos="V"><span><target id="w2"/></span></term>
    <term id="t3" lemma="dog" pos="N"><span><target id="w3"/></span></term>
    <term id="t4" lemma="bark" pos="V"><span><target id="w4"/></span></term>
  </terms>
  <deps>
    <dep from="t2" to="t1" rfunc="nsubj"/>
    <dep from="t4" to="t3" rfunc="nsubj"/>
  </deps>
</NAF>
"""


def test_eaf(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_eaf_dir

    d = tmp_path_factory.mktemp("eaf_in")
    (d / "sess.eaf").write_text(EAF)
    rows = pages_from_eaf_dir(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(r["tokens"]) == ["hello", "there", "world", "good", "morning"]
    assert [list(s) for s in r["sents"]] == [[0, 3], [3, 5]]
    tags = [(t["name"], t["start"], t["end"], dict(t["attrs"])) for t in r["tags"]]
    assert tags == [
        ("u", 0, 3, {"who": "ANN", "tier": "A-words"}),
        ("u", 3, 5, {"who": "BOB", "tier": "B-words"}),
    ]


def test_eaf_index_speaker_query(spark, tmp_path_factory):
    from blacklab_spark import bcql
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import pages_from_eaf_dir

    d = tmp_path_factory.mktemp("eaf_in2")
    (d / "sess.eaf").write_text(EAF)
    out = str(tmp_path_factory.mktemp("ix_eaf"))
    build_index(
        spark, pages_from_eaf_dir(spark, str(d)), out,
        n_shards=1, block_size=8, index_tags=("u",),
    )
    ix = Index(spark, out)
    got = {
        (r["start"], r["end"])
        for r in bcql.find(ix, '<u who="BOB"/> containing "morning"').collect()
    }
    assert got == {(3, 5)}


def test_tcf(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_tcf_dir

    d = tmp_path_factory.mktemp("tcf_in")
    (d / "doc.tcf").write_text(TCF)
    rows = pages_from_tcf_dir(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lang"] == "de"
    assert list(r["tokens"]) == ["Der", "Hund", "bellt"]
    assert list(r["tokens_lemma"]) == ["der", "hund", "bellen"]
    assert list(r["tokens_pos"]) == ["ART", "NN", "VVFIN"]
    assert [list(s) for s in r["sents"]] == [[0, 3]]
    rels = [tuple(x) for x in r["relations"]]
    assert rels == [("dep", "SB", 2, 3, 1, 2)]


def test_naf(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_naf_dir

    d = tmp_path_factory.mktemp("naf_in")
    (d / "doc.naf").write_text(NAF)
    rows = pages_from_naf_dir(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lang"] == "en"
    assert list(r["tokens"]) == ["cats", "sleep", "dogs", "bark"]
    assert list(r["tokens_lemma"]) == ["cat", "sleep", "dog", "bark"]
    assert list(r["tokens_pos"]) == ["N", "V", "N", "V"]
    assert [list(s) for s in r["sents"]] == [[0, 2], [2, 4]]
    rels = {tuple(x) for x in r["relations"]}
    assert rels == {
        ("dep", "nsubj", 1, 2, 0, 1),
        ("dep", "nsubj", 3, 4, 2, 3),
    }


def test_naf_relations_queryable(spark, tmp_path_factory):
    from blacklab_spark import bcql
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import pages_from_naf_dir

    d = tmp_path_factory.mktemp("naf_in2")
    (d / "doc.naf").write_text(NAF)
    out = str(tmp_path_factory.mktemp("ix_naf"))
    build_index(
        spark, pages_from_naf_dir(spark, str(d)), out,
        n_shards=1, block_size=8,
        annotations=("word", "lemma", "pos"),
    )
    ix = Index(spark, out)
    got = {
        (r["start"], r["end"])
        for r in bcql.find(ix, 'rspan(_ -nsubj-> _, "target")').collect()
    }
    assert got == {(0, 1), (2, 3)}
