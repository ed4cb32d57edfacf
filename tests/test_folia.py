"""FoLiA reader: annotation valuePaths (word/lemma/pos), inline s/p spans,
standoff entity/dependency layers resolved via w @xml:id (the config's
tokenIdPath), native-metadata language. Reference:
engine/src/main/resources/formats/folia.blf.yaml."""

FOLIA = """<?xml version="1.0" encoding="UTF-8"?>
<FoLiA xmlns="http://ilk.uvt.nl/folia" xml:id="doc1" version="0.10.0">
  <metadata type="native">
    <meta id="title">Boomhut</meta>
    <meta id="language">nl</meta>
  </metadata>
  <text xml:id="doc1.text">
    <div xml:id="doc1.div.1" class="chapter">
      <head xml:id="doc1.head.1">
        <s xml:id="doc1.head.1.s.1">
          <w xml:id="doc1.head.1.s.1.w.1">
            <t>Boomhut</t>
            <pos class="N(soort)" />
            <lemma class="boomhut" />
          </w>
        </s>
      </head>
      <p xml:id="doc1.p.1">
        <s xml:id="doc1.p.1.s.1">
          <t>De hut staat hoog .</t>
          <w xml:id="w.de"><t>De</t><pos class="LID"/><lemma class="de"/></w>
          <w xml:id="w.hut"><t>hut</t><pos class="N"/><lemma class="hut"/></w>
          <w xml:id="w.staat"><t>staat</t><pos class="WW"/><lemma class="staan"/></w>
          <w xml:id="w.hoog"><t>hoog</t><pos class="ADJ"/><lemma class="hoog"/></w>
          <w xml:id="w.punt"><t>.</t><pos class="LET"/><lemma class="."/></w>
          <entities>
            <entity class="plaats">
              <wref id="w.de" t="De" />
              <wref id="w.hut" t="hut" />
            </entity>
          </entities>
          <dependencies>
            <dependency xml:id="dep.1" class="su">
              <hd><wref id="w.staat" t="staat" /></hd>
              <dep><wref id="w.hut" t="hut" /></dep>
            </dependency>
          </dependencies>
        </s>
      </p>
    </div>
  </text>
</FoLiA>
"""


def test_folia_reader(spark, tmp_path_factory):
    from blacklab_spark.sources import pages_from_folia_dir

    d = tmp_path_factory.mktemp("folia_in")
    (d / "doc1.xml").write_text(FOLIA)
    rows = pages_from_folia_dir(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(r["tokens"]) == ["Boomhut", "De", "hut", "staat", "hoog", "."]
    assert list(r["tokens_lemma"]) == ["boomhut", "de", "hut", "staan", "hoog", "."]
    assert list(r["tokens_pos"]) == ["N(soort)", "LID", "N", "WW", "ADJ", "LET"]
    assert r["lang"] == "nl"
    assert [list(s) for s in r["sents"]] == [[0, 1], [1, 6]]
    tags = {(t["name"], t["start"], t["end"]) for t in r["tags"]}
    assert ("head", 0, 1) in tags
    assert ("p", 1, 6) in tags
    assert ("s", 1, 6) in tags
    ent = [t for t in r["tags"] if t["name"] == "entity"]
    assert len(ent) == 1 and (ent[0]["start"], ent[0]["end"]) == (1, 3)
    assert ent[0]["attrs"]["class"] == "plaats"
    rels = [tuple(x) for x in r["relations"]]
    # hd=staat (pos 3), dep=hut (pos 2), class su
    assert rels == [("dep", "su", 3, 4, 2, 3)]


def test_folia_end_to_end_index(spark, tmp_path_factory):
    """FoLiA pages build into a queryable index: lemma layer + entity tag
    spans + dependency relations survive the build."""
    from blacklab_spark import bcql
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import pages_from_folia_dir

    d = tmp_path_factory.mktemp("folia_in2")
    (d / "doc1.xml").write_text(FOLIA)
    out = str(tmp_path_factory.mktemp("folia_ix") / "ix")
    pages = pages_from_folia_dir(spark, str(d))
    build_index(
        spark, pages, out,
        annotations=("word", "lemma", "pos"),
        index_tags=("s", "p", "entity"),
        index_relations=True,
    )
    ix = Index(spark, out)
    got = {
        (r["doc_id"], r["start"], r["end"])
        for r in bcql.find(ix, '[lemma="staan"]').collect()
    }
    assert got == {(0, 3, 4)}
    ent = {
        (r["start"], r["end"])
        for r in bcql.find(ix, '<entity/> containing [lemma="hut"]').collect()
    }
    assert ent == {(1, 3)}
