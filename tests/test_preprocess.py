"""Convert-and-tag preprocessing pipeline (reference: indexers/preprocess/
ConvertPlugin + TagPlugin + PluginManager): per-file convert/tag inside one
distributed pass, composing with the pages_from_* readers."""

import pytest

from blacklab_spark import preprocess as P

HTML = """<html><head><title>T</title><style>p {color:red}</style>
<script>var x = "<p>not text</p>";</script></head>
<body><h1>Walking quickly</h1>
<p>The walker walked. Happiness &amp; sadness!</p></body></html>
"""


def test_html_convert_pure():
    txt = P._html_to_text(HTML, "html")
    assert "not text" not in txt and "color:red" not in txt
    assert "Walking quickly" in txt
    assert "Happiness & sadness!" in txt


def test_suffix_tagger_pure():
    tsv = P._suffix_tag("The walker walked. Go!")
    lines = tsv.strip().splitlines()
    assert lines[0] == "word\tlemma\tpos"
    assert "walked\twalk\tVERB" in lines
    assert "" in lines  # sentence break after '.'


def test_resolve_pipeline():
    c, t = P.resolve_pipeline("html")
    assert c.name == "convert_html" and t.name == "tag_suffix_rules"
    # direct tag, no converter
    c2, t2 = P.resolve_pipeline("txt")
    assert c2 is None and t2.name == "tag_suffix_rules"
    with pytest.raises(ValueError, match="no convert/tag pipeline"):
        P.resolve_pipeline("pdfx-unknown")


def test_external_tool_stubs():
    with pytest.raises(NotImplementedError, match="OpenConvert"):
        P.convert_openconvert.perform("x", "docx")
    with pytest.raises(NotImplementedError, match="DutchTagger"):
        P.tag_dutchtagger.perform("x")


def test_convert_and_tag_end_to_end(spark, tmp_path_factory):
    """html -> convert_html -> tag_suffix_rules -> tabular reader -> index
    -> lemma query, all distributed (one mapInPandas chain)."""
    from blacklab_spark import bcql
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    d = tmp_path_factory.mktemp("html_in")
    (d / "a.html").write_text(HTML)
    pages = P.pages_via_convert_and_tag(spark, str(d), "html")
    rows = pages.collect()
    assert len(rows) == 1
    r = rows[0]
    assert "walked" in list(r["tokens"])
    i = list(r["tokens"]).index("walked")
    assert r["tokens_lemma"][i] == "walk" and r["tokens_pos"][i] == "VERB"
    assert r["url"].endswith(".tsv")  # TagPlugin.getOutputFileName parity

    out = str(tmp_path_factory.mktemp("html_ix") / "ix")
    build_index(spark, pages, out, annotations=("word", "lemma", "pos"))
    ix = Index(spark, out)
    # "Walking" and "walked" both lemmatize to walk/VERB; "walker" does not
    hits = bcql.find(ix, '[lemma="walk" & pos="VERB"]').collect()
    assert len(hits) == 2
