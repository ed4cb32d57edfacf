"""Sources normalization + streaming delta-segment ingest + serialization."""

import json

from blacklab_spark import bcql, sources


def test_sources_csv_jsonl_text(spark, tmp_path):
    # CSV
    csv = tmp_path / "c.csv"
    csv.write_text("u,t,l\nhttp://a,hello world,en\nhttp://b,tweede tekst,nl\n")
    df = sources.pages_from_csv(spark, str(csv), url="u", text="t", lang="l")
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r.url: (r.text, r.lang) for r in df.collect()}
    assert rows["http://a"] == ("hello world", "en")
    # JSONL
    jl = tmp_path / "d.jsonl"
    jl.write_text('{"url": "http://c", "text": "drie", "lang": "nl"}\n')
    dj = sources.pages_from_jsonl(spark, str(jl), lang="lang")
    assert dj.collect()[0].text == "drie"
    # plain text dir
    td = tmp_path / "txts"
    td.mkdir()
    (td / "one.txt").write_text("file one content")
    dt = sources.pages_from_text_dir(spark, str(td))
    r = dt.collect()[0]
    assert r.text == "file one content" and r.url.endswith("one.txt")


def test_xml_dir_format_config(spark, tmp_path):
    """XML input format configs (reference: *.blf.yaml -> DocIndexerConfig):
    document splitting, inline-tag spans at indexed token positions,
    metadata extraction."""
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    xd = tmp_path / "xml"
    xd.mkdir()
    (xd / "a.xml").write_text(
        "<corpus>"
        '<doc><meta><lang>en</lang></meta><head n="1">first title</head>'
        "<p>the quick fox</p></doc>"
        "<doc><meta><lang>nl</lang></meta><head>tweede</head>"
        "<p>de snelle vos</p></doc>"
        "</corpus>"
    )
    (xd / "b.xml").write_text("<doc><head>solo</head><p>one more doc</p></doc>")
    fmt = {
        "documentPath": "doc",
        "inlineTags": ("head", "p"),
        "metadata": {"lang": "lang"},
    }
    pages = sources.pages_from_xml_dir(spark, str(xd), fmt)
    rows = sorted(
        (r.url.rsplit("/", 1)[-1], r.lang) for r in pages.collect()
    )
    assert rows == [("a.xml#0", "en"), ("a.xml#1", "nl"), ("b.xml#0", "und")]

    out = str(tmp_path / "ix_xml")
    build_index(
        spark, pages, out, n_shards=2, block_size=4,
        **sources.build_kwargs_from_format(fmt),
    )
    ix = Index(spark, out)
    # doc a#0: tokens = first(0) title(1) the(2) quick(3) fox(4)
    #   (metadata <lang>en</lang> text is tokenized too — position parity
    #    with extract_text, which strips only tags)
    heads = {
        (r.doc_id, r.start, r.end) for r in ix.tag_hits("head").collect()
    }
    assert len(heads) == 3
    got = {
        (r.doc_id, r.start, r.end)
        for r in bcql.find(ix, '"quick" within <p/>').collect()
    }
    assert len(got) == 1
    # metadata filter flows through the lang field
    assert ix.docs.filter("lang = 'nl'").count() == 1

    # YAML config loading
    yml = tmp_path / "fmt.blf.yaml"
    yml.write_text("documentPath: doc\ninlineTags: [head, p]\n")
    fmt2 = sources.load_xml_format(str(yml))
    assert fmt2["documentPath"] == "doc" and fmt2["inlineTags"] == ["head", "p"]

    # unrepresentable metadata target fails loudly
    try:
        sources.pages_from_xml_dir(spark, str(xd), {"metadata": {"author": "a"}})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "author" in str(e)

    # XPath-style documentPath fails loudly instead of matching nothing
    try:
        sources.pages_from_xml_dir(spark, str(xd), {"documentPath": "//doc"})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "plain tag name" in str(e)


def test_chat_dir_reader(spark, tmp_path):
    """CHAT transcripts (reference: DocIndexerChat): utterances become
    <u who=...> spans, speaker queryable as a tag attribute."""
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    cd = tmp_path / "chat"
    cd.mkdir()
    (cd / "t.cha").write_text(
        "@Begin\n"
        "@Languages:\teng\n"
        "*MOT:\tlook at the doggy [= points] .\n"
        "\tsuch a good dog .\n"
        "%mor:\tskipped tier\n"
        "*CHI:\tdoggy &=laughs !\n"
        "@End\n"
    )
    pages = sources.pages_from_chat_dir(spark, str(cd))
    r = pages.collect()[0]
    assert r.lang == "eng" and r.text is None
    out = str(tmp_path / "ix_chat")
    build_index(spark, pages, out, n_shards=1, block_size=4, index_tags=("u",))
    ix = Index(spark, out)
    # MOT utterance: look at the doggy such a good dog = tokens 0..8
    mot = {(r.doc_id, r.start, r.end) for r in ix.tag_hits("u", attrs={"who": "MOT"}).collect()}
    assert mot == {(0, 0, 8)}
    chi = {(r.doc_id, r.start, r.end) for r in ix.tag_hits("u", attrs={"who": "CHI"}).collect()}
    assert chi == {(0, 8, 9)}
    got = {
        (r.doc_id, r.start, r.end)
        for r in bcql.find(ix, '"doggy" within <u who="CHI"/>').collect()
    }
    assert got == {(0, 8, 9)}


def test_streaming_ingest_builds_segments(spark, tmp_path):
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index
    from blacklab_spark.streaming import stream_build, stream_pages_from_parquet_dir

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = str(tmp_path / "ix")
    ck = str(tmp_path / "ck")
    # drop two files -> two micro-batch delta segments (availableNow may
    # fold them into one batch; assert on the INDEX content, not batch count)
    pages = pages_df(spark, "tiny").collect()
    spark.createDataFrame(pages[:3], pages_df(spark, "tiny").schema).write.parquet(
        str(inbox / "f1.parquet")
    )
    q = stream_build(
        stream_pages_from_parquet_dir(spark, str(inbox) + "/*"),
        out, ck, n_shards=2,
    )
    q.awaitTermination(120)
    spark.createDataFrame(pages[3:], pages_df(spark, "tiny").schema).write.parquet(
        str(inbox / "f2.parquet")
    )
    q2 = stream_build(
        stream_pages_from_parquet_dir(spark, str(inbox) + "/*"),
        out, ck, n_shards=2,
    )
    q2.awaitTermination(120)
    ix = Index(spark, out)
    assert ix.n_docs == 6
    # the streamed index answers queries like a batch-built one
    assert ix.count_hits("aap") == 21


def test_serialization_roundtrip():
    qs = [
        '"the" "quick"',
        '"a" [word="b"]{2,3} | "c"',
        '("x" "y") within <s/>',
        'A:[] "quick"',
        '[word!="aap"]',
    ]
    for q in qs:
        tp = bcql.parse(q)
        # dict/JSON roundtrip
        d = json.loads(json.dumps(bcql.to_dict(tp)))
        assert bcql.from_dict(d) == tp
        # CQL roundtrip: parse(to_cql(tp)) == tp
        assert bcql.parse(bcql.to_cql(tp)) == tp
