"""WARC/WET ingestion (warc.py): record walk + HTTP parsing + gzip member
layouts round-tripped against the deterministic writer, and the
distributed pages_from_warc reader end-to-end (shards -> pages -> index)."""

import gzip

import pytest

from blacklab_spark import warc

DOCS = [
    {"url": "http://a.example/x", "date": "2021-05-01T10:00:00Z",
     "html": "<html><body><p>Hello &amp; world</p>"
             "<script>ignore()</script></body></html>"},
    {"url": "http://b.example/y", "date": "2021-05-02T11:30:00Z",
     "html": "<div>the quick brown fox</div>"},
    {"url": "http://c.example/gone", "date": "2021-05-03T00:00:00Z",
     "html": "not found", "status": 404},
]


@pytest.mark.parametrize("gz,prg", [(False, True), (True, True), (True, False)])
def test_parse_warc_roundtrip_gzip_layouts(gz, prg):
    b = warc.build_warc(DOCS, gz=gz, per_record_gzip=prg)
    recs = warc.parse_warc(b)
    assert [r["type"] for r in recs] == ["warcinfo"] + ["response"] * 3
    assert recs[1]["uri"] == "http://a.example/x"
    assert recs[1]["http"]["status"] == 200
    assert recs[3]["http"]["status"] == 404
    assert b"Hello &amp; world" in recs[1]["http"]["body"]
    assert recs[1]["http"]["charset"] == "utf-8"


def test_wet_conversion_records():
    b = warc.build_warc(
        [{"url": "http://a/x", "text": "plain wet text",
          "date": "2021-01-01T00:00:00Z"}], wet=True, gz=True)
    recs = warc.parse_warc(b)
    assert recs[1]["type"] == "conversion"
    assert recs[1]["payload"] == b"plain wet text"


def test_content_length_is_authoritative():
    # a record whose payload CONTAINS the record separator must not split
    body = "x\r\n\r\nWARC/1.0 fake\r\n\r\ny"
    b = warc.build_warc([{"url": "http://a/x", "html": body,
                          "date": "2021-01-01T00:00:00Z"}])
    recs = warc.parse_warc(b)
    assert len(recs) == 2
    assert b"WARC/1.0 fake" in recs[1]["http"]["body"]


def test_truncated_and_garbage_raise():
    b = warc.build_warc(DOCS)
    with pytest.raises(NotImplementedError):
        warc.parse_warc(b[: len(b) - 40])
    with pytest.raises(NotImplementedError):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")


def test_chunked_encoding_is_honest_boundary():
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\n0\r\n\r\n")
    rec = warc._record("response", http, "http://a/x",
                       "2021-01-01T00:00:00Z", "application/http")
    with pytest.raises(NotImplementedError, match="chunked"):
        warc.parse_warc(rec)


def test_pages_from_warc_distributed(spark, tmp_path):
    # two shards: one warc.gz (per-record members) + one WET
    (tmp_path / "shard-00000.warc.gz").write_bytes(
        warc.build_warc(DOCS, gz=True))
    (tmp_path / "shard-00001.warc.gz").write_bytes(
        warc.build_warc(
            [{"url": "http://d.example/wet", "text": "already extracted",
              "date": "2021-06-01T00:00:00Z"}], wet=True, gz=True))
    pages = warc.pages_from_warc(spark, str(tmp_path) + "/*.warc.gz")
    rows = {r["url"]: r for r in pages.collect()}
    # the 404 response is dropped; 2 responses + 1 conversion survive
    assert set(rows) == {"http://a.example/x", "http://b.example/y",
                         "http://d.example/wet"}
    a = rows["http://a.example/x"]
    assert a["text"] == "Hello & world"  # script dropped, entity folded
    assert bytes(a["html"]).startswith(b"<html>")
    assert a["warc_ts"] is not None and a["warc_ts"].year == 2021
    wet_row = rows["http://d.example/wet"]
    assert wet_row["text"] == "already extracted" and wet_row["html"] is None


def test_warc_to_index_end_to_end(spark, tmp_path):
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import INPUT_FORMATS

    reader = INPUT_FORMATS["warc"]["reader"]
    (tmp_path / "crawl.warc.gz").write_bytes(warc.build_warc(DOCS, gz=True))
    pages = reader(spark, str(tmp_path) + "/*.warc.gz")
    ixdir = str(tmp_path / "ix")
    build_index(spark, pages, ixdir)
    ix = Index(spark, ixdir)
    hits = ix.term_hits("fox").collect()
    assert len(hits) == 1  # "the quick brown fox" doc
