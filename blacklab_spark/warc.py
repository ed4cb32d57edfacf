"""WARC/WET web-archive ingestion (the Common Crawl shape), pure stdlib.

The canonical 100 TB webtext source is a bucket of *.warc.gz shards
(~1 GB each, per-record gzip members). This module implements:

- `parse_warc`: WARC/1.0 and 1.1 record walk — header block, exact
  Content-Length payload, record separators — over plain or gzip bytes
  (multi-member gzip = the per-record compression Common Crawl uses, which
  stdlib gzip.decompress concatenates transparently);
- HTTP response parsing inside `response` records (status line, headers,
  charset from Content-Type, body bytes);
- WET `conversion` records (pre-extracted text);
- `pages_from_warc`: distributed Spark reader — binaryFile per shard (the
  shard is the parallelism unit, exactly how a 1000-executor job fans out
  over Common Crawl segments), one Arrow-batched mapInPandas parse per
  shard, exploding to the standard pages schema (url, warc_ts, html, text,
  lang) with the repo's deterministic html->text extraction;
- `build_warc`: the deterministic writer (incl. per-record gzip members)
  so writer and parser check each other.

Chunked transfer-encoding inside response payloads is rare in archived
WARCs (crawlers store de-chunked bodies) and raises NotImplementedError.

Reference parity: the reference ingests documents from files/archives
(DocIndexer* + index-input formats); WARC is the webtext-specific source
this Spark-first pipeline adds on top.
"""

from __future__ import annotations

import gzip
import hashlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parse_warc", "build_warc", "pages_from_warc"]


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line = version / status
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _parse_http_response(payload: bytes) -> dict:
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise NotImplementedError("HTTP response without header terminator")
    head = payload[:sep]
    body = payload[sep + 4 :]
    status_line = head.split(b"\r\n", 1)[0].decode("latin-1", "replace")
    parts = status_line.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    headers = _split_headers(head)
    if "chunked" in headers.get("transfer-encoding", "").lower():
        raise NotImplementedError("chunked transfer-encoding in WARC payload")
    ctype = headers.get("content-type", "")
    charset = "utf-8"
    if "charset=" in ctype:
        charset = ctype.split("charset=", 1)[1].split(";")[0].strip().strip('"')
    return {
        "status": status, "headers": headers, "body": body,
        "content_type": ctype.split(";")[0].strip(), "charset": charset,
    }


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or gzip, incl. multi-member per-record gzip)
    into records: {"type", "uri", "date", "content_type", "payload",
    and for responses "http": {status, headers, body, charset}}."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # concatenates all members
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate record separators / stray newlines between records
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise NotImplementedError(f"bad WARC record header at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise NotImplementedError("truncated WARC header block")
        head = data[pos:hdr_end]
        headers = _split_headers(head)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise NotImplementedError("WARC record without Content-Length")
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        if len(payload) != length:
            raise NotImplementedError("WARC payload shorter than Content-Length")
        pos = hdr_end + 4 + length
        rec = {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
        }
        if rec["type"] == "response" and payload[:5] == b"HTTP/":
            rec["http"] = _parse_http_response(payload)
        records.append(rec)
    return records


def _warc_ts(date: str | None):
    if not date:
        return None
    try:
        return datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def pages_from_warc(
    spark: SparkSession, path: str, extract_text: bool = True,
    lang: str = "und",
) -> DataFrame:
    """Distributed WARC/WET -> pages: binaryFile per shard, one
    mapInPandas parse per shard (shards are the parallelism unit — at
    Common Crawl scale, repartition the file listing before the parse).
    `response` records keep the raw HTML body in the `html` column and
    (optionally) the deterministic html->text extraction in `text`;
    `conversion` (WET) records carry text directly; 4xx/5xx responses and
    non-document records are dropped."""
    from .preprocess import _html_to_text
    from .sources import PAGES_SCHEMA

    files = spark.read.format("binaryFile").load(path)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content)):
                    if rec["type"] == "response" and "http" in rec:
                        http = rec["http"]
                        if not (200 <= http["status"] < 300):
                            continue
                        body = http["body"]
                        text = None
                        if extract_text:
                            text = _html_to_text(
                                body.decode(http["charset"], "replace"), "html"
                            )
                        rows.append((
                            rec["uri"], _warc_ts(rec["date"]), body, text, lang,
                        ))
                    elif rec["type"] == "conversion":
                        rows.append((
                            rec["uri"], _warc_ts(rec["date"]), None,
                            rec["payload"].decode("utf-8", "replace"), lang,
                        ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.select("content").mapInPandas(kernel, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# writer (synth side)
# ---------------------------------------------------------------------------


def _record(rtype: str, payload: bytes, uri: str | None, date: str,
            content_type: str) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: <urn:uuid:"
        + hashlib.md5(repr((rtype, uri, date)).encode()).hexdigest().encode()
        + b">",
        b"Content-Length: " + str(len(payload)).encode(),
        b"Content-Type: " + content_type.encode(),
    ]
    if uri:
        lines.insert(3, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_warc(
    docs: list[dict], *, gz: bool = False, per_record_gzip: bool = True,
    wet: bool = False,
) -> bytes:
    """Write a WARC (or WET when wet=True) file from docs
    [{"url", "date", "html" | "text", ...}]. With gz, each record becomes
    its own gzip member (the Common Crawl layout) unless per_record_gzip
    is False (single-member whole-file gzip)."""
    records = [_record(
        "warcinfo", b"software: blacklab-spark-synth\r\n", None,
        "2020-01-01T00:00:00Z", "application/warc-fields",
    )]
    for d in docs:
        date = d.get("date", "2020-01-01T00:00:00Z")
        if wet:
            records.append(_record(
                "conversion", d["text"].encode(), d["url"], date, "text/plain",
            ))
        else:
            body = d["html"].encode() if isinstance(d["html"], str) else d["html"]
            status = d.get("status", 200)
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            records.append(_record(
                "response", http, d["url"], date,
                'application/http; msgtype=response',
            ))
    if not gz:
        return b"".join(records)
    if per_record_gzip:
        return b"".join(gzip.compress(r) for r in records)
    return gzip.compress(b"".join(records))
