"""WARC source: Common-Crawl-style ingestion to the corpus schema (ISO 28500
record framing; response records only, HTTP envelope stripped)."""

import gzip

import pytest

from lucene_7_x_9_x_spark.sources.warc import parse_warc_bytes, read_warc


def _record(wtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _mini_warc() -> bytes:
    http1 = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
             b"<html><body>hello spark</body></html>")
    http2 = (b"HTTP/1.1 200 OK\r\n\r\n"
             b"<html><body>second page</body></html>")
    return (
        _record("warcinfo", "", "2026-01-01T00:00:00Z", b"software: test")
        + _record("response", "http://a.example/x", "2026-01-01T00:00:01Z",
                  http1)
        + _record("request", "http://a.example/x", "2026-01-01T00:00:01Z",
                  b"GET /x HTTP/1.1\r\n\r\n")
        + _record("response", "http://b.example/y", "2026-01-02T00:00:02Z",
                  http2)
    )


def test_parse_warc_bytes():
    rows = parse_warc_bytes(_mini_warc(), "f.warc")
    assert len(rows) == 2  # responses only
    assert rows[0][0] == "http://a.example/x"
    assert rows[0][1] == "2026-01-01T00:00:01Z"
    assert rows[0][2] == b"<html><body>hello spark</body></html>"
    assert rows[1][0] == "http://b.example/y"
    assert rows[1][2] == b"<html><body>second page</body></html>"


def test_parse_warc_gz_members():
    # .warc.gz = concatenated per-record gzip members
    raw = _mini_warc()
    cut = len(raw) // 2
    gz = gzip.compress(raw[:cut]) + gzip.compress(raw[cut:])
    rows = parse_warc_bytes(gz, "f.warc.gz")
    assert [r[0] for r in rows] == ["http://a.example/x", "http://b.example/y"]


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part1.warc").write_bytes(_mini_warc())
    (d / "part2.warc").write_bytes(
        _record("response", "http://c.example/z", "2026-01-03T00:00:03Z",
                b"HTTP/1.1 200 OK\r\n\r\n<html>third</html>"))
    df = read_warc(spark, str(d))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y",
                         "http://c.example/z"}
    assert bytes(rows["http://c.example/z"].html) == b"<html>third</html>"
    assert all(r.warc_type == "response" for r in rows.values())
