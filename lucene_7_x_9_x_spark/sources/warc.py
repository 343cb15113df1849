"""WARC source: Common-Crawl-style web-archive ingestion to the corpus schema.

The engine's input table is (url, warc_ts, html, text, lang) per BASELINE's
input_hint; Common Crawl ships WARC files (ISO 28500: records of
"WARC/1.0\\r\\n" + headers + CRLFCRLF + payload + CRLFCRLF). This source reads
WARC files distributively — one file per task via Spark's binaryFile source,
record parsing inside mapInPandas (Arrow batches, no per-row JVM round trips)
— and emits `response` records as corpus rows.

Scale notes: Common Crawl WARCs are ~1 GB each and independently parseable, so
parallelism = file count (a crawl segment has tens of thousands). The binary
payload dominates row size; parse and project early, keep
spark.sql.execution.arrow.maxRecordsPerBatch bounded, and write the corpus
table partitioned before indexing. Gzip members (.warc.gz is a concatenation
of per-record gzip members) are handled transparently by zlib's multi-member
loop below.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["parse_warc_bytes", "read_warc", "WARC_SCHEMA"]

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.StringType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("source_file", T.StringType(), True),
])


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout)."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.write(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out.getvalue()


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record payload."""
    if payload[:5] == b"HTTP/":
        sep = payload.find(b"\r\n\r\n")
        return payload[sep + 4:] if sep >= 0 else b""
    return payload


def parse_warc_bytes(data: bytes, source_file: str = "") -> list[tuple]:
    """Parse one WARC file's bytes into (url, warc_ts, html, warc_type,
    source_file) tuples — response records carry the HTTP body as html."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        payload = data[body_start: body_start + length]
        wtype = headers.get("warc-type", "")
        if wtype == "response":
            rows.append((
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                _http_body(payload),
                wtype,
                source_file,
            ))
        pos = body_start + length
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: (url, warc_ts, html, warc_type, source_file).

    One task per WARC file (binaryFile source); parsing happens executor-side
    in Arrow batches. Join/convert warc_ts and extract text downstream (the
    frozen extractor in corpus.py for the synthetic corpus; a real deployment
    plugs its HTML-to-text function here)."""
    bin_df = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fp, content in zip(pdf["path"], pdf["content"]):
                out.extend(parse_warc_bytes(bytes(content), str(fp)))
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "warc_type",
                              "source_file"])

    return (bin_df.select("path", "content")
            .mapInPandas(gen, WARC_SCHEMA))
