"""Deterministic synthetic Common-Crawl-style corpus + byte-identical HTML extractor.

Input shape per BASELINE.json input_hint: (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). One row = one web page = one Lucene
Document (solr-8.4.0/.../document/Document.java:42-44).

Generation is per-row deterministic (seeded by the global row index), so the same
corpus is produced regardless of partitioning or cluster size — the property that
makes the two-parallelism scaling runs comparable and builds resumable.

Text shapes per FIXTURES.md: Zipf vocabulary (~50k terms) including the 33 canonical
English stopwords at natural high frequency (creates the stopword skew the salted
term shuffle must absorb), log-normal doc lengths 5..5000, plus pinned edge docs
(empty / single-token / >255-char token / mixed case / CJK / freq-saturated /
duplicate pair for tie-break tests).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["CORPUS_SCHEMA", "generate_corpus", "extract_text", "make_html"]

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_BASE_TS = _dt.datetime(2025, 1, 1)

# ~50k-term vocabulary: 33 stopwords + base word list crossed with numeric suffixes.
_STOPWORDS33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)
_BASEWORDS = (
    "spark index lucene query search term doc segment merge score rank text web "
    "page crawl data table row column block posting freq norm field token write "
    "read shuffle partition salt skew batch stream join group sort limit filter "
    "count sum avg hash tree list heap stack graph node edge path walk run jump "
    "fast slow big small red blue green light dark high low open close north "
    "south east west alpha beta gamma delta".split()
)


def _vocab_term(idx: int) -> str:
    """Deterministic term for vocabulary slot idx (0-based, after stopwords)."""
    base = _BASEWORDS[idx % len(_BASEWORDS)]
    return base if idx < len(_BASEWORDS) else f"{base}{idx // len(_BASEWORDS)}"


def _doc_text(i: int, seed: int, vocab_size: int) -> str:
    # pinned edge docs (FIXTURES.md §1)
    if i == 0:
        return ""
    if i == 1:
        return "singleton"
    if i == 2:
        return "zz" + ("q" * 300) + " trailing words here"
    if i == 3:
        return "MiXeD CaSe Words AND digits 42 7 1999 ALPHA"
    if i == 4:
        return "中文 分词 测试 text mixed 漢字"
    if i == 5:
        return " ".join(["saturate"] * 1200) + " rareanchor"
    if i in (6, 7):
        return "twin document identical text for tie break checks"
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    length = int(np.clip(rng.lognormal(mean=4.2, sigma=1.0), 5, 5000))
    n_stop = int(length * 0.35)
    stop_ids = rng.integers(0, len(_STOPWORDS33), n_stop)
    zipf = rng.zipf(1.3, length - n_stop)
    content_ids = np.minimum(zipf - 1, vocab_size - 1)
    words = [_STOPWORDS33[j] for j in stop_ids] + [
        _vocab_term(int(j)) for j in content_ids
    ]
    order = rng.permutation(len(words))
    return " ".join(words[k] for k in order)


def make_html(text: str, title: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")


def extract_text(html_series: pd.Series) -> pd.Series:
    """Byte-identical text extraction from the corpus html (per-row invariant,
    BASELINE.json input_hint). Pure + deterministic; frozen by golden tests."""

    def one(h) -> str:
        s = bytes(h).decode("utf-8")
        start = s.index("<p>") + 3
        end = s.rindex("</p>")
        return s[start:end]

    return html_series.map(one)


def _gen_partition(indices: np.ndarray, seed: int, vocab_size: int) -> pd.DataFrame:
    langs = np.array(["en", "en", "en", "en", "en", "en", "zh", "de", "fr", "es"])
    rows = []
    for i in indices:
        i = int(i)
        text = _doc_text(i, seed, vocab_size)
        title = " ".join(text.split(" ")[:5])
        rows.append(
            {
                "url": f"https://site{i % 977}.example/p/{i:012d}",
                "warc_ts": _BASE_TS + _dt.timedelta(seconds=i),
                "html": make_html(text, title),
                "text": text,
                "lang": str(langs[i % len(langs)]),
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, vocab_size: int = 50_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: same rows for any partitioning."""
    num_partitions = num_partitions or max(1, n_docs // 5000)
    base = spark.range(0, n_docs, 1, num_partitions)

    def gen(iterator):
        for pdf in iterator:
            yield _gen_partition(pdf["id"].values, seed, vocab_size)

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)
