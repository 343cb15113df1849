"""Web-text curation operators (pipeline/webtext.py): CCNet-style line dedup,
Gopher-style repetition signals, PII redaction, URL canonicalization.

Semantics pinned by hand-built micro-corpora; corpus-scale DuckDB parity is
covered by the `line_dedup` / `repetition_signals` / `pii_redact` /
`url_host_stats` contract entries (scripts/check_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline import webtext as W


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_line_dedup_removes_cross_doc_lines(spark):
    docs = _df(spark, [
        (0, "alpha beta\ncookie banner\ngamma delta"),
        (1, "cookie banner\nunique line one"),
        (2, "cookie banner\ncookie banner\nsolo text here"),
        (3, "no dups at all"),
    ])
    out = {r.doc_id: r for r in W.line_dedup(docs).collect()}
    assert out[0].clean_text == "alpha beta\ngamma delta"
    assert out[1].clean_text == "unique line one"
    # within-doc repeats count once per doc for the cross-doc df, but every
    # occurrence of a corpus-duplicated line is removed
    assert out[2].clean_text == "solo text here"
    assert out[2].n_dup_lines == 2
    assert out[3].clean_text == "no dups at all" and out[3].n_dup_lines == 0


def test_line_dedup_min_docs_threshold(spark):
    docs = _df(spark, [(0, "x\ny"), (1, "x\nz"), (2, "x\nw")])
    out3 = {r.doc_id: r.n_dup_lines
            for r in W.line_dedup(docs, min_docs=4).collect()}
    assert out3 == {0: 0, 1: 0, 2: 0}  # threshold not met -> nothing removed
    out2 = {r.doc_id: r.clean_text
            for r in W.line_dedup(docs, min_docs=3).collect()}
    assert out2 == {0: "y", 1: "z", 2: "w"}


def test_line_dedup_all_dup_doc_yields_empty(spark):
    docs = _df(spark, [(0, "same"), (1, "same")])
    out = {r.doc_id: r for r in W.line_dedup(docs).collect()}
    assert out[0].clean_text == "" and out[0].n_dup_lines == 1


def test_repetition_signals_values(spark):
    docs = _df(spark, [
        (0, "cookie banner\ncookie banner\nsolo text here"),
        (1, "no dups at all"),
        (2, "spam spam spam spam"),
        (3, ""),
    ])
    out = {r.doc_id: r for r in W.repetition_signals(docs).collect()}
    assert out[0].dup_line_frac == pytest.approx(1 / 3, abs=1e-4)
    assert out[0].dup_line_char_frac == pytest.approx(13 / 40, abs=1e-4)
    # "no dups at all": top 2-gram ties at count 1 -> lexicographically
    # largest ("no dups", 7 chars) over 14 token-stream chars
    assert out[1].top_2gram_char_frac == pytest.approx(0.5, abs=1e-4)
    # "spam spam" occurs 3x, 9 chars, stream 19 chars
    assert out[2].top_2gram_char_frac == pytest.approx(27 / 19, abs=1e-4)
    assert out[3].dup_line_frac == 0.0 and out[3].top_2gram_char_frac == 0.0


def test_repetition_symbol_and_alpha(spark):
    docs = _df(spark, [(0, "## see more... x2 42 9000")])
    r = W.repetition_signals(docs).collect()[0]
    # 2 '#' + 1 '...' over 6 words
    assert r.symbol_word_ratio == pytest.approx(3 / 6, abs=1e-4)
    # words with an ascii letter: '##' no, 'see' yes, 'more...' yes, 'x2' yes,
    # '42' no, '9000' no
    assert r.alpha_word_frac == pytest.approx(3 / 6, abs=1e-4)


def test_pii_redact_counts_and_order(spark):
    docs = _df(spark, [
        (0, "mail bob@x.com or alice@sub.domain.org now"),
        (1, "ip 10.0.0.1 and 255.255.255.255 tel 555-010-1234"),
        (2, "tricky bob@10.0.0.1234.com stays an email"),
        (3, "nothing to scrub"),
    ])
    out = {r.doc_id: r for r in W.pii_redact(docs).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 0, 0)
    assert out[0].clean_text == "mail <EMAIL> or <EMAIL> now"
    assert (out[1].n_ips, out[1].n_phones) == (2, 1)
    assert out[1].clean_text == "ip <IP> and <IP> tel <PHONE>"
    # email pattern runs first, so the host is consumed before the IP pass
    assert out[2].n_emails == 1 and out[2].n_ips == 0
    assert out[3].clean_text == "nothing to scrub"


def test_canonical_url_rules(spark):
    urls = _df(spark, [
        (0, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=1"),
        (1, "http://example.com/a/b?id=1&utm_medium=y"),
        (2, "https://example.com:80/c/"),
        (3, "https://other.net/#frag"),
        (4, "https://example.com/p?utm_source=a&utm_term=b"),
        (5, "https://example.com:8080/keepport"),
        (6, "https://example.com/q?utm_a=1&utm_b=2&utm_c=3&id=4"),
    ], schema="doc_id long, url string")
    out = {r.doc_id: r for r in W.canonical_url(urls).collect()}
    assert out[0].canonical_url == "https://example.com/a/b/?id=1"
    assert out[1].canonical_url == "http://example.com/a/b?id=1"
    assert out[2].canonical_url == "https://example.com/c"
    assert out[3].canonical_url == "https://other.net"
    assert out[4].canonical_url == "https://example.com/p"
    assert out[5].host == "example.com:8080"  # non-default port kept
    assert out[6].canonical_url == "https://example.com/q?id=4"
    hosts = {r.host: r for r in W.canonicalize_urls(urls).collect()}
    assert hosts["example.com"].n_docs == 5
    assert hosts["example.com"].n_distinct_urls == 5
    assert hosts["example.com:8080"].n_docs == 1
