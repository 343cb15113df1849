"""Web-text curation operators for training-data pipelines.

The four operators here are the standard Common-Crawl curation stages that sit
between raw WARC extraction (sources/warc.py) and indexing/dedup
(pipeline/dedup.py):

- ``line_dedup``          — corpus-wide line-level deduplication (CCNet-style):
                            drop lines that occur in >= ``min_docs`` distinct
                            documents (boilerplate: nav bars, cookie banners).
- ``repetition_signals``  — Gopher-style within-document repetition + quality
                            signals (duplicate-line fractions, top-2-gram
                            character fraction, symbol ratio, alpha-word frac).
- ``pii_redact``          — regex PII scrubbing (emails, IPv4, phone-ish),
                            with per-document match counts.
- ``canonicalize_urls``   — URL canonicalization + per-host aggregation
                            (scheme/host lowercasing, www./default-port/utm
                            stripping) for host-level dedup and skew analysis.

Scale design: everything is built-in ``pyspark.sql.functions`` (whole-stage
codegen, zero Python in the hot path). The only shuffles are the line-count
aggregation and its join back in ``line_dedup`` — both keyed on a 64-bit line
hash, never on raw line text, so shuffle width stays bounded at 100 TB.
``repetition_signals`` / ``pii_redact`` / URL canonicalization are pure map
stages (no shuffle at all until the final per-host agg).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["line_dedup", "repetition_signals", "pii_redact",
           "canonicalize_urls", "EMAIL_RE", "IPV4_RE", "PHONE_RE"]


# ---------------------------------------------------------------------------
# line-level dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------

def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_docs: int = 2,
               line_sep: str = "\n") -> DataFrame:
    """Remove lines that appear in >= ``min_docs`` distinct documents.

    CCNet / RefinedWeb-style: a line repeated across many pages is almost
    always boilerplate (navigation, cookie banners, footers), not content.

    Returns one row per input document:
      (id, n_lines, n_dup_lines, clean_text)  — ``clean_text`` is the document
    with duplicated lines removed, original line order preserved.

    Plan shape (100 TB): posexplode -> groupBy(xxhash64(line)) with map-side
    partial aggregation -> hash-join back on the 8-byte key -> per-doc re-agg.
    Raw line strings never become a shuffle key; distinct-doc counting uses
    the (line_hash, doc) pre-aggregation rather than count_distinct so the
    combiner stays map-side.
    """
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), line_sep))
        .alias("_pos", "_line"),
    ).withColumn("_lh", F.xxhash64("_line"))
    # distinct-doc counts per line hash; (lh, id) dedup first keeps the
    # expensive count a plain count() with map-side combine
    counts = (lines.select("_lh", "_id").distinct()
              .groupBy("_lh").agg(F.count("*").alias("_ndocs")))
    flagged = lines.join(counts, "_lh").withColumn(
        "_dup", F.col("_ndocs") >= F.lit(min_docs))
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("_dup"), F.struct("_pos", "_line"))))
    return (flagged.groupBy("_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("_dup").cast("long")).alias("n_dup_lines"),
                 F.array_join(F.transform(kept, lambda s: s["_line"]),
                              line_sep).alias("clean_text"))
            .withColumnRenamed("_id", id_col))


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality signals
# ---------------------------------------------------------------------------

# cap the gram stream per doc — repetition shows up well within the cap, and
# it bounds per-row UDF cost on pathological documents
_MAX_GRAMS = 2048

_REP_SCHEMA = ("dup_line_frac double, dup_line_char_frac double, "
               "top_2gram_char_frac double, symbol_word_ratio double, "
               "alpha_word_frac double")


def _repetition_batch_fn(line_sep: str):
    """Per-batch signal computation (see repetition_signals for definitions).

    All arithmetic is float64 in the same operation order as the DuckDB
    oracle, so values are bit-identical cross-engine before the final
    HALF_UP round (applied JVM-side by the caller). Python ``split()``
    matches the oracle's ``\\s+`` split; ``str.count`` and the oracle's
    replace-length-delta both count non-overlapping occurrences.
    """

    def batch(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            t = t or ""
            lines = t.split(line_sep)
            uniq = set(lines)
            n_lines, n_dist = len(lines), len(uniq)
            line_chars = sum(len(x) for x in lines)
            dist_chars = sum(len(x) for x in uniq)
            toks = t.lower().split()
            n_toks = len(toks)
            if n_toks >= 2:
                grams = [toks[i] + " " + toks[i + 1]
                         for i in range(n_toks - 1)][:_MAX_GRAMS]
                counts: dict = {}
                for g in grams:
                    counts[g] = counts.get(g, 0) + 1
                cnt, gram = max((n, g) for g, n in counts.items())
                stream = len(" ".join(toks))
                top = cnt * len(gram) / stream if stream else 0.0
            else:
                top = 0.0
            symbol = ((t.count("#") + t.count("...")) / n_toks
                      if n_toks else 0.0)
            alpha = (sum(1 for w in toks
                         if any("a" <= c <= "z" for c in w)) / n_toks
                     if n_toks else 0.0)
            rows.append((
                (n_lines - n_dist) / n_lines if n_lines else 0.0,
                ((line_chars - dist_chars) / line_chars
                 if line_chars else 0.0),
                top, symbol, alpha))
        return pd.DataFrame(rows, columns=[
            "dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
            "symbol_word_ratio", "alpha_word_frac"])

    return batch


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       line_sep: str = "\n") -> DataFrame:
    """Within-document repetition + quality signals (Gopher §A1.1 flavor):

      dup_line_frac       — (n_lines - n_distinct_lines) / n_lines
      dup_line_char_frac  — chars in repeated line occurrences / total line chars
      top_2gram_char_frac — chars covered by the most frequent word 2-gram
                            (count * len(gram)) / chars of the token stream;
                            ties break to the lexicographically larger gram
      symbol_word_ratio   — ('#' + '...' occurrences) / n_words
      alpha_word_frac     — fraction of words containing an ASCII letter

    One Arrow-batched pandas UDF computes all five signals in a single O(doc)
    pass — map-only, no shuffle, one text transfer per row. A pure-expression
    formulation was measured ~10x slower: higher-order array functions are
    excluded from whole-stage codegen AND common-subexpression elimination,
    so every signal re-evaluates the tokenize/split interpreted per element.
    The final 4-decimal round runs JVM-side (F.round HALF_UP) so rounding
    semantics match the rest of the pipeline.
    """
    struct_udf = F.pandas_udf(_repetition_batch_fn(line_sep), _REP_SCHEMA)
    s = struct_udf(F.col(text_col)).alias("_s")
    picked = docs.select(F.col(id_col), s)
    return picked.select(
        F.col(id_col),
        *[F.round(F.col("_s")[f], 4).alias(f)
          for f in ["dup_line_frac", "dup_line_char_frac",
                    "top_2gram_char_frac", "symbol_word_ratio",
                    "alpha_word_frac"]])


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB oracle): char classes, bounded repeats, \b, \d.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3,4}-\d{4}\b"


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone-shaped numbers; count matches.

    Order matters and is fixed: emails first (an email never contains an IP
    thanks to the TLD tail, but a dotted-quad could otherwise eat an email's
    host), then IPs, then phones. Returns
    (id, n_emails, n_ips, n_phones, clean_text). Map-only stage.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t2, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        t3.alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + host stats
# ---------------------------------------------------------------------------

def canonicalize_urls(docs: DataFrame, url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """Canonicalize URLs and aggregate per host.

    Canonical form: scheme+host lowercased, ``www.`` prefix dropped, default
    ports (:80, :443) dropped, fragment dropped, ``utm_*`` query params
    dropped (empty ``?`` removed), trailing slash trimmed (path only).
    Returns per-host (host, n_docs, n_distinct_urls) plus the canonical URL
    per doc is exposed via ``canonical_url_col`` on the intermediate — use
    ``canonical_url`` for the per-doc frame.
    """
    return canonical_url(docs, url_col, id_col).groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("canonical_url").alias("n_distinct_urls"),
    )


def canonical_url(docs: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc canonical URL + host (see canonicalize_urls for the rules)."""
    u0 = F.col(url_col)
    # split once: scheme://authority(/pathquery)?  — lowercase scheme+authority
    scheme = F.lower(F.regexp_extract(u0, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u0, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u0, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.regexp_replace(auth, r":(80|443)$", "")
    # strip utm_* params: capture the separator and re-emit it (lookbehind-free
    # so the DuckDB oracle's RE2 runs the identical pattern). One global pass
    # removes alternate members of a consecutive utm run (the separator char is
    # consumed by the previous match), so apply twice — handles any realistic
    # run; then drop a dangling '?'/'&'.
    _UTM = r"([?&])utm_[A-Za-z0-9_]*=[^&#]*&?"
    rest = F.regexp_replace(rest, _UTM, "$1")
    rest = F.regexp_replace(rest, _UTM, "$1")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # trailing slash on a pure path (no query): ^([^?]*)/$ only matches when
    # the whole remainder is query-free
    rest = F.regexp_replace(rest, r"^([^?]*)/$", "$1")
    canon = F.concat(scheme, F.lit("://"), auth, rest)
    return docs.select(F.col(id_col), auth.alias("host"),
                       canon.alias("canonical_url"))
