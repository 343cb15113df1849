"""Suggest module analogs over the term dictionary.

Semantics sources (behavior only):
  * DirectSpellChecker (suggest/src/java/.../spell/DirectSpellChecker.java) —
    candidate terms within max_edits of the input, ranked by (edit distance
    asc, docFreq desc, term asc).
  * Lookup/AnalyzingSuggester (suggest/src/java/.../Lookup.java,
    analyzing/AnalyzingSuggester.java) — weighted prefix completion: top-k
    completions of a prefix by weight desc. Lucene backs this with an FST
    built offline; here the postings table IS the weighted dictionary, and the
    prefix predicate prunes the scan (row-group term stats play the FST's
    'which block' role), so a completion touches only matching dictionary
    rows — no document data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spell_suggest", "prefix_completions", "infix_completions",
           "free_text_suggest"]


def prefix_completions(postings: DataFrame, prefix: str, k: int = 5) -> DataFrame:
    """Lookup.lookup(prefix) analog: top-k (term, weight) completions, weight =
    total term frequency across the index (the corpus-popularity weight an
    AnalyzingSuggester is typically built with), tie-broken by term asc."""
    prefix = prefix.lower()
    return (
        postings.where(F.col("term").startswith(prefix))
        .groupBy("term").agg(F.sum("ttf").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
        .select("term", F.col("weight").cast("long"))
    )


def spell_suggest(postings: DataFrame, term: str, max_edits: int = 2,
                  k: int = 5, min_len_band: bool = True) -> DataFrame:
    """Top-k correction candidates for `term`: (term, distance, df).

    `postings` is the engine's postings DataFrame (term, df per segment row);
    df is summed across segments (global docFreq, as DirectSpellChecker uses).
    The length-band prefilter (|len-len(term)| <= max_edits) prunes before the
    levenshtein — the same banding FuzzyQuery's automaton gives Lucene."""
    term = term.lower()
    td = postings.groupBy("term").agg(F.sum("df").alias("df"))
    if min_len_band:
        td = td.where(F.abs(F.length("term") - len(term)) <= max_edits)
    return (
        td.withColumn("distance", F.levenshtein(F.col("term"), F.lit(term)))
        .where(F.col("distance") <= max_edits)
        .where(F.col("term") != term)
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", F.col("distance").cast("long"), F.col("df").cast("long"))
    )


def infix_completions(suggestions: DataFrame, query: str, k: int = 5,
                      text_col: str = "suggestion",
                      weight_col: str = "weight") -> DataFrame:
    """AnalyzingInfixSuggester.lookup analog (suggest/src/java/.../analyzing/
    AnalyzingInfixSuggester.java): a suggestion matches when the query is a
    PREFIX of ANY analyzed token of the suggestion text (Lucene indexes the
    suggestions into an ancillary index and queries it with per-token
    PrefixQuery); results rank by weight desc, tie-broken by text asc.

    suggestions: (text_col, weight_col) weighted dictionary. The token-prefix
    predicate is a Catalyst higher-order EXISTS over the split tokens —
    JVM-side, no UDF; at scale the dictionary is a DataFrame like any other
    (Lucene's ancillary-index role played by the scan + predicate)."""
    q = query.lower()
    toks = F.split(F.lower(F.col(text_col)), " ")
    hit = F.exists(toks, lambda t: t.startswith(q))
    return (suggestions.where(hit)
            .orderBy(F.desc(weight_col), F.asc(text_col)).limit(k))


def free_text_suggest(postings: DataFrame, context: str, total_tokens: int,
                      k: int = 5, alpha: float = 0.4) -> DataFrame:
    """FreeTextSuggester analog (suggest/src/java/.../analyzing/
    FreeTextSuggester.java, bigram model): predict the next token after
    ``context`` with the stupid-backoff language model — bigram candidates
    score count(context, t)/count(context); tokens the bigram model never
    saw back off to ALPHA * count(t)/totTokens (ALPHA=0.4,
    FreeTextSuggester.java:143), each suffix taken from the highest-order
    model that saw it.

    Lucene feeds a ShingleFilter stream into an FST; here the SHINGLE
    index's postings ARE that model — unigram rows are the 1-gram counts,
    "w t" rows the 2-gram counts — so lookup is two pruned term-dictionary
    scans (term prefix pushdown), never a corpus pass. ``total_tokens`` is
    the searcher's sum_ttf (unigram token count, norm-consistent)."""
    from ..analysis.tokenizer import SHINGLE_FILLER

    context = context.lower()
    ctx_rows = (postings.where(F.col("term") == context)
                .agg(F.sum("ttf").alias("cnt")).collect())
    ctx_cnt = int(ctx_rows[0]["cnt"] or 0)
    big = (postings.where(F.col("term").startswith(context + " "))
           .groupBy("term").agg(F.sum("ttf").alias("cnt"))
           .withColumn("token", F.col("term").substr(
               F.lit(len(context) + 2), F.length("term")))
           .where(F.col("token") != SHINGLE_FILLER))
    if ctx_cnt > 0:
        big_scored = big.select(
            "token", (F.col("cnt") / F.lit(float(ctx_cnt))).alias("score"))
    else:
        big_scored = big.select("token", F.lit(0.0).alias("score")).limit(0)
    uni = (postings.where(~F.col("term").contains(" ")
                          & (F.col("term") != SHINGLE_FILLER))
           .groupBy("term").agg(F.sum("ttf").alias("cnt"))
           .join(big.select("token"),
                 F.col("term") == F.col("token"), "left_anti")
           .select(F.col("term").alias("token"),
                   (F.lit(alpha) * F.col("cnt")
                    / F.lit(float(total_tokens))).alias("score")))
    return (big_scored.unionByName(uni)
            .orderBy(F.desc("score"), F.asc("token")).limit(k))
