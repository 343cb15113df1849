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

__all__ = ["spell_suggest", "prefix_completions", "infix_completions"]


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
