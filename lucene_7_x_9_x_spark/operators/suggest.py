"""Spell suggestion over the term dictionary (suggest/spellcheck analog).

Semantics source (behavior only): lucene/suggest module's DirectSpellChecker —
candidate terms within max_edits of the input, ranked by (edit distance asc,
docFreq desc, term asc). The term dictionary here is the postings table, so
candidate generation is a partition-/rowgroup-pruned scan with a JVM-side
levenshtein filter — no document data is touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spell_suggest"]


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
