"""Collector-module analogs (SURVEY §2.5) as plain DataFrame compositions.

Lucene ships these as separate modules driven by collectors; on Spark they are
one-liners over the searcher's distributed match/score sets, which is the point
of the Spark-first design: once `matches_df` / `scores_df` exists, grouping,
faceting and distinct-values are Catalyst-planned aggregations (shuffle on the
group key, partial aggregation map-side, AQE-coalesced) rather than custom
collector trees.

Semantics sources (behavior only):
  grouping/src/java/.../TopGroupsCollector.java + demo
    LuceneDemo/src/main/java/lucene/grouping/GroupingSearchTest.java:26-90
    (two-pass grouped top-k -> window row_number over (group, score desc))
  facet/src/java/.../sortedset/SortedSetDocValuesFacetCounts.java
    (facet value counts over the match set -> groupBy(dim).count)
  demo lucene/grouping/DistinctValueCollectorTest.java (distinct field values)
  queries/src/java/.../mlt/MoreLikeThis.java (top tf-idf terms of a source doc
    become a disjunction query; idf = 1 + ln(N/(df+1)), MLT's classic-Similarity
    formula)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["top_docs_per_group", "facet_counts", "hierarchical_facet_counts",
           "distinct_values", "more_like_this_terms"]


def top_docs_per_group(scored: DataFrame, group_col: str, k: int,
                       id_col: str = "doc_id",
                       score_col: str = "score") -> DataFrame:
    """Top-k docs per group by (score desc, id asc) — the grouped-search analog.

    Scale: one shuffle on group_col; the window is rank-truncated so only k rows
    per group survive the exchange (Spark pushes the rank filter into the sort).
    """
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def facet_counts(matched: DataFrame, dim_col: str) -> DataFrame:
    """Per-dimension-value counts over a match set (SortedSetDocValues facets).

    Map-side partial aggregation makes this one narrow shuffle of (dim, count)
    partials regardless of match-set size."""
    return matched.groupBy(dim_col).agg(F.count("*").alias("cnt"))


def hierarchical_facet_counts(matched: DataFrame,
                              path_cols: list[str]) -> DataFrame:
    """Taxonomy facet counts over a dim/path hierarchy: one row per path
    prefix at every depth ('lang', 'lang/source', ...), the
    SortedSetDocValuesFacetCounts hierarchical-dim shape (FacetsConfig
    setHierarchical; demo facet/SortedSetDocValuesFacetsTest.java).

    Single pass: ROLLUP computes all prefix levels in one map-side partial
    aggregation (no per-level rescan), the exact scale shape a taxonomy count
    needs at 100 TB. Returns (path, depth, cnt)."""
    rolled = matched.rollup(*path_cols).agg(F.count("*").alias("cnt"))
    depth = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in path_cols)
    # ROLLUP emits prefix groups: depth d rows have the first d levels set
    return (rolled.withColumn("depth", depth.cast("long"))
            .where(F.col("depth") >= 1)
            .withColumn("path", F.concat_ws(
                "/", *[F.col(c) for c in path_cols]))
            .select("path", "depth", "cnt"))


def distinct_values(matched: DataFrame, col: str) -> DataFrame:
    """Distinct field values of the match set (DistinctValueCollector analog)."""
    return matched.select(col).distinct()


def more_like_this_terms(term_freqs: dict, global_df: dict, doc_count: int,
                         max_terms: int = 5) -> list:
    """Select the MLT query terms for one source document.

    term_freqs: {term: tf} of the source doc; global_df: {term: df} over the
    index; returns the top ``max_terms`` terms by tf * (1 + ln(N/(df+1))),
    tie-broken by term asc (deterministic). Mirrors MoreLikeThis.java's
    interestingness ranking with the classic-Similarity idf."""
    n = float(doc_count)
    scored = []
    for term, tf in term_freqs.items():
        df = global_df.get(term, 0)
        idf = 1.0 + math.log((n + 1.0) / (df + 1.0))
        scored.append((-(tf * idf), term))
    scored.sort()
    return [t for _, t in scored[:max_terms]]
