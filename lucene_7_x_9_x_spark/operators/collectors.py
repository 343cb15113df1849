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
           "distinct_values", "more_like_this_terms", "drill_sideways",
           "range_facet_counts", "diversity_top_k",
           "sorted_set_facet_counts", "grouping_search"]


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


def diversity_top_k(scored: DataFrame, key_col: str, k: int, per_key: int,
                    id_col: str = "doc_id",
                    score_col: str = "score") -> DataFrame:
    """DiversityCollector analog (demo lucene/collector/DiversityCollector
    .java): global top-k by (score desc, id asc) keeping at most `per_key`
    hits that share a key value (e.g. at most 2 results per site).

    The collector's greedy by-score acceptance equals: a doc survives iff
    fewer than per_key higher-ranked docs share its key — i.e. per-key rank
    <= per_key, then global top-k. Scale: one shuffle on key_col with the
    rank filter pushed into the window sort (at most per_key rows per key
    survive), then a k-row TakeOrderedAndProject (partial top-k per
    partition, k rows to the driver)."""
    w = Window.partitionBy(key_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (scored.withColumn("_dr", F.row_number().over(w))
            .where(F.col("_dr") <= per_key).drop("_dr")
            .orderBy(F.desc(score_col), F.asc(id_col)).limit(k))


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


def distinct_values_per_group(matched: DataFrame, group_col: str,
                              value_col: str) -> DataFrame:
    """Per-group distinct value sets — the grouping module's
    DistinctValuesCollector (demo lucene/grouping/DistinctValueCollectorTest
    .java): for each group head, the set of distinct COUNT_FIELD values among
    the group's matching docs, where a doc missing the field contributes a
    NULL entry (GroupCount.uniqueValues holds null for such docs).

    One row per (group, value); a NULL value row marks the missing-field
    entry. Single partial-agg (map-side-combined distinct) shuffle — no
    per-group fan-in anywhere, safe at any group cardinality."""
    return matched.select(group_col, value_col).distinct()


def sorted_set_facet_counts(matched: DataFrame, array_col: str) -> DataFrame:
    """Multi-valued (SortedSetDocValues) facet counts: each doc contributes
    once per DISTINCT value in its array column — SortedSetDocValuesFacetCounts
    counts set-valued ords per doc, not repeated occurrences (facet/sortedset/
    SortedSetDocValuesFacetCounts.java; demos SortedSetDocValuesFacetsTest.java
    / StringValueFacetTest.java / TestSortedSetDocValuesCount.java).

    Scale: explode of the (usually short) per-doc value set, then one
    (value, count) partial-agg shuffle — no per-value rescan of the match set."""
    return (matched
            .select(F.explode(F.array_distinct(F.col(array_col)))
                    .alias("value"))
            .groupBy("value").agg(F.count("*").alias("cnt")))


def grouping_search(scored: DataFrame, group_col: str, n_groups: int,
                    docs_per_group: int, id_col: str = "doc_id",
                    score_col: str = "score") -> DataFrame:
    """GroupingSearch full shape (grouping module TopGroupsCollector +
    AllGroupsCollector; demo lucene/grouping/GroupingSearchTest.java): the
    top ``n_groups`` groups ordered by their head (best-doc) score, each with
    its top ``docs_per_group`` docs, each row also carrying the group's total
    hit count and the collection-wide total group count
    (GroupingSearch.setAllGroups(true)).

    One shuffle on group_col computes within-group ranks, per-group size and
    head score in a single window pass; the total-group-count is a broadcast
    one-row cross join (AllGroupsCollector's distinct-count). Returns
    (group, doc ids..., rnk, group_size, total_groups) ordered by
    (head score desc, group asc, rnk)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    wg = Window.partitionBy(group_col)
    ranked = (scored
              .withColumn("rnk", F.row_number().over(w))
              .withColumn("group_size", F.count("*").over(wg))
              .withColumn("head_score", F.max(score_col).over(wg))
              .where(F.col("rnk") <= docs_per_group))
    total = scored.select(
        F.countDistinct(group_col).alias("total_groups"))
    heads = (ranked.where(F.col("rnk") == 1)
             .orderBy(F.desc("head_score"), F.asc(group_col))
             .limit(n_groups).select(group_col))
    return (ranked.join(heads, group_col)
            .crossJoin(F.broadcast(total))
            .orderBy(F.desc("head_score"), F.asc(group_col), F.asc("rnk")))


def drill_sideways(matched: DataFrame, drill_downs: dict) -> DataFrame:
    """DrillSideways counts (facet/src/java/.../DrillSideways.java; demo
    facet examples): for each drilled dimension, facet counts over the docs
    that match the base query AND every OTHER dimension's drill-down — so the
    UI can show what the counts of dim d would be if d's own filter were
    lifted (DrillSidewaysQuery's near-miss collection).

    drill_downs: {dim_col: value}. Returns (dim, value, cnt) across all
    drilled dims; the dim's own filter is excluded from its rows.

    Scale: ONE pass over the match set — each doc is exploded only into the
    dims whose sideways predicate it satisfies (near-miss docs fail exactly
    one filter and contribute to exactly that dim; full matches contribute to
    all), then one (dim, value) partial-agg shuffle. No per-dimension rescan,
    which is what DrillSideways' single DrillSidewaysScorer pass achieves."""
    dims = list(drill_downs)
    flags = {d: (F.col(d) == F.lit(v)).cast("int")
             for d, v in drill_downs.items()}
    total = sum(flags.values())
    contrib = F.array_compact(F.array(*[
        # doc counts toward dim d iff all OTHER filters pass: either a full
        # match (total == n) or a near-miss failing exactly d
        F.when((total - flags[d]) == len(dims) - 1,
               F.struct(F.lit(d).alias("dim"),
                        F.col(d).cast("string").alias("value")))
        for d in dims
    ]))
    return (matched.select(F.explode(contrib).alias("c"))
            .groupBy(F.col("c.dim").alias("dim"),
                     F.col("c.value").alias("value"))
            .agg(F.count("*").alias("cnt")))


def range_facet_counts(matched: DataFrame, col: str,
                       ranges: list[tuple]) -> DataFrame:
    """LongRangeFacetCounts analog (facet/range/LongRangeFacetCounts.java,
    LongRange.java): count matches per labelled [min, max] range. Ranges MAY
    overlap (Lucene allows it), so this is one aggregation of conditional
    sums — a single map-side-combined pass, not a groupBy on a bucket id.

    ranges: (label, min_incl, max_incl) triples over a long column."""
    aggs = [
        F.sum(F.when((F.col(col) >= lo) & (F.col(col) <= hi), 1)
              .otherwise(0)).alias(f"_r{i}")
        for i, (_, lo, hi) in enumerate(ranges)
    ]
    row = matched.agg(*aggs)
    pairs = ", ".join(f"'{label}', _r{i}"
                      for i, (label, _, _) in enumerate(ranges))
    return row.selectExpr(
        f"stack({len(ranges)}, {pairs}) AS (label, cnt)")


def association_facet_sums(matched: DataFrame, cat_col: str,
                           int_col: str | None = None,
                           float_col: str | None = None) -> DataFrame:
    """TaxonomyFacetSumIntAssociations / TaxonomyFacetSumFloatAssociations
    (demo AssociationsFacetsExample.java): per-category SUM of each matching
    doc's association value(s) — the int and float association channels of
    the demo's 'tags'/'genre' facets. One partial-agg (map-side-combined)
    shuffle on the category; both channels ride the same pass."""
    if not int_col and not float_col:
        raise ValueError("need at least one of int_col/float_col")
    aggs = []
    if int_col:
        aggs.append(F.sum(int_col).cast("long").alias(f"sum_{int_col}"))
    if float_col:
        aggs.append(F.sum(float_col).alias(f"sum_{float_col}"))
    return matched.groupBy(cat_col).agg(*aggs)


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
