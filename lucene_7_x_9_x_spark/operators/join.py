"""Query-time join with score propagation — JoinUtil ScoreMode analog.

Reference behavior (no code copied):
  join/src/java/org/apache/lucene/search/join/JoinUtil.java (createJoinQuery)
  join/src/java/.../join/GlobalOrdinalsWithScoreQuery.java and
  GlobalOrdinalsWithScoreCollector.java (Max/Sum(Total)/Avg/Min accumulators)
  demo: LuceneDemo/src/main/java/lucene/join/JoinTest.java

Semantics: run ``from_query`` on the "from" side, aggregate the matching
docs' scores PER JOIN VALUE with the chosen ScoreMode, then every "to" doc
whose join value is in the set scores the aggregated value. ScoreMode.None
keeps the join a constant-score filter (score 1.0).

Scale shape: one shuffle to aggregate per join value (map-side partial agg —
Lucene's global-ordinals collector is the same per-value accumulation), one
join against the "to" side; no driver materialization. AQE sizes the join
(broadcast when the aggregated value set is small, the common case — the
GlobalOrdinals cardinality is |distinct join values|, not |docs|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCORE_MODES", "join_with_score_mode", "to_parent_block_join"]

SCORE_MODES = {
    "max": F.max,
    "total": F.sum,   # ScoreMode.Total
    "avg": F.avg,
    "min": F.min,
    "none": None,     # constant-score join
}


def join_with_score_mode(from_scores: DataFrame, from_values: DataFrame,
                         to_values: DataFrame, mode: str = "max",
                         score_col: str = "score",
                         value_col: str = "value",
                         key_col: str = "doc_id") -> DataFrame:
    """(to ``key_col``, score) for every "to" doc whose join value appears
    among the scored "from" matches.

    from_scores: (key_col, score_col) — the from-side query's scored matches.
    from_values: (key_col, value_col) — join value per from doc.
    to_values:   (key_col, value_col) — join value per to doc.
    """
    if mode not in SCORE_MODES:
        raise ValueError(f"unknown ScoreMode {mode!r}; have {sorted(SCORE_MODES)}")
    joined = from_scores.join(from_values, key_col)
    agg_fn = SCORE_MODES[mode]
    if agg_fn is None:
        per_value = (joined.select(value_col).distinct()
                     .withColumn("join_score", F.lit(1.0)))
    else:
        per_value = joined.groupBy(value_col).agg(
            agg_fn(score_col).alias("join_score"))
    return (to_values.join(per_value, value_col)
            .select(key_col, F.col("join_score").alias("score")))


def to_parent_block_join(child_scores: DataFrame, child_parent: DataFrame,
                         parents: DataFrame, mode: str = "max",
                         score_col: str = "score",
                         child_col: str = "child_id",
                         parent_col: str = "parent_id") -> DataFrame:
    """ToParentBlockJoinQuery analog (join/src/java/.../join/
    ToParentBlockJoinQuery.java; BlockJoinScorer.setScoreAndFreq aggregates
    child scores per parent with the same ScoreMode set as JoinUtil).

    Lucene encodes parent/child as doc-id-adjacent index blocks plus a parent
    BitSet; the relational analog carries the parent key on each child row —
    block adjacency is a locality encoding, not semantics. A parent matches
    iff >= 1 child matched; its score is the ScoreMode aggregate of its
    matching children's scores (ScoreMode.None -> 1.0).

    child_scores: (child_col, score_col) — the child query's scored matches.
    child_parent: (child_col, parent_col) — parent key per child.
    parents:      (parent_col,) — parent universe (inner join keeps only
                  parents with >= 1 matching child).

    Scale: identical shape to join_with_score_mode — one map-side-combined
    aggregation shuffle on parent_col, one AQE-sized join; never all-pairs.
    """
    if mode not in SCORE_MODES:
        raise ValueError(
            f"unknown ScoreMode {mode!r}; have {sorted(SCORE_MODES)}")
    joined = child_scores.join(child_parent, child_col)
    agg_fn = SCORE_MODES[mode]
    if agg_fn is None:
        per_parent = (joined.select(parent_col).distinct()
                      .withColumn("score", F.lit(1.0)))
    else:
        per_parent = joined.groupBy(parent_col).agg(
            agg_fn(score_col).alias("score"))
    return parents.select(parent_col).distinct().join(per_parent, parent_col)
