"""FunctionScoreQuery analog: re-score hits with a doc-value expression.

Semantics source (behavior only):
  queries/src/java/org/apache/lucene/queries/function/FunctionScoreQuery.java
  (score = DoubleValuesSource over the wrapped query's score + doc values;
  the boostByValue/boostByQuery factories compose multiplicatively).

Spark-first: the "DoubleValuesSource" is a Catalyst column expression over
the scored match set joined with per-doc features — whole-stage-codegen
JVM-side evaluation, no UDF. At 100 TB the join is keyed on the doc id and
AQE-sized; the expression itself adds zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["function_score", "expression_sort", "feature_field_score"]


def feature_field_score(scores: DataFrame, features: DataFrame,
                        feature_col: str, fn: str = "saturation",
                        weight: float = 1.0, pivot: float = 1.0,
                        exp: float = 1.0, scaling: float = 1.0,
                        key_cols: tuple = ("doc_id",)) -> DataFrame:
    """FeatureField analog (core 8.x: document/FeatureField.java — static
    per-doc relevance signals like pagerank/url-length folded into the
    score; newLogQuery / newSaturationQuery / newSigmoidQuery:

        log:        weight * ln(scaling + S)
        saturation: weight * S / (S + pivot)
        sigmoid:    weight * S^exp / (S^exp + pivot^exp)

    Lucene stores S in the term frequency of a synthetic "feature" term and
    adds the feature query as a SHOULD clause; here S is a per-doc numeric
    column and the SHOULD-sum is the join-add below (docs missing the
    feature contribute 0 — a left join, matching SHOULD semantics). The
    monotone functions keep block-max pruning sound in the reference; here
    the whole expression is whole-stage codegen over the joined columns."""
    s = F.col(feature_col).cast("double")
    if fn == "log":
        contrib = F.lit(weight) * F.log(F.lit(scaling) + s)
    elif fn == "saturation":
        contrib = F.lit(weight) * s / (s + F.lit(pivot))
    elif fn == "sigmoid":
        num = F.pow(s, F.lit(exp))
        contrib = F.lit(weight) * num / (num + F.lit(pivot ** exp))
    else:
        raise ValueError(f"unknown feature function {fn!r}")
    return (scores.join(features.select(*key_cols, feature_col),
                        list(key_cols), "left")
            .withColumn("score",
                        F.col("score") + F.coalesce(contrib, F.lit(0.0)))
            .drop(feature_col))


def function_score(scores: DataFrame, features: DataFrame, expr: str,
                   key_cols: tuple = ("doc_id",)) -> DataFrame:
    """Re-score: new score = `expr` over the base `score` column and any
    feature column (e.g. "score * ln(1 + n_chars)" — boostByValue shape).
    Docs missing from `features` drop out (inner join), matching
    FunctionScoreQuery's requirement that the values source advances."""
    return (scores.join(features, list(key_cols))
            .withColumn("score", F.expr(expr)))


def expression_sort(scores: DataFrame, features: DataFrame, expr: str, k: int,
                    key_cols: tuple = ("doc_id",),
                    id_col: str = "doc_id") -> DataFrame:
    """Expressions-module analog (expressions/src/java/org/apache/lucene/
    expressions/Expression.java getSortField + js/JavascriptCompiler): compile
    an arithmetic expression over `_score` and doc-value bindings into a
    SortField and take the top k.

    The "compiled expression" is a Catalyst expression string referencing the
    base `score` column and any feature column — parsed, codegen'd and
    whole-stage-compiled by Spark (the JVM bytecode role JavascriptCompiler
    plays). Sort is (expression desc, id asc), executed as a
    TakeOrderedAndProject: per-partition partial top-k, k rows to the driver."""
    joined = (scores.join(features, list(key_cols))
              .withColumn("sort_value", F.expr(expr)))
    return joined.orderBy(F.desc("sort_value"), F.asc(id_col)).limit(k)
