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

__all__ = ["function_score", "expression_sort"]


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
