"""RangeField queries: IntRange/DoubleRange relation queries (SURVEY §2.3).

Semantics source (behavior only): o.a.l/document/RangeFieldQuery.java:77-230
(QueryType.INTERSECTS / WITHIN / CONTAINS / CROSSES per-dimension matches) and
o.a.l/document/IntRange.java (newIntersectsQuery / newWithinQuery /
newContainsQuery / newCrossesQuery; demo LuceneDemo8.4.0/.../rangeField/
IntRangeTest.java asserts intersects over 2-dim ranges).

Lucene stores an N-dim range as a 2N-dim BKD point (min then max per dim) and
evaluates the relation per leaf. On Spark a range field is 2N plain numeric
columns (doc_min_i, doc_max_i); each relation is a pure Catalyst conjunction
over those columns, so parquet min-max row-group pruning plays the BKD role
exactly as it does for PointRangeQuery (SURVEY §2.3). A doc matches when the
per-dim predicate holds on EVERY dimension (RangeFieldQuery.java:232-238);
CROSSES = INTERSECTS && !WITHIN evaluated over all dims jointly
(RangeFieldQuery.java:208-210), not per-dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_relation_predicate", "range_query", "RELATIONS"]

RELATIONS = ("intersects", "within", "contains", "crosses")


def _per_dim(relation: str, dims) -> Column:
    """AND of the per-dimension relation predicate over every dimension.

    dims: iterable of (doc_min_col, doc_max_col, query_min, query_max).
    """
    pred = F.lit(True)
    for min_col, max_col, q_min, q_max in dims:
        lo, hi = F.col(min_col), F.col(max_col)
        q_lo, q_hi = F.lit(q_min), F.lit(q_max)
        if relation == "intersects":
            # RangeFieldQuery.java:99-101: minOfs <= qMax && maxOfs >= qMin
            d = (lo <= q_hi) & (hi >= q_lo)
        elif relation == "within":
            # :132-134: doc range inside the query range
            d = (lo >= q_lo) & (hi <= q_hi)
        elif relation == "contains":
            # :165-167: doc range encloses the query range
            d = (lo <= q_lo) & (hi >= q_hi)
        else:
            raise ValueError(f"unknown relation {relation!r}")
        pred = pred & d
    return pred


def range_relation_predicate(relation: str, dims) -> Column:
    """Catalyst predicate for one RangeFieldQuery relation over N dims."""
    relation = relation.lower()
    if relation in ("intersects", "within", "contains"):
        return _per_dim(relation, dims)
    if relation == "crosses":
        # RangeFieldQuery.java:208-210 — intersects but not within
        return _per_dim("intersects", dims) & ~_per_dim("within", dims)
    raise ValueError(f"unknown relation {relation!r}; one of {RELATIONS}")


def range_query(df: DataFrame, relation: str, dims) -> DataFrame:
    """IntRange.new*Query analog: filter df to rows whose stored range has the
    given relation to the query range. All predicates are pushable scans."""
    return df.where(range_relation_predicate(relation, dims))
