"""Similarity search over an embedding column (array<float>).

  * cosine_top_k       — exact brute-force top-k per query vector. The dot
    product stays JVM-side (zip_with/aggregate) so there is no Python in the
    scan; per-query top-k is two-stage (per-partition partial top-k, then a
    rank window over <= k * n_partitions survivors) — no reducer ever sees
    the full scored corpus for a query.
  * knn_top_k          — the same exact scan under any of Lucene 9's
    VectorSimilarityFunction score conventions (EUCLIDEAN 1/(1+d2),
    DOT_PRODUCT (1+dot)/2, COSINE (1+cos)/2 — o.a.l.index
    .VectorSimilarityFunction, the KnnVectorField metric choice).
  * ivf_top_k          — the scale path: k-means-style coarse quantizer
    (deterministic seeded centroids refined with a few Lloyd iterations via
    DataFrame aggregations), vectors assigned to their nearest centroid
    (partition pruning by list), queries probe only n_probe lists. At 100 TB
    this turns a full scan per query into a read of n_probe/n_lists of the data.

Both return (query_id, vec_id, cosine, rank) and tie-break by vec_id asc for
determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine_top_k", "knn_top_k", "ivf_top_k", "sparse_knn_query"]


def _two_stage_top_k(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k WITHOUT funneling the full scored set through one
    reducer per query: stage 1 folds each Spark partition down to <= k rows
    per query (mapInPandas, no shuffle); stage 2 runs the rank window over the
    <= k * n_partitions survivors only. Same shape as the text engine's
    segment_top_k -> merge_top_k. Input columns: (query_id, vec_id, cosine);
    ties break by vec_id asc, so partial top-k composes exactly."""
    schema = "query_id long, vec_id long, cosine double"
    slim = scored.select(F.col("query_id").cast("long"),
                         F.col("vec_id").cast("long"),
                         F.col("cosine").cast("double"))

    def partial(it):
        best = None
        for pdf in it:
            cur = pdf if best is None else pd.concat((best, pdf),
                                                     ignore_index=True)
            cur = cur.sort_values(["query_id", "cosine", "vec_id"],
                                  ascending=[True, False, True], kind="stable")
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    partials = slim.mapInPandas(partial, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
                  f"cast(0.0 as double), (acc, x) -> acc + x)")


def _norm(v: str):
    return F.sqrt(F.expr(
        f"aggregate({v}, cast(0.0 as double), (acc, x) -> acc + CAST(x AS DOUBLE) * x)"))


def knn_top_k(vectors: DataFrame, queries: DataFrame, k: int = 10,
              metric: str = "cosine",
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_id_col: str = "query_id",
              query_vec_col: str = "query_vec") -> DataFrame:
    """Exact brute-force KNN top-k under a Lucene VectorSimilarityFunction
    (o.a.l.index.VectorSimilarityFunction, Lucene 9 KnnVectorField):

      "euclidean"   score = 1 / (1 + squared L2 distance)   (EUCLIDEAN)
      "dot"         score = (1 + dot product) / 2            (DOT_PRODUCT)
      "cosine"      score = (1 + cosine) / 2                 (COSINE)

    Same scale shape as cosine_top_k: broadcast query set, one stream over
    the big side, two-stage partial top-k merge, vec_id-asc tie-break.
    Returns (query_id, vec_id, score, rank)."""
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("_v"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("_q"))
    pairs = v.crossJoin(F.broadcast(q))
    if metric == "euclidean":
        sq = F.expr(
            "aggregate(zip_with(_v, _q, (x, y) -> "
            "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "cast(0.0 as double), (acc, x) -> acc + x)")
        score = F.lit(1.0) / (F.lit(1.0) + sq)
    elif metric == "dot":
        score = (F.lit(1.0) + _dot("_v", "_q")) / F.lit(2.0)
    elif metric == "cosine":
        nv = F.sqrt(F.expr(
            "aggregate(_v, cast(0.0 as double), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * x)"))
        nq = F.sqrt(F.expr(
            "aggregate(_q, cast(0.0 as double), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * x)"))
        score = (F.lit(1.0) + _dot("_v", "_q") / (nv * nq)) / F.lit(2.0)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = pairs.withColumn("cosine", score)
    out = _two_stage_top_k(scored, k)
    return out.select("query_id", "vec_id",
                      F.col("cosine").alias("score"), "rank")


def cosine_top_k(vectors: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id",
                 query_vec_col: str = "query_vec") -> DataFrame:
    """Exact brute-force cosine top-k. queries is expected to be small
    (broadcast); the big side streams once for all queries."""
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("_v"),
                       _norm(vec_col).alias("_nv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("_q"),
                       _norm(query_vec_col).alias("_nq"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .withColumn("cosine", _dot("_v", "_q") / (F.col("_nv") * F.col("_nq")))
    )
    return _two_stage_top_k(scored, k)


def _centroids(vectors: DataFrame, vec_col: str, n_lists: int, dim: int,
               iters: int, seed: int) -> np.ndarray:
    """Deterministic mini k-means with DataFrame aggregation steps."""
    sample = np.array(
        vectors.select(vec_col).limit(max(n_lists * 8, 256)).toPandas()[vec_col]
        .tolist(), dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmin(
            ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return cents


def _seq_sq_dist(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d
    return acc


def _nearest_centroid_col(vec_col: str, cents: np.ndarray):
    """JVM-side argmin over centroid dot distances (centroids inlined as
    literals — small, broadcast by constant folding)."""
    exprs = []
    for ci, c in enumerate(cents):
        arr = ",".join(f"cast({x!r} as double)" for x in c)
        d2 = (f"aggregate(zip_with({vec_col}, array({arr}), "
              f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
              f"cast(0.0 as double), (acc, x) -> acc + x)")
        exprs.append(f"struct({d2} as d, {ci} as c)")
    return F.expr(f"array_min(array({','.join(exprs)})).c")


def ivf_top_k(vectors: DataFrame, queries: DataFrame, k: int = 10,
              n_lists: int = 8, n_probe: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_id_col: str = "query_id", query_vec_col: str = "query_vec",
              kmeans_iters: int = 4, seed: int = 13,
              centroid_mode: str = "kmeans") -> DataFrame:
    """IVF-style approximate top-k: probe only the n_probe nearest inverted
    lists per query. Approximate by construction (recall < 1 when the true
    neighbor lives in an unprobed list).

    centroid_mode="seed_ids" uses the vectors with the n_lists smallest ids as
    the coarse quantizer (no Lloyd iterations) — fully reproducible by an
    external SQL engine, which makes the whole IVF plan oracle-checkable;
    "kmeans" (default) refines seeded centroids with DataFrame-side Lloyd
    steps for better list balance."""
    dim = len(vectors.select(vec_col).first()[0])
    if centroid_mode == "seed_ids":
        cpd = (vectors.select(id_col, vec_col)
               .orderBy(id_col).limit(n_lists).toPandas())
        cents = np.array(cpd[vec_col].tolist(), dtype=np.float64)
    else:
        cents = _centroids(vectors, vec_col, n_lists, dim, kmeans_iters, seed)
    v = vectors.withColumn("_list", _nearest_centroid_col(vec_col, cents))

    qpd = queries.select(query_id_col, query_vec_col).toPandas()
    qvecs = np.array(qpd[query_vec_col].tolist(), dtype=np.float64)
    # left-to-right scalar sums (not numpy pairwise) so an external SQL
    # engine's sequential double fold reproduces the probe choice bit-exactly
    d2 = np.array([[_seq_sq_dist(q, c) for c in cents] for q in qvecs])
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    probe_rows = [
        (int(qpd[query_id_col].iloc[i]),
         [float(x) for x in qpd[query_vec_col].iloc[i]],
         [int(p) for p in probes[i]])
        for i in range(len(qpd))
    ]
    spark = vectors.sparkSession
    qdf = spark.createDataFrame(probe_rows,
                                schema=f"query_id long, _q array<double>, "
                                       f"_probes array<int>")
    qdf = qdf.select("query_id", "_q", F.explode("_probes").alias("_list"),
                     _norm("_q").alias("_nq"))
    scored = (
        v.join(F.broadcast(qdf), "_list")
        .withColumn("cosine",
                    _dot(vec_col, "_q") / (_norm(vec_col) * F.col("_nq")))
        .withColumnRenamed(id_col, "vec_id")
    )
    return _two_stage_top_k(scored, k)


def sparse_knn_query(vec: dict):
    """Sparse-vector KNN as a query over the engine's own inverted index —
    the TestSparseKNN1.java shape (LuceneDemo9.8.0): dimension = term,
    document weight = term frequency, query weight = term boost. Run with
    IndexSearcher(..., similarity='dot'): score = sum_t w_t * tf(doc, t),
    executed through the pruned WAND disjunction (block-max = w * max_freq),
    so top-k sparse dot-product search inherits the text path's skipping."""
    from ..search import query as Q
    return Q.BooleanQuery(should=tuple(
        Q.TermQuery(t, float(w)) for t, w in sorted(vec.items())))
