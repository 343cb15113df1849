"""Deduplication operators for large-scale training-data pipelines.

All operators take a documents DataFrame (id_col + text_col) and are designed
for 100 TB-scale execution: candidate generation is always a key-equality
shuffle (groupBy / join on a bucket key), never a cross join; verification work
is proportional to candidate pairs, not to n^2.

  * exact_duplicates      — md5(text) hash-groupBy.
  * ngram_jaccard_pairs   — shingle-inverted-index candidate join + exact
                            Jaccard verify (deterministic; SQL-oracle-checkable).
  * minhash_lsh_pairs     — MinHash signatures + LSH banding buckets + exact
                            Jaccard verify on candidates.
  * simhash               — 64-bit SimHash fingerprint per doc (Charikar); near
                            dups = equal bands (hamming<=k via band join).
  * embedding_near_dups   — cosine >= tau over an embedding column, LSH-bucketed
                            by random hyperplane signs.

Hashing is md5-based so an external SQL engine (DuckDB) can reproduce results
bit-for-bit for the correctness harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["exact_duplicates", "tokens_col", "shingles_col",
           "ngram_jaccard_pairs", "minhash_signature", "minhash_lsh_pairs",
           "simhash", "embedding_near_dups"]

# 2^31-1: keeps a*x+b < 2^62 in int64 under Spark's ANSI overflow checks
MERSENNE = (1 << 31) - 1


def tokens_col(text_col: str = "text"):
    """Whitespace-split lowercase tokens, JVM-side (no Python)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles_col(n: int = 3, text_col: str = "text"):
    """Word n-gram shingles as 'w1 w2 w3' strings, JVM-side via transform."""
    toks = tokens_col(text_col)
    return F.expr(
        f"transform(sequence(0, greatest(size({_toks_sql(text_col)}) - {n}, -1)), "
        f"i -> array_join(slice({_toks_sql(text_col)}, i + 1, {n}), ' '))"
    )


def _toks_sql(text_col: str) -> str:
    return f"split(lower(trim({text_col})), '\\\\s+')"


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, doc_ids).

    Scale: a single hash-partitioned groupBy on a 32-char key; the canonical
    first pass of any dedup pipeline."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"),
             F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("dup_count") > 1)
    )


def _distinct_shingles(docs: DataFrame, id_col: str, text_col: str, n: int):
    return (
        docs.select(F.col(id_col).alias("_id"),
                    F.explode(F.array_distinct(shingles_col(n, text_col)))
                    .alias("shingle"))
        .where(F.col("shingle") != "")
    )


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int = 10_000) -> DataFrame:
    """Near-duplicate pairs with exact n-gram-set Jaccard >= threshold.

    Plan shape: shingle inverted index -> self-join on shingle (candidate pairs
    share >= 1 shingle) -> count shared shingles per pair -> Jaccard from
    |A|,|B|,|A∩B|. Stop-shingles with df > max_shingle_df are dropped from
    candidate generation (skew guard — the shingle analog of stopword skew; at
    threshold >= 0.5 a true near-dup pair still shares many rarer shingles)."""
    sh = _distinct_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    sh_pruned = (
        sh.join(F.broadcast(sh_df.where(F.col("sdf") <= max_shingle_df)
                            .select("shingle")), "shingle")
    )
    a = sh_pruned.select(F.col("_id").alias("id_a"), "shingle")
    b = sh_pruned.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"),
                                F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("jaccard",
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _hash_shingle_col():
    """Stable integer from a shingle: first 15 hex chars of md5 (60 bits, so
    birthday collisions stay negligible at corpus scale), reduced mod MERSENNE
    so the per-hash (a*x+b) stays within int64 (< 2^62) under Spark's ANSI
    overflow checks. md5 is reproducible in any SQL engine -> oracle-checkable
    MinHash."""
    return (F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
            .cast("long") % F.lit(MERSENNE))


def minhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 16, seed: int = 42) -> DataFrame:
    """(id, [minhash_0..minhash_{H-1}]) — min over shingles of (a_i*x+b_i) mod p.

    One shuffle: explode distinct shingles, per-shingle hash family evaluated
    JVM-side, groupBy(id).agg(min...)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, num_hashes).astype(np.int64)
    b = rng.randint(0, MERSENNE, num_hashes).astype(np.int64)
    sh = _distinct_shingles(docs, id_col, text_col, n)
    hashed = sh.withColumn("hx", _hash_shingle_col())
    aggs = [
        F.min(((F.col("hx") * F.lit(int(a[i])) + F.lit(int(b[i])))
               % F.lit(MERSENNE))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("_id").agg(*aggs)
    return sig.select(F.col("_id").alias(id_col),
                      F.array(*[f"mh_{i}" for i in range(num_hashes)])
                      .alias("signature"))


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.7, seed: int = 42) -> DataFrame:
    """LSH candidate pairs (same signature band) verified with exact Jaccard.

    Scale shape: band buckets are an equality groupBy key (signature slice), so
    candidate generation never compares across buckets; verification joins back
    to shingle sets only for candidate ids."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(docs, id_col, text_col, n, num_hashes, seed)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.concat_ws("_", *[
                         F.col("signature")[i * rows_per_band + j].cast("string")
                         for j in range(rows_per_band)]).alias("bucket"))
            for i in range(bands)
        ])).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x").join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    sh = _distinct_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"),
                                F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("jaccard",
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit Charikar SimHash over whitespace tokens (md5-derived token bits),
    vectorized in an Arrow UDF. Output: (id, simhash: long, signed)."""
    import hashlib

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        tok_lists = [str(t or "").lower().split() for t in texts]
        # hash each DISTINCT token once per Arrow batch: corpus token
        # distributions are Zipfian, so the cache hit rate is enormous and
        # the md5 cost drops from O(sum unique-per-doc) to O(batch vocab)
        shifts = np.arange(64, dtype=np.uint64)
        signs: dict = {}
        for toks in tok_lists:
            for tok in toks:
                if tok not in signs:
                    h = np.uint64(int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big"))
                    signs[tok] = (((h >> shifts) & np.uint64(1))
                                  .astype(np.int64) * 2 - 1)
        powers = (np.uint64(1) << shifts)
        for i, toks in enumerate(tok_lists):
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                     return_counts=True)
            # acc[j] = sum over tokens of +-count — one matmul per doc
            mat = np.stack([signs[t] for t in uniq])
            acc = mat.T @ counts.astype(np.int64)
            val = powers[acc > 0].sum(dtype=np.uint64)
            out[i] = np.int64(val.astype(np.int64))
        return pd.Series(out)

    return docs.select(F.col(id_col), sh(F.col(text_col)).alias("simhash"))


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", tau: float = 0.95,
                        n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucketed by random-hyperplane signs.

    Candidates = same sign-pattern bucket (probability of a >= tau pair
    splitting across all buckets is low for small n_planes); verify exact
    cosine JVM-side with aggregate/zip_with."""
    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    sign_cols = []
    for i in range(n_planes):
        w = planes[i]
        dot = F.expr(
            "aggregate(zip_with({v}, array({ws}), (x, y) -> x * y), "
            "cast(0.0 as double), (acc, x) -> acc + x)".format(
                v=vec_col, ws=",".join(f"cast({x!r} as double)" for x in w))
        )
        sign_cols.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    norm = F.sqrt(F.expr(
        f"aggregate({vec_col}, cast(0.0 as double), (acc, x) -> acc + x * x)"))
    base = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.concat(*sign_cols).alias("bucket"), norm.alias("_n"))
    a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                    F.col("_n").alias("na"), "bucket")
    b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                    F.col("_n").alias("nb"), "bucket")
    dot_ab = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), "
                    "cast(0.0 as double), (acc, x) -> acc + x)")
    return (
        a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot_ab / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )
