"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting. Everything JVM-side (built-in
functions) so these run inside whole-stage codegen at 100 TB — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_count", "quality_score", "language_id", "fingerprint",
           "LANG_MARKERS"]

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "es": ["el", "los", "las", "es", "una", "para", "por", "como"],
}


def _toks(text_col: str):
    return F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda x: x != "")


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_ish) — whitespace tokens plus a BPE-ish count:
    word-piece chunks of <=4 chars (ceil(len/4) per word), a cheap deterministic
    proxy for subword token budgeting."""
    toks = _toks(text_col)
    bpe = F.expr(
        "aggregate(transform(filter(split(lower(trim({t})), '\\\\s+'), "
        "x -> x != ''), w -> cast(ceil(length(w) / 4.0) as long)), "
        "cast(0 as long), (acc, x) -> acc + x)".format(t=text_col))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        bpe.alias("n_bpe_ish"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length band, mean token length band, stopword ratio, alpha ratio."""
    toks = _toks(text_col)
    n = F.size(toks).cast("double")
    mean_len = F.when(n > 0,
                      F.length(F.regexp_replace(F.trim(F.col(text_col)),
                                                r"\s+", "")) / n).otherwise(0.0)
    stop_arr = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_ratio = F.when(
        n > 0,
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / n
    ).otherwise(0.0)
    alpha_ratio = F.when(
        F.length(F.col(text_col)) > 0,
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
        / F.length(F.col(text_col)).cast("double")
    ).otherwise(0.0)
    length_ok = (n >= 10) & (n <= 5000)
    mean_ok = (mean_len >= 3.0) & (mean_len <= 12.0)
    score = (
        F.when(length_ok, 0.25).otherwise(0.0)
        + F.when(mean_ok, 0.25).otherwise(0.0)
        + F.least(F.lit(0.25), stop_ratio * 2.5)
        + alpha_ratio * 0.25
    )
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: argmax over per-language marker hit
    counts; ties and zero-evidence fall back to 'und'. Deterministic tie-break:
    lexicographic language code."""
    toks = _toks(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
                .alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct(hits, lang): max hits, then max lang — to get
    # lexicographically-smallest on ties, compare on (hits, reversed lang)
    best = F.array_max(F.array(*[
        F.struct(s["hits"].alias("hits"),
                 F.lit(-i).alias("prio"),
                 s["lang"].alias("lang"))
        for i, s in enumerate(scores)
    ]))
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und")
        .alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token set
    (the classic 'fingerprint' clustering key) plus a locality-sensitive
    prefix fingerprint (first 8 tokens)."""
    toks = _toks(text_col)
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    prefix = F.array_join(F.slice(toks, 1, 8), " ")
    return docs.select(
        F.col(id_col),
        F.md5(canon).alias("fingerprint"),
        F.md5(prefix).alias("prefix_fingerprint"),
    )
