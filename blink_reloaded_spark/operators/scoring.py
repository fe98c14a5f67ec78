"""Pairwise scoring — the cross-encoder analogue (U4; reference
`blink/crossencoder/crossencoder.py:130-139` scores mention×candidate pairs,
`blink/candidate_ranking/bert_reranking.py:106-160` the reranker variant).

Features per pair, all Arrow-batched / JVM-side (north_rule F11):
* Jaro-Winkler (numpy-vectorized pandas UDF, functions/similarity.py)
* normalized Levenshtein (Spark built-in, JVM)
* token-set Jaccard (array intersection, JVM)
* embedding dot product when vectors are present (JVM array aggregate)

Combined score = fixed convex combination (deterministic — the parity
requirement F1>=0.99 demands the scorer be a pure function of the pair text,
SURVEY.md §7.3e). Threshold -> match edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_reloaded_spark.functions.embedding import dot_product_udf
from blink_reloaded_spark.functions.similarity import (
    jaccard_from_counts,
    jaro_winkler_udf,
    levenshtein_sim,
)
from blink_reloaded_spark.functions.text import tokens

# weights: char-level evidence (jw, lev, char-trigram cosine) carries typo'd
# variants; `overlap` (token containment) catches head-word abbreviations
# like "acme" ~ "acme corp" that edit distance under-scores
W_JW, W_LEV, W_OVL, W_COS = 0.40, 0.15, 0.20, 0.25
DEFAULT_THRESHOLD = 0.60


def score_pairs(
    pairs: DataFrame,
    a_text: str = "a_text",
    b_text: str = "b_text",
    a_vec: str | None = None,
    b_vec: str | None = None,
    a_toks: str | None = None,
    b_toks: str | None = None,
) -> DataFrame:
    """Append feature + `score` columns to a pair DataFrame.

    PERF: pass pre-tokenized array columns via `a_toks`/`b_toks` on hot
    paths — the token features otherwise embed the normalize-regex +
    split subtree several times PER PAIR (sibling expressions are not
    CSE'd), and the texts repeat across pairs (tokenize once per distinct
    surface in the node table, ship the small array through the join).
    The dot product runs in an Arrow-vectorized pandas UDF; the
    interpreted JVM aggregate was ~256 virtual calls per pair (see
    embedding.dot_product_udf)."""
    ta = F.col(a_toks) if a_toks else tokens(F.col(a_text))
    tb = F.col(b_toks) if b_toks else tokens(F.col(b_text))
    n_inter = F.size(F.array_intersect(ta, tb))
    overlap = F.round(
        n_inter / F.greatest(F.least(F.size(ta), F.size(tb)), F.lit(1)).cast("double"),
        6,
    )
    out = (
        pairs.withColumn("jw", jaro_winkler_udf(F.col(a_text), F.col(b_text)))
        .withColumn("lev_sim", levenshtein_sim(F.col(a_text), F.col(b_text)))
        .withColumn("jacc", jaccard_from_counts(n_inter, F.size(ta), F.size(tb)))
        .withColumn("overlap", overlap)
    )
    if a_vec and b_vec:
        # clamp at 0: sign-hash cosine of short strings is noisy below zero
        # and anti-similarity carries no signal for linking
        out = out.withColumn(
            "cos",
            F.greatest(
                F.round(dot_product_udf(F.col(a_vec), F.col(b_vec)), 6),
                F.lit(0.0),
            ),
        )
        score = (
            F.col("jw") * W_JW
            + F.col("lev_sim") * W_LEV
            + F.col("overlap") * W_OVL
            + F.col("cos") * W_COS
        )
    else:
        z = W_JW + W_LEV + W_OVL
        score = (
            F.col("jw") * (W_JW / z)
            + F.col("lev_sim") * (W_LEV / z)
            + F.col("overlap") * (W_OVL / z)
        )
    return out.withColumn("score", F.round(score, 6))


def match_edges(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Filter accepted pairs -> (src, dst) edge list for clustering."""
    return scored.where(F.col("score") >= threshold).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )


def link_best(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Per-mention argmax link (the reference's prediction:
    `np.argmax(logits)` at `bert_reranking.py:223-227` / ranked output at
    `main_dense.py:563-582`): keep the top-1 candidate per `a`, accepted
    only above `threshold` (the serving app's score>0 filter,
    `blink/main.py:140-141`, generalized).

    Implemented as a two-phase max aggregation (lexicographic struct max:
    maximize score, tie-break minimal b) rather than a sort window:
    map-side partial aggregation means a hot mention surface with millions
    of candidate rows reduces locally on every task before one tiny shuffle
    — the skew-immunity the north rule wants from salting, by construction.
    """
    best = scored.groupBy("a").agg(
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("b")).alias("negb"),
                F.col("b").alias("b"),
            )
        ).alias("m")
    )
    return best.select(
        "a", F.col("m.b").alias("b"), F.col("m.score").alias("score")
    ).where(F.col("score") >= threshold)
