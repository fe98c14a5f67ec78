"""Evaluation harness — the reference's metric surface re-expressed as aggs:
accuracy (`blink/candidate_ranking/utils.py:86-88`, A5), pairwise F1 (our
acceptance metric, BASELINE.json), recall@k curve (`blink/candidate_retrieval/
evaluator.py:92-124`, A3), macro/micro (`blink/crossencoder/train_cross.py:
102-122`, A6)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pairwise_f1(
    predicted_clusters: DataFrame,
    labeled_pairs: DataFrame,
) -> dict[str, float]:
    """Pairwise F1 on labeled pairs (FIXTURES.md F4: mention_a, mention_b,
    is_match). A pair is predicted-match iff both mentions land in the same
    predicted cluster."""
    ca = predicted_clusters.select(
        F.col("node").alias("mention_a"), F.col("component").alias("comp_a")
    )
    cb = predicted_clusters.select(
        F.col("node").alias("mention_b"), F.col("component").alias("comp_b")
    )
    j = (
        labeled_pairs.join(ca, "mention_a", "left")
        .join(cb, "mention_b", "left")
        .withColumn(
            "pred",
            (F.col("comp_a").isNotNull())
            & (F.col("comp_a") == F.col("comp_b")),
        )
    )
    agg = j.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = (int(agg[c] or 0) for c in ("tp", "fp", "fn"))
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def clusters_equal(pred: DataFrame, gold: DataFrame) -> bool:
    """Exact cluster equality as partitions (ids canonicalized to min-member)."""
    p = pred.select(F.col("node").alias("mention_id"), F.col("component").alias("c"))
    g = gold.select("mention_id", F.col("cluster_id").alias("c"))
    return p.exceptAll(g).isEmpty() and g.exceptAll(p).isEmpty()


def recall_at_k(candidates: DataFrame, gold_col: str = "label_id", ks=(1, 4, 8, 16, 32, 64)) -> DataFrame:
    """Recall@k from a (mention_id, candidate_id, score) table vs gold —
    A3/A4: conditional aggs over the per-mention rank window."""
    w = Window.partitionBy("mention_id").orderBy(F.desc("score"), "candidate_id")
    ranked = candidates.withColumn("rank", F.row_number().over(w))
    gold_rank = ranked.where(F.col("candidate_id") == F.col(gold_col)).groupBy(
        "mention_id"
    ).agg(F.min("rank").alias("gold_rank"))
    n = candidates.select("mention_id").distinct().count()
    aggs = [
        F.round(
            F.sum((F.col("gold_rank") <= k).cast("long")) / F.lit(n), 6
        ).alias(f"recall_at_{k}")
        for k in ks
    ]
    return gold_rank.agg(*aggs)


def ann_recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int = 5) -> float:
    """Recall@k of an approximate ANN result against the exact top-k:
    |approx ∩ exact| / |exact| over (qid, nid) pairs with rank <= k — the
    flat-vs-HNSW trade the reference publishes
    (`blink/indexer/faiss_indexer.py:71-141`). Both inputs are
    (qid, nid, rank, ...) frames as produced by ann01/ann03/ann05."""
    e = exact.where(F.col("rank") <= k).select("qid", "nid")
    a = approx.where(F.col("rank") <= k).select("qid", "nid")
    hit = e.join(a, ["qid", "nid"], "left_semi").count()
    total = e.count()
    return round(hit / total, 4) if total else 1.0


def macro_micro_accuracy(preds: DataFrame, group_col: str = "world") -> DataFrame:
    """A6: per-group accuracy then unweighted mean (macro) + global (micro)."""
    correct = (F.col("pred") == F.col("label")).cast("double")
    per = preds.groupBy(group_col).agg(F.avg(correct).alias("acc"))
    macro = per.agg(F.round(F.avg("acc"), 6).alias("macro"))
    micro = preds.agg(F.round(F.avg(correct), 6).alias("micro"))
    return macro.crossJoin(micro)
