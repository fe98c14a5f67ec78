"""Direct pins for operators/ids.stable_row_ids (W6 two-phase assignment)
and the eval helpers recall_at_k / macro_micro_accuracy (A3/A6) that round 1
only covered indirectly through query oracles."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blink_reloaded_spark.eval import macro_micro_accuracy, recall_at_k
from blink_reloaded_spark.operators.ids import stable_row_ids


def test_stable_row_ids_equals_global_sort(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 9973).alias("k"),
        F.col("id").alias("tie"),
    ).repartition(16)
    got = stable_row_ids(df, ["k", "tie"], id_name="rid", num_partitions=7)
    w = Window.orderBy("k", "tie")
    want = df.withColumn("rid", F.row_number().over(w).cast("long") - 1)
    assert got.count() == 5000
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_stable_row_ids_dense_and_empty(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    got = stable_row_ids(df, ["k"], num_partitions=4)
    rids = sorted(r["rid"] for r in got.collect())
    assert rids == list(range(100))
    empty = stable_row_ids(df.where(F.lit(False)), ["k"])
    assert empty.count() == 0
    assert "rid" in empty.columns


def test_recall_at_k(spark):
    # 4 mentions; gold ranks by construction: m1->1, m2->2, m3->3, m4->absent
    rows = []
    for m, gold_rank in (("m1", 1), ("m2", 2), ("m3", 3)):
        for r in range(1, 4):
            rows.append((m, f"c{r}", float(10 - r), "c%d" % gold_rank))
    rows.append(("m4", "c1", 9.0, "NONE"))
    cand = spark.createDataFrame(
        rows, "mention_id string, candidate_id string, score double, label_id string"
    )
    out = recall_at_k(cand, ks=(1, 2, 3)).collect()[0]
    assert out["recall_at_1"] == 0.25
    assert out["recall_at_2"] == 0.5
    assert out["recall_at_3"] == 0.75


def test_macro_micro_accuracy(spark):
    # world A: 2/2 correct; world B: 1/3 correct
    preds = spark.createDataFrame(
        [
            ("A", 1, 1), ("A", 2, 2),
            ("B", 1, 1), ("B", 2, 9), ("B", 3, 9),
        ],
        "world string, label int, pred int",
    )
    out = macro_micro_accuracy(preds).collect()[0]
    assert out["macro"] == round((1.0 + 1 / 3) / 2, 6)
    assert out["micro"] == 0.6
