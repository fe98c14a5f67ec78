"""KB-free matching mode: no entity catalogue — surface-surface LSH
self-join + scorer + transitive clustering (SURVEY §7.0 generalization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blink_reloaded_spark.plans.pipeline import LinkagePipeline


def test_kb_free_clusters_same_and_similar_surfaces(spark):
    rows = []
    mid = 0
    for i, surf in enumerate(
        ["acme corp", "acme corp", "acme cord", "globex inc", "globex inc", "zzz"]
    ):
        rows.append(("c1", i, 0, len(surf), surf, "", "", mid))
        mid += 1
    mentions = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, start_pos int, end_pos int,"
        " mention string, context_left string, context_right string, mention_id long",
    )
    pipe = LinkagePipeline(spark, threshold=0.8)
    out = {
        r["node"]: r["component"]
        for r in pipe.run_kb_free(None, mentions=mentions).collect()
    }
    # acme corp x2 + typo variant co-cluster; globex pair co-clusters;
    # 'zzz' links to nothing -> absent from the matched set (singleton)
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == out[4] == 3
    assert 5 not in out or out[5] == 5


def test_kb_free_on_fixture_matches_gold_groups(spark):
    from blink_reloaded_spark import datagen

    cat = datagen.EntityCatalog.build(n_entities=30)
    tr, me = datagen.generate_transcripts(
        spark, cat, n_convs=30, turns_per_conv=8, hot_conv_factor=5
    )
    me = me.cache()
    clusters = LinkagePipeline(spark, threshold=0.8).run_kb_free(
        tr, mentions=me
    ).cache()
    # without a KB the clusters need not equal gold exactly (alias chains
    # decide), but precision on same-gold-entity pairs should stay high
    from blink_reloaded_spark.eval import pairwise_f1

    a = me.select(
        F.col("mention_id").alias("mention_a"),
        F.col("label_id").alias("la"),
        F.substring("mention", 1, 2).alias("k"),
    )
    b = me.select(
        F.col("mention_id").alias("mention_b"),
        F.col("label_id").alias("lb"),
        F.substring("mention", 1, 2).alias("k"),
    )
    lp = (
        a.join(b, "k")
        .where(F.col("mention_a") < F.col("mention_b"))
        .withColumn("is_match", (F.col("la") == F.col("lb")) & (F.col("la") >= 0))
        .select("mention_a", "mention_b", "is_match")
    )
    m = pairwise_f1(clusters, lp)
    assert m["precision"] >= 0.95, m
