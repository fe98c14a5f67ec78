"""Blocking: gold-pair recall, skew bounding, key portability."""

from __future__ import annotations

from pyspark.sql import functions as F

from blink_reloaded_spark import datagen
from blink_reloaded_spark.operators.blocking import (
    blocking_keys,
    candidate_pairs,
    mention_entity_candidates,
)
from blink_reloaded_spark.plans.pipeline import ENTITY_ID_OFFSET, _prefix_key


def test_blocking_recall_on_fixture(spark):
    """Every gold (mention, entity) pair must co-occur in some block —
    the blocking-recall metric (A2 analogue, SURVEY.md §7.1.3)."""
    cat = datagen.EntityCatalog.build(n_entities=30)
    tr, me = datagen.generate_transcripts(
        spark, cat, n_convs=30, turns_per_conv=8, hot_conv_factor=5
    )
    ments = me.select(
        F.col("mention_id").alias("id"), F.col("mention").alias("text")
    )
    ents = cat.entities_df(spark).select(
        (F.lit(ENTITY_ID_OFFSET) - F.col("entity_id")).alias("id"),
        F.lower("title").alias("text"),
    )
    kw = dict(bands=12, rows=1, shingle_k=3)
    mk = blocking_keys(ments.withColumn("pk", _prefix_key("text")), extra_key_cols=["pk"], **kw)
    ek = blocking_keys(ents.withColumn("pk", _prefix_key("text")), extra_key_cols=["pk"], **kw)
    cands = mention_entity_candidates(mk, ek)
    gold = me.where("label_id >= 0").select(
        F.col("mention_id").alias("a"),
        (F.lit(ENTITY_ID_OFFSET) - F.col("label_id")).alias("b"),
    )
    n_gold = gold.count()
    missed = gold.join(cands, ["a", "b"], "left_anti").count()
    assert missed / n_gold < 0.01, f"{missed}/{n_gold} gold pairs missed blocking"


def test_candidate_pairs_bounded_on_hot_block(spark):
    """A hot key (one block of n rows) must produce O(n*window) pairs, not
    O(n^2) — the skew bound (north_rule)."""
    n = 3000
    keys = spark.range(n).select(
        F.col("id"), F.lit("HOT").alias("block_key")
    )
    pairs = candidate_pairs(keys, max_block=1000, window=10)
    cnt = pairs.count()
    assert cnt <= n * 10
    assert cnt >= n - 10  # neighbors still covered


def test_candidate_pairs_small_block_full_cross(spark):
    keys = spark.range(5).select(F.col("id"), F.lit("b").alias("block_key"))
    assert candidate_pairs(keys, max_block=1000).count() == 10  # C(5,2)
