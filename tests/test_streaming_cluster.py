"""Continuous KB-free clustering over a transcript stream
(streaming/incremental.incremental_cluster_kb_free): the state after the
last micro-batch must equal a batch run_kb_free over everything ingested
(the append invariant through the streaming surface), a restarted query
must process only new files, and a crash-replay of an already-committed
batch must leave the state byte-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blink_reloaded_spark import datagen
from blink_reloaded_spark.plans.pipeline import LinkagePipeline
from blink_reloaded_spark.streaming.incremental import (
    cluster_kb_free_sink,
    incremental_cluster_kb_free,
)


def _latest_state(spark, state_path):
    snaps = spark.read.parquet(state_path)
    latest = snaps.agg(F.max("batch_id").alias("b")).collect()[0]["b"]
    return latest, snaps.where(F.col("batch_id") == latest).drop("batch_id")


def test_streaming_kb_free_cluster_matches_batch(spark, tmp_path):
    cat = datagen.EntityCatalog.build(n_entities=30)
    tr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=40, turns_per_conv=5, hot_conv_factor=5
    )
    tr = tr.select("conv_id", "turn_idx", "text").localCheckpoint()
    surfaces = [a["surface"] for a in cat.aliases]
    src = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    half1 = tr.where(F.col("conv_id") < "conv_000020")
    half2 = tr.where(F.col("conv_id") >= "conv_000020")
    half1.write.parquet(os.path.join(src, "b1"))

    pipe = LinkagePipeline(spark, collect_metrics=False)
    stream = spark.readStream.schema(tr.schema).parquet(f"{src}/*")
    q = incremental_cluster_kb_free(pipe, stream, surfaces, state, ck)
    q.awaitTermination(300)
    bid1, st1 = _latest_state(spark, state)
    n1 = st1.count()
    assert n1 > 0

    # the second tranche arrives; the RESTARTED query processes only it and
    # the new state must cover the union corpus
    half2.write.parquet(os.path.join(src, "b2"))
    stream2 = spark.readStream.schema(tr.schema).parquet(f"{src}/*")
    q2 = incremental_cluster_kb_free(pipe, stream2, surfaces, state, ck)
    q2.awaitTermination(300)
    bid2, st2 = _latest_state(spark, state)
    assert bid2 > bid1 and st2.count() > n1

    # streaming state == one batch run_kb_free over the full corpus (the
    # append invariant surfaced through foreachBatch)
    from blink_reloaded_spark.operators.mentions import extract_mentions

    m_all = extract_mentions(tr, surfaces, with_context=False)
    want = LinkagePipeline.cluster_state(
        pipe.run_kb_free(tr, mentions=m_all), m_all
    )
    got = st2.select("mention_id", "mention", "cluster_id")
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert diff == 0, f"streaming state diverged from batch recompute: {diff}"

    # CRASH-REPLAY idempotence: re-run the sink for the already-committed
    # last batch_id — it must read the PREDECESSOR snapshot (never its own
    # partition) and dynamic-overwrite its partition byte-identically
    before = sorted(map(tuple, st2.collect()))
    cluster_kb_free_sink(pipe, surfaces, state)(half2, bid2)
    _, st2b = _latest_state(spark, state)
    after = sorted(map(tuple, st2b.collect()))
    assert after == before

    # FIXED-POINT replay: even appending an already-merged batch ONTO the
    # final state (content-hashed ids, no new surfaces) changes nothing
    cluster_kb_free_sink(pipe, surfaces, state)(half2, bid2 + 1)
    _, st3 = _latest_state(spark, state)
    assert sorted(map(tuple, st3.collect())) == before
