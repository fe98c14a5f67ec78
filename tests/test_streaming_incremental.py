"""Streaming incremental linkage (streaming/incremental.py): per-batch
links equal the batch run on the union (batch-partitioning invariance), and
a restarted query processes ONLY new files (source-checkpoint exactly-once
ingest)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blink_reloaded_spark import datagen
from blink_reloaded_spark.plans.pipeline import LinkagePipeline
from blink_reloaded_spark.streaming.incremental import incremental_link


def test_incremental_link_matches_batch(spark, tmp_path):
    cat = datagen.EntityCatalog.build(n_entities=30)
    tr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=40, turns_per_conv=5, hot_conv_factor=5
    )
    tr = tr.select("conv_id", "turn_idx", "text").localCheckpoint()
    surfaces = [a["surface"] for a in cat.aliases]
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    half1 = tr.where(F.col("conv_id") < "conv_000020")
    half2 = tr.where(F.col("conv_id") >= "conv_000020")
    half1.write.parquet(os.path.join(src, "b1"))

    pipe = LinkagePipeline(spark, collect_metrics=False)
    stream = spark.readStream.schema(tr.schema).option(
        "maxFilesPerTrigger", "100"
    ).parquet(f"{src}/*")

    q = incremental_link(pipe, stream, cat.entities_df(spark), surfaces, out, ck)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out)
    n1 = got1.count()
    assert n1 > 0 and got1.select("batch_id").distinct().count() >= 1

    # second tranche arrives; a RESTARTED query must process only it
    half2.write.parquet(os.path.join(src, "b2"))
    stream2 = spark.readStream.schema(tr.schema).parquet(f"{src}/*")
    q2 = incremental_link(pipe, stream2, cat.entities_df(spark), surfaces, out, ck)
    q2.awaitTermination(300)

    got = spark.read.parquet(out)
    # batch 1 rows were not re-emitted
    assert got.count() > n1
    assert got.select("mention_id").distinct().count() == got.count()

    # streaming union == one batch pass over the full input (links are a
    # pure function of surface + catalogue -> batch-partitioning invariant)
    want = pipe.run_links(tr, cat.entities_df(spark), surfaces=surfaces)
    a = got.select("mention_id", "entity_id", F.round("score", 6).alias("s"))
    b = want.select("mention_id", "entity_id", F.round("score", 6).alias("s"))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # sanity: most mentions do link on this clean fixture
    linked = got.where(F.col("entity_id") >= 0).count()
    assert linked / got.count() > 0.9

    # CRASH-REPLAY idempotence (ADVICE r2): foreachBatch is at-least-once —
    # simulate a crash after the write but before the stream-checkpoint
    # commit by re-running the sink for an already-written batch_id. The
    # dynamic partition overwrite must leave the output identical, not
    # append duplicates.
    from blink_reloaded_spark.streaming.incremental import (
        write_links_idempotent,
    )

    before = sorted(map(tuple, spark.read.parquet(out).collect()))
    replay_links = pipe.run_links(half1, cat.entities_df(spark), surfaces=surfaces)
    replayed_bid = int(got1.select(F.min("batch_id")).collect()[0][0])
    write_links_idempotent(replay_links, replayed_bid, out)
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before
