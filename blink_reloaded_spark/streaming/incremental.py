"""Incremental entity linking over a transcript STREAM (§2.9 — beyond the
batch-only reference, but the natural Spark-native surface for this engine).

Why this is streaming-safe without cross-batch state: a KB LINK is a pure
function of the mention surface and the (static) entity catalogue, so
`LinkagePipeline.run_links` emits identical rows no matter how the input is
split into micro-batches — cluster identity IS the entity id. KB-FREE
clustering, by contrast, is transitive closure over mention-mention edges
and would need stateful cross-batch union-find; that mode stays batch
(plans/pipeline.run_kb_free) with checkpoint/resume as the incremental
story.

Exactly-once OUTPUT = at-least-once foreachBatch + an idempotent sink: the
source checkpoint makes a restarted query re-read only unprocessed files,
but a crash AFTER the parquet write and BEFORE the checkpoint commit
replays that micro-batch — so the sink partitions by batch_id and
dynamically OVERWRITES exactly that partition on replay instead of
appending duplicates (the standard Spark idempotent-sink recipe). Pinned in
tests/test_streaming_incremental.py: graceful restart processes batch 2
without re-emitting batch 1, and a simulated replay of the same batch_id
leaves the output byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from blink_reloaded_spark.plans.pipeline import LinkagePipeline


def write_links_idempotent(
    links: DataFrame, batch_id: int, output_path: str
) -> None:
    """Idempotent micro-batch sink: partition by batch_id and dynamically
    overwrite ONLY that partition — a foreachBatch replay (crash between
    the write and the stream-checkpoint commit) rewrites the same partition
    instead of appending duplicate rows. run_links is deterministic per
    batch (link = pure fn of surface + static catalogue), so the rewrite is
    byte-equivalent. Module-level so the replay path is directly testable."""
    (
        links.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_path)
    )


def incremental_link(
    pipeline: LinkagePipeline,
    transcript_stream: DataFrame,
    entities: DataFrame,
    surfaces: list[str],
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query linking each micro-batch of transcripts
    (conv_id, turn_idx, text) against `entities`; appends
    (mention_id, conv_id, turn_idx, entity_id, score, batch_id) parquet to
    `output_path`. `available_now=True` drains what is currently available
    and stops (the backfill/test mode); False runs continuously.
    """
    ent = entities.localCheckpoint()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        links = pipeline.run_links(batch_df, ent, surfaces=surfaces)
        write_links_idempotent(links, batch_id, output_path)

    writer = transcript_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
