"""Structured Streaming ingest wiring: the reference is batch-only
(SURVEY.md §2.9) so streaming is out of parity scope, but the
mention-extraction stage is stateless and composes with readStream +
foreachBatch unchanged — this test pins that composition."""

from __future__ import annotations

import os

from blink_reloaded_spark.operators.mentions import extract_mentions


def test_streaming_mention_extraction(spark, tmp_path):
    src = str(tmp_path / "in")
    out: list[int] = []
    df = spark.createDataFrame(
        [("c1", 0, "acme called globex"), ("c1", 1, "then acme again")],
        "conv_id string, turn_idx int, text string",
    )
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)

    def sink(batch_df, batch_id):
        out.append(extract_mentions(batch_df, ["acme", "globex"]).count())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(out) == 3
