"""applyInPandasWithState operator: keyed state must survive micro-batches
AND query restarts (it lives in the stream checkpoint's state store)."""

from __future__ import annotations

import os

from blink_reloaded_spark.streaming.sessions import conversation_stats_stream


def _run_once(spark, src, ck, schema, out):
    # memory sinks cannot recover from a checkpoint; foreachBatch can — the
    # checkpoint carries the source offsets AND the state store
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")

    def sink(df, _bid):
        df.write.mode("append").parquet(out)

    q = (
        conversation_stats_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {r["conv_id"]: r for r in spark.read.parquet(out).collect()}


def test_state_accumulates_across_restarts(spark, tmp_path):
    df1 = spark.createDataFrame(
        [("a", 0, "xx"), ("a", 1, "yyy"), ("b", 0, "z")],
        "conv_id string, turn_idx int, text string",
    )
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    df1.write.parquet(os.path.join(src, "b1"))

    got1 = _run_once(spark, src, ck, df1.schema, str(tmp_path / "out1"))
    assert got1["a"]["n_turns"] == 2 and got1["a"]["n_chars"] == 5
    assert got1["a"]["max_turn"] == 1
    assert got1["b"]["n_turns"] == 1

    # new files + RESTARTED query: state continues from the checkpoint
    df2 = spark.createDataFrame(
        [("a", 2, "wwww"), ("c", 0, "q")],
        "conv_id string, turn_idx int, text string",
    )
    df2.write.parquet(os.path.join(src, "b2"))
    got2 = _run_once(spark, src, ck, df1.schema, str(tmp_path / "out2"))
    # update mode: only keys touched by batch 2 are re-emitted
    assert got2["a"]["n_turns"] == 3 and got2["a"]["n_chars"] == 9
    assert got2["a"]["max_turn"] == 2
    assert got2["c"]["n_turns"] == 1
    assert "b" not in got2
