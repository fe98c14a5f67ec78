"""Structured Streaming windowed aggregation with watermark over the events
table (beyond reference parity — SURVEY §2.9 notes the reference is
batch-only — but part of this engine's Spark-native surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT


def test_windowed_count_with_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    events = spark.read.parquet(f"{SF_UNIT}/events.parquet").limit(2000)
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    # parquet may surface ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from win_agg").collect()
    assert len(got) > 0
    # must equal the batch computation
    batch = (
        events.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .collect()
    )
    assert sorted(map(str, got)) == sorted(map(str, batch))
