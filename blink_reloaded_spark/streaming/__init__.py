"""Structured Streaming surface.

The reference has **no** streaming operators (SURVEY.md §2.9 — every entry
point is batch over static files; the Flask app is stateless request/response)
so streaming is deliberately out of scope for parity. The batch pipeline's
incremental story is checkpoint/resume (sources/checkpoint.py).

For users who want incremental ingest of new transcript partitions, the
mention-extraction stage is stateless and composes with
``spark.readStream.format("parquet")`` + ``foreachBatch`` unchanged — see
tests/test_streaming_ingest.py for the wiring.
"""
