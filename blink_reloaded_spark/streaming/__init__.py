"""Structured Streaming surface.

The reference has **no** streaming operators (SURVEY.md §2.9 — every entry
point is batch over static files; the Flask app is stateless request/response)
so streaming is deliberately out of scope for parity. The batch pipeline's
incremental story is checkpoint/resume (sources/checkpoint.py).

For users who want incremental ingest of new transcript partitions, the
mention-extraction stage is stateless and composes with
``spark.readStream.format("parquet")`` + ``foreachBatch`` unchanged — see
tests/test_streaming_ingest.py for the wiring.

Beyond that, ``streaming/incremental.py`` ships a REAL incremental linker:
KB links are a pure function of surface + catalogue, so per-micro-batch
``LinkagePipeline.run_links`` output is batch-partitioning invariant and
appends safely (cluster identity = entity id); restarts resume from the
stream source checkpoint. Pinned in tests/test_streaming_incremental.py.

``streaming/sessions.py`` adds the custom STATEFUL operator surface:
per-conversation running stats via ``applyInPandasWithState`` — keyed state
that survives micro-batches and query restarts (the state store lives in
the stream checkpoint). Pinned in tests/test_streaming_sessions.py.

from-imports below re-export the streaming surface.
"""

from blink_reloaded_spark.streaming.incremental import incremental_link
from blink_reloaded_spark.streaming.sessions import conversation_stats_stream

__all__ = ["incremental_link", "conversation_stats_stream"]
