"""Custom STATEFUL streaming operator: per-conversation running stats via
``applyInPandasWithState`` (§2.9 — beyond the batch-only reference; the
task-level capability is arbitrary keyed state that survives micro-batches,
which neither foreachBatch nor windowed aggs provide).

Semantics: for every conversation key, maintain (n_turns, max_turn_idx,
n_chars) across ALL micro-batches seen so far and emit the updated totals
whenever the key appears in a batch (update mode). State lives in the
stream checkpoint: a RESTARTED query keeps accumulating — pinned in
tests/test_streaming_sessions.py, where a second availableNow query over
new files continues the counts from the first.

At scale this is the shape for streaming sessionization / per-entity
accumulators over 10^12 turns: state is partitioned by key (conv_id), each
micro-batch shuffles only its own rows to the state partitions, and the
state store checkpoints incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "conv_id string, n_turns long, max_turn int, n_chars long"
STATE_SCHEMA = "n_turns long, max_turn int, n_chars long"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_turns, max_turn, n_chars = state.get
    else:
        n_turns, max_turn, n_chars = 0, -1, 0
    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_chars += int(pdf["text"].fillna("").str.len().sum())
    state.update((n_turns, max_turn, n_chars))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_turns": n_turns,
                "max_turn": max_turn,
                "n_chars": n_chars,
            }
        ]
    )


def conversation_stats_stream(turns_stream: DataFrame) -> DataFrame:
    """Streaming (conv_id, n_turns, max_turn, n_chars) running totals over a
    transcript stream (conv_id, turn_idx, text); emit in 'update' output
    mode. State schema is flat and tiny (3 numbers per conversation)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
