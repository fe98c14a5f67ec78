"""Mention extraction (U1) — the reference's NER front-end
(`blink/ner.py:29-42` flair predict; `blink/main_dense.py:76-97` `_annotate`)
re-expressed as a dictionary/regex extractor in `mapInPandas`.

One input turn row flat-maps to N mention rows with exact char offsets;
contexts are the lowercased left/right slices (`main_dense.py:85-92`).
The surface dictionary is compiled once per executor into a single
alternation regex (longest-first so overlapping surfaces resolve to the
longest match) — the inner loop is C-regex `finditer` over each text, the
batch boundary is Arrow.

Invariant (reference assert `create_BLINK_zeshel_data.py:115`):
``mention == lower(substring(text, start_pos+1, end_pos-start_pos))`` —
tested in tests/test_mentions.py.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("start_pos", IntegerType()),
        StructField("end_pos", IntegerType()),
        StructField("mention", StringType()),
        StructField("context_left", StringType()),
        StructField("context_right", StringType()),
    ]
)


def extract_mentions(transcripts: DataFrame, surfaces: list[str]) -> DataFrame:
    """Extract dictionary mentions from `transcripts(conv_id, turn_idx, text)`.

    Returns (mention_id, conv_id, turn_idx, start_pos, end_pos, mention,
    context_left, context_right) with a stable mention_id derived from the
    stable ordering key (conv_id, turn_idx, start_pos) — W6: ids are data,
    never positions (unlike the reference's list indices).
    """
    # longest-first alternation; word boundaries so 'acme' doesn't fire inside
    # 'acmex'; case-insensitive (P1 lowercasing happens on output fields)
    pat = "|".join(re.escape(s) for s in sorted(set(surfaces), key=len, reverse=True))
    pattern = f"(?<![a-z0-9])({pat})(?![a-z0-9])"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(pattern, re.IGNORECASE)
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MENTION_SCHEMA.fields}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if not text:
                    continue
                low = text.lower()
                for m in rx.finditer(low):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["start_pos"].append(m.start())
                    out["end_pos"].append(m.end())
                    out["mention"].append(low[m.start() : m.end()])
                    out["context_left"].append(low[: m.start()])
                    out["context_right"].append(low[m.end() :])
            yield pd.DataFrame(out)

    cols = transcripts.select("conv_id", "turn_idx", "text")
    # own the parallelism: AQE coalesces small shuffle outputs to very few
    # partitions (optimizing shuffle bytes, not downstream Python CPU) —
    # a regex scan over text is CPU-heavy per byte, so spread it over all
    # cores explicitly. At real scale the input has plenty of partitions
    # and this rebalance is what keeps stragglers off hot conversations.
    # 3 tasks per core: straggler smoothing — with one wave of equal tasks
    # the stage time is max-of-N; finer tasks let fast cores steal work
    par = transcripts.sparkSession.sparkContext.defaultParallelism * 3
    cols = cols.repartition(par)
    mentions = cols.mapInPandas(gen, schema=MENTION_SCHEMA)
    # stable id from the ordering contract; xxhash64 is collision-safe enough
    # at test scale and avoids a global sort; a monotonic row_number variant
    # is available for strict density (used by datagen gold fixtures).
    return mentions.withColumn(
        "mention_id",
        F.xxhash64("conv_id", "turn_idx", "start_pos").cast("long"),
    )
