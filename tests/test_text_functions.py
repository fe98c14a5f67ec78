"""Text-kernel unit tests: budget-balanced context window (F3) and the
quality/shingle helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from blink_reloaded_spark.functions.text import (
    budget_context,
    char_shingles,
    token_shingles,
)


def test_budget_context_redistribution(spark):
    rows = [
        # long both sides: split evenly (budget 32-1=31 -> 15/16)
        (" ".join(f"l{i}" for i in range(40)), " ".join(f"r{i}" for i in range(40)), "x"),
        # short left: unused left quota goes right
        ("a b", " ".join(f"r{i}" for i in range(40)), "x"),
        # empty contexts
        ("", "", "lonely mention"),
    ]
    df = spark.createDataFrame(rows, "l string, r string, m string")
    out = df.select(
        budget_context(F.col("l"), F.col("r"), F.col("m"), 32).alias("w")
    ).collect()
    w0 = out[0]["w"].split()
    assert len(w0) == 32  # 15 left + <x> + 16 right
    assert w0[-1] == "r15" and w0[0] == "l25"
    w1 = out[1]["w"].split()
    assert len(w1) == 32  # 2 left + <x> + 29 right (redistributed)
    assert w1[:2] == ["a", "b"] and w1[-1] == "r28"
    assert out[2]["w"] == "<lonely mention>"


def test_budget_never_exceeded(spark):
    df = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(100)),) * 2 + ("some mention here",)],
        "l string, r string, m string",
    )
    for budget in (8, 16, 64):
        w = df.select(budget_context(F.col("l"), F.col("r"), F.col("m"), budget)).collect()[0][0]
        assert len(w.split()) <= max(budget, 3) + 1  # mention tokens always kept


def test_shingles_shapes(spark):
    df = spark.createDataFrame([("Hello, World! ",)], "t string")
    row = df.select(
        char_shingles(F.col("t"), 5).alias("cs"),
        token_shingles(F.col("t"), 2).alias("ts"),
    ).collect()[0]
    assert "hello" in row["cs"]
    assert row["ts"] == ["hello world"]
