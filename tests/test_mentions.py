"""Mention extraction (U1): the per-turn text-equality invariant — the
reference's assert `mention == ' '.join(tokens[start:end+1])`
(create_BLINK_zeshel_data.py:115) adapted to char offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from blink_reloaded_spark import datagen
from blink_reloaded_spark.operators.mentions import extract_mentions


def test_extraction_offsets_reconstruct_text(spark):
    cat = datagen.EntityCatalog.build(n_entities=20)
    tr, gold = datagen.generate_transcripts(
        spark, cat, n_convs=15, turns_per_conv=5, hot_conv_factor=3
    )
    surfaces = [a["surface"] for a in cat.aliases]
    m = extract_mentions(tr, surfaces)
    joined = m.join(tr.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    bad = joined.where(
        F.col("mention")
        != F.lower(F.expr("substring(text, start_pos + 1, end_pos - start_pos)"))
    ).count()
    assert bad == 0
    # context slices partition the turn exactly (main_dense.py:85-92)
    bad_ctx = joined.where(
        F.concat("context_left", "mention", "context_right") != F.lower("text")
    ).count()
    assert bad_ctx == 0


def test_extraction_finds_all_gold_mentions(spark):
    cat = datagen.EntityCatalog.build(n_entities=20)
    tr, gold = datagen.generate_transcripts(
        spark, cat, n_convs=15, turns_per_conv=5, hot_conv_factor=3
    )
    surfaces = [a["surface"] for a in cat.aliases]
    m = extract_mentions(tr, surfaces)
    missing = gold.join(
        m.select("conv_id", "turn_idx", "start_pos"),
        ["conv_id", "turn_idx", "start_pos"],
        "left_anti",
    ).count()
    assert missing == 0


def test_multi_occurrence_and_case(spark):
    tr = spark.createDataFrame(
        [("c1", 0, "Acme met acme; then ACME left.")],
        "conv_id string, turn_idx int, text string",
    )
    m = extract_mentions(tr, ["acme"]).collect()
    assert len(m) == 3
    assert all(r["mention"] == "acme" for r in m)
    assert sorted(r["start_pos"] for r in m) == [0, 9, 20]


def test_token_matcher_equals_regex(spark):
    """The token-hash production matcher must reproduce the regex baseline
    exactly on the full fixture (same rows, same offsets)."""
    cat = datagen.EntityCatalog.build(n_entities=40)
    tr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=30, turns_per_conv=6, hot_conv_factor=3
    )
    surfaces = [a["surface"] for a in cat.aliases]
    cols = ["conv_id", "turn_idx", "start_pos", "end_pos", "mention"]
    fast = sorted(map(tuple, extract_mentions(tr, surfaces, impl="token").select(cols).collect()))
    slow = sorted(map(tuple, extract_mentions(tr, surfaces, impl="regex").select(cols).collect()))
    assert fast == slow and len(fast) > 0


def test_non_token_surface_falls_back(spark):
    tr = spark.createDataFrame(
        [("c1", 0, "price is $9.99 today")], "conv_id string, turn_idx int, text string"
    )
    m = extract_mentions(tr, ["$9.99", "today"]).collect()  # regex fallback
    assert sorted(r["mention"] for r in m) == ["$9.99", "today"]


def test_longest_match_wins(spark):
    tr = spark.createDataFrame(
        [("c1", 0, "acme corp called")], "conv_id string, turn_idx int, text string"
    )
    m = extract_mentions(tr, ["acme", "acme corp"]).collect()
    assert len(m) == 1 and m[0]["mention"] == "acme corp"


def test_vec_matcher_equals_loop_adversarial(spark):
    """_gen_token_vec vs _gen_token on the nasty cases: overlap chains,
    multi-space gaps, punctuation gaps, row boundaries, unicode, empties."""
    rows = [
        ("c1", 0, "a b c d"),                      # chain: greedy a b, c d
        ("c1", 1, "a  b"),                         # double space: no 2-gram
        ("c1", 2, "a-b and a b"),                  # punct gap vs space gap
        ("c1", 3, ""),                             # empty
        ("c1", 4, None),                           # null
        ("c2", 0, "x a b c y c d"),                # mid-row chains
        ("c2", 1, "café a b"),                # non-ascii before match
        ("c2", 2, "b c"),                          # row starts with match
        ("c2", 3, "AGG Part SPARK"),               # case folding
        ("c2", 4, "a"),                            # row == match
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    ).repartition(3)
    surfaces = ["a b", "b c", "c d", "a", "agg part", "spark", "c"]
    cols = ["conv_id", "turn_idx", "start_pos", "end_pos", "mention"]
    vec = sorted(map(tuple, extract_mentions(tr, surfaces, impl="token").select(cols).collect()))
    loop = sorted(map(tuple, extract_mentions(tr, surfaces, impl="token_loop").select(cols).collect()))
    rx = sorted(map(tuple, extract_mentions(tr, surfaces, impl="regex").select(cols).collect()))
    assert vec == loop == rx and len(vec) > 0
    # Arrow-native matcher: full-row parity INCLUDING the context slices;
    # the non-ascii row ("café …") exercises its per-batch pandas fallback
    all_cols = cols + ["context_left", "context_right"]
    arrow = sorted(map(tuple, extract_mentions(tr, surfaces, impl="token_arrow").select(all_cols).collect()))
    vec_full = sorted(map(tuple, extract_mentions(tr, surfaces, impl="token").select(all_cols).collect()))
    assert arrow == vec_full and len(arrow) > 0


def test_arrow_matcher_equals_vec_fixture(spark):
    """_gen_token_arrow vs _gen_token_vec on the full generated fixture —
    same rows, same offsets, same mention_ids (the id hashes the offsets,
    so id equality pins the whole contract)."""
    cat = datagen.EntityCatalog.build(n_entities=40)
    tr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=30, turns_per_conv=6, hot_conv_factor=3
    )
    surfaces = [a["surface"] for a in cat.aliases]
    cols = ["mention_id", "conv_id", "turn_idx", "start_pos", "end_pos", "mention"]
    arrow = sorted(map(tuple, extract_mentions(
        tr, surfaces, impl="token_arrow", with_context=False).select(cols).collect()))
    vec = sorted(map(tuple, extract_mentions(
        tr, surfaces, impl="token", with_context=False).select(cols).collect()))
    assert arrow == vec and len(arrow) > 0
