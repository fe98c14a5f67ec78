#!/usr/bin/env python
"""Golden accuracy rollup — the reference's de-facto acceptance artifact
(`blink/run_benchmark.py:13-94` runs every dataset through the pipeline and
emits ONE ROW PER DATASET with accuracy columns; `blink/evaluate.py:32-64`
the per-split variant). Here the "datasets" are the three deterministic
fixture suites the engine is accepted on (FIXTURES.md):

  standard   — 200-entity catalogue, 50-conv fixture, KB linkage
  large_cat  — 20k-entity catalogue, tuned blocking + purge + top-16 budget
               (labeled pairs from a 25% mention sample: the hot surface
               makes the full pair self-join quadratic)
  kb_free    — no catalogue: LSH self-join + transitive clustering at
               threshold 0.70 (diagnosed r4, scripts/diagnose_kb_free.py:
               at the old 0.8 threshold, 81/83 missed gold pairs were
               BLOCKED but under-scored — abbreviation pairs like
               "jopi systems"~"jopi sys" score 0.794 — and only 2/83 were
               LSH misses; the sweep gives recall 1.0 at precision
               0.9989 for thr in [0.60, 0.70] vs recall 0.92 at 0.80
               with precision unchanged at 0.9988, so 0.70 dominates
               and BOTH precision and recall are gated now)

Writes GOLDEN_ROLLUP.json {one row per dataset: precision/recall/f1,
mention + cluster counts, wall seconds} and prints the markdown table for
BASELINE.md. Deterministic: same seed -> same numbers.

Usage: python scripts/run_benchmark.py [--out GOLDEN_ROLLUP.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blink_reloaded_spark import datagen  # noqa: E402
from blink_reloaded_spark.eval import pairwise_f1  # noqa: E402
from blink_reloaded_spark.plans.pipeline import LinkagePipeline  # noqa: E402
from blink_reloaded_spark.session import get_spark  # noqa: E402


def _labeled_pairs(me):
    """FIXTURES F4 labeled pairs, blocked on the 2-char prefix (the same
    block the fixtures guarantee gold pairs share)."""
    a = me.select(
        F.col("mention_id").alias("mention_a"),
        F.col("label_id").alias("la"),
        F.substring("mention", 1, 2).alias("k"),
    )
    b = me.select(
        F.col("mention_id").alias("mention_b"),
        F.col("label_id").alias("lb"),
        F.substring("mention", 1, 2).alias("k"),
    )
    return (
        a.join(b, "k")
        .where(F.col("mention_a") < F.col("mention_b"))
        .withColumn("is_match", (F.col("la") == F.col("lb")) & (F.col("la") >= 0))
        .select("mention_a", "mention_b", "is_match")
    )


def _row(name, clusters, pairs, n_mentions, wall):
    m = pairwise_f1(clusters, pairs)
    return {
        "dataset": name,
        "n_mentions": n_mentions,
        "n_clusters": clusters.select("component").distinct().count(),
        "precision": round(m["precision"], 5),
        "recall": round(m["recall"], 5),
        "f1": round(m["f1"], 5),
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    out_path = "GOLDEN_ROLLUP.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark(
        app_name="golden-rollup", master="local[8]", shuffle_partitions=8
    )
    rows = []

    # -- standard ----------------------------------------------------------
    cat = datagen.EntityCatalog.build(n_entities=200)
    tr, me = datagen.generate_transcripts(
        spark, cat, n_convs=50, turns_per_conv=10, hot_conv_factor=10
    )
    me = me.localCheckpoint()
    t0 = time.time()
    clusters = LinkagePipeline(spark, collect_metrics=False).run(
        tr, cat.entities_df(spark), mentions=me
    ).localCheckpoint()
    rows.append(
        _row("standard", clusters, _labeled_pairs(me), me.count(), time.time() - t0)
    )

    # -- large catalogue (tuned) ------------------------------------------
    cat20 = datagen.EntityCatalog.build(n_entities=20_000)
    tr20, me20 = datagen.generate_transcripts(
        spark, cat20, n_convs=800, turns_per_conv=10, hot_conv_factor=10
    )
    me20 = me20.localCheckpoint()
    t0 = time.time()
    c20 = LinkagePipeline.tuned(spark, 20_000, collect_metrics=False).run(
        tr20, cat20.entities_df(spark), mentions=me20
    ).localCheckpoint()
    # content-hashed 25% sample, NOT df.sample(fraction, seed): Spark's
    # sample draws per-partition, so the picked rows depend on the physical
    # row->partition layout — measured: identical code, two sessions, the
    # golden f1 wobbled in its 6th decimal while the cluster assignments
    # were bit-identical (diffed row-by-row). A hash of the row's id is a
    # pure function of content, so the labeled-pair sample (and hence the
    # golden numbers) is now session-invariant.
    sample = me20.where(
        F.pmod(F.xxhash64("mention_id", F.lit(7)), F.lit(4)) == 0
    ).localCheckpoint()
    rows.append(
        _row("large_cat_20k", c20, _labeled_pairs(sample), me20.count(),
             time.time() - t0)
    )

    # -- kb-free -----------------------------------------------------------
    cat_kf = datagen.EntityCatalog.build(n_entities=30)
    tr_kf, me_kf = datagen.generate_transcripts(
        spark, cat_kf, n_convs=30, turns_per_conv=8, hot_conv_factor=5
    )
    me_kf = me_kf.localCheckpoint()
    t0 = time.time()
    ckf = LinkagePipeline(spark, threshold=0.70, collect_metrics=False).run_kb_free(
        tr_kf, mentions=me_kf
    ).localCheckpoint()
    rows.append(
        _row("kb_free", ckf, _labeled_pairs(me_kf), me_kf.count(), time.time() - t0)
    )

    doc = {"rows": rows, "gates": {
        "standard_f1": ">=0.99", "large_cat_20k_f1": ">=0.99",
        "kb_free_precision": ">=0.95", "kb_free_recall": ">=0.95",
    }}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)

    hdr = ["dataset", "n_mentions", "n_clusters", "precision", "recall", "f1",
           "wall_sec"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r[h]) for h in hdr) + " |")

    ok = (
        rows[0]["f1"] >= 0.99
        and rows[1]["f1"] >= 0.99
        and rows[2]["precision"] >= 0.95
        and rows[2]["recall"] >= 0.95
    )
    print(f"\ngates {'PASS' if ok else 'FAIL'} -> {out_path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
