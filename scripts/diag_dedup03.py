#!/usr/bin/env python
"""Per-tier decomposition of dedup03 (VERDICT r6 #5: flat ~6s for three
rounds, and the xxhash64 production variant measures +22% over the portable
poly_hash default — find where the 6s lives and why the 'fast' hash costs
more).

Tiers timed cumulatively through the noop sink (each adds one tier on top
of the previous, same localCheckpoint boundaries as the query):
  t0_shingles   : read + repartition + normalize + 5-gram shingles (ckpt)
  t1_sig_table  : MinHash signature table, 18 hashes (ckpt)
  t2_band_join  : band-key self-join -> distinct candidate pairs
  t3_sig_filter : + signature-agreement >= 0.5 filter (two sig joins)
  t4_exact      : + exact-jaccard verify (the full query)

Writes DIAG_DEDUP03.json. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_TRIALS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)

    from pyspark.sql import functions as F

    from blink_reloaded_spark.functions import text as tx
    from blink_reloaded_spark.functions.hashing import (
        band_keys_from_sig_table,
        minhash_sig_table,
        sig_agreement,
        sig_array_from_sig_table,
        xxhash64_mod,
    )
    from blink_reloaded_spark.procstat import canary_seconds, tree_cpu_seconds
    from blink_reloaded_spark.queries import DEDUP_BANDS, DEDUP_ROWS, DEDUP_TAU, T
    from blink_reloaded_spark.session import get_spark

    spark = get_spark(
        app_name="diag-dedup03", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    par = spark.sparkContext.defaultParallelism
    nh = DEDUP_BANDS * DEDUP_ROWS

    def tiers(hash_fn):
        d = (
            T(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(par)
            .select("doc_id", tx.normalize_text(F.col("text")).alias("nt"))
            .select(
                "doc_id", tx.char_shingles(F.col("nt"), 5, normalize=False).alias("sh")
            )
        )

        def t0():
            return d.localCheckpoint()

        def t1(dd):
            return minhash_sig_table(
                dd, "doc_id", F.col("sh"), nh, hash_fn=hash_fn
            ).localCheckpoint()

        def t2(dd, sig_t):
            keys = band_keys_from_sig_table(
                sig_t, DEDUP_BANDS, DEDUP_ROWS
            ).withColumnRenamed("id", "doc_id").withColumnRenamed("block_key", "bk")
            return (
                keys.alias("x").join(keys.alias("y"), "bk")
                .where(F.col("x.doc_id") < F.col("y.doc_id"))
                .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
                .distinct()
            )

        def t3(dd, sig_t, cand):
            sigs = sig_array_from_sig_table(sig_t, nh)
            return (
                cand.join(sigs.select(F.col("id").alias("a"), F.col("sig").alias("siga")), "a")
                .join(sigs.select(F.col("id").alias("b"), F.col("sig").alias("sigb")), "b")
                .where(sig_agreement(F.col("siga"), F.col("sigb")) >= 0.5)
                .select("a", "b")
            )

        def t4(dd, cand):
            e = dd.select("doc_id", F.explode("sh").alias("s"))
            sz = dd.select("doc_id", F.size("sh").alias("n"))
            ni = (
                cand.join(e.select(F.col("doc_id").alias("a"), "s"), "a")
                .join(e.select(F.col("doc_id").alias("b"), "s"), ["b", "s"])
                .groupBy("a", "b")
                .agg(F.count("*").alias("ni"))
            )
            return (
                ni.join(sz.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
                .join(sz.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
                .withColumn(
                    "jacc",
                    F.round(
                        F.col("ni")
                        / (F.col("na") + F.col("nb") - F.col("ni")).cast("double"),
                        6,
                    ),
                )
                .where(F.col("jacc") >= DEDUP_TAU)
                .select("a", "b", "jacc")
            )

        return t0, t1, t2, t3, t4

    results: dict[str, dict] = {}
    counts: dict[str, dict] = {}
    for hname, hfn in (("poly_hash", None), ("xxhash64", xxhash64_mod)):
        t0, t1, t2, t3, t4 = tiers(hfn)
        walls: dict[str, list] = {k: [] for k in
                                  ("t0_shingles", "t1_sig_table", "t2_band_join",
                                   "t3_sig_filter", "t4_exact")}
        cpus = {k: [] for k in walls}
        cans = {k: [] for k in walls}
        for tr in range(trials):
            spark.sparkContext._jvm.System.gc()

            def timed(key, fn):
                cans[key].append(canary_seconds())
                c0, w0 = tree_cpu_seconds(), time.time()
                out = fn()
                walls[key].append(round(time.time() - w0, 3))
                cpus[key].append(round(tree_cpu_seconds() - c0, 2))
                return out

            dd = timed("t0_shingles", t0)
            sig_t = timed("t1_sig_table", lambda: t1(dd))
            cand = timed("t2_band_join", lambda: t2(dd, sig_t).localCheckpoint())
            filt = timed("t3_sig_filter", lambda: t3(dd, sig_t, cand).localCheckpoint())
            timed("t4_exact", lambda: noop(t4(dd, filt)))
            if tr == 0:
                counts[hname] = {
                    "band_candidates": cand.count(),
                    "sig_survivors": filt.count(),
                }
        results[hname] = {
            "wall_median": {k: statistics.median(v) for k, v in walls.items()},
            "cpu_median": {k: statistics.median(v) for k, v in cpus.items()},
            "walls": walls, "cpus": cpus, "canary": cans,
            "total_wall_median": round(
                sum(statistics.median(v) for v in walls.values()), 3
            ),
        }

    out = {
        "sf_dir": sf_dir, "trials": trials,
        "bands": DEDUP_BANDS, "rows": DEDUP_ROWS, "tau": DEDUP_TAU,
        "counts": counts, "tiers": results,
        "note": (
            "cumulative tiers with the query's own localCheckpoint "
            "boundaries; t2/t3 are checkpointed HERE to be timeable "
            "separately (the query fuses them), so total != query wall "
            "exactly — per-tier attribution is the point"
        ),
    }
    with open(os.path.join(ROOT, "DIAG_DEDUP03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "tiers"}, indent=1))
    for h, r in results.items():
        print(h, json.dumps(r["wall_median"]), "cpu", json.dumps(r["cpu_median"]))


if __name__ == "__main__":
    main()
