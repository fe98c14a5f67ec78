#!/usr/bin/env python
"""Append-cost evidence at a corpus size where corpus-shaped work dominates
fixed job latency (VERDICT r6 #3: er05 hash-proves append == recompute;
this proves the COST claim — appending a 10% delta must cost delta-shaped
time, not corpus-shaped time).

Protocol: generate N turns once, split 90/10 by conv-id hash, cluster the
90% base once (untimed) into the mention-level state + the surface-level
projection (the production sink pair), then time
  * full_recompute : run_kb_free over 100% of the corpus
  * append_delta   : run_kb_free_append(delta, state, output="delta",
                     surface_state=...) — guards ON, the honest production
                     upsert path
interleaved (full, append) x TRIALS in one JVM after a small end-to-end
warmup, each trial carrying wall + process-tree CPU + the fixed-work canary
(procstat). The bench.py entries track the same pair per-round at the 2M
bench corpus, where ~5s of serial job-latency floor compresses the ratio;
this script is the asymptotic read.

Usage: python scripts/bench_append.py [n_convs] [turns_per_conv]
Env: SPARK_GRAFT_TRIALS (default 3). Writes BENCH_APPEND.json.
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
    tpc = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    from pyspark.sql import functions as F

    from blink_reloaded_spark import datagen
    from blink_reloaded_spark.operators.mentions import extract_mentions
    from blink_reloaded_spark.plans.pipeline import LinkagePipeline
    from blink_reloaded_spark.procstat import canary_seconds, tree_cpu_seconds
    from blink_reloaded_spark.session import get_spark

    spark = get_spark(
        app_name="bench-append",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cat = datagen.EntityCatalog.build(n_entities=200)
    surfaces = [a["surface"] for a in cat.aliases]

    # warmup: JIT/codegen/UDF workers through BOTH plan shapes
    wtr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=4000, turns_per_conv=tpc, hot_conv_factor=10
    )
    wtr = wtr.select("conv_id", "turn_idx", "text").localCheckpoint()
    pipe = LinkagePipeline(spark, collect_metrics=False)
    wm = extract_mentions(wtr, surfaces, with_context=False)
    wstate = LinkagePipeline.cluster_state(
        pipe.run_kb_free(None, mentions=wm), wm
    ).localCheckpoint()
    noop(pipe.run_kb_free(wtr, surfaces=surfaces))
    noop(
        pipe.run_kb_free_append(
            wtr, wstate, surfaces=surfaces, output="delta",
            surface_state=LinkagePipeline.surface_cluster_state(wstate),
        )
    )

    tr, _ = datagen.generate_transcripts(
        spark, cat, n_convs=n_convs, turns_per_conv=tpc, hot_conv_factor=100
    )
    tr = tr.select("conv_id", "turn_idx", "text").localCheckpoint()
    n_turns = tr.count()
    # the delta arrives as its OWN materialized batch (in production it is
    # its own input table, never a filter over the clustered corpus)
    tr_delta = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) == 0).localCheckpoint()
    tr_base = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) != 0)
    n_delta = tr_delta.count()

    m_base = extract_mentions(tr_base, surfaces, with_context=False)
    state = LinkagePipeline.cluster_state(
        pipe.run_kb_free(None, mentions=m_base), m_base
    ).localCheckpoint()
    n_state = state.count()
    surf_state = LinkagePipeline.surface_cluster_state(state).localCheckpoint()
    surf_state.count()

    def run_full():
        noop(pipe.run_kb_free(tr, surfaces=surfaces))

    def run_append():
        noop(
            pipe.run_kb_free_append(
                tr_delta, state, surfaces=surfaces, output="delta",
                surface_state=surf_state,
            )
        )

    res = {"full_recompute": [], "append_delta": []}
    for t in range(trials):
        for name, fn in (("full_recompute", run_full), ("append_delta", run_append)):
            spark.sparkContext._jvm.System.gc()
            can = canary_seconds()
            c0, t0 = tree_cpu_seconds(), time.time()
            fn()
            wall = round(time.time() - t0, 3)
            cpu = round(tree_cpu_seconds() - c0, 2)
            res[name].append({"wall": wall, "cpu": cpu, "canary": can})
            print(f"trial {t} {name}: {wall}s wall {cpu}s cpu canary {can}",
                  flush=True)

    med = {
        k: {
            "wall": statistics.median(r["wall"] for r in v),
            "cpu": statistics.median(r["cpu"] for r in v),
        }
        for k, v in res.items()
    }
    out = {
        "job": "kb_free_append_vs_recompute",
        "n_turns": n_turns,
        "n_delta_turns": n_delta,
        "delta_fraction": round(n_delta / n_turns, 4),
        "n_state_rows": n_state,
        "cpus": cpus,
        "trials": res,
        "median": med,
        "append_vs_recompute_wall": round(
            med["append_delta"]["wall"] / med["full_recompute"]["wall"], 3
        ),
        "append_vs_recompute_cpu": round(
            med["append_delta"]["cpu"] / med["full_recompute"]["cpu"], 3
        ),
        "note": (
            "append = run_kb_free_append(output='delta', surface_state sunk "
            "by the previous batch, guards ON); trials interleaved "
            "(full, append) per round in one JVM, tmpfs shuffle dir, "
            "fixed-work canary per trial (procstat.canary_seconds); the "
            "upsert==recompute equality is pinned by tests/test_pipeline.py "
            "and the er05 driver oracle"
        ),
    }
    # merge by corpus size: the 2M bench-corpus read and the asymptotic
    # larger-corpus reads are BOTH evidence (the ratio falls as the fixed
    # serial job latency shrinks relative to corpus-shaped work)
    path = os.path.join(ROOT, "BENCH_APPEND.json")
    doc = {"job": "kb_free_append_vs_recompute", "runs": {}}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if "runs" in prev:
            doc = prev
        elif "n_turns" in prev:  # legacy single-run format
            doc["runs"][str(prev["n_turns"])] = {
                k: v for k, v in prev.items() if k != "job"
            }
    doc["runs"][str(n_turns)] = {k: v for k, v in out.items() if k != "job"}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "trials"}, indent=1))


if __name__ == "__main__":
    main()
