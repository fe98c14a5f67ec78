#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox proxy per driver instruction: the
same job at two parallelism levels, N and 4N cores, on identical input).

Protocol (noisy shared-tenant sandbox -> control what we can):
* the input is generated ONCE and written to tmpfs parquet — every trial
  at every level reads byte-identical data;
* each TRIAL runs in a fresh JVM (subprocess) — no cross-trial block-
  manager/JIT/GC contamination (round-3 finding: repeated trials in one
  JVM drifted +40% run-over-run);
* levels are INTERLEAVED in PAIRS — pair t runs (lo, hi) on even t and
  (hi, lo) on odd t, so the two halves of a pair share a box window and
  linear window drift cancels across pairs; the HEADLINE estimator is the
  median of per-pair efficiencies (VERDICT r5 #1 — ratio-of-medians is
  kept alongside but mixes windows), and every trial carries a host-load
  covariate (procstat.system_cpu_sample: off-container busy cores during
  the trial) so a noisy pair is attributable rather than anonymous;
* inside each JVM: UDF worker pool warm + ONE small end-to-end pipeline
  warmup (JIT, codegen caches, Python workers for the JW/dot stages —
  measured: a cold first run is ~2x steady state, and the cold penalty is
  a larger fraction of the faster level's wall, biasing efficiency down);
* best-of-trials per level;
* the job is the FULL pipeline from transcripts: regex mention extraction ->
  surface dedup+encode -> LSH blocking -> scoring -> argmax link -> CC.

Usage: python scripts/bench_scaling.py [n_convs] [turns_per_conv] [lo] [hi]
Env: SPARK_GRAFT_ENTITIES (catalogue size), SPARK_GRAFT_TRIALS (default 3).
Writes BENCH_SCALING.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

GEN = r"""
import os, sys
os.makedirs("/dev/shm/spark-local", exist_ok=True)
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
n_convs = int(sys.argv[1]); tpc = int(sys.argv[2]); n_entities = int(sys.argv[3])
out = sys.argv[4]
hot_pct = int(os.environ.get("SPARK_GRAFT_HOT_PCT", "30"))
spark = get_spark(app_name="scaling-gen", master="local[16]",
                  shuffle_partitions=16,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
cat = datagen.EntityCatalog.build(n_entities=n_entities)
tr, _ = datagen.generate_transcripts(spark, cat, n_convs=n_convs,
                                     turns_per_conv=tpc, hot_conv_factor=100,
                                     hot_mention_pct=hot_pct)
# write enough splits that every tested core count can COALESCE into its
# task layout instead of shuffling the full text column (a 100TB input
# always has plenty of splits; a 19-split local file would be the
# small-data artifact) — see operators/mentions.extract_mentions "auto"
tr.select("conv_id", "turn_idx", "text").repartition(96).write.mode(
    "overwrite").parquet(out)
print("GEN_OK", tr.count())
"""

WORKER = r"""
import json, os, sys, time
cpus = sys.argv[1]
tpc = int(sys.argv[2]); n_entities = int(sys.argv[3]); inp = sys.argv[4]
os.makedirs("/dev/shm/spark-local", exist_ok=True)
from pyspark.sql import functions as F
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
from blink_reloaded_spark.plans.pipeline import LinkagePipeline
from blink_reloaded_spark.functions.embedding import hashed_embedding_udf

spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
# warm the Python UDF worker pool (import cost is constant, not per-turn)
spark.range(int(cpus) * 4).repartition(int(cpus)).select(
    hashed_embedding_udf(F.col("id").cast("string"))
).write.format("noop").mode("overwrite").save()

cat = datagen.EntityCatalog.build(n_entities=n_entities)
surfaces = [a["surface"] for a in cat.aliases]
# identical bytes at every level and trial: read the pre-generated input.
# Spread to 96 partitions BEFORE the (untimed) localCheckpoint: the parquet
# reader re-bins small files into ~128MB splits, which would defeat the
# extractor's no-shuffle coalesce path; a production table at this scale
# always has a fine-grained layout
tr = spark.read.parquet(inp).repartition(96).localCheckpoint()
n_turns = tr.count()
# steady-state: one end-to-end warmup (JIT + codegen + JW/dot Python
# workers) before the single timed run of this JVM. 4000 convs, not a
# token slice: the scorer/linker plan shapes must run at enough volume
# that the timed run executes COMPILED code — measured in-job links wall
# was ~2.5x its isolated-warm cost with a 500-conv warmup
wtr, _ = datagen.generate_transcripts(spark, cat, n_convs=4000,
                                      turns_per_conv=tpc, hot_conv_factor=10)
LinkagePipeline.tuned(spark, n_entities, collect_metrics=False).run(
    wtr.select("conv_id", "turn_idx", "text"), cat.entities_df(spark),
    surfaces=surfaces,
).write.format("noop").mode("overwrite").save()

from blink_reloaded_spark.procstat import (
    canary_mt_seconds, canary_seconds, system_cpu_sample, tree_cpu_seconds,
)

pipe = LinkagePipeline.tuned(spark, n_entities, collect_metrics=False)
# fixed-work canary + host CPU sample bracketing EXACTLY the timed region
# (ADVICE r6: the lifetime-average covariate dilutes a neighbor burst
# concentrated in the measured window below the quiet gate; the canary is
# additionally the bus-health instrument the /proc covariate is blind to)
can0 = canary_seconds()
canmt0 = canary_mt_seconds()
s0 = system_cpu_sample()
c0 = tree_cpu_seconds()
t0 = time.time()
clusters = pipe.run(tr, cat.entities_df(spark), surfaces=surfaces)
clusters.write.format("noop").mode("overwrite").save()
wall = time.time() - t0
cpu = tree_cpu_seconds() - c0
s1 = system_cpu_sample()
can1 = canary_seconds()
canmt1 = canary_mt_seconds()
print(json.dumps({"cpus": int(cpus), "turns": n_turns,
                  "wall_sec": round(wall, 2),
                  "cpu_sec": round(cpu, 2),
                  # host-wide busy/steal CPU over the timed window only —
                  # the parent derives the in-window off-container covariate
                  # as (sys_busy_delta - cpu_sec) / wall_sec
                  "sys_busy_delta": round(s1["busy"] - s0["busy"], 2),
                  "sys_steal_delta": round(s1["steal"] - s0["steal"], 2),
                  # fixed-work canary walls immediately before/after the
                  # timed run: canary / campaign-min = box slowdown factor
                  "canary_pre": can0, "canary_post": can1,
                  # multi-stream bus canary (r7, DIAGNOSTIC only — see
                  # procstat.canary_mt_seconds: per-level comparisons only)
                  "canary_mt_pre": canmt0, "canary_mt_post": canmt1,
                  # whole-subprocess tree CPU (gen read + warmup + timed
                  # run): kept for the LIFETIME covariate (r5/r6 continuity)
                  "proc_cpu_total": round(tree_cpu_seconds(), 2),
                  "turns_per_sec": round(n_turns / wall, 1),
                  "stage_sec": dict(pipe.metrics)}))
"""

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:  # the parent imports procstat for the covariate
    sys.path.insert(0, ROOT)


# Pin each measured trial to exactly its core count (taskset 0..N-1),
# default ON (r6): local[N] alone caps TASK slots at N but lets the JVM's
# GC/compiler/background threads (sized for the 32-core box) and the
# shuffle/IO machinery run on every idle core — measured utilization at
# the "2-core" level was 1.39 cores, i.e. the low level silently borrowed
# ~40% extra compute, overstating its throughput and biasing efficiency
# DOWN. The driver's mandate is "the same job at N and 4N CORES"; pinning
# makes N cores literal (a real 2-core executor cannot run GC on a
# neighbor's cores). Set SPARK_GRAFT_PIN=0 for the pre-r6 unpinned
# behavior. Measured on the isolated mentions stage (5.9M turns): pinned
# CPU inflation 2->8 drops 1.24-1.34x -> 1.05-1.20x and wall efficiency
# rises 0.66-0.78 -> 0.74-0.88.
PIN = os.environ.get("SPARK_GRAFT_PIN", "1") != "0"


def _sub(code: str, *args: str, pin_cpus: int | None = None) -> str:
    argv = [sys.executable, "-c", code, *args]
    if PIN and pin_cpus:
        argv = ["taskset", "-c", f"0-{pin_cpus - 1}"] + argv
    out = subprocess.run(
        argv,
        capture_output=True, text=True, cwd=ROOT,
    )
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{") or l.startswith("GEN_OK")]
    if not lines:
        raise RuntimeError(f"subprocess failed:\n{out.stderr[-3000:]}")
    return lines[-1]


def _timed_trial(cpus: int, tpc: int, n_entities: int, inp: str) -> dict:
    """Run one WORKER subprocess and attach the host-load covariate: the
    box-wide busy-CPU delta MINUS the CPU our own run consumed, divided by
    wall — i.e. the average number of cores burned by OFF-container
    neighbors while the trial ran (VERDICT r5 #1: makes a noisy pair
    attributable rather than anonymous). /proc/stat here is the host view,
    so the subtraction is meaningful.

    The HEADLINE covariate is computed by the worker over exactly the
    timed window (ADVICE r6 — the lifetime average diluted in-window
    bursts); the subprocess-lifetime variant is kept as *_lifetime for
    r5/r6 continuity."""
    import time

    from blink_reloaded_spark.procstat import system_cpu_sample

    s0, t0 = system_cpu_sample(), time.time()
    r = json.loads(_sub(WORKER, str(cpus), str(tpc), str(n_entities), inp,
                        pin_cpus=cpus))
    s1, sub_wall = system_cpu_sample(), time.time() - t0
    off_life = s1["busy"] - s0["busy"] - r.get("proc_cpu_total", 0.0)
    r["host_offcontainer_cores_lifetime"] = round(
        max(off_life, 0.0) / sub_wall, 2
    )
    off_win = r.get("sys_busy_delta", 0.0) - r["cpu_sec"]
    r["host_offcontainer_cores"] = round(max(off_win, 0.0) / r["wall_sec"], 2)
    r["host_steal_cores"] = round(
        r.get("sys_steal_delta", 0.0) / r["wall_sec"], 3
    )
    r["canary"] = round(
        (r.get("canary_pre", 0.0) + r.get("canary_post", 0.0)) / 2, 4
    )
    r["canary_mt"] = round(
        (r.get("canary_mt_pre", 0.0) + r.get("canary_mt_post", 0.0)) / 2, 4
    )
    return r


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 79000
    tpc = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    n_entities = int(os.environ.get("SPARK_GRAFT_ENTITIES", "200"))
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    # hot-SURFACE skew knob (north_rule): % of mention slots drawn as the
    # single hottest dictionary surface; datagen default 30 (every
    # committed entry already carries a 30%-hot surface), a _hot60 entry
    # evidences the skew path explicitly
    hot_pct = int(os.environ.get("SPARK_GRAFT_HOT_PCT", "30"))
    hot_tag = f"_hot{hot_pct}" if hot_pct != 30 else ""

    inp = "/dev/shm/scaling-input"
    print(_sub(GEN, str(n_convs), str(tpc), str(n_entities), inp), flush=True)

    results: dict[int, list[dict]] = {lo: [], hi: []}
    for t in range(trials):
        # PAIR-ordered interleaving: even pairs run (lo, hi), odd pairs
        # (hi, lo), so neither level systematically gets the earlier (and
        # on a drifting box, quieter/noisier) half of its window
        order = (lo, hi) if t % 2 == 0 else (hi, lo)
        for cpus in order:
            r = _timed_trial(cpus, tpc, n_entities, inp)
            results[cpus].append(r)
            print(f"pair {t} local[{cpus}]: {r['wall_sec']}s wall, "
                  f"{r['cpu_sec']}s cpu, off-container "
                  f"{r['host_offcontainer_cores']} cores, canary "
                  f"{r['canary']}s, canary_mt {r['canary_mt']}s", flush=True)
    shutil.rmtree(inp, ignore_errors=True)

    import statistics

    r_lo = min(results[lo], key=lambda r: r["wall_sec"])
    r_hi = min(results[hi], key=lambda r: r["wall_sec"])
    med = {c: statistics.median(r["wall_sec"] for r in results[c])
           for c in (lo, hi)}
    med_cpu = {c: statistics.median(r["cpu_sec"] for r in results[c])
               for c in (lo, hi)}
    # ratio-of-medians (r4/r5 continuity) — mixes box windows
    efficiency = (med[lo] / med[hi]) / (hi / lo)
    efficiency_best = (r_lo["wall_sec"] / r_hi["wall_sec"]) / (hi / lo)
    efficiency_cpu_rom = med_cpu[lo] / med_cpu[hi]
    # HEADLINE (VERDICT r5 #1): median of PER-PAIR efficiencies — the two
    # halves of pair t ran back-to-back in the same box window, so window
    # drift cancels inside each pair instead of landing on one side of a
    # cross-window ratio. CPU-based pairs measure work conservation
    # (core-steal-immune, bus-steal shared within the pair's window);
    # wall-based pairs are the raw throughput view.
    pair_eff_cpu = [
        results[lo][t]["cpu_sec"] / results[hi][t]["cpu_sec"]
        for t in range(trials)
    ]
    pair_eff_wall = [
        (results[lo][t]["wall_sec"] / results[hi][t]["wall_sec"]) / (hi / lo)
        for t in range(trials)
    ]
    efficiency_cpu = statistics.median(pair_eff_cpu)
    efficiency_wall_paired = statistics.median(pair_eff_wall)
    # CANARY-NORMALIZED paired estimator (VERDICT r6 #2b, pre-registered):
    # the fixed-work canary bracketing each timed run measures the box
    # slowdown factor during that trial's window — bus steal and core steal
    # both stretch fixed work, and the /proc covariate sees neither when
    # the neighbor load is off-container bus traffic. Model: billed CPU
    # inflates proportionally to the canary factor, so normalized CPU =
    # cpu * (ref / canary) and the per-pair efficiency becomes
    # (cpu_lo/cpu_hi) * (canary_hi/canary_lo) — the campaign reference
    # cancels. Raw pairs stay the headline; this column ATTRIBUTES a miss
    # to box degradation rather than replacing the raw number.
    pair_eff_cpu_canary = [
        round(
            pair_eff_cpu[t]
            * (results[hi][t]["canary"] / results[lo][t]["canary"]),
            3,
        )
        if results[lo][t].get("canary") and results[hi][t].get("canary")
        else None
        for t in range(trials)
    ]
    _cc = [x for x in pair_eff_cpu_canary if x is not None]
    efficiency_cpu_canary = round(statistics.median(_cc), 3) if _cc else None
    # Covariate-gated view (VERDICT r5 #1's second acceptance path): a pair
    # is QUIET when neither half saw >= 0.5 off-container busy cores while
    # it ran. The gate is on the covariate, never on the measured outcome —
    # the threshold is pre-registered here, and the full ungated pair list
    # stays the headline alongside. Rationale: the r6 24M campaign showed
    # pair efficiency falling monotonically with the @8 half's neighbor
    # load (0.22 cores -> 0.896, 0.88 -> 0.715, 1.03 -> 0.340) — neighbor
    # load is an off-container nuisance variable a real cluster would not
    # share with this single box.
    QUIET_CORES = 0.5
    pair_load = [
        max(results[lo][t]["host_offcontainer_cores"],
            results[hi][t]["host_offcontainer_cores"])
        for t in range(trials)
    ]
    quiet_cpu = [pair_eff_cpu[t] for t in range(trials)
                 if pair_load[t] < QUIET_CORES]
    quiet_wall = [pair_eff_wall[t] for t in range(trials)
                  if pair_load[t] < QUIET_CORES]
    efficiency_cpu_quiet = (
        round(statistics.median(quiet_cpu), 3) if quiet_cpu else None
    )
    efficiency_wall_quiet = (
        round(statistics.median(quiet_wall), 3) if quiet_wall else None
    )
    # campaign label (r7): prior rounds renamed JSON keys by hand to keep
    # superseded campaigns alongside the fresh one — make that a knob
    suffix = os.environ.get("SPARK_GRAFT_JOB_SUFFIX", "")
    result = {
        "job": (
            f"linkage_pipeline_from_transcripts_{n_entities}ent{hot_tag}"
            + (f"_{suffix}" if suffix else "")
        ),
        "n_entities": n_entities,
        "hot_mention_pct": hot_pct,
        "pinned_cores": PIN,
        "n_low": r_lo,
        "n_high": r_hi,
        "median_wall_sec": {str(c): round(med[c], 2) for c in (lo, hi)},
        "median_cpu_sec": {str(c): round(med_cpu[c], 2) for c in (lo, hi)},
        "utilization": {
            str(c): round(med_cpu[c] / (med[c] * c), 3) for c in (lo, hi)
        },
        "trials": {str(c): [r["wall_sec"] for r in rs]
                   for c, rs in results.items()},
        "trials_cpu": {str(c): [r["cpu_sec"] for r in rs]
                       for c, rs in results.items()},
        "trials_offcontainer_cores": {
            str(c): [r["host_offcontainer_cores"] for r in rs]
            for c, rs in results.items()
        },
        "trials_offcontainer_cores_lifetime": {
            str(c): [r.get("host_offcontainer_cores_lifetime") for r in rs]
            for c, rs in results.items()
        },
        # all canary samples committed (VERDICT r6 #2b acceptance): per
        # trial, the fixed-work walls immediately before/after the timed run
        "trials_canary": {
            str(c): [[r.get("canary_pre"), r.get("canary_post")] for r in rs]
            for c, rs in results.items()
        },
        "pair_eff_cpu": [round(x, 3) for x in pair_eff_cpu],
        "pair_eff_cpu_canary": pair_eff_cpu_canary,
        "scaling_efficiency_cpu_canary": efficiency_cpu_canary,
        "pair_eff_wall": [round(x, 3) for x in pair_eff_wall],
        "pair_offcontainer_cores": [round(x, 2) for x in pair_load],
        "quiet_pair_gate_cores": QUIET_CORES,
        "quiet_pairs_n": len(quiet_cpu),
        "scaling_efficiency_cpu_quiet": efficiency_cpu_quiet,
        "scaling_efficiency_wall_quiet": efficiency_wall_quiet,
        "speedup": round(med[lo] / med[hi], 3),
        "scaling_efficiency": round(efficiency, 3),
        "scaling_efficiency_best": round(efficiency_best, 3),
        "scaling_efficiency_cpu": round(efficiency_cpu, 3),
        "scaling_efficiency_cpu_rom": round(efficiency_cpu_rom, 3),
        "scaling_efficiency_wall_paired": round(efficiency_wall_paired, 3),
        "aggregation": (
            "HEADLINE scaling_efficiency_cpu = median of per-pair CPU "
            "ratios (pair = back-to-back lo/hi trials sharing a box "
            "window, order alternating); *_cpu_quiet/*_wall_quiet = same "
            "median over pairs whose covariate (max off-container busy "
            "cores across the two halves, measured over exactly the timed "
            "window since r7 — ADVICE r6) < quiet_pair_gate_cores — gated "
            "on the covariate only, pre-registered; *_cpu_canary = per-pair "
            "CPU ratio normalized by the fixed-work canary slowdown factor "
            "(cpu_lo/cpu_hi * canary_hi/canary_lo) — attributes bus-steal "
            "the covariate can't see; *_rom = ratio-of-medians kept for "
            "r4/r5 continuity; *_best kept for r2-r4 continuity"
        ),
        "note": (
            f"sandbox proxy for N->4N executors: local[{lo}] vs local[{hi}]"
            + (f", each trial taskset-pinned to its {lo}/{hi} cores (an "
               "honest N-core executor: unpinned, the low level's JVM "
               "background threads borrowed ~40% extra compute — "
               "utilization@2 was 1.39)" if PIN else " (UNPINNED — pre-r6 "
               "protocol)")
            + ", identical tmpfs-parquet input, fresh JVM per TRIAL, pair-"
            "ordered interleaving, tmpfs shuffle dir, warmed UDF workers + "
            f"one end-to-end warmup per JVM, {trials} pairs (all trials "
            "recorded); CPU metric is core-steal-immune but NOT bus-steal-"
            "immune (CPU_CONTENTION.json) — per-trial "
            "trials_offcontainer_cores records the off-container host load "
            "so noisy pairs are attributable; utilization = cpu/(wall*cores)"
        ),
    }
    path = os.path.join(ROOT, "BENCH_SCALING.json")
    doc = {"jobs": {}}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
        if "jobs" not in doc:
            doc = {"jobs": {doc.get("job", "previous"): doc}}
    doc["jobs"][result["job"]] = result
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
