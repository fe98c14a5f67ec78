#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox proxy per driver instruction: the
same job at two parallelism levels, N and 4N cores, on identical input).

Protocol (noisy shared-disk sandbox -> control what we can):
* each parallelism level runs in a fresh JVM (subprocess);
* spark.local.dir on tmpfs (/dev/shm) so shuffle I/O variance from the
  shared sandbox disk doesn't pollute CPU-scaling measurements;
* Python UDF workers warmed up before timing (first-spawn import storms
  are a constant cost, not a per-turn cost);
* `trials` runs per level, best taken (standard for contended boxes);
* the job is the FULL pipeline from transcripts: regex mention extraction ->
  surface dedup+encode -> LSH blocking -> scoring -> argmax link -> CC.

Usage: python scripts/bench_scaling.py [n_convs] [turns_per_conv] [lo] [hi]
Writes BENCH_SCALING.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
cpus = sys.argv[1]
n_convs = int(sys.argv[2]); tpc = int(sys.argv[3]); trials = int(sys.argv[4])
n_entities = int(sys.argv[5]) if len(sys.argv) > 5 else 200
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
tr, _ = datagen.generate_transcripts(spark, cat, n_convs=n_convs,
                                     turns_per_conv=tpc, hot_conv_factor=100)
tr = tr.select("conv_id", "turn_idx", "text").localCheckpoint()
n_turns = tr.count()
surfaces = [a["surface"] for a in cat.aliases]
best = None
for t in range(trials):
    # autotuned blocking + block purging above the small-catalogue regime
    pipe = LinkagePipeline.tuned(spark, n_entities, collect_metrics=False)
    t0 = time.time()
    clusters = pipe.run(tr, cat.entities_df(spark), surfaces=surfaces)
    clusters.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    if best is None or wall < best["wall_sec"]:
        best = {"cpus": int(cpus), "turns": n_turns,
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_turns / wall, 1),
                "stage_sec": dict(pipe.metrics)}
print(json.dumps(best))
"""


def run(cpus: int, n_convs: int, tpc: int, trials: int = 3, n_entities: int = 200) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_convs), str(tpc),
         str(trials), str(n_entities)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 79000
    tpc = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    n_entities = int(os.environ.get("SPARK_GRAFT_ENTITIES", "200"))
    r_lo = run(lo, n_convs, tpc, n_entities=n_entities)
    r_hi = run(hi, n_convs, tpc, n_entities=n_entities)
    speedup = r_lo["wall_sec"] / r_hi["wall_sec"]
    efficiency = speedup / (hi / lo)
    result = {
        "job": f"linkage_pipeline_from_transcripts_{n_entities}ent",
        "n_entities": n_entities,
        "n_low": r_lo,
        "n_high": r_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "note": (
            f"sandbox proxy for N->4N executors: local[{lo}] vs local[{hi}], "
            "same input, fresh JVM per level, tmpfs shuffle dir, warmed UDF "
            "workers, best of 3 trials"
        ),
    }
    # merge per-job results so the standard and large-catalogue entries
    # coexist in one file
    path = "BENCH_SCALING.json"
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
        if "jobs" not in doc:
            doc = {"jobs": {doc.get("job", "previous"): doc}}
    else:
        doc = {"jobs": {}}
    doc["jobs"][result["job"]] = result
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
