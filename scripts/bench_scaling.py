#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox proxy per driver instruction: the
same job at local[8] vs local[32] on identical input).

Runs the flagship linkage pipeline on the same generated transcript corpus
at both parallelism levels (each in a fresh JVM via subprocess so executor
thread pools don't interfere), reports turns/sec at both plus
efficiency = (T_8 * 8) / (T_32 * 32) ... i.e. speedup/4.

Usage: python scripts/bench_scaling.py [n_convs] [turns_per_conv]
Writes BENCH_SCALING.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
cpus = sys.argv[1]
n_convs = int(sys.argv[2]); tpc = int(sys.argv[3])
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
from blink_reloaded_spark.plans.pipeline import LinkagePipeline

spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
cat = datagen.EntityCatalog.build(n_entities=200)
tr, me = datagen.generate_transcripts(spark, cat, n_convs=n_convs,
                                      turns_per_conv=tpc, hot_conv_factor=100)
tr = tr.localCheckpoint(); me = me.localCheckpoint()
n_turns = tr.count()
t0 = time.time()
clusters = LinkagePipeline(spark).run(tr, cat.entities_df(spark), mentions=me)
clusters.write.format("noop").mode("overwrite").save()
wall = time.time() - t0
print(json.dumps({"cpus": int(cpus), "turns": n_turns, "wall_sec": round(wall, 2),
                  "turns_per_sec": round(n_turns / wall, 1)}))
"""


def run(cpus: int, n_convs: int, tpc: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_convs), str(tpc)],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1900
    tpc = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    r8 = run(8, n_convs, tpc)
    r32 = run(32, n_convs, tpc)
    speedup = r8["wall_sec"] / r32["wall_sec"]
    efficiency = speedup / (32 / 8)
    result = {
        "job": "linkage_pipeline",
        "n_low": r8,
        "n_high": r32,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "note": "sandbox proxy for N->4N executors: local[8] vs local[32], same input",
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
