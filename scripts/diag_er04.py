#!/usr/bin/env python
"""VERDICT r5 #2 diagnosis: er04's driver-bench trials rose monotonically
[6.84, 9.37, 14.95] on unchanged code while the same-day self-run was flat.
Run er04 N consecutive trials in one bench-shaped process and record, per
trial: wall, process-tree CPU, /dev/shm/spark-local bytes, persistent-RDD
count+bytes, and JVM heap — whichever curve rises with the wall curve is
the accumulator."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(os.environ.get("DIAG_TRIALS", "8"))


def shm_bytes(path="/dev/shm/spark-local") -> int:
    try:
        out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
        return int(out.stdout.split()[0])
    except Exception:
        return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from blink_reloaded_spark.session import get_spark
    from blink_reloaded_spark.queries import build_registry
    from blink_reloaded_spark.procstat import tree_cpu_seconds

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="diag-er04",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    queries, _ = build_registry()
    sc = spark.sparkContext

    def jvm_stats():
        rt = sc._jvm.java.lang.Runtime.getRuntime()
        heap_used = rt.totalMemory() - rt.freeMemory()
        prdds = sc._jsc.getPersistentRDDs()
        return heap_used, prdds.size()

    rows = []
    for i in range(N):
        h0, p0 = jvm_stats()
        s0 = shm_bytes()
        c0 = tree_cpu_seconds()
        t0 = time.time()
        queries["er04_clusters"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.time() - t0, 3)
        cpu = round(tree_cpu_seconds() - c0, 2)
        h1, p1 = jvm_stats()
        s1 = shm_bytes()
        row = {
            "trial": i,
            "wall": wall,
            "cpu": cpu,
            "shm_mb": round(s1 / 1e6, 1),
            "shm_delta_mb": round((s1 - s0) / 1e6, 1),
            "persistent_rdds": p1,
            "rdds_delta": p1 - p0,
            "heap_mb": round(h1 / 1e6, 1),
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
