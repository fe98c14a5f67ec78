#!/usr/bin/env python
"""Where does the 2->8-core CPU inflation come from? (r5; companion to the
scaling_efficiency_cpu rows in BENCH_SCALING.json / BENCH_STAGES.json.)

Two measurements, written to CPU_CONTENTION.json:

1. `links_split` — run the isolated links stage (pre-materialized
   bench_stages inputs) at local[2] and local[8] in fresh JVMs, splitting
   the process-tree CPU delta by process image (java vs python). Shows
   whether the inflation lives in the JVM (GC/AQE/shuffle) or in the
   Python UDF workers.

2. `kernel_mp` — run the JW + embedding kernels standalone (no Spark, no
   Arrow) under multiprocessing with 2 vs 8 workers on identical total
   work, recording per-process time.process_time(). Any inflation here is
   pure memory-bus/cache contention on this single box — stalled cycles
   count as CPU time — i.e. a SINGLE-MACHINE artifact that a real 4N-
   executor cluster (more machines, more memory buses) does not pay.

Requires the bench_stages inputs: run
`SPARK_GRAFT_ENTITIES=20000 python scripts/bench_stages.py prep` first.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LINKS_WORKER = r"""
import json, os, sys, time
cpus = sys.argv[1]
os.makedirs("/dev/shm/spark-local", exist_ok=True)
from pyspark.sql import functions as F
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark.plans.pipeline import LinkagePipeline
from blink_reloaded_spark.procstat import _read_stats

def split_cpu():
    tick = os.sysconf("SC_CLK_TCK")
    stats = _read_stats()
    children = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    mine, stack = set(), [os.getpid()]
    while stack:
        p = stack.pop(); mine.add(p); stack.extend(children.get(p, []))
    out = {"java": 0.0, "python": 0.0, "other": 0.0}
    for p in mine:
        try:
            with open(f"/proc/{p}/stat") as f:
                st = f.read()
            comm = st[st.index("(") + 1:st.rindex(")")]
            fields = st[st.rindex(")") + 2:].split()
            j = sum(int(fields[k]) for k in (11, 12, 13, 14))
        except OSError:
            continue
        key = "java" if "java" in comm else (
            "python" if "py" in comm else "other")
        out[key] += j / tick
    return out

inp = "/dev/shm/stages-input"
spark = get_spark(app_name=f"cpusplit-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
pipe = LinkagePipeline.tuned(spark, 20000, collect_metrics=False)
surfaces_t = spark.read.parquet(inp + "/surfaces").localCheckpoint()
surfaces_t.count()
cands = spark.read.parquet(inp + "/cands").localCheckpoint()
cands.count()
from blink_reloaded_spark.functions.embedding import hashed_embedding_udf
from blink_reloaded_spark.functions.similarity import jaro_winkler_udf
spark.range(int(cpus) * 4).repartition(int(cpus)).select(
    hashed_embedding_udf(F.col("id").cast("string")).alias("v"),
    jaro_winkler_udf(F.col("id").cast("string"),
                     F.col("id").cast("string")).alias("j"),
).write.format("noop").mode("overwrite").save()
warm = cands.limit(20000).repartition(int(cpus)).localCheckpoint()
pipe.build_links_from(warm, surfaces_t).write.format("noop").mode(
    "overwrite").save()
time.sleep(2)
c0 = split_cpu(); t0 = time.time()
pipe.build_links_from(cands, surfaces_t).write.format("noop").mode(
    "overwrite").save()
wall = time.time() - t0
c1 = split_cpu()
print(json.dumps({"cpus": int(cpus), "wall_sec": round(wall, 2),
                  **{f"{k}_cpu_sec": round(c1[k] - c0[k], 1)
                     for k in c1}}))
"""


def _kernel_child(args):
    n_pairs, seed = args
    import random
    import time

    import pandas as pd

    from blink_reloaded_spark.functions.embedding import _embed_matrix
    from blink_reloaded_spark.functions.similarity import jaro_winkler_np

    rng = random.Random(seed)
    words = ["fejimo corp", "fejimo", "acme systems", "acme sys",
             "jopi widgets ltd", "jopi"]
    a = pd.Series([rng.choice(words) for _ in range(n_pairs)])
    b = pd.Series([rng.choice(words) for _ in range(n_pairs)])
    t0 = time.process_time()
    for i in range(0, n_pairs, 20000):
        jaro_winkler_np(a[i:i + 20000].reset_index(drop=True),
                        b[i:i + 20000].reset_index(drop=True))
        _embed_matrix(a[i:i + 20000].reset_index(drop=True))
    return time.process_time() - t0


def kernel_mp(total: int = 800_000) -> dict:
    import multiprocessing as mp
    import time

    sys.path.insert(0, ROOT)
    out = {}
    for workers in (2, 8):
        per = total // workers
        t0 = time.time()
        with mp.Pool(workers) as p:
            cpus = p.map(_kernel_child, [(per, w) for w in range(workers)])
        out[str(workers)] = {"wall_sec": round(time.time() - t0, 2),
                             "kernel_cpu_sec": round(sum(cpus), 2)}
    out["cpu_inflation_2_to_8"] = round(
        out["8"]["kernel_cpu_sec"] / out["2"]["kernel_cpu_sec"], 3)
    return out


def main() -> None:
    doc = {"kernel_mp": kernel_mp(), "links_split": {}}
    for cpus in ("2", "8"):
        r = subprocess.run([sys.executable, "-c", LINKS_WORKER, cpus],
                           capture_output=True, text=True, cwd=ROOT)
        lines = [l for l in r.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(r.stderr[-2000:])
        doc["links_split"][cpus] = json.loads(lines[-1])
    doc["note"] = (
        "links_split: isolated links stage, fresh JVM per level, process-"
        "tree CPU split by image name; kernel_mp: JW+embedding kernels "
        "standalone under multiprocessing, identical total work — CPU "
        "inflation there is memory-bus contention on this single box "
        "(stalled cycles bill as CPU time), which a multi-machine cluster "
        "does not share"
    )
    path = os.path.join(ROOT, "CPU_CONTENTION.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
