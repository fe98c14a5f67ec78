#!/usr/bin/env python
"""Java-vs-Python CPU split of the ISOLATED mentions (extraction) stage at
2 vs 8 pinned cores (r7, VERDICT r6 #2): EXTRACTION_CONTENTION.json shows
the matcher kernel itself conserves CPU almost perfectly under 2->8
multiprocessing (inflation 1.025), so whatever inflates the 24M job's @8
CPU by ~1.4x lives OUTSIDE the kernel — the JVM side (text-column shuffle,
Arrow encode, block manager, GC) or the Python side's Arrow DECODE (the
standalone probe feeds pandas frames directly, skipping IPC).

Per level: fresh taskset-pinned JVM, same tmpfs-parquet input the scaling
campaign reads, warmup, then extract_mentions -> noop timed once with the
process tree's CPU split by image name. Writes MENTIONS_SPLIT.json.

Usage: python scripts/diagnose_mentions_split.py [n_convs] (default 320000
= 8M turns; the campaign corpus is 960000 = 24M — ratios are what matter).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import os, sys
os.makedirs("/dev/shm/spark-local", exist_ok=True)
sys.path.insert(0, %(root)r)
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
spark = get_spark(app_name="msplit-gen", master="local[16]",
                  shuffle_partitions=16,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
cat = datagen.EntityCatalog.build(n_entities=200)
tr, _ = datagen.generate_transcripts(spark, cat, n_convs=int(sys.argv[1]),
                                     turns_per_conv=25, hot_conv_factor=100)
tr.select("conv_id", "turn_idx", "text").repartition(96).write.mode(
    "overwrite").parquet(sys.argv[2])
print("GEN_OK", tr.count())
"""

WORKER = r"""
import json, os, sys, time
cpus = sys.argv[1]; inp = sys.argv[2]
os.makedirs("/dev/shm/spark-local", exist_ok=True)
sys.path.insert(0, %(root)r)
from pyspark.sql import functions as F
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
from blink_reloaded_spark.operators.mentions import extract_mentions
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
        except (OSError, ValueError):
            continue
        key = "java" if "java" in comm else (
            "python" if "py" in comm else "other")
        out[key] += j / tick
    return out

impl = os.environ.get("MSPLIT_IMPL", "token")
spark = get_spark(app_name=f"msplit-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
cat = datagen.EntityCatalog.build(n_entities=200)
surfaces = [a["surface"] for a in cat.aliases]
tr = spark.read.parquet(inp).repartition(96).localCheckpoint()
n = tr.count()
# warmup: matcher JIT + Python worker pool on a slice
warm = tr.limit(40000).localCheckpoint()
extract_mentions(warm, surfaces, with_context=False, impl=impl).write.format(
    "noop").mode("overwrite").save()
s0 = split_cpu(); t0 = time.time()
extract_mentions(tr, surfaces, with_context=False, impl=impl).write.format(
    "noop").mode("overwrite").save()
s1 = split_cpu(); wall = time.time() - t0
print(json.dumps({"cpus": int(cpus), "turns": n,
                  "wall_sec": round(wall, 2),
                  "java_cpu_sec": round(s1["java"] - s0["java"], 2),
                  "python_cpu_sec": round(s1["python"] - s0["python"], 2),
                  "other_cpu_sec": round(s1["other"] - s0["other"], 2)}))
"""


def _sub(code: str, *args: str, pin: int | None = None) -> str:
    argv = [sys.executable, "-c", code % {"root": ROOT}, *args]
    if pin:
        argv = ["taskset", "-c", f"0-{pin - 1}"] + argv
    r = subprocess.run(argv, capture_output=True, text=True, check=True)
    return r.stdout.strip().splitlines()[-1]


def main() -> None:
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    n_convs = sys.argv[1] if len(sys.argv) > 1 else "320000"
    impl = os.environ.get("MSPLIT_IMPL", "token")
    inp = "/dev/shm/msplit-input"
    print(_sub(GEN, n_convs, inp), flush=True)
    doc: dict = {"impl": impl}
    from blink_reloaded_spark.procstat import canary_seconds

    for cpus in ("2", "8"):
        can = canary_seconds()
        r = json.loads(_sub(WORKER, cpus, inp, pin=int(cpus)))
        r["canary_pre"] = can
        doc[cpus] = r
        print(json.dumps(r), flush=True)
    import shutil

    shutil.rmtree(inp, ignore_errors=True)
    doc["inflation"] = {
        k: round(doc["8"][f"{k}_cpu_sec"] / doc["2"][f"{k}_cpu_sec"], 3)
        if doc["2"][f"{k}_cpu_sec"] else None
        for k in ("java", "python")
    }
    doc["note"] = (
        "isolated extraction stage (read 96-split tmpfs parquet -> "
        "repartition -> mapInPandas matcher -> noop), fresh taskset-pinned "
        "JVM per level, warmed; CPU split by process image over the timed "
        "region. python includes Arrow decode (the standalone kernel probe "
        "excludes it); java includes the text shuffle + Arrow encode."
    )
    out_name = (
        "MENTIONS_SPLIT.json" if impl == "token"
        else f"MENTIONS_SPLIT_{impl}.json"
    )
    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
