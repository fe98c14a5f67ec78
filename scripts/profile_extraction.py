#!/usr/bin/env python
"""Extraction-stage profiling harness (VERDICT r3 #2: the 24M-turn job is
extraction-bound; find where the 2->8-core efficiency goes).

Modes:
  kernel  — run the batch-vectorized matcher kernel standalone (no Spark)
            with 1/2/8 multiprocessing workers over identical batches:
            separates pure-Python kernel scaling from Spark overheads.
  spark   — time extract_mentions on a tmpfs-parquet input at two core
            counts for each plan variant:
              repartition (current), coalesce (no-shuffle compaction),
              none (raw input splits)
            each in a fresh JVM, interleaved.

Usage: python scripts/profile_extraction.py kernel|spark [n_convs] [tpc]
Env: SPARK_GRAFT_TRIALS (default 2).
Prints JSON lines; this is a diagnosis tool, not a committed artifact
(the committed evidence stays BENCH_SCALING.json).
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
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
n_convs = int(sys.argv[1]); tpc = int(sys.argv[2]); out = sys.argv[3]
spark = get_spark(app_name="prof-gen", master="local[16]", shuffle_partitions=16,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
cat = datagen.EntityCatalog.build(n_entities=200)
tr, _ = datagen.generate_transcripts(spark, cat, n_convs=n_convs,
                                     turns_per_conv=tpc, hot_conv_factor=100)
tr.select("conv_id", "turn_idx", "text").repartition(96).write.mode(
    "overwrite").parquet(out)
print("GEN_OK", tr.count())
"""

SPARK_WORKER = r"""
import json, os, sys, time
cpus = sys.argv[1]; variant = sys.argv[2]; inp = sys.argv[3]
os.makedirs("/dev/shm/spark-local", exist_ok=True)
from pyspark.sql import functions as F
from blink_reloaded_spark.session import get_spark
from blink_reloaded_spark import datagen
from blink_reloaded_spark.operators.mentions import extract_mentions

spark = get_spark(app_name=f"prof-{cpus}-{variant}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
cat = datagen.EntityCatalog.build(n_entities=200)
surfaces = [a["surface"] for a in cat.aliases]
tr = spark.read.parquet(inp).repartition(96).localCheckpoint()
n = tr.count()
# warmup on a slice
extract_mentions(tr.limit(50000).localCheckpoint(), surfaces,
                 with_context=False).write.format("noop").mode("overwrite").save()

t0 = time.time()
extract_mentions(tr, surfaces, with_context=False,
                 partitioning=variant).write.format(
    "noop").mode("overwrite").save()
wall = time.time() - t0
print(json.dumps({"cpus": int(cpus), "variant": variant, "turns": n,
                  "wall_sec": round(wall, 2),
                  "turns_per_sec": round(n / wall)}))
"""


def kernel_mode() -> None:
    import multiprocessing as mp
    import time

    sys.path.insert(0, ROOT)
    from blink_reloaded_spark import datagen  # noqa: F401 (surfaces only)

    cat = datagen.EntityCatalog.build(n_entities=200)
    surfaces = [a["surface"] for a in cat.aliases]
    # synthesize turn texts like datagen's, deterministic
    import random

    rng = random.Random(7)
    alias = [a["surface"] for a in cat.aliases]
    texts = [
        f"so i was talking to {rng.choice(alias)} about the {rng.choice(alias)}"
        f" order number {rng.randrange(10**6)} yesterday"
        for _ in range(400_000)
    ]
    batches = [texts[i:i + 20000] for i in range(0, len(texts), 20000)]

    def run_batches(bs):
        import pandas as pd

        from blink_reloaded_spark.operators.mentions import _gen_token_vec

        gen = _gen_token_vec(surfaces, with_context=False)
        n = 0
        for b in bs:
            pdf = pd.DataFrame(
                {"conv_id": "c", "turn_idx": 0, "text": b}
            )
            for out in gen(iter([pdf])):
                n += len(out)
        return n

    for workers in (1, 2, 8):
        t0 = time.time()
        if workers == 1:
            run_batches(batches)
        else:
            chunks = [batches[i::workers] for i in range(workers)]
            with mp.Pool(workers) as p:
                p.map(_kernel_child, [(surfaces, c) for c in chunks])
        dt = time.time() - t0
        print(json.dumps({
            "workers": workers, "turns": len(texts),
            "wall_sec": round(dt, 2),
            "turns_per_sec_per_worker": round(len(texts) / dt / workers),
        }), flush=True)


def _kernel_child(args):
    surfaces, bs = args
    import pandas as pd

    from blink_reloaded_spark.operators.mentions import _gen_token_vec

    gen = _gen_token_vec(surfaces, with_context=False)
    n = 0
    for b in bs:
        pdf = pd.DataFrame({"conv_id": "c", "turn_idx": 0, "text": b})
        for out in gen(iter([pdf])):
            n += len(out)
    return n


def _sub(code: str, *args: str) -> str:
    out = subprocess.run([sys.executable, "-c", code, *args],
                         capture_output=True, text=True, cwd=ROOT)
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{") or l.startswith("GEN_OK")]
    if not lines:
        raise RuntimeError(f"subprocess failed:\n{out.stderr[-3000:]}")
    return lines[-1]


def spark_mode(n_convs: int, tpc: int) -> None:
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    variants = os.environ.get(
        "SPARK_GRAFT_VARIANTS", "repartition,coalesce,none"
    ).split(",")
    inp = "/dev/shm/prof-input"
    print(_sub(GEN, str(n_convs), str(tpc), inp), flush=True)
    for t in range(trials):
        for v in variants:
            for cpus in (2, 8):
                print(_sub(SPARK_WORKER, str(cpus), v, inp), flush=True)
    import shutil

    shutil.rmtree(inp, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if mode == "kernel":
        kernel_mode()
    else:
        spark_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 300000,
                   int(sys.argv[3]) if len(sys.argv) > 3 else 25)
