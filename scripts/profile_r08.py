#!/usr/bin/env python
"""Round-8 optimization profiler: isolate each bench entry with the noop
sink (guide §1.4), record wall + process-tree CPU per trial, and dump
`.explain("formatted")` plans to plans/r08/<name>_<tag>.txt.

Usage:
    python scripts/profile_r08.py [tag] [entry ...]

Entries default to the full bench set. Tag defaults to "before".
This is a measurement harness only — bench.py stays the driver contract.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = int(os.environ.get("PROFILE_TRIALS", "3"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from blink_reloaded_spark.session import get_spark
    from blink_reloaded_spark.queries import build_registry, dedup03_minhash_lsh
    from blink_reloaded_spark.functions.hashing import xxhash64_mod
    from blink_reloaded_spark.procstat import tree_cpu_seconds

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="profile-r08",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    from pyspark.sql import functions as F
    from blink_reloaded_spark.functions.embedding import hashed_embedding_udf

    n_cpus = int(cpus)
    spark.range(n_cpus * 4).repartition(n_cpus).select(
        hashed_embedding_udf(F.col("id").cast("string"))
    ).write.format("noop").mode("overwrite").save()
    queries, _ = build_registry()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    pipe_entries = {"pipeline_linkage", "kbfree_full_recompute", "pipeline_append"}
    need_pipe = not only or bool(only & pipe_entries)
    pipelines = {}
    if need_pipe:
        # pipeline data prep (untimed) — same shapes as bench.py
        from blink_reloaded_spark import datagen
        from blink_reloaded_spark.plans.pipeline import LinkagePipeline
        from blink_reloaded_spark.operators.mentions import extract_mentions

        cat = datagen.EntityCatalog.build(n_entities=200)
        surfaces = [a["surface"] for a in cat.aliases]
        wtr, _ = datagen.generate_transcripts(
            spark, cat, n_convs=4000, turns_per_conv=25, hot_conv_factor=10
        )
        LinkagePipeline(spark, collect_metrics=False).run(
            wtr.select("conv_id", "turn_idx", "text"), cat.entities_df(spark),
            surfaces=surfaces,
        ).write.format("noop").mode("overwrite").save()
        tr, _ = datagen.generate_transcripts(
            spark, cat, n_convs=79900, turns_per_conv=25, hot_conv_factor=100
        )
        tr = tr.select("conv_id", "turn_idx", "text").localCheckpoint()
        tr.count()

        tr_delta = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) == 0)
        tr_base = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) != 0)
        kb_pipe = LinkagePipeline(spark, collect_metrics=False)
        m_base = extract_mentions(tr_base, surfaces, with_context=False)
        state = LinkagePipeline.cluster_state(
            kb_pipe.run_kb_free(None, mentions=m_base), m_base
        ).localCheckpoint()
        state.count()
        surf_state = LinkagePipeline.surface_cluster_state(state).localCheckpoint()
        surf_state.count()

    def _pipe_run():
        p = LinkagePipeline(spark, collect_metrics=False)
        out = p.run(tr, cat.entities_df(spark), surfaces=surfaces)
        pipelines["pipeline_linkage"] = p
        return out

    def _kbfree():
        return kb_pipe.run_kb_free(tr, surfaces=surfaces)

    def _append():
        return kb_pipe.run_kb_free_append(
            tr_delta, state, surfaces=surfaces, output="delta",
            surface_state=surf_state,
        )

    entries = [
        ("pipeline_linkage", _pipe_run),
        ("q01_pricing_summary", lambda: queries["q01_pricing_summary"](spark, sf_dir)),
        ("q03_topk_per_group", lambda: queries["q03_topk_per_group"](spark, sf_dir)),
        ("q08_cumulative_window", lambda: queries["q08_cumulative_window"](spark, sf_dir)),
        ("text01_quality", lambda: queries["text01_quality"](spark, sf_dir)),
        ("dedup03_minhash_lsh", lambda: queries["dedup03_minhash_lsh"](spark, sf_dir)),
        ("ann05_multitable_lsh", lambda: queries["ann05_multitable_lsh"](spark, sf_dir)),
        ("er04_clusters", lambda: queries["er04_clusters"](spark, sf_dir)),
        ("ann03_lsh_topk", lambda: queries["ann03_lsh_topk"](spark, sf_dir)),
        ("ann07_multiprobe_tables", lambda: queries["ann07_multiprobe_tables"](spark, sf_dir)),
        ("dedup03_minhash_lsh_xxh", lambda: dedup03_minhash_lsh(spark, sf_dir, hash_fn=xxhash64_mod)),
        ("kbfree_full_recompute", _kbfree),
        ("pipeline_append", _append),
    ]
    if only:
        entries = [e for e in entries if e[0] in only]

    results = {}
    for name, fn in entries:
        walls, cpus_l = [], []
        for t in range(TRIALS):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            c0 = tree_cpu_seconds()
            t0 = time.time()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            cpus_l.append(round(tree_cpu_seconds() - c0, 2))
            spark.sparkContext.setJobDescription(None)
            if t == 0:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
                if name in pipelines:
                    print(f"  {name} stage metrics: {pipelines[name].metrics}",
                          file=sys.stderr)
        results[name] = {"walls": walls, "cpus": cpus_l}
        print(f"{name}: walls {walls} cpus {cpus_l}", file=sys.stderr)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
