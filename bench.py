#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology (VERDICT r2 #2: single numbers on this box are meaningless —
the shared disk stalls multi-second at random):
* every timed entry runs TRIALS times; the headline number is the MEDIAN;
* trials are INTERLEAVED (VERDICT r6 #1): sweep s runs trial s of EVERY
  entry before any entry gets trial s+1, so a degrading box window hurts
  all entries a little instead of whichever entry happened to run last
  fatally (r5: er04 9.4s; r6: pipeline 14.7s — both were late-window
  damage on unchanged-speed code, visible in their own CPU columns);
* every trial records wall, process-tree CPU, and a FIXED-WORK canary
  (procstat.canary_seconds: ~0.2 s of single-thread memory-streaming sums
  run immediately before the trial) — the canary is the box-health column
  the in-container covariate can't provide: bus pressure and core steal
  both stretch fixed work, so trials taken when canary >> campaign-min
  are self-evidently window-degraded;
* every individual trial is persisted in the JSON ("trials",
  "trials_cpu", "trials_canary") so any claim derived from this file is
  traceable to raw measurements;
* plans execute through the noop sink (full execution, no write cost, no
  count()-based plan pruning); UDF worker pool warmed before timing.

Headline ANN entry is ann05 (OR-amplified multi-table LSH, recall@5 ~0.9);
ann03 (single-table LSH) is measured for regression tracking but is a
baseline-only operator — its recall at this corpus's near-uniform vector
geometry is ~0 (see queries.py ann03 docstring).

dedup03 is timed on BOTH hash paths: portable poly_hash (the oracle-checked
default) and the xxhash64 production path (functions/hashing.xxhash64_mod)
— the delta is the interpreted-per-char-aggregate cost the portable oracle
contract pays.

Append-cost entries (VERDICT r6 #3 — the er05 oracle hash-proves append ==
recompute; these prove the COST claim "delta cost, not corpus cost"): the
~2M-turn corpus is split 90/10 by conv-id hash, the 90% base is clustered
once (untimed) into a state table, then `pipeline_append` times
run_kb_free_append of the 10% delta (guards ON — the honest production
path) against `kbfree_full_recompute` timing run_kb_free on the full 100%.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# driver default 3; override for quick local iteration only — committed
# BENCH numbers must come from the default
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from blink_reloaded_spark.session import get_spark
    from blink_reloaded_spark.queries import build_registry
    from blink_reloaded_spark.procstat import canary_seconds, tree_cpu_seconds

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="blink-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    # warm the Python UDF worker pool so the first query doesn't pay the
    # import storm
    from pyspark.sql import functions as F
    from blink_reloaded_spark.functions.embedding import hashed_embedding_udf
    from blink_reloaded_spark.functions.hashing import xxhash64_mod
    from blink_reloaded_spark.queries import dedup03_minhash_lsh

    n_cpus = int(cpus) if cpus.isdigit() else 32
    spark.range(n_cpus * 4).repartition(n_cpus).select(
        hashed_embedding_udf(F.col("id").cast("string"))
    ).write.format("noop").mode("overwrite").save()
    queries, _ = build_registry()

    def _gc_nudge():
        # bound cross-entry JVM state: a driver-GC pass lets ContextCleaner
        # reclaim superseded localCheckpoint blocks (the CC loop leaves ~3
        # tiny lazily-checkpointed RDDs per run until the next GC — measured
        # bounded in scripts/diag_er04_seq.py). Runs before EVERY trial of
        # EVERY entry — including pipeline_linkage, which r6 omitted
        # (ADVICE r6): the longest entry was the only one inheriting prior
        # JVM state.
        spark.sparkContext._jvm.System.gc()

    # ---- pipeline data prep (untimed) -------------------------------------
    # flagship linkage pipeline on ~2M generated turns
    from blink_reloaded_spark import datagen
    from blink_reloaded_spark.plans.pipeline import LinkagePipeline

    cat = datagen.EntityCatalog.build(n_entities=200)
    surfaces = [a["surface"] for a in cat.aliases]

    # steady-state measurement: one small end-to-end warmup run first (JIT,
    # codegen caches, Python worker pool for the mapInPandas/scorer paths) —
    # at 100 TB these costs amortize to zero, locally they double a single
    # cold run and swamp the number being measured
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
    n_turns = tr.count()

    def _run_pipeline():
        clusters = LinkagePipeline(spark, collect_metrics=False).run(
            tr, cat.entities_df(spark), surfaces=surfaces
        )
        _noop(clusters)

    # ---- append-cost data prep (untimed): 90/10 conv split, base state ----
    from blink_reloaded_spark.operators.mentions import extract_mentions

    tr_delta = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) == 0)
    tr_base = tr.where(F.pmod(F.crc32("conv_id"), F.lit(10)) != 0)
    n_delta = tr_delta.count()
    kb_pipe = LinkagePipeline(spark, collect_metrics=False)
    m_base = extract_mentions(tr_base, surfaces, with_context=False)
    state = LinkagePipeline.cluster_state(
        kb_pipe.run_kb_free(None, mentions=m_base), m_base
    ).localCheckpoint()
    state.count()
    surf_state = LinkagePipeline.surface_cluster_state(state).localCheckpoint()
    surf_state.count()

    def _run_kbfree_full():
        _noop(kb_pipe.run_kb_free(tr, surfaces=surfaces))

    def _run_append():
        # guards ON (validate_state + cap-invariant check) — the honest
        # production append cost, not a stripped fast path. output="delta"
        # + surface_state is the production protocol: the upsert shape
        # (rows absent = unchanged) with the previous batch's sunk
        # surface-level projection, so the only corpus-sized touch is the
        # changed-member filter scan (upsert==full recompute pinned by
        # tests/test_pipeline.py)
        _noop(
            kb_pipe.run_kb_free_append(
                tr_delta, state, surfaces=surfaces, output="delta",
                surface_state=surf_state,
            )
        )

    # ---- timed entries -----------------------------------------------------
    headline = [
        "q01_pricing_summary",
        "q03_topk_per_group",
        "q08_cumulative_window",
        "text01_quality",
        "dedup03_minhash_lsh",
        "ann05_multitable_lsh",
        "er04_clusters",
    ]
    # (name, fn, n_trials, bucket); pipeline_linkage FIRST in each sweep
    # (VERDICT r6 #1c) and with two extra trials (r4 recorded a 49.3s
    # disk-stall trial next to 14.2/13.0 — the median needs depth)
    entries = [("pipeline_linkage", _run_pipeline, max(TRIALS, 5), "headline")]
    for name in headline:
        entries.append(
            (
                name,
                (lambda n=name: _noop(queries[n](spark, sf_dir))),
                TRIALS,
                "headline",
            )
        )
    entries += [
        (
            "ann03_lsh_topk",
            lambda: _noop(queries["ann03_lsh_topk"](spark, sf_dir)),
            TRIALS,
            "extras",
        ),
        (
            "ann07_multiprobe_tables",
            lambda: _noop(queries["ann07_multiprobe_tables"](spark, sf_dir)),
            TRIALS,
            "extras",
        ),
        (
            "dedup03_minhash_lsh_xxh",
            lambda: _noop(dedup03_minhash_lsh(spark, sf_dir, hash_fn=xxhash64_mod)),
            TRIALS,
            "extras",
        ),
        ("kbfree_full_recompute", _run_kbfree_full, TRIALS, "extras"),
        ("pipeline_append", _run_append, TRIALS, "extras"),
    ]

    trials: dict[str, list[float]] = {n: [] for n, _, _, _ in entries}
    trials_cpu: dict[str, list[float]] = {n: [] for n, _, _, _ in entries}
    trials_canary: dict[str, list[float]] = {n: [] for n, _, _, _ in entries}
    max_trials = max(n for _, _, n, _ in entries)
    for sweep in range(max_trials):
        for name, fn, n, _ in entries:
            if sweep >= n:
                continue
            _gc_nudge()
            trials_canary[name].append(canary_seconds())
            c0 = tree_cpu_seconds()
            t0 = time.time()
            fn()
            trials[name].append(round(time.time() - t0, 3))
            trials_cpu[name].append(round(tree_cpu_seconds() - c0, 2))
        print(
            f"sweep {sweep}: "
            + " ".join(
                f"{n}={trials[n][sweep]}s" for n, _, k, _ in entries if sweep < k
            ),
            file=sys.stderr,
        )

    times: dict[str, float] = {}
    extra_times: dict[str, float] = {}
    for name, _, _, bucket in entries:
        med = statistics.median(trials[name])
        (times if bucket == "headline" else extra_times)[name] = med
        print(
            f"{name}: {med}s {trials[name]} cpu {trials_cpu[name]} "
            f"canary {trials_canary[name]}",
            file=sys.stderr,
        )

    # ANN recall vs the exact baseline (VERDICT r1: measure, don't just
    # oracle-check): recall@k of the bucketed paths against ann01
    from blink_reloaded_spark.eval import ann_recall_vs_exact

    exact = queries["ann01_cosine_topk"](spark, sf_dir).localCheckpoint()
    ann_recall = {
        "ann03_at_3": ann_recall_vs_exact(
            queries["ann03_lsh_topk"](spark, sf_dir), exact, k=3
        ),
        "ann05_at_5": ann_recall_vs_exact(
            queries["ann05_multitable_lsh"](spark, sf_dir), exact, k=5
        ),
        "ann06_at_3": ann_recall_vs_exact(
            queries["ann06_multiprobe_lsh"](spark, sf_dir), exact, k=3
        ),
        "ann07_at_5": ann_recall_vs_exact(
            queries["ann07_multiprobe_tables"](spark, sf_dir), exact, k=5
        ),
    }
    print(f"ann_recall: {ann_recall}", file=sys.stderr)

    turns_per_sec = round(n_turns / times["pipeline_linkage"], 1)
    append_ratio = round(
        extra_times["pipeline_append"] / extra_times["kbfree_full_recompute"], 3
    )
    print(
        f"pipeline_linkage: {times['pipeline_linkage']}s "
        f"({n_turns} turns, {turns_per_sec} turns/s); append "
        f"{extra_times['pipeline_append']}s vs full recompute "
        f"{extra_times['kbfree_full_recompute']}s (ratio {append_ratio} "
        f"at {round(n_delta / n_turns, 3)} delta fraction)",
        file=sys.stderr,
    )

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "extras": extra_times,
                "trials": trials,
                # per-trial process-tree CPU seconds (driver JVM + Python
                # workers): wall rising while CPU is flat = core-steal window;
                # both rising on unchanged code = bus-steal or real regression
                "trials_cpu": trials_cpu,
                # per-trial fixed-work canary wall (procstat.canary_seconds,
                # sampled immediately before the trial): canary/campaign-min
                # is the box slowdown factor during that window — the
                # bus-steal signal trials_cpu alone can't separate from a
                # real regression
                "trials_canary": trials_canary,
                "canary_min": min(min(v) for v in trials_canary.values()),
                # actual per-entry counts — pipeline_linkage runs
                # max(TRIALS, 5), so a single scalar misstates exactly the
                # headline entry (ADVICE r5)
                "trials_per_entry": {k: len(v) for k, v in trials.items()},
                # a non-default trial count must be self-evident in the
                # committed artifact, not just a comment (ADVICE r4)
                "trials_overridden": "SPARK_GRAFT_BENCH_TRIALS" in os.environ,
                "aggregation": "median, trials interleaved by sweep",
                "sf": sf,
                "pipeline_turns": n_turns,
                "pipeline_turns_per_sec": turns_per_sec,
                # append-cost evidence (VERDICT r6 #3): delta-shaped, not
                # corpus-shaped — ratio = append wall / full-recompute wall
                # at delta_fraction of new data
                "append_delta_turns": n_delta,
                "append_delta_fraction": round(n_delta / n_turns, 4),
                "append_vs_recompute_ratio": append_ratio,
                "ann_recall": ann_recall,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
