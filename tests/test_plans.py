"""Physical-plan assertions: the plans must be the ones you'd want at 100 TB
— filters pushed to the parquet scan, columns pruned, dimension joins
broadcast, no cartesian products in the LSH paths."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_UNIT


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_UNIT)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q03_topk_per_group")
    assert "PushedFilters: [IsNotNull(o_totalprice)" in plan or "GreaterThanOrEqual(o_totalprice" in plan
    # column pruning: the lineitem scan must not read l_tax / l_returnflag
    scan = [l for l in plan.splitlines() if "lineitem" in l and "ReadSchema" in l]
    assert scan and "l_tax" not in scan[0] and "l_returnflag" not in scan[0]


def test_dim_join_broadcast(spark):
    plan = _plan(spark, "q02_dim_join_rollup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_cartesian_in_lsh_paths(spark):
    for name in ("dedup03_minhash_lsh", "ann03_lsh_topk", "er02_candidate_pairs"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_anti_semi_join_strategies(spark):
    assert "LeftAnti" in _plan(spark, "q04_anti_join")
    assert "LeftSemi" in _plan(spark, "q05_semi_join")


def test_stable_ids_no_single_partition_exchange(spark):
    # W6 at scale: the two-phase id assignment must never funnel the data
    # through one task (the round-1 global-sort row_number did)
    plan = _plan(spark, "q09_stable_ids")
    assert "SinglePartition" not in plan


def test_wholestage_codegen_in_text_kernels(spark):
    # the portable hash kernels must stay JVM-side (no Python eval nodes)
    for name in ("text03_fingerprint", "dedup04_simhash", "multimodal01_metadata"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
