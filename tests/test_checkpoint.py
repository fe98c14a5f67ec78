"""Checkpoint manager: resume-without-recompute, lineage manifests."""

from __future__ import annotations

import json
import os

from blink_reloaded_spark.sources.checkpoint import CheckpointManager


def test_stage_skips_after_completion(spark, tmp_path):
    root = str(tmp_path / "ck")
    ckpt = CheckpointManager(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    df1 = ckpt.stage("s1", build, inputs=["raw"])
    assert calls["n"] == 1 and df1.count() == 10
    df2 = ckpt.stage("s1", build)
    assert calls["n"] == 1, "stage must not recompute"
    assert df2.count() == 10
    # manifest carries lineage + metrics
    man = json.load(open(os.path.join(root, "s1", "_MANIFEST.json")))
    assert man["rows"] == 10 and man["inputs"] == ["raw"]
    assert ckpt.log[-1].get("resumed") is True


def test_incomplete_checkpoint_recomputes(spark, tmp_path):
    """A killed write (data files but no manifest) must be redone."""
    root = str(tmp_path / "ck2")
    ckpt = CheckpointManager(spark, root)
    os.makedirs(os.path.join(root, "s1"), exist_ok=True)
    with open(os.path.join(root, "s1", "part-00000.parquet"), "w") as f:
        f.write("garbage")  # simulates a torn write, no _MANIFEST.json
    df = ckpt.stage("s1", lambda: spark.range(3))
    assert df.count() == 3
