"""Sources & sinks: testdata table registry, checkpoint manager (the
Iceberg-shaped resume mechanism), and stage-metrics lineage writer."""

from blink_reloaded_spark.sources.tables import load_table, TABLES  # noqa: F401
from blink_reloaded_spark.sources.checkpoint import CheckpointManager  # noqa: F401
