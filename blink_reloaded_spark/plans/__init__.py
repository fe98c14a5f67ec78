from blink_reloaded_spark.plans.pipeline import LinkagePipeline  # noqa: F401
