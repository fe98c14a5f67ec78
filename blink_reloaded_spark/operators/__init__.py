"""Pipeline operators: mention extraction (U1), blocking (J7/J8 analogue),
pairwise scoring (U4), transitive clustering, dedup & ANN operators."""

from blink_reloaded_spark.operators.mentions import extract_mentions  # noqa: F401
from blink_reloaded_spark.operators.blocking import (  # noqa: F401
    blocking_keys,
    candidate_pairs,
)
from blink_reloaded_spark.operators.scoring import score_pairs  # noqa: F401
from blink_reloaded_spark.operators.clustering import connected_components  # noqa: F401
