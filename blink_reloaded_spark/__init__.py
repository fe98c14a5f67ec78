"""blink_reloaded_spark — a PySpark-native record-linkage / entity-resolution engine.

A from-scratch re-expression of the semantics of Shoumik-Gandre/blink-reloaded
(BLINK-style two-stage entity linking, Wu et al. EMNLP 2020) as idiomatic Spark:

* **blocking** (the bi-encoder retrieval analogue, reference
  ``blink/main_dense.py:238-262``) = MinHash/LSH over token shingles plus
  random-hyperplane embedding buckets, expressed as DataFrame joins;
* **pairwise scoring** (the cross-encoder analogue, reference
  ``blink/crossencoder/crossencoder.py:130-139``) = Arrow-batched
  Jaro-Winkler / Levenshtein / embedding dot-product in vectorized pandas UDFs;
* **clustering** = iterative large-star/small-star connected components over
  the match-edge DataFrame (the reference groups mentions by predicted entity
  id, ``blink/candidate_ranking/bert_reranking.py:223-227``; transitive
  closure over accepted mention->entity edges reproduces that grouping).

Everything is DataFrame/Arrow-native: no RDDs, no per-row Python in hot paths.
"""

__version__ = "0.1.0"

from blink_reloaded_spark.session import get_spark  # noqa: F401
