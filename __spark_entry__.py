"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship entity-resolution pipeline (mention extraction ->
LSH blocking -> Arrow-batched pair scoring -> large-star/small-star
clustering) on transcripts derived from the sf0.001 documents table.
`queries()` / `oracle_sql()` expose the SURVEY.md §2 operator inventory plus
the dedup / ANN / text-analysis suite, each with a DuckDB oracle
(blink_reloaded_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from blink_reloaded_spark.queries import build_registry

_QUERIES, _ORACLES = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full linkage over sf0.001-derived transcripts — the real
    operators (mapInPandas extractor, MinHash blocking, pandas-UDF scorer,
    connected components), not the SQL-parity variants."""
    from pyspark.sql import functions as F

    from blink_reloaded_spark.functions.embedding import hashed_embedding_udf
    from blink_reloaded_spark.operators.blocking import blocking_keys, candidate_pairs
    from blink_reloaded_spark.operators.clustering import connected_components
    from blink_reloaded_spark.operators.mentions import extract_mentions
    from blink_reloaded_spark.operators.scoring import match_edges, score_pairs
    from blink_reloaded_spark.queries import ER_DICT, _derived_transcripts

    sf_dir = "/root/testdata/sf0.001"
    tr = _derived_transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    mentions = extract_mentions(tr, ER_DICT)
    nodes = mentions.select(
        F.col("mention_id").alias("id"), F.col("mention").alias("text")
    ).withColumn("vec", hashed_embedding_udf(F.col("text")))
    keys = blocking_keys(nodes, bands=8, rows=1, shingle_k=2)
    pairs = candidate_pairs(keys, max_block=5000)
    na = nodes.select(
        F.col("id").alias("a"), F.col("text").alias("a_text"), F.col("vec").alias("a_vec")
    )
    nb = nodes.select(
        F.col("id").alias("b"), F.col("text").alias("b_text"), F.col("vec").alias("b_vec")
    )
    scored = score_pairs(pairs.join(na, "a").join(nb, "b"), a_vec="a_vec", b_vec="b_vec")
    edges = match_edges(scored, 0.79)
    cc = connected_components(edges, nodes=nodes.select("id"))
    return cc.select(
        F.col("node").alias("mention_id"), F.col("component").alias("cluster_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ dedup/ANN/
    text suites). Each callable takes (spark, sf_dir) -> DataFrame."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every query (pre-registered views:
    region nation customer supplier part orders lineitem events documents
    embeddings)."""
    return dict(_ORACLES)
