"""The flagship end-to-end linkage pipeline (SURVEY.md §7.1), each stage an
idempotent checkpointed job:

  1. mentions    — mention extraction from transcripts (U1)
  2. nodes       — hashed embeddings for mentions + entity anchors (U2/U3)
  3. candidates  — LSH blocking keys; mention⋈entity equi-join (J7/J8)
  4. links       — Arrow-batched pair scorer -> per-mention argmax link (U4/W4)
  5. clusters    — large-star/small-star connected components over link edges

Mirrors the reference's DAG (`examples/zeshel/README.md:11-38`, SURVEY.md
§3.3): retrieval bounds the candidate set (O2), the cross-encoder scores
pairs, argmax picks the link, and mentions sharing a predicted entity form a
cluster (§7.0) — realized here as transitive closure over accepted
mention->entity edges, with cluster ids canonicalized to the minimum mention
id (deterministic under partitioning / row order).

Scale notes:
* candidate generation is a key equi-join (linear in Σ_key |m_k|·|e_k|),
  never a mention×mention cross product;
* entity anchors live in a disjoint negative id space so mention and entity
  ids share one node domain for clustering;
* every stage checkpoint is an idempotent table -> kill/rerun resumes
  (sources/checkpoint.py), satisfying the north_rule resume requirement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_reloaded_spark.functions.embedding import hashed_embedding_udf
from blink_reloaded_spark.functions.text import tokens
from blink_reloaded_spark.operators.blocking import (
    blocking_keys,
    mention_entity_candidates,
)
from blink_reloaded_spark.operators.clustering import connected_components
from blink_reloaded_spark.operators.mentions import extract_mentions
from blink_reloaded_spark.operators.scoring import (
    DEFAULT_THRESHOLD,
    link_best,
    score_pairs,
)
from blink_reloaded_spark.sources.checkpoint import CheckpointManager

# entity anchor ids: disjoint negative id space below -1 (NIL stays -1)
ENTITY_ID_OFFSET = -1_000_000


def _prefix_key(text_col: str) -> F.Column:
    """Cheap second key family: first token. Guarantees head-word
    abbreviation candidates ("acme" -> "acme corp") that MinHash bands can
    miss at low shingle-jaccard; hot first-token keys are handled by the
    skew machinery, not by dropping the key."""
    return F.concat(F.lit("pfx|"), F.element_at(tokens(F.col(text_col)), 1))


@dataclass
class LinkagePipeline:
    spark: SparkSession
    checkpoint_dir: str | None = None
    # recall-oriented blocking: single-row bands over 3-char shingles give
    # per-band hit prob = shingle-jaccard; 12 bands -> recall 1-(1-j)^12
    # (j=0.4 -> 0.998). The scorer filters the extra candidates.
    bands: int = 12
    rows: int = 1
    shingle_k: int = 3
    threshold: float = DEFAULT_THRESHOLD
    max_block: int = 1000
    metrics: dict[str, Any] = field(default_factory=dict)

    def run(
        self,
        transcripts: DataFrame,
        entities: DataFrame,
        surfaces: list[str] | None = None,
        mentions: DataFrame | None = None,
    ) -> DataFrame:
        """Run end-to-end; returns (node, component) over mention ids —
        i.e. (mention_id, cluster_id), cluster ids = min mention id.

        `mentions` may be supplied directly (pre-extracted, e.g. the gold
        fixture); otherwise `surfaces` drives dictionary extraction (U1).
        """
        ckpt = (
            CheckpointManager(self.spark, self.checkpoint_dir)
            if self.checkpoint_dir
            else None
        )

        def stage(name: str, build, **kw) -> DataFrame:
            if ckpt:
                return ckpt.stage(name, build, **kw)
            # no checkpoint store: still materialize each stage once —
            # downstream actions (stage metrics, CC iterations) must not
            # re-execute the upstream DAG (the scorer in particular)
            return build().localCheckpoint()

        # -- 1. mentions ----------------------------------------------------
        def build_mentions() -> DataFrame:
            if mentions is not None:
                return mentions
            assert surfaces is not None, "need surfaces or mentions"
            return extract_mentions(transcripts, surfaces)

        m = stage("mentions", build_mentions, inputs=["transcripts"])
        self.metrics["mentions"] = m.count()

        # -- 2. nodes (encode) ------------------------------------------------
        def build_nodes() -> DataFrame:
            ment_nodes = m.select(
                F.col("mention_id").alias("id"),
                F.col("mention").alias("text"),
                F.lit(True).alias("is_mention"),
            )
            ent_nodes = entities.select(
                (F.lit(ENTITY_ID_OFFSET) - F.col("entity_id")).alias("id"),
                F.lower(F.col("title")).alias("text"),
                F.lit(False).alias("is_mention"),
            )
            both = ment_nodes.unionByName(ent_nodes)
            return both.withColumn("vec", hashed_embedding_udf(F.col("text")))

        nodes = stage("nodes", build_nodes, inputs=["mentions", "entities"])

        # -- 3. candidates ---------------------------------------------------
        def build_candidates() -> DataFrame:
            keyed = nodes.withColumn("prefix_key", _prefix_key("text"))
            mk = blocking_keys(
                keyed.where("is_mention"),
                id_col="id",
                text_col="text",
                bands=self.bands,
                rows=self.rows,
                shingle_k=self.shingle_k,
                extra_key_cols=["prefix_key"],
            )
            ek = blocking_keys(
                keyed.where("NOT is_mention"),
                id_col="id",
                text_col="text",
                bands=self.bands,
                rows=self.rows,
                shingle_k=self.shingle_k,
                extra_key_cols=["prefix_key"],
            )
            return mention_entity_candidates(mk, ek)

        cands = stage("candidates", build_candidates, inputs=["nodes"])
        self.metrics["candidate_pairs"] = cands.count()

        # -- 4. scoring + argmax link ------------------------------------------
        def build_links() -> DataFrame:
            na = nodes.select(
                F.col("id").alias("a"),
                F.col("text").alias("a_text"),
                F.col("vec").alias("a_vec"),
            )
            nb = nodes.select(
                F.col("id").alias("b"),
                F.col("text").alias("b_text"),
                F.col("vec").alias("b_vec"),
            )
            scored = score_pairs(
                cands.join(na, "a").join(nb, "b"), a_vec="a_vec", b_vec="b_vec"
            )
            return link_best(scored, self.threshold)

        links = stage("links", build_links, inputs=["candidates", "nodes"])
        self.metrics["links"] = links.count()

        # -- 5. clustering -----------------------------------------------------
        def build_clusters() -> DataFrame:
            edges = links.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            comps = connected_components(
                edges, nodes=nodes.where("is_mention").select("id")
            )
            ments = comps.join(
                nodes.where("is_mention").select(F.col("id").alias("node")), "node"
            )
            cmin = ments.groupBy("component").agg(F.min("node").alias("cluster_id"))
            return ments.join(cmin, "component").select("node", "cluster_id")

        clusters = stage("clusters", build_clusters, inputs=["links"])
        self.metrics["clusters"] = clusters.select("cluster_id").distinct().count()
        return clusters.select("node", F.col("cluster_id").alias("component"))
