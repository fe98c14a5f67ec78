"""Deterministic synthetic fixtures (FIXTURES.md F1-F5): entity catalogue,
multi-turn transcripts with embedded mentions, gold labels and clusters.

The transcript generator is **distributed and scale-free**: `spark.range`
over turns + xxhash64-derived pseudo-random choices + one broadcast join to
the alias catalogue. The same generator produces 2k turns for unit tests and
tens of millions for the scaling bench — no driver-side loops over rows.

Skew fixtures (north_rule "hot conversations and skewed mention frequencies"):
* ~30% of all mentions use alias 0 of entity 0 (hot mention surface);
* conv 0 gets ~20x the turns of a typical conversation (hot conv key).

Determinism: fixed seed 42; ids dense; xxhash64 of literal keys only.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEED = 42

_CONSONANTS = "bcdfghjklmnprstvwz"
_VOWELS = "aeiou"
_SUFFIXES = ["corp", "inc", "labs", "systems", "group", "tech", "co", "ltd"]

_TEMPLATES_PRE = [
    "I was talking to ",
    "Earlier today we met with ",
    "The ticket mentions ",
    "Can you check whether ",
    "Our records show that ",
    "According to the report, ",
]
_TEMPLATES_MID = [
    " has already signed with ",
    " was acquired by ",
    " is not the same as ",
    " filed a complaint against ",
    " partnered with ",
]
_TEMPLATES_TAIL = [
    " last week.",
    " according to the notes.",
    " before the deadline.",
    " in the Q3 review.",
    ".",
]

NIL_SURFACES = ["zzyzx holdings", "qwrk industries", "vvlt partners"]


def _pseudo_word(rng: random.Random, syllables: int) -> str:
    return "".join(
        rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(syllables)
    )


def _typo(rng: random.Random, s: str, ops: int) -> str:
    """Realistic typos: single-char edits, never in the first two characters
    (the Jaro-Winkler prefix-stability assumption — humans rarely fumble the
    start of a name) and never destroying a space."""
    s = list(s)
    for _ in range(ops):
        kind = rng.randrange(3)
        i = rng.randrange(2, len(s))
        if s[i] == " ":
            i = min(i + 1, len(s) - 1)
        if kind == 0 and len(s) > 4:
            del s[i]
        elif kind == 1:
            s.insert(i, rng.choice(_CONSONANTS + _VOWELS))
        else:
            s[i] = rng.choice(_CONSONANTS + _VOWELS)
    return "".join(s)


def _insert_typo(rng: random.Random, s: str, ops: int) -> str:
    """Insertion-only typos (fat-finger doubling): all original characters
    survive, so the variant stays recognizably the same name."""
    s = list(s)
    for _ in range(ops):
        i = rng.randrange(2, len(s))
        s.insert(i, rng.choice(_CONSONANTS + _VOWELS))
    return "".join(s)


@dataclass
class EntityCatalog:
    """F2 `entities` + flat alias table (driver-side; it's a dim table)."""

    entities: list[dict]  # {entity_id, title, text, aliases}
    aliases: list[dict]  # {alias_id, entity_id, surface}

    @classmethod
    def build(cls, n_entities: int = 200, seed: int = SEED) -> "EntityCatalog":
        rng = random.Random(seed)
        entities, aliases = [], []
        alias_id = 0
        seen_surfaces: set[str] = set()
        seen_heads: set[str] = set()
        for eid in range(n_entities):
            # unique head words: two orgs sharing a head word make the bare
            # head-word alias genuinely ambiguous (observed: "vejo" ->
            # {"vejo systems", "vejo ltd"}), which no surface scorer can
            # resolve — keep the fixture unambiguous by construction
            name = _pseudo_word(rng, rng.randrange(2, 4))
            while name in seen_heads:
                name = _pseudo_word(rng, rng.randrange(2, 4))
            seen_heads.add(name)
            suffix = rng.choice(_SUFFIXES)
            title = f"{name} {suffix}"
            if title in seen_surfaces:  # regenerate on rare collision
                title = f"{name}{eid % 10} {suffix}"
            desc = (
                f"{title} is an organisation known for "
                f"{_pseudo_word(rng, 3)} and {_pseudo_word(rng, 2)}."
            )
            surfs = [title]  # edit distance 0
            surfs.append(name)  # head word only (abbreviation-ish)
            surfs.append(f"{name} {suffix[:3]}")  # truncated suffix
            surfs.append(_typo(rng, title, 1))  # 1 edit
            surfs.append(_insert_typo(rng, title, 2))  # 2 insertions
            # keep surfaces globally unique so gold labels are unambiguous
            uniq = []
            for s in surfs:
                if s not in seen_surfaces:
                    seen_surfaces.add(s)
                    uniq.append(s)
            entities.append(
                {"entity_id": eid, "title": title, "text": desc, "aliases": uniq}
            )
            for s in uniq:
                aliases.append({"alias_id": alias_id, "entity_id": eid, "surface": s})
                alias_id += 1
        for s in NIL_SURFACES:  # NIL mentions: label_id = -1
            aliases.append({"alias_id": alias_id, "entity_id": -1, "surface": s})
            alias_id += 1
        return cls(entities, aliases)

    def entities_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(e["entity_id"], e["title"], e["text"], e["aliases"]) for e in self.entities],
            "entity_id long, title string, text string, aliases array<string>",
        )

    def aliases_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(a["alias_id"], a["entity_id"], a["surface"]) for a in self.aliases],
            "alias_id long, entity_id long, surface string",
        )


def _h(*cols) -> F.Column:
    """Deterministic pseudo-random long >= 0 from literal salts + columns."""
    return F.abs(F.xxhash64(F.lit(SEED), *cols))


def _pick(arr: list[str], h: F.Column) -> F.Column:
    """Pick a literal string from `arr` by hash (JVM-side element_at)."""
    return F.element_at(F.array(*[F.lit(s) for s in arr]), (h % len(arr) + 1).cast("int"))


def generate_transcripts(
    spark: SparkSession,
    catalog: EntityCatalog,
    n_convs: int = 100,
    turns_per_conv: int = 20,
    hot_conv_factor: int = 20,
    hot_mention_pct: int = 30,
) -> tuple[DataFrame, DataFrame]:
    """Generate (transcripts F1, mentions_gold F3) distributedly.

    Every turn embeds 1-2 mentions with exact char offsets; the invariant
    `mention == lower(substr(text, start_pos+1, end_pos-start_pos))` holds by
    construction (reference assert: create_BLINK_zeshel_data.py:115).
    """
    n_turns = n_convs * turns_per_conv + hot_conv_factor * turns_per_conv
    base = spark.range(n_turns).withColumnRenamed("id", "gid")

    # conv assignment: first block round-robin over n_convs, the extra block
    # all lands on conv 0 (the hot conversation)
    conv_num = F.when(
        F.col("gid") < n_convs * turns_per_conv, F.col("gid") % n_convs
    ).otherwise(F.lit(0))
    base = base.withColumn("conv_num", conv_num)
    base = base.withColumn(
        "conv_id", F.format_string("conv_%06d", F.col("conv_num").cast("int"))
    )
    w_turn = F.row_number().over(Window.partitionBy("conv_id").orderBy("gid")) - 1
    base = base.withColumn("turn_idx", w_turn.cast("int"))

    n_alias = len(catalog.aliases)
    # alias pick with hot-surface skew
    def alias_idx(salt: str) -> F.Column:
        h = _h(F.col("gid"), F.lit(salt))
        return F.when((h % 100) < hot_mention_pct, F.lit(0)).otherwise(h % n_alias)

    base = (
        base.withColumn("a1", alias_idx("m1"))
        .withColumn("a2", alias_idx("m2"))
        .withColumn("two", (_h(F.col("gid"), F.lit("two")) % 2) == 0)
        .withColumn("pre", _pick(_TEMPLATES_PRE, _h(F.col("gid"), F.lit("pre"))))
        .withColumn("mid", _pick(_TEMPLATES_MID, _h(F.col("gid"), F.lit("mid"))))
        .withColumn("tail", _pick(_TEMPLATES_TAIL, _h(F.col("gid"), F.lit("tail"))))
        .withColumn("role", _pick(["user", "assistant", "tool"], _h(F.col("gid"), F.lit("role"))))
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                _pick(["search", "crm_lookup", "calendar"], _h(F.col("gid"), F.lit("tool"))),
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("conv_num") * 86_400 + F.col("turn_idx") * 60
            ),
        )
    )

    al = F.broadcast(
        spark.createDataFrame(
            [(a["alias_id"], a["entity_id"], a["surface"]) for a in catalog.aliases],
            "alias_id long, entity_id long, surface string",
        )
    )
    j1 = al.select(
        F.col("alias_id").alias("a1"),
        F.col("entity_id").alias("label_1"),
        F.col("surface").alias("surf_1"),
    )
    j2 = al.select(
        F.col("alias_id").alias("a2"),
        F.col("entity_id").alias("label_2"),
        F.col("surface").alias("surf_2"),
    )
    t = base.join(j1, "a1").join(j2, "a2")

    text = F.concat(
        F.col("pre"),
        F.col("surf_1"),
        F.when(F.col("two"), F.concat(F.col("mid"), F.col("surf_2"))).otherwise(
            F.lit("")
        ),
        F.col("tail"),
    )
    t = t.withColumn("text", text)
    t = t.withColumn("start_1", F.length("pre"))
    t = t.withColumn("end_1", F.col("start_1") + F.length("surf_1"))
    t = t.withColumn(
        "start_2",
        F.when(F.col("two"), F.col("end_1") + F.length("mid")),
    )
    t = t.withColumn("end_2", F.col("start_2") + F.length("surf_2"))

    transcripts = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )

    m1 = t.select(
        "conv_id",
        "turn_idx",
        F.col("surf_1").alias("mention"),
        F.col("start_1").cast("int").alias("start_pos"),
        F.col("end_1").cast("int").alias("end_pos"),
        F.col("label_1").alias("label_id"),
        "text",
    )
    m2 = t.where(F.col("two")).select(
        "conv_id",
        "turn_idx",
        F.col("surf_2").alias("mention"),
        F.col("start_2").cast("int").alias("start_pos"),
        F.col("end_2").cast("int").alias("end_pos"),
        F.col("label_2").alias("label_id"),
        "text",
    )
    mentions = (
        m1.unionByName(m2)
        .withColumn("context_left", F.lower(F.substring(F.col("text"), 1, F.col("start_pos"))))
        .withColumn(
            "context_right",
            F.lower(F.expr("substring(text, end_pos + 1)")),
        )
        .withColumn(
            "mention_id",
            F.row_number().over(Window.orderBy("conv_id", "turn_idx", "start_pos")).cast("long") - 1,
        )
        .select(
            "mention_id",
            "conv_id",
            "turn_idx",
            "start_pos",
            "end_pos",
            F.lower(F.col("mention")).alias("mention"),
            "context_left",
            "context_right",
            "label_id",
        )
    )
    return transcripts, mentions


def gold_clusters(mentions_gold: DataFrame) -> DataFrame:
    """F5: cluster_id = min(mention_id) per gold entity; NIL -> singleton."""
    w = Window.partitionBy("label_id")
    return mentions_gold.select(
        "mention_id",
        F.when(F.col("label_id") >= 0, F.min("mention_id").over(w))
        .otherwise(F.col("mention_id"))
        .alias("cluster_id"),
    )
