"""Source formats from the reference's scan inventory (SURVEY.md §2.1):

* S1/S2 JSONL catalogue/mention scans -> `read_jsonl` (+ stable local idx,
  the reference's `local_idx` counter, `blink/main_dense.py:125-144`)
* S4 per-world JSON directory -> `read_json_dir_with_world` (world column
  from the file name via input_file_name, replacing the world_to_id dict,
  `blink/biencoder/zeshel_utils.py:14-33`)
* S6 compressed JSONL (bz2/gzip) -> Spark reads compressed text natively
* S10 JSONL writer -> `write_jsonl`
* S11 flat sentence files -> `read_sentences`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_reloaded_spark.operators.ids import stable_row_ids


def read_jsonl(spark: SparkSession, path: str, with_local_idx: bool = False) -> DataFrame:
    """JSONL scan; optional dense order-stable local idx keyed on the sorted
    column tuple for determinism — the reference relies on file order, which
    distributed readers must not. The idx is assigned by the two-phase
    range-partitioned scheme (operators/ids.py), never a global-sort
    row_number (Exchange SinglePartition is a dead stop at scale)."""
    df = spark.read.json(path)
    if with_local_idx:
        df = stable_row_ids(df, sorted(df.columns), id_name="local_idx")
    return df


def read_json_dir_with_world(spark: SparkSession, path: str) -> DataFrame:
    """One JSON(L) file per 'world' (zeshel domain): world = file stem."""
    df = spark.read.json(f"{path}/*.json")
    world = F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1)
    return df.withColumn("world", world)


def write_jsonl(df: DataFrame, path: str) -> None:
    """S10: dicts-as-json-per-line writer (`blink/utils.py:110-117`)."""
    df.write.mode("overwrite").json(path)


def read_wiki_extractor_output(spark: SparkSession, path: str) -> DataFrame:
    """S5: wiki-extractor dump scan — the stateful per-`<doc id=...>` parse
    of `blink/candidate_retrieval/process_wiki_extractor_output.py:45-93`,
    distributed with the FILE as the parse unit (the reference also parses
    one extractor output file per run; no state crosses files, so
    parallelism = files — the natural shape for a dump of thousands of ~MB
    shards; a byte-split text scan would tear doc blocks).

    Reference semantics preserved exactly: for each `<doc id=.. url=..
    title=..>` header, collect the INTRO lines — everything up to the first
    `Section::::` heading or `</doc>` — stripped; emit (page_id, title,
    url, intro_lines as one newline-joined string, n_intro_lines).
    """
    import xml.etree.ElementTree as ET

    files = spark.read.text(path, wholetext=True)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {"page_id": [], "title": [], "url": [], "intro": [], "n_intro_lines": []}
            for blob in pdf["value"]:
                doc_attr, lines, in_intro = None, [], False
                for line in (blob or "").splitlines():
                    if line.startswith("<doc id="):
                        doc_attr = ET.fromstring(line + "</doc>").attrib
                        lines, in_intro = [], True
                        continue
                    if not in_intro:
                        continue
                    if line.startswith("Section::::") or line.startswith("</doc>"):
                        out["page_id"].append(int(doc_attr["id"]))
                        out["title"].append(doc_attr["title"])
                        out["url"].append(doc_attr.get("url", ""))
                        out["intro"].append("\n".join(lines))
                        out["n_intro_lines"].append(len(lines))
                        in_intro = False
                        continue
                    lines.append(line.strip())
            yield pd.DataFrame(out)

    return files.mapInPandas(
        parse,
        schema="page_id long, title string, url string, intro string, n_intro_lines int",
    )


def read_sentences(spark: SparkSession, path: str, one_per_line: bool = True) -> DataFrame:
    """S11 flat-file sentence reader (`blink/utils.py:15-30`); when
    one_per_line=False, paragraphs are split on sentence punctuation
    (the segtok stand-in, F8)."""
    txt = spark.read.text(path).withColumnRenamed("value", "sentence")
    if one_per_line:
        return txt.where(F.length(F.trim("sentence")) > 0)
    return (
        txt.select(
            F.explode(F.split("sentence", r"(?<=[.!?])\s+")).alias("sentence")
        ).where(F.length(F.trim("sentence")) > 0)
    )
