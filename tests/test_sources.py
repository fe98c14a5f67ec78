"""Source-format coverage (SURVEY §2.1): JSONL round-trip with local idx,
per-world JSON dirs, compressed JSONL, sentence files."""

from __future__ import annotations

import bz2
import json
import os

from blink_reloaded_spark.sources.readers import (
    read_json_dir_with_world,
    read_jsonl,
    read_sentences,
    write_jsonl,
)


def test_jsonl_roundtrip_with_local_idx(spark, tmp_path):
    rows = [{"title": f"t{i}", "text": f"body {i}"} for i in range(20)]
    src = tmp_path / "ents.jsonl"
    src.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_jsonl(spark, str(src), with_local_idx=True)
    got = df.orderBy("local_idx").collect()
    assert len(got) == 20
    assert [r["local_idx"] for r in got] == list(range(20))
    out = tmp_path / "out"
    write_jsonl(df.drop("local_idx"), str(out))
    back = read_jsonl(spark, str(out))
    assert back.count() == 20 and set(back.columns) == {"title", "text"}


def test_per_world_json_dir(spark, tmp_path):
    d = tmp_path / "worlds"
    d.mkdir()
    for world in ("forgotten_realms", "lego"):
        (d / f"{world}.json").write_text(
            "\n".join(json.dumps({"doc_id": f"{world}_{i}", "text": "x"}) for i in range(3))
        )
    df = read_json_dir_with_world(spark, str(d))
    per = {r["world"]: r["count"] for r in df.groupBy("world").count().collect()}
    assert per == {"forgotten_realms": 3, "lego": 3}


def test_bz2_jsonl_native(spark, tmp_path):
    """S6: line-JSON inside bz2 + sitelink-presence filter
    (`process_wikidata.py:42-60`)."""
    rows = [
        {"id": "Q1", "sitelinks": {"enwiki": "A"}},
        {"id": "Q2", "sitelinks": {}},
        {"id": "Q3", "sitelinks": {"enwiki": "C"}},
    ]
    p = tmp_path / "wd.jsonl.bz2"
    p.write_bytes(bz2.compress("\n".join(json.dumps(r) for r in rows).encode()))
    df = spark.read.json(str(p))
    kept = df.where("sitelinks.enwiki IS NOT NULL")
    assert kept.count() == 2


def test_sentence_reader(spark, tmp_path):
    p = tmp_path / "sents.txt"
    p.write_text("One sentence. Another one! A third?\n\nlast line\n")
    one = read_sentences(spark, str(p), one_per_line=True)
    assert one.count() == 2
    split = read_sentences(spark, str(p), one_per_line=False)
    assert split.count() == 4


def test_wiki_extractor_scan(spark, tmp_path):
    """S5: per-<doc> stateful parse, intro = lines before the first
    Section:::: heading (reference process_wiki_extractor_output.py:45-93)."""
    from blink_reloaded_spark.sources.readers import read_wiki_extractor_output

    f1 = tmp_path / "wiki_00"
    f1.write_text(
        '<doc id="12" url="https://x/12" title="Acme Corp">\n'
        "Acme Corp\n"
        "\n"
        "Acme Corp is a company.  \n"
        "It makes anvils.\n"
        "Section::::History.\n"
        "Founded long ago.\n"
        "</doc>\n"
        '<doc id="34" url="https://x/34" title="Beta &amp; Co">\n'
        "Beta & Co\n"
        "No sections here.\n"
        "</doc>\n"
    )
    f2 = tmp_path / "wiki_01"
    f2.write_text(
        '<doc id="56" url="https://x/56" title="Gamma">\n'
        "Gamma\n"
        "</doc>\n"
    )
    got = {
        r["page_id"]: r
        for r in read_wiki_extractor_output(spark, str(tmp_path)).collect()
    }
    assert set(got) == {12, 34, 56}
    assert got[12]["title"] == "Acme Corp"
    # intro stops BEFORE Section:::: and strips each line
    assert got[12]["intro"].splitlines() == [
        "Acme Corp", "", "Acme Corp is a company.", "It makes anvils.",
    ]
    assert got[12]["n_intro_lines"] == 4
    assert got[34]["title"] == "Beta & Co"  # XML entity decoded
    assert got[34]["intro"].splitlines() == ["Beta & Co", "No sections here."]
    assert got[56]["intro"] == "Gamma" and got[56]["n_intro_lines"] == 1
