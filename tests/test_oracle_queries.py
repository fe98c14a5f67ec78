"""Driver-contract queries vs the DuckDB oracle at sf0.001 (the fast subset;
scripts/check_oracle.py runs the full matrix at sf0.01 — that's what the
driver does)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_UNIT

KEY_QUERIES = [
    "q01_pricing_summary",
    "q03_topk_per_group",
    "q08_cumulative_window",
    "text03_fingerprint",
    "dedup02_ngram_jaccard",
    "dedup03_minhash_lsh",
    "ann01_cosine_topk",
    "er03_scored_pairs",
    "er04_clusters",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_UNIT}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", KEY_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    a = _normalize(q(spark, SF_UNIT).toPandas())
    b = _normalize(duck.sql(sql).df())
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-9)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"mention_id", "cluster_id"}
