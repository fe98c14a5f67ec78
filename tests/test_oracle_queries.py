"""Driver-contract queries vs the DuckDB oracle at sf0.001 — the FULL
registry, dtype-strict (scripts/check_oracle.py runs the same matrix at
sf0.01, the driver's scale)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_UNIT

# the FULL registry (ADVICE r1: local green must imply driver green) — every
# queries() entry with an oracle runs here at sf0.001, dtype-strict
ALL_QUERIES = sorted(entrymod.queries())


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


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_UNIT).toPandas()
    if sql is None:  # rows-only contract (driver runs the weaker check)
        assert len(sdf) >= 0
        return
    ddf = duck.sql(sql).df()
    # dtype-strict: the driver's value hash is type-sensitive (round-1 q12
    # HUGEINT-vs-BIGINT miss passed a lenient compare but failed the driver)
    raw_a = [str(sdf[c].dtype) for c in sorted(sdf.columns)]
    raw_b = [str(ddf[c].dtype) for c in sorted(ddf.columns)]
    assert raw_a == raw_b, f"{name}: dtypes {raw_a} vs {raw_b}"
    a, b = _normalize(sdf), _normalize(ddf)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-9)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"mention_id", "cluster_id"}
