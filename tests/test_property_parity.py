"""Property-based engine-parity tests (hypothesis): the portable kernels
must match DuckDB on arbitrary inputs, not just the corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
import numpy as np
from hypothesis import given, settings, strategies as st

from blink_reloaded_spark.functions.similarity import jaro_winkler_np
from blink_reloaded_spark.oracle import (
    sql_char_shingles,
    sql_minhash,
    sql_poly_hash,
)

_con = duckdb.connect()

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@settings(max_examples=200, deadline=None)
@given(a=text_st, b=text_st)
def test_jw_matches_duckdb(a: str, b: str):
    mine = float(jaro_winkler_np(pd.Series([a]), pd.Series([b]))[0])
    ref = _con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert abs(mine - ref) < 1e-12, (a, b, mine, ref)


@settings(max_examples=100, deadline=None)
@given(s=text_st)
def test_poly_hash_sql_formula_is_pure(s: str):
    """The SQL poly-hash formula evaluates deterministically in DuckDB and
    stays in [0, P) — the Spark side is pinned separately in
    tests/test_functions.py (needs a session)."""
    v1 = _con.execute(f"select {sql_poly_hash('?')}", [s]).fetchone()[0]
    v2 = _con.execute(f"select {sql_poly_hash('?')}", [s]).fetchone()[0]
    assert v1 == v2 and 0 <= v1 < 2_147_483_647


@settings(max_examples=50, deadline=None)
@given(s=st.text(alphabet="ab c", min_size=0, max_size=30))
def test_minhash_sql_monotone_under_identity(s: str):
    """sig(s) == sig(s) and identical strings collide on every band —
    the LSH self-consistency property, evaluated through the SQL mirror."""
    sh = sql_char_shingles("s", 3)
    q = f"WITH t(s) AS (VALUES (?)) SELECT {sql_minhash(sh, 0)}, {sql_minhash(sh, 1)} FROM t"
    v1 = _con.execute(q, [s]).fetchone()
    v2 = _con.execute(q, [s]).fetchone()
    assert v1 == v2
