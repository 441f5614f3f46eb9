"""Property-based SQL parity fuzz: randomly generated SELECTs run
through BOTH the engine and DuckDB over the same parquet table; the
normalized frames must agree.  Complements test_sql.py's hand-picked
cases with machine-generated WHERE/aggregate/GROUP BY shapes.

Float discipline (NOTES.md): sums are CAST to DOUBLE inside the
aggregate on both engines (DuckDB's SUM(BIGINT) → HUGEINT renders as
float64 in pandas), and compared at round(6)."""
import glob
import os

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

_NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]

_cmp_num = st.tuples(
    st.sampled_from(_NUM_COLS),
    st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]),
    st.integers(min_value=0, max_value=300000),
).map(lambda t: f"{t[0]} {t[1]} {t[2]}")

_cmp_str = st.tuples(
    st.sampled_from(_STR_COLS),
    st.sampled_from(["=", "<>", "<", ">"]),
    st.sampled_from(["'1-URGENT'", "'3-MEDIUM'", "'O'", "'F'", "'zz'"]),
).map(lambda t: f"{t[0]} {t[1]} {t[2]}")

_pred = st.one_of(_cmp_num, _cmp_str)

_where = st.lists(_pred, min_size=1, max_size=3).flatmap(
    lambda ps: st.sampled_from([" AND ", " OR "]).map(
        lambda op: op.join(ps)))

_agg = st.sampled_from([
    "COUNT(*) AS n",
    "SUM(CAST(o_orderkey % 89 AS DOUBLE)) AS s",
    "MIN(o_totalprice) AS lo",
    "MAX(o_totalprice) AS hi",
    "AVG(o_totalprice) AS m",
    "COUNT(DISTINCT o_orderstatus) AS d",
])


def _duck(sql: str) -> pd.DataFrame:
    import duckdb
    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        t = os.path.basename(p).removesuffix(".parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def _run(sql: str) -> pd.DataFrame:
    import ray
    from georay.sql import execute_sql
    tabs = {"orders": ray.data.read_parquet(f"{SF}/orders.parquet")}
    res = execute_sql(sql, tabs)
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _check(sql: str):
    got, want = _run(sql), _duck(sql)
    if len(got) == 0 and len(want) == 0:
        # documented wart: Ray's Sort emits schema-less blocks on a
        # fully-empty pipeline and to_pandas drops the columns, so an
        # empty engine result loses its column names (DuckDB keeps
        # them).  Row-count agreement is the checkable contract here.
        return
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols, sql
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            g[c] = pd.to_numeric(g[c]).round(6)
            w[c] = pd.to_numeric(w[c]).round(6)
    pd.testing.assert_frame_equal(g, w, check_dtype=False), sql


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(where=_where)
def test_fuzz_projection_where(ray_session, where):
    _check("SELECT o_orderkey, o_totalprice FROM orders "
           f"WHERE {where} ORDER BY o_orderkey LIMIT 50")


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(where=_where, agg=_agg, key=st.sampled_from(_STR_COLS))
def test_fuzz_grouped_aggregate(ray_session, where, agg, key):
    _check(f"SELECT {key}, {agg} FROM orders WHERE {where} "
           f"GROUP BY {key} ORDER BY {key}")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(agg=_agg, where=_where)
def test_fuzz_global_aggregate(ray_session, agg, where):
    _check(f"SELECT {agg} FROM orders WHERE {where}")


# ---------------------------------------------------------------------------
# round-4 families: scalar expressions, window functions, joins
# ---------------------------------------------------------------------------

_scalar = st.sampled_from([
    "UPPER(o_orderstatus) AS u",
    "LOWER(o_orderpriority) AS l",
    "LENGTH(o_orderpriority) AS n",
    "SUBSTR(o_orderpriority, 1, 3) AS s3",
    "REPLACE(o_orderpriority, '-', '_') AS r",
    "TRIM(o_orderstatus) AS t",
    "o_orderstatus || '-' || o_orderpriority AS cat",
    "ABS(o_totalprice - 100000.0) AS a",
    "ROUND(o_totalprice / 7.0, 2) AS rd",
    "FLOOR(o_totalprice / 1000.0) AS fl",
    "CEIL(o_totalprice / 1000.0) AS ce",
    "CAST(o_orderkey % 97 AS DOUBLE) AS md",
    "CASE WHEN o_totalprice > 150000 THEN 'hi' WHEN o_totalprice > 50000"
    " THEN 'mid' ELSE 'lo' END AS bucket",
    "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS co",
])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(expr=_scalar, where=_where)
def test_fuzz_scalar_expressions(ray_session, expr, where):
    _check(f"SELECT o_orderkey, {expr} FROM orders WHERE {where} "
           "ORDER BY o_orderkey LIMIT 40")


_window = st.sampled_from([
    "ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)",
    "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)",
    "DENSE_RANK() OVER (ORDER BY o_orderkey)",
    "LAG(o_totalprice) OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_orderkey)",
    "LEAD(o_orderkey, 2) OVER (ORDER BY o_orderkey)",
    "SUM(CAST(o_orderkey % 13 AS DOUBLE)) OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey)",
    "AVG(o_totalprice) OVER (PARTITION BY o_orderpriority)",
    "COUNT(*) OVER (PARTITION BY o_orderstatus)",
    "MIN(o_totalprice) OVER (ORDER BY o_orderkey "
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(win=_window, where=_where)
def test_fuzz_window_functions(ray_session, win, where):
    # o_orderkey is unique -> every ORDER BY above is a total order, so
    # window results are deterministic on both engines
    _check(f"SELECT o_orderkey, {win} AS wv FROM orders WHERE {where} "
           "ORDER BY o_orderkey LIMIT 60")


_rank_window = st.sampled_from([
    "ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)",
    "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice "
    "DESC, o_orderkey)",
    "DENSE_RANK() OVER (ORDER BY o_orderkey)",
])

_qualify_pred = st.sampled_from([
    "wv <= 3", "wv = 1", "wv > 2 AND wv <= 7",
    "wv <= 4 AND o_orderkey % 2 = 0",
])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(win=_rank_window, qual=_qualify_pred, where=_where)
def test_fuzz_qualify(ray_session, win, qual, where):
    # QUALIFY after a deterministic rank window (o_orderkey tiebreaks)
    _check(f"SELECT o_orderkey, {win} AS wv FROM orders WHERE {where} "
           f"QUALIFY {qual} ORDER BY o_orderkey LIMIT 60")


def _run_join(sql: str) -> pd.DataFrame:
    import ray
    from georay.sql import execute_sql
    tabs = {"orders": ray.data.read_parquet(f"{SF}/orders.parquet"),
            "customer": ray.data.read_parquet(f"{SF}/customer.parquet")}
    res = execute_sql(sql, tabs)
    return res.to_pandas() if hasattr(res, "to_pandas") else res


_jointype = st.sampled_from(["JOIN", "LEFT JOIN"])
_joinagg = st.sampled_from([
    "COUNT(*) AS n",
    "SUM(CAST(o_orderkey % 31 AS DOUBLE)) AS s",
    "MAX(o_totalprice) AS hi",
    "COUNT(DISTINCT o_orderstatus) AS d",
])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(jt=_jointype, agg=_joinagg, where=_where)
def test_fuzz_joins(ray_session, jt, agg, where):
    sql = (f"SELECT c_mktsegment, {agg} FROM customer {jt} orders "
           f"ON c_custkey = o_custkey WHERE {where} "
           "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    got, want = _run_join(sql), _duck(sql)
    if len(got) == 0 and len(want) == 0:
        return
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols, sql
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            g[c] = pd.to_numeric(g[c]).round(6)
            w[c] = pd.to_numeric(w[c]).round(6)
    pd.testing.assert_frame_equal(g, w, check_dtype=False), sql
