"""Exact distributed quantiles: census (grouped) and histogram-refine
(global) paths vs numpy's linear-interpolation quantiles and DuckDB."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _np_q(vals, q):
    return float(np.quantile(np.asarray(vals, np.float64), q,
                             method="linear"))


def test_grouped_quantiles_matches_numpy(ray_session):
    from georay.quantiles import grouped_quantiles
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 13, 5000)
    vals = rng.integers(0, 50, 5000).astype(np.float64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "v": vals}))
    out = grouped_quantiles(ds, ["k"], "v", [0.5, 0.9],
                            q_names=["med", "p90"],
                            extras={"n": "count", "s": "sum",
                                    "mn": "min", "mx": "max",
                                    "av": "avg"}).to_pandas()
    out = out.set_index("k").sort_index()
    assert len(out) == 13
    for k in range(13):
        g = vals[keys == k]
        assert out.loc[k, "med"] == pytest.approx(_np_q(g, 0.5), abs=1e-12)
        assert out.loc[k, "p90"] == pytest.approx(_np_q(g, 0.9), abs=1e-12)
        assert out.loc[k, "n"] == len(g)
        assert out.loc[k, "s"] == pytest.approx(g.sum())
        assert out.loc[k, "mn"] == g.min()
        assert out.loc[k, "mx"] == g.max()
        assert out.loc[k, "av"] == pytest.approx(g.mean())


def test_grouped_quantiles_string_keys_and_nulls(ray_session):
    from georay.quantiles import grouped_quantiles
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": [1.0, None, 3.0, 5.0, 7.0, None]})
    ds = ray.data.from_pandas(df)
    out = grouped_quantiles(
        ds, ["k"], "v", [0.5], q_names=["med"],
        extras={"n_all": "count_star", "n": "count"}).to_pandas()
    out = out.set_index("k").sort_index()
    assert out.loc["a", "med"] == 2.0          # nulls ignored
    assert out.loc["b", "med"] == 6.0
    assert np.isnan(out.loc["c", "med"])       # all-null group
    assert out.loc["c", "n_all"] == 1 and out.loc["c", "n"] == 0
    assert out.loc["a", "n_all"] == 3 and out.loc["a", "n"] == 2


def test_global_quantiles_continuous_and_multiround(ray_session):
    from georay.quantiles import global_quantiles
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(0, 1, 4000),
                           rng.normal(100, 0.001, 1000)])
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    t = global_quantiles(ds, "v", [0.0, 0.25, 0.5, 0.99, 1.0],
                         q_names=["a", "b", "c", "d", "e"])
    for nm, q in zip(["a", "b", "c", "d", "e"],
                     [0.0, 0.25, 0.5, 0.99, 1.0]):
        assert t[nm][0].as_py() == pytest.approx(_np_q(vals, q),
                                                 abs=1e-9), nm
    # force several refinement rounds: 4 bins, collection only allowed
    # when a bin holds ≤50 values
    t2 = global_quantiles(ds, "v", [0.5], q_names=["m"], bins=4,
                          collect_limit=50, max_rounds=30)
    assert t2["m"][0].as_py() == pytest.approx(_np_q(vals, 0.5),
                                               abs=1e-9)


def test_global_quantiles_constant_and_empty(ray_session):
    from georay.quantiles import global_quantiles
    ds = ray.data.from_pandas(pd.DataFrame({"v": np.full(100, 3.25)}))
    t = global_quantiles(ds, "v", [0.5], q_names=["m"], bins=4,
                         collect_limit=1)  # degenerate-interval path
    assert t["m"][0].as_py() == 3.25
    e = ray.data.from_pandas(pd.DataFrame({"v": [None, None]},
                                          dtype="float64"))
    t = global_quantiles(e, "v", [0.5], q_names=["m"])
    assert t["m"][0].as_py() is None


def test_sql_median_quantile_vs_duckdb(ray_session, tmp_path):
    import duckdb
    from georay.sql import execute_sql
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 900),
        "v": rng.integers(0, 40, 900).astype(np.float64)})
    df.loc[rng.choice(900, 30, replace=False), "v"] = np.nan
    sql = ("SELECT g, MEDIAN(v) AS med, QUANTILE_CONT(v, 0.9) AS p90, "
           "COUNT(v) AS n, SUM(v) AS s, AVG(v) AS av, MIN(v) AS mn, "
           "MAX(v) AS mx, COUNT(*) AS n_all "
           "FROM t GROUP BY g ORDER BY g")
    ds = ray.data.from_pandas(df)
    got = execute_sql(sql, {"t": ds})
    got = got.to_pandas() if not isinstance(got, pa.Table) \
        else got.to_pandas()
    exp = duckdb.connect().execute(
        sql.replace("FROM t", "FROM df")).fetchdf()
    for c in exp.columns:
        np.testing.assert_allclose(
            np.asarray(got[c] if got[c].dtype.kind in "if"
                       else got[c].astype(str) == exp[c],
                       dtype=float if got[c].dtype.kind in "if"
                       else bool),
            np.asarray(exp[c], dtype=float)
            if got[c].dtype.kind in "if" else True,
            rtol=0, atol=1e-9, err_msg=c)


def test_sql_global_median_vs_duckdb(ray_session):
    import duckdb
    from georay.sql import execute_sql
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.integers(0, 1000, 777) / 4.0})
    sql = ("SELECT MEDIAN(v) AS med, QUANTILE_CONT(v, 0.25) AS q1 "
           "FROM t")
    got = execute_sql(sql, {"t": ray.data.from_pandas(df)})
    if not isinstance(got, pa.Table):
        got = pa.Table.from_pandas(got.to_pandas())
    exp = duckdb.connect().execute(
        sql.replace("FROM t", "FROM df")).fetchdf()
    assert got["med"][0].as_py() == pytest.approx(
        float(exp["med"][0]), abs=1e-9)
    assert got["q1"][0].as_py() == pytest.approx(
        float(exp["q1"][0]), abs=1e-9)
