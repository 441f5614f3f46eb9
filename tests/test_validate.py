"""Data-quality validation + profiling (georay.validate)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from georay.validate import check_rules, column_profile


def _ds(ray_session, df):
    import ray.data as rd
    return rd.from_pandas(df).repartition(3)


def test_check_rules_counts(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 2, 4, 5, None],
        "v": [0.5, -1.0, 2.0, 11.0, 3.0, 4.0],
        "s": ["aa", "ab", "zz", None, "ac", "ad"],
    })
    other = pa.table({"k": pa.array([1, 2, 3], pa.float64())})
    out = check_rules(_ds(ray_session, df), [
        ("not_null", "id"),
        ("in_range", "v", 0.0, 10.0),
        ("in_set", "s", ["aa", "ab", "ac", "ad"]),
        ("matches", "s", "^a"),
        ("unique", "id"),
        ("foreign_key", "id", other, "k"),
    ]).to_pandas().set_index(["rule", "column"])

    assert out.loc[("not_null", "id")].tolist() == [6, 1]
    assert out.loc[("in_range", "v")].tolist() == [6, 2]   # -1, 11
    assert out.loc[("in_set", "s")].tolist() == [5, 1]     # zz
    assert out.loc[("matches", "s")].tolist() == [5, 1]    # zz
    # unique: 6 rows, distinct values {1,2,4,5,None} = 5
    assert out.loc[("unique", "id")].tolist() == [6, 1]
    # fk: non-null ids {1,2,2,4,5} checked; 4 and 5 missing from {1,2,3}
    assert out.loc[("foreign_key", "id")].tolist() == [5, 2]


def test_check_rules_unknown_kind(ray_session):
    with pytest.raises(ValueError, match="unknown rule"):
        check_rules(_ds(ray_session, pd.DataFrame({"a": [1]})),
                    [("bogus", "a")])


def test_column_profile_values(ray_session):
    n = 5000
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "x": rng.randn(n),
        "s": [f"v{i % 37:02d}" for i in range(n)],
    })
    df.loc[10:19, "x"] = np.nan
    prof = column_profile(_ds(ray_session, df)) \
        .to_pandas().set_index("column")
    assert prof.loc["k", "n"] == n and prof.loc["k", "nulls"] == 0
    assert float(prof.loc["k", "min_v"]) == 0.0
    assert float(prof.loc["k", "max_v"]) == n - 1
    assert abs(prof.loc["k", "mean"] - (n - 1) / 2) < 1e-9
    assert prof.loc["x", "nulls"] == 10
    valid = df["x"].dropna()
    assert abs(prof.loc["x", "mean"] - valid.mean()) < 1e-9
    assert prof.loc["s", "min_v"] == "v00"
    assert prof.loc["s", "max_v"] == "v36"
    assert prof.loc["s", "mean"] != prof.loc["s", "mean"]  # NaN
    # HLL distinct within 3%
    assert abs(prof.loc["k", "approx_distinct"] - n) <= 0.03 * n
    assert abs(prof.loc["s", "approx_distinct"] - 37) <= 2


def test_profile_partial_rows_bounded(ray_session):
    """The profile collects one partial row per (block, column) — the
    output stays one row per column regardless of block count."""
    df = pd.DataFrame({"a": np.arange(100), "b": np.arange(100) * 0.5})
    import ray.data as rd
    ds = rd.from_pandas(df).repartition(17)
    prof = column_profile(ds)
    assert prof.num_rows == 2


def test_two_rules_same_kind_same_column(ray_session):
    # ADVICE r4: partials are keyed by rule INDEX, so two in_range
    # rules on the same column keep separate counts.
    df = pd.DataFrame({"v": [0.0, 1.0, 5.0, 9.0, 20.0]})
    out = check_rules(_ds(ray_session, df), [
        ("in_range", "v", 0.0, 10.0),     # 1 violation (20)
        ("in_range", "v", 2.0, 100.0),    # 2 violations (0, 1)
    ]).to_pandas()
    assert list(out["checked"]) == [5, 5]
    assert list(out["violations"]) == [1, 2]
