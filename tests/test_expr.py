"""SWQ-style attribute-filter expression tests (vs DuckDB WHERE oracle)."""

import duckdb
import pyarrow as pa
import pytest

from georay.expr import FilterSyntaxError, compile_filter

T = pa.table({
    "a": [1, 2, 3, 4, 5, None],
    "b": [1.5, 2.5, 0.0, -4.0, 10.0, 2.0],
    "s": ["apple", "banana", "cherry", None, "apricot", "fig"],
})

CASES = [
    "a > 2",
    "a >= 2 AND b < 3.0",
    "a = 1 OR a = 5",
    "NOT a = 3",
    "s LIKE 'ap%'",
    "s LIKE '%an%'",
    "s NOT LIKE 'ap%'",
    "s LIKE 'a_____'",
    "a IN (1, 3, 5)",
    "a NOT IN (1, 3, 5)",
    "b BETWEEN 0 AND 3",
    "a NOT BETWEEN 2 AND 4",
    "s IS NULL",
    "s IS NOT NULL",
    "a + 1 > 3",
    "a * 2 - 1 >= 7",
    "b / 2 < 1",
    "a % 2 = 1",
    "(a > 1 AND a < 4) OR s = 'fig'",
    "-b > 3",
]


@pytest.mark.parametrize("where", CASES)
def test_filter_matches_duckdb(where):
    f = compile_filter(where)
    got = T.filter(f(T))
    con = duckdb.connect()
    con.register("t", T.to_pandas())
    want = con.sql(f"SELECT * FROM t WHERE {where}").df()
    got_ids = sorted(x for x in got["a"].to_pylist() if x is not None)
    want_ids = sorted(x for x in want["a"].dropna().astype(int).tolist())
    assert got_ids == want_ids, where
    assert got.num_rows == len(want), where


def test_syntax_errors():
    for bad in ["a >", "a LIKE 5", "IN (1,2)", "a BETWEEN 1", "a ** 2"]:
        with pytest.raises(FilterSyntaxError):
            compile_filter(bad)(T)


def test_attribute_filter_on_dataset(ray_session):
    import ray
    from georay.expr import attribute_filter
    ds = ray.data.from_arrow(T)
    out = attribute_filter(ds, "a > 1 AND s IS NOT NULL").to_pandas()
    assert sorted(out["a"].tolist()) == [2, 3, 5]
