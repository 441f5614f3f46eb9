"""Data-quality validation + column profiling over Ray Datasets — the
Deequ / Great-Expectations analog a production ingest pipeline runs
before training data leaves the gate.

Reference scope: the reference engine validates datasets via per-driver
checks and ``gdalinfo``-style statistics (gcore/gdal_misc.cpp,
gcore/rasterband GetStatistics); this module is the tabular analog for
the engine's LLM-data side.

Two surfaces:

  * :func:`column_profile` — one streaming pass computing, per column:
    row count, null count, min/max, mean (numerics, exact integer-free
    Welford-style sums), and an HLL approximate distinct count
    (georay.sketch registers, merged driver-side).  Partials are one
    tiny row per (block, column) — the profile of a 100 TB table
    collects kilobytes.
  * :func:`check_rules` — declarative rule list evaluated VECTORIZED
    per batch; per-rule violation counts fold through one partial
    aggregate.  Rules:

       ("not_null", col)                null values are violations
       ("unique", col)                  duplicated values (exact, one
                                        hash-shuffle count-distinct)
       ("in_range", col, lo, hi)        non-null values outside [lo,hi]
       ("in_set", col, values)          non-null values not in the set
       ("matches", col, regex)          non-null strings not matching
       ("foreign_key", col, other_ds, other_col)
                                        values absent from the other
                                        table's key column (broadcast
                                        key set via ray.put — document
                                        the small-side assumption; a
                                        keyed co-shuffle is the
                                        fallback shape at larger sides)

    Returns one row per rule: (rule, column, checked, violations).

Scale shape: everything except "unique" and "foreign_key" is a pure
map_batches partial + driver fold of bounded rows; "unique" runs the
engine's hash-partitioned distinct plan; "foreign_key" broadcasts the
referenced key column once (``ray.put``), never per batch.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["column_profile", "check_rules"]


def column_profile(ds, columns: list[str] | None = None, *,
                   hll_p: int = 14) -> pa.Table:
    """One-pass per-column profile: (column, n, nulls, min_v, max_v,
    mean, approx_distinct).  min/max/mean are NULL for non-numeric,
    non-string columns; min/max of strings compare lexically and mean
    is NULL there."""
    from .sketch import hll_estimate, hll_merge, hll_partial

    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)
    cols = columns or list(schema.names)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"column": [], "n": [], "nulls": [], "is_num": [],
               "min_s": [], "max_s": [], "min_f": [], "max_f": [],
               "sum_f": [], "reg": []}
        for c in cols:
            col = batch[c]
            t = col.type
            out["column"].append(c)
            out["n"].append(batch.num_rows)
            out["nulls"].append(col.null_count)
            numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
            out["is_num"].append(numeric)
            valid = batch.num_rows - col.null_count
            if valid and (numeric or pa.types.is_string(t)
                          or pa.types.is_large_string(t)):
                mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            else:
                mn = mx = None
            if numeric:
                out["min_f"].append(float(mn) if mn is not None
                                    else None)
                out["max_f"].append(float(mx) if mx is not None
                                    else None)
                out["sum_f"].append(
                    float(pc.sum(col).as_py() or 0.0) if valid else 0.0)
                out["min_s"].append(None)
                out["max_s"].append(None)
            else:
                out["min_s"].append(str(mn) if mn is not None else None)
                out["max_s"].append(str(mx) if mx is not None else None)
                out["min_f"].append(None)
                out["max_f"].append(None)
                out["sum_f"].append(None)
            out["reg"].append(hll_partial(col, hll_p).tobytes())
        return pa.table({
            "column": pa.array(out["column"]),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "is_num": pa.array(out["is_num"]),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
            "min_f": pa.array(out["min_f"], pa.float64()),
            "max_f": pa.array(out["max_f"], pa.float64()),
            "sum_f": pa.array(out["sum_f"], pa.float64()),
            "reg": pa.array(out["reg"], pa.binary()),
        })

    # bounded collect: one row per (block, column)
    parts = pa.concat_tables(list(
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    rows = {"column": [], "n": [], "nulls": [], "min_v": [],
            "max_v": [], "mean": [], "approx_distinct": []}
    pdf = parts.to_pandas()
    for c in cols:
        g = pdf[pdf["column"] == c]
        n = int(g["n"].sum())
        nulls = int(g["nulls"].sum())
        valid = n - nulls
        is_num = bool(g["is_num"].iloc[0])
        if is_num:
            mn = g["min_f"].dropna().min()
            mx = g["max_f"].dropna().max()
            mean = float(g["sum_f"].sum()) / valid if valid else None
            mn = float(mn) if mn == mn else None
            mx = float(mx) if mx == mx else None
            mn_s, mx_s = (str(mn) if mn is not None else None,
                          str(mx) if mx is not None else None)
        else:
            s = g["min_s"].dropna()
            mn_s = s.min() if len(s) else None
            s = g["max_s"].dropna()
            mx_s = s.max() if len(s) else None
            mean = None
        reg = hll_merge(*[np.frombuffer(b, np.uint8)
                          for b in g["reg"]])
        rows["column"].append(c)
        rows["n"].append(n)
        rows["nulls"].append(nulls)
        rows["min_v"].append(mn_s)
        rows["max_v"].append(mx_s)
        rows["mean"].append(mean)
        rows["approx_distinct"].append(int(round(hll_estimate(reg))))
    return pa.table({
        "column": pa.array(rows["column"]),
        "n": pa.array(rows["n"], pa.int64()),
        "nulls": pa.array(rows["nulls"], pa.int64()),
        "min_v": pa.array(rows["min_v"], pa.string()),
        "max_v": pa.array(rows["max_v"], pa.string()),
        "mean": pa.array(rows["mean"], pa.float64()),
        "approx_distinct": pa.array(rows["approx_distinct"],
                                    pa.int64()),
    })


def check_rules(ds, rules: list[tuple]) -> pa.Table:
    """Evaluate declarative quality rules (module docstring) in one
    streaming pass (+ one distinct plan per "unique" rule); returns
    (rule, column, checked, violations) per rule."""
    import ray

    simple = []           # evaluated inside the shared map_batches pass
    fk_sets = {}
    for r in rules:
        kind = r[0]
        if kind == "unique":
            pass          # handled by the distinct plan below
        elif kind == "foreign_key":
            col, other_ds, other_col = r[1], r[2], r[3]
            if isinstance(other_ds, pa.Table):
                keys = other_ds[other_col]
            else:
                keys = pa.concat_tables(list(
                    other_ds.select_columns([other_col]).iter_batches(
                        batch_size=1 << 20,
                        batch_format="pyarrow")))[other_col]
            fk_sets[(col, other_col)] = ray.put(
                pc.unique(keys.combine_chunks()))
            simple.append(r)
        elif kind in ("not_null", "in_range", "in_set", "matches"):
            simple.append(r)
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    if simple:
        rules_simple = list(simple)
        fk_refs = dict(fk_sets)

        def partial(batch: pa.Table) -> pa.Table:
            idxs, names, colnames, checked, viol = [], [], [], [], []
            for ridx, r in enumerate(rules_simple):
                kind, col = r[0], r[1]
                idxs.append(ridx)
                c = batch[col]
                if kind == "not_null":
                    names.append(kind)
                    colnames.append(col)
                    checked.append(batch.num_rows)
                    viol.append(c.null_count)
                    continue
                vmask = pc.is_valid(c)
                nvalid = batch.num_rows - c.null_count
                names.append(kind)
                colnames.append(col)
                checked.append(nvalid)
                if nvalid == 0:
                    viol.append(0)
                    continue
                if kind == "in_range":
                    lo, hi = r[2], r[3]
                    bad = pc.or_(pc.less(c, pa.scalar(lo)),
                                 pc.greater(c, pa.scalar(hi)))
                elif kind == "in_set":
                    bad = pc.invert(pc.is_in(
                        c, value_set=pa.array(list(r[2]))))
                elif kind == "matches":
                    bad = pc.invert(pc.match_substring_regex(
                        c, r[2]))
                else:                       # foreign_key
                    keys = ray.get(fk_refs[(col, r[3])])
                    bad = pc.invert(pc.is_in(c, value_set=keys))
                bad = pc.and_(pc.fill_null(pc.cast(bad, pa.bool_()),
                                           False), vmask)
                viol.append(int(pc.sum(pc.cast(bad, pa.int8()))
                                .as_py() or 0))
            return pa.table({
                "rule_idx": pa.array(idxs, pa.int32()),
                "rule": pa.array(names), "column": pa.array(colnames),
                "checked": pa.array(checked, pa.int64()),
                "violations": pa.array(viol, pa.int64())})

        parts = pa.concat_tables(list(
            ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
        # key partials by rule INDEX, not (kind, column): two rules of
        # the same kind on the same column (e.g. two in_range bounds)
        # must not fold into one summed row.
        agg = parts.group_by(["rule_idx"]).aggregate(
            [("checked", "sum"), ("violations", "sum")])
        simple_out = {
            agg["rule_idx"][i].as_py():
            (agg["checked_sum"][i].as_py(),
             agg["violations_sum"][i].as_py())
            for i in range(agg.num_rows)}
    else:
        simple_out = {}

    rows = {"rule": [], "column": [], "checked": [], "violations": []}
    next_sidx = 0         # walks `simple` in the order it was built
    for r in rules:
        kind, col = r[0], r[1]
        if kind == "unique":
            # violations = rows - distinct rows of the column
            n = ds.count()
            from ray.data.aggregate import Count
            distinct = ds.select_columns([col]).groupby(col) \
                .aggregate(Count(alias_name="c__")).count()
            rows["rule"].append(kind)
            rows["column"].append(col)
            rows["checked"].append(n)
            rows["violations"].append(n - distinct)
        else:
            ck, vi = simple_out[next_sidx]
            next_sidx += 1
            rows["rule"].append(kind)
            rows["column"].append(col)
            rows["checked"].append(ck)
            rows["violations"].append(vi)
    return pa.table({
        "rule": pa.array(rows["rule"]),
        "column": pa.array(rows["column"]),
        "checked": pa.array(rows["checked"], pa.int64()),
        "violations": pa.array(rows["violations"], pa.int64()),
    })
