"""BM25 scoring vs a brute-force reference + the DuckDB oracle text;
HyperLogLog accuracy, merge associativity, and small-range exactness."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


# ---------------------------------------------------------------- BM25

def _bm25_brute(texts, ids, terms, k1=1.2, b=0.75):
    toks = [t.split(" ") for t in texts]
    dls = [len(t) for t in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    out = {}
    for t in terms:
        df = sum(t in d for d in toks)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(toks):
            tf = d.count(t)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            out[ids[i]] = out.get(ids[i], 0.0) + s
    return {i: round(s, 6) for i, s in out.items()}


def test_bm25_topk_matches_bruteforce(ray_session):
    from georay.bm25 import bm25_topk
    rng = np.random.default_rng(2)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(300)]
    ids = list(range(300))
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    got = bm25_topk(ds, ["alpha", "gamma"], k=15).to_pandas()
    exp = _bm25_brute(texts, ids, ["alpha", "gamma"])
    exp_rows = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(got["doc_id"]) == [i for i, _ in exp_rows]
    np.testing.assert_allclose(got["score"], [s for _, s in exp_rows],
                               atol=1e-6)


def test_bm25_matches_duckdb_text(ray_session):
    """The exact oracle SQL shape used by the driver query, on a small
    frame — pins engine↔SQL formula parity including the tokenizer."""
    import duckdb
    from georay.bm25 import bm25_topk
    rng = np.random.default_rng(9)
    vocab = ["key", "table", "fast", "row", "scan"]
    df = pd.DataFrame({
        "doc_id": range(120),
        "text": [" ".join(rng.choice(vocab, rng.integers(2, 25)))
                 for _ in range(120)]})
    got = bm25_topk(ray.data.from_pandas(df),
                    ["key", "fast"], k=10).to_pandas()
    sql = """
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               len(string_split(text, ' ')) AS dl FROM documents),
      stats AS (SELECT COUNT(*) AS n,
                       AVG(len(string_split(text, ' '))) AS avgdl
                FROM documents),
      dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
                WHERE term IN ('key', 'fast') GROUP BY term),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
             FROM toks WHERE term IN ('key', 'fast')
             GROUP BY doc_id, term)
      SELECT tf.doc_id,
             ROUND(SUM(LN(1 + (stats.n - dfreq.df + 0.5)
                           / (dfreq.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                     / stats.avgdl))), 6) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term, stats
      GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10
    """
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(sql).fetchdf()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    np.testing.assert_allclose(got["score"], exp["score"], atol=1e-6)


# ------------------------------------------------------------------ HLL

def test_hll_accuracy_and_merge():
    from georay.sketch import hll_estimate, hll_merge, hll_partial
    rng = np.random.default_rng(4)
    for true_n in (1_000, 100_000):
        vals = pa.array(rng.choice(10 * true_n, true_n, replace=False)
                        .astype(np.int64))
        est = hll_estimate(hll_partial(vals))
        assert abs(est / true_n - 1) < 0.03, (true_n, est)
        # splitting the input and max-merging must equal the one-shot
        a, b = vals[:true_n // 3], vals[true_n // 3:]
        merged = hll_merge(hll_partial(a), hll_partial(b))
        np.testing.assert_array_equal(merged, hll_partial(vals))


def test_hll_small_range_linear_counting():
    from georay.sketch import hll_estimate, hll_partial
    vals = pa.array([f"item-{i}" for i in range(100)])
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 100) < 3          # near-exact in the LC regime


def test_hll_string_vs_int_independence():
    from georay.sketch import hll_estimate, hll_partial
    ints = pa.array(np.arange(5000, dtype=np.int64))
    strs = pa.array([str(i) for i in range(5000)])
    for est in (hll_estimate(hll_partial(ints)),
                hll_estimate(hll_partial(strs))):
        assert abs(est / 5000 - 1) < 0.03


def test_approx_distinct_ray(ray_session):
    from georay.sketch import approx_distinct
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 20_000, 100_000)   # ~19.9k distinct expected
    true_n = len(np.unique(vals))
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})) \
        .repartition(16)
    est = approx_distinct(ds, "v")
    assert abs(est / true_n - 1) < 0.03
    empty = ray.data.from_pandas(pd.DataFrame({"v": pd.array(
        [], dtype="int64")}))
    assert approx_distinct(empty, "v") == 0.0


def test_heavy_hitters_exact_and_certified(ray_session):
    from georay.sketch import heavy_hitters
    rng = np.random.default_rng(12)
    # zipf-ish: value i appears ~ 3000/(i+1) times
    vals = np.concatenate([np.full(3000 // (i + 1), f"t{i}")
                           for i in range(200)])
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"term": vals})) \
        .repartition(8)
    top, certified = heavy_hitters(ds, "term", k=10)
    assert certified
    import collections
    exp = sorted(collections.Counter(vals).items(),
                 key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(top["term"]) == [pa.scalar(t) for t, _ in exp] or \
        top["term"].to_pylist() == [t for t, _ in exp]
    assert top["n"].to_pylist() == [n for _, n in exp]


def test_heavy_hitters_compression_path(ray_session):
    """capacity smaller than block vocabulary: MG pruning engages, the
    verify pass still returns exact counts, and the certification bound
    reflects the deductions."""
    from georay.sketch import heavy_hitters
    rng = np.random.default_rng(13)
    heavy = np.repeat([f"H{i}" for i in range(5)], 500)
    tail = np.array([f"x{i}" for i in range(4000)])
    vals = np.concatenate([heavy, tail, tail])
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"term": vals})) \
        .repartition(4)
    top, certified = heavy_hitters(ds, "term", k=5, capacity=64)
    assert top["term"].to_pylist() == [f"H{i}" for i in range(5)]
    assert top["n"].to_pylist() == [500] * 5


def test_kll_sketch_accuracy_and_roundtrip():
    """KLL: ≤1% rank error at k=512 across a 37-way partial merge;
    serialize/deserialize is lossless; n is exact."""
    import numpy as np

    from georay.sketch import KLL

    rng = np.random.default_rng(3)
    data = rng.lognormal(2.0, 1.5, 200_000)
    sks = [KLL(512).add_array(c) for c in np.array_split(data, 37)]
    m = sks[0]
    for s in sks[1:]:
        m.merge(KLL.deserialize(s.serialize()))   # via the wire format
    assert m.n == len(data)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = m.quantile(q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) <= 0.01, (q, rank)
    # bounded summary: far fewer items retained than seen
    assert sum(len(a) for a in m.levels) < 4000


def test_approx_quantiles_ray(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from georay.sketch import approx_quantiles

    rng = np.random.default_rng(5)
    vals = rng.normal(100.0, 15.0, 50_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(9)
    est = approx_quantiles(ds, "v", (0.5,), k=512)
    srt = np.sort(vals)
    rank = np.searchsorted(srt, est[0.5]) / len(srt)
    assert abs(rank - 0.5) <= 0.01
