"""Benchmark decontamination: membership semantics + streaming filter."""
import numpy as np
import pyarrow as pa

from georay.decontam import (benchmark_ngram_set, decontaminate,
                             flag_contaminated)


def _ds(rows):
    import ray
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }))


def test_flag_and_filter(ray_session):
    bench = _ds([(1, "the quick brown fox jumps over the lazy dog tonight"),
                 (2, "completely unrelated benchmark prompt text here")])
    corpus = _ds([
        (10, "xx the quick brown fox jumps over the lazy dog tonight yy"),
        (11, "nothing in common with anything at all whatsoever zzz"),
        (12, "completely unrelated benchmark prompt text here verbatim"),
    ])
    ref = benchmark_ngram_set(bench, n=20)
    flagged = flag_contaminated(corpus, ref, n=20).to_pandas()
    assert sorted(flagged["doc_id"]) == [10, 12]
    assert (flagged["n_hits"] >= 1).all()
    clean = decontaminate(corpus, bench, n=20).to_pandas()
    assert sorted(clean["doc_id"]) == [11]


def test_short_docs_only_match_exactly(ray_session):
    # docs shorter than n: padded hashes equal only on identical text
    bench = _ds([(1, "tiny")])
    corpus = _ds([(10, "tiny"), (11, "tinyX"), (12, "other")])
    ref = benchmark_ngram_set(bench, n=20)
    flagged = flag_contaminated(corpus, ref, n=20).to_pandas()
    assert sorted(flagged["doc_id"]) == [10]


def test_empty_benchmark(ray_session):
    import ray
    bench = _ds([]).filter(lambda r: False)
    corpus = _ds([(10, "anything at all in this corpus row")])
    ref = benchmark_ngram_set(bench, n=20)
    assert flag_contaminated(corpus, ref, n=20).count() == 0


def test_repetition_stats_edges(ray_session):
    from georay.text import repetition_stats_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b a b a b",      # top bigram 'a b' ×3 of 5
                          "one",               # no bigrams -> dropped
                          "",                  # no bigrams -> dropped
                          "x y z"]),           # all distinct
    })
    out = repetition_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [1, 4]
    assert out.loc[1, "top_bigram_frac"] == 0.6      # 3/5
    assert out.loc[1, "dup_bigram_frac"] == 0.6      # 1 - 2/5
    assert out.loc[4, "top_bigram_frac"] == 0.5      # 1/2
    assert out.loc[4, "dup_bigram_frac"] == 0.0


def test_semantic_dedup_matches_bruteforce(ray_session):
    import ray

    from georay.kmeans import semantic_dedup
    from georay.util import fsl_to_numpy

    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    # 10 near-dup copies of the first 10 rows (tiny perturbation)
    vecs = np.vstack([base, base[:10] + rng.randn(10, 16) * 1e-3])
    vecs = vecs.astype(np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel()), 16),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = semantic_dedup(ds, k=4, threshold=0.999).to_pandas()
    kept = set(out["vec_id"])
    # invariant 1: the 10 perturbed copies (ids 40..49) are dropped iff
    # their original landed in the same cluster — at threshold 0.999
    # every copy pairs with its original, so at most one of each pair
    # survives per cluster
    xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = xn @ xn.T
    cl = dict(zip(out["vec_id"], out["cluster"]))
    for i in kept:
        for j in kept:
            if j < i and cl[i] == cl[j]:
                assert sim[i, j] < 0.999, (i, j)
    # invariant 2: deterministic across partitionings
    out2 = semantic_dedup(ds.repartition(2), k=4,
                          threshold=0.999).to_pandas()
    assert kept == set(out2["vec_id"])


def test_bloom_filter_no_false_negatives():
    import numpy as np

    from georay.sketch import BloomFilter

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 2**63, 200_000, dtype=np.uint64)
    bf = BloomFilter.from_hashes(keys, bits_per_key=12)
    assert bf.contains(keys).all()                     # zero FN, ever
    probe = rng.integers(0, 2**63, 200_000, dtype=np.uint64)
    novel = probe[~np.isin(probe, keys)]
    assert bf.contains(novel).mean() < 0.01            # ~0.3% theory
    bf2 = BloomFilter.deserialize(bf.serialize())
    assert (bf2.contains(probe) == bf.contains(probe)).all()


def test_decontaminate_bloom_superset_of_exact(ray_session, sf_dir):
    """Bloom-path decontamination keeps a SUBSET of the exact path's
    survivors (one-sided error: extra drops possible, leaks never)."""
    import ray

    from georay.decontam import decontaminate

    corpus = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    bench = ray.data.read_parquet(f"{sf_dir}/documents.parquet") \
        .limit(50)
    exact = set(decontaminate(corpus, bench, n=20)
                .to_pandas()["doc_id"])
    bloom = set(decontaminate(corpus, bench, n=20, bloom_bits_per_key=32)
                .to_pandas()["doc_id"])
    assert bloom <= exact
    # at 32 bits/key (p~2e-7) false doc flags are ~G*p ~ 1e-4: none here
    assert bloom == exact
