"""Benchmark decontamination: flag corpus documents that share any
character n-gram with a benchmark/test set.

The training-data hygiene stage (GPT-3 appendix C / The Pile style
n-gram overlap decontamination, re-expressed Ray-Data-first).  Scale
shape: the benchmark side is inherently SMALL (eval sets are thousands
of documents, not billions), so its distinct n-gram hash set is built
with one streaming pass (per-block unique hashes → driver union) and
BROADCAST once via ``ray.put``; the corpus side then streams through a
single ``map_batches`` membership pass — sorted-array ``searchsorted``
per batch, NO shuffle anywhere, nothing materializes.

Hashing: the same 64-bit Horner rolling family as the near-dup stack
(:func:`georay.dedup._batch_shingles`, verified equal to the scalar
reference in tests).  Membership-by-hash equals membership-by-string
up to 64-bit collisions (~1e-7 at 10^6 distinct grams per side);
documented, and the driver oracle's exact string join agrees at test
scale.

Reference scope: GDAL has no corpus ops — this belongs to the
LLM-data-pipeline surface the build brief adds as first-class.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _batch_shingles

__all__ = ["benchmark_ngram_set", "flag_contaminated", "decontaminate"]


def _member_mask(ref, sh: np.ndarray) -> np.ndarray:
    """Membership mask of shingle hashes against a broadcast ref —
    either the exact sorted uint64 array or a ``sketch.BloomFilter``
    (1.5 bytes/key vs 8: the 10^10-gram broadcast path; false positives
    only drop extra docs, never leak a benchmark gram)."""
    from .sketch import BloomFilter
    if isinstance(ref, BloomFilter):
        return ref.contains(sh)
    if ref.size == 0:
        return np.zeros(len(sh), bool)
    pos = np.searchsorted(ref, sh)
    pos[pos == ref.size] = 0
    return ref[pos] == sh


def _ref_empty(ref) -> bool:
    from .sketch import BloomFilter
    return ref.m <= 1 if isinstance(ref, BloomFilter) else ref.size == 0


def benchmark_ngram_set(bench_ds, *, n: int = 20, text_col: str = "text",
                        bloom_bits_per_key: int | None = None):
    """Distinct n-gram hash set of the benchmark table → broadcast ref.

    One partial row (a packed uint64 blob of the block's unique hashes)
    per block; the driver unions the partials (tiny — bounded by the
    benchmark's distinct-gram count, not its row count) and ``ray.put``s
    one sorted array every downstream task shares."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        if not texts:
            return pa.table({"h": pa.array([], pa.binary())})
        sh, _ = _batch_shingles(texts, n)
        u = np.unique(sh)
        return pa.table({"h": pa.array([u.tobytes()], pa.binary())})

    blobs = bench_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None).take_all()
    if blobs:
        cat = np.concatenate([
            np.frombuffer(r["h"], np.uint64) for r in blobs])
        ref = np.unique(cat)
    else:
        ref = np.empty(0, np.uint64)
    if bloom_bits_per_key is not None:
        from .sketch import BloomFilter
        return ray.put(BloomFilter.from_hashes(ref, bloom_bits_per_key))
    return ray.put(ref)


def flag_contaminated(corpus_ds, bench_ref, *, n: int = 20,
                      text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of (id_col, n_hits) for every CONTAMINATED corpus doc:
    n_hits = number of DISTINCT n-grams of the doc that appear in the
    benchmark set.  Pure streaming map_batches against the broadcast
    sorted hash array."""

    class Flag:
        def __init__(self):
            import ray
            self.ref = ray.get(bench_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col]
            texts = batch[text_col].to_pylist()
            empty = pa.table({id_col: pa.array([], ids.type),
                              "n_hits": pa.array([], pa.int64())})
            if not texts or _ref_empty(self.ref):
                return empty
            sh, offsets = _batch_shingles(texts, n)
            hit = _member_mask(self.ref, sh)
            if not hit.any():
                return empty
            # count DISTINCT matched hashes per doc: the matched set is
            # small, so one lexsort over (doc, hash) pairs suffices
            widx = np.flatnonzero(hit)
            doc = np.searchsorted(offsets, widx, side="right") - 1
            h = sh[widx]
            order = np.lexsort((h, doc))
            doc, h = doc[order], h[order]
            new = np.ones(doc.size, dtype=bool)
            new[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
            doc_u = doc[new]
            first = np.ones(doc_u.size, dtype=bool)
            first[1:] = doc_u[1:] != doc_u[:-1]
            keys = doc_u[first]
            counts = np.diff(np.flatnonzero(
                np.concatenate([first, [True]])))
            return pa.table({
                id_col: ids.take(pa.array(keys)),
                "n_hits": pa.array(counts.astype(np.int64)),
            })

    return corpus_ds.map_batches(Flag, batch_format="pyarrow",
                                 concurrency=(1, 8))


def decontaminate(corpus_ds, bench_ds, *, n: int = 20,
                  text_col: str = "text", id_col: str = "doc_id",
                  bloom_bits_per_key: int | None = None):
    """Remove contaminated docs from the corpus (streaming filter: the
    membership test runs inline; rows with any benchmark n-gram drop).
    ``bloom_bits_per_key``: broadcast a Bloom filter instead of the
    exact sorted set (one-sided error drops extra docs, never leaks).
    SIZE THE RATE FOR PER-DOC COMPOUNDING: a doc of G grams is falsely
    flagged with probability ~G·p, so with G ~ 10^3 the per-key rate
    must sit at ~1e-6 — bits_per_key=32 (p≈2e-7, 4 bytes/key, half the
    exact set's 8) is the decontamination default; 12 bits/key is a
    PER-KEY rate (0.3 %) suited to counting-style uses only."""
    import ray

    bench_ref = benchmark_ngram_set(bench_ds, n=n, text_col=text_col,
                                    bloom_bits_per_key=bloom_bits_per_key)

    class Drop:
        def __init__(self):
            self.ref = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            if not texts or _ref_empty(self.ref):
                return batch
            sh, offsets = _batch_shingles(texts, n)
            hit = _member_mask(self.ref, sh)
            doc_hit = np.add.reduceat(
                hit.astype(np.int64), offsets[:-1]) > 0
            doc_hit &= np.diff(offsets) > 0
            return batch.filter(pa.array(~doc_hit))

    return corpus_ds.map_batches(Drop, batch_format="pyarrow",
                                 concurrency=(1, 8))
