"""Character n-gram language-model scoring over a document corpus.

The CCNet/KenLM-style quality-filtering op of large-scale training-data
pipelines (perplexity under a small LM ranks documents): here an
add-one-smoothed character TRIGRAM model, trained and applied as Ray
Data stages.

Scale shape:

* **Train** never materializes the corpus: per-block partial counts
  (``np.unique`` over packed int32 trigram codes) shuffle only
  ``(code, count)`` pairs; the combined model is bounded by
  ``|vocab|**3`` (NOT corpus size), so collecting it to the driver and
  broadcasting with ``ray.put`` is exact and cheap even at 100 TB of
  text.
* **Score** is a stateless broadcast-lookup ``map_batches``: each batch
  concatenates its documents into ONE char array, packs trigram codes,
  binary-searches the sorted model arrays, and segment-averages with
  ``reduceat`` — no Python per-document loop.

Model: p(c3 | c1 c2) = (count(c1c2c3) + 1) / (count_ctx(c1c2) + V)
with V = |vocab| and count_ctx counted over trigram START positions
(so numerator/denominator come from the same stream — this is what
makes the SQL oracle of ``doc_perplexity`` expressible with one
trigram table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["train_char_trigram_lm", "PerplexityScorer",
           "add_perplexity"]


def _codes(texts: list, vocab: np.ndarray):
    """Concatenate texts → (codes int32 per char, doc lengths).  Chars
    outside ``vocab`` map to -1."""
    joined = "".join(texts)
    lens = np.fromiter((len(t) for t in texts), np.int64,
                       count=len(texts))
    if not joined:
        return np.empty(0, np.int32), lens
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    idx = np.searchsorted(vocab, arr)
    idx[idx >= len(vocab)] = 0
    ok = vocab[idx] == arr
    out = idx.astype(np.int32)
    out[~ok] = -1
    return out, lens


def _trigram_codes(codes: np.ndarray, lens: np.ndarray, K: int):
    """Packed trigram codes at every in-document position (positions
    whose 3 chars cross a document boundary are dropped).  Returns
    (tri_codes, doc_index per trigram)."""
    n = len(codes)
    if n < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    tri = (codes[:-2].astype(np.int64) * K + codes[1:-1]) * K + codes[2:]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_of = np.repeat(np.arange(len(lens)), lens)[:n - 2]
    # a trigram starting at absolute position p belongs to doc d iff
    # p+2 < starts[d] + lens[d]
    ends = (starts + lens)[doc_of]
    pos = np.arange(n - 2)
    keep = (pos + 2 < ends) & (codes[:-2] >= 0) & (codes[1:-1] >= 0) \
        & (codes[2:] >= 0)
    return tri[keep], doc_of[keep]


def train_char_trigram_lm(ds, col: str = "text"):
    """Dataset → model dict {vocab, tri_codes, tri_counts, bi_codes,
    bi_counts, V} (numpy arrays, sorted for searchsorted lookup)."""
    import ray

    # pass 1: vocabulary (per-block distinct chars → tiny driver union)
    def block_vocab(batch: pa.Table) -> pa.Table:
        joined = "".join(batch.column(col).to_pylist())
        u = np.unique(np.frombuffer(joined.encode("utf-32-le"),
                                    dtype=np.uint32))
        return pa.table({"ch": pa.array(u.astype(np.int64))})

    parts = ds.map_batches(block_vocab, batch_format="pyarrow") \
        .groupby("ch").count().take_all()
    vocab = np.sort(np.array([r["ch"] for r in parts], np.uint32))
    K = len(vocab)

    # pass 2: trigram counts — partial per block, hash-partition combine
    def block_counts(batch: pa.Table) -> pa.Table:
        codes, lens = _codes(batch.column(col).to_pylist(), vocab)
        tri, _ = _trigram_codes(codes, lens, K)
        u, c = np.unique(tri, return_counts=True)
        return pa.table({"code": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    from .sql import _hash_grouped_aggregate
    combined = _hash_grouped_aggregate(
        ds.map_batches(block_counts, batch_format="pyarrow"),
        ["code"], [("n", "SUM", "n")])
    rows = combined.take_all()          # bounded by K**3, not corpus
    tri_codes = np.array([r["code"] for r in rows], np.int64)
    tri_counts = np.array([r["n"] for r in rows], np.int64)
    order = np.argsort(tri_codes)
    tri_codes, tri_counts = tri_codes[order], tri_counts[order]
    # context (bigram) counts = trigram counts summed over the last char
    bi_all = tri_codes // K
    new = np.ones(len(bi_all), bool)
    new[1:] = bi_all[1:] != bi_all[:-1]
    bi_codes = bi_all[new]
    bi_counts = np.add.reduceat(tri_counts, np.flatnonzero(new)) \
        if len(tri_counts) else np.empty(0, np.int64)
    return {"vocab": vocab, "K": K, "V": K,
            "tri_codes": tri_codes, "tri_counts": tri_counts,
            "bi_codes": bi_codes, "bi_counts": bi_counts}


def _lookup(sorted_codes, counts, queries):
    if len(sorted_codes) == 0:
        return np.zeros(len(queries), np.int64)
    idx = np.searchsorted(sorted_codes, queries)
    idx[idx >= len(sorted_codes)] = 0
    return np.where(sorted_codes[idx] == queries, counts[idx], 0)


class PerplexityScorer:
    """Actor-pool stage: broadcast model deserialized ONCE per actor in
    ``__init__``; per batch one vectorized lookup + reduceat mean."""

    def __init__(self, model_ref, col: str = "text", round_to: int = 6):
        import ray
        self.m = (ray.get(model_ref)
                  if not isinstance(model_ref, dict) else model_ref)
        self.col = col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        texts = batch.column(self.col).to_pylist()
        codes, lens = _codes(texts, m["vocab"])
        tri, doc_of = _trigram_codes(codes, lens, m["K"])
        c3 = _lookup(m["tri_codes"], m["tri_counts"], tri)
        c2 = _lookup(m["bi_codes"], m["bi_counts"], tri // m["K"])
        lp = np.log((c3 + 1.0) / (c2 + float(m["V"])))
        n_tri = np.bincount(doc_of, minlength=len(texts))
        sums = np.bincount(doc_of, weights=lp, minlength=len(texts))
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(n_tri > 0, sums / np.maximum(n_tri, 1), np.nan)
        ppl = np.exp(-avg)
        r = self.round_to
        return (batch
                .append_column("n_trigrams", pa.array(n_tri.astype(
                    np.int64)))
                .append_column("avg_logprob", pa.array(np.round(avg, r)))
                .append_column("ppl", pa.array(np.round(ppl, 4))))


def add_perplexity(ds, col: str = "text", concurrency=(2, 8)):
    """Train on ``ds`` then score ``ds`` — returns the scored Dataset.
    The model is `ray.put` once and read per actor (never re-shipped
    per batch)."""
    import ray
    model = train_char_trigram_lm(ds, col)
    ref = ray.put(model)
    return ds.map_batches(PerplexityScorer, fn_constructor_args=(ref, col),
                          batch_format="pyarrow", concurrency=concurrency)
