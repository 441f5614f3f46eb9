"""Deduplication operators over document / image tables — the
training-data-pipeline extensions (repo charter: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

GDAL itself has no generic dedup (SURVEY.md §2.6 — FID uniqueness +
SQL DISTINCT only); these are first-class additions expressed Ray-Data
native:

* exact: content-hash in ``map_batches`` → ``groupby(hash)`` →
  first-per-group (hash-partitioned, no driver state).
* MinHash+LSH: shingle → minhash sig per row (vectorized) → explode to
  (band, band_hash) rows → ``groupby(band)`` buckets → candidate pairs →
  Jaccard verify.  Signatures are mergeable partials; only candidate
  pairs (tiny) leave the shuffle.
* SimHash: 64-bit weighted fingerprint; near-dups = equal fingerprints
  within hamming radius via 4-way block permutation buckets.
* embedding cosine: normalized vectors → LSH random-hyperplane buckets or
  brute-force pairwise within blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "content_hash_batch", "exact_dedup", "minhash_signature_batch",
    "minhash_lsh_pairs", "simhash_batch", "simhash_pairs",
    "ngram_jaccard", "embedding_dup_pairs",
]

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _fnv1a_bytes(strings) -> np.ndarray:
    """Vector of 64-bit FNV-1a hashes of utf-8 strings (Python loop over
    rows but C-speed per string via int ops on bytes; adequate for hash
    columns — heavy lifting stays in the groupby)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def content_hash_batch(batch: pa.Table, col: str = "text",
                       out_col: str = "content_hash") -> pa.Table:
    """Add a 64-bit content hash of a string/binary column."""
    import pyarrow.compute as pc
    vals = batch[col].to_pylist()
    if vals and isinstance(vals[0], bytes):
        h = np.empty(len(vals), dtype=np.uint64)
        for i, s in enumerate(vals):
            hh = 0xCBF29CE484222325
            for b in s:
                hh = ((hh ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            h[i] = hh
    else:
        h = _fnv1a_bytes(vals)
    return batch.append_column(out_col, pa.array(h.view(np.int64)))


def exact_dedup(ds, key_col: str, order_col: str):
    """Keep the first row (min ``order_col``) per ``key_col`` group —
    hash-partitioned first-per-group (SURVEY.md §7.3)."""
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col).head(1)

    return ds.groupby(key_col).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, n: int = 5, unique: bool = True) -> np.ndarray:
    """Character n-gram shingle hashes (uint64) of one document.

    ``unique=False`` skips the dedup sort — valid for MinHash (the min over
    a multiset equals the min over its set), saving an O(S log S) sort per
    document in the hot signature stage."""
    b = text.encode("utf-8")
    if len(b) < n:
        b = b + b"\x00" * (n - len(b))
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash over a sliding window, vectorized
    idx = np.arange(n, dtype=np.uint64)
    weights = np.uint64(1099511628211) ** idx
    windows = np.lib.stride_tricks.sliding_window_view(a, n)
    h = (windows * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(h) if unique else h


def minhash_signature_batch(batch: pa.Table, col: str = "text",
                            num_perm: int = 64, shingle_n: int = 5) -> pa.Table:
    """Add a fixed-size MinHash signature column (list<uint64 as int64>).

    Universal-hash family ``h_i(x) = (a_i·x + b_i) mod 2^64`` over shingle
    hashes; one signature per row, vectorized per document."""
    rng_a = (np.arange(1, num_perm + 1, dtype=np.uint64) * _H1 | np.uint64(1))
    rng_b = np.arange(num_perm, dtype=np.uint64) * _H2
    sigs = np.empty((batch.num_rows, num_perm), dtype=np.uint64)
    texts = batch[col].to_pylist()
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, shingle_n, unique=False)
        # (n_shingles, num_perm) via broadcasting, min over shingles
        vals = (sh[:, None] * rng_a[None, :] + rng_b[None, :]) & _MASK
        sigs[i] = vals.min(axis=0)
    return batch.append_column(
        "minhash", pa.array(list(sigs.view(np.int64)),
                            pa.list_(pa.int64(), num_perm)))


def minhash_lsh_pairs(ds, id_col: str = "doc_id", col: str = "text",
                      num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5, shingle_n: int = 5):
    """Near-duplicate pairs via MinHash banding:

    sig per row (`mb`) → explode to (band, band_hash, id) rows → groupby
    band bucket → candidate pairs within bucket → verify estimated
    Jaccard (signature agreement) ≥ threshold.  Returns a Dataset of
    ``(id_a, id_b, jaccard_est)`` with id_a < id_b, deduplicated."""
    import pandas as pd

    rows_per_band = num_perm // bands

    def sig_and_explode(batch: pa.Table) -> pa.Table:
        batch = minhash_signature_batch(batch, col, num_perm, shingle_n)
        sigs = np.array(batch["minhash"].to_pylist(), dtype=np.int64)
        n = batch.num_rows
        band_idx = np.repeat(np.arange(bands, dtype=np.int64), n)
        row_idx = np.tile(np.arange(n), bands)
        grouped = sigs.reshape(n, bands, rows_per_band)
        # hash each band slice to one value
        bh = grouped.astype(np.uint64)
        acc = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            acc = (acc * np.uint64(1099511628211) + bh[:, :, j]) & _MASK
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "band": pa.array(band_idx),
            "band_hash": pa.array(acc.T.reshape(-1).view(np.int64)),
            id_col: pa.array(ids[row_idx]),
            "minhash": pa.array([sigs[r].tolist() for r in row_idx],
                                pa.list_(pa.int64(), num_perm)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_est": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.array(g["minhash"].tolist(), dtype=np.int64)
        out_a, out_b, out_j = [], [], []
        for i in range(len(g)):
            agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            hit = np.nonzero(agree >= jaccard_threshold)[0]
            for h in hit:
                out_a.append(ids[i]); out_b.append(ids[i + 1 + h])
                out_j.append(float(agree[h]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard_est": out_j})

    pairs = (ds.map_batches(sig_and_explode, batch_format="pyarrow")
               .groupby(["band", "band_hash"])
               .map_groups(bucket_pairs, batch_format="pandas"))
    # candidate pairs may appear in multiple bands → dedup
    return exact_dedup(
        pairs.map_batches(
            lambda b: b.append_column(
                "pair", pa.array([f"{a}|{bb}" for a, bb in
                                  zip(b["id_a"].to_pylist(),
                                      b["id_b"].to_pylist())])),
            batch_format="pyarrow"),
        "pair", "id_a").drop_columns(["pair"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, col: str = "text",
                  out_col: str = "simhash", shingle_n: int = 4) -> pa.Table:
    """64-bit SimHash of character shingles: sum of ±1 bit votes of shingle
    hashes, sign → bit."""
    texts = batch[col].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, shingle_n)
        bits = (sh[:, None] >> bit_idx[None, :]) & np.uint64(1)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(sh)
        h = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                h |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(h.astype(np.int64)) if int(h) < 1 << 63 \
            else np.int64(int(h) - (1 << 64))
    return batch.append_column(out_col, pa.array(out))


def simhash_pairs(ds, id_col: str = "doc_id", col: str = "text",
                  max_hamming: int = 3):
    """Near-dup pairs by SimHash: block-permutation LSH — split the 64-bit
    hash into 4 16-bit blocks; pairs within ``max_hamming ≤ 3`` share at
    least one block (pigeonhole) → groupby block value → verify hamming."""
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        batch = simhash_batch(batch, col)
        h = batch["simhash"].to_numpy().view(np.uint64)
        n = len(h)
        blocks, keys, ids, hs = [], [], [], []
        idvals = batch[id_col].to_numpy(zero_copy_only=False)
        for blk in range(4):
            part = (h >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            blocks.append(np.full(n, blk, dtype=np.int64))
            keys.append(part.astype(np.int64))
            ids.append(idvals)
            hs.append(h.view(np.int64))
        return pa.table({
            "blk": pa.array(np.concatenate(blocks)),
            "key": pa.array(np.concatenate(keys)),
            id_col: pa.array(np.concatenate(ids)),
            "simhash": pa.array(np.concatenate(hs)),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().view(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(g)):
            x = hs[i + 1:] ^ hs[i]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(ham <= max_hamming)[0]:
                out_a.append(ids[i]); out_b.append(ids[i + 1 + j])
                out_h.append(int(ham[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby(["blk", "key"]).map_groups(verify, batch_format="pandas"))
    return exact_dedup(
        pairs.map_batches(
            lambda b: b.append_column(
                "pair", pa.array([f"{a}|{bb}" for a, bb in
                                  zip(b["id_a"].to_pylist(),
                                      b["id_b"].to_pylist())])),
            batch_format="pyarrow"),
        "pair", "id_a").drop_columns(["pair"])


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification / small sides)
# ---------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    a = set(_shingle_hashes(text_a, n).tolist())
    b = set(_shingle_hashes(text_b, n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95, n_planes: int = 12,
                        seed: int = 42):
    """Near-dup pairs by cosine ≥ threshold: random-hyperplane LSH bucket
    (sign pattern of ``n_planes`` projections) → within-bucket pairwise
    cosine (vectorized matmul) → threshold.  Recall depends on n_planes;
    exact verification within buckets."""
    import pandas as pd

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        signs = (vecs @ planes) > 0
        key = np.zeros(len(vecs), dtype=np.int64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.int64) << b
        return pa.table({
            "bucket": pa.array(key),
            id_col: batch[id_col],
            vec_col: batch[vec_col],
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        v = np.array(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norms, 1e-12)
        sim = v @ v.T
        iu = np.triu_indices(len(g), k=1)
        hit = sim[iu] >= threshold
        return pd.DataFrame({
            "id_a": ids[iu[0][hit]], "id_b": ids[iu[1][hit]],
            "cosine": sim[iu][hit]})

    return (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(verify, batch_format="pandas"))
