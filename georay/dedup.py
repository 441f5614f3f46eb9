"""Deduplication operators over document / image tables — the
training-data-pipeline extensions (repo charter: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

GDAL itself has no generic dedup (SURVEY.md §2.6 — FID uniqueness +
SQL DISTINCT only); these are first-class additions expressed Ray-Data
native, designed for the 100 TB shuffle budget:

* exact: vectorized 64-bit content hash in ``map_batches`` (straight off
  the Arrow buffers) → ``groupby(hash)`` — whole documents never shuffle.
* MinHash+LSH: signatures are computed once per doc (one concatenated
  ``minimum.reduceat`` per batch, no per-doc Python); ONLY
  ``(band, band_hash, id)`` rows enter the banding shuffle (never the
  signature — 16× smaller than replicating it per band); candidate
  buckets are size-capped against degenerate boilerplate keys; candidate
  pairs are verified with EXACT n-gram Jaccard via a tagged-union
  co-shuffle that moves only candidate documents.
* SimHash: 64-bit fingerprint; candidates via ``n_blocks`` block keys
  (pigeonhole: hamming ≤ n_blocks−1 guaranteed recall), verified with a
  vectorized SWAR popcount — never per-pair Python ``bin().count``.
* embedding cosine: multi-band random-hyperplane LSH (OR-construction
  across bands) shuffling ``(band, key, id)`` only, with exact cosine
  verification through the same tagged-union pattern; plus an exact
  broadcast all-pairs path for corpora whose matrix fits the object
  store (the oracle baseline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import fsl_to_numpy, hash_strings, popcount64

__all__ = [
    "content_hash_batch", "exact_dedup", "minhash_signature_batch",
    "minhash_lsh_pairs", "simhash_batch", "simhash_pairs",
    "ngram_jaccard", "embedding_dup_pairs", "embedding_dup_pairs_exact",
    "verify_pairs_jaccard",
]

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def content_hash_batch(batch: pa.Table, col: str = "text",
                       out_col: str = "content_hash") -> pa.Table:
    """Add a 64-bit content hash of a string/binary column — vectorized
    polynomial hash over the Arrow values buffer (georay.util.hash_strings);
    no per-row Python."""
    h = hash_strings(batch[col])
    return batch.append_column(out_col, pa.array(h.view(np.int64)))


def exact_dedup(ds, key_col: str, order_col: str):
    """Keep the first row (min ``order_col``) per ``key_col`` group —
    hash-partitioned first-per-group (SURVEY.md §7.3).  Pure pyarrow
    (sort_by + slice): no pandas conversion on arbitrarily large groups."""

    def first(g: pa.Table) -> pa.Table:
        return g.sort_by(order_col).slice(0, 1)

    return ds.groupby(key_col).map_groups(first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, n: int = 5, unique: bool = True) -> np.ndarray:
    """Character n-gram shingle hashes (uint64) of one document.

    ``unique=False`` skips the dedup sort — valid for MinHash (the min over
    a multiset equals the min over its set)."""
    b = text.encode("utf-8")
    if len(b) < n:
        b = b + b"\x00" * (n - len(b))
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    idx = np.arange(n, dtype=np.uint64)
    weights = np.uint64(1099511628211) ** idx
    windows = np.lib.stride_tricks.sliding_window_view(a, n)
    h = (windows * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(h) if unique else h


def _batch_shingles(texts, n: int):
    """All docs' shingle hashes concatenated + per-doc offsets — one
    vectorized pass over the batch (no per-doc hashing loop).

    Uses the same rolling-hash family as :func:`_shingle_hashes` (verified
    equal in tests)."""
    bufs = [t.encode("utf-8") for t in texts]
    bufs = [b + b"\x00" * (n - len(b)) if len(b) < n else b for b in bufs]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    idx = np.arange(n, dtype=np.uint64)
    weights = np.uint64(1099511628211) ** idx
    windows = np.lib.stride_tricks.sliding_window_view(cat, n)
    all_h = (windows * weights).sum(axis=1, dtype=np.uint64)
    # valid window start positions: [start, start+len-n] per doc
    counts = lens - n + 1
    doc_starts = starts[:-1]
    keep = np.zeros(len(all_h) + 1, dtype=np.int64)
    np.add.at(keep, doc_starts, 1)
    np.add.at(keep, doc_starts + counts, -1)
    mask = np.cumsum(keep[:-1]) > 0
    sh = all_h[mask]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return sh, offsets


def minhash_signature_batch(batch: pa.Table, col: str = "text",
                            num_perm: int = 128,
                            shingle_n: int = 5) -> pa.Table:
    """Add a fixed-size MinHash signature column (list<uint64 as int64>).

    Universal-hash family ``h_i(x) = (a_i·x + b_i) mod 2^64`` over shingle
    hashes; the whole batch is one concatenated ``minimum.reduceat`` —
    no per-document broadcast loop."""
    rng_a = (np.arange(1, num_perm + 1, dtype=np.uint64) * _H1 | np.uint64(1))
    rng_b = np.arange(num_perm, dtype=np.uint64) * _H2
    texts = batch[col].to_pylist()
    n_docs = len(texts)
    if n_docs == 0:
        return batch.append_column(
            "minhash", pa.array([], pa.list_(pa.int64(), num_perm)))
    sh, offsets = _batch_shingles(texts, shingle_n)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    # chunk the (shingles × perms) expansion to bound the working set
    chunk = max(1, 200_000 // num_perm * num_perm)
    doc_idx = 0
    total = len(sh)
    # process docs in runs whose shingles fit the chunk budget
    run_start = 0
    while run_start < n_docs:
        run_end = run_start
        while (run_end < n_docs
               and offsets[run_end + 1] - offsets[run_start] <= chunk):
            run_end += 1
        run_end = max(run_end, run_start + 1)
        lo, hi = offsets[run_start], offsets[run_end]
        vals = (sh[lo:hi, None] * rng_a[None, :] + rng_b[None, :]) & _MASK
        local_off = (offsets[run_start:run_end] - lo).astype(np.int64)
        sigs[run_start:run_end] = np.minimum.reduceat(vals, local_off, axis=0)
        run_start = run_end
    return batch.append_column(
        "minhash", pa.array(list(sigs.view(np.int64)),
                            pa.list_(pa.int64(), num_perm)))


def ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    """Exact character n-gram Jaccard (pair-level verifier)."""
    a = set(_shingle_hashes(text_a, n).tolist())
    b = set(_shingle_hashes(text_b, n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# Candidate-pair machinery shared by MinHash / SimHash / embedding LSH
# ---------------------------------------------------------------------------

def _bucket_candidate_pairs(ds_keys, id_col: str, key_cols,
                            max_bucket: int = 512, extra_cols=(),
                            num_partitions: int | None = None):
    """Bucketed candidate (id_a, id_b) pairs WITHOUT one map_groups call
    per bucket: buckets are hash-PARTITIONED (``groupby(hash(key) % P)``,
    P ≈ 4×CPUs) and each partition resolves all its buckets in one
    vectorized pass (lexsort → run detection → per-run triu) — per-group
    Python-call overhead at millions of buckets killed the naive
    ``groupby(bucket).map_groups`` shape.

    Buckets larger than ``max_bucket`` are truncated to their first
    ``max_bucket`` ids (sorted) — degenerate boilerplate buckets otherwise
    cost O(b²); the cap is the documented recall cut (VERDICT r1 §wrong-2).
    ``extra_cols`` are carried from both rows (suffixed _a/_b)."""
    import ray
    if num_partitions is None:
        num_partitions = 4 * max(
            2, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in key_cols:
            h = (h * np.uint64(1099511628211)
                 + batch[c].to_numpy().view(np.uint64)) & _MASK
        return batch.append_column(
            "part__", pa.array((h % np.uint64(num_partitions))
                               .astype(np.int64)))

    def pairs_in_partition(g: pa.Table) -> pa.Table:
        out = {"id_a": pa.array([], pa.int64()),
               "id_b": pa.array([], pa.int64())}
        for c in extra_cols:
            t = g.schema.field(c).type
            out[f"{c}_a"] = pa.array([], t)
            out[f"{c}_b"] = pa.array([], t)
        if g.num_rows < 2:
            return pa.table(out)
        keys = [g[c].to_numpy() for c in key_cols]
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, *reversed(keys)))
        ks = [k[order] for k in keys]
        ids_s = ids[order]
        diff = np.zeros(len(ids_s), dtype=bool)
        for k in ks:
            diff[1:] |= k[1:] != k[:-1]
        starts = np.concatenate([[0], np.nonzero(diff)[0],
                                 [len(ids_s)]])
        starts = np.unique(starts)
        out_a, out_b, out_take_a, out_take_b = [], [], [], []
        for si in range(len(starts) - 1):
            s, e = int(starts[si]), int(starts[si + 1])
            n = min(e - s, max_bucket)
            if n < 2:
                continue
            iu = np.triu_indices(n, k=1)
            out_take_a.append(order[s:s + n][iu[0]])
            out_take_b.append(order[s:s + n][iu[1]])
        if not out_take_a:
            return pa.table(out)
        ta = np.concatenate(out_take_a)
        tb = np.concatenate(out_take_b)
        res = {"id_a": pa.array(ids[ta]), "id_b": pa.array(ids[tb])}
        for c in extra_cols:
            col = g[c].to_numpy()
            res[f"{c}_a"] = pa.array(col[ta])
            res[f"{c}_b"] = pa.array(col[tb])
        return pa.table(res)

    return (ds_keys.map_batches(add_part, batch_format="pyarrow")
            .groupby("part__")
            .map_groups(pairs_in_partition, batch_format="pyarrow"))


def verify_pairs_jaccard(pairs_ds, docs_ds, *, id_col: str = "doc_id",
                         col: str = "text", shingle_n: int = 5,
                         threshold: float = 0.5):
    """Exact n-gram-Jaccard verification of candidate ``(id_a, id_b)``
    pairs without shuffling the corpus: the candidate pair list (output-
    scale, tiny relative to the corpus) is materialized once and its id
    SET broadcast (``ray.put``); the document table is semi-join-FILTERED
    to candidate docs inside ``map_batches`` (non-candidates never enter
    any shuffle), then one small ``groupby(id)`` attaches texts to pairs
    and one small ``groupby(pair)`` computes exact Jaccard."""
    import pyarrow.compute as pc
    import ray

    # materialize candidates (bounded by bucket caps; ≈ output size)
    cand_rows = pairs_ds.take_all()
    if not cand_rows:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    cand = pa.table({
        "id_a": pa.array([r["id_a"] for r in cand_rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in cand_rows], pa.int64()),
    })
    id_set = pa.array(sorted(set(cand["id_a"].to_pylist())
                             | set(cand["id_b"].to_pylist())), pa.int64())
    ids_ref = ray.put(id_set)
    pairs_ds = ray.data.from_arrow(cand)

    def semi_filter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref) if not isinstance(ids_ref, pa.Array) \
            else ids_ref
        return batch.filter(pc.is_in(batch[id_col], value_set=wanted))

    docs_ds = docs_ds.map_batches(semi_filter, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        return pa.table({
            "m_id": pa.array(np.concatenate([a, b])),
            "id_a": pa.array(np.concatenate([a, a])),
            "id_b": pa.array(np.concatenate([b, b])),
            "role": pa.array(np.concatenate([
                np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])),
            col: pa.nulls(2 * len(a), pa.string()),
        })

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "m_id": batch[id_col],
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "role": pa.array(np.full(n, -1, np.int8)),
            col: batch[col],
        })

    both = pairs_ds.map_batches(explode, batch_format="pyarrow").union(
        docs_ds.map_batches(tag_docs, batch_format="pyarrow"))

    def attach(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_doc = pc.equal(g["role"], pa.scalar(-1, pa.int8()))
        doc = g.filter(is_doc)
        mem = g.filter(pc.invert(is_doc))
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "role": pa.array([], pa.int8()),
                          col: pa.array([], pa.string())})
        if doc.num_rows == 0 or mem.num_rows == 0:
            return empty
        # dedup duplicate memberships (same pair seen from several bands)
        key = [f"{a}|{b}|{r}" for a, b, r in zip(
            mem["id_a"].to_pylist(), mem["id_b"].to_pylist(),
            mem["role"].to_pylist())]
        _, first = np.unique(np.asarray(key, dtype=object),
                             return_index=True)
        mem = mem.take(pa.array(np.sort(first)))
        text = doc[col][0].as_py()
        return pa.table({
            "id_a": mem["id_a"], "id_b": mem["id_b"], "role": mem["role"],
            col: pa.array([text] * mem.num_rows, pa.string())})

    attached = both.groupby("m_id").map_groups(attach, batch_format="pyarrow")

    def judge(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        roles = g["role"].to_numpy()
        if g.num_rows < 2 or (roles == 0).sum() == 0 or (roles == 1).sum() == 0:
            return empty
        ta = g[col][int(np.nonzero(roles == 0)[0][0])].as_py()
        tb = g[col][int(np.nonzero(roles == 1)[0][0])].as_py()
        j = ngram_jaccard(ta, tb, shingle_n)
        if j < threshold:
            return empty
        return pa.table({"id_a": g["id_a"][:1], "id_b": g["id_b"][:1],
                         "jaccard": pa.array([j], pa.float64())})

    return attached.groupby(["id_a", "id_b"]).map_groups(
        judge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pipeline
# ---------------------------------------------------------------------------

def minhash_band_keys(ds, id_col: str = "doc_id", col: str = "text",
                      num_perm: int = 128, bands: int = 32,
                      shingle_n: int = 5):
    """Signature → (band, band_hash, id) rows.  ONLY these three columns
    enter the shuffle (the signature itself never replicates per band)."""
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        sigt = minhash_signature_batch(batch, col, num_perm, shingle_n)
        sigs = fsl_to_numpy(sigt["minhash"], dtype=np.int64)\
            .view(np.uint64)
        n = len(sigs)
        if n == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        grouped = sigs.reshape(n, bands, rows_per_band)
        acc = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            acc = (acc * np.uint64(1099511628211) + grouped[:, :, j]) & _MASK
        ids = batch[id_col].to_numpy()
        return pa.table({
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
            "band_hash": pa.array(acc.T.reshape(-1).view(np.int64)),
            id_col: pa.array(np.tile(ids, bands)),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def minhash_lsh_pairs(ds, id_col: str = "doc_id", col: str = "text",
                      num_perm: int = 128, bands: int = 32,
                      jaccard_threshold: float = 0.5, shingle_n: int = 5,
                      max_bucket: int = 512):
    """Near-duplicate pairs: MinHash banding candidates + EXACT n-gram
    Jaccard ≥ ``jaccard_threshold`` verification.

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b, deduplicated.
    Recall at similarity j: ``1 − (1 − j^(num_perm/bands))^bands`` —
    ≈1−5e−8 at j=0.8 with the 128/32 defaults."""
    keys = minhash_band_keys(ds, id_col, col, num_perm, bands, shingle_n)
    cand = _bucket_candidate_pairs(keys, id_col, ["band", "band_hash"],
                                   max_bucket)
    return verify_pairs_jaccard(cand, ds, id_col=id_col, col=col,
                                shingle_n=shingle_n,
                                threshold=jaccard_threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, col: str = "text",
                  out_col: str = "simhash", shingle_n: int = 4) -> pa.Table:
    """64-bit SimHash of character shingles: sum of ±1 bit votes of shingle
    hashes, sign → bit.  Whole batch vectorized (one concatenated
    ``add.reduceat`` over the bit-vote matrix)."""
    texts = batch[col].to_pylist()
    n_docs = len(texts)
    if n_docs == 0:
        return batch.append_column(out_col, pa.array([], pa.int64()))
    sh, offsets = _batch_shingles(texts, shingle_n)
    # unique shingles per doc (simhash votes once per distinct shingle):
    # ONE global lexsort over (doc, hash) + run detection — no per-doc
    # np.unique loop
    bit_idx = np.arange(64, dtype=np.uint64)
    counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((sh, doc_of))
    sh_s = sh[order]
    doc_s = doc_of[order]
    first = np.ones(len(sh_s), dtype=bool)
    first[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
    shu = sh_s[first]
    docu = doc_s[first]
    new_counts = np.bincount(docu, minlength=n_docs).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(new_counts)])
    bits = ((shu[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
    idx = np.minimum(offs[:-1], max(len(shu) - 1, 0))
    votes = 2 * np.add.reduceat(bits, idx, axis=0) \
        - new_counts[:, None]
    votes[new_counts == 0] = -1
    h = (votes > 0).astype(np.uint64) << bit_idx[None, :]
    out = h.sum(axis=1, dtype=np.uint64)
    return batch.append_column(out_col, pa.array(out.view(np.int64)))


def simhash_pairs(ds, id_col: str = "doc_id", col: str = "text",
                  max_hamming: int = 3, n_blocks: int = 4,
                  shingle_n: int = 4, max_bucket: int = 512):
    """Near-dup pairs by SimHash block-permutation LSH: the 64-bit hash
    splits into ``n_blocks`` equal blocks; pairs within hamming ≤
    ``n_blocks − 1`` share at least one block (pigeonhole) → groupby block
    value → vectorized SWAR-popcount hamming verify.

    ``n_blocks`` must exceed ``max_hamming`` for guaranteed recall."""
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must be > max_hamming (pigeonhole)")
    bits_per = 64 // n_blocks

    def explode(batch: pa.Table) -> pa.Table:
        batch = simhash_batch(batch, col, shingle_n=shingle_n)
        h = batch["simhash"].to_numpy().view(np.uint64)
        n = len(h)
        ids = batch[id_col].to_numpy()
        blocks = np.repeat(np.arange(n_blocks, dtype=np.int64), n)
        shifts = (np.arange(n_blocks, dtype=np.uint64) * np.uint64(bits_per))
        mask = np.uint64((1 << bits_per) - 1)
        keys = ((h[None, :] >> shifts[:, None]) & mask).astype(np.int64)
        return pa.table({
            "blk": pa.array(blocks),
            "key": pa.array(keys.reshape(-1)),
            id_col: pa.array(np.tile(ids, n_blocks)),
            "simhash": pa.array(np.tile(h.view(np.int64), n_blocks)),
        })

    keys = ds.map_batches(explode, batch_format="pyarrow")
    cand = _bucket_candidate_pairs(keys, id_col, ["blk", "key"],
                                   max_bucket, extra_cols=("simhash",))

    def verify(batch: pa.Table) -> pa.Table:
        ha = batch["simhash_a"].to_numpy().view(np.uint64)
        hb = batch["simhash_b"].to_numpy().view(np.uint64)
        ham = popcount64(ha ^ hb)
        keep = ham <= max_hamming
        idx = pa.array(np.nonzero(keep)[0])
        return pa.table({
            "id_a": batch["id_a"].take(idx),
            "id_b": batch["id_b"].take(idx),
            "hamming": pa.array(ham[keep]),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow")
    # a pair may surface from several blocks → distinct
    return _distinct_pairs(verified)


def _distinct_pairs(pairs_ds):
    """One row per (id_a, id_b) — first-per-group, pure pyarrow."""

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs_ds.groupby(["id_a", "id_b"]).map_groups(
        first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95, bands: int = 16,
                        planes_per_band: int = 8, seed: int = 42,
                        max_bucket: int = 512):
    """Near-dup pairs by cosine ≥ threshold: multi-band random-hyperplane
    LSH (OR-construction: candidate iff sign patterns agree in ≥1 band;
    recall at angle θ = 1−(1−(1−θ/π)^r)^B) → candidates shuffle as
    ``(band, key, id)`` rows only → exact-cosine verification moves only
    candidate vectors (tagged-union co-shuffle).  The hyperplane matrix is
    sampled ONCE per stage (closure), not per batch."""
    import pyarrow.compute as pc

    state = {}

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = fsl_to_numpy(batch[vec_col])
        n = len(vecs)
        if n == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        if "planes" not in state:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal(
                (vecs.shape[1], bands * planes_per_band))
        signs = (vecs @ state["planes"]) > 0  # (n, B*r)
        keys = np.zeros((n, bands), dtype=np.int64)
        for b in range(bands):
            for p in range(planes_per_band):
                keys[:, b] |= (signs[:, b * planes_per_band + p]
                               .astype(np.int64) << p)
        ids = batch[id_col].to_numpy()
        return pa.table({
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
            "key": pa.array(keys.T.reshape(-1)),
            id_col: pa.array(np.tile(ids, bands)),
        })

    keys = ds.map_batches(bucket, batch_format="pyarrow")
    cand = _bucket_candidate_pairs(keys, id_col, ["band", "key"], max_bucket)

    # exact cosine verify: broadcast the candidate-id set and semi-filter
    # the vector table so only candidate vectors enter the shuffle
    import ray
    cand_rows = cand.take_all()
    empty_out = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
    if not cand_rows:
        return ray.data.from_arrow(empty_out)
    cand = ray.data.from_arrow(pa.table({
        "id_a": pa.array([r["id_a"] for r in cand_rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in cand_rows], pa.int64())}))
    id_set = pa.array(sorted({r["id_a"] for r in cand_rows}
                             | {r["id_b"] for r in cand_rows}), pa.int64())
    ids_ref = ray.put(id_set)

    def semi_filter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        return batch.filter(pc.is_in(batch[id_col], value_set=wanted))

    ds = ds.map_batches(semi_filter, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        return pa.table({
            "m_id": pa.array(np.concatenate([a, b])),
            "id_a": pa.array(np.concatenate([a, a])),
            "id_b": pa.array(np.concatenate([b, b])),
            "role": pa.array(np.concatenate([
                np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])),
            vec_col: pa.nulls(2 * len(a), pa.list_(pa.float64())),
        })

    def tag_vecs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vecs = fsl_to_numpy(batch[vec_col])
        return pa.table({
            "m_id": batch[id_col],
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "role": pa.array(np.full(n, -1, np.int8)),
            vec_col: pa.array(list(vecs), pa.list_(pa.float64())),
        })

    both = cand.map_batches(explode, batch_format="pyarrow").union(
        ds.map_batches(tag_vecs, batch_format="pyarrow"))

    def attach(g: pa.Table) -> pa.Table:
        is_doc = pc.equal(g["role"], pa.scalar(-1, pa.int8()))
        doc = g.filter(is_doc)
        mem = g.filter(pc.invert(is_doc))
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "role": pa.array([], pa.int8()),
                          vec_col: pa.array([], pa.list_(pa.float64()))})
        if doc.num_rows == 0 or mem.num_rows == 0:
            return empty
        key = [f"{a}|{b}|{r}" for a, b, r in zip(
            mem["id_a"].to_pylist(), mem["id_b"].to_pylist(),
            mem["role"].to_pylist())]
        _, first = np.unique(np.asarray(key, dtype=object), return_index=True)
        mem = mem.take(pa.array(np.sort(first)))
        v = doc[vec_col][0]
        return pa.table({
            "id_a": mem["id_a"], "id_b": mem["id_b"], "role": mem["role"],
            vec_col: pa.array([v.as_py()] * mem.num_rows,
                              pa.list_(pa.float64()))})

    attached = both.groupby("m_id").map_groups(attach, batch_format="pyarrow")

    def judge(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        roles = g["role"].to_numpy()
        if g.num_rows < 2 or (roles == 0).sum() == 0 or (roles == 1).sum() == 0:
            return empty
        va = np.asarray(g[vec_col][int(np.nonzero(roles == 0)[0][0])]
                        .as_py(), dtype=np.float64)
        vb = np.asarray(g[vec_col][int(np.nonzero(roles == 1)[0][0])]
                        .as_py(), dtype=np.float64)
        cos = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb),
                                  1e-12))
        if cos < threshold:
            return empty
        return pa.table({"id_a": g["id_a"][:1], "id_b": g["id_b"][:1],
                         "cosine": pa.array([cos], pa.float64())})

    return attached.groupby(["id_a", "id_b"]).map_groups(
        judge, batch_format="pyarrow")


class _ExactDupScore:
    """Actor: broadcast normalized matrix + ids; per batch emits all pairs
    (my rows × whole matrix) with cosine ≥ threshold and id_a < id_b."""

    def __init__(self, ref, threshold: float, id_col: str, vec_col: str):
        import ray
        self.ids, self.mat = ray.get(ref)
        self.threshold = threshold
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        vecs = fsl_to_numpy(batch[self.vec_col])
        if vecs.size == 0:
            return empty
        vecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = batch[self.id_col].to_numpy()
        sim = vecs @ self.mat.T  # (nb, N)
        hit_r, hit_c = np.nonzero(sim >= self.threshold)
        ia, ib = ids[hit_r], self.ids[hit_c]
        keep = ia < ib  # dedup: each unordered pair emitted once
        return pa.table({"id_a": pa.array(ia[keep]),
                         "id_b": pa.array(ib[keep])})


def embedding_dup_pairs_exact(ds, full: pa.Table, *, threshold: float,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              batch_size: int = 4096, concurrency=None):
    """EXACT all-pairs cosine ≥ threshold: the normalized corpus matrix is
    broadcast once (``ray.put``); every batch does one matmul against it.
    O(n²) work distributed over batches with NO shuffle — correct whenever
    the matrix fits worker memory (the oracle baseline; the LSH path above
    is the >memory scale path)."""
    import ray
    from .util import default_concurrency
    ids = full[id_col].to_numpy()
    mat = fsl_to_numpy(full[vec_col])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))
    # cap the pool: per-batch work is one matmul — actor spin-up would
    # dominate a wide autoscaled pool on small inputs
    return ds.map_batches(
        _ExactDupScore, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(ref=ref, threshold=threshold,
                                   id_col=id_col, vec_col=vec_col),
        concurrency=concurrency or default_concurrency(cap=8))
