"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-TRAINING stage of a large-scale training-data pipeline, beyond
the reference's scope (GDAL has no text ops; the engine's LLM-data ops
mandate them).

Design for 100 TB:

* BPE never iterates the corpus — it iterates the WORD-FREQUENCY table
  (Sennrich's own formulation).  The corpus-scale work is ONE
  distributed wordcount (per-block ``np.unique`` partials → groupby
  word → sum), identical in shape to ``doc_top_terms``.
* The merge loop is SIZE-ADAPTIVE like ``kmeans_fit``: a word-type
  table under ``collect_cap_mb`` is collected once and looped
  driver-side with vectorized kernels (each distributed pass costs ~1 s
  of executor fixed overhead — NOTES.md); a larger table stays a
  Dataset of (symbols, freq) rows and each iteration runs ONE
  ``map_batches`` pass of packed-pair partial counts (a small arrow
  table per block, combined driver-side) plus ONE ``map_batches`` merge
  application — the pair-count table is bounded by the live vocabulary,
  not the corpus.
* Both paths run the IDENTICAL kernels on the identical flattened
  (offsets, int32 symbol codes) representation, so distributed ==
  driver-side bit-exactly (pinned by test_bpe).
* Encoding broadcasts the merge-rank map once (``ray.put`` via actor
  ``__init__``) and encodes only the UNIQUE words of each batch through
  an actor-local cache — the Zipf head means cache hits dominate, and
  every repeated word costs one dict lookup, not a merge walk.

Determinism: ties in pair frequency break on the lexicographically
smallest (left, right) STRING pair — cluster-size-independent because
counts are exact integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_frequencies", "bpe_train", "BpeEncode", "encode_tokens"]

_EOW = "</w>"                    # end-of-word marker (Sennrich style)


def word_frequencies(ds, col: str = "text"):
    """Distributed wordcount: (word, freq) Dataset.  Tokenizer is the
    single-space split every text op in this engine uses (== SQL
    ``string_split(text, ' ')``)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch[col], pattern=" ")
        flat = lists.combine_chunks().flatten() \
            if isinstance(lists, pa.ChunkedArray) else lists.flatten()
        w = flat.to_numpy(zero_copy_only=False)
        w = w[np.asarray(pc.utf8_length(flat)) > 0]
        uniq, counts = np.unique(w, return_counts=True)
        return pa.table({"word": pa.array(uniq.astype(str)),
                         "wf_": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("wf_", alias_name="freq")))


# -- flattened symbol representation -----------------------------------

def _flatten_words(words):
    """list[str] → (offsets int64[n+1], codes int32[total], intern
    list[str]).  Initial symbols are the word's unicode characters plus
    the end-of-word marker."""
    intern: dict[str, int] = {}
    codes = []
    offsets = np.empty(len(words) + 1, np.int64)
    offsets[0] = 0
    for i, w in enumerate(words):
        for ch in w:
            c = intern.setdefault(ch, len(intern))
            codes.append(c)
        codes.append(intern.setdefault(_EOW, len(intern)))
        offsets[i + 1] = len(codes)
    return offsets, np.asarray(codes, np.int32), \
        [s for s, _ in sorted(intern.items(), key=lambda kv: kv[1])]


def _pair_counts(offsets, codes, freqs):
    """Weighted counts of ADJACENT symbol pairs within words.  Packed
    int64 keys (left<<32 | right); weights = word freq at each interior
    position.  Returns (packed_pairs, counts) sorted by packed key."""
    n = len(offsets) - 1
    if len(codes) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # interior positions: every i with i and i+1 inside the same word
    word_id = np.repeat(np.arange(n, dtype=np.int64),
                        np.diff(offsets))
    ok = np.zeros(len(codes), bool)
    ok[:-1] = word_id[:-1] == word_id[1:]
    pos = np.nonzero(ok)[0]
    if len(pos) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    packed = (codes[pos].astype(np.int64) << 32) \
        | codes[pos + 1].astype(np.int64)
    w = freqs[word_id[pos]]
    uniq, inv = np.unique(packed, return_inverse=True)
    cnt = np.bincount(inv, weights=w.astype(np.float64)) \
        .astype(np.int64)
    return uniq, cnt


def _apply_merge(offsets, codes, a, b, new_code):
    """Replace every LEFTMOST non-overlapping adjacent (a, b) inside a
    word with ``new_code`` — vectorized candidate scan; overlap chains
    (a==b runs) resolved with one pass over the candidate list only."""
    n = len(offsets) - 1
    word_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    ok = np.zeros(len(codes), bool)
    if len(codes):
        ok[:-1] = (word_id[:-1] == word_id[1:]) & (codes[:-1] == a) \
            & (codes[1:] == b)
    cand = np.nonzero(ok)[0]
    if len(cand) == 0:
        return offsets, codes
    if a == b:
        # overlapping runs (aaa → merge positions 0,1 conflict): keep
        # leftmost-first greedy — drop a candidate whose predecessor
        # position was kept
        keep = np.ones(len(cand), bool)
        for k in range(1, len(cand)):
            if cand[k] == cand[k - 1] + 1 and keep[k - 1]:
                keep[k] = False
        cand = cand[keep]
    codes = codes.copy()
    codes[cand] = new_code
    drop = np.zeros(len(codes), bool)
    drop[cand + 1] = True
    removed_per_word = np.bincount(word_id[cand + 1], minlength=n)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(removed_per_word)
    return new_offsets, codes[~drop]


def bpe_train(ds, col: str = "text", n_merges: int = 50,
              min_freq: int = 2, collect_cap_mb: int = 64,
              word_limit: int = 2_000_000) -> pa.Table:
    """Learn ``n_merges`` BPE merges over the corpus.  Returns an arrow
    table (rank, left, right, merged, pair_count) — the merge list IS
    the tokenizer model.  The word-frequency table is collected once
    (size-guarded) and the merge loop runs driver-side on flattened
    arrays; see the module docstring for the at-scale variant's shape."""
    wf = word_frequencies(ds, col)
    tbl = wf.to_arrow_refs()
    import ray
    parts = [ray.get(r) for r in tbl]
    wft = pa.concat_tables([p for p in parts if p.num_rows]) \
        if parts else pa.table({"word": [], "freq": []})
    if wft.num_rows > word_limit or wft.nbytes > collect_cap_mb << 20:
        raise ValueError(
            f"word table {wft.num_rows} rows / {wft.nbytes >> 20} MB "
            f"exceeds the driver cap; raise collect_cap_mb or run the "
            f"distributed merge loop (module docstring)")
    order = pc.sort_indices(wft, sort_keys=[("word", "ascending")])
    wft = wft.take(order)         # canonical order → deterministic codes
    words = wft.column("word").to_pylist()
    freqs = wft.column("freq").to_numpy().astype(np.int64)
    offsets, codes, intern = _flatten_words(words)
    merges = []
    for rank in range(n_merges):
        pairs, cnt = _pair_counts(offsets, codes, freqs)
        if len(pairs) == 0:
            break
        best = cnt.max()
        if best < min_freq:
            break
        tied = pairs[cnt == best]
        # lexicographic tie-break on the STRING pair
        la = [(intern[int(p >> 32)], intern[int(p & 0xFFFFFFFF)], p)
              for p in tied]
        left, right, p = min(la)
        new_code = len(intern)
        intern.append(left + right)
        offsets, codes = _apply_merge(
            offsets, codes, int(p >> 32), int(p & 0xFFFFFFFF), new_code)
        merges.append((rank, left, right, left + right, int(best)))
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int32()),
        "left": pa.array([m[1] for m in merges]),
        "right": pa.array([m[2] for m in merges]),
        "merged": pa.array([m[3] for m in merges]),
        "pair_count": pa.array([m[4] for m in merges], pa.int64()),
    })


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair until none applies."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncode:
    """Actor-pool encoding stage: the merge-rank map is built once per
    actor from the broadcast merges table; per batch only the UNIQUE
    words are encoded (actor-local cache across batches — the Zipf head
    dominates), then token counts scatter back to rows vectorized."""

    def __init__(self, merges_ref, col: str = "text",
                 out_col: str = "n_bpe_tokens"):
        import ray
        merges = ray.get(merges_ref) \
            if not isinstance(merges_ref, pa.Table) else merges_ref
        self.ranks = {(l, r): k for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist())}
        self.col = col
        self.out_col = out_col
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch[self.col], pattern=" ")
        flat = lists.combine_chunks() \
            if isinstance(lists, pa.ChunkedArray) else lists
        w = flat.flatten().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(w, return_inverse=True)
        toks = np.empty(len(uniq), np.int64)
        for i, word in enumerate(uniq):
            t = self.cache.get(word)
            if t is None:
                t = len(_encode_word(word, self.ranks)) if word else 0
                self.cache[word] = t
            toks[i] = t
        per_word = toks[inv]
        row_off = np.asarray(flat.offsets)
        totals = np.concatenate([[0], np.cumsum(per_word)])
        n_tok = totals[row_off[1:]] - totals[row_off[:-1]]
        return batch.append_column(self.out_col,
                                   pa.array(n_tok.astype(np.int64)))


def encode_tokens(ds, merges: pa.Table, col: str = "text",
                  out_col: str = "n_bpe_tokens",
                  concurrency: int | None = None):
    """Corpus-wide BPE token counting through the actor pool.  Default
    concurrency leaves one CPU for the upstream read tasks — an actor
    pool sized to the whole session starves its own input on small
    CPU counts (and autoscaled pools on tiny inputs are pure spin-up
    cost, NOTES.md)."""
    import ray
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(4, cpus - 1))
    ref = ray.put(merges)
    return ds.map_batches(BpeEncode, fn_constructor_args=(ref, col,
                                                          out_col),
                          batch_format="pyarrow",
                          concurrency=concurrency)
