"""BPE tokenizer training (georay.bpe): the distributed word-frequency +
vectorized merge loop must equal a classic in-memory Sennrich reference
exactly (merge list, ranks, counts); encoding invariants pinned."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_freqs: dict, n_merges: int, min_freq: int):
    """Textbook BPE (Sennrich et al. 2016 fig. 1), tuple-of-symbols
    vocab, leftmost-greedy merge, lexicographic tie-break."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = max(pairs.values())
        if best < min_freq:
            break
        pair = min(p for p, c in pairs.items() if c == best)
        merges.append((rank, pair[0], pair[1],
                       pair[0] + pair[1], best))
        newv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == pair[0] \
                        and syms[i + 1] == pair[1]:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            newv[t] = newv.get(t, 0) + f
        vocab = newv
    return merges


def test_bpe_train_matches_reference(ray_session):
    import ray
    from georay.bpe import bpe_train
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["text"])
    got = bpe_train(ds, n_merges=30, min_freq=2).to_pandas()

    wf = {}
    for t in pd.read_parquet(f"{SF}/documents.parquet").text:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    want = pd.DataFrame(_ref_bpe(wf, 30, 2),
                        columns=["rank", "left", "right", "merged",
                                 "pair_count"])
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_apply_merge_overlap():
    """aaa → leftmost-first greedy: ONE merge at position 0, the third
    'a' survives (the overlap chain rule)."""
    from georay.bpe import _flatten_words, _apply_merge, _pair_counts
    offsets, codes, intern = _flatten_words(["aaa", "aa"])
    a = intern.index("a")
    new = len(intern)
    offsets2, codes2 = _apply_merge(offsets, codes, a, a, new)
    intern.append("aa")
    def syms(i):
        return [intern[c] for c in codes2[offsets2[i]:offsets2[i + 1]]]
    assert syms(0) == ["aa", "a", "</w>"]
    assert syms(1) == ["aa", "</w>"]
    # pair counts with weights
    p, c = _pair_counts(offsets2, codes2,
                        np.array([3, 2], dtype=np.int64))
    assert c.sum() == 3 * 2 + 2 * 1   # word0 has 2 pairs ×3, word1 1 ×2


def test_bpe_encode_counts(ray_session):
    """Token counts through the actor-pool encode: fewer-or-equal
    tokens than characters+EOW, and a corpus with no merges applied
    yields exactly chars+1 per word."""
    import ray
    from georay.bpe import bpe_train, encode_tokens, _encode_word
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    merges = bpe_train(ds, n_merges=20, min_freq=2)
    out = encode_tokens(ds, merges, concurrency=2).to_pandas()
    assert (out.n_bpe_tokens > 0).all()
    # spot-check one row against the scalar encoder
    ranks = {(l, r): k for k, l, r in zip(
        merges.column("rank").to_pylist(),
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist())}
    row = out.iloc[0]
    n = sum(len(_encode_word(w, ranks))
            for w in row.text.split(" ") if w)
    assert n == row.n_bpe_tokens
    # merges strictly reduce or hold token counts vs no merges
    none = encode_tokens(ds, merges.slice(0, 0),
                         concurrency=2).to_pandas()
    j = out.merge(none, on="doc_id", suffixes=("", "_plain"))
    assert (j.n_bpe_tokens <= j.n_bpe_tokens_plain).all()
    assert (j.n_bpe_tokens < j.n_bpe_tokens_plain).any()
