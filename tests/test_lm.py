"""Char-trigram LM pins (georay/lm.py) — tiny corpora computed by hand
and an independent pure-Python re-implementation."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from georay.lm import (PerplexityScorer, _codes, _trigram_codes,
                       train_char_trigram_lm)


def _ray_ds(texts, ray_session):
    import ray
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts))),
        "text": pa.array(texts)}))


def _reference_scores(texts):
    """Independent per-doc avg logprob via plain dict counting."""
    tris = Counter()
    for t in texts:
        for i in range(len(t) - 2):
            tris[t[i:i + 3]] += 1
    ctx = Counter()
    for t3, n in tris.items():
        ctx[t3[:2]] += n
    vocab = set("".join(texts))
    V = len(vocab)
    out = []
    for t in texts:
        lps = [math.log((tris[t[i:i + 3]] + 1) / (ctx[t[i:i + 2]] + V))
               for i in range(len(t) - 2)]
        out.append(sum(lps) / len(lps) if lps else float("nan"))
    return out


def test_trigram_boundaries_and_codes():
    vocab = np.frombuffer("abc".encode("utf-32-le"), np.uint32)
    codes, lens = _codes(["abca", "bc"], np.sort(vocab))
    tri, doc_of = _trigram_codes(codes, lens, 3)
    # "abca" has trigrams abc, bca; "bc" has none; nothing crosses docs
    assert len(tri) == 2
    assert doc_of.tolist() == [0, 0]
    # unknown char maps to -1 and kills its trigrams
    codes, lens = _codes(["abXca"], np.sort(vocab))
    tri, _ = _trigram_codes(codes, lens, 3)
    assert len(tri) == 0  # every window touches X


def test_model_and_scores_match_reference(ray_session):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a mat a cat a bat"]
    ds = _ray_ds(texts, ray_session)
    model = train_char_trigram_lm(ds)
    # model totals: every trigram of every doc counted once
    assert model["tri_counts"].sum() == sum(len(t) - 2 for t in texts)
    assert model["V"] == len(set("".join(texts)))
    scorer = PerplexityScorer(model)
    out = scorer(pa.table({"doc_id": pa.array([0, 1, 2]),
                           "text": pa.array(texts)}))
    ref = _reference_scores(texts)
    got = out["avg_logprob"].to_pylist()
    for g, r in zip(got, ref):
        assert g == pytest.approx(round(r, 6), abs=2e-6)
    ppl = out["ppl"].to_pylist()
    for p, r in zip(ppl, ref):
        assert p == pytest.approx(math.exp(-r), abs=2e-4)
    assert out["n_trigrams"].to_pylist() == [len(t) - 2 for t in texts]


def test_scoring_unknown_chars_and_short_docs(ray_session):
    texts = ["aaaa bbbb aaaa", "bbbb aaaa"]
    ds = _ray_ds(texts, ray_session)
    model = train_char_trigram_lm(ds)
    scorer = PerplexityScorer(model)
    out = scorer(pa.table({
        "doc_id": pa.array([0, 1, 2]),
        "text": pa.array(["aaaa", "zz!unknown?zz", "x"])}))
    assert out["n_trigrams"].to_pylist()[0] == 2
    assert out["n_trigrams"].to_pylist()[1] == 0  # all-unknown trigrams
    assert out["n_trigrams"].to_pylist()[2] == 0  # too short
    assert np.isnan(out["avg_logprob"].to_pylist()[2])
