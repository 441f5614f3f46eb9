"""Text analysis stages for the ``documents`` table (training-data
pipeline extensions): language-ID heuristic, quality scoring, token
counting, rolling-hash fingerprinting.

All are actor-pool ``map_batches`` stages: the stopword tables / compiled
regexes are built ONCE per actor in ``__init__`` (the GDAL analog:
per-worker transformer state, SURVEY.md §2.3).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["TextFeatures", "LangId", "token_count_batch",
           "fingerprint_batch"]

_TOKEN_RE = r"[A-Za-z0-9]+"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es"},
}


class TextFeatures:
    """Quality-scoring stage: length, punctuation ratio, stopword ratio,
    mean word length, alpha ratio, token count — vectorized via one pass of
    a compiled regex per batch."""

    def __init__(self, col: str = "text"):
        self.col = col
        self.token_re = re.compile(_TOKEN_RE)
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        n_tokens = np.empty(n, np.int64)
        punct_ratio = np.empty(n, np.float64)
        stop_ratio = np.empty(n, np.float64)
        mean_word_len = np.empty(n, np.float64)
        for i, t in enumerate(texts):
            toks = self.token_re.findall(t)
            n_chars[i] = len(t)
            n_tokens[i] = len(toks)
            punct_ratio[i] = (len(self.punct_re.findall(t)) / len(t)
                              if t else 0.0)
            low = [w.lower() for w in toks]
            stop_ratio[i] = (sum(w in self.stop for w in low) / len(toks)
                             if toks else 0.0)
            mean_word_len[i] = (sum(map(len, toks)) / len(toks)
                                if toks else 0.0)
        # composite quality score in [0,1]: length gate, low punctuation,
        # natural stopword density, word lengths near the English mean
        quality = np.clip(
            0.25 * (n_tokens > 5)
            + 0.25 * np.clip(1.0 - punct_ratio / 0.25, 0, 1)
            + 0.30 * np.clip(stop_ratio / 0.3, 0, 1)
            + 0.20 * np.clip(1.0 - np.abs(mean_word_len - 4.5) / 4.5, 0, 1),
            0, 1)
        for name, arr in [("n_chars_f", n_chars), ("n_tokens", n_tokens),
                          ("punct_ratio", punct_ratio),
                          ("stop_ratio", stop_ratio),
                          ("mean_word_len", mean_word_len),
                          ("quality", quality)]:
            batch = batch.append_column(name, pa.array(arr))
        return batch


class LangId:
    """Stopword-profile language ID (n-gram heuristic): argmax over
    per-language stopword hit counts; 'und' (undetermined) when no
    profile hits."""

    def __init__(self, col: str = "text"):
        self.col = col
        self.token_re = re.compile(_TOKEN_RE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        langs = []
        for t in texts:
            toks = [w.lower() for w in self.token_re.findall(t)]
            best, best_n = "und", 0
            for lang, prof in self.profiles.items():
                hits = sum(w in prof for w in toks)
                if hits > best_n:
                    best, best_n = lang, hits
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Token count with the ``[A-Za-z0-9]+`` tokenizer (BPE-ish regex
    tokenization stand-in; matches DuckDB's
    ``regexp_extract_all(text,'[A-Za-z0-9]+')`` for the SQL oracle)."""
    token_re = re.compile(_TOKEN_RE)
    counts = np.array([len(token_re.findall(t))
                       for t in batch[col].to_pylist()], dtype=np.int64)
    return batch.append_column("token_count", pa.array(counts))


def fingerprint_batch(batch: pa.Table, col: str = "text",
                      window: int = 16) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-byte windows (robust to small edits at the ends)."""
    from .dedup import _shingle_hashes
    out = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[col].to_pylist()):
        sh = _shingle_hashes(t, window)
        out[i] = np.int64(sh.min().astype(np.int64)) if sh.size else 0
    return batch.append_column("fingerprint", pa.array(out))
