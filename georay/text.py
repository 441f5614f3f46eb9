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
import pyarrow.compute as pc

__all__ = ["TextFeatures", "LangId", "token_count_batch",
           "fingerprint_batch", "Redactor", "distinct_ratio_batch",
           "chunk_documents_batch"]

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


class Redactor:
    """Pattern-redaction stage — the PII-scrub shape of a training-data
    pipeline (emails/phones/ids masked before the corpus ships).  The
    regex is an RE2 pattern evaluated by ``pc.replace_substring_regex``
    (the same regex engine family DuckDB's ``regexp_replace`` uses, so
    the SQL oracle runs the IDENTICAL pattern); compiled/validated once
    per actor in ``__init__``.  Emits ``redacted`` plus ``n_redactions``
    (non-overlapping match count, = ``len(regexp_extract_all(...))``)."""

    # the shapes a real corpus scrub starts from (RE2-safe, no lookaround)
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"

    def __init__(self, col: str = "text", pattern: str | None = None,
                 replacement: str = "<redacted>"):
        self.col = col
        self.pattern = pattern if pattern is not None \
            else f"({self.EMAIL})|({self.PHONE})"
        re.compile(self.pattern)   # fail fast on a bad pattern
        self.replacement = replacement

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        hits = pc.count_substring_regex(col, self.pattern)
        red = pc.replace_substring_regex(
            col, pattern=self.pattern, replacement=self.replacement)
        return (batch.append_column("n_redactions",
                                    pc.cast(hits, pa.int64()))
                     .append_column("redacted", red))


def distinct_ratio_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Type-token ratio (distinct words / total words) — the
    repetition-quality signal of the Gopher filtering rules, fully
    vectorized: one regex split per batch, then distinct-per-row via a
    single (row, word-hash) lexsort (64-bit content hashes; collision
    odds ~n²/2⁶⁵ per document are negligible against real vocabularies).
    Emits ``n_tokens``, ``n_distinct``, ``ttr`` (null when a document
    has no tokens, matching SQL x/0 → NULL)."""
    from .util import hash_strings
    n = batch.num_rows
    if n == 0:
        return (batch.append_column("n_tokens", pa.array([], pa.int64()))
                     .append_column("n_distinct", pa.array([], pa.int64()))
                     .append_column("ttr", pa.array([], pa.float64())))
    lists = pc.split_pattern_regex(pc.utf8_lower(batch[col]),
                                   pattern="[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    words = flat.filter(keep)
    rows = rows[keep.to_numpy(zero_copy_only=False)]
    h = hash_strings(words)
    n_tokens = np.bincount(rows, minlength=n).astype(np.int64)
    order = np.lexsort((h, rows))
    rs, hs = rows[order], h[order]
    first = np.ones(len(rs), dtype=bool)
    first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    n_distinct = np.bincount(rs[first], minlength=n).astype(np.int64)
    ttr = pa.array(n_distinct / np.where(n_tokens > 0, n_tokens, 1)
                   .astype(np.float64), mask=n_tokens == 0)
    return (batch.append_column("n_tokens", pa.array(n_tokens))
                 .append_column("n_distinct", pa.array(n_distinct))
                 .append_column("ttr", ttr))


def repetition_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Word-bigram repetition signals (Gopher rules 'fraction of
    characters in the most common n-gram' / C4 boilerplate cut, word
    flavor): per doc, ``top_bigram_frac`` = occurrences of the most
    frequent word bigram / total bigrams, ``dup_bigram_frac`` = 1 −
    distinct/total.  Tokenizer is a plain single-space split — chosen to
    equal SQL ``string_split(text, ' ')`` exactly so the oracle is the
    verbatim formula.  Docs with < 2 words emit no row (no bigrams).

    Vectorized: one split per batch; bigram keys are a 64-bit mix of
    adjacent word hashes; per-doc stats via one (row, key) lexsort +
    run-length pass — no per-doc Python."""
    from .util import hash_strings
    n = batch.num_rows
    empty = pa.table({
        "doc_id": pa.array([], batch["doc_id"].type),
        "top_bigram_frac": pa.array([], pa.float64()),
        "dup_bigram_frac": pa.array([], pa.float64()),
    })
    if n == 0:
        return empty
    lists = pc.split_pattern(batch[col], pattern=" ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    h = hash_strings(flat).astype(np.uint64)
    # adjacent pairs WITHIN a doc: drop each doc's last word position
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    ends = np.cumsum(lens) - 1          # last word index per doc
    valid = np.ones(h.size, dtype=bool)
    valid[ends[lens > 0]] = False
    if not valid.any():
        return empty
    i0 = np.flatnonzero(valid)
    key = h[i0] * np.uint64(0x9E3779B97F4A7C15) + h[i0 + 1]
    rows = rows[i0]
    order = np.lexsort((key, rows))
    rs, ks = rows[order], key[order]
    first = np.ones(rs.size, dtype=bool)
    first[1:] = (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])
    starts = np.flatnonzero(first)
    run = np.diff(np.concatenate([starts, [rs.size]]))
    tot = np.bincount(rs, minlength=n).astype(np.int64)
    dist = np.bincount(rs[first], minlength=n).astype(np.int64)
    mx = np.zeros(n, dtype=np.int64)
    np.maximum.at(mx, rs[starts], run)
    keep = tot > 0
    tot_f = tot[keep].astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"].filter(pa.array(keep)),
        "top_bigram_frac": pa.array(
            np.round(mx[keep] / tot_f, 6)),
        "dup_bigram_frac": pa.array(
            np.round(1.0 - dist[keep] / tot_f, 6)),
    })


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


def chunk_documents_batch(batch: pa.Table, *, window: int = 500,
                          stride: int = 400, col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Overlapping character-window chunking — the context-length
    splitter of a training-data pipeline (window=500, stride=400 ⇒ 100
    chars of overlap).  Chunk k of a document covers characters
    ``[k·stride, k·stride+window)``; a document of length L yields
    ``floor((L−1)/stride)+1`` chunks (L=0 ⇒ one empty chunk).

    Vectorized by CHUNK INDEX, not by row: iteration k slices ALL
    documents with ≥k chunks in one ``utf8_slice_codeunits`` call
    (character semantics — matches SQL ``substr``), so the Python loop
    runs ~L/stride times per batch regardless of row count."""
    import pyarrow.compute as pc
    texts = batch[col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = batch.num_rows
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    n_chunks = np.maximum(lens - 1, 0) // stride + 1
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_ids, out_idx, out_chunks = [], [], []
    k = 0
    while True:
        m = n_chunks > k
        if not m.any():
            break
        sel = pa.array(np.flatnonzero(m))
        part = pc.utf8_slice_codeunits(texts.take(sel), k * stride,
                                       k * stride + window)
        out_ids.append(ids[m])
        out_idx.append(np.full(int(m.sum()), k, dtype=np.int64))
        out_chunks.append(part)
        k += 1
    return pa.table({
        id_col: pa.array(np.concatenate(out_ids)),
        "chunk_idx": pa.array(np.concatenate(out_idx)),
        "chunk": pa.concat_arrays([c.combine_chunks()
                                   if isinstance(c, pa.ChunkedArray) else c
                                   for c in out_chunks]),
    })


def pack_sequences(ds, *, seq_len: int = 2048, id_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 4096,
                   num_partitions: int | None = None):
    """Concat-and-split sequence packing — the LLM-pretraining layout
    step (all documents concatenated in ``id_col`` order, the token
    stream split into fixed ``seq_len`` windows; cf. Krell et al. 2021,
    "Efficient Sequence Packing").  Emits one row per (document,
    sequence) overlap: ``(doc_id, seq_id, seq_off, n_tok)`` where
    ``seq_off`` is the document's first-token offset inside sequence
    ``seq_id`` and ``n_tok`` the tokens it contributes.  Tokens =
    the ``[A-Za-z0-9]+`` tokenizer (same as :func:`token_count_batch`,
    so the DuckDB oracle is ``regexp_extract_all``).

    Scale shape — a distributed exclusive prefix sum, NO global sort:

    1. one bounded aggregate for the id range (column-pruned read);
    2. per-batch token counts bucketed by ``(id - lo) // width`` into
       ≤ ``n_buckets`` ORDERED ranges; one tiny groupby-sum whose
       ≤ n_buckets rows are the ONLY driver-collected artifact, turned
       into per-bucket exclusive offsets and broadcast via ``ray.put``;
    3. buckets hash-partitioned to ~4×CPU groups (complete buckets per
       partition), each partition resolving ALL its buckets in one
       vectorized pass: lexsort by (bucket, id), per-bucket running
       cumsum + broadcast bucket offset → global token interval, then
       the (doc, seq) overlap fan-out via ``np.repeat`` arithmetic —
       no per-key Python anywhere.

    Docs contributing zero tokens emit no rows (matches the SQL
    ``WHERE cnt > 0``)."""
    import ray
    from ray.data.aggregate import Max, Min

    token_re = re.compile(_TOKEN_RE)
    L = int(seq_len)
    bounds = ds.select_columns([id_col]).aggregate(Min(id_col), Max(id_col))
    lo = int(bounds[f"min({id_col})"])
    hi = int(bounds[f"max({id_col})"])
    width = max(1, (hi - lo) // n_buckets + 1)

    if num_partitions is None:
        num_partitions = 4 * max(
            2, int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    P = int(num_partitions)

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cnt = np.array([len(token_re.findall(t))
                        for t in batch[text_col].to_pylist()],
                       dtype=np.int64)
        bucket = (ids - lo) // width
        return pa.table({id_col: pa.array(ids), "cnt__": pa.array(cnt),
                         "bucket__": pa.array(bucket)})

    slim = ds.map_batches(counts, batch_format="pyarrow")

    # pass 1: per-bucket totals (block partials → one tiny groupby-sum)
    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = batch["bucket__"].to_numpy()
        c = batch["cnt__"].to_numpy()
        ub, inv = np.unique(b, return_inverse=True)
        tot = np.zeros(len(ub), dtype=np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"bucket__": pa.array(ub), "tok__": pa.array(tot)})

    per_bucket = (slim.map_batches(bucket_partial, batch_format="pyarrow")
                  .groupby("bucket__").sum("tok__").take_all())
    bk = np.array([r["bucket__"] for r in per_bucket], dtype=np.int64)
    tk = np.array([r["sum(tok__)"] for r in per_bucket], dtype=np.int64)
    order = np.argsort(bk)
    bk, tk = bk[order], tk[order]
    excl = np.concatenate([[0], np.cumsum(tk)[:-1]])
    offsets_ref = ray.put((bk, excl))

    # pass 2: per-partition vectorized pack
    def add_part(batch: pa.Table) -> pa.Table:
        b = batch["bucket__"].to_numpy().astype(np.uint64)
        h = (b ^ (b >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h &= np.uint64(0xFFFFFFFFFFFFFFFF)
        h ^= h >> np.uint64(31)
        return batch.append_column(
            "part__", pa.array((h % np.uint64(P)).astype(np.int64)))

    def pack_part(g: pa.Table) -> pa.Table:
        bks, excls = ray.get(offsets_ref)
        b = g["bucket__"].to_numpy()
        ids = g[id_col].to_numpy(zero_copy_only=False)
        cnt = g["cnt__"].to_numpy()
        order = np.lexsort((ids, b))
        b, ids, cnt = b[order], ids[order], cnt[order]
        cum = np.cumsum(cnt)
        row_excl = cum - cnt
        # per-bucket exclusive: subtract the running total at bucket start
        first = np.ones(len(b), dtype=bool)
        first[1:] = b[1:] != b[:-1]
        fidx = np.flatnonzero(first)
        runlen = np.diff(np.append(fidx, len(b)))
        base = excls[np.searchsorted(bks, b[fidx])]
        start = row_excl - np.repeat(row_excl[fidx], runlen) \
            + np.repeat(base, runlen)
        end = start + cnt
        valid = cnt > 0
        fseq = start // L
        lseq = np.where(valid, (end - 1) // L, fseq - 1)
        reps = np.where(valid, lseq - fseq + 1, 0)
        tot = int(reps.sum())
        rep_excl = np.concatenate([[0], np.cumsum(reps)[:-1]])
        seq = np.repeat(fseq, reps) \
            + (np.arange(tot, dtype=np.int64) - np.repeat(rep_excl, reps))
        s0 = np.maximum(np.repeat(start, reps), seq * L)
        s1 = np.minimum(np.repeat(end, reps), (seq + 1) * L)
        return pa.table({
            id_col: pa.array(np.repeat(ids, reps)),
            "seq_id": pa.array(seq),
            "seq_off": pa.array(s0 - seq * L),
            "n_tok": pa.array(s1 - s0),
        })

    return (slim.map_batches(add_part, batch_format="pyarrow")
            .groupby("part__").map_groups(pack_part,
                                          batch_format="pyarrow"))
