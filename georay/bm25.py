"""BM25 / TF-IDF relevance scoring over a document table.

The training-data-pipeline "search scoring" op (quality filtering by
query relevance, corpus probing).  Reference analog: OGR exposes full
SQL through sqlite3 (ogr/ogrsf_frmts/sqlite/ogrsqliteexecutesql.cpp) —
BM25 itself is the public Robertson–Spärck Jones formulation as used by
sqlite's FTS5 (``bm25()``), re-derived here from the published formula:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Scale shape (two streaming passes, no full-vocabulary state):

1. STATS pass — only the QUERY'S terms need document frequencies, so
   each block emits ONE partial row (per-term df counts + doc count +
   token-length sum) and a global ``aggregate`` sums them: no shuffle
   wider than ``len(query_terms) + 2`` columns, no vocabulary
   materialization.  (A full-vocabulary DF table would be the
   hash-shuffle ``groupby(term)`` — deliberately not needed here.)
2. SCORE pass — stats broadcast as plain scalars; each batch tokenizes
   once (arrow ``split_pattern``, zero-copy flatten) and accumulates
   per-term scores via ``np.bincount`` over doc indices; per-block
   top-k pre-truncation keeps the final sort tiny.

Tokenization is ``split on ' '`` to match SQL ``string_split(text, ' ')``
exactly (the oracle's tokenizer), including empty tokens from repeated
spaces counting toward document length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk", "corpus_stats"]


def _tokenize(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """→ (flat terms, doc index per flat term, doc lengths)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    dl = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    return flat, doc_idx, dl


def corpus_stats(ds, query_terms, col: str = "text") -> dict:
    """One streaming pass → {n_docs, avgdl, df: {term: df}}."""
    terms = list(query_terms)

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, dl = _tokenize(batch[col])
        n = len(dl)
        row = {"n__": pa.array([n], pa.int64()),
               "dl__": pa.array([int(dl.sum())], pa.int64())}
        fv = flat.to_numpy(zero_copy_only=False)
        for i, t in enumerate(terms):
            docs = doc_idx[fv == t]
            row[f"df{i}__"] = pa.array(
                [int(len(np.unique(docs)))], pa.int64())
        return pa.table(row)

    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n__", alias_name="n__"), Sum("dl__", alias_name="dl__"),
        *[Sum(f"df{i}__", alias_name=f"df{i}__")
          for i in range(len(terms))])
    n = int(agg["n__"] or 0)
    return {"n_docs": n,
            "avgdl": (agg["dl__"] or 0) / n if n else 0.0,
            "df": {t: int(agg[f"df{i}__"] or 0)
                   for i, t in enumerate(terms)}}


def bm25_topk(ds, query_terms, k: int = 10, col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2,
              b: float = 0.75) -> pa.Table:
    """Top-k documents by BM25 score for a bag-of-terms query.

    Ties break on ascending ``id_col``; scores are rounded to 6
    decimals AFTER the exact float formula (oracle-parity rule:
    identical op order, round(6) on both engines).
    """
    terms = list(query_terms)
    stats = corpus_stats(ds, terms, col=col)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    if n_docs == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for t, df in stats["df"].items()}

    def score(batch: pa.Table) -> pa.Table:
        flat, doc_idx, dl = _tokenize(batch[col])
        n = len(dl)
        fv = flat.to_numpy(zero_copy_only=False)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(n, np.float64)
        for t in terms:
            tf = np.bincount(doc_idx[fv == t],
                             minlength=n).astype(np.float64)
            s += idf[t] * tf * (k1 + 1.0) / (tf + denom_dl)
        keep = s > 0.0
        out = pa.table({id_col: batch[id_col].filter(pa.array(keep)),
                        "score": pa.array(np.round(s[keep], 6))})
        if out.num_rows > k:      # per-block pre-truncation
            order = pc.sort_indices(
                out, sort_keys=[("score", "descending"),
                                (id_col, "ascending")])
            out = out.take(order[:k])
        return out

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["score", id_col], descending=[True, False])
              .limit(k))
