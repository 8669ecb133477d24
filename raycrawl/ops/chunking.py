"""Fixed-token document chunking — the RAG / context-window splitter.

Retrieval and pretraining pipelines both need documents cut into bounded
token windows (RAG passage stores, FiD contexts, long-doc eval). This is a
pure flat-map: each doc independently yields ``ceil(n_tokens / stride)``
overlapping windows of ``chunk_tokens`` whitespace tokens starting every
``stride`` tokens — no shuffle, no state, embarrassingly parallel, which
is exactly what you want at 100 TB (the output is larger than the input;
any exchange would move it twice).

Tokens are single-space splits (the repo-wide ``token_count`` rule,
ops/textstats.py), so the SQL oracle reproduces every chunk string
byte-exactly via ``string_split`` + list slicing + ``array_to_string``.
Empty text splits to one empty token — one (empty) chunk, same in both
systems.
"""

from __future__ import annotations

import pyarrow as pa


def chunk_documents(ds, *, chunk_tokens: int = 64, stride: int | None = None,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Flat-map ``ds`` (id_col, text_col) → one row per window:
    ``(doc_id, chunk_idx, start_tok, n_tokens, chunk_text)``.

    ``stride`` defaults to ``chunk_tokens`` (disjoint windows); a smaller
    stride overlaps adjacent chunks by ``chunk_tokens - stride`` tokens.
    Window starts are ``range(0, n_doc_tokens, stride)`` — the final
    window may be short (``n_tokens < chunk_tokens``), never empty."""
    if stride is None:
        stride = chunk_tokens
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, starts, lens, texts = [], [], [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = (t or "").split(" ")
            for ci, s in enumerate(range(0, len(toks), stride)):
                w = toks[s: s + chunk_tokens]
                ids.append(i)
                idxs.append(ci)
                starts.append(s)
                lens.append(len(w))
                texts.append(" ".join(w))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "start_tok": pa.array(starts, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
