"""Inverted-index operators: postings build + exact keyword retrieval.

The reference's terminal stage pushes documents into Meilisearch — an
inverted index (crawler.py:682-758 flushes batches into the index;
api/services/meilisearch_client.py:89-163 queries it). The engine's
counterpart is a Dataset-native postings build: the index IS a table,
(token, doc_id, tf), exportable like any corpus artifact (pair with
``ops/export.export_shards`` keyed on token hash for a sharded index).

Scale design:

- per-batch ``Counter`` partials emit (token, doc_id, tf) with tf already
  final per doc (a doc lives in exactly one batch row), so the exchange
  moves one row per distinct (token, doc) — never one per occurrence;
- retrieval never builds the full index: the term filter applies inside
  the first ``map_batches``, so only query-term rows exist downstream;
- document frequencies for scoring are a ≤|terms|-entry dict broadcast
  via ``ray.put`` — no second shuffle;
- scores are integer ppm (``(1e6·tf) // df`` per term, summed) so the
  DuckDB oracle matches bit-exactly; ranking ties break (score desc,
  doc_id asc) deterministically.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def term_doc_tf(ds, terms: list[str] | None = None,
                id_col: str = "doc_id", text_col: str = "text"):
    """(token, doc_id, tf) rows — the postings table. ``terms`` restricts
    to a fixed vocabulary (retrieval path); ``None`` builds the full
    index. Tokens = split on a single space (the oracle-matched
    tokenizer)."""
    term_set = None if terms is None else frozenset(terms)

    def partial(batch: pa.Table) -> pa.Table:
        toks_out, ids_out, tf_out = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            c = Counter((t or "").split(" "))
            for tok, tf in c.items():
                if term_set is None or tok in term_set:
                    toks_out.append(tok)
                    ids_out.append(did)
                    tf_out.append(tf)
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids_out, pa.int64()),
                         "tf": pa.array(tf_out, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow")


def keyword_topk(ds, terms: list[str], k: int = 10,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Exact keyword retrieval: score(doc) = Σ_term (1e6·tf) // df —
    tf-over-df weighting with integer arithmetic (rarer terms weigh
    more; exactly SQL-expressible, unlike float ln-idf). Top-``k`` by
    (score desc, doc_id asc).

    One corpus pass emits only query-term postings; df comes from a
    small count over that materialized slice (≤|terms| values, broadcast
    via ``ray.put``); doc scores are a doc-keyed Sum shuffle of
    fixed-width rows; per-batch top-k partials merge on the driver —
    rows to the driver are O(batches·k), never O(matches)."""
    import ray
    from ray.data.aggregate import Count, Sum

    postings = term_doc_tf(ds, terms, id_col, text_col).materialize()
    df_rows = postings.groupby("token").aggregate(
        Count(alias_name="df")).take_all()
    df_ref = ray.put({r["token"]: r["df"] for r in df_rows})

    def weight(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        toks = batch["token"].to_pylist()
        tfs = np.asarray(batch["tf"], np.int64)
        w = np.array([(1_000_000 * tf) // df[t]
                      for t, tf in zip(toks, tfs)], dtype=np.int64)
        return pa.table({id_col: batch[id_col],
                         "w": pa.array(w, pa.int64())})

    sums = (postings.map_batches(weight, batch_format="pyarrow")
            .groupby(id_col).aggregate(Sum("w", alias_name="score_ppm")))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        s = np.asarray(batch["score_ppm"], np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -s))[:k]
            ids, s = ids[top], s[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "score_ppm": pa.array(s, pa.int64())})

    rows = sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["score_ppm"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "score_ppm": pa.array([r["score_ppm"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())}
    )


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
