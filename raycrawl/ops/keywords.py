"""Per-document keyword extraction and corpus collocation mining.

Two classic corpus-understanding operators a webtext engine needs next
to its index (the reference surfaces per-query term stats through the
dashboard's top-queries view, api/services/stats_db.py:187-223; the
corpus-side mirror is "which terms characterize each document / which
phrases characterize the corpus"):

- ``tfidf_keywords``: top-``k`` tokens per document by an integer-exact
  tf-idf variant — score_q = tf · 10⁶ · N // df (linear inverse document
  frequency; the floor-divided rational keeps the DuckDB oracle
  bit-identical, and the RANKING it induces for fixed tf is the same as
  log-idf's since both are monotone decreasing in df).
- ``pmi_collocations``: top-``n`` adjacent word pairs by pointwise
  mutual information, again as a floored rational —
  pmi_q = c_xy · T · 10⁶ // (c_x · c_y) (monotone in the real PMI for
  fixed sign; > 10⁶ means the pair co-occurs more than independence
  predicts).

Scale shape (both): per-batch ``Counter`` partials pre-aggregate before
the fixed-width (token, n) groupby — the exchange moves one row per
distinct term per batch, never one per occurrence. The document-scoring
pass broadcasts the df / unigram table ONCE via ``ray.put`` behind the
repo's ``max_vocab`` raise-guard (the CCNet pattern of
textstats.unigram_rarity — at 100 TB prune with a min-count cut or
switch to the hash-partitioned PartitionedLookup join in ops/dedup.py
instead of silently shipping gigabytes). Top-k per document is LOCAL
(a document lives in exactly one row); the collocation top-n reduces
per-batch top-n partials, so only O(batches · n) rows reach the driver.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def tfidf_keywords(ds, *, k: int = 3, id_col: str = "doc_id",
                   text_col: str = "text", max_vocab: int = 5_000_000):
    """Top-``k`` (doc_id, token, tf, df, score_q, rnk) keyword rows per
    document; score_q = tf · 10⁶ · N // df, ties broken (score desc,
    token asc), ``rnk`` 1-based. Tokens = split on a single space (the
    engine's oracle-matched tokenizer)."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        n = 0
        for t in batch[text_col].to_pylist():
            c.update(set((t or "").split(" ")))
            n += 1
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, pa.string()),
                         "df": pa.array([c[x] for x in toks], pa.int64()),
                         "nd": pa.array([n] + [0] * (len(toks) - 1)
                                        if toks else [], pa.int64())})

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("df", alias_name="df"),
                                         Sum("nd", alias_name="nd")))
    rows = df_ds.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"tfidf_keywords: vocabulary exceeds {max_vocab} tokens; apply "
            "a min-df prune or switch to a PartitionedLookup join")
    n_docs = sum(r["nd"] for r in rows)
    df_ref = ray.put({r["token"]: r["df"] for r in rows})

    def score(batch: pa.Table) -> pa.Table:
        df_map = ray.get(df_ref)
        ids, toks, tfs, dfs, scores, rnks = [], [], [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            c = Counter((t or "").split(" "))
            scored = sorted(
                ((-(tf * 1_000_000 * n_docs // df_map[tok]), tok, tf)
                 for tok, tf in c.items()),
            )[:k]
            for i, (neg_s, tok, tf) in enumerate(scored):
                ids.append(did)
                toks.append(tok)
                tfs.append(tf)
                dfs.append(df_map[tok])
                scores.append(-neg_s)
                rnks.append(i + 1)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "df": pa.array(dfs, pa.int64()),
                         "score_q": pa.array(scores, pa.int64()),
                         "rnk": pa.array(rnks, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def pmi_collocations(ds, *, min_count: int = 5, top_n: int = 50,
                     text_col: str = "text", max_vocab: int = 5_000_000):
    """Top-``top_n`` adjacent word pairs (x, y, c_xy, c_x, c_y, pmi_q)
    by floored-rational PMI, restricted to pairs with c_xy ≥
    ``min_count``; order (pmi_q desc, x asc, y asc), ``rnk`` 1-based."""
    import ray
    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch[text_col].to_pylist():
            c.update((t or "").split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array([c[x] for x in toks], pa.int64())})

    uni_ds = (ds.map_batches(uni_partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))
    rows = uni_ds.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"pmi_collocations: vocabulary exceeds {max_vocab} tokens; "
            "apply a min-count prune or switch to a PartitionedLookup join")
    total_tokens = sum(r["n"] for r in rows)
    uni_ref = ray.put({r["token"]: r["n"] for r in rows})

    def bi_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch[text_col].to_pylist():
            toks = (t or "").split(" ")
            c.update(zip(toks, toks[1:]))
        pairs = list(c.keys())
        return pa.table({"x": pa.array([p[0] for p in pairs], pa.string()),
                         "y": pa.array([p[1] for p in pairs], pa.string()),
                         "c_xy": pa.array([c[p] for p in pairs], pa.int64())})

    bi_ds = (ds.map_batches(bi_partial, batch_format="pyarrow")
             .groupby(["x", "y"]).aggregate(Sum("c_xy", alias_name="c_xy"))
             .filter(lambda r: r["c_xy"] >= min_count))

    def topn_partial(batch: pa.Table) -> pa.Table:
        uni = ray.get(uni_ref)
        out = []
        for x, y, cxy in zip(batch["x"].to_pylist(), batch["y"].to_pylist(),
                             batch["c_xy"].to_pylist()):
            cx, cy = uni[x], uni[y]
            # python ints: c_xy·T·10⁶ can exceed int64 on a hot pair,
            # the floored quotient never does (≤ 10⁶·T)
            pmi = cxy * total_tokens * 1_000_000 // (cx * cy)
            out.append((-pmi, x, y, cxy, cx, cy))
        out.sort()
        out = out[:top_n]
        return pa.table({"x": pa.array([o[1] for o in out], pa.string()),
                         "y": pa.array([o[2] for o in out], pa.string()),
                         "c_xy": pa.array([o[3] for o in out], pa.int64()),
                         "c_x": pa.array([o[4] for o in out], pa.int64()),
                         "c_y": pa.array([o[5] for o in out], pa.int64()),
                         "pmi_q": pa.array([-o[0] for o in out], pa.int64())})

    # O(batches · top_n) rows reach the driver for the final cut
    parts = bi_ds.map_batches(topn_partial, batch_format="pyarrow").take_all()
    final = sorted(parts, key=lambda r: (-r["pmi_q"], r["x"], r["y"]))[:top_n]
    return pa.table({
        "x": pa.array([r["x"] for r in final], pa.string()),
        "y": pa.array([r["y"] for r in final], pa.string()),
        "c_xy": pa.array([r["c_xy"] for r in final], pa.int64()),
        "c_x": pa.array([r["c_x"] for r in final], pa.int64()),
        "c_y": pa.array([r["c_y"] for r in final], pa.int64()),
        "pmi_q": pa.array([r["pmi_q"] for r in final], pa.int64()),
        "rnk": pa.array(range(1, len(final) + 1), pa.int64()),
    })
