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


def bm25_topk(ds, terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text"):
    """BM25 retrieval, integer-exact rational variant (k1=1.2, b=0.75,
    idf = (N+1)/(df+1) — the log is dropped so every score is ONE integer
    floor-division, bit-identical between Python bignums and the DuckDB
    HUGEINT oracle; the ranking behavior — tf saturation, length
    normalization, rarity weighting — is standard BM25). Per posting row:

        score_ppm = (1e6·(N+1)·22·tf·T) // ((df+1)·(10·tf·T + 3·T + 9·dl·N))

    which is ``1e6 · idf · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`` with
    avgdl = T/N and all denominators cleared (T = corpus token count).
    Intermediate products exceed int64 at corpus scale, so the kernel
    scores in Python ints (exact bignum) and emits int64 results.

    Same scale shape as ``keyword_topk``: query-term filter in the first
    pass, df/N/T broadcast as O(|terms|) scalars, doc-keyed Sum shuffle,
    per-batch top-k partials; rows to the driver are O(batches·k)."""
    import ray
    from ray.data.aggregate import Count, Sum

    # corpus stats: one partial-agg pass, two scalars to the driver
    def len_partial(batch: pa.Table) -> pa.Table:
        dls = [len((t or "").split(" "))
               for t in batch[text_col].to_pylist()]
        return pa.table({"n": pa.array([len(dls)], pa.int64()),
                         "t": pa.array([sum(dls)], pa.int64())})

    tot = (ds.map_batches(len_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("t", alias_name="t")))
    n_docs, t_toks = int(tot["n"]), int(tot["t"])

    term_set = frozenset(terms)

    def posting_partial(batch: pa.Table) -> pa.Table:
        toks_out, ids_out, tf_out, dl_out = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            words = (t or "").split(" ")
            c = Counter(words)
            for tok in term_set:
                if c[tok]:
                    toks_out.append(tok)
                    ids_out.append(did)
                    tf_out.append(c[tok])
                    dl_out.append(len(words))
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids_out, pa.int64()),
                         "tf": pa.array(tf_out, pa.int64()),
                         "dl": pa.array(dl_out, pa.int64())})

    postings = ds.map_batches(posting_partial,
                              batch_format="pyarrow").materialize()
    df_rows = postings.groupby("token").aggregate(
        Count(alias_name="df")).take_all()
    df_ref = ray.put({r["token"]: int(r["df"]) for r in df_rows})

    def weight(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        w = []
        for tok, tf, dl in zip(batch["token"].to_pylist(),
                               batch["tf"].to_pylist(),
                               batch["dl"].to_pylist()):
            # Python ints: (N+1)·22·tf·T overflows int64 at corpus scale
            num = 1_000_000 * (n_docs + 1) * 22 * tf * t_toks
            den = (df[tok] + 1) * (10 * tf * t_toks + 3 * t_toks
                                   + 9 * dl * n_docs)
            w.append(num // den)
        return pa.table({id_col: batch[id_col],
                         "w": pa.array(w, pa.int64())})

    sums = (postings.map_batches(weight, batch_format="pyarrow")
            .groupby(id_col).aggregate(Sum("w", alias_name="bm25_ppm")))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        s = np.asarray(batch["bm25_ppm"], np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -s))[:k]
            ids, s = ids[top], s[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bm25_ppm": pa.array(s, pa.int64())})

    rows = sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["bm25_ppm"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "bm25_ppm": pa.array([r["bm25_ppm"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())}
    )


def postings_merge(base, delta, deleted_ids=None, *,
                   id_col: str = "doc_id", n_parts: int | None = None):
    """Incremental index maintenance: fold a recrawl epoch's postings delta
    into an existing index.

    Semantics are the reference sink's replace-by-document-id
    (Meilisearch ``add_documents``, crawler.py:682-758): every document
    present in ``delta`` REPLACES its old postings wholesale (a recrawled
    doc's removed tokens must disappear, not linger), and ``deleted_ids``
    docs drop entirely. merged = base ∖ {docs in delta ∪ deleted} ∪ delta.

    Scale shape: the drop set is the delta's (small — a recrawl epoch
    touches a few %) doc-id column plus the deleted ids, removed from the
    base via a hash-partitioned ``Dataset.join(left_anti)`` on doc_id — no
    driver materialization, no broadcast; the base index (the 100-TB side)
    crosses exactly one partitioned exchange. Zero-row blocks are stripped
    from both join sides (Acero rejects them — see grouping.drop_empty_blocks),
    and when the drop side is empty the join is skipped outright.

    ``deleted_ids`` is a Python list/iterable of ids or a Dataset carrying
    ``id_col``. Returns the merged (token, doc_id, tf) Dataset."""
    import ray.data as rd

    from .grouping import nonempty_refs, resolve_parts

    drop = delta.select_columns([id_col])
    if deleted_ids is not None:
        if hasattr(deleted_ids, "select_columns"):   # Dataset
            drop = drop.union(deleted_ids.select_columns([id_col]))
        elif len(deleted_ids):
            drop = drop.union(rd.from_arrow(pa.table(
                {id_col: pa.array(sorted(deleted_ids), pa.int64())})))
    drop_live, _ = nonempty_refs(drop)
    base_live, _ = nonempty_refs(base)
    if not base_live:
        merged = None
    elif drop_live:
        merged = rd.from_arrow_refs(base_live).join(
            rd.from_arrow_refs(drop_live), join_type="left_anti",
            num_partitions=resolve_parts(n_parts), on=(id_col,))
    else:
        merged = rd.from_arrow_refs(base_live)
    delta_live, _ = nonempty_refs(delta)
    if merged is None and not delta_live:
        return base  # both empty: an empty postings Dataset with schema
    cols = ["token", id_col, "tf"]
    if merged is None:
        return rd.from_arrow_refs(delta_live)
    # normalize column order before union: the anti join may not preserve
    # the left side's column order
    merged = merged.select_columns(cols)
    if not delta_live:
        return merged
    return merged.union(rd.from_arrow_refs(delta_live).select_columns(cols))


def retrieval_eval(ds, terms: list[str], k: int = 10,
                   gold_residue: int = 3, gold_mod: int = 7,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_parts: int | None = None):
    """Retrieval-quality evaluation at corpus scale: per query term,
    recall@k and MRR@k of the tf ranking against a gold relevance set —
    the eval harness every retrieval stack needs before it ships (the
    reference tunes its merger weights by hand, merger.py:32-43; this is
    the measured alternative). Gold here is the deterministic plant
    "contains the term AND doc_id % gold_mod == gold_residue" — relevance
    decorrelated from the ranking signal, so the metrics are non-trivial
    AND the whole evaluation is exactly restatable in SQL.

    Scale shape: the postings scan keeps only the query terms (one
    fixed-width (token, doc, tf) row per match), ONE term-keyed task hash
    exchange ranks each term's matches and scores the metrics vectorized.
    Returns one row per term with matches: ``(term, n_gold, hits,
    recall_ppm, mrr_ppm)`` — hits = gold docs in the top-k, recall_ppm =
    hits·10⁶ // max(n_gold, 1), mrr_ppm = 10⁶ // rank of the first gold
    hit (0 when none)."""
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)
    rows = term_doc_tf(ds, terms, id_col, text_col)

    def per_term(pdf):
        import pandas as pd

        out_t, out_g, out_h, out_r, out_m = [], [], [], [], []
        if len(pdf):
            for term, g in pdf.groupby("token", sort=True):
                g = g.sort_values(["tf", id_col],
                                  ascending=[False, True])
                ids = g[id_col].to_numpy(np.int64)
                gold_mask = ids % gold_mod == gold_residue
                n_gold = int(gold_mask.sum())
                top_gold = gold_mask[:k]
                hits = int(top_gold.sum())
                first = (int(np.argmax(top_gold)) + 1
                         if top_gold.any() else 0)
                out_t.append(term)
                out_g.append(n_gold)
                out_h.append(hits)
                out_r.append(hits * 1_000_000 // max(n_gold, 1))
                out_m.append(1_000_000 // first if first else 0)
        return pd.DataFrame({
            "term": pd.Series(out_t, dtype="object"),
            "n_gold": pd.Series(out_g, dtype="int64"),
            "hits": pd.Series(out_h, dtype="int64"),
            "recall_ppm": pd.Series(out_r, dtype="int64"),
            "mrr_ppm": pd.Series(out_m, dtype="int64")})

    return partitioned_apply(rows, ["token"], per_term, width)


def df_histogram(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Postings-list length distribution: document frequencies bucketed by
    power of two — ``bucket = floor(log2(df))`` — with token and posting
    counts per bucket. This is the index-planning profile (how much of
    the index is head terms vs the long tail) that sizes shard counts and
    caching for the sink the reference pushes into blindly
    (crawler.py:682-758). Scale shape: the postings build's per-batch
    partials → token groupby for df → per-batch bucket partials → a
    ≤64-row groupby. Returns (bucket, n_tokens, n_postings), bucket
    ascending-sortable int64."""
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        toks, ns = [], []
        for t in batch[text_col].to_pylist():
            for tok in set((t or "").split(" ")):
                toks.append(tok)
                ns.append(1)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "df": pa.array(ns, pa.int64())})

    df = (ds.map_batches(df_partial, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))

    def bucketize(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["df"], np.int64)
        # floor(log2(df)) == bit_length - 1, integer-exact (df >= 1)
        bucket = np.array([int(x).bit_length() - 1 for x in d.tolist()],
                          np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         "n_tokens": pa.array(np.ones(len(d), np.int64)),
                         "n_postings": pa.array(d)})

    return (df.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_postings", alias_name="n_postings")))


def positional_postings(ds, terms: list[str] | None = None,
                        id_col: str = "doc_id", text_col: str = "text"):
    """(token, doc_id, pos) rows — POSITIONAL postings, one row per
    occurrence with its 0-based token position (contrast ``term_doc_tf``'s
    one-row-per-(token, doc) frequency table). Positions are what phrase
    and proximity queries need; Meilisearch stores them internally (the
    reference's sink builds them implicitly on add_documents). ``terms``
    restricts to a vocabulary — the phrase-retrieval path, where only the
    query's own terms ever leave the scan."""
    term_set = None if terms is None else frozenset(terms)

    def partial(batch: pa.Table) -> pa.Table:
        toks_out, ids_out, pos_out = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            for i, tok in enumerate((t or "").split(" ")):
                if term_set is None or tok in term_set:
                    toks_out.append(tok)
                    ids_out.append(did)
                    pos_out.append(i)
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids_out, pa.int64()),
                         "pos": pa.array(pos_out, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow")


def phrase_search(ds, phrase: list[str], id_col: str = "doc_id",
                  text_col: str = "text", n_parts: int | None = None):
    """Exact phrase retrieval over positional postings: doc matches at
    position p iff token_i sits at p+i for every term of the phrase —
    the positional-intersection algorithm every inverted-index engine
    runs for quoted queries.

    Scale shape: the postings scan keeps ONLY the phrase's own terms
    (one (token, doc_id, pos) row per occurrence of a query term — the
    corpus never leaves its blocks), then ONE doc-keyed task hash
    exchange co-locates each doc's occurrence rows; the per-doc
    intersection is vectorized ``np.isin`` over sorted position arrays,
    narrowing from the rarest term first.

    Returns ``(doc_id, n_matches, first_pos)`` int64 rows for matching
    docs only (SQL oracle: list-slice window equality + GROUP BY)."""
    if not phrase:
        raise ValueError("phrase_search: empty phrase")
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)
    rows = positional_postings(ds, phrase, id_col, text_col)

    def per_partition(pdf):
        import pandas as pd

        out_id, out_n, out_first = [], [], []
        if len(pdf):
            for did, g in pdf.groupby(id_col, sort=True):
                by_tok = {t: np.sort(sub["pos"].to_numpy())
                          for t, sub in g.groupby("token")}
                # narrow from the rarest term: every term must be present
                if len(by_tok) < len(set(phrase)):
                    continue
                rare = min(range(len(phrase)),
                           key=lambda i: len(by_tok[phrase[i]]))
                cand = by_tok[phrase[rare]] - rare
                for i, term in enumerate(phrase):
                    if i == rare or not len(cand):
                        continue
                    cand = cand[np.isin(cand + i, by_tok[term],
                                        assume_unique=False)]
                cand = cand[cand >= 0]
                if len(cand):
                    out_id.append(did)
                    out_n.append(len(cand))
                    out_first.append(int(cand.min()))
        return pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype="int64"),
            "n_matches": pd.Series(out_n, dtype="int64"),
            "first_pos": pd.Series(out_first, dtype="int64")})

    return partitioned_apply(rows, [id_col], per_partition, width)


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def snippet_windows(ds, terms: list[str], window: int = 16,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Query-dependent snippet/highlight extraction (the search surface's
    excerpt — the reference displays per-result snippets from its search
    backends, wiki_client.py:121-153, cse_client.py:207): for every doc
    containing ≥1 query term, the best ``window``-token window = max
    query-term hits, ties to the SMALLEST start. Deterministic and
    integer-ranked, so exactly SQL-expressible.

    Scale shape: completely SHUFFLE-FREE — a doc's best window is a pure
    row property (token hit mask → cumsum sliding-window sums → first
    argmax), so the corpus never leaves its blocks; output is one short
    row per MATCHING doc only. Returns (doc_id, start_tok, n_hits,
    snippet)."""
    tset = set(terms)

    def best(batch: pa.Table) -> pa.Table:
        out_id, out_s, out_n, out_txt = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = (t or "").split(" ")
            hit = np.fromiter((tok in tset for tok in toks), np.int64,
                              len(toks))
            if not hit.any():
                continue
            c = np.concatenate(([0], np.cumsum(hit)))
            n_starts = max(len(toks) - window + 1, 1)
            ends = np.minimum(np.arange(n_starts) + window, len(toks))
            wsum = c[ends] - c[:n_starts]
            s = int(np.argmax(wsum))  # first max = smallest start
            out_id.append(did)
            out_s.append(s)
            out_n.append(int(wsum[s]))
            out_txt.append(" ".join(toks[s:s + window]))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "start_tok": pa.array(out_s, pa.int64()),
            "n_hits": pa.array(out_n, pa.int64()),
            "snippet": pa.array(out_txt, pa.string())})

    return ds.map_batches(best, batch_format="pyarrow")


def _typo_budget(term: str) -> int:
    """Meilisearch's typo-tolerance rule (the reference indexes with
    ranking rule 'typo', crawler.py:341): 0 typos under 5 chars, 1 from
    5, 2 from 9 — DuckDB's levenshtein() restates it exactly."""
    n = len(term)
    return 0 if n < 5 else (1 if n < 9 else 2)


def _ed_within(a: str, b: str, k: int) -> bool:
    """Levenshtein(a, b) <= k with band pruning (k <= 2, short tokens)."""
    if abs(len(a) - len(b)) > k:
        return False
    if k == 0:
        return a == b
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            cur.append(v)
            lo = min(lo, v)
        if lo > k:
            return False
        prev = cur
    return prev[-1] <= k


def fuzzy_topk(ds, terms: list[str], k: int = 10,
               id_col: str = "doc_id", text_col: str = "text"):
    """Typo-tolerant retrieval (Meilisearch 'typo' ranking tier): a doc
    token matches a query term when their edit distance is within the
    term's typo budget (0/<5 chars, 1/<9, 2 else). Score = total matched
    occurrences; top-``k`` by (score desc, doc_id asc).

    Scale shape: shuffle-free scoring — the query set is tiny and
    closed, so each batch tests its own tokens against it (per-distinct-
    token memo per batch; band-pruned DP only for near-length tokens) —
    then per-batch top-k partials, O(batches·k) rows to one driver
    merge. No vocabulary broadcast, no exchange.

    Returns (doc_id, n_hits, rnk)."""
    budgets = [(t, _typo_budget(t)) for t in terms]

    def score(batch: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}

        def tok_hits(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = sum(1 for t, b in budgets if _ed_within(tok, t, b))
                memo[tok] = v
            return v

        out_id, out_n = [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            n = sum(tok_hits(tok) for tok in (t or "").split(" "))
            if n:
                out_id.append(did)
                out_n.append(n)
        ids = np.array(out_id, np.int64)
        ns = np.array(out_n, np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -ns))[:k]
            ids, ns = ids[top], ns[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_hits": pa.array(ns, pa.int64())})

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["n_hits"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "n_hits": pa.array([r["n_hits"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())})


def proximity_topk(ds, terms: list[str], k: int = 10,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Proximity ranking (Meilisearch's 'proximity' tier, crawler.py:341):
    rank docs containing ALL query terms by the minimal token span
    covering every term at least once — closer terms rank higher. The
    optimal window always starts at an occurrence of some query term, so
    span(doc) = min over occurrence positions p of
    (max over terms of its first position ≥ p) − p + 1.

    Scale shape: shuffle-free — per-term position arrays per doc, one
    ``searchsorted`` per (occurrence, term); docs missing any term drop
    in-block; per-batch top-k partials (smallest spans) → O(batches·k)
    rows to one driver merge. Returns (doc_id, span, rnk) — span asc,
    doc_id asc ties."""
    tlist = list(dict.fromkeys(terms))
    if not tlist:
        raise ValueError("proximity_topk: empty terms")

    def score(batch: pa.Table) -> pa.Table:
        out_id, out_sp = [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = np.array((t or "").split(" "))
            pos = {q: np.flatnonzero(toks == q) for q in tlist}
            if any(len(p) == 0 for p in pos.values()):
                continue
            allpos = np.sort(np.concatenate(list(pos.values())))
            best = None
            for p in allpos:
                mx = -1
                for q in tlist:
                    arr = pos[q]
                    idx = int(np.searchsorted(arr, p))
                    if idx == len(arr):
                        mx = None
                        break
                    mx = max(mx, int(arr[idx]))
                if mx is None:
                    break  # larger p can only run out of terms too
                span = mx - int(p) + 1
                if best is None or span < best:
                    best = span
            if best is not None:
                out_id.append(did)
                out_sp.append(best)
        ids = np.array(out_id, np.int64)
        sp = np.array(out_sp, np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, sp))[:k]
            ids, sp = ids[top], sp[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "span": pa.array(sp, pa.int64())})

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["span"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "span": pa.array([r["span"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())})


def _bm25_w_ppm(tf: int, dl: int, df: int, n_docs: int, t_toks: int) -> int:
    """The repo's rational BM25 per-posting weight (k1=1.2, b=0.75,
    idf=(N+1)/(df+1), denominators cleared into ONE floor division) —
    the bm25_topk formula factored out so the impact index stores the
    same integers the query-time oracle recomputes. Python bignums: the
    numerator overflows int64 at corpus scale."""
    num = 1_000_000 * (n_docs + 1) * 22 * tf * t_toks
    den = (df + 1) * (10 * tf * t_toks + 3 * t_toks + 9 * dl * n_docs)
    return num // den


def impact_postings(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Impact-ordered index build: the postings table with the quantized
    per-posting BM25 contribution PRECOMPUTED — (token, doc_id, w_ppm)
    — plus the per-term summary (token, df, max_w) that query-time
    pruning needs (Anh & Moffat's impact-sorted index layout, public).

    Query-time scoring then never touches document text or lengths:
    score(doc) = Σ w_ppm over the doc's query-term rows, and max_w is an
    EXACT per-term score upper bound (floor is monotone, so the max of
    the stored floors is the max posting score).

    Build shape: one stats pass (two scalars), one posting pass emitting
    (token, doc, tf, dl), a token-keyed Count for df (fixed-width rows),
    df broadcast once via ``ray.put``, then a shuffle-free weight pass;
    the summary is a token-keyed (Count, Max) aggregate. Returns
    ``(postings_ds, summary_ds, n_docs, t_toks)``."""
    import ray
    from ray.data.aggregate import Count, Max, Sum

    def len_partial(batch: pa.Table) -> pa.Table:
        dls = [len((t or "").split(" ")) for t in batch[text_col].to_pylist()]
        return pa.table({"n": pa.array([len(dls)], pa.int64()),
                         "t": pa.array([sum(dls)], pa.int64())})

    tot = (ds.map_batches(len_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("t", alias_name="t")))
    n_docs, t_toks = int(tot["n"]), int(tot["t"])

    def posting_partial(batch: pa.Table) -> pa.Table:
        toks_out, ids_out, tf_out, dl_out = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            words = (t or "").split(" ")
            c = Counter(words)
            for tok, tf in c.items():
                toks_out.append(tok)
                ids_out.append(did)
                tf_out.append(tf)
                dl_out.append(len(words))
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids_out, pa.int64()),
                         "tf": pa.array(tf_out, pa.int64()),
                         "dl": pa.array(dl_out, pa.int64())})

    raw = ds.map_batches(posting_partial, batch_format="pyarrow").materialize()
    df_rows = raw.groupby("token").aggregate(Count(alias_name="df")).take_all()
    df_ref = ray.put({r["token"]: int(r["df"]) for r in df_rows})

    def weigh(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        w = [_bm25_w_ppm(tf, dl, df[tok], n_docs, t_toks)
             for tok, tf, dl in zip(batch["token"].to_pylist(),
                                    batch["tf"].to_pylist(),
                                    batch["dl"].to_pylist())]
        return pa.table({"token": batch["token"], id_col: batch[id_col],
                         "w_ppm": pa.array(w, pa.int64())})

    postings = raw.map_batches(weigh, batch_format="pyarrow").materialize()
    summary = postings.groupby("token").aggregate(
        Count(alias_name="df"), Max("w_ppm", alias_name="max_w"))
    return postings, summary, n_docs, t_toks


def maxscore_search(postings_ds, summary_ds, terms: list[str], k: int = 10,
                    id_col: str = "doc_id", n_parts: int | None = None):
    """MaxScore candidate-pruned top-k over an impact index (Turtle &
    Flood 1995, restated for a batch engine) — EXACT: returns the same
    (doc_id, bm25_ppm, rnk) rows as the full-scan ``bm25_topk``.

    1. per-term upper bounds UB(t) = max_w from the index summary
       (O(|terms|) scalar rows to the driver);
    2. θ = k-th best PER-BLOCK partial doc score over the query-term
       postings — partial sums of non-negative weights are lower bounds
       of true scores, so θ ≤ the true k-th best score;
    3. terms split into non-essential NE (the maximal ascending-UB
       prefix with Σ UB < θ) and essential E. A doc containing only NE
       terms scores ≤ Σ UB(NE) < θ — it cannot reach the top k, so
       candidate docs = docs appearing in postings(E);
    4. exact scoring shuffles postings(E) in full but postings(NE) only
       SEMI-JOINED to the candidate doc set — on a head-heavy query mix
       the stopword-sized NE lists are the bulk of the index, and this
       is the row traffic MaxScore removes; doc-keyed Sum → per-block
       top-k partials → one O(blocks·k) driver merge.

    Every doc with true score ≥ θ contains an E term, enters the
    candidate set, and has ALL its query-term rows in the Sum — its
    score is exact; the pruned docs score < θ ≤ k-th best, so the top-k
    and tie order (score desc, id asc) are byte-identical to the full
    scan."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .grouping import drop_empty_blocks, resolve_parts

    tlist = list(dict.fromkeys(terms))
    if not tlist:
        raise ValueError("maxscore_search: empty terms")

    post_schema = pa.schema([("token", pa.string()), (id_col, pa.int64()),
                             ("w_ppm", pa.int64())])
    summ_schema = pa.schema([("token", pa.string()), ("df", pa.int64()),
                             ("max_w", pa.int64())])

    def tok_filter(ds_in, toks, schema):
        vset = pa.array(list(toks), pa.string())
        return drop_empty_blocks(ds_in.map_batches(
            lambda b: b.filter(pc.is_in(b["token"], value_set=vset)),
            batch_format="pyarrow"), empty_schema=schema)

    qpost = tok_filter(postings_ds, tlist, post_schema).materialize()
    ub_rows = tok_filter(summary_ds, tlist, summ_schema).take_all()
    ub = {r["token"]: int(r["max_w"]) for r in ub_rows}
    if not ub:  # no query term occurs in the corpus
        return pa.table({id_col: pa.array([], pa.int64()),
                         "bm25_ppm": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})

    # θ seed: per-block partial doc sums (valid lower bounds)
    def block_partial_topk(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pdf = batch.select([id_col, "w_ppm"]).to_pandas()
        sums = pdf.groupby(id_col)["w_ppm"].sum().nlargest(k)
        return pa.table({"s": pa.array(sums.to_numpy(), pa.int64())})

    seed = qpost.map_batches(block_partial_topk,
                             batch_format="pyarrow").take_all()
    seed_scores = sorted((int(r["s"]) for r in seed), reverse=True)
    theta = seed_scores[k - 1] if len(seed_scores) >= k else 0

    # term partition: NE = maximal ascending-UB prefix with Σ UB < θ
    by_ub = sorted(ub, key=lambda t: (ub[t], t))
    ne, acc = [], 0
    for t in by_ub:
        if acc + ub[t] < theta:
            ne.append(t)
            acc += ub[t]
        else:
            break
    essential = [t for t in by_ub if t not in set(ne)]

    cols = [id_col, "w_ppm"]
    if ne:
        e_post = tok_filter(qpost, essential, post_schema).materialize()
        cand = drop_empty_blocks(e_post.map_batches(
            lambda b: pa.Table.from_arrays([b[id_col]], names=[id_col]),
            batch_format="pyarrow"))
        ne_kept = tok_filter(qpost, ne, post_schema).join(
            cand, join_type="left_semi",
            num_partitions=resolve_parts(n_parts), on=(id_col,))
        scored = (e_post.select_columns(cols)
                  .union(ne_kept.select_columns(cols)))
    else:
        scored = qpost.select_columns(cols)

    sums = scored.groupby(id_col).aggregate(Sum("w_ppm",
                                                alias_name="bm25_ppm"))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        s = np.asarray(batch["bm25_ppm"], np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -s))[:k]
            ids, s = ids[top], s[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bm25_ppm": pa.array(s, pa.int64())})

    rows = sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["bm25_ppm"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "bm25_ppm": pa.array([r["bm25_ppm"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())}
    )


_POW2 = None


def _bitlen(x):
    """Exact int64 bit length, vectorized: count of powers of two ≤ x.
    (np.log2 misrounds at exact powers of two; searchsorted cannot.)"""
    global _POW2
    if _POW2 is None:
        _POW2 = 2 ** np.arange(63, dtype=np.int64)
    return np.searchsorted(_POW2, x, side="right").astype(np.int64)


def postings_compression_plan(ds, *, id_col: str = "doc_id",
                              text_col: str = "text", top_n: int = 50,
                              n_parts: int | None = None):
    """Index-size planning: per-term compressed posting-list cost under
    the two standard gap encodings, and which one to pick.

    - varbyte: Σ over d-gaps of ceil(bitlen(gap)/7) bytes (first gap is
      the delta from -1, i.e. doc_id+1 — every gap ≥ 1);
    - Elias-Fano: n·(2 + bitlen(U//n) - 1) bits, ceil to bytes — the
      textbook 2n + n·⌊log₂(U/n)⌋ bound (Vigna WSDM'13) with
      ⌊log₂(U/n)⌋ computed on the integer quotient (equal: no power of
      two lies strictly between ⌊U/n⌋ and U/n);
    - enc: 'ef' when strictly smaller, else 'vb' (EF wins on dense
      terms, varbyte on sparse clustered ones).

    This is the planner an index sharder runs before `export_shards` —
    at 100 TB the postings table dwarfs the documents and choosing the
    wrong encoding per term costs tens of TB.

    Scale shape: postings from the existing `term_doc_tf` Counter
    partials (one row per (term, doc) — never per occurrence); per-term
    gap math needs each term's ids co-located once → ONE token-keyed
    `partitioned_apply` hash exchange of fixed-width rows; inside, the
    whole partition is ONE numpy sort + diff (term boundaries via
    np.unique) — no per-term Python loop. Universe U is one Max
    aggregate. Only per-batch top-`top_n` partials reach the driver.

    Output: top-`top_n` terms by (n_postings desc, token asc) —
    (token, n_postings, vb_bytes, ef_bytes, enc, rnk)."""
    from ray.data.aggregate import Max

    from .grouping import partitioned_apply, resolve_parts

    postings = term_doc_tf(ds, None, id_col, text_col)
    universe = int(ds.aggregate(Max(id_col, alias_name="u"))["u"]) + 1

    def per_term(pdf):
        import pandas as pd
        if not len(pdf):
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "n_postings": pd.Series([], dtype="int64"),
                                 "vb_bytes": pd.Series([], dtype="int64"),
                                 "ef_bytes": pd.Series([], dtype="int64")})
        df = pdf.sort_values(["token", id_col], kind="stable")
        toks = df["token"].to_numpy()
        ids = df[id_col].to_numpy(dtype=np.int64)
        # term boundaries: gaps within a term, doc_id+1 at each start
        starts = np.concatenate(([True], toks[1:] != toks[:-1]))
        gaps = np.empty_like(ids)
        gaps[starts] = ids[starts] + 1
        gaps[~starts] = ids[~starts] - ids[np.flatnonzero(~starts) - 1]
        vb = (_bitlen(gaps) + 6) // 7
        seg = np.cumsum(starts) - 1
        n_terms = int(seg[-1]) + 1
        vb_bytes = np.bincount(seg, weights=vb, minlength=n_terms).astype(
            np.int64)
        n_post = np.bincount(seg, minlength=n_terms).astype(np.int64)
        ef_bits = n_post * (1 + _bitlen(universe // n_post))
        return pd.DataFrame({
            "token": toks[starts],
            "n_postings": n_post,
            "vb_bytes": vb_bytes,
            "ef_bytes": (ef_bits + 7) // 8,
        })

    per = partitioned_apply(postings, ["token"], per_term,
                            resolve_parts(n_parts))

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n_postings", "token"],
                            ascending=[False, True]).head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    rows = per.map_batches(local_top, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["n_postings"], r["token"]))
    out = rows[:top_n]
    return pa.table({
        "token": pa.array([r["token"] for r in out], pa.string()),
        "n_postings": pa.array([r["n_postings"] for r in out], pa.int64()),
        "vb_bytes": pa.array([int(r["vb_bytes"]) for r in out], pa.int64()),
        "ef_bytes": pa.array([int(r["ef_bytes"]) for r in out], pa.int64()),
        "enc": pa.array(["ef" if r["ef_bytes"] < r["vb_bytes"] else "vb"
                         for r in out], pa.string()),
        "rnk": pa.array(range(1, len(out) + 1), pa.int64()),
    })


def bm25f_topk(ds, terms: list[str], k: int = 10, *,
               title_tokens: int = 8, w_title: int = 2, w_body: int = 1,
               id_col: str = "doc_id", text_col: str = "text"):
    """BM25F fielded retrieval (Robertson & Zaragoza 2009 §6, the "simple
    BM25F" weighted-field variant): token occurrences in the TITLE field
    count ``w_title``× and body occurrences ``w_body``× into a weighted
    term frequency, and document length becomes the same weighted sum —
    then the rational BM25 kernel of `bm25_topk` scores the weighted
    quantities. A hit in the title outranks the same hit buried in the
    body, which is exactly how the reference's Meilisearch ranks its
    searchableAttributes order (title before content —
    meilisearch_client.py searchable attribute config).

    The field split is positional and deterministic — the first
    ``title_tokens`` whitespace tokens are the title field (the corpus
    documents table has no separate title column; crawl docs get their
    real title upstream) — so the DuckDB oracle can restate it with list
    slicing.

    Scale shape identical to `bm25_topk`: term filter in the first pass,
    weighted-df broadcast as O(|terms|) scalars, doc-keyed Sum, per-batch
    top-k partials, O(batches·k) driver rows. Integer-exact: weighted
    tf/dl are integers, scores are the same one-floor-division rational
    in Python bignums. Returns (doc_id, bm25f_ppm, rnk)."""
    import ray
    from ray.data.aggregate import Count, Sum

    wt, wb, tt = int(w_title), int(w_body), int(title_tokens)

    def wdl_of(nw: int) -> int:
        return wt * min(nw, tt) + wb * max(nw - tt, 0)

    def len_partial(batch: pa.Table) -> pa.Table:
        wdls = [wdl_of(len((t or "").split(" ")))
                for t in batch[text_col].to_pylist()]
        return pa.table({"n": pa.array([len(wdls)], pa.int64()),
                         "t": pa.array([sum(wdls)], pa.int64())})

    tot = (ds.map_batches(len_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("t", alias_name="t")))
    n_docs, t_toks = int(tot["n"]), int(tot["t"])

    term_set = frozenset(terms)

    def posting_partial(batch: pa.Table) -> pa.Table:
        toks_out, ids_out, wtf_out, wdl_out = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            words = (t or "").split(" ")
            ct = Counter(words[:tt])
            cb = Counter(words[tt:])
            wdl = wdl_of(len(words))
            for tok in term_set:
                wtf = wt * ct[tok] + wb * cb[tok]
                if wtf:
                    toks_out.append(tok)
                    ids_out.append(did)
                    wtf_out.append(wtf)
                    wdl_out.append(wdl)
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids_out, pa.int64()),
                         "wtf": pa.array(wtf_out, pa.int64()),
                         "wdl": pa.array(wdl_out, pa.int64())})

    postings = ds.map_batches(posting_partial,
                              batch_format="pyarrow").materialize()
    df_rows = postings.groupby("token").aggregate(
        Count(alias_name="df")).take_all()
    df_ref = ray.put({r["token"]: int(r["df"]) for r in df_rows})

    def weight(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        w = []
        for tok, wtf, wdl in zip(batch["token"].to_pylist(),
                                 batch["wtf"].to_pylist(),
                                 batch["wdl"].to_pylist()):
            # Python ints: the products overflow int64 at corpus scale
            num = 1_000_000 * (n_docs + 1) * 22 * wtf * t_toks
            den = (df[tok] + 1) * (10 * wtf * t_toks + 3 * t_toks
                                   + 9 * wdl * n_docs)
            w.append(num // den)
        return pa.table({id_col: batch[id_col],
                         "w": pa.array(w, pa.int64())})

    sums = (postings.map_batches(weight, batch_format="pyarrow")
            .groupby(id_col).aggregate(Sum("w", alias_name="bm25f_ppm")))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        s = np.asarray(batch["bm25f_ppm"], np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -s))[:k]
            ids, s = ids[top], s[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bm25f_ppm": pa.array(s, pa.int64())})

    rows = sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["bm25f_ppm"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "bm25f_ppm": pa.array([r["bm25f_ppm"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())}
    )


def _ed_min(a: str, b: str, cap: int) -> int:
    """Exact Levenshtein(a, b) when it is <= cap, else any value > cap
    (banded DP, early exit) — callers only compare against budgets <= cap."""
    if a == b:
        return 0
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    if cap == 0:
        return 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            lo = min(lo, v)
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def meili_ranked_topk(ds, terms: list[str], k: int = 10,
                      id_col: str = "doc_id", text_col: str = "text"):
    """The full Meilisearch default ranking-rule CASCADE as one
    lexicographic retrieval operator — the reference's result ordering
    is exactly this cascade (its index is created with ranking rules
    words > typo > proximity > attribute > sort > exactness; Meilisearch
    public docs "Relevancy"). Per doc, integer tier keys:

    - ``words``   (DESC): distinct query terms matched within their typo
      budget (0 under 5 chars / 1 from 5 / 2 from 9 — ``_typo_budget``).
    - ``typos``   (ASC): sum over matched terms of the MINIMUM edit
      distance achieved by any doc token (0 for exact hits).
    - ``span``    (ASC): minimal token window covering every EXACTLY-
      present query term once (``proximity_topk``'s closed form); 0 when
      fewer than two distinct terms occur exactly.
    - ``first_pos`` (ASC): 0-based position of the earliest exact
      occurrence of any query term — the 'attribute'/position tier; docs
      with no exact hit take their token length (rank last in-tier).
    - ``exact_terms`` (DESC): distinct terms with an exact occurrence.

    Docs with ``words == 0`` drop; ties break on doc_id ASC. Returns the
    global top-``k`` as (doc_id, words, typos, span, first_pos,
    exact_terms, rnk).

    Scale shape: shuffle-free — the query set is tiny and closed, so
    every tier key computes in-block (per-batch distinct-token memo for
    the banded edit-distance DP, numpy position arrays for span); per-
    batch top-k partials under the SAME lexicographic order, then one
    O(batches·k) driver merge. No vocabulary broadcast, no exchange."""
    tlist = list(dict.fromkeys(terms))
    if not tlist:
        raise ValueError("meili_ranked_topk: empty terms")
    budgets = [_typo_budget(t) for t in tlist]
    nt = len(tlist)

    def sort_partial(ids, words, typos, span, fpos, exact, limit):
        order = np.lexsort((ids, -exact, fpos, span, typos, -words))[:limit]
        return tuple(x[order] for x in (ids, words, typos, span, fpos,
                                        exact))

    def score(batch: pa.Table) -> pa.Table:
        memo: dict[str, list[int]] = {}

        def dists(tok: str) -> list[int]:
            v = memo.get(tok)
            if v is None:
                v = [_ed_min(tok, t, b) for t, b in zip(tlist, budgets)]
                memo[tok] = v
            return v

        cols = {n: [] for n in ("id", "w", "ty", "sp", "fp", "ex")}
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = (t or "").split(" ")
            best = [budgets[i] + 1 for i in range(nt)]
            for tok in set(toks):
                for i, d in enumerate(dists(tok)):
                    if d < best[i]:
                        best[i] = d
            matched = [i for i in range(nt) if best[i] <= budgets[i]]
            if not matched:
                continue
            typos = sum(best[i] for i in matched)
            arr = np.array(toks)
            pos = {i: np.flatnonzero(arr == tlist[i]) for i in range(nt)}
            ex_terms = [i for i in range(nt) if len(pos[i])]
            fpos = (min(int(p[0]) for i, p in pos.items() if len(p))
                    if ex_terms else len(toks))
            span = 0
            if len(ex_terms) >= 2:
                allpos = np.sort(np.concatenate([pos[i] for i in ex_terms]))
                bsp = None
                for p in allpos:
                    mx = -1
                    for i in ex_terms:
                        a = pos[i]
                        ix = int(np.searchsorted(a, p))
                        if ix == len(a):
                            mx = None
                            break
                        mx = max(mx, int(a[ix]))
                    if mx is None:
                        break
                    w = mx - int(p) + 1
                    if bsp is None or w < bsp:
                        bsp = w
                span = bsp
            for n, v in zip(("id", "w", "ty", "sp", "fp", "ex"),
                            (did, len(matched), typos, span, fpos,
                             len(ex_terms))):
                cols[n].append(v)
        arrs = [np.array(cols[n], np.int64)
                for n in ("id", "w", "ty", "sp", "fp", "ex")]
        if len(arrs[0]) > k:
            arrs = sort_partial(*arrs, k)
        names = (id_col, "words", "typos", "span", "first_pos",
                 "exact_terms")
        return pa.table({n: pa.array(a, pa.int64())
                         for n, a in zip(names, arrs)})

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["words"], r["typos"], r["span"],
                             r["first_pos"], -r["exact_terms"], r[id_col]))
    out = rows[:k]
    names = (id_col, "words", "typos", "span", "first_pos", "exact_terms")
    tbl = {n: pa.array([r[n] for r in out], pa.int64()) for n in names}
    tbl["rnk"] = pa.array(range(1, len(out) + 1), pa.int64())
    return pa.table(tbl)


def prefix_topk(ds, exact_terms: list[str], prefix: str, k: int = 10,
                id_col: str = "doc_id", text_col: str = "text"):
    """Prefix retrieval — Meilisearch's search-as-you-type core: the LAST
    query word is matched as a TOKEN PREFIX while the preceding words
    match exactly (Meilisearch public docs "prefix search": only the
    final word of a query is a prefix). A doc's tier keys:

    - ``words`` (DESC): distinct query units matched — each exact term
      counts when present, the prefix counts when any token starts with
      it.
    - ``n_hits`` (DESC): total matching occurrences (exact occurrences
      plus prefix-hit tokens).

    Docs with ``words == 0`` drop; ties break doc_id ASC. Returns the
    top-``k`` as (doc_id, words, n_hits, rnk).

    Scale shape: shuffle-free — the query is a handful of closed terms
    plus one ``str.startswith``, all tested in-block; per-batch top-k
    partials under the same order, O(batches·k) rows to one driver
    merge."""
    tlist = list(dict.fromkeys(exact_terms))
    if not prefix:
        raise ValueError("prefix_topk: empty prefix")
    tset = frozenset(tlist)

    def score(batch: pa.Table) -> pa.Table:
        out = {"id": [], "w": [], "n": []}
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = (t or "").split(" ")
            exact_hits = {q: 0 for q in tlist}
            pref_hits = 0
            for tok in toks:
                if tok in tset:
                    exact_hits[tok] += 1
                if tok.startswith(prefix):
                    pref_hits += 1
            words = sum(1 for v in exact_hits.values() if v) + (
                1 if pref_hits else 0)
            if not words:
                continue
            out["id"].append(did)
            out["w"].append(words)
            out["n"].append(sum(exact_hits.values()) + pref_hits)
        ids = np.array(out["id"], np.int64)
        ws = np.array(out["w"], np.int64)
        ns = np.array(out["n"], np.int64)
        if len(ids) > k:
            top = np.lexsort((ids, -ns, -ws))[:k]
            ids, ws, ns = ids[top], ws[top], ns[top]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "words": pa.array(ws, pa.int64()),
                         "n_hits": pa.array(ns, pa.int64())})

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["words"], -r["n_hits"], r[id_col]))
    out = rows[:k]
    return pa.table(
        {id_col: pa.array([r[id_col] for r in out], pa.int64()),
         "words": pa.array([r["words"] for r in out], pa.int64()),
         "n_hits": pa.array([r["n_hits"] for r in out], pa.int64()),
         "rnk": pa.array(range(1, len(out) + 1), pa.int64())})
