"""Sparse all-pairs cosine similarity join with prefix filtering.

The third near-duplicate candidate-generation family in this engine, next
to MinHash-LSH (``ops/dedup.py``) and SimHash banding: Bayardo, Ma &
Srikant's *Scaling Up All Pairs Similarity Search* (WWW 2007) prefix
filter over sparse term-frequency vectors.  Where MinHash approximates
set-Jaccard and SimHash approximates angular distance on a fixed-width
sketch, the prefix filter is EXACT over weighted cosine: every pair with
cos ≥ τ is guaranteed to be generated as a candidate, so after integer
verification the output is byte-identical to the quadratic all-pairs scan
(and SQL-oracle-gateable without any "approximate path" caveat).

Why it scales (the 100-TB shape):

- pass 1 builds document frequencies as per-batch distinct-per-doc Counter
  partials → one small (token, df) groupby — the unigram_rarity shuffle
  discipline; only tokens with df ≥ 2 enter the broadcast rank dict
  (a df-1 token can never co-occur in two docs, so it needs no global
  rank), bounded by a ``max_vocab`` raise-guard;
- pass 2 emits fixed-width (token-hash, doc, is_prefix) rows — the ONLY
  exchange that scales with corpus tokens, 17 B/row. The prefix rule is
  the one-sided L2 bound: order each doc's tokens rarest-first (global
  (df, token) order) and keep tokens in the prefix while the REMAINING
  suffix norm² ≥ τ²·‖x‖² — if two docs share no token in x's prefix,
  every shared token lives in x's suffix, so
  dot ≤ ‖suffix(x)‖·‖y‖ < τ‖x‖‖y‖ ⇒ cos < τ.  Rare tokens head the
  ordering, so hot tokens (stopwords) almost never enter a prefix and the
  per-token join cost |index(t)|·|probe(t)| stays tiny exactly where
  |probe(t)| is huge;
- candidate generation is a token-keyed ``partitioned_apply`` (index rows
  × probe rows per token, a ``max_bucket_cost`` raise-guard on the
  product — raising, not dropping, because correctness of the EXACT
  contract forbids silently losing candidates), followed by the global
  (a, b) unique pass;
- verification pulls texts through ``PartitionedLookup`` (node-cached
  plasma partitions — payload movement O(corpus), never O(pairs)) and
  recomputes the cosine in exact Python integers:
  keep iff dot²·10⁶ ≥ tau2_ppm·‖a‖²·‖b‖², reporting
  cos²_ppm = dot²·10⁶ // (‖a‖²·‖b‖²) — squared cosine so the whole
  pipeline (and its DuckDB oracle, which restates the token self-join
  with HUGEINT casts) stays integer-exact, no sqrt anywhere.

Tokenization matches the repo-wide SQL-oracle convention
(``token_stats_batch``): ``text.split(" ")``, empty strings included —
byte-identical to DuckDB ``string_split(text, ' ')``.

Reference parity note: the reference engine has no similarity join at all
(its dedup is first-wins content_hash, crawler.py); this operator is part
of the beyond-reference LLM-training-data family the engine adds.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import PartitionedLookup, get_parts
from .grouping import drop_empty_blocks, partitioned_apply, resolve_parts
from .textstats import hash_str

PPM = 1_000_000


def _tf(text: str) -> Counter:
    """Term-frequency vector under the oracle tokenizer (split on single
    space, empties kept — string_split parity)."""
    return Counter((text or "").split(" "))


def _norm2(c: Counter) -> int:
    return sum(v * v for v in c.values())


def doc_frequencies(ds, text_col: str = "text"):
    """(token, df) over distinct-per-doc tokens: Counter partials per batch
    → one small groupby Sum. The only corpus-wide pass before emission."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(set((t or "").split(" ")))
        return pa.table({"tok": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("tok").aggregate(Sum("df", alias_name="df")))


def _rank_dict(df_ds, max_vocab: int) -> dict[str, int]:
    """Broadcastable token → df map for df ≥ 2 tokens only (df-1 tokens
    never pair, so they sort by the (1, token) fallback on the doc side).
    Raises instead of silently broadcasting an unbounded vocabulary —
    the unigram_rarity guard discipline; the scale path past the guard is
    a higher min-df prune (df ≥ 3, 4, …), which only ever REMOVES tokens
    from prefixes' competition, never correctness."""
    import pyarrow.compute as pc

    multi = df_ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], 2)),
        batch_format="pyarrow")
    rows = multi.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"cosine_allpairs: >{max_vocab} tokens with df>=2 — raise "
            "max_vocab or prune with a higher min_df before broadcasting")
    return {r["tok"]: int(r["df"]) for r in rows}


def emit_prefix_rows(ds, df_ref, tau2_ppm: int, id_col: str = "doc_id",
                     text_col: str = "text"):
    """(thash, doc, idx) rows: one per distinct (token, doc); idx=1 marks
    the token inside the doc's prefix under the one-sided L2 bound."""
    import ray

    def emit(batch: pa.Table) -> pa.Table:
        dfd: dict = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
        th, dc, ix = [], [], []
        ids = batch[id_col].to_pylist()
        for i, t in zip(ids, batch[text_col].to_pylist()):
            c = _tf(t)
            n2 = _norm2(c)
            if n2 == 0:
                continue
            # rarest-first global order; df-1 tokens fall back to (1, tok)
            items = sorted(c.items(), key=lambda kv: (dfd.get(kv[0], 1), kv[0]))
            rem = n2
            for tok, v in items:
                in_prefix = rem * PPM >= tau2_ppm * n2
                # hash_str is unsigned 64-bit — fold to signed for int64
                th.append(hash_str(tok) - (1 << 63))
                dc.append(i)
                ix.append(1 if in_prefix else 0)
                if in_prefix:
                    rem -= v * v
        return pa.table({"thash": pa.array(th, pa.int64()),
                         "doc": pa.array(dc, pa.int64()),
                         "idx": pa.array(ix, pa.int8())})

    return ds.map_batches(emit, batch_format="pyarrow")


def _token_candidates(max_bucket_cost: int, on_hot: str = "raise"):
    """``on_hot``: 'raise' (default — convert a silent O(n²) blow-up into
    a loud, parameterized decision) or 'allow' (r5 — compute the hot
    bucket anyway, deduping incrementally per bucket so peak memory is
    O(max bucket cost + unique pairs), never Σ bucket costs; the knowing
    escape hatch for corpora whose moderate-similarity band is genuinely
    dense, where the exact join IS quadratic and the caller wants it)."""

    def cand_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        n_buffered = 0
        for _, g in pdf.groupby("thash", sort=False):
            docs = g["doc"].to_numpy()
            idx_docs = np.unique(docs[g["idx"].to_numpy() == 1])
            all_docs = np.unique(docs)
            if len(idx_docs) == 0 or len(all_docs) < 2:
                continue
            cost = len(idx_docs) * len(all_docs)
            if cost > max_bucket_cost and on_hot == "raise":
                raise ValueError(
                    f"cosine_allpairs: token bucket cost {cost} > "
                    f"{max_bucket_cost} — a hot token reached a prefix; "
                    "raise max_bucket_cost, lower tau, or pass "
                    "on_hot='allow' to compute the quadratic bucket "
                    "knowingly")
            a = np.repeat(idx_docs, len(all_docs))
            b = np.tile(all_docs, len(idx_docs))
            m = a != b
            a, b = a[m], b[m]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi)
            n_buffered += len(lo)
            if n_buffered > max_bucket_cost:
                # fold buffered chunks into one deduped frame so the
                # working set tracks UNIQUE pairs, not raw emissions
                df = pd.DataFrame({"a": np.concatenate(outs_a),
                                   "b": np.concatenate(outs_b)}
                                  ).drop_duplicates(["a", "b"])
                outs_a = [df["a"].to_numpy()]
                outs_b = [df["b"].to_numpy()]
                n_buffered = len(df)
        if outs_a:
            df = pd.DataFrame({"a": np.concatenate(outs_a),
                               "b": np.concatenate(outs_b)})
            return df.drop_duplicates(["a", "b"]).astype("int64")
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    return cand_partition


def verify_cosine_pairs(pairs_ds, text_lookup: PartitionedLookup,
                        tau2_ppm: int, max_cached_docs: int = 65536):
    """Exact integer cos² verification: texts via the partitioned lookup,
    per-block tf-vector cache (same discipline as verify_jaccard_join)."""

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cos2_ppm": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        a = np.asarray(batch["a"], np.int64)
        b = np.asarray(batch["b"], np.int64)
        need = np.unique(np.concatenate([a, b]))
        parts = text_lookup.parts_for(need)
        loaded = get_parts(text_lookup, np.unique(parts))
        cache: dict[int, tuple[Counter, int]] = {}

        def vec(i: int) -> tuple[Counter, int]:
            got = cache.get(i)
            if got is None:
                part = loaded[int(text_lookup.parts_for(np.array([i]))[0])]
                c = _tf(part[i])
                got = (c, _norm2(c))
                if len(cache) >= max_cached_docs:
                    cache.clear()
                cache[i] = got
            return got

        oa, ob, oc = [], [], []
        for i, j in zip(a.tolist(), b.tolist()):
            ca, na2 = vec(i)
            cb, nb2 = vec(j)
            if na2 == 0 or nb2 == 0:
                continue
            small, big = (ca, cb) if len(ca) <= len(cb) else (cb, ca)
            dot = sum(v * big.get(k, 0) for k, v in small.items())
            if dot * dot * PPM >= tau2_ppm * na2 * nb2:
                oa.append(i)
                ob.append(j)
                oc.append(dot * dot * PPM // (na2 * nb2))
        return pa.table({"a": pa.array(oa, pa.int64()),
                         "b": pa.array(ob, pa.int64()),
                         "cos2_ppm": pa.array(oc, pa.int64())})

    return pairs_ds.map_batches(verify, batch_format="pyarrow",
                                batch_size=None)


def cosine_allpairs(ds, tau2_ppm: int = 500_000, id_col: str = "doc_id",
                    text_col: str = "text", n_parts: int | None = None,
                    max_vocab: int = 2_000_000,
                    max_bucket_cost: int = 5_000_000,
                    on_hot: str = "raise"):
    """EXACT sparse-cosine similarity join: every unordered pair (a < b)
    with cos²(tf_a, tf_b) ≥ tau2_ppm/10⁶, as (a, b, cos2_ppm).

    prefix-filter candidates → global pair unique → integer verify; see
    module docstring for the scale argument. The candidate stage is a
    strict superset of the true pair set (one-sided L2 prefix bound), so
    the verified output equals the quadratic all-pairs scan exactly.

    REGIME NOTE (r5, measured): on a template-vocabulary corpus the
    moderate-similarity band is dense enough that at sf0.1 (5 000 docs)
    a hot token reaches prefixes and the ``max_bucket_cost`` guard
    raises BY DESIGN — the true candidate volume there is genuinely
    quadratic, and an exact all-pairs join is the wrong tool for that
    regime (use minhash_dedup / semantic_dedup, or pass
    ``on_hot='allow'`` to compute the quadratic buckets knowingly —
    verified equal to the DuckDB quadratic oracle at sf0.1). The guard
    converts a silent O(n²) blow-up into a loud, parameterized
    decision."""
    import ray

    width = resolve_parts(n_parts)
    # empty zero-column blocks (oversplit tiny inputs) skip map_batches
    # UDFs and would reach the lookup builder schema-less — strip them
    base = drop_empty_blocks(ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [b[id_col], b[text_col]], names=[id_col, text_col]),
        batch_format="pyarrow"))
    df_ref = ray.put(_rank_dict(doc_frequencies(base, text_col), max_vocab))
    rows = emit_prefix_rows(base, df_ref, tau2_ppm, id_col, text_col)
    cands = partitioned_apply(rows, ["thash"],
                              _token_candidates(max_bucket_cost, on_hot),
                              width)
    uniq = partitioned_apply(
        cands, ["a", "b"], lambda p: p.drop_duplicates(["a", "b"]), width)
    lookup = PartitionedLookup(base, id_col, text_col, width, kind="text")
    return verify_cosine_pairs(uniq, lookup, tau2_ppm)


def cosine_allpairs_bruteforce(docs_tbl: pa.Table, tau2_ppm: int = 500_000,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> pa.Table:
    """Single-process quadratic reference kernel (test gate for the
    prefix-filtered path; the SQL oracle restates the same join)."""
    ids = docs_tbl[id_col].to_pylist()
    texts = docs_tbl[text_col].to_pylist()
    vecs = [_tf(t) for t in texts]
    n2s = [_norm2(c) for c in vecs]
    oa, ob, oc = [], [], []
    order = np.argsort(np.asarray(ids, dtype=np.int64))
    for x in range(len(order)):
        i = order[x]
        if n2s[i] == 0:
            continue
        for y in range(x + 1, len(order)):
            j = order[y]
            if n2s[j] == 0:
                continue
            small, big = (vecs[i], vecs[j]) if len(vecs[i]) <= len(vecs[j]) \
                else (vecs[j], vecs[i])
            dot = sum(v * big.get(k, 0) for k, v in small.items())
            if dot * dot * PPM >= tau2_ppm * n2s[i] * n2s[j]:
                oa.append(min(ids[i], ids[j]))
                ob.append(max(ids[i], ids[j]))
                oc.append(dot * dot * PPM // (n2s[i] * n2s[j]))
    return pa.table({"a": pa.array(oa, pa.int64()),
                     "b": pa.array(ob, pa.int64()),
                     "cos2_ppm": pa.array(oc, pa.int64())})
