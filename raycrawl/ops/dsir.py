"""DSIR-style importance weighting: score raw docs by hashed-n-gram
similarity to a target distribution.

Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS) picks
pretraining documents whose hashed n-gram bag looks like a target domain:
estimate bucketed unigram distributions for the target slice and the raw
corpus, then weight each raw doc by how much more likely its tokens are
under the target than under the raw distribution. Here the "target" is a
column predicate on the corpus itself (default ``lang == target_lang`` —
the practical case of filtering a multilingual crawl toward one language),
so the whole computation derives from one table and is exactly
SQL-gateable.

Integer-exact variant (this repo's oracle discipline): instead of the
paper's log-likelihood ratio (float logs whose summation order makes
bit-parity fragile), each token contributes the SCALED INTEGER ratio

    (n_target[bucket] + 1) * scale // (n_raw[bucket] + 1)

and a doc's ``dsir_score`` is the int64 sum over its tokens — monotone in
the same direction as the paper's weight (docs whose tokens concentrate in
target-heavy buckets score high), add-1 smoothed, and reproducible to the
bit by DuckDB (md5-derived buckets, integer ``//``).

Scale shape (the ``unigram_rarity``/CCNet pattern): pass 1 shuffles only
per-batch (bucket, n) partials — at most ``n_buckets`` rows per batch, a
bounded exchange regardless of corpus size; the folded distribution
(2 × n_buckets int64s, ~16 KB at the default 1024) is broadcast ONCE via
``ray.put``; pass 2 is a shuffle-free ``map_batches`` scan. No stage ever
moves document text through a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import _h32

N_BUCKETS = 1024
SCALE = 1_000_000


def _bucket_counts(texts: list[str | None], n_buckets: int) -> np.ndarray:
    out = np.zeros(n_buckets, dtype=np.int64)
    for t in texts:
        for tok in (t or "").split(" "):
            out[_h32(tok) % n_buckets] += 1
    return out


def dsir_scores(ds, *, target_lang: str = "en", n_buckets: int = N_BUCKETS,
                scale: int = SCALE, id_col: str = "doc_id",
                text_col: str = "text", lang_col: str = "lang"):
    """Score every doc: ``(doc_id, n_tokens, dsir_score)``, int64-exact.

    ``ds`` carries (id_col, text_col, lang_col); the target distribution is
    the ``lang_col == target_lang`` slice's token-occurrence histogram over
    ``n_buckets`` md5 buckets."""
    import ray
    from ray.data.aggregate import Sum

    def dist_partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        langs = batch[lang_col].to_pylist()
        raw = _bucket_counts(texts, n_buckets)
        tgt = _bucket_counts(
            [t for t, lg in zip(texts, langs) if lg == target_lang], n_buckets)
        nz = np.nonzero(raw)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n_raw": pa.array(raw[nz], pa.int64()),
                         "n_tgt": pa.array(tgt[nz], pa.int64())})

    dist_rows = (ds.map_batches(dist_partial, batch_format="pyarrow")
                 .groupby("bucket")
                 .aggregate(Sum("n_raw", alias_name="n_raw"),
                            Sum("n_tgt", alias_name="n_tgt"))
                 .take_all())                       # ≤ n_buckets rows
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in dist_rows:
        raw[r["bucket"]] = r["n_raw"]
        tgt[r["bucket"]] = r["n_tgt"]
    # precompute the per-bucket integer contribution once: the scan then
    # just gathers + sums
    contrib_ref = ray.put((tgt + 1) * scale // (raw + 1))

    def score(batch: pa.Table) -> pa.Table:
        contrib = ray.get(contrib_ref)
        n_toks, scores = [], []
        for t in batch[text_col].to_pylist():
            toks = (t or "").split(" ")
            n_toks.append(len(toks))
            b = np.fromiter((_h32(w) % n_buckets for w in toks),
                            dtype=np.int64, count=len(toks))
            scores.append(int(contrib[b].sum()))
        return pa.table({"doc_id": batch[id_col],
                         "n_tokens": pa.array(n_toks, pa.int64()),
                         "dsir_score": pa.array(scores, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(ds, n: int, **kw):
    """The selection step: top-``n`` docs by (dsir_score desc, doc_id asc)
    — the deterministic analogue of the paper's Gumbel-top-k resample.
    Partial top-n per block would also work; at n ≪ corpus the full sort
    is what Ray Data's sort push-down already does with a limit."""
    scored = dsir_scores(ds, **kw)
    return scored.sort(["dsir_score", "doc_id"],
                       descending=[True, False]).limit(n)
