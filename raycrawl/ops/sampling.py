"""Deterministic hash sampling — uniform and stratified-by-key Bernoulli.

A training-data pipeline downsamples its corpus constantly (per-source
quality quotas, eval holdouts, debug slices). Doing that with ``random()``
is wrong at scale twice over: the sample changes on every retry of a failed
block (non-resumable), and stratified rates need a shuffle to count strata
first. Hash sampling fixes both — accept a row iff ``h(id) < rate·2^32``
with a cryptographic-quality ``h`` — so membership is a pure row property:
partition-independent, retry-stable, and joinable across tables (the same
id always lands in the same split).

Reference anchor: the reference crawler's per-site ``max_pages`` budget
(crawler.py:1090-1119) is its only downsampling knob; this generalizes it
to per-stratum rate control for corpus curation.

Everything is integer arithmetic on the first 8 hex chars of md5 so the
DuckDB oracle can reproduce decisions bit-exactly:

    accept  iff  int(md5(str(id))[:8], 16) * DENOM < rate_num(key) * 2^32

Stratified rates derive from the stratum key's own md5 (``1 + h16(key) %
DENOM`` 32nds), so no side table of per-source rates needs broadcasting —
any worker computes the rate from the key alone.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DENOM = 32  # stratified rates are n/32, n in 1..32


def _h32(s: str) -> int:
    """First 32 bits of md5 of ``s`` (matches DuckDB
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _h16(s: str) -> int:
    """First 16 bits of md5 of ``s``."""
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def stratum_rate_num(key: str) -> int:
    """Deterministic per-stratum rate numerator in 1..DENOM (rate = n/DENOM)."""
    return 1 + _h16(key) % DENOM


def uniform_sample_batch(batch: pa.Table, *, id_col: str = "doc_id",
                         rate_num: int = 8, denom: int = DENOM) -> pa.Table:
    """Keep rows where h32(id)·denom < rate_num·2^32 — a rate_num/denom
    Bernoulli sample, deterministic in the row id alone."""
    ids = batch[id_col].to_pylist()
    thr = rate_num * (1 << 32)
    mask = np.fromiter(
        (_h32(str(i)) * denom < thr for i in ids), dtype=bool, count=len(ids)
    )
    return batch.filter(pa.array(mask))


def stratified_sample_batch(batch: pa.Table, *, id_col: str = "doc_id",
                            key_col: str = "source",
                            denom: int = DENOM) -> pa.Table:
    """Per-stratum Bernoulli sample: stratum ``k`` keeps rows at rate
    ``stratum_rate_num(k)/denom``. Rates are computed from the key's hash,
    so the stage is stateless — no rate table is shipped per batch."""
    ids = batch[id_col].to_pylist()
    keys = batch[key_col].to_pylist()
    rate_cache: dict[str, int] = {}
    mask = np.empty(len(ids), dtype=bool)
    for j, (i, k) in enumerate(zip(ids, keys)):
        k = "" if k is None else str(k)
        rn = rate_cache.get(k)
        if rn is None:
            rn = rate_cache[k] = stratum_rate_num(k)
        mask[j] = _h32(str(i)) * denom < rn * (1 << 32)
    out = batch.filter(pa.array(mask))
    rnums = pa.array(
        [rate_cache["" if k is None else str(k)]
         for k in out[key_col].to_pylist()],
        pa.int64(),
    )
    return out.append_column("rate_num", rnums)


def split_batch(batch: pa.Table, *, id_col: str = "doc_id",
                train_pct: int = 90, val_pct: int = 5) -> pa.Table:
    """Deterministic train/val/test split: bucket = h32(id) % 100, train
    below ``train_pct``, val below ``train_pct + val_pct``, else test.
    Same pure-row-property guarantees as the samplers: a doc's split never
    changes across partitions, retries, or table joins — the property an
    eval holdout must have (a doc that migrates splits between pipeline
    runs contaminates the eval set)."""
    ids = batch[id_col].to_pylist()
    buckets = np.fromiter((_h32(str(i)) % 100 for i in ids),
                          dtype=np.int64, count=len(ids))
    split = np.where(buckets < train_pct, "train",
                     np.where(buckets < train_pct + val_pct, "val", "test"))
    return pa.table({id_col: batch[id_col],
                     "bucket": pa.array(buckets),
                     "split": pa.array(split.tolist(), pa.string())})


def group_split_batch(batch: pa.Table, *, group_col: str = "source",
                      id_col: str = "doc_id", train_pct: int = 90,
                      val_pct: int = 5) -> pa.Table:
    """Leakage-safe train/val/test split: bucket = h32(GROUP) % 100, so
    every document of a group (host, source, dup-cluster representative
    key) lands in the SAME split. The id-hash ``split_batch`` keeps split
    sizes exact but lets near-duplicate families straddle train and test
    — the classic eval-contamination vector for web corpora; splitting on
    the group key trades a little size jitter for the guarantee that
    correlated documents never cross the boundary. Same pure-row-property
    guarantees (partition/retry/join stable); group hashes are memoized
    per batch (batches are source-clustered in practice)."""
    groups = batch[group_col].to_pylist()
    memo: dict[str, int] = {}
    out = np.empty(len(groups), dtype=np.int64)
    for i, g in enumerate(groups):
        k = "" if g is None else str(g)
        b = memo.get(k)
        if b is None:
            b = _h32(k) % 100
            memo[k] = b
        out[i] = b
    split = np.where(out < train_pct, "train",
                     np.where(out < train_pct + val_pct, "val", "test"))
    return pa.table({id_col: batch[id_col],
                     group_col: batch[group_col],
                     "bucket": pa.array(out),
                     "split": pa.array(split.tolist(), pa.string())})


def domain_cap(ds, cap: int = 10, key_col: str = "source",
               id_col: str = "doc_id", text_col: str = "text",
               n_parts: int | None = None):
    """Domain balancing: keep at most ``cap`` documents per ``key_col``
    stratum, preferring the longest (n_chars desc, id asc — fully
    deterministic). The webtext-curation counterpart of the reference's
    per-site ``max_pages`` budget (crawler.py:1090-1119): caps a corpus
    where one domain would otherwise dominate training data.

    Two-stage top-N so the exchange never carries losers: each input batch
    pre-prunes to its own local top-``cap`` per key (a batch can contribute
    at most ``cap`` winners), then one hash shuffle on the key merges the
    partial winners and ranks. Only (key, id, n_chars) rows move — the
    text column is dropped at the first stage.

    Returns (key_col, id_col, n_chars, rnk), rnk 1..cap per key. Exactly
    SQL-expressible (row_number window) — oracle ``domain_cap``."""
    import pandas as pd

    from .grouping import partitioned_apply, resolve_parts

    def partial_top(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {key_col: batch[key_col].to_pylist(),
             id_col: np.asarray(batch[id_col], np.int64),
             "n_chars": [len(t or "") for t in batch[text_col].to_pylist()]}
        )
        pdf = pdf.sort_values([key_col, "n_chars", id_col],
                              ascending=[True, False, True], kind="stable")
        pdf = pdf.groupby(key_col, sort=False).head(cap)
        return pa.table(
            {key_col: pa.array(pdf[key_col], pa.string()),
             id_col: pa.array(pdf[id_col], pa.int64()),
             "n_chars": pa.array(pdf["n_chars"], pa.int64())}
        )

    def final_top(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="str"),
                 id_col: pd.Series([], dtype="int64"),
                 "n_chars": pd.Series([], dtype="int64"),
                 "rnk": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values([key_col, "n_chars", id_col],
                              ascending=[True, False, True], kind="stable")
        pdf = pdf.groupby(key_col, sort=False).head(cap).copy()
        pdf["rnk"] = pdf.groupby(key_col, sort=False).cumcount() + 1
        return pdf.astype({id_col: "int64", "n_chars": "int64",
                           "rnk": "int64"})

    pruned = ds.map_batches(partial_top, batch_format="pyarrow")
    return partitioned_apply(pruned, [key_col], final_top,
                             resolve_parts(n_parts))


def weighted_sample(ds, n_target: int = 100, *, id_col: str = "doc_id",
                    weight_col: str = "n_chars"):
    """Weight-proportional Poisson sampling: keep doc i with probability
    min(1, n_target·wᵢ / Σw) — heavier docs (more chars/tokens) are
    proportionally likelier, E[kept] ≈ n_target. The decision is the
    pure-integer cross-multiplication ``h32(id)·Σw < 2³²·n_target·wᵢ``
    (Python/HUGEINT exact — no float probabilities), so it is
    partition-independent, retry-stable, and replayed exactly by the
    SQL oracle. The data-mixture building block: sampling documents
    proportional to token count keeps the TOKEN distribution unbiased
    where uniform doc sampling skews toward short docs.

    Scale shape: pass 1 is one global integer Sum (a scalar to the
    driver); pass 2 is a shuffle-free in-block filter. Returns
    (id, weight, keep 0/1)."""
    import ray
    from ray.data.aggregate import Sum

    total = ds.aggregate(Sum(weight_col, alias_name="t"))["t"]
    if total is None or total <= 0:
        raise ValueError("weighted_sample: non-positive total weight")
    t_ref = ray.put(int(total))

    def decide(batch: pa.Table) -> pa.Table:
        tot = ray.get(t_ref)
        ids = batch[id_col].to_pylist()
        ws = np.asarray(batch[weight_col], np.int64)
        keep = [1 if _h32(str(i)) * tot < (1 << 32) * n_target * int(w)
                else 0 for i, w in zip(ids, ws)]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "weight": pa.array(ws, pa.int64()),
                         "keep": pa.array(keep, pa.int64())})

    return ds.map_batches(decide, batch_format="pyarrow")


def stratified_fixed_sample(ds, n: int = 5, *, key_col: str = "source",
                            id_col: str = "doc_id", seed: int = 0,
                            n_parts: int | None = None):
    """Exactly ``min(n, |stratum|)`` rows per ``key_col`` stratum, picked
    by the rank of ``md5('{id}:{seed}')`` (id tie-break) — an unbiased,
    DETERMINISTIC random sample. The eval/holdout-set constructor: unlike
    ``Dataset.random_sample`` it is reproducible across reruns, cluster
    sizes and partitionings, gives an exact count per stratum rather than
    a rate, and varies with ``seed`` (the ``deterministic_shuffle``
    key discipline applied per stratum).

    Scale shape (the ``domain_cap`` two-stage top-N): each batch pre-
    prunes to its local ``n`` smallest keys per stratum — a batch can
    contribute at most ``n`` winners — so only (key, id, 32-B rank) rows
    cross the ONE stratum-keyed exchange; losers never move.

    Returns (key_col, id_col, rnk), rnk 1..n per stratum."""
    import hashlib

    import pandas as pd

    from .grouping import partitioned_apply, resolve_parts

    def rank_key(ids) -> list[str]:
        return [hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
                for i in ids]

    def partial_top(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        pdf = pd.DataFrame({key_col: batch[key_col].to_pylist(),
                            id_col: ids, "rk": rank_key(ids)})
        pdf = pdf.sort_values([key_col, "rk", id_col], kind="stable")
        pdf = pdf.groupby(key_col, sort=False).head(n)
        return pa.table({key_col: pa.array(pdf[key_col], pa.string()),
                         id_col: pa.array(pdf[id_col], pa.int64()),
                         "rk": pa.array(pdf["rk"], pa.string())})

    def final_top(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="str"),
                 id_col: pd.Series([], dtype="int64"),
                 "rnk": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values([key_col, "rk", id_col], kind="stable")
        pdf = pdf.groupby(key_col, sort=False).head(n).copy()
        pdf["rnk"] = pdf.groupby(key_col, sort=False).cumcount() + 1
        return pdf[[key_col, id_col, "rnk"]].astype(
            {id_col: "int64", "rnk": "int64"})

    pruned = ds.map_batches(partial_top, batch_format="pyarrow")
    return partitioned_apply(pruned, [key_col], final_top,
                             resolve_parts(n_parts))


def temperature_flatten_sample(ds, *, key_col: str = "source",
                               id_col: str = "doc_id"):
    """τ=0.5 temperature-flattened mixture sample: downsample each
    ``key_col`` stratum so kept counts flatten toward equality.

    Multi-source training mixtures are routinely temperature-scaled (the
    multilingual-BERT / mT5 exponent-smoothing recipe): sampling each
    source proportionally to ``n_s^τ`` with τ<1 keeps a dominant source
    from swamping rare ones. At τ=0.5 the target count per source is
    ``∝ sqrt(n_s)``; normalizing so the SMALLEST source is kept whole
    gives acceptance rate ``sqrt(n_min / n_s)`` — expected kept count
    ``sqrt(n_s · n_min)``, flattened toward the geometric middle.

    Integer-exact acceptance (the hash-sampling discipline above):

        keep  iff  h32(str(id)) · isqrt(n_s)  <  isqrt(n_min) · 2^32

    ``isqrt`` (floor square root) is reproducible in SQL as
    ``CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)`` — IEEE-754 sqrt is
    correctly rounded (unlike pow), so the floor matches Python
    ``math.isqrt`` exactly for n < 2^52 — which is why τ is fixed at 0.5
    rather than a parameter: arbitrary ``pow(n, τ)`` is NOT bit-stable
    across libm implementations and would break the oracle gate.

    Two passes: a tiny ``groupby(key).count()`` (strata counts — one row
    per source), rates broadcast via the closure (O(sources) ints); then a
    shuffle-free ``map_batches`` filter. Returns the kept
    ``(key_col, id_col)`` rows."""
    import math

    counts = {r[key_col]: r["count()"]
              for r in ds.groupby(key_col).count().take_all()}
    if not counts:
        return ds.map_batches(
            lambda b: b.select([key_col, id_col]), batch_format="pyarrow")
    sq = {k: math.isqrt(n) for k, n in counts.items()}
    sq_min = min(sq.values())
    thr = sq_min << 32

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        ids = batch[id_col].to_pylist()
        mask = np.fromiter(
            (_h32(str(i)) * sq[k] < thr for k, i in zip(keys, ids)),
            dtype=bool, count=len(ids))
        return batch.select([key_col, id_col]).filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def negative_samples(ds, n_docs: int, k: int = 4, id_col: str = "doc_id"):
    """Deterministic negative sampling for contrastive training: each
    anchor doc gets ``k`` pseudo-random partner ids drawn by hash —
    ``neg = h32(md5('{id}:{i}')) % n_docs``, bumped to ``(neg+1) % n_docs``
    when it collides with the anchor. Contrastive objectives (CLIP-style /
    in-batch-negatives alternatives) need negatives that are reproducible
    across reruns, cluster sizes and partitionings; hash draws are a pure
    row property, so this is a shuffle-free flat-map (same discipline as
    the hash samplers above). Returns (doc_id, neg_idx, neg_id).

    Requires ``n_docs >= 2`` (with one doc no non-anchor partner exists)
    and assumes ids are exactly the dense range ``0..n_docs-1`` — the
    collision bump only honors the never-the-anchor contract under that
    id layout."""
    if n_docs < 2:
        raise ValueError(
            f"negative_samples: n_docs={n_docs} — need >= 2 docs to draw "
            "a negative that is not the anchor")

    def draw(batch: pa.Table) -> pa.Table:
        ids_out, idx_out, neg_out = [], [], []
        for d in batch[id_col].to_pylist():
            for i in range(k):
                raw = _h32(f"{d}:{i}") % n_docs
                ids_out.append(d)
                idx_out.append(i)
                neg_out.append((raw + 1) % n_docs if raw == d else raw)
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "neg_idx": pa.array(idx_out, pa.int64()),
                         "neg_id": pa.array(neg_out, pa.int64())})

    return ds.map_batches(draw, batch_format="pyarrow")


def cluster_split(docs_ds, pairs_ds, *, id_col: str = "doc_id",
                  train_pct: int = 90, val_pct: int = 5,
                  n_parts: int | None = None):
    """Near-dup-cluster-keyed leakage-safe split: every member of a
    duplicate CLUSTER (connected component of the near-dup pair graph)
    lands in the same train/val/test split.

    ``group_split_batch`` keys on a metadata column (source/host) — but
    near-duplicate families routinely span sources (syndication, mirrors,
    quote farms), and a train/test boundary through such a family is the
    classic eval-contamination vector the dedup literature warns about.
    Keying the split on the component label closes it: the pair source is
    any of the engine's similarity joins (exact Jaccard kernel,
    minhash_dedup at scale, cosine_allpairs), the labels come from the
    distributed min-label propagation (``ops/graph.connected_components``
    — O(log diameter) fixed-width exchanges), and docs that appear in no
    pair are their own singleton cluster (cluster_id = doc_id).

    One hash join (docs ⟕ labels on id — labels are one int64 row per
    PAIRED doc, a small fraction of the corpus) then a shuffle-free split
    pass; bucket = h32(str(cluster_id)) % 100, the repo-wide md5 split
    rule, so the assignment is partition/retry/join stable and the DuckDB
    oracle restates it exactly."""
    import ray.data as rd

    from .graph import connected_components
    from .grouping import nonempty_refs, resolve_parts

    labels = connected_components(pairs_ds, "a", "b", n_parts=n_parts)
    ids_only = docs_ds.map_batches(
        lambda b: pa.Table.from_arrays([b[id_col]], names=[id_col]),
        batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        labs = batch["label"].to_pylist() if "label" in batch.column_names \
            else [None] * len(ids)
        cid = np.fromiter(
            (i if l is None else l for i, l in zip(ids, labs)),
            dtype=np.int64, count=len(ids))
        buckets = np.fromiter((_h32(str(c)) % 100 for c in cid.tolist()),
                              dtype=np.int64, count=len(cid))
        split = np.where(buckets < train_pct, "train",
                         np.where(buckets < train_pct + val_pct, "val",
                                  "test"))
        return pa.table({id_col: batch[id_col],
                         "cluster_id": pa.array(cid),
                         "bucket": pa.array(buckets),
                         "split": pa.array(split.tolist(), pa.string())})

    live, _ = nonempty_refs(labels.map_batches(
        lambda b: pa.Table.from_arrays(
            [b["node"], b["label"]], names=[id_col, "label"]),
        batch_format="pyarrow"))
    if not live:  # no pairs at all: every doc is its own cluster
        return ids_only.map_batches(finish, batch_format="pyarrow")
    joined = ids_only.join(rd.from_arrow_refs(live), join_type="left_outer",
                           num_partitions=resolve_parts(n_parts),
                           on=(id_col,))
    return joined.map_batches(finish, batch_format="pyarrow")
