"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k — the baseline and the oracle. Query
  matrix broadcast once (``ray.put``); each batch does one numpy matmul and
  emits only its local top-k partials; a tiny final merge reduces
  ``num_batches × k`` rows. Nothing proportional to the corpus ever leaves
  the workers.
- ``lsh_topk``: sign-random-projection bucketed variant — the scale path:
  probes only buckets within ``probe_hamming`` of the query's bucket key.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def _emb_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix without a Python-object
    round-trip: flatten the Arrow list buffer and view it as numpy
    (zero-copy for non-null double values), then reshape."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(n, -1)


def _topk_batch_idx(col: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-kk by (score desc, vec_id asc) — the oracle's tie
    order; plain argpartition breaks exact-score ties arbitrarily at the k
    boundary (duplicate/degenerate embeddings). A lexsort of the batch is
    noise next to the matmul that produced ``col``."""
    return np.lexsort((ids, -col))[:kk]


def brute_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Exact cosine top-k for each query row. Returns a pyarrow Table
    (query_id, rank, vec_id) — rank 1-based, ties broken by vec_id asc."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        sims = emb @ q.T  # (n, Q)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            idx = _topk_batch_idx(col, ids, kk)
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def quantize_int8(X: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 quantization: q = floor(x·127/max|x| +
    0.5). ELEMENTWISE float64 ops only (widen → mul → div → add →
    floor), so a SQL oracle replays it bit-exactly — there is no
    order-sensitive float reduction anywhere (max is exact). A zero
    vector quantizes to zeros."""
    scale = np.abs(X).max(axis=1, keepdims=True) if X.size else \
        np.ones((X.shape[0], 1))
    safe = np.where(scale == 0, 1.0, scale)
    return np.floor(X * 127.0 / safe + 0.5).astype(np.int64)


def int8_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
              emb_col: str = "embedding"):
    """Quantized ANN: top-k by INTEGER dot product of per-vector int8
    quantizations — the 4×-memory / SIMD-int8 scale path for
    cosine retrieval over unit-normalized embeddings (quantized dot ≈
    cosine·127²; recall vs ``brute_topk`` pinned in tests). Because
    scores are int64 and quantization is elementwise-exact, the WHOLE
    retrieval is oracle-gated exactly — unlike the float cosine path
    whose last-ulp ties SQL must reproduce.

    Same shape as ``brute_topk``: queries quantized once and broadcast,
    per-batch integer matmul partials, O(batches·Q·k) rows to one driver
    merge. Returns (query_id, rank, vec_id)."""
    import ray

    qq = quantize_int8(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qq)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = quantize_int8(_emb_matrix(batch[emb_col]))
        sims = emb @ q.T  # (n, Q) int64
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            idx = _topk_batch_idx(col, ids, kk)
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
             probe_hamming: int = 2, id_col: str = "vec_id",
             emb_col: str = "embedding", seed: int = 11):
    """Approximate cosine top-k: candidates = vectors whose sign-projection
    key is within ``probe_hamming`` of the query key; exact cosine on the
    candidates only. Recall measured against ``brute_topk`` in tests."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((qn.shape[1], n_planes))
    qkeys = ((qn @ planes) > 0).astype(np.int64) @ (1 << np.arange(n_planes))
    q_ref = ray.put((qn, planes, qkeys))

    def partial(batch: pa.Table) -> pa.Table:
        q, pl, qk = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        keys = ((emb @ pl) > 0).astype(np.int64) @ (1 << np.arange(pl.shape[1]))
        # vectorized hamming: popcount via uint8 bit-count lookup
        xor = (keys[:, None] ^ qk[None, :]).astype(np.uint64)  # (n, Q)
        ham = np.zeros(xor.shape, dtype=np.int64)
        for shift in range(0, 64, 8):
            ham += np.unpackbits(
                ((xor >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.uint8)[..., None],
                axis=-1,
            ).sum(axis=-1, dtype=np.int64)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            mask = ham[:, qi] <= probe_hamming
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = emb[mask] @ q[qi]
            kk2 = min(kk, len(sub_ids))
            idx = _topk_batch_idx(col, sub_ids, kk2)
            out_q.extend([qi] * kk2)
            out_id.extend(sub_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def _merge_topk(partials, k: int) -> pa.Table:
    """Tiny driver-side merge of per-batch top-k partials (num_batches × Q
    × k rows), tie order (score desc, vec_id asc)."""
    best: dict[int, list] = {}
    for r in partials:
        heapq.heappush(best.setdefault(r["query_id"], []),
                       (r["score"], -r["vec_id"]))
        if len(best[r["query_id"]]) > k:
            heapq.heappop(best[r["query_id"]])
    rows = []
    for qi, h in best.items():
        ordered = sorted(h, key=lambda x: (-x[0], -x[1]))
        for rank, (s, negid) in enumerate(ordered, 1):
            rows.append({"query_id": qi, "rank": rank, "vec_id": -negid})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                          ("vec_id", pa.int64())]),
    )


def kmeans_centroids(ds, n_centroids: int = 64, iters: int = 2,
                     emb_col: str = "embedding",
                     id_col: str | None = None) -> np.ndarray:
    """Deterministic distributed Lloyd iterations: init = first
    ``n_centroids`` vectors (stable input order), then ``iters`` rounds of
    per-batch partial (sum, count) per centroid → driver combine (the
    reduced state is n_centroids × dim floats — tiny). The full dataset is
    never materialized; each round is one streaming pass.

    With ``id_col``, init is the ``n_centroids`` SMALLEST-id vectors —
    a pure row property, so the result is independent of row order and
    batch boundaries (``limit()`` is not: upstream map stages that append
    rows per batch shift which vectors land in the head). Per-batch
    min-id candidates → one O(blocks·n) driver merge."""
    import ray

    if id_col is not None:
        def cand(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col], np.int64)
            idx = np.argsort(ids)[: min(n_centroids, len(ids))]
            return batch.select([id_col, emb_col]).take(pa.array(idx))

        rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
        rows.sort(key=lambda r: r[id_col])
        init = rows[:n_centroids]
    else:
        init = ds.limit(n_centroids).take_all()
    C = _normalize(np.array([r[emb_col] for r in init], dtype=np.float64))
    for _ in range(iters):
        cref = ray.put(C)

        def assign_partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            emb = _normalize(_emb_matrix(batch[emb_col]))
            a = np.argmax(emb @ cc.T, axis=1)
            sums = np.zeros_like(cc)
            np.add.at(sums, a, emb)
            counts = np.bincount(a, minlength=cc.shape[0])
            nz = np.nonzero(counts)[0]
            return pa.table(
                {"c": pa.array(nz, pa.int64()),
                 "n": pa.array(counts[nz], pa.int64()),
                 "vec": pa.array([sums[i].tolist() for i in nz],
                                 pa.list_(pa.float64()))}
            )

        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        # fixed summation order: float64 addition is not associative, so
        # an arrival-order fold would drift with scheduling
        parts = sorted(ds.map_batches(assign_partial,
                                      batch_format="pyarrow").take_all(),
                       key=lambda r: (r["c"], r["n"], tuple(r["vec"])))
        for r in parts:
            sums[r["c"]] += np.asarray(r["vec"])
            counts[r["c"]] += r["n"]
        keep = counts > 0
        C[keep] = _normalize(sums[keep] / counts[keep, None])
    return C


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 64,
             nprobe: int = 8, iters: int = 2, id_col: str = "vec_id",
             emb_col: str = "embedding"):
    """IVF approximate cosine top-k — the coarse-quantization scale path:
    k-means centroids (distributed Lloyd above), then one streaming pass
    that scores ONLY vectors whose nearest centroid is among each query's
    ``nprobe`` closest. ``nprobe == n_centroids`` probes everything and
    equals ``brute_topk`` exactly (pinned in tests). Versus LSH probing,
    IVF adapts to the data distribution; the centroid table (n_centroids ×
    dim) broadcasts once via ray.put."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # id-keyed init: centroids (hence recall at any nprobe) are independent
    # of block order / cluster size — the semantic_dedup discipline
    C = kmeans_centroids(ds, n_centroids, iters, emb_col, id_col=id_col)
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    q_ref = ray.put((qn, C, probe))

    def partial(batch: pa.Table) -> pa.Table:
        q, cc, pr = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        a = np.argmax(emb @ cc.T, axis=1)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            mask = np.isin(a, pr[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = emb[mask] @ q[qi]
            kk2 = min(kk, len(sub_ids))
            idx = _topk_batch_idx(col, sub_ids, kk2)
            out_q.extend([qi] * kk2)
            out_id.extend(sub_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def cluster_assign(ds, n_centroids: int = 64, iters: int = 2,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Semantic clustering for data mixing (the SemDeDup / cluster-balanced
    sampling building block): assign every vector to its nearest k-means
    centroid (cosine) after the deterministic distributed Lloyd training
    above. One extra streaming pass; the centroid table broadcasts once via
    ``ray.put``. Emits (vec_id, cluster, sim_ppm) with the similarity as a
    ×1e6-floored integer so downstream compares are float-free.
    Deterministic but not SQL-expressible (iterative algorithm) —
    rows-only driver check, pinned by determinism + partition-independence
    tests."""
    import ray

    # id-keyed init (see ivf_topk): assignments must not drift with block
    # order or partition count
    C = kmeans_centroids(ds, n_centroids, iters, emb_col, id_col=id_col)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        sims = emb @ cc.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(ids)), a]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(a, pa.int64()),
             "sim_ppm": pa.array(np.floor(best * 1e6).astype(np.int64),
                                 pa.int64())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def pq_codebooks_int(ds, n_sub: int = 4, n_codes: int = 8, iters: int = 1,
                     emb_col: str = "embedding",
                     id_col: str = "vec_id") -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid, TPAMI 2011):
    the embedding dimension is split into ``n_sub`` contiguous subspaces
    and each gets its own ``n_codes``-centroid codebook, trained by the
    INTEGER Lloyd discipline of ``intexact.kmeans_centroids_int`` — one
    ×512 floor quantization up front, init = subvectors of the
    ``n_codes`` smallest ids (pure row property ⇒ partition/order
    independent), per-batch (subspace, cell, count, sum-vector) partials,
    exact integer driver combine, centroid = ``sums // count``, argmin
    ties to the lowest code. ALL subspaces train in the same per-batch
    pass, so ``iters`` dataset scans total — not ``n_sub × iters``.

    Returns int64 array of shape (n_sub, n_codes, sub_dim). Integer
    throughout ⇒ the training replays exactly in SQL (unrolled CTE
    rounds per subspace)."""
    import ray

    from .intexact import QUANT_SCALE

    def cand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        idx = np.argsort(ids)[: min(n_codes, len(ids))]
        return batch.select([id_col, emb_col]).take(pa.array(idx))

    rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    init = rows[:n_codes]
    Q0 = np.floor(np.array([r[emb_col] for r in init], dtype=np.float64)
                  * QUANT_SCALE).astype(np.int64)
    dim = Q0.shape[1]
    if dim % n_sub:
        raise ValueError(f"pq: dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    # C[m, j] = centroid j of subspace m
    C = np.stack([Q0[:, m * sd:(m + 1) * sd] for m in range(n_sub)])

    for _ in range(iters):
        cref = ray.put(C)

        def assign_partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            q = np.floor(np.array(batch[emb_col].to_pylist(),
                                  dtype=np.float64)
                         * QUANT_SCALE).astype(np.int64)
            subs, cells, counts_l, vecs = [], [], [], []
            for m in range(n_sub):
                qm = q[:, m * sd:(m + 1) * sd]
                diff = qm[:, None, :] - cc[m][None, :, :]
                a = np.argmin((diff * diff).sum(axis=2), axis=1)
                sums = np.zeros_like(cc[m])
                np.add.at(sums, a, qm)
                cnt = np.bincount(a, minlength=n_codes)
                nz = np.nonzero(cnt)[0]
                subs.extend([m] * len(nz))
                cells.extend(nz.tolist())
                counts_l.extend(cnt[nz].tolist())
                vecs.extend(sums[i].tolist() for i in nz)
            return pa.table({"m": pa.array(subs, pa.int64()),
                             "c": pa.array(cells, pa.int64()),
                             "n": pa.array(counts_l, pa.int64()),
                             "vec": pa.array(vecs, pa.list_(pa.int64()))})

        sums = np.zeros_like(C)
        counts = np.zeros((n_sub, n_codes), dtype=np.int64)
        for r in ds.map_batches(assign_partial,
                                batch_format="pyarrow").take_all():
            sums[r["m"], r["c"]] += np.asarray(r["vec"], dtype=np.int64)
            counts[r["m"], r["c"]] += r["n"]
        keep = counts > 0
        C[keep] = sums[keep] // counts[keep][:, None]
    return C


def pq_topk(ds, queries: np.ndarray, k: int = 10, n_sub: int = 4,
            n_codes: int = 8, iters: int = 1, id_col: str = "vec_id",
            emb_col: str = "embedding"):
    """Product-quantization ANN with asymmetric distance computation:
    every vector compresses to ``n_sub`` byte codes (64 float dims →
    4 bytes here; the codes table is what a 100-TB embedding corpus
    keeps hot while full vectors stay cold on Parquet), and a query
    scores a vector as Σ_m LUT[m][code_m] where LUT = query-subvector ·
    codebook dots — ``n_sub`` int64 table lookups + adds per candidate,
    no per-dim work at scan time.

    Everything is integer after the one ×512 floor quantization
    (codebooks via ``pq_codebooks_int``, LUT dots int64, ties
    score-desc-then-id), so the ENTIRE pipeline — training rounds,
    encoding argmin, ADC scan — replays exactly in SQL; recall vs
    ``brute_topk`` is pinned in tests. Scale shape mirrors
    ``brute_topk``: codebooks + LUT broadcast once via ``ray.put``,
    per-batch encode + top-k partials, O(batches·Q·k) rows to one
    driver merge. Returns (query_id, rank, vec_id)."""
    import ray

    from .intexact import QUANT_SCALE

    C = pq_codebooks_int(ds, n_sub, n_codes, iters, emb_col, id_col)
    sd = C.shape[2]
    qq = np.floor(np.asarray(queries, dtype=np.float64)
                  * QUANT_SCALE).astype(np.int64)
    # LUT[qi, m, j] = dot(query qi's subspace m, codebook C[m, j])
    lut = np.einsum("qmd,mjd->qmj",
                    qq.reshape(qq.shape[0], n_sub, sd), C)
    cref = ray.put(C)
    lref = ray.put(lut)

    def partial(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        lt = ray.get(lref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        q = np.floor(np.array(batch[emb_col].to_pylist(), dtype=np.float64)
                     * QUANT_SCALE).astype(np.int64)
        codes = np.empty((len(ids), n_sub), dtype=np.int64)
        for m in range(n_sub):
            qm = q[:, m * sd:(m + 1) * sd]
            diff = qm[:, None, :] - cc[m][None, :, :]
            codes[:, m] = np.argmin((diff * diff).sum(axis=2), axis=1)
        # ADC: sims[i, qi] = Σ_m lut[qi, m, codes[i, m]]
        sims = np.zeros((len(ids), lt.shape[0]), dtype=np.int64)
        for m in range(n_sub):
            sims += lt[:, m, codes[:, m]].T
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(lt.shape[0]):
            col = sims[:, qi]
            idx = _topk_batch_idx(col, ids, kk)
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def _topk_with_scores(ds, queries: np.ndarray, k: int,
                      id_col: str, emb_col: str) -> dict[int, list]:
    """Per-query top-k WITH cosine scores: per-batch partials (the
    ``brute_topk`` shape), heap-merged on the driver. Returns
    {query_index: [(score, vec_id) desc, ties id asc]}."""
    import heapq

    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        sims = emb @ q.T
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            idx = _topk_batch_idx(col, ids, kk)
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score": pa.array(out_s, pa.float64())})

    best: dict[int, list] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        heapq.heappush(best.setdefault(r["query_id"], []),
                       (r["score"], -r["vec_id"]))
        if len(best[r["query_id"]]) > k:
            heapq.heappop(best[r["query_id"]])
    return {qi: [(s, -negid) for s, negid in
                 sorted(h, key=lambda x: (-x[0], -x[1]))]
            for qi, h in best.items()}


def _bucketed_topk_with_scores(ds_corpus, anchors_mat,
                                C: np.ndarray, nprobe: int, k: int,
                                id_col: str, emb_col: str,
                                n_parts: int | None = None
                                ) -> dict[int, list]:
    """IVF candidate generation for one mining direction: corpus rows
    route ONCE to their nearest-centroid cell; each anchor is replicated
    to its ``nprobe`` nearest cells; per cell a numpy matmul yields
    per-anchor top-k partials over that cell's corpus rows; a driver
    heap merges each anchor's ≤ nprobe·k partial rows. At
    nprobe == len(C) the candidate set is the whole corpus and the
    result equals the exact kernel. Returns the `_topk_with_scores`
    shape: {anchor ARRAY INDEX: [(score, id) desc]}."""
    import heapq

    import pandas as pd

    import ray

    from .grouping import partitioned_apply

    cn = _normalize(np.asarray(C, np.float64))
    an = _normalize(np.asarray(anchors_mat, np.float64))
    nprobe = min(nprobe, cn.shape[0])
    # anchors -> nprobe nearest cells, replicated as tagged rows
    probe_cells = np.argsort(-(an @ cn.T), axis=1, kind="stable")[:, :nprobe]
    a_rows = pa.table({
        "cell": pa.array(probe_cells.ravel(), pa.int64()),
        "role": pa.array(np.zeros(an.shape[0] * nprobe, np.int64)),
        "rid": pa.array(np.repeat(np.arange(an.shape[0], dtype=np.int64),
                                  nprobe), pa.int64()),
        "emb": pa.array([an[i].tolist()
                         for i in np.repeat(np.arange(an.shape[0]), nprobe)],
                        pa.list_(pa.float64()))})
    cref = ray.put(cn)

    def corpus_rows(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        ids = np.asarray(batch[id_col], np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        cell = np.argmax(emb @ cc.T, axis=1)
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "role": pa.array(np.ones(len(ids), np.int64)),
            "rid": pa.array(ids, pa.int64()),
            "emb": pa.array([e.tolist() for e in emb],
                            pa.list_(pa.float64()))})

    import ray.data as rd

    tagged = ds_corpus.map_batches(
        corpus_rows, batch_format="pyarrow").union(rd.from_arrow(a_rows))

    def per_cells(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, g in pdf.groupby("cell", sort=False):
            qa = g[g.role == 0]
            cb = g[g.role == 1]
            if qa.empty or cb.empty:
                continue
            qm = np.array(qa.emb.tolist(), np.float64)
            cm = np.array(cb.emb.tolist(), np.float64)
            bids = cb.rid.to_numpy(np.int64)
            sims = cm @ qm.T
            kk = min(k, len(bids))
            for j, aidx in enumerate(qa.rid.to_numpy(np.int64)):
                col = sims[:, j]
                idx = _topk_batch_idx(col, bids, kk)
                out_a.extend([aidx] * kk)
                out_b.extend(bids[idx].tolist())
                out_s.extend(col[idx].tolist())
        return pd.DataFrame({
            "aidx": pd.Series(out_a, dtype="int64"),
            "bid": pd.Series(out_b, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64")})

    part = partitioned_apply(tagged, ["cell"], per_cells, n_parts or 16)
    best: dict[int, list] = {}
    for r in part.take_all():
        if "aidx" not in r:
            continue
        # a corpus row lives in exactly ONE cell, so a given (anchor, b)
        # pair surfaces from exactly one partition — no dedup needed
        h = best.setdefault(int(r["aidx"]), [])
        heapq.heappush(h, (r["score"], -int(r["bid"])))
        if len(h) > k:
            heapq.heappop(h)
    return {qi: [(sc, -negid) for sc, negid in
                 sorted(h, key=lambda x: (-x[0], -x[1]))]
            for qi, h in best.items()}


def bitext_mine_ivf(ds_a, ds_b, k: int = 8, margin_min: float = 1.0,
                    n_centroids: int = 16, nprobe: int | None = None,
                    iters: int = 2, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    max_anchors: int = 200_000) -> pa.Table:
    """The IVF-bucketed scale path of ``bitext_mine``: k-means cells
    trained on the UNION of both slices (id-keyed deterministic init),
    the corpus side of each direction routed once to its nearest cell,
    anchors replicated to their ``nprobe`` nearest cells, per-cell
    numpy top-k partials merged per anchor — then the identical
    mutual-NN + ratio-margin acceptance. At ``nprobe=None`` (full
    probe) candidates cover every cell, so the output PROVABLY equals
    the exact kernel and the brute SQL oracle gates this whole path;
    pruned-probe recall is pinned in tests."""
    # materialize ONCE: centroid training (init pass + per-iteration
    # passes over the union) and the two direction passes would
    # otherwise re-execute each side's upstream read+filter 5+ times
    ds_a = ds_a.materialize()
    ds_b = ds_b.materialize()
    rows_a = ds_a.take(max_anchors + 1)
    rows_b = ds_b.take(max_anchors + 1)
    if len(rows_a) > max_anchors or len(rows_b) > max_anchors:
        raise ValueError("bitext_mine_ivf: anchor side exceeds "
                         f"max_anchors={max_anchors}")
    a_ids = np.array([r[id_col] for r in rows_a], np.int64)
    b_ids = np.array([r[id_col] for r in rows_b], np.int64)
    a_mat = np.array([r[emb_col] for r in rows_a], np.float64)
    b_mat = np.array([r[emb_col] for r in rows_b], np.float64)

    C = kmeans_centroids(ds_a.union(ds_b), n_centroids, iters, emb_col,
                         id_col=id_col)
    if nprobe is None:
        nprobe = C.shape[0]

    top_ab = _bucketed_topk_with_scores(ds_b, a_mat, C, nprobe, k,
                                        id_col, emb_col)
    top_ba = _bucketed_topk_with_scores(ds_a, b_mat, C, nprobe, k,
                                        id_col, emb_col)
    return _margin_pairs(a_ids, b_ids, top_ab, top_ba, k, margin_min)


def _margin_pairs(a_ids: np.ndarray, b_ids: np.ndarray,
                  top_ab: dict[int, list], top_ba: dict[int, list],
                  k: int, margin_min: float) -> pa.Table:
    """Mutual-NN + ratio-margin acceptance from two direction merges."""
    b_top1 = {int(b_ids[qi]): lst[0][1] for qi, lst in top_ba.items()
              if lst}
    b_avg = {int(b_ids[qi]): sum(s for s, _ in lst) / len(lst)
             for qi, lst in top_ba.items() if lst}
    out = []
    for qi, lst in sorted(top_ab.items()):
        if not lst:
            continue
        a = int(a_ids[qi])
        c, b = lst[0]
        if b_top1.get(b) != a:
            continue
        avg_a = sum(s for s, _ in lst) / len(lst)
        denom = (avg_a + b_avg[b]) / 2.0
        margin = c / denom
        if margin >= margin_min:
            out.append({"a_id": a, "b_id": int(b),
                        "cos": float(c), "margin": float(margin)})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("a_id", pa.int64()), ("b_id", pa.int64()),
         ("cos", pa.float64()), ("margin", pa.float64())]))


def bitext_mine(ds_a, ds_b, k: int = 8, margin_min: float = 1.0,
                id_col: str = "vec_id", emb_col: str = "embedding",
                max_anchors: int = 200_000) -> pa.Table:
    """Margin-based parallel-text mining (Artetxe & Schwenk 2019,
    "ratio" margin): a candidate pair (a, b) survives iff b is a's
    cosine nearest neighbour AND a is b's (mutual-NN), and the pair's
    cosine exceeds the mean of both anchors' k-NN neighbourhoods by the
    ``margin_min`` ratio:

        margin(a,b) = cos(a,b) / ((avg_k cos(a,·B) + avg_k cos(·A,b)) / 2)

    — the standard mined-bitext filter for cross-lingual pretraining
    corpora (LASER/CCMatrix-style), here over two embedding-table
    slices. Returns (a_id, b_id, cos, margin) for accepted pairs.

    Scale shape: each pass streams ONE side as corpus batches while the
    other side rides along as the broadcast query matrix (guarded by
    ``max_anchors``) — the declared oracle kernel, same contract as
    ``brute_topk``. At mining scale both sides are corpora; the scale
    path replaces the broadcast with the IVF machinery (``ivf_topk``'s
    centroid bucketing applied to both sides, margin computed per
    bucket) and is intentionally NOT fused into this exact kernel."""
    rows_a = ds_a.take(max_anchors + 1)
    if len(rows_a) > max_anchors:
        raise ValueError(f"bitext_mine: side A exceeds max_anchors="
                         f"{max_anchors}; use the IVF-bucketed path")
    rows_b = ds_b.take(max_anchors + 1)
    if len(rows_b) > max_anchors:
        raise ValueError(f"bitext_mine: side B exceeds max_anchors="
                         f"{max_anchors}; use the IVF-bucketed path")
    a_ids = np.array([r[id_col] for r in rows_a], np.int64)
    b_ids = np.array([r[id_col] for r in rows_b], np.int64)
    a_mat = np.array([r[emb_col] for r in rows_a], np.float64)
    b_mat = np.array([r[emb_col] for r in rows_b], np.float64)

    top_ab = _topk_with_scores(ds_b, a_mat, k, id_col, emb_col)
    top_ba = _topk_with_scores(ds_a, b_mat, k, id_col, emb_col)
    return _margin_pairs(a_ids, b_ids, top_ab, top_ba, k, margin_min)
