"""Integer-exact embedding kernels — the SQL-replayable siblings of the
float cosine family (``similarity.kmeans_centroids``,
``dedup.embedding_near_dup``, ``dedup.semantic_dedup``).

Everything here runs on int64 after ONE deterministic quantization
(``float32 → float64`` cast is exact, ``× 512`` is a power-of-two float64
multiply and therefore exact, ``floor`` is exact), so every downstream
stage — Lloyd iterations included — is bit-reproducible in ANSI SQL:
integer sums are associative (no float summation-order drift across
batches / partitions), there is no normalize step, and the projection
planes derive from md5 instead of a numpy RNG. These are correctness /
oracle kernels in the same sense as ``minhash_signatures_md5`` next to the
crc32 throughput kernel: the float ops stay the production defaults, the
integer ops gate the identical pipeline shape (quantize → kmeans cells /
sign buckets → within-group exact pairs → components → election)
end-to-end against DuckDB.

Integer cosine test: ``cos(a, b) ≥ num/den`` over the quantized vectors is
restated float-free as ``dot > 0 AND den²·dot² ≥ num²·|a|²·|b|²``.
Overflow bounds (int64): with per-dim magnitude ``M`` and dimension ``d``,
the largest intermediate is ``den²·(d·M²)²``; ``_check_bounds`` raises
before any silent wraparound (d=64, M≤1500, den≤20 stays < 2^63).

Scale shape: identical to the float siblings — centroids train in a
streaming per-batch-partial pass and broadcast once via ``ray.put``; the
pair passes are group exchanges with the usual ``max_bucket`` /
``max_cluster`` skew guards; only fixed-width int64 rows cross shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT_SCALE = 512  # 2^9 — power of two, so the float64 multiply is exact


def _quant_matrix(col) -> np.ndarray:
    """floor(float64(x) · 512) as int64 — the one lossy step, replayed in
    SQL as CAST(floor(CAST(e AS DOUBLE) * 512) AS BIGINT)."""
    emb = np.array(col.to_pylist(), dtype=np.float64)
    return np.floor(emb * QUANT_SCALE).astype(np.int64)


def _check_bounds(q: np.ndarray, den: int = 20) -> None:
    m = int(np.abs(q).max(initial=0))
    d = q.shape[1] if q.ndim == 2 else 1
    # den² · (d·M²)² must stay below 2^63
    if den * den * (d * m * m) ** 2 >= 2 ** 63:
        raise ValueError(
            f"intexact: quantized magnitude {m} at dim {d} would overflow "
            f"the int64 cosine test — lower QUANT_SCALE or the input range")


def kmeans_centroids_int(ds, n_centroids: int = 16, iters: int = 2,
                         emb_col: str = "embedding",
                         id_col: str = "vec_id") -> np.ndarray:
    """Integer Lloyd: init = quantized vectors of the ``n_centroids``
    SMALLEST ids (pure row property — partition/order independent), then
    ``iters`` rounds of per-batch partial (cell, count, int64 sum-vector)
    → exact driver combine (integer addition is associative, so unlike the
    float sibling no partial-sort is needed) → centroid = elementwise
    ``sums // count`` (floor division; empty cells keep the previous
    centroid). Assignment metric is squared L2 over the quantized ints;
    argmin ties break to the LOWEST cell index (numpy argmin == SQL
    ``ORDER BY dist, cid LIMIT 1``).

    The SQL replay divides as ``floor(CAST(sum AS DOUBLE) / count)`` —
    exact while |sum| stays ≪ 2^52/count (any test scale); the op itself
    uses true int64 floordiv, exact at every scale."""
    import ray

    def cand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        idx = np.argsort(ids)[: min(n_centroids, len(ids))]
        return batch.select([id_col, emb_col]).take(pa.array(idx))

    rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    init = rows[:n_centroids]
    C = np.floor(np.array([r[emb_col] for r in init], dtype=np.float64)
                 * QUANT_SCALE).astype(np.int64)

    for _ in range(iters):
        cref = ray.put(C)

        def assign_partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            q = _quant_matrix(batch[emb_col])
            diff = q[:, None, :] - cc[None, :, :]
            a = np.argmin((diff * diff).sum(axis=2), axis=1)
            sums = np.zeros_like(cc)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=cc.shape[0])
            nz = np.nonzero(counts)[0]
            return pa.table(
                {"c": pa.array(nz, pa.int64()),
                 "n": pa.array(counts[nz], pa.int64()),
                 "vec": pa.array([sums[i].tolist() for i in nz],
                                 pa.list_(pa.int64()))})

        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        for r in ds.map_batches(assign_partial,
                                batch_format="pyarrow").take_all():
            sums[r["c"]] += np.asarray(r["vec"], dtype=np.int64)
            counts[r["c"]] += r["n"]
        keep = counts > 0
        C[keep] = sums[keep] // counts[keep, None]
    return C


def cluster_assign_int(ds, n_centroids: int = 16, iters: int = 2,
                       id_col: str = "vec_id", emb_col: str = "embedding"):
    """Semantic cluster assignment (the ``cluster_assign`` sibling) with
    every number an int64: one streaming pass after the integer Lloyd
    above. Emits ``(vec_id, cluster, dist)`` — dist is the exact squared
    L2 distance between the quantized vector and its centroid, so the
    whole op (init, both iterations, final assignment) replays in SQL as
    unrolled CTE rounds and gates the iterative path exactly."""
    import ray

    C = kmeans_centroids_int(ds, n_centroids, iters, emb_col, id_col)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        ids = np.asarray(batch[id_col], np.int64)
        q = _quant_matrix(batch[emb_col])
        diff = q[:, None, :] - cc[None, :, :]
        dist = (diff * diff).sum(axis=2)
        a = np.argmin(dist, axis=1)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(a, pa.int64()),
             "dist": pa.array(dist[np.arange(len(ids)), a], pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def md5_planes(dim: int, n_planes: int) -> np.ndarray:
    """Sign-projection planes derived from md5 instead of a numpy RNG so
    SQL can recompute them: plane[i, j] = (md5_number_lower('pl:j:i') &
    0xFFFF) - 32768 — a deterministic signed 16-bit lattice with the same
    role as the Gaussian planes in ``embedding_near_dup``."""
    from .dedup import _md5_lower64

    p = np.empty((dim, n_planes), dtype=np.int64)
    for j in range(n_planes):
        for i in range(dim):
            p[i, j] = (_md5_lower64(f"pl:{j}:{i}") & 0xFFFF) - 32768
    return p


def _int_cosine_pairs(ids: np.ndarray, q: np.ndarray, num: int, den: int):
    """All (a<b) pairs among rows of ``q`` with cos ≥ num/den, decided by
    the exact integer predicate dot>0 ∧ den²·dot² ≥ num²·|a|²·|b|²."""
    _check_bounds(q, den)
    gram = q @ q.T
    norms = np.diag(gram)
    iu, ju = np.triu_indices(len(ids), 1)
    dot = gram[iu, ju]
    keep = (dot > 0) & (den * den * dot * dot
                        >= num * num * norms[iu] * norms[ju])
    ai, bi = ids[iu][keep], ids[ju][keep]
    return np.minimum(ai, bi), np.maximum(ai, bi)


def embedding_near_dup_int(ds, threshold_num: int = 19,
                           threshold_den: int = 20, n_planes: int = 8,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           max_bucket: int = 1000):
    """Embedding-cosine near-dup via sign projection — the integer-exact
    sibling of ``embedding_near_dup``: md5-derived planes, quantized sign
    buckets, within-bucket pairs decided by the float-free cosine
    predicate. Same skew guard (buckets over ``max_bucket`` are dropped);
    emits ``(a, b)``. Every stage — planes, signs, bucket key, guard,
    pair predicate — replays in SQL."""
    from .grouping import grouped_apply

    def bucketize(batch: pa.Table) -> pa.Table:
        q = _quant_matrix(batch[emb_col])
        pl = getattr(bucketize, "planes", None)
        if pl is None or pl.shape[0] != q.shape[1]:
            pl = md5_planes(q.shape[1], n_planes)
            bucketize.planes = pl
        signs = (q @ pl) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {id_col: batch[id_col],
             "bucket": pa.array(keys.astype(np.int64), pa.int64()),
             emb_col: batch[emb_col]})

    def pair_int(gdf):
        import pandas as pd

        n = len(gdf)
        if 2 <= n <= max_bucket:
            ids = gdf[id_col].to_numpy(np.int64)
            q = np.floor(np.array(gdf[emb_col].tolist(), dtype=np.float64)
                         * QUANT_SCALE).astype(np.int64)
            a, b = _int_cosine_pairs(ids, q, threshold_num, threshold_den)
            if len(a):
                return pd.DataFrame({"a": a, "b": b})
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return grouped_apply(bucketed, ["bucket"], pair_int)


def semantic_dedup_int(ds, n_centroids: int = 16, iters: int = 2,
                       threshold_num: int = 19, threshold_den: int = 20,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       max_cluster: int = 100_000,
                       n_parts: int | None = None):
    """SemDeDup with every number an int64 — the SQL-gateable sibling of
    ``dedup.semantic_dedup``: integer k-means cells → within-cell pairs by
    the exact integer cosine predicate → connected components → keep the
    member FARTHEST from its centroid (highest quantized squared-L2 dist;
    the float op's lowest-centroid-cosine diversity election restated on
    the integer metric), ties → min id. Returns one row per vector:
    ``(vec_id, cluster_id, dist, is_rep)``."""
    import ray

    from .grouping import (drop_empty_blocks, grouped_apply,
                           partitioned_apply, resolve_parts)
    from .graph import connected_components

    width = resolve_parts(n_parts)
    C = kmeans_centroids_int(ds, n_centroids, iters, emb_col, id_col)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        ids = np.asarray(batch[id_col], np.int64)
        q = _quant_matrix(batch[emb_col])
        diff = q[:, None, :] - cc[None, :, :]
        dist = (diff * diff).sum(axis=2)
        a = np.argmin(dist, axis=1)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "kcell": pa.array(a, pa.int64()),
            "dist": pa.array(dist[np.arange(len(ids)), a], pa.int64()),
            emb_col: batch[emb_col]})

    # pin once: pair pass and slim/label join both read it (the
    # semantic_dedup block-pinning discipline)
    assigned = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def cell_pairs(gdf):
        import pandas as pd

        n = len(gdf)
        if n > max_cluster:
            import logging

            logging.getLogger("raycrawl.dedup").warning(
                "semantic_dedup_int: cell of %d exceeds max_cluster=%d — "
                "pairs SKIPPED; raise n_centroids or max_cluster",
                n, max_cluster)
        elif n >= 2:
            ids = gdf[id_col].to_numpy(np.int64)
            q = np.floor(np.array(gdf[emb_col].tolist(), dtype=np.float64)
                         * QUANT_SCALE).astype(np.int64)
            a, b = _int_cosine_pairs(ids, q, threshold_num, threshold_den)
            if len(a):
                return pd.DataFrame({"a": a, "b": b})
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    pairs = grouped_apply(assigned.select_columns([id_col, "kcell", emb_col]),
                          ["kcell"], cell_pairs)
    labels = connected_components(pairs, n_parts=n_parts).map_batches(
        lambda b: pa.table({id_col: b["node"].cast(pa.int64()),
                            "label": b["label"].cast(pa.int64())}),
        batch_format="pyarrow")
    labels = drop_empty_blocks(
        labels, empty_schema=pa.schema([(id_col, pa.int64()),
                                        ("label", pa.int64())]))

    slim = assigned.select_columns([id_col, "dist"])
    if labels.count() == 0:
        j = slim
    else:
        j = slim.join(labels, join_type="left_outer", num_partitions=width,
                      on=(id_col,))

    def with_cluster(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], np.int64)
        lab = b["label"].to_pylist() if "label" in b.column_names \
            else [None] * len(ids)
        cl = np.array([l if l is not None else i
                       for l, i in zip(lab, ids.tolist())], np.int64)
        return pa.table({id_col: pa.array(ids), "dist": b["dist"],
                         "cluster_id": pa.array(cl)})

    clustered = j.map_batches(with_cluster, batch_format="pyarrow")

    def elect(pdf):
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 (id_col, "cluster_id", "dist", "is_rep")})
        o = pdf.sort_values(["cluster_id", "dist", id_col],
                            ascending=[True, False, True])
        rep = (o.groupby("cluster_id").head(1)[["cluster_id", id_col]]
               .rename(columns={id_col: "_rep"}))
        out = pdf.merge(rep, on="cluster_id")
        out["is_rep"] = (out[id_col] == out["_rep"]).astype("int64")
        return out[[id_col, "cluster_id", "dist", "is_rep"]]

    return partitioned_apply(clustered, ["cluster_id"], elect, n_parts=width)


# ship this module's code with closures so Ray workers never need to import
# the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
