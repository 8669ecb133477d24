"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline (ray_guide "Aggregation at scale" / SURVEY.md §7.6):
- exact dedup shuffles md5 HASHES (32 bytes/row), never document bodies;
- MinHash-LSH shuffles (band_id, band_key, doc_id) rows — fixed width —
  and candidate verification joins only the shingle sets of candidates;
- SimHash buckets by 16-bit chunks (Hamming ≤3 over 64 bits ⇒ one of the
  4 chunks must match exactly);
- embedding near-dup pre-buckets by sign-random-projection so the pairwise
  cosine only runs within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import hash_str

MERSENNE = (1 << 61) - 1


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hs, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the minimum-id row per identical text (hash-partitioned
    first-wins — SURVEY.md §2.7). Returns (text_hash, doc_id) winners."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col).select([id_col, "text_hash"]),
        batch_format="pyarrow",
    )
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name="keep_id"))


def _shingles(text: str, k: int) -> set[int]:
    """31-bit shingle hashes (fits (a·x+b) in int64 without overflow)."""
    t = text or ""
    if len(t) < k:
        return {hash_str(t) & 0x7FFFFFFF}
    return {hash_str(t[i: i + k]) & 0x7FFFFFFF for i in range(len(t) - k + 1)}


class MinHasher:
    """64-permutation MinHash over k-char shingles (vectorized numpy).
    Stateful stage: permutation coefficients generated once per actor/worker
    from a fixed seed. Coefficients < 2^31 so a·x+b < 2^62 stays exact in
    int64 before the Mersenne mod."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.int64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = np.fromiter(_shingles(text, self.k), dtype=np.int64)
        # (a*x + b) mod p per permutation — vectorized outer product
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.tolist() for s in sigs], pa.list_(pa.int64()))
        )


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 5, id_col: str = "doc_id",
                           sigs_ref=None, est_min: float | None = None,
                           max_bucket: int = 1000):
    """shingle → minhash → band → bucket-groupby: candidate duplicate pairs.

    Returns a Dataset of (a, b) candidate id pairs (a < b), deduplicated.
    With ``sigs_ref`` (broadcast id→signature) and ``est_min``, pairs are
    pruned AT GENERATION by the vectorized signature-agreement estimate, so
    the pair shuffle carries only plausible duplicates — on densely-similar
    corpora this is orders of magnitude smaller. Exact verification is a
    separate stage (``verify_jaccard``)."""
    rows_per_band = num_perm // bands

    hasher = MinHasher(num_perm, shingle_k)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_band, out_key, out_id = [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            sig = hasher.signature(t)
            for b in range(bands):
                chunk = sig[b * rows_per_band: (b + 1) * rows_per_band]
                key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(b)
                out_key.append(key)
                out_id.append(ids[i])
        return pa.table(
            {"band": pa.array(out_band, pa.int32()),
             "bkey": pa.array(out_key, pa.string()),
             "id": pa.array(out_id, pa.int64())}
        )

    def bucket_pairs_partition(pdf):
        import itertools

        import pandas as pd

        sigs = None
        if sigs_ref is not None:
            import ray

            key = sigs_ref.hex() if isinstance(sigs_ref, ray.ObjectRef) else id(sigs_ref)
            sigs = _VERIFY_CACHE.get(("sigs", key))
            if sigs is None:
                sigs = ray.get(sigs_ref) if isinstance(sigs_ref, ray.ObjectRef) else sigs_ref
                _VERIFY_CACHE[("sigs", key)] = sigs
        out_a, out_b = [], []
        for _, g in pdf.groupby(["band", "bkey"], sort=True):
            ids = sorted(set(g["id"].tolist()))
            if len(ids) > max_bucket:
                continue  # degenerate too-common bucket (LSH salting territory)
            if sigs is not None and est_min is not None and len(ids) > 2:
                mat = np.stack([sigs[i] for i in ids])  # (n, perms)
                for xi in range(len(ids)):
                    est = (mat[xi + 1:] == mat[xi]).mean(axis=1)
                    for off in np.nonzero(est >= est_min)[0]:
                        out_a.append(ids[xi])
                        out_b.append(ids[xi + 1 + off])
            else:
                for x, y in itertools.combinations(ids, 2):
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    def dedupe_pairs_partition(pdf):
        g = pdf.groupby(["a", "b"], as_index=False).size()
        return g.rename(columns={"size": "nbands"})

    from .grouping import partitioned_apply

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = partitioned_apply(bands_ds, ["bkey"], bucket_pairs_partition)
    return partitioned_apply(pairs, ["a", "b"], dedupe_pairs_partition)


_VERIFY_CACHE: dict = {}  # per-worker-process (shingle sets, signatures)


def verify_jaccard(pairs_ds, texts_by_id_ref, shingle_k: int = 5,
                   threshold: float = 0.8, sigs_by_id_ref=None,
                   est_margin: float = 0.15):
    """Exact shingle-Jaccard verification of candidate pairs.

    Text lookup is a broadcast ref; shingle sets are built ONCE per worker
    (cached) — never per pair. When minhash signatures are provided, a
    vectorized signature-agreement estimate prunes candidates more than
    ``est_margin`` below the threshold before the exact set ops (the LSH
    candidate set can be orders of magnitude larger than the true pair set
    on densely-similar corpora). At 100 TB the broadcast becomes a
    repartition-by-id join; the verify kernel is unchanged."""
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        key = texts_by_id_ref.hex() if isinstance(texts_by_id_ref, ray.ObjectRef) else id(texts_by_id_ref)
        cached = _VERIFY_CACHE.get(key)
        if cached is None:
            texts = (ray.get(texts_by_id_ref)
                     if isinstance(texts_by_id_ref, ray.ObjectRef) else texts_by_id_ref)
            sets = {i: _shingles(t, shingle_k) for i, t in texts.items()}
            sigs = None
            if sigs_by_id_ref is not None:
                s = (ray.get(sigs_by_id_ref)
                     if isinstance(sigs_by_id_ref, ray.ObjectRef) else sigs_by_id_ref)
                sigs = s
            _VERIFY_CACHE.clear()
            _VERIFY_CACHE[key] = (sets, sigs)
            cached = (sets, sigs)
        sets, sigs = cached
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        if sigs is not None and len(a):
            sa = np.stack([sigs[x] for x in a])
            sb = np.stack([sigs[y] for y in b])
            est = (sa == sb).mean(axis=1)
            keep = est >= max(threshold - est_margin, 0.0)
            a = [x for x, k in zip(a, keep) if k]
            b = [y for y, k in zip(b, keep) if k]
        out_a, out_b, jac = [], [], []
        for x, y in zip(a, b):
            s1, s2 = sets.get(x, set()), sets.get(y, set())
            inter = len(s1 & s2)
            union = len(s1 | s2) or 1
            j = inter / union
            if j >= threshold:
                out_a.append(x)
                out_b.append(y)
                jac.append(j)
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def all_pairs_jaccard(docs_tbl: pa.Table, shingle_k: int = 5,
                      threshold_ppm: int = 500_000, block: int = 512,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Exact k-gram Jaccard over ALL pairs, parallelized as block-pair tasks
    over a broadcast corpus (texts shipped once via ray.put; each task
    shingles only its two blocks). Quadratic by definition — this is the
    small-corpus oracle kernel; the scale path is MinHash+LSH above.
    Jaccard returned in integer ppm (floor) so the DuckDB oracle matches
    bit-exactly. Returns a Dataset of (a, b, jaccard_ppm), a < b."""
    import ray
    import ray.data as rd

    ids = docs_tbl[id_col].to_pylist()
    texts = docs_tbl[text_col].to_pylist()
    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    texts = [texts[i] for i in order]
    corpus_ref = ray.put((ids, texts))
    n = len(ids)
    nb = (n + block - 1) // block
    tasks = [{"bi": bi, "bj": bj} for bi in range(nb) for bj in range(bi, nb)]

    def run_block(batch: pa.Table) -> pa.Table:
        all_ids, all_texts = ray.get(corpus_ref)

        def sets_for(b):
            lo, hi = b * block, min((b + 1) * block, n)
            return lo, [
                {all_texts[i][j: j + shingle_k]
                 for j in range(max(len(all_texts[i]) - shingle_k + 1, 1))}
                for i in range(lo, hi)
            ]

        out_a, out_b, out_j = [], [], []
        for bi, bj in zip(batch["bi"].to_pylist(), batch["bj"].to_pylist()):
            lo_i, si = sets_for(bi)
            lo_j, sj = (lo_i, si) if bj == bi else sets_for(bj)
            for x in range(len(si)):
                y0 = x + 1 if bj == bi else 0
                for y in range(y0, len(sj)):
                    inter = len(si[x] & sj[y])
                    if not inter:
                        continue
                    union = len(si[x] | sj[y])
                    ppm = inter * 1_000_000 // union
                    if ppm >= threshold_ppm:
                        out_a.append(all_ids[lo_i + x])
                        out_b.append(all_ids[lo_j + y])
                        out_j.append(ppm)
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
             "jaccard_ppm": pa.array(out_j, pa.int64())}
        )

    return rd.from_items(tasks).map_batches(run_block, batch_format="pyarrow",
                                            batch_size=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (FNV token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in (text or "").split(" "):
        h = np.uint64(hash_str(w))
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    sh = [simhash64(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {id_col: batch[id_col],
         "simhash": pa.array([s - (1 << 63) if s >= (1 << 63) else s for s in sh],
                             pa.int64())}
    )


def simhash_near_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id"):
    """Near-dup pairs with Hamming(simhash) ≤ k via chunk banding: 64 bits
    in 4 chunks — any pair within distance 3 shares ≥1 exact chunk
    (pigeonhole), so grouping by (chunk_idx, chunk_value) finds all of them
    without an all-pairs scan."""

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids, shs = batch[id_col].to_pylist(), batch["simhash"].to_pylist()
        c_idx, c_val, c_id, c_sh = [], [], [], []
        for i, s in zip(ids, shs):
            u = s + (1 << 63) if s < 0 else s
            for c in range(4):
                c_idx.append(c)
                c_val.append((u >> (16 * c)) & 0xFFFF)
                c_id.append(i)
                c_sh.append(s)
        return pa.table(
            {"chunk": pa.array(c_idx, pa.int32()), "cval": pa.array(c_val, pa.int32()),
             "id": pa.array(c_id, pa.int64()), "sh": pa.array(c_sh, pa.int64())}
        )

    def pairs_partition(pdf):
        import itertools

        import pandas as pd

        out_a, out_b, out_d = [], [], []
        for _, g in pdf.groupby(["chunk", "cval"], sort=True):
            rows = sorted(set(zip(g["id"], g["sh"])))
            for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
                if ia == ib:
                    continue
                d = int(bin((sa ^ sb) & ((1 << 64) - 1)).count("1"))
                if d <= max_hamming:
                    out_a.append(ia)
                    out_b.append(ib)
                    out_d.append(d)
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_d, dtype="int64")}
        )

    def min_hamming_partition(pdf):
        return pdf.groupby(["a", "b"], as_index=False).agg(
            hamming_min=("hamming", "min")
        )

    from .grouping import partitioned_apply

    sh = ds.map_batches(lambda b: simhash_batch(b, id_col), batch_format="pyarrow")
    chunked = sh.map_batches(to_chunks, batch_format="pyarrow")
    cand = partitioned_apply(chunked, ["cval"], pairs_partition)
    return partitioned_apply(cand, ["a", "b"], min_hamming_partition)


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 8,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       seed: int = 11):
    """Embedding-cosine near-dup via sign-random-projection bucketing:
    vectors sharing an LSH bucket get exact pairwise cosine (numpy matmul
    per bucket). Recall is probabilistic per bucket count — the exact
    brute-force kernel lives in ops.similarity for oracle checks."""
    rng = np.random.default_rng(seed)
    planes: np.ndarray | None = None

    def bucketize(batch: pa.Table) -> pa.Table:
        nonlocal planes
        emb = np.array(batch[emb_col].to_pylist(), dtype=np.float64)
        if planes is None:
            p_rng = np.random.default_rng(seed)
            bucketize.planes = p_rng.standard_normal((emb.shape[1], n_planes))
        pl = bucketize.planes
        signs = (emb @ pl) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {id_col: batch[id_col], "bucket": pa.array(keys.tolist(), pa.int64()),
             emb_col: batch[emb_col]}
        )

    def pair_cosine(gdf):
        import itertools

        import pandas as pd

        ids = gdf[id_col].tolist()
        embs = np.array(gdf[emb_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        embs = embs / norms
        sims = embs @ embs.T
        out_a, out_b, out_s = [], [], []
        for i, j in itertools.combinations(range(len(ids)), 2):
            if sims[i, j] >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a)
                out_b.append(b)
                out_s.append(round(float(sims[i, j]), 6))
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64"),
             "cosine": pd.Series(out_s, dtype="float64")}
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(pair_cosine, batch_format="pandas")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
