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


def minhash_signatures(ds, num_perm: int = 64, shingle_k: int = 5,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Distributed signature stage: (id, minhash list<int64>) via map_batches.
    Coefficients are built once per worker from a fixed seed (MinHasher)."""
    hasher = MinHasher(num_perm, shingle_k)

    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = [hasher.signature(t).tolist() for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col],
             "minhash": pa.array(sigs, pa.list_(pa.int64()))}
        )

    return ds.map_batches(sig_batch, batch_format="pyarrow")


_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment (public constant)


def _band_keys(sig_mat: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized per-band bucket keys: fold each band's chunk columns with
    a splitmix64-style mix, all rows at once. Returns (n_rows, bands) int64."""
    n, num_perm = sig_mat.shape
    r = num_perm // bands
    u = sig_mat.astype(np.uint64)
    keys = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            # seed with the band index so buckets never collide across bands
            h = np.full(n, np.uint64(b + 1) * _MIX, dtype=np.uint64)
            for c in range(b * r, (b + 1) * r):
                h = (h ^ u[:, c]) * _MIX
                h ^= h >> np.uint64(29)
            keys[:, b] = h
    return keys.view(np.int64)


def lsh_band_rows(sig_ds, num_perm: int = 64, bands: int = 16,
                  id_col: str = "doc_id"):
    """Explode (id, minhash) into fixed-width (bkey int64, id) band rows —
    the only thing the LSH shuffle carries."""

    def to_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64())})
        sig = np.asarray(batch["minhash"].combine_chunks().flatten(),
                         dtype=np.int64).reshape(n, num_perm)
        keys = _band_keys(sig, bands)  # (n, bands)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table(
            {"bkey": pa.array(keys.reshape(-1), pa.int64()),
             "id": pa.array(np.repeat(ids, bands), pa.int64())}
        )

    return sig_ds.map_batches(to_bands, batch_format="pyarrow")


from .grouping import resolve_parts as _resolve_parts


def lsh_candidate_pairs(bands_ds, max_bucket: int = 1000, n_parts: int = 32):
    """bucket-groupby → unique candidate (a, b) pairs, a < b. Buckets larger
    than ``max_bucket`` are dropped (degenerate too-common key — salting
    territory). Pair rows are 16 bytes, so the pair shuffle stays cheap even
    when candidates ≫ true pairs."""

    def bucket_pairs_partition(pdf):
        import itertools

        import pandas as pd

        out_a, out_b = [], []
        seen = set()
        for _, g in pdf.groupby("bkey", sort=True):
            ids = sorted(set(g["id"].tolist()))
            if len(ids) > max_bucket:
                continue
            for x, y in itertools.combinations(ids, 2):
                if (x, y) not in seen:
                    seen.add((x, y))
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    def unique_pairs_partition(pdf):
        return pdf.drop_duplicates(["a", "b"])

    from .grouping import partitioned_apply

    pairs = partitioned_apply(bands_ds, ["bkey"], bucket_pairs_partition, n_parts)
    return partitioned_apply(pairs, ["a", "b"], unique_pairs_partition, n_parts)


def _melt_pairs(pairs_ds):
    """(a, b) pair rows → two (a, b, role, id) rows each: payload columns
    (signatures, texts) then arrive via ONE hash join against an id-keyed
    side instead of one join per pair column — at 4 joins per query the
    streaming executor's per-join aggregator pools outnumber small-cluster
    CPUs and stall; melt halves the join count AND the shipped payload."""

    def melt(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        n = len(a)
        return pa.table(
            {"a": pa.array(np.repeat(a, 2), pa.int64()),
             "b": pa.array(np.repeat(bb, 2), pa.int64()),
             "role": pa.array(np.tile(np.array([0, 1], np.int8), n), pa.int8()),
             "id": pa.array(np.stack([a, bb], axis=1).reshape(-1), pa.int64())}
        )

    return pairs_ds.map_batches(melt, batch_format="pyarrow")


def _pack_sigs(sig_ds, key: str, payload_as: str, id_col: str):
    """(id, minhash list<int64>) → (key, payload binary): Arrow's hash join
    does not accept list<> payload columns, so signatures travel as packed
    little-endian int64 bytes (fixed 8·num_perm per row)."""

    def pack(b: pa.Table) -> pa.Table:
        n = b.num_rows
        sig = np.asarray(b["minhash"].combine_chunks().flatten(),
                         dtype=np.int64).reshape(n, -1) if n else \
            np.empty((0, 0), np.int64)
        return pa.table(
            {key: b[id_col].cast(pa.int64()),
             payload_as: pa.array([sig[i].tobytes() for i in range(n)],
                                  pa.binary())}
        )

    return sig_ds.map_batches(pack, batch_format="pyarrow")


def signature_est_filter(pairs_ds, sig_ds, threshold: float,
                         est_margin: float = 0.15, id_col: str = "doc_id",
                         n_parts: int = 32):
    """Prune candidate pairs by the vectorized signature-agreement estimate
    before exact verification. Signatures arrive via ONE partitioned hash
    join against the melted pair rows (fixed 8·num_perm bytes per row),
    never a corpus broadcast; pairs are re-assembled by a grouped shuffle on
    (a, b) and compared with a single strided matrix op."""
    import pandas as pd

    joined = _melt_pairs(pairs_ds).join(
        _pack_sigs(sig_ds, "id", "sig", id_col),
        join_type="inner", num_partitions=n_parts, on=("id",),
    )
    est_min = max(threshold - est_margin, 0.0)

    def part_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        if len(pdf) == 0:
            return empty
        pdf = pdf.sort_values(["a", "b", "role"], kind="stable")
        sig = np.frombuffer(b"".join(pdf["sig"].tolist()),
                            dtype=np.int64).reshape(len(pdf), -1)
        keep = (sig[0::2] == sig[1::2]).mean(axis=1) >= est_min
        return pd.DataFrame(
            {"a": pd.Series(pdf["a"].to_numpy()[0::2][keep], dtype="int64"),
             "b": pd.Series(pdf["b"].to_numpy()[0::2][keep], dtype="int64")}
        )

    from .grouping import partitioned_apply

    return partitioned_apply(joined, ["a", "b"], part_fn, n_parts)


def verify_jaccard_join(pairs_ds, docs_ds, shingle_k: int = 5,
                        threshold: float = 0.8, id_col: str = "doc_id",
                        text_col: str = "text", n_parts: int = 32):
    """Exact shingle-Jaccard verification of candidate pairs with the texts
    delivered by ONE partitioned hash join against the melted pair rows —
    the 100-TB-safe replacement for a corpus broadcast. Run after
    ``signature_est_filter`` so only plausible pairs ship text bytes."""
    import pandas as pd

    docs = docs_ds.map_batches(
        lambda b: pa.table({"id": b[id_col].cast(pa.int64()),
                            "txt": b[text_col]}),
        batch_format="pyarrow",
    )
    joined = _melt_pairs(pairs_ds).join(docs, join_type="inner",
                                        num_partitions=n_parts, on=("id",))

    def part_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, jac = [], [], []
        if len(pdf):
            pdf = pdf.sort_values(["a", "b", "role"], kind="stable")
            aa = pdf["a"].to_numpy()[0::2]
            bb = pdf["b"].to_numpy()[0::2]
            txt = pdf["txt"].tolist()
            for x, y, t1, t2 in zip(aa, bb, txt[0::2], txt[1::2]):
                s1, s2 = _shingles(t1, shingle_k), _shingles(t2, shingle_k)
                inter = len(s1 & s2)
                union = len(s1 | s2) or 1
                j = inter / union
                if j >= threshold:
                    out_a.append(int(x))
                    out_b.append(int(y))
                    jac.append(j)
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"),
             "b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(jac, dtype="float64")}
        )

    from .grouping import partitioned_apply

    return partitioned_apply(joined, ["a", "b"], part_fn, n_parts)


def minhash_dedup(ds, threshold: float = 0.5, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 5, id_col: str = "doc_id",
                  text_col: str = "text", est_margin: float = 0.15,
                  max_bucket: int = 1000, n_parts: int | None = None):
    """End-to-end distributed MinHash+LSH near-dup pairs ≥ ``threshold``:

        docs → signatures (map_batches) → band rows (fixed width)
             → bucket groupby → candidate pairs → signature-estimate join
             → exact-Jaccard text join.

    No stage materializes the corpus on the driver or broadcasts it; the
    only O(corpus) exchanges are the band-row shuffle (16 B/row ×
    ``bands``/doc) and the hash joins keyed by id. Returns (a, b, jaccard),
    a < b."""
    n_parts = _resolve_parts(n_parts)
    sig_ds = minhash_signatures(ds, num_perm, shingle_k, id_col, text_col)
    band_rows = lsh_band_rows(sig_ds, num_perm, bands, id_col)
    cands = lsh_candidate_pairs(band_rows, max_bucket, n_parts)
    plausible = signature_est_filter(cands, sig_ds, threshold, est_margin,
                                     id_col, n_parts)
    # barrier between the two join stages: the est-filtered pair set is tiny
    # (16 B/row) and materializing it keeps only one hash join's aggregator
    # pool live at a time — two pipelined joins can outnumber a small
    # cluster's CPUs and stall the streaming executor
    plausible = plausible.materialize()
    return verify_jaccard_join(plausible, ds, shingle_k, threshold, id_col,
                               text_col, n_parts)


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
    """64-bit SimHash over whitespace tokens (single-doc reference kernel;
    the batch path below is the vectorized equivalent — kept in lockstep)."""
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
    """Vectorized SimHash: tokens are deduplicated into a per-batch vocab
    (natural text repeats tokens heavily), each unique token hashed once,
    then all 64 bit-contributions for all docs computed with two matrix ops
    (bit-unpack broadcast + add.reduceat over doc ranges) — no per-token
    numpy ops in the loop. Output is the uint64 simhash reinterpreted as
    two's-complement int64 (Arrow has no uint64-friendly path through
    pandas groupbys)."""
    texts = batch["text"].to_pylist()
    vocab: dict[str, int] = {}
    tok_ix: list[int] = []
    doc_len = []
    for t in texts:
        toks = (t or "").split(" ")
        doc_len.append(len(toks))
        for w in toks:
            ix = vocab.get(w)
            if ix is None:
                ix = len(vocab)
                vocab[w] = ix
            tok_ix.append(ix)
    n = len(texts)
    if n == 0:
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array([], pa.int64())})
    h = np.fromiter((hash_str(w) for w in vocab), dtype=np.uint64,
                    count=len(vocab))
    shifts = np.arange(64, dtype=np.uint64)
    # (vocab, 64) ±1 contribution matrix, one shot
    contrib = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(doc_len[:-1], out=starts[1:])
    acc = np.add.reduceat(contrib[np.asarray(tok_ix, dtype=np.int64)],
                          starts, axis=0)  # (docs, 64)
    vals = ((acc > 0).astype(np.uint64) << shifts).sum(axis=1,
                                                       dtype=np.uint64)
    return pa.table(
        {id_col: batch[id_col],
         "simhash": pa.array(vals.view(np.int64).tolist(), pa.int64())}
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
            u = s + (1 << 64) if s < 0 else s  # undo two's-complement view
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
    def bucketize(batch: pa.Table) -> pa.Table:
        # projection planes derived once per worker from the fixed seed
        # (function-attribute cache survives across batches in a process)
        emb = np.array(batch[emb_col].to_pylist(), dtype=np.float64)
        pl = getattr(bucketize, "planes", None)
        if pl is None:
            p_rng = np.random.default_rng(seed)
            pl = p_rng.standard_normal((emb.shape[1], n_planes))
            bucketize.planes = pl
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
        out_a, out_b, out_s = [], [], []
        if ids:
            embs = np.array(gdf[emb_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            norms[norms == 0] = 1
            embs = embs / norms
            sims = embs @ embs.T
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

    from .grouping import grouped_apply

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    # two-level grouped apply: per-group map_groups overhead × 2^n_planes
    # buckets would dominate; complete buckets land in coarse partitions
    return grouped_apply(bucketed, ["bucket"], pair_cosine)


def plant_neardups(ds, every: int = 50, id_offset: int = 10_000_000,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Deterministically append a scaled copy (cosine exactly 1.0, same LSH
    bucket) of every ``every``-th vector under an offset id. Makes near-dup
    queries non-vacuous on corpora that have no natural ≥0.95 pairs; the
    planted pair set (id, id+offset) is exactly recoverable and asserted in
    tests."""

    def plant(batch: pa.Table) -> pa.Table:
        base = batch.select([id_col, emb_col])
        ids = np.asarray(batch[id_col], np.int64)
        mask = ids % every == 0
        if not mask.any():
            return base
        emb = np.array(batch[emb_col].to_pylist(), np.float64)
        new = pa.table(
            {id_col: pa.array((ids[mask] + id_offset).tolist(), pa.int64()),
             emb_col: pa.array((emb[mask] * 1.1).tolist(),
                               base.schema.field(emb_col).type)}
        )
        return pa.concat_tables([base, new.cast(base.schema)])

    return ds.map_batches(plant, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
