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
    """31-bit shingle hashes (fits (a·x+b) in int64 without overflow).

    ASCII fast path (r4): encode the doc ONCE and crc32 byte slices —
    char offsets == byte offsets when the encoding is length-preserving,
    so the hashes are bit-identical to per-shingle ``hash_str`` at ~3×
    the speed (the per-shingle ``str.encode`` was the whole signature
    stage's hot loop). Non-ASCII docs take the original per-slice path."""
    t = text or ""
    if len(t) < k:
        return {hash_str(t) & 0x7FFFFFFF}
    b = t.encode()
    if len(b) == len(t):
        import zlib

        crc = zlib.crc32
        kb = k << 16
        return {(((crc(b[i: i + k]) ^ kb) * 0x9E3779B97F4A7C15
                  + 0xCBF29CE484222325) & 0xFFFFFFFFFFFFFFFF) & 0x7FFFFFFF
                for i in range(len(b) - k + 1)}
    return {hash_str(t[i: i + k]) & 0x7FFFFFFF for i in range(len(t) - k + 1)}


def _crc32_table() -> np.ndarray:
    """The standard reflected CRC-32 byte table (poly 0xEDB88320) — what
    zlib.crc32 implements; built once, cached on the function object."""
    tab = getattr(_crc32_table, "_tab", None)
    if tab is None:
        tab = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0xEDB88320 if (c & 1) else 0)
            tab[i] = c
        _crc32_table._tab = tab
    return tab


def _shingle_hash_array(text: str, k: int) -> np.ndarray:
    """All window shingle hashes of one doc as an int64 array (duplicates
    KEPT — min-over-windows is unaffected, so MinHash can skip the set).

    ASCII path is fully vectorized: a table-driven CRC-32 over the byte
    array computes every k-byte sliding window in k gather passes (crc =
    (crc>>8) ^ TAB[(crc^byte)&0xFF], init/final 0xFFFFFFFF), then the
    splitmix-style mix runs in wrapping uint64 — bit-identical to
    ``_shingles``'s per-window ``zlib.crc32`` + Python-int mix, without
    the n Python-level calls (~2× the whole signature stage). Non-ASCII
    and short docs fall back to the set path."""
    t = text or ""
    b = t.encode()
    if len(t) < k or len(b) != len(t):
        return np.fromiter(_shingles(t, k), dtype=np.int64)
    a = np.frombuffer(b, dtype=np.uint8)
    n = len(a) - k + 1
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    tab = _crc32_table()
    for j in range(k):
        crc = (crc >> 8) ^ tab[(crc ^ a[j: j + n]) & 0xFF]
    crc ^= np.uint32(0xFFFFFFFF)
    x = crc.astype(np.uint64) ^ np.uint64(k << 16)
    x = (x * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(0xCBF29CE484222325)) & np.uint64(0x7FFFFFFF)
    return x.view(np.int64)


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
        # duplicates in the window array don't move the min, so the
        # vectorized-CRC array path skips set construction entirely
        sh = _shingle_hash_array(text, self.k)
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
    Coefficients are built once per worker from a fixed seed (MinHasher).

    r4 perf note (VERDICT stretch): a packed-offsets reduceat batch kernel
    was measured SLOWER than the per-doc (64 × n_shingles) product — the
    per-doc temporary fits in L2 while the packed (64 × chunk) one
    thrashes cache at any chunk size that amortizes dispatch. The real
    hot loop was the per-window ``zlib.crc32`` call + Python-int mix
    inside ``_shingles``; ``_shingle_hash_array`` now computes every
    sliding window with a table-driven numpy CRC-32 in k gather passes
    (measured 1.8× the signature stage, bit-identical)."""
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

_ID_MIX = np.uint64(2654435761)  # Knuth multiplicative hash (public constant)


def _id_part(ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic id → partition (same function on build and probe side)."""
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) * _ID_MIX) >> np.uint64(16)
                ).astype(np.int64) % n_parts


class PartitionedLookup:
    """Build side of a distributed hash join with node-level caching.

    The (id → payload) Dataset is split into ``n_parts`` hash partitions,
    each materialized as ONE plasma object — built by Ray tasks
    (``num_returns`` fan-out + one merge per partition), never on the
    driver. Probe stages fetch only the partitions their batch references;
    deserialized parts are cached per worker process (bounded — see
    ``get_parts``), and plasma itself caches the serialized object per
    NODE, so at cluster scale a partition crosses the network to a node at
    most once regardless of how many pair rows reference it. This replaces
    both the O(corpus)-per-worker full broadcast (round-1) and the
    O(pairs)-payload hash-join shuffle: payload traffic is O(corpus ×
    nodes-touched), pair traffic stays 16 B/row.

    ``kind='text'``: payload per part is {id: str}.
    ``kind='matrix'``: payload per part is (ids_sorted, ndarray rows) — the
    probe does a vectorized searchsorted instead of per-row dict gets."""

    def __init__(self, ds, id_col: str, val_col: str, n_parts: int = 32,
                 kind: str = "text"):
        import ray

        blocks = ds.materialize().to_arrow_refs()
        split = ray.remote(num_cpus=0.5, num_returns=n_parts)(_lookup_split)
        pieces = [split.remote(b, id_col, val_col, n_parts, kind)
                  for b in blocks]
        if n_parts == 1:  # num_returns=1 yields a bare ref, not a list
            pieces = [[p] for p in pieces]
        merge = ray.remote(num_cpus=0.5)(_lookup_merge)
        self.part_refs = [merge.remote(kind, *[pc[p] for pc in pieces])
                          for p in range(n_parts)]
        self.n_parts = n_parts
        self.kind = kind

    def parts_for(self, ids: np.ndarray) -> np.ndarray:
        return _id_part(ids, self.n_parts)


def _lookup_split(tbl: pa.Table, id_col: str, val_col: str, n_parts: int,
                  kind: str):
    ids = np.asarray(tbl[id_col], dtype=np.int64)
    parts = _id_part(ids, n_parts)
    if kind == "matrix":
        n = tbl.num_rows
        mat = np.asarray(tbl[val_col].combine_chunks().flatten(),
                         dtype=np.int64).reshape(n, -1) if n else \
            np.empty((0, 0), np.int64)
        out = []
        for p in range(n_parts):
            m = parts == p
            out.append((ids[m], mat[m]))
        return out[0] if n_parts == 1 else tuple(out)
    vals = tbl[val_col].to_pylist()
    dicts: list[dict] = [dict() for _ in range(n_parts)]
    for i, p, v in zip(ids.tolist(), parts.tolist(), vals):
        dicts[p][i] = v
    # num_returns=1 treats the return as ONE value, not a fan-out
    return dicts[0] if n_parts == 1 else tuple(dicts)


def _lookup_merge(kind: str, *pieces):
    if kind == "matrix":
        ids = np.concatenate([p[0] for p in pieces])
        mats = [p[1] for p in pieces if len(p[0])]
        mat = np.concatenate(mats) if mats else np.empty((0, 0), np.int64)
        order = np.argsort(ids)
        return ids[order], mat[order]
    merged: dict = {}
    for p in pieces:
        merged.update(p)
    return merged


_PART_CACHE: dict = {}  # per worker process: ref hex → deserialized part
_PART_CACHE_CAP = 64


def get_parts(lookup: PartitionedLookup, part_ids) -> dict:
    """Fetch + cache the needed partitions on this worker. The cap bounds
    worker memory on huge corpora (evict-all is fine: plasma still holds
    the serialized object on-node, refetch is a local deserialize)."""
    import ray

    out = {}
    for p in set(int(x) for x in part_ids):
        ref = lookup.part_refs[p]
        key = ref.hex()
        d = _PART_CACHE.get(key)
        if d is None:
            d = ray.get(ref)
            if len(_PART_CACHE) >= _PART_CACHE_CAP:
                _PART_CACHE.clear()
            _PART_CACHE[key] = d
        out[p] = d
    return out


def _matrix_rows(lookup: PartitionedLookup, ids: np.ndarray) -> np.ndarray:
    """Vectorized gather of matrix-kind payload rows for ``ids``.

    Precondition: every probed id must exist in the lookup's build side; a
    lookup built from a filtered subset would make searchsorted return a
    WRONG row silently (or index past the end) — asserted here rather than
    corrupting the signature-estimate pruning downstream."""
    parts = lookup.parts_for(ids)
    loaded = get_parts(lookup, np.unique(parts))
    first = next(iter(loaded.values()))
    width = first[1].shape[1] if first[1].ndim == 2 else 0
    out = np.empty((len(ids), width), dtype=np.int64)
    for p, (pid, mat) in loaded.items():
        m = parts == p
        idx = np.searchsorted(pid, ids[m])
        if idx.size:
            if idx.max() >= len(pid) or not (pid[idx] == ids[m]).all():
                missing = ids[m][(idx >= len(pid)) | (pid[np.minimum(idx, len(pid) - 1)] != ids[m])]
                raise KeyError(
                    f"PartitionedLookup probe of {missing[:5]}... not in build side"
                )
        out[m] = mat[idx]
    return out


def lsh_candidate_pairs(bands_ds, max_bucket: int = 1000, n_parts: int = 32,
                        sig_lookup: PartitionedLookup | None = None,
                        est_min: float | None = None):
    """bucket-groupby → unique candidate (a, b) pairs, a < b. Buckets larger
    than ``max_bucket`` are dropped (degenerate too-common key — salting
    territory). Pair rows are 16 bytes, so the pair shuffle stays cheap even
    when candidates ≫ true pairs.

    With ``sig_lookup``/``est_min``, pairs are pruned AT GENERATION by the
    vectorized signature-agreement estimate — signatures arrive via the
    partitioned lookup (node-cached plasma parts), so on densely-similar
    corpora the pair shuffle downstream carries only plausible duplicates
    without any per-pair payload movement."""

    def bucket_pairs_partition(pdf):
        import pandas as pd

        sig_of = None
        if sig_lookup is not None and len(pdf):
            uids = np.unique(pdf["id"].to_numpy())
            rows = _matrix_rows(sig_lookup, uids)

            def sig_of(idarr):
                return rows[np.searchsorted(uids, idarr)]

        parts_a, parts_b = [], []
        for _, g in pdf.groupby("bkey", sort=True):
            ids = np.unique(g["id"].to_numpy())
            n = len(ids)
            if n < 2 or n > max_bucket:
                continue
            iu, ju = np.triu_indices(n, 1)  # vectorized C(n,2), a < b
            a_ids, b_ids = ids[iu], ids[ju]
            if sig_of is not None and est_min is not None:
                keep = (sig_of(a_ids) == sig_of(b_ids)).mean(axis=1) >= est_min
                a_ids, b_ids = a_ids[keep], b_ids[keep]
            if len(a_ids):
                parts_a.append(a_ids)
                parts_b.append(b_ids)
        if parts_a:
            df = pd.DataFrame({"a": np.concatenate(parts_a),
                               "b": np.concatenate(parts_b)})
            # in-partition dedup shrinks the pair shuffle before the global
            # (a, b)-keyed unique pass
            return df.drop_duplicates(["a", "b"]).astype("int64")
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    def unique_pairs_partition(pdf):
        return pdf.drop_duplicates(["a", "b"])

    from .grouping import partitioned_apply

    pairs = partitioned_apply(bands_ds, ["bkey"], bucket_pairs_partition, n_parts)
    return partitioned_apply(pairs, ["a", "b"], unique_pairs_partition, n_parts)


def signature_est_filter(pairs_ds, sig_lookup: PartitionedLookup,
                         threshold: float, est_margin: float = 0.15,
                         batch_size: int | None = None,
                         chunk_rows: int = 1 << 18):
    """Prune candidate pairs by the vectorized signature-agreement estimate
    before exact verification. Signatures arrive via the partitioned lookup
    (plasma parts, node-cached) — pairs stream through one map_batches, no
    payload shuffle and no corpus broadcast.

    Batching: ``batch_size=None`` processes whole blocks, so parallelism
    follows the pair partitioning (``lsh_candidate_pairs`` emits
    ``n_parts`` blocks — one task each at EVERY scale). A fixed large
    batch_size is a trap here: at small pair counts it coalesces the whole
    pair set into ONE task and, with est→verify operator fusion,
    serializes the entire tail of the dedup (measured 3.5 s → 16 s at
    sf0.1/32 CPUs with 256 Ki). The per-batch partition-gather
    bookkeeping that a large batch would amortize (mask + searchsorted per
    touched part; 44 s → 0.7 s on a 9.5 M-pair corpus vs 1 Ki batches) is
    instead amortized by ``chunk_rows``-sized INTERNAL slices, which also
    cap the gather transient at 2 × chunk × num_perm int64 ≈ 256 MiB at
    64 perms regardless of block size."""
    est_min = max(threshold - est_margin, 0.0)

    def est_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        a = np.asarray(batch["a"], np.int64)
        b = np.asarray(batch["b"], np.int64)
        kept_a, kept_b = [], []
        for lo in range(0, len(a), chunk_rows):
            ca, cb = a[lo: lo + chunk_rows], b[lo: lo + chunk_rows]
            keep = (_matrix_rows(sig_lookup, ca)
                    == _matrix_rows(sig_lookup, cb)).mean(axis=1) >= est_min
            kept_a.append(ca[keep])
            kept_b.append(cb[keep])
        return pa.table({"a": pa.array(np.concatenate(kept_a), pa.int64()),
                         "b": pa.array(np.concatenate(kept_b), pa.int64())})

    return pairs_ds.map_batches(est_filter, batch_format="pyarrow",
                                batch_size=batch_size)


def verify_jaccard_join(pairs_ds, docs_ds, shingle_k: int = 5,
                        threshold: float = 0.8, id_col: str = "doc_id",
                        text_col: str = "text", n_parts: int = 32,
                        text_lookup: PartitionedLookup | None = None,
                        shingle_fn=None, batch_size: int | None = None,
                        max_cached_docs: int = 65536):
    """Exact shingle-Jaccard verification of candidate pairs. Texts arrive
    via the partitioned hash-lookup (each text partition is one plasma
    object, pulled to a node at most once and cached per worker) — the
    100-TB-safe replacement for both the full-corpus broadcast and a
    per-pair text-payload join shuffle: candidate sets can be orders of
    magnitude larger than the corpus, so payload movement must be
    O(corpus), never O(pairs).

    Batching: ``batch_size=None`` = whole blocks, so task parallelism
    follows the upstream pair partitioning (``n_parts`` blocks at every
    scale) instead of collapsing small pair sets into one fused serial
    task (a fixed 16 Ki batch cost 3.5 s → 16 s at sf0.1/32 CPUs: the
    Python shingling loop ran on one core). Shingle sets are built once
    per doc per BLOCK and cached sorted (~16 KiB each); the cache is
    dropped once it holds ``max_cached_docs`` (~1 GiB) so arbitrarily
    large blocks can't pin worker heap."""
    lookup = text_lookup or PartitionedLookup(docs_ds, id_col, text_col,
                                              n_parts, kind="text")
    shingle_fn = shingle_fn or _shingles

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, jac = [], [], []
        if batch.num_rows:
            a = np.asarray(batch["a"], np.int64)
            b = np.asarray(batch["b"], np.int64)
            pa_parts = lookup.parts_for(a)
            pb_parts = lookup.parts_for(b)
            loaded = get_parts(lookup, np.unique(
                np.concatenate([pa_parts, pb_parts])))
            # sorted int64 shingle arrays, one per doc per batch: the
            # per-pair intersection is then a vectorized searchsorted
            # membership count (~8× the Python set & | ops — at corpora
            # where the est-prune passes most candidates, this loop IS
            # the dedup's CPU bill)
            arrs: dict[int, np.ndarray] = {}

            def sh(i, p):
                s = arrs.get(i)
                if s is None:
                    if len(arrs) >= max_cached_docs:
                        arrs.clear()
                    raw = shingle_fn(loaded[p].get(i, ""), shingle_k)
                    s = np.fromiter(raw, dtype=np.int64, count=len(raw))
                    s.sort()
                    arrs[i] = s
                return s

            for x, y, px, py in zip(a.tolist(), b.tolist(),
                                    pa_parts.tolist(), pb_parts.tolist()):
                s1, s2 = sh(x, px), sh(y, py)
                if len(s1) > len(s2):
                    s1, s2 = s2, s1
                # size-ratio prefilter (r5): J = |∩|/|∪| ≤ min/max, so a
                # pair whose size ratio is already below the threshold
                # can skip the intersection outright. DIVISION form, not
                # `len(s1) < threshold*len(s2)`: the final keep test is
                # `inter/union >= threshold` in float, and for the
                # boundary subset case (inter=|s1|, union=|s2|) the
                # prefilter must evaluate the exact same correctly-
                # rounded quotient — the product form's rounding dropped
                # J == threshold pairs (e.g. τ=0.55, 55/100). Lossless:
                # rounding is monotone, so J_real ≤ ratio_real implies
                # fl(J) ≤ fl(ratio) < threshold for every skipped pair.
                if len(s1) / len(s2) < threshold:
                    continue
                idx = np.searchsorted(s2, s1)
                idx[idx == len(s2)] = len(s2) - 1
                inter = int((s2[idx] == s1).sum())
                union = len(s1) + len(s2) - inter or 1
                j = inter / union
                if j >= threshold:
                    out_a.append(x)
                    out_b.append(y)
                    jac.append(j)
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    return pairs_ds.map_batches(verify, batch_format="pyarrow",
                                batch_size=batch_size)


def _md5_shingles(text: str, k: int) -> set[int]:
    """31-bit md5 shingle hashes — the SQL-replayable sibling of
    ``_shingles`` (``md5_number_lower(g) & 0x7FFFFFFF`` in DuckDB). Same
    set semantics: hash collisions collapse, short docs hash whole-text."""
    t = text or ""
    if len(t) < k:
        return {_md5_lower64(t) & 0x7FFFFFFF}
    return {_md5_lower64(t[i: i + k]) & 0x7FFFFFFF
            for i in range(len(t) - k + 1)}


def minhash_signatures_md5_packed(ds, num_perm: int = 16, shingle_k: int = 5,
                                  seed: int = 7, id_col: str = "doc_id",
                                  text_col: str = "text"):
    """The md5 signature kernel (``_md5_doc_sigs``, bit-identical to the
    exploded ``minhash_signatures_md5`` the ``minhash_sig`` oracle gates)
    in the PACKED ``(id, minhash list<int64>)`` layout ``lsh_band_rows`` /
    ``PartitionedLookup(kind="matrix")`` consume — the signature stage of
    the SQL-replayable ``minhash_dedup(md5_kernel=True)`` path."""
    a, b = minhash_coeffs(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = [_md5_doc_sigs(t or "", a, b, shingle_k).tolist()
                for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col].cast(pa.int64()),
             "minhash": pa.array(sigs, pa.list_(pa.int64()))})

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def minhash_dedup(ds, threshold: float = 0.5, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 5, id_col: str = "doc_id",
                  text_col: str = "text", est_margin: float = 0.15,
                  max_bucket: int = 1000, n_parts: int | None = None,
                  md5_kernel: bool = False):
    """End-to-end distributed MinHash+LSH near-dup pairs ≥ ``threshold``:

        docs → signatures (map_batches) → band rows (fixed width)
             → bucket groupby → candidate pairs, est-pruned at generation
             → exact-Jaccard verify via partitioned text lookup.

    No stage materializes the corpus on the driver or broadcasts it whole;
    signatures and texts move as hash-partitioned plasma objects pulled to
    a node at most once (PartitionedLookup), pair rows are 16 B, and the
    band-row shuffle is fixed-width. Payload traffic is O(corpus), never
    O(pairs). Returns (a, b, jaccard), a < b.

    ``md5_kernel=True`` swaps the crc32 shingle/signature kernel for the
    md5 one (``minhash_signatures_md5_packed`` + ``_md5_shingles``) whose
    every stage a DuckDB oracle can replay (``md5_number_lower`` exists in
    SQL; crc32 does not) — same pipeline shape, same shuffles; candidacy
    restated in SQL as per-band signature-chunk equality (exact up to
    splitmix64 band-key collisions, ~2^-64). crc32 stays the throughput
    default (C-speed hash)."""
    n_parts = _resolve_parts(n_parts)
    if md5_kernel:
        sig_ds = minhash_signatures_md5_packed(
            ds, num_perm, shingle_k, id_col=id_col,
            text_col=text_col).materialize()
    else:
        sig_ds = minhash_signatures(ds, num_perm, shingle_k, id_col,
                                    text_col).materialize()
    sig_lookup = PartitionedLookup(sig_ds, id_col, "minhash", n_parts,
                                   kind="matrix")
    band_rows = lsh_band_rows(sig_ds, num_perm, bands, id_col)
    # Estimate-prune AFTER the global unique pass, not at generation: the
    # same pair surfaces in up to ``bands`` buckets, and the 64-wide
    # signature gather is the expensive step — running it on raw pair
    # copies cost ~4.5× the unique-pair work (13 s → ~2 s at sf0.1) while
    # the pair rows the unique shuffle moves are only 16 B each.
    cands = lsh_candidate_pairs(band_rows, max_bucket, n_parts)
    cands = signature_est_filter(cands, sig_lookup, threshold, est_margin)
    text_lookup = PartitionedLookup(ds, id_col, text_col, n_parts,
                                    kind="text")
    return verify_jaccard_join(cands, ds, shingle_k, threshold, id_col,
                               text_col, n_parts, text_lookup=text_lookup,
                               shingle_fn=_md5_shingles if md5_kernel
                               else None)


def _block_pair_scan(docs_tbl: pa.Table, shingle_k: int, block: int,
                     id_col: str, text_col: str, emit_pair, out_cols):
    """Shared quadratic block-pair kernel for the exact shingle-set pair
    ops (``all_pairs_jaccard``, ``containment_pairs``): corpus broadcast
    once via ``ray.put``, one task per block pair, shingle sets built per
    block, and ``emit_pair(a_id, b_id, inter, set_a, set_b, out)`` called
    for every candidate pair with a non-empty intersection (a < b block
    order; out = dict of column lists named by ``out_cols``). Null texts
    are treated as empty strings (the shipped corpora have none)."""
    import ray
    import ray.data as rd

    ids = docs_tbl[id_col].to_pylist()
    texts = [(t or "") for t in docs_tbl[text_col].to_pylist()]
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

        out = {c: [] for c, _ in out_cols}
        for bi, bj in zip(batch["bi"].to_pylist(), batch["bj"].to_pylist()):
            lo_i, si = sets_for(bi)
            lo_j, sj = (lo_i, si) if bj == bi else sets_for(bj)
            for x in range(len(si)):
                y0 = x + 1 if bj == bi else 0
                for y in range(y0, len(sj)):
                    inter = len(si[x] & sj[y])
                    if inter:
                        emit_pair(all_ids[lo_i + x], all_ids[lo_j + y],
                                  inter, si[x], sj[y], out)
        return pa.table({c: pa.array(out[c], t) for c, t in out_cols})

    return rd.from_items(tasks).map_batches(run_block, batch_format="pyarrow",
                                            batch_size=1)


def all_pairs_jaccard(docs_tbl: pa.Table, shingle_k: int = 5,
                      threshold_ppm: int = 500_000, block: int = 512,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Exact k-gram Jaccard over ALL pairs, parallelized as block-pair tasks
    over a broadcast corpus (texts shipped once via ray.put; each task
    shingles only its two blocks). Quadratic by definition — this is the
    small-corpus oracle kernel; the scale path is MinHash+LSH above.
    Jaccard returned in integer ppm (floor) so the DuckDB oracle matches
    bit-exactly. Returns a Dataset of (a, b, jaccard_ppm), a < b."""
    def emit(a_id, b_id, inter, sa, sb, out):
        ppm = inter * 1_000_000 // (len(sa) + len(sb) - inter)
        if ppm >= threshold_ppm:
            out["a"].append(a_id)
            out["b"].append(b_id)
            out["jaccard_ppm"].append(ppm)

    return _block_pair_scan(docs_tbl, shingle_k, block, id_col, text_col,
                            emit, [("a", pa.int64()), ("b", pa.int64()),
                                   ("jaccard_ppm", pa.int64())])


def containment_pairs(docs_tbl: pa.Table, shingle_k: int = 5,
                      threshold_ppm: int = 800_000, block: int = 512,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Exact k-gram CONTAINMENT over all ordered pairs — the asymmetric
    sibling of ``all_pairs_jaccard``: C(src→dst) = |S_src ∩ S_dst| / |S_src|
    (Broder 1997's containment). Jaccard misses quotes and partial
    inclusions — a tweet embedded in a news article scores near-zero
    Jaccard but containment 1.0 — so this is the kernel for
    quote/excerpt/syndication detection in a training corpus, where the
    CONTAINED doc is the redundant one. Emits one row per direction that
    clears the threshold: ``(src, dst, containment_ppm)``, src ≠ dst,
    ppm = |∩|·10⁶ // |S_src| (floor — the DuckDB oracle matches
    bit-exactly).

    Same block-pair-task kernel as ``all_pairs_jaccard`` (shared
    ``_block_pair_scan``; quadratic by definition — the small-corpus
    oracle kernel; the scale path reuses the MinHash/LSH candidate
    machinery with the per-doc shingle-size join replacing the union
    denominator)."""
    def emit(a_id, b_id, inter, sa, sb, out):
        for s_id, d_id, s_set in ((a_id, b_id, sa), (b_id, a_id, sb)):
            ppm = inter * 1_000_000 // len(s_set)
            if ppm >= threshold_ppm:
                out["src"].append(s_id)
                out["dst"].append(d_id)
                out["containment_ppm"].append(ppm)

    return _block_pair_scan(docs_tbl, shingle_k, block, id_col, text_col,
                            emit, [("src", pa.int64()), ("dst", pa.int64()),
                                   ("containment_ppm", pa.int64())])


def containment_pairs_scaled(ds, shingle_k: int = 5,
                             threshold_ppm: int = 800_000,
                             max_df: int = 1000, id_col: str = "doc_id",
                             text_col: str = "text",
                             n_parts: int | None = None):
    """The SCALE path for ``containment_pairs`` (r4, VERDICT #4): fully
    distributed quote/excerpt/syndication detection, no block-pair scan.

    Jaccard-biased LSH bands cannot find containment (a tweet inside an
    article has near-zero Jaccard), so candidates come from an INVERTED
    INDEX instead (the PPJoin-family discipline): one fixed-width
    ``(shingle_hash, id)`` row per DISTINCT doc shingle → shingle-keyed
    task hash shuffle → every pair sharing a bucket. Buckets hotter than
    ``max_df`` are dropped from candidate generation (a stopword-gram
    would otherwise make one partition O(df²) — salting territory), and
    every surviving candidate is then EXACTLY verified: shingle sets
    rebuilt from the ``PartitionedLookup`` text tier (hash-partitioned
    plasma, node-cached — payload traffic O(corpus), never O(pairs)) and
    both directions' ppm computed from the true intersection. The df cap
    therefore can only LOSE pairs whose every shared shingle is hot —
    never emit a wrong ppm; with no hot buckets the output equals the
    quadratic oracle kernel exactly (pinned in tests + the
    ``dedup_containment_lsh`` oracle)."""
    n_parts = _resolve_parts(n_parts)

    def explode(batch: pa.Table) -> pa.Table:
        xs, ids = [], []
        for d, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            sh = _shingles(t or "", shingle_k)
            xs.extend(sh)
            ids.extend([d] * len(sh))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "id": pa.array(ids, pa.int64())})

    def bucket_pairs(pdf):
        import pandas as pd

        parts_a, parts_b = [], []
        for _, g in pdf.groupby("x", sort=True):
            ids = np.unique(g["id"].to_numpy())
            n = len(ids)
            if n < 2 or n > max_df:
                continue  # hot shingle — see docstring
            iu, ju = np.triu_indices(n, 1)
            parts_a.append(ids[iu])
            parts_b.append(ids[ju])
        if parts_a:
            return pd.DataFrame({"a": np.concatenate(parts_a),
                                 "b": np.concatenate(parts_b)}
                                ).drop_duplicates(["a", "b"])
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    from .grouping import partitioned_apply

    ex = ds.map_batches(explode, batch_format="pyarrow")
    cands = partitioned_apply(ex, ["x"], bucket_pairs, n_parts)
    uniq = partitioned_apply(
        cands, ["a", "b"], lambda pdf: pdf.drop_duplicates(["a", "b"]),
        n_parts)

    lookup = PartitionedLookup(ds, id_col, text_col, n_parts, kind="text")

    def verify(batch: pa.Table) -> pa.Table:
        out = {"src": [], "dst": [], "containment_ppm": []}
        if batch.num_rows:
            a = np.asarray(batch["a"], np.int64)
            b = np.asarray(batch["b"], np.int64)
            pa_parts = lookup.parts_for(a)
            pb_parts = lookup.parts_for(b)
            loaded = get_parts(lookup, np.unique(
                np.concatenate([pa_parts, pb_parts])))
            arrs: dict[int, np.ndarray] = {}

            def sh(i, p):
                s = arrs.get(i)
                if s is None:
                    raw = _shingles(loaded[p].get(i, ""), shingle_k)
                    s = np.fromiter(raw, dtype=np.int64, count=len(raw))
                    s.sort()
                    arrs[i] = s
                return s

            for x, y, px, py in zip(a.tolist(), b.tolist(),
                                    pa_parts.tolist(), pb_parts.tolist()):
                s1, s2 = sh(x, px), sh(y, py)
                small, big = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
                idx = np.searchsorted(big, small)
                idx[idx == len(big)] = len(big) - 1
                inter = int((big[idx] == small).sum())
                for s_id, s_set in ((x, s1), (y, s2)):
                    ppm = inter * 1_000_000 // len(s_set)
                    if ppm >= threshold_ppm:
                        out["src"].append(s_id)
                        out["dst"].append(y if s_id == x else x)
                        out["containment_ppm"].append(ppm)
        return pa.table(
            {"src": pa.array(out["src"], pa.int64()),
             "dst": pa.array(out["dst"], pa.int64()),
             "containment_ppm": pa.array(out["containment_ppm"], pa.int64())})

    return uniq.map_batches(verify, batch_format="pyarrow")


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


def simhash_near_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                           max_bucket: int = 1000, md5_kernel: bool = False):
    """Near-dup pairs with Hamming(simhash) ≤ k via chunk banding: 64 bits
    in 4 chunks — any pair within distance 3 shares ≥1 exact chunk
    (pigeonhole), so grouping by (chunk_idx, chunk_value) finds all of them
    without an all-pairs scan.

    Chunk buckets larger than ``max_bucket`` are DROPPED, mirroring
    ``lsh_candidate_pairs``: a hot 16-bit chunk value (corpora of short
    near-identical docs) would otherwise make one partition O(n²); such a
    degenerate key needs salting + exact verify, not a blind pair
    explosion. The Hamming check is vectorized (XOR + unpackbits popcount
    over the bucket's pair matrix) — no Python pair loop.

    ``md5_kernel=True`` swaps the crc32 token hash for md5
    (``simhash_chunks_md5``, the kernel the green ``simhash_sig`` oracle
    replays bit-for-bit) so the WHOLE pair pipeline — chunk bucketing,
    bucket guard, Hamming verify — is DuckDB-expressible; same shuffles,
    crc32 stays the throughput default."""

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
        import pandas as pd

        parts_a, parts_b, parts_d = [], [], []
        for _, g in pdf.groupby(["chunk", "cval"], sort=True):
            uniq = g.drop_duplicates("id").sort_values("id")
            n = len(uniq)
            if n < 2 or n > max_bucket:
                continue  # degenerate hot chunk value — see docstring
            ids = uniq["id"].to_numpy(np.int64)
            sh = uniq["sh"].to_numpy(np.int64).view(np.uint64)
            iu, ju = np.triu_indices(n, 1)
            x = sh[iu] ^ sh[ju]
            d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
                axis=1, dtype=np.int64)
            keep = d <= max_hamming
            if keep.any():
                parts_a.append(ids[iu][keep])
                parts_b.append(ids[ju][keep])
                parts_d.append(d[keep])
        if parts_a:
            return pd.DataFrame({"a": np.concatenate(parts_a),
                                 "b": np.concatenate(parts_b),
                                 "hamming": np.concatenate(parts_d)})
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )

    def min_hamming_partition(pdf):
        return pdf.groupby(["a", "b"], as_index=False).agg(
            hamming_min=("hamming", "min")
        )

    from .grouping import partitioned_apply

    if md5_kernel:
        def pack(batch: pa.Table) -> pa.Table:
            cs = [np.asarray(batch[f"c{i}"], np.uint64) for i in range(4)]
            u = (cs[0] | (cs[1] << np.uint64(16)) | (cs[2] << np.uint64(32))
                 | (cs[3] << np.uint64(48)))
            return pa.table({id_col: batch[id_col],
                             "simhash": pa.array(u.view(np.int64),
                                                 pa.int64())})

        sh = simhash_chunks_md5(ds, id_col).map_batches(
            pack, batch_format="pyarrow")
    else:
        sh = ds.map_batches(lambda b: simhash_batch(b, id_col),
                            batch_format="pyarrow")
    chunked = sh.map_batches(to_chunks, batch_format="pyarrow")
    cand = partitioned_apply(chunked, ["cval"], pairs_partition)
    return partitioned_apply(cand, ["a", "b"], min_hamming_partition)


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 8,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       seed: int = 11, max_bucket: int = 1000):
    """Embedding-cosine near-dup via sign-random-projection bucketing:
    vectors sharing an LSH bucket get exact pairwise cosine (numpy matmul
    per bucket). Recall is probabilistic per bucket count — the exact
    brute-force kernel lives in ops.similarity for oracle checks.

    Buckets larger than ``max_bucket`` are DROPPED (same skew guard as
    ``lsh_candidate_pairs``): one dense bucket — e.g. a mass-duplicated
    vector — would otherwise cost O(n²) time AND memory in a single
    partition. Pair extraction from the sims matrix is a vectorized
    ``triu_indices`` mask, not a Python combinations loop."""
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
        import pandas as pd

        n = len(gdf)
        if 2 <= n <= max_bucket:
            ids = gdf[id_col].to_numpy(np.int64)
            embs = np.array(gdf[emb_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            norms[norms == 0] = 1
            embs = embs / norms
            sims = embs @ embs.T
            iu, ju = np.triu_indices(n, 1)
            keep = sims[iu, ju] >= threshold
            if keep.any():
                ai, bi = ids[iu][keep], ids[ju][keep]
                return pd.DataFrame(
                    {"a": np.minimum(ai, bi), "b": np.maximum(ai, bi),
                     "cosine": np.round(sims[iu, ju][keep], 6)}
                )
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )

    from .grouping import grouped_apply

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    # two-level grouped apply: per-group map_groups overhead × 2^n_planes
    # buckets would dominate; complete buckets land in coarse partitions
    return grouped_apply(bucketed, ["bucket"], pair_cosine)


def semantic_dedup(ds, n_centroids: int = 16, iters: int = 2,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   emb_col: str = "embedding", max_cluster: int = 100_000,
                   n_parts: int | None = None):
    """SemDeDup (Abbas et al. 2023): semantic near-dup removal over an
    embedding column — k-means partitions the space, exact pairwise
    cosine runs ONLY within each cluster (the paper's trick: O(Σ n_c²)
    instead of O(n²)), pairs ≥ ``threshold`` connect into components, and
    each component keeps the member with the LOWEST cosine to its k-means
    centroid (ties → min id) — the paper's diversity-preserving choice
    (the most typical member is the most redundant). Singletons represent
    themselves.

    Returns one row per vector: ``(vec_id, cluster_id, sim_ppm, is_rep)``
    — cluster_id = near-dup component id (min member id), sim_ppm = the
    ×1e6-floored centroid cosine, is_rep ∈ {0, 1}.

    Scale shape: centroids train in the streaming distributed Lloyd pass
    (``similarity.kmeans_centroids``) and broadcast once; the per-cluster
    pair pass is a cluster-keyed task exchange with a ``max_cluster``
    skew guard (an over-dense cell is dropped, same discipline as
    ``lsh_candidate_pairs`` — at scale raise ``n_centroids`` so cells
    shrink); components move int64 edges; the election joins only
    ``(id, sim_ppm)`` rows — embeddings never cross the exchange after
    the pair pass."""
    import ray

    from .grouping import (drop_empty_blocks, grouped_apply,
                           partitioned_apply, resolve_parts)
    from .graph import connected_components
    from .similarity import _emb_matrix, _normalize, kmeans_centroids

    width = resolve_parts(n_parts)
    C = kmeans_centroids(ds, n_centroids, iters, emb_col, id_col=id_col)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        ids = np.asarray(batch[id_col], np.int64)
        emb = _normalize(_emb_matrix(batch[emb_col]))
        sims = emb @ cc.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(ids)), a]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "kcell": pa.array(a, pa.int64()),
            "sim_ppm": pa.array(np.floor(best * 1e6).astype(np.int64),
                                pa.int64()),
            emb_col: batch[emb_col],
        })

    # pin the assignment once: both the pair pass and the slim/label join
    # read it — without this the read+plant+assign matmul lineage would
    # execute twice (the compact_epochs block-pinning discipline)
    assigned = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def cell_pairs(gdf):
        import pandas as pd

        n = len(gdf)
        if n > max_cluster:
            # no-silent-caps discipline: an over-dense cell means every
            # member survives as its own singleton with NO near-dup
            # coverage — surface it so callers raise n_centroids
            import logging

            logging.getLogger("raycrawl.dedup").warning(
                "semantic_dedup: k-means cell of %d members exceeds "
                "max_cluster=%d — its pairs are SKIPPED (members all kept "
                "as singletons); raise n_centroids or max_cluster", n,
                max_cluster)
        elif n >= 2:
            ids = gdf[id_col].to_numpy(np.int64)
            embs = np.array(gdf[emb_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            norms[norms == 0] = 1
            embs = embs / norms
            sims = embs @ embs.T
            iu, ju = np.triu_indices(n, 1)
            keep = sims[iu, ju] >= threshold
            if keep.any():
                ai, bi = ids[iu][keep], ids[ju][keep]
                return pd.DataFrame({"a": np.minimum(ai, bi),
                                     "b": np.maximum(ai, bi)})
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

    slim = assigned.select_columns([id_col, "sim_ppm"])
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
        return pa.table({id_col: pa.array(ids), "sim_ppm": b["sim_ppm"],
                         "cluster_id": pa.array(cl)})

    clustered = j.map_batches(with_cluster, batch_format="pyarrow")

    def elect(pdf):
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 (id_col, "cluster_id", "sim_ppm",
                                  "is_rep")})
        o = pdf.sort_values(["cluster_id", "sim_ppm", id_col],
                            ascending=[True, True, True])
        rep = (o.groupby("cluster_id").head(1)[["cluster_id", id_col]]
               .rename(columns={id_col: "_rep"}))
        out = pdf.merge(rep, on="cluster_id")
        out["is_rep"] = (out[id_col] == out["_rep"]).astype("int64")
        return out[[id_col, "cluster_id", "sim_ppm", "is_rep"]]

    return partitioned_apply(clustered, ["cluster_id"], elect, n_parts=width)


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


def paragraph_first_dedup(ds, *, id_col: str = "doc_id",
                          text_col: str = "text", sep: str = "\n\n",
                          max_paras: int = 64, n_parts: int | None = None):
    """Paragraph-level FIRST-OCCURRENCE dedup (RefinedWeb/Falcon-style):
    across the whole corpus, each distinct paragraph survives only in the
    earliest position it appears — ``min(doc_id, para_idx)`` — and every
    later copy is stripped, preserving each document's remaining paragraph
    order. Contrast ``textstats.repeated_chunk_removal``, which drops ALL
    occurrences of hot chunks; this keeps exactly one.

    Shuffle discipline: the winner election moves only
    ``(md5(para), packed)`` rows where ``packed = doc_id·max_paras + idx``
    (so ``Min(packed)`` IS lexicographic (doc_id, idx) order — one int64
    carries the whole tie-break); the winner set folds to one
    ``keep_mask`` bitmask row per doc; document text crosses exactly one
    partitioned hash join for the rebuild.

    Returns ``(doc_id, n_paras, n_kept, keep_mask, kept_text)`` — one row
    per input doc (docs that lose every paragraph keep mask 0, empty
    text)."""
    import hashlib

    from ray.data.aggregate import Min, Sum

    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)

    def explode(batch: pa.Table) -> pa.Table:
        hs, packed = [], []
        for d, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            paras = (t or "").split(sep)
            if len(paras) > max_paras:
                raise ValueError(
                    f"paragraph_first_dedup: doc {d} has {len(paras)} "
                    f"paragraphs > max_paras={max_paras}; raise max_paras "
                    "(packed ids and keep_mask must stay in int64)")
            for i, ptxt in enumerate(paras):
                hs.append(hashlib.md5(ptxt.encode()).hexdigest())
                packed.append(d * max_paras + i)
        return pa.table({"h": pa.array(hs, pa.string()),
                         "packed": pa.array(packed, pa.int64())})

    winners = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby("h").aggregate(Min("packed", alias_name="w")))

    def to_mask_partial(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["w"], np.int64)
        return pa.table({
            id_col: pa.array(w // max_paras, pa.int64()),
            "bit": pa.array(
                np.left_shift(np.int64(1), w % max_paras), pa.int64()),
        })

    masks = drop_empty_blocks(
        (winners.map_batches(to_mask_partial, batch_format="pyarrow")
         .groupby(id_col).aggregate(Sum("bit", alias_name="keep_mask"))),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("keep_mask", pa.int64())]))

    j = ds.join(masks, join_type="left_outer", num_partitions=width,
                on=(id_col,))

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        mask_col = batch["keep_mask"].to_pylist()
        n_paras, n_kept, kept = [], [], []
        for t, m in zip(texts, mask_col):
            paras = (t or "").split(sep)
            m = m or 0
            keep = [p for i, p in enumerate(paras) if m >> i & 1]
            n_paras.append(len(paras))
            n_kept.append(len(keep))
            kept.append(sep.join(keep))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_paras": pa.array(n_paras, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "keep_mask": pa.array([m or 0 for m in mask_col], pa.int64()),
            "kept_text": pa.array(kept, pa.string()),
        })

    return j.map_batches(rebuild, batch_format="pyarrow")


def minhash_coeffs(num_perm: int = 16, seed: int = 7):
    """The (a, b) permutation coefficients shared by the md5 MinHash
    sibling and its SQL oracle (which inlines them as literals). Same
    generator discipline as MinHasher: a, b < 2^31 so a·x+b < 2^62 stays
    exact in int64 before the Mersenne mod."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.int64)
    return a, b


def _md5_lower64(s: str) -> int:
    """Lower 8 digest bytes of md5, little-endian — bit-identical to
    DuckDB's ``md5_number_lower`` scalar."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def minhash_signatures_md5(ds, num_perm: int = 16, shingle_k: int = 5,
                           seed: int = 7, id_col: str = "doc_id",
                           text_col: str = "text"):
    """SQL-replayable MinHash signature kernel: the exactly-gated sibling
    of ``minhash_signatures`` (whose crc32 shingle hash SQL cannot
    express). Shingle hash = ``md5_number_lower(shingle) & 0x7FFFFFFF``
    (31-bit, so a·x+b fits int64), signature per permutation =
    ``min((a·x + b) mod (2^61-1))`` over the doc's DISTINCT shingles —
    set semantics, matching ``_shingles``. Docs shorter than ``shingle_k``
    (incl. empty text) hash the whole text as their single shingle.

    Output is EXPLODED ``(doc_id, perm, sig)`` rows so a DuckDB oracle can
    compare every signature cell. Stateless map_batches — the md5-per-
    shingle Python loop makes this the verification kernel; the crc32
    ``MinHasher`` stays the throughput path (same math, C-speed hash)."""
    a, b = minhash_coeffs(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        out_id, out_p, out_s = [], [], []
        perms = np.arange(num_perm, dtype=np.int64)
        for d, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            sig = _md5_doc_sigs(t or "", a, b, shingle_k)
            out_id.extend([d] * num_perm)
            out_p.extend(perms.tolist())
            out_s.extend(sig.tolist())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "perm": pa.array(out_p, pa.int64()),
                         "sig": pa.array(out_s, pa.int64())})

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def _md5_doc_sigs(t: str, a: np.ndarray, b: np.ndarray,
                  shingle_k: int) -> np.ndarray:
    """One doc's md5 MinHash signature vector (the per-doc core of
    ``minhash_signatures_md5``, shared with ``minhash_refresh``)."""
    if len(t) < shingle_k:
        grams = {t}
    else:
        grams = {t[i: i + shingle_k]
                 for i in range(len(t) - shingle_k + 1)}
    xs = np.fromiter({_md5_lower64(g) & 0x7FFFFFFF for g in grams},
                     dtype=np.int64)
    return ((xs[None, :] * a[:, None] + b[:, None]) % MERSENNE).min(axis=1)


def minhash_refresh(current_ds, prev_ds, num_perm: int = 16,
                    shingle_k: int = 5, seed: int = 7,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_parts: int | None = None):
    """Incremental MinHash signature maintenance for a recrawl epoch:
    documents whose text is UNCHANGED vs the previous epoch REUSE their
    stored signature vector (the shingle/md5 kernel is bypassed); only
    modified/new docs resign. The dedup-index sibling of
    ``embeddings.embed_refresh`` — at 100 TB a recrawl touches a few
    percent, so signature maintenance is sign-the-diff, never
    resign-everything (with ``index.postings_merge`` and
    ``recrawl.epoch_diff`` this completes the incremental-maintenance
    family).

    ``prev_ds``: one row per previously-signed doc —
    ``(id_col, prev_hash md5-hex of the previous text, prev_sigs
    fixed_size_binary(num_perm·8, little-endian int64 cells))``; binary
    packing because Acero joins reject list payloads (the embed_refresh
    discipline). The current epoch's text crosses ONE partitioned hash
    join; the per-row decision (md5 match → unpack, else recompute) runs
    in-block.

    Returns EXPLODED ``(doc_id, perm, sig, reused)`` rows (reused ∈
    {0, 1}) so an oracle can gate every signature cell AND the reuse
    decision — reuse is observable when the stored signatures carry a
    marker a recompute would lose."""
    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
    a, b = minhash_coeffs(num_perm, seed)

    cur = current_ds.map_batches(
        lambda t: pa.table({id_col: t[id_col].cast(pa.int64()),
                            text_col: t[text_col]}),
        batch_format="pyarrow")
    prev = drop_empty_blocks(
        prev_ds, empty_schema=pa.schema(
            [(id_col, pa.int64()), ("prev_hash", pa.string()),
             ("prev_sigs", pa.binary(num_perm * 8))]))
    j = cur.join(prev, join_type="left_outer", num_partitions=width,
                 on=(id_col,))

    def decide(batch: pa.Table) -> pa.Table:
        out_id, out_p, out_s, out_r = [], [], [], []
        perms = list(range(num_perm))
        prev_hashes = (batch["prev_hash"].to_pylist()
                       if "prev_hash" in batch.column_names
                       else [None] * batch.num_rows)
        prev_sigs = (batch["prev_sigs"].to_pylist()
                     if "prev_sigs" in batch.column_names
                     else [None] * batch.num_rows)
        for d, t, ph, ps in zip(batch[id_col].to_pylist(),
                                batch[text_col].to_pylist(),
                                prev_hashes, prev_sigs):
            t = t or ""
            h = hashlib.md5(t.encode()).hexdigest()
            if ph == h and ps is not None:
                sig = np.frombuffer(ps, dtype="<i8")
                reused = 1
            else:
                sig = _md5_doc_sigs(t, a, b, shingle_k)
                reused = 0
            out_id.extend([d] * num_perm)
            out_p.extend(perms)
            out_s.extend(sig.tolist())
            out_r.extend([reused] * num_perm)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "perm": pa.array(out_p, pa.int64()),
                         "sig": pa.array(out_s, pa.int64()),
                         "reused": pa.array(out_r, pa.int64())})

    return j.map_batches(decide, batch_format="pyarrow")


def simhash_chunks_md5(ds, id_col: str = "doc_id", text_col: str = "text"):
    """SQL-replayable SimHash kernel: the exactly-gated sibling of
    ``simhash_batch`` (whose crc32 token hash SQL cannot express). Token
    hash = ``md5_number_lower(token)`` (full uint64); each OCCURRENCE of a
    token (duplicates count, like the crc32 kernel) contributes ±1 per bit
    position; bit j of the simhash is 1 iff the signed sum is > 0.

    Output is ``(doc_id, c0, c1, c2, c3)`` — the four 16-bit chunks the
    Hamming-≤3 pigeonhole bucketing groups by (``simhash_near_dup_pairs``),
    little-endian (c0 = bits 0-15). Chunks sidestep int64 sign issues for
    bit 63 in both Arrow and SQL. Vectorized like ``simhash_batch``:
    per-batch vocab, one md5 per DISTINCT token, bit-unpack broadcast +
    ``add.reduceat`` over doc ranges."""

    def chunk_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
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
        cols = {id_col: batch[id_col]}
        if n == 0:
            for c in range(4):
                cols[f"c{c}"] = pa.array([], pa.int64())
            return pa.table(cols)
        h = np.fromiter((_md5_lower64(w) for w in vocab), dtype=np.uint64,
                        count=len(vocab))
        shifts = np.arange(64, dtype=np.uint64)
        contrib = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
                   * 2 - 1)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(doc_len[:-1], out=starts[1:])
        acc = np.add.reduceat(contrib[np.asarray(tok_ix, dtype=np.int64)],
                              starts, axis=0)  # (docs, 64)
        bits = (acc > 0).astype(np.int64)
        w16 = (1 << np.arange(16, dtype=np.int64))
        for c in range(4):
            vals = (bits[:, c * 16:(c + 1) * 16] * w16).sum(axis=1)
            cols[f"c{c}"] = pa.array(vals.tolist(), pa.int64())
        return pa.table(cols)

    return ds.map_batches(chunk_batch, batch_format="pyarrow")


def inline_ngram_dedup(docs_ds, n: int = 4, *, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Within-document repeated-n-gram removal — the Gopher/MassiveText
    repetition transform (Rae et al. 2021 drop docs by repetition RATIO;
    this is the surgical variant that keeps the doc and removes the
    repeats): a token is DROPPED when the n-gram of whitespace tokens
    ENDING at it has already occurred earlier in the same document
    (earlier end position; overlapping occurrences count). The first
    occurrence of every n-gram survives, so boilerplate refrains,
    chorus lines and template stubs collapse to one copy while prose
    passes through untouched. Documents shorter than ``n`` tokens are
    unchanged.

    Exactly SQL-restatable: gram end-positions unnest per doc, a kept
    flag = NOT duplicated-per-(doc, gram) (min end position wins), text
    rebuilt by ordered string_agg. Engine side is the same rule run
    per batch with a pandas duplicated() over (doc, gram end) rows —
    stateless per document, so the operator is a pure ``map_batches``
    (no exchange at all). Returns (doc_id, clean_text, n_tokens,
    n_dropped)."""
    import pandas as pd

    def clean(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_txt, out_n, out_d = [], [], []
        for t in texts:
            toks = (t or "").split(" ")
            if len(toks) < n:
                out_txt.append(t or "")
                out_n.append(len(toks))
                out_d.append(0)
                continue
            grams = pd.Series([" ".join(toks[i - n + 1: i + 1])
                               for i in range(n - 1, len(toks))])
            dup = grams.duplicated(keep="first").to_numpy()
            keep = np.ones(len(toks), dtype=bool)
            keep[n - 1:] = ~dup
            kept = [w for w, k in zip(toks, keep) if k]
            out_txt.append(" ".join(kept))
            out_n.append(len(toks))
            out_d.append(int(dup.sum()))
        return pa.table({
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "clean_text": pa.array(out_txt, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "n_dropped": pa.array(out_d, pa.int64())})

    return docs_ds.map_batches(clean, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
