"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this container, so
the decode kernels are STUBBED (SURVEY.md round instructions): the real,
tested parts are the Ray-side plumbing — schema, actor-pool stage signature,
small-batch sizing for wide binary rows, and the deterministic fake decoder
used by tests. A real deployment replaces ``_decode_fake`` with the library
call; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),        # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # nullable typed metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
                "width": 64 + (i % 8) * 32 if kind != "audio" else None,
                "height": 64 + (i % 5) * 32 if kind != "audio" else None,
                "duration_ms": 1000 + i * 37 if kind != "image" else None,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for image decode / audio PCM / frame sample:
    payload bytes → fixed-length float32 feature vector. Hashes the HEX of
    the payload (not the raw bytes) so a DuckDB oracle can replay the
    decode exactly — SQL ``sha256`` accepts only VARCHAR, and
    ``bytes.hex()`` == the lowercase hex SQL strings carry."""
    h = hashlib.sha256(payload.hex().encode()).digest()
    raw = np.frombuffer((h * 4)[:128], dtype=np.uint8).astype(np.float32)
    return raw / 255.0


def media_int_weights(seed: int = 3) -> np.ndarray:
    """Fixed small integer weights (length 128) for the exact feature
    column ``f0_int`` — shared with the SQL oracle, which inlines the
    32 COLLAPSED weights (decode bytes tile the 32-byte sha256 digest 4×,
    so byte j == digest[j % 32] and the dot collapses to
    Σ_i digest_i · (w_i + w_{i+32} + w_{i+64} + w_{i+96}))."""
    rng = np.random.default_rng(seed + 1000)
    return rng.integers(-9, 10, size=128).astype(np.int64)


def _decode_real(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this container; "
        "swap _decode_fake for PIL/torchaudio/ffmpeg in production"
    )


class MediaFeatureStage:
    """Actor-pool ``map_batches`` stage: decode + featurize binary payloads.

    Use with small batches — wide binary rows: ``map_batches(
    MediaFeatureStage, batch_size=32, concurrency=N, num_cpus=1,
    batch_format="pyarrow")``. Model/codec state loads once per actor in
    ``__init__`` (here: the fake decoder's projection matrix)."""

    FEATURE_DIM = 32

    def __init__(self, use_fake: bool = True, seed: int = 3):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((128, self.FEATURE_DIM)).astype(np.float32)
        # integer sibling of the projection: an EXACT feature (int64 dot of
        # the 128 decode bytes with fixed small integer weights) emitted
        # alongside the float32 features — float32 pairwise-summation dots
        # are not SQL-replayable bit-for-bit, so this column is what the
        # DuckDB oracle gates end-to-end (payload → decode → actor-pool
        # projection → output)
        self.int_w = media_int_weights()
        self.decode = _decode_fake if use_fake else _decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, f0 = [], []
        for payload, kind in zip(batch["payload"].to_pylist(),
                                 batch["kind"].to_pylist()):
            raw = self.decode(payload, kind)
            feats.append((raw @ self.proj).tolist())
            rbytes = np.round(raw * 255.0).astype(np.int64)
            f0.append(int(rbytes @ self.int_w))
        return (
            batch.drop_columns(["payload"])  # drop wide binary before shuffles
            .append_column("features",
                           pa.array(feats, pa.list_(pa.float32(),
                                                    self.FEATURE_DIM)))
            .append_column("f0_int", pa.array(f0, pa.int64()))
        )


class MediaResizeStage:
    """Actor-pool ``map_batches`` resize/thumbnail stage — the third
    member of the decode tier (decode → features / RESIZE / frame
    sample). Treats the 128 decode bytes as a 16×8 intensity grid and
    average-pools 4×2 blocks to a 4×4 thumbnail (integer floor mean, so
    the SQL oracle replays it exactly). Emits ONE ROW PER OUTPUT PIXEL
    (media_id, kind, py, px, v) — the narrow long-format a downstream
    exchange can shuffle without carrying binary payloads. In
    production the fake decoder swaps for PIL/ffmpeg and the pool for a
    real resampler; the Ray-side plumbing (actor pool, small batches
    for wide binary rows, payload dropped before any shuffle) is the
    tested, real part."""

    def __init__(self, use_fake: bool = True):
        self.decode = _decode_fake if use_fake else _decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, pys, pxs, vs = [], [], [], [], []
        for mid, payload, kind in zip(batch["media_id"].to_pylist(),
                                      batch["payload"].to_pylist(),
                                      batch["kind"].to_pylist()):
            raw = np.round(self.decode(payload, kind) * 255.0)
            grid = raw.astype(np.int64).reshape(16, 8)
            # 4x2 block floor-mean: (16,8) -> (4,4)
            pooled = (grid.reshape(4, 4, 4, 2).sum(axis=(1, 3)) // 8)
            for r in range(4):
                for c in range(4):
                    ids.append(int(mid))
                    kinds.append(kind)
                    pys.append(r)
                    pxs.append(c)
                    vs.append(int(pooled[r, c]))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "py": pa.array(pys, pa.int64()),
            "px": pa.array(pxs, pa.int64()),
            "v": pa.array(vs, pa.int64())})


def frame_sample_plan(ds, fps: int = 25, max_frames: int = 8,
                      seg_ms: int = 960):
    """Deterministic decode WORK PLAN over the typed metadata columns —
    the stage that runs BEFORE any decoder at 100 TB: decide exactly
    which frames / audio windows to extract so the expensive decode
    stage (GPU/codec-bound, small batches) touches only them. Pure
    integer arithmetic, so unlike the decode stub this half of the
    multimodal tier is exactly oracle-gateable.

    - video: ``total = duration_ms·fps // 1000`` frames; a uniform
      stride ``ceil(total / max_frames)`` picks ≤ max_frames frame
      indices ``k·stride``; start_ms = end_ms = ``idx·1000 // fps``.
    - audio: fixed windows every ``seg_ms``: start = k·seg_ms <
      duration, end = min(start + seg_ms, duration).
    - image: the single row (0, 0, 0).

    Emits one row per planned item: ``(media_id, kind, item_idx,
    start_ms, end_ms)``, all plan columns int64; shuffle-free flat-map."""
    def plan(batch: pa.Table) -> pa.Table:
        ids_out, kind_out, idx_out, s_out, e_out = [], [], [], [], []

        def emit(mid, kind, k, s, e):
            ids_out.append(mid)
            kind_out.append(kind)
            idx_out.append(k)
            s_out.append(s)
            e_out.append(e)

        for mid, kind, dur in zip(batch["media_id"].to_pylist(),
                                  batch["kind"].to_pylist(),
                                  batch["duration_ms"].to_pylist()):
            if kind == "image":
                emit(mid, kind, 0, 0, 0)
            elif dur is None or dur <= 0:
                # unknown/zero duration: nothing can be planned — emit no
                # items rather than crash (MEDIA_SCHEMA allows null)
                continue
            elif kind == "audio":
                n = (dur + seg_ms - 1) // seg_ms
                for k in range(n):
                    emit(mid, kind, k, k * seg_ms,
                         min((k + 1) * seg_ms, dur))
            else:  # video
                total = dur * fps // 1000
                if total <= 0:  # clip shorter than one frame interval
                    continue
                stride = (total + max_frames - 1) // max_frames
                n = (total + stride - 1) // stride
                for k in range(n):
                    ts = k * stride * 1000 // fps
                    emit(mid, kind, k, ts, ts)
        return pa.table({
            "media_id": pa.array(ids_out, pa.int64()),
            "kind": pa.array(kind_out, pa.string()),
            "item_idx": pa.array(idx_out, pa.int64()),
            "start_ms": pa.array(s_out, pa.int64()),
            "end_ms": pa.array(e_out, pa.int64()),
        })

    return ds.map_batches(plan, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def ahash32(payload: bytes) -> int:
    """32-bit average-hash of a media payload through the deterministic
    fake decode: bit_i set iff decode byte i exceeds the mean of the 32
    distinct digest bytes, as the integer cross-multiply
    ``32·b_i > Σb`` (no float mean). With a real decoder this is the
    classic aHash over 64 downsampled pixels; under the sha256 stand-in
    only identical payloads produce near hashes — which is exactly what
    the plumbing needs to be testable."""
    h = hashlib.sha256(payload.hex().encode()).digest()
    b = np.frombuffer(h, dtype=np.uint8).astype(np.int64)
    total = int(b.sum())
    bits = (32 * b > total).astype(np.int64)
    return int((bits << np.arange(32, dtype=np.int64)).sum())


def media_ahash_pairs(ds, max_hamming: int = 3, max_bucket: int = 1000):
    """Perceptual-hash near-duplicate pairs over a media payload column —
    the image-dedup sibling of ``dedup.simhash_near_dup_pairs``: payloads
    hash to 32-bit aHashes in an actor-friendly batch pass (decode once,
    never ship pixels), then chunk banding finds every pair within
    ``max_hamming``: 4 chunks of 8 bits, so distance ≤ 3 shares ≥ 1
    exact chunk (pigeonhole). Chunk buckets above ``max_bucket`` are
    dropped (hot-value guard, the LSH discipline). Returns
    (a, b, hamming) with a < b, min-hamming per pair.

    Everything from the sha256 decode to the popcount is
    integer-exact, so the DuckDB oracle replays the WHOLE pipeline —
    synthesis, decode, bit rule, banding, bucket cap, Hamming verify."""
    import pandas as pd

    from .grouping import partitioned_apply

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        hs = [ahash32(p) for p in batch["payload"].to_pylist()]
        c_idx, c_val, c_id, c_h = [], [], [], []
        for i, h in zip(ids, hs):
            for c in range(4):
                c_idx.append(c)
                c_val.append((h >> (8 * c)) & 0xFF)
                c_id.append(i)
                c_h.append(h)
        return pa.table({
            "chunk": pa.array(c_idx, pa.int32()),
            "cval": pa.array(c_val, pa.int32()),
            "id": pa.array(c_id, pa.int64()),
            "h": pa.array(c_h, pa.int64())})

    def pairs_partition(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parts_a, parts_b, parts_d = [], [], []
        for _, g in pdf.groupby(["chunk", "cval"], sort=True):
            uniq = g.drop_duplicates("id").sort_values("id")
            n = len(uniq)
            if n < 2 or n > max_bucket:
                continue
            ids = uniq["id"].to_numpy(np.int64)
            h = uniq["h"].to_numpy(np.int64).view(np.uint64)
            iu, ju = np.triu_indices(n, 1)
            x = h[iu] ^ h[ju]
            d = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                              axis=1).sum(axis=1, dtype=np.int64)
            keep = d <= max_hamming
            if keep.any():
                parts_a.append(ids[iu][keep])
                parts_b.append(ids[ju][keep])
                parts_d.append(d[keep])
        if parts_a:
            return pd.DataFrame({"a": np.concatenate(parts_a),
                                 "b": np.concatenate(parts_b),
                                 "hamming": np.concatenate(parts_d)})
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})

    def min_partition(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pdf.groupby(["a", "b"], as_index=False).agg(
            hamming=("hamming", "min"))

    chunks = ds.map_batches(to_chunks, batch_format="pyarrow")
    pairs = partitioned_apply(chunks, ["chunk", "cval"], pairs_partition)
    return partitioned_apply(pairs, ["a", "b"], min_partition)
