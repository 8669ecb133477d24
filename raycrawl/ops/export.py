"""Resumable sharded Parquet export for training-data corpora.

At 100 TB an export MUST be restartable without rewriting finished work
(the round brief's "resumable output" requirement; the reference's
counterpart is the session checkpoint + incremental cache that lets a
crawl resume, crawler.py:384-390). Design:

- shard assignment is a pure row property — ``h32(md5(id)) % n_shards`` —
  so rows land in the same shard on every run/retry regardless of block
  partitioning (same stable-hash discipline as ``ops/sampling``), and the
  assignment is SQL-checkable;
- one DIRECTORY per shard (``shard=K/``), many files inside (one per
  write task) — never one giant file;
- a ``_SUCCESS`` marker per shard directory, written only after the
  shard's rows are on disk; a re-run lists markers first and filters
  finished shards out of the read, so a failed run resumes with only the
  missing shards' rows crossing the pipeline.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray as _export_ray

from .sampling import _h32

SUCCESS = "_SUCCESS"


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard}")


def finished_shards(out_dir: str, n_shards: int) -> set[int]:
    """Shards whose ``_SUCCESS`` marker exists from a previous run."""
    done = set()
    for s in range(n_shards):
        if os.path.exists(os.path.join(_shard_dir(out_dir, s), SUCCESS)):
            done.add(s)
    return done


def export_shards(ds, out_dir: str, n_shards: int = 16,
                  id_col: str = "doc_id") -> dict:
    """Write ``ds`` as ``n_shards`` hash-sharded Parquet directories,
    skipping shards already marked ``_SUCCESS`` (resume). Returns
    ``{"written": [...], "skipped": [...]}``.

    The skip happens BEFORE the write — pending-shard rows are filtered
    with a vectorized mask inside ``map_batches``, so a resume moves only
    the unfinished fraction of the corpus through the pipeline."""
    import numpy as np

    import shutil

    os.makedirs(out_dir, exist_ok=True)
    done = finished_shards(out_dir, n_shards)
    pending = sorted(set(range(n_shards)) - done)
    if not pending:
        return {"written": [], "skipped": sorted(done)}
    # a crashed run can leave PARTIAL files in a shard dir that never got
    # its marker; rewriting on top would duplicate those rows — clear
    # unfinished shard dirs before the write
    for s in pending:
        d = _shard_dir(out_dir, s)
        if os.path.isdir(d):
            shutil.rmtree(d)
    pending_arr = np.array(pending, dtype=np.int64)

    def assign_and_filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        shards = np.array([_h32(str(i)) % n_shards for i in ids],
                          dtype=np.int64)
        keep = np.isin(shards, pending_arr)
        out = batch.filter(pa.array(keep))
        return out.append_column("shard",
                                 pa.array(shards[keep], pa.int64()))

    (ds.map_batches(assign_and_filter, batch_format="pyarrow")
       .write_parquet(out_dir, partition_cols=["shard"]))
    for s in pending:
        os.makedirs(_shard_dir(out_dir, s), exist_ok=True)
        with open(os.path.join(_shard_dir(out_dir, s), SUCCESS), "w"):
            pass
    return {"written": pending, "skipped": sorted(done)}


def archive_offsets(ds, n_shards: int = 16, id_col: str = "doc_id",
                    text_col: str = "text", n_parts: int | None = None):
    """Packed-archive layout manifest (the WARC/tar step): assign each
    document to a shard (the same ``h32(md5(id)) % n_shards`` row
    property as ``export_shards``, so archive shards co-locate with the
    Parquet export) and compute its byte ``(offset, length)`` inside that
    shard's concatenated blob archive, documents laid out in ascending id
    order. The manifest is what gives random access into packed archives
    — a reader seeks to ``offset`` and reads ``len`` bytes without
    scanning the shard.

    Scale shape: UTF-8 lengths and shard ids are computed in-block (one
    fixed-width ``(id, shard, len)`` row per doc — payloads never move);
    ONE shard-keyed task hash exchange runs the per-shard exclusive
    prefix sum vectorized. Returns ``(doc_id, shard, len_bytes,
    offset_bytes)`` — all int64, oracle-gated by a window SUM."""
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "shard": pa.array([_h32(str(i)) % n_shards for i in ids],
                              pa.int64()),
            "len_bytes": pa.array(
                [len((t or "").encode()) for t in
                 batch[text_col].to_pylist()], pa.int64()),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def per_shard(pdf):
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 (id_col, "shard", "len_bytes",
                                  "offset_bytes")})
        pdf = pdf.sort_values(["shard", id_col], kind="mergesort")
        pdf["offset_bytes"] = (pdf.groupby("shard")["len_bytes"].cumsum()
                               - pdf["len_bytes"])
        return pdf[[id_col, "shard", "len_bytes", "offset_bytes"]]

    return partitioned_apply(rows, ["shard"], per_shard, width)


def read_manifest(out_dir: str):
    """Read the export back and count rows per shard (the verification
    pass a pipeline runs after an export). Returns a Dataset of
    (shard, n_rows)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(out_dir)

    # hive partition values come back as strings — pin shard to int64
    def fix(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("shard")
        return batch.set_column(
            idx, "shard", batch["shard"].cast(pa.int64()))

    return (ds.map_batches(fix, batch_format="pyarrow")
            .groupby("shard").aggregate(Count(alias_name="n_rows")))


def write_archives(ds, out_dir: str, n_shards: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_parts: int | None = None):
    """Materialize the packed blob archives whose layout
    ``archive_offsets`` describes: per shard (``h32(md5(id)) % n_shards``
    — the export_shards row property), documents' UTF-8 payloads
    concatenated in ascending id order into ``shard=K/blob.bin``, plus a
    ``_SUCCESS`` marker per finished shard so a failed run resumes
    without rewriting finished archives (the export_shards discipline).

    Scale shape: ONE shard-keyed task hash exchange (partitioned_apply —
    every shard lands whole in exactly one partition task); each task
    writes its shards' blobs sequentially and emits fixed-width manifest
    rows. Payloads cross the exchange once — unavoidable: the archive IS
    the payload — and never touch the driver.

    Returns the manifest Dataset (doc_id, shard, len_bytes,
    offset_bytes), byte-identical to ``archive_offsets`` of the same
    input."""
    import pandas as pd

    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)
    os.makedirs(out_dir, exist_ok=True)
    done = finished_shards(out_dir, n_shards)

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        shards = [_h32(str(i)) % n_shards for i in ids]
        keep = [k for k, s in enumerate(shards) if s not in done]
        return pa.table({
            id_col: pa.array([ids[k] for k in keep], pa.int64()),
            "shard": pa.array([shards[k] for k in keep], pa.int64()),
            "text": pa.array([texts[k] or "" for k in keep], pa.string()),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 (id_col, "shard", "len_bytes",
                                  "offset_bytes")})
        pdf = pdf.sort_values(["shard", id_col], kind="mergesort")
        out_rows = []
        for shard, g in pdf.groupby("shard", sort=True):
            sdir = _shard_dir(out_dir, int(shard))
            os.makedirs(sdir, exist_ok=True)
            off = 0
            tmp = os.path.join(sdir, "blob.bin.tmp")
            with open(tmp, "wb") as f:
                for _, r in g.iterrows():
                    payload = (r["text"] or "").encode()
                    f.write(payload)
                    out_rows.append((int(r[id_col]), int(shard),
                                     len(payload), off))
                    off += len(payload)
            os.replace(tmp, os.path.join(sdir, "blob.bin"))
            with open(os.path.join(sdir, SUCCESS), "w"):
                pass
        return pd.DataFrame(out_rows, columns=[id_col, "shard",
                                               "len_bytes",
                                               "offset_bytes"])

    return partitioned_apply(rows, ["shard"], per_shard, width)


def read_archive_docs(archive_dir: str, manifest_ds,
                      id_col: str = "doc_id",
                      n_parts: int | None = None):
    """Random-access distributed read back out of packed blob archives:
    given the manifest (doc_id, shard, len_bytes, offset_bytes), return
    (doc_id, text). ONE shard-keyed exchange of fixed-width manifest
    rows; each partition task opens its shards' blobs once and slices
    every requested payload by (offset, len) — no scan, no driver
    bytes. The read half of the WARC/tar-style export pair
    (``write_archives``)."""
    import pandas as pd

    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "text": pd.Series(dtype="str")})
        out_ids, out_txt = [], []
        for shard, g in pdf.groupby("shard", sort=True):
            with open(os.path.join(_shard_dir(archive_dir, int(shard)),
                                   "blob.bin"), "rb") as f:
                blob = f.read()
            for _, r in g.iterrows():
                o, n = int(r["offset_bytes"]), int(r["len_bytes"])
                out_ids.append(int(r[id_col]))
                out_txt.append(blob[o:o + n].decode())
        return pd.DataFrame({id_col: pd.Series(out_ids, dtype="int64"),
                             "text": out_txt})

    return partitioned_apply(manifest_ds, ["shard"], per_shard, width)


def balanced_shards(ds, n_shards: int = 16, key_col: str = "source",
                    text_col: str = "text", max_keys: int = 1_000_000):
    """Skew-aware output-shard planner: assign each key (host/source) to
    a shard by SNAKE order over keys sorted by total payload size desc —
    rank r goes to shard r%S on even rounds and S−1−(r%S) on odd rounds
    (boustrophedon), so the heaviest keys spread across shards and each
    round re-balances in reverse. The fix for hash-sharded output under
    host skew, where one hot host makes one Parquet shard 100× the
    others; deterministic and SQL-gateable, unlike greedy LPT whose
    running-bin state has no clean restatement.

    Scale shape: per-key byte totals are in-block partials → one small
    key-keyed Sum (the key cardinality is guarded by ``max_keys`` — the
    plan table is driver-small by assumption); the assignment itself is
    O(keys) driver arithmetic. Returns (key, size_bytes, rnk, shard) —
    broadcast it and tag rows in-block to route the actual write."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def size_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: [k or "" for k in batch[key_col].to_pylist()],
            "b": [len((t or "").encode())
                  for t in batch[text_col].to_pylist()]})
        g = df.groupby(key_col, as_index=False).agg(b=("b", "sum"))
        return pa.table({key_col: pa.array(g[key_col], pa.string()),
                         "b": pa.array(g["b"], pa.int64())})

    rows = (ds.map_batches(size_partial, batch_format="pyarrow")
            .groupby(key_col).aggregate(Sum("b", alias_name="size_bytes"))
            .take(max_keys + 1))
    if len(rows) > max_keys:
        raise ValueError(
            f"balanced_shards: >{max_keys} keys; raise max_keys — the "
            "plan table is assumed driver-small")
    rows.sort(key=lambda r: (-r["size_bytes"], r[key_col]))
    keys, sizes, rnks, shards = [], [], [], []
    for r, row in enumerate(rows):
        rnd, pos = divmod(r, n_shards)
        keys.append(row[key_col])
        sizes.append(row["size_bytes"])
        rnks.append(r + 1)
        shards.append(pos if rnd % 2 == 0 else n_shards - 1 - pos)
    return pa.table({
        key_col: pa.array(keys, pa.string()),
        "size_bytes": pa.array(sizes, pa.int64()),
        "rnk": pa.array(rnks, pa.int64()),
        "shard": pa.array(shards, pa.int64())})


@_export_ray.remote
def _cdx_finalize(tbl: pa.Table, offset: int) -> pa.Table:
    import numpy as np

    pos = pa.array(offset + 1 + np.arange(tbl.num_rows, dtype="int64"),
                   pa.int64())
    return tbl.add_column(0, "cdx_pos", pos)


def cdx_records(pages_ds, *, url_col: str = "url", ts_col: str = "warc_ts",
                payload_col: str = "text"):
    """CDX capture index (the web-archive / Common-Crawl index format):
    one record per capture — SURT key, capture timestamp, original URL,
    payload digest, payload length — globally ordered by
    ``(surt, ts, url)`` with a 1-based ``cdx_pos``. The SURT primary
    order is the point: range partitioning the index co-locates every
    capture of a registered domain, so lookups, per-host dedup and
    politeness planning are single-partition reads at 10^10-capture
    scale. Digest/length are over the extracted payload (content-
    addressed; a WARC-payload digest would swap in byte-identically).

    Scale shape: per-batch SURT/digest/length columns in ``map_batches``
    (md5 per row — no vectorized md5 exists; same cost class as
    ``add_text_hash``), ONE range-partitioned sort of fixed-width rows
    (digest 32 B, surt/url bounded), then the ``pack_offsets``
    discipline for global positions: per-block row counts → O(blocks)
    driver exclusive scan → positions finalized where the blocks live.

    Returns (cdx_pos, surt, ts_us, url, digest, length_bytes)."""
    import hashlib

    import numpy as np
    import ray
    import ray.data as rd

    from ..urlnorm import surt_key

    def slim(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        texts = batch[payload_col].to_pylist()
        return pa.table({
            "surt": pa.array([surt_key(u or "") for u in urls],
                             pa.string()),
            "ts_us": batch[ts_col].cast(pa.int64()),
            "url": pa.array(urls, pa.string()),
            "digest": pa.array(
                [hashlib.md5((t or "").encode()).hexdigest()
                 for t in texts], pa.string()),
            "length_bytes": pa.array(
                [len((t or "").encode()) for t in texts], pa.int64()),
        })

    from .grouping import sorted_block_refs

    blocks, rows = sorted_block_refs(
        pages_ds.map_batches(slim, batch_format="pyarrow")
        .sort(["surt", "ts_us", "url"]), ["surt", "ts_us", "url"])
    offsets = np.concatenate(
        ([0], np.cumsum(rows, dtype=np.int64)[:-1]))
    out = [_cdx_finalize.remote(b, int(o))
           for b, o, n in zip(blocks, offsets, rows) if n > 0]
    if not out:
        return rd.from_arrow(pa.schema(
            [("cdx_pos", pa.int64()), ("surt", pa.string()),
             ("ts_us", pa.int64()), ("url", pa.string()),
             ("digest", pa.string()),
             ("length_bytes", pa.int64())]).empty_table())
    return rd.from_arrow_refs(out)


def ring_points(n_shards: int, vnodes: int) -> "tuple":
    """The consistent-hash ring: ``vnodes`` md5 positions per shard
    (h32 of ``shard:{s}:{v}`` — the repo-wide SQL-replayable hash),
    sorted by (position, shard, vnode) so collisions break
    deterministically. Returns (positions, shards) int64 arrays."""
    import numpy as np

    pts = []
    for s in range(n_shards):
        for v in range(vnodes):
            pts.append((_h32(f"shard:{s}:{v}"), s, v))
    pts.sort()
    pos = np.array([p for p, _, _ in pts], dtype=np.int64)
    shard = np.array([s for _, s, _ in pts], dtype=np.int64)
    return pos, shard


def consistent_ring_assign(ds, n_shards: int = 16, vnodes: int = 64,
                           key_col: str = "source"):
    """Consistent-hash host→fetcher-shard affinity (Karger et al. 1997):
    each shard owns ``vnodes`` md5 points on a 32-bit ring and a host
    belongs to the clockwise successor of its own md5 point — the fleet
    assignment rule whose defining property is MINIMAL REMAPPING: adding
    or removing a shard moves only the hosts falling on that shard's own
    arc (≈ 1/(S+1) of them), so per-host crawler state (politeness
    clocks, robots cache, connection pools) survives a resize, unlike
    ``host % S`` which remaps almost everything. The snake planner
    (``balanced_shards``) balances BYTES for output files; this one
    pins HOSTS to workers across fleet resizes.

    Scale shape: the ring (S·V ints) builds on the driver and broadcasts
    via ``ray.put``; distinct keys reduce through in-block partials → one
    small groupby; assignment is a shuffle-free vectorized
    ``searchsorted`` per batch. Returns a Dataset
    ``(key, ring_pos, shard)`` — one row per distinct key, kept
    distributed (10^8 hosts stay in plasma, never on the driver)."""
    import ray

    if n_shards < 1 or vnodes < 1:
        raise ValueError("consistent_ring_assign: n_shards and vnodes "
                         "must be >= 1")
    pos, shard = ring_points(n_shards, vnodes)
    ring_ref = ray.put((pos, shard))

    def distinct_partial(batch: pa.Table) -> pa.Table:
        ks = sorted({k or "" for k in batch[key_col].to_pylist()})
        return pa.table({"key": pa.array(ks, pa.string())})

    keys = (ds.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("key").count()
            .map_batches(lambda b: b.select(["key"]),
                         batch_format="pyarrow"))

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        rpos, rshard = ray.get(ring_ref)
        ks = batch["key"].to_pylist()
        kp = np.array([_h32(f"host:{k}") for k in ks], dtype=np.int64)
        idx = np.searchsorted(rpos, kp, side="left")
        idx[idx == len(rpos)] = 0  # wrap past the last point
        return pa.table({"key": pa.array(ks, pa.string()),
                         "ring_pos": pa.array(kp, pa.int64()),
                         "shard": pa.array(rshard[idx], pa.int64())})

    return keys.map_batches(assign, batch_format="pyarrow")


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
