"""Recrawl epoch diff: classify every URL across two crawl epochs as
unchanged / modified / new / deleted.

This is the corpus-level generalization of the reference's incremental
crawl (cache_db.py should_skip + the content_hash comparison at
crawler.py:1034-1038): where the reference decides per page at fetch
time whether content changed, a corpus pipeline diffs two whole crawl
snapshots — the input to refresh scheduling (recrawl only what changes)
and to temporal dedup.

Scale shape: each epoch is reduced to fixed-width ``(id, content_hash)``
rows inside ``map_batches`` (document bodies never leave their blocks),
and the diff is ONE distributed ``full_outer`` hash join on the id —
32-byte hashes are all that crosses the exchange. Output is one row per
url in either epoch.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .grouping import resolve_parts

STATUSES = ("unchanged", "modified", "new", "deleted")


def _empty_diff():
    import ray.data as rd

    return rd.from_arrow(pa.schema([("doc_id", pa.int64()),
                                    ("status", pa.string())]).empty_table())


def _hash_rows(ds, id_col: str, text_col: str, out_hash: str):
    """Reduce an epoch to (id, md5) rows. Returns ``(ds, n_rows)`` — the
    blocks are materialized anyway to strip empties before the join, so
    the row count is free (O(blocks) scalars to the driver)."""
    import ray
    import ray.data as rd

    def h(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            out_hash: pa.array(hs, pa.string()),
        })

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    refs = ds.map_batches(h, batch_format="pyarrow").to_arrow_refs()
    counts = ray.get([nrows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return None, 0
    return rd.from_arrow_refs(keep), sum(counts)


def epoch_diff(epoch1_ds, epoch2_ds, *, id_col: str = "doc_id",
               text_col: str = "text", n_parts: int | None = None):
    """Diff two crawl epochs carrying ``(id_col, text_col)``. Returns one
    ``(doc_id, status)`` row per url present in either epoch, status ∈
    ``{unchanged, modified, new, deleted}`` (new = only in epoch 2,
    deleted = only in epoch 1)."""
    width = resolve_parts(n_parts)
    h1, n1 = _hash_rows(epoch1_ds, id_col, text_col, "h1")
    h2, n2 = _hash_rows(epoch2_ds, id_col, text_col, "h2")

    def _const_status(ds, status: str):
        return ds.map_batches(
            lambda t, s=status: pa.table({
                "doc_id": t[id_col].cast(pa.int64()),
                "status": pa.array([s] * t.num_rows, pa.string())}),
            batch_format="pyarrow")

    # a fully-empty side is legal (site wiped / first crawl) but Ray's
    # hash-join aggregator loses the empty side's schema — short-circuit:
    # no join partner means every surviving row's status is decided
    if n1 == 0 and n2 == 0:
        return _empty_diff()
    if n2 == 0:
        return _const_status(h1, "deleted")
    if n1 == 0:
        return _const_status(h2, "new")

    j = h1.join(h2, join_type="full_outer", num_partitions=width,
                on=(id_col,))

    def classify(batch: pa.Table) -> pa.Table:
        a = batch["h1"]
        b = batch["h2"]
        only1 = pc.and_(a.is_valid(), pc.is_null(b))
        only2 = pc.and_(pc.is_null(a), b.is_valid())
        same = pc.equal(a, b)  # null when either side is null
        status = pc.if_else(
            only1, pa.scalar("deleted"),
            pc.if_else(only2, pa.scalar("new"),
                       pc.if_else(pc.fill_null(same, False),
                                  pa.scalar("unchanged"),
                                  pa.scalar("modified"))))
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "status": status.cast(pa.string()),
        })

    return j.map_batches(classify, batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
