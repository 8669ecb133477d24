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
    import ray.data as rd

    from .grouping import nonempty_refs

    def h(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            out_hash: pa.array(hs, pa.string()),
        })

    keep, counts = nonempty_refs(ds.map_batches(h, batch_format="pyarrow"))
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


def recrawl_priority(diff_ds, source_ds, *, origin_mod: int,
                     id_col: str = "doc_id", source_col: str = "source",
                     n_parts: int | None = None):
    """Refresh scheduling: rank sources by churn between two crawl
    epochs. The reference recrawls every site on every run (crawler.py's
    per-site loop); at corpus scale the scheduler must instead spend its
    politeness budget where content actually changes — churn per source =
    modified + new + deleted urls from ``epoch_diff``.

    ``diff_ds`` is ``epoch_diff`` output; ``source_ds`` carries
    ``(doc_id, source)``. New urls are attributed to their origin doc via
    ``doc_id % origin_mod`` (the epoch-2 synthesis parks new urls at
    ``origin + N``). One partitioned hash join (fixed-width rows only) +
    a #sources-row groupby; the final ranking sorts the tiny per-source
    table on the driver.

    Returns ``(source, n_urls, n_modified, n_new, n_deleted, churn,
    priority_rank)`` — rank 1 = highest (churn desc, source asc)."""
    from ray.data.aggregate import Sum

    from .grouping import resolve_parts

    width = resolve_parts(n_parts)

    def origin_and_flags(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        st = batch["status"].to_pylist()
        return pa.table({
            id_col: pa.array([d % origin_mod for d in ids], pa.int64()),
            "n_urls": pa.array([1] * len(ids), pa.int64()),
            "n_modified": pa.array(
                [int(s == "modified") for s in st], pa.int64()),
            "n_new": pa.array([int(s == "new") for s in st], pa.int64()),
            "n_deleted": pa.array(
                [int(s == "deleted") for s in st], pa.int64()),
        })

    flagged = diff_ds.map_batches(origin_and_flags, batch_format="pyarrow")
    j = flagged.join(source_ds, join_type="inner", num_partitions=width,
                     on=(id_col,))
    agg = j.groupby(source_col).aggregate(
        Sum("n_urls", alias_name="n_urls"),
        Sum("n_modified", alias_name="n_modified"),
        Sum("n_new", alias_name="n_new"),
        Sum("n_deleted", alias_name="n_deleted"))
    rows = agg.take_all()  # #sources rows — bounded by construction
    for r in rows:
        r["churn"] = r["n_modified"] + r["n_new"] + r["n_deleted"]
    rows.sort(key=lambda r: (-r["churn"], r[source_col]))
    return pa.table({
        "source": pa.array([r[source_col] for r in rows], pa.string()),
        "n_urls": pa.array([r["n_urls"] for r in rows], pa.int64()),
        "n_modified": pa.array([r["n_modified"] for r in rows], pa.int64()),
        "n_new": pa.array([r["n_new"] for r in rows], pa.int64()),
        "n_deleted": pa.array([r["n_deleted"] for r in rows], pa.int64()),
        "churn": pa.array([r["churn"] for r in rows], pa.int64()),
        "priority_rank": pa.array(range(1, len(rows) + 1), pa.int64()),
    })


def change_rate_intervals(obs_ds, *, base_epochs: int = 8,
                          max_interval: int = 64,
                          id_col: str = "doc_id", epoch_col: str = "epoch",
                          text_col: str = "text",
                          n_parts: int | None = None):
    """Per-url recrawl-interval estimation from a multi-epoch observation
    log (Cho & Garcia-Molina 2003, "Estimating frequency of change"): a
    url observed K times with X changes between consecutive observations
    gets interval ``clamp(base_epochs * (K-1) // (X+1), 1, max_interval)``
    — frequently-changing urls are revisited often, static ones decay
    toward ``max_interval``. This is the per-URL refinement of the
    per-source ``recrawl_priority`` ranking, and the corpus-scale
    generalization of the reference's single-TTL skip rule
    (cache_db.py:83-93 ``CACHE_DAYS``: one fixed 14-day interval for
    every url regardless of how often it actually changes).

    ``obs_ds`` carries ``(id_col, epoch_col, text_col)`` — the union of K
    crawl snapshots tagged with their epoch number (a url absent from an
    epoch simply has no row). Scale shape: bodies are reduced to
    fixed-width ``(id, epoch, md5)`` rows inside ``map_batches``, then ONE
    doc-keyed task hash exchange (``partitioned_apply``) sorts each url's
    observations by epoch and counts hash transitions vectorized — only
    40-byte rows cross the exchange, and no url's history ever
    materializes outside its partition.

    Returns ``(doc_id, n_obs, n_changes, interval_epochs)`` — all int64,
    integer-exact (SQL oracle: LAG window over the same md5 rows)."""
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

    def h(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch[text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "epoch": batch[epoch_col].cast(pa.int64()),
            "h": pa.array(hs, pa.string()),
        })

    rows = obs_ds.map_batches(h, batch_format="pyarrow")

    def per_partition(pdf):
        import numpy as np
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_obs": pd.Series([], dtype="int64"),
                                 "n_changes": pd.Series([], dtype="int64"),
                                 "interval_epochs": pd.Series([],
                                                              dtype="int64")})
        pdf = pdf.sort_values(["doc_id", "epoch"], kind="mergesort")
        doc = pdf["doc_id"].to_numpy()
        hv = pdf["h"].to_numpy()
        same_doc = np.concatenate(([False], doc[1:] == doc[:-1]))
        changed = np.concatenate(([False], hv[1:] != hv[:-1])) & same_doc
        g = pd.DataFrame({"doc_id": doc, "c": changed.astype("int64")})
        agg = g.groupby("doc_id", sort=True).agg(
            n_obs=("c", "size"), n_changes=("c", "sum")).reset_index()
        n_obs = agg["n_obs"].to_numpy().astype("int64")
        n_chg = agg["n_changes"].to_numpy().astype("int64")
        interval = np.clip(base_epochs * (n_obs - 1) // (n_chg + 1),
                           1, max_interval)
        return pd.DataFrame({"doc_id": agg["doc_id"].astype("int64"),
                             "n_obs": n_obs, "n_changes": n_chg,
                             "interval_epochs": interval})

    return partitioned_apply(rows, ["doc_id"], per_partition, width)


def compact_epochs(obs_ds, *, id_col: str = "doc_id",
                   epoch_col: str = "epoch",
                   n_parts: int | None = None):
    """Latest-wins epoch compaction: merge K crawl-epoch document
    snapshots into one table holding each url's MOST RECENT row. This is
    the maintenance job for the engine's own sink layout (one
    ``epoch=K/documents/`` directory per wave/run, pipeline._write_epoch_ds)
    — the merge-on-read debt a long-running incremental crawl accumulates,
    paid down as one batch job. The reference's counterpart is
    Meilisearch's internal replace-by-id on add_documents
    (crawler.py:682-758); here the index is a table, so compaction is
    explicit.

    Scale shape: pass 1 reduces rows to fixed-width ``(id, epoch)`` inside
    ``map_batches`` and elects ``max(epoch)`` per id with a Max groupby —
    bodies never move. Pass 2 is ONE partitioned hash join of the full
    rows against the winner table, then an in-block equality filter keeps
    exactly the winning row — the payload crosses exactly one exchange.
    Ties within (id, epoch) are the caller's bug (an epoch writes each
    url at most once); rows are passed through unchanged otherwise.

    Returns the compacted Dataset with the input schema."""
    from ray.data.aggregate import Max

    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
    try:
        # strip zero-row payload blocks (Acero rejects them as a join
        # side) and pin the blocks once — both passes read them
        obs_ds = drop_empty_blocks(obs_ds)
    except ValueError:
        return obs_ds  # fully empty input: nothing to compact

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            epoch_col: batch[epoch_col].cast(pa.int64()),
        })

    winners = (obs_ds.map_batches(slim, batch_format="pyarrow")
               .groupby(id_col)
               .aggregate(Max(epoch_col, alias_name="_win_epoch")))
    # Ray's hash aggregate emits zero-column blocks for empty partitions;
    # Acero joins reject them (see grouping.drop_empty_blocks)
    winners = drop_empty_blocks(
        winners, empty_schema=pa.schema([(id_col, pa.int64()),
                                         ("_win_epoch", pa.int64())]))
    j = obs_ds.join(winners, join_type="inner", num_partitions=width,
                    on=(id_col,))

    def keep_winner(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch[epoch_col].cast(pa.int64()),
                        batch["_win_epoch"])
        return batch.filter(mask).drop_columns(["_win_epoch"])

    return j.map_batches(keep_winner, batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
