"""Sequence packing for LLM training: global token-offset assignment.

Training pipelines concatenate the tokenized corpus in a canonical document
order and slice it into fixed-length sequences; the operator every such
pipeline needs is "where does my document land?" — a distributed prefix
sum over per-document token counts.  The output maps each doc to its global
token span and the training-sequence ids that span covers:

    start_tok  = Σ n_tokens of all docs ordered before it (doc_id asc)
    first_seq  = start_tok // seq_len
    last_seq   = (start_tok + n_tokens - 1) // seq_len
    n_seqs     = last_seq - first_seq + 1

All integers — the DuckDB oracle is a window cumsum, bit-exact.

Scale shape (the ``ops/quantiles.py`` metadata discipline):

  1. ``map_batches`` → (doc_id, n_tokens) — text is dropped immediately;
     only two int64 columns ever move again;
  2. one range-partitioned ``sort(doc_id)`` — the only shuffle;
  3. per-block token SUMS to the driver — O(blocks) scalars, not rows;
  4. the driver exclusive-scans the block sums (O(blocks) integers) and
     broadcasts each block its start offset;
  5. per-block cumsum + offset finalizes rows where they already live.

No stage materializes more than a block; the driver never sees row data.
Token counts use whitespace ``split(' ')`` — the same convention as
``ops/textstats.token_stats_batch`` and its oracle (empty text counts 1,
matching ``string_split``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _block_sum(tbl: pa.Table) -> int:
    if tbl.num_rows == 0:
        return 0
    return int(np.asarray(tbl["n_tokens"], dtype=np.int64).sum())


@ray.remote
def _finalize(tbl: pa.Table, offset: int, seq_len: int) -> pa.Table:
    if tbl.num_rows == 0:
        cols = {c: tbl[c] for c in tbl.column_names if c != "n_tokens"}
        cols |= {"n_tokens": pa.array([], pa.int64()),
                 "start_tok": pa.array([], pa.int64()),
                 "first_seq": pa.array([], pa.int64()),
                 "last_seq": pa.array([], pa.int64()),
                 "n_seqs": pa.array([], pa.int64())}
        return pa.table(cols)
    n = np.asarray(tbl["n_tokens"], dtype=np.int64)
    start = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
    first = start // seq_len
    last = (start + n - 1) // seq_len
    cols = {c: tbl[c] for c in tbl.column_names if c != "n_tokens"}
    cols |= {"n_tokens": pa.array(n),
             "start_tok": pa.array(start),
             "first_seq": pa.array(first),
             "last_seq": pa.array(last),
             "n_seqs": pa.array(last - first + 1)}
    return pa.table(cols)


def pack_offsets(ds, seq_len: int = 512, id_col: str = "doc_id",
                 text_col: str = "text", keep_cols: list[str] | None = None):
    """Global sequence-packing offsets in ``id_col`` order. Returns a
    Dataset ``(doc_id, *keep_cols, n_tokens, start_tok, first_seq,
    last_seq, n_seqs)`` — one row per input doc. ``keep_cols`` ride along
    the exchange (they must be narrow — ids/keys, not text)."""

    def counts(batch: pa.Table) -> pa.Table:
        toks = [len((t or "").split(" ")) for t in batch[text_col].to_pylist()]
        cols = {"doc_id": batch[id_col].cast(pa.int64())}
        for c in keep_cols or []:
            cols[c] = batch[c]
        cols["n_tokens"] = pa.array(toks, pa.int64())
        return pa.table(cols)

    import ray.data as rd

    slim = ds.map_batches(counts, batch_format="pyarrow")
    # counts() renamed id_col → "doc_id"; sort by the renamed column so a
    # non-default id_col (e.g. "vec_id") works too
    from .grouping import sorted_block_refs

    blocks, _rows = sorted_block_refs(slim.sort("doc_id"), ["doc_id"])
    if not blocks:  # all-empty input: typed empty (keep_cols unknowable)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "first_seq": pa.array([], pa.int64()),
            "last_seq": pa.array([], pa.int64()),
            "n_seqs": pa.array([], pa.int64())}))
    sums = ray.get([_block_sum.remote(b) for b in blocks])
    offsets = np.concatenate(([0], np.cumsum(sums, dtype=np.int64)[:-1]))
    out = [_finalize.remote(b, int(o), seq_len)
           for b, o in zip(blocks, offsets)]
    return rd.from_arrow_refs(out)


@ray.remote
def _pos_finalize(tbl: pa.Table, offset: int) -> pa.Table:
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": tbl["doc_id"],
        "pos": pa.array(offset + np.arange(tbl.num_rows, dtype=np.int64)),
    })


def deterministic_shuffle(ds, *, seed: int = 0, id_col: str = "doc_id"):
    """Seed-stable global shuffle order for a training corpus: each doc's
    position is the rank of ``md5('{id}:{seed}')`` (ties — md5 collisions —
    broken by id). Unlike ``Dataset.random_shuffle``, the permutation is
    REPRODUCIBLE across reruns, cluster sizes and partitionings — the
    property epoch shuffling of a 100-TB corpus needs for resumable /
    re-creatable training runs (vary ``seed`` per epoch).

    Scale shape (the ``pack_offsets`` discipline): the md5 key is a
    map_batches column, ONE range-partitioned sort of fixed-width
    (id, 32-B key) rows is the only shuffle, then per-block row counts →
    O(blocks) driver exclusive scan → positions finalize where the rows
    live. Returns ``(doc_id, pos)``, pos in [0, n)."""
    import hashlib

    import ray.data as rd

    def key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ks = [hashlib.md5(f"{d}:{seed}".encode()).hexdigest() for d in ids]
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "skey": pa.array(ks, pa.string())})

    from .grouping import sorted_block_refs

    blocks, rows = sorted_block_refs(
        ds.map_batches(key, batch_format="pyarrow")
        .sort(["skey", "doc_id"]), ["skey", "doc_id"])
    if not blocks:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64())}))
    offsets = np.concatenate(([0], np.cumsum(rows, dtype=np.int64)[:-1]))
    return rd.from_arrow_refs(
        [_pos_finalize.remote(b, int(o)) for b, o in zip(blocks, offsets)])


@ray.remote
def _lb_finalize(tbl: pa.Table, offset: int, batch_size: int) -> pa.Table:
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "batch_id": pa.array([], pa.int64()),
                         "pos_in_batch": pa.array([], pa.int64())})
    pos = offset + np.arange(tbl.num_rows, dtype=np.int64)
    return pa.table({
        "doc_id": tbl["doc_id"],
        "n_tokens": tbl["n_tokens"],
        "batch_id": pa.array(pos // batch_size, pa.int64()),
        "pos_in_batch": pa.array(pos % batch_size, pa.int64()),
    })


def length_batches(ds, batch_size: int = 32, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Length-bucketed inference batching plan (padding minimization —
    the standard smart-batching trick for embedding/scoring a corpus
    with a fixed-shape model): sort docs by token count, cut into
    consecutive fixed-size batches, so each batch holds near-equal
    lengths and pads only to ITS OWN max instead of the corpus max.
    Deterministic ((n_tokens, doc_id) order), so resumable and
    SQL-gateable — unlike arrival-order batching, which wastes up to
    (max_len − mean_len)·batch_size tokens of compute per batch.

    Scale shape (the ``pack_offsets`` discipline): token counts computed
    in-block, ONE range-partitioned sort of (id, n_tokens) fixed-width
    rows, O(blocks) driver exclusive scan, batch ids finalized where the
    blocks live. Returns (doc_id, n_tokens, batch_id, pos_in_batch) —
    feed each ``batch_id`` group to one model call."""
    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        toks = [len((t or "").split(" "))
                for t in batch[text_col].to_pylist()]
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "n_tokens": pa.array(toks, pa.int64())})

    from .grouping import sorted_block_refs

    blocks, rows = sorted_block_refs(
        ds.map_batches(counts, batch_format="pyarrow")
        .sort(["n_tokens", "doc_id"]), ["n_tokens", "doc_id"])
    if not blocks:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "batch_id": pa.array([], pa.int64()),
            "pos_in_batch": pa.array([], pa.int64())}))
    offsets = np.concatenate(([0], np.cumsum(rows, dtype=np.int64)[:-1]))
    return rd.from_arrow_refs(
        [_lb_finalize.remote(b, int(o), batch_size)
         for b, o in zip(blocks, offsets)])


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
