"""Exact embedding near-duplicate pairs: blocked all-pairs cosine.

The scale path for embedding near-dup is the sign-projection bucketed
``ops.dedup.embedding_near_dup`` (candidates only where buckets collide).
This module is its *exact* counterpart — every pair with cosine ≥ threshold,
no recall loss — used to calibrate bucket settings and as the DuckDB-oracle
kernel (same role ``ngram_jaccard_pairs`` plays for MinHash).

Exact all-pairs is inherently O(n²) in compute, but it does NOT have to be
O(n²) in any single place: blocks of the embedding table pair up as
``B(B+1)/2`` independent tasks, each pulling exactly two blocks from the
object store (zero-copy Arrow), running one float64 matmul, and returning
only the qualifying id pairs. No driver materialization, no whole-corpus
broadcast — peak memory per task is two blocks plus one
``rows_a × rows_b`` score tile, and the tile size is set by ``ds``'s block
size, not by corpus size.

Float discipline: scores are computed in float64 (norms and dot products)
so they agree with the DuckDB oracle's DOUBLE ``list_cosine_similarity``
to ~1e-15; callers should pick thresholds away from any pair's score by
more than that (the test asserts the margin on the shipped fixtures).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from raycrawl.ops.similarity import _emb_matrix, _normalize


@ray.remote
def _pair_tile(ta: pa.Table, tb: pa.Table, same: bool, threshold: float,
               id_col: str, emb_col: str) -> pa.Table:
    """Qualifying (vec_a < vec_b) pairs between two blocks."""
    ids_a = np.asarray(ta[id_col], dtype=np.int64)
    ids_b = np.asarray(tb[id_col], dtype=np.int64)
    na = _normalize(_emb_matrix(ta[emb_col]))
    nb = na if same else _normalize(_emb_matrix(tb[emb_col]))
    if not len(ids_a) or not len(ids_b):
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64())})
    sims = na @ nb.T
    hit = sims >= threshold
    if same:
        hit &= np.triu(np.ones_like(hit, dtype=bool), k=1)
    ii, jj = np.nonzero(hit)
    a, b = ids_a[ii], ids_b[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"vec_a": pa.array(lo, pa.int64()),
                     "vec_b": pa.array(hi, pa.int64())})


def exact_cosine_pairs(ds, threshold: float = 0.9, id_col: str = "vec_id",
                       emb_col: str = "embedding") -> pa.Table:
    """All (vec_a < vec_b) pairs with cosine(embedding_a, embedding_b) ≥
    ``threshold``, via block-pair tasks. Result (the pair set, assumed
    small — it's a *near-duplicate* report) is collected to one sorted
    Arrow table."""
    refs = ds.select_columns([id_col, emb_col]).to_arrow_refs()
    outs = []
    for i, ra in enumerate(refs):
        for j in range(i, len(refs)):
            outs.append(_pair_tile.remote(ra, refs[j], i == j, threshold,
                                          id_col, emb_col))
    parts = [t for t in ray.get(outs) if t.num_rows]
    if not parts:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)
    order = np.lexsort((np.asarray(tbl["vec_b"]), np.asarray(tbl["vec_a"])))
    return tbl.take(pa.array(order))


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
