"""Distributed integer-exact PageRank over a crawl link graph.

A crawl engine's natural downstream consumer is link analysis: the frontier
prioritisation the reference hardcodes as depth-first order (crawler.py
heap on ``(-depth, counter)``) generalises at corpus scale to a rank
computed FROM the harvested link graph.  This module runs fixed-iteration
PageRank entirely in integer arithmetic so the result is bit-reproducible
regardless of partitioning or summation order — integer sums commute —
which is what lets a DuckDB oracle gate the distributed run exactly:

    rank_0(v)     = INIT_PPM                              (1_000_000)
    contrib_k(u)  = (rank_k(u) * DAMP_PCT) // (100 * outdeg(u))
    rank_{k+1}(v) = BASE_PPM + Σ_{u→v} contrib_k(u)       (150_000 + …)

Dangling nodes (no out-edges) simply contribute nothing — their mass is
dropped, not redistributed; the oracle states the same rule.  One floor per
contribution, applied before the sum, keeps both sides identical.

Execution reuses the task-hash-shuffle shape of ``ops/graph.py`` (iterative
``Dataset`` all-to-alls pay a multi-second executor floor per round):

  * edges are hash-partitioned ONCE by ``src % W`` into plasma-resident
    arrays, pre-sorted by ``dst`` so every later round pre-aggregates
    contributions per dst with one ``np.add.reduceat`` — the exchange
    carries per-(partition, dst) partial sums, never per-edge rows;
  * node rank tables live in plasma partitioned by the same hash, so a
    partition always holds the ranks of its own edges' srcs (rank lookup is
    a vectorized ``searchsorted``, no cross-partition reads);
  * each iteration is two O(width) task waves (message, reduce) moving
    fixed-width int64 pairs; the driver only schedules — no per-round
    convergence sync, the iteration count is fixed up front.

Per-round network traffic is O(distinct (partition, dst) pairs) ≤ O(E);
nothing ever materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

INIT_PPM = 1_000_000
BASE_PPM = 150_000
DAMP_PCT = 85


def _np(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr, dtype=np.int64)


@ray.remote
def _edge_split(width: int, tbl: pa.Table, src_col: str, dst_col: str):
    """Fan one edge block out by src-node hash."""
    src, dst = _np(tbl[src_col]), _np(tbl[dst_col])
    p = src % width
    return tuple(
        pa.table({"src": src[p == i], "dst": dst[p == i]})
        for i in range(width)
    )


@ray.remote
def _node_split(width: int, tbl: pa.Table, node_col: str):
    node = np.unique(_np(tbl[node_col]))
    p = node % width
    return tuple(pa.array(node[p == i]) for i in range(width))


@ray.remote(num_returns=2)
def _init_partition(*parts):
    """Build one partition's static state: nodes (sorted unique), and its
    edges sorted by dst with per-edge outdeg — plus the round-0 ranks.

    ``parts`` interleaves node-array slices and edge-table slices (the
    caller passes all node slices first, then all edge slices)."""
    node_slices = [p for p in parts if isinstance(p, pa.Array)]
    edge_slices = [p for p in parts if isinstance(p, pa.Table)]
    nodes = (np.unique(np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in node_slices]))
        if node_slices else np.empty(0, np.int64))

    srcs = [_np(t["src"]) for t in edge_slices if t.num_rows]
    dsts = [_np(t["dst"]) for t in edge_slices if t.num_rows]
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)

    # outdeg per edge (src-side): count occurrences of each src
    if len(src):
        u, inv, cnt = np.unique(src, return_inverse=True, return_counts=True)
        if not np.isin(u, nodes).all():
            missing = u[~np.isin(u, nodes)]
            raise KeyError(f"edge srcs {missing[:5]} not in node set")
        deg = cnt[inv]
        order = np.argsort(dst, kind="stable")  # pre-sort by dst once
        src, dst, deg = src[order], dst[order], deg[order]
    else:
        deg = np.empty(0, np.int64)

    state = pa.table({"src": src, "dst": dst, "deg": deg})
    ranks = pa.table({"node": nodes,
                      "rank": np.full(len(nodes), INIT_PPM, np.int64)})
    return state, ranks


@ray.remote
def _messages(width: int, state: pa.Table, ranks: pa.Table):
    """One iteration's message wave for one partition: per-dst partial sums
    of floored contributions, routed by dst hash."""
    src, dst, deg = _np(state["src"]), _np(state["dst"]), _np(state["deg"])
    if not len(src):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        return tuple(empty for _ in range(width))
    rn, rv = _np(ranks["node"]), _np(ranks["rank"])
    r = rv[np.searchsorted(rn, src)]          # srcs ⊆ partition's nodes
    contrib = (r * DAMP_PCT) // (100 * deg)   # floor BEFORE the sum
    # dst is pre-sorted: one reduceat gives per-dst partials
    uniq_dst, starts = np.unique(dst, return_index=True)
    partial = np.add.reduceat(contrib, starts)
    p = uniq_dst % width
    return tuple(
        pa.table({"node": uniq_dst[p == i], "c": partial[p == i]})
        for i in range(width)
    )


@ray.remote
def _reduce(ranks: pa.Table, *msg_slices):
    """Sum incoming partials into BASE + Σ per node (0 incoming → BASE)."""
    rn = _np(ranks["node"])
    acc = np.full(len(rn), BASE_PPM, np.int64)
    for t in msg_slices:
        if t.num_rows:
            node, c = _np(t["node"]), _np(t["c"])
            idx = np.searchsorted(rn, node)
            if len(rn) == 0 or idx.max() >= len(rn) or \
                    not (rn[idx] == node).all():
                bad = node[(idx >= len(rn)) |
                           (rn[np.minimum(idx, len(rn) - 1)] != node)]
                raise KeyError(f"edge dsts {bad[:5]} not in node set")
            acc[idx] += c
    return pa.table({"node": rn, "rank": acc})


def pagerank(edges_ds, nodes_ds, n_iters: int = 5,
             src_col: str = "src", dst_col: str = "dst",
             node_col: str = "node", n_parts: int | None = None):
    """Fixed-iteration integer PageRank. ``edges_ds`` is the (src, dst)
    link Dataset; ``nodes_ds`` supplies the node universe (isolated pages
    still rank BASE_PPM). Every edge endpoint must be a node. Returns a
    Dataset ``(node int64, rank_ppm int64)``."""
    from raycrawl.ops.grouping import resolve_parts

    width = resolve_parts(n_parts)
    eblocks = edges_ds.to_arrow_refs()
    nblocks = nodes_ds.to_arrow_refs()
    esplit = [_edge_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in eblocks]
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    parts = [
        _init_partition.remote(*[s[p] for s in nsplit],
                               *[s[p] for s in esplit])
        for p in range(width)
    ]
    state_refs = [p[0] for p in parts]
    rank_refs = [p[1] for p in parts]

    for _ in range(n_iters):
        msgs = [_messages.options(num_returns=width).remote(
            width, state_refs[p], rank_refs[p]) for p in range(width)]
        rank_refs = [
            _reduce.remote(rank_refs[p], *[m[p] for m in msgs])
            for p in range(width)
        ]

    out = rd.from_arrow_refs(rank_refs)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "rank_ppm": t["rank"]}),
        batch_format="pyarrow",
    )


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
