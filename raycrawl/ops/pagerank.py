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


from raycrawl.ops.grouping import _aslists, _fan


@ray.remote
def _edge_split(width: int, tbl: pa.Table, src_col: str, dst_col: str):
    """Fan one edge block out by src-node hash."""
    src, dst = _np(tbl[src_col]), _np(tbl[dst_col])
    p = src % width
    return _fan(tuple(
        pa.table({"src": src[p == i], "dst": dst[p == i]})
        for i in range(width)
    ))


@ray.remote
def _node_split(width: int, tbl: pa.Table, node_col: str):
    node = np.unique(_np(tbl[node_col]))
    p = node % width
    return _fan(tuple(pa.array(node[p == i]) for i in range(width)))


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
        return _fan(tuple(empty for _ in range(width)))
    rn, rv = _np(ranks["node"]), _np(ranks["rank"])
    r = rv[np.searchsorted(rn, src)]          # srcs ⊆ partition's nodes
    contrib = (r * DAMP_PCT) // (100 * deg)   # floor BEFORE the sum
    # dst is pre-sorted: one reduceat gives per-dst partials
    uniq_dst, starts = np.unique(dst, return_index=True)
    partial = np.add.reduceat(contrib, starts)
    p = uniq_dst % width
    return _fan(tuple(
        pa.table({"node": uniq_dst[p == i], "c": partial[p == i]})
        for i in range(width)
    ))


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
    esplit = _aslists(esplit, width)
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    nsplit = _aslists(nsplit, width)
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
        msgs = _aslists(msgs, width)
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


HITS_SCALE = 1_000_000


@ray.remote(num_returns=2)
def _hits_init(width: int, direction_src: bool, *parts):
    """One partition's static edge layout + round-0 scores.

    ``direction_src=True`` builds the by-src layout (holds h of its srcs,
    emits per-dst partials of h); ``False`` the by-dst layout (holds a of
    its dsts, emits per-src partials of a). Message key is pre-sorted so
    each round is one ``reduceat``."""
    node_slices = [p for p in parts if isinstance(p, pa.Array)]
    edge_slices = [p for p in parts if isinstance(p, pa.Table)]
    nodes = (np.unique(np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in node_slices]))
        if node_slices else np.empty(0, np.int64))
    srcs = [_np(t["src"]) for t in edge_slices if t.num_rows]
    dsts = [_np(t["dst"]) for t in edge_slices if t.num_rows]
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    own, msg = (src, dst) if direction_src else (dst, src)
    if len(own):
        order = np.argsort(msg, kind="stable")
        own, msg = own[order], msg[order]
    state = pa.table({"own": own, "msg": msg})
    scores = pa.table({"node": nodes,
                       "score": np.full(len(nodes), HITS_SCALE, np.int64)})
    return state, scores


@ray.remote
def _hits_messages(width: int, state: pa.Table, scores: pa.Table):
    """Per-msg-node partial sums of the partition's own-node scores."""
    own, msg = _np(state["own"]), _np(state["msg"])
    if not len(own):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    sn, sv = _np(scores["node"]), _np(scores["score"])
    s = sv[np.searchsorted(sn, own)]
    uniq, starts = np.unique(msg, return_index=True)
    partial = np.add.reduceat(s, starts)
    p = uniq % width
    return _fan(tuple(pa.table({"node": uniq[p == i], "c": partial[p == i]})
                 for i in range(width)))


@ray.remote
def _hits_reduce(scores: pa.Table, *msg_slices):
    """Raw new scores: Σ incoming partials (0 for no-edge nodes)."""
    rn = _np(scores["node"])
    acc = np.zeros(len(rn), np.int64)
    for t in msg_slices:
        if t.num_rows:
            node, c = _np(t["node"]), _np(t["c"])
            acc[np.searchsorted(rn, node)] += c
    return pa.table({"node": rn, "score": acc})


@ray.remote
def _hits_max(scores: pa.Table) -> int:
    v = _np(scores["score"])
    return int(v.max()) if len(v) else 0


@ray.remote
def _hits_scale(scores: pa.Table, gmax: int) -> pa.Table:
    v = _np(scores["score"])
    return pa.table({"node": scores["node"],
                     "score": (v * HITS_SCALE) // max(gmax, 1)})


def hits(edges_ds, nodes_ds, n_iters: int = 4,
         src_col: str = "src", dst_col: str = "dst",
         node_col: str = "node", n_parts: int | None = None):
    """Fixed-iteration integer HITS (Kleinberg 1999 hubs/authorities) —
    the second classic link-analysis pass over the harvested crawl graph
    (authority ≈ where good hubs point; the quality prior for frontier
    triage and retrieval that PageRank's single score conflates).

    Integer-exact recurrence (bit-reproducible under any partitioning,
    so a DuckDB oracle gates the distributed run):

        a_0 = h_0 = SCALE
        raw_a_k(v) = Σ_{u→v} h_{k-1}(u);  a_k = (raw_a_k·SCALE) // max raw_a_k
        raw_h_k(u) = Σ_{u→v} a_k(v);      h_k = (raw_h_k·SCALE) // max raw_h_k

    — max-normalization (the ∞-norm instead of the usual 2-norm) keeps
    every step in int64 and is a global integer scalar per half-round:
    O(width) ints to the driver, never the score tables.

    Execution (the ``pagerank`` task-shuffle shape, run in BOTH edge
    directions): edges are hash-partitioned ONCE by src (pre-sorted by
    dst) for the h→a wave and once by dst (pre-sorted by src) for the
    a→h wave; each half-round is one message wave of per-node partial
    sums + one reduce wave of fixed-width int64 pairs, then the O(width)
    max sync. Returns (node, auth_ppm, hub_ppm)."""
    from raycrawl.ops.grouping import resolve_parts

    width = resolve_parts(n_parts)
    eblocks = edges_ds.to_arrow_refs()
    nblocks = nodes_ds.to_arrow_refs()
    # by-src split routes on src (h lives with src); by-dst on dst
    esplit_src = [_edge_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in eblocks]
    esplit_src = _aslists(esplit_src, width)

    @ray.remote
    def _edge_split_dst(width: int, tbl: pa.Table):
        src, dst = _np(tbl[src_col]), _np(tbl[dst_col])
        p = dst % width
        return _fan(tuple(pa.table({"src": src[p == i], "dst": dst[p == i]})
                     for i in range(width)))

    esplit_dst = [_edge_split_dst.options(num_returns=width).remote(
        width, b) for b in eblocks]
    esplit_dst = _aslists(esplit_dst, width)
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    nsplit = _aslists(nsplit, width)

    hub_parts = [_hits_init.remote(width, True,
                                   *[s[p] for s in nsplit],
                                   *[s[p] for s in esplit_src])
                 for p in range(width)]
    auth_parts = [_hits_init.remote(width, False,
                                    *[s[p] for s in nsplit],
                                    *[s[p] for s in esplit_dst])
                  for p in range(width)]
    hub_state = [p[0] for p in hub_parts]
    hub_refs = [p[1] for p in hub_parts]      # h, partitioned by node hash
    auth_state = [p[0] for p in auth_parts]
    auth_refs = [p[1] for p in auth_parts]    # a, same node-hash partitions

    def _half_round(state_refs, score_refs):
        msgs = [_hits_messages.options(num_returns=width).remote(
            width, state_refs[p], score_refs[p]) for p in range(width)]
        msgs = _aslists(msgs, width)
        raw = [_hits_reduce.remote(score_refs[p], *[m[p] for m in msgs])
               for p in range(width)]
        gmax = max(ray.get([_hits_max.remote(r) for r in raw]))
        return [_hits_scale.remote(r, gmax) for r in raw]

    for _ in range(n_iters):
        # h partitions hold h by src-hash == node-hash, so the reduce
        # target for a is the SAME node-hash partitioning (auth_refs)
        auth_refs = _half_round(hub_state, hub_refs)
        hub_refs = _half_round(auth_state, auth_refs)

    @ray.remote
    def _zip_scores(a: pa.Table, h: pa.Table) -> pa.Table:
        return pa.table({"node": a["node"], "auth_ppm": a["score"],
                         "hub_ppm": h["score"]})

    out = [_zip_scores.remote(a, h) for a, h in zip(auth_refs, hub_refs)]
    return rd.from_arrow_refs(out)


@ray.remote
def _opic_messages(width: int, state: pa.Table, cashhist: pa.Table):
    """One OPIC round's message wave for one partition: per-dst partial
    sums of floored cash shares ``C(u) // outdeg(u)``, routed by dst hash.
    Dangling nodes (no out-edges) have no edge rows here, so their cash
    is simply not redistributed — the same dropped-mass convention as
    ``pagerank``, stated identically in the oracle."""
    src, dst, deg = _np(state["src"]), _np(state["dst"]), _np(state["deg"])
    if not len(src):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    rn, rv = _np(cashhist["node"]), _np(cashhist["cash"])
    c = rv[np.searchsorted(rn, src)]
    share = c // deg                          # floor BEFORE the sum
    uniq_dst, starts = np.unique(dst, return_index=True)
    partial = np.add.reduceat(share, starts)
    p = uniq_dst % width
    return _fan(tuple(
        pa.table({"node": uniq_dst[p == i], "c": partial[p == i]})
        for i in range(width)
    ))


@ray.remote
def _opic_reduce(cashhist: pa.Table, *msg_slices):
    """One OPIC round's reduce for one partition: bank this round's cash
    into history, replace cash with the incoming share sums (0 for nodes
    nobody points at)."""
    rn = _np(cashhist["node"])
    hist = _np(cashhist["hist"]) + _np(cashhist["cash"])
    acc = np.zeros(len(rn), np.int64)
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
    return pa.table({"node": rn, "cash": acc, "hist": hist})


@ray.remote
def _opic_seed_cash(ranks: pa.Table) -> pa.Table:
    """Round-0 OPIC state for one partition: every node starts with
    INIT_PPM cash and zero history (``_init_partition`` already built the
    node column; its rank column doubles as the uniform cash grant)."""
    rn = _np(ranks["node"])
    return pa.table({"node": rn,
                     "cash": np.full(len(rn), INIT_PPM, np.int64),
                     "hist": np.zeros(len(rn), np.int64)})


def opic(edges_ds, nodes_ds, n_iters: int = 5,
         src_col: str = "src", dst_col: str = "dst",
         node_col: str = "node", n_parts: int | None = None):
    """Fixed-iteration integer OPIC — On-line Page Importance Computation
    (Abiteboul, Preda & Cobéna, WWW 2003): the crawl-time alternative to
    PageRank that needs no convergence of a full link matrix. Each page
    holds CASH; a round distributes every page's cash equally over its
    out-links and banks the distributed amount into the page's HISTORY;
    importance is history + residual cash. Crawlers use it because the
    estimate is meaningful after any prefix of rounds — exactly the
    frontier-priority situation (the reference hardcodes depth order,
    crawler.py's ``(-depth, counter)`` heap; OPIC is what that generalises
    to when the harvested link graph is available mid-crawl).

    Integer-exact synchronous recurrence (bit-reproducible under any
    partitioning — one floor per share, applied before the sum — so a
    DuckDB oracle can gate the distributed run):

        C_0(v) = INIT_PPM;  H_0(v) = 0
        H_{k+1}(v) = H_k(v) + C_k(v)
        C_{k+1}(v) = Σ_{u→v} C_k(u) // outdeg(u)

    Dangling nodes bank their cash but redistribute nothing (dropped
    mass, the ``pagerank`` convention). Execution is the ``pagerank``
    task-hash-shuffle verbatim: edges hash-partitioned once by src and
    pre-sorted by dst (per-dst ``reduceat`` partials cross the exchange,
    never per-edge rows), (cash, hist) tables plasma-resident, two
    O(width) task waves per round, no driver sync. Returns
    ``(node, importance_ppm, cash_ppm, hist_ppm)`` with
    importance = hist + cash after ``n_iters`` rounds."""
    from raycrawl.ops.grouping import resolve_parts

    width = resolve_parts(n_parts)
    eblocks = edges_ds.to_arrow_refs()
    nblocks = nodes_ds.to_arrow_refs()
    esplit = [_edge_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in eblocks]
    esplit = _aslists(esplit, width)
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    nsplit = _aslists(nsplit, width)
    parts = [
        _init_partition.remote(*[s[p] for s in nsplit],
                               *[s[p] for s in esplit])
        for p in range(width)
    ]
    state_refs = [p[0] for p in parts]
    ch_refs = [_opic_seed_cash.remote(p[1]) for p in parts]

    for _ in range(n_iters):
        msgs = [_opic_messages.options(num_returns=width).remote(
            width, state_refs[p], ch_refs[p]) for p in range(width)]
        msgs = _aslists(msgs, width)
        ch_refs = [
            _opic_reduce.remote(ch_refs[p], *[m[p] for m in msgs])
            for p in range(width)
        ]

    out = rd.from_arrow_refs(ch_refs)

    def _final(t: pa.Table) -> pa.Table:
        cash, hist = _np(t["cash"]), _np(t["hist"])
        return pa.table({"node": t["node"],
                         "importance_ppm": cash + hist,
                         "cash_ppm": cash, "hist_ppm": hist})

    return out.map_batches(_final, batch_format="pyarrow")


@ray.remote
def _kcore_messages(width: int, state: pa.Table, alive: pa.Table):
    """One peel round's message wave for one partition: per-dst counts of
    edges whose src is still alive, routed by dst hash. The edge layout is
    the ``pagerank`` one (partitioned by src, pre-sorted by dst) over the
    UNDIRECTED doubling the caller built, so these counts reduce to the
    full undirected degree at the dst side."""
    src, dst = _np(state["src"]), _np(state["dst"])
    if not len(src):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    an, av = _np(alive["node"]), _np(alive["alive"])
    live = av[np.searchsorted(an, src)].astype(bool)
    dst = dst[live]
    if not len(dst):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    uniq_dst, cnt = np.unique(dst, return_counts=True)
    p = uniq_dst % width
    return _fan(tuple(
        pa.table({"node": uniq_dst[p == i], "c": cnt[p == i]})
        for i in range(width)
    ))


@ray.remote
def _kcore_reduce(alive: pa.Table, k: int, *msg_slices):
    """One peel round's reduce: a node survives iff it was alive and its
    alive-neighbor degree is ≥ k. Degree is recorded (0 for dead nodes)
    so the final round's value is the within-core degree."""
    rn = _np(alive["node"])
    av = _np(alive["alive"]).astype(bool)
    deg = np.zeros(len(rn), np.int64)
    for t in msg_slices:
        if t.num_rows:
            node, c = _np(t["node"]), _np(t["c"])
            idx = np.searchsorted(rn, node)
            if len(rn) == 0 or idx.max() >= len(rn) or \
                    not (rn[idx] == node).all():
                bad = node[(idx >= len(rn)) |
                           (rn[np.minimum(idx, len(rn) - 1)] != node)]
                raise KeyError(f"edge dsts {bad[:5]} not in node set")
            deg[idx] += c
    nxt = av & (deg >= k)
    return pa.table({"node": rn, "alive": nxt.astype(np.int64),
                     "deg": np.where(nxt, deg, 0)})


@ray.remote
def _kcore_seed(ranks: pa.Table) -> pa.Table:
    rn = _np(ranks["node"])
    return pa.table({"node": rn,
                     "alive": np.ones(len(rn), np.int64),
                     "deg": np.zeros(len(rn), np.int64)})


def kcore(edges_ds, nodes_ds, k: int = 3, n_rounds: int = 4,
          src_col: str = "src", dst_col: str = "dst",
          node_col: str = "node", n_parts: int | None = None):
    """Fixed-round k-core peeling (Seidman 1983) over the UNDIRECTED crawl
    link graph — the classic dense-subgraph signal: link farms and
    navigational cores sit in high-k cores while organic page tails peel
    away. Each round recomputes every surviving node's degree over
    surviving neighbors (MULTIGRAPH degree: parallel input edges count,
    the ``host_pagerank`` multiplicity convention) and drops nodes below
    ``k``; the fixed round count
    (instead of a data-dependent fixpoint test) keeps the computation a
    static task DAG with no driver sync and makes the DuckDB oracle an
    unrolled CTE per round — at R rounds the result is the exact R-step
    peel, a superset of the true k-core that equals it once the peel
    stabilizes.

    Execution: the caller's directed edges are doubled in-block into both
    orientations, then the ``pagerank`` task-hash-shuffle runs verbatim —
    edges partitioned once by src (alive(src) is a local lookup), per-dst
    count partials cross the exchange, the alive/degree table is
    plasma-resident, two O(width) task waves per round. Returns
    ``(node, in_core 0/1, core_deg)`` with core_deg, for surviving nodes,
    the degree counted over the PREVIOUS round's survivors (the value the
    final keep test ran on; 0 for peeled nodes) — the oracle states the
    same rule."""
    from raycrawl.ops.grouping import resolve_parts

    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    width = resolve_parts(n_parts)

    def _undirect(t: pa.Table) -> pa.Table:
        s = _np(t[src_col])
        d = _np(t[dst_col])
        return pa.table({src_col: np.concatenate([s, d]),
                         dst_col: np.concatenate([d, s])})

    und = edges_ds.map_batches(_undirect, batch_format="pyarrow")
    eblocks = und.to_arrow_refs()
    nblocks = nodes_ds.to_arrow_refs()
    esplit = [_edge_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in eblocks]
    esplit = _aslists(esplit, width)
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    nsplit = _aslists(nsplit, width)
    parts = [
        _init_partition.remote(*[s[p] for s in nsplit],
                               *[s[p] for s in esplit])
        for p in range(width)
    ]
    state_refs = [p[0] for p in parts]
    alive_refs = [_kcore_seed.remote(p[1]) for p in parts]

    for _ in range(n_rounds):
        msgs = [_kcore_messages.options(num_returns=width).remote(
            width, state_refs[p], alive_refs[p]) for p in range(width)]
        msgs = _aslists(msgs, width)
        alive_refs = [
            _kcore_reduce.remote(alive_refs[p], k, *[m[p] for m in msgs])
            for p in range(width)
        ]

    out = rd.from_arrow_refs(alive_refs)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "in_core": t["alive"],
                            "core_deg": t["deg"]}),
        batch_format="pyarrow",
    )


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


@ray.remote
def _ppr_seed_init(ranks: pa.Table, seeds: np.ndarray) -> pa.Table:
    """Round-0 personalized ranks for one partition: INIT on seed nodes,
    0 elsewhere (the teleport distribution is the seed set, not uniform)."""
    rn = _np(ranks["node"])
    r0 = np.where(np.isin(rn, seeds), np.int64(INIT_PPM), np.int64(0))
    return pa.table({"node": rn, "rank": r0})


@ray.remote
def _ppr_reduce(ranks: pa.Table, seeds: np.ndarray, *msg_slices):
    """Personalized reduce: base teleport mass BASE_PPM lands ONLY on seed
    nodes; everything else is pure link mass."""
    rn = _np(ranks["node"])
    acc = np.where(np.isin(rn, seeds), np.int64(BASE_PPM), np.int64(0))
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


def personalized_pagerank(edges_ds, nodes_ds, seeds, n_iters: int = 5,
                          src_col: str = "src", dst_col: str = "dst",
                          node_col: str = "node",
                          n_parts: int | None = None):
    """Fixed-iteration integer PageRank with the teleport vector
    concentrated on a SEED set (Page et al. 1999 §6 'personalized'
    variant; Haveliwala 2002 topic-sensitive PageRank) — the focused-crawl
    prioritisation signal: rank mass radiates from the curated seed list
    through the harvested link graph, so high-PPR unvisited hosts are the
    frontier entries a topical crawl should spend its politeness budget
    on (the principled upgrade of ops/scheduler.focused_frontier_select's
    static quality prior).

        rank_0(v)     = INIT_PPM·[v ∈ S]
        rank_{k+1}(v) = BASE_PPM·[v ∈ S] + Σ_{u→v} (rank_k(u)·85)//(100·outdeg(u))

    Same integer-exact task-hash-shuffle machinery as ``pagerank`` (one
    floor per contribution BEFORE the sum ⇒ partition-order independent,
    DuckDB-gateable); the seed set rides into the O(width) init/reduce
    tasks as one small sorted array (PPR seed sets are small by
    definition — that is the use case). Nodes unreachable from the seeds
    rank exactly 0, which is the pruning signal. Returns
    ``(node, rank_ppm)``."""
    from raycrawl.ops.grouping import resolve_parts

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if not len(seed_arr):
        raise ValueError("personalized_pagerank: empty seed set")
    width = resolve_parts(n_parts)
    eblocks = edges_ds.to_arrow_refs()
    nblocks = nodes_ds.to_arrow_refs()
    esplit = [_edge_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in eblocks]
    esplit = _aslists(esplit, width)
    nsplit = [_node_split.options(num_returns=width).remote(
        width, b, node_col) for b in nblocks]
    nsplit = _aslists(nsplit, width)
    parts = [
        _init_partition.remote(*[s[p] for s in nsplit],
                               *[s[p] for s in esplit])
        for p in range(width)
    ]
    state_refs = [p[0] for p in parts]
    rank_refs = [_ppr_seed_init.remote(p[1], seed_arr) for p in parts]

    for _ in range(n_iters):
        msgs = [_messages.options(num_returns=width).remote(
            width, state_refs[p], rank_refs[p]) for p in range(width)]
        msgs = _aslists(msgs, width)
        rank_refs = [
            _ppr_reduce.remote(rank_refs[p], seed_arr, *[m[p] for m in msgs])
            for p in range(width)
        ]

    out = rd.from_arrow_refs(rank_refs)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_ppm": t["rank"]}),
        batch_format="pyarrow",
    )
