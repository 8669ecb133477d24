"""Distributed connected components over a duplicate-pair edge list.

The dedup family (minhash / simhash / jaccard / embedding) emits *pairs*;
an actual training-data pipeline must turn pairs into *clusters* and keep
one canonical document per cluster (the reference keeps first-seen per
content hash — ``crawler.py`` content-hash dedup — this is the transitive
generalisation for near-dup pairs).

Algorithm: hash-to-min label propagation (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds").  Every node
starts labelled ``min(self, neighbors)``; each round a node takes the min
of its own label, its neighbors' labels, and — the pointer-jumping
accelerant — the label of its *label node*, so reach doubles per round and
chains converge in O(log diameter) rounds instead of O(diameter).

Execution is a DIY task hash shuffle, not a per-round ``Dataset.groupby``:
iterative Dataset all-to-alls pay a multi-second executor floor per round
(the same reason the crawl wave engine routes its frontier with raw task
rounds).  Edges are symmetrized once and hash-partitioned by source node
into plasma-resident Arrow tables that never move again; each round runs
three O(width) task waves —

  A. dynamic-edge round: partition p emits (label → node) request rows for
     its relabelled nodes, routed by label hash (pointer jumping);
  B. message round: partition p joins its static+dynamic edges to its own
     label array (vectorized searchsorted) and emits (dst, src_label)
     messages routed by dst hash;
  C. reduce round: partition p min-reduces incoming messages into its
     label array and returns only (sum, #changed) scalars to the driver.

Per-round network traffic is fixed-width int64 pairs, O(E); the driver
sees only per-partition counters.  Label tables stay in plasma between
rounds (num_returns fan-out), so the per-round floor is task scheduling,
not Dataset execution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _np(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr, dtype=np.int64)


def _min_per_node(node: np.ndarray, val: np.ndarray):
    """(sorted unique nodes, min val per node) — vectorized reduceat."""
    order = np.argsort(node, kind="stable")
    sn, sv = node[order], val[order]
    uniq, idx = np.unique(sn, return_index=True)
    return uniq, np.minimum.reduceat(sv, idx)


from raycrawl.ops.grouping import _aslists, _fan, keep_nonempty_ref_tables


@ray.remote
def _edge_split(width: int, tbl: pa.Table, a_col: str, b_col: str):
    """Symmetrize one pair block and fan it out by src-node hash."""
    a, b = _np(tbl[a_col]), _np(tbl[b_col])
    node = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    p = node % width
    return _fan(tuple(
        pa.table({"node": node[p == i], "nbr": nbr[p == i]})
        for i in range(width)
    ))


@ray.remote(num_returns=2)
def _init_partition(*slices):
    """Concat a partition's edge slices (static for the whole run) and
    compute round-0 labels = min(node, min neighbor)."""
    tbls = [t for t in slices if t.num_rows]
    if not tbls:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
        return pa.table({"node": pa.array([], pa.int64()),
                         "nbr": pa.array([], pa.int64())}), empty
    edges = pa.concat_tables(tbls)
    node, nbr = _np(edges["node"]), _np(edges["nbr"])
    uniq, minnbr = _min_per_node(node, nbr)
    labels = pa.table({"node": uniq, "label": np.minimum(uniq, minnbr)})
    return edges, labels


@ray.remote
def _dyn_edges(width: int, labels: pa.Table):
    """Round A: (label → node) pointer-jump requests, routed by label."""
    node, lbl = _np(labels["node"]), _np(labels["label"])
    m = lbl != node
    src, dst = lbl[m], node[m]
    p = src % width
    return _fan(tuple(
        pa.table({"node": src[p == i], "nbr": dst[p == i]})
        for i in range(width)
    ))


@ray.remote
def _messages(width: int, edges: pa.Table, labels: pa.Table, *dyn_slices):
    """Round B: (dst, label[src]) messages over static + dynamic edges.
    Every src in this partition's edges has a label row here (edges and
    labels are partitioned by the same node hash)."""
    ln, lv = _np(labels["node"]), _np(labels["label"])
    srcs = [_np(edges["node"])]
    dsts = [_np(edges["nbr"])]
    for t in dyn_slices:
        if t.num_rows:
            srcs.append(_np(t["node"]))
            dsts.append(_np(t["nbr"]))
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    if not len(src):
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    idx = np.searchsorted(ln, src)  # ln sorted (built via np.unique)
    lab = lv[idx]
    p = dst % width
    return _fan(tuple(
        pa.table({"node": dst[p == i], "label": lab[p == i]})
        for i in range(width)
    ))


@ray.remote(num_returns=2)
def _reduce(labels: pa.Table, *msg_slices):
    """Round C: min-reduce incoming labels; return new labels (plasma) and
    (sum, changed) scalars (driver)."""
    ln, lv = _np(labels["node"]), _np(labels["label"])
    nodes = [ln]
    vals = [lv]
    for t in msg_slices:
        if t.num_rows:
            nodes.append(_np(t["node"]))
            vals.append(_np(t["label"]))
    uniq, minv = _min_per_node(np.concatenate(nodes), np.concatenate(vals))
    # uniq == ln (messages only target existing nodes), but stay defensive:
    # restrict to this partition's node set
    if len(uniq) != len(ln) or not np.array_equal(uniq, ln):
        keep = np.isin(uniq, ln)
        uniq, minv = uniq[keep], minv[keep]
    changed = int(np.count_nonzero(minv != lv))
    return (pa.table({"node": uniq, "label": minv}),
            (int(minv.sum()), changed, len(uniq)))


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         n_parts: int | None = None, max_rounds: int = 64):
    """Labels every node that appears in ``pairs_ds`` with the min node id
    of its connected component.  Returns a Dataset ``(node int64, label
    int64)`` — one row per distinct node — built from the plasma-resident
    partition tables."""
    from raycrawl.ops.grouping import resolve_parts

    width = resolve_parts(n_parts)
    blocks = pairs_ds.to_arrow_refs()
    split = [_edge_split.options(num_returns=width).remote(
        width, b, a_col, b_col) for b in blocks]
    split = _aslists(split, width)
    parts = [_init_partition.remote(*[s[p] for s in split])
             for p in range(width)]
    edge_refs = [p[0] for p in parts]
    label_refs = [p[1] for p in parts]

    for _ in range(max_rounds):
        dyn = [_dyn_edges.options(num_returns=width).remote(width, lr)
               for lr in label_refs]
        dyn = _aslists(dyn, width)
        msgs = [
            _messages.options(num_returns=width).remote(
                width, edge_refs[p], label_refs[p], *[d[p] for d in dyn])
            for p in range(width)
        ]
        msgs = _aslists(msgs, width)
        outs = [
            _reduce.remote(label_refs[p], *[m[p] for m in msgs])
            for p in range(width)
        ]
        label_refs = [o[0] for o in outs]
        stats = ray.get([o[1] for o in outs])
        if sum(c for _, c, _ in stats) == 0:
            break
    # drop empty label partitions (keep one for schema): an empty block
    # skips downstream map_batches UDFs and reaches joins with a stale
    # schema (Acero rejects it on the key FieldRef)
    keep = [r for r, (_, _, rows) in zip(label_refs, stats) if rows > 0]
    return rd.from_arrow_refs(keep if keep else label_refs[:1])


def canonical_clusters(pairs_ds, a_col: str = "a", b_col: str = "b",
                       n_parts: int | None = None):
    """Pairs → per-doc cluster assignment: ``(doc_id, cluster_id, keep)``
    where cluster_id is the min doc id of the component and keep=1 marks
    the canonical (kept) document — the transitive near-dup analogue of the
    reference's first-wins content-hash dedup (crawler.py content_hash)."""
    labels = connected_components(pairs_ds, a_col, b_col, n_parts=n_parts)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.cast(pc.equal(batch["node"], batch["label"]), pa.int64())
        return pa.table({"doc_id": batch["node"],
                         "cluster_id": batch["label"], "keep": keep})

    return labels.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def cluster_representatives(docs_ds, pairs_ds, *, id_col: str = "doc_id",
                            text_col: str = "text",
                            n_parts: int | None = None):
    """Quality-aware canonical selection per near-dup cluster: keep the
    LONGEST document (ties → min id) — the RefinedWeb/CCNet practice,
    versus ``canonical_clusters``'s first-wins min-id — with singletons
    representing themselves. Returns one row per input doc:
    ``(doc_id, cluster_id, n_chars, is_rep)``.

    Shuffle shape: edges feed connected components (int64 label rows);
    docs contribute only ``(doc_id, n_chars)``; ONE left_outer hash join
    attaches labels (missing ⇒ singleton, cluster_id = own id) and ONE
    cluster-keyed task exchange elects the representative per group —
    document text never crosses any exchange."""
    import pandas as pd

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           partitioned_apply, resolve_parts)

    width = resolve_parts(n_parts)
    # the one hash join: sequential aggregator pools are actor-startup
    # bound at full width (the multi-join rule) — the election exchange
    # keeps the wide task shuffle
    join_width = multi_join_parts(n_parts)

    def nchars(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            "n_chars": pa.array([len(t or "")
                                 for t in b[text_col].to_pylist()],
                                pa.int64()),
        })

    slim = docs_ds.map_batches(nchars, batch_format="pyarrow")
    labels = connected_components(pairs_ds, n_parts=n_parts).map_batches(
        lambda b: pa.table({id_col: b["node"].cast(pa.int64()),
                            "label": b["label"].cast(pa.int64())}),
        batch_format="pyarrow")
    # empty blocks skip map_batches UDFs (stale (node,label) schema) and
    # Acero rejects zero-row join sides — strip them; a pair-less corpus
    # (every doc distinct) short-circuits to the all-singletons path
    labels = drop_empty_blocks(
        labels, empty_schema=pa.schema([(id_col, pa.int64()),
                                        ("label", pa.int64())]))

    if labels.count() == 0:
        j = slim
    else:
        j = slim.join(labels, join_type="left_outer",
                      num_partitions=join_width, on=(id_col,))

    def assign(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], np.int64)
        lab = b["label"].to_pylist() if "label" in b.column_names \
            else [None] * len(ids)
        cl = np.array([l if l is not None else i
                       for l, i in zip(lab, ids.tolist())], np.int64)
        return pa.table({id_col: pa.array(ids), "n_chars": b["n_chars"],
                         "cluster_id": pa.array(cl)})

    assigned = j.map_batches(assign, batch_format="pyarrow")

    def elect(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 (id_col, "cluster_id", "n_chars",
                                  "is_rep")})
        o = pdf.sort_values(["cluster_id", "n_chars", id_col],
                            ascending=[True, False, True])
        rep = (o.groupby("cluster_id").head(1)[["cluster_id", id_col]]
               .rename(columns={id_col: "_rep"}))
        out = pdf.merge(rep, on="cluster_id")
        out["is_rep"] = (out[id_col] == out["_rep"]).astype("int64")
        return out[[id_col, "cluster_id", "n_chars", "is_rep"]]

    return partitioned_apply(assigned, ["cluster_id"], elect,
                             n_parts=width)


@ray.remote
def _rr_init(width: int, part: int, *slices: pa.Table):
    """One redirect partition: rows (src, cur) with src % width == part,
    src-sorted for searchsorted lookups. The map is FUNCTIONALIZED
    here: duplicate src rows (the same redirect logged twice, or a
    conflicting pair) collapse to ONE row per src with the MIN dst —
    the lookup kernels index by first-match searchsorted, so duplicate
    srcs would otherwise leave stale siblings behind. ``active``
    tracks whether the row's chain is still moving (a row settles the
    first round its landing node answers no lookup)."""
    live = [t for t in slices if t.num_rows]
    if not live:
        return pa.table({"src": pa.array([], pa.int64()),
                         "cur": pa.array([], pa.int64()),
                         "active": pa.array([], pa.int64())})
    src = np.concatenate([_np(t["src"]) for t in live])
    cur = np.concatenate([_np(t["dst"]) for t in live])
    order = np.lexsort((cur, src))
    src, cur = src[order], cur[order]
    first = np.r_[True, src[1:] != src[:-1]]   # min dst per src
    src, cur = src[first], cur[first]
    return pa.table({"src": pa.array(src, pa.int64()),
                     "cur": pa.array(cur, pa.int64()),
                     "active": pa.array(np.ones(len(src), np.int64),
                                        pa.int64())})


@ray.remote
def _rr_queries(width: int, part_tbl: pa.Table):
    """Emit (node=cur, origin=src) lookup requests for rows whose chain
    is still MOVING, routed by cur hash — settled rows (landing node
    already known to have no outgoing edge) cost nothing in later
    rounds, realizing the per-round traffic bound."""
    src, cur = _np(part_tbl["src"]), _np(part_tbl["cur"])
    act = _np(part_tbl["active"]) == 1
    src, cur = src[act], cur[act]
    p = cur % width
    return _fan(tuple(pa.table({"node": pa.array(cur[p == i], pa.int64()),
                                "origin": pa.array(src[p == i], pa.int64())})
                      for i in range(width)))


@ray.remote
def _rr_answer(width: int, part_tbl: pa.Table, *queries: pa.Table):
    """Answer lookups against this partition's CURRENT map (pointer
    jumping composes the map with itself — reach doubles per round):
    for found nodes emit (origin, next), routed by origin hash."""
    src, cur = _np(part_tbl["src"]), _np(part_tbl["cur"])
    outs_o, outs_n = [], []
    for q in queries:
        if not q.num_rows:
            continue
        qn, qo = _np(q["node"]), _np(q["origin"])
        if not len(src):
            continue
        pos = np.searchsorted(src, qn)
        pos_c = np.minimum(pos, len(src) - 1)
        found = src[pos_c] == qn
        outs_o.append(qo[found])
        outs_n.append(cur[pos_c][found])
    if not outs_o:
        empty = pa.table({"origin": pa.array([], pa.int64()),
                          "next": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    o = np.concatenate(outs_o)
    nx = np.concatenate(outs_n)
    p = o % width
    return _fan(tuple(pa.table({"origin": pa.array(o[p == i], pa.int64()),
                                "next": pa.array(nx[p == i], pa.int64())})
                      for i in range(width)))


@ray.remote
def _rr_apply(part_tbl: pa.Table, *answers: pa.Table):
    """Apply (origin, next) updates: cur[origin] = next. An ACTIVE row
    with no answer this round settles (its landing node has no outgoing
    redirect — the chain is resolved) and stops emitting lookups."""
    src, cur = _np(part_tbl["src"]), _np(part_tbl["cur"]).copy()
    act = _np(part_tbl["active"]).copy()
    answered = np.zeros(len(src), dtype=bool)
    for a in answers:
        if not a.num_rows or not len(src):
            continue
        ao, an = _np(a["origin"]), _np(a["next"])
        pos = np.searchsorted(src, ao)  # srcs unique post-init
        cur[pos] = an
        answered[pos] = True
    act[(act == 1) & ~answered] = 0
    return pa.table({"src": pa.array(src, pa.int64()),
                     "cur": pa.array(cur, pa.int64()),
                     "active": pa.array(act, pa.int64())})


@ray.remote
def _rr_finish(part_tbl: pa.Table, *answers: pa.Table):
    """Final pass: rows that settled mid-run are resolved by
    construction; a still-active row whose landing node answers the
    probe (it HAS an outgoing redirect) is a cycle or over-long chain —
    unresolved."""
    src, cur = _np(part_tbl["src"]), _np(part_tbl["cur"])
    resolved = np.ones(len(src), np.int64)
    for a in answers:
        if not a.num_rows or not len(src):
            continue
        ao = _np(a["origin"])
        pos = np.searchsorted(src, ao)
        resolved[pos] = 0
    return pa.table({"src": pa.array(src, pa.int64()),
                     "final": pa.array(cur, pa.int64()),
                     "resolved": pa.array(resolved, pa.int64())})


def resolve_redirects(redirects_ds, rounds: int = 6,
                      src_col: str = "src", dst_col: str = "dst",
                      n_parts: int | None = None):
    """Redirect-chain resolution at rest: given the crawl's harvested
    redirect map ``(src, dst)`` — a FUNCTIONAL graph, one outgoing edge
    per src — resolve every src to its final target by pointer jumping
    (each round composes the map with itself, so reach doubles:
    ``f → f² → f⁴ → …``). The per-fetch version of this lives in
    LiveFetchStage's ``final_url`` (reference ``crawler.py:993`` follows
    redirects inline); this is the corpus-scale batch form that
    deduplicates url aliases BEFORE refetching 10^10 urls.

    After ``rounds`` rounds every chain of length ≤ 2^rounds is resolved;
    a src still pointing at a node WITH an outgoing edge is in a cycle
    (or an over-long chain) and reports ``resolved = 0`` with the
    deterministic ``f^(2^rounds)`` landing node — exactly restatable in
    SQL as a depth-limited recursive walk, so the op is oracle-gateable.

    Execution (the `connected_components`/`seed_distances` static-
    partition shape): the map hash-partitions by src ONCE into plasma,
    src-sorted; each round is three width-wide waves of int64 kernels —
    emit (cur, origin) lookups routed by cur hash, answer them against
    the CURRENT map (searchsorted), apply (origin, next) updates — so
    the doubling composition never pays a Dataset join (the previous
    per-round ``Dataset.join`` implementation spent ~3 s/round of
    executor+aggregator fixed cost at 32 CPUs). Rows crossing the wire
    per round = one fixed-width query+answer per chain still moving.
    Returns ``(src, final, resolved)``, one row per input src."""
    import ray.data as rd

    from .grouping import resolve_parts

    width = resolve_parts(n_parts)

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col].cast(pa.int64()),
                         "dst": b[dst_col].cast(pa.int64())})

    blocks = redirects_ds.map_batches(
        norm, batch_format="pyarrow").to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("final", pa.int64()),
             ("resolved", pa.int64())]).empty_table())
    split = _aslists([_bfs_split.options(num_returns=width).remote(
        width, b, "src", "dst") for b in blocks], width)
    parts = [_rr_init.remote(width, p, *[s[p] for s in split])
             for p in range(width)]

    for _ in range(rounds):
        q = _aslists([_rr_queries.options(num_returns=width).remote(
            width, parts[p]) for p in range(width)], width)
        a = _aslists([_rr_answer.options(num_returns=width).remote(
            width, parts[p], *[q[i][p] for i in range(width)])
            for p in range(width)], width)
        parts = [_rr_apply.remote(parts[p], *[a[i][p] for i in range(width)])
                 for p in range(width)]

    # resolved probe: same lookup shape, answers mark unresolved chains
    q = _aslists([_rr_queries.options(num_returns=width).remote(
        width, parts[p]) for p in range(width)], width)
    a = _aslists([_rr_answer.options(num_returns=width).remote(
        width, parts[p], *[q[i][p] for i in range(width)])
        for p in range(width)], width)
    outs = [_rr_finish.remote(parts[p], *[a[i][p] for i in range(width)])
            for p in range(width)]

    return rd.from_arrow_refs(keep_nonempty_ref_tables(outs))


def graph_structure_report(edges_ds, *, src_col: str = "src",
                           dst_col: str = "dst", n_parts: int | None = None):
    """Link-graph shape report: the degree distributions and reciprocity
    a crawl operator reads before trusting link-derived signals (a
    link-farm host shows up as a reciprocity spike and a fat out-degree
    tail — Broder et al. WWW'00 measure both on the full web graph; the
    PageRank/HITS/PPR family above all assume the graph isn't gamed).

    Output rows (kind, k, n), all int64 except kind:

    - ('edges',  0, #distinct directed edges)
    - ('outdeg', d, #nodes with out-degree d) for every realized d
    - ('indeg',  d, #nodes with in-degree d)
    - ('recip',  0, #directed edges whose reverse edge also exists —
      each reciprocated unordered pair counts twice; self-loops count
      themselves)

    Scale shape: edges dedupe and both degree passes are fixed-width
    groupby counts; the histograms group the (node, degree) table again
    (≤ max-degree rows out). Reciprocity is a partitioned hash join of
    the edge table against its own swap — never a broadcast (the edge
    table is the corpus-LARGE side at 100 TB)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col].cast(pa.int64()),
                         "dst": b[dst_col].cast(pa.int64())})

    # drop_empty_blocks: a groupby can emit empty schema-less blocks that
    # Acero's Dataset.join rejects (FieldRef resolution fails)
    distinct = drop_empty_blocks(
        (edges_ds.map_batches(norm, batch_format="pyarrow")
         .groupby(["src", "dst"]).aggregate(Count(alias_name="_c"))
         .map_batches(lambda b: b.select(["src", "dst"]),
                      batch_format="pyarrow")).materialize(),
        empty_schema=edge_schema)

    n_edges = distinct.count()

    def deg_hist(key: str, kind: str):
        deg = distinct.groupby(key).aggregate(Count(alias_name="k"))
        hist = deg.groupby("k").aggregate(Count(alias_name="n"))

        def fin(b: pa.Table) -> pa.Table:
            return pa.table({
                "kind": pa.array([kind] * b.num_rows, pa.string()),
                "k": b["k"].cast(pa.int64()),
                "n": b["n"].cast(pa.int64())})

        return hist.map_batches(fin, batch_format="pyarrow")

    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"r_src": b["dst"], "r_dst": b["src"]})

    swapped = distinct.map_batches(swap, batch_format="pyarrow")
    recip = distinct.join(swapped, join_type="inner",
                          num_partitions=width, on=("src", "dst"),
                          right_on=("r_src", "r_dst")).count()

    scalars = rd.from_arrow(pa.table({
        "kind": pa.array(["edges", "recip"], pa.string()),
        "k": pa.array([0, 0], pa.int64()),
        "n": pa.array([n_edges, recip], pa.int64())}))
    return (scalars.union(deg_hist("src", "outdeg"))
            .union(deg_hist("dst", "indeg")))


def _pairh(a: np.ndarray, b: np.ndarray, width: int) -> np.ndarray:
    """Deterministic (a,b) pair-hash partition id, shared by the wedge
    and closing-edge routings (they must co-locate)."""
    h = (a.astype(np.uint64) * np.uint64(0x9E3779B1)
         + b.astype(np.uint64) * np.uint64(0x85EBCA77))
    return (h % np.uint64(width)).astype(np.int64)


@ray.remote
def _tri_split(width: int, tbl: pa.Table, src_col: str, dst_col: str):
    """Canonicalize one block to unordered (a<b) pairs (self-loops
    dropped) and route by pair hash."""
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    s = _np(tbl[src_col])
    d = _np(tbl[dst_col])
    keep = s != d
    s, d = s[keep], d[keep]
    a = np.minimum(s, d)
    b = np.maximum(s, d)
    p = _pairh(a, b, width)
    return _fan(tuple(pa.table({"a": a[p == i], "b": b[p == i]})
                      for i in range(width)))


@ray.remote
def _tri_dedup(width: int, *slices: pa.Table):
    """Per pair-partition: unique (a,b) edges (sorted), plus degree
    PARTIALS (node, cnt) routed by node hash. Returns the edge table
    then ``width`` partial slices."""
    live = [t for t in slices if t.num_rows]
    if not live:
        e = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
        d = pa.table({"node": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
        return tuple([e] + [d] * width)
    a = np.concatenate([_np(t["a"]) for t in live])
    b = np.concatenate([_np(t["b"]) for t in live])
    ab = np.stack([a, b], axis=1)
    ab = np.unique(ab, axis=0)          # sorted by (a, b)
    a, b = ab[:, 0], ab[:, 1]
    nodes = np.concatenate([a, b])
    uniq, cnt = np.unique(nodes, return_counts=True)
    q = uniq % width
    return tuple(
        [pa.table({"a": pa.array(a, pa.int64()),
                   "b": pa.array(b, pa.int64())})]
        + [pa.table({"node": pa.array(uniq[q == i], pa.int64()),
                     "cnt": pa.array(cnt[q == i], pa.int64())})
           for i in range(width)])


@ray.remote
def _tri_degrees(*partials: pa.Table):
    """Per node-partition: fold degree partials -> sorted (node, deg)."""
    live = [t for t in partials if t.num_rows]
    if not live:
        return pa.table({"node": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64())})
    n = np.concatenate([_np(t["node"]) for t in live])
    c = np.concatenate([_np(t["cnt"]) for t in live])
    order = np.argsort(n, kind="stable")
    n, c = n[order], c[order]
    uniq, idx = np.unique(n, return_index=True)
    deg = np.add.reduceat(c, idx)
    return pa.table({"node": pa.array(uniq, pa.int64()),
                     "deg": pa.array(deg, pa.int64())})


@ray.remote
def _tri_degq(width: int, edges: pa.Table):
    """Emit each edge partition's distinct endpoint set, routed by node
    hash — the degree-lookup request."""
    if not edges.num_rows:
        e = pa.table({"node": pa.array([], pa.int64())})
        return _fan(tuple(e for _ in range(width)))
    nodes = np.unique(np.concatenate([_np(edges["a"]), _np(edges["b"])]))
    q = nodes % width
    return _fan(tuple(pa.table({"node": pa.array(nodes[q == i],
                                                 pa.int64())})
                      for i in range(width)))


@ray.remote
def _tri_dega(width: int, degs: pa.Table, *queries: pa.Table):
    """Answer degree lookups: for requester p return its requested
    (node, deg) rows."""
    dn, dv = _np(degs["node"]), _np(degs["deg"])
    outs = []
    for qt in queries:
        qn = _np(qt["node"])
        if not len(qn) or not len(dn):
            outs.append(pa.table({"node": pa.array([], pa.int64()),
                                  "deg": pa.array([], pa.int64())}))
            continue
        pos = np.searchsorted(dn, qn)   # every endpoint HAS a degree row
        outs.append(pa.table({"node": pa.array(qn, pa.int64()),
                              "deg": pa.array(dv[pos], pa.int64())}))
    return _fan(tuple(outs))


@ray.remote
def _tri_orient(width: int, edges: pa.Table, *answers: pa.Table):
    """Orient each edge from its lower-(deg, id) endpoint, then route
    TWO ways: by apex hash (wedge side, carrying (u, v, dv)) and by
    pair hash (closing side, carrying (u, v)). Returns width wedge
    slices then width closing slices."""
    we = pa.table({"u": pa.array([], pa.int64()),
                   "v": pa.array([], pa.int64()),
                   "dv": pa.array([], pa.int64())})
    ce = pa.table({"x": pa.array([], pa.int64()),
                   "y": pa.array([], pa.int64())})
    if not edges.num_rows:
        return tuple([we] * width + [ce] * width)
    live = [t for t in answers if t.num_rows]
    dn = np.concatenate([_np(t["node"]) for t in live])
    dv = np.concatenate([_np(t["deg"]) for t in live])
    order = np.argsort(dn, kind="stable")
    dn, dv = dn[order], dv[order]
    a, b = _np(edges["a"]), _np(edges["b"])
    da = dv[np.searchsorted(dn, a)]
    db = dv[np.searchsorted(dn, b)]
    a_first = (da < db) | ((da == db) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    duv = np.where(a_first, db, da)
    pw = u % width
    pc = _pairh(u, v, width)
    return tuple(
        [pa.table({"u": pa.array(u[pw == i], pa.int64()),
                   "v": pa.array(v[pw == i], pa.int64()),
                   "dv": pa.array(duv[pw == i], pa.int64())})
         for i in range(width)]
        + [pa.table({"x": pa.array(u[pc == i], pa.int64()),
                     "y": pa.array(v[pc == i], pa.int64())})
           for i in range(width)])


@ray.remote
def _tri_wedges(width: int, max_wedges: int, *slices: pa.Table):
    """Per apex-partition: emit every out-neighborhood pair (x, y) —
    rank-ordered so (x, y) matches the closing edge's orientation —
    routed by pair hash. The ``max_wedges`` raise-guard keeps a skewed
    orientation (near-clique) loud instead of silently exploding."""
    empty = pa.table({"x": pa.array([], pa.int64()),
                      "y": pa.array([], pa.int64()),
                      "apex": pa.array([], pa.int64())})
    live = [t for t in slices if t.num_rows]
    if not live:
        return _fan(tuple(empty for _ in range(width)))
    u = np.concatenate([_np(t["u"]) for t in live])
    v = np.concatenate([_np(t["v"]) for t in live])
    dvv = np.concatenate([_np(t["dv"]) for t in live])
    order = np.lexsort((v, dvv, u))     # by apex, then (deg, id) rank
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], len(u)]
    ks = ends - starts
    total = int((ks * (ks - 1) // 2).sum())
    if total > max_wedges:
        raise ValueError(
            f"wedge partition would emit {total} > max_wedges="
            f"{max_wedges} candidate pairs; the orientation is skewed "
            "(near-clique) — raise max_wedges or densify n_parts")
    if not total:
        return _fan(tuple(empty for _ in range(width)))
    xs = np.empty(total, np.int64)
    ys = np.empty(total, np.int64)
    ap = np.empty(total, np.int64)
    pos = 0
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        i, j = np.triu_indices(k, 1)
        m = len(i)
        xs[pos:pos + m] = v[s + i]
        ys[pos:pos + m] = v[s + j]
        ap[pos:pos + m] = u[s]
        pos += m
    p = _pairh(xs, ys, width)
    return _fan(tuple(pa.table({"x": pa.array(xs[p == i], pa.int64()),
                                "y": pa.array(ys[p == i], pa.int64()),
                                "apex": pa.array(ap[p == i], pa.int64())})
                      for i in range(width)))


@ray.remote
def _tri_close(width: int, n_close: int, *tables: pa.Table):
    """Per pair-partition: triangles = wedges whose (x, y) exists in the
    oriented closing-edge set (packed int128-free: sorted lexicographic
    (x, y) membership via searchsorted on both columns). Emits corner
    partials (node, cnt) routed by node hash."""
    close = tables[:n_close]
    wedges = tables[n_close:]
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    cl = [t for t in close if t.num_rows]
    wl = [t for t in wedges if t.num_rows]
    if not cl or not wl:
        return _fan(tuple(empty for _ in range(width)))
    cx = np.concatenate([_np(t["x"]) for t in cl])
    cy = np.concatenate([_np(t["y"]) for t in cl])
    wx = np.concatenate([_np(t["x"]) for t in wl])
    wy = np.concatenate([_np(t["y"]) for t in wl])
    wa = np.concatenate([_np(t["apex"]) for t in wl])
    # one fully-vectorized membership test: rank both endpoints over the
    # partition's node universe, pack (rank_x, rank_y) into one int64 key
    # (ranks < n, n**2 fits — n is bounded by this partition's rows),
    # and probe the sorted closing keys with a single searchsorted
    nodes = np.unique(np.concatenate([cx, cy, wx, wy]))
    n = np.int64(len(nodes))
    ckey = np.searchsorted(nodes, cx) * n + np.searchsorted(nodes, cy)
    ckey.sort()
    wkey = np.searchsorted(nodes, wx) * n + np.searchsorted(nodes, wy)
    pos = np.searchsorted(ckey, wkey)
    pos_c = np.minimum(pos, len(ckey) - 1)
    hit = ckey[pos_c] == wkey
    if not hit.any():
        return _fan(tuple(empty for _ in range(width)))
    corners = np.concatenate([wx[hit], wy[hit], wa[hit]])
    uniq, cnt = np.unique(corners, return_counts=True)
    q = uniq % width
    return _fan(tuple(pa.table({"node": pa.array(uniq[q == i], pa.int64()),
                                "cnt": pa.array(cnt[q == i], pa.int64())})
                      for i in range(width)))


@ray.remote
def _tri_count(*partials: pa.Table):
    live = [t for t in partials if t.num_rows]
    if not live:
        return pa.table({"node": pa.array([], pa.int64()),
                         "triangles": pa.array([], pa.int64())})
    n = np.concatenate([_np(t["node"]) for t in live])
    c = np.concatenate([_np(t["cnt"]) for t in live])
    order = np.argsort(n, kind="stable")
    n, c = n[order], c[order]
    uniq, idx = np.unique(n, return_index=True)
    return pa.table({"node": pa.array(uniq, pa.int64()),
                     "triangles": pa.array(np.add.reduceat(c, idx),
                                           pa.int64())})


def triangle_counts(edges_ds, *, src_col: str = "src",
                    dst_col: str = "dst", n_parts: int | None = None,
                    max_wedges: int = 50_000_000):
    """Exact per-node triangle participation counts over the undirected
    view of a directed link graph — the local-clustering signal a crawl
    pipeline reads to spot link farms and tightly-knit boilerplate rings
    (dense mutual-link neighborhoods triangle-saturate; genuine editorial
    graphs are locally sparse — Broder et al. WWW'00, Schank & Wagner
    2005).

    Algorithm (node-iterator with degree-ordered orientation): edges
    canonicalize to unordered (a<b) pairs and dedup; each undirected edge
    is then oriented from its lower-(degree, id) endpoint to the higher —
    an acyclic orientation under which every out-neighborhood has
    O(sqrt(E)) size, so wedge generation is O(E^1.5) worst-case instead
    of O(E·d_max) (the standard MapReduce triangle bound). A wedge
    (apex u → x, u → y) closes into a triangle iff the oriented edge
    (x, y) exists.

    Execution (the `connected_components`/`seed_distances` static-
    partition shape — this op's DAG of Dataset exchanges previously
    paid ~2 s of executor+aggregator floor per stage, ~14 s total at
    sf0.01): pair-hash dedup partitions, node-hash degree fold,
    degree query/answer waves, orientation with dual routing (apex hash
    for wedge generation, pair hash for the closing set), per-partition
    wedge emission under the ``max_wedges`` raise-guard, and a
    searchsorted closing-membership test — every wave fixed-width int64
    kernels over plasma tables; the driver sees only refs. Wedge/close
    co-location rides ONE shared pair-hash, so the closing test needs no
    further exchange.

    Returns (node, triangles) — one row per node in ≥1 triangle."""
    import ray.data as rd

    from .grouping import resolve_parts

    width = resolve_parts(n_parts)
    blocks = edges_ds.to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64())}))
    split = [_tri_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in blocks]
    split = _aslists(split, width)
    ded = [_tri_dedup.options(num_returns=width + 1).remote(
        width, *[s[p] for s in split]) for p in range(width)]
    edge_refs = [d[0] for d in ded]
    deg_parts = [d[1:] for d in ded]
    degs = [_tri_degrees.remote(*[dp[q] for dp in deg_parts])
            for q in range(width)]
    degq = [_tri_degq.options(num_returns=width).remote(width, edge_refs[p])
            for p in range(width)]
    degq = _aslists(degq, width)
    dega = [_tri_dega.options(num_returns=width).remote(
        width, degs[q], *[degq[p][q] for p in range(width)])
        for q in range(width)]
    dega = _aslists(dega, width)
    orient = [_tri_orient.options(num_returns=2 * width).remote(
        width, edge_refs[p], *[dega[q][p] for q in range(width)])
        for p in range(width)]
    wedge_in = [[o[i] for i in range(width)] for o in orient]
    close_in = [[o[width + i] for i in range(width)] for o in orient]
    wedges = [_tri_wedges.options(num_returns=width).remote(
        width, max_wedges, *[wi[p] for wi in wedge_in])
        for p in range(width)]
    wedges = _aslists(wedges, width)
    corner = [_tri_close.options(num_returns=width).remote(
        width, width,
        *[ci[p] for ci in close_in],
        *[wedges[q][p] for q in range(width)])
        for p in range(width)]
    corner = _aslists(corner, width)
    outs = [_tri_count.remote(*[corner[p][q] for p in range(width)])
            for q in range(width)]

    return rd.from_arrow_refs(keep_nonempty_ref_tables(outs))


@ray.remote
def _bfs_split(width: int, tbl: pa.Table, src_col: str, dst_col: str):
    """Route one edge block's rows to src-hash partitions."""
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return _fan(tuple(empty for _ in range(width)))
    src = _np(tbl[src_col])
    dst = _np(tbl[dst_col])
    p = src % width
    return _fan(tuple(pa.table({"src": src[p == i], "dst": dst[p == i]})
                      for i in range(width)))


@ray.remote(num_returns=2)
def _bfs_init(width: int, part: int, seeds: np.ndarray, *slices: pa.Table):
    """Concat one partition's edge slices, sort by src (searchsorted
    probes), seed the distance table with this partition's seeds."""
    src = np.concatenate([_np(t["src"]) for t in slices]) \
        if slices else np.empty(0, np.int64)
    dst = np.concatenate([_np(t["dst"]) for t in slices]) \
        if slices else np.empty(0, np.int64)
    order = np.argsort(src, kind="stable")
    mine = seeds[seeds % width == part]
    return (pa.table({"src": src[order], "dst": dst[order]}),
            pa.table({"node": pa.array(mine, pa.int64()),
                      "dist": pa.array(np.zeros(len(mine), np.int64),
                                       pa.int64())}))


@ray.remote
def _bfs_expand(width: int, r: int, edges: pa.Table, dist: pa.Table):
    """Frontier (dist == r) x this partition's src-sorted edges ->
    candidate dst nodes, routed by dst hash. Duplicate edges collapse in
    the per-partition unique — no global edge dedup pass needed."""
    dn, dv = _np(dist["node"]), _np(dist["dist"])
    f = dn[dv == r]
    empty = pa.table({"node": pa.array([], pa.int64())})
    if not len(f) or not edges.num_rows:
        return _fan(tuple(empty for _ in range(width)))
    es, ed = _np(edges["src"]), _np(edges["dst"])
    lo = np.searchsorted(es, f, side="left")
    hi = np.searchsorted(es, f, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if not total:
        return _fan(tuple(empty for _ in range(width)))
    # gather all out-edge indices of the frontier in one shot
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    idx = np.arange(total, dtype=np.int64) + np.repeat(lo - starts, counts)
    cand = np.unique(ed[idx])
    p = cand % width
    return _fan(tuple(pa.table({"node": pa.array(cand[p == i], pa.int64())})
                      for i in range(width)))


@ray.remote(num_returns=2)
def _bfs_absorb(r: int, dist: pa.Table, *cand_slices: pa.Table):
    """Fold round-r candidates into the distance table: nodes not yet
    reached get dist r+1 (first touch == minimum hop count). Returns the
    new table (plasma) and the newly-reached count (driver scalar)."""
    dn, dv = _np(dist["node"]), _np(dist["dist"])
    cs = [c for t in cand_slices if t.num_rows
          for c in (_np(t["node"]),)]
    if not cs:
        return dist, 0
    cand = np.unique(np.concatenate(cs))
    new = cand[~np.isin(cand, dn)]
    if not len(new):
        return dist, 0
    return (pa.table({
        "node": pa.array(np.concatenate([dn, new]), pa.int64()),
        "dist": pa.array(np.concatenate(
            [dv, np.full(len(new), r + 1, np.int64)]), pa.int64())}),
        int(len(new)))


def seed_distances(edges_ds, seeds, *, max_hops: int = 8,
                   src_col: str = "src", dst_col: str = "dst",
                   n_parts: int | None = None):
    """Minimum link-hop distance from a curated seed set, capped at
    ``max_hops`` — the focused-crawl horizon signal at rest: a page's BFS
    depth from the seeds is exactly the earliest wave a frontier crawl
    could reach it, so the distance table prioritizes recrawl and prunes
    frontier candidates the same way `personalized_pagerank` weights them
    (distance is the hop-metric sibling of PPR's decay mass).

    Algorithm: synchronous frontier relaxation, one round per hop, over
    STATIC plasma-resident partitions (the `connected_components`
    execution shape): edges hash-partition by src ONCE, src-sorted so
    each round probes a frontier slice with two ``searchsorted`` calls;
    distance state lives in node-hash partitions co-keyed with the
    candidate routing. A node's first touch is its minimum hop by BFS
    induction, so absorb only ever appends. Each round is 2·width tiny
    tasks of int64 kernels — no per-round Dataset plan, join or groupby
    (the previous Dataset-loop implementation paid ~1.5 s/round of
    executor fixed cost; at max_hops=6 x two directions that dominated
    the bowtie decomposition).

    Scale shape: rows crossing the wire per round = newly-reachable
    frontier candidates only; the edge corpus never moves after the one
    split pass. ``max_hops`` bounds the rounds — unreachable-within-
    horizon nodes are absent from the output (the caller's prune
    signal).

    Returns (node, dist) for every node within max_hops of a seed
    (seeds at 0)."""
    from .grouping import resolve_parts

    width = resolve_parts(n_parts)
    seed_arr = np.unique(np.asarray(list(seeds), np.int64))
    if not len(seed_arr):
        # empty-in/empty-out: dynamically-computed seed sets may
        # legitimately come back empty
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64())}))

    blocks = edges_ds.to_arrow_refs()
    split = _aslists([_bfs_split.options(num_returns=width).remote(
        width, b, src_col, dst_col) for b in blocks], width)
    parts = [_bfs_init.remote(width, p, seed_arr, *[s[p] for s in split])
             for p in range(width)]
    edge_refs = [p[0] for p in parts]
    dist_refs = [p[1] for p in parts]

    for r in range(max_hops):
        cand = _aslists([_bfs_expand.options(num_returns=width).remote(
            width, r, edge_refs[p], dist_refs[p])
            for p in range(width)], width)
        outs = [_bfs_absorb.remote(r, dist_refs[p], *[c[p] for c in cand])
                for p in range(width)]
        dist_refs = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break

    return rd.from_arrow_refs(keep_nonempty_ref_tables(dist_refs))


def bowtie_structure(edges_ds, nodes_ds, pivot_seeds, *,
                     max_hops: int = 6, node_col: str = "node",
                     src_col: str = "src", dst_col: str = "dst",
                     n_parts: int | None = None):
    """Bounded bowtie decomposition of the crawl web graph (Broder et
    al., WWW 2000): classify every page relative to a pivot set by
    bidirectional reachability within ``max_hops`` —

        CORE  reaches the pivot AND is reachable from it (the pivot's
              strongly-connected neighborhood within the horizon),
        IN    reaches the pivot only (pages funnelling rank/traffic in),
        OUT   reachable from the pivot only (where its links lead),
        OTHER neither within the horizon (tendrils + disconnected mass).

    The horizon cap makes this the bounded variant of the classic
    decomposition — exact for nodes within ``max_hops`` of the pivot in
    either direction, conservative (OTHER) beyond it — which is what
    keeps the computation O(max_hops) exchanges on a 10^10-node graph
    instead of O(diameter), and what lets a recursive-CTE oracle with
    the same depth bound restate it exactly.

    Execution: two ``seed_distances`` runs (forward over the edges,
    backward over the in-block-swapped edges — each a synchronous
    frontier relaxation re-probing the once-materialized edge table with
    partitioned hash joins of int64 pairs), then ONE left-join pass of
    the node universe against the two small distance tables. Returns
    ``(node, component, fwd_dist, bwd_dist)`` with -1 for
    out-of-horizon distances."""
    from .grouping import drop_empty_blocks, multi_join_parts

    # two STACKED left joins -> the multi-join width rule (sequential
    # aggregator pools are actor-startup bound at full width)
    width = multi_join_parts(n_parts)
    pivot_seeds = list(pivot_seeds)
    if not pivot_seeds:
        raise ValueError("bowtie_structure: empty pivot seed set")

    def swap(b: pa.Table) -> pa.Table:
        return pa.table({src_col: b[dst_col].cast(pa.int64()),
                         dst_col: b[src_col].cast(pa.int64())})

    fwd = seed_distances(edges_ds, pivot_seeds, max_hops=max_hops,
                         src_col=src_col, dst_col=dst_col,
                         n_parts=n_parts)
    bwd = seed_distances(
        edges_ds.map_batches(swap, batch_format="pyarrow"), pivot_seeds,
        max_hops=max_hops, src_col=src_col, dst_col=dst_col,
        n_parts=n_parts)

    nodes = nodes_ds.map_batches(
        lambda b: pa.table({"node": b[node_col].cast(pa.int64())}),
        batch_format="pyarrow")
    fwd = drop_empty_blocks(
        fwd.map_batches(lambda b: pa.table(
            {"node": b["node"], "fwd_dist": b["dist"]}),
            batch_format="pyarrow"),
        empty_schema=pa.schema([("node", pa.int64()),
                                ("fwd_dist", pa.int64())]))
    bwd = drop_empty_blocks(
        bwd.map_batches(lambda b: pa.table(
            {"node": b["node"], "bwd_dist": b["dist"]}),
            batch_format="pyarrow"),
        empty_schema=pa.schema([("node", pa.int64()),
                                ("bwd_dist", pa.int64())]))
    j = nodes.join(fwd, join_type="left_outer", num_partitions=width,
                   on=("node",))
    j = j.join(bwd, join_type="left_outer", num_partitions=width,
               on=("node",))

    def classify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        f = (np.array([v if v is not None else -1
                       for v in b["fwd_dist"].to_pylist()], np.int64)
             if "fwd_dist" in b.column_names else np.full(n, -1, np.int64))
        w = (np.array([v if v is not None else -1
                       for v in b["bwd_dist"].to_pylist()], np.int64)
             if "bwd_dist" in b.column_names else np.full(n, -1, np.int64))
        comp = np.where(
            (f >= 0) & (w >= 0), "core",
            np.where(w >= 0, "in",
                     np.where(f >= 0, "out", "other")))
        return pa.table({"node": b["node"],
                         "component": pa.array(comp.tolist(), pa.string()),
                         "fwd_dist": pa.array(f, pa.int64()),
                         "bwd_dist": pa.array(w, pa.int64())})

    return j.map_batches(classify, batch_format="pyarrow")


import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
