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


@ray.remote
def _edge_split(width: int, tbl: pa.Table, a_col: str, b_col: str):
    """Symmetrize one pair block and fan it out by src-node hash."""
    a, b = _np(tbl[a_col]), _np(tbl[b_col])
    node = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    p = node % width
    return tuple(
        pa.table({"node": node[p == i], "nbr": nbr[p == i]})
        for i in range(width)
    )


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
    return tuple(
        pa.table({"node": src[p == i], "nbr": dst[p == i]})
        for i in range(width)
    )


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
        return tuple(empty for _ in range(width))
    idx = np.searchsorted(ln, src)  # ln sorted (built via np.unique)
    lab = lv[idx]
    p = dst % width
    return tuple(
        pa.table({"node": dst[p == i], "label": lab[p == i]})
        for i in range(width)
    )


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
    parts = [_init_partition.remote(*[s[p] for s in split])
             for p in range(width)]
    edge_refs = [p[0] for p in parts]
    label_refs = [p[1] for p in parts]

    for _ in range(max_rounds):
        dyn = [_dyn_edges.options(num_returns=width).remote(width, lr)
               for lr in label_refs]
        msgs = [
            _messages.options(num_returns=width).remote(
                width, edge_refs[p], label_refs[p], *[d[p] for d in dyn])
            for p in range(width)
        ]
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

    from .grouping import drop_empty_blocks, partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

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
        j = slim.join(labels, join_type="left_outer", num_partitions=width,
                      on=(id_col,))

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

    Each round is ONE partitioned hash join of fixed-width int64 rows
    (the map joined against itself); no driver materialization. Returns
    ``(src, final, resolved)``, one row per input src."""
    import ray.data as rd

    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
    empty = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col].cast(pa.int64()),
                         "dst": b[dst_col].cast(pa.int64())})

    try:
        P = drop_empty_blocks(
            redirects_ds.map_batches(norm, batch_format="pyarrow"))
    except ValueError:
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("final", pa.int64()),
             ("resolved", pa.int64())]).empty_table())

    def as_right(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["src"], "dst_next": b["dst"]})

    for _ in range(rounds):
        right = P.map_batches(as_right, batch_format="pyarrow")
        j = P.join(right, join_type="left_outer", num_partitions=width,
                   on=("dst",))

        def jump(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "src": b["src"],
                "dst": pc.coalesce(b["dst_next"], b["dst"]),
            })

        P = drop_empty_blocks(j.map_batches(jump, batch_format="pyarrow"),
                              empty_schema=empty)

    # resolved ⇔ the landing node has no outgoing redirect
    def out_markers(b: pa.Table) -> pa.Table:
        u = pc.unique(b["src"])
        return pa.table({"dst": u,
                         "_has_out": pa.array([1] * len(u), pa.int64())})

    srcs = P.map_batches(out_markers, batch_format="pyarrow")
    j = P.join(srcs, join_type="left_outer", num_partitions=width,
               on=("dst",))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "src": b["src"],
            "final": b["dst"],
            "resolved": pc.if_else(pc.is_null(b["_has_out"]),
                                   pa.scalar(1, pa.int64()),
                                   pa.scalar(0, pa.int64())),
        })

    return j.map_batches(finish, batch_format="pyarrow")


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
    (x, y) exists — one partitioned hash join on the (x, y) pair,
    emitting each triangle exactly once.

    Scale shape: dedup and both degree attachments are fixed-width
    int64 exchanges (the two degree joins move one (edge, deg) row per
    edge); wedge generation is a ``partitioned_apply`` keyed on the apex
    (complete out-neighborhoods per partition by construction) with a
    raise-guard at ``max_wedges`` per partition — a wedge explosion
    means orientation skew (a near-clique), and silently sampling would
    break exactness. The close join and the 3-corner count fold are
    fixed-width. Nothing materializes driver-side.

    Returns (node, triangles) — one row per node in ≥1 triangle."""
    import pandas as pd
    from ray.data.aggregate import Count

    from .grouping import drop_empty_blocks, partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def canon(batch: pa.Table) -> pa.Table:
        s = _np(batch[src_col]).astype(np.int64)
        d = _np(batch[dst_col]).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    edges = drop_empty_blocks(
        (edges_ds.map_batches(canon, batch_format="pyarrow")
         .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
         .map_batches(lambda b: b.select(["a", "b"]),
                      batch_format="pyarrow")),
        empty_schema=pair_schema)

    def both_ends(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(
            np.concatenate([_np(b["a"]), _np(b["b"])]), pa.int64())})

    deg = drop_empty_blocks(
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="deg")),
        empty_schema=pa.schema([("node", pa.int64()),
                                ("deg", pa.int64())]))

    da = deg.map_batches(
        lambda b: pa.table({"a": b["node"], "deg_a": b["deg"]}),
        batch_format="pyarrow")
    db = deg.map_batches(
        lambda b: pa.table({"b": b["node"], "deg_b": b["deg"]}),
        batch_format="pyarrow")
    ed = drop_empty_blocks(
        edges.join(da, join_type="inner", num_partitions=width,
                   on=("a",)),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("deg_a", pa.int64())]))
    ed = drop_empty_blocks(
        ed.join(db, join_type="inner", num_partitions=width, on=("b",)),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("deg_a", pa.int64()),
                                ("deg_b", pa.int64())]))

    oriented_schema = pa.schema([
        ("u", pa.int64()), ("v", pa.int64()),
        ("dv", pa.int64())])

    def orient(b: pa.Table) -> pa.Table:
        a = _np(b["a"]).astype(np.int64)
        bb = _np(b["b"]).astype(np.int64)
        la = _np(b["deg_a"]).astype(np.int64)
        lb = _np(b["deg_b"]).astype(np.int64)
        # lower (deg, id) endpoint becomes the apex side
        a_first = (la < lb) | ((la == lb) & (a < bb))
        u = np.where(a_first, a, bb)
        v = np.where(a_first, bb, a)
        dv = np.where(a_first, lb, la)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "dv": pa.array(dv, pa.int64())})

    oriented = drop_empty_blocks(
        ed.map_batches(orient, batch_format="pyarrow"),
        empty_schema=oriented_schema)

    wedge_cols = ["x", "y", "apex"]

    def wedges(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in wedge_cols})
        # sort by apex then by the (deg, id) rank of the out-neighbor so
        # emitted pairs are rank-oriented (x before y), matching the
        # orientation of the edge table they probe
        pdf = pdf.sort_values(["u", "dv", "v"], kind="stable")
        u = pdf["u"].to_numpy(np.int64)
        v = pdf["v"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        ks = ends - starts
        total = int((ks * (ks - 1) // 2).sum())
        if total > max_wedges:
            raise ValueError(
                f"wedge partition would emit {total} > max_wedges="
                f"{max_wedges} candidate pairs; the orientation is "
                f"skewed (near-clique) — raise max_wedges or densify "
                f"n_parts")
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
        return pd.DataFrame({"x": xs, "y": ys, "apex": ap})

    wedge_ds = drop_empty_blocks(
        partitioned_apply(oriented, ["u"], wedges, n_parts=width),
        empty_schema=pa.schema([(c, pa.int64()) for c in wedge_cols]))

    closing = oriented.map_batches(
        lambda b: pa.table({"x": b["u"], "y": b["v"]}),
        batch_format="pyarrow")
    tri = wedge_ds.join(closing, join_type="inner", num_partitions=width,
                        on=("x", "y"))

    def corners(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate(
            [_np(b["x"]), _np(b["y"]), _np(b["apex"])]), pa.int64())})

    return drop_empty_blocks(
        tri.map_batches(corners, batch_format="pyarrow"),
        empty_schema=pa.schema([("node", pa.int64())])).groupby(
        "node").aggregate(Count(alias_name="triangles"))


def seed_distances(edges_ds, seeds, *, max_hops: int = 8,
                   src_col: str = "src", dst_col: str = "dst",
                   n_parts: int | None = None):
    """Minimum link-hop distance from a curated seed set, capped at
    ``max_hops`` — the focused-crawl horizon signal at rest: a page's BFS
    depth from the seeds is exactly the earliest wave a frontier crawl
    could reach it, so the distance table prioritizes recrawl and prunes
    frontier candidates the same way `personalized_pagerank` weights them
    (distance is the hop-metric sibling of PPR's decay mass).

    Algorithm: synchronous frontier relaxation, one round per hop. Round
    r joins the current frontier (nodes at distance exactly r — by
    induction their minimum) against the directed edge table and folds
    the (dst, r+1) candidates into the distance table with a min-groupby;
    a node's distance only ever decreases, and a node first reached at
    round r is final. ``max_hops`` bounds the rounds — unreachable-
    within-horizon nodes are absent from the output (the caller's prune
    signal), which is what keeps the loop O(max_hops) exchanges instead
    of O(diameter).

    Scale shape: the edge table dedups once, materializes once, and is
    re-probed per round via a partitioned hash join (fixed-width int64
    rows; at 256 nodes the join re-shuffles the frontier, not the edge
    corpus — the plasma-resident CC-style static partitioning in
    `connected_components` is the upgrade path if max_hops grows).
    Frontier and distance tables are one int64 pair per reached node.

    Returns (node, dist) for every node within max_hops of a seed
    (seeds at 0)."""
    from ray.data.aggregate import Count, Min

    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col].cast(pa.int64()),
                         "dst": b[dst_col].cast(pa.int64())})

    edges = drop_empty_blocks(
        (edges_ds.map_batches(norm, batch_format="pyarrow")
         .groupby(["src", "dst"]).aggregate(Count(alias_name="_c"))
         .map_batches(lambda b: b.select(["src", "dst"]),
                      batch_format="pyarrow")),
        empty_schema=edge_schema).materialize()

    seed_arr = np.unique(np.asarray(list(seeds), np.int64))
    dist = rd.from_arrow(pa.table({
        "node": pa.array(seed_arr, pa.int64()),
        "dist": pa.array(np.zeros(len(seed_arr), np.int64), pa.int64())}))

    for r in range(max_hops):
        def at_r(b: pa.Table, _r=r) -> pa.Table:
            d = _np(b["dist"]).astype(np.int64)
            keep = d == _r
            return pa.table({
                "src": pa.array(_np(b["node"]).astype(np.int64)[keep],
                                pa.int64())})

        frontier = drop_empty_blocks(
            dist.map_batches(at_r, batch_format="pyarrow"),
            empty_schema=pa.schema([("src", pa.int64())]))
        if frontier.count() == 0:
            break
        msgs = frontier.join(edges, join_type="inner",
                             num_partitions=width, on=("src",))

        def relax(b: pa.Table, _r=r) -> pa.Table:
            d = _np(b["dst"]).astype(np.int64)
            return pa.table({
                "node": pa.array(d, pa.int64()),
                "dist": pa.array(np.full(len(d), _r + 1, np.int64),
                                 pa.int64())})

        cand = drop_empty_blocks(
            msgs.map_batches(relax, batch_format="pyarrow"),
            empty_schema=dist_schema)
        dist = drop_empty_blocks(
            dist.union(cand).groupby("node").aggregate(
                Min("dist", alias_name="dist")),
            empty_schema=dist_schema).materialize()

    return dist


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
    from .grouping import drop_empty_blocks, resolve_parts

    width = resolve_parts(n_parts)
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
