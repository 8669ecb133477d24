"""Distributed-behavior tests for connected components / cluster dedup and
hybrid search — the properties the DuckDB-oracle parity check can't see:
multi-round convergence on long chains, partition independence, and the
hybrid ranking against a single-process reference computation."""

import os
import sys

import numpy as np
import pyarrow as pa

import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycrawl.ops.graph import canonical_clusters, connected_components


def _cc_dict(pairs, n_parts=8, nblocks=1):
    tbl = pa.table({"a": pa.array([a for a, _ in pairs], pa.int64()),
                    "b": pa.array([b for _, b in pairs], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(nblocks)
    out = connected_components(ds, n_parts=n_parts).take_all()
    return {r["node"]: r["label"] for r in out}


def _cc_reference(pairs):
    """Single-process union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_long_chain_converges(ray_session):
    """A 40-node chain needs many propagation rounds — exercises the
    iterate-until-fixed-point loop, not just the 1-hop init."""
    pairs = [(i, i + 1) for i in range(100, 140)]
    got = _cc_dict(pairs)
    assert got == {n: 100 for n in range(100, 141)}


def test_cc_matches_union_find_random(ray_session):
    rng = np.random.default_rng(5)
    nodes = rng.choice(500, size=(120, 2), replace=True)
    pairs = [(int(a), int(b)) for a, b in nodes if a != b]
    assert _cc_dict(pairs) == _cc_reference(pairs)


def test_cc_partition_independent(ray_session):
    """Same labels regardless of block layout and shuffle width."""
    pairs = [(i, i + 1) for i in range(0, 30, 2)] + [(3, 7), (11, 21)]
    a = _cc_dict(pairs, n_parts=8, nblocks=1)
    b = _cc_dict(pairs, n_parts=3, nblocks=7)
    assert a == b == _cc_reference(pairs)


def test_canonical_keep_marks_min(ray_session):
    tbl = pa.table({"a": pa.array([1, 2, 10], pa.int64()),
                    "b": pa.array([2, 3, 11], pa.int64())})
    out = canonical_clusters(rd.from_arrow(tbl)).take_all()
    kept = {r["doc_id"] for r in out if r["keep"] == 1}
    assert kept == {1, 10}
    assert all(r["cluster_id"] in kept for r in out)


def test_hybrid_search_matches_local(ray_session):
    """hybrid_search == the same blend computed single-process in numpy,
    including lang filter, kw substring hits and tie order."""
    from raycrawl.ops.queryside import hybrid_search

    rng = np.random.default_rng(9)
    n, dim = 300, 8
    texts = [f"alpha beta{' gamma' if i % 3 == 0 else ''}"
             f"{' delta' if i % 5 == 0 else ''} {i}" for i in range(n)]
    langs = ["en" if i % 2 == 0 else "fr" for i in range(n)]
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    docs = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts), "lang": pa.array(langs)})
    embs = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(list(emb),
                                           pa.list_(pa.float32()))})
    q = emb[0].astype(np.float64)
    terms = ["gamma", "delta"]
    out = hybrid_search(rd.from_arrow(docs).repartition(5),
                        rd.from_arrow(embs).repartition(4),
                        terms, q, semantic_ratio=0.5, limit=15, lang="en")

    # local reference
    qn = q / np.linalg.norm(q)
    rows = []
    for i in range(n):
        if langs[i] != "en":
            continue
        hits = sum(1 for t in terms if t in texts[i].lower())
        v = emb[i].astype(np.float64)
        cos = float(v @ qn / np.linalg.norm(v))
        rows.append((0.5 * hits / len(terms) + 0.5 * (1 + cos) / 2, -i, i, hits))
    rows.sort(reverse=True)
    want = [(r + 1, i, h) for r, (_, _, i, h) in enumerate(rows[:15])]
    got = [(r["rank"], r["doc_id"], r["kw_hits"]) for r in out.to_pylist()]
    assert got == want


def test_components_empty_partitions_survive_rename_join(ray_session, tmp_path):
    """Regression: with far fewer duplicate nodes than partitions, label
    partitions come back empty — and a partition holding only a CANONICAL
    node produces a zero-row drops block after the rename. Acero rejects
    even correctly-typed zero-row blocks on a join side, so the dedup
    query must strip empties (and skip the join when nothing drops)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    dup = "the same exact text body repeated for the dedup test"
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([dup, dup, dup,
                          "a completely different document body"], pa.string()),
        "n_chars": pa.array([len(dup)] * 3 + [36], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    kept = entrymod.q_dedup_kept_docs(str(tmp_path)).to_pandas()
    # component {1,2,3} keeps min id 1; unique doc 4 survives untouched
    assert sorted(kept["doc_id"]) == [1, 4]


def test_cluster_representatives_longest_wins(ray_session):
    """Longest doc per cluster wins (ties -> min id); singletons represent
    themselves; every input doc gets exactly one row."""
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.ops.graph import cluster_representatives

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["aa", "aaaa", "aaaa", "bb", "ccc"]),
    })
    # one component {1,2,3} (chain), doc 4 and 5 singletons
    pairs = pa.table({"a": pa.array([1, 2], pa.int64()),
                      "b": pa.array([2, 3], pa.int64())})
    out = (cluster_representatives(rd.from_arrow(docs).repartition(3),
                                   rd.from_arrow(pairs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["cluster_id"].tolist() == [1, 1, 1, 4, 5]
    # docs 2 and 3 tie at 4 chars -> min id 2 wins, NOT min-id-overall 1
    assert out["is_rep"].tolist() == [0, 1, 0, 1, 1]
    assert out["n_chars"].tolist() == [2, 4, 4, 2, 3]


def test_cluster_representatives_no_pairs_all_singletons(ray_session):
    """Review regression: a pair-less corpus (every doc distinct) must
    return all-singleton representatives, not crash on the empty labels
    join side; custom id_col exercises the empty-partition schema path."""
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.ops.graph import cluster_representatives

    docs = pa.table({
        "page_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["one", "two two"]),
    })
    empty_pairs = pa.table({"a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64())})
    out = (cluster_representatives(rd.from_arrow(docs),
                                   rd.from_arrow(empty_pairs),
                                   id_col="page_id")
           .to_pandas().sort_values("page_id").reset_index(drop=True))
    assert out["cluster_id"].tolist() == [10, 11]
    assert out["is_rep"].tolist() == [1, 1]


def test_resolve_redirects_chains_cycles_and_depth(ray_session):
    import ray.data as rd
    from raycrawl.ops.graph import resolve_redirects

    # chain 5->4->3->2->1->0 (0 terminal), 2-cycle 10<->11, self-loop 20
    edges = [{"src": i, "dst": i - 1} for i in range(1, 6)]
    edges += [{"src": 10, "dst": 11}, {"src": 11, "dst": 10},
              {"src": 20, "dst": 20}]
    out = resolve_redirects(rd.from_items(edges).repartition(3),
                            rounds=3).to_pandas()
    got = {r.src: (r.final, r.resolved) for r in out.itertuples()}
    assert len(got) == 8
    for i in range(1, 6):
        assert got[i] == (0, 1)
    # even cycle: f^8 = identity; landing node still has an out-edge
    assert got[10] == (10, 0) and got[11] == (11, 0)
    assert got[20] == (20, 0)

    # chain longer than 2^rounds stays unresolved at its f^(2^r) hop
    long = [{"src": i, "dst": i - 1} for i in range(1, 12)]
    out2 = resolve_redirects(rd.from_items(long), rounds=3).to_pandas()
    g2 = {r.src: (r.final, r.resolved) for r in out2.itertuples()}
    assert g2[11] == (3, 0)   # 8 hops from 11 lands on 3, which redirects
    assert g2[8] == (0, 1)

    # empty input keeps the output schema
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    out3 = resolve_redirects(empty)
    # to_pandas() drops columns on empty Datasets; the SCHEMA is the check
    assert out3.schema().names == ["src", "final", "resolved"]
    assert out3.count() == 0
