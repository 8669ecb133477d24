"""Query-side operators: federated merge-dedup, semantic rerank, safety
filter (SURVEY.md §2 J4/J5, O4/O5, M25/M26 — the reference's
scatter-gather-merge-rerank DAG re-expressed as batch Dataset ops).

Cites into /root/reference/meilisearchcrawler/api/services/:
- ``merge_results``   — merger.py:32-95: primary results first (weighted
  w1), secondary deduped against them by normalized URL (weighted w2),
  sort by score desc, limit.
- ``normalize_merge_url`` — merger.py:97-130: lowercase host, strip
  ``www.``, rstrip path ``/``, drop fragment, KEEP query.
- ``rerank_topk``     — reranker.py:23-92: cosine vs query embedding on
  rows that have vectors, ×0.1 penalty on rows without, sort desc, top-k.
- ``SafetyFilter``    — safety.py:103-188: domain whitelist/blacklist,
  keyword blocklist over url/title/excerpt+content, regex patterns over
  combined text.

Scores are returned ×1e6 as integers (score_ppm) so DuckDB oracles
hash-match exactly.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa


def normalize_merge_url(url: str) -> str:
    parsed = urlparse(str(url))
    netloc = parsed.netloc.lower()
    if netloc.startswith("www."):
        netloc = netloc[4:]
    path = parsed.path.rstrip("/")
    normalized = f"{parsed.scheme}://{netloc}{path}"
    if parsed.query:
        normalized += f"?{parsed.query}"
    return normalized


def merge_results(primary_ds, secondary_ds, w_primary: float = 0.7,
                  w_secondary: float = 0.3, limit: int = 20):
    """Federated merge: normalized-URL dedup with first-source-wins priority
    and per-source score weights, global sort desc, limit.

    Expressed Ray-natively: tag each side with priority, weight the scores
    vectorized, groupby(norm_url) keep min priority, sort + limit. Both
    sides stream; only the final top-``limit`` reaches the driver."""

    def tag(prio: int, weight: float):
        def fn(batch: pa.Table) -> pa.Table:
            urls = batch["url"].to_pylist()
            scores = np.asarray(batch["score"].to_pylist(), dtype=np.float64)
            return pa.table(
                {
                    "url": batch["url"],
                    "title": batch["title"],
                    "norm_url": pa.array([normalize_merge_url(u) for u in urls],
                                         pa.string()),
                    "priority": pa.array([prio] * len(urls), pa.int32()),
                    "score_ppm": pa.array(
                        np.floor(scores * weight * 1_000_000 + 0.5).astype(np.int64)
                    ),
                }
            )

        return fn

    tagged = primary_ds.map_batches(tag(0, w_primary), batch_format="pyarrow").union(
        secondary_ds.map_batches(tag(1, w_secondary), batch_format="pyarrow")
    )

    def first_wins(gdf):
        import pandas as pd  # noqa: F401

        frames = []
        for _, g in gdf.groupby("norm_url", sort=True):
            frames.append(g.sort_values("priority", kind="stable").head(1))
        import pandas as pd

        return pd.concat(frames) if frames else gdf.iloc[0:0]

    from .grouping import partitioned_apply

    deduped = partitioned_apply(tagged, ["norm_url"], first_wins)
    return deduped.sort(["score_ppm", "norm_url"], descending=[True, False]).limit(limit)


def join_embeddings(results_ds, emb_ds, id_col: str = "doc_id",
                    vec_id_col: str = "vec_id", n_parts: int | None = None):
    """Attach each result row's embedding via a partitioned hash join —
    the vector-attach step between merge and rerank in the reference's
    search DAG (the reranker reads ``_vectors`` off each hit).

    Acero (under ``Dataset.join``) rejects ``list<float>`` payload columns,
    so embeddings cross the exchange packed as fixed_size_binary
    (zero-copy from the float32 buffer) and unpack to ``list<float64>``
    on the result side. Rows whose id has no embedding are dropped
    (inner join) — nullify afterwards to simulate vector-less hits."""
    from .grouping import resolve_parts

    def pack_emb(batch: pa.Table) -> pa.Table:
        arr = batch["embedding"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        mat = np.ascontiguousarray(
            np.asarray(arr.flatten(), dtype=np.float32)
        ).reshape(len(batch), -1)
        width = mat.shape[1] * 4
        bin_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(mat), [None, pa.py_buffer(mat.tobytes())]
        )
        return pa.table({vec_id_col: batch[vec_id_col].cast(pa.int64()),
                         "emb_bin": bin_arr})

    packed = emb_ds.map_batches(pack_emb, batch_format="pyarrow")
    joined = results_ds.join(packed, join_type="inner",
                             num_partitions=resolve_parts(n_parts),
                             on=(id_col,), right_on=(vec_id_col,))

    def unpack(batch: pa.Table) -> pa.Table:
        col = batch["emb_bin"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        width = col.type.byte_width
        mat = np.frombuffer(
            col.buffers()[1], dtype=np.float32,
            count=len(col) * (width // 4), offset=col.offset * width,
        ).reshape(len(col), -1).astype(np.float64)
        out = batch.drop_columns(["emb_bin"])
        return out.append_column(
            "embedding", pa.array(list(mat), pa.list_(pa.float64())))

    return joined.map_batches(unpack, batch_format="pyarrow")


def rerank_topk(results_ds, query_embedding: np.ndarray, top_k: int = 10):
    """Semantic rerank: cosine(query, row.embedding) replaces the score for
    rows with vectors; rows without keep score×0.1 (reranker.py:77-81);
    global sort desc + top-k. Query embedding broadcast once."""
    import ray

    qn = np.asarray(query_embedding, dtype=np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        embs = batch["embedding"].to_pylist()
        scores = np.asarray(batch["score"].to_pylist(), dtype=np.float64)
        out = np.empty(len(embs), dtype=np.float64)
        for i, e in enumerate(embs):
            if e:
                v = np.asarray(e, dtype=np.float64)
                n = np.linalg.norm(v)
                out[i] = float(v @ q / n) if n else 0.0
            else:
                out[i] = scores[i] * 0.1
        return pa.table(
            {
                "url": batch["url"],
                "score_ppm": pa.array(
                    np.floor(out * 1_000_000 + 0.5).astype(np.int64)
                ),
            }
        )

    scored = results_ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score_ppm", "url"], descending=[True, False]).limit(top_k)


def hybrid_search(docs_ds, emb_ds, query_terms: list[str],
                  query_embedding: np.ndarray, semantic_ratio: float = 0.5,
                  limit: int = 20, lang: str | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  vec_id_col: str = "vec_id", emb_col: str = "embedding",
                  n_parts: int | None = None):
    """Hybrid keyword+vector search — the reference's Meilisearch hybrid
    query (meilisearch_client.py:100-122: searchable attributes, optional
    ``lang`` filter, ``Hybrid(semantic_ratio=0.5)``, ranking score, top
    ``limit``), re-expressed over Parquet columns with a documented score:

        score = (1-ratio) · |terms present in lower(text)| / |terms|
              + ratio · (1 + cosine(query_emb, doc_emb)) / 2

    (the keyword leg is a deterministic stand-in for Meilisearch's internal
    keyword ranking; the semantic leg is its cosine similarity mapped to
    [0,1]). Returns (rank, doc_id, kw_hits) — rank 1-based by score desc,
    doc_id asc.

    Scale shape: the lang filter and keyword scan run BEFORE the join so
    the wide text column never crosses a shuffle; docs⋈embeddings is a
    partitioned hash join (both sides too big to broadcast at corpus
    scale); the query vector is broadcast once via ray.put; each batch
    emits only its local top-``limit`` partial, so the driver merges
    O(blocks·limit) fixed-width rows."""
    import ray
    import pyarrow.compute as pc

    from .grouping import resolve_parts

    terms = [t.lower() for t in query_terms]
    qn = np.asarray(query_embedding, dtype=np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    q_ref = ray.put(qn)

    def kw_score(batch: pa.Table) -> pa.Table:
        if lang is not None:
            batch = batch.filter(pc.equal(batch["lang"], lang))
        low = pc.utf8_lower(batch[text_col])
        hits = np.zeros(len(batch), dtype=np.int64)
        for t in terms:
            hits += np.asarray(pc.match_substring(low, t), dtype=np.int64)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         "kw_hits": pa.array(hits)})

    kw = docs_ds.map_batches(kw_score, batch_format="pyarrow")

    # Acero (the join kernel under Dataset.join) rejects list<float> payload
    # columns — pack each embedding into fixed_size_binary for the shuffle
    # (zero-copy from the float32 buffer) and unpack on the far side.
    def pack_emb(batch: pa.Table) -> pa.Table:
        arr = batch[emb_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        mat = np.ascontiguousarray(
            np.asarray(arr.flatten(), dtype=np.float32)
        ).reshape(len(batch), -1)
        width = mat.shape[1] * 4
        bin_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(mat), [None, pa.py_buffer(mat.tobytes())]
        )
        return pa.table({vec_id_col: batch[vec_id_col].cast(pa.int64()),
                         "emb_bin": bin_arr})

    packed = emb_ds.map_batches(pack_emb, batch_format="pyarrow")
    joined = kw.join(packed, join_type="inner",
                     num_partitions=resolve_parts(n_parts),
                     on=(id_col,), right_on=(vec_id_col,))

    def blend_partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        hits = np.asarray(batch["kw_hits"], dtype=np.int64)
        col = batch["emb_bin"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        width = col.type.byte_width
        mat = np.frombuffer(
            col.buffers()[1], dtype=np.float32,
            count=len(col) * (width // 4), offset=col.offset * width,
        ).reshape(len(col), -1).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat / norms[:, None]) @ q
        score = ((1.0 - semantic_ratio) * hits / max(len(terms), 1)
                 + semantic_ratio * (1.0 + cos) / 2.0)
        kk = min(limit, len(ids))
        idx = np.lexsort((ids, -score))[:kk]
        return pa.table({
            "doc_id": pa.array(ids[idx]),
            "kw_hits": pa.array(hits[idx]),
            "score": pa.array(score[idx], pa.float64()),
        })

    partials = joined.map_batches(blend_partial,
                                  batch_format="pyarrow").take_all()
    rows = sorted(partials, key=lambda r: (-r["score"], r["doc_id"]))[:limit]
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "kw_hits": pa.array([r["kw_hits"] for r in rows], pa.int64()),
    })


class SafetyFilter:
    """Vectorizable row filter with broadcast config (safety.py:103-188)."""

    def __init__(self, allowed_domains: list[str] = (), blocked_domains: list[str] = (),
                 blocked_keywords: list[str] = (), blocked_patterns: list[str] = ()):
        self.allowed = set(allowed_domains)
        self.blocked = set(blocked_domains)
        self.keywords = [k.lower() for k in blocked_keywords]
        self.patterns = [re.compile(p, re.IGNORECASE) for p in blocked_patterns]

    @staticmethod
    def _domain(url: str) -> str:
        d = urlparse(str(url)).netloc.lower()
        return d[4:] if d.startswith("www.") else d

    def is_safe(self, url: str, title: str, excerpt: str | None,
                content: str | None) -> bool:
        domain = self._domain(url)
        if self.allowed and domain not in self.allowed:
            return False
        if domain in self.blocked:
            return False
        url_l = str(url).lower()
        if any(k in url_l for k in self.keywords):
            return False
        title_l = (title or "").lower()
        if any(k in title_l for k in self.keywords):
            return False
        text_l = (excerpt or "").lower()
        if content:
            text_l += " " + content.lower()
        if any(k in text_l for k in self.keywords):
            return False
        combined = f"{title} {excerpt or ''} {content or ''}"
        if any(p.search(combined) for p in self.patterns):
            return False
        return True

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [
            self.is_safe(u, t, e, c)
            for u, t, e, c in zip(
                batch["url"].to_pylist(), batch["title"].to_pylist(),
                batch["excerpt"].to_pylist() if "excerpt" in batch.schema.names else [None] * batch.num_rows,
                batch["content"].to_pylist() if "content" in batch.schema.names else [None] * batch.num_rows,
            )
        ]
        return batch.filter(pa.array(mask, pa.bool_()))


def facet_distribution(docs_ds, query: str, facets=("source", "lang"),
                       text_col: str = "text"):
    """Meilisearch-style facet distribution: per-facet value counts over
    the FULL matching set of a query (not just the returned page) — the
    sidebar counts a search UI renders, and the rollup the reference's
    indexing-status report reads (check_indexing_status.py:61-67,
    ``index.search("", facets=['site'], limit=0)``). An empty query
    matches everything, reproducing that per-site index census exactly.

    Matching is the conjunctive whitespace-token rule the rest of the
    query tier uses: a doc matches when every query token appears among
    its tokens. Scale shape: the match test and per-facet Counter
    partials run in ONE in-block pass (text never crosses a shuffle);
    the exchange carries (facet, value, partial count) rows into a
    small Sum groupby. Returns (facet, value, count) sorted."""
    import pandas as pd

    from ray.data.aggregate import Sum

    q_toks = [t for t in (query or "").split(" ") if t]

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        if q_toks:
            mask = []
            for t in texts:
                toks = set((t or "").split(" "))
                mask.append(all(q in toks for q in q_toks))
        else:
            mask = [True] * len(texts)
        fs, vs, cs = [], [], []
        for f in facets:
            vals = batch[f].to_pylist()
            cnt: dict = {}
            for m, v in zip(mask, vals):
                if m:
                    v = v if v is not None else ""
                    cnt[v] = cnt.get(v, 0) + 1
            for v in sorted(cnt):
                fs.append(f)
                vs.append(v)
                cs.append(cnt[v])
        return pa.table({"facet": pa.array(fs, pa.string()),
                         "value": pa.array(vs, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["facet", "value"])
           .aggregate(Sum("c", alias_name="count")))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["facet"], r["value"]))
    return pa.table({
        "facet": pa.array([r["facet"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.string()),
        "count": pa.array([r["count"] for r in rows], pa.int64())})


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
