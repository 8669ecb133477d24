"""Host/source-level corpus curation: per-source quality gating and
anchor-text aggregation over the link graph.

Large webtext builds (RefinedWeb, C4, CCNet) all apply *host-level*
filters on top of per-document ones: a host whose documents are
systematically short/boilerplate gets blocklisted wholesale (the UT1
blocklist pattern), and the anchor texts pointing AT a page are a
classic quality/relevance signal aggregated per target (the original
PageRank-era web-corpus feature). The reference crawler's per-site
``max_pages``/exclude lists (crawler.py:368-378) are the single-site
ancestor of these; here they become distributed corpus operators.

Scale shape:
- ``source_quality_filter``: stage 1 moves only (source, n_docs,
  sum_chars) per-batch partials into a #sources-row groupby; the
  per-source stats table is tiny BY CONSTRUCTION (hosts, not docs) and
  is broadcast once via ``ray.put`` — guarded by ``max_sources`` so a
  corpus with a pathological source cardinality raises instead of
  silently broadcasting something corpus-sized. The doc pass is then
  shuffle-free.
- ``anchor_stats``: anchors are pre-aggregated per batch (pandas
  groupby on (dst, anchor) — counts, never raw rows), so the exchange
  carries one fixed-width row per distinct (dst, anchor) per batch;
  the second groupby reduces per dst. Anchor strings are short by
  construction (they're link labels); document text never crosses a
  shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def source_quality_filter(docs_ds, *, id_col: str = "doc_id",
                          source_col: str = "source",
                          chars_col: str = "n_chars",
                          max_sources: int = 1_000_000):
    """Block sources whose mean document length falls below the corpus
    mean. Scale-free rule (no tuned constant): source kept iff
    ``sum_chars(source) * total_docs >= total_chars * n_docs(source)``
    — the integer cross-multiplied form of
    ``mean(source) >= mean(corpus)``, so the Ray path and the SQL
    oracle compare exact integers, never floats.

    Returns one row per document:
    ``(doc_id, source, src_docs, src_chars, keep_source)``.
    """
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch[source_col].to_pylist(),
            "n": 1,
            "c": batch[chars_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("source", as_index=False).agg(
            n=("n", "sum"), c=("c", "sum"))
        return pa.table({
            "source": pa.array(g["source"], pa.string()),
            "n": pa.array(g["n"].astype("int64")),
            "c": pa.array(g["c"].astype("int64")),
        })

    stats = (docs_ds.map_batches(partials, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("n", alias_name="src_docs"),
                        Sum("c", alias_name="src_chars")))
    rows = stats.take(max_sources + 1)
    if len(rows) > max_sources:
        raise ValueError(
            f"source_quality_filter: >{max_sources} distinct sources; "
            "the per-source stats table must stay broadcast-small — "
            "raise max_sources only if it truly fits every worker")
    total_docs = sum(r["src_docs"] for r in rows)
    total_chars = sum(r["src_chars"] for r in rows)
    table_ref = ray.put({
        r["source"]: (int(r["src_docs"]), int(r["src_chars"]))
        for r in rows})

    def tag(batch: pa.Table) -> pa.Table:
        lut = ray.get(table_ref)
        srcs = batch[source_col].to_pylist()
        nd, nc, keep = [], [], []
        for s in srcs:
            n, c = lut[s]
            nd.append(n)
            nc.append(c)
            keep.append(int(c * total_docs >= total_chars * n))
        return pa.table({
            "doc_id": batch[id_col],
            "source": batch[source_col],
            "src_docs": pa.array(nd, pa.int64()),
            "src_chars": pa.array(nc, pa.int64()),
            "keep_source": pa.array(keep, pa.int64()),
        })

    return docs_ds.map_batches(tag, batch_format="pyarrow")


def anchor_stats(edges_ds, *, dst_col: str = "dst",
                 anchor_col: str = "anchor"):
    """Aggregate the anchor texts pointing at each target: in-link count,
    distinct-anchor count, and the lexicographically smallest anchor (a
    deterministic representative — ties can't flap across partitionings).

    ``edges_ds`` carries (dst, anchor) — one row per link. Returns
    ``(doc_id, n_links, n_distinct_anchors, top_anchor)`` keyed by dst.
    """
    from ray.data.aggregate import Count, Min, Sum

    def pair_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "dst": batch[dst_col].to_numpy(zero_copy_only=False),
            "anchor": batch[anchor_col].to_pylist(),
            "cnt": 1,
        })
        g = df.groupby(["dst", "anchor"], as_index=False)["cnt"].sum()
        return pa.table({
            "dst": pa.array(g["dst"].astype("int64")),
            "anchor": pa.array(g["anchor"], pa.string()),
            "cnt": pa.array(g["cnt"].astype("int64")),
        })

    pairs = (edges_ds.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["dst", "anchor"])
             .aggregate(Sum("cnt", alias_name="cnt")))
    out = (pairs.groupby("dst")
           .aggregate(Sum("cnt", alias_name="n_links"),
                      Count(alias_name="n_distinct_anchors"),
                      Min("anchor", alias_name="top_anchor")))
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["dst"].cast(pa.int64()),
            "n_links": t["n_links"].cast(pa.int64()),
            "n_distinct_anchors": t["n_distinct_anchors"].cast(pa.int64()),
            "top_anchor": t["top_anchor"],
        }),
        batch_format="pyarrow")


def length_outlier_filter(docs_ds, *, fence_halves: int = 1,
                          id_col: str = "doc_id",
                          source_col: str = "source",
                          chars_col: str = "n_chars",
                          max_sources: int = 1_000_000):
    """Tukey-fence length-outlier filter per source: keep a document iff
    ``q1 − f·IQR ≤ n_chars ≤ q3 + f·IQR`` within its source, where
    ``f = fence_halves/2`` (the classic 1.5·IQR fence is
    ``fence_halves=3``; the default 0.5·IQR is a tight curation fence).
    Compared integer-cross-multiplied — ``2·n_chars`` vs
    ``2·q1 − fence_halves·IQR`` — so no float ever enters the gate.

    Quantiles are EXACT per-source discrete quantiles from
    ``quantiles.group_quantiles`` (one range-partitioned sort, metadata
    rank arithmetic — no group materializes anywhere); the per-source
    fence table is tiny by construction and broadcast once via
    ``ray.put`` under the same ``max_sources`` guard as
    ``source_quality_filter``. The doc pass is shuffle-free.

    Returns ``(doc_id, source, n_chars, q1, q3, keep_len)`` per doc."""
    import ray

    from .quantiles import group_quantiles

    q = group_quantiles(docs_ds, source_col, chars_col,
                        {"q1": 0.25, "q3": 0.75})
    if q.num_rows > max_sources:
        raise ValueError(
            f"length_outlier_filter: >{max_sources} distinct sources; "
            "the fence table must stay broadcast-small")
    # discrete quantiles ARE input elements — integral by construction
    lut_ref = ray.put({
        s: (int(a), int(b))
        for s, a, b in zip(q[source_col].to_pylist(),
                           q["q1"].to_pylist(), q["q3"].to_pylist())})

    def tag(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        srcs = batch[source_col].to_pylist()
        chars = batch[chars_col].to_pylist()
        q1s, q3s, keep = [], [], []
        for s, c in zip(srcs, chars):
            q1, q3 = lut[s]
            iqr = q3 - q1
            q1s.append(q1)
            q3s.append(q3)
            keep.append(int(2 * c >= 2 * q1 - fence_halves * iqr
                            and 2 * c <= 2 * q3 + fence_halves * iqr))
        return pa.table({
            "doc_id": batch[id_col],
            "source": batch[source_col],
            "n_chars": pa.array(chars, pa.int64()),
            "q1": pa.array(q1s, pa.int64()),
            "q3": pa.array(q3s, pa.int64()),
            "keep_len": pa.array(keep, pa.int64()),
        })

    return docs_ds.map_batches(tag, batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def corpus_report(docs_ds, *, source_col: str = "source",
                  max_sources: int = 1_000_000):
    """Per-source corpus health report — the curation dashboard rollup a
    100-TB pipeline runs after every ingest (the corpus-level analogue of
    the reference's per-site CrawlStats summary, crawler.py:806-827):
    document count, WITHIN-SOURCE exact-duplicate mass, language mix, and
    total character volume, one row per source.

    Scale shape: three fixed-width partial passes, no document text ever
    crosses an exchange — (source, md5) distinct rows for the dup count
    (two small groupbys), (source, lang, n) Counter partials for the mix,
    (source, n, chars) partials for volume. The per-source result tables
    are bounded by #sources × #langs (``max_sources`` guard raises
    otherwise) and assemble on the driver.

    Returns (source, n_docs, n_distinct_texts, dup_ppm, n_langs,
    top_lang, total_chars); top_lang ties break lexicographically;
    dup_ppm = (n_docs − n_distinct)·10⁶ // n_docs."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..ops.dedup import add_text_hash

    def hash_rows(batch: pa.Table) -> pa.Table:
        h = add_text_hash(batch)
        return pa.table({source_col: batch[source_col],
                         "text_hash": h["text_hash"]})

    distinct = (docs_ds.map_batches(hash_rows, batch_format="pyarrow")
                .groupby([source_col, "text_hash"]).count()
                .map_batches(lambda t: pa.table(
                    {source_col: t[source_col],
                     "n_distinct": pa.array([1] * t.num_rows, pa.int64())}),
                    batch_format="pyarrow")
                .groupby(source_col)
                .aggregate(Sum("n_distinct", alias_name="n_distinct")))

    def vol_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        chars = Counter()
        langs = Counter()
        for s, lg, nc in zip(batch[source_col].to_pylist(),
                             batch["lang"].to_pylist(),
                             batch["n_chars"].to_pylist()):
            # coerce nulls/non-strings: a None lang would make the
            # sorted() key mix str and NoneType and crash the report —
            # fold them into the empty-string bucket instead
            s, lg = str(s or ""), (lg or "")
            c[s] += 1
            chars[s] += int(nc or 0)
            langs[(s, lg)] += 1
        srcs = sorted(c)
        lang_keys = sorted(langs)
        return pa.table({
            "kind": pa.array(["vol"] * len(srcs) + ["lang"] * len(lang_keys),
                             pa.string()),
            source_col: pa.array(srcs + [k[0] for k in lang_keys],
                                 pa.string()),
            "lang": pa.array([""] * len(srcs) + [k[1] for k in lang_keys],
                             pa.string()),
            "n": pa.array([c[s] for s in srcs]
                          + [langs[k] for k in lang_keys], pa.int64()),
            "chars": pa.array([chars[s] for s in srcs]
                              + [0] * len(lang_keys), pa.int64()),
        })

    partials = (docs_ds.map_batches(vol_partials, batch_format="pyarrow")
                .groupby(["kind", source_col, "lang"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("chars", alias_name="chars")))

    # one 'vol' row per source plus one 'lang' row per (source, lang)
    # group — guard each quantity separately so the error names the one
    # that actually overflowed
    rows = partials.take(2 * max_sources + 2)
    n_vol = sum(1 for r in rows if r["kind"] == "vol")
    n_lang = len(rows) - n_vol
    if n_vol > max_sources or n_lang > max_sources:
        kind = "sources" if n_vol > max_sources else "(source, lang) groups"
        raise ValueError(
            f"corpus_report: >{max_sources} {kind}; this report assembles "
            "driver-side — raise max_sources only if it truly fits")
    d_rows = distinct.take(max_sources + 1)

    n_docs, total_chars, lang_counts = {}, {}, {}
    for r in rows:
        if r["kind"] == "vol":
            n_docs[r[source_col]] = r["n"]
            total_chars[r[source_col]] = r["chars"]
        else:
            lang_counts.setdefault(r[source_col], []).append(
                (r["lang"], r["n"]))
    n_distinct = {r[source_col]: r["n_distinct"] for r in d_rows}

    srcs = sorted(n_docs)
    top_lang, n_langs = {}, {}
    for s in srcs:
        lc = sorted(lang_counts.get(s, []), key=lambda kv: (-kv[1], kv[0]))
        top_lang[s] = lc[0][0] if lc else ""
        n_langs[s] = len(lc)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array([n_docs[s] for s in srcs], pa.int64()),
        "n_distinct_texts": pa.array([n_distinct[s] for s in srcs],
                                     pa.int64()),
        "dup_ppm": pa.array(
            [(n_docs[s] - n_distinct[s]) * 1_000_000 // n_docs[s]
             for s in srcs], pa.int64()),
        "n_langs": pa.array([n_langs[s] for s in srcs], pa.int64()),
        "top_lang": pa.array([top_lang[s] for s in srcs], pa.string()),
        "total_chars": pa.array([total_chars[s] for s in srcs], pa.int64()),
    })


def corpus_rollup(docs_ds, *, source_col: str = "source",
                  lang_col: str = "lang", chars_col: str = "n_chars"):
    """OLAP rollup of corpus volume at FOUR grains in ONE distributed pass
    — (source, lang), source, lang, and grand total — the GROUPING SETS
    cube a corpus dashboard reads without re-scanning 100 TB per grain.

    Scale shape: each batch pandas-groupbys (source, lang) once, then
    derives the three coarser partials from that tiny in-block table, so
    the single exchange carries ≤ 4× the realized (source × lang)
    cardinality per batch (bounded by grain cardinality, not rows) into
    one fixed-schema Sum groupby. Null/odd keys coerce to '' exactly like
    `corpus_report`. Returns (grain, source, lang, docs, chars) with ''
    in grouped-out key columns; grain ∈
    {'source_lang','source','lang','all'}."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = pd.DataFrame({
            "source": [str(s) if s is not None else ""
                       for s in batch[source_col].to_pylist()],
            "lang": [lg or "" for lg in batch[lang_col].to_pylist()],
            "chars": pc.fill_null(
                batch[chars_col].cast(pa.int64()), 0).to_numpy(
                zero_copy_only=False),
        })
        sl = df.groupby(["source", "lang"], as_index=False).agg(
            docs=("chars", "size"), chars=("chars", "sum"))
        s = sl.groupby("source", as_index=False).agg(
            docs=("docs", "sum"), chars=("chars", "sum"))
        lg = sl.groupby("lang", as_index=False).agg(
            docs=("docs", "sum"), chars=("chars", "sum"))
        frames = [
            pd.DataFrame({"grain": "source_lang", "source": sl["source"],
                          "lang": sl["lang"], "docs": sl["docs"],
                          "chars": sl["chars"]}),
            pd.DataFrame({"grain": "source", "source": s["source"],
                          "lang": "", "docs": s["docs"],
                          "chars": s["chars"]}),
            pd.DataFrame({"grain": "lang", "source": "",
                          "lang": lg["lang"], "docs": lg["docs"],
                          "chars": lg["chars"]}),
            pd.DataFrame({"grain": ["all"], "source": [""], "lang": [""],
                          "docs": [int(sl["docs"].sum())],
                          "chars": [int(sl["chars"].sum())]}),
        ]
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "grain": pa.array(out["grain"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "docs": pa.array(out["docs"].to_numpy(np.int64), pa.int64()),
            "chars": pa.array(out["chars"].to_numpy(np.int64), pa.int64()),
        })

    return (docs_ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["grain", "source", "lang"])
            .aggregate(Sum("docs", alias_name="docs"),
                       Sum("chars", alias_name="chars")))


def host_concentration(docs_ds, *, source_col: str = "source"):
    """Crawl-skew concentration report: how unevenly the corpus spreads
    over hosts — the single number that predicts shuffle skew and
    politeness stalls at 100 TB (a Gini near 1 means a handful of hosts
    dominate every host-keyed exchange and rate-limit shard). One row:

    - ``n_hosts``, ``total_docs``
    - ``top_share_ppm``  = floor(1e6 · max_host_docs / total)
    - ``hhi_ppm``        = floor(1e6 · Σ c_i² / total²)  (Herfindahl)
    - ``gini_ppm``       = floor(1e6 · (2·Σ i·c_(i) − (k+1)·total)
                                  / (k·total)), counts sorted ASC,
      1-based rank i — the classic exact mean-difference form.

    All integer-exact (Python bignums clear the quadratic products).

    Scale shape: one groupby(source).Count() — fixed-width rows — then a
    global sort of the PER-HOST table (O(hosts) rows, not docs) and
    per-block rank partials: each sorted block contributes
    (rows, Σc, Σ j·c_j local, Σc², min-key), the driver re-bases local
    ranks with prefix row counts — O(blocks) driver rows, the host table
    itself never concentrates on the driver."""
    import numpy as np
    from ray.data.aggregate import Count

    counts = docs_ds.groupby(source_col).aggregate(
        Count(alias_name="n")).sort(["n", source_col])

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["n"], np.int64)
        j = np.arange(len(c), dtype=np.int64)
        return pa.table({
            "rows": pa.array([len(c)], pa.int64()),
            "s": pa.array([int(c.sum())], pa.int64()),
            "w": pa.array([int((j * c).sum())], pa.int64()),
            "sq": pa.array([int((c * c).sum())], pa.int64()),
            "mx": pa.array([int(c.max())], pa.int64()),
            "min_n": pa.array([int(c[0])], pa.int64()),
            "min_src": pa.array([str(batch[source_col][0])], pa.string()),
        })

    parts = [r for r in counts.map_batches(
        partial, batch_format="pyarrow").take_all() if r["rows"]]
    # blocks of a sorted dataset are disjoint key ranges ((n, source) is
    # unique per row) — re-establish block order by each block's min key
    parts.sort(key=lambda r: (r["min_n"], r["min_src"]))
    k = sum(r["rows"] for r in parts)
    if k == 0:
        raise ValueError("host_concentration: empty corpus")
    total = sum(r["s"] for r in parts)
    w = 0
    off = 0
    for r in parts:
        w += r["w"] + off * r["s"]
        off += r["rows"]
    sum_i_c = w + total            # 1-based ranks: Σ(j+1)·c = W + Σc
    sq = sum(r["sq"] for r in parts)
    mx = max(r["mx"] for r in parts)
    return pa.table({
        "n_hosts": pa.array([k], pa.int64()),
        "total_docs": pa.array([total], pa.int64()),
        "top_share_ppm": pa.array([1_000_000 * mx // total], pa.int64()),
        "hhi_ppm": pa.array([1_000_000 * sq // (total * total)],
                            pa.int64()),
        "gini_ppm": pa.array(
            [1_000_000 * (2 * sum_i_c - (k + 1) * total) // (k * total)],
            pa.int64()),
    })


def page_tree(docs_ds, *, url_col: str = "url", site_col: str = "site",
              age_col: str = "age_days", max_depth: int = 2):
    """URL path-tree rollup with freshness buckets — the distributed
    form of the reference dashboard's Page Tree view
    (dashboard/pages/15_Page_Tree.py:140-147: path segments =
    non-empty ``split('/')`` parts of the URL path; :122-127: freshness
    buckets on days since indexing at <1 / <7 / <30 / <90 / else).
    One row per (site, level-1 .. level-``max_depth`` path prefix) with
    page count and per-bucket counts — the TreeMap/Sunburst input, built
    corpus-wide instead of over a 1000-page dashboard sample.

    A page contributes to exactly ONE row: its own prefix (shallow
    pages fill the missing levels with ''). Rolling subtrees up is the
    consumer's prefix-sum; keeping leaves disjoint keeps the operator a
    plain groupby.

    Scale shape: path parsing + bucketing happen in-batch; each batch
    pre-aggregates to (site, l1..lk) partial counts (pandas groupby —
    the fixed-width combiner), so the ONE exchange is a Sum groupby
    over distinct tree rows, never pages. ``age_days`` is an int column
    (days since indexed, <0 or null → the dashboard's unknown bucket
    999-style) — the caller stamps it, keeping the operator clock-free
    (no wall-clock reads; resumable runs stay deterministic)."""
    import numpy as np
    from ray.data.aggregate import Sum

    lvl_cols = [f"l{i + 1}" for i in range(max_depth)]

    def partials(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        sites = batch[site_col].to_pylist()
        ages = batch[age_col].to_pylist()
        levels: list[list[str]] = [[] for _ in range(max_depth)]
        for u in urls:
            u = u or ""
            tail = u.split("://", 1)[1] if "://" in u else u
            path = tail.split("/", 1)[1] if "/" in tail else ""
            parts = [p for p in path.split("/") if p]
            for i in range(max_depth):
                levels[i].append(parts[i] if i < len(parts) else "")
        a = np.array([-1 if d is None else int(d) for d in ages],
                     np.int64)
        pdf = pd.DataFrame({"site": [s or "" for s in sites]})
        for c, col in zip(lvl_cols, levels):
            pdf[c] = col
        pdf["n_pages"] = 1
        pdf["fresh_today"] = ((a >= 0) & (a < 1)).astype("int64")
        pdf["fresh_week"] = ((a >= 1) & (a < 7)).astype("int64")
        pdf["fresh_month"] = ((a >= 7) & (a < 30)).astype("int64")
        pdf["fresh_quarter"] = ((a >= 30) & (a < 90)).astype("int64")
        pdf["fresh_older"] = (a >= 90).astype("int64")
        pdf["fresh_unknown"] = (a < 0).astype("int64")
        out = (pdf.groupby(["site"] + lvl_cols, as_index=False).sum())
        return pa.Table.from_pandas(out, preserve_index=False)

    aggs = [Sum(c, alias_name=c)
            for c in ["n_pages", "fresh_today", "fresh_week",
                      "fresh_month", "fresh_quarter", "fresh_older",
                      "fresh_unknown"]]
    return (docs_ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["site"] + lvl_cols).aggregate(*aggs))
