"""Search-API tier operators (reference S12 + A4), re-expressed as Ray Data
batch transforms over a search-request log:

- CSE result-cache replay with TTL (ref ``api/services/cse_client.py``:
  ``_get_cached_results``/``_cache_results`` — md5(query|lang) key, entries
  expire ``cache_days``·86400 s after the API call that cached them,
  :222-273) — a per-key ordered scan, distributed by key hash.
- CSE daily-quota accounting (ref ``_check_quota``/``_increment_quota``,
  :274-312 — a per-day counter; calls past ``daily_quota`` return empty and
  are NOT counted) — per-day rank over request order.
- Query-stats store roll-ups (ref ``api/services/stats_db.py:225-412``:
  totals, last-hour counts, avg times, cache-hit rate, error rate, top
  queries) — partial per-batch aggregates, integer-ms sums for exact
  oracle comparison.

The reference keeps this state in SQLite behind an async API; at engine
scale the log IS the state — every metric is a one-pass aggregate and the
cache/quota protocols are deterministic replays over the ordered log.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def derive_search_log(events_ds, n_queries: int = 97):
    """Deterministic search-request log from the events table (the corpus
    has no real API log; identical derivation in the SQL oracles):
    query = 'q' || event_id % n_queries, lang from event_id % 2; timing and
    outcome columns are integer functions of event_id."""

    def derive(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"], dtype=np.int64)
        return pa.table(
            {"ts": batch["ts"],
             "event_id": batch["event_id"],
             "query": pa.array([f"q{q}" for q in eid % n_queries], pa.string()),
             "lang": pa.array(["fr" if q % 2 == 0 else "en" for q in eid],
                              pa.string()),
             "processing_ms": pa.array(eid % 500, pa.int64()),
             "meilisearch_ms": pa.array(eid % 200, pa.int64()),
             "cache_hit": pa.array((eid % 3 == 0)),
             "error": pa.array((eid % 50 == 0))}
        )

    return events_ds.map_batches(derive, batch_format="pyarrow")


def cse_cache_replay(log_ds, cache_days: float = 7.0, n_parts: int | None = None):
    """Replay the CSE result cache over the request log: per (query, lang)
    key in ts order, a request is an ``api_call`` when no prior api_call of
    the same key is still fresh (ts < prior_call_ts + cache_days·86400),
    else a ``cache_hit``. Distribution: all requests of a key land in one
    partition (crc32 key hash); within a partition the scan is a pandas
    groupby walk — tiny islands, vectorization does not pay.

    Returns (event_id, ts, query, lang, action) with action ∈
    {'api_call', 'cache_hit'}."""
    from .grouping import partitioned_apply, resolve_parts

    ttl = pd.Timedelta(seconds=cache_days * 86400)

    def part_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_id, out_ts, out_q, out_l, out_a = [], [], [], [], []
        if len(pdf):
            pdf = pdf.sort_values(["query", "lang", "ts", "event_id"],
                                  kind="stable")
            for (q, l), g in pdf.groupby(["query", "lang"], sort=False):
                expires = None
                for eid, ts in zip(g["event_id"], g["ts"]):
                    if expires is not None and ts < expires:
                        act = "cache_hit"
                    else:
                        act = "api_call"
                        expires = ts + ttl
                    out_id.append(eid)
                    out_ts.append(ts)
                    out_q.append(q)
                    out_l.append(l)
                    out_a.append(act)
        return pd.DataFrame(
            {"event_id": pd.Series(out_id, dtype="int64"),
             "ts": pd.Series(out_ts, dtype="datetime64[us]"),
             "query": pd.Series(out_q, dtype="str"),
             "lang": pd.Series(out_l, dtype="str"),
             "action": pd.Series(out_a, dtype="str")}
        )

    return partitioned_apply(log_ds, ["query", "lang"], part_fn,
                             resolve_parts(n_parts))


def cse_daily_quota(log_ds, daily_quota: int = 100,
                    n_parts: int | None = None):
    """Daily quota accounting: within each day (UTC), requests ranked by
    (ts, event_id); rank > ``daily_quota`` is quota-blocked (ref returns
    empty without incrementing, cse_client.py:118-122). Returns per-day
    (day, n_requests, n_served, n_blocked) — exactly SQL-expressible
    (window rank), so this one carries an oracle.

    NOTE the input contract: in the reference, cache hits bypass
    ``_check_quota``/``_increment_quota`` entirely — only real API calls
    consume quota. Feed this the ``api_call`` rows of ``cse_cache_replay``
    for reference-parity accounting (``q_cse_quota_effective``); fed the
    raw request log it deliberately over-counts (every request treated as
    an API call — the oracle-gated ``q_cse_quota`` documents that
    simplification)."""
    from .grouping import partitioned_apply, resolve_parts

    def part_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"day": pd.Series([], dtype="str"),
                 "n_requests": pd.Series([], dtype="int64"),
                 "n_served": pd.Series([], dtype="int64"),
                 "n_blocked": pd.Series([], dtype="int64")}
            )
        g = pdf.groupby("day", as_index=False).agg(n_requests=("event_id", "size"))
        g["n_served"] = g["n_requests"].clip(upper=daily_quota)
        g["n_blocked"] = g["n_requests"] - g["n_served"]
        return g.astype({"n_requests": "int64", "n_served": "int64",
                         "n_blocked": "int64"})

    def add_day(batch: pa.Table) -> pa.Table:
        days = pd.to_datetime(batch["ts"].to_pandas()).dt.strftime("%Y-%m-%d")
        return batch.append_column("day", pa.array(days, pa.string()))

    with_day = log_ds.map_batches(add_day, batch_format="pyarrow")
    return partitioned_apply(with_day, ["day"], part_fn, resolve_parts(n_parts))


def search_stats_summary(log_ds, now_ts=None):
    """stats_db roll-up in one distributed pass (ref get_total_searches /
    get_searches_last_hour / get_avg_* / get_cache_hit_rate /
    get_error_rate, stats_db.py:225-412): per-batch partial sums → single
    reduced row. Sums stay integer (ms) so the oracle matches bit-exactly;
    averages are for the caller (sum/count)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lasth = 0
        if now_ts is not None:
            lasth = int((df["ts"] >= now_ts - pd.Timedelta(hours=1)).sum())
        return pa.table(
            {"k": pa.array([0], pa.int64()),
             "n": pa.array([len(df)], pa.int64()),
             "n_last_hour": pa.array([lasth], pa.int64()),
             "sum_processing_ms": pa.array([int(df["processing_ms"].sum())],
                                           pa.int64()),
             "sum_meilisearch_ms": pa.array([int(df["meilisearch_ms"].sum())],
                                            pa.int64()),
             "n_cache_hits": pa.array([int(df["cache_hit"].sum())], pa.int64()),
             "n_errors": pa.array([int(df["error"].sum())], pa.int64())}
        )

    return log_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "k"
    ).aggregate(
        Sum("n", alias_name="total_searches"),
        Sum("n_last_hour", alias_name="searches_last_hour"),
        Sum("sum_processing_ms", alias_name="sum_processing_ms"),
        Sum("sum_meilisearch_ms", alias_name="sum_meilisearch_ms"),
        Sum("n_cache_hits", alias_name="n_cache_hits"),
        Sum("n_errors", alias_name="n_errors"),
    )


def top_queries(log_ds, limit: int = 10):
    """get_top_queries (stats_db.py:357-387): count + integer-ms sum per
    query text, ordered by count desc (query asc tiebreak), top ``limit``.
    Partial per-batch aggregation before the groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("query", as_index=False).agg(
            n=("query", "size"), sum_ms=("processing_ms", "sum"))
        return pa.table({"query": pa.array(g["query"], pa.string()),
                         "n": pa.array(g["n"].astype("int64")),
                         "sum_ms": pa.array(g["sum_ms"].astype("int64"))})

    agg = log_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "query"
    ).aggregate(Sum("n", alias_name="n_searches"),
                Sum("sum_ms", alias_name="sum_processing_ms"))
    return agg.sort(["n_searches", "query"], descending=[True, False]).limit(limit)


class CorpusCseAPI:
    """In-memory Google customsearch-v1 endpoint over the corpus — the
    deterministic fake server behind ``CseSearchStage`` in the sandbox
    (the real endpoint is Google; its rankings are opaque, so the fake
    defines them: non-overlapping case-insensitive occurrence count desc,
    doc_id asc, top ``num``). Response items carry the Google shape the
    reference parses (``link``/``title``/``snippet``/``displayLink``/
    ``pagemap.cse_image``, cse_client.py:177-219); every doc_id % 4 == 1
    page exposes one cse_image. Build once, ``ray.put`` once — each
    search actor fetches the single plasma copy."""

    def __init__(self, doc_ids, texts):
        self.doc_ids = list(doc_ids)
        self.texts = list(texts)

    def __call__(self, params: dict) -> dict:
        term = (params.get("q") or "").lower()
        num = min(int(params.get("num", 10)), 10)
        if not term:
            return {"items": []}
        scored = []
        for i, text in zip(self.doc_ids, self.texts):
            occ = (text or "").lower().count(term)
            if occ > 0:
                scored.append((-occ, i, text))
        scored.sort()
        items = []
        for _, i, text in scored[:num]:
            item = {
                "link": f"https://src{i % 20}.example.org/doc/{i}",
                "title": f"Doc {i}",
                "snippet": (text or "")[:160],
                "displayLink": f"src{i % 20}.example.org",
            }
            if i % 4 == 1:
                item["pagemap"] = {"cse_image": [
                    {"src": f"https://src{i % 20}.example.org/img/{i}.png"}]}
            items.append(item)
        return {"items": items}


class CseSearchStage:
    """Actor-pool ``map_batches`` stage: (qid, query, lang, num) rows →
    SearchResult rows — the S12 live-GET client, the treatment S13's
    ``WikiSearchStage`` got (reference ``cse_client.py:98-220``).
    Reference protocol reproduced through the injectable transport:

    - request params ``key``/``cx``/``q``/``lr=lang_{lang}``/
      ``num=min(num, 10)``/``safe=active`` (:155-163);
    - ``id = md5(link)`` hex (:182), ``excerpt`` = snippet, ``site`` =
      displayLink, ``content`` absent (CSE never returns it, :203-207);
    - ≤5 images from ``pagemap.cse_image`` with null alt/description,
      entries without ``src`` skipped (:185-199) — flattened here to
      (img_url, n_images) columns (list<struct> carries no more info
      for a single-thumbnail corpus and the driver hash compares
      scalars);
    - ``source='google_cse'``, constant ``score=1.0`` (:208-211);
    - a response without items yields no rows.

    Compose with ``cse_cache_replay``/``cse_daily_quota`` for the
    cache/TTL/quota tiers — those replay protocols are already
    oracle-gated over the request log."""

    def __init__(self, api_get, api_key: str = "k", cx: str = "cx"):
        import ray

        if isinstance(api_get, ray.ObjectRef):
            api_get = ray.get(api_get)
        self.api_get = api_get
        self.key = api_key
        self.cx = cx

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        qids = batch["qid"].to_pylist()
        queries = batch["query"].to_pylist()
        langs = (batch["lang"].to_pylist() if "lang" in batch.column_names
                 else ["fr"] * len(qids))
        nums = (batch["num"].to_pylist() if "num" in batch.column_names
                else [10] * len(qids))
        out = {k: [] for k in ("qid", "id", "url", "title", "excerpt",
                               "site", "lang", "source", "score",
                               "img_url", "n_images")}
        for qid, query, lang, num in zip(qids, queries, langs, nums):
            data = self.api_get({
                "key": self.key, "cx": self.cx, "q": query,
                "lr": f"lang_{lang}", "num": min(int(num), 10),
                "safe": "active",
            }) or {}
            for item in data.get("items", []):
                link = item.get("link")
                if not link:
                    continue
                imgs = [im.get("src")
                        for im in (item.get("pagemap", {})
                                   .get("cse_image", []))[:5]
                        if im.get("src")]
                out["qid"].append(qid)
                out["id"].append(hashlib.md5(link.encode()).hexdigest())
                out["url"].append(link)
                out["title"].append(item.get("title", ""))
                out["excerpt"].append(item.get("snippet", ""))
                out["site"].append(item.get("displayLink"))
                out["lang"].append(lang)
                out["source"].append("google_cse")
                out["score"].append(1.0)
                out["img_url"].append(imgs[0] if imgs else "")
                out["n_images"].append(len(imgs))
        return pa.table({
            "qid": pa.array(out["qid"], pa.int64()),
            "id": pa.array(out["id"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "excerpt": pa.array(out["excerpt"], pa.string()),
            "site": pa.array(out["site"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "score": pa.array(out["score"], pa.float64()),
            "img_url": pa.array(out["img_url"], pa.string()),
            "n_images": pa.array(out["n_images"], pa.int64()),
        })


FEEDBACK_REASONS = ("irrelevant", "outdated", "broken_link", "inappropriate")


def derive_feedback_log(events_ds, n_queries: int = 97, n_docs: int = 500):
    """Deterministic user-feedback log from the events table (the corpus
    has no real feedback; identical derivation in the SQL oracle). Mirrors
    the reference ``feedback`` table row shape — (query, result_id,
    result_url, reason, comment, timestamp) per submission
    (``stats_db.py:79-95`` DDL, ``log_feedback`` :187-223, POST route
    ``api/routes/search.py:188-193``): every event with
    ``event_id % 5 == 2`` is a feedback submission; query joins the
    derive_search_log key space, result/reason/comment are integer
    functions of event_id (comment nullable — every third submission
    omits it, exercising the optional column)."""

    def derive(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"], dtype=np.int64)
        keep = eid % 5 == 2
        t = batch.filter(pa.array(keep))
        ke = eid[keep]
        return pa.table(
            {"event_id": t["event_id"],
             "ts": t["ts"],
             "query": pa.array([f"q{q}" for q in ke % n_queries],
                               pa.string()),
             "result_id": pa.array([f"doc{r}" for r in ke % n_docs],
                                   pa.string()),
             "result_url": pa.array(
                 [f"https://src{r % 20}.example.org/doc/{r}"
                  for r in ke % n_docs], pa.string()),
             "reason": pa.array(
                 [FEEDBACK_REASONS[r] for r in ke % len(FEEDBACK_REASONS)],
                 pa.string()),
             "comment": pa.array(
                 [None if r % 3 == 0 else f"comment {r % 11}" for r in ke],
                 pa.string())}
        )

    return events_ds.map_batches(derive, batch_format="pyarrow")


def feedback_rollup(feedback_ds, n_parts: int | None = None):
    """Per-(query, reason) feedback roll-up with per-query totals and the
    exact integer share — the aggregation layer the reference's feedback
    store feeds (``stats_db.py:187-223`` writes, dashboard reads). One
    per-batch partial pass → small (query, reason) Sum groupby → a second
    tiny exchange keyed by query attaches totals; share_ppm =
    n·1e6 // total stays integer so the oracle compares exactly. The
    shuffle carries one row per (query, reason, batch) — never one per
    feedback event."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["query", "reason"], as_index=False).agg(
            n=("reason", "size"),
            n_commented=("comment", lambda s: int(s.notna().sum())))
        return pa.table({"query": pa.array(g["query"], pa.string()),
                         "reason": pa.array(g["reason"], pa.string()),
                         "n": pa.array(g["n"].astype("int64")),
                         "n_commented": pa.array(
                             g["n_commented"].astype("int64"))})

    agg = feedback_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["query", "reason"]
    ).aggregate(Sum("n", alias_name="n"),
                Sum("n_commented", alias_name="n_commented"))

    def with_share(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({
                "query": pd.Series([], dtype="object"),
                "reason": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "n_commented": pd.Series([], dtype="int64"),
                "query_total": pd.Series([], dtype="int64"),
                "share_ppm": pd.Series([], dtype="int64")})
        pdf = pdf.copy()
        pdf["query_total"] = pdf.groupby("query")["n"].transform("sum")
        pdf["share_ppm"] = pdf["n"] * 1_000_000 // pdf["query_total"]
        return pdf

    from .grouping import partitioned_apply, resolve_parts

    return partitioned_apply(agg, ["query"], with_share,
                             resolve_parts(n_parts))


def stats_retention(log_ds, feedback_ds, keep_days: int = 30,
                    now_ts=None):
    """Stats-retention cleanup (ref ``stats_db.py:420-435``): drop
    search-log and feedback rows older than ``now − keep_days`` and report
    (table, kept, deleted) — the reference's ``deleted_searches`` /
    ``deleted_feedback`` counters. ``now`` defaults to the max event ts
    (the log's own clock — deterministic, unlike wall time). The filter is
    a vectorized per-batch drop; counts are per-batch partials summed in
    one tiny groupby; the KEPT datasets (the compacted tables) are
    returned alongside so callers can re-point the store at them."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    if now_ts is None:
        now_ts = max(log_ds.max("ts"), feedback_ds.max("ts"))
    cutoff = now_ts - _dt.timedelta(days=keep_days)

    def counts(name, ds):
        def partial(batch: pa.Table) -> pa.Table:
            ts = batch["ts"].to_pandas()
            kept = int((ts >= cutoff).sum())
            return pa.table({"tbl": pa.array([name], pa.string()),
                             "kept": pa.array([kept], pa.int64()),
                             "deleted": pa.array([batch.num_rows - kept],
                                                 pa.int64())})

        return ds.map_batches(partial, batch_format="pyarrow")

    def keep_fresh(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_pandas()
        return batch.filter(pa.array((ts >= cutoff).to_numpy()))

    kept_log = log_ds.map_batches(keep_fresh, batch_format="pyarrow")
    kept_fb = feedback_ds.map_batches(keep_fresh, batch_format="pyarrow")
    report = counts("search_queries", log_ds).union(
        counts("feedback", feedback_ds)).groupby("tbl").aggregate(
        Sum("kept", alias_name="kept"), Sum("deleted", alias_name="deleted"))
    return report, kept_log, kept_fb


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
