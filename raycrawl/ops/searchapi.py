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


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
