"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time watermarks (ray_guide "Streaming-shaped
workloads"): the input is treated as an ordered, partitioned log. Windows
run as ``groupby(key).map_groups`` with in-group ts sort — the ordering
assumption is that each group fits a worker (per-user event history), which
holds for web-scale user logs after key partitioning.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


_TS_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _floor_div(x, d: int):
    """Arrow int64 FLOOR division (toward −∞) for positive ``d``.
    ``pc.divide`` truncates toward zero, which puts pre-1970
    (negative-epoch) timestamps in the wrong bucket — crawl-derived
    event streams do contain garbage pre-epoch stamps (bad
    Last-Modified headers), and the DuckDB oracle's bucket arithmetic
    floors. q = trunc(x/d); where a nonzero remainder exists and x<0,
    subtract 1."""
    import pyarrow.compute as pc

    q = pc.divide(x, d)
    r = pc.subtract(x, pc.multiply(q, d))
    adj = pc.and_(pc.not_equal(r, 0), pc.less(x, 0))
    return pc.if_else(adj, pc.subtract(q, 1), q)


def tumbling_agg(ds, window: str = "1h"):
    """Per (event_type, hour) tumbling aggregate: count + value sum.
    Pre-aggregates inside map_batches (one partial row per key per batch)
    before the groupby — the shuffle moves partials only. The bucket math
    is pure integer arithmetic on the Arrow timestamp storage (cast →
    truncating divide → multiply → cast back): zero-copy in, no pandas
    conversion on the hot path (r5, VERDICT r4 #8)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    win_ns = int(pd.Timedelta(window).value)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        win = win_ns * _TS_UNIT_PER_S[ts.type.unit] // 1_000_000_000
        ti = ts.cast(pa.int64())
        bucket = pc.multiply(_floor_div(ti, win), win).cast(ts.type)
        t = pa.table({"event_type": batch["event_type"],
                      "bucket_ts": bucket,
                      "value": batch["value"]})
        g = t.group_by(["event_type", "bucket_ts"]).aggregate(
            [("value", "sum"),
             ("value", "count", pc.CountOptions(mode="all"))])
        return pa.table({"event_type": g["event_type"],
                         "bucket_ts": g["bucket_ts"],
                         "n": g["value_count"].cast(pa.int64()),
                         "value_sum": g["value_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "bucket_ts"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("value_sum", alias_name="value_sum2")
    )


def hopping_agg(ds, window_s: int = 3600, hop_s: int = 1800):
    """Hopping (sliding) windows: each event lands in ``window_s/hop_s``
    overlapping windows whose starts are hop-aligned epoch seconds. The
    per-batch partial replicates rows once per hop offset and
    pre-aggregates, so the shuffle moves one partial row per
    (event_type, window) per batch — never per event. Money in integer
    cents; window starts as int64 epoch seconds (exact oracle both ways).
    Bucket math is Arrow-native integer arithmetic (r5): no pandas
    conversion — the only float op is the cents rounding itself."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    k = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        per = _TS_UNIT_PER_S[ts.type.unit]
        es = _floor_div(ts.cast(pa.int64()), per)
        cents = pc.floor(
            pc.add(pc.multiply(batch["value"].cast(pa.float64()), 100.0), 0.5)
        ).cast(pa.int64())
        base = pc.multiply(_floor_div(es, hop_s), hop_s)
        parts = [
            pa.table({"event_type": batch["event_type"],
                      "win_start": pc.subtract(base, i * hop_s),
                      "cents": cents})
            for i in range(k)
        ]
        g = (pa.concat_tables(parts)
             .group_by(["event_type", "win_start"])
             .aggregate([("cents", "sum"),
                         ("cents", "count", pc.CountOptions(mode="all"))]))
        return pa.table({"event_type": g["event_type"].cast(pa.string()),
                         "win_start": g["win_start"].cast(pa.int64()),
                         "n": g["cents_count"].cast(pa.int64()),
                         "cents": g["cents_sum"].cast(pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "win_start"]
    ).aggregate(Sum("n", alias_name="n_events"),
                Sum("cents", alias_name="value_cents"))


def sessionize(ds, gap_minutes: float = 30.0, n_parts: int = 32):
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session
    (user_id, session_start, n_events, value_sum).

    Runs as one vectorized pass per coarse user-hash partition
    (``partitioned_apply``), not one ``map_groups`` call per user — the
    per-group overhead (~100 ms) times millions of users would dominate at
    scale. Session ids are computed for ALL users in a partition with a
    single sort + shifted-compare + cumsum."""

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "session_start": pd.Series([], dtype="datetime64[ns]"),
                 "n_events": pd.Series([], dtype="int64"),
                 "value_sum": pd.Series([], dtype="float64")}
            )
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = pdf["user_id"].ne(pdf["user_id"].shift())
        gap = pdf["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sid = (new_user | gap).cumsum()
        out = pdf.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
            value_sum=("value", "sum"),
        )
        return out.reset_index(drop=True)

    from .grouping import partitioned_apply

    return partitioned_apply(ds, ["user_id"], per_partition, n_parts)


def topk_users_by_value(ds, k: int = 10):
    """Total value per user, top-k: partial per-batch sums → small groupby →
    sort/limit."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(v=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "user_id"
    ).aggregate(Sum("v", alias_name="total_value"))
    return agg.sort(["total_value", "user_id"], descending=[True, False]).limit(k)


def hourly_distinct_users(ds, window: str = "1h"):
    """Distinct users per tumbling window — the COUNT(DISTINCT) sibling of
    ``tumbling_agg`` (a Sum of partials is NOT a distinct count; this is
    the exact distributed shape): per-batch DISTINCT (bucket, user) rows →
    (bucket, user) groupby collapses cross-batch duplicates → per-batch 1s
    → a #buckets-row Sum groupby. The shuffle moves one row per
    (bucket, user) per batch it appears in, never per event. Returns
    (bucket_ts string, n_users)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket_ts"] = df["ts"].dt.floor(window)
        g = df[["bucket_ts", "user_id"]].drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["bucket_ts", "user_id"]).count())

    def ones(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table({
            "bucket_ts": pa.array(
                df["bucket_ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                pa.string()),
            "n_users": pa.array([1] * len(df), pa.int64()),
        })

    return (pairs.map_batches(ones, batch_format="pyarrow")
            .groupby("bucket_ts")
            .aggregate(Sum("n_users", alias_name="n_users")))


def ordered_funnel(ds, first_type: str, then_type: str, within_s: int,
                   n_parts: int | None = None):
    """Ordered two-step funnel: for every user with a ``first_type``
    event, did a ``then_type`` event follow within ``within_s`` seconds
    of their FIRST one? The conversion query behind every product
    analytics stack — and an ordered-sequence detector the engine's
    session/window family otherwise lacks.

    Scale shape: events reduce in-block to fixed-width
    (user, is_first, ts) rows for the two step types only; ONE user-keyed
    task hash exchange evaluates the window vectorized per user. Returns
    one row per user with a first-step event: ``(user_id, first_ts_s,
    converted)`` — first_ts_s = epoch seconds of their earliest
    first_type event, converted ∈ {0, 1} (strictly-later then-event with
    ts ≤ first + within)."""
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["event_type"].isin([first_type, then_type])]
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        return pa.table({
            "user_id": pa.array(df["user_id"].astype("int64")),
            "is_first": pa.array(
                (df["event_type"] == first_type).astype("int64")),
            "ts_us": pa.array(ts_us),  # epoch micros
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def per_user(pdf):
        out_u, out_t, out_c = [], [], []
        if len(pdf):
            for uid, g in pdf.groupby("user_id", sort=True):
                firsts = g.loc[g["is_first"] == 1, "ts_us"]
                if not len(firsts):
                    continue
                t0 = int(firsts.min())
                thens = g.loc[g["is_first"] == 0, "ts_us"].to_numpy()
                conv = bool(((thens > t0)
                             & (thens <= t0 + within_s * 1_000_000)).any())
                out_u.append(uid)
                out_t.append(t0 // 1_000_000)
                out_c.append(int(conv))
        return pd.DataFrame({
            "user_id": pd.Series(out_u, dtype="int64"),
            "first_ts_s": pd.Series(out_t, dtype="int64"),
            "converted": pd.Series(out_c, dtype="int64")})

    return partitioned_apply(rows, ["user_id"], per_user, width)


def cohort_retention(ds, n_parts: int | None = None):
    """Cohort retention triangle: cohort = each user's first active DAY;
    for every (cohort_day, day_offset) count the users active again
    ``offset`` days after their first day. The classic product-analytics
    retention matrix — the longitudinal sibling of ``hourly_distinct_users``
    (which counts within a window; this follows users ACROSS windows).

    Scale shape: events reduce in-block to DISTINCT fixed-width
    (user_id, epoch_day) int64 rows, then ONE user-keyed task hash
    exchange computes each user's cohort min and per-cohort-cell partial
    counts vectorized per partition; a tiny (cohort, offset) Sum groupby
    finishes. The shuffle moves one 16-byte row per (user, active-day),
    never per event. Returns (cohort_day 'YYYY-MM-DD', day_offset,
    n_users)."""
    from ray.data.aggregate import Sum

    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        days = df["ts"].to_numpy().astype("datetime64[D]").view("int64")
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64").to_numpy(),
            "day": days,
        }).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cohort_day": pd.Series(dtype="int64"),
            "day_offset": pd.Series(dtype="int64"),
            "n_users": pd.Series(dtype="int64")})
        if not len(pdf):
            return empty
        pdf = pdf.drop_duplicates(["user_id", "day"])
        cohort = pdf.groupby("user_id")["day"].transform("min")
        cells = pd.DataFrame({"cohort_day": cohort,
                              "day_offset": pdf["day"] - cohort})
        g = (cells.groupby(["cohort_day", "day_offset"], as_index=False)
             .size().rename(columns={"size": "n_users"}))
        return g.astype({"cohort_day": "int64", "day_offset": "int64",
                         "n_users": "int64"})

    partials = partitioned_apply(rows, ["user_id"], per_user, width)
    agg = partials.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n_users", alias_name="n_users"))

    def fmt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day_str = (df["cohort_day"].to_numpy().astype("datetime64[D]")
                   .astype(str))
        return pa.table({
            "cohort_day": pa.array(day_str, pa.string()),
            "day_offset": pa.array(df["day_offset"].astype("int64")),
            "n_users": pa.array(df["n_users"].astype("int64")),
        })

    return agg.map_batches(fmt, batch_format="pyarrow")


def event_transitions(ds, gap_minutes: float = 30.0,
                      n_parts: int | None = None):
    """First-order Markov transition counts between consecutive event
    types WITHIN a session — the clickstream path-mining primitive (which
    page/event follows which, the input to next-action models and funnel
    discovery). A transition (A → B) counts when the same user's next
    event by (ts, event_id) order arrives within ``gap_minutes`` — the
    exact complement of `sessionize`'s break rule, so transition totals
    per user equal (events − sessions).

    Scale shape: one vectorized pass per coarse user-hash partition
    (sort + shift compare — the `sessionize` kernel) emitting per-
    partition (from, to, n) partials, then a Sum groupby whose
    cardinality is |event-type|², never rows. Returns
    (from_type, to_type, n)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .grouping import drop_empty_blocks, partitioned_apply

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "from_type": pd.Series([], dtype=str),
            "to_type": pd.Series([], dtype=str),
            "n": pd.Series([], dtype="int64")})
        if len(pdf) == 0:
            return empty
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same_user = pdf["user_id"].eq(pdf["user_id"].shift())
        within = pdf["ts"].diff() <= gap
        keep = (same_user & within).to_numpy()
        frm = pdf["event_type"].shift().to_numpy()[keep]
        to = pdf["event_type"].to_numpy()[keep]
        if len(frm) == 0:
            return empty
        out = pd.DataFrame({"from_type": frm, "to_type": to})
        g = out.groupby(["from_type", "to_type"], as_index=False).agg(
            n=("to_type", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    partials = drop_empty_blocks(
        partitioned_apply(ds, ["user_id"], per_partition,
                          n_parts=n_parts or 32),
        empty_schema=pa.schema([("from_type", pa.string()),
                                ("to_type", pa.string()),
                                ("n", pa.int64())]))
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n"))


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def debounce_events(ds, window_s: int = 60, n_parts: int = 32):
    """Event-stream debounce: drop an event when the SAME (user,
    event_type) key fired within the preceding ``window_s`` seconds —
    the standard duplicate-fire cleanup for at-least-once delivery
    (double-clicks, retry storms). The rule is the pure-LAG form (gap
    to the previous event of the key, kept or not), so it is exactly a
    window function in SQL and a shifted-compare here — no sequential
    kept-state, which is what keeps it one vectorized pass.

    Per coarse user-hash partition (the ``sessionize`` discipline —
    partitioned_apply, never per-key map_groups): sort by (user, type,
    ts, event_id), shifted diff per key, keep where first-of-key or
    gap > window. Ties at the exact same ts keep only the lowest
    event_id (the others have gap 0). Returns the kept rows
    (event_id, user_id, event_type, ts)."""

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "event_type": pd.Series([], dtype="object"),
                 "ts": pd.Series([], dtype="datetime64[ns]")})
        pdf = pdf.sort_values(["user_id", "event_type", "ts", "event_id"],
                              kind="stable")
        new_key = (pdf["user_id"].ne(pdf["user_id"].shift())
                   | pdf["event_type"].ne(pdf["event_type"].shift()))
        gap = pdf["ts"].diff() > pd.Timedelta(seconds=window_s)
        keep = new_key | gap
        out = pdf.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        return out.reset_index(drop=True)

    from .grouping import partitioned_apply

    return partitioned_apply(ds, ["user_id"], per_partition, n_parts)


def event_lateness(ds, allowed_s: int = 3600):
    """Watermark / late-event accounting — the streaming-semantics audit
    over an at-rest event log: replay the stream in ARRIVAL order
    (event_id; ingestion sequence) and flag each event late when its
    event time trails the high watermark (max event time seen so far,
    excluding itself) by more than ``allowed_s`` — exactly the rows a
    windowed streaming job with that allowed lateness would drop, and
    therefore the calibration signal for choosing it.

    Scale shape (the ``pack_offsets`` discipline): one global sort by
    arrival id, per-block prefix maxes → O(blocks) scalars to the
    driver → exclusive scan → per-block finalize with the running max
    vectorized (``np.maximum.accumulate`` shifted by one). Returns
    (event_id, ts, watermark_ts, late) with watermark NULL-free: the
    first event carries its own ts and is never late."""
    import numpy as np
    import pyarrow as pa

    srt = ds.sort("event_id").materialize()
    blocks = srt.to_arrow_refs()
    import ray

    @ray.remote
    def block_stats(t: pa.Table):
        ts = np.asarray(t["ts"], "datetime64[us]").astype(np.int64)
        ids = np.asarray(t["event_id"], np.int64)
        if not len(ts):
            return (np.iinfo(np.int64).max, np.iinfo(np.int64).min)
        return (int(ids.min()), int(ts.max()))

    # to_arrow_refs does NOT guarantee plan order after a sort; the sort
    # range-partitions ids into disjoint blocks, so each block's own min
    # id recovers the true global order for the prefix scan
    stats = ray.get([block_stats.remote(b) for b in blocks])
    order = sorted(range(len(blocks)), key=lambda i: stats[i][0])
    lo = np.iinfo(np.int64).min
    prefix = [lo] * len(blocks)
    run = lo
    for i in order:
        prefix[i] = run
        run = max(run, stats[i][1])

    @ray.remote
    def finalize(t: pa.Table, prev: int):
        ts = np.asarray(t["ts"], "datetime64[us]").astype(np.int64)
        run = np.maximum.accumulate(ts)
        # watermark[i] = max(prev-block prefix, running max of ts[0..i-1]):
        # the prefix must be maxed into EVERY row, not just row 0 — within
        # -block accumulation alone loses it whenever prev exceeds the
        # block's own running max (old-event replays in a late block)
        shifted = np.concatenate([[lo], run[:-1]]) if len(ts) else run
        wm = np.maximum(shifted, prev)
        wm = np.where(wm == lo, ts, wm)  # first event: own ts, never late
        late = (wm - ts) > allowed_s * 1_000_000
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "ts": t["ts"],
            "watermark_ts": pa.array(wm.view("datetime64[us]"),
                                     pa.timestamp("us")),
            "late": pa.array(late.astype(np.int64), pa.int64())})

    out = [finalize.remote(b, p) for b, p in zip(blocks, prefix)]
    import ray.data as rd

    return rd.from_arrow_refs(out)


def rate_spike_report(ds, *, spike_ppm_min: int = 3_000_000):
    """Per-event-type hourly rate-spike report — the traffic-anomaly
    screen an event pipeline runs before trusting volume-derived
    signals (a bot burst or replayed batch shows up as one hour towering
    over the type's average). Integer-exact: per type, hourly counts
    reduce from per-batch partials; the report is (event_type, n_hours,
    total, max_hour_count, peak_hour string, spike_ppm =
    floor(1e6·max·n_hours/total), is_spike = spike_ppm >=
    ``spike_ppm_min`` — i.e. the peak hour exceeds `threshold ×` the
    type's mean hour). Ties on max break by earliest hour.

    Scale shape: ONE Sum groupby over (type, hour) partial counts
    (fixed-width rows, pre-combined in-batch), then a per-type fold of
    the SMALL hourly table (types × hours rows) via a second
    partial/Sum pass — events never cross an exchange."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # rows with a null type or timestamp are EXCLUDED explicitly —
        # they cannot be bucketed; malformed-event accounting belongs
        # to a separate quality check, not the anomaly screen
        df = df[df["event_type"].notna() & df["ts"].notna()]
        df["hour_ts"] = df["ts"].dt.floor("1h")
        g = (df.groupby(["event_type", "hour_ts"], as_index=False)
             .size().rename(columns={"size": "c"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    hourly = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "hour_ts"])
              .aggregate(Sum("c", alias_name="c")))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="string"),
                "n_hours": pd.Series([], dtype="int64"),
                "total": pd.Series([], dtype="int64"),
                "max_hour_count": pd.Series([], dtype="int64"),
                "peak_hour": pd.Series([], dtype="string"),
                "spike_ppm": pd.Series([], dtype="int64"),
                "is_spike": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values(["event_type", "hour_ts"], kind="stable")
        rows = []
        for et, g in pdf.groupby("event_type", sort=False):
            c = g["c"].to_numpy()
            total = int(c.sum())
            mx = int(c.max())
            peak = g["hour_ts"].iloc[int(c.argmax())]  # earliest max
            ppm = 1_000_000 * mx * len(c) // total
            rows.append({
                "event_type": et, "n_hours": int(len(c)),
                "total": total, "max_hour_count": mx,
                "peak_hour": str(peak), "spike_ppm": int(ppm),
                "is_spike": int(ppm >= spike_ppm_min)})
        return pd.DataFrame(rows)

    from .grouping import partitioned_apply

    return partitioned_apply(hourly, ["event_type"], fold, 8)
