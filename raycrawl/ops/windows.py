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


def tumbling_agg(ds, window: str = "1h"):
    """Per (event_type, hour) tumbling aggregate: count + value sum.
    Pre-aggregates inside map_batches (one partial row per key per batch)
    before the groupby — the shuffle moves partials only."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket_ts"] = df["ts"].dt.floor(window)
        g = df.groupby(["event_type", "bucket_ts"], as_index=False).agg(
            n=("event_id", "size"), value_sum=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "bucket_ts"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("value_sum", alias_name="value_sum2")
    )


def sessionize(ds, gap_minutes: float = 30.0):
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session
    (user_id, session_start, n_events, value_sum)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sid = gap.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
            value_sum=("value", "sum"),
        )
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
