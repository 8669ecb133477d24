"""Focused-crawl frontier triage: spend the fetch budget on quality hosts.

A production recrawl never fetches its whole frontier — it triages. The
classic focused-crawling policy (Chakrabarti et al. 1999; production
BUbiNG/Heritrix variants) orders the frontier by a per-host quality prior
learned from what the host served LAST epoch, caps each host (politeness
AND anti-trap), and cuts at a global per-wave budget. This op is that
planner as a pure Dataset transform — the bridge between the ops-layer
quality signals (``hostagg.source_quality_filter`` aggregates) and the
crawl engine's wave selection (pipeline.py plans per-wave budgets; this
policy slots in front of it as the frontier filter).

Selection rule (fully deterministic, integer-exact, SQL-gateable):

  1. per host, keep the top ``per_host_cap`` frontier rows by
     (depth asc, rank asc) — shallow unexplored pages first;
  2. order the survivors by (quality_ppm desc, host asc, depth asc,
     rank asc) — unknown hosts rank at quality 0, after every known host;
  3. cut at ``budget`` rows; emit the global 1-based ``sel_pos``.

Scale shape: stage 1 is the two-stage top-N discipline of
``sampling.domain_cap`` — every input batch pre-prunes to its own local
top-``cap`` per host (a batch can contribute at most cap winners), then
one host-hash exchange merges the partials exactly. The quality side is
one row per host; it joins the (≤ hosts·cap row) winner set with a
partitioned hash join, never a broadcast — at 10^8 hosts a quality dict
would not ship. The final global sort+limit touches only the winner set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouping import nonempty_refs, partitioned_apply, resolve_parts

_OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("depth", pa.int64()),
    ("rank", pa.int64()),
    ("quality_ppm", pa.int64()),
    ("sel_pos", pa.int64()),
])


def focused_frontier_select(frontier, quality, *, budget: int,
                            per_host_cap: int,
                            n_parts: int | None = None):
    """``frontier`` carries (url, host, depth, rank); ``quality`` carries
    (host, quality_ppm). Returns the selected rows
    (url, host, depth, rank, quality_ppm, sel_pos), sel_pos 1..budget."""
    import ray.data as rd

    if budget < 1 or per_host_cap < 1:
        raise ValueError("budget and per_host_cap must be >= 1")

    def partial_top(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            "url": batch["url"].to_pylist(),
            "host": batch["host"].to_pylist(),
            "depth": np.asarray(batch["depth"], np.int64),
            "rank": np.asarray(batch["rank"], np.int64),
        })
        pdf = pdf.sort_values(["host", "depth", "rank"], kind="stable")
        pdf = pdf.groupby("host", sort=False).head(per_host_cap)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def host_top(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"url": pd.Series([], dtype="str"),
                                 "host": pd.Series([], dtype="str"),
                                 "depth": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values(["host", "depth", "rank"], kind="stable")
        return pdf.groupby("host", sort=False).head(per_host_cap)

    winners = partitioned_apply(
        frontier.map_batches(partial_top, batch_format="pyarrow"),
        ["host"], host_top, resolve_parts(n_parts))

    w_live, _ = nonempty_refs(winners)
    if not w_live:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    q_live, _ = nonempty_refs(quality.select_columns(["host", "quality_ppm"]))
    if q_live:
        joined = rd.from_arrow_refs(w_live).join(
            rd.from_arrow_refs(q_live), join_type="left_outer",
            num_partitions=resolve_parts(n_parts), on=("host",))
    else:
        joined = rd.from_arrow_refs(w_live).map_batches(
            lambda b: b.append_column(
                "quality_ppm", pa.array([None] * b.num_rows, pa.int64())),
            batch_format="pyarrow")

    def fill_null_quality(batch: pa.Table) -> pa.Table:
        q = batch["quality_ppm"].fill_null(0)
        i = batch.column_names.index("quality_ppm")
        return batch.set_column(i, "quality_ppm", q.cast(pa.int64()))

    ranked = (joined.map_batches(fill_null_quality, batch_format="pyarrow")
              .sort(["quality_ppm", "host", "depth", "rank"],
                    descending=[True, False, False, False])
              .limit(budget))
    # sel_pos: global 1-based position — the winner set is ≤ budget rows
    # here, so stamping on the driver-side table is O(budget), not O(frontier)
    tbl = ranked.to_arrow_refs()
    import ray

    parts = [t for t in ray.get(tbl) if t.num_rows]
    if not parts:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    merged = pa.concat_tables([t.select([f.name for f in _OUT_SCHEMA
                                         if f.name != "sel_pos"])
                               for t in parts])
    order = np.lexsort((
        np.asarray(merged["rank"], np.int64),
        np.asarray(merged["depth"], np.int64),
        np.array(merged["host"].to_pylist()),
        -np.asarray(merged["quality_ppm"], np.int64),
    ))
    merged = merged.take(pa.array(order))
    merged = merged.append_column(
        "sel_pos", pa.array(np.arange(1, merged.num_rows + 1,
                                      dtype=np.int64)))
    return rd.from_arrow(merged.cast(_OUT_SCHEMA))

def allocate_budget(hosts_ds, budget: int, *, host_col: str = "host",
                    pages_col: str = "n_pages", weight_col: str = "weight"):
    """Per-host crawl-budget allocation: split a global fetch budget
    across hosts proportionally to an integer weight (quality × volume
    prior), exactly — the largest-remainder (Hamilton) apportionment:

      base_h  = budget·w_h // W          (W = Σ w_h)
      extra_h = 1 for the ``budget - Σ base`` largest remainders
                (ties: host asc), else 0
      quota_h = min(n_pages_h, base_h + extra_h)

    Σ (base+extra) == budget exactly; ``surplus`` reports what capped
    hosts hand back (single-round by design — re-run on the uncapped
    remainder to redistribute, each round is one cheap pass over the
    host table). This is the global companion to the per-wave
    ``focused_frontier_select``: that op picks WHICH frontier rows to
    fetch this wave, this one decides HOW MANY each host may get for the
    whole epoch (the reference's per-site ``max_pages``, crawler.py:112,
    made corpus-adaptive).

    Scale shape: the host table is the corpus-SMALL side (one row per
    host). Σw is one Sum aggregate; base/rem are a stateless pass
    (python-int row arithmetic — budget·w_h overflows int64 at
    10¹⁰-page budgets, and the host table is small enough that the
    scalar loop is noise); the remainder rank is ONE range-partitioned
    sort of fixed-width rows + per-block offsets (the ccnet_buckets
    pack_offsets discipline) — rows are ranked where they live, no
    driver materialization.

    Output: (host, n_pages, weight, base, extra, rnk, quota, surplus);
    ``rnk`` is the 1-based remainder rank."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    tot = hosts_ds.aggregate(Sum(weight_col, alias_name="w"))
    W = int(tot["w"] or 0)
    if W <= 0:
        raise ValueError("allocate_budget: total weight must be positive")

    def base_rem(batch: pa.Table) -> pa.Table:
        ws = batch[weight_col].to_pylist()
        base = [budget * w // W for w in ws]
        rem = [budget * w % W for w in ws]
        return pa.table({
            "host": batch[host_col].cast(pa.string()),
            "n_pages": batch[pages_col].cast(pa.int64()),
            "weight": pa.array([int(w) for w in ws], pa.int64()),
            "base": pa.array(base, pa.int64()),
            "rem": pa.array(rem, pa.int64()),
        })

    scored = hosts_ds.map_batches(
        base_rem, batch_format="pyarrow").materialize()
    leftover = budget - int(
        scored.aggregate(Sum("base", alias_name="b"))["b"] or 0)

    from .grouping import sorted_block_refs

    blocks, rows = sorted_block_refs(
        scored.sort(["rem", "host"], descending=[True, False]),
        ["rem", "host"], [True, False])
    offsets = np.concatenate(([0], np.cumsum(rows, dtype=np.int64)[:-1]))

    @ray.remote
    def _finalize(t: pa.Table, off: int) -> pa.Table:
        rnk = np.arange(off + 1, off + 1 + t.num_rows, dtype=np.int64)
        base = np.asarray(t["base"], np.int64)
        pages = np.asarray(t["n_pages"], np.int64)
        extra = (rnk <= leftover).astype(np.int64)
        quota = np.minimum(pages, base + extra)
        return pa.table({
            "host": t["host"], "n_pages": t["n_pages"],
            "weight": t["weight"], "base": t["base"],
            "extra": pa.array(extra), "rnk": pa.array(rnk),
            "quota": pa.array(quota),
            "surplus": pa.array(base + extra - quota),
        })

    return rd.from_arrow_refs(
        [_finalize.remote(b, int(o)) for b, o in zip(blocks, offsets)])


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
