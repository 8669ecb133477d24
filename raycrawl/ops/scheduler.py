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


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
