"""Post-hoc compliance audits over an at-rest crawl visit log.

A production crawl is judged after the fact: did every fetch honor the
host's robots rules, and did the scheduler keep the promised per-host
spacing? The reference enforces both at fetch time (crawler.py robots
gate; the inter-request sleep) but has no way to *re-check* a finished
crawl; at 100 TB the audit itself is a distributed job over billions of
visit rows, so it belongs in the engine as first-class operators.

- ``robots_audit``: re-evaluates every visit against a rule table using
  RFC 9309 longest-match semantics (most-specific prefix wins, ties
  resolve to Allow, no matching rule means allowed). NOTE: this is
  deliberately NOT urllib.robotparser's first-match-in-file-order rule
  that the live gate (raycrawl/robots.py RobotsTable, mirroring the
  reference's RobotFileParser use) applies — the audit is the standard's
  semantics, making disagreements between the two visible by design.
- ``politeness_audit``: per-host inter-fetch gaps from visit timestamps
  vs the host's promised crawl delay (reference: the per-site
  ``crawl_delay`` sleep, crawler.py) — min gap, violation count.

Scale shape: the rule table is crawl-small (hosts × a handful of
prefixes) — broadcast ONCE via ``ray.put`` behind a ``max_rules`` raise
guard; the visit scan is then shuffle-free, vectorized per batch (loop
over a host's few rules × numpy prefix test over the batch's rows).
The politeness audit is one host-keyed task hash shuffle
(``grouping.partitioned_apply``) with a vectorized sort+diff per
partition — fixed-width (host, ts) rows only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def robots_audit(visits_ds, rules: list[tuple[str, int, str]], *,
                 host_col: str = "host", path_col: str = "path",
                 id_col: str = "visit_id", max_rules: int = 5_000_000):
    """Re-check every visit against ``rules`` — (host, allow 0/1, path
    prefix) triples — under RFC 9309 longest-match: among the visit's
    host's rules whose prefix starts the path, the LONGEST wins; equal
    lengths resolve to Allow; no match ⇒ allowed. Returns one row per
    visit: (visit_id, host, path, allowed, rule_len) with rule_len = 0
    for the no-match default.

    ``rules`` is the broadcast-small side (guarded by ``max_rules``);
    per batch the matcher loops over the host's rules and runs one
    vectorized ``startswith`` per rule over that host's rows."""
    import ray

    if len(rules) > max_rules:
        raise ValueError(
            f"robots_audit: {len(rules)} rules exceed max_rules="
            f"{max_rules} — a rule table this size should be joined, "
            "not broadcast")
    by_host: dict[str, list[tuple[str, int]]] = {}
    for host, allow, prefix in rules:
        by_host.setdefault(host, []).append((prefix, int(allow)))
    rules_ref = ray.put(by_host)

    def audit(batch: pa.Table) -> pa.Table:
        table = ray.get(rules_ref)
        hosts = np.asarray(batch[host_col].to_pylist(), dtype=object)
        paths = pd.Series(batch[path_col].to_pylist(), dtype="string")
        paths = paths.fillna("")
        n = len(hosts)
        # best match so far: (prefix length, allow); default allowed
        best_len = np.zeros(n, dtype=np.int64)
        allowed = np.ones(n, dtype=np.int64)
        for host in pd.unique(hosts):
            hmask = hosts == host
            hrules = table.get(host, [])
            if not hrules:
                continue
            hpaths = paths[hmask]
            hbest = np.zeros(int(hmask.sum()), dtype=np.int64)
            hallow = np.ones(int(hmask.sum()), dtype=np.int64)
            for prefix, allow in hrules:
                m = hpaths.str.startswith(prefix).to_numpy(dtype=bool)
                plen = len(prefix)
                # longer wins; equal length: Allow beats Disallow
                take = m & ((plen > hbest)
                            | ((plen == hbest) & (allow > hallow)))
                hbest = np.where(take, plen, hbest)
                hallow = np.where(take, allow, hallow)
            best_len[hmask] = hbest
            allowed[hmask] = hallow
        return pa.table({
            "visit_id": batch[id_col].cast(pa.int64()),
            "host": batch[host_col].cast(pa.string()),
            "path": batch[path_col].cast(pa.string()),
            "allowed": pa.array(allowed, pa.int64()),
            "rule_len": pa.array(best_len, pa.int64())})

    return visits_ds.map_batches(audit, batch_format="pyarrow")


def politeness_audit(visits_ds, *, host_col: str = "host",
                     ts_col: str = "ts_us", delay_col: str = "delay_us",
                     n_parts: int | None = None):
    """Per-host crawl-delay compliance from an at-rest visit log: sort
    each host's fetch timestamps, diff consecutive pairs, and count the
    gaps shorter than the host's promised delay. ``delay_us`` must be
    constant per host (it rides each visit row so no second table is
    needed). Returns one row per host: (host, n_fetches, min_gap_us
    — -1 for single-fetch hosts — n_violations, delay_us)."""
    from .grouping import partitioned_apply, resolve_parts

    n_parts = resolve_parts(n_parts)

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({
                "host": pd.Series([], dtype="string"),
                "n_fetches": pd.Series([], dtype="int64"),
                "min_gap_us": pd.Series([], dtype="int64"),
                "n_violations": pd.Series([], dtype="int64"),
                "delay_us": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values([host_col, ts_col], kind="stable")
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        gap = np.diff(ts)
        same = (pdf[host_col].to_numpy()[1:]
                == pdf[host_col].to_numpy()[:-1])
        delay = pdf[delay_col].to_numpy(dtype=np.int64)[1:]
        g = pd.DataFrame({
            "host": pdf[host_col].to_numpy()[1:],
            "gap": gap, "viol": (gap < delay).astype(np.int64)})[same]
        agg = (g.groupby("host", as_index=False)
               .agg(min_gap_us=("gap", "min"),
                    n_violations=("viol", "sum")))
        base = (pdf.groupby(host_col, as_index=False)
                .agg(n_fetches=(ts_col, "size"),
                     delay_us=(delay_col, "first"))
                .rename(columns={host_col: "host"}))
        out = base.merge(agg, on="host", how="left")
        out["min_gap_us"] = (out["min_gap_us"]
                             .fillna(-1).astype("int64"))
        out["n_violations"] = (out["n_violations"]
                               .fillna(0).astype("int64"))
        return out[["host", "n_fetches", "min_gap_us",
                    "n_violations", "delay_us"]]

    return partitioned_apply(
        visits_ds.select_columns([host_col, ts_col, delay_col]),
        [host_col], per_partition, n_parts)


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
