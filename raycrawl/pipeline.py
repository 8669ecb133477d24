"""The crawl engine: frontier scheduling epochs over Ray Data.

Two execution modes (SURVEY.md §7.7 "crawl-order parity under parallelism"):

- ``strict``: scheduler budget = CONCURRENT_REQUESTS (2), one global heap on
  the driver — reproduces the reference's exact visit sequence
  (crawler.py:1099-1207). The data path (fetch → extract → decide) runs the
  SAME batch stage functions as wave mode, on driver-held Arrow tables. This
  is the parity/test harness, not the scale path.

- ``wave`` (default): the scale engine. The frontier is a Ray ``Dataset``;
  each epoch plans per-host selections via ``groupby("host").map_groups``
  (priority = depth desc, admission wave, host-local rank — the heap order,
  host-sharded), asks the politeness shards for token grants, then streams
  selected rows through ``map_batches`` stages: sim-fetch join → extraction
  → two-phase dedup decide (propose/confirm on the seen shards) → document
  sink + outlink explosion → per-host admission → next frontier. Global
  total order across hosts is relaxed to the documented order-equivalence
  class (per-host sequences and depth-wave structure match the reference);
  everything else (seen-set, politeness budgets, document set, cache
  semantics) matches exactly.

Checkpoint/resume: each epoch can persist frontier Parquet + seen/politeness
shard snapshots + a manifest (written last, atomically). Resuming replays
from the last complete epoch; admission is test-and-set so replay is
idempotent (SURVEY.md §7.7 "resume exactness").

Scale notes (10^10-URL design): the frontier Dataset and all per-wave stages
are host-partitioned — no stage materializes anything proportional to the
full corpus on the driver; the page-index broadcast is the sandbox's
stand-in for the fetch tier (one ``ray.put``, cached per worker process,
never re-shipped per batch); the visits/docs streams write partitioned
Parquet per epoch when ``out_dir`` is set.
"""

from __future__ import annotations

import datetime
import heapq
import json
import os
import pickle
from dataclasses import dataclass, field

import pyarrow as pa

from .fixtures import SiteSpec
from .politeness import HostPoliteness, ShardedPoliteness
from .seen import SeenState, ShardedSeen
from .stages import (
    FRONTIER_SCHEMA,
    ConfirmStage,
    DecideProposeStage,
    ExtractIfHtml,
    SimFetchStage,
    build_page_index,
    explode_outlinks,
)
from .urlnorm import (
    GLOBAL_EXCLUDE_PATTERNS,
    has_binary_extension,
    host_of,
    is_excluded,
    normalize_url,
    url_key,
)

_WORKER_FETCH_CACHE: dict = {}  # per-worker-process page-index cache

VISIT_COLUMNS = ["site", "url", "host", "depth", "wave", "rank", "visit_pos",
                 "grant_ts", "status", "outcome"]
DOC_COLUMNS = ["id", "site", "url", "title", "excerpt", "content", "images",
               "lang", "timestamp", "indexed_at", "last_crawled_at", "content_hash"]
COUNTER_KEYS = {
    "indexed": "pages_indexed",
    "skipped_cache": "pages_skipped_cache",
    "not_indexed": "pages_not_indexed",
    "not_modified": "pages_not_modified",
    "skipped_content_type": "pages_not_indexed",
    "error": "errors",
}


@dataclass
class CrawlConfig:
    mode: str = "wave"                 # "wave" | "strict"
    concurrent_requests: int = 2       # strict-mode global budget (crawler.py:100)
    epoch_len: float = 60.0            # virtual seconds per wave window
    max_queue_size: int = 5000         # crawler.py:109
    cache_days: float = 14.0           # crawler.py:99
    force: bool = False
    now: float = 2_000_000_000.0       # virtual clock origin
    n_seen_shards: int = 4
    n_polite_shards: int = 2
    seen_mode: str = "exact"           # "exact" | "cuckoo"
    max_epochs: int | None = None      # stop after k epochs (kill/resume tests)
    checkpoint_dir: str | None = None
    fetch_batch_size: int = 512
    host_grant_cap: int = 1_000_000_000  # optional per-host per-epoch ceiling
    verbose: bool = False


@dataclass
class SiteRuntime:
    name: str
    seed: str
    host: str
    exclude: list[str]
    no_index: list[str]
    max_depth: int
    max_pages: int
    selector: str | None


@dataclass
class CrawlResult:
    visits: pa.Table
    docs: pa.Table
    refreshes: pa.Table
    counters: dict[str, dict[str, int]]
    frontier_remainder: pa.Table
    epochs: int


def _site_runtime(s: SiteSpec) -> SiteRuntime:
    seed = normalize_url(s.crawl.replace("*", ""))
    return SiteRuntime(
        name=s.name,
        seed=seed,
        host=host_of(seed),
        exclude=GLOBAL_EXCLUDE_PATTERNS + list(s.exclude),
        no_index=list(s.no_index),
        max_depth=s.depth,
        max_pages=s.max_pages,
        selector=s.selector,
    )


def _iso(ts: float) -> str:
    return datetime.datetime.utcfromtimestamp(ts).isoformat()


def _doc_rows_from(final_rows: list[dict], now: float) -> tuple[list[dict], list[dict]]:
    """final stage rows → (indexed document rows, 304 refresh rows)
    (document schema: crawler.py:1045-1058; refresh: crawler.py:1014-1015)."""
    from .urlnorm import generate_doc_id

    docs, refreshes = [], []
    for r in final_rows:
        if r["outcome"] == "indexed":
            docs.append(
                {
                    "id": generate_doc_id(r["url"]),
                    "site": r["site"],
                    "url": r["url"],
                    "title": r["title"],
                    "excerpt": r["excerpt"],
                    "content": r["content"],
                    "images": r["images"],
                    "lang": r["doc_lang"],
                    "timestamp": int(now),
                    "indexed_at": _iso(now),
                    "last_crawled_at": _iso(now),
                    "content_hash": r["content_hash"],
                }
            )
        elif r["outcome"] == "not_modified":
            refreshes.append(
                {
                    "id": generate_doc_id(r["url"]),
                    "site": r["site"],
                    "url": r["url"],
                    "last_crawled_at": _iso(now),
                }
            )
    return docs, refreshes


DOCS_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("site", pa.string()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("excerpt", pa.string()),
        ("content", pa.string()),
        ("images", pa.list_(pa.struct([("url", pa.string()), ("alt", pa.string()),
                                       ("description", pa.string())]))),
        ("lang", pa.string()),
        ("timestamp", pa.int64()),
        ("indexed_at", pa.string()),
        ("last_crawled_at", pa.string()),
        ("content_hash", pa.string()),
    ]
)
REFRESH_SCHEMA = pa.schema(
    [("id", pa.string()), ("site", pa.string()), ("url", pa.string()),
     ("last_crawled_at", pa.string())]
)
VISITS_SCHEMA = pa.schema(
    [
        ("site", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("wave", pa.int32()),
        ("rank", pa.int64()),
        ("visit_pos", pa.int64()),
        ("grant_ts", pa.float64()),
        ("status", pa.int32()),
        ("outcome", pa.string()),
        ("epoch", pa.int32()),
    ]
)


class CrawlEngine:
    def __init__(
        self,
        pages: pa.Table | dict,
        seeds: list[SiteSpec],
        robots: dict[str, str | None] | None = None,
        prior_cache: dict[str, dict] | None = None,
        cfg: CrawlConfig | None = None,
        out_dir: str | None = None,
    ):
        self.cfg = cfg or CrawlConfig()
        self.sites = [_site_runtime(s) for s in seeds]
        self.robots_bodies = dict(robots or {})
        self.page_index = pages if isinstance(pages, dict) else build_page_index(pages)
        self.out_dir = out_dir
        # site delay → host delay map (delay precedence handled in RobotsTable)
        self.site_delays = {
            rt.host: s.delay for rt, s in zip(self.sites, seeds) if s.delay is not None
        }
        self.prior_cache_entries = [
            (url_key(u), dict(rec)) for u, rec in (prior_cache or {}).items()
        ]
        self.selectors = {rt.name: rt.selector for rt in self.sites}
        self.no_index_patterns = {rt.name: rt.no_index for rt in self.sites}
        self.exclude_patterns = {rt.name: rt.exclude for rt in self.sites}
        self.max_depth_by_site = {rt.name: rt.max_depth for rt in self.sites}
        self.seed_by_site = {rt.name: rt.seed for rt in self.sites}

    # ------------------------------------------------------------------
    def run(self, resume_from: str | None = None) -> CrawlResult:
        if self.cfg.mode == "strict":
            return self._run_strict()
        return self._run_wave(resume_from=resume_from)

    # ------------------------------------------------------------------
    # strict mode: exact reference visit order, shared stage functions
    # ------------------------------------------------------------------
    def _run_strict(self) -> CrawlResult:
        cfg = self.cfg
        seen = SeenState(cfg.seen_mode)
        politeness = HostPoliteness(self.robots_bodies, self.site_delays)
        if self.prior_cache_entries:
            seen.set_cache(self.prior_cache_entries)
        fetch = SimFetchStage(self.page_index, seen)
        extract = ExtractIfHtml(self.selectors)
        decide = DecideProposeStage(seen, self.no_index_patterns, cfg.now,
                                    cfg.cache_days, cfg.force)
        confirm = ConfirmStage(seen, cfg.now)

        visits, all_docs, all_refresh = [], [], []
        counters: dict[str, dict[str, int]] = {}
        remainder_rows = []
        for rt in self.sites:
            c = counters.setdefault(rt.name, {v: 0 for v in set(COUNTER_KEYS.values())})
            c["pages_visited"] = 0
            heap: list[tuple[int, int, str, int]] = []
            seq = 0
            heapq.heappush(heap, (0, seq, rt.seed, 0))
            seq += 1
            seen.admit(rt.name, [url_key(rt.seed)])
            vpos = 0
            while heap:
                if rt.max_pages > 0 and c["pages_visited"] >= rt.max_pages:
                    break
                batch: list[tuple[str, int, int]] = []
                while heap and len(batch) < cfg.concurrent_requests:
                    if rt.max_pages > 0 and c["pages_visited"] + len(batch) >= rt.max_pages:
                        break
                    _, sq, url, depth = heapq.heappop(heap)
                    seen.on_popped(rt.name, [url_key(url)])
                    if is_excluded(url, rt.exclude):
                        continue
                    if has_binary_extension(url):
                        seen.mark_visited(rt.name, [url_key(url)])
                        continue
                    if not politeness.robots.can_fetch(host_of(url), url):
                        continue
                    batch.append((url, depth, sq))
                if not batch:
                    continue
                # politeness grants (virtual ts; order not time-dependent)
                grants: list[float] = []
                by_host: dict[str, int] = {}
                for url, _, _ in batch:
                    by_host[host_of(url)] = by_host.get(host_of(url), 0) + 1
                host_ts = {h: politeness.consume(h, n, 0.0) for h, n in by_host.items()}
                taken = {h: 0 for h in by_host}
                for url, _, _ in batch:
                    h = host_of(url)
                    grants.append(host_ts[h][taken[h]])
                    taken[h] += 1

                tbl = pa.table(
                    {
                        "url": pa.array([b[0] for b in batch], pa.string()),
                        "site": pa.array([rt.name] * len(batch), pa.string()),
                        "host": pa.array([host_of(b[0]) for b in batch], pa.string()),
                        "depth": pa.array([b[1] for b in batch], pa.int32()),
                        "wave": pa.array([0] * len(batch), pa.int32()),
                        "rank": pa.array([b[2] for b in batch], pa.int64()),
                        "visit_pos": pa.array(list(range(vpos, vpos + len(batch))), pa.int64()),
                        "grant_ts": pa.array(grants, pa.float64()),
                    }
                )
                final = confirm(decide(extract(fetch(tbl))))
                seen.clear_pending()
                rows = final.to_pylist()
                for r in rows:
                    visits.append(
                        {k: r.get(k) for k in ["site", "url", "host", "depth", "wave",
                                               "rank", "visit_pos", "grant_ts", "status",
                                               "outcome"]}
                        | {"epoch": 0}
                    )
                    c[COUNTER_KEYS[r["outcome"]]] += 1
                    if r["outcome"] != "error":
                        c["pages_visited"] += 1
                vpos += len(rows)
                docs, refreshes = _doc_rows_from(rows, cfg.now)
                all_docs.extend(docs)
                all_refresh.extend(refreshes)
                # link admission: per parent in visit order, per-result queue
                # cap (crawler.py:1203-1207)
                cand = explode_outlinks(final, self.seed_by_site, self.max_depth_by_site)
                by_parent: dict[int, list[dict]] = {}
                for crow in cand.to_pylist():
                    by_parent.setdefault(crow["parent_rank"], []).append(crow)
                for r in rows:
                    if len(heap) >= cfg.max_queue_size:
                        continue
                    for crow in sorted(by_parent.get(r["visit_pos"], []),
                                       key=lambda x: x["lpos"]):
                        if seen.admit(rt.name, [url_key(crow["url"])])[0]:
                            heapq.heappush(
                                heap, (-crow["depth"], seq, crow["url"], crow["depth"])
                            )
                            seq += 1
            remainder_rows.extend(
                {"url": h[2], "site": rt.name, "host": host_of(h[2]),
                 "depth": h[3], "wave": 0, "rank": h[1]}
                for h in heap
            )
        return CrawlResult(
            visits=pa.Table.from_pylist(visits, schema=VISITS_SCHEMA),
            docs=pa.Table.from_pylist(all_docs, schema=DOCS_SCHEMA),
            refreshes=pa.Table.from_pylist(all_refresh, schema=REFRESH_SCHEMA),
            counters=counters,
            frontier_remainder=pa.Table.from_pylist(remainder_rows, schema=FRONTIER_SCHEMA),
            epochs=0,
        )

    # ------------------------------------------------------------------
    # wave mode: the Ray-Data scale engine
    # ------------------------------------------------------------------
    def _run_wave(self, resume_from: str | None = None) -> CrawlResult:
        import ray
        import ray.data as rd

        cfg = self.cfg
        seen = ShardedSeen(cfg.n_seen_shards, cfg.seen_mode)
        politeness = ShardedPoliteness(cfg.n_polite_shards, self.robots_bodies,
                                       self.site_delays)
        pages_ref = ray.put(self.page_index)

        counters: dict[str, dict[str, int]] = {
            rt.name: {v: 0 for v in set(COUNTER_KEYS.values())} | {"pages_visited": 0}
            for rt in self.sites
        }
        epoch0 = 0
        if resume_from:
            frontier_tbl, epoch0, counters = self._restore(resume_from, seen, politeness)
            frontier = rd.from_arrow(frontier_tbl) if frontier_tbl.num_rows else None
        else:
            if self.prior_cache_entries:
                seen.set_cache(self.prior_cache_entries)
            seed_rows = []
            for rt in self.sites:
                if seen.admit(rt.name, [url_key(rt.seed)])[0]:
                    seed_rows.append({"url": rt.seed, "site": rt.name, "host": rt.host,
                                      "depth": 0, "wave": 0, "rank": 0})
            frontier = rd.from_arrow(pa.Table.from_pylist(seed_rows, schema=FRONTIER_SCHEMA))

        fetch = SimFetchStage  # constructed lazily per worker via closure below
        selectors = self.selectors
        no_index_patterns = self.no_index_patterns
        exclude_patterns = self.exclude_patterns
        seed_by_site = self.seed_by_site
        max_depth_by_site = self.max_depth_by_site

        extract_fn = ExtractIfHtml(selectors)
        decide_fn = DecideProposeStage(seen, no_index_patterns, cfg.now,
                                       cfg.cache_days, cfg.force)
        confirm_fn = ConfirmStage(seen, cfg.now)

        def fetch_fn(batch: pa.Table) -> pa.Table:
            # page index cached per worker process (broadcast join: one
            # ray.get per worker, never re-shipped per batch)
            key = pages_ref.hex()
            stage = _WORKER_FETCH_CACHE.get(key)
            if stage is None:
                stage = SimFetchStage(ray.get(pages_ref), seen)
                _WORKER_FETCH_CACHE.clear()
                _WORKER_FETCH_CACHE[key] = stage
            return stage(batch)

        visits: list[dict] = []
        all_docs: list[dict] = []
        all_refresh: list[dict] = []
        remainder_parts: list[pa.Table] = []
        epoch = epoch0
        guard = 0
        while frontier is not None:
            guard += 1
            if guard > 100_000:
                raise RuntimeError("wave engine guard tripped")
            # retire sites whose max_pages budget is exhausted: their queued
            # rows become the resume set (reference breaks the loop and saves
            # the heap remainder, crawler.py:1155-1156 + 1222-1224)
            exhausted = {
                rt.name for rt in self.sites
                if rt.max_pages > 0
                and counters[rt.name]["pages_visited"] >= rt.max_pages
            }
            if exhausted:
                import pyarrow.compute as pc

                ex_rows = frontier.map_batches(
                    lambda t, ex=exhausted: t.filter(
                        pc.is_in(t["site"], value_set=pa.array(list(ex)))
                    ),
                    batch_format="pyarrow",
                ).take_all()
                if ex_rows:
                    remainder_parts.append(
                        pa.Table.from_pylist(ex_rows, schema=FRONTIER_SCHEMA)
                    )
                frontier = frontier.map_batches(
                    lambda t, ex=exhausted: t.filter(
                        pc.invert(pc.is_in(t["site"], value_set=pa.array(list(ex))))
                    ),
                    batch_format="pyarrow",
                ).materialize()
                frontier = rd.from_arrow_refs(frontier.to_arrow_refs())
            n_frontier = frontier.count()
            if n_frontier == 0:
                break
            if cfg.max_epochs is not None and (epoch - epoch0) >= cfg.max_epochs:
                break
            window = (cfg.now + epoch * cfg.epoch_len,
                      cfg.now + (epoch + 1) * cfg.epoch_len)
            remaining = {
                rt.name: (rt.max_pages - counters[rt.name]["pages_visited"]
                          if rt.max_pages > 0 else 1_000_000_000)
                for rt in self.sites
            }
            planner = _make_planner(seen, politeness, exclude_patterns, remaining,
                                    window, cfg.host_grant_cap)
            plan = frontier.groupby("host").map_groups(
                planner, batch_format="pandas"
            ).materialize()
            selected = _filter_eq(plan, "action", "fetch")
            kept = _filter_eq(plan, "action", "keep")
            n_sel = selected.count()
            if cfg.verbose:
                print(f"[wave {epoch}] frontier={n_frontier} selected={n_sel}", flush=True)
            kept_tbl_cols = [f.name for f in FRONTIER_SCHEMA]
            if n_sel == 0:
                frontier = kept.select_columns(kept_tbl_cols).materialize()
                frontier = rd.from_arrow_refs(frontier.to_arrow_refs())
                epoch += 1
                continue

            processed = (
                selected.drop_columns(["action"])
                .map_batches(fetch_fn, batch_format="pyarrow",
                             batch_size=cfg.fetch_batch_size)
                .map_batches(extract_fn, batch_format="pyarrow",
                             batch_size=cfg.fetch_batch_size)
                .map_batches(decide_fn, batch_format="pyarrow",
                             batch_size=cfg.fetch_batch_size)
                .materialize()  # barrier: all proposals in before any confirm
            )
            final = processed.map_batches(
                confirm_fn, batch_format="pyarrow", batch_size=cfg.fetch_batch_size
            ).materialize()
            seen.clear_pending()

            # wave bookkeeping (small: one row per processed page this wave)
            frows = final.select_columns(
                ["site", "url", "host", "depth", "wave", "rank", "visit_pos",
                 "grant_ts", "status", "outcome"]
            ).take_all()
            for r in frows:
                r["epoch"] = epoch
                visits.append(r)
                c = counters[r["site"]]
                c[COUNTER_KEYS[r["outcome"]]] += 1
                if r["outcome"] != "error":
                    c["pages_visited"] += 1
            docs_ds = _filter_in(final, "outcome", ["indexed", "not_modified"])
            doc_rows = docs_ds.select_columns(
                ["site", "url", "title", "excerpt", "content", "images",
                 "doc_lang", "content_hash", "outcome"]
            ).take_all()
            docs, refreshes = _doc_rows_from(doc_rows, cfg.now)
            all_docs.extend(docs)
            all_refresh.extend(refreshes)
            if self.out_dir:
                self._write_epoch(epoch, docs, refreshes, frows)

            # outlinks → admission (per-host, ordered) → next frontier
            explode = _make_explode(seed_by_site, max_depth_by_site)
            cands = final.map_batches(explode, batch_format="pyarrow").materialize()
            admitted = None
            if cands.count() > 0 and n_frontier < cfg.max_queue_size:
                admit_fn = _make_admitter(seen, epoch + 1)
                admitted = cands.groupby("host").map_groups(
                    admit_fn, batch_format="pandas"
                ).materialize()
                if admitted.count() == 0:
                    admitted = None
            kept_f = kept.select_columns(kept_tbl_cols)
            frontier = (kept_f.union(admitted.select_columns(kept_tbl_cols))
                        if admitted is not None else kept_f).materialize()
            # sever lineage across epochs (blocks stay in the object store;
            # unbounded stats/plan chains otherwise blow the recursion limit)
            frontier = rd.from_arrow_refs(frontier.to_arrow_refs())
            epoch += 1
            if cfg.checkpoint_dir:
                self._checkpoint(cfg.checkpoint_dir, epoch, frontier, seen,
                                 politeness, counters)

        if frontier is not None and frontier.count() > 0:
            remainder_parts.append(
                pa.Table.from_pylist(frontier.take_all(), schema=FRONTIER_SCHEMA)
            )
        remainder = (
            pa.concat_tables(remainder_parts)
            if remainder_parts
            else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
        )
        if cfg.checkpoint_dir:
            self._checkpoint(cfg.checkpoint_dir, epoch, frontier, seen, politeness,
                             counters, final_ok=True)
        return CrawlResult(
            visits=pa.Table.from_pylist(visits, schema=VISITS_SCHEMA),
            docs=pa.Table.from_pylist(all_docs, schema=DOCS_SCHEMA),
            refreshes=pa.Table.from_pylist(all_refresh, schema=REFRESH_SCHEMA),
            counters=counters,
            frontier_remainder=remainder,
            epochs=epoch,
        )

    # ------------------------------------------------------------------
    def _write_epoch(self, epoch: int, docs: list[dict], refreshes: list[dict],
                     visits: list[dict]) -> None:
        """Partitioned, resumable output layout: one directory per epoch."""
        import pyarrow.parquet as pq

        d = os.path.join(self.out_dir, f"epoch={epoch:05d}")
        os.makedirs(d, exist_ok=True)
        if docs:
            pq.write_table(pa.Table.from_pylist(docs, schema=DOCS_SCHEMA),
                           os.path.join(d, "documents.parquet"))
        if refreshes:
            pq.write_table(pa.Table.from_pylist(refreshes, schema=REFRESH_SCHEMA),
                           os.path.join(d, "refreshes.parquet"))
        if visits:
            pq.write_table(pa.Table.from_pylist(visits, schema=VISITS_SCHEMA),
                           os.path.join(d, "visits.parquet"))

    def _checkpoint(self, ckpt_dir: str, epoch: int, frontier, seen, politeness,
                    counters, final_ok: bool = False) -> None:
        import pyarrow.parquet as pq

        d = os.path.join(ckpt_dir, f"epoch={epoch:05d}")
        os.makedirs(d, exist_ok=True)
        tbl = (pa.Table.from_pylist(frontier.take_all(), schema=FRONTIER_SCHEMA)
               if frontier is not None else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA))
        pq.write_table(tbl, os.path.join(d, "frontier.parquet"))
        for i, blob in enumerate(seen.snapshots()):
            with open(os.path.join(d, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
        with open(os.path.join(d, "politeness.bin"), "wb") as f:
            f.write(pickle.dumps(politeness.snapshots()))
        manifest = {"epoch": epoch, "counters": counters, "complete": True,
                    "final": final_ok, "n_seen_shards": seen.n}
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))

    def _restore(self, ckpt_dir: str, seen, politeness):
        import pyarrow.parquet as pq

        epochs = sorted(
            e for e in os.listdir(ckpt_dir)
            if os.path.exists(os.path.join(ckpt_dir, e, "manifest.json"))
        )
        if not epochs:
            raise FileNotFoundError(f"no complete checkpoint under {ckpt_dir}")
        d = os.path.join(ckpt_dir, epochs[-1])
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        blobs = []
        for i in range(manifest["n_seen_shards"]):
            with open(os.path.join(d, f"seen_{i}.bin"), "rb") as f:
                blobs.append(f.read())
        seen.restore(blobs)
        with open(os.path.join(d, "politeness.bin"), "rb") as f:
            politeness.restore(pickle.loads(f.read()))
        tbl = pq.read_table(os.path.join(d, "frontier.parquet"))
        return tbl, manifest["epoch"], manifest["counters"]


# ---------------------------------------------------------------------------
# wave-mode group functions
# ---------------------------------------------------------------------------

def _filter_eq(ds, col: str, val: str):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t[col], val)), batch_format="pyarrow"
    )


def _filter_in(ds, col: str, vals: list[str]):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t[col], value_set=pa.array(vals))),
        batch_format="pyarrow",
    )


def _make_planner(seen, politeness, exclude_patterns, remaining, window, grant_cap):
    """Per-host wave planning (map_groups, pandas): priority walk with the
    reference's pop-time skip ladder under politeness + site budgets
    (crawler.py:1157-1178). Side effects: queued-set removal for every
    popped row, visited-marks for extension skips, token consumption for
    selected rows."""
    window_start, window_end = window

    def plan(gdf):
        import math

        import pandas as pd

        host = gdf["host"].iloc[0]
        frames = []
        for site, sdf in gdf.groupby("site", sort=True):
            sdf = sdf.sort_values(["depth", "wave", "rank"],
                                  ascending=[False, True, True], kind="stable")
            urls = sdf["url"].tolist()
            verdicts, avail = politeness.plan_host(
                host, urls, window_start, window_end, grant_cap
            )
            budget = min(avail, remaining.get(site, 1_000_000_000))
            actions = []
            n_sel = 0
            for i, u in enumerate(urls):
                if n_sel >= budget:
                    actions.append("keep")
                    continue
                if is_excluded(u, exclude_patterns.get(site, [])):
                    actions.append("skip_excluded")
                    continue
                if has_binary_extension(u):
                    actions.append("skip_extension")
                    continue
                if not verdicts[i]:
                    actions.append("skip_robots")
                    continue
                actions.append("fetch")
                n_sel += 1
            grant_ts = politeness.take(host, n_sel, window_start) if n_sel else []
            popped = [url_key(u) for u, a in zip(urls, actions) if a != "keep"]
            if popped:
                seen.on_popped(site, popped)
            ext = [url_key(u) for u, a in zip(urls, actions) if a == "skip_extension"]
            if ext:
                seen.mark_visited(site, ext)
            vp, gts, k = [], [], 0
            for a in actions:
                if a == "fetch":
                    vp.append(k)
                    gts.append(grant_ts[k])
                    k += 1
                else:
                    vp.append(-1)
                    gts.append(math.nan)
            sdf = sdf.copy()
            sdf["action"] = actions
            sdf["visit_pos"] = pd.array(vp, dtype="int64")
            sdf["grant_ts"] = gts
            # drop pure-skip rows (they leave the frontier with no output row)
            frames.append(sdf[(sdf["action"] == "fetch") | (sdf["action"] == "keep")])
        return pd.concat(frames) if frames else gdf.iloc[0:0]

    return plan


def _make_explode(seed_by_site, max_depth_by_site):
    def explode(batch: pa.Table) -> pa.Table:
        return explode_outlinks(batch, seed_by_site, max_depth_by_site)

    return explode


def _make_admitter(seen, admit_wave: int):
    """Per-host candidate admission (map_groups, pandas): order by (parent
    visit position, link position) — the reference's counter order within a
    host (crawler.py:1203-1207) — dedupe first-wins, then one ordered
    test-and-set round per site against the seen shards."""

    def admit(gdf):
        import pandas as pd

        frames = []
        for site, sdf in gdf.groupby("site", sort=True):
            sdf = sdf.sort_values(["parent_rank", "lpos"], kind="stable")
            sdf = sdf.drop_duplicates(subset=["url"], keep="first")
            keys = [url_key(u) for u in sdf["url"]]
            flags = seen.admit(site, keys)
            sdf = sdf[pd.Series(flags, index=sdf.index).values].copy()
            if len(sdf) == 0:
                continue
            sdf["wave"] = admit_wave
            sdf["rank"] = range(len(sdf))
            frames.append(sdf[["url", "site", "host", "depth", "wave", "rank"]])
        if not frames:
            out = gdf.iloc[0:0][["url", "site", "host", "depth"]].copy()
            out["wave"] = pd.Series([], dtype="int32")
            out["rank"] = pd.Series([], dtype="int64")
            return out
        return pd.concat(frames)

    return admit


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
