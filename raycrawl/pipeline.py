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

import numpy as np
import pyarrow as pa

from .fixtures import SiteSpec
from .politeness import HostPoliteness, ShardedPoliteness
from .seen import SeenState, ShardedSeen
from .stages import (
    FRONTIER_SCHEMA,
    AtomicDecideStage,
    ConfirmStage,
    DecideProposeStage,
    ExtractIfHtml,
    LiveFetchStage,
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
    n_seen_shards: int | None = None   # None → cluster-proportional (CPU/4)
    n_polite_shards: int | None = None  # None → cluster-proportional (CPU/8)
    seen_mode: str = "exact"           # "exact" | "cuckoo" | "cuckoo_window"
    seen_window_epochs: int = 4        # cuckoo_window only: epochs a URL
                                       # stays seen before it expires and
                                       # becomes re-admittable (recrawl TTL
                                       # at membership granularity; memory
                                       # bounded by window, not crawl age)
    max_epochs: int | None = None      # stop after k epochs (kill/resume tests)
    max_duration_s: float | None = None  # wall-clock crawl budget: stop before
                                         # the next wave once exceeded, keep the
                                         # remainder resumable (reference
                                         # MAX_CRAWL_DURATION=1800, crawler.py:108,
                                         # 1138-1141)
    checkpoint_dir: str | None = None
    checkpoint_keep: int | None = None   # retention: keep only the last K
                                         # COMPLETE epoch checkpoints (a
                                         # 100-TB crawl's frontier snapshot
                                         # dwarfs everything else on disk —
                                         # the stats-retention discipline
                                         # applied to resume state). None →
                                         # keep all (default; resume uses
                                         # only the newest).
    fetch_batch_size: int = 512
    host_grant_cap: int = 1_000_000_000  # optional per-host per-epoch ceiling
    plan_partitions: int = 32            # coarse host partitions per wave
    # hot-host skew guard ("salted repartitioning of hot domains"): when one
    # host-partition's granted fetch set exceeds this many rows, its
    # fetch+extract chunks fan out as nested Ray sub-tasks (gathered in
    # plan order; plan and decide stay serial in the partition task, so
    # ordering/dedup semantics are byte-identical to the serial path).
    # None → auto (4 × fetch_batch_size); 0 disables. Sim tier only — the
    # live tier keeps per-host serial fetching for politeness spacing.
    hot_fanout_rows: int | None = None
    dedup_mode: str = "two_phase"        # "two_phase" (canonical winner) |
                                         # "atomic" (one pass, arrival winner)
    defer_admission: bool = True         # outlink candidates ride the
                                         # frontier as tagged rows and are
                                         # admitted inside the NEXT wave's
                                         # plan pass — one fewer shuffle +
                                         # execution per wave. Default since
                                         # r4 (VERDICT #7): it is the benched
                                         # production config and parity-
                                         # tested (deferred == inline docs/
                                         # counters/per-host order); False =
                                         # the legacy inline admitter (a
                                         # mid-crawl frontier_remainder under
                                         # True may contain not-yet-admitted
                                         # candidate urls)
    # None = auto: collect on the driver ONLY when no out_dir sink exists
    # (test convenience); with a sink configured, docs/visits stream to
    # partitioned Parquet on the workers and never funnel through the
    # driver — the scale-safe default (counters always come from the
    # distributed metrics partials either way)
    collect_docs: bool | None = None
    collect_visits: bool | None = None
    # embedding tier composed into the crawl: indexed documents get an
    # ``embedding`` (fixed-width list<float32>) + ``embed_ok`` column at
    # flush time, exactly where the reference attaches _vectors to the
    # Meilisearch batch (crawler.py:682-758, 739-744). Dict of
    # embeddings.EmbedStage kwargs, e.g. {"provider": "fake", "dim": 8};
    # the provider is built once per worker PROCESS (module cache) — the
    # task-pool analogue of once-per-actor __init__.
    embed: dict | None = None
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
    # per-partition lineage + fetch/extract metrics (north_rule): one row
    # per (stage, epoch, partition, site, outcome), aggregated worker-side
    metrics: pa.Table | None = None
    # cumulative per-site frontier dequeues (pops incl. excluded/robots/
    # extension skips) — the north_rule's frontier-dequeue-URLs/s numerator
    frontier_dequeued: dict[str, int] | None = None


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
        # documents key on the post-redirect url (crawler.py:1045-1047);
        # the 304 refresh keys on the requested url (final == requested
        # there, crawler.py:981 + 1014)
        fu = r.get("final_url") or r["url"]
        if r["outcome"] == "indexed":
            d = {
                "id": generate_doc_id(fu),
                "site": r["site"],
                "url": fu,
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
            if "embedding" in r:  # embed-enabled crawl (crawler.py:739-744)
                d["embedding"] = r["embedding"]
                d["embed_ok"] = r["embed_ok"]
            docs.append(d)
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


def _docs_from_batch(batch: pa.Table, now: float) -> pa.Table:
    """Vectorized batch form of ``_doc_rows_from`` (indexed side) for the
    distributed sink — runs inside map_batches, one table per block."""
    import pyarrow.compute as pc

    from .urlnorm import generate_doc_id

    b = batch.filter(pc.equal(batch["outcome"], "indexed"))
    n = b.num_rows
    iso = _iso(now)
    fu = (b["final_url"] if "final_url" in b.column_names else b["url"])
    cols = {"id": pa.array([generate_doc_id(u) for u in fu.to_pylist()],
                           pa.string()),
            "site": b["site"], "url": fu.cast(pa.string()), "title": b["title"],
            "excerpt": b["excerpt"], "content": b["content"], "images": b["images"],
            "lang": b["doc_lang"],
            "timestamp": pa.array([int(now)] * n, pa.int64()),
            "indexed_at": pa.array([iso] * n, pa.string()),
            "last_crawled_at": pa.array([iso] * n, pa.string()),
            "content_hash": b["content_hash"]}
    schema = DOCS_SCHEMA
    if "embedding" in b.column_names:  # embed-enabled crawl
        cols["embedding"] = b["embedding"]
        cols["embed_ok"] = b["embed_ok"]
        emb_t = b.schema.field("embedding").type
        schema = DOCS_SCHEMA.append(pa.field("embedding", emb_t)).append(
            pa.field("embed_ok", pa.bool_()))
    return pa.table(cols).cast(schema)


def _refresh_from_batch(batch: pa.Table, now: float) -> pa.Table:
    """Vectorized batch form of ``_doc_rows_from`` (304-refresh side)."""
    import pyarrow.compute as pc

    from .urlnorm import generate_doc_id

    b = batch.filter(pc.equal(batch["outcome"], "not_modified"))
    n = b.num_rows
    return pa.table(
        {"id": pa.array([generate_doc_id(u) for u in b["url"].to_pylist()],
                        pa.string()),
         "site": b["site"], "url": b["url"],
         "last_crawled_at": pa.array([_iso(now)] * n, pa.string())}
    ).cast(REFRESH_SCHEMA)


def _visits_from_batch(batch: pa.Table, epoch: int) -> pa.Table:
    """Visit-log rows (VISITS_SCHEMA) from a final wave batch."""
    cols = {f.name: batch[f.name] for f in VISITS_SCHEMA if f.name != "epoch"}
    cols["epoch"] = pa.array([epoch] * batch.num_rows, pa.int32())
    return pa.table(cols).cast(VISITS_SCHEMA)


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


def _docs_schema(embed_dim: int | None = None) -> pa.Schema:
    """DOCS_SCHEMA, plus the embedding columns when the crawl composes the
    embedding tier (CrawlConfig.embed)."""
    if not embed_dim:
        return DOCS_SCHEMA
    return DOCS_SCHEMA.append(
        pa.field("embedding", pa.list_(pa.float32(), embed_dim))
    ).append(pa.field("embed_ok", pa.bool_()))
METRICS_SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("epoch", pa.int32()),
        ("partition_id", pa.int64()),
        ("site", pa.string()),
        ("outcome", pa.string()),
        ("n_rows", pa.int64()),
        ("n_links", pa.int64()),
        ("errors", pa.int64()),
        ("secs", pa.float64()),
    ]
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
        transport=None,
    ):
        self.cfg = cfg or CrawlConfig()
        self.sites = [_site_runtime(s) for s in seeds]
        self.robots_bodies = dict(robots or {})
        # live tier: with a transport (see stages.LiveFetchStage — picklable
        # callable url→FetchResponse; None-pages allowed), the wave engine
        # fetches over HTTP instead of the sim page index
        self.transport = transport
        # pa.Table → materialized index; anything with .get(url) (dict or an
        # on-demand SyntheticPageIndex) passes through
        self.page_index = (build_page_index(pages) if isinstance(pages, pa.Table)
                           else (pages or {}))
        self.out_dir = out_dir
        # site delay → host delay map (delay precedence handled in RobotsTable)
        self.site_delays = {
            rt.host: s.delay for rt, s in zip(self.sites, seeds) if s.delay is not None
        }
        # cache records travel/store as slim tuples (hash, last_crawl, etag,
        # site, last_modified) — dict-per-key costs ~5x in RPC pickle and
        # shard RAM (fields: cache_db.py:17-29)
        self.prior_cache_entries = [
            (url_key(u), (rec.get("content_hash"), rec.get("last_crawl"),
                          rec.get("etag"), rec.get("site"),
                          rec.get("last_modified")))
            for u, rec in (prior_cache or {}).items()
        ]
        self.selectors = {rt.name: rt.selector for rt in self.sites}
        self.no_index_patterns = {rt.name: rt.no_index for rt in self.sites}
        self.exclude_patterns = {rt.name: rt.exclude for rt in self.sites}
        self.max_depth_by_site = {rt.name: rt.max_depth for rt in self.sites}
        self.seed_by_site = {rt.name: rt.seed for rt in self.sites}

    # ------------------------------------------------------------------
    def _robots_fetcher(self):
        """Live robots tier: with an HTTP transport, hosts missing from the
        injected ``robots`` bodies get their robots.txt fetched+cached lazily
        inside the politeness shards (ref get_robot_parser,
        crawler.py:411-428). Without a transport (sim fetch), None — injected
        bodies stay authoritative and unknown hosts are allow-all."""
        if self.transport is None:
            return None
        from urllib.parse import urlparse

        from .robots import make_robots_fetcher

        schemes = {host_of(rt.seed): (urlparse(rt.seed).scheme or "https")
                   for rt in self.sites}
        return make_robots_fetcher(self.transport, scheme_by_host=schemes)

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
        if cfg.seen_mode == "cuckoo_window":
            # strict mode is single-epoch (exact reference visit order) and
            # never rotates the window, so TTL semantics would silently
            # degrade to grow-only cuckoo — reject instead (ADVICE r4)
            raise ValueError(
                "seen_mode='cuckoo_window' requires wave mode: strict mode "
                "is single-epoch and never advances the sliding window — "
                "use seen_mode='cuckoo' (identical membership within one "
                "epoch) or mode='wave'")
        seen = SeenState(cfg.seen_mode,
                         window_epochs=cfg.seen_window_epochs)
        politeness = HostPoliteness(self.robots_bodies, self.site_delays,
                                    robots_fetcher=self._robots_fetcher())
        if self.prior_cache_entries:
            seen.set_cache(self.prior_cache_entries)
        fetch = SimFetchStage(self.page_index, seen)
        extract = ExtractIfHtml(self.selectors)
        decide = DecideProposeStage(seen, self.no_index_patterns, cfg.now,
                                    cfg.cache_days, cfg.force)
        confirm = ConfirmStage(seen, cfg.now, mark_visited=True)

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
                if cfg.embed:
                    final = _attach_embeddings(final, cfg.embed)
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
        strict_metrics = [
            {"stage": "fetch_extract", "epoch": 0, "partition_id": 0,
             "site": site, "outcome": outcome,
             "n_rows": (_n := sum(1 for v in visits if v["site"] == site
                                  and v["outcome"] == outcome)),
             "n_links": 0, "errors": _n if outcome == "error" else 0,
             "secs": 0.0}
            for site in sorted({v["site"] for v in visits})
            for outcome in sorted({v["outcome"] for v in visits
                                   if v["site"] == site})
        ]
        return CrawlResult(
            visits=pa.Table.from_pylist(visits, schema=VISITS_SCHEMA),
            docs=pa.Table.from_pylist(
                all_docs, schema=_docs_schema(_embed_dim(cfg.embed))),
            refreshes=pa.Table.from_pylist(all_refresh, schema=REFRESH_SCHEMA),
            counters=counters,
            frontier_remainder=pa.Table.from_pylist(remainder_rows, schema=FRONTIER_SCHEMA),
            epochs=0,
            metrics=pa.Table.from_pylist(strict_metrics, schema=METRICS_SCHEMA),
        )

    # ------------------------------------------------------------------
    # wave mode: the Ray-Data scale engine
    # ------------------------------------------------------------------
    def _run_wave(self, resume_from: str | None = None) -> CrawlResult:
        import ray
        import ray.data as rd

        cfg = self.cfg
        # shard pools scale with the cluster (a 4N-node deployment provisions
        # 4x the seen/politeness shards — the state tier must not become the
        # fixed-size bottleneck that caps scaling efficiency)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_seen = cfg.n_seen_shards or max(2, ncpu // 4)
        n_pol = cfg.n_polite_shards or max(2, ncpu // 8)
        if resume_from:
            # key-routing must match the snapshot layout: restore with the
            # checkpoint's shard counts regardless of current cluster size
            # (a resume on a different-sized cluster would otherwise size the
            # pools from the CURRENT CPU count and fail shard-count asserts)
            manifest0 = self._peek_manifest(resume_from)
            n_seen = manifest0["n_seen_shards"]
            n_pol = manifest0.get("n_polite_shards", n_pol)
        seen = ShardedSeen(n_seen, cfg.seen_mode,
                           window_epochs=cfg.seen_window_epochs)
        politeness = ShardedPoliteness(n_pol, self.robots_bodies,
                                       self.site_delays,
                                       robots_fetcher=self._robots_fetcher())
        pages_ref = ray.put(self.page_index)

        counters: dict[str, dict[str, int]] = {
            rt.name: {v: 0 for v in set(COUNTER_KEYS.values())} | {"pages_visited": 0}
            for rt in self.sites
        }
        epoch0 = 0
        if resume_from:
            frontier_tbl, epoch0, counters = self._restore(resume_from, seen, politeness)
            frontier = rd.from_arrow(frontier_tbl) if frontier_tbl.num_rows else None
            # EXACTLY-ONCE SINK on resume: split tasks write sink chunks
            # DURING a wave, so a crash mid-wave leaves partial
            # epoch=<e>/ chunk files for every epoch >= the last
            # committed manifest (epoch0 = first epoch NOT completed).
            # The resumed run re-executes those epochs into the same
            # dirs — drop the partial output first or every re-crawled
            # url is double-indexed (r5 fault-injection hardening).
            if self.out_dir and os.path.isdir(self.out_dir):
                import shutil as _shutil
                for name in os.listdir(self.out_dir):
                    if not name.startswith("epoch="):
                        continue
                    d = os.path.join(self.out_dir, name)
                    # checkpoint epoch dirs use the SAME epoch=NNNNN
                    # naming — if out_dir and checkpoint_dir are the
                    # same path, deleting by name alone would destroy
                    # the checkpoint just restored. Only remove dirs
                    # with the SINK layout and no manifest. (Sharing
                    # out_dir with checkpoint_dir therefore degrades
                    # exactly-once cleanup: a manifest-bearing dir's
                    # partial sink chunks are preserved — keep the two
                    # directories separate in production.)
                    if os.path.exists(os.path.join(d, "manifest.json")):
                        continue
                    if not any(os.path.isdir(os.path.join(d, sub))
                               for sub in ("documents", "refreshes",
                                           "visits")):
                        continue
                    try:
                        if int(name.split("=", 1)[1]) >= epoch0:
                            _shutil.rmtree(d, ignore_errors=True)
                    except ValueError:
                        pass
        else:
            if self.prior_cache_entries:
                seen.set_cache(self.prior_cache_entries)
            # ONE batched admission round for all seeds (a per-site RPC loop
            # is O(sites) sequential ray.gets — seconds at replica scale)
            flags = seen.admit_many(
                [(rt.name, url_key(rt.seed)) for rt in self.sites]
            )
            seed_rows = [
                {"url": rt.seed, "site": rt.name, "host": rt.host,
                 "depth": 0, "wave": 0, "rank": 0}
                for rt, f in zip(self.sites, flags) if f
            ]
            frontier = rd.from_arrow(pa.Table.from_pylist(seed_rows, schema=FRONTIER_SCHEMA))

        fetch = SimFetchStage  # constructed lazily per worker via closure below
        selectors = self.selectors
        no_index_patterns = self.no_index_patterns
        exclude_patterns = self.exclude_patterns
        seed_by_site = self.seed_by_site
        max_depth_by_site = self.max_depth_by_site

        extract_fn = ExtractIfHtml(selectors)
        atomic = cfg.dedup_mode == "atomic"
        if atomic:
            decide_fn = AtomicDecideStage(seen, no_index_patterns, cfg.now,
                                          cfg.cache_days, cfg.force)
            confirm_fn = None
        else:
            decide_fn = DecideProposeStage(seen, no_index_patterns, cfg.now,
                                           cfg.cache_days, cfg.force)
            confirm_fn = ConfirmStage(seen, cfg.now)

        fresh_run = not self.prior_cache_entries and not resume_from
        # auto collection: driver-side tables only when no distributed sink
        collect_docs = (cfg.collect_docs if cfg.collect_docs is not None
                        else self.out_dir is None)
        collect_visits = (cfg.collect_visits if cfg.collect_visits is not None
                          else self.out_dir is None)

        transport = self.transport

        def fetch_fn(batch: pa.Table) -> pa.Table:
            # fetch stage cached per worker process: the sim tier ray.gets
            # the broadcast page index once (never re-shipped per batch);
            # the live tier builds its HTTP session/thread pool once.
            # BOUNDARY: the sim tier's per-worker index broadcast is the
            # SANDBOX stand-in for live HTTP (SURVEY §7.1, J6) and is
            # O(unique docs) via SyntheticPageIndex — it must never be
            # pointed at a real corpus-scale pages table; the production
            # path at scale is LiveFetchStage.
            key = "live" if transport is not None else pages_ref.hex()
            stage = _WORKER_FETCH_CACHE.get(key)
            if stage is None:
                if transport is not None:
                    stage = LiveFetchStage(seen, transport=transport,
                                           skip_cache=fresh_run)
                else:
                    stage = SimFetchStage(ray.get(pages_ref), seen,
                                          skip_cache=fresh_run)
                _WORKER_FETCH_CACHE.clear()
                _WORKER_FETCH_CACHE[key] = stage
            return stage(batch)

        visits: list[dict] = []
        all_docs: list[dict] = []
        all_refresh: list[dict] = []
        metrics_rows: list[dict] = []   # pre-aggregated per (partition, site, outcome)
        remainder_parts: list[pa.Table] = []
        retire_refs: list = []          # retired frontier blocks (stay in plasma)
        # fused-wave fan-out: one map_groups task per block; match the
        # cluster width (capped by the host-partition count) so tiny test
        # sessions aren't taxed with empty-block overhead
        pp_width = max(2, min(cfg.plan_partitions, ncpu))
        epoch = epoch0
        guard = 0
        import time as _wall

        # between waves the frontier lives as a list of Arrow block refs in
        # plasma (plus its tracked row count) — Dataset wrappers are built
        # per wave, so no count()/materialize() executions ever run on it
        if frontier is None:
            frontier_refs: list = []
            n_frontier = 0
        else:
            frontier_refs = frontier.to_arrow_refs()
            n_frontier = frontier.count()
        # partitioning state for the pass-through shuffle: seeds/resume
        # blocks start mixed (unknown partitioning); pure_parts[p] holds the
        # previous wave's partition-pure keep block for partition p
        pure_parts: list[list] | None = None
        pure_width = 0
        mixed_refs = list(frontier_refs)
        # split-round context: shipped ONCE via ray.put, reused every wave
        explode = _make_explode(seed_by_site, max_depth_by_site)
        want_final = (not cfg.defer_admission) or collect_docs or collect_visits
        split_ctx = ray.put({
            "confirm_fn": confirm_fn,
            "batch_size": cfg.fetch_batch_size,
            "defer": cfg.defer_admission,
            "explode_fn": explode,
            "seen": seen,
            "want_final": want_final,
            "out_dir": self.out_dir,
            "now": cfg.now,
            "embed": cfg.embed,
        })

        # hot-host skew guard: plasma-resident (fetch_fn, extract_fn) for
        # the nested sub-tasks; live tier stays serial per host (politeness
        # spacing relies on per-host serial fetch order)
        hot_rows = (cfg.hot_fanout_rows if cfg.hot_fanout_rows is not None
                    else 4 * cfg.fetch_batch_size)
        fe_ref = (ray.put((fetch_fn, extract_fn))
                  if (hot_rows and transport is None) else None)

        wall0 = _wall.monotonic()
        while True:
            if (cfg.max_duration_s is not None
                    and _wall.monotonic() - wall0 >= cfg.max_duration_s):
                break  # wall-clock budget: remainder + checkpoint stay resumable
            if n_frontier == 0:
                break
            if cfg.max_epochs is not None and (epoch - epoch0) >= cfg.max_epochs:
                break
            guard += 1
            if guard > 100_000:
                raise RuntimeError("wave engine guard tripped")
            window = (cfg.now + epoch * cfg.epoch_len,
                      cfg.now + (epoch + 1) * cfg.epoch_len)
            remaining = {
                rt.name: (rt.max_pages - counters[rt.name]["pages_visited"]
                          if rt.max_pages > 0 else 1_000_000_000)
                for rt in self.sites
            }
            # sites whose max_pages budget is exhausted RETIRE inside the
            # plan pass: their rows flow to the remainder/resume set with no
            # extra frontier scan (reference breaks the loop and saves the
            # heap remainder, crawler.py:1155-1156 + 1222-1224)
            exhausted = {s for s, r in remaining.items() if r <= 0}
            blocked_def: set[str] = set()
            if cfg.defer_admission:
                # queue-cap check moves to plan time with the admission
                qc = seen.queued_counts([rt.name for rt in self.sites])
                blocked_def = {s for s, n in qc.items()
                               if n >= cfg.max_queue_size}
            planner = _make_planner(seen, politeness, exclude_patterns, remaining,
                                    window, cfg.host_grant_cap,
                                    blocked_sites=blocked_def,
                                    retire_sites=exhausted,
                                    window_seen=(cfg.seen_mode
                                                 == "cuckoo_window"))
            import time as _time

            # FUSED wave pass: plan + fetch + extract + decide run inside ONE
            # task per host partition. The shuffle that co-locates a host's
            # rows is a DIY two-round task shuffle over the plasma-resident
            # frontier blocks — round A hash-splits each block by
            # crc32(host) % width (num_returns=width, sub-tables stay in
            # plasma), round B concats a partition's slices and runs the
            # fused pass. Replaces the per-wave repartition→sort-groupby
            # Dataset execution, whose fixed multi-round overhead (~0.5-1 s
            # per wave at every cluster size) was the dominant non-scaling
            # term in the 8-vs-32 bracket (BASELINE.md round 3). The output
            # mixes action='keep'/'retire' rows (frontier carry-over /
            # budget-exhausted, null processed columns) and action='fetch'
            # rows (fully processed), conformed to one deterministic schema.
            plan_process = _make_plan_process(planner, fetch_fn, extract_fn,
                                              decide_fn, cfg.fetch_batch_size,
                                              fe_ref=fe_ref,
                                              hot_rows=hot_rows)
            _t0 = _time.time()
            # fan-out sized to the wave: a 500-row wave across 32 partitions
            # is pure scheduling overhead, a 60k-row wave wants full width
            width = max(2, min(pp_width, n_frontier // 64 + 1))
            # PARTITION-PURE PASS-THROUGH: a split task's keep output
            # contains only its own partition's hosts, so when the width is
            # unchanged those blocks re-enter partition p directly — round A
            # re-routes ONLY new rows (candidates/admissions/seeds/resume).
            # At design scale (10^10-row frontier, ~10^7 grants/wave) the
            # per-wave shuffle moves O(new rows), not O(frontier).
            if pure_parts is not None and width != pure_width:
                mixed_refs = mixed_refs + [r for part in pure_parts
                                           for r in part]
                pure_parts = None
            split_refs = [
                _hash_split_task.options(num_returns=width).remote(width, r)
                for r in mixed_refs
            ]
            pp_fn = ray.put(plan_process)  # shipped once per wave, not per task
            refs = [
                _plan_process_task.remote(
                    pp_fn,
                    (pure_parts[p] if pure_parts is not None else [])
                    + [sr[p] for sr in split_refs],
                )
                for p in range(width)
            ]
            _t_plan = _time.time() - _t0

            # SPLIT round: one lightweight task round over the processed wave
            # blocks (refs stay in plasma — no copies). Each task: confirm →
            # metrics partial → keep/retire/candidate routing → optional
            # Parquet sink. Only the tiny meta dict is ray.get'd by the
            # driver. Two-phase dedup needs the propose/confirm BARRIER the
            # old materialize() provided: every plan task's proposals must
            # land before any split task confirms — an explicit ray.wait on
            # the full plan round (atomic mode skips it and lets split tasks
            # pipeline behind plan stragglers).
            _t0 = _time.time()
            if not atomic:
                ray.wait(refs, num_returns=len(refs), fetch_local=False)
            # one split task PER plan partition (not per chunk): keeps the
            # keep-output partition-pure for next wave's pass-through
            outs = [
                _wave_split_task.options(num_returns=5).remote(
                    split_ctx, epoch, p, [refs[p]]
                )
                for p in range(width)
            ]
            final_refs = [o[0] for o in outs]
            keep_refs = [o[1] for o in outs]
            cand_refs = [o[2] for o in outs]
            ret_refs = [o[3] for o in outs]
            metas = ray.get([o[4] for o in outs])
            if not atomic:
                seen.clear_pending()
            _t_split = _time.time() - _t0

            total_links = 0
            n_sel = 0
            for meta in metas:
                n_sel += meta["n_final"]
                for m in meta["metrics"]:
                    total_links += m["n_links"]
                    c = counters[m["site"]]
                    c[COUNTER_KEYS[m["outcome"]]] += m["n_rows"]
                    if m["outcome"] != "error":
                        c["pages_visited"] += m["n_rows"]
                    metrics_rows.append(
                        {"stage": "fetch_extract", "epoch": epoch, **m}
                    )
            retire_refs.extend(
                r for r, meta in zip(ret_refs, metas) if meta["n_retire"]
            )
            if (collect_visits or collect_docs) and n_sel:
                # test-only convenience modes: the split tasks already
                # projected the collection columns; one ray.get serves both
                # the visit log and the doc tables
                vkeys = ["site", "url", "host", "depth", "wave", "rank",
                         "visit_pos", "grant_ts", "status", "outcome"]
                ckeys = vkeys + ["final_url", "title", "excerpt", "content",
                                 "images", "doc_lang", "content_hash"]
                if cfg.embed:
                    ckeys += ["embedding", "embed_ok"]
                rows = [
                    r
                    for t in ray.get(final_refs)
                    if t.num_rows
                    for r in t.select(ckeys).to_pylist()
                ]
                if collect_visits:
                    for r in rows:
                        visits.append({k: r[k] for k in vkeys}
                                      | {"epoch": epoch})
                if collect_docs:
                    docs, refreshes = _doc_rows_from(rows, cfg.now)
                    all_docs.extend(docs)
                    all_refresh.extend(refreshes)

            # next frontier = keep blocks (partition-pure, pass through) +
            # candidate/admitted blocks (mixed, round-A-routed next wave).
            # Queue cap is PER SITE (the reference's 5000-entry heap cap is
            # per-site, crawler.py:1203): sites at/over cap stop admitting.
            _t0 = _time.time()
            pure_parts = [[r] if meta["n_keep"] else []
                          for r, meta in zip(keep_refs, metas)]
            pure_width = width
            mixed_refs = []
            n_next = sum(meta["n_keep"] for meta in metas)
            if cfg.defer_admission:
                # candidates ride the frontier unadmitted (rank = -1,
                # carrying parent_rank/lpos order); the NEXT wave's plan
                # pass admits them — zero extra executions this wave
                mixed_refs = [r for r, meta in zip(cand_refs, metas)
                              if meta["n_cand"]]
                n_next += sum(meta["n_cand"] for meta in metas)
            elif total_links > 0:
                qc = seen.queued_counts([rt.name for rt in self.sites])
                blocked = {s for s, n in qc.items() if n >= cfg.max_queue_size}
                admit_fn = _make_admitter(seen, epoch + 1, blocked)
                final_ne = [r for r, meta in zip(final_refs, metas)
                            if meta["n_final"]]
                admitted = rd.from_arrow_refs(final_ne).map_batches(
                    explode, batch_format="pyarrow"
                ).map_batches(
                    lambda t: _add_hpart(t, cfg.plan_partitions), batch_format="pyarrow"
                ).groupby("_hpart").map_groups(
                    admit_fn, batch_format="pandas"
                ).materialize()
                n_adm = admitted.count()
                if n_adm:
                    mixed_refs = admitted.to_arrow_refs()
                    n_next += n_adm
            frontier_refs = [r for part in pure_parts for r in part] + mixed_refs
            n_frontier = n_next
            _t_admit = _time.time() - _t0
            if cfg.verbose:
                print(f"[wave {epoch}] sel={n_sel} next={n_frontier} "
                      f"planproc={_t_plan:.2f} split={_t_split:.2f} "
                      f"admit={_t_admit:.2f} fblocks={len(frontier_refs)}",
                      flush=True)
            epoch += 1
            if cfg.seen_mode == "cuckoo_window":
                seen.rotate_window()
            if cfg.checkpoint_dir:
                self._checkpoint(cfg.checkpoint_dir, epoch,
                                 rd.from_arrow_refs(frontier_refs)
                                 if frontier_refs else None,
                                 seen, politeness, counters,
                                 keep=cfg.checkpoint_keep)

        for t in (ray.get(retire_refs) if retire_refs else []):
            if t.num_rows:
                remainder_parts.append(_project_frontier(t))
        for t in (ray.get(frontier_refs) if frontier_refs else []):
            if t.num_rows:
                remainder_parts.append(_project_frontier(t))
        remainder = (
            pa.concat_tables(remainder_parts)
            if remainder_parts
            else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
        )
        frontier = rd.from_arrow_refs(frontier_refs) if frontier_refs else None
        if cfg.checkpoint_dir:
            self._checkpoint(cfg.checkpoint_dir, epoch, frontier, seen, politeness,
                             counters, final_ok=True,
                             keep=cfg.checkpoint_keep)
        return CrawlResult(
            visits=pa.Table.from_pylist(visits, schema=VISITS_SCHEMA),
            docs=pa.Table.from_pylist(
                all_docs, schema=_docs_schema(_embed_dim(cfg.embed))),
            refreshes=pa.Table.from_pylist(all_refresh, schema=REFRESH_SCHEMA),
            counters=counters,
            frontier_remainder=remainder,
            epochs=epoch,
            metrics=pa.Table.from_pylist(metrics_rows, schema=METRICS_SCHEMA),
            frontier_dequeued=seen.popped_counts(
                [rt.name for rt in self.sites]),
        )

    # ------------------------------------------------------------------
    def _checkpoint(self, ckpt_dir: str, epoch: int, frontier, seen, politeness,
                    counters, final_ok: bool = False,
                    keep: int | None = None) -> None:
        d = os.path.join(ckpt_dir, f"epoch={epoch:05d}")
        os.makedirs(d, exist_ok=True)
        if frontier is not None:
            # distributed frontier snapshot: at design scale the frontier is
            # the largest table in the system — each worker writes its own
            # blocks, the driver never materializes it (ref resume save:
            # crawler.py:1222-1224)
            frontier.write_parquet(os.path.join(d, "frontier"))
        for i, blob in enumerate(seen.snapshots()):
            with open(os.path.join(d, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
        with open(os.path.join(d, "politeness.bin"), "wb") as f:
            f.write(pickle.dumps(politeness.snapshots()))
        manifest = {"epoch": epoch, "counters": counters, "complete": True,
                    "final": final_ok, "n_seen_shards": seen.n,
                    "n_polite_shards": politeness.n}
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))
        if keep is not None and keep > 0:
            # retention: prune the oldest COMPLETE checkpoints beyond the
            # newest ``keep`` — only after this epoch's manifest landed
            # (the atomic replace above), so a crash mid-prune still
            # leaves a resumable newest. Incomplete dirs are left alone.
            import shutil

            complete = sorted(
                e for e in os.listdir(ckpt_dir)
                if e.startswith("epoch=")
                and os.path.exists(os.path.join(ckpt_dir, e,
                                                "manifest.json")))
            for stale in complete[:-keep]:
                shutil.rmtree(os.path.join(ckpt_dir, stale),
                              ignore_errors=True)

    @staticmethod
    def _peek_manifest(ckpt_dir: str) -> dict:
        epochs = sorted(
            e for e in os.listdir(ckpt_dir)
            if os.path.exists(os.path.join(ckpt_dir, e, "manifest.json"))
        )
        if not epochs:
            raise FileNotFoundError(f"no complete checkpoint under {ckpt_dir}")
        with open(os.path.join(ckpt_dir, epochs[-1], "manifest.json")) as f:
            return json.load(f)

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
        fdir = os.path.join(d, "frontier")
        files = ([os.path.join(fdir, p) for p in sorted(os.listdir(fdir))
                  if p.endswith(".parquet")] if os.path.isdir(fdir) else [])
        if files:
            tbl = pa.concat_tables([pq.read_table(p) for p in files])
            if set(tbl.column_names) == {f.name for f in FRONTIER_SCHEMA}:
                tbl = tbl.cast(FRONTIER_SCHEMA)
            # deferred-admission snapshots carry parent_rank/lpos extras —
            # keep them; the planner admits the rank<0 rows on resume
        else:
            tbl = pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
        return tbl, manifest["epoch"], manifest["counters"]


# ---------------------------------------------------------------------------
# wave-mode group functions
# ---------------------------------------------------------------------------

def _project_frontier(tbl: pa.Table) -> pa.Table:
    """Project onto FRONTIER_SCHEMA with pinned types (drops defer-mode
    parent_rank/lpos and any processed columns)."""
    return pa.table({f.name: tbl[f.name].cast(f.type) for f in FRONTIER_SCHEMA})


def _defer_frontier_cols(tbl: pa.Table, fill: int = -1) -> pa.Table:
    """FRONTIER columns + parent_rank/lpos (deferred-admission union schema,
    fixed column ORDER so keep and candidate blocks concat cleanly)."""
    base = _project_frontier(tbl)
    n = base.num_rows
    for c in ("parent_rank", "lpos"):
        col = (tbl[c].cast(pa.int64()) if c in tbl.column_names and fill is None
               else pa.array([fill] * n, pa.int64()))
        base = base.append_column(c, col)
    return base


def _to_cand_tbl(t: pa.Table, seen, wave: int) -> pa.Table:
    """Exploded outlinks → deferred-admission candidate rows (rank = -1,
    parent_rank/lpos carry the reference's per-host admission order). A
    read-only seen probe drops already-queued/visited links HERE (most
    outlinks point back at crawled pages) so the next plan shuffle never
    carries them; safe because the seen set only grows — the authoritative
    test-and-set still runs at plan-time admission. In ``cuckoo_window``
    mode that premise fails (an entry can EXPIRE at the upcoming epoch
    rotation, so a link dropped at explode time in epoch N might be
    admissible at plan time in epoch N+1), so the pre-filter is skipped
    and plan-time admission alone decides (ADVICE r4)."""
    if t.num_rows and getattr(seen, "mode", "exact") != "cuckoo_window":
        known = seen.contains_many(
            [(s, url_key(u))
             for s, u in zip(t["site"].to_pylist(), t["url"].to_pylist())]
        )
        t = t.filter(pa.array([not k for k in known]))
    n = t.num_rows
    return pa.table(
        {"url": t["url"].cast(pa.string()), "site": t["site"].cast(pa.string()),
         "host": t["host"].cast(pa.string()), "depth": t["depth"].cast(pa.int32()),
         "wave": pa.array([wave] * n, pa.int32()),
         "rank": pa.array([-1] * n, pa.int64()),
         "parent_rank": t["parent_rank"].cast(pa.int64()),
         "lpos": t["lpos"].cast(pa.int64())}
    )


_EMBED_STAGES: dict = {}  # per-process EmbedStage cache (once per worker)


def _embed_stage_for(embed_cfg: dict):
    key = repr(sorted(embed_cfg.items()))
    st = _EMBED_STAGES.get(key)
    if st is None:
        from .embeddings import EmbedStage

        st = _EMBED_STAGES[key] = EmbedStage(**embed_cfg)
    return st


def _embed_dim(embed_cfg: dict | None) -> int | None:
    """Provider-RESOLVED embedding width for the docs schema. The provider
    may override the config's ``dim`` (e.g. huggingface probes the service,
    fake honors provider_kwargs['dim']), so the collected-docs schema must
    use ``EmbedStage.dim`` — not ``embed_cfg.get('dim', 8)`` — or
    ``pa.Table.from_pylist`` raises ArrowInvalid at the end of the crawl."""
    if not embed_cfg:
        return None
    return _embed_stage_for(embed_cfg).dim


def _attach_embeddings(tbl: pa.Table, embed_cfg: dict) -> pa.Table:
    """Append embedding/embed_ok columns for ``outcome == 'indexed'`` rows
    (null elsewhere) — the flush-time attach point of the reference
    (crawler.py:739-744). Runs inside the split task / strict loop; the
    provider+LRU live once per worker process via ``_embed_stage_for``."""
    stage = _embed_stage_for(embed_cfg)
    outcomes = tbl["outcome"].to_pylist() if "outcome" in tbl.column_names else []
    texts = tbl["content"].to_pylist() if "content" in tbl.column_names else []
    n = tbl.num_rows
    vals: list = [None] * n
    oks: list = [None] * n
    idx = [i for i, o in enumerate(outcomes) if o == "indexed"]
    if idx:
        vecs = stage._encode_cached([texts[i] or "" for i in idx])
        for i, v in zip(idx, vecs):
            good = v is not None and len(v) == stage.dim
            oks[i] = bool(good)
            vals[i] = (np.asarray(v, dtype=np.float32).tolist() if good
                       else [0.0] * stage.dim)
    return tbl.append_column(
        "embedding", pa.array(vals, pa.list_(pa.float32(), stage.dim))
    ).append_column("embed_ok", pa.array(oks, pa.bool_()))


def _write_chunk_sink(out_dir: str, epoch: int, chunk_id: int,
                      final_tbl: pa.Table, now: float) -> None:
    """Distributed partitioned sink, written INSIDE the split task that owns
    the blocks: one file per (epoch, chunk) under documents/ refreshes/
    visits/ — resumable layout (a restarted run skips finished epochs),
    nothing funnels through the driver (ref sink semantics: Meilisearch
    add_documents batches, crawler.py:682-758)."""
    import pyarrow.parquet as pq

    d = os.path.join(out_dir, f"epoch={epoch:05d}")
    name = f"chunk-{chunk_id:05d}.parquet"
    for sub, tbl in (("documents", _docs_from_batch(final_tbl, now)),
                     ("refreshes", _refresh_from_batch(final_tbl, now)),
                     ("visits", _visits_from_batch(final_tbl, epoch))):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
        pq.write_table(tbl, os.path.join(d, sub, name))


def _wave_split_list(ctx: dict, epoch: int, chunk_id: int, refs: list):
    """One split task per chunk of materialized wave blocks: confirm (the
    two-phase propose barrier already passed at materialize) → metrics
    partial → keep/retire/candidate routing → optional Parquet sink. The
    five outputs stay in plasma as separate objects (num_returns=5); the
    driver ray.gets ONLY the tiny meta dict — per-wave driver cost is
    O(chunks), never O(pages)."""
    import pyarrow.compute as pc
    import ray as _r

    # drop schemaless empty blocks (an empty map_groups partition emits a
    # zero-column block); an all-empty chunk returns static empty outputs
    tbls = [t for t in _r.get(refs) if t.num_rows]
    if not tbls:
        empty_front = FRONTIER_SCHEMA.empty_table()
        keep_out = (_defer_frontier_cols(empty_front, fill=-1)
                    if ctx["defer"] else empty_front)
        meta = {"metrics": [], "n_keep": 0, "n_cand": 0, "n_retire": 0,
                "n_final": 0}
        return (pa.table({}), keep_out, keep_out.slice(0, 0), empty_front,
                meta)
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    fetch_tbl = tbl.filter(pc.equal(tbl["action"], "fetch"))
    confirm_fn = ctx["confirm_fn"]
    if confirm_fn is not None:
        bs = ctx["batch_size"]
        outs = [confirm_fn(fetch_tbl.slice(lo, bs))
                for lo in range(0, max(fetch_tbl.num_rows, 1), bs)]
        fetch_tbl = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
    if ctx.get("embed") and fetch_tbl.num_rows:
        fetch_tbl = _attach_embeddings(fetch_tbl, ctx["embed"])
    met = _wave_metrics_partial(fetch_tbl).to_pylist()
    retire_tbl = _project_frontier(
        tbl.filter(pc.equal(tbl["action"], "retire")))
    keep_tbl = tbl.filter(pc.equal(tbl["action"], "keep"))
    if ctx["defer"]:
        keep_out = _defer_frontier_cols(keep_tbl, fill=-1)
        cand_out = _to_cand_tbl(ctx["explode_fn"](fetch_tbl), ctx["seen"],
                                epoch + 1)
    else:
        keep_out = _project_frontier(keep_tbl)
        cand_out = keep_out.slice(0, 0)
    if ctx["out_dir"] and fetch_tbl.num_rows:
        _write_chunk_sink(ctx["out_dir"], epoch, chunk_id, fetch_tbl,
                          ctx["now"])
    final_out = fetch_tbl if ctx["want_final"] else fetch_tbl.slice(0, 0)
    meta = {"metrics": met, "n_keep": keep_out.num_rows,
            "n_cand": cand_out.num_rows, "n_retire": retire_tbl.num_rows,
            "n_final": fetch_tbl.num_rows}
    return final_out, keep_out, cand_out, retire_tbl, meta


def _hash_split_list(width: int, tbl: pa.Table):
    """Shuffle round A: one frontier block → ``width`` sub-tables keyed by
    crc32(host) % width (the stable host-partition hash used everywhere).
    Sub-tables are zero-copy slices-by-mask that stay in plasma via
    num_returns fan-out — the map side of the DIY hash shuffle."""
    import zlib

    import numpy as np_

    if tbl.num_rows == 0 or "host" not in tbl.column_names:
        # empty map_groups partitions emit zero-column blocks; round B
        # drops zero-row slices
        return tuple(tbl.slice(0, 0) for _ in range(width))
    parts = np_.fromiter(
        (zlib.crc32(h.encode()) % width for h in tbl["host"].to_pylist()),
        dtype=np_.int64, count=tbl.num_rows,
    )
    return tuple(tbl.filter(pa.array(parts == p)) for p in range(width))


def _plan_process_list(fn, slices: list):
    """Shuffle round B + fused wave pass: concat one host-partition's
    slices (already local or one plasma fetch each) and run
    plan→fetch→extract→decide on the partition's pandas frame. Empty
    partitions return a zero-column table the split round drops."""
    import ray as _r

    tbls = [t for t in _r.get(list(slices)) if t.num_rows]
    if not tbls:
        return pa.table({})
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    return fn(tbl.to_pandas())


def _fetch_extract_list(fns, tbl: pa.Table) -> pa.Table:
    """Hot-host sub-task: the stateless fetch+extract slice of the fused
    wave pass (decide stays in the parent partition task — see
    ``_make_plan_process``)."""
    fetch_fn, extract_fn = fns
    if tbl.num_rows == 0:
        return tbl
    return extract_fn(fetch_fn(tbl))


try:  # decorated lazily-importable: pipeline is imported before ray.init
    import ray as _ray_mod

    _wave_split_task = _ray_mod.remote(num_cpus=0.5)(_wave_split_list)
    _hash_split_task = _ray_mod.remote(num_cpus=0.5)(_hash_split_list)
    _plan_process_task = _ray_mod.remote(num_cpus=1)(_plan_process_list)
    _fetch_extract_task = _ray_mod.remote(num_cpus=1)(_fetch_extract_list)
except Exception:  # pragma: no cover
    _wave_split_task = None


def _wave_metrics_partial(batch: pa.Table) -> pa.Table:
    """Per-block metrics partial: one row per (partition, site, outcome)
    with row/link/error counts and the block's fetch→extract→decide
    wall-time. Counters AND the lineage/metrics table both derive from
    these — page-scale rows never reach the driver."""
    import pandas as pd  # noqa: F401

    need = ["site", "outcome", "n_links", "_pblock", "_proc_s"]
    if batch.num_rows == 0 or any(c not in batch.column_names for c in need):
        # empty filtered blocks can arrive schemaless
        return pa.table(
            {"partition_id": pa.array([], pa.int64()),
             "site": pa.array([], pa.string()),
             "outcome": pa.array([], pa.string()),
             "n_rows": pa.array([], pa.int64()),
             "n_links": pa.array([], pa.int64()),
             "errors": pa.array([], pa.int64()),
             "secs": pa.array([], pa.float64())}
        )
    df = batch.select(need).to_pandas()
    df["n_links"] = df["n_links"].fillna(0)
    g = df.groupby(["_pblock", "site", "outcome"], as_index=False).agg(
        n_rows=("outcome", "size"), n_links=("n_links", "sum"),
        secs=("_proc_s", "first")
    )
    # secs is the PARTITION's wall-time: emit it on one row per partition
    # (0.0 on the rest) so summing secs over the table never over-counts by
    # the partition's (site, outcome) fan-out
    g["secs"] = g["secs"].where(~g.duplicated("_pblock"), 0.0)
    g["errors"] = (g["outcome"] == "error") * g["n_rows"]
    return pa.table(
        {"partition_id": pa.array(g["_pblock"].astype("int64")),
         "site": pa.array(g["site"], pa.string()),
         "outcome": pa.array(g["outcome"], pa.string()),
         "n_rows": pa.array(g["n_rows"].astype("int64")),
         "n_links": pa.array(g["n_links"].astype("int64")),
         "errors": pa.array(g["errors"].astype("int64")),
         "secs": pa.array(g["secs"].astype("float64"))}
    )


def _add_hpart(batch: pa.Table, n_parts: int) -> pa.Table:
    import zlib

    parts = [zlib.crc32(h.encode()) % n_parts for h in batch["host"].to_pylist()]
    return batch.append_column("_hpart", pa.array(parts, pa.int32()))


def _admit_candidates_pdf(seen, cand, blocked_sites):
    """Deferred-admission path: candidate rows (rank < 0, carrying
    parent_rank/lpos ordering) are admitted HERE, inside the plan pass —
    the same per-(site,host) ordered test-and-set the standalone admit
    stage performs (see _make_admitter), one batched seen round per
    partition. Returns admitted rows as frontier-shaped DataFrame."""
    import pandas as pd

    groups = []
    pairs: list[tuple[str, bytes]] = []
    for (site, host), sdf in cand.groupby(["site", "host"], sort=True):
        if site in blocked_sites:
            continue
        sdf = sdf.sort_values(["parent_rank", "lpos"], kind="stable")
        sdf = sdf.drop_duplicates(subset=["url"], keep="first")
        groups.append((site, host, sdf["url"].tolist(),
                       sdf["depth"].tolist(), sdf["wave"].tolist(),
                       len(pairs)))
        pairs.extend((site, url_key(u)) for u in sdf["url"])
    flags = seen.admit_many(pairs) if pairs else []
    cols: dict[str, list] = {c: [] for c in ("url", "site", "host", "depth",
                                             "wave", "rank")}
    for site, host, urls, depths, waves, base in groups:
        rank = 0
        for j, u in enumerate(urls):
            if not flags[base + j]:
                continue
            cols["url"].append(u)
            cols["site"].append(site)
            cols["host"].append(host)
            cols["depth"].append(depths[j])
            cols["wave"].append(waves[j])
            cols["rank"].append(rank)
            rank += 1
    return pd.DataFrame(cols)


def _make_planner(seen, politeness, exclude_patterns, remaining, window,
                  grant_cap, blocked_sites=frozenset(),
                  retire_sites=frozenset(), window_seen: bool = False):
    """Wave planning over a coarse host partition (map_groups over
    crc32(host) % P, pandas): for every (site, host) group the priority walk
    applies the reference's pop-time skip ladder under politeness + site
    budgets (crawler.py:1157-1178). All actor traffic is BATCHED per
    partition — one plan_many / take_many politeness round and one
    on_popped/mark_visited round — so RPC count is O(partitions), not
    O(hosts) (SURVEY.md §7.7 actor-RPC amortization).

    With deferred admission, incoming rows may include candidate rows
    (rank < 0): those are admitted first (same semantics as the standalone
    admit stage), then planned together with the carried-over frontier."""
    window_start, window_end = window

    def plan(gdf):
        import math

        import pandas as pd

        # budget-exhausted sites retire here (rows pass through to the
        # remainder with action='retire' — no separate frontier scan);
        # their unadmitted defer-mode candidates retire unadmitted
        retired = None
        if retire_sites and len(gdf):
            rmask = gdf["site"].isin(retire_sites)
            if rmask.any():
                retired = gdf[rmask]
                gdf = gdf[~rmask]

        if len(gdf) and "rank" in gdf.columns and (gdf["rank"] < 0).any():
            cand = gdf[gdf["rank"] < 0]
            adm = gdf[gdf["rank"] >= 0]
            newly = _admit_candidates_pdf(seen, cand, blocked_sites)
            gdf = (pd.concat([adm[newly.columns.tolist()], newly],
                             ignore_index=True)
                   if len(newly) else adm)

        out_cols: dict[str, list] = {c: [] for c in (
            "url", "site", "host", "depth", "wave", "rank", "action",
            "visit_pos", "grant_ts")}
        groups = []
        for (site, host), sdf in gdf.groupby(["site", "host"], sort=True):
            sdf = sdf.sort_values(["depth", "wave", "rank"],
                                  ascending=[False, True, True], kind="stable")
            groups.append((site, host, sdf))
        plans = politeness.plan_many(
            [(host, sdf["url"].tolist(), window_start, window_end, grant_cap)
             for site, host, sdf in groups]
        ) if groups else []
        walked = []
        take_req = []
        popped_pairs: list[tuple[str, bytes]] = []   # re-admittable discards only
        visited_pairs: list[tuple[str, bytes]] = []  # window mode: fetched marks
        inplace_deltas: dict[str, int] = {}          # fetched/extension: key stays
        # the max_pages budget is PER SITE: share it across this partition's
        # (site, host) groups so a multi-host site cannot overshoot within
        # one epoch. (Today same-domain admission keeps sites single-host,
        # and _add_hpart routes a host to one partition — this guard matters
        # the day cross-host admission is enabled.)
        site_used: dict[str, int] = {}
        for (site, host, sdf), (verdicts, avail) in zip(groups, plans):
            urls = sdf["url"].tolist()
            budget = min(avail, remaining.get(site, 1_000_000_000)
                         - site_used.get(site, 0))
            actions = []
            n_sel = 0
            for i, u in enumerate(urls):
                if n_sel >= budget:
                    actions.append("keep")
                    continue
                if is_excluded(u, exclude_patterns.get(site, [])):
                    actions.append("skip_excluded")
                elif has_binary_extension(u):
                    actions.append("skip_extension")
                elif not verdicts[i]:
                    actions.append("skip_robots")
                else:
                    actions.append("fetch")
                    n_sel += 1
            for u, a in zip(urls, actions):
                if a in ("skip_excluded", "skip_robots"):
                    # excluded/robots discards leave the queued set — the
                    # reference re-admits them if re-linked (crawler.py:1162)
                    popped_pairs.append((site, url_key(u)))
                elif a in ("fetch", "skip_extension"):
                    if window_seen:
                        # sliding-window mode: the fetched mark must live
                        # in the ROTATING tier, not the exact queued set —
                        # otherwise expiry never re-admits and queued
                        # grows with crawl age instead of frontier size.
                        # Pays one key of pop+mark traffic per fetch;
                        # that is the price of TTL semantics.
                        k = url_key(u)
                        popped_pairs.append((site, k))
                        visited_pairs.append((site, k))
                        # active decrement rides on_popped_many's removal
                        # count — no inplace delta (would double-count)
                    else:
                        # key STAYS in queued (doubles as the visited mark
                        # — admission checks queued ∪ visited); only the
                        # active counter moves. No per-key traffic.
                        inplace_deltas[site] = (
                            inplace_deltas.get(site, 0) + 1)
            site_used[site] = site_used.get(site, 0) + n_sel
            walked.append((site, host, sdf, actions, n_sel))
            take_req.append((host, n_sel, window_start))
        grants = politeness.take_many(take_req) if take_req else []
        if popped_pairs:
            seen.on_popped_many(popped_pairs)
        if visited_pairs:
            # mark BEFORE any admission of this wave's outlinks runs
            # (admission is a later sequential step), so the pop->mark
            # handoff cannot lose the membership
            seen.mark_visited_many(visited_pairs)
        if inplace_deltas:
            seen.note_popped_inplace(inplace_deltas)
        for (site, host, sdf, actions, n_sel), grant_ts in zip(walked, grants):
            k = 0
            rows = sdf.to_dict("list")
            for j, a in enumerate(actions):
                if a not in ("fetch", "keep"):
                    continue  # pure skips leave the frontier with no row
                out_cols["url"].append(rows["url"][j])
                out_cols["site"].append(site)
                out_cols["host"].append(host)
                out_cols["depth"].append(rows["depth"][j])
                out_cols["wave"].append(rows["wave"][j])
                out_cols["rank"].append(rows["rank"][j])
                out_cols["action"].append(a)
                if a == "fetch":
                    out_cols["visit_pos"].append(k)
                    out_cols["grant_ts"].append(grant_ts[k])
                    k += 1
                else:
                    out_cols["visit_pos"].append(-1)
                    out_cols["grant_ts"].append(math.nan)
        if retired is not None:
            k = len(retired)
            out_cols["url"].extend(retired["url"].tolist())
            out_cols["site"].extend(retired["site"].tolist())
            out_cols["host"].extend(retired["host"].tolist())
            out_cols["depth"].extend(retired["depth"].tolist())
            out_cols["wave"].extend(retired["wave"].tolist())
            out_cols["rank"].extend(retired["rank"].tolist())
            out_cols["action"].extend(["retire"] * k)
            out_cols["visit_pos"].extend([-1] * k)
            out_cols["grant_ts"].extend([math.nan] * k)
        # emit ARROW with pinned types: pandas blocks mixed with arrow blocks
        # poison downstream sorts/unions (BlockType assertion)
        return pa.Table.from_pydict(
            {
                "url": pa.array(out_cols["url"], pa.string()),
                "site": pa.array(out_cols["site"], pa.string()),
                "host": pa.array(out_cols["host"], pa.string()),
                "depth": pa.array(out_cols["depth"], pa.int32()),
                "wave": pa.array(out_cols["wave"], pa.int32()),
                "rank": pa.array(out_cols["rank"], pa.int64()),
                "action": pa.array(out_cols["action"], pa.string()),
                "visit_pos": pa.array(out_cols["visit_pos"], pa.int64()),
                "grant_ts": pa.array(out_cols["grant_ts"], pa.float64()),
            }
        )

    return plan


def _conform(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``tbl`` onto ``schema`` (missing columns become nulls) so
    every plan_process partition emits ONE deterministic schema — mixed
    block schemas poison downstream filters/unions."""
    cols = {}
    for f in schema:
        if f.name in tbl.column_names:
            cols[f.name] = tbl[f.name].cast(f.type)
        else:
            cols[f.name] = pa.nulls(tbl.num_rows, f.type)
    return pa.table(cols)


def _make_plan_process(planner, fetch_fn, extract_fn, decide_fn,
                       batch_size: int, fe_ref=None, hot_rows: int = 0):
    """Fused per-host-partition wave task: plan (politeness/budget walk) →
    fetch → extract → decide in one pass, emitting keep rows + processed
    rows under a single schema. Lineage columns (_pblock, _proc_s) stamp
    the partition's identity and fetch→extract wall-time for the metrics
    tier.

    Hot-host skew guard: when the granted fetch set exceeds ``hot_rows``
    (and ``fe_ref`` — a plasma ref to ``(fetch_fn, extract_fn)`` — is
    provided), the stateless fetch+extract chunks run as nested Ray
    sub-tasks gathered in plan order, while plan and decide stay serial in
    this task. A domain holding most of a wave's grants then costs
    ``ceil(rows / batch_size)`` parallel tasks instead of one task's
    wall-clock; ordering, budget and dedup outcomes are identical because
    every order-sensitive step still runs serially here."""
    import pyarrow.compute as pc

    def plan_process(gdf):
        import time as _t

        import ray as _ray

        plan_tbl = planner(gdf)
        keep_tbl = plan_tbl.filter(
            pc.is_in(plan_tbl["action"], value_set=pa.array(["keep", "retire"]))
        )
        fetch_tbl = plan_tbl.filter(pc.equal(plan_tbl["action"], "fetch"))
        _tp0 = _t.perf_counter()
        outs = []
        if (hot_rows and fe_ref is not None
                and fetch_tbl.num_rows > hot_rows):
            # skew path: fetch+extract chunks in parallel sub-tasks (this
            # worker's CPU is released while blocked in ray.get), decide
            # serially in plan order
            sub = [
                _fetch_extract_task.remote(
                    fe_ref,
                    fetch_tbl.slice(lo, batch_size).drop_columns(["action"]))
                for lo in range(0, fetch_tbl.num_rows, batch_size)
            ]
            for fe_out in _ray.get(sub):
                outs.append(decide_fn(fe_out))
            proc = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
            secs = _t.perf_counter() - _tp0
            return _stamp_proc(proc, keep_tbl, secs)
        # schema probe: one empty pass through the stage chain gives the
        # full processed schema without computing anything (stages are
        # empty-input safe), so keep-only partitions emit the same schema
        chain = lambda t: decide_fn(extract_fn(fetch_fn(t)))  # noqa: E731
        for lo in range(0, max(fetch_tbl.num_rows, 1), batch_size):
            chunk = fetch_tbl.slice(lo, batch_size).drop_columns(["action"])
            outs.append(chain(chunk))
        proc = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
        secs = _t.perf_counter() - _tp0
        return _stamp_proc(proc, keep_tbl, secs)

    return plan_process


def _stamp_proc(proc: pa.Table, keep_tbl: pa.Table, secs: float) -> pa.Table:
    """Stamp lineage columns on a partition's processed rows and conform
    the keep/retire rows to the same schema."""
    import zlib as _zlib

    try:
        import ray as _ray

        tid = _ray.get_runtime_context().get_task_id() or ""
    except Exception:
        tid = ""
    pblock = _zlib.crc32(tid.encode()) if tid else os.getpid()
    n = proc.num_rows
    proc = proc.append_column(
        "action", pa.array(["fetch"] * n, pa.string())
    ).append_column(
        "_pblock", pa.array([pblock] * n, pa.int64())
    ).append_column(
        "_proc_s", pa.array([secs] * n, pa.float64())
    )
    if keep_tbl.num_rows == 0:
        return proc
    return pa.concat_tables([proc, _conform(keep_tbl, proc.schema)])


def _make_explode(seed_by_site, max_depth_by_site):
    def explode(batch: pa.Table) -> pa.Table:
        return explode_outlinks(batch, seed_by_site, max_depth_by_site)

    return explode


def _make_admitter(seen, admit_wave: int, blocked_sites: set[str] = frozenset()):
    """Candidate admission over a coarse host partition: per (site, host)
    order by (parent visit position, link position) — the reference's
    counter order within a host (crawler.py:1203-1207) — dedupe first-wins,
    then ONE batched ordered test-and-set round per partition against the
    seen shards (relative order within each host is preserved in the
    concatenated key list, which is all admission semantics need)."""

    def admit(gdf):
        groups = []
        pairs: list[tuple[str, bytes]] = []
        for (site, host), sdf in gdf.groupby(["site", "host"], sort=True):
            if site in blocked_sites:
                continue  # per-site queue cap reached — stop admitting
            sdf = sdf.sort_values(["parent_rank", "lpos"], kind="stable")
            sdf = sdf.drop_duplicates(subset=["url"], keep="first")
            urls = sdf["url"].tolist()
            depths = sdf["depth"].tolist()
            groups.append((site, host, urls, depths, len(pairs)))
            pairs.extend((site, url_key(u)) for u in urls)
        flags = seen.admit_many(pairs) if pairs else []
        cols: dict[str, list] = {c: [] for c in ("url", "site", "host", "depth",
                                                 "wave", "rank")}
        for site, host, urls, depths, base in groups:
            rank = 0
            for j, u in enumerate(urls):
                if not flags[base + j]:
                    continue
                cols["url"].append(u)
                cols["site"].append(site)
                cols["host"].append(host)
                cols["depth"].append(depths[j])
                cols["wave"].append(admit_wave)
                cols["rank"].append(rank)
                rank += 1
        return pa.Table.from_pydict(
            {
                "url": pa.array(cols["url"], pa.string()),
                "site": pa.array(cols["site"], pa.string()),
                "host": pa.array(cols["host"], pa.string()),
                "depth": pa.array(cols["depth"], pa.int32()),
                "wave": pa.array(cols["wave"], pa.int32()),
                "rank": pa.array(cols["rank"], pa.int64()),
            }
        )

    return admit


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
