"""Crawl pipeline stages — pure batch functions over Arrow tables.

Shared between the two execution modes (pipeline.py):
- strict mode calls them directly on small Tables (exact reference visit
  order, scheduler budget = CONCURRENT_REQUESTS);
- wave mode wraps them in ``map_batches`` / ``map_groups`` over Datasets.

Fetch is SIMULATED in this sandbox: a lookup join of the frontier against the
synthetic ``pages`` corpus (SURVEY.md §2.1 S2/J6 — the stand-in for live
HTTP; the page index is broadcast once via ``ray.put`` and materialized once
per actor/worker, never re-shipped per batch). A live deployment swaps
``SimFetchStage`` for an aiohttp actor pool with identical I/O schema
(``LiveFetchStage`` stub below).

Status codes: 200 fetched, 304 not-modified (etag conditional hit,
crawler.py:974-984 + 1012-1016), 415 non-HTML content-type
(crawler.py:986-989), 0 fetch error after retries (crawler.py:1001).
"""

from __future__ import annotations

import pyarrow as pa

from .extract import IMAGES_TYPE, MIN_CONTENT_CHARS, extract_document
from .urlnorm import (
    generate_doc_id,
    is_excluded,
    is_same_domain,
    is_valid_url,
    url_key,
)

SECONDS_PER_DAY = 86400.0

FRONTIER_FIELDS = [
    ("url", pa.string()),
    ("site", pa.string()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("wave", pa.int32()),
    ("rank", pa.int64()),
]
FRONTIER_SCHEMA = pa.schema(FRONTIER_FIELDS)


def build_page_index(pages: pa.Table) -> dict[str, tuple]:
    """url → (html_bytes, etag, content_type, last_modified, final_url).
    Built once, broadcast via ray.put; ~O(corpus) memory — the test-scale
    stand-in for the fetch tier. Always a 5-tuple: last_modified/final_url
    are None when the pages table lacks those columns."""
    want = ["url", "html", "etag", "content_type"]
    cols = pages.select(want).to_pydict()
    n = pages.num_rows
    # Optional columns are padded BY NAME to a fixed 5-tuple slot — a table
    # with final_url but no last_modified must not shift final_url into the
    # Last-Modified slot (that would both drop redirects and fabricate
    # spurious 304s from a URL-vs-validator comparison).
    opt = {
        c: (pages[c].to_pylist() if c in pages.column_names else [None] * n)
        for c in ("last_modified", "final_url")
    }
    return {
        row[0]: tuple(row[1:]) + (opt["last_modified"][i], opt["final_url"][i])
        for i, row in enumerate(zip(*(cols[c] for c in want)))
    }


class SimFetchStage:
    """Selected frontier rows → fetch result columns.

    Adds: status:int32, html:binary, etag:string, last_modified:string,
    final_url:string (post-redirect URL, = url when no redirect;
    crawler.py:993), cached_hash:string, cached_last_crawl:float64 (cache
    metadata fetched in the same pass — one batched seen-shard RPC per
    batch, used by the conditional-GET check here and the TTL skip in the
    decide stage). A 304 requires either validator to match: cached etag ==
    served etag (If-None-Match) or cached Last-Modified == served
    Last-Modified (If-Modified-Since) — crawler.py:974-979."""

    def __init__(self, page_index, seen_client, skip_cache: bool = False):
        import ray

        if isinstance(page_index, ray.ObjectRef):
            page_index = ray.get(page_index)
        self.index = page_index
        self.seen = seen_client
        # a fresh crawl (no prior cache, no resume) can never hit the
        # incremental cache — each url is fetched at most once per run — so
        # the per-batch get_cache RPC round is pure overhead; skip it
        self.skip_cache = skip_cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        n = len(urls)
        if self.skip_cache:
            recs = [None] * n
        else:
            keys = [url_key(u) for u in urls]
            recs = self.seen.get_cache(keys)
        status = [0] * n
        htmls: list[bytes | None] = [None] * n
        etags: list[str | None] = [None] * n
        lms: list[str | None] = [None] * n
        finals: list[str | None] = list(urls)  # final_url = url unless redirected
        c_hash: list[str | None] = [None] * n
        c_last: list[float | None] = [None] * n
        for i, u in enumerate(urls):
            rec = recs[i]  # (content_hash, last_crawl, etag, site[, last_modified])
            if rec:
                c_hash[i] = rec[0]
                c_last[i] = rec[1]
            page = self.index.get(u)
            if page is None:
                status[i] = 0  # fetch error after retries
                continue
            html, etag, ctype = page[0], page[1], page[2]
            lm = page[3] if len(page) > 3 else None
            final = page[4] if len(page) > 4 else None
            rec_lm = rec[4] if rec and len(rec) > 4 else None
            if rec and ((rec[2] and rec[2] == etag)
                        or (rec_lm and rec_lm == lm)):
                status[i] = 304  # 304 returns the REQUESTED url (crawler.py:981)
                continue
            if "text/html" not in (ctype or "text/html"):
                status[i] = 415
                continue
            status[i] = 200
            htmls[i] = html
            etags[i] = etag
            lms[i] = lm
            if final:
                finals[i] = final
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("html", pa.array(htmls, pa.binary()))
            .append_column("etag", pa.array(etags, pa.string()))
            .append_column("last_modified", pa.array(lms, pa.string()))
            .append_column("final_url", pa.array(finals, pa.string()))
            .append_column("cached_hash", pa.array(c_hash, pa.string()))
            .append_column("cached_last_crawl", pa.array(c_last, pa.float64()))
        )


class FetchResponse:
    """Transport-level response (what aiohttp's response reduces to)."""

    __slots__ = ("status", "headers", "body", "final_url")

    def __init__(self, status: int, headers: dict[str, str] | None = None,
                 body: bytes = b"", final_url: str | None = None):
        self.status = status
        self.headers = headers or {}
        self.body = body
        self.final_url = final_url


class LiveFetchStage:
    """Live-HTTP fetch actor pool: the same output schema as SimFetchStage,
    with the reference's fetch semantics (``crawler.py:971-1001``):

    - conditional GET: ``If-None-Match`` from the cached etag,
      ``If-Modified-Since`` from the cached last-modified → 304 short-path;
    - ``MAX_RETRIES=3`` attempts with ``2**attempt`` backoff on timeout or
      HTTP/transport error (``config.MAX_RETRIES``, ``crawler.py:981-1001``);
    - non-``text/html`` content-type skipped (→ status 415 like
      SimFetchStage's ``skipped_content_type``), NOT retried;
    - exhausted retries → status 0 (the decide stage's ``error`` outcome).

    ``transport(url, headers, timeout) -> FetchResponse`` is injectable —
    unit tests drive the retry/backoff/header protocol with a fake; the
    default builds a ``requests`` session per actor (one connection pool
    per actor, created once in ``__init__``; no network in this sandbox, so
    the default path is exercised only by its construction guard).
    ``sleep`` is injectable so backoff is testable without wall-time.
    Batch URLs fetch through a small thread pool per actor — I/O-bound
    concurrency inside the actor, actor-pool parallelism across the
    cluster (politeness grants are already spaced by the wave planner)."""

    MAX_RETRIES = 3           # config.MAX_RETRIES (ref config.py)
    TIMEOUT_S = 10.0          # aiohttp total timeout (crawler.py session)

    def __init__(self, seen_client=None, transport=None, sleep=None,
                 max_retries: int = MAX_RETRIES, timeout_s: float = TIMEOUT_S,
                 skip_cache: bool = False, threads: int = 8,
                 user_agent: str = "raycrawl/2"):
        import time as _time

        self.seen = seen_client
        self.skip_cache = skip_cache or seen_client is None
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self.threads = threads
        self.sleep = sleep if sleep is not None else _time.sleep
        if transport is None:
            try:
                import requests
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "LiveFetchStage needs `requests` (or an injected "
                    "transport); in offline environments use SimFetchStage"
                ) from e
            session = requests.Session()
            session.headers["User-Agent"] = user_agent

            def transport(url, headers, timeout):  # pragma: no cover - net
                r = session.get(url, headers=headers, timeout=timeout,
                                allow_redirects=True)
                return FetchResponse(r.status_code, dict(r.headers),
                                     r.content, str(r.url))

        self.transport = transport

    def _fetch_one(self, url: str, rec) -> tuple:
        """→ (status, body, etag, last_modified, final_url)."""
        headers: dict[str, str] = {}
        if rec:
            # rec = (content_hash, last_crawl, etag, site[, last_modified])
            if rec[2]:
                headers["If-None-Match"] = rec[2]
            if len(rec) > 4 and rec[4]:
                headers["If-Modified-Since"] = rec[4]  # crawler.py:977-978
        for attempt in range(self.max_retries):
            try:
                resp = self.transport(url, headers, self.timeout_s)
                if resp.status == 304:
                    # 304 short-path returns the REQUESTED url (crawler.py:981)
                    return 304, None, None, None, url
                ctype = resp.headers.get("Content-Type", "")
                if "text/html" not in ctype.lower():
                    return 415, None, None, None, url    # skipped, never retried
                if resp.status >= 400:
                    raise IOError(f"HTTP {resp.status}")  # raise_for_status
                return (resp.status, resp.body,
                        resp.headers.get("ETag"),
                        resp.headers.get("Last-Modified"),
                        resp.final_url or url)           # crawler.py:993
            except Exception:
                if attempt + 1 < self.max_retries:
                    self.sleep(2 ** attempt)     # crawler.py:1000
        return 0, None, None, None, url          # error after retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor

        urls = batch["url"].to_pylist()
        n = len(urls)
        if self.skip_cache:
            recs = [None] * n
        else:
            recs = self.seen.get_cache([url_key(u) for u in urls])
        if n > 1 and self.threads > 1:
            with ThreadPoolExecutor(max_workers=self.threads) as ex:
                results = list(ex.map(self._fetch_one, urls, recs))
        else:
            results = [self._fetch_one(u, r) for u, r in zip(urls, recs)]
        status = [r[0] for r in results]
        htmls = [r[1] for r in results]
        etags = [r[2] for r in results]
        lms = [r[3] for r in results]
        finals = [r[4] for r in results]
        c_hash = [r[0] if r else None for r in recs]
        c_last = [r[1] if r else None for r in recs]
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("html", pa.array(htmls, pa.binary()))
            .append_column("etag", pa.array(etags, pa.string()))
            .append_column("last_modified", pa.array(lms, pa.string()))
            .append_column("final_url", pa.array(finals, pa.string()))
            .append_column("cached_hash", pa.array(c_hash, pa.string()))
            .append_column("cached_last_crawl", pa.array(c_last, pa.float64()))
        )


class ExtractIfHtml:
    """status==200 rows get the full extraction chain; other statuses pass
    through with null document columns. Drops ``html`` (wide binary never
    crosses a shuffle — SURVEY.md §7.7)."""

    def __init__(self, site_selectors: dict[str, str | None] | None = None):
        self.site_selectors = site_selectors or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        # extraction (doc id, image/link urljoin base) keys on the
        # POST-REDIRECT url (crawler.py:1045-1058, 1070)
        finals = (batch["final_url"].to_pylist()
                  if "final_url" in batch.column_names else urls)
        sites = batch["site"].to_pylist()
        statuses = batch["status"].to_pylist()
        htmls = batch["html"].to_pylist()
        n = len(urls)
        titles = [None] * n
        contents = [None] * n
        excerpts = [None] * n
        langs = [None] * n
        hashes = [None] * n
        images_col: list = [None] * n
        links_col: list = [None] * n
        for i in range(n):
            if statuses[i] != 200:
                # non-200 rows need a non-null unique group key downstream
                hashes[i] = "!" + urls[i]
                links_col[i] = []
                images_col[i] = []
                continue
            h = htmls[i]
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", errors="replace")
            d = extract_document(h or "", finals[i] or urls[i],
                                 self.site_selectors.get(sites[i]))
            titles[i] = d["title"]
            contents[i] = d["content"]
            excerpts[i] = d["excerpt"]
            langs[i] = d["lang"]
            hashes[i] = d["content_hash"]
            images_col[i] = d["images"]
            links_col[i] = d["links"]
        out = batch.drop_columns(["html"])
        out = out.append_column("title", pa.array(titles, pa.string()))
        out = out.append_column("content", pa.array(contents, pa.string()))
        out = out.append_column("excerpt", pa.array(excerpts, pa.string()))
        out = out.append_column("doc_lang", pa.array(langs, pa.string()))
        out = out.append_column("content_hash", pa.array(hashes, pa.string()))
        out = out.append_column("images", pa.array(images_col, IMAGES_TYPE))
        out = out.append_column("links", pa.array(links_col, pa.list_(pa.string())))
        out = out.append_column(
            "n_links", pa.array([len(x or []) for x in links_col], pa.int64())
        )
        return out


def order_key_of(depth: int, wave: int, host: str, rank: int) -> tuple:
    """Canonical within-wave processing order: deepest first, then admission
    wave, then host (deterministic interleave via crc32 — ints pickle far
    smaller than repeated host strings in the propose/confirm RPCs), then
    host-local rank. In strict mode this equals the reference's heap pop
    order; in wave mode it is the documented order-equivalence class
    (SURVEY.md §7.7)."""
    import zlib

    return (-depth, wave, zlib.crc32(host.encode()), rank)


class DecideProposeStage:
    """Pass 1 of the index decision (crawler.py:1033-1039): computes
    no_index / cache-TTL-skip / stub flags per row and PROPOSES eligible
    rows' content hashes to the dedup shards (min order_key per hash wins).
    Pass-through on the data; appends ``eligible`` and ``cache_skip``."""

    def __init__(self, seen_client, no_index_patterns: dict[str, list[str]],
                 now: float, cache_days: float, force: bool):
        self.seen = seen_client
        self.no_index = no_index_patterns
        self.now = now
        self.cache_days = cache_days
        self.force = force

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        finals = (batch["final_url"].to_pylist()
                  if "final_url" in batch.column_names else urls)
        sites = batch["site"].to_pylist()
        statuses = batch["status"].to_pylist()
        hashes = batch["content_hash"].to_pylist()
        contents = batch["content"].to_pylist()
        c_hash = batch["cached_hash"].to_pylist()
        c_last = batch["cached_last_crawl"].to_pylist()
        depths = batch["depth"].to_pylist()
        waves = batch["wave"].to_pylist()
        hosts = batch["host"].to_pylist()
        ranks = batch["rank"].to_pylist()
        n = len(urls)
        eligible = [False] * n
        cache_skip = [False] * n
        proposals: dict[str, list[tuple[str, tuple]]] = {}
        for i in range(n):
            if statuses[i] != 200:
                continue
            cs = (
                not self.force
                and c_hash[i] is not None
                and c_hash[i] == hashes[i]
                and (self.now - c_last[i]) / SECONDS_PER_DAY < self.cache_days
            )
            cache_skip[i] = cs
            # no_index tests the POST-REDIRECT url (crawler.py:1042)
            no_idx = is_excluded(finals[i] or urls[i],
                                 self.no_index.get(sites[i], []))
            stub = len(contents[i] or "") < MIN_CONTENT_CHARS
            if not cs and not no_idx and not stub:
                eligible[i] = True
                okey = order_key_of(depths[i], waves[i], hosts[i], ranks[i])
                proposals.setdefault(sites[i], []).append((hashes[i], okey))
        for site, items in proposals.items():
            self.seen.propose_hash(site, items)
        return (
            batch.append_column("eligible", pa.array(eligible, pa.bool_()))
            .append_column("cache_skip", pa.array(cache_skip, pa.bool_()))
        )


class ConfirmStage:
    """Pass 2: eligible rows CONFIRM against the dedup shards — exactly the
    min-order proposer of each not-yet-indexed hash wins (→ ``indexed``,
    incremental cache updated, crawler.py:1045-1060); everyone else gets the
    reference's counter label (indexed > skipped_cache > not_indexed,
    crawler.py:1036-1064). Marks every processed row visited."""

    def __init__(self, seen_client, now: float, mark_visited: bool = False):
        self.seen = seen_client
        self.now = now
        # strict mode pops keys out of the queued set, so processed rows
        # must be re-marked visited; the wave engine leaves popped keys in
        # the queued set instead (no per-key traffic)
        self.mark_visited = mark_visited

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        finals = (batch["final_url"].to_pylist()
                  if "final_url" in batch.column_names else urls)
        sites = batch["site"].to_pylist()
        statuses = batch["status"].to_pylist()
        hashes = batch["content_hash"].to_pylist()
        etags = batch["etag"].to_pylist()
        lms = (batch["last_modified"].to_pylist()
               if "last_modified" in batch.column_names else [None] * len(urls))
        eligible = batch["eligible"].to_pylist()
        cache_skip = batch["cache_skip"].to_pylist()
        depths = batch["depth"].to_pylist()
        waves = batch["wave"].to_pylist()
        hosts = batch["host"].to_pylist()
        ranks = batch["rank"].to_pylist()
        n = len(urls)
        outcomes = [None] * n
        confirm_by_site: dict[str, list[int]] = {}
        for i in range(n):
            st = statuses[i]
            if st == 0:
                outcomes[i] = "error"
            elif st == 304:
                outcomes[i] = "not_modified"
            elif st == 415:
                outcomes[i] = "skipped_content_type"
            elif eligible[i]:
                confirm_by_site.setdefault(sites[i], []).append(i)
            elif cache_skip[i]:
                outcomes[i] = "skipped_cache"
            else:
                outcomes[i] = "not_indexed"
        cache_updates = []
        for site, idxs in confirm_by_site.items():
            items = [
                (hashes[i], order_key_of(depths[i], waves[i], hosts[i], ranks[i]))
                for i in idxs
            ]
            granted = self.seen.confirm_hashes(site, items)
            for i, g in zip(idxs, granted):
                if g:
                    outcomes[i] = "indexed"
                    # cache entry keyed on the POST-REDIRECT url with both
                    # validators stored (crawler.py:1059-1060, cache_db.py)
                    cache_updates.append(
                        (url_key(finals[i] or urls[i]),
                         (hashes[i], self.now, etags[i], sites[i], lms[i]))
                    )
                else:
                    outcomes[i] = "not_indexed"  # duplicate content
        if cache_updates:
            self.seen.set_cache(cache_updates)
        if self.mark_visited:
            by_site: dict[str, list[bytes]] = {}
            for i in range(n):
                by_site.setdefault(sites[i], []).append(url_key(urls[i]))
            for site, keys in by_site.items():
                self.seen.mark_visited(site, keys)
        return batch.append_column("outcome", pa.array(outcomes, pa.string()))


class AtomicDecideStage:
    """Single-pass decide: flags + atomic hash claim + cache update + final
    outcome, no propose/confirm barrier. Duplicate-content resolution is
    exactly-once but winner-by-arrival (vs the two-phase stages' canonical
    min-order winner) — the throughput mode for fresh bulk crawls
    (pipeline.CrawlConfig.dedup_mode="atomic"). Emits the same columns as
    DecideProposeStage→ConfirmStage."""

    def __init__(self, seen_client, no_index_patterns: dict[str, list[str]],
                 now: float, cache_days: float, force: bool):
        self.seen = seen_client
        self.no_index = no_index_patterns
        self.now = now
        self.cache_days = cache_days
        self.force = force

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        finals = (batch["final_url"].to_pylist()
                  if "final_url" in batch.column_names else urls)
        sites = batch["site"].to_pylist()
        statuses = batch["status"].to_pylist()
        hashes = batch["content_hash"].to_pylist()
        contents = batch["content"].to_pylist()
        etags = batch["etag"].to_pylist()
        lms = (batch["last_modified"].to_pylist()
               if "last_modified" in batch.column_names else [None] * len(urls))
        c_hash = batch["cached_hash"].to_pylist()
        c_last = batch["cached_last_crawl"].to_pylist()
        n = len(urls)
        outcomes: list = [None] * n
        eligible = [False] * n
        cache_skip = [False] * n
        claim_by_site: dict[str, list[int]] = {}
        for i in range(n):
            st = statuses[i]
            if st == 0:
                outcomes[i] = "error"
                continue
            if st == 304:
                outcomes[i] = "not_modified"
                continue
            if st == 415:
                outcomes[i] = "skipped_content_type"
                continue
            cs = (
                not self.force
                and c_hash[i] is not None
                and c_hash[i] == hashes[i]
                and (self.now - c_last[i]) / SECONDS_PER_DAY < self.cache_days
            )
            cache_skip[i] = cs
            no_idx = is_excluded(finals[i] or urls[i],
                                 self.no_index.get(sites[i], []))
            stub = len(contents[i] or "") < MIN_CONTENT_CHARS
            if not cs and not no_idx and not stub:
                eligible[i] = True
                claim_by_site.setdefault(sites[i], []).append(i)
            elif cs:
                outcomes[i] = "skipped_cache"
            else:
                outcomes[i] = "not_indexed"
        cache_updates = []
        for site, idxs in claim_by_site.items():
            granted = self.seen.claim_atomic(site, [hashes[i] for i in idxs])
            for i, g in zip(idxs, granted):
                if g:
                    outcomes[i] = "indexed"
                    cache_updates.append(
                        (url_key(finals[i] or urls[i]),
                         (hashes[i], self.now, etags[i], sites[i], lms[i]))
                    )
                else:
                    outcomes[i] = "not_indexed"
        if cache_updates:
            self.seen.set_cache(cache_updates)
        return (
            batch.append_column("eligible", pa.array(eligible, pa.bool_()))
            .append_column("cache_skip", pa.array(cache_skip, pa.bool_()))
            .append_column("outcome", pa.array(outcomes, pa.string()))
        )


def explode_outlinks(batch: pa.Table, seed_by_site: dict[str, str],
                     max_depth_by_site: dict[str, int]) -> pa.Table:
    """Fetched rows → outlink candidate rows (url, site, host, depth,
    parent_rank=parent visit_pos, lpos). Validity + same-domain filters
    applied here (crawler.py:1066-1072); dedup/admission happen downstream."""
    urls = batch["url"].to_pylist()
    sites = batch["site"].to_pylist()
    depths = batch["depth"].to_pylist()
    statuses = batch["status"].to_pylist()
    links = batch["links"].to_pylist()
    vpos = batch["visit_pos"].to_pylist()
    hosts = batch["host"].to_pylist()
    out = {"url": [], "site": [], "host": [], "depth": [], "parent_rank": [], "lpos": []}
    for i in range(len(urls)):
        if statuses[i] != 200:
            continue  # 304/415/error yield no links (crawler.py:1012-1022)
        site = sites[i]
        if depths[i] >= max_depth_by_site.get(site, 3):
            continue
        seed = seed_by_site[site]
        for j, lurl in enumerate(links[i] or []):
            if is_valid_url(lurl) and is_same_domain(lurl, seed):
                out["url"].append(lurl)
                out["site"].append(site)
                out["host"].append(hosts[i])
                out["depth"].append(depths[i] + 1)
                out["parent_rank"].append(vpos[i])
                out["lpos"].append(j)
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "site": pa.array(out["site"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "depth": pa.array(out["depth"], pa.int32()),
            "parent_rank": pa.array(out["parent_rank"], pa.int64()),
            "lpos": pa.array(out["lpos"], pa.int64()),
        }
    )


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
