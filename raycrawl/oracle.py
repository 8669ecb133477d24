"""Reference-semantics crawl oracle (single-threaded simulator).

A faithful transcription of the reference's frontier loop semantics
(crawler.py:1080-1224 ``crawl_site_html_async`` + crawler.py:1004-1077
``process_page`` + crawler.py:971-1001 ``fetch_page``), with live HTTP
replaced by a lookup into the synthetic ``pages`` table. This is the *test
oracle* the Ray engine is gated against (SURVEY.md §5.2 tests 2-6):

- frontier = heap on ``(-depth, counter)`` → deepest-first, FIFO per depth;
- batches of ``concurrent_requests`` popped per round, with the pop-time skip
  ladder visited/in-progress → excluded → binary-extension (marks visited!)
  → robots-denied (crawler.py:1157-1178);
- ``max_pages`` accounting includes in-flight slots (crawler.py:1158);
- queue cap checked once per processed result before link admission
  (crawler.py:1203);
- admission test: not in visited ∪ in_progress ∪ queued (crawler.py:1205);
- 304-conditional, content-type, cache-TTL and duplicate-content-hash
  semantics per crawler.py:974-994, 1012-1022, 1033-1060.

Deliberately NOT Ray code and not optimized — it exists to pin behavior at
test scale. The engine must reproduce its visit sequence (strict mode), its
seen-set, its document set and its cache state.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pyarrow as pa

from . import extract as ex
from .fixtures import SiteSpec
from .robots import DEFAULT_DELAY, RobotsTable
from .urlnorm import (
    GLOBAL_EXCLUDE_PATTERNS,
    generate_doc_id,
    has_binary_extension,
    host_of,
    is_excluded,
    is_same_domain,
    is_valid_url,
    normalize_url,
)

CONCURRENT_REQUESTS = 2    # crawler.py:100
MAX_QUEUE_SIZE = 5000      # crawler.py:109
CACHE_DAYS = 14            # crawler.py:99
SECONDS_PER_DAY = 86400.0


@dataclass
class OracleResult:
    visits: list[dict] = field(default_factory=list)        # fetch-order events
    skips: list[dict] = field(default_factory=list)         # pop-time skip events
    docs: list[dict] = field(default_factory=list)          # indexed documents
    refreshes: list[dict] = field(default_factory=list)     # 304 refresh docs
    visited: dict[str, set[str]] = field(default_factory=dict)   # per site
    resume: dict[str, list[tuple[str, int]]] = field(default_factory=dict)
    counters: dict[str, dict[str, int]] = field(default_factory=dict)


def pages_index(pages: pa.Table) -> dict[str, dict]:
    idx = {}
    for row in pages.to_pylist():
        idx[row["url"]] = row
    return idx


def crawl_oracle(
    pages: pa.Table | dict[str, dict],
    seeds: list[SiteSpec],
    robots: dict[str, str | None] | None = None,
    prior_cache: dict[str, dict] | None = None,
    now: float = 2_000_000_000.0,
    concurrent_requests: int = CONCURRENT_REQUESTS,
    max_queue_size: int = MAX_QUEUE_SIZE,
    cache_days: int = CACHE_DAYS,
    force: bool = False,
    max_visits_guard: int = 1_000_000,
) -> OracleResult:
    page_idx = pages if isinstance(pages, dict) else pages_index(pages)
    rt = RobotsTable(robots or {})
    cache: dict[str, dict] = dict(prior_cache or {})
    res = OracleResult()

    for site in seeds:  # sites sequential, crawler.py:1500-1531
        exclude = GLOBAL_EXCLUDE_PATTERNS + list(site.exclude)
        no_index = list(site.no_index)
        max_depth = site.depth
        max_pages = site.max_pages
        processed_hashes: set[str] = set()
        heap: list[tuple[int, int, str, int]] = []
        counter = 0
        seed = normalize_url(site.crawl.replace("*", ""))
        heapq.heappush(heap, (0, counter, seed, 0))
        counter += 1
        queued = {seed}
        visited: set[str] = set()
        in_progress: set[str] = set()
        pages_visited = 0
        errors = 0
        indexed = 0
        not_modified = 0
        skipped_cache = 0
        not_indexed = 0
        rank = 0
        guard = 0

        while heap:
            guard += 1
            if guard > max_visits_guard:
                raise RuntimeError("oracle guard tripped")
            if max_pages > 0 and pages_visited >= max_pages:
                break
            batch: list[tuple[str, int]] = []
            while heap and len(batch) < concurrent_requests:
                if max_pages > 0 and pages_visited + len(in_progress) >= max_pages:
                    break
                _, _, url, depth = heapq.heappop(heap)
                queued.discard(url)
                if url in visited or url in in_progress:
                    continue
                if is_excluded(url, exclude):
                    res.skips.append({"site": site.name, "url": url, "depth": depth,
                                      "reason": "excluded"})
                    continue
                if has_binary_extension(url):
                    visited.add(url)
                    res.skips.append({"site": site.name, "url": url, "depth": depth,
                                      "reason": "extension"})
                    continue
                if not rt.can_fetch(host_of(url), url):
                    res.skips.append({"site": site.name, "url": url, "depth": depth,
                                      "reason": "robots"})
                    continue
                batch.append((url, depth))
                in_progress.add(url)
            if not batch:
                continue

            # gather preserves task order → results processed in batch order.
            # Conditional-GET cache READS are snapshotted at batch start: the
            # reference fires the whole batch's fetch_page calls concurrently
            # (crawler.py:1186), so each fetch reads cache_db BEFORE any
            # same-batch update_cache lands — only across batches do cache
            # writes become visible (matters when a redirect target's entry
            # is written and its direct url fetched in the same batch).
            cache_read = dict(cache)
            for url, depth in batch:
                doc, links, event = _process_page(
                    url, depth, site, page_idx, cache, processed_hashes,
                    exclude, no_index, max_depth, now, cache_days, force,
                    cache_read=cache_read,
                )
                visited.add(url)
                in_progress.discard(url)
                res.visits.append({"site": site.name, "url": url, "depth": depth,
                                   "visit_rank": rank, "event": event})
                rank += 1
                if event == "error":
                    errors += 1
                elif event == "not_modified":
                    not_modified += 1
                    pages_visited += 1
                elif event == "skipped_content_type":
                    pages_visited += 1
                    not_indexed += 1
                else:
                    pages_visited += 1
                    if event == "indexed":
                        indexed += 1
                    elif event == "skipped_cache":
                        skipped_cache += 1
                    else:
                        not_indexed += 1
                if doc is not None:
                    if event == "not_modified":
                        res.refreshes.append(doc)
                    else:
                        res.docs.append(doc)
                if len(heap) < max_queue_size:  # per-result cap check
                    for lurl, ldepth in links:
                        if lurl not in visited and lurl not in in_progress and lurl not in queued:
                            heapq.heappush(heap, (-ldepth, counter, lurl, ldepth))
                            counter += 1
                            queued.add(lurl)

        res.visited[site.name] = visited
        res.resume[site.name] = [(item[2], item[3]) for item in heap]
        res.counters[site.name] = {
            "pages_visited": pages_visited,
            "pages_indexed": indexed,
            "errors": errors,
            "pages_not_modified": not_modified,
            "pages_skipped_cache": skipped_cache,
            "pages_not_indexed": not_indexed,
        }
    # expose final cache state for incremental tests
    res.final_cache = cache  # type: ignore[attr-defined]
    return res


def _process_page(url, depth, site: SiteSpec, page_idx, cache, processed_hashes,
                  exclude, no_index, max_depth, now, cache_days, force,
                  cache_read=None):
    """returns (doc|None, links, event)"""
    page = page_idx.get(url)
    if page is None:
        return None, [], "error"  # fetch failure after retries → None (crawler.py:1001)
    # lookup keyed on the REQUESTED url (crawler.py:973), against the
    # batch-start snapshot (concurrent gather; see crawl_oracle)
    cached = (cache_read if cache_read is not None else cache).get(url)
    # conditional GET hit (either validator) → 304 refresh doc keyed on the
    # REQUESTED url, no links (crawler.py:974-981 + 1012-1016)
    etag_hit = (cached and cached.get("etag")
                and cached["etag"] == page.get("etag"))
    lm_hit = (cached and cached.get("last_modified")
              and cached["last_modified"] == page.get("last_modified"))
    if etag_hit or lm_hit:
        return ({"id": generate_doc_id(url), "url": url, "site": site.name},
                [], "not_modified")
    if "text/html" not in (page.get("content_type") or "text/html"):
        return None, [], "skipped_content_type"  # crawler.py:987-989
    # everything below keys on the POST-REDIRECT url: doc id, images/links
    # base, no_index, cache entry (crawler.py:993, 1041-1060, 1070); note the
    # reference quirk — the cache WRITE keys on final_url while the lookup
    # above keys on the requested url, so redirecting urls never 304
    final_url = page.get("final_url") or url
    html = page["html"]
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    d = ex.extract_document(html, final_url, site.selector, lang_default="fr")
    content, title, excerpt, images = d["content"], d["title"], d["excerpt"], d["images"]
    chash = d["content_hash"]
    doc_id = generate_doc_id(final_url)
    is_no_index = is_excluded(final_url, no_index)
    is_dup = chash in processed_hashes
    skipped_by_cache = (
        not force
        and cached is not None
        and cached["content_hash"] == chash
        and (now - cached["last_crawl"]) / SECONDS_PER_DAY < cache_days
    )
    should_index = not is_no_index and not skipped_by_cache and not is_dup
    doc = None
    event = "not_indexed"
    if should_index and len(content) >= ex.MIN_CONTENT_CHARS:
        processed_hashes.add(chash)
        doc = {
            "id": doc_id,
            "site": site.name,
            "url": final_url,
            "title": title,
            "excerpt": excerpt,
            "content": content,
            "images": images,
            "lang": d["lang"],
            "content_hash": chash,
        }
        cache[final_url] = {
            "content_hash": chash,
            "doc_id": doc_id,
            "last_crawl": now,
            "etag": page.get("etag"),
            "last_modified": page.get("last_modified"),
            "site": site.name,
        }
        event = "indexed"
    elif skipped_by_cache:
        event = "skipped_cache"
    links = []
    if depth < max_depth:
        for lurl in d["links"]:
            if is_valid_url(lurl) and is_same_domain(lurl, site.crawl):
                links.append((lurl, depth + 1))
    return doc, links, event


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
