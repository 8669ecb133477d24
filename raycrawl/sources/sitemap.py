"""Sitemap source: sitemap.xml / sitemap-index discovery feeding the
crawl frontier.

The reference discovers URLs only by following links from the seed
(crawler.py:1066-1072); real sites publish their URL inventory in
sitemaps (sitemaps.org protocol), and a production crawler seeds from
them — both for coverage (orphan pages no link reaches) and for
incremental recrawl (the optional ``<lastmod>`` stamp says which urls
changed since the last epoch, the per-url complement of the engine's
ETag/If-Modified-Since tier).

Tiers, mirroring the repo's other sources:

- ``parse_sitemap`` — stdlib ``xml.etree`` parse of one sitemap document,
  tolerant of the sitemaps.org namespace; classifies ``<urlset>`` vs
  ``<sitemapindex>`` and returns (kind, [(loc, lastmod)]).
- ``expand_sitemap_tree`` — driver-side recursion through an injectable
  ``fetch(url) -> bytes`` transport (same pattern as the live robots
  fetcher): sitemap INDEXES are tiny by spec (≤50k entries), so walking
  them on the driver is O(index files); the per-url fan-out stays
  distributed.
- ``sitemap_entries_batch`` — the distributed tier: a ``map_batches``
  stage over a table of sitemap XML blobs (one row per fetched sitemap,
  e.g. one per host) exploding them into (url, lastmod) rows; pure
  flat-map, no shuffle.
- ``changed_since`` — the incremental filter: keep entries whose lastmod
  is ≥ a cutoff date (lexicographic on ISO dates — string compare IS
  date compare), i.e. the next epoch's recrawl candidates.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.compute as pc


def _local(tag: str) -> str:
    """Strip any XML namespace: '{ns}loc' -> 'loc'."""
    return tag.rsplit("}", 1)[-1]


MAX_SITEMAP_BYTES = 50 * 1024 * 1024  # sitemaps.org caps files at 50 MB


def _safe_fromstring(xml_text: str | bytes) -> ET.Element:
    """ET.fromstring hardened for untrusted web XML: any DOCTYPE is
    refused BEFORE parsing (entity expansion — CPython's documented
    billion-laughs/quadratic-blowup exposure — requires a DTD, and
    sitemap XML never legitimately carries one), plus a size cap.
    Sitemaps are fetched from arbitrary hosts and parsed on the driver,
    so a bomb here is a driver DoS."""
    if len(xml_text) > MAX_SITEMAP_BYTES:
        raise ValueError(
            f"parse_sitemap: document of {len(xml_text)} bytes exceeds the "
            f"{MAX_SITEMAP_BYTES}-byte cap (sitemaps.org limit is 50 MB)")
    probe = (xml_text if isinstance(xml_text, bytes)
             else xml_text.encode("utf-8", "ignore")).upper()
    if b"<!DOCTYPE" in probe or b"<!ENTITY" in probe:
        raise ValueError(
            "parse_sitemap: DOCTYPE/ENTITY declaration refused — sitemap "
            "XML never needs a DTD, and entity expansion is a driver-DoS "
            "vector (billion laughs / quadratic blowup)")
    return ET.fromstring(xml_text)


def parse_sitemap(xml_text: str | bytes):
    """Parse one sitemap document. Returns ``(kind, entries)`` with kind ∈
    {'urlset', 'sitemapindex'} and entries = [(loc, lastmod_or_empty)]
    in document order. Unknown root tags raise ValueError; entries
    missing ``<loc>`` are skipped (they identify nothing). Untrusted-web
    hardened: DTD/entity declarations are refused and over-cap documents
    raise before parsing (see ``_safe_fromstring``)."""
    root = _safe_fromstring(xml_text)
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"parse_sitemap: unexpected root <{kind}>")
    entries = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, ""
        for field in child:
            name = _local(field.tag)
            if name == "loc":
                loc = (field.text or "").strip()
            elif name == "lastmod":
                lastmod = (field.text or "").strip()
        if loc:
            entries.append((loc, lastmod))
    return kind, entries


def expand_sitemap_tree(fetch, root_url: str, max_sitemaps: int = 10_000):
    """Walk a sitemap tree from ``root_url`` through ``fetch(url) ->
    bytes``, recursing into sitemap indexes breadth-first. Returns the
    list of (url, lastmod) page entries across all leaf urlsets, in
    discovery order. ``max_sitemaps`` guards index cycles / bombs —
    exceeding it raises rather than silently truncating."""
    from collections import deque

    seen, queue, out = set(), deque([root_url]), []
    fetched = 0
    while queue:
        sm_url = queue.popleft()
        if sm_url in seen:
            continue
        seen.add(sm_url)
        fetched += 1
        if fetched > max_sitemaps:
            raise ValueError(
                f"expand_sitemap_tree: more than {max_sitemaps} sitemaps "
                f"under {root_url} (cycle or sitemap bomb?)")
        kind, entries = parse_sitemap(fetch(sm_url))
        if kind == "sitemapindex":
            queue.extend(loc for loc, _ in entries)
        else:
            out.extend(entries)
    return out


def sitemap_entries_batch(batch: pa.Table, xml_col: str = "sitemap_xml",
                          host_col: str = "host") -> pa.Table:
    """Distributed explode: one input row per fetched sitemap blob →
    (host, url, lastmod) rows. Pure flat-map (output ≫ input — it must
    not cross a shuffle); index documents are rejected here because the
    recursion tier above owns them."""
    hosts_out, urls_out, mods_out = [], [], []
    for host, xml_text in zip(batch[host_col].to_pylist(),
                              batch[xml_col].to_pylist()):
        kind, entries = parse_sitemap(xml_text)
        if kind != "urlset":
            raise ValueError(
                "sitemap_entries_batch: got a sitemapindex; expand it "
                "with expand_sitemap_tree first")
        for loc, lastmod in entries:
            hosts_out.append(host)
            urls_out.append(loc)
            mods_out.append(lastmod)
    return pa.table({host_col: pa.array(hosts_out, pa.string()),
                     "url": pa.array(urls_out, pa.string()),
                     "lastmod": pa.array(mods_out, pa.string())})


def changed_since(entries_ds, cutoff_iso: str):
    """Incremental recrawl filter: keep entries whose ISO-date lastmod is
    ≥ ``cutoff_iso``. Empty lastmod (unknown) is KEPT — a url without a
    stamp must be assumed changed, exactly like a server without
    ETag/Last-Modified support. Vectorized string compare (ISO dates
    order lexicographically); no shuffle."""
    def keep(batch: pa.Table) -> pa.Table:
        lm = batch["lastmod"]
        mask = pc.or_(pc.equal(lm, ""), pc.greater_equal(lm, cutoff_iso))
        return batch.filter(pc.fill_null(mask, True))

    return entries_ds.map_batches(keep, batch_format="pyarrow")


def discover_from_robots(robots_fetcher, fetch, hosts,
                         max_sitemaps: int = 10_000):
    """Seed discovery via the robots.txt ``Sitemap:`` directive (the
    sitemaps.org autodiscovery convention): for each host, read its
    robots body through ``robots_fetcher`` (the same injectable tier the
    politeness shards use — robots.make_robots_fetcher), collect the
    advertised sitemap URLs, and expand each tree through ``fetch``.
    Returns [(host, url, lastmod)] in discovery order. Hosts without a
    robots body or without Sitemap lines contribute nothing — the caller
    falls back to the configured seed (exactly the reference's seed-only
    behavior, crawler.py:1117-1119)."""
    from urllib.robotparser import RobotFileParser

    out = []
    for host in hosts:
        body = robots_fetcher(host)
        if not body:
            continue
        p = RobotFileParser()
        p.parse(body.splitlines())
        for sm_url in (p.site_maps() or []):
            out.extend((host, url, lastmod) for url, lastmod in
                       expand_sitemap_tree(fetch, sm_url, max_sitemaps))
    return out


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
