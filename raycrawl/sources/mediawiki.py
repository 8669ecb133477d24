"""MediaWiki source: wikitext cleaning + page-batch document pipeline.

Reimplements the reference's MediaWiki crawler semantics (cites into
/root/reference/meilisearchcrawler/mediawiki_crawler.py):

- ``clean_wikitext``     — :262-334 (iterative template removal, table/html/
  ref stripping, [[link|text]] → text, category/file links, quote marks,
  tail-section cut only past position 500, heading removal, whitespace
  collapse, 3000-char cap)
- ``is_safe_title``      — :246-260 (child-safety keyword blocklist; the
  reference checks only the TITLE despite computing a content preview)
- ``create_excerpt``     — :336-358 (identical to the HTML path's rule —
  reuse raycrawl.extract.create_excerpt)
- ``content_hash``       — :512-514: md5 of "title|content" (differs from
  the HTML path's 4-field hash)
- stub filter            — :209-211 (< 50 chars dropped)
- page-id listing + 50-page content batches (:84-139, :145-244) are live
  API tiers; in the sandbox the input is a Parquet/Arrow table of
  (page_id, title, wikitext, url) rows and the batch pipeline is a
  ``map_batches`` stage producing the same document schema.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..extract import create_excerpt

UNSAFE_TITLE_KEYWORDS = [
    "catastrophe de", "accident de", "attentat", "massacre", "tuerie",
    "génocide",
]

_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}")
_TABLE_RE = re.compile(r"\{\|[^{}]*\|\}", re.DOTALL)
_REF_BLOCK_RE = re.compile(r"<ref[^>]*>.*?</ref>", re.DOTALL)
_REF_SINGLE_RE = re.compile(r"<ref[^>]*/?>")
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_WIKILINK_RE = re.compile(r"\[\[(?:[^\|\]]+\|)?([^\]]+)\]\]")
_CATEGORY_RE = re.compile(r"\[\[Catégorie:[^\]]+\]\]", re.IGNORECASE)
_FILE_RE = re.compile(r"\[\[(Fichier|File|Image):[^\]]+\]\]", re.IGNORECASE)
_QUOTES_RE = re.compile(r"'{2,}")
_TAIL_SECTIONS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"==\s*Références?\s*==",
        r"==\s*Liens?\s+externes?\s*==",
        r"==\s*Voir\s+aussi\s*==",
        r"==\s*Sources?\s*==",
        r"==\s*Notes?\s+et\s+références?\s*==",
    )
]
_HEADING_RE = re.compile(r"={2,}[^=]+=={2,}")
_WS_RE = re.compile(r"\s+")


def clean_wikitext(content: str) -> str:
    if not content:
        return ""
    for _ in range(10):
        before = content
        content = _TEMPLATE_RE.sub("", content)
        if before == content:
            break
    for _ in range(3):
        before = content
        content = _TABLE_RE.sub("", content)
        if before == content:
            break
    # NB: reference order — generic HTML tags stripped BEFORE <ref> blocks,
    # so ref bodies usually survive as text once their tags are gone
    content = _HTML_TAG_RE.sub("", content)
    content = _REF_BLOCK_RE.sub("", content)
    content = _REF_SINGLE_RE.sub("", content)
    content = _WIKILINK_RE.sub(r"\1", content)
    content = _CATEGORY_RE.sub("", content)
    content = _FILE_RE.sub("", content)
    content = _QUOTES_RE.sub("", content)
    min_pos = len(content)
    for pat in _TAIL_SECTIONS:
        m = pat.search(content)
        if m and m.start() < min_pos:
            min_pos = m.start()
    if min_pos < len(content) and min_pos > 500:
        content = content[:min_pos]
    content = _HEADING_RE.sub("", content)
    content = _WS_RE.sub(" ", content).strip()
    return content[:3000]


def is_safe_title(title: str) -> bool:
    t = (title or "").lower()
    return not any(k in t for k in UNSAFE_TITLE_KEYWORDS)


def wiki_content_hash(title: str, content: str) -> str:
    return hashlib.md5(f"{title}|{content}".encode()).hexdigest()


IMAGES_TYPE = pa.list_(pa.struct([("url", pa.string()),
                                  ("alt", pa.string()),
                                  ("description", pa.string())]))


class WikiPagesBatch:
    """``map_batches`` stage: (page_id, title, wikitext, url[, thumb_url])
    rows → cleaned document rows (the fetch_pages_batch filter chain:
    unsafe titles and <50-char stubs dropped, mediawiki_crawler.py:182-235)
    with the reference ``images`` list<struct{url,alt,description}>
    column: one entry per page thumbnail, alt = description = title
    (ref :217-224); no thumbnail → empty list."""

    def __init__(self, min_chars: int = 50):
        self.min_chars = min_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["page_id"].to_pylist()
        titles = batch["title"].to_pylist()
        wikitexts = batch["wikitext"].to_pylist()
        urls = batch["url"].to_pylist()
        thumbs = (batch["thumb_url"].to_pylist()
                  if "thumb_url" in batch.column_names
                  else [None] * batch.num_rows)
        out = {"page_id": [], "title": [], "url": [], "content": [],
               "excerpt": [], "content_hash": [], "images": []}
        for pid, title, wt, url, thumb in zip(ids, titles, wikitexts, urls,
                                              thumbs):
            if not is_safe_title(title):
                continue
            content = clean_wikitext(wt)
            if len(content) < self.min_chars:
                continue
            out["page_id"].append(pid)
            out["title"].append(title)
            out["url"].append(url)
            out["content"].append(content)
            out["excerpt"].append(create_excerpt(content))
            out["content_hash"].append(wiki_content_hash(title, content))
            out["images"].append(
                [{"url": thumb, "alt": title, "description": title}]
                if thumb else [])
        return pa.table(
            {
                "page_id": pa.array(out["page_id"], pa.int64()),
                "title": pa.array(out["title"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "content": pa.array(out["content"], pa.string()),
                "excerpt": pa.array(out["excerpt"], pa.string()),
                "content_hash": pa.array(out["content_hash"], pa.string()),
                "images": pa.array(out["images"], IMAGES_TYPE),
            }
        )


def synthesize_wikitext(text: str, title: str) -> str:
    """Deterministic wikitext wrapper whose cleaned form is exactly
    ``text`` (closed-world with clean_wikitext; fixture generator). Note
    the tail-section cut only applies past position 500 (reference :321),
    so the fixture omits tail sections — their bodies would otherwise leak
    into short documents."""
    return (
        "{{Infobox|param=valeur|autre={{nested|x}}}}"
        f"[[lien interne|{text}]]"
        '<ref name="a"/>'
    )


def build_api_url(crawl_url: str) -> str:
    """Derive the MediaWiki API endpoint from a site's crawl URL
    (reference mediawiki_crawler.py:44-51): a ``/wiki/`` page URL maps to
    ``<origin>/w/api.php``; anything else gets ``/w/api.php`` appended."""
    if "/wiki/" in crawl_url:
        return crawl_url.split("/wiki/")[0] + "/w/api.php"
    return crawl_url.rstrip("/") + "/w/api.php"


def select_transport(site_name: str, default_get, bypass_get=None):
    """Per-site transport selector — the engine equivalent of the
    reference's Cloudflare-bypass gate (mediawiki_crawler.py:53-59): use
    the TLS-impersonating transport iff one is AVAILABLE and the site is
    Vikidia (the one Cloudflare-fronted site in the reference's fleet);
    every other site keeps the default session. Here both transports are
    injectable ``api_get(params) -> dict`` callables — the curl_cffi
    impersonation itself (ref :61-82) is a deployment-time transport
    implementation (no network in this sandbox), but the *selection rule*
    is engine logic and is reproduced exactly: ``bypass_get=None`` models
    ``CURL_CFFI_AVAILABLE=False`` (ref :16-21) and falls back to the
    default transport."""
    if bypass_get is not None and "vikidia" in (site_name or "").lower():
        return bypass_get
    return default_get


def list_all_page_ids(api_get, namespaces=(0,)) -> list[int]:
    """``allpages`` lister with ``apcontinue`` pagination (reference
    mediawiki_crawler.py:95-140): sequential by protocol — each request's
    continue token orders the next — ``aplimit=max`` (500/request) and
    redirects filtered server-side (``apfilterredir=nonredirects``).
    ``api_get(params) -> dict`` is injectable (rate limiting and transport
    live behind it; no network in this sandbox)."""
    out: list[int] = []
    token = None
    while True:
        params = {
            "action": "query",
            "list": "allpages",
            "aplimit": "max",
            "apnamespace": "|".join(map(str, namespaces)),
            "apfilterredir": "nonredirects",
            "format": "json",
        }
        if token:
            params["apcontinue"] = token
        data = api_get(params)
        out.extend(p["pageid"]
                   for p in data.get("query", {}).get("allpages", []))
        if "continue" in data:
            token = data["continue"].get("apcontinue")
            if token is None:
                return out
        else:
            return out


class WikiContentFetcher:
    """Actor-pool map_batches stage: page_id rows → (page_id, title,
    wikitext, url, thumb_url), requesting ``api_batch_size`` (=50,
    reference mediawiki_crawler.py:494-503) pages per API call with the
    full reference prop set ``extracts|info|pageimages|revisions``
    (``piprop=thumbnail&pithumbsize=500``, ref :151-160) — the thumbnail
    source feeds the document ``images`` column downstream (ref
    :217-224). The listing is sequential (continue tokens) but content
    fetching fans out across the actor pool — each actor holds its own
    transport/session."""

    def __init__(self, api_get=None, api_batch_size: int = 50,
                 base_url: str = "https://wiki.example.org/wiki/"):
        self.api_get = api_get
        self.bs = api_batch_size
        self.base = base_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["page_id"].to_pylist()
        rows = {"page_id": [], "title": [], "wikitext": [], "url": [],
                "thumb_url": []}
        for lo in range(0, len(ids), self.bs):
            chunk = ids[lo: lo + self.bs]
            # full reference request shape (mediawiki_crawler.py:151-160):
            # extracts + info(url) + pageimages(thumbnail, 500px) +
            # revisions in ONE batched call
            data = self.api_get({
                "action": "query",
                "pageids": "|".join(map(str, chunk)),
                "prop": "extracts|info|pageimages|revisions",
                "explaintext": 1,
                "exsectionformat": "plain",
                "rvprop": "content",
                "inprop": "url",
                "piprop": "thumbnail",
                "pithumbsize": 500,
                "format": "json",
            })
            pages = data.get("query", {}).get("pages", {})
            for pid in chunk:
                p = pages.get(str(pid))
                if not p or "missing" in p or "redirect" in p:
                    continue  # deleted/missing/redirect — ref :185-191
                if "extract" not in p and "revisions" not in p:
                    continue
                ns = p.get("ns")
                if ns is not None and ns not in (0,):
                    continue  # wrong namespace (ref :198-201); fakes that
                    # omit ns pass — a real API always sends it
                # content preference: plaintext extract, else raw
                # wikitext (ref :194-195)
                content = (p.get("extract")
                           or (p.get("revisions") or [{}])[0].get("*", ""))
                rows["page_id"].append(pid)
                rows["title"].append(p.get("title", ""))
                rows["wikitext"].append(content)
                rows["url"].append(p.get("fullurl")
                                   or self.base
                                   + p.get("title", "").replace(" ", "_"))
                th = p.get("thumbnail") or {}
                rows["thumb_url"].append(th.get("source"))
        return pa.table(
            {"page_id": pa.array(rows["page_id"], pa.int64()),
             "title": pa.array(rows["title"], pa.string()),
             "wikitext": pa.array(rows["wikitext"], pa.string()),
             "url": pa.array(rows["url"], pa.string()),
             "thumb_url": pa.array(rows["thumb_url"], pa.string())}
        )


def wiki_crawl(api_get, namespaces=(0,), api_batch_size: int = 50,
               min_chars: int = 50,
               base_url: str = "https://wiki.example.org/wiki/"):
    """Full MediaWiki source pipeline: apcontinue listing (sequential,
    driver-side — the continue protocol allows nothing else) → page-id
    Dataset → batched content fetch (actor pool) → wikitext clean/filter
    chain. Returns the cleaned document Dataset."""
    import ray.data as rd

    ids = list_all_page_ids(api_get, namespaces)
    ds = rd.from_items([{"page_id": i} for i in ids])
    nb = max(1, min(64, len(ids) // max(api_batch_size, 1) + 1))
    fetched = ds.repartition(nb).map_batches(
        WikiContentFetcher(api_get, api_batch_size, base_url),
        batch_format="pyarrow",
    )
    return fetched.map_batches(WikiPagesBatch(min_chars),
                               batch_format="pyarrow")


# -- query-side search source (S13) -----------------------------------------
# Reimplements the reference's WikiClient.search result pipeline
# (/root/reference/meilisearchcrawler/api/services/wiki_client.py:103-161):
# a MediaWiki ``list=search`` call per query, each hit formatted as a
# SearchResult row. The live HTTP/Cloudflare transport is out of sandbox
# scope; the API is injectable exactly like the crawl-side tiers above.

SNIPPET_WINDOW = 150


def detect_wiki_lang(api_url: str) -> str:
    """Language auto-detection from the API URL (wiki_client.py:37-50).
    Mirrors the reference's asymmetry: en/fr match both wikipedia and
    vikidia hosts, es/de only wikipedia; everything else falls to 'en'."""
    if "en.wikipedia" in api_url or "en.vikidia" in api_url:
        return "en"
    if "fr.wikipedia" in api_url or "fr.vikidia" in api_url:
        return "fr"
    if "es.wikipedia" in api_url:
        return "es"
    if "de.wikipedia" in api_url:
        return "de"
    return "en"


def build_search_snippet(text: str, term: str,
                         window: int = SNIPPET_WINDOW) -> str:
    """Deterministic stand-in for MediaWiki's search snippet: the
    ``window``-char slice of the page text starting at the first
    case-insensitive match, with the matched span wrapped in
    ``<span class="searchmatch">`` (the reference keeps snippet HTML
    verbatim in ``excerpt`` — wiki_client.py:152). Restated in ANSI SQL by
    the ``wiki_search`` oracle, so keep the two in lockstep."""
    idx = text.lower().find(term.lower())
    if idx < 0:
        return ""
    n = len(term)
    return ('<span class="searchmatch">' + text[idx: idx + n] + "</span>"
            + text[idx + n: idx + window])


class CorpusWikiSearchAPI:
    """In-memory MediaWiki ``list=search`` endpoint over a page corpus —
    the deterministic fake server behind ``WikiSearchStage`` in the
    sandbox (the real endpoint is a remote wiki; rankings there are
    opaque, so the fake defines them: non-overlapping case-insensitive
    occurrence count desc, pageid asc, top ``srlimit``). Build once on the
    driver and ``ray.put`` it — each search actor fetches the one plasma
    copy, emulating "every worker talks to the same remote server"."""

    def __init__(self, page_ids, titles, texts):
        self.page_ids = list(page_ids)
        self.titles = list(titles)
        self.texts = list(texts)

    def __call__(self, params: dict) -> dict:
        if params.get("list") != "search":
            return {}
        term = params.get("srsearch", "")
        limit = int(params.get("srlimit", 10))
        if not term:
            return {"query": {"search": []}}
        t = term.lower()
        scored = []
        for pid, title, text in zip(self.page_ids, self.titles, self.texts):
            occ = text.lower().count(t)
            if occ > 0:
                scored.append((-occ, pid, title, text))
        scored.sort()
        return {"query": {"search": [
            {"pageid": pid, "title": title,
             "snippet": build_search_snippet(text, term)}
            for _, pid, title, text in scored[:limit]
        ]}}


class WikiSearchStage:
    """Actor-pool ``map_batches`` stage: (qid, query, srlimit) rows →
    SearchResult rows, one ``list=search`` API call per query row through
    the injectable transport (wiki_client.py:103-161). Reference quirks
    reproduced:

    - request params ``srprop=snippet|titlesnippet`` and ``origin=*``
      (:118-126);
    - hits missing pageid OR title are skipped with ``all([...])``, so a
      **falsy pageid 0 is dropped too** (:140-143);
    - ``url = site_url + '?curid=' + pageid`` (:146), ``id = 'wiki_' +
      pageid``, ``excerpt`` keeps the snippet HTML, ``source='wiki'``,
      constant ``score=1.0`` (:148-158);
    - a malformed/empty response yields no rows (:135-137);
    - result ``lang`` auto-detected from the API URL unless given
      (:36-50).

    The reference searches one query at a time from the API process; here
    the query batch is a Dataset and each actor holds its own transport —
    fan-out is across queries, the per-query protocol is unchanged."""

    def __init__(self, api_get, site_url: str, site_name: str,
                 api_url: str = "", lang: str | None = None):
        import ray

        if isinstance(api_get, ray.ObjectRef):
            api_get = ray.get(api_get)
        self.api_get = api_get
        self.site_url = site_url
        self.site_name = site_name
        self.lang = lang if lang is not None else detect_wiki_lang(api_url)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_pylist()
        queries = batch["query"].to_pylist()
        limits = (batch["srlimit"].to_pylist() if "srlimit" in batch.column_names
                  else [10] * len(qids))
        out = {k: [] for k in ("qid", "id", "url", "title", "excerpt",
                               "source", "site", "lang", "score")}
        for qid, query, limit in zip(qids, queries, limits):
            data = self.api_get({
                "action": "query", "format": "json", "list": "search",
                "srsearch": query, "srlimit": limit,
                "srprop": "snippet|titlesnippet", "origin": "*",
            })
            if not data or "query" not in data or "search" not in data["query"]:
                continue
            for item in data["query"]["search"]:
                page_id = item.get("pageid")
                title = item.get("title")
                if not all([page_id, title]):
                    continue
                out["qid"].append(qid)
                out["id"].append(f"wiki_{page_id}")
                out["url"].append(f"{self.site_url}?curid={page_id}")
                out["title"].append(title)
                out["excerpt"].append(item.get("snippet", ""))
                out["source"].append("wiki")
                out["site"].append(self.site_name)
                out["lang"].append(self.lang)
                out["score"].append(1.0)
        return pa.table({
            "qid": pa.array(out["qid"], pa.int64()),
            "id": pa.array(out["id"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "excerpt": pa.array(out["excerpt"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "site": pa.array(out["site"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "score": pa.array(out["score"], pa.float64()),
        })


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
