"""Deterministic synthetic-web fixtures (FIXTURES.md §1-§3, §7).

Two families:

1. ``scenario(name)`` — small handcrafted link-graph worlds (line, tree,
   cycle, dup_content, filters, budget, politeness, incremental, hot_host)
   for the conformance tests in SURVEY.md §5.2. Pure function of
   ``(name, seed=42)``; same bytes every run.

2. ``synthesize_pages_batch`` — the sf-parametric Common-Crawl-style ``pages``
   corpus derived 1:1 from the driver's ``documents.parquet``
   (doc_id, text, lang, source). The derivation is simple enough to restate
   in ANSI SQL, which is what makes the crawl queries oracle-checkable by
   DuckDB (see ``__ray_entry__.oracle_sql``):

   - ``host  = source || '.example.org'``
   - ``url   = 'https://' || host || '/doc/' || doc_id``
   - ``title = 'Doc ' || doc_id``
   - link graph: binary tree *within* each host over local index
     ``i = doc_id // 20`` (children ``2i+1``, ``2i+2`` → child doc_id =
     ``doc_id + 20*(i+1)`` and ``doc_id + 20*(i+2)``), plus one cross-host
     noise link (filtered by the same-domain rule) and one excluded, one
     fragment-duplicate and one binary-extension link per page.
   - oracle ``text`` column == ``documents.text`` (the HTML template places
     the text as a single text node inside ``<article>``; the extraction
     ladder provably returns it verbatim, and ``clean_text`` is the identity
     on the already-single-spaced corpus).

The page HTML template is closed-world with respect to ``raycrawl.extract``:
boilerplate lives in nav/header/footer outside the target element, links sit
in <nav>, and the main text is a single text node, so the expected extraction
output is computed top-down at generation time — not by running the extractor
(no circularity; tests of parser recovery live in tests/test_extract.py).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pyarrow as pa

EPOCH_BASE_US = 1_700_000_000_000_000  # fixed synthetic warc_ts origin (us)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        # supplementary columns beyond the input_hint core five:
        ("etag", pa.string()),
        ("content_type", pa.string()),
        # HTTP-semantics columns (both nullable): the Last-Modified header
        # the server sends with the page, and — for redirecting URLs — the
        # URL the request finally lands on (crawler.py:993 str(response.url))
        ("last_modified", pa.string()),
        ("final_url", pa.string()),
    ]
)


@dataclass
class SiteSpec:
    """sites.yml-equivalent job spec (config/sites.yml.example:1-44,
    consumed at crawler.py:939-953)."""

    name: str
    crawl: str                      # seed URL
    depth: int = 3
    max_pages: int = 0              # 0 = unlimited
    delay: float | None = None      # None → robots crawl-delay → 0.5
    selector: str | None = None
    exclude: list[str] = field(default_factory=list)
    no_index: list[str] = field(default_factory=list)
    lang_default: str = "fr"


def _etag_for(text: str) -> str:
    return 'W/"' + hashlib.md5(text.encode()).hexdigest()[:16] + '"'


def build_page_html(
    title: str,
    text: str,
    lang: str,
    links: list[str],
    og_title: str | None = None,
    images: list[tuple[str, str, str, str]] = (),  # (src, alt, width, height)
    extra_nav_text: str = "Accueil Rubriques Contact",
) -> str:
    """The canonical fixture page. Nav carries the link graph (outside the
    extraction target so decomposition never eats graph edges); <article>
    holds the main text as one text node."""
    nav_links = "\n".join(f'<a href="{href}">lien</a>' for href in links)
    og = f'<meta property="og:title" content="{og_title}">' if og_title else ""
    imgs = "\n".join(
        f'<img src="{src}" alt="{alt}"'
        + (f' width="{w}" height="{h}"' if w else "")
        + ">"
        for src, alt, w, h in images
    )
    return f"""<html lang="{lang}">
<head><title>{title}</title>{og}</head>
<body>
<nav>{extra_nav_text}
{nav_links}
</nav>
<header>Bandeau du site — boilerplate header</header>
<article>{text}{imgs}</article>
<footer><a href="/mentions-legales/print">Mentions legales</a> — boilerplate footer</footer>
</body>
</html>"""


# ---------------------------------------------------------------------------
# sf-parametric corpus derived from documents.parquet
# ---------------------------------------------------------------------------

N_HOSTS = 20  # documents.source == 'src' || (doc_id % 20) at every sf


def doc_url(doc_id: int) -> str:
    return f"https://src{doc_id % N_HOSTS}.example.org/doc/{doc_id}"


def doc_children(doc_id: int, n_docs: int) -> list[int]:
    """Binary tree within the host group (local index i = doc_id // 20)."""
    i = doc_id // N_HOSTS
    k = doc_id % N_HOSTS
    out = []
    for child_local in (2 * i + 1, 2 * i + 2):
        child = child_local * N_HOSTS + k
        if child < n_docs:
            out.append(child)
    return out


def synthesize_page_row(doc_id: int, text: str, lang: str, n_docs: int) -> dict:
    url = doc_url(doc_id)
    children = doc_children(doc_id, n_docs)
    links = [f"/doc/{c}" for c in children]
    if children:
        links.append(f"/doc/{children[0]}#section-2")       # fragment dup
    links.append(f"https://src{(doc_id + 1) % N_HOSTS}.example.org/doc/x")  # cross-host
    links.append("/login/area")                              # excluded pattern
    links.append("/assets/banner.png")                       # binary extension
    html = build_page_html(title=f"Doc {doc_id}", text=text, lang=lang, links=links)
    return {
        "url": url,
        "warc_ts": EPOCH_BASE_US + doc_id * 1_000_000,
        "html": html.encode(),
        "text": text,
        "lang": lang,
        "etag": _etag_for(text),
        "content_type": "text/html",
        "last_modified": None,
        "final_url": None,
    }


def synthesize_pages_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """map_batches body: documents(doc_id, text, lang) → pages rows."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows = [synthesize_page_row(d, t, l, n_docs) for d, t, l in zip(doc_ids, texts, langs)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


class SyntheticPageIndex:
    """Mapping-like ``url → (html, etag, content_type)`` building pages ON
    DEMAND from the small per-doc (text, lang) dict. Used as the sim-fetch
    index for replica-scaled bench corpora: the broadcast payload stays
    O(unique docs), not O(replicas × html bytes) — at 48 replicas of sf0.1
    that's ~2 MB instead of ~400 MB per worker. Replica hosts are
    ``src{k}r{r}.example.org``; the embedded links are host-relative, so the
    same deterministic HTML serves every replica of a doc."""

    def __init__(self, docs: dict[int, tuple[str, str]], n_docs: int):
        self.docs = docs
        self.n = n_docs
        self._cache: dict[int, tuple] = {}

    def get(self, url: str):
        marker = ".example.org/doc/"
        pos = url.find(marker)
        if pos < 0:
            return None
        try:
            doc_id = int(url[pos + len(marker):])
        except ValueError:
            return None
        hit = self._cache.get(doc_id)
        if hit is not None:
            return hit
        rec = self.docs.get(doc_id)
        if rec is None:
            return None
        text, lang = rec
        row = synthesize_page_row(doc_id, text, lang, self.n)
        out = (row["html"], row["etag"], row["content_type"])
        self._cache[doc_id] = out
        return out


def replicated_seeds(n_docs: int, replicas: int, max_depth: int = 24) -> list[SiteSpec]:
    """R replica sites per base host — same tree shape, distinct frontiers."""
    seeds = []
    for r in range(replicas):
        for k in range(min(N_HOSTS, n_docs)):
            host = f"src{k}r{r}.example.org"
            seeds.append(
                SiteSpec(name=f"src{k}r{r}", crawl=f"https://{host}/doc/{k}",
                         depth=max_depth, max_pages=0, delay=0.5)
            )
    return seeds


def corpus_seeds(n_docs: int, max_depth: int = 24) -> list[SiteSpec]:
    """One site per host; seed = local-index-0 doc of the host."""
    return [
        SiteSpec(
            name=f"src{k}",
            crawl=doc_url(k),
            depth=max_depth,
            max_pages=0,
            delay=0.5,
        )
        for k in range(min(N_HOSTS, n_docs))
    ]


# ---------------------------------------------------------------------------
# handcrafted scenario worlds (tests)
# ---------------------------------------------------------------------------

class WebBuilder:
    """Accumulates a synthetic site; emits the pages table + expected text."""

    def __init__(self):
        self.rows: list[dict] = []
        self._seq = 0

    def page(
        self,
        url: str,
        text: str,
        links: list[str] = (),
        lang: str = "fr",
        title: str | None = None,
        og_title: str | None = None,
        images: list[tuple[str, str, str, str]] = (),
        content_type: str = "text/html",
        html: str | None = None,
        expected_text: str | None = None,
        etag: str | None = "auto",
        last_modified: str | None = None,
    ) -> "WebBuilder":
        from .extract import clean_text

        if html is None:
            html = build_page_html(
                title=title or f"Page {self._seq}",
                text=text,
                lang=lang,
                links=list(links),
                og_title=og_title,
                images=list(images),
            )
        self.rows.append(
            {
                "url": url,
                "warc_ts": EPOCH_BASE_US + self._seq * 1_000_000,
                "html": html.encode(),
                "text": expected_text if expected_text is not None else clean_text(text),
                "lang": lang,
                "etag": _etag_for(text) if etag == "auto" else etag,
                "content_type": content_type,
                "last_modified": last_modified,
                "final_url": None,
            }
        )
        self._seq += 1
        return self

    def redirect(self, url: str, to: str) -> "WebBuilder":
        """A redirecting URL: fetching ``url`` serves the body/headers of the
        already-added page ``to`` with ``final_url = to`` (what an
        ``allow_redirects`` GET reduces to, crawler.py:993)."""
        target = next(r for r in self.rows if r["url"] == to)
        self.rows.append(
            {**target, "url": url, "final_url": to,
             "warc_ts": EPOCH_BASE_US + self._seq * 1_000_000}
        )
        self._seq += 1
        return self

    def table(self) -> pa.Table:
        return pa.Table.from_pylist(self.rows, schema=PAGES_SCHEMA)


def _long_text(tag: str, n_words: int = 60) -> str:
    """>250-char deterministic filler, single-spaced, punctuation-free."""
    words = ["contenu", "page", "texte", "simple", "mot", tag]
    return " ".join(words[i % len(words)] + str(i) for i in range(n_words))


def scenario(name: str) -> dict:
    """Returns {pages: pa.Table, seeds: [SiteSpec], robots: {host: str|None}}."""
    w = WebBuilder()
    robots: dict[str, str | None] = {}
    if name == "line":
        # a.org: chain 0→1→2→3→4, depth cutoff at 3
        base = "https://line.example.org"
        for i in range(5):
            nxt = [f"/p{i+1}"] if i < 4 else []
            w.page(f"{base}/p{i}", _long_text(f"line{i}"), links=nxt, title=f"L{i}")
        seeds = [SiteSpec(name="line", crawl=f"{base}/p0", depth=3)]
    elif name == "tree":
        # binary tree, 3 levels: deepest-first pop with FIFO ties
        base = "https://tree.example.org"
        for i in range(15):
            kids = [f"/n{2*i+1}", f"/n{2*i+2}"] if 2 * i + 2 <= 14 else []
            w.page(f"{base}/n{i}", _long_text(f"tree{i}"), links=kids, title=f"N{i}")
        seeds = [SiteSpec(name="tree", crawl=f"{base}/n0", depth=5)]
    elif name == "cycle":
        base = "https://cycle.example.org"
        w.page(f"{base}/a", _long_text("ca"), links=["/b"])
        w.page(f"{base}/b", _long_text("cb"), links=["/c", "/a"])
        w.page(f"{base}/c", _long_text("cc"), links=["/a", "/b", "/c"])
        seeds = [SiteSpec(name="cycle", crawl=f"{base}/a", depth=10)]
    elif name == "dup_content":
        base = "https://dup.example.org"
        same = _long_text("dupbody")
        w.page(f"{base}/root", _long_text("duproot"),
               links=["/copy1", "/copy2", "/copy3"], title="R")
        # identical title+text → identical content_hash → first-wins dedup
        for c in ("copy1", "copy2", "copy3"):
            w.page(f"{base}/{c}", same, title="Same Title")
        seeds = [SiteSpec(name="dup", crawl=f"{base}/root", depth=2)]
    elif name == "filters":
        base = "https://filters.example.org"
        w.page(
            f"{base}/home",
            _long_text("fhome"),
            links=[
                "/ok1",
                "/login/form",          # global exclude
                "/banner.PNG",          # binary extension (case-insensitive)
                "/private/x",           # robots-disallowed
                "https://other.example.org/far",   # off-domain
                "ftp://filters.example.org/f",     # invalid scheme
                "/ok1#dup",             # normalizes to /ok1 (already queued)
                "/noidx/page",          # no_index: visited, links followed, not indexed
                "/custom-skip/z",       # site exclude pattern
            ],
            title="H",
        )
        w.page(f"{base}/ok1", _long_text("fok1"), title="O1")
        w.page(f"{base}/private/x", _long_text("fpriv"), title="P")
        w.page(f"{base}/noidx/page", _long_text("fnoidx"), links=["/ok2"], title="NI")
        w.page(f"{base}/ok2", _long_text("fok2"), title="O2")
        robots["filters.example.org"] = "User-agent: *\nDisallow: /private/\n"
        seeds = [
            SiteSpec(
                name="filters",
                crawl=f"{base}/home",
                depth=3,
                exclude=["/custom-skip/"],
                no_index=["/noidx/"],
            )
        ]
    elif name == "budget":
        # star: root links to 30 children; max_pages=8, queue cap exercised
        base = "https://budget.example.org"
        w.page(f"{base}/root", _long_text("broot"),
               links=[f"/c{i}" for i in range(30)], title="BR")
        for i in range(30):
            w.page(f"{base}/c{i}", _long_text(f"bc{i}"), title=f"BC{i}")
        seeds = [SiteSpec(name="budget", crawl=f"{base}/root", depth=2, max_pages=8)]
    elif name == "politeness":
        # two hosts with different delays via robots Crawl-delay
        for hname, n in (("fasthost", 6), ("slowhost", 6)):
            base = f"https://{hname}.example.org"
            for i in range(n):
                nxt = [f"/p{i+1}"] if i < n - 1 else []
                w.page(f"{base}/p{i}", _long_text(f"{hname}{i}"), links=nxt)
        robots["fasthost.example.org"] = "User-agent: *\nCrawl-delay: 1\n"
        robots["slowhost.example.org"] = "User-agent: *\nCrawl-delay: 4\n"
        seeds = [
            SiteSpec(name="fast", crawl="https://fasthost.example.org/p0", depth=9, delay=None),
            SiteSpec(name="slow", crawl="https://slowhost.example.org/p0", depth=9, delay=None),
        ]
    elif name == "redirect":
        # /old 301→ /new (doc keyed on final url); /new also linked directly
        # (second fetch of same content → duplicate-content not_indexed);
        # /moved 301→ /target where only the redirect is ever linked. The
        # redirect target's relative links resolve against the FINAL url
        # (crawler.py:1070 urljoin(final_url, href)).
        base = "https://redir.example.org"
        w.page(f"{base}/home", _long_text("rhome"),
               links=["/old", "/new", "/moved"], title="RH")
        w.page(f"{base}/new", _long_text("rnew"), links=["/deep"], title="RN")
        w.page(f"{base}/deep", _long_text("rdeep"), title="RD")
        w.page(f"{base}/target", _long_text("rtarget"), title="RT")
        w.redirect(f"{base}/old", f"{base}/new")
        w.redirect(f"{base}/moved", f"{base}/target")
        seeds = [SiteSpec(name="redir", crawl=f"{base}/home", depth=4)]
    elif name == "hot_host":
        # one host holds ~30% of pages (skew), 6 cold hosts share the rest
        hot = "https://hot.example.org"
        n_hot, n_cold_hosts, n_cold = 60, 6, 20
        w.page(f"{hot}/root", _long_text("hot0"),
               links=[f"/h{i}" for i in range(n_hot)], title="HOT")
        for i in range(n_hot):
            w.page(f"{hot}/h{i}", _long_text(f"hot{i+1}"))
        seeds = [SiteSpec(name="hot", crawl=f"{hot}/root", depth=2)]
        for c in range(n_cold_hosts):
            base = f"https://cold{c}.example.org"
            w.page(f"{base}/root", _long_text(f"cold{c}"),
                   links=[f"/k{i}" for i in range(n_cold)])
            for i in range(n_cold):
                w.page(f"{base}/k{i}", _long_text(f"cold{c}k{i}"))
            seeds.append(SiteSpec(name=f"cold{c}", crawl=f"{base}/root", depth=2))
    else:
        raise ValueError(f"unknown scenario {name!r}")
    return {"pages": w.table(), "seeds": seeds, "robots": robots}


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
