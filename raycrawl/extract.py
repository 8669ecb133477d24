"""The HTML → document extraction chain.

Deterministic, self-contained reimplementation of the reference extraction
semantics (cites into /root/reference/meilisearchcrawler/):

- ``get_title``            — crawler.py:564-571 (og:title → <title> → <h1> → "Sans titre")
- ``extract_main_content`` — crawler.py:520-561. Tier 2 (trafilatura) is
  not installable here; ``density_extract`` implements an OPT-IN
  jusText/Boilerpipe-style stand-in (``tier2_density=True``) with the same
  ``>250 chars or fall through`` gate as the reference's trafilatura call.
  The DEFAULT contract (shared with the fixture generator and oracle
  simulator) stays the 3-tier ladder site-selector → candidate-selectors →
  largest-element, each followed by boilerplate decomposition — byte parity
  with trafilatura itself is impossible without the library. Documented
  divergence, see SURVEY.md §7.1/§7.7.
- ``remove_common_patterns`` — crawler.py:502-517 (FR/EN boilerplate regexes)
- ``clean_text``           — crawler.py:594-601 (whitespace collapse, control
  char strip, 3000-char truncation)
- ``create_excerpt``       — crawler.py:574-591 (sentence accumulation ≤250)
- ``extract_images``       — crawler.py:604-628 (≤5, ≥100×100 when declared,
  lazy-src, urljoin, dedupe)
- ``extract_lang``         — crawler.py:1040-1043 (<html lang> → split('-') →
  lower, default "fr")
- ``content_hash``         — crawler.py:393-396 (md5 of title|excerpt|content|
  images-json-sorted)
- link extraction          — crawler.py:1066-1072 (<a href> → urljoin →
  normalize; validity/domain filtering is the caller's admission step)

``extract_document`` parses once and computes everything; ``ExtractBatch`` is
the ``map_batches`` stage over ``pyarrow`` record batches (``html: binary``).
HTML parsing is inherently per-row Python (the reference runs lxml per page);
batch amortization comes from module-level compiled regexes and Arrow-native
column I/O (no pandas conversion on the hot path).
"""

from __future__ import annotations

import hashlib
import json
import re
from urllib.parse import urljoin

import pyarrow as pa

from .minidom import Node, parse_html
from .urlnorm import is_valid_url, normalize_url

DEFAULT_TITLE = "Sans titre"
MAX_CONTENT_CHARS = 3000
EXCERPT_MAX = 250
MIN_CONTENT_CHARS = 50  # indexability floor, crawler.py:1038

CANDIDATE_SELECTORS = [
    # crawler.py:536-538
    "article",
    "main",
    '[role="main"]',
    ".post-content",
    ".entry-content",
    ".article-content",
    ".content-main",
    ".main-content",
    "#content",
    ".content",
    ".mw-parser-output",
]

BOILERPLATE_SELECTOR = (
    # crawler.py:555-557
    "nav, header, footer, aside, form, script, style, iframe, .sidebar, "
    ".widget, .social-share, .related-posts, .comments, .comment, "
    '.advertisement, .ad, .ads, [class*="share"], [class*="related"], '
    '[class*="sidebar"], [class*="widget"], [class*="promo"], '
    '[class*="cookie"], [aria-hidden="true"]'
)

_SKIP_IN_LARGEST = {"nav", "header", "footer", "aside", "script", "style", "a", "form"}

_WS_RE = re.compile(r"\s+")
_CRLF_RE = re.compile(r"[\r\n\t]")
_CTRL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")
_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
_COMMON_PATTERNS = [
    re.compile(p, re.IGNORECASE | re.DOTALL)
    for p in (
        r"Partager\s*:.*?(?=\n\n|\Z)",
        r"Publications similaires.*?(?=\n\n|\Z)",
        r"En tant qu'adhérent.*?(?=\n\n|\Z)",
        r"J'accède aux.*?(?=\n\n|\Z)",
        r"Suivez-nous sur.*?(?=\n\n|\Z)",
        r"Abonnez-vous.*?(?=\n\n|\Z)",
        r"Rejoignez-nous.*?(?=\n\n|\Z)",
        r"Inscrivez-vous.*?(?=\n\n|\Z)",
        r"Cookies?\s+policy.*?(?=\n\n|\Z)",
        r"Privacy\s+policy.*?(?=\n\n|\Z)",
    )
]


def get_title(dom: Node) -> str:
    for meta in dom.find_all("meta"):
        if meta.get("property") == "og:title" and meta.get("content"):
            return meta.get("content").strip()
    title = dom.find("title")
    if title is not None:
        s = title.get_text()
        if s:
            return s.strip()
    h1 = dom.find("h1")
    if h1 is not None:
        return h1.get_text(strip=True)
    return DEFAULT_TITLE


def remove_common_patterns(text: str) -> str:
    for pat in _COMMON_PATTERNS:
        text = pat.sub("", text)
    return text.strip()


def clean_text(text: str, max_length: int = MAX_CONTENT_CHARS) -> str:
    if not text:
        return ""
    text = _WS_RE.sub(" ", text)
    text = _CRLF_RE.sub(" ", text)
    text = remove_common_patterns(text)
    text = _CTRL_RE.sub("", text)
    return text.strip()[:max_length]


def create_excerpt(content: str, max_length: int = EXCERPT_MAX) -> str:
    if not content:
        return ""
    sentences = _SENTENCE_SPLIT_RE.split(content)
    excerpt = ""
    for sentence in sentences:
        if len(sentence.strip()) < 20:
            continue
        if len(excerpt) + len(sentence) <= max_length:
            excerpt += sentence + " "
        else:
            break
    if not excerpt.strip():
        excerpt = content[:max_length]
    excerpt = excerpt.strip()
    if len(content) > len(excerpt):
        excerpt = excerpt.rstrip(".!?") + "..."
    return excerpt


_DENSITY_BLOCKS = frozenset(
    {"p", "li", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6"})
_DENSITY_SKIP = frozenset(
    {"nav", "header", "footer", "aside", "form", "script", "style"})


def _density_skipped(el: Node) -> bool:
    """True when an ancestor is boilerplate OR itself a block tag (keep
    only the OUTERMOST qualifying block — nested p-in-blockquote must not
    double its text)."""
    p = el.parent
    while p is not None:
        if p.name in _DENSITY_SKIP or p.name in _DENSITY_BLOCKS:
            return True
        p = p.parent
    return False


def density_extract(dom: Node, min_block_chars: int = 25,
                    min_total_chars: int = 250) -> str:
    """Tier-2 stand-in for the reference's trafilatura extraction
    (crawler.py:526-528) — a public jusText/Boilerpipe-style block-density
    heuristic, since trafilatura itself is not installable here: outermost
    block elements (p/li/blockquote/pre/h1-h6) outside
    nav/header/footer/aside/form with ≥ ``min_block_chars`` stripped chars
    and link-text density < 0.5 are kept in document order, space-joined.
    Returns '' when the kept text is ≤ ``min_total_chars`` — callers fall
    through to tier 3, mirroring the reference's ``len > 250`` trafilatura
    gate. OPT-IN (``tier2_density=True``): byte parity with trafilatura is
    impossible without the library, so the default chain stays byte-stable
    against the oracle simulator."""
    body = dom.find("body")
    if body is None:
        return ""
    parts = []
    for el in body.iter_descendants():
        if el.name not in _DENSITY_BLOCKS or _density_skipped(el):
            continue
        tl = el.text_len_stripped()
        if tl < min_block_chars:
            continue
        link_len = sum(a.text_len_stripped() for a in el.select("a"))
        if 2 * link_len >= tl:  # link density ≥ 0.5: navigation, not prose
            continue
        parts.append(el.get_text(separator=" ", strip=True))
    text = " ".join(parts)
    return text if len(text) > min_total_chars else ""


def extract_main_content(dom: Node, site_selector: str | None,
                         tier2_density: bool = False) -> str:
    # tier 1: explicit site selector
    if site_selector:
        elem = dom.select_one(site_selector)
        if elem is not None:
            return elem.get_text(separator=" ", strip=True)
    # tier 2: trafilatura in the reference (crawler.py:526-528); here the
    # opt-in density stand-in (see density_extract) — absent by default
    if tier2_density:
        t2 = density_extract(dom)
        if t2:
            return t2
    # tier 3: best candidate selector by stripped text length
    best: Node | None = None
    best_len = 0
    for selector in CANDIDATE_SELECTORS:
        elem = dom.select_one(selector)
        if elem is not None:
            cur = elem.text_len_stripped()
            if cur > best_len:
                best = elem
                best_len = cur
    if best is None or best_len < 250:
        # tier 4: largest text element under <body>. The reference's lxml
        # parser SYNTHESIZES html/body around bare tag soup
        # (crawler.py:1025 tolerance); html.parser does not — so when
        # <body> is absent fall back to the document root with the same
        # selection discipline, keeping body-less pages extractable (r5
        # malformed-HTML hardening).
        body = dom.find("body")
        if body is None:
            body = dom
            # lxml parks <title> in the synthesized <head>, outside body
            # text — drop it so the fallback matches (script/style/iframe
            # are handled by the boilerplate decompose below)
            for t in dom.find_all("title"):
                t.decompose()
        max_len = 0
        target = body
        for elem in body.iter_descendants():
            if elem.name in _SKIP_IN_LARGEST:
                continue
            text_len = elem.text_len_stripped()
            if text_len > max_len:
                max_len = text_len
                target = elem
    else:
        target = best
    for tag in target.select(BOILERPLATE_SELECTOR):
        tag.decompose()
    return target.get_text(separator=" ", strip=True)


def extract_images(dom: Node, base_url: str, max_images: int = 5) -> list[dict]:
    images: list[dict] = []
    seen: set[str] = set()
    for img in dom.select("img"):
        if len(images) >= max_images:
            break
        src = img.get("src") or img.get("data-src") or img.get("data-lazy-src")
        alt = (img.get("alt") or "").strip()
        if not src:
            continue
        width = img.get("width")
        height = img.get("height")
        if width and height:
            try:
                if int(width) < 100 or int(height) < 100:
                    continue
            except (ValueError, TypeError):
                pass
        full_url = urljoin(base_url, src)
        if not is_valid_url(full_url):
            continue
        if full_url not in seen:
            images.append({"url": full_url, "alt": alt or "Image", "description": alt or "Image"})
            seen.add(full_url)
    return images


def extract_lang(dom: Node, default: str = "fr") -> str:
    html_tag = dom.find("html")
    if html_tag is not None and html_tag.get("lang"):
        return html_tag.get("lang").split("-")[0].lower()
    return default


def content_hash(content: str, title: str, images: list[dict], excerpt: str) -> str:
    images_str = json.dumps(images, sort_keys=True)
    return hashlib.md5(f"{title}|{excerpt}|{content}|{images_str}".encode()).hexdigest()


def extract_links(dom: Node, final_url: str) -> list[str]:
    """All <a href> joined against the final URL and normalized, document
    order, duplicates preserved (admission dedups, crawler.py:1066-1072)."""
    out = []
    for a in dom.find_all("a"):
        href = a.get("href")
        if href:
            out.append(normalize_url(urljoin(final_url, href)))
    return out


def extract_document(html: str, final_url: str, site_selector: str | None = None,
                     lang_default: str = "fr", want_links: bool = True,
                     tier2_density: bool = False) -> dict:
    """One-parse extraction of every per-page field (crawler.py:1025-1058)."""
    dom = parse_html(html)
    title = get_title(dom)
    # Order matters for parity: extract_main_content DECOMPOSES boilerplate
    # nodes inside the chosen target element (crawler.py:554-558), and the
    # reference reads images (crawler.py:1029) and links (crawler.py:1066-1072)
    # from that same mutated soup — links/images inside decomposed nodes are
    # dropped. Reproduce by extracting content first.
    raw = extract_main_content(dom, site_selector, tier2_density)
    images = extract_images(dom, final_url)
    links = extract_links(dom, final_url) if want_links else []
    lang = extract_lang(dom, default=lang_default)
    content = clean_text(raw)
    excerpt = create_excerpt(content)
    chash = content_hash(content, title, images, excerpt)
    return {
        "title": title,
        "content": content,
        "excerpt": excerpt,
        "images": images,
        "lang": lang,
        "content_hash": chash,
        "links": links,
    }


IMAGES_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("alt", pa.string()), ("description", pa.string())])
)


class ExtractBatch:
    """``map_batches`` stage: pages(url, html) → extracted document columns.

    Stateless per-row compute; declared as a plain callable class so pipelines
    can pass site config once (constructor) instead of per batch. Input batch
    must have ``url: string`` and ``html: binary|string``; output appends
    title/content/excerpt/lang/content_hash/images/links columns.
    """

    def __init__(self, site_selector: str | None = None, lang_default: str = "fr",
                 want_links: bool = True, tier2_density: bool = False):
        self.site_selector = site_selector
        self.lang_default = lang_default
        self.want_links = want_links
        self.tier2_density = tier2_density

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        n = len(urls)
        titles, contents, excerpts, langs, hashes, images_col, links_col = (
            [None] * n, [None] * n, [None] * n, [None] * n, [None] * n, [None] * n, [None] * n,
        )
        for i in range(n):
            h = htmls[i]
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", errors="replace")
            d = extract_document(h or "", urls[i], self.site_selector,
                                 self.lang_default, self.want_links,
                                 self.tier2_density)
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
        out = out.append_column("page_lang", pa.array(langs, pa.string()))
        out = out.append_column("content_hash", pa.array(hashes, pa.string()))
        out = out.append_column("images", pa.array(images_col, IMAGES_TYPE))
        out = out.append_column("links", pa.array(links_col, pa.list_(pa.string())))
        return out


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
