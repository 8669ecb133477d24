"""URL canonicalization, validity and filter predicates.

Semantics mirror the reference crawler (file:line cites into /root/reference):
- ``normalize_url``      — crawler.py:474-477 (drop #fragment, rstrip '/')
- ``is_valid_url``       — crawler.py:490-499 (http/https, no localhost)
- ``is_same_domain``     — crawler.py:480-481 (netloc equality)
- ``is_excluded``        — crawler.py:484-487 (substring match any pattern)
- ``has_binary_extension`` — crawler.py:1168-1173 (dequeue-time extension gate)
- ``generate_doc_id``    — crawler.py:470-471 (md5 hex of url)
- ``url_key``            — ours: SHA-1 of the canonical URL, the seen-set key
  mandated by the north-star design (sharded cuckoo/bloom filters at 10^10
  keys need a fixed-width uniform key, not the raw URL).

All functions are pure; the batch variants operate on Python lists and are
used inside ``map_batches`` bodies (URL parsing is irreducibly per-string —
stdlib ``urllib.parse`` — but we amortize by compiling nothing per call and
avoiding per-row Python object churn beyond the parse itself).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlparse

GLOBAL_EXCLUDE_PATTERNS = [
    # reference crawler.py:111-118 (login/cart/wordpress boilerplate)
    "/login",
    "/logout",
    "/signin",
    "/signup",
    "/register",
    "/cart",
    "/checkout",
    "/account",
    "/share",
    "/print",
    "/cdn-cgi/",
    "/wp-admin/",
    "/wp-json/",
    "/wp-login.php",
    "/wp-cron.php",
    "xmlrpc.php",
    "?rest_route=",
    "?preview=",
    "/feed/",
]

BINARY_EXTENSIONS = (
    ".jpg",
    ".jpeg",
    ".png",
    ".gif",
    ".bmp",
    ".svg",
    ".pdf",
    ".zip",
    ".rar",
    ".mp3",
    ".mp4",
    ".avi",
)

_BAD_NETLOCS = {"localhost", "127.0.0.1", "0.0.0.0"}


def normalize_url(url: str) -> str:
    """Drop the fragment and any trailing slash (crawler.py:474-477)."""
    url = url.split("#", 1)[0]
    return url.rstrip("/")


def is_valid_url(url: str) -> bool:
    """http(s) only, never loopback hosts (crawler.py:490-499)."""
    try:
        parsed = urlparse(url)
    except Exception:
        return False
    if parsed.scheme not in ("http", "https"):
        return False
    if parsed.netloc in _BAD_NETLOCS:
        return False
    return True


def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc
    except Exception:
        return ""


def is_same_domain(url1: str, url2: str) -> bool:
    """Exact netloc equality (crawler.py:480-481)."""
    return urlparse(url1).netloc == urlparse(url2).netloc


def is_excluded(url: str, patterns: list[str]) -> bool:
    """Substring match against any pattern (crawler.py:484-487)."""
    if not patterns:
        return False
    return any(p in url for p in patterns)


def has_binary_extension(url: str) -> bool:
    """Dequeue-time binary-extension gate (crawler.py:1168-1173)."""
    return url.lower().endswith(BINARY_EXTENSIONS)


def generate_doc_id(url: str) -> str:
    """md5 hex of the (final) URL (crawler.py:470-471)."""
    return hashlib.md5(url.encode()).hexdigest()


def url_key(url: str) -> bytes:
    """SHA-1 digest of the canonical URL — the seen-set shard key."""
    return hashlib.sha1(normalize_url(url).encode()).digest()


def url_key_hex(url: str) -> str:
    return hashlib.sha1(normalize_url(url).encode()).hexdigest()


def join_and_normalize(base_url: str, href: str) -> str:
    """``urljoin`` then normalize — the link-admission canonical form
    (crawler.py:1066-1072)."""
    return normalize_url(urljoin(base_url, href))


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) canonical key — the
    URL-seen-set / CDX index key format of web archives and Common-Crawl
    tooling. Rules (documented subset): scheme dropped, host lowercased
    and dot-reversed with comma joints, default ports (:80/:443) dropped,
    ``)`` closes the host, path+query lowercased, bare hosts get ``/``.
    ``'https://Src1.Example.org:443/Doc/9?B=2'`` →
    ``'org,example,src1)/doc/9?b=2'``.

    Why it exists at 10^10-frontier scale: SURT keys cluster one
    registered domain's URLs contiguously under range partitioning, so a
    sort/range-partition by SURT co-locates each host's frontier and
    seen-set entries (host-locality for politeness + dedup) where raw URL
    order scatters them by scheme/subdomain."""
    u = url.strip()
    low = u.lower()
    scheme = ""
    for sch in ("https://", "http://"):
        if low.startswith(sch):
            scheme = sch[:-3]
            u = u[len(sch):]
            break
    # host ends at the first path/query/fragment delimiter — a URL like
    # example.org?a=1 has a query but no path, and '?' must not fold into
    # the host (that would break the domain-contiguous sort order)
    cut = len(u)
    for d in "/?#":
        p = u.find(d)
        if p != -1 and p < cut:
            cut = p
    host, rest = u[:cut].lower(), u[cut:]
    port = ""
    if ":" in host:
        host, _, p = host.rpartition(":")
        default = {"http": "80", "https": "443"}.get(scheme)
        if p != default:
            port = ":" + p  # non-default ports survive, after the host
    key = ",".join(reversed(host.split("."))) + port + ")"
    return key + (rest.lower() if rest.startswith("/") else "/" + rest.lower())


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
