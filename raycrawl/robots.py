"""robots.txt verdicts + crawl-delay precedence.

Mirrors the reference (crawler.py:410-438): one parser per host, allow-all on
missing/error robots, and the delay ladder site.delay → robots Crawl-delay →
DEFAULT_DELAY (0.5 s). In the sandbox robots bodies come from a fixture table
(host → robots_txt | None) instead of live HTTP; the parser itself is stdlib
``urllib.robotparser`` so allow/deny matching semantics are identical to the
reference's ``RobotFileParser`` usage.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

USER_AGENT = "raycrawl/0.1 (+https://example.org/raycrawl)"
DEFAULT_DELAY = 0.5  # crawler.py:96


class RobotsTable:
    """Per-host robots verdicts from fixture bodies; allow-all fallback.

    With a ``fetcher`` (host → robots body | None), unknown hosts are
    resolved LAZILY on first verdict and cached — the live tier of the
    reference's per-domain fetch+cache (``get_robot_parser``,
    crawler.py:411-428; fetch error → allow-all parser, cached). The
    engine builds the fetcher from its injectable HTTP transport, so the
    same fake transport that serves pages in tests serves robots.txt."""

    def __init__(self, bodies: dict[str, str | None] | None = None,
                 user_agent: str = USER_AGENT, fetcher=None):
        self.user_agent = user_agent
        self.fetcher = fetcher
        self._parsers: dict[str, RobotFileParser | None] = {}
        for host, body in (bodies or {}).items():
            self._parsers[host] = self._parse(body)

    @staticmethod
    def _parse(body: str | None) -> RobotFileParser | None:
        if body is None:
            return None  # fetch-error host → allow-all (crawler.py:425-429)
        p = RobotFileParser()
        p.parse(body.splitlines())
        return p

    def _parser_of(self, host: str) -> RobotFileParser | None:
        if host not in self._parsers and self.fetcher is not None:
            try:
                body = self.fetcher(host)
            except Exception:
                body = None
            self._parsers[host] = self._parse(body)
        return self._parsers.get(host)

    def can_fetch(self, host: str, url: str) -> bool:
        p = self._parser_of(host)
        if p is None:
            return True
        return p.can_fetch(self.user_agent, url)

    def crawl_delay(self, host: str) -> float | None:
        """robots Crawl-delay for our UA, or None (crawler.py:432-438)."""
        p = self._parser_of(host)
        if p is None:
            return None
        d = p.crawl_delay(self.user_agent)
        return float(d) if d else None

    def effective_delay(self, host: str, site_delay: float | None) -> float:
        """site.delay → robots Crawl-delay → DEFAULT_DELAY
        (crawler.py:946-949, 432-438)."""
        if site_delay is not None:
            return site_delay
        d = self.crawl_delay(host)
        return d if d is not None else DEFAULT_DELAY


def make_robots_fetcher(transport, timeout: float = 10.0,
                        scheme_by_host: dict[str, str] | None = None):
    """host → robots.txt body | None, through the engine's injectable HTTP
    transport (stages.LiveFetchStage protocol: ``transport(url, headers,
    timeout) -> FetchResponse``). Non-200 or transport error → None
    (allow-all, crawler.py:424-428). Picklable as long as the transport is —
    it ships into the politeness shards.

    The reference builds the robots URL from the crawled URL's own scheme
    (crawler.py:411-428); here the shards only know hosts, so the site
    seeds' schemes are passed in via ``scheme_by_host``, with the other
    scheme tried as a fallback — an http-only host must not silently become
    allow-all just because https isn't served."""

    class _RobotsFetcher:
        def __init__(self, tr, to, schemes):
            self.tr = tr
            self.to = to
            self.schemes = schemes or {}

        def __call__(self, host: str) -> str | None:
            first = self.schemes.get(host, "https")
            for scheme in (first, "http" if first == "https" else "https"):
                try:
                    resp = self.tr(f"{scheme}://{host}/robots.txt", {}, self.to)
                    if resp.status == 200 and resp.body:
                        return resp.body.decode("utf-8", errors="replace")
                except Exception:
                    pass
            return None

    return _RobotsFetcher(transport, timeout, scheme_by_host)


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
