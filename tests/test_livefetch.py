"""LiveFetchStage protocol conformance against a fake transport
(ref fetch_page: crawler.py:971-1001 — retries, backoff, conditional GET,
content-type gate)."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycrawl.stages import (  # noqa: E402
    ExtractIfHtml,
    FetchResponse,
    LiveFetchStage,
    SimFetchStage,
)


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string()),
                     "site": pa.array(["s"] * len(urls), pa.string())})


class Script:
    """Fake transport: pops one scripted behavior per call for a url."""

    def __init__(self, script):
        self.script = {u: list(v) for u, v in script.items()}
        self.calls = []   # (url, headers)

    def __call__(self, url, headers, timeout):
        self.calls.append((url, dict(headers)))
        step = self.script[url].pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def test_retry_backoff_then_success():
    html = b"<html><body>ok</body></html>"
    tr = Script({"https://a/x": [
        TimeoutError("t1"), ConnectionError("t2"),
        FetchResponse(200, {"Content-Type": "text/html", "ETag": "e9"}, html),
    ]})
    sleeps = []
    st = LiveFetchStage(transport=tr, sleep=sleeps.append, threads=1)
    out = st(_batch(["https://a/x"]))
    assert out["status"].to_pylist() == [200]
    assert out["html"].to_pylist() == [html]
    assert out["etag"].to_pylist() == ["e9"]
    assert sleeps == [1, 2]          # 2**attempt between the 3 attempts
    assert len(tr.calls) == 3


def test_error_after_max_retries():
    tr = Script({"https://a/x": [TimeoutError(), TimeoutError(), TimeoutError()]})
    sleeps = []
    st = LiveFetchStage(transport=tr, sleep=sleeps.append, threads=1)
    out = st(_batch(["https://a/x"]))
    assert out["status"].to_pylist() == [0]   # decide stage's 'error'
    assert sleeps == [1, 2]                   # no sleep after the last attempt
    assert len(tr.calls) == 3


def test_http_error_retries_like_exception():
    tr = Script({"https://a/x": [
        FetchResponse(500, {"Content-Type": "text/html"}, b""),
        FetchResponse(200, {"Content-Type": "text/html"}, b"<p>hi</p>"),
    ]})
    sleeps = []
    st = LiveFetchStage(transport=tr, sleep=sleeps.append, threads=1)
    out = st(_batch(["https://a/x"]))
    assert out["status"].to_pylist() == [200]
    assert sleeps == [1]


def test_content_type_gate_not_retried():
    tr = Script({"https://a/f.pdf": [
        FetchResponse(200, {"Content-Type": "application/pdf"}, b"%PDF")]})
    st = LiveFetchStage(transport=tr, sleep=lambda s: None, threads=1)
    out = st(_batch(["https://a/f.pdf"]))
    assert out["status"].to_pylist() == [415]
    assert len(tr.calls) == 1                 # skip, no retry (crawler.py:987)


class FakeSeen:
    def __init__(self, recs):
        self.recs = recs

    def get_cache(self, keys):
        return self.recs


def test_conditional_get_headers_and_304():
    rec = ("hash0", 1.5e9, "etag-1", "s")
    tr = Script({"https://a/x": [FetchResponse(304)]})
    st = LiveFetchStage(seen_client=FakeSeen([rec]), transport=tr, threads=1)
    out = st(_batch(["https://a/x"]))
    assert tr.calls[0][1] == {"If-None-Match": "etag-1"}
    assert out["status"].to_pylist() == [304]
    assert out["cached_hash"].to_pylist() == ["hash0"]
    assert out["cached_last_crawl"].to_pylist() == [1.5e9]
    # 304 short-path returns the requested url (crawler.py:981)
    assert out["final_url"].to_pylist() == ["https://a/x"]


def test_if_modified_since_header_from_cached_last_modified():
    """5-field cache records send BOTH validators (crawler.py:974-979);
    etag-less records send If-Modified-Since alone — the round-2 gap where
    etag-less servers could never 304."""
    lm = "Mon, 01 Jan 2024 00:00:00 GMT"
    rec_both = ("h", 1.5e9, "etag-1", "s", lm)
    tr = Script({"https://a/x": [FetchResponse(304)]})
    st = LiveFetchStage(seen_client=FakeSeen([rec_both]), transport=tr, threads=1)
    st(_batch(["https://a/x"]))
    assert tr.calls[0][1] == {"If-None-Match": "etag-1",
                              "If-Modified-Since": lm}
    rec_lm_only = ("h", 1.5e9, None, "s", lm)
    tr2 = Script({"https://a/x": [FetchResponse(304)]})
    st2 = LiveFetchStage(seen_client=FakeSeen([rec_lm_only]), transport=tr2,
                         threads=1)
    out = st2(_batch(["https://a/x"]))
    assert tr2.calls[0][1] == {"If-Modified-Since": lm}
    assert out["status"].to_pylist() == [304]


def test_final_url_and_last_modified_propagate():
    html = b"<html><head><title>T</title></head><body><p>%s</p></body></html>" % (
        b"redirected body " * 20)
    lm = "Tue, 02 Jan 2024 00:00:00 GMT"
    tr = Script({"https://a/old": [
        FetchResponse(200, {"Content-Type": "text/html", "ETag": "e7",
                            "Last-Modified": lm}, html,
                      final_url="https://a/new")]})
    st = LiveFetchStage(transport=tr, threads=1)
    out = st(_batch(["https://a/old"]))
    assert out["final_url"].to_pylist() == ["https://a/new"]
    assert out["last_modified"].to_pylist() == [lm]
    # extraction keys image/link resolution and doc identity on final_url
    ex = ExtractIfHtml()(out)
    assert ex["final_url"].to_pylist() == ["https://a/new"]


def test_schema_matches_sim_fetch_and_feeds_extraction():
    """Live and sim tiers are interchangeable: same output schema, and the
    extraction chain consumes either."""
    html = b"<html><head><title>T</title></head><body><p>%s</p></body></html>" % (
        b"hello world " * 20)
    url = "https://a/x"
    tr = Script({url: [FetchResponse(200, {"Content-Type": "text/html",
                                           "ETag": "e"}, html)]})
    live = LiveFetchStage(transport=tr, threads=1)(_batch([url]))
    sim = SimFetchStage({url: (html, "e", "text/html")}, None,
                        skip_cache=True)(_batch([url]))
    assert live.schema == sim.schema
    ex_live = ExtractIfHtml()(live)
    ex_sim = ExtractIfHtml()(sim)
    assert ex_live["content"].to_pylist() == ex_sim["content"].to_pylist()
    assert ex_live["title"].to_pylist() == ["T"]


def test_thread_pool_batch():
    urls = [f"https://a/{i}" for i in range(16)]
    tr = Script({u: [FetchResponse(200, {"Content-Type": "text/html"},
                                   b"<p>x</p>")] for u in urls})
    st = LiveFetchStage(transport=tr, threads=4)
    out = st(_batch(urls))
    assert out["status"].to_pylist() == [200] * 16


class DictTransport:
    """Picklable HTTP stand-in backed by the scenario page index — lets the
    full wave engine run over the LIVE fetch tier offline."""

    def __init__(self, index):
        self.index = index

    def __call__(self, url, headers, timeout):
        page = self.index.get(url)
        if page is None:
            raise ConnectionError(url)
        html, etag, ctype = page[0], page[1], page[2]
        lm = page[3] if len(page) > 3 else None
        final = (page[4] if len(page) > 4 else None) or url
        if (etag and headers.get("If-None-Match") == etag) or (
                lm and headers.get("If-Modified-Since") == lm):
            return FetchResponse(304)
        hdrs = {"Content-Type": ctype or "text/html", "ETag": etag or None}
        if lm:
            hdrs["Last-Modified"] = lm
        return FetchResponse(200, hdrs, html, final_url=final)


def test_live_robots_fetch_through_transport(ray_session):
    """Live robots tier (ref get_robot_parser, crawler.py:411-428): with NO
    injected robots bodies, the wave engine fetches robots.txt per host
    through the same fake transport and honors Disallow — identical
    verdicts to the injected-bodies run."""
    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    from raycrawl.fixtures import scenario
    from raycrawl.pipeline import CrawlConfig, CrawlEngine
    from raycrawl.stages import build_page_index

    s = scenario("filters")
    idx = build_page_index(s["pages"])
    # serve each fixture robots body at https://host/robots.txt
    for host, body in s["robots"].items():
        if body is not None:
            idx[f"https://{host}/robots.txt"] = (body.encode(), None,
                                                 "text/plain")
    r_inj = CrawlEngine(None, s["seeds"], s["robots"],
                        cfg=CrawlConfig(mode="wave"),
                        transport=DictTransport(idx)).run()
    r_live = CrawlEngine(None, s["seeds"], {},   # no bodies injected
                         cfg=CrawlConfig(mode="wave"),
                         transport=DictTransport(idx)).run()
    assert r_live.counters == r_inj.counters
    live_urls = sorted(v["url"] for v in r_live.visits.to_pylist())
    assert live_urls == sorted(v["url"] for v in r_inj.visits.to_pylist())
    # the robots-disallowed path was skipped, not fetched
    assert "https://filters.example.org/private/x" not in live_urls


def test_wave_crawl_over_live_tier_equals_sim(ray_session):
    """Full engine parity: a wave crawl through LiveFetchStage (fake HTTP
    transport) produces the same documents and counters as the sim tier."""
    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    from raycrawl.fixtures import scenario
    from raycrawl.pipeline import CrawlConfig, CrawlEngine
    from raycrawl.stages import build_page_index

    for name in ("tree", "filters", "redirect"):
        s = scenario(name)
        r_sim = CrawlEngine(s["pages"], s["seeds"], s["robots"],
                            cfg=CrawlConfig(mode="wave")).run()
        idx = build_page_index(s["pages"])
        r_live = CrawlEngine(None, s["seeds"], s["robots"],
                             cfg=CrawlConfig(mode="wave"),
                             transport=DictTransport(idx)).run()
        assert sorted(d["url"] for d in r_live.docs.to_pylist()) == sorted(
            d["url"] for d in r_sim.docs.to_pylist()), name
        assert r_live.counters == r_sim.counters, name
        for dl, ds_ in zip(
            sorted(r_live.docs.to_pylist(), key=lambda d: d["url"]),
            sorted(r_sim.docs.to_pylist(), key=lambda d: d["url"]),
        ):
            assert dl["content"] == ds_["content"]
            assert dl["content_hash"] == ds_["content_hash"]


def test_page_index_pads_optional_columns_by_name():
    """Review regression: a pages table with final_url but NO last_modified
    must not shift the final URL into the Last-Modified slot (that dropped
    redirects and fabricated spurious 304s)."""
    from raycrawl.stages import build_page_index

    pages = pa.table({
        "url": ["https://h/a"],
        "html": [b"<html><body>hello</body></html>"],
        "etag": [None],
        "content_type": ["text/html"],
        "final_url": ["https://h/a-final"],
    })
    idx = build_page_index(pages)
    html, etag, ctype, lm, final = idx["https://h/a"]
    assert lm is None
    assert final == "https://h/a-final"

    # and with only last_modified, final stays None
    pages2 = pages.drop_columns(["final_url"]).append_column(
        "last_modified", pa.array(["Mon, 01 Jan 2024 00:00:00 GMT"]))
    (_, _, _, lm2, final2) = build_page_index(pages2)["https://h/a"]
    assert lm2 == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert final2 is None


def test_robots_fetcher_falls_back_to_http_scheme():
    """Review regression: an http-only host (no https service) must still
    get its robots.txt fetched — the reference builds the robots URL from
    the site's own scheme (crawler.py:411-428)."""
    from raycrawl.robots import make_robots_fetcher

    body = b"User-agent: *\nDisallow: /private/\n"

    def transport(url, headers, timeout):
        if url == "http://only.example.org/robots.txt":
            return FetchResponse(200, {}, body)
        raise OSError("connection refused")  # https not served

    # no scheme hint: https tried first, http fallback succeeds
    f = make_robots_fetcher(transport)
    assert f("only.example.org") == body.decode()
    # scheme hint avoids the failed https attempt
    calls = []

    def transport2(url, headers, timeout):
        calls.append(url)
        return FetchResponse(200, {}, body)

    f2 = make_robots_fetcher(transport2,
                             scheme_by_host={"only.example.org": "http"})
    assert f2("only.example.org") == body.decode()
    assert calls == ["http://only.example.org/robots.txt"]


class JitterTransport(DictTransport):
    """DictTransport + seeded randomized per-request latency — the
    variance a real network injects. Each worker's copy seeds its own rng
    from the url hash so sleeps are deterministic per url yet spread over
    [0, 20] ms."""

    def __call__(self, url, headers, timeout):
        import random
        import time
        import zlib

        time.sleep(random.Random(zlib.crc32(url.encode())).uniform(0, 0.02))
        return super().__call__(url, headers, timeout)


def test_latency_jitter_keeps_politeness_floors_and_no_starvation(ray_session):
    """r5 (VERDICT r4 #6): with randomized per-request transport latency,
    the wave scheduler must still (a) honor every host's crawl-delay
    floor on the grant clock, (b) crawl the slow host to completion (no
    starvation by the fast host), and (c) produce the same document set
    and counters as the zero-latency run."""
    import collections

    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    from raycrawl.fixtures import scenario
    from raycrawl.pipeline import CrawlConfig, CrawlEngine
    from raycrawl.stages import build_page_index

    s = scenario("politeness")
    idx = build_page_index(s["pages"])
    r_flat = CrawlEngine(None, s["seeds"], s["robots"],
                         cfg=CrawlConfig(mode="wave"),
                         transport=DictTransport(idx)).run()
    r_jit = CrawlEngine(None, s["seeds"], s["robots"],
                        cfg=CrawlConfig(mode="wave"),
                        transport=JitterTransport(idx)).run()
    # (c) same coverage — jitter changes timing, never the crawl
    assert sorted(d["url"] for d in r_jit.docs.to_pylist()) == sorted(
        d["url"] for d in r_flat.docs.to_pylist())
    assert r_jit.counters == r_flat.counters
    # (a)+(b) delay floors on the grant clock, both hosts fully served
    by_host = collections.defaultdict(list)
    for v in r_jit.visits.to_pylist():
        by_host[v["host"]].append(v["grant_ts"])
    expect = {"fasthost.example.org": 1.0, "slowhost.example.org": 4.0}
    for host, delay in expect.items():
        ts = sorted(by_host[host])
        assert len(ts) == 6, host  # the slow host is never starved
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert min(gaps) >= delay - 1e-9, (host, gaps)
