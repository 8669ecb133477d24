"""Sanity checks for the reference-semantics oracle on scenario fixtures.

These pin the *oracle's* behavior (heap order, admission, filters, budget)
to hand-computed expectations so the engine tests rest on verified ground.
"""

from raycrawl.fixtures import scenario
from raycrawl.oracle import crawl_oracle


def _visit_urls(res, site=None):
    return [v["url"] for v in res.visits if site is None or v["site"] == site]


def test_line_depth_cutoff():
    s = scenario("line")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    base = "https://line.example.org"
    # depth 3 → p0..p3 visited, p4 (depth 4) never admitted... p4 is linked
    # FROM p3 whose depth==max_depth → links not extracted at depth 3
    assert _visit_urls(res) == [f"{base}/p{i}" for i in range(4)]
    assert len(res.docs) == 4


def test_tree_deepest_first_fifo_ties():
    s = scenario("tree")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    base = "https://tree.example.org"
    order = [v["url"].rsplit("/n", 1)[1] for v in res.visits]
    # batch1: n0 alone (heap has only seed). admits n1,n2 (depth1).
    # batch2: n1,n2 → admits n3,n4 (from n1), n5,n6 (from n2) at depth2.
    # batch3: pops two deepest-FIFO: n3,n4 → admits n7..n10 (depth3)
    # batch4: n7,n8 (depth3 before depth2 n5,n6) ... deepest-first
    assert order[:5] == ["0", "1", "2", "3", "4"]
    # all depth-3 leaves (7..14) visited before remaining depth-2 nodes? No:
    # n5,n6 at depth2 admitted before n7.. exist at depth3 → heap pops depth3 first.
    # After n3,n4 visited: heap has n5,n6 (d2), n7..n10 (d3) → pops n7,n8.
    assert order[5:7] == ["7", "8"]
    # processing n7,n8 (leaves, depth3 < max_depth 5, no children) → next pops n9,n10
    assert order[7:9] == ["9", "10"]
    # then back to depth2: n5,n6 → admit n11..n14
    assert order[9:11] == ["5", "6"]
    assert order[11:] == ["11", "12", "13", "14"]
    assert len(res.visits) == 15


def test_cycle_no_revisit():
    s = scenario("cycle")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    urls = _visit_urls(res)
    assert len(urls) == len(set(urls)) == 3


def test_dup_content_first_wins():
    s = scenario("dup_content")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    # root + 3 copies visited; only root + first copy indexed
    assert len(res.visits) == 4
    indexed = [d["url"] for d in res.docs]
    assert indexed == [
        "https://dup.example.org/root",
        "https://dup.example.org/copy1",
    ]
    nid = [v for v in res.visits if v["event"] == "not_indexed"]
    assert len(nid) == 2


def test_filters_scenario():
    s = scenario("filters")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    urls = _visit_urls(res)
    base = "https://filters.example.org"
    assert f"{base}/ok1" in urls
    assert f"{base}/ok2" in urls           # reached through no_index page
    assert f"{base}/noidx/page" in urls    # visited
    assert f"{base}/private/x" not in urls  # robots
    assert f"{base}/login/form" not in urls
    assert f"{base}/custom-skip/z" not in urls
    assert f"{base}/banner.PNG" not in urls
    assert "https://other.example.org/far" not in urls
    indexed = {d["url"] for d in res.docs}
    assert f"{base}/noidx/page" not in indexed  # no_index: crawled not indexed
    reasons = {(k["url"], k["reason"]) for k in res.skips}
    assert (f"{base}/login/form", "excluded") in reasons
    assert (f"{base}/custom-skip/z", "excluded") in reasons
    assert (f"{base}/banner.png".replace("banner.png", "banner.PNG"), "extension") in reasons
    assert (f"{base}/private/x", "robots") in reasons
    # extension-skipped URLs are marked visited (crawler.py:1171-1172)
    assert f"{base}/banner.PNG" in res.visited["filters"]
    assert f"{base}/private/x" not in res.visited["filters"]


def test_budget_max_pages_with_inflight_accounting():
    s = scenario("budget")
    res = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    c = res.counters["budget"]
    assert c["pages_visited"] == 8  # max_pages=8 incl. in-flight check
    # remainder saved for resume: 23 unvisited children + the footer link
    # (exclusion is a POP-time rule — excluded URLs are admitted to the heap
    # and show up in the resume set, crawler.py:1169 vs 1205)
    assert len(res.resume["budget"]) == 24
    assert len(res.docs) == 8


def test_fetch_error_counts_and_marks_visited():
    s = scenario("line")
    pages = s["pages"].to_pylist()
    pages_idx = {p["url"]: p for p in pages if not p["url"].endswith("/p2")}
    res = crawl_oracle(pages_idx, s["seeds"], s["robots"])
    # p2 fetch fails → error, still marked visited, chain broken (no links from p2)
    assert res.counters["line"]["errors"] == 1
    assert res.counters["line"]["pages_visited"] == 2
    assert "https://line.example.org/p2" in res.visited["line"]
    assert "https://line.example.org/p3" not in res.visited["line"]


def test_incremental_rerun_skips_unchanged():
    s = scenario("line")
    res1 = crawl_oracle(s["pages"], s["seeds"], s["robots"], now=2_000_000_000.0)
    cache = res1.final_cache
    # strip etags from cache → force the TTL/content-hash path (not 304)
    cache_nota = {u: {**c, "etag": None} for u, c in cache.items()}
    res2 = crawl_oracle(s["pages"], s["seeds"], s["robots"],
                        prior_cache=cache_nota, now=2_000_000_000.0 + 3600)
    assert res2.counters["line"]["pages_skipped_cache"] == 4
    assert len(res2.docs) == 0
    # TTL expiry → reindex
    res3 = crawl_oracle(s["pages"], s["seeds"], s["robots"],
                        prior_cache=cache_nota, now=2_000_000_000.0 + 15 * 86400)
    assert len(res3.docs) == 4


def test_incremental_304_path():
    s = scenario("line")
    res1 = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    res2 = crawl_oracle(s["pages"], s["seeds"], s["robots"],
                        prior_cache=res1.final_cache)
    # etag matches → 304 for seed; no links extracted → crawl stops at p0
    assert res2.counters["line"]["pages_not_modified"] == 1
    assert len(res2.refreshes) == 1
    assert len(res2.visits) == 1


def test_changed_content_reindexes():
    s = scenario("line")
    res1 = crawl_oracle(s["pages"], s["seeds"], s["robots"])
    idx = {p["url"]: dict(p) for p in s["pages"].to_pylist()}
    victim = "https://line.example.org/p0"
    new_html = idx[victim]["html"].decode().replace("contenu", "nouveau")
    idx[victim]["html"] = new_html.encode()
    idx[victim]["etag"] = 'W/"changed"'
    res2 = crawl_oracle(idx, s["seeds"], s["robots"], prior_cache=res1.final_cache)
    # p0 changed → reindexed and its links followed; p1 etag-match → 304,
    # and a 304 yields NO outlinks (crawler.py:1012-1016) so the chain stops
    assert [d["url"] for d in res2.docs] == [victim]
    assert res2.counters["line"]["pages_not_modified"] == 1
    assert len(res2.visits) == 2
