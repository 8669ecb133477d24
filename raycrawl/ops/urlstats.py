"""URL pattern mining: crawl-trap detection over the frontier/seen set.

Calendar pages, session ids, paginated archives and faceted search are
the classic crawler traps (the reference defends with per-site
``max_pages``/`exclude` substrings, crawler.py:112-119, 1152-1154; a
corpus engine wants the measurement too): collapse every digit run in
the URL to ``N`` and count URLs per (host, pattern) — a pattern whose
count explodes relative to its host's page count is a trap candidate,
and the output feeds exclusion rules for the next crawl.

Scale shape: the pattern fold is a vectorized regex inside
``map_batches``; per-batch pandas groupby partials pre-aggregate (one
row per distinct (host, pattern) per batch — never one per URL); a
fixed-width groupby reduces globally; the final top-``n`` sorts only
(host, pattern) aggregate rows.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

_DIGITS = re.compile(r"[0-9]+")


def host_of(url: str) -> str:
    """scheme://HOST/... — no urlparse dependency in the hot loop."""
    try:
        return url.split("/", 3)[2]
    except IndexError:
        return ""


def url_pattern_stats(urls_ds, *, url_col: str = "url", top_n: int = 50):
    """Top-``top_n`` (host, pattern) groups by URL count, with the
    lexicographically-min member URL as the deterministic example.
    Pattern = the URL with every digit run collapsed to ``N`` (the same
    fold DuckDB's ``regexp_replace(url, '[0-9]+', 'N', 'g')`` applies).
    Order: (n_urls desc, host asc, pattern asc); ``rnk`` is 1-based."""
    from ray.data.aggregate import Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        df = pd.DataFrame({
            "host": [host_of(u or "") for u in urls],
            "pattern": [_DIGITS.sub("N", u or "") for u in urls],
            "url": urls,
            "cnt": 1,
        })
        g = df.groupby(["host", "pattern"], as_index=False).agg(
            cnt=("cnt", "sum"), example_url=("url", "min"))
        return pa.table({
            "host": pa.array(g["host"], pa.string()),
            "pattern": pa.array(g["pattern"], pa.string()),
            "cnt": pa.array(g["cnt"].astype("int64")),
            "example_url": pa.array(g["example_url"], pa.string()),
        })

    agg = (urls_ds.map_batches(partials, batch_format="pyarrow")
           .groupby(["host", "pattern"])
           .aggregate(Sum("cnt", alias_name="n_urls"),
                      Min("example_url", alias_name="example_url")))

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n_urls", "host", "pattern"],
                            ascending=[False, True, True],
                            kind="stable").head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    rows = (agg.map_batches(local_top, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: (-r["n_urls"], r["host"], r["pattern"]))
    out = rows[:top_n]
    return pa.table({
        "host": pa.array([r["host"] for r in out], pa.string()),
        "pattern": pa.array([r["pattern"] for r in out], pa.string()),
        "n_urls": pa.array([r["n_urls"] for r in out], pa.int64()),
        "example_url": pa.array([r["example_url"] for r in out],
                                pa.string()),
        "rnk": pa.array(range(1, len(out) + 1), pa.int64()),
    })


def sitemap_coverage(crawled_ds, sitemap_ds, *, url_col: str = "url",
                     n_parts: int | None = None):
    """Crawl-vs-sitemap coverage report: one FULL OUTER partitioned hash
    join on the (caller-normalized) URL, classified in-block:

    - ``covered``  — in both: the sitemap URL was crawled;
    - ``missed``   — sitemap only: declared by the site but never
      crawled (robots-blocked, over-depth, queue-capped, or orphaned) —
      the recrawl scheduler's gap list;
    - ``organic``  — crawled only: discovered via links but absent from
      sitemaps — the site's own discovery gap.

    Scale shape: each side projects to (url, marker-int) in-block before
    the ONE url-keyed exchange; at 10^10 URLs nothing else moves.
    Contract: both sides carry caller-normalized, DEDUPED URLs (the
    crawl's seen set and a sitemap's URL set are both unique by
    construction) — a duplicated URL on either side multiplies its join
    rows. Returns (url, status)."""
    import pyarrow.compute as pc

    from .grouping import resolve_parts

    n_parts = resolve_parts(n_parts)

    def mark(col_name):
        def fn(batch: pa.Table) -> pa.Table:
            urls = batch[url_col]
            return pa.table({
                "url": urls.cast(pa.string()) if not isinstance(
                    urls, pa.ChunkedArray) else urls.cast(pa.string()),
                col_name: pa.array([1] * batch.num_rows, pa.int64())})
        return fn

    c = crawled_ds.map_batches(mark("is_crawled"), batch_format="pyarrow")
    s = sitemap_ds.map_batches(mark("in_sitemap"), batch_format="pyarrow")
    j = c.join(s, join_type="full_outer", num_partitions=n_parts,
               on=("url",))

    def classify(batch: pa.Table) -> pa.Table:
        cr = pc.is_valid(batch["is_crawled"])
        sm = pc.is_valid(batch["in_sitemap"])
        status = pc.if_else(
            pc.and_(cr, sm), "covered",
            pc.if_else(sm, "missed", "organic"))
        return pa.table({"url": batch["url"], "status": status})

    return j.map_batches(classify, batch_format="pyarrow")


def url_quality_filter(ds, *, blocked_domains, kw_weights: dict[str, int],
                       threshold: int = 3, url_col: str = "url",
                       id_col: str = "doc_id"):
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1): drop a
    document when its registered domain is on a blocklist OR its URL's
    keyword score reaches ``threshold``. Score = Σ weight over the (tiny,
    fixed) keyword list's substring matches against the lowercased URL —
    the paper's "soft" URL rules; the domain blocklist is the "strict"
    rule (their adult/fraud 4.6 M-domain list).

    Scale shape: stateless shuffle-free ``map_batches``; every kernel is
    an Arrow compute call (``match_substring`` / ``extract_regex`` /
    ``is_in``) — no per-row Python. The blocklist is broadcast ONCE via
    ``ray.put`` (read per actor/task from plasma, never re-shipped per
    batch); at an O(10⁷)-domain list that is ~10²  MB per node — past
    that, swap the membership test for a hash-partitioned anti-join on
    host (the `postings_merge` discipline).

    Output: (id, url, host, kw_score, keep 0/1) — keep=1 means the doc
    survives.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    block_ref = ray.put(pa.array(sorted(set(blocked_domains)), pa.string()))
    kws = sorted(kw_weights.items())  # deterministic score order

    def score_batch(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].combine_chunks() if isinstance(
            batch[url_col], pa.ChunkedArray) else batch[url_col]
        low = pc.utf8_lower(pc.fill_null(urls, ""))  # null url scores 0
        host = pc.utf8_lower(pc.fill_null(pc.struct_field(
            pc.extract_regex(urls, r"://(?P<host>[^/]+)"), "host"), ""))
        score = np.zeros(batch.num_rows, dtype=np.int64)
        for kw, w in kws:
            hit = pc.match_substring(low, kw)
            score += hit.to_numpy(zero_copy_only=False).astype(np.int64) * w
        blocked = pc.is_in(host, value_set=ray.get(block_ref))
        keep = (~blocked.to_numpy(zero_copy_only=False)) & (score < threshold)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "url": urls,
            "host": host,
            "kw_score": pa.array(score, pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score_batch, batch_format="pyarrow")


_SOFT404_TITLE = (r"(?i)(not found|404|error|does not exist|"
                  r"page unavailable)")
_SOFT404_BODY = (r"(?i)(page you requested|no longer available|"
                 r"could not be found|nothing here)")


def soft404_batch(batch: pa.Table, *, id_col: str = "doc_id",
                  title_col: str = "title", text_col: str = "text",
                  min_chars: int = 80) -> pa.Table:
    """Soft-404 detection: pages that return HTTP 200 but are really
    error/placeholder pages (the classic index polluter — Bar-Yossef et
    al. WWW'04 measure them at ~29 % of dead links; the reference indexes
    whatever passes its length gate, crawler.py:633-640, so a corpus
    engine needs the post-hoc detector). Three integer flags:

    - ``f_title``: error-pattern match on the title,
    - ``f_body``: apology-pattern match on the body,
    - ``f_thin``: body shorter than ``min_chars`` chars,

    score = 2·f_title + f_body + f_thin; ``soft404`` = score ≥ 2 (a title
    hit alone convicts; body/thin need corroboration).

    Scale shape: stateless shuffle-free ``map_batches``; both pattern
    tests are Arrow RE2 kernels (``match_substring_regex``) — the same
    regex engine DuckDB's ``regexp_matches`` runs, so the oracle replays
    the flags exactly. No per-row Python anywhere."""
    import numpy as np
    import pyarrow.compute as pc

    titles = pc.fill_null(batch[title_col], "")
    texts = pc.fill_null(batch[text_col], "")
    f_title = pc.match_substring_regex(titles, _SOFT404_TITLE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    f_body = pc.match_substring_regex(texts, _SOFT404_BODY).to_numpy(
        zero_copy_only=False).astype(np.int64)
    f_thin = pc.less(pc.utf8_length(texts), min_chars).to_numpy(
        zero_copy_only=False).astype(np.int64)
    score = 2 * f_title + f_body + f_thin
    return pa.table({
        id_col: batch[id_col].cast(pa.int64()),
        "f_title": pa.array(f_title, pa.int64()),
        "f_body": pa.array(f_body, pa.int64()),
        "f_thin": pa.array(f_thin, pa.int64()),
        "score": pa.array(score, pa.int64()),
        "soft404": pa.array((score >= 2).astype(np.int64), pa.int64()),
    })


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def sitemap_staleness(sitemap_ds, crawl_ds, *, url_col: str = "url",
                      lastmod_col: str = "lastmod",
                      crawled_col: str = "crawled_at",
                      n_parts: int | None = None):
    """Push-based recrawl invalidation: which crawled pages does the
    site ITSELF declare stale? A sitemap ``lastmod`` newer than the
    page's last crawl is the strongest refresh signal there is — it
    needs no content fetch and beats any modeled interval
    (``recrawl.priority``'s change-rate estimates are the pull-based
    sibling; this is the reference's ``changed_since`` sitemap filter
    (sources/sitemap.py) turned into an at-rest corpus diff).

    Date contract: both columns must carry NORMALIZED ISO-8601 strings
    of the SAME granularity in the SAME (or no) timezone — then
    lexicographic compare is exact, with no timestamp parsing (the same
    contract the sitemap source's ``changed_since`` filter documents).
    Mixed granularities or raw W3C offset forms ("+09:00") must be
    normalized UPSTREAM (the sitemap source emits what the site wrote);
    comparing unnormalized strings mis-classifies across offsets. An
    omitted (empty/NULL) lastmod is UNKNOWN: the entry reports
    ``stale_unknown`` (the conservative refetcher treats it like an
    etag-less server and refetches on its own schedule). Sitemap
    entries never crawled report ``never_crawled``. The crawl side is
    reduced to its LATEST crawl per url before the join, so repeat
    fetches (recrawl, window re-admission) cannot duplicate report
    rows.

    Scale shape: both sides project to (url, one date string) in-block
    before the ONE url-keyed hash join; output one row per sitemap
    entry: (url, lastmod, crawled_at, status ∈ {fresh, stale,
    stale_unknown, never_crawled})."""
    import pyarrow.compute as pc

    from .grouping import resolve_parts

    n_parts = resolve_parts(n_parts)

    def slim_sm(batch: pa.Table) -> pa.Table:
        lm = batch[lastmod_col].cast(pa.string())
        return pa.table({"url": batch[url_col].cast(pa.string()),
                         "lastmod": lm})

    def slim_cr(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch[url_col].cast(pa.string()),
                         "crawled_at": batch[crawled_col].cast(pa.string())})

    from ray.data.aggregate import Max

    from .grouping import drop_empty_blocks

    # hash aggregates pad with zero-schema empty blocks that Acero's
    # join rejects — strip them (the repo-wide drop_empty_blocks rule)
    latest = drop_empty_blocks(
        crawl_ds.map_batches(slim_cr, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Max("crawled_at", alias_name="crawled_at")),
        empty_schema=pa.schema([("url", pa.string()),
                                ("crawled_at", pa.string())]))
    j = (sitemap_ds.map_batches(slim_sm, batch_format="pyarrow")
         .join(latest, join_type="left_outer", num_partitions=n_parts,
               on=("url",)))

    def classify(batch: pa.Table) -> pa.Table:
        lm = batch["lastmod"]
        ca = batch["crawled_at"]
        never = pc.is_null(ca)
        no_lm = pc.or_(pc.is_null(lm), pc.equal(lm, ""))
        stale = pc.greater(lm, ca)          # ISO strings: lexicographic
        status = pc.if_else(
            never, "never_crawled",
            pc.if_else(no_lm, "stale_unknown",
                       pc.if_else(stale, "stale", "fresh")))
        return pa.table({
            "url": batch["url"],
            "lastmod": pc.if_else(pc.is_null(lm), "", lm),
            "crawled_at": pc.if_else(pc.is_null(ca), "", ca),
            "status": status})

    return j.map_batches(classify, batch_format="pyarrow")
