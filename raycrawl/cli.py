"""Command-line entry: ``python -m raycrawl`` — the ``ray job submit``
surface of the engine (north_rule: the same job runs unchanged on N and 4N
node clusters; submit this module as the job script).

Mirrors the reference's CLI semantics (``crawler.py`` main: sites.yml in,
crawl out, resumable) with the Meilisearch sink replaced by the partitioned
Parquet document table:

    python -m raycrawl --pages pages.parquet --sites sites.yml \
        --out-dir /data/index --checkpoint-dir /data/ckpt

    python -m raycrawl --sf-dir /root/testdata/sf0.001 --out-dir /tmp/out

Ray session ownership: the CLI owns ray.init (guarded), per the driver
contract — library code never initializes Ray itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_sites(path: str):
    """sites.yml (reference config/sites.yml.example:1-44) → [SiteSpec].
    Unsupported source types (mediawiki/json API) are routed to their
    dedicated sources (raycrawl.sources.*) — the frontier CLI crawls
    ``type: web`` (default) entries."""
    from .fixtures import SiteSpec

    if path.endswith(".json"):
        with open(path) as f:
            cfg = json.load(f)
    else:
        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f)
    out = []
    skipped = []
    for s in cfg.get("sites", []):
        if s.get("type", "web") != "web":
            skipped.append((s.get("name"), s.get("type")))
            continue
        out.append(
            SiteSpec(
                name=s["name"],
                crawl=s["crawl"],
                depth=int(s.get("depth", 3)),
                max_pages=int(s.get("max_pages", 0)),
                delay=s.get("delay"),
                selector=s.get("selector"),
                exclude=list(s.get("exclude", [])),
                no_index=list(s.get("no_index", [])),
                lang_default=s.get("lang", "fr"),
            )
        )
    return out, skipped


def cache_stats(checkpoint_dir: str) -> dict:
    """Reference ``show_cache_stats`` parity (crawler.py:1365-1384,
    cache_db.get_stats): total cached URLs, per-site breakdown, oldest and
    newest crawl timestamps — computed from the LATEST checkpoint's
    seen-shard cache records (the engine's SQLite-cache analogue).
    Driver-side pickle loads over O(cache-records) small tuples: a stats
    utility, not a data path."""
    import pickle

    epochs = sorted(
        e for e in os.listdir(checkpoint_dir)
        if os.path.exists(os.path.join(checkpoint_dir, e, "manifest.json")))
    out = {"total_urls": 0, "sites": {}, "oldest_crawl": None,
           "newest_crawl": None}
    if not epochs:
        return out
    d = os.path.join(checkpoint_dir, epochs[-1])
    with open(os.path.join(d, "manifest.json")) as f:
        n_shards = json.load(f)["n_seen_shards"]
    for i in range(n_shards):
        with open(os.path.join(d, f"seen_{i}.bin"), "rb") as f:
            snap = pickle.loads(f.read())
        for rec in snap["cache"].values():
            # (content_hash, last_crawl, etag, site[, last_modified])
            out["total_urls"] += 1
            site, last = rec[3], rec[1]
            out["sites"][site] = out["sites"].get(site, 0) + 1
            if out["oldest_crawl"] is None or last < out["oldest_crawl"]:
                out["oldest_crawl"] = last
            if out["newest_crawl"] is None or last > out["newest_crawl"]:
                out["newest_crawl"] = last
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="raycrawl",
        description="Ray-Data-native URL-frontier crawler (MeilisearchCrawler "
                    "pipeline semantics over Parquet page corpora)",
    )
    src = p.add_argument_group("input")
    src.add_argument("--pages", help="Parquet table of pages "
                     "(url, warc_ts, html, text, lang | url, html, etag, ...)")
    src.add_argument("--sites", help="sites.yml / sites.json job spec")
    src.add_argument("--sf-dir", help="testdata dir: derive the corpus from "
                     "documents.parquet with synthetic seeds (demo mode)")
    out = p.add_argument_group("output")
    out.add_argument("--out-dir", help="partitioned Parquet sink "
                     "(documents/refreshes/visits per epoch)")
    out.add_argument("--checkpoint-dir", help="frontier+seen+politeness "
                     "checkpoints, one directory per epoch")
    out.add_argument("--checkpoint-keep", type=int, default=None,
                     help="retention: keep only the newest K complete "
                          "epoch checkpoints (default: keep all)")
    run = p.add_argument_group("run")
    run.add_argument("--resume", action="store_true",
                     help="resume from the latest checkpoint in "
                          "--checkpoint-dir")
    run.add_argument("--force", action="store_true",
                     help="force full re-crawl: ignore the content-hash "
                          "cache (every fetched page re-indexes) and any "
                          "--resume session, like the reference's --force "
                          "(crawler.py:1035,1102,1351)")
    run.add_argument("--site", help="crawl only the named site from "
                     "--sites (reference --site, crawler.py:1457-1460)")
    run.add_argument("--workers", type=int, default=None,
                     help="strict-mode global fetch budget (reference "
                          "--workers → CONCURRENT_REQUESTS)")
    run.add_argument("--embeddings", action="store_true",
                     help="attach embedding + embed_ok columns to indexed "
                          "documents (reference --embeddings; provider "
                          "from $RAYCRAWL_EMBED_PROVIDER, default 'fake')")
    run.add_argument("--persistent-cache", action="store_true",
                     help="never expire the content-hash cache (reference "
                          "--persistent-cache: ignore CACHE_DAYS)")
    run.add_argument("--stats-only", action="store_true",
                     help="print cache stats from the latest checkpoint in "
                          "--checkpoint-dir and exit without crawling "
                          "(reference --stats-only / show_cache_stats)")
    run.add_argument("--mode", default="wave", choices=["wave", "strict"])
    run.add_argument("--seen-mode", default="exact",
                     choices=["exact", "cuckoo"])
    run.add_argument("--dedup-mode", default="two_phase",
                     choices=["two_phase", "atomic"])
    run.add_argument("--max-duration-s", type=float, default=None,
                     help="wall-clock crawl budget (ref MAX_CRAWL_DURATION)")
    run.add_argument("--max-epochs", type=int, default=None)
    run.add_argument("--stats-json", help="write per-site counters JSON here "
                     "(ref status.json)")
    run.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    if args.stats_only:
        if not args.checkpoint_dir:
            p.error("--stats-only requires --checkpoint-dir")
        print(json.dumps(cache_stats(args.checkpoint_dir), sort_keys=True))
        return 0
    if not args.sf_dir and not args.pages:
        p.error("one of --pages or --sf-dir is required")
    if args.resume and not args.checkpoint_dir:
        # without this, resume_from silently degrades to a fresh crawl
        p.error("--resume requires --checkpoint-dir")

    import raycrawl  # noqa: F401  (register by-value before ray.init)
    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 logging_level="ERROR" if args.quiet else "WARNING")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from .pipeline import CrawlConfig, CrawlEngine

    skipped = []
    if args.sf_dir:
        from .fixtures import corpus_seeds, synthesize_pages_batch

        docs = pq.read_table(os.path.join(args.sf_dir, "documents.parquet"),
                             columns=["doc_id", "text", "lang"])
        pages = synthesize_pages_batch(docs, docs.num_rows)
        seeds = corpus_seeds(docs.num_rows)
    else:
        pages = pq.read_table(args.pages)
        if not args.sites:
            p.error("--sites is required with --pages")
        seeds, skipped = load_sites(args.sites)
    for name, typ in skipped:
        print(f"[raycrawl] skipping non-web site {name!r} (type={typ}; "
              f"use raycrawl.sources.*)", file=sys.stderr)

    if args.force and args.resume:
        # reference parity (crawler.py:1102): force wins over a saved
        # session — start from seeds, don't silently resume
        print("[raycrawl] --force ignores --resume: starting from seeds",
              file=sys.stderr)
    if args.site:
        match = [s for s in seeds if s.name.lower() == args.site.lower()]
        if not match:
            p.error(f"site {args.site!r} not found in --sites "
                    f"(have: {', '.join(s.name for s in seeds)})")
        seeds = match
    cfg_extra = {}
    if args.workers is not None:
        cfg_extra["concurrent_requests"] = args.workers
    if args.persistent_cache:
        cfg_extra["cache_days"] = float("inf")
    if args.embeddings:
        cfg_extra["embed"] = {
            "provider": os.environ.get("RAYCRAWL_EMBED_PROVIDER", "fake")}
    cfg = CrawlConfig(
        mode=args.mode,
        seen_mode=args.seen_mode,
        dedup_mode=args.dedup_mode,
        force=args.force,
        max_epochs=args.max_epochs,
        max_duration_s=args.max_duration_s,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_keep=args.checkpoint_keep,
        collect_docs=not args.out_dir,   # docs go to the sink when present
        collect_visits=False,            # counters via distributed partials
        **cfg_extra,
    )
    engine = CrawlEngine(pages, seeds, cfg=cfg, out_dir=args.out_dir)
    resume_from = (args.checkpoint_dir
                   if args.resume and not args.force else None)
    r = engine.run(resume_from=resume_from)

    visited = sum(c["pages_visited"] for c in r.counters.values())
    indexed = sum(c["pages_indexed"] for c in r.counters.values())
    print(json.dumps({"pages_visited": visited, "pages_indexed": indexed,
                      "epochs": r.epochs,
                      "frontier_remainder": r.frontier_remainder.num_rows,
                      "sites": len(r.counters)}))
    if args.stats_json:
        with open(args.stats_json, "w") as f:
            json.dump(r.counters, f, indent=1, sort_keys=True)
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via __main__
    raise SystemExit(main())
