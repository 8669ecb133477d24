"""CLI (`python -m raycrawl`) + wall-clock crawl budget
(ref MAX_CRAWL_DURATION=1800, crawler.py:108, 1138-1141)."""

import json
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycrawl.cli import load_sites, main  # noqa: E402
from raycrawl.fixtures import scenario  # noqa: E402
from raycrawl.pipeline import CrawlConfig, CrawlEngine  # noqa: E402


def test_load_sites_yaml(tmp_path):
    y = tmp_path / "sites.yml"
    y.write_text(
        """
sites:
    - name: demo
      crawl: https://demo.example.org/start
      depth: 2
      max_pages: 50
      delay: 0.25
      exclude: ["/contact"]
      no_index: ["/sitemap"]
    - name: wiki
      crawl: https://wiki.example.org/wiki/Main
      type: mediawiki
"""
    )
    sites, skipped = load_sites(str(y))
    assert len(sites) == 1 and sites[0].name == "demo"
    assert sites[0].depth == 2 and sites[0].max_pages == 50
    assert sites[0].delay == 0.25 and sites[0].exclude == ["/contact"]
    assert skipped == [("wiki", "mediawiki")]


def test_cli_crawl_writes_sink_and_stats(ray_session, tmp_path, capsys):
    out_dir = tmp_path / "out"
    stats = tmp_path / "stats.json"
    rc = main(["--sf-dir", "/root/testdata/sf0.001",
               "--out-dir", str(out_dir),
               "--stats-json", str(stats), "--quiet"])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["pages_visited"] == 500
    assert summary["pages_indexed"] == 499
    # distributed sink on disk
    docs = 0
    for root, _, files in os.walk(out_dir):
        for f in files:
            if root.endswith("documents") and f.endswith(".parquet"):
                docs += pq.read_table(os.path.join(root, f)).num_rows
    assert docs == 499
    counters = json.loads(stats.read_text())
    assert sum(c["pages_indexed"] for c in counters.values()) == 499


def test_wall_clock_budget_checkpoint_resume(ray_session, tmp_path):
    """max_duration_s=0 stops before the first wave; the checkpoint +
    remainder stay resumable and the resumed crawl equals an uninterrupted
    one (ref duration stop keeps the heap for resume, crawler.py:1155,
    1222-1224)."""
    s = scenario("tree")
    ckpt = str(tmp_path / "ckpt")
    r_cut = CrawlEngine(s["pages"], s["seeds"], s["robots"],
                        cfg=CrawlConfig(mode="wave", max_duration_s=0.0,
                                        checkpoint_dir=ckpt)).run()
    assert r_cut.docs.num_rows == 0
    assert r_cut.frontier_remainder.num_rows >= 1  # seeds survive
    r_res = CrawlEngine(s["pages"], s["seeds"], s["robots"],
                        cfg=CrawlConfig(mode="wave",
                                        checkpoint_dir=ckpt)).run(
        resume_from=ckpt)
    r_full = CrawlEngine(s["pages"], s["seeds"], s["robots"],
                         cfg=CrawlConfig(mode="wave")).run()
    assert sorted(d["url"] for d in r_res.docs.to_pylist()) == sorted(
        d["url"] for d in r_full.docs.to_pylist())
    assert r_res.counters == r_full.counters


def test_cli_force_recrawl_reindexes_and_ignores_resume(
        ray_session, tmp_path, capsys):
    """--force flag plumbing, reference parity (crawler.py:1102, 1351):
    --resume is overridden with a warning — the crawl restarts from seeds
    and still indexes everything. (The cache-bypass semantics of
    cfg.force itself are pinned by test_strict_force_recrawl_ignores_cache
    in test_engine.py.)"""
    ckpt = tmp_path / "ckpt"
    args = ["--sf-dir", "/root/testdata/sf0.001",
            "--checkpoint-dir", str(ckpt), "--quiet"]

    rc = main(args)
    assert rc == 0
    first = json.loads([l for l in capsys.readouterr().out.splitlines()
                        if l.startswith("{")][-1])
    assert first["pages_indexed"] == 499

    # force + resume: resume is ignored (fresh crawl from seeds), cache
    # bypassed — everything re-indexes instead of 0 skips-as-unchanged
    rc = main(args + ["--force", "--resume"])
    assert rc == 0
    err_out = capsys.readouterr()
    forced = json.loads([l for l in err_out.out.splitlines()
                         if l.startswith("{")][-1])
    assert "--force ignores --resume" in err_out.err
    assert forced["pages_visited"] == 500
    assert forced["pages_indexed"] == 499


def test_cli_site_filter_and_embeddings(ray_session, tmp_path, capsys):
    """--site restricts the crawl to one named site (reference
    crawler.py:1457-1460, error when unknown); --embeddings attaches the
    embedding columns to sink documents (reference --embeddings)."""
    out_dir = tmp_path / "out"
    rc = main(["--sf-dir", "/root/testdata/sf0.001",
               "--site", "SRC1",          # case-insensitive, like the ref
               "--embeddings",
               "--out-dir", str(out_dir), "--quiet"])
    assert rc == 0
    summary = json.loads([l for l in capsys.readouterr().out.splitlines()
                          if l.startswith("{")][-1])
    assert summary["sites"] == 1
    assert 0 < summary["pages_visited"] < 500
    found = 0
    for root, _, files in os.walk(out_dir):
        for f in files:
            if root.endswith("documents") and f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f))
                assert "embedding" in t.column_names
                assert "embed_ok" in t.column_names
                found += t.num_rows
    assert found == summary["pages_indexed"] > 0

    with pytest.raises(SystemExit):
        main(["--sf-dir", "/root/testdata/sf0.001", "--site", "nope",
              "--quiet"])


def test_cli_stats_only_reads_checkpoint_cache(ray_session, tmp_path,
                                               capsys):
    """--stats-only parity with the reference's show_cache_stats
    (crawler.py:1365-1384): totals, per-site breakdown and oldest/newest
    crawl timestamps from the latest checkpoint's seen-shard cache — no
    crawl runs."""
    ckpt = tmp_path / "ckpt"
    rc = main(["--sf-dir", "/root/testdata/sf0.001",
               "--checkpoint-dir", str(ckpt), "--quiet"])
    assert rc == 0
    capsys.readouterr()

    rc = main(["--stats-only", "--checkpoint-dir", str(ckpt)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    # 499, not 500: the <50-char stub is never indexed, so it gets no
    # cache record — same as the reference, which update_cache()s only
    # indexed pages
    assert stats["total_urls"] == 499
    assert sum(stats["sites"].values()) == 499
    assert len(stats["sites"]) == 20
    assert stats["oldest_crawl"] <= stats["newest_crawl"]

    with pytest.raises(SystemExit):
        main(["--stats-only"])  # requires --checkpoint-dir
