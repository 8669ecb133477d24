"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "pages_per_sec": ..., "extract_pages_per_sec": ...}

Headline = full frontier crawl of the sf-derived pages corpus (fetch-join →
extract → dedup decide → admission → parquet sink). ``--scaling`` runs the
headline in two fresh processes (8 then 32 CPUs) on the same input and
reports both throughputs + scaling efficiency (the sandbox stand-in for the
N vs 4N cluster criterion — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _cal_work(q):
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow.parquet as pq

    from raycrawl.extract import extract_document
    from raycrawl.fixtures import synthesize_pages_batch

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).select(
        ["doc_id", "text", "lang"]
    ).slice(0, 500)
    pages = synthesize_pages_batch(docs, 5000)
    htmls = [h.decode() for h in pages["html"].to_pylist()]
    urls = pages["url"].to_pylist()
    t0 = time.time()
    n = 0
    for _ in range(4):
        for h, u in zip(htmls, urls):
            extract_document(h, u)
            n += 1
    q.put(n / (time.time() - t0))


def calibrate_extract_rate(n: int) -> float:
    """Aggregate pages/s this HARDWARE can extract at concurrency n, using
    plain multiprocessing (no Ray). The sandbox host is oversubscribed and
    memory-bandwidth-bound: 32 workers only extract ~2.2x what 8 do, so raw
    8-vs-32 scaling of any extraction-shaped pipeline is hardware-capped at
    ~0.55. ``scaling_efficiency_vs_hardware`` divides the engine's measured
    speedup by this calibrated ceiling — it isolates the engine's own
    distributed overhead from host capacity (see BASELINE.md).

    Workers are SPAWNED, not forked (r5): the post-run calibration runs
    while the Ray session is still up, and forking a process that holds
    live Ray core-worker threads can deadlock the child in the inherited
    lock state — observed once as a 25-min hang of all 32 calibration
    workers. Spawn starts clean interpreters (``_cal_work`` imports
    everything itself). A join timeout + terminate guards the residual
    risk so a wedged worker can never hang the whole bench."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=_cal_work, args=(q,)) for _ in range(n)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=300)
    n_killed = 0
    for p in ps:
        if p.is_alive():
            p.terminate()
            p.join(timeout=10)
            n_killed += 1
    wall = time.time() - t0
    if n_killed:
        # a terminated worker extracted ~nothing and the wall absorbed
        # the full join timeout — the legacy total/wall formula would
        # publish an invisibly-wrong rate. Fall back to the sum of the
        # COMPLETED workers' self-reported rates (each put one float).
        rates = []
        while not q.empty():
            rates.append(q.get_nowait())
        print(f"calibrate_extract_rate: {n_killed}/{n} workers terminated "
              f"at timeout; using sum of completed-worker rates",
              file=sys.stderr)
        return round(sum(rates), 1)
    total_pages = 2000 * n
    return round(total_pages / wall, 1)


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import raycrawl  # noqa: F401  (must precede ray.init for worker env)
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as em

    cal_before = calibrate_extract_rate(num_cpus)

    # warm the OS page cache so we measure compute+shuffle, not first disk read
    pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    pq.read_table(os.path.join(sf_dir, "events.parquet"))
    n_pages = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows

    timings: dict[str, float] = {}
    runs_log: dict[str, list] = {}

    def timed(name: str, fn, reps: int = 1):
        """Time ``fn``; with reps > 1 take the min (the host's minute-scale
        ±30-40% drift otherwise lands whole-round artifacts in a bad
        window — BASELINE.md). All rep timings are kept in ``runs``."""
        best_out, best_t = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = round(time.time() - t0, 3)
            runs_log.setdefault(name, []).append(dt)
            if best_t is None or dt < best_t:
                best_out, best_t = out, dt
        timings[name] = best_t
        return best_out

    replicas = int(os.environ.get("GRAFT_REPLICAS", "1"))

    # 1. flat fetch+extract tier (SURVEY.md §7.3; the metric's sustained
    # fetched-pages/sec surface). With replicas the corpus is scaled and
    # consumption stays distributed (per-batch summaries, not row streams).
    def flat_extract():
        if replicas > 1:
            import pyarrow as pa

            from raycrawl.extract import ExtractBatch
            from raycrawl.fixtures import synthesize_page_row

            import ray.data as rd

            n_docs = n_pages

            def pages_rep(batch):
                rows = []
                for d, t, l in zip(batch["doc_id"].to_pylist(),
                                   batch["text"].to_pylist(),
                                   batch["lang"].to_pylist()):
                    base = synthesize_page_row(d, t, l, n_docs)
                    for rr in range(replicas):
                        rows.append({"url": f"https://src{d % 20}r{rr}.example.org/doc/{d}",
                                     "html": base["html"]})
                return pa.Table.from_pylist(
                    rows, schema=pa.schema([("url", pa.string()), ("html", pa.binary())])
                )

            def summarize(batch):
                return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

            ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text", "lang"])
            ds = ds.repartition(128).map_batches(pages_rep, batch_format="pyarrow")
            ds = ds.map_batches(ExtractBatch(want_links=True),
                                batch_format="pyarrow", batch_size=512)
            ds = ds.map_batches(summarize, batch_format="pyarrow")
            return sum(r["n"] for r in ds.take_all())
        ds = em.q_crawl_extract(sf_dir)
        n = 0
        for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n += b.num_rows
        return n

    headline_reps = int(os.environ.get("GRAFT_BENCH_HEADLINE_REPS", "2"))
    n_extract = timed("extract_flat", flat_extract, reps=headline_reps)

    # 2. headline: full frontier crawl (politeness-scheduled waves), ALWAYS
    # on the production/scale config — distributed Parquet sink, no driver
    # collection, atomic dedup, deferred admission — so the replicas=1 and
    # replica-scaled numbers are the same code path and comparable across
    # rounds. GRAFT_REPLICAS > 1 scales the corpus by crawling R replica
    # frontiers of the derived web (distinct hosts, shared on-demand page
    # synthesis) — the configuration the scaling criterion is measured on.
    import shutil
    import tempfile

    from raycrawl.pipeline import CrawlConfig, CrawlEngine

    scale_cfg = CrawlConfig(mode="wave", dedup_mode="atomic",
                            defer_admission=True)
    if replicas > 1:
        from raycrawl.fixtures import SyntheticPageIndex, replicated_seeds

        docs_tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text", "lang"])
        docs = {d: (t, l) for d, t, l in zip(docs_tbl["doc_id"].to_pylist(),
                                             docs_tbl["text"].to_pylist(),
                                             docs_tbl["lang"].to_pylist())}
        idx = SyntheticPageIndex(docs, len(docs))
        seeds = replicated_seeds(len(docs), replicas)
    else:
        from raycrawl.fixtures import corpus_seeds

        docs_tbl = em._docs_table(sf_dir)
        idx = em._pages_table(sf_dir)
        seeds = corpus_seeds(docs_tbl.num_rows)
    def crawl_once():
        sink_dir = tempfile.mkdtemp(prefix="raycrawl_bench_sink_")
        try:
            return CrawlEngine(idx, seeds, cfg=scale_cfg,
                               out_dir=sink_dir).run()
        finally:
            shutil.rmtree(sink_dir, ignore_errors=True)

    r = timed("crawl_full", crawl_once, reps=headline_reps)

    # 3. ops pipelines (skippable for scaling legs, where only the headline
    # crawl + extract tiers are under measurement)
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # min-of-2 for the heavy dedup pipeline too: it's the largest
        # single-run number in the artifact and the host's minute-scale
        # drift otherwise dominates it (BASELINE.md). Times the PRODUCTION
        # crc32 64-perm configuration (the r3-compatible number) — the
        # q_dedup_minhash driver query moved to the SQL-replayable md5
        # kernel in r4 (python-md5-per-shingle; an oracle kernel, not the
        # throughput path).
        import ray.data as rd

        from raycrawl.ops.dedup import minhash_dedup

        def dedup_prod():
            ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
            return minhash_dedup(ds, threshold=0.5).count()

        timed("dedup_minhash", dedup_prod, reps=headline_reps)

        # dedup at replica scale (r4, VERDICT stretch): 4x the corpus —
        # each replica id-offset with a per-replica text marker, so
        # within-replica pairs persist AND cross-replica near-dup pairs
        # appear (4x rows, ~10x pair work) — so dedup scaling regressions
        # surface like crawl ones do
        def dedup_4x():
            import pyarrow as pa

            R = 4

            def replicate(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_pylist()
                txts = batch["text"].to_pylist()
                return pa.table({
                    "doc_id": pa.array(
                        [d + rr * 1_000_000 for d in ids
                         for rr in range(R)], pa.int64()),
                    "text": pa.array(
                        [f"{t} replica-{rr}" for t in txts
                         for rr in range(R)], pa.string()),
                })

            ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"]
                                 ).map_batches(replicate,
                                               batch_format="pyarrow")
            return minhash_dedup(ds, threshold=0.5).count()

        timed("dedup_minhash_4x", dedup_4x)
        timed("embed_topk", lambda: em.q_embed_topk(sf_dir).num_rows)
        timed("token_top20", lambda: em.q_token_top20(sf_dir).count())
        timed("events_sessions", lambda: em.q_events_sessions(sf_dir).count())
        timed("tpch_pricing", lambda: em.q_tpch_pricing(sf_dir).count())
        # r4 additions: a three-fact-table partitioned join chain (Q5), a
        # global range-partitioned sort (CDX), and the bidirectional
        # iterative graph kernel (HITS)
        timed("tpch_local_supplier",
              lambda: em.q_tpch_local_supplier(sf_dir).count())
        timed("cdx_index", lambda: em.q_cdx_index(sf_dir).count())
        timed("link_hits", lambda: em.q_link_hits(sf_dir).count())
        # r5 addition: the composed incremental-maintenance DAG (diff ->
        # compact -> signature refresh -> postings merge + summary joins)
        timed("recrawl_pipeline",
              lambda: em.q_recrawl_pipeline(sf_dir).count())

    crawl_s = timings["crawl_full"]
    visited = (r.visits.num_rows if r.visits.num_rows else
               sum(c["pages_visited"] for c in r.counters.values()))
    result = {
        "metric": "crawl_pipeline_seconds_sf_corpus",
        "value": crawl_s,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages_per_sec": round(visited / crawl_s, 1) if crawl_s else None,
        # the north_rule's second throughput surface: frontier pops/s
        # (fetch grants + excluded/robots/extension skips all dequeue)
        "frontier_urls_per_sec": (
            round(sum((r.frontier_dequeued or {}).values()) / crawl_s, 1)
            if crawl_s and r.frontier_dequeued else None),
        "frontier_dequeued": (sum((r.frontier_dequeued or {}).values())
                              if r.frontier_dequeued else None),
        "extract_pages_per_sec": round(n_extract / timings["extract_flat"], 1),
        "pages": n_pages,
        "replicas": replicas,
        "crawled_pages": visited,
        "extract_pages": n_extract,
        "epochs": r.epochs,
        "hw_extract_rate": round((cal_before + calibrate_extract_rate(num_cpus)) / 2, 1),
        "hw_extract_rate_samples": [cal_before],
        "runs": runs_log,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Two N->4N windows on the same 640 k-page input, each leg a fresh
    process (min-of-GRAFT_BENCH_REPS):

    - primary 2->8 CPUs: the window where this host's OWN multiprocessing
      scaling is clean (~1 000 extract-pages/s per process through 8 procs;
      measured curve in ``mp_curve``), so a 4x hardware budget actually
      exists and the ratio measures the ENGINE's distributed overhead. This
      is the honest single-host stand-in for N->4N cluster nodes: real
      added nodes bring their own memory bandwidth, which this shared host
      cannot emulate past ~16 procs.
    - saturated 8->32 CPUs: reported alongside with its concurrently
      measured hardware bracket (the host delivers only ~2.3-2.6x over
      that range for ANY extraction workload, capping raw at ~0.6).
    """
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_REPLICAS=os.environ.get("GRAFT_REPLICAS", "128"),
                   GRAFT_BENCH_HEADLINE_ONLY="1",
                   # the scaling harness min-reduces across INTERLEAVED
                   # whole-process reps already — in-process reps would
                   # only double each leg's wall time
                   GRAFT_BENCH_HEADLINE_REPS="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # the sandbox host is oversubscribed and noisy (±30% run-to-run);
    # min-of-n isolates the engine from transient contention, and the reps
    # are INTERLEAVED across levels (2,8,32,2,8,32 …) so a slow half-hour
    # cannot depress one whole level and corrupt the ratio
    levels = [int(x) for x in
              os.environ.get("GRAFT_SCALING_LEVELS", "2,8,32").split(",")]
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    runs: dict[int, list] = {n: [] for n in levels}
    for _ in range(reps):
        for n in levels:
            runs[n].append(one(n))
    results = {n: min(rs, key=lambda r: r["value"]) for n, rs in runs.items()}
    mp_curve = {n: calibrate_extract_rate(n) for n in (2, 4, 8, 16, 32)}

    def window(lo: int, hi: int) -> dict:
        r_lo, r_hi = results[lo], results[hi]
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        cores_lo = r_lo["hw_extract_rate"]
        cores_hi = r_hi["hw_extract_rate"]
        hw_ratio = cores_hi / cores_lo if cores_lo else hi / lo
        ex_speedup = (r_lo["queries"]["extract_flat"]
                      / r_hi["queries"]["extract_flat"])
        return {
            "cpus_lo": lo,
            "cpus_hi": hi,
            "hw_extract_rate_lo": cores_lo,
            "hw_extract_rate_hi": cores_hi,
            "hardware_speedup_available": round(hw_ratio, 2),
            "sec_lo": t_lo,
            "sec_hi": t_hi,
            "pages_per_sec_lo": r_lo["pages_per_sec"],
            "pages_per_sec_hi": r_hi["pages_per_sec"],
            "crawl_speedup": round(t_lo / t_hi, 3),
            "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
            "scaling_efficiency_vs_hardware": round((t_lo / t_hi) / hw_ratio, 3),
            "extract_sec_lo": r_lo["queries"]["extract_flat"],
            "extract_sec_hi": r_hi["queries"]["extract_flat"],
            "extract_speedup": round(ex_speedup, 3),
            "extract_scaling_efficiency": round(ex_speedup / (hi / lo), 3),
            "extract_scaling_efficiency_vs_hardware": round(
                ex_speedup / hw_ratio, 3),
        }

    primary = window(levels[0], levels[1]) if len(levels) >= 2 else {}
    out = {
        "metric": "scaling_efficiency_crawl",
        "mp_curve_pages_per_sec": mp_curve,
        **primary,
    }
    if len(levels) >= 3:
        out["saturated_window"] = window(levels[1], levels[2])
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
