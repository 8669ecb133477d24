"""raycrawl — a Ray-Data-native URL-frontier crawl + data-processing engine.

From-scratch reimplementation of the *semantics* of the reference crawler
(laurentftech/MeilisearchCrawler, studied read-only at /root/reference) on an
idiomatic Ray Data execution model:

- pages live in Parquet tables of Common-Crawl-style rows
  ``(url, warc_ts, html, text, lang)``;
- the frontier is a Dataset scheduled per-epoch via groupby(host)/sort shuffles;
- the URL-seen set is a sharded actor pool (exact dict at test scale, cuckoo
  filter at design scale);
- politeness is per-host token buckets with robots.txt verdicts;
- fetch + HTML→text extraction run as ``map_batches`` over zero-copy Arrow
  batches;
- the Meilisearch sink is replaced by a partitioned Parquet document table.

See SURVEY.md for the full operator inventory and file:line citations into the
reference.
"""

__version__ = "0.1.0"

# Ray workers must be able to import this package. When the driver imports
# raycrawl BEFORE calling ray.init (the normal library contract), exporting
# the repo root on PYTHONPATH here makes every spawned worker inherit it —
# no matter what the driver's cwd is. (Workers resolve module-level classes
# and closures by import, not by value.)
import os as _os

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + (_os.pathsep + _pp if _pp else "")
    )
del _os, _pp, _repo_root
