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

# Ray workers must be able to run this package's closures and actor classes.
# Two layers of defense, because the driver may call ray.init() before
# importing us and from any cwd:
# 1. PYTHONPATH export at import time — effective when raycrawl is imported
#    before ray.init (workers inherit the env).
# 2. ``register_by_value()`` — cloudpickle ships the package code with every
#    closure/actor class, removing the import requirement entirely. Called
#    lazily by the engine/ops entry points once all submodules are loaded.
import os as _os

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + (_os.pathsep + _pp if _pp else "")
    )
del _os, _pp, _repo_root

_BY_VALUE_REGISTERED: set = set()


def register_by_value() -> None:
    """Make all currently-imported raycrawl modules serialize by value
    (idempotent; call again after importing more submodules)."""
    import sys

    try:
        from ray import cloudpickle
    except Exception:
        return
    for name, mod in list(sys.modules.items()):
        if (
            (name == "raycrawl" or name.startswith("raycrawl."))
            and mod is not None
            and name not in _BY_VALUE_REGISTERED
        ):
            try:
                cloudpickle.register_pickle_by_value(mod)
                _BY_VALUE_REGISTERED.add(name)
            except Exception:
                pass
