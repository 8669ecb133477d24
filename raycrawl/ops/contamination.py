"""Train/eval contamination check: flag train docs sharing n-grams with
the eval split.

Benchmark contamination is a standard webtext-curation gate (the GPT-3 and
PaLM papers both ship a 8-to-13-gram overlap scrub): any training document
that shares long verbatim token runs with an evaluation set inflates eval
scores and must be flagged or dropped.  Here the eval set is the corpus's
own hash-split test slice (``sampling.split_batch`` rule), so the whole
check is derivable from one table and exactly SQL-gateable.

Two passes, the broadcast-small-side discipline of
``textstats.repeated_chunk_removal``:

  1. eval grams: the test docs' distinct ``gram_tokens``-token grams,
     pre-distincted per batch, driver-collected under a ``max_eval_grams``
     guard (an eval benchmark is small BY CONSTRUCTION — thousands of
     docs; the guard raises rather than silently broadcasting a corpus),
     then ``ray.put`` ONCE;
  2. scan: every train doc counts its distinct grams that hit the
     broadcast set — an embarrassingly parallel ``map_batches``; no
     shuffle at all on the train side, which is the whole point at 100 TB
     (the alternative — a gram-keyed join — would shuffle the full
     training corpus's gram table).

Output: one row per train doc, ``(doc_id, n_eval_grams, contaminated)``,
zero rows included.
"""

from __future__ import annotations

import pyarrow as pa

GRAM_TOKENS = 8


def _doc_grams(text: str, g: int) -> set[str]:
    toks = (text or "").split(" ")
    return {" ".join(toks[i:i + g]) for i in range(len(toks) - g + 1)}


def eval_contamination(ds, *, gram_tokens: int = GRAM_TOKENS,
                       train_pct: int = 90, val_pct: int = 5,
                       max_eval_grams: int = 2_000_000,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Contamination scan of the train split against the test split's
    distinct ``gram_tokens``-token grams. ``ds`` carries (doc_id, text)."""
    import ray

    from .sampling import _h32

    test_floor = train_pct + val_pct

    def bucket_of(i) -> int:
        return _h32(str(i)) % 100

    def eval_grams(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            if bucket_of(i) >= test_floor:
                grams |= _doc_grams(t, gram_tokens)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    # distinct BEFORE the guard: per-batch partials duplicate grams shared
    # across batches, so counting raw partial rows would spuriously raise
    # for an eval set whose distinct grams fit (and pull the duplicates to
    # the driver). The groupby shuffles only the (small) eval-gram table.
    gram_rows = (ds.map_batches(eval_grams, batch_format="pyarrow")
                 .groupby("gram").count().take(max_eval_grams + 1))
    if len(gram_rows) > max_eval_grams:
        raise ValueError(
            f"eval_contamination: >{max_eval_grams} eval grams; an eval "
            "set is small by construction — raise max_eval_grams only if "
            "the broadcast truly fits every worker's heap")
    ev_ref = ray.put(frozenset(r["gram"] for r in gram_rows))

    def scan(batch: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        ids, hits = [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            if bucket_of(i) >= train_pct:
                continue  # only the train slice is scanned
            ids.append(i)
            hits.append(len(_doc_grams(t, gram_tokens) & ev))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_eval_grams": pa.array(hits, pa.int64()),
            "contaminated": pa.array([int(h > 0) for h in hits], pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def eval_contamination_bloom(ds, *, gram_tokens: int = GRAM_TOKENS,
                             train_pct: int = 90, val_pct: int = 5,
                             m_bits: int = 1 << 18,
                             id_col: str = "doc_id",
                             text_col: str = "text"):
    """The SCALE path of ``eval_contamination``: instead of broadcasting
    the eval split's gram set (unbounded — it grows with the eval corpus),
    fold the grams into a fixed-size Bloom filter and broadcast THAT.

    k=2 probes per gram, both md5-derived (``int(md5[:8],16) % m`` and
    ``int(md5[8:16],16) % m``) so the filter is deterministic and the SQL
    oracle can simulate the exact bit set — false positives included —
    making even the approximate path exactly gateable.

    Pass 1 emits one packed ``m_bits/8``-byte register row per batch
    (32 KB at the default 2^18 bits); registers merge by bitwise OR —
    commutative/associative, so any partition or fold order yields the
    identical filter (the HLL-register discipline). Pass 2 is a
    shuffle-free ``map_batches`` scan of the train slice against the
    broadcast filter.

    Output: ``(doc_id, n_bloom_hits, contaminated)`` per train doc —
    a superset of the exact op's hits (Bloom never false-negatives)."""
    import hashlib

    import numpy as np
    import ray

    from .sampling import _h32

    test_floor = train_pct + val_pct
    words = m_bits // 64

    def bucket_of(i) -> int:
        return _h32(str(i)) % 100

    def probes(gram: str):
        h = hashlib.md5(gram.encode()).hexdigest()
        return int(h[:8], 16) % m_bits, int(h[8:16], 16) % m_bits

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            if bucket_of(i) < test_floor:
                continue
            for gram in _doc_grams(t, gram_tokens):
                for p in probes(gram):
                    bits[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(words, dtype=np.uint64)
    for row in ds.map_batches(bloom_partial,
                              batch_format="pyarrow").take_all():
        bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    bloom_ref = ray.put(bits)

    def scan(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)

        def is_set(p: int) -> bool:
            return bool(bl[p >> 6] >> np.uint64(p & 63) & np.uint64(1))

        ids, hits = [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            if bucket_of(i) >= train_pct:
                continue
            n = 0
            for gram in _doc_grams(t, gram_tokens):
                p1, p2 = probes(gram)
                if is_set(p1) and is_set(p2):
                    n += 1
            ids.append(i)
            hits.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bloom_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array([int(h > 0) for h in hits], pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
