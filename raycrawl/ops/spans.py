"""Shared-fingerprint duplicate spans (winnowing-style, exactly gateable).

``ops/textstats.fingerprint_batch`` is the classic crc32 winnowing sketch —
fast, but not restatable in ANSI SQL (DuckDB has no crc32), so it can only
be checked rows-only.  This module is the oracle-gated member of the
fingerprinting family: a *radius local-min* selection scheme over md5 gram
hashes whose every step an SQL oracle can replay bit-exactly, feeding the
pair stage near-dup pipelines actually want (which documents share how many
fingerprinted spans).

Scheme (both sides identical):

    tokens   = text.split(' ')                  (the corpus-wide convention)
    gram_i   = ' '.join(tokens[i : i + g])      for i in 0..n_tokens-g
    h_i      = int(md5(gram_i)[:8], 16)         (the sampler's h32)
    select i iff h_i == min(h_{i-(w-1)} .. h_{i+(w-1)})   (radius local-min;
             every (2w-1)-gram run contains ≥1 selected position — the
             winnowing guarantee, symmetric variant)
    fingerprints(doc) = DISTINCT selected h
    pairs: for every h shared by 2..max_bucket docs, emit all doc pairs;
    output (a, b, n_shared) — the number of distinct shared fingerprints.

Scale shape: fingerprint extraction is an embarrassingly parallel
``map_batches`` (text never leaves it — only (doc_id, h) int64 rows move);
the bucket stage is one hash shuffle on h via ``partitioned_apply`` with the
same ``max_bucket`` degenerate-gram guard as LSH candidate generation
(``dedup.lsh_candidate_pairs``); pair weights reduce with a (a, b)-keyed
Sum — fixed-width rows end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

GRAM_TOKENS = 5
RADIUS = 4           # selection radius w: window is ±(w-1) positions
MAX_BUCKET = 1000


def fingerprint_rows(text: str, g: int = GRAM_TOKENS,
                     w: int = RADIUS) -> np.ndarray:
    """Distinct selected gram hashes of one document (sorted int64)."""
    toks = (text or "").split(" ")
    n = len(toks) - g + 1
    if n <= 0:
        return np.empty(0, np.int64)
    h = np.empty(n, np.int64)
    for i in range(n):
        gram = " ".join(toks[i:i + g])
        h[i] = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
    if n == 1:
        return np.unique(h)
    # sliding-window min over radius w-1 via two passes of running minima
    # (numpy stride trick): min(h[max(0,i-r) .. min(n-1,i+r)])
    r = w - 1
    pad = np.full(r, np.iinfo(np.int64).max)
    hp = np.concatenate([pad, h, pad])
    win = np.lib.stride_tricks.sliding_window_view(hp, 2 * r + 1)
    sel = h == win.min(axis=1)
    return np.unique(h[sel])


def fingerprint_batch_sql(batch: pa.Table, *, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """(doc_id, h) — one row per distinct selected fingerprint per doc."""
    ids_out: list[int] = []
    hs_out: list[np.ndarray] = []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        hs = fingerprint_rows(t)
        ids_out.extend([i] * len(hs))
        hs_out.append(hs)
    h_all = (np.concatenate(hs_out) if hs_out else np.empty(0, np.int64))
    return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                     "h": pa.array(h_all, pa.int64())})


def shared_span_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      max_bucket: int = MAX_BUCKET,
                      n_parts: int | None = None):
    """Doc pairs weighted by the number of shared fingerprints:
    ``(a, b, n_shared)``, a < b.  Fingerprint hashes shared by more than
    ``max_bucket`` docs are dropped (degenerate boilerplate gram — the
    same skew guard as LSH candidate generation); the oracle applies the
    identical HAVING bound."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .grouping import partitioned_apply, resolve_parts

    fps = ds.map_batches(
        lambda b: fingerprint_batch_sql(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow")

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in pdf.groupby("h", sort=False):
            ids = np.unique(grp["doc_id"].to_numpy())
            n = len(ids)
            if n < 2 or n > max_bucket:
                continue
            iu, ju = np.triu_indices(n, 1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
        if not a_out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        # pre-aggregate per partition: identical (a, b) pairs from different
        # hashes in this partition collapse before the pair shuffle
        df = pd.DataFrame({"a": a, "b": b})
        g = df.groupby(["a", "b"], sort=False).size().reset_index(name="n")
        return g.astype({"a": "int64", "b": "int64", "n": "int64"})

    partial = partitioned_apply(fps, ["h"], bucket_pairs,
                                resolve_parts(n_parts))
    out = partial.groupby(["a", "b"]).aggregate(Sum("n", alias_name="n_shared"))
    return out.map_batches(
        lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                            "b": t["b"].cast(pa.int64()),
                            "n_shared": t["n_shared"].cast(pa.int64())}),
        batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
