"""Exact distributed per-group quantiles: sort + rank-locate.

Approximate sketches (t-digest, GK) are the usual scale answer, but exact
quantiles are what an SLA report or a dedup-threshold calibration actually
wants, and they ARE computable at 100 TB without materializing a group
anywhere: one distributed range-partitioned ``sort`` on ``(key, value)``
does the heavy lifting, and everything after touches only metadata.

    1. ``ds.sort([key, value])``      — the only shuffle
    2. per-block run-length counts    — one tiny task per block, returns
                                        O(keys-in-block) tuples, not rows
    3. driver rank arithmetic         — O(blocks × keys) integers: locate
                                        rank ``ceil(p·n_k)`` (1-based, the
                                        ``quantile_disc`` convention) in a
                                        (block, local-row) coordinate
    4. targeted row picks             — one task per *touched* block
                                        fetching O(keys × len(ps)) scalars

No stage holds more than a block; the driver never sees row data beyond
the final ``keys × ps`` scalars. Skew note: a hot key spans many sorted
blocks (range partitioning splits groups by value), so there is no
one-partition-per-group hotspot — unlike ``groupby().map_groups``.

The returned quantile is an element of the input (discrete quantile), so
results are bit-identical to the DuckDB ``quantile_disc`` oracle — no
float synthesis is involved.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote
def _block_runs(tbl: pa.Table, key_col: str) -> tuple[list, np.ndarray]:
    """Run-length encode the (sorted) key column of one block: ordered
    (keys, counts). O(rows) compute, O(distinct keys) return payload."""
    if tbl.num_rows == 0:
        return [], np.empty(0, dtype=np.int64)
    arr = np.asarray(tbl[key_col].to_pylist(), dtype=object)
    change = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(arr)]))
    return arr[starts].tolist(), (ends - starts).astype(np.int64)


@ray.remote
def _pick_rows(tbl: pa.Table, val_col: str, picks: list) -> list:
    """Fetch ``[(local_idx, slot), ...]`` values from one block."""
    col = tbl[val_col]
    return [(slot, col[idx].as_py()) for idx, slot in picks]


def group_quantiles(ds, key_col: str, val_col: str,
                    ps: dict[str, float]) -> pa.Table:
    """Exact per-``key_col`` quantiles of ``val_col`` at each probability in
    ``ps`` (``{out_column_name: p}``). Returns one row per key.

    Rank convention: the ``ceil(p * n)``-th smallest element (1-based) —
    matches DuckDB/Postgres ``quantile_disc`` / ``percentile_disc``.
    """
    # null VALUES are skipped (quantiles over present values only) and
    # null KEYS are dropped wholesale: Ray's sort map stage raises
    # comparing None against the key type, so a null-key group cannot
    # be range-partitioned at all — callers wanting it must coalesce
    # the key upstream
    ds = ds.select_columns([key_col, val_col]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b[val_col]),
                                   pc.is_valid(b[key_col]))),
        batch_format="pyarrow"
    )
    from .grouping import sorted_block_refs

    # sort-order recovery: equal-first-key block ties are harmless here
    # (a rank landing in a run of equal values picks that value either way)
    refs, _counts = sorted_block_refs(
        ds.sort([key_col, val_col]), [key_col, val_col])

    run_refs = [_block_runs.remote(r, key_col) for r in refs]
    runs = ray.get(run_refs)

    totals: dict = {}
    for keys, counts in runs:
        for k, c in zip(keys, counts):
            totals[k] = totals.get(k, 0) + int(c)

    # (key, slot) -> 1-based target rank within the key's sorted values
    targets: dict = {}
    for name, p in ps.items():
        for k, n in totals.items():
            targets[(k, name)] = max(1, int(np.ceil(p * n)))

    # walk blocks once, mapping each target rank to (block, local row)
    picks_by_block: dict[int, list] = {}
    cum: dict = {}
    for bi, (keys, counts) in enumerate(runs):
        pos = 0
        for k, c in zip(keys, counts):
            c = int(c)
            seen = cum.get(k, 0)
            for name in ps:
                r = targets[(k, name)]
                if seen < r <= seen + c:
                    picks_by_block.setdefault(bi, []).append(
                        (pos + (r - seen - 1), (k, name))
                    )
            cum[k] = seen + c
            pos += c

    fetched = ray.get([
        _pick_rows.remote(refs[bi], val_col, picks)
        for bi, picks in picks_by_block.items()
    ])
    values = {slot: v for part in fetched for slot, v in part}

    out_keys = sorted(totals)
    cols: dict = {key_col: pa.array(out_keys)}
    for name in ps:
        cols[name] = pa.array([values[(k, name)] for k in out_keys],
                              pa.float64())
    return pa.table(cols)


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
