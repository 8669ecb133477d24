"""Two-level grouped apply — the many-small-groups workaround.

``Dataset.groupby(key).map_groups(fn)`` materializes one pandas frame per
group; with thousands of tiny groups (LSH buckets, simhash chunks, pair
keys) the per-group overhead dominates by orders of magnitude. The pattern
here hash-partitions the keys into ``n_parts`` coarse groups (one DIY
two-round task hash shuffle — no sort, blocks stay in plasma) and processes
each partition with vectorized pandas. Correctness is identical: all rows
of a key land in exactly one partition (vectorized siphash of the key), so
partition functions always see complete key groups.

- ``partitioned_apply``: fn sees the whole partition (use pandas groupby /
  drop_duplicates inside — the fast C path).
- ``grouped_apply``: convenience per-key-group wrapper over it.

Both require ``fn`` to return a correctly-typed (possibly empty) DataFrame
for empty input — that is the schema contract.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray as _ray


def resolve_parts(n_parts: int | None) -> int:
    """Default shuffle/join partition count: scale with the cluster (≈1 per
    CPU, floor 8) so a 4N-node deployment gets 4N-wide exchanges while small
    sessions aren't drowned in partition overhead. NOTE: Ray's hash-shuffle
    ``Dataset.join`` schedules one aggregator per partition — asking for
    far more partitions than CPUs stalls the executor on a small cluster."""
    if n_parts is not None:
        return n_parts
    import ray

    if ray.is_initialized():
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    return 32


def multi_join_parts(n_parts: int | None = None) -> int:
    """Per-join partition width for operators that STACK several hash
    joins in one DAG (TPC-H Q5/Q7/Q8/Q10 shapes). Two measured facts pull
    in opposite directions: (a) sequential aggregator pools are
    actor-startup bound at one partition per CPU on a node (Q5: 5.7 s at
    width 8 vs 12.0 s at 32 on 32 CPUs), so the scale default is CPUs/4
    with floor 8; (b) Ray schedules one aggregator ACTOR per partition
    per join, so a multi-join plan whose total actor count exceeds the
    CPU count deadlocks the streaming executor on a small host (a
    4-join plan at width 8 hangs at num_cpus=4). Hence the small-host
    cap of CPUs/2 per join — a 4-CPU test session gets width 2, a
    256-node/8 192-CPU cluster still gets 2 048-wide exchanges."""
    if n_parts is not None:
        return n_parts
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 32)
    return max(2, min(cpus // 2, max(8, cpus // 4)))


def _part_masks(batch: pa.Table, key_cols: list[str], n_parts: int):
    """Vectorized partition assignment: per-column ``pd.util.hash_array``
    (siphash with a fixed key — stable across worker processes), columns
    mixed by odd-multiplier accumulate. Only within-call consistency
    matters (every row of a key tuple lands in one partition); the 3 M-row
    pair-unique split was a per-row Python crc32 loop before this."""
    import numpy as np

    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = batch[c].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(col, categorize=False)
        acc = acc * np.uint64(0x9E3779B1) + h
    return (acc % np.uint64(n_parts)).astype(np.int32)


@_ray.remote
def _part_split(tbl: pa.Table, key_cols: list[str], n_parts: int):
    import numpy as np

    if tbl.num_rows == 0 or tbl.num_columns == 0:
        # hash aggregates upstream can emit zero-row (even zero-column)
        # blocks; the old map_batches path skipped them implicitly
        return tuple(tbl.slice(0, 0) for _ in range(n_parts))
    parts = _part_masks(tbl, key_cols, n_parts)
    return tuple(tbl.take(np.nonzero(parts == p)[0])
                 for p in range(n_parts))


def _fan(parts: tuple):
    """num_returns=1 quirk guard: Ray treats a 1-tuple return under
    ``num_returns=1`` as ONE object (the tuple itself), so a
    single-output split must return the bare table. Shared by every
    width-parameterized split task in the repo (grid shuffle, graph
    and pagerank task rounds)."""
    return parts[0] if len(parts) == 1 else parts


def _aslists(refs, width: int):
    """Driver-side mate of ``_fan``: with width == 1 each split call
    returned ONE bare ref — wrap so callers can index ``s[p]``."""
    return [[r] for r in refs] if width == 1 else refs


@_ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


def keep_nonempty_ref_tables(refs):
    """Refs-level sibling of ``nonempty_refs``: probe row counts with a
    tiny remote, keep non-empty table refs (first ref survives as the
    schema carrier when everything is empty) — the shared epilogue of
    the static-partition task-round operators. ``_nrows`` is a
    module-level remote so it is exported to workers once, not re-defined
    (and re-pickled) on every call."""
    import ray

    counts = ray.get([_nrows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    return keep if keep else list(refs[:1])


@_ray.remote
def _grid_split2(key_cols: list[str], n_parts: int, p2_width: int,
                 *slices: pa.Table):
    """Grid-shuffle round 2: concat one CHUNK of a super-bucket's
    slices and split it by the final partition's low digit
    (hash % n_parts % p2_width). Returns ``p2_width`` sub-tables.
    Memory stays bounded by the chunk, never the super-bucket."""
    import numpy as np

    live = [s for s in slices if s.num_rows]
    if not live:
        ref = next((s for s in slices if s.num_columns), slices[0])
        return _fan(tuple(ref.slice(0, 0) for _ in range(p2_width)))
    tbl = pa.concat_tables(live, promote_options="permissive")
    parts = _part_masks(tbl, key_cols, n_parts) % np.int32(p2_width)
    return _fan(tuple(tbl.take(np.nonzero(parts == p)[0])
                      for p in range(p2_width)))


@_ray.remote
def _grid_split1(tbl: pa.Table, key_cols: list[str], n_parts: int,
                 p2_width: int):
    """Grid-shuffle round 1: split one block by the final partition's
    HIGH digit (hash % n_parts // p2_width). Returns ``ceil(n_parts /
    p2_width)`` sub-tables."""
    import numpy as np

    p1_width = -(-n_parts // p2_width)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return _fan(tuple(tbl.slice(0, 0) for _ in range(p1_width)))
    parts = _part_masks(tbl, key_cols, n_parts) // np.int32(p2_width)
    return _fan(tuple(tbl.take(np.nonzero(parts == p)[0])
                      for p in range(p1_width)))


@_ray.remote(num_returns=2)
def _part_apply(partition_fn, *slices: pa.Table):
    live = [s for s in slices if s.num_rows]
    if live:
        pdf = pa.concat_tables(live, promote_options="permissive").to_pandas()
    else:
        # schema contract: partition_fn returns a correctly-typed (possibly
        # empty) frame for empty input; prefer a slice that carries columns
        ref = next((s for s in slices if s.num_columns), slices[0])
        pdf = ref.schema.empty_table().to_pandas()
    out = pa.Table.from_pandas(partition_fn(pdf), preserve_index=False)
    return out, out.num_rows


def partitioned_apply(ds, key_cols: list[str], partition_fn,
                      n_parts: int = 32, max_fan: int = 128):
    """``partition_fn(pdf)`` runs once per partition with complete key
    groups, co-located by hash(key) % n_parts.

    The exchange is a DIY two-round task hash shuffle (the same pattern as
    the wave engine's frontier routing and pagerank): round A hash-splits
    each upstream plasma block into ``n_parts`` sub-tables
    (``num_returns`` fan-out — slices never leave plasma), round B concats
    one partition's slices and applies ``partition_fn``. This replaces the
    previous ``groupby(_part).map_groups`` execution, whose sort-based
    all-to-all dominated wall time on wide pair sets (measured 21 s → ~1 s
    on the minhash pair-unique pass over 3 M rows at sf0.1, 32 CPUs) —
    a hash exchange needs no global order, so sorting was pure overhead.

    **Grid path (blocks or n_parts > ``max_fan``)**: the flat exchange
    creates blocks × n_parts object refs and an n_parts-way apply whose
    fan-in is the WHOLE block count — at 100-TB scale (10⁵ blocks ×
    10⁴ partitions) that is 10⁹ driver-tracked refs and million-arg
    tasks. Following the hyper-dimension shuffle idea (Zhou et al.,
    VLDB 2019: factor the partition id into digits, shuffle one digit
    per round with bounded fan-in/out), the partition id factors as
    ``p = p1·P2 + p2``: round 1 splits each block by the HIGH digit
    (``P1 = ceil(n_parts / P2)`` outputs per block), round 2 concats
    each super-bucket in CHUNKS of ≤ ``max_fan`` slices and splits by
    the LOW digit, and the apply gathers ``ceil(blocks / max_fan)``
    chunk outputs. Ref count drops to O(blocks·P1 + n_parts·
    blocks/max_fan); every task's fan-in/out is ≤ max(max_fan, P1,
    blocks/max_fan). Both paths route rows by the same
    ``hash % n_parts``, so results are identical — the parity test
    forces the grid with a tiny ``max_fan``."""
    import ray
    import ray.data as rd

    refs = list(ds.to_arrow_refs())
    if not refs:
        # zero-block input (no caller constructs one today): callers expect
        # the OUTPUT schema, which only partition_fn can produce
        return rd.from_arrow(pa.Table.from_pandas(
            partition_fn(pd.DataFrame()), preserve_index=False))
    fn_ref = ray.put(partition_fn)
    if n_parts == 1:
        outs = [_part_apply.remote(fn_ref, *refs)]
    elif len(refs) <= max_fan and n_parts <= max_fan:
        slices = [
            _part_split.options(num_returns=n_parts).remote(
                r, key_cols, n_parts)
            for r in refs
        ]
        outs = [_part_apply.remote(fn_ref, *[s[p] for s in slices])
                for p in range(n_parts)]
    else:
        p2_width = min(n_parts, max_fan)
        p1_width = -(-n_parts // p2_width)
        s1 = [_grid_split1.options(num_returns=p1_width).remote(
            r, key_cols, n_parts, p2_width) for r in refs]
        if p1_width == 1:  # num_returns=1 yields a bare ref, not a list
            s1 = [[s] for s in s1]
        outs = []
        for q1 in range(p1_width):
            bucket = [s[q1] for s in s1]
            chunk_refs = []
            for i in range(0, len(bucket), max_fan):
                cr = _grid_split2.options(num_returns=p2_width).remote(
                    key_cols, n_parts, p2_width, *bucket[i:i + max_fan])
                chunk_refs.append([cr] if p2_width == 1 else cr)
            for q2 in range(p2_width):
                if q1 * p2_width + q2 >= n_parts:
                    break
                outs.append(_part_apply.remote(
                    fn_ref, *[c[q2] for c in chunk_refs]))
    # Drop empty output partitions (keep one so the output schema
    # survives): an empty block would skip downstream ``map_batches``
    # UDFs — surviving with a STALE schema past renames/projections —
    # and Acero's ``Dataset.join`` rejects schema-less blocks. The old
    # sort-groupby path only emitted realized groups; match that.
    counts = ray.get([o[1] for o in outs])
    keep = [o[0] for o, c in zip(outs, counts) if c > 0]
    if not keep:
        keep = [outs[0][0]]
    return rd.from_arrow_refs(keep)


def nonempty_refs(ds) -> tuple[list, list[int]]:
    """Execute ``ds`` and return (non-empty block refs, their row counts).

    The shared probe under ``drop_empty_blocks`` and its callers: one
    O(blocks) remote ``num_rows`` per block — the driver sees ints, rows
    never leave plasma."""
    import ray

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    kept = [(r, n) for r, n in zip(refs, counts) if n > 0]
    return [r for r, _ in kept], [n for _, n in kept]


def sorted_block_refs(sorted_ds, key_cols: list[str],
                      descending: list[bool] | bool | None = None
                      ) -> tuple[list, list[int]]:
    """Block refs of an already-``sort()``-ed Dataset in TRUE sort order,
    plus per-block row counts.

    ``to_arrow_refs()`` does NOT guarantee plan order: the streaming
    executor's default ``preserve_order=False`` lets blocks land in
    completion order, which usually — but not always — matches the sort.
    Every rank/offset/prefix finalize that zips block refs with a cumsum
    must therefore recover the order itself. After a global sort the
    blocks are disjoint key ranges, so each block's FIRST row is enough:
    fetch it per block (O(blocks) tiny tuples to the driver, rows stay in
    plasma) and order blocks under the sort comparator. Empty blocks sort
    last (their offset contribution is zero rows either way).

    ``key_cols``/``descending`` must restate the sort spec. Blocks are
    ordered by their FIRST-row key; equal first keys (a run of duplicate
    sort keys spanning a block boundary — possible when the key is not
    unique per row) tie-break on the LAST-row key: among tied blocks the
    one that ENDS earlier in sort order must come first, and when first
    AND last both tie the blocks lie entirely inside one duplicate run,
    so their mutual order cannot affect any rank/offset computation.
    NULL keys compare as largest (Arrow's default at-end placement,
    which Ray's sort inherits).

    Zero-row blocks are DROPPED: a wide sort pads its output with empty
    zero-SCHEMA blocks (no columns at all), which would crash any
    finalize that touches a column. Callers must handle an empty refs
    list (all-empty input) with their own typed empty table."""
    import functools

    import ray

    if descending is None:
        desc = [False] * len(key_cols)
    elif isinstance(descending, bool):
        desc = [descending] * len(key_cols)
    else:
        desc = list(descending)

    @ray.remote
    def _ends_and_count(t: pa.Table):
        if t.num_rows == 0:
            return None, None, 0
        return (tuple(t[c][0].as_py() for c in key_cols),
                tuple(t[c][t.num_rows - 1].as_py() for c in key_cols),
                t.num_rows)

    refs = sorted_ds.to_arrow_refs()
    probes = ray.get([_ends_and_count.remote(r) for r in refs])
    kept = [i for i in range(len(refs)) if probes[i][2] > 0]

    def key_cmp(a: tuple, b: tuple) -> int:
        for x, y, d in zip(a, b, desc):
            if x == y:
                continue
            if x is None:    # nulls at end regardless of direction
                return 1
            if y is None:
                return -1
            return (1 if d else -1) if x < y else (-1 if d else 1)
        return 0

    def cmp(i: int, j: int) -> int:
        r = key_cmp(probes[i][0], probes[j][0])
        return r if r else key_cmp(probes[i][1], probes[j][1])

    kept.sort(key=functools.cmp_to_key(cmp))
    return [refs[i] for i in kept], [probes[i][2] for i in kept]


def drop_empty_blocks(ds, empty_schema: pa.Schema | None = None):
    """Strip zero-row blocks from a Dataset before a ``Dataset.join``.

    Ray's hash aggregate (groupby().aggregate / map_groups) emits
    ZERO-COLUMN empty blocks for key-less partitions, and ``Dataset.join``
    rejects them ("No match ... for key field reference" from Acero).
    They can't be conformed in-stream either: ``map_batches`` skips empty
    blocks without calling the UDF. So: execute the upstream plan, keep the
    non-empty plasma blocks (rows never move — the driver sees O(blocks)
    booleans), and rebuild the Dataset from those refs. If everything is
    empty, emit one typed empty block from ``empty_schema`` (required then,
    since no schema survives otherwise)."""
    import ray.data as rd

    keep, _ = nonempty_refs(ds)
    if not keep:
        if empty_schema is None:
            raise ValueError("all blocks empty and no empty_schema given")
        return rd.from_arrow(empty_schema.empty_table())
    return rd.from_arrow_refs(keep)


def grouped_apply(ds, key_cols: list[str], pandas_fn, n_parts: int = 32):
    """Apply ``pandas_fn(group_df) -> DataFrame`` per distinct key tuple."""

    def partition_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = [pandas_fn(g) for _, g in pdf.groupby(key_cols, sort=True)]
        frames = [f for f in frames if f is not None and len(f)]
        if not frames:
            return pandas_fn(pdf.iloc[0:0])
        return pd.concat(frames, ignore_index=True)

    return partitioned_apply(ds, key_cols, partition_fn, n_parts)


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
