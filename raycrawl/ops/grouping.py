"""Two-level grouped apply — the many-small-groups workaround.

``Dataset.groupby(key).map_groups(fn)`` materializes one pandas frame per
group; with thousands of tiny groups (LSH buckets, simhash chunks, pair
keys) the per-group overhead dominates by orders of magnitude. The pattern
here hash-partitions the keys into ``n_parts`` coarse groups (one shuffle,
same cost class as groupby) and processes each partition with vectorized
pandas. Correctness is identical: all rows of a key land in exactly one
partition (crc32 of the key), so partition functions always see complete
key groups.

- ``partitioned_apply``: fn sees the whole partition (use pandas groupby /
  drop_duplicates inside — the fast C path).
- ``grouped_apply``: convenience per-key-group wrapper over it.

Both require ``fn`` to return a correctly-typed (possibly empty) DataFrame
for empty input — that is the schema contract.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa


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


def _add_part(batch: pa.Table, key_cols: list[str], n_parts: int) -> pa.Table:
    if len(key_cols) == 1:
        keys = batch[key_cols[0]].to_pylist()
    else:
        keys = list(zip(*[batch[c].to_pylist() for c in key_cols]))
    parts = [zlib.crc32(str(v).encode()) % n_parts for v in keys]
    return batch.append_column("_part", pa.array(parts, pa.int32()))


def partitioned_apply(ds, key_cols: list[str], partition_fn, n_parts: int = 32):
    """One shuffle on crc32(key) % n_parts; ``partition_fn(pdf)`` runs per
    partition with complete key groups."""

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(pdf.drop(columns=["_part"]))

    return ds.map_batches(
        lambda b: _add_part(b, key_cols, n_parts), batch_format="pyarrow"
    ).groupby("_part").map_groups(per_partition, batch_format="pandas")


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
    import ray
    import ray.data as rd

    @ray.remote
    def nonempty(t: pa.Table) -> bool:
        return t.num_rows > 0

    refs = ds.to_arrow_refs()
    keep = [r for r, ok in zip(refs, ray.get([nonempty.remote(r)
                                              for r in refs])) if ok]
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
