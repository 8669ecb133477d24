"""PartitionedLookup — the build side of the distributed hash join with
node-level plasma caching (ops/dedup.py): correctness of the split/merge
fan-out and both payload kinds."""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycrawl.ops.dedup import (  # noqa: E402
    PartitionedLookup,
    _id_part,
    _matrix_rows,
    get_parts,
)


def _text_ds(n):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                    "text": pa.array([f"text {i}" for i in range(n)])})
    return rd.from_arrow(tbl).repartition(4)


def test_text_lookup_covers_all_ids(ray_session):
    lk = PartitionedLookup(_text_ds(100), "doc_id", "text", n_parts=8,
                           kind="text")
    ids = np.arange(100, dtype=np.int64)
    parts = lk.parts_for(ids)
    loaded = get_parts(lk, np.unique(parts))
    for i, p in zip(ids.tolist(), parts.tolist()):
        assert loaded[p][i] == f"text {i}"
    # partition function is deterministic and matches the builder split
    assert (parts == _id_part(ids, 8)).all()


def test_matrix_lookup_vectorized_gather(ray_session):
    import ray.data as rd

    n, w = 64, 5
    mat = np.arange(n * w, dtype=np.int64).reshape(n, w)
    tbl = pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                    "sig": pa.array([r.tolist() for r in mat],
                                    pa.list_(pa.int64()))})
    lk = PartitionedLookup(rd.from_arrow(tbl).repartition(3), "doc_id",
                           "sig", n_parts=4, kind="matrix")
    probe = np.array([5, 63, 0, 17, 17], dtype=np.int64)
    got = _matrix_rows(lk, probe)
    assert (got == mat[probe]).all()


def test_single_partition_lookup(ray_session):
    lk = PartitionedLookup(_text_ds(10), "doc_id", "text", n_parts=1,
                           kind="text")
    loaded = get_parts(lk, [0])
    assert len(loaded[0]) == 10
