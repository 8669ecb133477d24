"""Integer-exact stats over binary media payloads.

``ops.multimodal`` treats image/audio/video as opaque ``binary`` columns
and runs decode/featurize as an actor-pool stage (decode honestly stubbed —
the libs aren't in this container). That left the whole multimodal tier
rows-only in the driver's correctness gate. This module closes the gap for
the part that IS real — the binary plumbing: payload synthesis, Arrow
binary columns, batch traversal — with statistics DuckDB can recompute
bit-exactly from the generative formula (``synthesize_media``:
``payload = sha256('media-<i>') * (4 + i % 7)``):

    payload_len      = octet_length(payload)
    payload_byte_sum = sum of payload bytes        (pure integers)
    head32           = first 4 payload bytes, big-endian int

A wrong byte anywhere in the binary path (truncation, encoding round-trip,
chunk slicing) shifts ``payload_byte_sum`` or ``head32`` and the oracle
hash catches it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def payload_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-row integer stats of the ``payload`` binary column."""
    col = batch["payload"].combine_chunks() if isinstance(
        batch["payload"], pa.ChunkedArray) else batch["payload"]
    lens = np.empty(len(col), dtype=np.int64)
    sums = np.empty(len(col), dtype=np.int64)
    heads = np.empty(len(col), dtype=np.int64)
    for i, v in enumerate(col):
        b = v.as_py()
        if b is None:
            lens[i] = sums[i] = heads[i] = 0
            continue
        a = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(a)
        sums[i] = int(a.sum(dtype=np.int64))
        heads[i] = int.from_bytes(b[:4], "big") if len(b) >= 4 else 0
    return pa.table({
        "media_id": batch["media_id"],
        "kind": batch["kind"],
        "payload_len": pa.array(lens, pa.int64()),
        "payload_byte_sum": pa.array(sums, pa.int64()),
        "head32": pa.array(heads, pa.int64()),
    })
