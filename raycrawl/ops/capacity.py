"""Cluster capacity planning from corpus sample statistics.

Before a 100-TB run, the operator every pipeline owner actually wants is
"what will each stage MOVE, and how wide must the exchanges be so a
partition fits in a worker's heap?" — answered from a small sample's
per-document averages, scaled to the target corpus. This turns the
repo-wide scale discipline (fixed-width exchange rows, pre-aggregated
partials, guarded broadcasts) into a first-class, oracle-checkable
computation instead of prose.

All arithmetic is integer (floor division, bytes) so the DuckDB oracle
replays it exactly. Estimates are deliberately simple linear models —
the point is order-of-magnitude sizing and a deterministic audit trail,
not a simulator.

Model (per target-scale document counts ``D`` and text bytes ``B``):

- ``exact_dedup``     moves one 32-B md5 row per doc          (32·D)
- ``minhash_lsh``     moves the signature + band keys          ((4·n_perm
                      + 16·n_bands)·D)
- ``simhash``         one 8-B signature + 4 chunk keys         (40·D)
- ``embed_pass``      one float32 vector per doc               (4·dim·D)
- ``token_stats``     per-batch partials only — exchange is
                      O(distinct tokens), bounded by vocab cap  (24·vocab)
- ``doc_shuffle``     the full text crosses once               (B)

Partition width per stage = ceil(stage_bytes / partition_budget) where
partition_budget = mem_per_cpu_bytes // safety_factor (a partition must
fit in a worker heap with room for the apply's working set), floored at
``cluster_cpus`` so every core has work. The width is memory-TRUE,
never capped: when it exceeds the flat-exchange comfort zone (4096)
the ``grid_rounds`` column flips to 2 — run the exchange through the
grid shuffle (``grouping.partitioned_apply`` max_fan path) instead of
shrinking partitions past what a worker heap can absorb.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def capacity_plan(docs_ds, *, target_bytes: int,
                  cluster_cpus: int = 8192,
                  mem_per_cpu_bytes: int = 4 << 30,
                  safety_factor: int = 4,
                  n_perm: int = 64, n_bands: int = 16,
                  emb_dim: int = 64, vocab_cap: int = 5_000_000,
                  text_col: str = "text"):
    """One row per planned stage: (stage, est_rows, est_bytes,
    recommended_parts). Sample statistics reduce in one streaming pass
    (per-batch count/byte partials); everything after is driver
    integer arithmetic over two scalars."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table({
            "docs": pa.array([len(texts)], pa.int64()),
            "bytes": pa.array(
                [sum(len((t or "").encode()) for t in texts)],
                pa.int64())})

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .aggregate(Sum("docs", alias_name="docs"),
                      Sum("bytes", alias_name="bytes")))
    sample_docs = int(agg["docs"] or 0)
    sample_bytes = int(agg["bytes"] or 0)
    if sample_docs == 0 or sample_bytes == 0:
        raise ValueError("capacity_plan: empty sample corpus")

    # target-scale document count from the sample's bytes/doc
    d = target_bytes * sample_docs // sample_bytes
    stages = [
        ("exact_dedup", d, 32 * d),
        ("minhash_lsh", d, (4 * n_perm + 16 * n_bands) * d),
        ("simhash", d, 40 * d),
        ("embed_pass", d, 4 * emb_dim * d),
        ("token_stats", vocab_cap, 24 * vocab_cap),
        ("doc_shuffle", d, target_bytes),
    ]
    budget = mem_per_cpu_bytes // safety_factor
    rows = []
    for name, est_rows, est_bytes in stages:
        parts = max(-(-est_bytes // budget), cluster_cpus)  # ceil, >=cpus
        rows.append({"stage": name, "est_rows": int(est_rows),
                     "est_bytes": int(est_bytes),
                     "recommended_parts": int(parts),
                     "grid_rounds": 2 if parts > 4096 else 1})
    rows.append({"stage": "sample", "est_rows": sample_docs,
                 "est_bytes": sample_bytes, "recommended_parts": 0,
                 "grid_rounds": 0})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("stage", pa.string()), ("est_rows", pa.int64()),
         ("est_bytes", pa.int64()), ("recommended_parts", pa.int64()),
         ("grid_rounds", pa.int64())]))


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
