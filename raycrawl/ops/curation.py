"""End-to-end corpus curation: the composed training-data pipeline.

Every stage of a webtext curation run exists in this repo as an individual
oracle-gated operator; this module composes them into the one pipeline a
training-data team actually ships — corpus in, packed training manifest
out — and keeps the composition itself exactly SQL-gateable (every stage is
integer/deterministic, so the DuckDB oracle is a single CTE chain):

    1. stub filter        — drop docs under ``min_chars`` (the reference's
                            indexability floor, crawler.py:1038)
    2. exact dedup        — keep the min-id doc per identical text
                            (``dedup.exact_dedup``; winners re-join the
                            corpus via a distributed hash join)
    3. domain balancing   — keep the ``cap`` longest docs per source
                            (``sampling.domain_cap``)
    4. train split        — keep the train slice of the 90/5/5 id-hash
                            split (``sampling.split_batch`` rule)
    5. sequence packing   — global token offsets + spanned training
                            sequences at ``seq_len`` (``packing.pack_offsets``)

Scale shape: text crosses exactly two exchanges (the dedup-winner join and
the packing join — both partitioned hash joins on doc_id, never broadcast);
the cap/split stages move only (doc_id, source, n_chars) rows; the packing
scan moves O(blocks) scalars to the driver.
"""

from __future__ import annotations

import pyarrow as pa


def curate_corpus(docs_ds, *, min_chars: int = 50, cap: int = 10,
                  train_pct: int = 90, seq_len: int = 512,
                  n_parts: int | None = None):
    """Corpus → packed train manifest: one row per surviving doc,
    ``(doc_id, source, n_tokens, start_tok, first_seq, last_seq, n_seqs)``.

    ``docs_ds`` must carry (doc_id, source, text)."""
    import pyarrow.compute as pc

    from .dedup import exact_dedup
    from .grouping import drop_empty_blocks, resolve_parts
    from .packing import pack_offsets
    from .sampling import _h32, domain_cap

    width = resolve_parts(n_parts)

    def long_enough(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(pc.utf8_length(t["text"]),
                                         min_chars))

    base = docs_ds.map_batches(long_enough, batch_format="pyarrow")

    # 2. exact dedup → winner ids → hash join back to the corpus.
    # drop_empty_blocks: the aggregate emits zero-column blocks for
    # key-less hash partitions, which Dataset.join rejects.
    winners = drop_empty_blocks(
        exact_dedup(base),
        empty_schema=pa.schema([("text_hash", pa.string()),
                                ("keep_id", pa.int64())]),
    ).map_batches(
        lambda t: pa.table({"doc_id": t["keep_id"].cast(pa.int64())}),
        batch_format="pyarrow")
    surv = base.join(winners, join_type="inner", num_partitions=width,
                     on=("doc_id",))

    # 3. per-source cap (text dropped before this exchange)
    capped = domain_cap(surv, cap=cap, n_parts=n_parts)

    # 4. train slice of the hash split — a pure row property, no shuffle
    def train_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        m = [(_h32(str(i)) % 100) < train_pct for i in ids]
        return t.filter(pa.array(m, pa.bool_())).select(["doc_id", "source"])

    train = drop_empty_blocks(
        capped,  # map_groups emits zero-column blocks too (see above)
        empty_schema=pa.schema([("source", pa.string()),
                                ("doc_id", pa.int64()),
                                ("n_chars", pa.int64()),
                                ("rnk", pa.int64())]),
    ).map_batches(train_only, batch_format="pyarrow")

    # 5. re-join text for token counts, then the global packing scan
    texts = base.map_batches(lambda t: t.select(["doc_id", "text"]),
                             batch_format="pyarrow")
    packin = train.join(texts, join_type="inner", num_partitions=width,
                        on=("doc_id",))
    return pack_offsets(packin, seq_len=seq_len, keep_cols=["source"])


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
