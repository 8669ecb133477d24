"""Exact duplicated-substring trimming (the Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" operation,
bounded to a fixed run length).

The full suffix-array construction is replaced by a fixed ``run_tokens``
gram scan — every duplicated token run of length ≥ ``run_tokens``
contains a duplicated ``run_tokens``-gram, so trimming all non-first
gram occurrences (positions unioned) removes exactly the duplicated-run
mass at gram resolution, while the FIRST occurrence of every gram keeps
one copy in the corpus (contrast ``textstats.repeated_chunk_removal``,
which drops all copies of hot chunks, and ``dedup.paragraph_first_dedup``,
which needs paragraph boundaries — this operates on raw token runs).

Semantics (SQL-restatable, integer-only):
  1. grams: md5 of ``tokens[i : i+L]`` joined by one space, for every
     start position ``i``;
  2. winner per gram = global min ``doc_id·max_tokens + i`` (one int64
     carries the (doc, pos) lexicographic tie-break);
  3. every NON-winner occurrence marks positions ``[i, i+L)`` in its
     doc; overlapping duplicated grams merge via the position-set union;
  4. output per doc: ``(doc_id, n_tokens, n_trimmed, trimmed_text)`` —
     unmarked tokens joined in order.

Scale shape: the only corpus-wide exchanges move fixed-width rows —
(md5, packed int64) into the winner election (one task hash-shuffle
partition per gram-hash range, non-winners emitted in place, no
self-join), and (doc_id, i) loser positions into a per-doc bitmap fold.
Document text crosses exactly one partitioned hash join for the rebuild.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def duplicate_span_trim(ds, *, run_tokens: int = 20,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_tokens: int = 4096,
                        n_parts: int | None = None):
    """Trim every non-first occurrence of a duplicated ``run_tokens``-token
    run across the corpus. See module docstring for the exact rule."""
    from .grouping import partitioned_apply, resolve_parts

    width = resolve_parts(n_parts)
    L = run_tokens

    def explode(batch: pa.Table) -> pa.Table:
        hs, packed = [], []
        for d, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = (t or "").split(" ")
            if len(toks) > max_tokens:
                raise ValueError(
                    f"duplicate_span_trim: doc {d} has {len(toks)} tokens "
                    f"> max_tokens={max_tokens} (packed ids must stay "
                    "int64); raise max_tokens or pre-chunk")
            for i in range(len(toks) - L + 1):
                gram = " ".join(toks[i: i + L])
                hs.append(hashlib.md5(gram.encode()).hexdigest())
                packed.append(d * max_tokens + i)
        return pa.table({"h": pa.array(hs, pa.string()),
                         "packed": pa.array(packed, pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # winner election + loser emission in ONE exchange: each gram-hash
    # partition sees its complete groups, keeps the min packed, emits the
    # rest as (doc_id, i) — no winners table, no self-join
    def losers_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "i": pd.Series(dtype="int64")})
        mn = pdf.groupby("h")["packed"].transform("min")
        lose = pdf.loc[pdf["packed"] != mn, "packed"]
        return pd.DataFrame({
            "doc_id": (lose // max_tokens).astype("int64"),
            "i": (lose % max_tokens).astype("int64"),
        })

    losers = partitioned_apply(exploded, ["h"], losers_fn, n_parts=width)

    # per-doc position bitmap: one packed max_tokens/8-byte row per doc
    # that lost anything (docs with no losses skip the join's right side)
    def marks_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "marks": pd.Series(dtype=object)})
        out_ids, out_marks = [], []
        for did, grp in pdf.groupby("doc_id", sort=True):
            bits = np.zeros(max_tokens, dtype=bool)
            for i in grp["i"]:
                bits[i: i + L] = True
            out_ids.append(did)
            out_marks.append(np.packbits(bits).tobytes())
        return pd.DataFrame({"doc_id": pd.array(out_ids, dtype="int64"),
                             "marks": out_marks})

    # materialize: marks is tiny (one ≤max_tokens/8-byte row per losing
    # doc) and is consumed twice — the emptiness probe and the join
    marks = partitioned_apply(losers, ["doc_id"], marks_fn,
                              n_parts=width).materialize()

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        mk = (batch["marks"].to_pylist() if "marks" in batch.column_names
              else [None] * len(ids))
        n_tok, n_trim, out = [], [], []
        for t, m in zip(texts, mk):
            toks = (t or "").split(" ")
            if m is None:
                n_tok.append(len(toks))
                n_trim.append(0)
                out.append(" ".join(toks))
                continue
            bits = np.unpackbits(
                np.frombuffer(m, dtype=np.uint8))[:len(toks)].astype(bool)
            kept = [tok for tok, b in zip(toks, bits) if not b]
            n_tok.append(len(toks))
            n_trim.append(int(bits.sum()))
            out.append(" ".join(kept))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_trimmed": pa.array(n_trim, pa.int64()),
            "trimmed_text": pa.array(out, pa.string()),
        })

    if marks.count() == 0:
        # no duplicated runs anywhere — Ray's hash join can't take a
        # fully-empty side, and no join is needed
        return ds.map_batches(rebuild, batch_format="pyarrow")

    j = ds.join(marks, join_type="left_outer", num_partitions=width,
                on=(id_col,))
    return j.map_batches(rebuild, batch_format="pyarrow")


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
