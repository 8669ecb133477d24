"""As-of and range joins over keyed, timestamped tables.

Neither operator exists in Ray Data; both are expressed as the documented
composition (instructions §custom-operators path (a)): one hash shuffle on
the equality key, then a vectorized pandas/numpy kernel per partition.

Partitioning assumption (the contract every caller inherits): all rows of
one key land in exactly one coarse partition (``crc32(key) % n_parts`` via
``ops.grouping.partitioned_apply``), and a single key's history fits one
worker's heap. For web/event logs that is per-user history — bounded and
small; a pathological hot key would need salting plus a merge pass, which
these kernels do not implement (documented, same stance as sessionize).

Scale properties: both sides move through the exchange exactly once as
fixed-width key/value columns (no payload blow-up), the kernels are C-path
(``pd.merge_asof``; ``np.searchsorted`` + prefix sums), and output size is
O(left) for the as-of join and O(anchors) for the range aggregate — the
quadratic pair expansion of a naive range join never materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouping import partitioned_apply, resolve_parts


def asof_join(left_ds, right_ds, by: str, on: str,
              right_cols: list[str], n_parts: int | None = None):
    """Distributed backward as-of join.

    For each left row, attach ``right_cols`` from the right row with the
    greatest ``on`` value that is <= the left row's ``on`` within the same
    ``by`` key; nulls when the key has no prior right row. Right's match
    timestamp is exposed as ``{on}_right``.

    Both inputs shuffle once, hash-partitioned on ``by``; the per-partition
    kernel is ``pd.merge_asof`` (sorted-merge, C path). Tie discipline: among
    right rows sharing an exact ``(by, on)`` value pandas keeps the LAST in
    sort order — pre-deduplicate the right side if its ``on`` values are not
    unique per key and determinism matters.

    Output columns: every left column, then ``{on}_right``, then
    ``right_cols``. Missing matches are pandas-NaN — cast nullable int
    columns back to arrow int64 downstream (``pa.Array.from_pandas`` with an
    explicit type maps NaN -> null).
    """
    n_parts = resolve_parts(n_parts)
    ls = left_ds.schema()      # ray.data.Schema: parallel .names / .types
    rs = right_ds.schema()
    left_types = dict(zip(ls.names, ls.types))
    right_types = dict(zip(rs.names, rs.types))
    left_names = list(ls.names)
    clash = set(right_cols) & set(left_names)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns — rename "
            f"the right side's value columns before the join")
    right_keep = [by, on] + [c for c in right_cols if c not in (by, on)]
    on_right = f"{on}_right"

    # one unioned dataset so a single shuffle routes both sides; each side
    # carries the other's columns as typed nulls
    out_fields = [(n, left_types[n]) for n in left_names]
    out_fields += [(on_right, right_types[on])]
    out_fields += [(c, right_types[c]) for c in right_cols
                   if c not in (by, on)]
    out_fields += [("__side", pa.int8())]
    union_schema = pa.schema(out_fields)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = []
            for name, typ in out_fields[:-1]:
                if side == 0:
                    src = name if name in batch.column_names else None
                else:
                    if name == on_right:
                        src = on
                    elif name in (by,) or name in right_keep:
                        src = name
                    else:
                        src = None
                if src is not None and src in batch.column_names:
                    cols.append(batch[src].cast(typ))
                else:
                    cols.append(pa.nulls(n, typ))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.Table.from_arrays(cols, schema=union_schema)
        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    value_cols = [on_right] + [c for c in right_cols if c not in (by, on)]

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        lf = pdf[pdf["__side"] == 0][left_names]
        rf = pdf[pdf["__side"] == 1][[by] + value_cols]
        lf = lf.sort_values(on, kind="mergesort")
        rf = rf.sort_values(on_right, kind="mergesort")
        out = pd.merge_asof(lf, rf, left_on=on, right_on=on_right,
                            by=by, direction="backward")
        return out

    return partitioned_apply(unioned, [by], per_partition, n_parts=n_parts)


def range_join_agg(events_ds, anchor_type: str, window_s: int,
                   key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", type_col: str = "event_type",
                   value_col: str = "value", n_parts: int | None = None):
    """Range-join aggregate: for each anchor event (``type_col ==
    anchor_type``) count and value-sum (integer cents) the SAME-key events
    with ``ts`` in ``(anchor_ts, anchor_ts + window_s]``.

    The naive form is an inequality join whose output is O(pairs); here the
    pairs never materialize — one shuffle on ``key``, then per key: sort by
    ts once, two ``np.searchsorted`` probes per anchor batch for the window
    bounds, and a cents prefix-sum so each anchor's sum is two lookups.
    Output is one row per anchor: (id_col, n_follow, cents_follow).
    """
    n_parts = resolve_parts(n_parts)
    win_us = int(window_s) * 1_000_000

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for _, g in pdf.groupby(key, sort=False):
            g = g.sort_values(ts_col, kind="mergesort")
            # epoch microseconds regardless of the frame's datetime unit
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            cents = np.floor(g[value_col].to_numpy(dtype=np.float64)
                             * 100.0 + 0.5).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(cents)))
            amask = (g[type_col] == anchor_type).to_numpy()
            if not amask.any():
                continue
            ats = ts[amask]
            lo = np.searchsorted(ts, ats, side="right")       # ts >  anchor
            hi = np.searchsorted(ts, ats + win_us, side="right")  # <= +win
            out_ids.append(g[id_col].to_numpy()[amask])
            out_n.append((hi - lo).astype(np.int64))
            out_c.append(csum[hi] - csum[lo])
        if not out_ids:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_follow": pd.Series([], dtype="int64"),
                                 "cents_follow": pd.Series([], dtype="int64")})
        return pd.DataFrame({id_col: np.concatenate(out_ids),
                             "n_follow": np.concatenate(out_n),
                             "cents_follow": np.concatenate(out_c)})

    return partitioned_apply(events_ds, [key], per_partition, n_parts=n_parts)
