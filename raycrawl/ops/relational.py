"""Relational operators over the TPC-H-ish tables: filtered grouped
aggregates, broadcast hash joins, top-k.

Join discipline (ray_guide "Joins and lookups"): dimension tables (nation,
customer at these scales) are broadcast via ``ray.put`` and looked up inside
``map_batches`` — no shuffle. A both-sides-large join would use the bucketed
hash-join pattern (add ``bucket = hash(key) % B`` to both sides, groupby
bucket, join per bucket); documented here, exercised by the crawl engine's
frontier⋈pages join instead.

Money/quantity aggregates are computed in integer cents
(``floor(x*100 + 0.5)``) so engine and DuckDB oracle agree bit-exactly —
float sums are order-dependent in the last ulp.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cents(arr: np.ndarray) -> np.ndarray:
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def pricing_summary(lineitem_ds, cutoff: str = "1998-09-02"):
    """TPC-H Q1 shape: per (returnflag, linestatus) sums over lineitem with
    a shipdate filter, all monetary sums in integer cents."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"].astype(str) <= cutoff]
        if len(df) == 0:
            return pa.table(
                {"l_returnflag": pa.array([], pa.string()),
                 "l_linestatus": pa.array([], pa.string()),
                 "qty_c": pa.array([], pa.int64()),
                 "base_c": pa.array([], pa.int64()),
                 "disc_c": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        df["qty_c"] = _cents(df["l_quantity"].to_numpy())
        df["base_c"] = _cents(df["l_extendedprice"].to_numpy())
        df["disc_c"] = _cents(
            (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_c=("qty_c", "sum"), base_c=("base_c", "sum"),
            disc_c=("disc_c", "sum"), n=("l_orderkey", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return lineitem_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_c", alias_name="sum_qty_cents"),
        Sum("base_c", alias_name="sum_base_cents"),
        Sum("disc_c", alias_name="sum_disc_cents"),
        Sum("n", alias_name="count_order"),
    )


def revenue_by_nation(lineitem_ds, orders_tbl: pa.Table, customer_tbl: pa.Table,
                      nation_tbl: pa.Table):
    """Revenue per customer nation: lineitem ⋈ orders ⋈ customer ⋈ nation.
    orders/customer/nation are broadcast lookups (small side); lineitem
    streams. Revenue = cents(extendedprice·(1−discount)) summed per nation."""
    import ray

    o = {k: v for k, v in zip(orders_tbl["o_orderkey"].to_pylist(),
                              orders_tbl["o_custkey"].to_pylist())}
    c = {k: v for k, v in zip(customer_tbl["c_custkey"].to_pylist(),
                              customer_tbl["c_nationkey"].to_pylist())}
    nname = {k: v for k, v in zip(nation_tbl["n_nationkey"].to_pylist(),
                                  nation_tbl["n_name"].to_pylist())}
    lookup_ref = ray.put((o, c, nname))

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ok, ck, nn = ray.get(lookup_ref)
        orderkeys = batch["l_orderkey"].to_pylist()
        rev = _cents(
            (np.array(batch["l_extendedprice"].to_pylist())
             * (1 - np.array(batch["l_discount"].to_pylist())))
        )
        agg: dict[str, int] = {}
        for k, r in zip(orderkeys, rev):
            nation = nn.get(ck.get(ok.get(k)))
            if nation is None:
                continue
            agg[nation] = agg.get(nation, 0) + int(r)
        return pa.table(
            {"n_name": pa.array(list(agg.keys()), pa.string()),
             "rev": pa.array(list(agg.values()), pa.int64())}
        )

    return lineitem_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "n_name"
    ).aggregate(Sum("rev", alias_name="revenue_cents"))


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
