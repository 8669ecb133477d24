"""Relational operators over the TPC-H-ish tables: filtered grouped
aggregates, broadcast hash joins, top-k.

Join discipline (ray_guide "Joins and lookups"): genuinely-tiny dimension
tables (nation: 25 rows by spec) are broadcast via ``ray.put`` and looked
up inside ``map_batches`` — no shuffle. ``revenue_by_nation`` additionally
broadcasts customer (fine at these SFs, a multi-GB pickle per node at
100×); ``revenue_by_nation_dist`` is the scale path — customer joins as a
fact-sized Dataset through a partitioned hash join, same oracle.

Money/quantity aggregates are computed in integer cents
(``floor(x*100 + 0.5)``) so engine and DuckDB oracle agree bit-exactly —
float sums are order-dependent in the last ulp.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


def revenue_by_nation(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                      nation_tbl: pa.Table, n_parts: int | None = None):
    """Revenue per customer nation: lineitem ⋈ orders ⋈ customer ⋈ nation.

    lineitem and orders are both fact-sized, so their join is a PARTITIONED
    hash join on ``l_orderkey`` (``Dataset.join`` — both sides shuffle by
    key, no broadcast). Before the join, lineitem is pre-aggregated per
    batch to one (orderkey, revenue-cents) partial per orderkey (~4× fewer
    rows through the shuffle), and orders is projected to
    (orderkey, n_name) via the genuinely-small broadcast dims
    (customer, nation). Revenue = cents(extendedprice·(1−discount))."""
    import ray

    from .grouping import resolve_parts

    n_parts = resolve_parts(n_parts)

    c = {k: v for k, v in zip(customer_tbl["c_custkey"].to_pylist(),
                              customer_tbl["c_nationkey"].to_pylist())}
    nname = {k: v for k, v in zip(nation_tbl["n_nationkey"].to_pylist(),
                                  nation_tbl["n_name"].to_pylist())}
    dims_ref = ray.put((c, nname))

    from ray.data.aggregate import Sum

    def li_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        rev = _cents(
            np.asarray(batch["l_extendedprice"], dtype=np.float64)
            * (1 - np.asarray(batch["l_discount"], dtype=np.float64))
        )
        df = pd.DataFrame({"l_orderkey": np.asarray(batch["l_orderkey"],
                                                    dtype=np.int64),
                           "rev": rev})
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    def orders_to_nation(batch: pa.Table) -> pa.Table:
        ck, nn = ray.get(dims_ref)
        custkeys = batch["o_custkey"].to_pylist()
        names = [nn.get(ck.get(k), "") for k in custkeys]
        return pa.table(
            {"l_orderkey": batch["o_orderkey"].cast(pa.int64()),
             "n_name": pa.array(names, pa.string())}
        )

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    right = orders_ds.map_batches(orders_to_nation, batch_format="pyarrow")
    joined = li.join(right, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",))
    return joined.map_batches(
        lambda b: b.select(["n_name", "rev"]), batch_format="pyarrow"
    ).groupby("n_name").aggregate(Sum("rev", alias_name="revenue_cents"))


def shipping_priority(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                      segment: str = "BUILDING", cutoff: str = "1998-06-01",
                      k: int = 10, n_parts: int | None = None):
    """TPC-H Q3 shape (shipping priority): top-k unshipped orders by
    revenue for one market segment — orders placed before ``cutoff`` with
    lineitems shipping after it.

    Scale shape: the segment's custkeys broadcast once (``ray.put`` of an
    int64 set — the one genuinely small side); orders filter+project to
    (orderkey, orderdate) in-block; lineitem pre-aggregates to one
    (orderkey, rev-cents) partial per batch BEFORE the partitioned hash
    join on orderkey (both sides fact-sized ⇒ ``Dataset.join``, no
    broadcast); a per-order Sum groupby then a k-row sort/limit finish.
    Revenue in integer cents (exact oracle). Returns (o_orderkey,
    revenue_cents, o_orderdate 'YYYY-MM-DD', o_orderpriority) —
    the synthetic orders table carries o_orderpriority, not the spec's
    o_shippriority."""
    import ray

    import pandas as pd

    from ray.data.aggregate import Sum

    from .grouping import resolve_parts

    n_parts = resolve_parts(n_parts)
    seg_keys = {
        ck for ck, seg in zip(customer_tbl["c_custkey"].to_pylist(),
                              customer_tbl["c_mktsegment"].to_pylist())
        if seg == segment}
    seg_ref = ray.put(np.fromiter(seg_keys, dtype=np.int64,
                                  count=len(seg_keys)))

    cut = np.datetime64(cutoff, "us")

    def orders_slim(batch: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        ck = np.asarray(batch["o_custkey"], np.int64)
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        keep = (od < cut) & np.isin(ck, keys)
        dates = np.datetime_as_string(od[keep].astype("datetime64[D]"))
        return pa.table({
            "l_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep], pa.int64()),
            "o_orderdate": pa.array(dates, pa.string()),
            "o_orderpriority": pa.array(
                np.asarray(batch["o_orderpriority"])[keep], pa.string()),
        })

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["l_shipdate"], "datetime64[us]")
        keep = sd > cut
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[keep]
            * (1 - np.asarray(batch["l_discount"], np.float64)[keep]))
        df = pd.DataFrame({
            "l_orderkey": np.asarray(batch["l_orderkey"], np.int64)[keep],
            "rev": rev})
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow")
    joined = li.join(orders, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",))
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev", alias_name="revenue_cents"))
    top = agg.sort(["revenue_cents", "o_orderdate", "l_orderkey"],
                   descending=[True, False, False]).limit(k)
    return top.map_batches(
        lambda b: b.rename_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority",
             "revenue_cents"]),
        batch_format="pyarrow")


def lineitem_rev_partials(lineitem_ds):
    """lineitem → per-batch (l_orderkey, rev-cents) partials: pre-aggregated
    so ~4× fewer rows cross the orderkey shuffle."""
    import pandas as pd

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(
            np.asarray(batch["l_extendedprice"], dtype=np.float64)
            * (1 - np.asarray(batch["l_discount"], dtype=np.float64))
        )
        df = pd.DataFrame({"l_orderkey": np.asarray(batch["l_orderkey"],
                                                    dtype=np.int64),
                           "rev": rev})
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    return lineitem_ds.map_batches(li_partial, batch_format="pyarrow")


def revenue_by_nation_dist(lineitem_ds, orders_ds, customer_ds,
                           nation_tbl: pa.Table, n_parts: int | None = None):
    """Same result as ``revenue_by_nation``, but CUSTOMER joins as a
    fact-sized Dataset: orders ⋈ customer is a partitioned hash join on
    custkey — the path when the customer dimension outgrows a broadcast
    (a 100×-SF TPC-H customer table is a multi-GB pickle per node as a
    dict; see the round-2 verdict note). Only nation (25 rows, fixed by
    the TPC-H spec) stays broadcast. Both hash joins pipeline in one
    DAG at CPUs/4 per-join width (floor 8) — re-measured in round 4 on
    this shape and on Q5: the round-2 pipelined-joins stall does not
    reproduce, while sequential aggregator pools at one partition per
    CPU are actor-startup bound on a node (see local_supplier_volume's
    numbers)."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)
    nname = {k: v for k, v in zip(nation_tbl["n_nationkey"].to_pylist(),
                                  nation_tbl["n_name"].to_pylist())}
    nref = ray.put(nname)

    orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                            "o_custkey": b["o_custkey"].cast(pa.int64())}),
        batch_format="pyarrow")
    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64()),
                            "c_nationkey": b["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner", num_partitions=n_parts,
                     on=("o_custkey",), right_on=("c_custkey",))

    def to_nation(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        names = [nn.get(k, "") for k in batch["c_nationkey"].to_pylist()]
        return pa.table({"l_orderkey": batch["o_orderkey"].cast(pa.int64()),
                         "n_name": pa.array(names, pa.string())})

    right = oc.map_batches(to_nation, batch_format="pyarrow")
    li = lineitem_rev_partials(lineitem_ds)
    joined = li.join(right, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",))
    return joined.map_batches(
        lambda b: b.select(["n_name", "rev"]), batch_format="pyarrow"
    ).groupby("n_name").aggregate(Sum("rev", alias_name="revenue_cents"))


_BLOOM_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)
_BLOOM_M_BITS = 1 << 20  # 128 KiB bitmap; ~0.1% fp at 10^5 keys, 3 probes


def _splitmix(v: np.ndarray, salt: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping)."""
    with np.errstate(over="ignore"):
        x = v + np.uint64(salt)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def build_int_bloom(ds, col: str, m_bits: int = 1 << 20) -> np.ndarray:
    """Bloom filter of an int64 key column, built distributedly: each
    block sets its keys' bits in a local bitmap (3 splitmix64 probes),
    the driver ORs O(blocks) fixed-size bitmaps — keys never leave their
    blocks. The semi-join pushdown primitive: broadcast the bitmap
    (m_bits/8 bytes — 128 KiB at 2^20, vs 100s of MB for the key set
    itself as a dict) and pre-filter the fact side IN-BLOCK before its
    shuffle; false positives only let extra rows through to the exact
    join, never change the result."""
    words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words, np.uint64)
        v = np.asarray(batch[col], np.int64).astype(np.uint64)
        for salt in _BLOOM_SALTS:
            p = _splitmix(v, salt) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (p & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(words, np.uint64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return bits


def bloom_member_mask(bits: np.ndarray, vals: np.ndarray,
                      m_bits: int) -> np.ndarray:
    """Vectorized membership test: True ⇒ possibly present (superset)."""
    vv = vals.astype(np.uint64)
    mask = np.ones(len(vals), bool)
    for salt in _BLOOM_SALTS:
        p = _splitmix(vv, salt) % np.uint64(m_bits)
        mask &= (bits[(p >> np.uint64(6)).astype(np.int64)]
                 >> (p & np.uint64(63))) & np.uint64(1) == 1
    return mask


def local_supplier_volume(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                          nation_tbl: pa.Table, region_tbl: pa.Table,
                          region: str = "ASIA", lo: str = "1995-01-01",
                          hi: str = "1999-01-01",
                          n_parts: int | None = None,
                          cust_bloom: bool = False):
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    orders where the CUSTOMER and the SUPPLIER share that nation, region-
    and orderdate-filtered.

    Scale shape — three fact tables, two partitioned hash joins, every
    filter pushed below its shuffle:

    - nation⋈region collapses driver-side to the ≤25-entry
      nationkey→n_name map of the target region, broadcast via ``ray.put``
      (genuinely-small side by TPC-H spec).
    - customer and supplier project to (key, nationkey) AND pre-filter to
      the region's nations in-block, so only in-region rows enter either
      shuffle.
    - lineitem ⋈ supplier is a partitioned hash join on suppkey (supplier
      is 1/6000 of lineitem but still fact-scaled at 100×SF — no
      broadcast); orders ⋈ customer likewise on custkey, with the
      orderdate range filter applied in-block first. All three joins
      PIPELINE in one DAG — measured at sf0.1/32 CPUs: pipelined 12.0 s
      vs 15.9 s with materialize barriers between joins (the round-2
      two-join stall does not reproduce on this shape), and the default
      per-join width is CPUs/4 (floor 8) rather than one-per-CPU: three
      sequential aggregator pools at full CPU width are actor-startup
      bound on a node (5.7 s at width 8 vs 12.0 s at 32), while CPUs/4
      still gives a 256-node cluster 2 000-wide exchanges.
    - the final orderkey join carries only (orderkey, rev, nationkey)
      fixed-width rows; the Q5 colocation predicate
      ``c_nationkey = s_nationkey`` is a vectorized in-block filter after
      it, then a ≤25-group Sum.

    With ``cust_bloom=True`` the orders side additionally applies a
    Bloom semi-join pushdown: a 128-KiB bitmap of the region's custkeys
    (built distributedly, ORed on the driver, broadcast once) drops
    out-of-region orders IN-BLOCK before the custkey shuffle — the
    bitmap is a superset test, so the exact join result is unchanged
    while ~(1 − 1/|regions|) of the orders rows never cross the
    exchange. At 100×SF that bitmap replaces a multi-GB key-set
    broadcast.

    Revenue in integer cents (exact oracle). Returns
    (n_name, revenue_cents)."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)
    rkey = {k: v for k, v in zip(region_tbl["r_name"].to_pylist(),
                                 region_tbl["r_regionkey"].to_pylist())}
    target = rkey[region]
    nname = {nk: nm for nk, nm, rk in zip(
        nation_tbl["n_nationkey"].to_pylist(),
        nation_tbl["n_name"].to_pylist(),
        nation_tbl["n_regionkey"].to_pylist()) if rk == target}
    nref = ray.put(nname)

    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def sup_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        keep = np.isin(nk, np.fromiter(nn.keys(), np.int64, len(nn)))
        return pa.table({
            "l_suppkey": pa.array(
                np.asarray(batch["s_suppkey"], np.int64)[keep], pa.int64()),
            "s_nationkey": pa.array(nk[keep], pa.int64())})

    def cust_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        keep = np.isin(nk, np.fromiter(nn.keys(), np.int64, len(nn)))
        return pa.table({
            "o_custkey": pa.array(
                np.asarray(batch["c_custkey"], np.int64)[keep], pa.int64()),
            "c_nationkey": pa.array(nk[keep], pa.int64())})

    def orders_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        keep = (od >= lo_us) & (od < hi_us)
        ck = np.asarray(batch["o_custkey"], np.int64)
        if cust_bloom_ref is not None:
            # semi-join pushdown: drop orders whose custkey can't be in
            # the region's customer set BEFORE the shuffle (bloom is a
            # superset — the exact join still decides)
            bits = ray.get(cust_bloom_ref)
            keep &= bloom_member_mask(bits, ck, _BLOOM_M_BITS)
        return pa.table({
            "l_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep], pa.int64()),
            "o_custkey": pa.array(ck[keep], pa.int64())})

    def li_slim(batch: pa.Table) -> pa.Table:
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)
            * (1 - np.asarray(batch["l_discount"], np.float64)))
        return pa.table({
            "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "rev": pa.array(rev, pa.int64())})

    # the region filters make sup/cust sparse: a tiny/oversplit read plus a
    # selective filter leaves zero-row SCHEMA-LESS blocks (they skip the
    # UDF), which Acero's Dataset.join rejects — strip them (ray_guide /
    # grouping.drop_empty_blocks; blocks stay in plasma, O(blocks) driver
    # ints)
    sup_schema = pa.schema([("l_suppkey", pa.int64()),
                            ("s_nationkey", pa.int64())])
    cust_schema = pa.schema([("o_custkey", pa.int64()),
                             ("c_nationkey", pa.int64())])

    li = lineitem_ds.map_batches(li_slim, batch_format="pyarrow")
    sup = drop_empty_blocks(
        supplier_ds.map_batches(sup_slim, batch_format="pyarrow"),
        empty_schema=sup_schema)
    ls = li.join(sup, join_type="inner", num_partitions=n_parts,
                 on=("l_suppkey",)).map_batches(
        lambda b: b.select(["l_orderkey", "rev", "s_nationkey"]),
        batch_format="pyarrow")

    cust = drop_empty_blocks(
        customer_ds.map_batches(cust_slim, batch_format="pyarrow"),
        empty_schema=cust_schema)
    cust_bloom_ref = None
    if cust_bloom:
        cust_bloom_ref = ray.put(
            build_int_bloom(cust, "o_custkey", _BLOOM_M_BITS))
    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner", num_partitions=n_parts,
                     on=("o_custkey",)).map_batches(
        lambda b: b.select(["l_orderkey", "c_nationkey"]),
        batch_format="pyarrow")

    joined = ls.join(oc, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",))

    def colocate(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        sn = np.asarray(batch["s_nationkey"], np.int64)
        cn = np.asarray(batch["c_nationkey"], np.int64)
        keep = sn == cn
        names = [nn[k] for k in sn[keep]]
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "rev": pa.array(np.asarray(batch["rev"], np.int64)[keep],
                            pa.int64())})

    return joined.map_batches(colocate, batch_format="pyarrow").groupby(
        "n_name").aggregate(Sum("rev", alias_name="revenue_cents"))


def returned_item_report(lineitem_ds, orders_ds, customer_ds,
                         nation_tbl: pa.Table, lo: str = "1996-01-01",
                         hi: str = "1996-07-01", k: int = 20,
                         n_parts: int | None = None):
    """TPC-H Q10 shape (returned-item reporting): top-``k`` customers by
    revenue lost to returns (``l_returnflag='R'``) in an orderdate window.

    Scale shape:
    - lineitem filters to R rows and pre-aggregates (orderkey, rev-cents)
      per batch BEFORE the shuffle; orders date-filters in-block and
      projects to (orderkey, custkey). ONE partitioned hash join on
      orderkey.
    - revenue then reduces per custkey (small fixed-width groupby) and
      joins CUSTOMER as a fact-sized Dataset — partitioned hash join on
      custkey, never a broadcast (the revenue_by_nation_dist discipline);
      nation stays a ≤25-entry ``ray.put`` broadcast.
    - the final top-k never sorts the customer-scaled table: per-block
      top-k partials, O(blocks·k) rows to the driver, one merge.

    Returns (c_custkey, c_name, revenue_cents, c_acctbal_cents, n_name)
    ordered by (revenue_cents desc, c_custkey asc), exactly ``k`` rows
    max."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        # multi-join DAG: quarter the per-join width (floor 8) — the Q5
        # measurement (sequential aggregator pools are actor-startup
        # bound at one-per-CPU on a node; CPUs/4 stays cluster-wide)
        n_parts = multi_join_parts(None)
    nname = {nk: nm for nk, nm in zip(nation_tbl["n_nationkey"].to_pylist(),
                                      nation_tbl["n_name"].to_pylist())}
    nref = ray.put(nname)
    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def li_returns(batch: pa.Table) -> pa.Table:
        import pandas as pd

        flag = np.asarray(batch["l_returnflag"]) == "R"
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[flag]
            * (1 - np.asarray(batch["l_discount"], np.float64)[flag]))
        df = pd.DataFrame({
            "o_orderkey": np.asarray(batch["l_orderkey"], np.int64)[flag],
            "rev": rev})
        g = df.groupby("o_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"o_orderkey": pa.array(g["o_orderkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    def orders_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        keep = (od >= lo_us) & (od < hi_us)
        return pa.table({
            "o_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep], pa.int64()),
            "c_custkey": pa.array(
                np.asarray(batch["o_custkey"], np.int64)[keep], pa.int64())})

    li = lineitem_ds.map_batches(li_returns, batch_format="pyarrow")
    orders = drop_empty_blocks(
        orders_ds.map_batches(orders_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_custkey", pa.int64())]))
    lo_join = li.join(orders, join_type="inner", num_partitions=n_parts,
                      on=("o_orderkey",))

    def cust_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "c_custkey": np.asarray(batch["c_custkey"], np.int64),
            "rev": np.asarray(batch["rev"], np.int64)})
        g = df.groupby("c_custkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"c_custkey": pa.array(g["c_custkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    rev_by_cust = lo_join.map_batches(
        cust_partial, batch_format="pyarrow").groupby(
        "c_custkey").aggregate(Sum("rev", alias_name="revenue_cents"))
    # hash aggregates emit zero-column blocks for key-less partitions —
    # strip before the next join (curation/grouping discipline)
    rev_by_cust = drop_empty_blocks(
        rev_by_cust, empty_schema=pa.schema([
            ("c_custkey", pa.int64()), ("revenue_cents", pa.int64())]))

    def cust_slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "c_name": batch["c_name"].cast(pa.string()),
            "c_acctbal_cents": pa.array(
                _cents(np.asarray(batch["c_acctbal"], np.float64)),
                pa.int64()),
            "c_nationkey": batch["c_nationkey"].cast(pa.int64())})

    cust = customer_ds.map_batches(cust_slim, batch_format="pyarrow")
    full = rev_by_cust.join(cust, join_type="inner",
                            num_partitions=n_parts, on=("c_custkey",))

    def local_top(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        df = batch.to_pandas()
        df = df.sort_values(["revenue_cents", "c_custkey"],
                            ascending=[False, True],
                            kind="stable").head(k)
        df["n_name"] = [nn.get(x, "") for x in df["c_nationkey"]]
        return pa.Table.from_pandas(
            df[["c_custkey", "c_name", "revenue_cents",
                "c_acctbal_cents", "n_name"]], preserve_index=False)

    rows = full.map_batches(local_top, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["revenue_cents"], r["c_custkey"]))
    out = rows[:k]
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in out], pa.int64()),
        "c_name": pa.array([r["c_name"] for r in out], pa.string()),
        "revenue_cents": pa.array([r["revenue_cents"] for r in out],
                                  pa.int64()),
        "c_acctbal_cents": pa.array([r["c_acctbal_cents"] for r in out],
                                    pa.int64()),
        "n_name": pa.array([r["n_name"] for r in out], pa.string()),
    })


def forecast_revenue(lineitem_ds, lo: str = "1996-01-01",
                     hi: str = "1997-01-01", disc_lo_c: int = 5,
                     disc_hi_c: int = 7, qty_lt: int = 24):
    """TPC-H Q6 shape (forecasting revenue change): one global sum of
    ``extendedprice * discount`` over lineitems in a shipdate year with a
    discount band and a quantity cap.

    Scale shape: the simplest possible plan — every predicate and the
    cents projection run in-block, each batch collapses to ONE partial
    row, and the only exchange is the O(batches) single-key groupby.
    Discounts compare in integer cents (``floor(d*100+0.5)`` ∈
    [disc_lo_c, disc_hi_c]) so engine and oracle agree bit-exactly on the
    band edges. Returns one row (revenue_cents, count_items)."""
    from ray.data.aggregate import Sum

    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def partial(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["l_shipdate"], "datetime64[us]")
        disc = np.asarray(batch["l_discount"], np.float64)
        disc_c = _cents(disc)
        qty = np.asarray(batch["l_quantity"], np.float64)
        keep = ((sd >= lo_us) & (sd < hi_us)
                & (disc_c >= disc_lo_c) & (disc_c <= disc_hi_c)
                & (qty < qty_lt))
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[keep]
            * disc[keep])
        return pa.table({"k": pa.array([0], pa.int64()),
                         "rev": pa.array([int(rev.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    agg = lineitem_ds.map_batches(
        partial, batch_format="pyarrow").groupby("k").aggregate(
        Sum("rev", alias_name="revenue_cents"),
        Sum("n", alias_name="count_items"))
    return agg.map_batches(
        lambda b: b.select(["revenue_cents", "count_items"]),
        batch_format="pyarrow")


def large_orders(lineitem_ds, orders_ds, customer_ds,
                 qty_threshold_c: int = 25000, k: int = 50,
                 n_parts: int | None = None):
    """TPC-H Q18 shape (large-volume customer): orders whose total lineitem
    quantity exceeds a threshold, with their customer, top-k by
    (totalprice desc, orderkey asc).

    Scale shape — the HAVING-then-join-back pattern: lineitem pre-
    aggregates (orderkey, qty-cents) per batch, a per-order Sum groupby
    applies the HAVING filter so only winner orders (a tiny fraction by
    construction of the threshold) enter the orderkey hash join with
    orders; the customer join then only moves winner custkeys. Neither
    join broadcasts — at 100×SF the winner set is still unbounded, so
    both stay partitioned ``Dataset.join``s. Quantities in integer cents.
    Returns (o_orderkey, o_custkey, c_name, o_orderdate 'YYYY-MM-DD',
    o_totalprice_cents, sum_qty_cents)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)

    def li_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderkey": np.asarray(batch["l_orderkey"], np.int64),
            "qty": _cents(np.asarray(batch["l_quantity"], np.float64))})
        g = df.groupby("o_orderkey", as_index=False).agg(qty=("qty", "sum"))
        return pa.table({"o_orderkey": pa.array(g["o_orderkey"], pa.int64()),
                         "qty": pa.array(g["qty"], pa.int64())})

    per_order = lineitem_ds.map_batches(
        li_partial, batch_format="pyarrow").groupby(
        "o_orderkey").aggregate(Sum("qty", alias_name="sum_qty_cents"))

    win_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("sum_qty_cents", pa.int64())])

    def having(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch["sum_qty_cents"], np.int64)
        keep = q > qty_threshold_c
        return pa.table({
            "o_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep], pa.int64()),
            "sum_qty_cents": pa.array(q[keep], pa.int64())})

    # the per-order aggregate emits schema-less empty blocks for empty
    # partitions at tiny scale, and the HAVING filter empties more —
    # strip both kinds before the join
    winners = drop_empty_blocks(
        drop_empty_blocks(per_order, empty_schema=win_schema).map_batches(
            having, batch_format="pyarrow"),
        empty_schema=win_schema)

    def orders_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "c_custkey": batch["o_custkey"].cast(pa.int64()),
            "o_orderdate": pa.array(
                np.datetime_as_string(od.astype("datetime64[D]")),
                pa.string()),
            "o_totalprice_cents": pa.array(
                _cents(np.asarray(batch["o_totalprice"], np.float64)),
                pa.int64())})

    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow")
    wo_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("sum_qty_cents", pa.int64()),
        ("c_custkey", pa.int64()), ("o_orderdate", pa.string()),
        ("o_totalprice_cents", pa.int64())])
    wo = drop_empty_blocks(
        winners.join(orders, join_type="inner", num_partitions=n_parts,
                     on=("o_orderkey",)),
        empty_schema=wo_schema)

    def cust_slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "c_name": batch["c_name"].cast(pa.string())})

    cust = customer_ds.map_batches(cust_slim, batch_format="pyarrow")
    full = wo.join(cust, join_type="inner", num_partitions=n_parts,
                   on=("c_custkey",))

    cols = ["o_orderkey", "o_custkey", "c_name", "o_orderdate",
            "o_totalprice_cents", "sum_qty_cents"]

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"c_custkey": "o_custkey"})
        df = df.sort_values(
            ["o_totalprice_cents", "o_orderkey"],
            ascending=[False, True], kind="stable").head(k)
        return pa.Table.from_pandas(df[cols], preserve_index=False)

    rows = full.map_batches(local_top, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["o_totalprice_cents"], r["o_orderkey"]))
    out = rows[:k]
    return pa.table({c: pa.array([r[c] for r in out]) for c in cols}) \
        if out else pa.table(
        {"o_orderkey": pa.array([], pa.int64()),
         "o_custkey": pa.array([], pa.int64()),
         "c_name": pa.array([], pa.string()),
         "o_orderdate": pa.array([], pa.string()),
         "o_totalprice_cents": pa.array([], pa.int64()),
         "sum_qty_cents": pa.array([], pa.int64())})


def priority_semi_counts(lineitem_ds, orders_ds, flag: str = "R",
                         lo: str = "1996-01-01", hi: str = "1997-01-01",
                         n_parts: int | None = None):
    """TPC-H Q4 shape adapted to the synthetic schema (it has no
    commitdate/receiptdate): per-priority count of orders in a date window
    having AT LEAST ONE lineitem with the given returnflag — a distributed
    EXISTS semi-join.

    Scale shape: the lineitem side reduces to DISTINCT orderkeys before
    any exchange (in-block ``np.unique`` per batch, then a fixed-width
    per-orderkey groupby — 8-byte rows only); the semi-join is then an
    inner ``Dataset.join`` against the date-filtered slim orders
    projection, exact because the left side is already unique per
    orderkey. The text/priority column never enters the wide exchange
    until after the join prunes to matching orders. Returns
    (o_orderpriority, order_count)."""
    import pandas as pd

    from ray.data.aggregate import Count

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)
    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    li_schema = pa.schema([("o_orderkey", pa.int64())])

    def li_keys(batch: pa.Table) -> pa.Table:
        rf = np.asarray(batch["l_returnflag"])
        ok = np.asarray(batch["l_orderkey"], np.int64)[rf == flag]
        return pa.table({"o_orderkey": pa.array(np.unique(ok), pa.int64())})

    # global distinct via the fixed-width groupby (one 8-B row per key
    # crosses; Count output is discarded — only the key matters); the
    # aggregate emits schema-less empty blocks for empty partitions at
    # tiny scale, which Acero's join rejects — strip them again
    keys = drop_empty_blocks(
        drop_empty_blocks(
            lineitem_ds.map_batches(li_keys, batch_format="pyarrow"),
            empty_schema=li_schema).groupby("o_orderkey").aggregate(
            Count(alias_name="_n")).map_batches(
            lambda b: b.select(["o_orderkey"]), batch_format="pyarrow"),
        empty_schema=li_schema)

    ord_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_orderpriority", pa.string())])

    def orders_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        keep = (od >= lo_us) & (od < hi_us)
        return pa.table({
            "o_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep], pa.int64()),
            "o_orderpriority": pa.array(
                np.asarray(batch["o_orderpriority"])[keep], pa.string())})

    orders = drop_empty_blocks(
        orders_ds.map_batches(orders_slim, batch_format="pyarrow"),
        empty_schema=ord_schema)
    semi = keys.join(orders, join_type="inner", num_partitions=n_parts,
                     on=("o_orderkey",))
    return semi.groupby("o_orderpriority").aggregate(
        Count(alias_name="order_count"))


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def promo_revenue(lineitem_ds, part_ds, lo: str = "1996-04-01",
                  hi: str = "1996-05-01", n_parts: int | None = None):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue earned by parts whose type starts with 'PROMO' — the
    engine's first lineitem ⋈ part join. One row, integer-exact:
    (promo_cents, total_cents, promo_ratio_ppm = floor(1e6·promo/total)).

    Scale shape: the shipdate window filters at the read boundary, then
    revenue pre-aggregates PER PARTKEY in-block (pandas groupby on the
    batch) so the partkey exchange carries one row per distinct partkey
    per batch, not per lineitem; part is fact-sized at high SF (SF·200k
    rows) so it joins as a partitioned hash join — only its (partkey,
    is_promo) projection, one int64 + one uint8 per row — and the final
    promo/total fold is a two-scalar per-batch partial."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .grouping import multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)

    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["l_shipdate"], "datetime64[us]")
        keep = (sd >= lo_us) & (sd < hi_us)
        if not keep.any():
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[keep]
            * (1 - np.asarray(batch["l_discount"], np.float64)[keep]))
        df = pd.DataFrame(
            {"l_partkey": np.asarray(batch["l_partkey"], np.int64)[keep],
             "rev": rev})
        g = df.groupby("l_partkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"l_partkey": pa.array(g["l_partkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    part = part_ds.map_batches(
        lambda b: pa.table({
            "p_partkey": b["p_partkey"].cast(pa.int64()),
            "is_promo": pa.array(
                [1 if (t or "").startswith("PROMO") else 0
                 for t in b["p_type"].to_pylist()], pa.int64())}),
        batch_format="pyarrow")
    joined = li.join(part, join_type="inner", num_partitions=n_parts,
                     on=("l_partkey",), right_on=("p_partkey",))

    def fold(batch: pa.Table) -> pa.Table:
        rev = np.asarray(batch["rev"], np.int64)
        promo = np.asarray(batch["is_promo"], np.int64)
        return pa.table({"promo": pa.array([int((rev * promo).sum())],
                                           pa.int64()),
                         "total": pa.array([int(rev.sum())], pa.int64())})

    tot = (joined.map_batches(fold, batch_format="pyarrow")
           .aggregate(Sum("promo", alias_name="p"),
                      Sum("total", alias_name="t")))
    p, t = int(tot["p"] or 0), int(tot["t"] or 0)
    if t == 0:
        raise ValueError("promo_revenue: no lineitems in the window")
    return pa.table({"promo_cents": pa.array([p], pa.int64()),
                     "total_cents": pa.array([t], pa.int64()),
                     "promo_ratio_ppm": pa.array([1_000_000 * p // t],
                                                 pa.int64())})


def customer_order_distribution(customer_ds, orders_ds,
                                n_parts: int | None = None):
    """TPC-H Q13 shape (customer distribution): how many customers
    placed exactly c orders, INCLUDING the zero-order customers the
    left join exists for. Returns (c_count, custdist) ordered custdist
    DESC, c_count DESC. (The spec's o_comment NOT LIKE filter is
    dropped — the synthetic orders table carries no comment column.)

    Scale shape: order counts pre-aggregate per custkey in-block before
    the custkey exchange; customer joins as keys-only (one int64 per
    row) in a partitioned LEFT OUTER hash join — null fills to zero in
    the next block pass — and the final distribution is a tiny
    groupby(c_count) Count (≤ max-orders-per-customer rows)."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    from .grouping import multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)

    def o_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": np.asarray(batch["o_custkey"], np.int64)})
        g = df.groupby("k", as_index=False).size()
        return pa.table({"o_custkey": pa.array(g["k"], pa.int64()),
                         "n": pa.array(g["size"], pa.int64())})

    from .grouping import drop_empty_blocks

    ocnt = drop_empty_blocks(
        orders_ds.map_batches(o_partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n")),
        empty_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n", pa.int64())]))
    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow")
    j = cust.join(ocnt, join_type="left_outer", num_partitions=n_parts,
                  on=("c_custkey",), right_on=("o_custkey",))

    def fill(batch: pa.Table) -> pa.Table:
        n = [v if v is not None else 0 for v in batch["n"].to_pylist()] \
            if "n" in batch.column_names else [0] * len(batch)
        return pa.table({"c_count": pa.array(n, pa.int64())})

    dist = (j.map_batches(fill, batch_format="pyarrow")
            .groupby("c_count").aggregate(Count(alias_name="custdist")))
    out = dist.take_all()
    out.sort(key=lambda r: (-r["custdist"], -r["c_count"]))
    return pa.table({
        "c_count": pa.array([r["c_count"] for r in out], pa.int64()),
        "custdist": pa.array([r["custdist"] for r in out], pa.int64()),
    })


def volume_shipping(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                    nation_tbl: pa.Table, nation1: str, nation2: str,
                    lo: str = "1995-01-01", hi: str = "1997-01-01",
                    n_parts: int | None = None):
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations per (supplier nation, customer nation, ship year) — both
    directions, supplier on the lineitem side and customer through
    orders. Returns (supp_nation, cust_nation, l_year, revenue_cents)
    sorted by the three keys.

    Scale shape — the Q5 discipline with BOTH dimension sides slimmed to
    the two target nations in-block before any exchange:

    - the two-nation nationkey→name map broadcasts via ``ray.put``;
    - supplier/customer project to (key, nation name) and PRE-FILTER to
      the pair, so each hash join only moves in-pair rows;
    - lineitem filters the shipdate window and projects
      (orderkey, suppkey, rev cents, year) in-block, then joins supplier
      on suppkey; orders (keys only) joins customer on custkey;
    - the orderkey join carries fixed-width rows; the cross-nation
      predicate (supp ≠ cust, both in the pair) filters in-block AFTER
      it; the final aggregate has ≤ 2 pair-directions × years groups."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)
    pair = {nk: nm for nk, nm in zip(nation_tbl["n_nationkey"].to_pylist(),
                                     nation_tbl["n_name"].to_pylist())
            if nm in (nation1, nation2)}
    if len(pair) != 2:
        raise ValueError(f"volume_shipping: nations {nation1}/{nation2} "
                         "not found")
    nref = ray.put(pair)
    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def li_slim(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["l_shipdate"], "datetime64[us]")
        keep = (sd >= lo_us) & (sd < hi_us)
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[keep]
            * (1 - np.asarray(batch["l_discount"], np.float64)[keep]))
        yr = sd[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": pa.array(
                np.asarray(batch["l_orderkey"], np.int64)[keep], pa.int64()),
            "l_suppkey": pa.array(
                np.asarray(batch["l_suppkey"], np.int64)[keep], pa.int64()),
            "rev": pa.array(rev, pa.int64()),
            "l_year": pa.array(yr, pa.int64())})

    def sup_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        keep = np.isin(nk, np.fromiter(nn.keys(), np.int64, len(nn)))
        return pa.table({
            "s_suppkey": pa.array(
                np.asarray(batch["s_suppkey"], np.int64)[keep], pa.int64()),
            "supp_nation": pa.array([nn[k] for k in nk[keep].tolist()],
                                    pa.string())})

    def cust_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        keep = np.isin(nk, np.fromiter(nn.keys(), np.int64, len(nn)))
        return pa.table({
            "c_custkey": pa.array(
                np.asarray(batch["c_custkey"], np.int64)[keep], pa.int64()),
            "cust_nation": pa.array([nn[k] for k in nk[keep].tolist()],
                                    pa.string())})

    out_schema = pa.schema([("supp_nation", pa.string()),
                            ("cust_nation", pa.string()),
                            ("l_year", pa.int64()),
                            ("revenue_cents", pa.int64())])

    li = lineitem_ds.map_batches(li_slim, batch_format="pyarrow")
    sup = drop_empty_blocks(
        supplier_ds.map_batches(sup_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("supp_nation", pa.string())]))
    # Ray 2.49's hash join crashes (Acero "No match ... FieldRef") when one
    # side is entirely empty: the shuffle ships no right-side block, so the
    # aggregator finalizes a schemaless partition. The slim sides are tiny
    # and already materialized by drop_empty_blocks, so counting is free —
    # an empty dimension side means an empty inner-join result.
    if sup.count() == 0:
        return out_schema.empty_table()
    ls = li.join(sup, join_type="inner", num_partitions=n_parts,
                 on=("l_suppkey",), right_on=("s_suppkey",))
    ls = drop_empty_blocks(
        ls.map_batches(
            lambda b: b.select(["l_orderkey", "rev", "l_year",
                                "supp_nation"]), batch_format="pyarrow"),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev", pa.int64()),
                                ("l_year", pa.int64()),
                                ("supp_nation", pa.string())]))

    orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                            "o_custkey": b["o_custkey"].cast(pa.int64())}),
        batch_format="pyarrow")
    cust = drop_empty_blocks(
        customer_ds.map_batches(cust_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("c_custkey", pa.int64()),
                                ("cust_nation", pa.string())]))
    if cust.count() == 0:
        return out_schema.empty_table()
    oc = orders.join(cust, join_type="inner", num_partitions=n_parts,
                     on=("o_custkey",), right_on=("c_custkey",))
    oc = drop_empty_blocks(
        oc.map_batches(
            lambda b: b.select(["o_orderkey", "cust_nation"]),
            batch_format="pyarrow"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("cust_nation", pa.string())]))

    j = ls.join(oc, join_type="inner", num_partitions=n_parts,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def cross_only(batch: pa.Table) -> pa.Table:
        sn = np.asarray(batch["supp_nation"])
        cn = np.asarray(batch["cust_nation"])
        keep = sn != cn
        return pa.table({
            "supp_nation": pa.array(sn[keep], pa.string()),
            "cust_nation": pa.array(cn[keep], pa.string()),
            "l_year": batch["l_year"].filter(pa.array(keep)),
            "rev": batch["rev"].filter(pa.array(keep))})

    agg = (j.map_batches(cross_only, batch_format="pyarrow")
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("rev", alias_name="revenue_cents")))
    out = agg.take_all()
    out.sort(key=lambda r: (r["supp_nation"], r["cust_nation"],
                            r["l_year"]))
    return pa.table({
        "supp_nation": pa.array([r["supp_nation"] for r in out],
                                pa.string()),
        "cust_nation": pa.array([r["cust_nation"] for r in out],
                                pa.string()),
        "l_year": pa.array([r["l_year"] for r in out], pa.int64()),
        "revenue_cents": pa.array([r["revenue_cents"] for r in out],
                                  pa.int64()),
    })


def market_share(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                 part_ds, nation_tbl: pa.Table, region_tbl: pa.Table,
                 target_nation: str, region: str, part_type: str,
                 lo: str = "1995-01-01", hi: str = "1997-01-01",
                 n_parts: int | None = None):
    """TPC-H Q8 shape (national market share): for one part type sold to
    customers of one region, the target nation's supplier share of yearly
    revenue. Returns (o_year, mkt_share_ppm, nation_cents, total_cents).

    Scale shape — the Q5 join discipline with every filter below its
    shuffle:

    - nation⋈region collapses driver-side: the region's nationkeys and
      the target nation's key broadcast as scalars/tiny arrays.
    - part pre-filters to the target type in-block → (partkey) only;
      lineitem projects (orderkey, partkey, suppkey, rev cents) and joins
      part on partkey FIRST (the most selective cut, ~1/#types of the
      fact rows survive).
    - supplier slims to (suppkey, is_target 0/1) — the share flag rides
      the join instead of a nation-name string.
    - orders date-filters in-block → (orderkey, custkey, o_year);
      customer pre-filters to the region → (custkey). Partitioned hash
      joins on custkey, then orderkey; only fixed-width int rows cross.
    - final aggregate: per-(year, flag) Sum of cents — ≤ 2·years groups;
      the ppm share is integer floor division on the driver's tiny
      result.

    Integer-exact throughout (cents + ppm), so a DuckDB oracle gates it
    bit-for-bit."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)
    rkey = dict(zip(region_tbl["r_name"].to_pylist(),
                    region_tbl["r_regionkey"].to_pylist()))
    if region not in rkey:
        raise ValueError(f"market_share: unknown region {region!r}")
    region_nkeys = np.array(
        [nk for nk, rk in zip(nation_tbl["n_nationkey"].to_pylist(),
                              nation_tbl["n_regionkey"].to_pylist())
         if rk == rkey[region]], dtype=np.int64)
    tkeys = [nk for nk, nm in zip(nation_tbl["n_nationkey"].to_pylist(),
                                  nation_tbl["n_name"].to_pylist())
             if nm == target_nation]
    if not tkeys:
        raise ValueError(f"market_share: unknown nation {target_nation!r}")
    target_key = int(tkeys[0])
    rn_ref = ray.put(region_nkeys)

    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    out_schema = pa.schema([("o_year", pa.int64()),
                            ("mkt_share_ppm", pa.int64()),
                            ("nation_cents", pa.int64()),
                            ("total_cents", pa.int64())])

    def part_slim(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["p_type"], part_type)
        return pa.table({"l_partkey":
                         batch["p_partkey"].filter(keep).cast(pa.int64())})

    def li_slim(batch: pa.Table) -> pa.Table:
        rev = _cents(np.asarray(batch["l_extendedprice"], np.float64)
                     * (1 - np.asarray(batch["l_discount"], np.float64)))
        return pa.table({
            "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "rev": pa.array(rev, pa.int64())})

    def sup_slim(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch["s_nationkey"], np.int64)
        return pa.table({
            "l_suppkey": batch["s_suppkey"].cast(pa.int64()),
            "is_target": pa.array((nk == target_key).astype(np.int64))})

    def orders_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        keep = (od >= lo_us) & (od < hi_us)
        yr = od[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": pa.array(
                np.asarray(batch["o_orderkey"], np.int64)[keep]),
            "o_custkey": pa.array(
                np.asarray(batch["o_custkey"], np.int64)[keep]),
            "o_year": pa.array(yr)})

    def cust_slim(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch["c_nationkey"], np.int64)
        keep = np.isin(nk, ray.get(rn_ref))
        return pa.table({"o_custkey": pa.array(
            np.asarray(batch["c_custkey"], np.int64)[keep])})

    part = drop_empty_blocks(
        part_ds.map_batches(part_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("l_partkey", pa.int64())]))
    if part.count() == 0:
        return out_schema.empty_table()
    li = lineitem_ds.map_batches(li_slim, batch_format="pyarrow")
    lp = li.join(part, join_type="inner", num_partitions=n_parts,
                 on=("l_partkey",)).map_batches(
        lambda b: b.select(["l_orderkey", "l_suppkey", "rev"]),
        batch_format="pyarrow")
    sup = supplier_ds.map_batches(sup_slim, batch_format="pyarrow")
    lps = lp.join(sup, join_type="inner", num_partitions=n_parts,
                  on=("l_suppkey",)).map_batches(
        lambda b: b.select(["l_orderkey", "rev", "is_target"]),
        batch_format="pyarrow")

    cust = drop_empty_blocks(
        customer_ds.map_batches(cust_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("o_custkey", pa.int64())]))
    if cust.count() == 0:
        return out_schema.empty_table()
    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner", num_partitions=n_parts,
                     on=("o_custkey",)).map_batches(
        lambda b: b.select(["l_orderkey", "o_year"]),
        batch_format="pyarrow")

    j = lps.join(oc, join_type="inner", num_partitions=n_parts,
                 on=("l_orderkey",))

    agg = (j.map_batches(
        lambda b: b.select(["o_year", "is_target", "rev"]),
        batch_format="pyarrow")
        .groupby(["o_year", "is_target"])
        .aggregate(Sum("rev", alias_name="cents")))
    rows = agg.take_all()  # ≤ 2 rows per year
    per_year: dict[int, list[int]] = {}
    for r in rows:
        ent = per_year.setdefault(int(r["o_year"]), [0, 0])
        ent[1] += int(r["cents"])
        if r["is_target"]:
            ent[0] += int(r["cents"])
    years = sorted(per_year)
    return pa.table({
        "o_year": pa.array(years, pa.int64()),
        "mkt_share_ppm": pa.array(
            [(per_year[y][0] * 1_000_000) // per_year[y][1]
             for y in years], pa.int64()),
        "nation_cents": pa.array([per_year[y][0] for y in years],
                                 pa.int64()),
        "total_cents": pa.array([per_year[y][1] for y in years],
                                pa.int64()),
    })


def top_supplier(lineitem_ds, supplier_ds, lo: str = "1996-01-01",
                 hi: str = "1996-04-01", n_parts: int | None = None):
    """TPC-H Q15 shape (top supplier): the supplier(s) with the maximum
    total revenue over a one-quarter shipdate window; ties all returned,
    sorted by suppkey. Returns (s_suppkey, s_name, total_revenue_cents).

    Scale shape: lineitem date-filters and pre-aggregates (suppkey,
    rev-cents) PER BATCH before the shuffle, so the groupby exchange
    carries at most #suppliers × #blocks partial rows; the global max is
    an O(#suppliers)→1 aggregate over that small table (never the fact
    table); the winner set (usually 1 row) joins supplier names via a
    partitioned hash join — supplier is fact-scaled at 100×SF, so no
    broadcast. Integer cents throughout."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .grouping import (drop_empty_blocks, multi_join_parts,
                           resolve_parts)

    if n_parts is None:
        n_parts = multi_join_parts(None)
    lo_us = np.datetime64(lo, "us")
    hi_us = np.datetime64(hi, "us")

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["l_shipdate"], "datetime64[us]")
        keep = (sd >= lo_us) & (sd < hi_us)
        rev = _cents(
            np.asarray(batch["l_extendedprice"], np.float64)[keep]
            * (1 - np.asarray(batch["l_discount"], np.float64)[keep]))
        sk = np.asarray(batch["l_suppkey"], np.int64)[keep]
        df = pd.DataFrame({"k": sk, "r": rev}).groupby(
            "k", as_index=False).sum()
        return pa.table({"s_suppkey": pa.array(df["k"], pa.int64()),
                         "rev": pa.array(df["r"], pa.int64())})

    per_supp = drop_empty_blocks(
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
        .groupby("s_suppkey").aggregate(
            Sum("rev", alias_name="total_revenue_cents")),
        empty_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("total_revenue_cents", pa.int64())]))
    if per_supp.count() == 0:
        return pa.schema([("s_suppkey", pa.int64()),
                          ("s_name", pa.string()),
                          ("total_revenue_cents", pa.int64())]).empty_table()
    best = per_supp.max("total_revenue_cents")
    winners = per_supp.filter(
        lambda r: r["total_revenue_cents"] == best)
    names = supplier_ds.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                            "s_name": b["s_name"]}),
        batch_format="pyarrow")
    out = drop_empty_blocks(
        winners, empty_schema=pa.schema(
            [("s_suppkey", pa.int64()),
             ("total_revenue_cents", pa.int64())])).join(
        names, join_type="inner", num_partitions=n_parts,
        on=("s_suppkey",))
    rows = out.take_all()  # winner set: ~1 row
    rows.sort(key=lambda r: r["s_suppkey"])
    return pa.table({
        "s_suppkey": pa.array([r["s_suppkey"] for r in rows], pa.int64()),
        "s_name": pa.array([r["s_name"] for r in rows], pa.string()),
        "total_revenue_cents": pa.array(
            [r["total_revenue_cents"] for r in rows], pa.int64()),
    })


def small_quantity_revenue(lineitem_ds, part_ds, brand: str,
                           n_parts: int | None = None):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems of one brand whose quantity is below 1/5 of that part's
    average order quantity — the lost-revenue probe for a tighter
    small-order policy. Returns one row
    (p_brand, qualifying_rows, revenue_cents, avg_yearly_cents).

    Scale shape: part pre-filters to the brand in-block → (partkey);
    lineitem projects (partkey, qty cents, rev cents) and hash-joins the
    brand's parts FIRST (≈1/#brands of fact rows survive); per-part
    (count, Σqty) reduces through per-batch partials → a small groupby;
    the stats then hash-join BACK on partkey (never broadcast — one
    brand's part set is still fact-scaled at 100×SF) and the correlated
    predicate runs in-block as the pure-integer cross-multiplication
    ``5·n·qty_cents < Σqty_cents`` (exactly ``qty < avg/5``, no float
    division). The final reduce is one global Sum."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    from .grouping import drop_empty_blocks, multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)

    out_schema = pa.schema([("p_brand", pa.string()),
                            ("qualifying_rows", pa.int64()),
                            ("revenue_cents", pa.int64()),
                            ("avg_yearly_cents", pa.int64())])

    def part_slim(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["p_brand"], brand)
        return pa.table({"l_partkey":
                         batch["p_partkey"].filter(keep).cast(pa.int64())})

    def li_slim(batch: pa.Table) -> pa.Table:
        qc = _cents(np.asarray(batch["l_quantity"], np.float64))
        rev = _cents(np.asarray(batch["l_extendedprice"], np.float64))
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "qc": pa.array(qc, pa.int64()),
            "rev": pa.array(rev, pa.int64())})

    part = drop_empty_blocks(
        part_ds.map_batches(part_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("l_partkey", pa.int64())]))
    if part.count() == 0:
        return pa.table({"p_brand": pa.array([brand], pa.string()),
                         "qualifying_rows": pa.array([0], pa.int64()),
                         "revenue_cents": pa.array([0], pa.int64()),
                         "avg_yearly_cents": pa.array([0], pa.int64())},
                        schema=out_schema)
    li = lineitem_ds.map_batches(li_slim, batch_format="pyarrow")
    lp = li.join(part, join_type="inner", num_partitions=n_parts,
                 on=("l_partkey",)).materialize()

    def st_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": np.asarray(batch["l_partkey"], np.int64),
                           "q": np.asarray(batch["qc"], np.int64)})
        g = df.groupby("k", as_index=False).agg(n=("q", "size"),
                                                sq=("q", "sum"))
        return pa.table({"l_partkey": pa.array(g["k"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64()),
                         "sq": pa.array(g["sq"], pa.int64())})

    st = drop_empty_blocks(
        lp.map_batches(st_partial, batch_format="pyarrow")
        .groupby("l_partkey").aggregate(Sum("n", alias_name="n"),
                                        Sum("sq", alias_name="sq")),
        empty_schema=pa.schema([("l_partkey", pa.int64()),
                                ("n", pa.int64()), ("sq", pa.int64())]))
    if st.count() == 0:
        return pa.table({"p_brand": pa.array([brand], pa.string()),
                         "qualifying_rows": pa.array([0], pa.int64()),
                         "revenue_cents": pa.array([0], pa.int64()),
                         "avg_yearly_cents": pa.array([0], pa.int64())},
                        schema=out_schema)
    j = lp.join(st, join_type="inner", num_partitions=n_parts,
                on=("l_partkey",))

    def qualify(batch: pa.Table) -> pa.Table:
        qc = np.asarray(batch["qc"], np.int64)
        n = np.asarray(batch["n"], np.int64)
        sq = np.asarray(batch["sq"], np.int64)
        # 5·n·qc < Σqc exactly ⇔ qc < avg/5; object dtype only if the
        # product could overflow int64 — guard like the intexact family
        if len(qc) and (5 * n.astype(np.float64) * qc.astype(np.float64)
                        ).max() >= 2 ** 62:
            raise ValueError("small_quantity_revenue: cross-multiply "
                             "would overflow int64")
        keep = 5 * n * qc < sq
        return pa.table({
            "rows": pa.array([int(keep.sum())], pa.int64()),
            "rev": pa.array(
                [int(np.asarray(batch["rev"], np.int64)[keep].sum())],
                pa.int64())})

    agg = j.map_batches(qualify, batch_format="pyarrow") \
        .aggregate(Sum("rows", alias_name="rows"),
                   Sum("rev", alias_name="rev"))
    rows = int(agg["rows"] or 0)
    rev = int(agg["rev"] or 0)
    return pa.table({"p_brand": pa.array([brand], pa.string()),
                     "qualifying_rows": pa.array([rows], pa.int64()),
                     "revenue_cents": pa.array([rev], pa.int64()),
                     "avg_yearly_cents": pa.array([rev // 7], pa.int64())},
                    schema=out_schema)


def product_profit(lineitem_ds, orders_ds, part_ds, supplier_ds,
                   nation_tbl: pa.Table, name_like: str = "widget",
                   n_parts: int | None = None):
    """TPC-H Q9 shape (product-type profit): profit per (supplier
    nation, order year) over parts whose name contains ``name_like``.
    The schema here has no partsupp, so supply cost is the documented
    stand-in ``0.6 × p_retailprice`` (unit_cost_cents =
    floor(60·retail + 0.5)); profit = Σ rev_cents − unit_cost_cents·qty
    — integer-exact end to end, so the oracle replays it.

    Scale shape (the Q5/Q7 discipline): lineitem projects
    (orderkey, suppkey, partkey, rev, qty) in-block; part PRE-FILTERS
    to the name match and carries only (partkey, unit_cost) into the
    first hash join, so non-matching lineitems drop at the earliest
    exchange; supplier slims to (suppkey, nation name) with the 25-row
    nation map broadcast via ``ray.put``; orders carries (orderkey,
    year). Three stacked joins at the multi-join width; the final
    aggregate has ≤ nations × years groups. Returns
    (nation, o_year, profit_cents)."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import drop_empty_blocks, multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)
    nmap = {nk: nm for nk, nm in zip(nation_tbl["n_nationkey"].to_pylist(),
                                     nation_tbl["n_name"].to_pylist())}
    nref = ray.put(nmap)

    def li_slim(batch: pa.Table) -> pa.Table:
        rev = _cents(np.asarray(batch["l_extendedprice"], np.float64)
                     * (1 - np.asarray(batch["l_discount"], np.float64)))
        qty = np.floor(np.asarray(batch["l_quantity"], np.float64)
                       + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "rev": pa.array(rev, pa.int64()),
            "qty": pa.array(qty, pa.int64())})

    def part_slim(batch: pa.Table) -> pa.Table:
        names = batch["p_name"].to_pylist()
        keep = np.array([name_like in (nm or "") for nm in names])
        cost = np.floor(
            np.asarray(batch["p_retailprice"], np.float64) * 60.0
            + 0.5).astype(np.int64)
        return pa.table({
            "p_partkey": pa.array(
                np.asarray(batch["p_partkey"], np.int64)[keep], pa.int64()),
            "unit_cost": pa.array(cost[keep], pa.int64())})

    def sup_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        return pa.table({
            "s_suppkey": batch["s_suppkey"].cast(pa.int64()),
            "nation": pa.array([nn[k] for k in nk.tolist()], pa.string())})

    def ord_slim(batch: pa.Table) -> pa.Table:
        od = np.asarray(batch["o_orderdate"], "datetime64[us]")
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_year": pa.array(
                od.astype("datetime64[Y]").astype(np.int64) + 1970,
                pa.int64())})

    part = drop_empty_blocks(
        part_ds.map_batches(part_slim, batch_format="pyarrow"),
        empty_schema=pa.schema([("p_partkey", pa.int64()),
                                ("unit_cost", pa.int64())]))
    out_schema = pa.schema([("nation", pa.string()),
                            ("o_year", pa.int64()),
                            ("profit_cents", pa.int64())])
    if part.count() == 0:
        return out_schema.empty_table()
    j = (lineitem_ds.map_batches(li_slim, batch_format="pyarrow")
         .join(part, join_type="inner", num_partitions=n_parts,
               on=("l_partkey",), right_on=("p_partkey",)))
    j = j.join(supplier_ds.map_batches(sup_slim, batch_format="pyarrow"),
               join_type="inner", num_partitions=n_parts,
               on=("l_suppkey",), right_on=("s_suppkey",))
    j = j.join(orders_ds.map_batches(ord_slim, batch_format="pyarrow"),
               join_type="inner", num_partitions=n_parts,
               on=("l_orderkey",), right_on=("o_orderkey",))

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        profit = (np.asarray(batch["rev"], np.int64)
                  - np.asarray(batch["unit_cost"], np.int64)
                  * np.asarray(batch["qty"], np.int64))
        df = pd.DataFrame({
            "nation": batch["nation"].to_pylist(),
            "o_year": np.asarray(batch["o_year"], np.int64),
            "p": profit})
        g = df.groupby(["nation", "o_year"], as_index=False).agg(
            p=("p", "sum"))
        return pa.table({"nation": pa.array(g["nation"], pa.string()),
                         "o_year": pa.array(g["o_year"].astype("int64")),
                         "p": pa.array(g["p"].astype("int64"))})

    return (j.map_batches(partials, batch_format="pyarrow")
            .groupby(["nation", "o_year"])
            .aggregate(Sum("p", alias_name="profit_cents")))


def global_sales_opportunity(customer_ds, orders_ds, nation_tbl: pa.Table,
                             nationkeys: tuple = (0, 5, 10, 15, 20),
                             n_parts: int | None = None):
    """TPC-H Q22 shape (global sales opportunity): customers of a
    nation subset with an account balance above the subset's positive
    mean who have NEVER ordered — count and total balance per nation.
    The mean predicate is INTEGER-EXACT: ``bal > mean(pos)`` restated
    as ``bal_cents · n_pos > sum_pos_cents`` (no float average crosses
    the comparison), so the oracle gates it bit-for-bit.

    Scale shape: pass 1 reduces the subset's positive balances to two
    scalars (per-batch partials → one Sum aggregate); pass 2 filters
    candidates in-block with the broadcast scalars; the NO-ORDERS
    anti join runs as a left_outer hash join against the DISTINCT
    order custkeys (in-batch unique partials → groupby) with a
    null-marker filter — the ``sitemap_coverage`` trick, fixed-width
    rows only. Returns (nation, numcust, totacctbal_cents)."""
    import ray

    from ray.data.aggregate import Sum

    from .grouping import drop_empty_blocks, multi_join_parts

    if n_parts is None:
        n_parts = multi_join_parts(None)
    keys = set(int(k) for k in nationkeys)
    nmap = {nk: nm for nk, nm in zip(nation_tbl["n_nationkey"].to_pylist(),
                                     nation_tbl["n_name"].to_pylist())
            if nk in keys}
    nref = ray.put(nmap)

    def cust_slim(batch: pa.Table) -> pa.Table:
        nn = ray.get(nref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        keep = np.isin(nk, np.fromiter(nn.keys(), np.int64, len(nn)))
        cents = _cents(np.asarray(batch["c_acctbal"], np.float64)[keep])
        return pa.table({
            "c_custkey": pa.array(
                np.asarray(batch["c_custkey"], np.int64)[keep], pa.int64()),
            "nation": pa.array([nn[k] for k in nk[keep].tolist()],
                               pa.string()),
            "bal_cents": pa.array(cents, pa.int64())})

    cust = customer_ds.map_batches(
        cust_slim, batch_format="pyarrow").materialize()

    def pos_partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["bal_cents"], np.int64)
        pos = c[c > 0]
        return pa.table({"n": pa.array([len(pos)], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64())})

    agg = (cust.map_batches(pos_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))
    n_pos, sum_pos = int(agg["n"] or 0), int(agg["s"] or 0)
    out_schema = pa.schema([("nation", pa.string()),
                            ("numcust", pa.int64()),
                            ("totacctbal_cents", pa.int64())])
    if n_pos == 0:
        return out_schema.empty_table()

    def candidates(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["bal_cents"], np.int64)
        keep = c * n_pos > sum_pos        # bal > mean(pos), integer-exact
        return batch.filter(pa.array(keep))

    cand = drop_empty_blocks(
        cust.map_batches(candidates, batch_format="pyarrow"),
        empty_schema=pa.schema([("c_custkey", pa.int64()),
                                ("nation", pa.string()),
                                ("bal_cents", pa.int64())]))
    if cand.count() == 0:
        return out_schema.empty_table()

    def okeys(batch: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(batch["o_custkey"], np.int64))
        return pa.table({"o_custkey": pa.array(u, pa.int64()),
                         "has_order": pa.array(np.ones(len(u), np.int64),
                                               pa.int64())})

    ordered = drop_empty_blocks(
        orders_ds.map_batches(okeys, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("has_order",
                                            alias_name="has_order")),
        empty_schema=pa.schema([("o_custkey", pa.int64()),
                                ("has_order", pa.int64())]))
    j = cand.join(ordered, join_type="left_outer", num_partitions=n_parts,
                  on=("c_custkey",), right_on=("o_custkey",))

    def fold(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        no_order = pc.is_null(batch["has_order"])
        t = batch.filter(no_order)
        df = pd.DataFrame({"nation": t["nation"].to_pylist(),
                           "c": 1,
                           "b": np.asarray(t["bal_cents"], np.int64)})
        g = df.groupby("nation", as_index=False).agg(c=("c", "sum"),
                                                     b=("b", "sum"))
        return pa.table({"nation": pa.array(g["nation"], pa.string()),
                         "c": pa.array(g["c"].astype("int64")),
                         "b": pa.array(g["b"].astype("int64"))})

    return (j.map_batches(fold, batch_format="pyarrow")
            .groupby("nation")
            .aggregate(Sum("c", alias_name="numcust"),
                       Sum("b", alias_name="totacctbal_cents")))
