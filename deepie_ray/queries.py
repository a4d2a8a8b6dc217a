"""Driver-facing query registry: every implemented operator/pipeline as
a callable(sf_dir) -> Dataset/DataFrame/Table, with a DuckDB oracle-SQL
twin where the semantics are SQL-expressible (see ``ORACLE_SQL``).

Parity rules (driver hashes values after sorting columns by name):
* identical column names in Ray results and SQL aliases;
* counts are int64 both sides; aggregate doubles are rounded to 2 dp
  AFTER aggregation on both sides; averages are not emitted (sum+count
  instead) — exact-half rounding of power-of-two denominators is the
  one case where numpy (half-even) and DuckDB (half-away) disagree;
* window starts are int64 epoch seconds (no timestamp-zone hazards).

Scale rules: every read prunes columns; every groupby is preceded by a
per-batch partial aggregate; genuinely fixed-size sides (nation/region,
post-top-k key lists) broadcast, while sf-scaled sides (customer,
supplier) go through hash-partitioned Dataset.joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min, Sum

from .hashing import md5_hex, ws_tokens
from .ops import ann, dedup, joins, text, window
from .ops import agg as agg_ops
from .ops.agg import grouped_count


def _fp_roundtrip(t: pa.Table) -> pa.Table:
    """(doc_id, text, ...) -> (doc_id, fingerprint) md5 rows shared by
    the export round-trip checks — hashes the Arrow string buffer's
    utf-8 slices directly (ops/dedup._md5_hex_utf8_slices), no per-row
    str materialization."""
    from .ops.dedup import _md5_hex_utf8_slices

    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "fingerprint": pa.array(_md5_hex_utf8_slices(col), pa.string()),
        }
    )


def _blocks(sf_dir: str, table: str) -> int | None:
    """Scale-keyed ``override_num_blocks`` for a table read (round-4
    verdict #6): the benchmark-scale count for small inputs, ``None``
    (Ray's 128 MiB size-based default) once the file splits itself."""
    from .tuning import override_blocks_for

    return override_blocks_for(f"{sf_dir}/{table}.parquet")


def _lineitem(sf_dir: str, cols: list[str]) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=cols,
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )


def _read(sf_dir: str, table: str, cols: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=cols,
        override_num_blocks=_blocks(sf_dir, table),
    )


def _round2(x) -> pa.Array:
    """Correctly-rounded 2dp doubles.  NOT ``pc.round``: the Arrow
    kernel computes x*100->rint->/100 and lands a ulp off the canonical
    double ~8% of the time (measured), which breaks bitwise value-hash
    comparison against DuckDB's correctly-rounded ``round()``.  Python
    ``round`` is correctly rounded.  Only ever applied to final (small)
    aggregate columns."""
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    return pa.array(
        [None if v is None else round(v, 2) for v in x.to_pylist()], pa.float64()
    )


def _round2_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if pd.isna(v) else round(float(v), 2))


# --------------------------------------------------------------- relational


# Bloom semi-join pushdown for q5.  MEASURED at sf0.1/32cpus
# (interleaved best-of-2, one session): OFF 6.55s vs ON 7.31s — at
# bench scale the fixed costs (Bloom build pass + filter pool) exceed
# the ~5x shuffle-volume saving on a 600k-row lineitem; at 100 TB the
# trade flips (the pruned shuffle dominates, the filter stays a
# fixed-size broadcast).  SCALE-KEYED (round-4 verdict #6): the
# decision derives from the lineitem input size, so the same code
# path is optimal at both scales.  Override: set Q5_BLOOM_PUSHDOWN to
# True/False, or env DEEPIE_Q5_BLOOM=0/1.  The operator itself
# (ops/joins.bloom_filter_keys / bloom_prefilter) is first-class and
# join-equality + no-false-negative tested either way.
Q5_BLOOM_PUSHDOWN: bool | None = None  # None = derive from input size
Q5_BLOOM_MIN_BYTES = 256 * 1024 * 1024  # ~sf2+ lineitem; sf0.1 is ~11 MB


def _q5_bloom_enabled(sf_dir: str) -> bool:
    import os

    env = os.environ.get("DEEPIE_Q5_BLOOM")
    if env is not None:
        return env.lower() not in ("", "0", "false", "off")
    if Q5_BLOOM_PUSHDOWN is not None:
        return Q5_BLOOM_PUSHDOWN
    if "://" in sf_dir:
        # remote object storage is the at-scale deployment: the
        # pruned shuffle dominates there, so the Bloom is ON
        return True
    try:
        return os.path.getsize(f"{sf_dir}/lineitem.parquet") >= Q5_BLOOM_MIN_BYTES
    except OSError:
        return False


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: grouped pricing sums over lineitem."""
    ds = _lineitem(
        sf_dir,
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ([], "count_all"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["l_quantity_sum"],
                "sum_base_price": g["l_extendedprice_sum"],
                "sum_disc_price": g["disc_price_sum"],
                "count_order": g["count_all"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": _round2(t["sum_qty"]),
                "sum_base_price": _round2(t["sum_base_price"]),
                "sum_disc_price": _round2(t["sum_disc_price"]),
                "count_order": pc.cast(t["count_order"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q3_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """Top-10 BUILDING-segment orders by lineitem revenue (join +
    grouped agg + global top-k).

    Scale shape: the BUILDING customer subset is ~1/5 of an sf-scaled
    table, so it is NOT driver-sized — the orders|x|customer semi-join
    is a hash-partitioned Dataset.join (customer keys are unique, so an
    inner join on the key column IS the semi-join), never a driver
    ``to_pandas`` broadcast."""
    # predicate pushed into the parquet read: only BUILDING keys leave storage
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=(pc.field("c_mktsegment") == "BUILDING"),
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    keep = joins.hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
    )
    li = _lineitem(sf_dir, ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        g = (
            pa.table({"l_orderkey": t["l_orderkey"], "r": r})
            .group_by("l_orderkey")
            .aggregate([("r", "sum")])
        )
        return pa.table({"o_orderkey": g["l_orderkey"], "revenue": g["r_sum"]})

    li_rev = li.map_batches(rev, batch_format="pyarrow")
    joined = joins.hash_join(
        li_rev,
        # repartition: the first join emits zero-column blocks for empty
        # hash partitions; merging blocks restores one schema pre-join
        keep.select_columns(["o_orderkey"]).repartition(8),
        on="o_orderkey",
        num_partitions=8,
    )
    agg = joined.groupby("o_orderkey").aggregate(Sum("revenue", alias_name="revenue"))
    top = agg.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(10)
    df = top.to_pandas()
    df["revenue"] = _round2_series(df["revenue"])
    return df[["o_orderkey", "revenue"]]


def q5_region_revenue(sf_dir: str) -> rd.Dataset:
    """Multi-join star query: revenue by nation for region AMERICA where
    customer and supplier share the nation (TPC-H Q5 shape).

    Scale shape: nation/region are genuinely fixed-size (25/5 rows) and
    stay driver-broadcast; customer and supplier SCALE WITH THE CORPUS,
    so both go through hash-partitioned Dataset.joins — customer into
    orders on custkey, supplier into the lineitem join on suppkey.  The
    AMERICA nation-key filter is pushed into the customer parquet read
    so only the region's customers leave storage."""
    use_bloom = _q5_bloom_enabled(sf_dir)
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    nk = nation.merge(
        region[region.r_name == "AMERICA"], left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name"]]
    nation_keys = nk["n_nationkey"].tolist()
    name_of = dict(zip(nk["n_nationkey"], nk["n_name"]))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=(pc.field("c_nationkey").isin(nation_keys)),
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    ordersc = (
        joins.hash_join(
            orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
        )
        .select_columns(["o_orderkey", "c_nationkey"])
        .repartition(8)  # merge empty join-output blocks before the next join
    )
    if use_bloom:
        # two consumers (Bloom build + the lineitem join): pin once
        ordersc = ordersc.materialize()

    li = _lineitem(
        sf_dir, ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    # Bloom semi-join pushdown (round 4): only ~1/5 of orders survive
    # the AMERICA customer join, so a fixed-size Bloom of the surviving
    # orderkeys prunes lineitem BEFORE the big hash join — shuffle
    # volume drops ~5x; false positives are dropped by the join itself
    if use_bloom:
        okeys_bloom = joins.bloom_filter_keys(
            ordersc.select_columns(["o_orderkey"]), "o_orderkey"
        )
        li = joins.bloom_prefilter(li, "l_orderkey", okeys_bloom)
    lo = joins.hash_join(
        li, ordersc, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    ).repartition(8)  # same guard for the join-into-join chain below
    # pushdown: the final c_nationkey == s_nationkey filter can only
    # keep AMERICA suppliers, so prune them at the parquet read like
    # the customer side (round 4; 5x fewer supplier rows in the join)
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=(pc.field("s_nationkey").isin(nation_keys)),
    )
    # combiner BEFORE the supplier join (round 4): revenue only needs
    # (l_suppkey, c_nationkey) granularity downstream, so pre-aggregate
    # the lineitem-sized stream to supplier x nation partials map-side
    # — join #3's shuffle then moves ~|suppliers|x|region nations| rows
    # instead of ~|lineitem| rows
    def pre_agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "l_suppkey": pd.Series([], dtype=np.int64),
                    "c_nationkey": pd.Series([], dtype=np.int32),
                    "revenue": pd.Series([], dtype=np.float64),
                }
            )
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            pd.DataFrame(
                {
                    "l_suppkey": df["l_suppkey"],
                    "c_nationkey": df["c_nationkey"],
                    "revenue": rev,
                }
            )
            .groupby(["l_suppkey", "c_nationkey"], sort=False, as_index=False)[
                "revenue"
            ]
            .sum()
        )
        return g

    lo_agg = lo.map_batches(pre_agg, batch_format="pandas").repartition(4)
    los = joins.hash_join(
        lo_agg, supp, on="l_suppkey", right_on="s_suppkey", num_partitions=4
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"] == df["s_nationkey"]]
        if df.empty:
            return pd.DataFrame({"n_name": pd.Series([], dtype=str), "revenue": []})
        names = df["c_nationkey"].map(name_of)
        out = df["revenue"].groupby(names).sum().reset_index()
        out.columns = ["n_name", "revenue"]
        return out

    agg = (
        los.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return agg.map_batches(
        lambda t: pa.table({"n_name": t["n_name"], "revenue": _round2(t["revenue"])}),
        batch_format="pyarrow",
    )


def agg_orders_by_status(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderstatus").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "total_price": g["o_totalprice_sum"],
                "n_orders": g["count_all"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("total_price", alias_name="total_price"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "total_price": _round2(t["total_price"]),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def top10_customers_by_spend(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_totalprice", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "spend": g["o_totalprice_sum"]})

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("spend", alias_name="spend"))
    )
    top = agg.sort(["spend", "o_custkey"], descending=[True, False]).limit(10)
    df = top.to_pandas()
    # label AFTER the top-k: only the 10 winning keys are pushed into
    # the customer read (predicate pushdown) — the sf-scaled customer
    # table never reaches the driver
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filter=(pc.field("c_custkey").isin(df["o_custkey"].tolist())),
    ).to_pandas()
    df = df.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df["spend"] = _round2_series(df["spend"])
    return df[["c_custkey", "c_name", "spend"]]


def filter_highvalue_orders(sf_dir: str) -> rd.Dataset:
    """Predicate pushdown + projection: orders above 450k."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") > 450000.0),
    )
    return ds


def part_brand_stats(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("p_brand").aggregate(
            [("p_retailprice", "sum"), ("p_size", "max"), ([], "count_all")]
        )
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "sum_price": g["p_retailprice_sum"],
                "max_size": g["p_size_max"],
                "n_parts": g["count_all"],
            }
        )

    from ray.data.aggregate import Max

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("sum_price", alias_name="sum_price"),
            Max("max_size", alias_name="max_size"),
            Sum("n_parts", alias_name="n_parts"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "sum_price": _round2(t["sum_price"]),
                "max_size": pc.cast(t["max_size"], pa.int32()),
                "n_parts": pc.cast(t["n_parts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def distinct_mktsegments(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    return (
        ds.map_batches(
            lambda t: pa.table(
                {"c_mktsegment": pc.unique(t["c_mktsegment"].combine_chunks())}
            ),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .count()
        .select_columns(["c_mktsegment"])
    )


def supplier_nation_balance(sf_dir: str) -> pd.DataFrame:
    """Balance totals per nation.  Scale shape: supplier is sf-scaled,
    so the aggregation runs distributed (combiner-first per-batch
    partials -> grouped sum over at most 25 nation keys); only the
    fixed-size nation table and the 25-row aggregate touch the driver."""
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("s_nationkey").aggregate(
            [("s_acctbal", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "s_nationkey": g["s_nationkey"],
                "total_balance": g["s_acctbal_sum"],
                "n_suppliers": g["count_all"],
            }
        )

    agg = (
        supp.map_batches(partial, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(
            Sum("total_balance", alias_name="total_balance"),
            Sum("n_suppliers", alias_name="n_suppliers"),
        )
    )
    out = agg.to_pandas()  # <= 25 rows (one per nation)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = out.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    out = out[["n_name", "total_balance", "n_suppliers"]]
    out["total_balance"] = _round2_series(out["total_balance"])
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out


# ----------------------------------------------------------------- events


def events_tumbling_1h(sf_dir: str) -> rd.Dataset:
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    agg = window.tumbling_aggregate(ev, "event_type", "ts", 3600, "value")
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.cast(t["window_start"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": _round2(t["sum_value"]),
            }
        ),
        batch_format="pyarrow",
    )


def events_sliding_1h_30m(sf_dir: str) -> rd.Dataset:
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    agg = window.sliding_aggregate(ev, "event_type", "ts", 3600, 1800, "value")
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.cast(t["window_start"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": _round2(t["sum_value"]),
            }
        ),
        batch_format="pyarrow",
    )


def events_sessions(sf_dir: str) -> rd.Dataset:
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    sess = window.sessionize(ev, "user_id", "ts", 1800)
    return sess.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def events_topk_users(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["user_id"])
    agg = grouped_count(ev, ["user_id"], "n_events")
    top = agg.sort(["n_events", "user_id"], descending=[True, False]).limit(10)
    df = top.to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    return df[["user_id", "n_events"]]


def asof_events_orders(sf_dir: str) -> rd.Dataset:
    """Backward as-of join: each event matched to the user's latest
    order at-or-before the event time.  Round-4: routed through the
    bucketed merge_asof path (ops/joins.asof_join_merge) — one
    union + one key-bucket shuffle + vectorized per-bucket merge_asof,
    never materializing the |events| x |orders-per-user| expansion the
    join+argmax path pays.  The argmax path remains the tested
    alternative (equality pinned in tests)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
            }
        ),
        batch_format="pyarrow",
    )
    return joins.asof_join_merge(
        ev,
        orders,
        key="user_id",
        left_id="event_id",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_break="o_orderkey",
        num_partitions=8,
    )


def range_events_burst(sf_dir: str) -> rd.Dataset:
    """Interval SELF-join (burst detection): per event, how many
    earlier events the same user fired in the preceding hour (equi-join
    on user + vectorized range filter + combiner-first count;
    zero-match events kept)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    right = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table({"user_id": t["user_id"], "ts_r": t["ts"]}),
        batch_format="pyarrow",
    )
    return joins.range_join_count(
        ev, right,
        key="user_id", left_id="event_id",
        left_ts="ts", right_ts="ts_r",
        lo_s=-3600, hi_s=0, hi_exclusive=True,
    )


def top3_orders_per_customer(sf_dir: str) -> rd.Dataset:
    """Per-key top-k (window-function shape): each customer's 3 most
    expensive orders.  THREE-level: per-batch top-3 per key (combiner),
    salted per-(key, salt) top-3 (a hot key's per-block partials fan
    out over 16 reducers instead of one), then the final per-key top-3
    — final-merge state is bounded by 3 x salt buckets, not by block
    count.  Top-k is associative, so the tree shape changes nothing."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(df: pd.DataFrame, by_key: bool) -> pd.DataFrame:
        s = df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        return s.groupby("o_custkey", sort=False).head(3) if by_key else s.head(3)

    from .ops.agg import sorted_grouped_head

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df, by_key=True)[
            ["o_custkey", "o_orderkey", "o_totalprice"]
        ]

    # sorted_grouped_head, NOT two map_groups levels: 150k customer
    # groups cost one Python call each per level (10.6s at sf0.1);
    # one sort + per-block numpy ranking is ~2s, and the per-batch
    # combiner keeps the sort to <= 3 rows per (key, block).  Hot-key
    # safety without salting: the combiner already bounds any key's
    # sort input to 3 x n_blocks rows.
    return sorted_grouped_head(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        ["o_totalprice", "o_orderkey"],
        [True, False],
        k=3,
        rank_col="rank",
    )


def events_distinct_users(sf_dir: str) -> rd.Dataset:
    """Exact grouped count-distinct: per-batch distinct pairs, then a
    distinct shuffle, then a grouped count."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return g

    distinct = (
        ev.map_batches(pairs, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()
    )

    def count_users(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "n_partial": g["count_all"]})

    return (
        distinct.map_batches(count_users, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_partial", alias_name="n_users"))
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "n_users": pc.cast(t["n_users"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def events_approx_distinct_users(sf_dir: str) -> rd.Dataset:
    """KMV-sketch grouped distinct count.  k=4096 exceeds the user
    cardinality at test scales, so the sketch degenerates to EXACT and
    the DuckDB count(DISTINCT) oracle verifies the whole machinery; at
    real scale k bounds per-key state and the answer is ±1.6%."""
    from .ops.sketch import grouped_approx_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_approx_distinct(ev, "event_type", "user_id", k=4096)
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "approx_distinct": pc.cast(t["approx_distinct"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def events_median_value(sf_dir: str) -> rd.Dataset:
    """Grouped median via the mergeable quantile sketch (ops/sketch.py):
    per-block partials, grouped merge — no task ever gathers a whole
    group's raw values.  EXACT below the sketch cap (all test scales),
    so the DuckDB quantile_cont oracle verifies it; linear interpolation
    matches numpy/DuckDB."""
    from .ops.sketch import grouped_quantile

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile(ev, "event_type", "value", q=0.5)


# ------------------------------------------------------------------- text


def text_token_counts(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.token_count_batch, batch_format="pyarrow")


def text_quality(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.quality_batch, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.fingerprint_batch, batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Per-doc top-3 terms by tf-idf -> (doc_id, rank, term, tf, score).

    Integer scoring so the DuckDB oracle value-hashes exactly:
    ``score = tf * ((n_docs * 1e6) // df)`` — monotone in the usual
    tf/df ordering, no float logs to round.

    Scale shape: term frequencies are computed entirely inside each
    doc's batch (docs are rows — zero shuffle); document frequency is a
    combiner-first grouped sum over narrow (term, count) rows; the
    (term -> idf) map is pulled to the driver and BROADCAST via
    ``ray.put`` — vocabulary is sublinear in corpus size (Heaps' law),
    the same documented bound as the flagship's alias map (J1 pattern).
    The scoring+top-3 stage is then shuffle-free: each doc's terms are
    already co-resident, so the per-key top-k never leaves the batch."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(t: pa.Table) -> pa.Table:
        tf = text.term_frequencies(t)
        g = tf.group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "n_partial": g["count_all"]})

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_partial", alias_name="df"))
        .to_pandas()
    )
    idf = {
        t: (n_docs * 1_000_000) // int(d)
        for t, d in zip(df_tbl["term"], df_tbl["df"])
    }
    idf_ref = ray.put(idf)

    class ScoreTop3:
        """Scores DOC batches (rows are whole docs, so a doc's term set
        can never straddle a batch at any batch/block size) — tf is
        recomputed per batch, one cheap Arrow hash-group, rather than
        materializing a corpus-sized tf table between stages."""

        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = text.term_frequencies(t).to_pandas()
            if df.empty:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "rank": pa.array([], pa.int64()),
                        "term": pa.array([], pa.string()),
                        "tf": pa.array([], pa.int64()),
                        "score": pa.array([], pa.int64()),
                    }
                )
            score = df["tf"] * df["term"].map(self.idf).astype("int64")
            out = df.assign(score=score).sort_values(
                ["doc_id", "score", "term"], ascending=[True, False, True]
            )
            top = out.groupby("doc_id", sort=False).head(3).copy()
            top["rank"] = (top.groupby("doc_id", sort=False).cumcount() + 1).astype(
                "int64"
            )
            return pa.Table.from_pandas(
                top[["doc_id", "rank", "term", "tf", "score"]], preserve_index=False
            )

    return ds.map_batches(ScoreTop3, batch_format="pyarrow", concurrency=(1, 8))


def length_filter_quantile(sf_dir: str) -> rd.Dataset:
    """Quantile-gated length filter (quality staple: drop the tails):
    keep docs whose whitespace token count lies within [p05, p95] of
    the corpus distribution -> (doc_id, n_tokens).

    Scale shape: the bounds come from the MERGEABLE quantile sketch
    over per-batch token counts (one constant group key, two-level
    salted merge — exact below the sketch cap, which covers all test
    scales so the DuckDB quantile_cont oracle verifies it); the two
    resulting floats broadcast trivially into the filter pass.  Two
    streaming passes over the corpus, no all-to-all."""
    from .ops.sketch import grouped_quantile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # consumed twice (bounds pass + filter pass): materialize or the
    # read+tokenize stage re-executes (lazy-DAG duplication); the
    # materialized set is narrow (doc_id, n_tokens)
    counts = ds.map_batches(
        text.token_count_batch, batch_format="pyarrow"
    ).materialize()

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(len(t), np.int64)))

    bounds = (
        grouped_quantile(
            counts.map_batches(add_key, batch_format="pyarrow"),
            "_g",
            "n_tokens",
            q={"lo": 0.05, "hi": 0.95},
            ndigits=None,
        )
        .to_pandas()
        .iloc[0]
    )
    lo, hi = float(bounds["lo"]), float(bounds["hi"])

    def keep(t: pa.Table) -> pa.Table:
        n = t["n_tokens"]
        mask = pc.and_(
            pc.greater_equal(n, pa.scalar(lo)), pc.less_equal(n, pa.scalar(hi))
        )
        return t.filter(mask)

    return counts.map_batches(keep, batch_format="pyarrow")


def pii_scan(sf_dir: str) -> rd.Dataset:
    """PII scan + redact over documents (scrubbing stage).  The synth
    corpus is PII-free, so the driver oracle verifies the zero-count +
    identity-redaction plumbing; the pattern behavior itself is pinned
    by the pytest DuckDB oracle on a PII-laden table."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.pii_scan_batch, batch_format="pyarrow")


def doc_chunks(sf_dir: str) -> rd.Dataset:
    """Overlapping fixed-size token chunking (context-window prep for
    LLM training): 32-token chunks every 24 tokens.  Row-parallel
    explode — each doc's chunks are produced entirely inside its own
    batch, so the stage shuffles nothing at any corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: text.chunk_batch(t, size=32, stride=24), batch_format="pyarrow"
    )


def lang_id(sf_dir: str) -> rd.Dataset:
    """Language ID (heuristic) — rows-only check (no SQL oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.LangId, batch_format="pyarrow", concurrency=(1, 4))


def train_val_test_split(sf_dir: str) -> rd.Dataset:
    """Deterministic content-addressed train/val/test split (5/5/90 by
    md5 bucket) — partitioning-independent by construction; DuckDB
    oracle verifies the full assignment."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    return ds.map_batches(text.split_batch, batch_format="pyarrow")


def doc_packing(sf_dir: str) -> rd.Dataset:
    """Sequence packing into <=4096-token shards (block-local greedy
    binning; training-shard assembly) — rows-only (pack ids depend on
    block boundaries by design; invariants pytest-checked)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.pack_sequences(ds, budget_tokens=4096)


def word_count_global(sf_dir: str) -> rd.Dataset:
    """Global token frequency (A1 vocab count as a Ray op)."""
    ds = _read(sf_dir, "documents", ["text"])

    def explode_count(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(t["text"], pattern=r"\s+"))
        g = pa.table({"word": toks}).group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": g["word"], "n": g["count_all"]})

    return (
        ds.map_batches(explode_count, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table({"word": t["word"], "n": pc.cast(t["n"], pa.int64())}),
            batch_format="pyarrow",
        )
    )


def vocab_zipf_head(sf_dir: str) -> pa.Table:
    """Zipf-head corpus diagnostic -> (word, n, rank, cum_n): the 100
    most frequent tokens with deterministic (n DESC, word ASC) rank
    and the running cumulative count — the 'how much of the corpus do
    the top-k tokens cover' curve every tokenizer/vocab decision
    starts from.  The distributed part is word_count_global's
    combiner-first count; the head itself is ranked on the driver
    (bounded: exactly 100 rows survive the distributed top-k sort +
    limit).  Integer cum_n keeps the window-SUM oracle hash-exact."""
    counts = word_count_global(sf_dir)
    head = (
        counts.sort(key=["n", "word"], descending=[True, False])
        .limit(100)
        .to_pandas()  # bounded: 100 rows
    )
    n = head["n"].to_numpy()
    return pa.table(
        {
            "word": pa.array(head["word"], pa.string()),
            "n": pa.array(n, pa.int64()),
            "rank": pa.array(np.arange(1, len(head) + 1), pa.int64()),
            "cum_n": pa.array(np.cumsum(n), pa.int64()),
        }
    )


def events_rolling_wau(sf_dir: str) -> rd.Dataset:
    """Rolling 7-day active users per day (the DAU/WAU retention
    denominator) -> (day, wau): for each calendar day present in the
    data, the exact count of distinct users with >= 1 event in the
    trailing 7-day window [day-6, day].  Plan: distinct (day, user)
    first (combiner — collapses events to at most |users|x|days|
    narrow rows), then each pair EXPLODES FORWARD into the <= 7
    window-days it contributes to (vectorized np.repeat), a distinct
    shuffle on (day, user), and a grouped count.  The 7x fan-out is on
    (int64, int64) rows — the window length bounds it, never the data;
    days outside the observed set are dropped against a broadcast of
    the (bounded) distinct-day list."""
    US_PER_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts"]), batch_format="pandas"
    )

    def day_pairs(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = ts_us // US_PER_DAY
        g = (
            pa.table({"day": pa.array(day), "user_id": t["user_id"]})
            .group_by(["day", "user_id"])
            .aggregate([])
        )
        return g

    import ray

    # distinct pairs are consumed twice (day list + explode): pin them
    du = (
        clean.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .count()
        .materialize()
    )
    # bounded driver materialization: one int64 per distinct day
    days = np.sort(
        du.groupby("day").count().to_pandas()["day"].to_numpy()
    )
    days_ref = ray.put(days)

    class Explode:
        def __init__(self):
            self.days = ray.get(days_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            day = t["day"].to_numpy()
            uid = t["user_id"].to_numpy()
            tgt = (day[:, None] + np.arange(7)[None, :]).reshape(-1)
            u = np.repeat(uid, 7)
            keep = np.isin(tgt, self.days)
            g = (
                pa.table(
                    {
                        "day": pa.array(tgt[keep]),
                        "user_id": pa.array(u[keep]),
                    }
                )
                .group_by(["day", "user_id"])
                .aggregate([])
            )
            return g

    from .tuning import POOL_REMOTE_ARGS

    rolled = (
        du.map_batches(
            Explode,
            batch_format="pyarrow",
            concurrency=(1, 8),
            **POOL_REMOTE_ARGS,
        )
        .groupby(["day", "user_id"])
        .count()
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([([], "count_all")])
        return pa.table({"day": g["day"], "n": g["count_all"]})

    def finish(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy().astype(np.int64) * US_PER_DAY
        return pa.table(
            {
                "day": pa.array(d.astype("datetime64[us]"), pa.timestamp("us")),
                "wau": pc.cast(t["n_sum"], pa.int64()),
            }
        )

    return (
        rolled.map_batches(count_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_sum"))
        .map_batches(finish, batch_format="pyarrow")
    )


def bucketed_join_orders_customer(sf_dir: str) -> pa.Table:
    """CO-BUCKETED shuffle-free join (the bucketed-table layout every
    lakehouse offers so repeat joins skip the exchange) -> (bucket,
    n_orders, n_customers, n_joined): both orders and customer are
    written hive-partitioned by the SAME deterministic key bucket
    (md5(custkey)[:8] % 8 — the repo's stable md5 convention, so the
    DuckDB twin reproduces the bucketing exactly), then each bucket
    pair is joined LOCALLY by an independent Ray task that reads only
    its two bucket directories — no shuffle anywhere, because the
    layout already co-locates equal keys.  This is the raw-tasks
    escape hatch the brief reserves for semantics the Dataset API
    can't express: a join whose exchange happened at WRITE time.
    Partitioning assumption: both sides bucketed with identical
    (hash, B); documented here and enforced by construction."""
    import hashlib
    import os
    import shutil

    import pyarrow.dataset as pads

    import ray

    B = 8
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    o_dir = f"/tmp/deepie_export/p{os.getpid()}_bucket_o_{tag}"
    c_dir = f"/tmp/deepie_export/p{os.getpid()}_bucket_c_{tag}"
    for d in (o_dir, c_dir):
        shutil.rmtree(d, ignore_errors=True)

    def add_bucket(col: str):
        # md5 per key is the price of the SQL-reproducible convention;
        # paid ONCE at layout-write time on narrow key columns (every
        # subsequent join of these tables is then shuffle-free)
        def f(t: pa.Table) -> pa.Table:
            ks = t[col].to_pylist()
            b = [
                int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % B
                for k in ks
            ]
            return t.append_column("bucket", pa.array(b, pa.int64()))

        return f

    _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        add_bucket("o_custkey"), batch_format="pyarrow"
    ).write_parquet(o_dir, partition_cols=["bucket"])
    _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        add_bucket("c_custkey"), batch_format="pyarrow"
    ).write_parquet(c_dir, partition_cols=["bucket"])

    @ray.remote
    def join_bucket(b: int):
        def load(root: str, cols):
            p = f"{root}/bucket={b}"
            if not os.path.isdir(p):
                return pa.table({c: pa.array([], pa.int64()) for c in cols})
            return pads.dataset(p, format="parquet").to_table(columns=cols)

        ot = load(o_dir, ["o_custkey"])
        ct = load(c_dir, ["c_custkey"])
        j = ot.join(
            ct, keys=["o_custkey"], right_keys=["c_custkey"], join_type="inner"
        )
        return (b, ot.num_rows, ct.num_rows, j.num_rows)

    rows = sorted(ray.get([join_bucket.remote(b) for b in range(B)]))
    return pa.table(
        {
            "bucket": pa.array([r[0] for r in rows], pa.int64()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "n_customers": pa.array([r[2] for r in rows], pa.int64()),
            "n_joined": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _int_cov_fold(ds: rd.Dataset) -> tuple[int, np.ndarray, np.ndarray]:
    """Shared EXACT integer covariance fold (embedding_covariance and
    embedding_pca_projection): per-block fixed-size partials over
    q = floor(x*1e4) ints — (count, column sums, QtQ) — summed on the
    driver.  The int64 partial sums stay exact to ~2.7e11 vectors
    (sum of per-block QtQ ~ n * 3.4e7); DOWNSTREAM integer numerators
    of the form n*qq - sq*sq overflow int64 much earlier (~5e5
    vectors) — callers needing those must widen (Python ints) or take
    the float path, and say so."""

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        if n == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "sq": pa.array([], pa.binary()),
                    "qq": pa.array([], pa.binary()),
                }
            )
        Qm = np.floor(flat.reshape(n, -1) * 10_000.0).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sq": pa.array([Qm.sum(axis=0).tobytes()], pa.binary()),
                "qq": pa.array([(Qm.T @ Qm).tobytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return 0, np.zeros(0, np.int64), np.zeros((0, 0), np.int64)
    n = int(parts["n"].sum())
    sq = np.sum([np.frombuffer(b, np.int64) for b in parts["sq"]], axis=0)
    d = len(sq)
    qq = np.sum(
        [np.frombuffer(b, np.int64).reshape(d, d) for b in parts["qq"]], axis=0
    )
    return n, sq, qq


def embedding_covariance(sf_dir: str) -> pa.Table:
    """Distributed covariance MATRIX of the embedding columns (the
    PCA / whitening prep every representation-analysis pass starts
    with) -> upper-triangle long form (i, j, cov_num, n) with
    cov_num = n*Σ(q_i q_j) − Σq_i Σq_j over vectors QUANTIZED to
    integers (q = floor(x·10⁴)) — all-integer algebra, so the result
    is EXACT and independent of summation order (a float covariance
    would differ from the oracle's in the low bits by accumulation
    order alone).  Plan: per-batch partials (QᵀQ 64x64 int64 matmul,
    column sums, count) — fixed-size per batch regardless of rows —
    folded on the driver (k x k ints, metadata-sized), then the long
    form emitted locally.  Exactly the broadcast-reduce contract of
    ops/cluster.kmeans_fit.  Indices are 1-based to match the SQL
    twin's list subscripts."""
    # int64 numerator bound: n*qq - sq*sq wraps past 2^63 at ~5e5
    # vectors (and no longer FITS the int64 output column either) —
    # this exact-integer long form is the oracle twin for bounded
    # corpora; the unbounded path is the float covariance that
    # embedding_pca_projection derives from the same fold.
    ds = _read(sf_dir, "embeddings", ["embedding"])
    n, sq, qq = _int_cov_fold(ds)
    if n == 0:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "cov_num": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    d = len(sq)
    iu, ju = np.triu_indices(d)
    cov_num = n * qq[iu, ju] - sq[iu] * sq[ju]
    return pa.table(
        {
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "cov_num": pa.array(cov_num, pa.int64()),
            "n": pa.array(np.full(len(iu), n), pa.int64()),
        }
    )


def events_robust_outliers(sf_dir: str) -> rd.Dataset:
    """Robust (MAD-based) outlier detection -> (event_id, event_type,
    cents): events whose integer-cents value deviates from their
    type's median by more than 5x the median absolute deviation — the
    skew-resistant anomaly flag (a zscore on mean/stddev would let one
    whale event drag the threshold).  Two passes: the events_value_mad
    one-task-per-type median+MAD (groups are 5 types; bounded), the
    thresholds broadcast as a 5-entry dict, then a streaming vectorized
    filter — no second shuffle.  All-integer comparison keeps the twin
    hash-exact."""
    import ray

    med = events_value_mad(sf_dir).to_pandas()  # bounded: 5 rows
    th = {
        r["event_type"]: (int(r["med_cents"]), int(r["mad_cents"]))
        for _, r in med.iterrows()
    }
    th_ref = ray.put(th)

    class Flag:
        def __init__(self):
            self.th = ray.get(th_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.dropna(subset=["value"])
            cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
            med_map = {k: v[0] for k, v in self.th.items()}
            mad_map = {k: v[1] for k, v in self.th.items()}
            med = df["event_type"].map(med_map).to_numpy(dtype=np.int64)
            mad = df["event_type"].map(mad_map).to_numpy(dtype=np.int64)
            keep = np.abs(cents - med) > 5 * mad
            return pd.DataFrame(
                {
                    "event_id": df["event_id"].to_numpy()[keep],
                    "event_type": df["event_type"].to_numpy()[keep],
                    "cents": cents[keep],
                }
            )

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    from .tuning import POOL_REMOTE_ARGS

    return ev.map_batches(
        Flag, batch_format="pandas", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def events_distinct_users_hll(sf_dir: str) -> rd.Dataset:
    """Constant-memory grouped distinct count via HyperLogLog ->
    (event_type, hll_distinct): the register-max mergeable sketch
    (4 KiB per key REGARDLESS of cardinality — the path for keys where
    even KMV's k hashes are too much state).  Approximate by nature
    (~1.6% standard error at p=12), so rows-only; pytest pins the
    relative error against the exact count and the merge invariance
    under repartitioning."""
    from .ops import sketch as sk

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return sk.grouped_hll_distinct(ev, "event_type", "user_id")


def validate_orders(sf_dir: str) -> pa.Table:
    """Data-quality EXPECTATIONS gate (the pre-ingest validation every
    production pipeline runs before accepting a drop) -> (check,
    n_violations): five constraint classes over orders —
    key uniqueness (combiner-first duplicate count), NOT NULL,
    referential integrity into customer (combiner-distinct keys
    anti-joined — narrow key shuffle, no payloads), a value-domain
    check, and a warning-level outlier expectation (totalprice >
    450k, deliberately non-zero on the synth data so the machinery
    provably counts).  One streaming pass computes the three row-local
    checks; uniqueness and FK are key-only aggregates.  The DuckDB
    twin recomputes all five counts."""
    from .ops import joins

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )

    # --- row-local checks in one pass (per-batch partial counts)
    def local_checks(t: pa.Table) -> pa.Table:
        null_cust = int(pc.sum(pc.cast(pc.is_null(t["o_custkey"]), pa.int64())).as_py() or 0)
        nonpos = int(
            pc.sum(
                pc.cast(
                    pc.fill_null(pc.less_equal(t["o_totalprice"], 0.0), False),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
        high = int(
            pc.sum(
                pc.cast(
                    pc.fill_null(pc.greater(t["o_totalprice"], 450_000.0), False),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "check": pa.array(
                    ["custkey_not_null", "totalprice_positive", "totalprice_suspicious_high"]
                ),
                "n": pa.array([null_cust, nonpos, high], pa.int64()),
            }
        )

    local = (
        orders.map_batches(local_checks, batch_format="pyarrow")
        .groupby("check")
        .aggregate(Sum("n", alias_name="n_violations"))
    )

    # --- key uniqueness: rows beyond the first per key
    def key_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([([], "count_all")])
        return pa.table(
            {"o_orderkey": g["o_orderkey"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    dup_rows = (
        orders.map_batches(key_counts, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "check": pa.array(["orderkey_unique"] * t.num_rows),
                    "n_violations": pc.subtract(
                        pc.cast(t["n"], pa.int64()), pa.scalar(1, pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("check")
        .aggregate(Sum("n_violations", alias_name="n_violations"))
    )

    # --- FK into customer: distinct custkeys anti-joined to customer
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orphans = joins.anti_join(
        orders.select_columns(["o_custkey", "o_orderkey"]),
        cust,
        on="o_custkey",
        right_on="c_custkey",
    )
    n_orphans = orphans.count()

    combined = local.union(dup_rows).to_pandas()
    combined = pd.concat(
        [
            combined,
            pd.DataFrame(
                {"check": ["custkey_fk_customer"], "n_violations": [n_orphans]}
            ),
        ]
    )  # bounded: exactly 5 rows
    combined = combined.sort_values("check").reset_index(drop=True)
    return pa.table(
        {
            "check": pa.array(combined["check"], pa.string()),
            "n_violations": pa.array(
                combined["n_violations"].astype(np.int64), pa.int64()
            ),
        }
    )


def orders_merge_changelog(sf_dir: str) -> rd.Dataset:
    """MERGE INTO (CDC changelog apply — the write path of every
    lakehouse upsert) -> (o_orderkey, cents): a deterministic changelog
    derived from the orders table itself (keys %10==0 update their
    price by +1.00, %10==1 delete, %10==2 insert a shifted-key copy)
    applied to the base snapshot with ops/joins.apply_changelog —
    distinct affected keys anti-join the base (narrow key shuffle,
    payloads never move), then the upsert/insert payloads union in.
    The DuckDB twin expresses the same merge with set operations, so a
    dropped delete, double-applied update or lost insert all break the
    hash match."""
    from .ops import joins

    base = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cents": pc.cast(
                    pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def changelog(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        c = t["cents"].to_numpy()
        m = k % 10
        upd_k, upd_c = k[m == 0], c[m == 0] + 100
        del_k, del_c = k[m == 1], c[m == 1]
        ins_k, ins_c = k[m == 2] + 1_000_000_000, c[m == 2]
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.concatenate([upd_k, del_k, ins_k]), pa.int64()
                ),
                "cents": pa.array(
                    np.concatenate([upd_c, del_c, ins_c]), pa.int64()
                ),
                "op": pa.array(
                    ["U"] * len(upd_k) + ["D"] * len(del_k) + ["I"] * len(ins_k)
                ),
            }
        )

    changes = base.map_batches(changelog, batch_format="pyarrow")
    return joins.apply_changelog(base, changes, key_col="o_orderkey")


def event_type_audience_overlap(sf_dir: str) -> pa.Table:
    """Pairwise audience overlap via KMV sketch SET ALGEBRA ->
    (type_a, type_b, n_common): for every event-type pair (a < b), the
    number of distinct users active in both — computed by intersecting
    the types' merged KMV sketches, not by joining the raw data.
    k=4096 exceeds the user cardinality at test scales so the sketches
    hold every distinct user hash and the intersection is EXACT (the
    DuckDB count(DISTINCT) self-join oracle verifies the whole
    machinery); at real scale the same code gives the standard
    inclusion-exclusion KMV estimate with bounded sketches.  Driver
    fold is |event types| sketches (5 x 4096 x 8 B) — fixed size, not
    data-sized; the raw (user, type) rows never shuffle at all (the
    two-level salted merge of ops/sketch.py moves one sketch row per
    (type, block))."""
    from .ops import sketch as sk

    K = 4096
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    merged = sk.grouped_kmv_sketch(ev, "event_type", "user_id", k=K).to_pandas()
    sketches = {
        r["event_type"]: np.asarray(r["sketch"], dtype=np.int64).view(np.uint64)
        for _, r in merged.iterrows()
    }
    keys = sorted(sketches)
    rows = [
        (a, b, int(len(np.intersect1d(sketches[a], sketches[b]))))
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
    ]
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_common": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ------------------------------------------------------------------ dedup


def dedup_exact_documents(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.exact_dedup_keys(ds)
    return out.map_batches(
        lambda t: pa.table(
            {
                "fingerprint": t["fingerprint"],
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_dupes": pc.cast(t["n_dupes"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def minhash_dedup_documents(sf_dir: str) -> rd.Dataset:
    """MinHash-LSH near-dedup cluster map — rows-only check."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.minhash_dedup(ds, threshold=0.5)


def simhash_signatures(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash per doc — rows-only check (deterministic)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(dedup.simhash_batch, batch_format="pyarrow")


def simhash_neardup(sf_dir: str) -> rd.Dataset:
    """SimHash near-dup pairs (hamming <= 6) — rows-only check."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_neardup_pairs(ds, max_hamming=6)


def embedding_neardup(sf_dir: str) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (cos >= 0.35), as the exact
    distributed block-pair cross join (no driver-side matrix build;
    memory per task = two chunk matrices regardless of corpus size)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_neardup_blockjoin(emb, threshold=0.35)


# -------------------------------------------------------------------- ANN


def _query_vectors(sf_dir: str, n: int = 5):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = pc.less(t["vec_id"], n)
    t = t.filter(mask)
    ids = t["vec_id"].to_numpy()
    mat = ann._to_matrix(t["embedding"])
    return ids, mat


def ann_topk(sf_dir: str) -> rd.Dataset:
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.brute_force_topk(corpus, ids, mat, k=10)


def ann_recall_report(sf_dir: str) -> pa.Table:
    """ANN quality EVALUATION -> (variant, recall_pct): recall@10 of
    each approximate index family (LSH / IVF / PQ-ADC / per-shard
    HNSW / IVF-PQ residual-ADC) against the
    brute-force ground truth, as integer percent (floor) averaged over
    the query set — the measure-don't-guess harness a vector-search
    deployment runs before trusting an index.  Each variant's result
    set is the EXISTING registry query's output (bounded: 10 rows per
    query vector), compared on the driver."""
    truth = ann_topk(sf_dir).to_pandas()  # bounded: n_queries x 10

    def recall_of(df: pd.DataFrame) -> int:
        got = df.groupby("query_id")["neighbor_id"].apply(set)
        want = truth.groupby("query_id")["neighbor_id"].apply(set)
        fracs = [
            len(got.get(q, set()) & w) / len(w) for q, w in want.items()
        ]
        return int(np.floor(100.0 * np.mean(fracs)))

    rows = [
        ("lsh", recall_of(ann_topk_lsh(sf_dir).to_pandas())),
        ("ivf", recall_of(ann_topk_ivf(sf_dir).to_pandas())),
        ("pq", recall_of(ann_topk_pq(sf_dir).to_pandas())),
        ("hnsw", recall_of(ann_topk_hnsw(sf_dir).to_pandas())),
        ("ivf_pq", recall_of(ann_topk_ivf_pq(sf_dir).to_pandas())),
    ]
    return pa.table(
        {
            "variant": pa.array([r[0] for r in rows], pa.string()),
            "recall_pct": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def ann_topk_lsh(sf_dir: str) -> rd.Dataset:
    """LSH-bucketed ANN (approximate; rows-only check)."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.lsh_topk(corpus, ids, mat, k=10, n_bits=4)


def ann_topk_ivf(sf_dir: str) -> rd.Dataset:
    """IVF-bucketed ANN (seeded k-means coarse quantizer; rows-only)."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.ivf_topk(corpus, ids, mat, k=10, n_centroids=16, nprobe=6)


def ann_topk_pq(sf_dir: str) -> rd.Dataset:
    """Product-quantization ANN (8 subspaces x 16 codes, ADC scoring):
    the compressed-corpus scale path — a PQ code is 8 bytes/vector vs
    512 for the raw embedding.  Approximate; rows-only for the driver,
    recall-vs-exact pinned by pytest."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.pq_topk(corpus, ids, mat, k=10, n_subspaces=8, n_codes=16)


def ann_topk_hnsw(sf_dir: str) -> rd.Dataset:
    """Graph-index ANN (per-shard HNSW build + search, ops/ann.py
    HNSWShardTopK): the high-recall in-memory index family.  Each
    shard builds its own HNSW — no shared mutable graph — and the
    global top-k merges shard-local results.  Approximate; rows-only
    for the driver, recall-vs-exact pinned by pytest
    (tests/test_ann_hnsw.py)."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.hnsw_topk(corpus, ids, mat, k=10, num_shards=8)


def ann_topk_hnsw_ivf(sf_dir: str) -> rd.Dataset:
    """IVF-routed per-cell HNSW (ops/ann.hnsw_ivf_topk): the HNSW
    family's scale composition — coarse quantizer routes queries to
    nprobe cells, ONE sort exchange co-locates cells, each cell run
    builds its own in-task HNSW and serves only that cell's queries.
    Approximate; rows-only for the driver, recall-vs-exact pinned by
    pytest (tests/test_ann_hnsw.py)."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.hnsw_ivf_topk(corpus, ids, mat, k=10, n_cells=8, nprobe=4)


def ann_topk_ivf_pq(sf_dir: str) -> rd.Dataset:
    """IVF-PQ ANN (ops/ann.ivf_pq_topk — the FAISS-IVFADC
    composition): coarse-quantizer query routing AND residual-PQ
    compressed scanning in one operator; a scanned vector costs
    n_subspaces bytes, and only vectors in a query's probed cells are
    scored.  Approximate; rows-only for the driver, recall-vs-exact
    pinned by pytest."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.ivf_pq_topk(
        corpus, ids, mat, k=10, n_cells=16, nprobe=6, n_subspaces=8, n_codes=16
    )


def ngram_jaccard_pairs(sf_dir: str) -> rd.Dataset:
    """n-gram Jaccard near-dup: LSH candidates verified with the TRUE
    3-gram Jaccard (id_a, id_b, jaccard) — rows-only (set arithmetic
    is not reasonably SQL-expressible).  Verification is the join-based
    distributed path (candidates x per-doc shingle table), no driver
    collection."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = dedup.minhash_candidate_pairs(ds, distinct=False)
    # pinned: consumed by both verify-join sides
    sh_tbl = dedup.shingle_table(ds).materialize()
    verified = dedup.jaccard_verify_join(cands, sh_tbl, threshold=0.3)
    # distinct AFTER verify (band-duplicate candidates verify redundantly)
    return verified.groupby(["id_a", "id_b"]).aggregate(
        Min("jaccard", alias_name="jaccard")
    )


def repeated_ngrams(sf_dir: str) -> rd.Dataset:
    """Corpus-level boilerplate detection: word-3-grams appearing in
    >= 5 distinct documents -> (gram, n_docs).  Combiner-first: each
    batch emits its DISTINCT (gram, doc) pairs pre-counted per gram,
    then one grouped sum — the same partial-aggregate shape as
    word_count_global, over n-grams."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            toks = ws_tokens((txt or "").lower())  # RE2-\s-exact (oracle parity)
            if len(toks) < 3:
                grams = {" ".join(toks)} if toks else set()
            else:
                grams = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
            c.update(grams)  # distinct per doc
        return pa.table(
            {
                "gram": pa.array(list(c.keys()), pa.string()),
                "n_docs": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_docs"], 5))
        return pa.table(
            {"gram": t["gram"], "n_docs": pc.cast(t["n_docs"], pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def docs_by_lang(sf_dir: str) -> rd.Dataset:
    """Per-language corpus rollup (doc count + char sum) — the routine
    monitoring aggregate of a training-data pipeline."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("n_chars", "sum"), ([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "total_chars": g["n_chars_sum"],
                "n_docs": g["count_all"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("total_chars", alias_name="total_chars"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "total_chars": pc.cast(t["total_chars"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def contamination_ngram(sf_dir: str) -> rd.Dataset:
    """Benchmark decontamination: per corpus doc (doc_id >= 10), the
    word-3-gram overlap with the doc_id < 10 'benchmark' set ->
    (doc_id, n_shingles, n_overlap).  The benchmark union broadcasts
    via ray.put (fixed-size by definition); the corpus streams.
    Oracle: DuckDB recomputes both sides with list kernels."""
    bench_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < 10),
    )
    bench = dedup.benchmark_shingles(bench_ds)
    corpus = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") >= 10),
    )
    return dedup.contamination_counts(corpus, bench)


def ngram_jaccard_exact(sf_dir: str) -> rd.Dataset:
    """EXACT all-pairs word-3-gram Jaccard (>= 0.3) as the distributed
    block-pair cross join -> (id_a, id_b, n_inter, n_union) in integer
    arithmetic — the oracle-checkable twin of the LSH-candidate
    ``ngram_jaccard_pairs`` (DuckDB recomputes the shingle sets with
    list kernels and value-hash-verifies the counts)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.jaccard_exact_blockjoin(ds, threshold_num=3, threshold_den=10)


# ------------------------------------------------------------ KG pipeline


def ace_relation_extraction(sf_dir: str) -> rd.Dataset:
    """The reference's own E1+E3 workflow end-to-end (ACE TSV read ->
    feature dict with cutoff -> dict-encode -> MultiNN pool -> P/R/F1):
    runs over a deterministic synthetic ACE corpus (seeded; the driver's
    sf tables don't carry ACE annotations) — rows-only; exact parity vs
    the single-threaded oracle is pytest-checked (test_ace_pipeline)."""
    import os
    import tempfile
    import uuid

    from . import ace_pipeline, synth

    lines = synth.synth_ace_lines(200, seed=13)
    lines += synth.synth_ace_lines(50, seed=14, layout14=False, id_offset=5000)
    # unique path: fixed names in the shared tmp dir race concurrent
    # bench/driver runs (and are symlink-attackable on multi-user boxes)
    path = os.path.join(
        tempfile.gettempdir(), f"ace_query_{uuid.uuid4().hex[:12]}.full.txt"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    scored, _prf, _fdict = ace_pipeline.score_ace_corpus(path, cutoff=2)
    return scored.select_columns(["pair_id", "gold_label", "pred_label"])


def kg_triples(sf_dir: str) -> rd.Dataset:
    from . import pipeline

    docs = pipeline.read_documents(sf_dir)
    return pipeline.emitted_triples(docs, with_prob=False)


_kg_cache: dict[str, dict] = {}


def kg_graph(sf_dir: str):
    """Full KG build; memoized per sf_dir within the process (the
    linked/nodes/edges queries would otherwise each re-run parse+score).
    Cache entries are validated cheaply — if the driver restarted Ray
    between queries the cached object refs are dead and we rebuild."""
    from . import pipeline

    cached = _kg_cache.get(sf_dir)
    if cached is not None:
        try:
            cached["nodes"].count()
            return cached
        except Exception:
            _kg_cache.pop(sf_dir, None)
    _kg_cache[sf_dir] = pipeline.run_kg(sf_dir)
    return _kg_cache[sf_dir]


def _kg_model_query(sf_dir: str, model_name: str) -> rd.Dataset:
    """Shared wrapper for encoder-variant extraction queries: registry
    scorer over the token-id pairs table, emitted (non-NONE) triples
    without the prob column."""
    from . import pipeline
    from .ops.score import drop_none

    docs = pipeline.read_documents(sf_dir)
    out = pipeline.extract_triples_model(docs, model_name, with_prob=False)
    return out.map_batches(drop_none, batch_format="pyarrow")


def kg_triples_gru(sf_dir: str) -> rd.Dataset:
    """Encoder-variant extraction (biGRU head readout) — rows-only."""
    return _kg_model_query(sf_dir, "gru_head")


def kg_triples_hybrid(sf_dir: str) -> rd.Dataset:
    """Hybrid product-of-experts (MultiNN x CNN) extraction — rows-only."""
    return _kg_model_query(sf_dir, "hybrid")


def kg_triples_hybrid_kernel(sf_dir: str) -> rd.Dataset:
    """Hybrid product-of-experts WITH the kernel-score expert live
    (J3/T6, reference ``hybridModel`` kernelFets branch — the
    reference zeroes this input; here the deterministic stand-in
    kernel output multiplies ``exp(kernelScore)`` into the product) —
    rows-only."""
    return _kg_model_query(sf_dir, "hybrid_kernel")


def kg_triples_dep(sf_dir: str) -> rd.Dataset:
    """Dual-channel ``-dep`` extraction (sentence + dep-path-view biGRU
    channels, reference default seqType) — rows-only."""
    return _kg_model_query(sf_dir, "dual_dep")


def kg_triples_ensemble(sf_dir: str) -> rd.Dataset:
    """Two-encoder ensemble (biGRU-head x CNN product of experts,
    reference ``a_b`` models) — rows-only."""
    return _kg_model_query(sf_dir, "ensemble_gru_cnn")


def kg_triples_att(sf_dir: str) -> rd.Dataset:
    """Attention-pooled biGRU extraction (reference ``rnnAttHead``,
    linear exp(h.IW+Ib) scoring) — rows-only."""
    return _kg_model_query(sf_dir, "gru_att_head")


def kg_triples_ffrnn(sf_dir: str) -> rd.Dataset:
    """Sigmoid FF-RNN extraction (reference ``rnnHeadFf``,
    rnnReModels.py:1365-1367; representative of the 6 registered
    ffrnn_* members) — rows-only."""
    return _kg_model_query(sf_dir, "ffrnn_head")


def kg_triples_altconv(sf_dir: str) -> rd.Dataset:
    """GRU->CNN alternate extraction (reference ``alternateConv``,
    rnnReModels.py:1279-1289; representative of the altconv_* members)
    — rows-only."""
    return _kg_model_query(sf_dir, "altconv")


def kg_triples_dep_cnn(sf_dir: str) -> rd.Dataset:
    """Dual-channel CNN extraction (sentence + dep-path-view conv
    channels — the CNN member of the reference's ``-`` dual-channel
    grammar) — rows-only."""
    return _kg_model_query(sf_dir, "dual_dep_cnn")


def kg_linked(sf_dir: str) -> rd.Dataset:
    """Entity-linked triples (subj/obj canonical entity ids) — rows-only."""
    return kg_graph(sf_dir)["linked"]


def kg_nodes(sf_dir: str) -> rd.Dataset:
    return kg_graph(sf_dir)["nodes"]


def kg_edges(sf_dir: str) -> rd.Dataset:
    return kg_graph(sf_dir)["edges"]


def media_features(sf_dir: str) -> rd.Dataset:
    """Media spans -> fixed-dim features through the actor-pool stage
    (decode stubbed — env has no codecs; real plumbing) — rows-only."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")
    feats = spans.map_batches(
        media.MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=1024, concurrency=(1, 2),
    )
    return feats.map_batches(
        lambda t: t.drop_columns(["features"]).append_column(
            "feat_norm",
            pa.array(
                np.linalg.norm(
                    np.asarray(t["features"].to_pylist(), dtype=np.float32), axis=1
                ).round(4)
                if len(t)
                else np.array([], dtype=np.float32),
                pa.float32(),
            ),
        ),
        batch_format="pyarrow",
    )


def media_span_stats(sf_dir: str) -> rd.Dataset:
    """Modality histogram over interleaved spans (media plumbing)."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")
    # histogram straight off the exploded spans — the feature extractor
    # has its own query/tests and is not needed to count kinds
    return (
        spans.map_batches(media.media_stats, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table({"kind": t["kind"], "n": pc.cast(t["n"], pa.int64())}),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# round 3: sampling / mixing / shuffle-export / index / graph / clustering


def mix_sources(sf_dir: str) -> rd.Dataset:
    """Weighted deterministic source mixing (domain re-weighting for a
    training corpus): per-source keep rates derived from the source
    NAME hash, per-doc keep decision from the doc-id hash — both
    content-addressed, so the mix is reproducible under any
    partitioning and SQL-expressible.  Pure map, zero shuffle."""
    from .ops import sample

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(sample.mix_sources_batch, batch_format="pyarrow")


def shuffle_shards_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic global shuffle for training-data export ->
    (doc_id, shard, pos): md5-bucketed shard + rank within shard by the
    md5 shuffle key.  One hash exchange + per-shard rank; shard count
    is the scale knob (grow it with the corpus)."""
    from .ops import sample

    ds = _read(sf_dir, "documents", ["doc_id"])
    return sample.shuffle_shards(ds, n_shards=16)


def unigram_rarity_scores(sf_dir: str) -> rd.Dataset:
    """Unigram-LM quality proxy (the perplexity-filter staple, in
    exact integer arithmetic so the oracle value-hashes): global term
    counts (combiner-first grouped sum), broadcast {term: count}
    (Heaps-bounded vocabulary, same documented bound as tf-idf's idf
    map), then per-doc
    ``rarity_sum = sum_tokens tf * ((total * 1e6) // count(term))``
    and ``avg_rarity = rarity_sum // n_tokens``.  High avg_rarity =
    improbable under the corpus unigram model (rare/garbled text) —
    the integer-order-preserving analogue of high perplexity."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        tf = text.term_frequencies(t)
        g = tf.group_by("term").aggregate([("tf", "sum")])
        return pa.table({"term": g["term"], "n_partial": g["tf_sum"]})

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_partial", alias_name="n"))
        .to_pandas()
    )
    total = int(counts["n"].sum())
    cmap = {t: int(n) for t, n in zip(counts["term"], counts["n"])}
    ref = ray.put(cmap)

    class Score:
        def __init__(self):
            self.cmap = ray.get(ref)
            self.total = total

        def __call__(self, t: pa.Table) -> pa.Table:
            tf = text.term_frequencies(t).to_pandas()
            if tf.empty:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                        "rarity_sum": pa.array([], pa.int64()),
                        "avg_rarity": pa.array([], pa.int64()),
                    }
                )
            unit = (self.total * 1_000_000) // tf["term"].map(self.cmap).astype(
                "int64"
            )
            tf = tf.assign(r=tf["tf"] * unit)
            g = tf.groupby("doc_id", sort=False).agg(
                n_tokens=("tf", "sum"), rarity_sum=("r", "sum")
            )
            g = g.reset_index()
            g["avg_rarity"] = g["rarity_sum"] // g["n_tokens"]
            return pa.Table.from_pandas(
                g[["doc_id", "n_tokens", "rarity_sum", "avg_rarity"]].astype(
                    "int64"
                ),
                preserve_index=False,
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8))


def inverted_index(sf_dir: str) -> rd.Dataset:
    """Term -> (df, postings) search-index build: per-batch partials
    (df count + lowest-100 doc_ids per term — every shuffled row is
    bounded at 100 ids regardless of term frequency, so stopword-grade
    hot terms cannot blow up a reducer), merged per term with an exact
    sort+head.  Postings are comma-joined strings for oracle parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = ds.map_batches(
        lambda t: text.inverted_index_partials(t, postings_cap=100),
        batch_format="pyarrow",
    )
    return partials.groupby("term").map_groups(
        lambda df: text.merge_inverted_index(df, postings_cap=100),
        batch_format="pandas",
    )


def copurchase_edges(sf_dir: str) -> rd.Dataset:
    """Co-purchase graph construction from the lineitem fact table:
    distinct part pairs within each order, counted across orders
    (part_a < part_b).  Group explode is bounded by order width; edge
    counting is combiner-first."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    return graph.copurchase_edges(li)


def graph_pagerank(sf_dir: str) -> rd.Dataset:
    """PageRank over the co-purchase graph (undirected -> both edge
    directions), 5 damped iterations of join + grouped sum — the
    iterative-analytics capability check.  Ranks are rounded to 9 dp
    for stable cross-run comparison; no SQL oracle (iterative), pinned
    instead by the numpy power-iteration parity test in
    tests/test_graph_cluster.py."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    e = graph.copurchase_edges(li).map_batches(
        lambda t: pa.table(
            {
                "src": pa.chunked_array(
                    t["part_a"].chunks + t["part_b"].chunks
                ).combine_chunks(),
                "dst": pa.chunked_array(
                    t["part_b"].chunks + t["part_a"].chunks
                ).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    # num_partitions=2 at bench scale: join-aggregator SETUP, not data,
    # dominates tiny graphs (tuning.py); at cluster scale raise it to a
    # few per node like every other hash_join call site
    ranks = graph.pagerank(e, iters=5, num_partitions=2)
    return ranks.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank": pa.array(
                    [round(float(v), 9) for v in t["rank"].to_pylist()],
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def embedding_kmeans(sf_dir: str) -> rd.Dataset:
    """k-means over the embeddings table (k=8, 5 Lloyd iterations,
    min-id deterministic init): centroids broadcast per iteration, the
    corpus streams partial sums — the big side never shuffles.  No SQL
    oracle (iterative); pinned by the numpy Lloyd parity test."""
    from .ops import cluster

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = cluster.kmeans_fit(ds, k=8, iters=5)
    return cluster.kmeans_assign(ds, C)


def word_topk_approx(sf_dir: str) -> rd.Dataset:
    """Approximate global top-20 words via the mergeable Misra-Gries
    heavy-hitter sketch (two-level salted merge) -> (rank, word, n).
    Exact — and therefore DuckDB-oracle-checkable — whenever the true
    vocabulary fits the 4096-item capacity, which holds at every test
    scale; at 100 TB only O(blocks x cap) summary rows shuffle."""
    from .ops import sketch

    ds = _read(sf_dir, "documents", ["text"])

    def explode_count(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(t["text"], pattern=r"\s+"))
        g = pa.table({"word": toks}).group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": g["word"], "n": g["count_all"]})

    counts = ds.map_batches(explode_count, batch_format="pyarrow")
    return sketch.global_topk_heavy_hitters(counts, "word", "n", k=20, cap=4096)


def sample_per_source(sf_dir: str) -> rd.Dataset:
    """Deterministic stratified sample: the 5 docs per source with the
    smallest md5(doc_id || ':sample-v1') -> (source, doc_id, rank).
    Content-addressed (reproducible under any partitioning) and
    combiner-first: each batch forwards at most 5 candidate rows per
    source, so the per-source merge group is O(5 x blocks) no matter
    how large the source is."""
    from .hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    K = 5

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            _h=[md5_hex(f"{d}:sample-v1") for d in df["doc_id"]]
        )
        df = df.sort_values(["source", "_h", "doc_id"])
        return df.groupby("source", sort=False).head(K)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", "doc_id"]).head(K).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["source", "doc_id", "rank"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def latest_event_per_user(sf_dir: str) -> rd.Dataset:
    """Keep-latest-per-key dedup (the CDC/upsert compaction staple):
    each user's most recent event, ties on timestamp broken by the
    larger event_id -> (user_id, last_event_id, last_ts_us,
    last_event_type).  Combiner-first argmax: each batch forwards ONE
    candidate row per user, the per-user merge group is O(blocks).
    Null timestamps are EXCLUDED on both sides (oracle: WHERE ts IS
    NOT NULL) — pandas would otherwise sort NaT last and crown it the
    'latest', silently diverging from SQL's NULLS-last DESC order."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["ts"]).sort_values(["user_id", "ts", "event_id"])
        return df.groupby("user_id", sort=False).tail(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        row = df.sort_values(["ts", "event_id"]).tail(1)
        return pd.DataFrame(
            {
                "user_id": row["user_id"].to_numpy(),
                "last_event_id": row["event_id"].to_numpy(),
                "last_ts_us": (
                    row["ts"].astype("datetime64[us]").astype("int64").to_numpy()
                ),
                "last_event_type": row["event_type"].to_numpy(),
            }
        )

    return (
        ds.map_batches(best, batch_format="pandas")
        .groupby("user_id")
        .map_groups(finish, batch_format="pandas")
    )


def contamination_bloom(sf_dir: str) -> rd.Dataset:
    """Approximate decontamination — the SCALE path twin of
    ``contamination_ngram``: the benchmark's n-grams become an
    OR-mergeable Bloom filter (fixed 4M bits however large the eval
    suite), broadcast once; the corpus streams.  n_overlap_approx is
    an overestimate with no false negatives (pinned by pytest against
    the exact operator); rows-only for the driver (approximate by
    design, not SQL-expressible bit-for-bit)."""
    bench_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < 10),
    )
    m_bits = 1 << 22
    bits = dedup.bloom_build(bench_ds, m_bits=m_bits, k=7)
    corpus = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") >= 10),
    )
    return dedup.contamination_bloom_counts(corpus, bits, m_bits, k=7)


# ------------------------------------------------- ordered analytics


def events_running_user_totals(sf_dir: str) -> rd.Dataset:
    """SQL window functions over a (PARTITION BY user ORDER BY ts)
    frame -> (user_id, event_id, seq, cum_cents, gap_us): per-user row
    number, running spend in integer cents (exact — a float running
    sum would be at the mercy of the oracle's summation order), and
    inter-arrival microseconds (-1 on each user's first event).  One
    shuffle on user_id; per-task state is one user's events
    (ops/analytic.py)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return analytic.running_totals(ev, "user_id", "ts", "event_id", "value")


def events_p95_value(sf_dir: str) -> rd.Dataset:
    """Grouped 95th percentile via the same mergeable quantile sketch
    as events_median_value — one sketch answers any quantile, exact
    below the cap (all test scales), so the DuckDB quantile_cont
    oracle verifies it."""
    from .ops.sketch import grouped_quantile

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile(ev, "event_type", "value", q={"p95_value": 0.95})


# ------------------------------------------------- semi / anti joins


def _big_order_custkeys(sf_dir: str) -> rd.Dataset:
    # predicate pushed into the read: only the key column of qualifying
    # rows leaves storage
    return rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > 400000.0),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )


def customers_without_big_orders(sf_dir: str) -> rd.Dataset:
    """Anti-join (NOT EXISTS): customers with no order over 400k ->
    (c_custkey, c_name).  Fully distributed: the build side collapses
    to distinct keys combiner-first, then a hash-partitioned left-outer
    join + null filter (ops/joins.anti_join) — no driver-side key set,
    no broadcast of an sf-scaled side."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return joins.anti_join(
        cust, _big_order_custkeys(sf_dir), on="c_custkey", right_on="o_custkey"
    )


def customers_with_big_orders(sf_dir: str) -> rd.Dataset:
    """Semi-join (EXISTS) twin of customers_without_big_orders ->
    (c_custkey, c_name): distinct build keys guarantee no row
    multiplication, so the output schema is exactly the left side's."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return joins.semi_join(
        cust, _big_order_custkeys(sf_dir), on="c_custkey", right_on="o_custkey"
    )


# ------------------------------------------------- semantic dedup


def semantic_dedup_embeddings(sf_dir: str) -> rd.Dataset:
    """SemDeDup (k-means clusters, then within-cluster cosine pruning,
    threshold 0.35) -> (vec_id, cluster, keep) for every embedding.
    No SQL oracle (iterative k-means); pinned by the numpy-parity and
    partitioning-independence tests in tests/test_graph_cluster.py."""
    from .ops import cluster

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cluster.semantic_dedup(emb, k=8, threshold=0.35, iters=5)


# ---------------------------------------------- histogram / pivot / ranks


def events_value_histogram(sf_dir: str) -> rd.Dataset:
    """Fixed-width value histogram per event type -> (event_type, bin,
    n_events), bin = floor(value / 50) over OBSERVED (non-null) values
    — null values carry no bin and are dropped on both sides (NaN
    through floor->int64 would otherwise land in a garbage bin).
    Binning is a vectorized numpy floor division per batch (NOT Arrow
    integer divide, which truncates toward zero for negative values);
    counting is combiner-first, so the shuffle moves one narrow row per
    (type, bin) per block."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def binify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        b = np.floor(
            t["value"].to_numpy(zero_copy_only=False) / 50.0
        ).astype(np.int64)
        return pa.table({"event_type": t["event_type"], "bin": pa.array(b)})

    return grouped_count(
        ev.map_batches(binify, batch_format="pyarrow"),
        ["event_type", "bin"],
        "n_events",
    )


def events_value_quartiles(sf_dir: str) -> rd.Dataset:
    """SQL NTILE(4) + PERCENT_RANK() over (PARTITION BY user ORDER BY
    value, event_id) -> (user_id, event_id, ntile4, pct_rank)
    (ops/analytic.rank_features)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    return analytic.rank_features(ev, "user_id", "value", "event_id", k=4)


def user_event_type_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot (wide conditional aggregate): one row per user with a
    count column PER EVENT TYPE plus a total -> (user_id, click, error,
    purchase, signup, view, total) at this corpus.

    The column set is discovered distributed (combiner-first distinct
    over event_type) and collected to the driver — a TYPE VOCABULARY,
    metadata-sized by definition (a pivot with corpus-scaled column
    count is malformed output, not a scale problem).  The pivot itself
    is combiner-first: per-batch indicator columns (vectorized
    ``pc.equal``) pre-aggregated per user inside the batch, then ONE
    grouped sum over narrow integer rows — event rows never shuffle."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    types = sorted(
        t["event_type"]
        for t in joins._distinct_keys(ev, "event_type").take_all()
    )
    # discovered values become COLUMN NAMES: a value colliding with the
    # key/total columns (or a null) would silently overwrite them — fail
    # loudly instead (a pivot with such a vocabulary is malformed output)
    reserved = {"user_id", "total", None}
    bad = [ty for ty in types if ty in reserved]
    if bad:
        raise ValueError(f"pivot column collision with reserved names: {bad}")

    def partial(t: pa.Table) -> pa.Table:
        cols: dict = {"user_id": t["user_id"]}
        for ty in types:
            cols[ty] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        cols["total"] = pa.array(np.ones(t.num_rows, np.int64))
        g = (
            pa.table(cols)
            .group_by(["user_id"])
            .aggregate([(c, "sum") for c in [*types, "total"]])
        )
        return g.rename_columns(["user_id", *types, "total"])

    agg = ev.map_batches(partial, batch_format="pyarrow").groupby("user_id")
    return agg.aggregate(
        *[Sum(c, alias_name=c) for c in [*types, "total"]]
    )


def user_event_type_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT / melt (the inverse of user_event_type_pivot, closing
    the wide<->long pair) -> (user_id, event_type, n): the computed
    wide pivot table melted back to long form, one row per (user,
    type) with a NONZERO count.  Vectorized: per batch, np.repeat the
    user column once per type column and concatenate the count
    columns — no per-row loop; the melt is a streaming map over the
    pivot's output (no extra shuffle).  The DuckDB twin is the plain
    grouped count, so a melt that drops/duplicates a column breaks
    the hash."""
    wide = user_event_type_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        tcols = [c for c in t.column_names if c not in ("user_id", "total")]
        uid = t["user_id"].to_numpy()
        n = len(uid)
        out_uid = np.tile(uid, len(tcols))
        out_type = np.repeat(np.array(tcols, dtype=object), n)
        # np.repeat with per-element counts would interleave; tile+repeat
        # keeps column-major blocks: type i covers rows [i*n, (i+1)*n)
        out_n = np.concatenate(
            [pc.cast(t[c], pa.int64()).to_numpy(zero_copy_only=False) for c in tcols]
        )
        keep = out_n > 0
        return pa.table(
            {
                "user_id": pa.array(out_uid[keep], pa.int64()),
                "event_type": pa.array(out_type[keep].tolist(), pa.string()),
                "n": pa.array(out_n[keep], pa.int64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


def copurchase_link_scores(sf_dir: str) -> rd.Dataset:
    """Link-prediction features on the co-purchase graph -> (a, b,
    n_common, n_union) per edge: common-neighbor and neighborhood-
    union sizes (Jaccard = n_common/n_union downstream), kept as exact
    integers (ops/graph.edge_neighbor_overlap: wedge + composite-key
    closing joins, combiner-first counts — triangle machinery bent to
    per-edge scoring).  Scored over the SUPPORT >= 2 graph: single
    co-occurrences are noise, not link-prediction candidates, and the
    support filter collapses the wedge volume (sum deg² falls 800x at
    sf0.01) — the same pre-pruning any production similarity scorer
    applies before a neighborhood pass."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li, min_count=2)
    return graph.edge_neighbor_overlap(edges)


def copurchase_triangles(sf_dir: str) -> rd.Dataset:
    """Triangle counts on the co-purchase graph -> (node, n_triangles)
    with node = each triangle's smallest part key (ops/graph.
    triangle_counts: wedge join on the midpoint, composite-key closing
    join, combiner-first count)."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li)
    return graph.triangle_counts(edges)


# ------------------------------------------------ composed corpus prep


def llm_corpus_prep(sf_dir: str) -> rd.Dataset:
    """Composed end-to-end LLM corpus preparation — the staple data ops
    chained as ONE pipeline over the corpus (doc_id >= 10; doc_id < 10
    is the held-out eval set), exactly how a training-data run would
    compose them:

      1. token counts (vectorized) -> corpus-wide p05/p95 length bounds
         from the mergeable quantile sketch (two broadcast floats);
      2. exact-dedup keep set (min doc_id per content hash) applied as
         a hash-partitioned SEMI-join — the keep set is corpus-scaled,
         so it never broadcasts to the driver;
      3. decontamination: drop docs whose word-3-gram overlap with the
         eval set reaches 20% (n_overlap * 5 >= n_shingles), applied as
         an ANTI-join;
      4. deterministic content-addressed train/val/test assignment.

    -> (doc_id, n_tokens, split) for the surviving corpus.  Every stage
    is individually oracle-checked by its own query; the composed
    DuckDB twin verifies the whole pipeline end to end."""
    from .ops.sketch import grouped_quantile

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # narrow (doc_id, n_tokens); consumed by the bounds pass AND the
    # gate pass — materialize or the read+tokenize re-executes
    counts = docs.map_batches(
        text.token_count_batch, batch_format="pyarrow"
    ).materialize()

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(len(t), np.int64)))

    bounds = (
        grouped_quantile(
            counts.map_batches(add_key, batch_format="pyarrow"),
            "_g",
            "n_tokens",
            q={"lo": 0.05, "hi": 0.95},
            ndigits=None,
        )
        .to_pandas()
        .iloc[0]
    )
    lo, hi = float(bounds["lo"]), float(bounds["hi"])

    def gate(t: pa.Table) -> pa.Table:
        n = t["n_tokens"]
        mask = pc.and_(
            pc.greater_equal(t["doc_id"], pa.scalar(10)),
            pc.and_(
                pc.greater_equal(n, pa.scalar(lo)),
                pc.less_equal(n, pa.scalar(hi)),
            ),
        )
        return t.filter(mask)

    gated = counts.map_batches(gate, batch_format="pyarrow")

    # dedup keep set: repartition merges the groupby's zero-column
    # empty-partition blocks before any column access
    keep_ids = (
        dedup.exact_dedup_keys(docs)
        .repartition(8)
        .map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    )
    survivors = joins.semi_join(gated, keep_ids, on="doc_id")

    bench_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < 10),
    )
    corpus = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") >= 10),
    )
    cont = dedup.contamination_counts(corpus, dedup.benchmark_shingles(bench_ds))
    contaminated = cont.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater(t["n_shingles"], pa.scalar(0)),
                pc.greater_equal(
                    pc.multiply(t["n_overlap"], pa.scalar(5)), t["n_shingles"]
                ),
            )
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    survivors = joins.anti_join(survivors, contaminated, on="doc_id")

    def add_split(t: pa.Table) -> pa.Table:
        s = text.split_batch(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "split": s["split"],
            }
        )

    return survivors.map_batches(add_split, batch_format="pyarrow")


def user_funnel(sf_dir: str) -> rd.Dataset:
    """Funnel analysis (view -> click -> purchase, strictly ordered by
    first occurrence) -> (user_id, funnel_stage in 0..3).

    One shuffle: per-batch conditional-min pivot (first view/click/
    purchase timestamp per user as three nullable int64-us columns,
    pyarrow grouped min), one grouped Min per column, then a vectorized
    stage computation — no per-user Python, no ordered gather; the
    sequence logic needs only the three firsts, not the event stream."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        cols: dict = {"user_id": t["user_id"]}
        for name, ty in (("v_us", "view"), ("c_us", "click"), ("p_us", "purchase")):
            cols[name] = pc.if_else(
                pc.equal(t["event_type"], ty), ts_us, pa.scalar(None, pa.int64())
            )
        g = (
            pa.table(cols)
            .group_by(["user_id"])
            .aggregate([("v_us", "min"), ("c_us", "min"), ("p_us", "min")])
        )
        return g.rename_columns(["user_id", "v_us", "c_us", "p_us"])

    firsts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Min("v_us", alias_name="v_us", ignore_nulls=True),
            Min("c_us", alias_name="c_us", ignore_nulls=True),
            Min("p_us", alias_name="p_us", ignore_nulls=True),
        )
        .repartition(8)  # merge the groupby's zero-column empty blocks
    )

    def stage(t: pa.Table) -> pa.Table:
        v = t["v_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["c_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = t["p_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        # nulls arrive as NaN; NaN comparisons are False, which is the
        # "missing step" semantics we want
        s = np.zeros(len(t), np.int64)
        has_v = ~np.isnan(v)
        s[has_v] = 1
        adv = has_v & (c > v)
        s[adv] = 2
        s[adv & (p > c)] = 3
        return pa.table({"user_id": t["user_id"], "funnel_stage": pa.array(s)})

    return firsts.map_batches(stage, batch_format="pyarrow")


def copurchase_degree_distribution(sf_dir: str) -> rd.Dataset:
    """Degree distribution of the co-purchase graph -> (degree,
    n_nodes): endpoints exploded per batch, combiner-first count per
    node, combiner-first count per degree — two narrow shuffles."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["part_a"].combine_chunks(), t["part_b"].combine_chunks()]
            )}
        )

    deg = grouped_count(
        edges.map_batches(endpoints, batch_format="pyarrow"), ["node"], "degree"
    ).repartition(8)
    return grouped_count(
        deg.map_batches(
            lambda t: t.select(["degree"]), batch_format="pyarrow"
        ),
        ["degree"],
        "n_nodes",
    )


def events_moving_sum(sf_dir: str) -> rd.Dataset:
    """Trailing 4-row moving spend per user (frame-bounded SQL window
    aggregate) -> (user_id, event_id, win_cents, win_n)
    (ops/analytic.moving_sums)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return analytic.moving_sums(ev, "user_id", "ts", "event_id", "value")


def top_terms_per_lang(sf_dir: str) -> rd.Dataset:
    """Per-language top-5 tokens by corpus frequency -> (lang, word, n,
    rank): grouped word counts (combiner-first, same explode as
    word_count_global) followed by the three-level salted per-key top-k
    (same shape as top3_orders_per_customer — per-batch top-5 per lang,
    content-salted level-1 reduce, bounded final merge)."""
    import zlib

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def explode_count(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], pattern=r"\s+")
        lang = pc.take(t["lang"], pc.list_parent_indices(toks))
        g = (
            pa.table({"lang": lang, "word": pc.list_flatten(toks)})
            .group_by(["lang", "word"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"lang": g["lang"], "word": g["word"], "n": g["count_all"]})

    counts = (
        ds.map_batches(explode_count, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(df: pd.DataFrame, by_key: bool) -> pd.DataFrame:
        s = df.sort_values(["n", "word"], ascending=[False, True])
        return s.groupby("lang", sort=False).head(5) if by_key else s.head(5)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df, by_key=True).copy()
        # content-derived salt: deterministic under retries/partitioning
        out["_salt"] = [
            zlib.crc32(w.encode()) % 16 for w in out["word"]
        ]
        return out

    def lvl1(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df, by_key=False)[["lang", "word", "n"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df, by_key=False).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out[["lang", "word", "n", "rank"]]

    return (
        counts.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "_salt"])
        .map_groups(lvl1, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def _status_priority_finalize(t: pa.Table, present: frozenset) -> pa.Table:
    """Shared (status, priority) grouping-set finalizer: NULL-fill the
    absent keys, round the price sum, int64 count."""
    nulls = pa.array([None] * t.num_rows, pa.string())
    return pa.table(
        {
            "o_orderstatus": (
                t["o_orderstatus"] if "o_orderstatus" in present else nulls
            ),
            "o_orderpriority": (
                t["o_orderpriority"] if "o_orderpriority" in present else nulls
            ),
            "total_price": _round2(t["price_sum"]),
            "n_orders": pc.cast(t["n"], pa.int64()),
        }
    )


def orders_rollup(sf_dir: str) -> rd.Dataset:
    """SQL GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ->
    (o_orderstatus, o_orderpriority, total_price, n_orders) at three
    levels: (status, priority), per-status subtotal (priority NULL),
    grand total (both NULL).

    ONE per-batch partial pass feeds all three levels (rollup levels
    are re-aggregations of the same partials — the corpus is read
    once); each level is a combiner-first grouped sum over <= 15 narrow
    partial rows per block, unioned with typed NULL fills."""
    orders = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "price_sum": g["o_totalprice_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    # consumed by all three levels: pin, don't re-read the corpus
    partials = orders.map_batches(partial, batch_format="pyarrow").materialize()

    return agg_ops.grouping_sets_from_partials(
        partials,
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        ["price_sum", "n"],
        _status_priority_finalize,
    )


def customer_big_order_coverage(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join coverage report -> (c_custkey, n_big, c_name):
    per-customer count of orders over 400k (combiner-first, left side)
    full-outer-joined with BUILDING-segment customers (right side) —
    rows surviving from either side with typed NULL fill on the other.
    Ray's hash join coalesces the key across sides, so right-only rows
    keep their key under the left column name.  Either side can filter
    to empty, and Ray's join cannot finalize a zero-row side
    (tuning.py) — an empty side degenerates to the OTHER side plus a
    typed NULL column, produced map-side."""
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > 400000.0),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    n_big = grouped_count(
        big.map_batches(
            lambda t: pa.table({"c_custkey": t["o_custkey"]}),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        "n_big",
    ).repartition(8)
    bldg = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["c_mktsegment"], "BUILDING")
            ).select(["c_custkey", "c_name"]),
            batch_format="pyarrow",
        )
        .repartition(8)
    )

    def with_null(ds: rd.Dataset, col: str, typ: pa.DataType) -> rd.Dataset:
        return ds.map_batches(
            lambda t: t.append_column(col, pa.array([None] * t.num_rows, typ)),
            batch_format="pyarrow",
        )

    n_big = n_big.materialize()  # guard probe + join both consume it
    bldg = bldg.materialize()
    if n_big.count() == 0 and bldg.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "n_big": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                }
            )
        )
    if n_big.count() == 0:
        return with_null(bldg, "n_big", pa.int64())
    if bldg.count() == 0:
        return with_null(n_big, "c_name", pa.string())
    return joins.hash_join(n_big, bldg, on="c_custkey", how="full_outer")


def events_customer_enriched(sf_dir: str) -> rd.Dataset:
    """Skew-aware event enrichment -> (event_id, user_id, c_name): the
    hybrid skew join (ops/joins.skew_join) routes the hottest user_ids
    map-side against a broadcast of their customer rows and hash-joins
    only the cold tail — the hot-key funnel that makes plain hash joins
    collapse under power-law keys never forms."""
    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return joins.skew_join(ev, cust, on="user_id", right_on="c_custkey", hot_k=4)


def text_normalized(sf_dir: str) -> rd.Dataset:
    """Unicode normalization pass over documents (ops/text.
    normalize_batch): row-parallel, zero shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.normalize_batch, batch_format="pyarrow")


def export_events_partitioned(sf_dir: str) -> pa.Table:
    """Partitioned-sink round trip -> (event_type, n_rows): write the
    events table as hive-partitioned parquet (one directory per
    event_type — the resumable-output layout: a re-run can skip
    finished partitions, and no partition is one giant file), then
    report per-partition row counts from the written files' parquet
    FOOTERS (metadata only — the verification pass reads zero data
    pages).  The DuckDB twin recomputes the counts from the source
    table, closing the loop on what was actually written.

    Path contract: write tasks and the verifying reader must share a
    filesystem.  True here (single node, local /tmp); on a multi-node
    cluster pass an object-store / shared-fs URI instead — node-local
    paths would scatter partitions across workers invisible to the
    reader.  The directory is per-process (pid in the path), so
    concurrent drivers never rmtree each other's in-flight writes;
    re-runs within one process stay idempotent."""
    import hashlib
    import os
    import shutil

    import pyarrow.dataset as pads

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_events_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)  # idempotent re-run
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    ev.write_parquet(out_dir, partition_cols=["event_type"])

    written = pads.dataset(out_dir, format="parquet", partitioning="hive")
    counts: dict[str, int] = {}
    for frag in written.get_fragments():
        # hive dir name: .../event_type=<value>/<file>.parquet
        part = frag.path.split("event_type=")[1].split("/")[0]
        counts[part] = counts.get(part, 0) + frag.count_rows()
    keys = sorted(counts)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_rows": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )


def _hive_partition_file_stats(root: str, col: str) -> dict[str, list[int]]:
    """{partition value: [n_files, n_rows]} from parquet FOOTERS only."""
    import pyarrow.dataset as pads

    written = pads.dataset(root, format="parquet", partitioning="hive")
    stats: dict[str, list[int]] = {}
    for frag in written.get_fragments():
        part = frag.path.split(f"{col}=")[1].split("/")[0]
        s = stats.setdefault(part, [0, 0])
        s[0] += 1
        s[1] += frag.count_rows()
    return stats


def compact_events_export(sf_dir: str) -> pa.Table:
    """Small-file COMPACTION (the table-maintenance op every
    long-running 100-TB lake needs: streaming writers leave thousands
    of KB-sized files per partition; scans then pay one open/footer
    per file) -> (event_type, n_rows).  The query drives the full
    maintenance cycle: (1) write events hive-partitioned with
    deliberately tiny files (max_rows_per_file=500 — the 'many small
    increments' state), (2) compact by reading the fragmented dataset
    back and rewriting with a row-count target per file
    (max_rows_per_file=50_000; one streaming read -> write pass, no
    shuffle — partition dirs are preserved by partition_cols so a
    failed compaction can re-run per partition), (3) report per-
    partition row counts from the COMPACTED files' footers, which the
    DuckDB twin checks against the source table — proving compaction
    lost nothing.  The file-count collapse itself (small >> compacted,
    compacted == ceil(rows/target)) is pinned by pytest; footers only,
    no data pages, for both verification passes."""
    import hashlib
    import os
    import shutil

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    small_dir = f"/tmp/deepie_export/p{os.getpid()}_compact_small_{tag}"
    out_dir = f"/tmp/deepie_export/p{os.getpid()}_compact_out_{tag}"
    for d in (small_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    ev.write_parquet(
        small_dir, partition_cols=["event_type"], max_rows_per_file=500
    )

    frag = rd.read_parquet(small_dir)
    frag.write_parquet(
        out_dir,
        partition_cols=["event_type"],
        min_rows_per_file=50_000,
        max_rows_per_file=50_000,
    )

    stats = _hive_partition_file_stats(out_dir, "event_type")
    keys = sorted(stats)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_rows": pa.array([stats[k][1] for k in keys], pa.int64()),
        }
    )


def media_decode_features(sf_dir: str) -> rd.Dataset:
    """REAL multimodal decode path -> (doc_id, span_idx, kind,
    media_ref, feat_norm, dim0, dim1): image/audio spans are paired
    with deterministic REAL payloads (valid P6 PPM / 16-bit PCM WAV
    bytes synthesized from the ref — the test stand-in for the blob
    fetch ``media_ref`` points at), then an actor-pool stage DECODES
    the actual bytes and runs the same resize/frame-energy math as the
    stubbed path (ops/media.BinaryMediaDecoder).  'table' spans (no
    container-decodable codec) stay on the stub route.  Rows-only;
    codec round-trips are pinned by pytest."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")
    decodable = spans.map_batches(
        lambda t: t.filter(pc.is_in(t["kind"], value_set=pa.array(["image", "audio"]))),
        batch_format="pyarrow",
    )

    def attach_payload(t: pa.Table) -> pa.Table:
        payloads = [
            media.synth_payload(k, r)
            for k, r in zip(t["kind"].to_pylist(), t["media_ref"].to_pylist())
        ]
        return t.append_column("payload", pa.array(payloads, pa.binary()))

    feats = decodable.map_batches(
        attach_payload, batch_format="pyarrow"
    ).map_batches(
        media.BinaryMediaDecoder,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows
        concurrency=(1, 2),
    )

    def narrow(t: pa.Table) -> pa.Table:
        norms = np.linalg.norm(
            np.asarray(t["media_feat"].to_pylist(), dtype=np.float32), axis=1
        ).round(4)
        return t.drop_columns(["media_feat"]).append_column(
            "feat_norm", pa.array(norms.astype(np.float64))
        )

    return feats.map_batches(narrow, batch_format="pyarrow")


def embedding_centroids(sf_dir: str) -> rd.Dataset:
    """Grouped VECTOR aggregate -> (grp, dim, centroid): per-dimension
    mean embedding for each of 8 deterministic groups (vec_id % 8 — an
    SQL-expressible stand-in for a cluster/lang column), emitted LONG
    (one row per group x dimension) so the driver value-hash covers
    every component.

    Combiner-first on matrices: each batch reduces to at most 8 rows of
    (grp, 64-float sum, count) — the shuffle moves per-block partial
    VECTORS, never embeddings; the final per-group merge holds
    O(blocks) 64-float rows (salt the merge like ops/sketch if group
    count x blocks ever matters)."""
    from .ops.cluster import _batch_matrix

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        X = _batch_matrix(t, "embedding").astype(np.float64)
        if X.shape[0] == 0:
            return pa.table(
                {
                    "grp": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = (ids % 8).astype(np.int64)
        grps = np.unique(g)
        sums = [X[g == gg].sum(axis=0) for gg in grps]
        ns = np.array([(g == gg).sum() for gg in grps], np.int64)
        return pa.table(
            {
                "grp": pa.array(grps),
                "sums": pa.array([s.tolist() for s in sums], pa.list_(pa.float64())),
                "n": pa.array(ns),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        S = np.asarray(t["sums"].to_pylist(), np.float64).sum(axis=0)
        n = int(pc.sum(t["n"]).as_py())
        c = S / n
        grp = t["grp"][0].as_py()
        return pa.table(
            {
                "grp": pa.array(np.full(len(c), grp, np.int64)),
                "dim": pa.array(np.arange(len(c), dtype=np.int64)),
                "centroid": pa.array([round(float(v), 6) for v in c], pa.float64()),
            }
        )

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(merge, batch_format="pyarrow")
    )


def _dup_span_counts(
    occ: rd.Dataset, key_col: str, total_col: str, dup_col: str
) -> rd.Dataset:
    """Shared duplicate-span counting pipeline over an occurrence table
    ``(doc_id, <key_col>, first)`` WITH multiplicity, where ``first``
    == 1 marks the first occurrence of the key within its document —
    computed at the document row, so the (doc, key) distinct set is
    exact regardless of how Ray later splits blocks (per-batch re-dedup
    would double-count a doc whose rows straddle a block boundary).

    -> (doc_id, total_col, dup_col): keys seen in >= 2 distinct docs
    are found combiner-first over the ``first`` rows; the
    per-occurrence dup test is a hash-partitioned SEMI-join; the dup
    counts are materialized ONCE so the empty-corpus probe does not
    re-execute the join lineage."""
    occ = occ.materialize()
    pairs = occ.map_batches(
        lambda t: t.filter(pc.equal(t["first"], pa.scalar(1))).select(
            [key_col, "doc_id"]
        ),
        batch_format="pyarrow",
    )
    dup_keys = grouped_count(pairs, [key_col], "n_docs").map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], pa.scalar(2))).select(
            [key_col]
        ),
        batch_format="pyarrow",
    )
    totals = grouped_count(
        occ.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
        ["doc_id"],
        total_col,
    ).repartition(8)
    dups = (
        grouped_count(
            joins.semi_join(occ, dup_keys, on=key_col).map_batches(
                lambda t: t.select(["doc_id"]), batch_format="pyarrow"
            ),
            ["doc_id"],
            dup_col,
        )
        .repartition(8)
        .materialize()  # probe + join both consume it: run the join once
    )
    if dups.count() == 0:
        return totals.map_batches(
            lambda t: t.append_column(
                dup_col, pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        )
    joined = joins.hash_join(totals, dups, on="doc_id", how="left_outer")
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                total_col: t[total_col],
                dup_col: pc.cast(pc.fill_null(t[dup_col], 0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def duplicate_spans(sf_dir: str) -> rd.Dataset:
    """Exact substring-level duplicate-span detection — the char-k-gram
    core of 'Deduplicating Training Data Makes Language Models Better'
    (Lee et al. 2022, arXiv:2107.06499): 40-char grams at stride 20; a
    span is DUPLICATED iff its gram occurs in >= 2 distinct documents
    -> (doc_id, n_spans, n_dup_spans) for every doc long enough to
    carry a span.  Counting pipeline: ``_dup_span_counts``.  At 100 TB
    use ``duplicate_spans_winnowed`` — same pipeline over boundedly
    fewer rows per doc."""
    K, S = 40, 20
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        gs: list[str] = []
        firsts: list[int] = []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            txt = txt or ""
            if len(txt) < K:
                continue
            seen: set[str] = set()
            for i in range((len(txt) - K) // S + 1):
                g = txt[i * S : i * S + K]
                ids_out.append(did)
                gs.append(g)
                firsts.append(0 if g in seen else 1)
                seen.add(g)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "gram": pa.array(gs, pa.string()),
                "first": pa.array(firsts, pa.int8()),
            }
        )

    occ = docs.map_batches(grams, batch_format="pyarrow")
    return _dup_span_counts(occ, "gram", "n_spans", "n_dup_spans")


def duplicate_spans_winnowed(sf_dir: str) -> rd.Dataset:
    """Winnowed duplicate-span detection — the documented SCALE path of
    ``duplicate_spans``: per-doc fingerprints selected by winnowing
    (ops/dedup.winnow_fingerprints, ~2/(w+1) of the grams, with the
    guarantee that any shared substring >= w+k-1 UTF-8 BYTES still
    collides; the op works in the byte domain — see the domain
    contract on ``winnow_fingerprints``, pinned by the non-ASCII
    guarantee test) -> (doc_id, n_fps, n_dup_fps).  Counting pipeline:
    ``_dup_span_counts``.  Rows-only (the window-minimum selection is
    not SQL-expressible) — the winnowing guarantee and numpy parity are
    pytest-pinned."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    occ = dedup.winnowed_gram_table(docs, k=40, w=8).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "h": t["h"], "first": t["first"]}
        ),
        batch_format="pyarrow",
    )
    return _dup_span_counts(occ, "h", "n_fps", "n_dup_fps")


def export_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """JSONL sink + source round trip -> (doc_id, fingerprint): write
    the documents table as JSON-lines shards (Ray's distributed
    write_json), read the shards back with read_json, and fingerprint
    the text that survived the trip.  The DuckDB twin fingerprints the
    ORIGINAL table, so a hash match proves byte-exact text round-trip
    through JSON escaping (newlines, quotes, non-ASCII).  Same
    shared-filesystem path contract as export_events_partitioned."""
    import hashlib
    import os
    import shutil

    from .hashing import md5_hex

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_jsonl_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    docs.write_json(out_dir)
    back = rd.read_json(out_dir)

    fp = _fp_roundtrip

    return back.map_batches(fp, batch_format="pyarrow")


def export_csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """CSV sink + source round trip -> (doc_id, fingerprint): write
    the documents table as CSV shards (Ray's distributed write_csv —
    pyarrow's writer, which quotes embedded newlines/quotes/commas),
    read the shards back with read_csv, and fingerprint the text that
    survived the trip.  The DuckDB twin fingerprints the ORIGINAL
    table, so a hash match proves byte-exact text round-trip through
    CSV quoting — the interchange format every external data drop
    still arrives in.  Same shared-filesystem path contract as
    export_events_partitioned."""
    import hashlib
    import os
    import shutil

    from .hashing import md5_hex

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_csv_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    docs.write_csv(out_dir)
    back = rd.read_csv(out_dir)

    fp = _fp_roundtrip

    return back.map_batches(fp, batch_format="pyarrow")


def orders_price_ranked(sf_dir: str) -> rd.Dataset:
    """Range-partitioned distributed SORT -> (o_orderkey, shard, pos):
    the textbook scale shape for a global sort — quartile boundaries
    from the mergeable quantile sketch (three broadcast floats), rows
    routed to their range shard by a vectorized searchsorted, then ONE
    shuffle on shard and a per-shard local sort with positions.  Output
    is a total order: (shard, pos) ascends with (o_totalprice,
    o_orderkey).  Shard count is the knob — here 4 for the oracle; at
    scale use ~cluster-cores boundaries so per-task state is
    corpus/shards."""
    from .ops.sketch import grouped_quantile

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).materialize()

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int64)))

    # cap raised so the sketch stays EXACT through sf0.1 (~150k rows;
    # default 65k cap would compact and nudge boundaries off the
    # oracle's quantile_cont).  Approximate boundaries would still
    # yield a correct TOTAL ORDER — they only skew shard balance — but
    # the oracle compare needs the exact ones at test scales.
    b = (
        grouped_quantile(
            orders.map_batches(add_key, batch_format="pyarrow"),
            "_g",
            "o_totalprice",
            q={"q1": 0.25, "q2": 0.5, "q3": 0.75},
            ndigits=None,
            cap=1 << 18,
        )
        .to_pandas()
        .iloc[0]
    )
    bounds = np.array([b["q1"], b["q2"], b["q3"]], dtype=np.float64)

    def shard(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        s = np.searchsorted(bounds, p, side="right").astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "shard": pa.array(s),
            }
        )

    def local_sort(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "shard": df["shard"].to_numpy(),
                "pos": np.arange(len(df), dtype=np.int64),
            }
        )

    return (
        orders.map_batches(shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(local_sort, batch_format="pandas")
    )


def event_type_transitions(sf_dir: str) -> rd.Dataset:
    """First-order transition counts over each user's time-ordered
    event stream (Markov bigram matrix) -> (from_type, to_type, n):
    per-user consecutive pairs via the ordered-analytics shuffle
    (ops/analytic.ordered_apply — one shuffle on user_id, numpy pair
    slicing within a group), then a combiner-first grouped count over
    the narrow (from, to) rows."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts"]), batch_format="pandas"
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": [], "to_type": []})
        return pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})

    pairs = analytic.ordered_apply(clean, "user_id", ["ts", "event_id"], per_key)
    return grouped_count(pairs, ["from_type", "to_type"], "n")


def copurchase_assoc(sf_dir: str) -> rd.Dataset:
    """Association-mining counts on the co-purchase graph ->
    (part_a, part_b, co_count, n_a, n_b): each edge's co-occurrence
    count joined with both endpoints' distinct-order support counts —
    the integer-exact inputs to PMI / lift / confidence (emitted as
    counts, not floats, so the oracle value-hash is bitwise).  Two
    hash-partitioned joins against the (small, per-part) support
    table; edges never gather on the driver."""
    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    from .ops import graph

    # one distinct pass feeds BOTH the edge build and the support counts
    p = graph.distinct_order_parts(li)
    edges = graph.copurchase_edges(li, pairs=p).materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "co_count": pa.array([], pa.int64()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                }
            )
        )

    # support from the GLOBALLY-distinct pair set (per-batch distinct
    # alone double-counts pairs straddling block splits)
    support = grouped_count(
        p.map_batches(
            lambda t: t.select(["l_partkey"]), batch_format="pyarrow"
        ),
        ["l_partkey"],
        "n",
    ).repartition(8)

    sa = support.map_batches(
        lambda t: pa.table({"part_a": t["l_partkey"], "n_a": t["n"]}),
        batch_format="pyarrow",
    )
    sb = support.map_batches(
        lambda t: pa.table({"part_b": t["l_partkey"], "n_b": t["n"]}),
        batch_format="pyarrow",
    )
    out = joins.hash_join(edges.repartition(8), sa, on="part_a")
    out = joins.hash_join(out.repartition(8), sb, on="part_b")
    return out.map_batches(
        lambda t: t.select(["part_a", "part_b", "co_count", "n_a", "n_b"]),
        batch_format="pyarrow",
    )


# ------------------------------------------- round-4 coverage extensions


def orders_cube(sf_dir: str) -> rd.Dataset:
    """SQL GROUP BY CUBE(o_orderstatus, o_orderpriority) -> the four
    grouping combinations: (status, priority), per-status (priority
    NULL), per-priority (status NULL), grand total (both NULL).

    Same shape as ``orders_rollup`` plus the priority-only level: ONE
    per-batch partial pass feeds all four levels (cube levels are
    re-aggregations of the same <=15-row-per-block partials; the corpus
    is read once)."""
    orders = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "price_sum": g["o_totalprice_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = orders.map_batches(partial, batch_format="pyarrow").materialize()

    return agg_ops.grouping_sets_from_partials(
        partials,
        [
            ["o_orderstatus", "o_orderpriority"],
            ["o_orderstatus"],
            ["o_orderpriority"],
            [],
        ],
        ["price_sum", "n"],
        _status_priority_finalize,
    )


def orders_grouping_sets(sf_dir: str) -> rd.Dataset:
    """SQL GROUP BY GROUPING SETS ((status, year), (priority), ()) —
    the GENERIC grouping-sets shape that CUBE/ROLLUP cannot express
    (non-lattice subsets over three keys) -> (o_orderstatus,
    o_orderpriority, o_year, total_price, n_orders), non-participating
    keys NULL per SQL semantics.

    Same scale shape as ``orders_cube``: ONE per-batch partial pass
    over the UNION of all sets' keys (status, priority, year — a few
    dozen rows per block) feeds every set as a re-aggregation of the
    same partials; the corpus is read once and never re-shuffled."""
    orders = _read(
        sf_dir,
        "orders",
        ["o_orderstatus", "o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        g = (
            pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "o_orderpriority": t["o_orderpriority"],
                    "o_year": yr,
                    "price": t["o_totalprice"],
                }
            )
            .group_by(["o_orderstatus", "o_orderpriority", "o_year"])
            .aggregate([("price", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "o_year": g["o_year"],
                "price_sum": g["price_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = orders.map_batches(partial, batch_format="pyarrow").materialize()

    def finalize(t: pa.Table, present: frozenset) -> pa.Table:
        snull = pa.array([None] * t.num_rows, pa.string())
        inull = pa.array([None] * t.num_rows, pa.int64())
        return pa.table(
            {
                "o_orderstatus": (
                    t["o_orderstatus"] if "o_orderstatus" in present else snull
                ),
                "o_orderpriority": (
                    t["o_orderpriority"]
                    if "o_orderpriority" in present
                    else snull
                ),
                "o_year": (
                    pc.cast(t["o_year"], pa.int64())
                    if "o_year" in present
                    else inull
                ),
                "total_price": _round2(t["price_sum"]),
                "n_orders": pc.cast(t["n"], pa.int64()),
            }
        )

    return agg_ops.grouping_sets_from_partials(
        partials,
        [["o_orderstatus", "o_year"], ["o_orderpriority"], []],
        ["price_sum", "n"],
        finalize,
    )


def events_value_stats(sf_dir: str) -> rd.Dataset:
    """Grouped variance/stddev via the classic mergeable moment sketch:
    per-batch (n, sum, sum-of-squares) partials over INTEGER CENTS
    (floor(value*100) — int64 sums are exact, so the merge order cannot
    perturb the result the way float partial sums can), a tiny global
    groupby, and the sample-variance finalizer (ss - s^2/n)/(n-1) on
    exactly-represented integers -> (event_type, n_events, sum_cents,
    stddev_cents).  The DuckDB twin runs stddev_samp over the same
    cents column; both sides round to 4dp."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        cents = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
        sq = pc.multiply(cents, cents)
        g = (
            pa.table({"event_type": t["event_type"], "c": cents, "sq": sq})
            .group_by("event_type")
            .aggregate([("c", "sum"), ("sq", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["c_sum"],
                "ss": g["sq_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        ss = t["ss"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        var = np.where(n > 1, (ss - s * s / n) / np.maximum(n - 1, 1), np.nan)
        sd = np.sqrt(np.maximum(var, 0.0))
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": pc.cast(t["n"], pa.int64()),
                "sum_cents": pc.cast(t["s"], pa.int64()),
                "stddev_cents": pa.array(
                    [None if np.isnan(x) else round(float(x), 4) for x in sd],
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def revenue_by_nation_year(sf_dir: str) -> rd.Dataset:
    """TPC-H Q9-shaped multi-join rollup: supplier-nation revenue per
    ORDER YEAR -> (n_name, o_year, revenue).  Scale shape: the big-big
    lineitem |x| orders join and the sf-scaled supplier join are
    hash-partitioned (same contract as q5); nation (25 rows, genuinely
    fixed) broadcasts as a driver dict; year extraction and the
    (nation, year) pre-aggregation happen inside the per-batch partial
    so the global shuffle moves <= 25 x n_years rows per block."""
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    li = _lineitem(
        sf_dir, ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    lo = joins.hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    ).repartition(8)  # merge empty join-output blocks before the next join
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    los = joins.hash_join(
        lo, supp, on="l_suppkey", right_on="s_suppkey", num_partitions=8
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "n_name": pd.Series([], dtype=str),
                    "o_year": pd.Series([], dtype=np.int64),
                    "revenue": pd.Series([], dtype=np.float64),
                }
            )
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        yr = pd.to_datetime(df["o_orderdate"]).dt.year.astype(np.int64)
        names = df["s_nationkey"].map(name_of)
        out = rev.groupby([names, yr]).sum().reset_index()
        out.columns = ["n_name", "o_year", "revenue"]
        return out

    agg = (
        los.map_batches(partial, batch_format="pandas")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "o_year": pc.cast(t["o_year"], pa.int64()),
                "revenue": _round2(t["revenue"]),
            }
        ),
        batch_format="pyarrow",
    )


def users_view_and_purchase(sf_dir: str) -> rd.Dataset:
    """SQL INTERSECT as a distributed flag-fold: users with >= 1 'view'
    AND >= 1 'purchase' event -> (user_id).  Per-batch max-flag partials
    (one row per distinct user per block), a tiny global max-groupby,
    then a filter — set intersection without materializing either
    operand, and the only shuffle moves (user, 2 flag ints) rows."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.equal(t["event_type"], "view"), pa.int64())
        p = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        g = (
            pa.table({"user_id": t["user_id"], "v": v, "p": p})
            .group_by("user_id")
            .aggregate([("v", "max"), ("p", "max")])
        )
        return pa.table(
            {"user_id": g["user_id"], "v": g["v_max"], "p": g["p_max"]}
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("v", alias_name="v"), Max("p", alias_name="p"))
    )
    return agg.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["v"], 1), pc.equal(t["p"], 1))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )


def orders_date_dense_rank(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK per customer by order date -> (o_custkey, o_orderkey,
    rank): ties (same-day orders of one customer) share a rank with no
    gaps — the tie-sharing member of the ranking family, complementing
    row_number (top3_orders_per_customer) and NTILE/PERCENT_RANK
    (events_value_quartiles).  ops/analytic.dense_ranks: one shuffle on
    the customer key, numpy cumsum-of-change-flags within each group."""
    from .ops import analytic

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    out = analytic.dense_ranks(orders, "o_custkey", "o_orderdate", "o_orderkey")
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "rank": pc.cast(t["rank"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def orders_above_customer_avg(sf_dir: str) -> rd.Dataset:
    """Correlated-aggregate filter (SQL ``WHERE o_totalprice > (SELECT
    avg(...) ... same customer)``) -> (o_orderkey, o_custkey): orders
    strictly above their own customer's average order price.

    Two-pass shape: a combiner-first per-customer (sum, n) aggregate —
    never AVG partials, averages don't merge — hash-joined back to the
    orders stream, then a vectorized filter.  The comparison is EXACT
    integer arithmetic on cents (``cents * n > sum_cents``), so the
    boundary can't flip on a float-summation-order ulp the way
    ``price > sum/n`` could against the oracle's avg()."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        g = (
            pa.table({"o_custkey": t["o_custkey"], "c": cents})
            .group_by("o_custkey")
            .aggregate([("c", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "o_custkey": g["o_custkey"],
                "s": g["c_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    stats = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .repartition(8)
    )
    joined = joins.hash_join(orders, stats, on="o_custkey", num_partitions=8)

    def filt(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        keep = pc.greater(pc.multiply(cents, t["n"]), t["s"])
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    return joined.map_batches(filt, batch_format="pyarrow")


def part_name_first_word_stats(sf_dir: str) -> rd.Dataset:
    """String-kernel grouped aggregate -> (word, n_parts, sum_price):
    the FIRST word of every part name (Arrow ``split_pattern`` +
    ``list_element`` — vectorized, no per-row Python), combiner-first
    counts and price sums."""
    part = _read(sf_dir, "part", ["p_name", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.list_element(pc.split_pattern(t["p_name"], " "), 0)
        g = (
            pa.table({"word": w, "p": t["p_retailprice"]})
            .group_by("word")
            .aggregate([("p", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "word": g["word"],
                "sum_price": g["p_sum"],
                "n_parts": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        part.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(
            Sum("sum_price", alias_name="sum_price"),
            Sum("n_parts", alias_name="n_parts"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "word": t["word"],
                "n_parts": pc.cast(t["n_parts"], pa.int64()),
                "sum_price": _round2(t["sum_price"]),
            }
        ),
        batch_format="pyarrow",
    )


def events_first_last_value(sf_dir: str) -> rd.Dataset:
    """Ordered FIRST/LAST aggregate per key -> (user_id, first_cents,
    last_cents, n_events): the first and last event value of each user
    in (ts, event_id) order, in integer cents (exact hash).  One
    shuffle on the key (ops/analytic.ordered_apply); the DuckDB twin is
    the ordered-aggregate form ``first(x ORDER BY ...)``."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts"]), batch_format="pandas"
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "first_cents": [cents[0]],
                "last_cents": [cents[-1]],
                "n_events": np.array([len(df)], dtype=np.int64),
            }
        )

    return analytic.ordered_apply(clean, "user_id", ["ts", "event_id"], per_key)


def events_p50_disc(sf_dir: str) -> rd.Dataset:
    """Exact DISCRETE median per group (quantile_disc: an actual
    element, not an interpolation — the partner of the KMV-sketch
    quantile_cont queries) -> (event_type, p50_cents).  Groups are
    low-cardinality (5 event types), so one map_groups task per group
    holds that group's values: sort + index floor(q*(n-1)) — pinned to
    DuckDB's quantile_disc index rule by the oracle."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["value"]), batch_format="pandas"
    )

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy())
        idx = int(np.floor(0.5 * (len(v) - 1)))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "p50_cents": np.array(
                    [np.floor(v[idx] * 100.0)], dtype=np.int64
                ),
            }
        )

    return clean.groupby("event_type").map_groups(per_type, batch_format="pandas")


def events_value_mad(sf_dir: str) -> rd.Dataset:
    """Robust dispersion per group -> (event_type, med_cents,
    mad_cents): exact discrete median of integer cents plus the median
    absolute deviation (discrete median of |cents - median|) — the
    outlier-resistant spread statistic quality pipelines use where
    stddev is skew-fragile.  Same execution shape as events_p50_disc
    (groups are 5 event types, one map_groups task per group, sort +
    floor(q*(n-1)) index pinned to DuckDB quantile_disc); both medians
    come out of ONE pass over each group — no second shuffle to join
    the median back.  For high-cardinality keys the mergeable quantile
    sketch (ops/sketch.py) is the scale path."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["value"]), batch_format="pandas"
    )

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        v = np.sort(cents)
        idx = int(np.floor(0.5 * (len(v) - 1)))
        med = v[idx]
        dev = np.sort(np.abs(cents - med))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "med_cents": np.array([med], dtype=np.int64),
                "mad_cents": np.array([dev[idx]], dtype=np.int64),
            }
        )

    return clean.groupby("event_type").map_groups(per_type, batch_format="pandas")


def doc_intra_repetition(sf_dir: str) -> rd.Dataset:
    """Within-doc duplicated word-3-gram counts (Gopher 'duplicate
    n-gram fraction' signal) -> (doc_id, n_grams, n_dup_grams) —
    shuffle-free streaming map (ops/text.intra_doc_repetition)."""
    return text.intra_doc_repetition(
        _read(sf_dir, "documents", ["doc_id", "text"])
    )


def user_retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Retention-cohort analysis -> (cohort_week, week_offset,
    n_active): users bucketed by the ISO week (Monday-truncated) of
    their FIRST event, then for each cohort the exact count of
    distinct users active in each subsequent week — the product-
    analytics staple behind every retention triangle.  Plan: one
    vectorized week-truncation pass, a grouped-min for the cohort
    assignment (narrow user/week rows), one hash-partitioned join of
    events back to cohorts, then the exact-distinct machinery of
    events_distinct_users (per-batch distinct triples -> distinct
    shuffle -> grouped count).  Every shuffle moves (user, week)-sized
    rows, never event payloads."""
    from .ops import joins

    US_PER_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts"]), batch_format="pandas"
    )

    def week_start(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        days = ts_us // US_PER_DAY
        wk = ((days - (days + 3) % 7) * US_PER_DAY).astype("datetime64[us]")
        return pa.table(
            {"user_id": t["user_id"], "wk": pa.array(wk, pa.timestamp("us"))}
        )

    wk = clean.map_batches(week_start, batch_format="pyarrow")
    first = wk.groupby("user_id").aggregate(Min("wk", alias_name="cohort_week"))
    act = joins.hash_join(wk, first, on="user_id")

    def offsets(t: pa.Table) -> pa.Table:
        wk_us = t["wk"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cw_us = (
            t["cohort_week"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        off = (wk_us - cw_us) // (7 * US_PER_DAY)
        tab = pa.table(
            {
                "user_id": t["user_id"],
                "cohort_week": t["cohort_week"],
                "week_offset": pa.array(off),
            }
        )
        return tab.group_by(
            ["user_id", "cohort_week", "week_offset"]
        ).aggregate([])

    distinct = (
        act.map_batches(offsets, batch_format="pyarrow")
        .groupby(["user_id", "cohort_week", "week_offset"])
        .count()
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cohort_week", "week_offset"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "cohort_week": g["cohort_week"],
                "week_offset": g["week_offset"],
                "n_partial": g["count_all"],
            }
        )

    return (
        distinct.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_partial", alias_name="n_active"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cohort_week": t["cohort_week"],
                    "week_offset": t["week_offset"],
                    "n_active": pc.cast(t["n_active"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def text_bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """BPE-style pre-tokenizer counts -> (doc_id, n_bpe_tokens): the
    GPT-2-family pre-tokenization classes (space-prefixed letter runs,
    digit runs, punctuation runs) counted with ONE vectorized RE2 pass
    (``pc.count_substring_regex``) — the subword-budget estimator that
    complements the whitespace counter (``text_token_counts``).  The
    lookahead clauses of the exact GPT-2 pattern are dropped (RE2 has
    no lookahead — and neither does the DuckDB oracle, so both sides
    run the identical pattern).  Pure streaming map, no shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pat = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"

    def count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pat)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(pc.fill_null(n, 0), pa.int64()),
            }
        )

    return docs.map_batches(count, batch_format="pyarrow")


def term_cooccurrence(sf_dir: str) -> rd.Dataset:
    """Word co-occurrence counts -> (term_a, term_b, n_docs): for every
    unordered pair of DISTINCT words appearing in the same document,
    the number of documents containing both — the text twin of the
    co-purchase graph (same distinct-first explode + combiner-count
    shape).  Per-doc pair explode is C(t,2) over the doc's distinct
    vocabulary; the per-batch partial groupby collapses it to at most
    C(V,2) rows per block (V = corpus vocabulary), so the global
    shuffle is vocabulary-bounded, never corpus-bounded."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        for txt in t["text"].to_pylist():
            toks = sorted(set(ws_tokens((txt or "").lower())))
            m = len(toks)
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, 1)
            a_out.extend(toks[i] for i in ia)
            b_out.extend(toks[j] for j in ib)
        g = (
            pa.table(
                {
                    "term_a": pa.array(a_out, pa.string()),
                    "term_b": pa.array(b_out, pa.string()),
                }
            )
            .group_by(["term_a", "term_b"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "term_a": g["term_a"],
                "term_b": g["term_b"],
                "n_docs": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .map_batches(
            lambda t: pa.table(
                {
                    "term_a": t["term_a"],
                    "term_b": t["term_b"],
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def jaccard_dup_components(sf_dir: str) -> rd.Dataset:
    """Connected components over the EXACT n-gram Jaccard duplicate
    graph -> (doc_id, cluster_id = min doc id reachable): the edges are
    ``ngram_jaccard_exact``'s >= 0.3 pairs, resolved by the shared
    size-gated component machinery (ops/dedup.components_from_pairs:
    union-find fast path below DRIVER_CC_MAX_EDGES, distributed
    min-label propagation above it).  This gives the CC operator a TRUE
    SQL oracle — a recursive-CTE reachability closure over the same
    edge set — where it was previously pytest-only (the minhash variant
    is not SQL-expressible)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.jaccard_exact_blockjoin(ds, threshold_num=3, threshold_den=10)
    return dedup.components_from_pairs(pairs, pa.int64(), num_partitions=8)


def supplier_name_neardup(sf_dir: str) -> rd.Dataset:
    """Fuzzy entity matching (KG entity-resolution primitive): all
    supplier pairs whose NAMES are within byte-Levenshtein distance 1
    -> (s1, s2, dist) with s1 < s2 — typo-level variants of the same
    surface, the fuzzy complement of the exact alias lookup in
    ops/link.py (reference links surfaces exactly only:
    rnnRE/rnn_process_onlyExtra.py alias path).

    Scale shape: ops/fuzzy.levenshtein_neardup_pairs — distributed
    chunk-pair cross join (same contract as embedding_neardup), batched
    numpy DP over the pair axis, lossless length-gate prefilter; at
    100 TB a lossy blocking key (name-shingle MinHash) goes in front
    of the same verify kernel."""
    from .ops import fuzzy

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return fuzzy.levenshtein_neardup_pairs(
        supp, k=1, id_col="s_suppkey", name_col="s_name"
    )


def events_value_corr(sf_dir: str) -> rd.Dataset:
    """Grouped Pearson correlation between event value (integer cents)
    and hour-of-day -> (event_type, n, corr_value_hour): the mergeable
    5-sum moment sketch (sum x, y, xy, x2, y2 — all EXACT int64 over
    integer-valued features, so merge order cannot perturb the result),
    one tiny global groupby, and the closed-form finalizer
    (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2)) evaluated
    in float64 from the exact sums.  The DuckDB twin evaluates the
    IDENTICAL expression over the identical integer sums (not its
    streaming corr(): IEEE ops on equal inputs give equal bits, a
    different accumulation order does not).  int64 sums are exact at
    bench scale; a 100-TB deployment splits the x^2 sum into hi/lo
    int64 lanes (the sketch stays mergeable)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"])))
        x = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
        y = pc.cast(pc.hour(t["ts"]), pa.int64())
        tt = pa.table(
            {
                "event_type": t["event_type"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
            }
        )
        g = tt.group_by("event_type").aggregate(
            [
                ("x", "sum"),
                ("y", "sum"),
                ("xy", "sum"),
                ("xx", "sum"),
                ("yy", "sum"),
                ([], "count_all"),
            ]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "sx": g["x_sum"],
                "sy": g["y_sum"],
                "sxy": g["xy_sum"],
                "sxx": g["xx_sum"],
                "syy": g["yy_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("n", alias_name="n"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        f = lambda c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        n, sx, sy = f("n"), f("sx"), f("sy")
        sxy, sxx, syy = f("sxy"), f("sxx"), f("syy")
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where(den != 0.0, num / den, np.nan)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "corr_value_hour": pa.array(
                    [None if np.isnan(c) else float(c) for c in corr],
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def customer_priority_mode(sf_dir: str) -> rd.Dataset:
    """Grouped MODE with a deterministic tie-break -> (o_custkey,
    top_priority, n_orders): each customer's most frequent order
    priority (ties broken by smallest priority string — SQL mode() has
    unspecified ties, so the oracle is the explicit row_number form).

    Shape: per-batch (custkey, priority) count partials with a derived
    ``part = custkey mod P`` routing column, ONE groupby(part) shuffle
    of narrow count rows, then a fully VECTORIZED per-partition pandas
    fold (sort + drop_duplicates) — the part-colocate pattern; never
    one Python map_groups call per customer."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    P = 32

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey", "o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "part": pc.cast(
                    pc.bit_wise_and(g["o_custkey"], P - 1), pa.int64()
                ),
                "o_custkey": g["o_custkey"],
                "o_orderpriority": g["o_orderpriority"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = orders.map_batches(partial, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "o_orderpriority"], as_index=False)[
            "n"
        ].sum()
        g = g.sort_values(
            ["o_custkey", "n", "o_orderpriority"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = g.drop_duplicates("o_custkey", keep="first")
        return pd.DataFrame(
            {
                "o_custkey": top["o_custkey"].to_numpy(),
                "top_priority": top["o_orderpriority"].to_numpy(),
                "n_orders": top["n"].to_numpy().astype(np.int64),
            }
        )

    return parts.groupby("part").map_groups(
        per_part, batch_format="pandas"
    ).select_columns(["o_custkey", "top_priority", "n_orders"])


def nation_top_suppliers(sf_dir: str) -> rd.Dataset:
    """Ordered string aggregation -> (s_nationkey, top_suppliers): each
    nation's top-3 suppliers by (acctbal DESC, name) joined ','  — the
    SQL ``string_agg(... ORDER BY ...)`` member of the aggregate
    family, with the deterministic order contract stated in the query.

    Combiner-first: per-batch top-3 per nation (only <= 3 rows per
    nation per block ever shuffle), then a 25-group final fold."""
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_name", "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["s_nationkey", "s_acctbal", "s_name"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("s_nationkey", as_index=False).head(3)

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["s_acctbal", "s_name"], ascending=[False, True], kind="mergesort"
        ).head(3)
        return pd.DataFrame(
            {
                "s_nationkey": [df["s_nationkey"].iloc[0]],
                "top_suppliers": [",".join(df["s_name"])],
            }
        )

    return (
        supp.map_batches(partial, batch_format="pandas")
        .groupby("s_nationkey")
        .map_groups(per_nation, batch_format="pandas")
    )


def user_days_view_not_purchase(sf_dir: str) -> rd.Dataset:
    """SQL EXCEPT as the same distributed flag-fold as the INTERSECT
    twin (users_view_and_purchase): (user, day) slots with >= 1 'view'
    and ZERO 'purchase' events that day -> (user_id, day = epoch day).
    Set difference without materializing either operand; the only
    shuffle moves (user, day, 2 flag ints) rows.  Day arithmetic is
    exact integer microseconds // 86400e6 on both sides (post-1970
    corpus; the numpy floor-division window queries handle pre-1970)."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        v = pc.cast(pc.equal(t["event_type"], "view"), pa.int64())
        p = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        g = (
            pa.table({"user_id": t["user_id"], "day": day, "v": v, "p": p})
            .group_by(["user_id", "day"])
            .aggregate([("v", "max"), ("p", "max")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "v": g["v_max"],
                "p": g["p_max"],
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Max("v", alias_name="v"), Max("p", alias_name="p"))
    )
    return agg.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["v"], 1), pc.equal(t["p"], 0))
        ).select(["user_id", "day"]),
        batch_format="pyarrow",
    )


def events_p50_cont(sf_dir: str) -> rd.Dataset:
    """Exact CONTINUOUS (interpolated) median per group -> (event_type,
    p50_value): numpy linear interpolation at index q*(n-1), the
    partner of the discrete-quantile query (events_p50_disc) and the
    exactness anchor for the KMV quantile sketches.  Bit parity with
    DuckDB quantile_cont was probed on doubles (identical interpolation
    rule lo + (hi-lo)*frac); groups are low-cardinality so one
    map_groups task per group holds that group's values."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["value"]), batch_format="pandas"
    )

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "p50_value": [float(np.quantile(v, 0.5, method="linear"))],
            }
        )

    return clean.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


def event_props_k_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured field extraction: pull the integer ``k`` field
    out of the ``props`` JSON-string column with ONE vectorized RE2
    pass (``pc.extract_regex``) — no per-row json.loads — and fold
    per event type -> (event_type, n_with_k, sum_k, min_k, max_k).
    The DuckDB twin uses real JSON extraction (json_extract_string),
    so the hash match also certifies the regex fast path against a
    JSON parser on this corpus.  Rows whose props lack an integer k
    are excluded on both sides."""
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        kv = pc.cast(pc.struct_field(s, "k"), pa.int64())
        tt = pa.table({"event_type": t["event_type"], "k": kv})
        tt = tt.filter(pc.is_valid(tt["k"]))
        g = tt.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["k_sum"],
                "mn": g["k_min"],
                "mx": g["k_max"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("s", alias_name="s"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("n", alias_name="n"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n_with_k": pc.cast(t["n"], pa.int64()),
                "sum_k": pc.cast(t["s"], pa.int64()),
                "min_k": pc.cast(t["mn"], pa.int64()),
                "max_k": pc.cast(t["mx"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def window_top_event_types(sf_dir: str) -> rd.Dataset:
    """Windowed top-k (streaming-analytics staple): per 1h tumbling
    window, the top-3 event types by count with a deterministic
    tie-break (count DESC, type ASC) -> (window_start, event_type,
    n_events, rank).  Window starts are int64 epoch seconds via exact
    integer floor-division (pre-1970-safe, same contract as
    events_tumbling_1h).

    Shape: per-batch (window, type) count partials routed by a derived
    ``part = window mod P`` column, ONE groupby(part) shuffle of narrow
    count rows, vectorized per-partition rank (sort + cumcount) — the
    part-colocate pattern; windows are disjoint across parts so the
    rank is exact."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])
    P = 32

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ws = np.floor_divide(us.astype(np.int64), 3_600_000_000) * 3600
        g = (
            pa.table({"window_start": ws, "event_type": t["event_type"]})
            .group_by(["window_start", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "part": pc.cast(
                    pc.bit_wise_and(g["window_start"], P - 1), pa.int64()
                ),
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["window_start", "event_type"], as_index=False)[
            "n"
        ].sum()
        g = g.sort_values(
            ["window_start", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g["rank"] = g.groupby("window_start").cumcount() + 1
        g = g[g["rank"] <= 3]
        return pd.DataFrame(
            {
                "window_start": g["window_start"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "n_events": g["n"].to_numpy().astype(np.int64),
                "rank": g["rank"].to_numpy().astype(np.int64),
            }
        )

    return parts.groupby("part").map_groups(
        per_part, batch_format="pandas"
    ).select_columns(["window_start", "event_type", "n_events", "rank"])


def window_distinct_users(sf_dir: str) -> rd.Dataset:
    """Per-window EXACT distinct count -> (window_start, n_users):
    distinct users per 1h tumbling window — the exactness anchor for
    the KMV approximate-distinct queries, windowed.

    Two-level fold: per-batch distinct (window, user) pairs (the only
    rows that shuffle), a global pair-distinct groupby, then per-block
    window partial counts into a tiny count groupby — count-distinct
    without ever moving raw events."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ws = np.floor_divide(us.astype(np.int64), 3_600_000_000) * 3600
        g = (
            pa.table({"window_start": ws, "user_id": t["user_id"]})
            .group_by(["window_start", "user_id"])
            .aggregate([])
        )
        return g

    from ray.data.aggregate import Count

    distinct = (
        ev.map_batches(pairs, batch_format="pyarrow")
        .groupby(["window_start", "user_id"])
        .aggregate(Count(alias_name="_c"))  # keys only; count discarded
        .select_columns(["window_start", "user_id"])
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("window_start").aggregate([([], "count_all")])
        return pa.table(
            {
                "window_start": g["window_start"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        distinct.map_batches(count_partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "window_start": pc.cast(t["window_start"], pa.int64()),
                "n_users": pc.cast(t["n_users"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def user_top_event(sf_dir: str) -> rd.Dataset:
    """Per-key ARGMAX -> (user_id, top_event_type, max_cents): each
    user's single largest-value event, ties broken by smallest
    event_id (the deterministic argmax the funnel/mode family lacks:
    the WHOLE ROW at the extremum, not the extremum itself).

    Shape: per-batch argmax partials (one candidate row per user per
    block ever shuffles), then the same vectorized part-colocated fold
    — never one Python call per user.  The comparison key is exact
    integer cents so a float-summation ulp can't flip the winner."""
    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "value"])
    P = 32

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        if df.empty:
            return pd.DataFrame(
                {
                    "part": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "event_id": pd.Series([], dtype=np.int64),
                    "top_event_type": pd.Series([], dtype=str),
                    "cents": pd.Series([], dtype=np.int64),
                }
            )
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "top_event_type": df["event_type"].to_numpy(),
                "cents": cents,
            }
        )
        out = out.sort_values(
            ["user_id", "cents", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    parts = ev.map_batches(partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "cents", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "top_event_type": df["top_event_type"].to_numpy(),
                "max_cents": df["cents"].to_numpy().astype(np.int64),
            }
        )

    return parts.groupby("part").map_groups(
        per_part, batch_format="pandas"
    ).select_columns(["user_id", "top_event_type", "max_cents"])


def doc_feature_hashing(sf_dir: str) -> rd.Dataset:
    """Hashing-trick vectorizer (Weinberger et al. 2009; the sparse
    featurizer in front of linear quality/topic classifiers) -> long
    format (doc_id, dim, n): bag-of-words counts folded into 16 hashed
    dimensions via the repo's stable md5 bucket convention.  Docs are
    row-atomic, so the per-batch partial IS the final answer — zero
    shuffle, embarrassingly parallel; md5 runs once per distinct token
    per batch (dictionary encode + take)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.feature_hash_batch, batch_format="pyarrow")


def doc_topic_clusters(sf_dir: str) -> rd.Dataset:
    """Text topic clustering end-to-end (the cluster-balanced-sampling
    prerequisite: hashed BoW -> k-means) -> (cluster, n_docs): each doc
    featurized to a 32-dim L2-normalized hashing-trick tf vector (one
    Arrow split + md5-per-distinct-token pass, reusing
    text.feature_hash_batch's bucket convention), then Lloyd k-means
    (k=8, 4 iterations — ops/cluster.kmeans_fit's broadcast-reduce
    partials) and a combiner-first cluster-size rollup.  Rows-only
    check (iterative training isn't SQL-expressible); pytest pins
    determinism and partitioning-independence."""
    from .ops import cluster

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    D = 32

    def densify(t: pa.Table) -> pa.Table:
        long = text.feature_hash_batch(t, n_dims=D)
        n = len(t)
        M = np.zeros((n, D), dtype=np.float64)
        # long holds (doc_id, dim, n) for this batch's docs in order;
        # map doc_id -> local row via searchsorted on the sorted ids
        ids = t["doc_id"].to_numpy()
        order = np.argsort(ids)
        row = order[
            np.searchsorted(ids[order], long["doc_id"].to_numpy())
        ]
        M[row, long["dim"].to_numpy()] = long["n"].to_numpy().astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        M /= norms[:, None]
        return pa.table(
            {
                "vec_id": t["doc_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(M.reshape(-1), pa.float32()), D
                ),
            }
        )

    # featurize ONCE: Lloyd makes iters+1 passes, and hashed vectors
    # (32 floats/doc) are ~100x smaller than the text they replace
    vecs = ds.map_batches(densify, batch_format="pyarrow").materialize()
    C = cluster.kmeans_fit(vecs, k=8, iters=4)
    assigned = cluster.kmeans_assign(vecs, C)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("cluster").aggregate([([], "count_all")])
        return pa.table({"cluster": g["cluster"], "n": g["count_all"]})

    return (
        assigned.map_batches(count_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n_docs"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cluster": t["cluster"],
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def incremental_ingest_documents(sf_dir: str) -> rd.Dataset:
    """Two-step incremental ingestion driven end-to-end -> (doc_id):
    documents split into two deterministic md5 halves, ingested
    sequentially through ``ingest.ingest_documents`` (within-batch
    exact dedup + anti-join against the persisted fingerprint index of
    step 1), union of accepted rows.  The oracle reproduces the
    first-seen-batch-wins rule in SQL: per distinct content, the min
    doc id within the EARLIEST half containing that content — which
    differs from one-shot dedup's global min exactly when a content
    spans halves, so a hash match proves the generational index (not
    just the dedup) behaved."""
    import tempfile

    from . import ingest
    from .hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def half_filter(want: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            m = np.array(
                [int(md5_hex(f"{d}:ingest-v1")[:8], 16) % 2 for d in ids]
            )
            return t.filter(pa.array(m == want))

        return f

    state = tempfile.mkdtemp(prefix="deepie-ingest-state-")
    a0 = ingest.ingest_documents(
        ds.map_batches(half_filter(0), batch_format="pyarrow"), state
    )
    a1 = ingest.ingest_documents(
        ds.map_batches(half_filter(1), batch_format="pyarrow"), state
    )
    return a0.union(a1).select_columns(["doc_id"])


def doc_unigram_nll(sf_dir: str) -> rd.Dataset:
    """Corpus-unigram-LM negative log-likelihood per doc (CCNet-style
    quality signal, SQL-exact at min_count=1) -> (doc_id, n_tokens,
    nll)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.unigram_nll(ds)


def doc_line_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher duplicate-line repetition signals per doc -> (doc_id,
    n_lines, dup_line_frac, dup_line_char_frac)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.line_repetition_batch, batch_format="pyarrow")


def doc_top_bigram(sf_dir: str) -> rd.Dataset:
    """Gopher top-2-gram coverage per doc -> (doc_id, top_bigram,
    bg_count, top_bigram_char_frac); docs with <2 tokens emit
    nothing."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(text.top_bigram_frac_batch, batch_format="pyarrow")


def incremental_neardup_ingest(sf_dir: str) -> rd.Dataset:
    """Two-step incremental NEAR-dedup ingestion (rows-only: the LSH
    estimate-verify rule has no SQL twin): documents split into two
    deterministic md5 halves, each ingested through the persistent
    minhash signature index (``ingest.ingest_documents_neardup``);
    returns the union of accepted doc ids.  Invariants pytest-checked
    (cross-generation rejection, cluster-level rejection,
    idempotence)."""
    import tempfile

    from . import ingest
    from .hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def half_filter(want: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            m = np.array(
                [int(md5_hex(f"{d}:ingest-v1")[:8], 16) % 2 for d in ids]
            )
            return t.filter(pa.array(m == want))

        return f

    state = tempfile.mkdtemp(prefix="deepie-ndingest-state-")
    a0 = ingest.ingest_documents_neardup(
        ds.map_batches(half_filter(0), batch_format="pyarrow"), state
    )
    a1 = ingest.ingest_documents_neardup(
        ds.map_batches(half_filter(1), batch_format="pyarrow"), state
    )
    return a0.union(a1).select_columns(["doc_id"])


def neardup_keep_best(sf_dir: str) -> rd.Dataset:
    """Near-dup cluster EXEMPLAR selection (the real keep-rule of a
    training-data pipeline: keep the best document per duplicate
    family, not the min id) -> (cluster_id, doc_id, n_chars,
    cluster_size): one row per exact-Jaccard component (and per
    singleton), whose doc_id is the member with the LONGEST text (tie
    -> smallest doc_id).

    Shape: the dup-graph + components machinery of
    ``jaccard_dup_components`` gives the cluster map (clustered docs
    only — post-verification-small); a left-outer hash join assigns
    unclustered docs to themselves; the per-cluster argmax is the
    combiner-first partial-argmax + part-colocated fold of
    ``user_top_event`` (one candidate row per cluster per block ever
    shuffles), with exact integer char lengths so the winner cannot
    be perturbed."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.jaccard_exact_blockjoin(ds, threshold_num=3, threshold_den=10)
    clusters = dedup.components_from_pairs(
        pairs, pa.int64(), num_partitions=8
    ).materialize()

    lens = ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    if clusters.count() == 0:
        assigned = lens.map_batches(
            lambda t: t.append_column("cluster_id", t["doc_id"]),
            batch_format="pyarrow",
        )
    else:
        j = joins.hash_join(lens, clusters, on="doc_id", how="left_outer")
        assigned = j.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_chars": t["n_chars"],
                    "cluster_id": pc.coalesce(t["cluster_id"], t["doc_id"]),
                }
            ),
            batch_format="pyarrow",
        )

    P = 32

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "part": pd.Series([], dtype=np.int64),
                    "cluster_id": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_chars": pd.Series([], dtype=np.int64),
                    "sz": pd.Series([], dtype=np.int64),
                }
            )
        sz = df.groupby("cluster_id", sort=False)["doc_id"].transform("size")
        out = df.assign(sz=sz.to_numpy().astype(np.int64)).sort_values(
            ["cluster_id", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        # per-batch count must SUM across batches, so keep it alongside
        # the argmax candidate row
        agg = out.groupby("cluster_id", sort=False).agg(
            doc_id=("doc_id", "first"),
            n_chars=("n_chars", "first"),
            sz=("sz", "first"),
        ).reset_index()
        agg.insert(0, "part", agg["cluster_id"].to_numpy() % P)
        return agg

    parts = assigned.map_batches(partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        total = df.groupby("cluster_id", sort=False)["sz"].sum()
        best = df.sort_values(
            ["cluster_id", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("cluster_id", keep="first")
        return pd.DataFrame(
            {
                "cluster_id": best["cluster_id"].to_numpy(),
                "doc_id": best["doc_id"].to_numpy(),
                "n_chars": best["n_chars"].to_numpy().astype(np.int64),
                "cluster_size": best["cluster_id"]
                .map(total)
                .to_numpy()
                .astype(np.int64),
            }
        )

    return parts.groupby("part").map_groups(
        per_part, batch_format="pandas"
    ).select_columns(["cluster_id", "doc_id", "n_chars", "cluster_size"])


def containment_pairs(sf_dir: str) -> rd.Dataset:
    """Near-CONTAINMENT pairs (quote-inclusion / boilerplate-wrapping
    detection — Jaccard misses a small doc swallowed by a large one) ->
    (id_a, id_b, n_inter, n_a, n_b) for word-3-gram sets with
    ``n_inter / min(n_a, n_b) >= 0.8``, id_a < id_b, integer-compared.
    Same chunk-pair block-join kernel as ``ngram_jaccard_exact``
    (exact oracle twin; the scale path is LSH candidates + the same
    keep-rule in the verify)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.jaccard_exact_blockjoin(
        ds, threshold_num=8, threshold_den=10, containment=True
    )


def quality_classifier_scores(sf_dir: str) -> rd.Dataset:
    """fastText-style quality filter (rows-only: iterative training has
    no SQL twin; numpy-parity + learnability pytest-oracled): logistic
    regression on hashed bag-of-words features, weak-supervised by the
    corpus ``lang`` column (label = lang=='en'), full-batch distributed
    GD -> (doc_id, prob) for every doc."""
    from .ops import classifier

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    _w, scored = classifier.quality_classifier(
        ds,
        label_fn=lambda b: pc.cast(pc.equal(b["lang"], "en"), pa.int8()),
        n_iters=12,
    )
    return scored


def doc_bigram_nll(sf_dir: str) -> rd.Dataset:
    """Bigram-LM conditional NLL per doc (order-sensitive perplexity
    quality signal) -> (doc_id, n_bigrams, nll2)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.bigram_nll(ds)


def ann_topk_filtered(sf_dir: str) -> rd.Dataset:
    """FILTERED vector search (the metadata-predicate ANN every vector
    store ships: 'nearest neighbors WHERE label = 1') -> (query_id,
    neighbor_id, rank): brute-force cosine top-10 among corpus vectors
    whose label is 1, for query vectors vec_id < 5.  Pre-filtering —
    the predicate prunes the corpus BEFORE scoring (row-group pushdown
    at a real deployment; a vectorized filter kernel here), so recall
    is exact rather than the post-filter k-starvation of filtering
    AFTER top-k."""
    from .ops import ann

    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    filtered = corpus.map_batches(
        lambda t: t.filter(pc.equal(t["label"], 1)).drop_columns(["label"]),
        batch_format="pyarrow",
    )
    return ann.brute_force_topk(filtered, ids, mat, k=10)


def doc_oov_rate(sf_dir: str) -> rd.Dataset:
    """OOV rate vs the corpus >=3-count vocabulary -> (doc_id,
    n_tokens, n_oov, oov_rate)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.oov_rate(ds, min_count=3)


def embedding_random_projection(sf_dir: str) -> rd.Dataset:
    """JL random projection of the embeddings table to 8 dims
    (rows-only: seeded-Gaussian output has no SQL twin; distance
    preservation and partitioning-bit-stability pytest-oracled)."""
    from .ops import ann

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.random_projection(ds, out_dim=8)


def documents_version_diff(sf_dir: str) -> rd.Dataset:
    """Dataset regression diff (operational tool: 'what changed between
    yesterday's corpus snapshot and today's?') -> (doc_id, status):
    documents diffed against a deterministically perturbed second
    version (doc_id % 97 == 0 removed, % 89 == 0 edited, % 101 == 0
    re-added under key+1000000).  One full-outer join of md5
    fingerprint rows; only the delta survives
    (``ops/joins.diff_by_key``)."""
    from .ops.dedup import _md5_hex_utf8_slices

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"doc_id": t["doc_id"], "fp": pa.array(_md5_hex_utf8_slices(col))}
        )

    old = ds.map_batches(fp, batch_format="pyarrow")

    def perturb(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        keep = pa.array(ids % 97 != 0)
        edited = pc.if_else(
            pa.array(ids % 89 == 0),
            pc.binary_join_element_wise(
                txt, pa.array([" [edited]"] * len(t), pa.string()), ""
            ),
            txt,
        )
        base = pa.table({"doc_id": t["doc_id"], "text": edited}).filter(keep)
        add_m = ids % 101 == 0
        added = pa.table(
            {
                "doc_id": pa.array(ids[add_m] + 1_000_000, pa.int64()),
                "text": pa.array([f"new doc {i}" for i in ids[add_m]], pa.string()),
            }
        )
        return pa.concat_tables([base, added])

    new = ds.map_batches(perturb, batch_format="pyarrow").map_batches(
        fp, batch_format="pyarrow"
    )
    return joins.diff_by_key(old, new, on="doc_id", fp_col="fp")


def export_jsonl_gz_roundtrip(sf_dir: str) -> rd.Dataset:
    """Gzipped-JSONL sink + source round trip -> (doc_id, fingerprint):
    same byte-exactness contract as ``export_jsonl_roundtrip`` (the
    DuckDB twin fingerprints the ORIGINAL table, so a hash match proves
    text survives pandas' C JSON serializer + gzip + pyarrow's JSON
    parser bit-for-bit), over the compressed wire format public corpora
    actually ship as."""
    import hashlib
    import os
    import shutil

    from .hashing import md5_hex
    from .sources import jsonl

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_jsonlgz_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    jsonl.write_jsonl_gz(docs, out_dir)
    back = jsonl.read_jsonl_gz(out_dir)

    fp = _fp_roundtrip

    return back.map_batches(fp, batch_format="pyarrow")


def quality_gate_composite(sf_dir: str) -> rd.Dataset:
    """Composite quality GATE (the decision layer on top of the signal
    operators): keep doc ids whose unigram NLL and OOV rate are both
    at or below the corpus p90 AND whose duplicate-line fraction is
    <= 0.3 -> (doc_id).  Thresholds are EXACT distributed quantiles
    (``sketch.exact_quantile_sorted`` — one narrow-column sort each),
    so the whole gate is bit-reproducible and SQL-checkable end to
    end.

    Oracle-exactness note: the float signals are quantized to 9dp
    (Python round — correctly rounded, see _round2) BEFORE
    thresholding; the per-doc 9dp values are exactly what the
    doc_unigram_nll / doc_oov_rate hash checks already prove identical
    across engines, so every comparison here is between bit-equal
    doubles.  dup_line_frac is an integer ratio — bit-equal unrounded."""
    from .ops import sketch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def round9(t: pa.Table) -> pa.Table:
        out = {"doc_id": t["doc_id"]}
        for tname in ("nll", "oov_rate"):
            col = t[tname]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[tname] = pa.array(
                [None if v is None else round(v, 9) for v in col.to_pylist()],
                pa.float64(),
            )
        return pa.table(out)

    # fused single-pass nll+oov (one counts pass, one scoring pool)
    sig = (
        text.unigram_signals(ds, min_count_oov=3)
        .map_batches(round9, batch_format="pyarrow")
        .materialize()  # two threshold sorts + the join consume it
    )
    if sig.count() == 0:  # empty corpus: typed empty, joins can't finalize
        return pa.table({"doc_id": pa.array([], pa.int64())})
    rep = ds.map_batches(text.line_repetition_batch, batch_format="pyarrow")
    t_nll = sketch.exact_quantile_sorted(sig, "nll", 0.9)
    t_oov = sketch.exact_quantile_sorted(sig, "oov_rate", 0.9)

    j = joins.hash_join(
        sig,
        rep.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "dup_line_frac": t["dup_line_frac"]}
            ),
            batch_format="pyarrow",
        ),
        on="doc_id",
    )

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.less_equal(t["nll"], t_nll),
                pc.less_equal(t["oov_rate"], t_oov),
            ),
            pc.less_equal(t["dup_line_frac"], 0.3),
        )
        return pa.table({"doc_id": t.filter(keep)["doc_id"]})

    return j.map_batches(gate, batch_format="pyarrow")


def weighted_sample_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic WEIGHTED sampling without replacement (A-ES,
    Efraimidis-Spirakis 2006): each doc gets key u^(1/w) with u a
    content-addressed md5 uniform and w = n_chars; the global top-100
    keys are the sample -> (doc_id).  Longer docs win proportionally
    more often, yet the draw is a pure function of the ids — any
    partitioning, retry or re-run selects the identical set, and the
    DuckDB twin reproduces it exactly.

    Shape: per-block local top-k partials (<=k narrow rows per block
    ever shuffle), one single-group fold — the same combiner-first
    top-k as ops/ann.merge_topk."""
    from .hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    K = 100

    def keyed_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        w = t["n_chars"].to_numpy().astype(np.float64)
        m = w > 0
        ids, w = ids[m], w[m]
        u = np.array(
            [int(md5_hex(f"{d}:wsample-v1")[:12], 16) for d in ids],
            dtype=np.float64,
        ) / float(1 << 48)
        key = u ** (1.0 / w)
        order = np.lexsort((ids, -key))[:K]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), np.int64)),
                "doc_id": pa.array(ids[order], pa.int64()),
                "k": pa.array(key[order], pa.float64()),
            }
        )

    partials = ds.map_batches(keyed_topk, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(["k", "doc_id"], ascending=[False, True]).head(K)
        return pd.DataFrame({"doc_id": top["doc_id"].to_numpy()})

    return partials.groupby("g").map_groups(fold, batch_format="pandas")


def orders_equidepth_histogram(sf_dir: str) -> rd.Dataset:
    """Equi-depth histogram of order totals: bucket edges are the EXACT
    q25/q50/q75 (``sketch.exact_quantile_sorted`` — one narrow-column
    distributed sort), then one combiner-first counting pass ->
    (bucket:int64, n_orders:int64).  The analytics primitive behind
    range-partition planning and drift monitors; both engines compare
    against bit-identical interpolated edges, so bucket membership is
    exact."""
    from .ops import sketch

    ds = _read(sf_dir, "orders", ["o_totalprice"]).materialize()
    edges = [
        sketch.exact_quantile_sorted(ds, "o_totalprice", q)
        for q in (0.25, 0.5, 0.75)
    ]

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy()
        b = np.searchsorted(np.asarray(edges), v, side="left").astype(np.int64)
        g = (
            pa.table({"bucket": pa.array(b)})
            .group_by("bucket")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"bucket": g["bucket"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_orders"))
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": t["bucket"],
                    "n_orders": pc.cast(t["n_orders"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def orders_zorder_layout(sf_dir: str) -> rd.Dataset:
    """Z-order (Morton-curve) layout assignment -> (o_orderkey, zcell,
    shard): 8-bit buckets of o_totalprice (2,500-wide, capped at 255)
    and o_orderdate (10-day buckets since 1992-01-01, capped) are
    bit-interleaved into a 16-bit z-value; ``shard = zcell >> 10``
    names the 64 contiguous curve ranges a clustered rewrite would
    use as output files.  This is the multi-dimensional data-layout
    primitive (Delta/Iceberg ``OPTIMIZE ZORDER BY``): range-partition
    on zcell and BOTH a price predicate and a date predicate prune to
    a small shard subset.  Map-only and embarrassingly parallel — the
    actual clustered write is one range shuffle on zcell (the
    orders_price_ranked machinery); here the assignment itself is the
    oracle-checked artifact.  Vectorized: per-bit shifts over the
    whole batch, no per-row loop."""
    EPOCH = np.datetime64("1992-01-01T00:00:00", "us")

    def assign(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy()
        days = (
            (t["o_orderdate"].to_numpy().astype("datetime64[us]") - EPOCH)
            .astype("timedelta64[D]")
            .astype(np.int64)
        )
        p = np.minimum(np.floor(price / 2500.0).astype(np.int64), 255)
        p = np.maximum(p, 0)
        d = np.clip(days // 10, 0, 255)
        z = np.zeros(len(p), dtype=np.int64)
        for i in range(8):
            z |= ((p >> i) & 1) << (2 * i)
            z |= ((d >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "zcell": pa.array(z),
                "shard": pa.array(z >> 10),
            }
        )

    return _read(
        sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"]
    ).map_batches(assign, batch_format="pyarrow")


def _manifest_pruned_scan(sf_dir: str):
    """Core of events_pruned_scan; also used by the pytest that pins
    the pruning ratio.  Returns (result table, n_files_total,
    n_files_read)."""
    import hashlib
    import os
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    lake_dir = f"/tmp/deepie_export/p{os.getpid()}_pruned_lake_{tag}"
    shutil.rmtree(lake_dir, ignore_errors=True)

    ev = _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
        lambda df: df.dropna(subset=["ts"]), batch_format="pandas"
    )
    # time-clustered layout: sort by ts so every file covers a narrow
    # time slice (at 100 TB: the range-partitioned global sort of
    # orders_price_ranked, then per-shard local sorts — same result,
    # one shuffle)
    ev.sort("ts").write_parquet(lake_dir, max_rows_per_file=2000)

    # manifest: (path, min_ts, max_ts) per file from parquet FOOTER
    # statistics — exactly the file-level entry an Iceberg/Delta
    # manifest stores; zero data pages read
    lake = pads.dataset(lake_dir, format="parquet")
    manifest = []
    for frag in lake.get_fragments():
        md = frag.metadata
        idx = md.schema.to_arrow_schema().get_field_index("ts")
        mn = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        manifest.append((frag.path, mn, mx))

    # window = the middle [40%, 50%) of the corpus time span, in pure
    # int64 microseconds (floor division on both engines — exact)
    los = [m[1] for m in manifest]
    his = [m[2] for m in manifest]
    lo, hi = min(los), max(his)
    lo_us = np.datetime64(lo, "us").astype(np.int64)
    hi_us = np.datetime64(hi, "us").astype(np.int64)
    span = hi_us - lo_us
    win_lo = lo_us + span * 4 // 10
    win_hi = lo_us + span * 5 // 10

    pruned = [
        p
        for p, mn, mx in manifest
        if np.datetime64(mx, "us").astype(np.int64) >= win_lo
        and np.datetime64(mn, "us").astype(np.int64) < win_hi
    ]

    def in_window(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        keep = (ts_us >= win_lo) & (ts_us < win_hi)
        g = (
            t.filter(pa.array(keep))
            .group_by("event_type")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"event_type": g["event_type"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        rd.read_parquet(pruned)
        .map_batches(in_window, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_rows"))
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "n_rows": pc.cast(t["n_rows"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return counts, len(manifest), len(pruned)


def events_pruned_scan(sf_dir: str) -> rd.Dataset:
    """Manifest-based FILE PRUNING (the Iceberg/Delta scan-planning
    primitive that makes a 100-TB time-range query read gigabytes, not
    the lake) -> (event_type, n_rows) for the middle [40%,50%) time
    window.  The query drives the whole lifecycle: time-clustered
    write (sorted by ts, 2,000-row files), manifest build from parquet
    footer min/max statistics only, file-level overlap pruning, then
    the exact residual filter over just the surviving files.  The
    DuckDB twin computes the same window over the raw table — a
    pruning bug (skipped file that held matching rows) breaks the
    hash match.  The pruning RATIO (files read << files total) is
    pinned by pytest via _manifest_pruned_scan."""
    counts, _, _ = _manifest_pruned_scan(sf_dir)
    return counts


def doc_search_and(sf_dir: str) -> rd.Dataset:
    """Boolean AND search ('hash' AND 'join' AND 'window') over the
    token inverted index semantics -> (doc_id): per-doc distinct-token
    explode, per-(doc, matched-term) rows, count == 3 keeps the doc.
    Combiner-first: each batch emits at most |terms| rows per doc; the
    groupby moves only matched narrow rows (query-relevant docs, not
    the corpus)."""
    TERMS = ("hash", "join", "window")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def match(t: pa.Table) -> pa.Table:
        toks = text._nonempty_token_lists(t["text"])
        flat = pc.list_flatten(toks)
        ids = t["doc_id"].take(pc.list_parent_indices(toks))
        keep = pc.is_in(flat, value_set=pa.array(TERMS))
        g = (
            pa.table({"doc_id": ids.filter(keep), "w": flat.filter(keep)})
            .group_by(["doc_id", "w"])
            .aggregate([])
        )
        return g.select(["doc_id", "w"])

    hits = ds.map_batches(match, batch_format="pyarrow")
    agg = hits.groupby("doc_id").count()
    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.filter(
                    pc.equal(t["count()"], len(TERMS))
                )["doc_id"]
            }
        ),
        batch_format="pyarrow",
    )


def kg_incremental(sf_dir: str) -> rd.Dataset:
    """Incremental KG construction driven end-to-end (rows-only: the
    scorer + per-batch canonicalization have no SQL twin; additivity
    and compaction invariance pytest-oracled): documents split into
    two deterministic md5 halves, each extracted + linked + committed
    as a KG generation (``ingest.ingest_kg``); returns the MERGED edge
    view (subj_entity, pred_label, obj_entity, weight)."""
    import tempfile

    from . import ingest, pipeline
    from .hashing import md5_hex

    docs = pipeline.read_documents(sf_dir)

    def half_filter(want: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            m = np.array(
                [int(md5_hex(f"{d}:ingest-v1")[:8], 16) % 2 for d in ids]
            )
            return t.filter(pa.array(m == want))

        return f

    state = tempfile.mkdtemp(prefix="deepie-kgingest-state-")
    ingest.ingest_kg(docs.map_batches(half_filter(0), batch_format="pyarrow"), state)
    ingest.ingest_kg(docs.map_batches(half_filter(1), batch_format="pyarrow"), state)
    edges = ingest.read_kg_graph(state)["edges"]
    return edges.map_batches(
        lambda t: pa.table(
            {
                "subj_entity": t["subj_entity"],
                "pred_label": t["pred_label"],
                "obj_entity": t["obj_entity"],
                "weight": pc.cast(t["weight"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def bpe_train_merges(sf_dir: str) -> pa.Table:
    """BPE tokenizer training over the corpus (rows-only: iterative
    merge induction has no SQL twin; reference-parity + hand-pinned
    merges pytest-oracled) -> (rank:int64, left, right): the first 40
    learned merges, min_freq=2."""
    from .ops import bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe.train_bpe(ds, n_merges=40, min_freq=2)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }
    )


def doc_bpe_lengths(sf_dir: str) -> rd.Dataset:
    """Apply the corpus-trained BPE -> (doc_id, n_bpe_tokens): the
    token-budget accounting step of shard packing under a real learned
    vocabulary (rows-only; encode parity pytest-oracled)."""
    from .ops import bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe.train_bpe(ds, n_merges=40, min_freq=2)
    return bpe.bpe_token_counts(ds, merges)


def cross_source_dup_matrix(sf_dir: str) -> rd.Dataset:
    """Inter-source duplication matrix (mixing/curation analytics:
    which sources re-publish each other's content) -> (source_a,
    source_b, n_shared) with source_a < source_b: for each source
    pair, the number of distinct content fingerprints present in BOTH.
    Combiner-first distinct (fp, source) rows, one fp-keyed self-join
    of the distinct table — document bodies never shuffle."""
    from .ops.dedup import _md5_hex_utf8_slices

    ds = _read(sf_dir, "documents", ["text", "source"])

    def fp_src(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        g = (
            pa.table(
                {"fp": pa.array(_md5_hex_utf8_slices(col)), "source": t["source"]}
            )
            .group_by(["fp", "source"])
            .aggregate([])
        )
        return g.select(["fp", "source"])

    # block-local distinct, then one global distinct groupby; the
    # repartition merges the grouped output's zero-column EMPTY blocks
    # (they break the downstream join's key resolution — house rule)
    distinct = (
        ds.map_batches(fp_src, batch_format="pyarrow")
        .groupby(["fp", "source"])
        .count()
        .drop_columns(["count()"])
        .repartition(8)
        .materialize()  # both self-join sides
    )
    empty_matrix = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_shared": pa.array([], pa.int64()),
        }
    )
    if distinct.count() == 0:  # empty corpus: join cannot finalize
        return empty_matrix
    a = distinct.map_batches(
        lambda t: pa.table({"fp": t["fp"], "source_a": t["source"]}),
        batch_format="pyarrow",
    )
    b = distinct.map_batches(
        lambda t: pa.table({"fp": t["fp"], "source_b": t["source"]}),
        batch_format="pyarrow",
    )
    j = joins.hash_join(a, b, on="fp")

    def count_pairs(t: pa.Table) -> pa.Table:
        keep = pc.less(t["source_a"], t["source_b"])
        g = (
            t.filter(keep)
            .group_by(["source_a", "source_b"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source_a": g["source_a"],
                "source_b": g["source_b"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    out = (
        j.map_batches(count_pairs, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
        .materialize()  # empty-schema guard probe consumes it
    )
    # a corpus with NO cross-source dups is a legitimate (and good)
    # answer: return a typed arrow Table — Dataset.to_pandas() drops
    # the schema of a 0-row dataset, a from_arrow wrapper included
    if out.count() == 0:
        return empty_matrix
    return out.map_batches(
        lambda t: pa.table(
            {
                "source_a": t["source_a"],
                "source_b": t["source_b"],
                "n_shared": pc.cast(t["n_shared"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def copurchase_bfs_hops(sf_dir: str) -> rd.Dataset:
    """Bounded-depth BFS (3-hop neighborhood with shortest hop counts)
    from the minimum part id over the co-purchase graph -> (node,
    dist): frontier-expansion joins, one per level
    (``graph.bfs_hops``).  The SQL twin is a recursive-CTE walk with a
    min-distance fold."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li).materialize()
    if edges.count() == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
    source = int(edges.min("part_a"))
    return graph.bfs_hops(edges, source, max_depth=3)


def customer_supplier_linkage(sf_dir: str) -> rd.Dataset:
    """Record linkage across TABLES (the entity-resolution methodology:
    BLOCKING key -> equi-join -> exact verify): customers and suppliers
    block on the numeric suffix of their names, candidate pairs verify
    with the batched Levenshtein DP, keep dist <= 5 -> (c_custkey,
    s_suppkey, dist).  The blocking key is the documented recall
    assumption (pairs in different blocks are never compared — at scale
    that is the entire point); the verify is exact within blocks."""
    from .ops.fuzzy import levenshtein_bounded_pairs

    K = 5
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def blk(name_col: str, id_col: str, out_name: str):
        def f(t: pa.Table) -> pa.Table:
            digits = pc.replace_substring_regex(
                pc.fill_null(t[name_col], ""), pattern=r"[^0-9]", replacement=""
            )
            key = pc.cast(
                pc.if_else(pc.equal(digits, ""), "-1", digits), pa.int64()
            )
            return pa.table(
                {"blk": key, id_col: t[id_col], out_name: t[name_col]}
            )

        return f

    cb = cust.map_batches(blk("c_name", "c_custkey", "name_c"), batch_format="pyarrow")
    sb = supp.map_batches(blk("s_name", "s_suppkey", "name_s"), batch_format="pyarrow")
    j = joins.hash_join(cb, sb, on="blk")

    def verify(t: pa.Table) -> pa.Table:
        a = [(s or "").encode() for s in t["name_c"].to_pylist()]
        b = [(s or "").encode() for s in t["name_s"].to_pylist()]
        m = len(a)
        if m == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        la = np.array([len(x) for x in a], np.int64)
        lb = np.array([len(x) for x in b], np.int64)
        A = np.zeros((m, max(1, la.max())), np.uint8)
        B = np.zeros((m, max(1, lb.max())), np.uint8)
        for i, x in enumerate(a):
            A[i, : len(x)] = np.frombuffer(x, np.uint8)
        for i, x in enumerate(b):
            B[i, : len(x)] = np.frombuffer(x, np.uint8)
        d = levenshtein_bounded_pairs(A, la, B, lb, K)
        keep = d <= K
        idx = pa.array(np.nonzero(keep)[0], pa.int64())
        return pa.table(
            {
                "c_custkey": pc.cast(t.take(idx)["c_custkey"], pa.int64()),
                "s_suppkey": pc.cast(t.take(idx)["s_suppkey"], pa.int64()),
                "dist": pa.array(d[keep].astype(np.int64), pa.int64()),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


def source_mixture_stats(sf_dir: str) -> rd.Dataset:
    """Data-mixing diagnostics per source -> (source, n_docs, n_tokens,
    token_share:double): the numbers a mixture designer reweights
    from.  Combiner-first per-source partials (docs + token counts per
    batch), one tiny grouped sum, share = tokens/total computed from
    exact integers on both sides."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t["text"], ""), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        base = offs[0]
        cum = np.concatenate(([0], np.cumsum(ne)))
        per_doc = cum[offs[1:] - base] - cum[offs[:-1] - base]
        g = (
            pa.table(
                {
                    "source": t["source"],
                    "tok": pa.array(per_doc.astype(np.int64)),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            )
            .group_by("source")
            .aggregate([("tok", "sum"), ("one", "sum")])
        )
        return pa.table(
            {"source": g["source"], "tok": g["tok_sum"], "docs": g["one_sum"]}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("tok", alias_name="n_tokens"), Sum("docs", alias_name="n_docs"))
        .materialize()
    )
    total = float(agg.sum("n_tokens") or 0)

    def finalize(t: pa.Table) -> pa.Table:
        nt = pc.cast(t["n_tokens"], pa.int64())
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_tokens": nt,
                "token_share": pc.divide(
                    pc.cast(nt, pa.float64()), pa.scalar(total)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def events_quantile_bands(sf_dir: str) -> rd.Dataset:
    """Grouped multi-quantile in ONE pass -> (event_type, p25, p50,
    p75): exact interpolated quantiles per group, each group's values
    in one ``map_groups`` task (low-cardinality groups — the same
    contract as events_p50_cont; corpus-keyed quantiles take the
    sorted-split path of exact_quantile_sorted)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["value"]), batch_format="pandas"
    )

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        q = np.quantile(v, [0.25, 0.5, 0.75], method="linear")
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "p25": [float(q[0])],
                "p50": [float(q[1])],
                "p75": [float(q[2])],
            }
        )

    return clean.groupby("event_type").map_groups(per_type, batch_format="pandas")


def asof_events_next_order(sf_dir: str) -> rd.Dataset:
    """FORWARD as-of join (conversion attribution: 'what purchase did
    this view lead to?'): each VIEW event matched to the same user's
    next PURCHASE event at-or-after it -> (event_id,
    purchase_event_id).  Same bucketed merge_asof path as the backward
    flagship, direction='forward'; ties at the matched timestamp break
    to the greatest purchase event id."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    views = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "view")).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )
    purchases = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(pc.equal(t["event_type"], "purchase"))["user_id"],
                "purchase_event_id": t.filter(
                    pc.equal(t["event_type"], "purchase")
                )["event_id"],
                "pts": t.filter(pc.equal(t["event_type"], "purchase"))["ts"],
            }
        ),
        batch_format="pyarrow",
    )
    return joins.asof_join_merge(
        views,
        purchases,
        key="user_id",
        left_id="event_id",
        left_ts="ts",
        right_ts="pts",
        tie_break="purchase_event_id",
        num_partitions=8,
        direction="forward",
    )


def ngram_jaccard_prefix(sf_dir: str) -> rd.Dataset:
    """Exact Jaccard self-join via prefix filtering at the NEAR-DUP
    threshold 0.7 (the scalable exact path: candidates only from
    prefix-token collisions, never an O(N^2) scan; prefix length
    n - ceil(0.7n) + 1 is ~30% of each set, so buckets stay small —
    at LOW thresholds the prefix covers most of the set and the block
    join or LSH route is the right tool, see jaccard_prefix_join).
    Pair-set equality with the block-join kernel at the same threshold
    is pinned by test; the SQL twin uses the same integer rule."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.jaccard_prefix_join(ds, threshold_num=7, threshold_den=10)


def dsir_importance_weights(sf_dir: str) -> rd.Dataset:
    """DSIR importance weights (Xie et al. 2023 — the importance-
    resampling data-selection staple) -> (doc_id, n_tokens, log_w):
    each document's log importance weight of a hashed-unigram model of
    the 'src0' target domain against the raw corpus distribution.
    Pass 1 reduces the corpus to a CONSTANT 256-bucket count table
    (combiner-first); pass 2 streams docs against the broadcast
    256-float log-ratio vector.  Selection is then a top-k or a
    Gumbel-noise resample over log_w downstream."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return text.dsir_importance(ds, target_source="src0")


def boilerplate_ngram_removal(sf_dir: str) -> rd.Dataset:
    """Cross-document boilerplate removal -> (doc_id, n_kept,
    n_dropped, text_clean): tokens covered by any word-3-gram found in
    >= 5 distinct documents are masked out and the cleaned text
    re-assembled — the removal step downstream of the
    ``repeated_ngrams`` detector.  Pass 1 is a combiner-first
    distinct-doc gram count keeping only the boilerplate HEAD
    (broadcast, small by the df threshold at any scale); pass 2
    streams documents against it."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.repeated_ngram_removal(ds, df_threshold=5)


def term_pmi(sf_dir: str) -> rd.Dataset:
    """PMI-weighted term co-occurrence edges (the KG edge-weighting
    staple on top of raw co-occurrence counts) -> (term_a, term_b,
    n_docs, pmi) for unordered distinct-word pairs co-occurring in
    >= 5 documents, with pmi = ln(n_ab * N / (df_a * df_b)) over
    document frequencies and N = documents with >= 1 token.

    Scale shape: pair counts come from the vocabulary-bounded
    ``term_cooccurrence`` plan; document frequencies are a
    combiner-first distinct-doc count pruned IN THE PLAN to the
    df >= 5 head (every term of a kept pair has df >= n_ab >= 5, so
    the broadcast side is exactly the vocabulary head the pairs can
    reference — the same Zipf-head bound as ``oov_rate``); N is a
    3-word aggregate.  At extreme vocabularies the df side can be
    hash-joined on term instead; the broadcast is the measured-small
    path here."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        terms: list = []
        n_docs_tok = 0
        for txt in t["text"].to_pylist():
            s = set(ws_tokens((txt or "").lower()))
            if s:
                n_docs_tok += 1
                terms.extend(s)
        g = (
            pa.table({"term": pa.array(terms, pa.string())})
            .group_by("term")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "term": g["term"],
                "df": pc.cast(g["count_all"], pa.int64()),
                "nd": pa.array([n_docs_tok] * len(g), pa.int64()),
            }
        )

    # one pass feeds both reductions: per-term df AND the doc total
    parts = docs.map_batches(df_partial, batch_format="pyarrow")
    n_total = int(
        docs.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            sum(
                                1
                                for txt in t["text"].to_pylist()
                                if set(ws_tokens((txt or "").lower()))
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("n")
    )
    df_head = (
        parts.select_columns(["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], 5)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )  # bounded: the df >= 5 vocabulary head
    df_ref = ray.put(
        dict(zip(df_head["term"], df_head["df"].astype(int)))
        if len(df_head)
        else {}
    )

    pairs = term_cooccurrence(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], 5)),
        batch_format="pyarrow",
    )

    class Score:
        def __init__(self):
            self.df = ray.get(df_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "term_a": pa.array([], pa.string()),
                        "term_b": pa.array([], pa.string()),
                        "n_docs": pa.array([], pa.int64()),
                        "pmi": pa.array([], pa.float64()),
                    }
                )
            da = np.array(
                [self.df[x] for x in t["term_a"].to_pylist()], dtype=np.float64
            )
            db = np.array(
                [self.df[x] for x in t["term_b"].to_pylist()], dtype=np.float64
            )
            nab = t["n_docs"].to_numpy().astype(np.float64)
            pmi = np.log(nab * float(n_total) / (da * db))
            return pa.table(
                {
                    "term_a": t["term_a"],
                    "term_b": t["term_b"],
                    "n_docs": t["n_docs"],
                    "pmi": pa.array(pmi, pa.float64()),
                }
            )

    return pairs.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 4)
    )


def supplier_entity_resolution(sf_dir: str) -> rd.Dataset:
    """End-to-end ENTITY RESOLUTION (the KG-construction methodology:
    fuzzy match -> transitive closure -> canonical id) -> (s_suppkey,
    canon_id): suppliers whose names are within byte-Levenshtein
    distance 1 are merged transitively, each member canonicalized to
    the component's min suppkey; unmatched suppliers map to
    themselves.  Pairs come from the distributed chunk-pair
    Levenshtein kernel (ops/fuzzy), components from the shared
    size-gated resolver (union-find below the edge cap, distributed
    min-label above).  The component map is broadcast: its size is the
    number of MATCHED entities (typo-duplicate surfaces — the small
    side at any corpus size), never the entity table."""
    import ray

    from .ops import fuzzy

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    pairs = fuzzy.levenshtein_neardup_pairs(
        supp, k=1, id_col="s_suppkey", name_col="s_name"
    ).map_batches(
        lambda t: pa.table({"id_a": t["s1"], "id_b": t["s2"]}),
        batch_format="pyarrow",
    )
    cmap_df = dedup.components_from_pairs(
        pairs, pa.int64(), num_partitions=8
    ).to_pandas()  # bounded: matched entities only
    cmap_ref = ray.put(
        dict(zip(cmap_df["doc_id"], cmap_df["cluster_id"]))
        if len(cmap_df)
        else {}
    )

    class Canon:
        def __init__(self):
            self.cmap = ray.get(cmap_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["s_suppkey"].to_pylist()
            return pa.table(
                {
                    "s_suppkey": t["s_suppkey"],
                    "canon_id": pa.array(
                        [self.cmap.get(i, i) for i in ids], pa.int64()
                    ),
                }
            )

    return supp.map_batches(
        Canon, batch_format="pyarrow", concurrency=(1, 4)
    )


def events_time_range_sum(sf_dir: str) -> rd.Dataset:
    """Trailing ONE-HOUR (time-RANGE frame, not row frame) spend per
    user -> (user_id, event_id, range_cents, range_n): SQL ``RANGE
    BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` semantics —
    peer-inclusive, so no tie-break is needed (ops/analytic.
    range_sums: one shuffle on user, two vectorized searchsorted
    probes + cumsum difference per group)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return analytic.range_sums(ev, "user_id", "ts", "event_id", "value")


def user_state_islands(sf_dir: str) -> rd.Dataset:
    """Gaps-and-islands history compaction (SCD2 validity intervals)
    -> (user_id, seg_no, event_type, ts_start, ts_end, n_rows): each
    user's time-ordered event stream collapsed into runs of consecutive
    equal event_type — the 'what state was this entity in, from when to
    when' compaction every CDC / slowly-changing-dimension pipeline
    runs (ops/analytic.islands: one shuffle on user, run boundaries via
    a shifted compare, no per-row loop)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return analytic.islands(ev, "user_id", "ts", "event_id", "event_type")


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue from RETURNED
    lineitems in a fixed half-year order window -> (c_custkey, c_name,
    n_name, revenue).

    Scale shape: both predicates are pushed into the parquet reads
    (date window on orders, ``l_returnflag = 'R'`` on lineitem) so only
    qualifying rows leave storage; lineitem revenue is pre-aggregated
    per orderkey inside each batch BEFORE the hash-partitioned join to
    orders; the per-customer grouped sum is combiner-first; customer
    and nation labels attach AFTER the top-20 (a 20-key pushdown read +
    25-row nation broadcast — the post-top-k label pattern from
    top10_customers_by_spend, never an sf-scaled broadcast)."""
    from datetime import datetime

    lo, hi = datetime(1996, 1, 1), datetime(1996, 7, 1)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )

    def rev(t: pa.Table) -> pa.Table:
        # integer cents (floor both sides): a float revenue sum can
        # re-associate differently in Ray vs DuckDB and flip a NEAR-tie
        # at the rank-20 boundary — exact ints make the top-20 set
        # deterministic (the repo-wide quantization convention)
        r = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table({"o_orderkey": t["l_orderkey"], "r": r})
            .group_by("o_orderkey")
            .aggregate([("r", "sum")])
        )
        return pa.table({"o_orderkey": g["o_orderkey"], "revenue": g["r_sum"]})

    li_rev = li.map_batches(rev, batch_format="pyarrow")
    joined = joins.hash_join(
        li_rev, orders.repartition(8), on="o_orderkey", num_partitions=8
        # repartition: merge the zero-column blocks empty hash
        # partitions emit before by_cust accesses columns (repo-wide
        # join-output convention, see q3)
    ).repartition(8)

    def by_cust(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("revenue", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "revenue": g["revenue_sum"]})

    agg = (
        joined.map_batches(by_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    top = (
        agg.sort(["revenue", "o_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    keys = [int(k) for k in top["o_custkey"]]
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=(pc.field("c_custkey").isin(keys)),
    ).to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    lab = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = top.merge(lab, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    out["revenue"] = [round(int(c) / 100.0, 2) for c in out["revenue"]]
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


def user_event_sequences(sf_dir: str) -> rd.Dataset:
    """Ordered LIST/STRING aggregation (SQL ``string_agg(x, ','
    ORDER BY ts, event_id)``) -> (user_id, seq, n_events): each user's
    full time-ordered event_type sequence as one comma-joined string —
    the behavioral-sequence extraction in front of every session-based
    recommender / next-event model.

    Scale shape: ONE shuffle on ``part = user_id % P`` co-locates each
    user's rows (the part-colocate pattern — P vectorized pandas calls,
    not one per user); within a partition rows are mergesort-ordered by
    (user, ts, event_id) and joined per user with a single pandas
    groupby-agg.  Sequences are per-user-bounded, never corpus-bounded."""
    P = 32
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "event_type"]].copy()
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        g = df.groupby("user_id", sort=True)
        seq = g["event_type"].agg(",".join)
        n = g.size()
        return pd.DataFrame(
            {
                "user_id": seq.index.to_numpy(),
                "seq": seq.to_numpy(),
                "n_events": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "seq", "n_events"])
    )


def _skyline_table(t: pa.Table) -> pa.Table:
    """2-D Pareto-minimal rows of (p_retailprice, p_size): a row
    survives iff no other row is <= on both axes and < on at least one.
    Vectorized: lexsort by (price, size); a distinct (price, size) pair
    survives iff its size is STRICTLY below the running min size of all
    preceding pairs (any preceding pair with size <= dominates: price
    is <= by sort order and distinctness gives the strict axis).
    Exact duplicates share a pair and survive or die together."""
    if t.num_rows == 0:
        return t
    price = t["p_retailprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((size, price))
    ps, ss = price[order], size[order]
    new_pair = np.ones(len(ps), bool)
    new_pair[1:] = (ps[1:] != ps[:-1]) | (ss[1:] != ss[:-1])
    pair_idx = np.cumsum(new_pair) - 1
    pair_size = ss[new_pair]
    acc = np.minimum.accumulate(pair_size)
    prev_min = np.empty(len(pair_size), np.float64)
    prev_min[0] = np.inf
    prev_min[1:] = acc[:-1]
    keep_pair = pair_size < prev_min
    idx = np.sort(order[keep_pair[pair_idx]])
    return t.take(pa.array(idx, pa.int64()))


def part_skyline(sf_dir: str) -> rd.Dataset:
    """SKYLINE (Pareto frontier) query -> the parts no other part beats
    on BOTH price and size (cheapest-for-its-size frontier) ->
    (p_partkey, p_retailprice, p_size).

    Scale shape: skyline(S1 u S2) is a subset of skyline(S1) u
    skyline(S2), so the kernel IS its own combiner — each block reduces
    to its local frontier map-side (typically O(distinct prices) rows),
    and one final task merges the tiny survivors.  The corpus is read
    once and never shuffled; only local frontiers move.  Stated bound:
    an ADVERSARIAL anti-chain (every point Pareto-optimal) defeats any
    skyline combiner — the final task then sees the full input; real
    price/size data collapses ~1000x (measured: 2000 parts -> 4 rows).
    A corpus known to be anti-chain-heavy should recurse the merge
    (tree-reduce the local frontiers) instead of one final task."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return (
        parts.map_batches(_skyline_table, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_skyline_table, batch_format="pyarrow")
    )


def copurchase_components(sf_dir: str) -> rd.Dataset:
    """CONNECTED COMPONENTS over the support>=2 co-purchase graph ->
    (node, component) with component = min part id reachable — the
    first SQL-oracle-checked exposure of the canonicalization primitive
    the flagship KG pipeline runs (ops/canon.connected_components:
    iterated min-label propagation, per-round per-batch partial mins so
    the shuffle moves one row per (node, block), fixpoint-checked).

    The SQL twin is a recursive-CTE reachability walk folded with
    ``min(label)`` — exact full reachability, matched by the size-gated
    resolver shared with minhash_dedup (ops/dedup.components_from_pairs:
    union-find over the bounded EDGE list below the gate, fixpoint
    min-label propagation above it — both compute the same min-id
    labels; the distributed path is forced in pytest)."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li, min_count=2)

    def to_pair_ids(t: pa.Table) -> pa.Table:
        # one map to the resolver's (id_a, id_b) input schema
        return pa.table(
            {
                "id_a": pc.cast(t["part_a"], pa.int64()),
                "id_b": pc.cast(t["part_b"], pa.int64()),
            }
        )

    labels = dedup.components_from_pairs(
        edges.map_batches(to_pair_ids, batch_format="pyarrow"),
        pa.int64(),
        num_partitions=8,
    )
    return labels.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t["doc_id"], pa.int64()),
                "component": pc.cast(t["cluster_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def user_event_mode(sf_dir: str) -> rd.Dataset:
    """MODE per group (most frequent event_type per user, ties to the
    lexicographically first type) -> (user_id, mode_event_type, n).

    Scale shape: per-batch (user, type) partial counts shrink the
    corpus map-side; ONE shuffle on ``part = user_id % P`` co-locates
    each user's partials (part-colocate — P vectorized pandas calls,
    not one per user); within a partition the fold is a pandas
    groupby-sum + mergesort argmax."""
    P = 32
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        # P is a power of two: modulo via bitmask (pyarrow has no mod kernel)
        part = pc.bit_wise_and(pc.cast(g["user_id"], pa.int64()), pa.scalar(P - 1))
        return pa.table(
            {
                "part": part,
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        agg = agg.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy(),
                "mode_event_type": agg["event_type"].to_numpy(),
                "n": agg["n"].to_numpy().astype(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "mode_event_type", "n"])
    )


def events_daily_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Calendar-spine GAP FILL (the time-series densification every
    dashboard/forecast feed runs) -> (day_start:int64 epoch s,
    n_events) for EVERY day between the corpus min and max, zero-filled
    where no events landed.

    Scale shape: the corpus reduces map-side to per-batch per-day
    partial counts; one grouped sum leaves a calendar-bounded result
    (days, not events — ~2.4k rows for the 6.5-year synthetic span at
    ANY sf), which the driver densifies against a generated spine.  The
    spine is calendar-bounded, never corpus-bounded, so the driver-side
    merge is exempt from the no-driver-materialize rule."""
    ev = _read(sf_dir, "events", ["ts"])
    DAY = 86400

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # timestamp[us] -> micros
        day = pc.multiply(
            pc.floor(pc.divide(pc.cast(us, pa.float64()), 86400e6)),
            pa.scalar(float(DAY)),
        )
        g = (
            pa.table({"day_start": pc.cast(day, pa.int64())})
            .group_by("day_start")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day_start": g["day_start"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("day_start")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if agg.empty:  # empty input -> empty spine, matching the SQL twin
        return pd.DataFrame(
            {
                "day_start": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
            }
        )
    lo, hi = int(agg["day_start"].min()), int(agg["day_start"].max())
    spine = pd.DataFrame({"day_start": np.arange(lo, hi + DAY, DAY, dtype=np.int64)})
    out = spine.merge(agg, on="day_start", how="left")
    out["n_events"] = out["n"].fillna(0).astype(np.int64)
    return out[["day_start", "n_events"]]


def orders_profile(sf_dir: str) -> pd.DataFrame:
    """Dataset PROFILER (the ops primitive behind every catalog /
    data-quality dashboard) -> one row per column of orders: (col,
    n_rows, n_null, n_distinct) with EXACT distinct counts.

    Scale shape: one read feeds two streams — (a) per-batch null/row
    counters (narrow integer partials), (b) per-batch per-column
    DISTINCT value strings (combiner-first: the shuffle moves one row
    per distinct value per block, never the corpus; the string cast is
    injective per column so the distinct count is exact).  Both fold
    with tiny grouped sums.  At 100 TB a profiler would flip
    n_distinct to the mergeable KMV sketch (ops/sketch.py) — the exact
    path here is the oracle-checkable twin."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    orders = _read(sf_dir, "orders", cols)

    def counters(t: pa.Table) -> pa.Table:
        names, rows, nulls = [], [], []
        for c in cols:
            names.append(c)
            rows.append(t.num_rows)
            nulls.append(t[c].null_count)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n_rows": pa.array(rows, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
            }
        )

    P = 32

    def distincts(t: pa.Table) -> pa.Table:
        from zlib import crc32

        def splitmix_part(x: np.ndarray) -> np.ndarray:
            z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return ((z ^ (z >> np.uint64(31))) & np.uint64(P - 1)).astype(np.int64)

        tabs = []
        for c in cols:
            arr = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            u = pc.unique(arr.drop_null())
            # injective canonical string per column (values never mix
            # across columns, so per-column injectivity suffices) —
            # VECTORIZED for numeric columns: ints cast via Arrow, and
            # floats go through their raw IEEE bit pattern (injective,
            # no repr round trip); a distinct-heavy key column would
            # otherwise pay a full-corpus Python loop here
            if pa.types.is_integer(u.type):
                vals = u.to_numpy(zero_copy_only=False).astype(np.int64)
                vs = pc.cast(u, pa.string())
                part = splitmix_part(vals)
            elif pa.types.is_floating(u.type):
                bits = (
                    u.to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .view(np.int64)
                )
                vs = pc.cast(pa.array(bits), pa.string())
                part = splitmix_part(bits)
            else:
                py = u.to_pylist()
                vs = pa.array([str(v) for v in py], pa.string())
                part = np.array(
                    [crc32(str(v).encode()) & (P - 1) for v in py], np.int64
                )
            tabs.append(
                pa.table(
                    {
                        "part": pa.array(part, pa.int64()),
                        "col": pa.array([c] * len(u), pa.string()),
                        "val": vs,
                    }
                )
            )
        return pa.concat_tables(tabs)

    def fold_part(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["col", "val"])
            .groupby("col", sort=False)
            .size()
            .reset_index(name="one")
        )
        g["one"] = g["one"].astype(np.int64)
        return g[["col", "one"]]

    # counter partials are column-bounded (len(cols) rows per block),
    # so their fold is a driver-side pandas sum — a Ray groupby stage's
    # fixed shuffle cost would dominate a 4-group aggregate
    b = (
        orders.map_batches(counters, batch_format="pyarrow")
        .to_pandas()
        .groupby("col", sort=False, as_index=False)[["n_rows", "n_null"]]
        .sum()
    )
    # distinct fold: ONE Ray shuffle on part = crc32(val) % P (the only
    # corpus-sized exchange — cross-block dedup needs co-location), P
    # vectorized pandas dedup+count calls, then a <= P*len(cols)-row
    # driver fold
    d = (
        orders.map_batches(distincts, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pandas")
        .to_pandas()
        .groupby("col", sort=False, as_index=False)["one"]
        .sum()
        .rename(columns={"one": "n_distinct"})
    )
    out = b.merge(d, on="col")
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out[["col", "n_rows", "n_null", "n_distinct"]]


def documents_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-insensitive CONTENT CHECKSUM of the documents table ->
    one row (checksum, n_rows): sum over rows of the first-8-hex-chars
    of md5(doc_id || '|' || text) folded modulo a Mersenne prime — the
    cheap anti-entropy verification primitive for replica / export /
    migration comparison (two datasets match iff checksums and counts
    match, regardless of row order or partitioning).

    Scale shape: embarrassingly parallel per-batch partial sums (one
    int per block crosses the wire); the fold is addition, so any
    partitioning gives the identical checksum.  DuckDB twin via the
    ('0x' || substr(md5(..), 1, 8))::BIGINT convention."""
    MOD = 2305843009213693951  # 2^61 - 1
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        txt = t["text"].to_pylist()
        s = 0
        for i, x in zip(ids, txt):
            s += int(md5_hex(f"{i}|{x or ''}")[:8], 16)
        # mod per block: addition mod p is partition-invariant, and the
        # raw int64 sum would wrap past 2^63 at ~2e9 rows while the
        # DuckDB twin's sum(BIGINT) promotes to HUGEINT
        return pa.table(
            {
                "s": pa.array([s % MOD], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # Python-int fold (arbitrary precision): block partials are < 2^61
    # each, so even their int64 SUM could wrap given enough blocks
    checksum = sum(int(v) for v in parts["s"]) % MOD
    return pd.DataFrame(
        {
            "checksum": [checksum],
            "n_rows": [int(parts["n"].sum())],
        }
    )


def monthly_revenue_growth(sf_dir: str) -> pd.DataFrame:
    """Period-over-period trend (the MoM growth table on every revenue
    dashboard) -> (month_start:int64 epoch s, revenue, prev_revenue,
    growth_pct) ordered by month, with NULL prev/growth on the first.

    Scale shape: the corpus reduces map-side to per-batch per-month
    integer-cent partials; one grouped sum leaves a CALENDAR-bounded
    result (~80 months for the synthetic span at ANY sf), so the lag +
    ratio fold runs on the driver.  growth_pct is computed from exact
    integer cents on both sides, rounded once at the end."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False)
        # month bucket via numpy datetime64[M] (calendar months, not
        # fixed-width windows); epoch seconds of the month start
        months = ts.astype("datetime64[M]")
        starts = months.astype("datetime64[s]").astype(np.int64)
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame({"month_start": starts, "cents": cents})
        g = df.groupby("month_start", sort=False, as_index=False)["cents"].sum()
        return pa.table(
            {
                "month_start": pa.array(g["month_start"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("month_start")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("month_start")
        .reset_index(drop=True)
    )
    cents = agg["cents"].to_numpy().astype(np.int64)
    prev = np.roll(cents, 1)
    out = pd.DataFrame(
        {
            "month_start": agg["month_start"].astype(np.int64),
            "revenue": [round(c / 100.0, 2) for c in cents],
            "prev_revenue": [None] + [round(c / 100.0, 2) for c in prev[1:]],
            "growth_pct": [None]
            + [
                round((c - p) * 100.0 / p, 4) if p else None
                for c, p in zip(cents[1:], prev[1:])
            ],
        }
    )
    out["prev_revenue"] = out["prev_revenue"].astype("float64")
    out["growth_pct"] = out["growth_pct"].astype("float64")
    return out


def lineitem_order_share(sf_dir: str) -> rd.Dataset:
    """RATIO-TO-GROUP-TOTAL window (SQL ``x / sum(x) OVER (PARTITION
    BY ...)`` — the revenue-share / normalization staple) ->
    (l_orderkey, l_linenumber, line_cents, order_cents, share_ppm):
    each line's revenue, its order's total, and the line's share as
    integer parts-per-million (floor division — pure int64 arithmetic
    on both sides, so the value-hash can't fall to a float
    half-rounding tie).

    Scale shape: revenue quantizes to integer cents map-side; ONE
    shuffle on ``part = l_orderkey % P`` co-locates each order's lines
    (part-colocate — P vectorized pandas calls, not one per order);
    within a partition the group total is a pandas groupby-transform
    sum."""
    P = 64
    li = _lineitem(
        sf_dir, ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"]
    )

    def tag(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pa.scalar(100.0),
        )
        cents = pc.cast(pc.floor(rev), pa.int64())
        part = pc.bit_wise_and(pc.cast(t["l_orderkey"], pa.int64()), pa.scalar(P - 1))
        return pa.table(
            {
                "part": part,
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int32()),
                "line_cents": cents,
            }
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby("l_orderkey", sort=False)["line_cents"].transform("sum")
        lc = df["line_cents"].to_numpy().astype(np.int64)
        oc = totals.to_numpy().astype(np.int64)
        safe = np.where(oc == 0, 1, oc)
        share = np.where(oc != 0, (lc * 1_000_000) // safe, -1).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "l_linenumber": df["l_linenumber"].to_numpy(),
                "line_cents": lc,
                "order_cents": oc,
                "share_ppm": share,
            }
        )

    return (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(
            ["l_orderkey", "l_linenumber", "line_cents", "order_cents", "share_ppm"]
        )
    )


def user_event_type_sets(sf_dir: str) -> rd.Dataset:
    """SET-VALUED aggregation (SQL ``list_sort(list(DISTINCT x))`` /
    ``string_agg(DISTINCT ...)``) -> (user_id, types_csv, n_types):
    each user's DISTINCT event types as one sorted comma-joined string
    — the tag-set / capability-set rollup shape (vs
    ``user_event_sequences`` which keeps duplicates and time order).

    Scale shape: per-batch local DISTINCT (user, type) pairs shrink the
    corpus map-side (the shuffle moves one row per distinct pair per
    block); ONE shuffle on ``part = user_id % P`` co-locates each
    user's pairs; the per-partition fold is a pandas dedup + sorted
    join — P vectorized calls."""
    P = 32
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        part = pc.bit_wise_and(pc.cast(g["user_id"], pa.int64()), pa.scalar(P - 1))
        return pa.table(
            {"part": part, "user_id": g["user_id"], "event_type": g["event_type"]}
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"], kind="mergesort"
        )
        g = df.groupby("user_id", sort=True)
        csv = g["event_type"].agg(",".join)
        n = g.size()
        return pd.DataFrame(
            {
                "user_id": csv.index.to_numpy(),
                "types_csv": csv.to_numpy(),
                "n_types": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "types_csv", "n_types"])
    )


def session_day_overlap(sf_dir: str) -> rd.Dataset:
    """INTERVAL x INTERVAL overlap join WITH MEASURE (the
    time-allocation shape behind billing, SLA and usage attribution:
    'how much of each session fell on each calendar day') ->
    (user_id, session_no, day_start:int64 epoch s, overlap_us):
    30-minute-gap sessions per user, each split across the UTC days it
    touches with the exact microsecond overlap (0 for a point session
    or an exactly-midnight endpoint — the day is still emitted, the
    measure is honest).

    Scale shape: ONE shuffle on ``part = user_id % P`` co-locates each
    user's events (part-colocate); session boundaries, per-user session
    numbering and the day explode are all vectorized numpy within the
    partition.  The day side is ARITHMETIC (floor-division spans), not
    a join against a spine — no second shuffle.  Pure int64 time math
    on both sides (``epoch_us`` convention)."""
    P = 32
    GAP_US = 1_800_000_000
    DAY_US = 86_400_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["ts"])
        out = df[["user_id", "ts", "event_id"]].copy()
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        n = len(df)
        new_u = np.ones(n, bool)
        new_u[1:] = uid[1:] != uid[:-1]
        new_s = new_u.copy()
        new_s[1:] |= (us[1:] - us[:-1]) > GAP_US
        # per-user 1-based session number: global cumsum minus the
        # user's starting offset (vectorized via the run-start index)
        g = np.cumsum(new_s)
        run_start = np.maximum.accumulate(np.where(new_u, np.arange(n), 0))
        sess_no = g - g[run_start] + 1
        tmp = pd.DataFrame({"user_id": uid, "sess_no": sess_no, "us": us})
        s = tmp.groupby(["user_id", "sess_no"], sort=False)["us"].agg(
            ["min", "max"]
        ).reset_index()
        starts = s["min"].to_numpy().astype(np.int64)
        ends = s["max"].to_numpy().astype(np.int64)
        d0 = starts // DAY_US
        d1 = ends // DAY_US
        counts = (d1 - d0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(starts)), counts)
        offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        day_us = (d0[idx] + offs) * DAY_US
        ov = np.minimum(ends[idx], day_us + DAY_US) - np.maximum(
            starts[idx], day_us
        )
        return pd.DataFrame(
            {
                "user_id": s["user_id"].to_numpy()[idx],
                "session_no": s["sess_no"].to_numpy().astype(np.int64)[idx],
                "day_start": day_us // 1_000_000,
                "overlap_us": ov.astype(np.int64),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "session_no", "day_start", "overlap_us"])
    )


def fk_orphan_scan(sf_dir: str) -> pd.DataFrame:
    """REFERENTIAL-INTEGRITY audit (the foreign-key orphan scan every
    warehouse runs before trusting a join) -> (relation, n_orphans):
    child keys with no parent row, for the three FK edges of the star
    schema.  Zero on healthy synthetic data — the operator's value is
    the mechanism and the guarantee, exercised by a planted-orphan
    pytest.

    Scale shape: each edge is the distributed ``anti_join`` (combiner-
    first DISTINCT build side — the shuffle moves parent keys, never
    child payloads) followed by a count aggregate; the 3-row report
    assembles on the driver."""
    from .ops import joins

    checks = []
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    checks.append(
        ("orders.o_custkey->customer", joins.anti_join(orders, cust, on="o_custkey", right_on="c_custkey"))
    )
    li = _lineitem(sf_dir, ["l_orderkey"])
    okeys = _read(sf_dir, "orders", ["o_orderkey"])
    checks.append(
        ("lineitem.l_orderkey->orders", joins.anti_join(li, okeys, on="l_orderkey", right_on="o_orderkey"))
    )
    cnat = _read(sf_dir, "customer", ["c_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey"])
    checks.append(
        ("customer.c_nationkey->nation", joins.anti_join(cnat, nat, on="c_nationkey", right_on="n_nationkey"))
    )
    return pd.DataFrame(
        {
            "relation": [name for name, _ in checks],
            "n_orphans": np.array([ds.count() for _, ds in checks], np.int64),
        }
    )


def doc_compression_ratio(sf_dir: str) -> rd.Dataset:
    """Compressibility quality signal (the zlib-ratio heuristic corpus
    filters use to flag boilerplate/repetitive text — highly
    compressible docs are repetition-heavy) -> (doc_id, n_bytes,
    n_zbytes, ratio_ppm): deflate level 6 over utf-8 bytes, ratio as
    integer parts-per-million (n_zbytes*1e6 // n_bytes).

    Rows-only check (DuckDB has no deflate); the pytest invariant pins
    the discriminative property (a repeated phrase compresses far
    below random-word text) and determinism.  Embarrassingly parallel
    — no shuffle at all."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def comp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        nb, nz = [], []
        for x in txts:
            b = (x or "").encode("utf-8")
            nb.append(len(b))
            nz.append(len(zlib.compress(b, 6)))
        nb_a = np.array(nb, np.int64)
        nz_a = np.array(nz, np.int64)
        ratio = np.where(nb_a > 0, nz_a * 1_000_000 // np.where(nb_a == 0, 1, nb_a), -1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array(nb_a, pa.int64()),
                "n_zbytes": pa.array(nz_a, pa.int64()),
                "ratio_ppm": pa.array(ratio.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(comp, batch_format="pyarrow")


def ace_train_multinn(sf_dir: str) -> pd.DataFrame:
    """The reference's TRAIN loop (T16 adadelta + A7 best-epoch-on-
    valid-F1, `rnnRE/rnnReModels.py:38-56`, `rnnRE/rnnRE.py:660-668,
    979-994`) run data-parallel end-to-end on a deterministic synthetic
    ACE corpus -> the epoch history (epoch, loss_mean, valid_f1,
    is_best).  Rows-only by nature (iterative optimization has no SQL
    twin); the gradient math is finite-difference-checked and the
    sparse adadelta step is pinned against the reference's dense rule
    in test_train.py.

    Scale shape: one map_batches pass per epoch, each block returning
    ONE model-sized partial (dense small matrices + sparse touched
    embedding rows); driver folds and steps; weights re-broadcast via
    ray.put once per epoch.  No shuffle anywhere."""
    import os
    import tempfile
    import uuid

    from . import ace_pipeline, synth, train
    from .ops.dicts import binary_feature_dict, encode_column
    from .sources.ace import read_ace

    lines = synth.synth_ace_lines(300, seed=31)
    path = os.path.join(
        tempfile.gettempdir(), f"ace_train_{uuid.uuid4().hex[:12]}.full.txt"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    try:
        rows = read_ace(path)
        clean = rows.map_batches(
            lambda t: t.filter(pc.equal(t["error"], "")), batch_format="pyarrow"
        ).materialize()
        fd = binary_feature_dict(clean, "binary_features", 2)
        enc = encode_column(clean, "binary_features", fd, "feat_ids", default=0)
        pairs = enc.map_batches(ace_pipeline._to_pairs_like, batch_format="pyarrow")
        _w, hist = train.train_multinn(pairs, epochs=3, num_blocks=4)
    finally:
        os.unlink(path)
    return hist


def embedding_pca_projection(sf_dir: str) -> rd.Dataset:
    """PCA APPLY (the dimensionality-reduction twin of the JL random
    projection, with learned instead of random axes) -> (vec_id,
    pc1..pc8): project every embedding onto the top-8 principal
    components of the corpus covariance.

    Scale shape: pass 1 is the shared exact-integer covariance fold
    (``_int_cov_fold``: per-block fixed-size QtQ partials, driver fold
    — integer sums, so the fitted axes are bit-identical under ANY
    block layout; the float conversion happens once, after the fold,
    avoiding the int64 numerator overflow the long-form
    ``embedding_covariance`` is bounded by); the 64x64
    eigendecomposition runs on the driver
    (model-sized); pass 2 broadcasts the 64x8 component matrix in the
    task closure and projects each batch with one matmul.  Rows-only
    (no SQL eigensolver); variance ordering, component orthogonality
    and partition-invariance are pytest-pinned (test_corpus_prep)."""
    K = 8
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n, sq, qq = _int_cov_fold(ds)
    # float covariance from the exact integer partials WITHOUT the
    # n*qq - outer(sq, sq) int64 product (which wraps past 2^63 at
    # ~5e5 vectors): convert the exact sums to float64 FIRST — the
    # fold itself stays exact (layout-invariant) far beyond any
    # realistic corpus (~2.7e11 vectors), and PCA is float anyway
    mean_q = sq.astype(np.float64) / n
    cov = (qq.astype(np.float64) / n - np.outer(mean_q, mean_q)) * (
        n / (max(1, n - 1) * 1e8)
    )
    mean = sq.astype(np.float64) / (1e4 * n)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:K]
    comps = evecs[:, order]
    # deterministic sign: largest-|x| element of each component positive
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]

    def project(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        X = flat.reshape(len(col), -1) - mean
        P = X @ comps
        cols = {"vec_id": pc.cast(t["vec_id"], pa.int64())}
        for j in range(P.shape[1]):
            cols[f"pc{j + 1}"] = pa.array(P[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def join_cardinality_estimate(sf_dir: str) -> pd.DataFrame:
    """JOIN-SIZE computation WITHOUT running the join (the optimizer /
    capacity-planning primitive: |A JOIN B on k| = sum_k cnt_A(k) *
    cnt_B(k)) -> one row (join_rows, n_keys) for events.user_id x
    orders.o_custkey — a genuinely many-to-many pair.

    Scale shape: each side collapses to per-key COUNTS map-side
    (combiner-first — the shuffle moves one narrow row per key per
    block, never the fact rows); one small hash join of the two count
    tables, a vectorized multiply, and a sum.  The output equals the
    real join's count(*) exactly — the SQL twin runs the actual join."""
    ev = _read(sf_dir, "events", ["user_id"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def cnt(key: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([([], "count_all")])
            return pa.table(
                {"k": pc.cast(g[key], pa.int64()), out: pc.cast(g["count_all"], pa.int64())}
            )

        return f

    ea = (
        ev.map_batches(cnt("user_id", "na"), batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("na", alias_name="na"))
    )
    ob = (
        orders.map_batches(cnt("o_custkey", "nb"), batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("nb", alias_name="nb"))
    )
    j = joins.hash_join(
        ea.repartition(4), ob.repartition(4), on="k", num_partitions=4
    ).repartition(2)  # merge zero-column empty-partition blocks pre-access

    def mul(t: pa.Table) -> pa.Table:
        prod = pc.multiply(t["na"], t["nb"])
        return pa.table(
            {
                "rows": pa.array([int(pc.sum(prod).as_py() or 0)], pa.int64()),
                "keys": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = j.map_batches(mul, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "join_rows": [int(parts["rows"].sum())],
            "n_keys": [int(parts["keys"].sum())],
        }
    )


def events_debounce(sf_dir: str) -> rd.Dataset:
    """DEBOUNCE dedup (the streaming throttle: drop an event when the
    same user fired the same event_type within the previous 5 minutes)
    -> the kept rows (event_id, user_id, event_type, ts_us).  Gap is
    measured from the previous EVENT in the (user, type) stream (the
    sliding-window definition: every arrival refreshes the window,
    kept or not) — stated explicitly because the alternative
    previous-KEPT-event semantics differs on chains; the SQL twin uses
    the identical lag rule, so the two sides are exactly equivalent.

    Scale shape: ONE shuffle on ``part = user_id % P`` co-locates each
    user's events; within a partition a mergesort by (user, type, ts,
    event_id) + shifted compare computes every gap vectorized."""
    P = 32
    GAP_US = 300_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["ts"])
        out = df[["user_id", "event_type", "ts", "event_id"]].copy()
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        n = len(df)
        new_g = np.ones(n, bool)
        if n > 1:
            new_g[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        gap_ok = np.ones(n, bool)
        if n > 1:
            gap_ok[1:] = (us[1:] - us[:-1]) > GAP_US
        keep = new_g | gap_ok
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[keep],
                "user_id": uid[keep],
                "event_type": et[keep],
                "ts_us": us[keep],
            }
        )

    return (
        ev.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["event_id", "user_id", "event_type", "ts_us"])
    )


def ace_train_eval(sf_dir: str) -> pd.DataFrame:
    """The reference's FULL E2 protocol — train, select the best epoch
    on the validation split, then evaluate THAT model on a held-out
    TEST split (`rnnRE.py:979-994` keeps the best-valid model's test
    outputs) -> (metric, value) rows: best_epoch, best_valid_f1,
    test_precision, test_recall, test_f1, n_test.

    Splits are content-addressed on the pair id (crc32 mod 5: bucket 0
    = valid, bucket 1 = test, rest train) so the protocol is
    deterministic under any block layout.  Rows-only by nature."""
    import os
    import tempfile
    import uuid
    from zlib import crc32

    from . import ace_pipeline, synth, train
    from .ops.dicts import binary_feature_dict, encode_column
    from .ops.metrics import micro_prf_distributed

    lines = synth.synth_ace_lines(400, seed=41)
    path = os.path.join(
        tempfile.gettempdir(), f"ace_te_{uuid.uuid4().hex[:12]}.full.txt"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    try:
        from .sources.ace import read_ace

        rows = read_ace(path)
        clean = rows.map_batches(
            lambda t: t.filter(pc.equal(t["error"], "")), batch_format="pyarrow"
        ).materialize()
        fd = binary_feature_dict(clean, "binary_features", 2)
        enc = encode_column(clean, "binary_features", fd, "feat_ids", default=0)
        pairs = enc.map_batches(
            ace_pipeline._to_pairs_like, batch_format="pyarrow"
        ).materialize()

        def bucket_filter(keep):
            # one shared crc32 bucket rule (the same convention as
            # train_multinn's valid split) — both splits below derive
            # from it so they cannot drift apart
            def f(t: pa.Table) -> pa.Table:
                pid = t["pair_id"].to_pylist()
                mask = np.array(
                    [keep(crc32(str(p).encode()) % 5) for p in pid], bool
                )
                return t.take(pa.array(np.nonzero(mask)[0], pa.int64()))

            return f

        # train on buckets {2,3,4} + valid bucket 0 (train_multinn's own
        # valid_mod=5 rule is the same crc32 convention), test = bucket 1
        not_test = pairs.map_batches(
            bucket_filter(lambda b: b != 1), batch_format="pyarrow"
        )
        best_w, hist = train.train_multinn(not_test, epochs=4, num_blocks=4)
        test_ds = pairs.map_batches(
            bucket_filter(lambda b: b == 1), batch_format="pyarrow"
        )

        import ray

        wref = ray.put(best_w)
        scored = train.score_pairs(test_ds, wref).materialize()
        prf = micro_prf_distributed(scored, "pred_label", "gold_label")
        best_row = hist[hist["is_best"]].iloc[0]
    finally:
        os.unlink(path)
    return pd.DataFrame(
        {
            "metric": [
                "best_epoch",
                "best_valid_f1",
                "test_precision",
                "test_recall",
                "test_f1",
                "n_test",
            ],
            "value": [
                float(best_row["epoch"]),
                float(best_row["valid_f1"]),
                float(prf["precision"]),
                float(prf["recall"]),
                float(prf["f1"]),
                float(scored.count()),
            ],
        }
    )


def export_vacuum_orphans(sf_dir: str) -> pa.Table:
    """VACUUM (orphan-file cleanup — the table-maintenance op that
    reclaims files left behind by failed/zombie writers, which a
    manifest-committed reader must ignore but storage still pays for)
    -> (event_type, n_orphans_removed, n_rows).  (Committed-file
    counts track the write parallelism — CPU-dependent — so they stay
    out of the oracle-hashed output.)

    The query drives the full cycle: (1) hive-partitioned export with a
    per-partition MANIFEST listing the committed files (atomic rename,
    same convention as checkpoint.py), (2) PLANT orphan parquet files
    in two partitions (a crashed writer's leftovers: valid parquet,
    absent from the manifest), (3) vacuum = list each partition dir,
    delete everything not in the manifest, (4) report per-partition
    committed-file counts, orphans removed, and the row count from the
    surviving files' footers — proving vacuum removed exactly the
    plants and lost nothing (the DuckDB twin would see orphan rows
    double-counted if vacuum missed; the pytest plants and checks).
    Listing is per-partition-dir (bounded by that partition's file
    count), never a global recursive walk."""
    import hashlib
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    out_dir = f"/tmp/deepie_export/p{os.getpid()}_vacuum_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    ev.write_parquet(out_dir, partition_cols=["event_type"])

    # (1) commit manifests: one JSON per partition dir (atomic rename)
    parts = sorted(
        d for d in os.listdir(out_dir) if d.startswith("event_type=")
    )
    for p in parts:
        pdir = os.path.join(out_dir, p)
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        tmp = os.path.join(pdir, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
        os.replace(tmp, os.path.join(pdir, "_manifest.json"))

    # (2) plant orphans in the first two partitions (valid parquet,
    # never committed)
    planted = 0
    for p in parts[:2]:
        pdir = os.path.join(out_dir, p)
        orphan = pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "value": pa.array([0.0], pa.float64()),
            }
        )
        pq.write_table(orphan, os.path.join(pdir, "zombie-writer.parquet"))
        planted += 1

    # (3) vacuum per partition
    out_rows = []
    for p in parts:
        pdir = os.path.join(out_dir, p)
        with open(os.path.join(pdir, "_manifest.json")) as f:
            committed = set(json.load(f)["files"])
        removed = 0
        for fname in sorted(os.listdir(pdir)):
            if fname.endswith(".parquet") and fname not in committed:
                os.unlink(os.path.join(pdir, fname))
                removed += 1
        n_rows = sum(
            pq.read_metadata(os.path.join(pdir, f)).num_rows for f in sorted(committed)
        )
        out_rows.append((p.split("=", 1)[1], removed, n_rows))

    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out_rows], pa.string()),
            "n_orphans_removed": pa.array([r[1] for r in out_rows], pa.int64()),
            "n_rows": pa.array([r[2] for r in out_rows], pa.int64()),
        }
    )


def orderkey_gaps(sf_dir: str) -> pd.DataFrame:
    """SEQUENCE-GAP detection (the 'find the missing invoice numbers'
    audit: maximal runs of ids absent from a key sequence) ->
    (gap_start, gap_end) for the orderkeys of high-value orders
    (o_totalprice > 450000 — the full keyspace is dense, the filtered
    set is not).

    Scale shape: keys bucket by ``id // B`` (ONE shuffle); gaps INSIDE
    a bucket come from a vectorized sorted-diff per partition; gaps
    that CROSS bucket boundaries (including runs of entirely-empty
    buckets) are computed on the driver from the per-bucket (min, max)
    summary — metadata-sized: two ints per non-empty bucket, bounded
    by keyspace/B, never by row count."""
    B = 256
    keys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=(pc.field("o_totalprice") > 450000.0),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )

    def tag(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([])
        ids = pc.cast(g["o_orderkey"], pa.int64())
        part = pc.divide(ids, pa.scalar(B))
        return pa.table({"part": part, "id": ids})

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["id"].to_numpy().astype(np.int64))
        nxt = ids[1:]
        prev = ids[:-1]
        m = nxt > prev + 1
        return pd.DataFrame(
            {
                "kind": np.zeros(int(m.sum()) + 1, np.int64),
                "gap_start": np.concatenate([prev[m] + 1, [ids.min()]]),
                "gap_end": np.concatenate([nxt[m] - 1, [ids.max()]]),
            }
        ).assign(kind=lambda d: np.r_[np.zeros(len(d) - 1, np.int64), [1]])

    rows = (
        keys.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    inner = rows[rows["kind"] == 0][["gap_start", "gap_end"]]
    # boundary gaps from the per-bucket (min, max) summaries (kind=1):
    # sorted by min, a gap spans from one bucket's max+1 to the next
    # bucket's min-1 (empty buckets in between are inside that span)
    summ = rows[rows["kind"] == 1].sort_values("gap_start")
    lo = summ["gap_start"].to_numpy()  # per-bucket min
    hi = summ["gap_end"].to_numpy()  # per-bucket max
    m = lo[1:] > hi[:-1] + 1
    cross = pd.DataFrame(
        {"gap_start": hi[:-1][m] + 1, "gap_end": lo[1:][m] - 1}
    )
    out = pd.concat([inner, cross], ignore_index=True)
    out = out.sort_values("gap_start").reset_index(drop=True)
    out["gap_start"] = out["gap_start"].astype(np.int64)
    out["gap_end"] = out["gap_end"].astype(np.int64)
    return out


def doc_token_positions(sf_dir: str) -> rd.Dataset:
    """Positional token EXPLODE (SQL ``unnest ... WITH ORDINALITY`` —
    the long-format shape tokenized corpora are actually stored in) ->
    (doc_id, pos, token) for each doc's first 10 whitespace tokens,
    1-based positions.

    Scale shape: embarrassingly parallel per-batch explode (numpy
    repeat + flat token array), no shuffle; output is corpus-bounded
    at 10 rows/doc.  The DuckDB twin uses the
    ``unnest(range(1, len+1)) AS r(i)`` ordinality idiom."""
    CAP = 10
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        out_id, out_pos, out_tok = [], [], []
        for i, x in zip(ids, txts):
            toks = (x or "").split()[:CAP]
            out_id.extend([i] * len(toks))
            out_pos.extend(range(1, len(toks) + 1))
            out_tok.extend(toks)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def events_value_trend(sf_dir: str) -> rd.Dataset:
    """Grouped linear-regression SLOPE per event_type (value trend in
    cents/hour, SQL ``regr_slope``'s closed form) -> (event_type, n,
    slope_cents_per_hour): the 4-sum moment sketch (sum x, y, xy, x2 —
    EXACT int64 over integer features: x = epoch-HOURS, y = value
    cents), one tiny global groupby, and the closed-form finalizer
    (n*sxy - sx*sy) / (n*sxx - sx^2) evaluated in float64 from the
    exact sums — same sketch family as ``events_value_corr``; the
    DuckDB twin evaluates the IDENTICAL expression over identical
    integer sums (not its streaming ``regr_slope``).

    x is epoch-hours, not seconds, to keep sum(x^2) inside int64
    (epoch-hours ~5e5 -> x^2 ~2.4e11 -> exact up to ~4e7 rows per
    group; at 100 TB split sxx into hi/lo int64 lanes or re-center x
    at a fixed epoch — the sketch stays mergeable either way)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"])))
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = pa.array(np.floor_divide(us, 3_600_000_000), pa.int64())
        y = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
        tt = pa.table(
            {
                "event_type": t["event_type"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
            }
        )
        g = tt.group_by("event_type").aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"),
             ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "sx": g["x_sum"],
                "sy": g["y_sum"],
                "sxy": g["xy_sum"],
                "sxx": g["xx_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("n", alias_name="n"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        f = lambda c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        n, sx, sy, sxy, sxx = f("n"), f("sx"), f("sy"), f("sxy"), f("sxx")
        den = n * sxx - sx * sx
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(den != 0.0, (n * sxy - sx * sy) / den, np.nan)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "slope_cents_per_hour": pa.array(
                    [None if np.isnan(s) else float(s) for s in slope],
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


_BM25_TERMS = ("vector", "stream", "merge")


def _term_freqs(t: pa.Table) -> pa.Table:
    """Per-doc (doc_id, dl, tf1..tfK) for the fixed ``_BM25_TERMS`` —
    one Arrow explode + one is_in mask per term; docs with zero tokens
    keep a row (dl=0, tf=0) via a left merge onto the batch ids."""
    from .ops.text import _explode_tokens

    flat, ids = _explode_tokens(t, "text", "doc_id")
    cols = {"doc_id": ids, "one": pa.array(np.ones(len(flat), np.int64))}
    for k, term in enumerate(_BM25_TERMS, 1):
        cols[f"tf{k}"] = pc.cast(pc.equal(flat, term), pa.int64())
    g = (
        pa.table(cols)
        .group_by("doc_id")
        .aggregate([("one", "sum")] + [(f"tf{k}", "sum") for k in range(1, len(_BM25_TERMS) + 1)])
    )
    got = g.to_pandas().set_index("doc_id")
    all_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out = {"doc_id": pa.array(all_ids, pa.int64())}
    dl = got["one_sum"].reindex(all_ids).fillna(0).to_numpy(np.int64)
    out["dl"] = pa.array(dl, pa.int64())
    for k in range(1, len(_BM25_TERMS) + 1):
        tf = got[f"tf{k}_sum"].reindex(all_ids).fillna(0).to_numpy(np.int64)
        out[f"tf{k}"] = pa.array(tf, pa.int64())
    return pa.table(out)


def bm25_search(sf_dir: str) -> rd.Dataset:
    """BM25 ranked retrieval (Okapi, Lucene idf variant; k1=1.2,
    b=0.75) for a fixed 3-term query -> top-20 (doc_id, n_tokens,
    bm25) by (score DESC, doc_id).

    Scale shape: pass 1 folds the corpus stats — N, sum(dl), df per
    term — from per-batch integer partials (ONE 1-row aggregate; the
    idf of each term and avgdl are then 4 broadcast floats in the task
    closure); pass 2 scores every doc vectorized (numpy, the IDENTICAL
    float expression the DuckDB twin evaluates over the same exact
    integers, term-by-term in the same order) and keeps a per-block
    top-20 before the tiny global sort+limit.  Nothing corpus-sized
    ever gathers: the shuffle is #blocks x 20 narrow rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    freqs = ds.map_batches(_term_freqs, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        cols = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array([pc.sum(t["dl"]).as_py() or 0], pa.int64()),
        }
        for k in range(1, len(_BM25_TERMS) + 1):
            df_k = pc.sum(
                pc.cast(pc.greater(t[f"tf{k}"], 0), pa.int64())
            ).as_py() or 0
            cols[f"df{k}"] = pa.array([df_k], pa.int64())
        return pa.table(cols)

    s = (
        freqs.map_batches(stats_partial, batch_format="pyarrow")
        .sum(["n_docs", "sum_dl"] + [f"df{k}" for k in range(1, len(_BM25_TERMS) + 1)])
    )
    n_docs = int(s["sum(n_docs)"])
    sum_dl = int(s["sum(sum_dl)"])
    dfs = [int(s[f"sum(df{k})"]) for k in range(1, len(_BM25_TERMS) + 1)]
    import math

    # identical float expression tree as the SQL twin, from exact ints
    avgdl = float(sum_dl) / float(n_docs)
    idfs = [
        math.log(1.0 + (n_docs - df_k + 0.5) / (df_k + 0.5)) for df_k in dfs
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = 1.2 * (0.25 + 0.75 * dl / avgdl)
        total = np.zeros(len(dl), np.float64)
        for k, idf in enumerate(idfs, 1):
            tf = t[f"tf{k}"].to_numpy(zero_copy_only=False).astype(np.float64)
            total = total + idf * (tf * 2.2) / (tf + norm)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["dl"],
                "bm25": pa.array(total, pa.float64()),
            }
        )
        # per-block top-20 (same (score DESC, id) order as the final)
        df = out.to_pandas().sort_values(
            ["bm25", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(20), preserve_index=False)

    return (
        freqs.map_batches(score, batch_format="pyarrow")
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(20)
    )


def hybrid_search_rrf(sf_dir: str) -> rd.Dataset:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    2009): an embedding-similarity ranking and a keyword ranking,
    fused as 1/(60+r_cos) + 1/(60+r_kw) -> top-10 (doc_id, rank_cos,
    rank_kw, rrf).

    Both rankings are EXACT-integer-scored so ranks (hence the fused
    floats) are bit-identical to the DuckDB twin: similarity is the
    int64 dot product of 1e-4-quantized embeddings against the
    broadcast quantized query vector (vec_id 0 — one pushdown-filtered
    row), keyword score is the summed term frequency of the fixed
    query terms.  Ranks come from ops/analytic.global_rank (range-
    partitioned distributed ranking, one shuffle each); the fusion is
    a hash join of two (id, rank) tables + a vectorized map + the tiny
    global top-10.  RRF itself never looks at raw scores, which is
    exactly why it is the robust way to fuse heterogeneous retrievers."""
    from .ops import analytic

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrow = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=(pc.field("vec_id") == 0),
        )
        .take_all()
    )
    qv = np.floor(
        np.asarray(qrow[0]["embedding"], np.float64) * 10000.0
    ).astype(np.int64)

    def sim_batch(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        X = np.floor(flat * 10000.0).astype(np.int64).reshape(len(col), -1)
        return pa.table(
            {
                "id": pc.cast(t["vec_id"], pa.int64()),
                "sim": pa.array(X @ qv, pa.int64()),
            }
        )

    ra = analytic.global_rank(
        emb.map_batches(sim_batch, batch_format="pyarrow"),
        "sim",
        "id",
        out_col="rank_cos",
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def kw_batch(t: pa.Table) -> pa.Table:
        from .ops.text import _explode_tokens

        flat, ids = _explode_tokens(t, "text", "doc_id")
        hit = pc.cast(
            pc.is_in(flat, value_set=pa.array(list(_BM25_TERMS))), pa.int64()
        )
        g = (
            pa.table({"id": ids, "hit": hit})
            .group_by("id")
            .aggregate([("hit", "sum")])
        )
        got = g.to_pandas().set_index("id")["hit_sum"]
        all_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ks = got.reindex(all_ids).fillna(0).to_numpy(np.int64)
        return pa.table(
            {
                "id": pa.array(all_ids, pa.int64()),
                "kscore": pa.array(ks, pa.int64()),
            }
        )

    rb = analytic.global_rank(
        docs.map_batches(kw_batch, batch_format="pyarrow"),
        "kscore",
        "id",
        out_col="rank_kw",
    )

    j = joins.hash_join(ra, rb, on="id", num_partitions=8).repartition(8)

    def fuse(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank_cos": pa.array([], pa.int64()),
                    "rank_kw": pa.array([], pa.int64()),
                    "rrf": pa.array([], pa.float64()),
                }
            )
        a = t["rank_cos"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t["rank_kw"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t["id"],
                "rank_cos": t["rank_cos"],
                "rank_kw": t["rank_kw"],
                "rrf": pa.array(1.0 / (60.0 + a) + 1.0 / (60.0 + b)),
            }
        )

    return (
        j.map_batches(fuse, batch_format="pyarrow")
        .sort(["rrf", "doc_id"], descending=[True, False])
        .limit(10)
    )


def purchase_state_pit(sf_dir: str) -> rd.Dataset:
    """POINT-IN-TIME join against an SCD2 dimension: each purchase
    event matched to the activity state (the gaps-and-islands
    compaction of the user's NON-purchase events) that was current at
    purchase time -> (event_id, user_id, seg_no, state).  The temporal
    'what state was this entity in when X happened' join every
    CDC/SCD2 warehouse runs.

    Scale shape: the dimension is ``ops/analytic.islands`` (one
    shuffle, history-compacted output), the temporal match is the
    bucketed merge_asof path (``ops/joins.asof_join_merge`` — one
    union + one key-bucket shuffle, never the |purchases| x
    |islands-per-user| expansion), and the state label attaches by a
    hash join on a packed island id (user_id << 20 | seg_no; seg_no is
    bounded by per-user event volume — documented partitioning
    assumption).  Purchases before the user's first island drop
    (inner PIT semantics), same as the oracle's ts_start <= ts
    predicate."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    non_p = ev.map_batches(
        lambda t: t.filter(pc.not_equal(t["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    isl = analytic.islands(
        non_p, "user_id", "ts", "event_id", "event_type"
    ).materialize()  # consumed by the as-of right side AND the label join

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": np.array([], np.int64),
                    "island_id": np.array([], np.int64),
                    "ts_start": np.array([], "datetime64[us]"),
                }
            )
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "island_id": (df["user_id"].to_numpy(np.int64) << 20)
                | df["seg_no"].to_numpy(np.int64),
                "ts_start": df["ts_start"].to_numpy(),
            }
        )

    right = isl.map_batches(pack, batch_format="pandas")
    left = ev.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["event_type"], "purchase"), pc.is_valid(t["ts"])
            )
        ).select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
    )
    matched = joins.asof_join_merge(
        left,
        right,
        key="user_id",
        left_id="event_id",
        left_ts="ts",
        right_ts="ts_start",
        tie_break="island_id",
        num_partitions=8,
    )

    def meta(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "island_id": np.array([], np.int64),
                    "seg_no": np.array([], np.int64),
                    "state": np.array([], object),
                }
            )
        return pd.DataFrame(
            {
                "island_id": (df["user_id"].to_numpy(np.int64) << 20)
                | df["seg_no"].to_numpy(np.int64),
                "seg_no": df["seg_no"].to_numpy(np.int64),
                "state": df["event_type"].to_numpy(),
            }
        )

    labels = isl.map_batches(meta, batch_format="pandas")
    j = joins.hash_join(
        matched, labels, on="island_id", num_partitions=8
    ).repartition(8)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "seg_no": np.array([], np.int64),
                    "state": np.array([], object),
                }
            )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["island_id"].to_numpy(np.int64) >> 20,
                "seg_no": df["seg_no"].to_numpy(np.int64),
                "state": df["state"].to_numpy(),
            }
        )

    return j.map_batches(fin, batch_format="pandas")


def export_tar_shards_roundtrip(sf_dir: str) -> rd.Dataset:
    """WebDataset-style TAR-shard sink + source round trip over the
    INTERLEAVED corpus -> (doc_id, n_spans, span_fp): interleave the
    documents table (the input_hint shape), write content-addressed
    tar shards (sorted members, zeroed metadata, atomic rename — see
    sources/tar_shards.py), read them back, and fingerprint each doc's
    full (kind, text, media_ref, offset) sequence.  Rows-only (the
    interleave mapping is seeded-RNG, not SQL); pytest pins that the
    fingerprints equal the PRE-write fingerprints (the north-star
    span-sequence invariant through the multimodal shard format) and
    that shard bytes are identical across partitionings and re-runs."""
    import hashlib
    import os
    import shutil

    from . import pipeline
    from .sources import tar_shards

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_tar_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = pipeline.read_documents(sf_dir)
    # consume the manifest (the write) before reading back
    manifest = tar_shards.write_tar_shards(docs, out_dir, n_shards=16)
    n = manifest.count()
    assert n >= 1
    back = tar_shards.read_tar_shards(out_dir)
    return tar_shards.shards_fingerprint(back)


def retrieval_metrics_cosine(sf_dir: str) -> pd.DataFrame:
    """Retrieval EVALUATION against labeled ground truth -> one row per
    query (query_id, first_rel_rank, n_rel, rel_in_top10, mrr,
    recall_at_10, ndcg_at_10): the similarity ranking is scored with
    the standard IR metrics, where a doc is relevant to a query iff it
    shares the query doc's cluster ``label`` (the judged-qrels stand-in
    this corpus carries); the query doc itself is excluded.  Queries
    with zero relevant docs drop (inner semantics, same as the twin).

    Exactness: similarities are int64 dot products of 1e-4-quantized
    embeddings (bit-stable ranks, ties -> smaller id); every metric is
    then an IDENTICAL float expression over exact integers on both
    sides (ndcg's log2 terms are the one transcendental — 10-term sums,
    same tolerance class as the nll oracles).

    Scale shape: NO global rank table — pass A streams the corpus once
    against the broadcast 10-query matrix (one int64 matmul per batch)
    emitting per-block partials (local top-10 per query, local
    best-relevant argmax, local relevant-count: <= 21 narrow rows per
    block per query); pass B broadcasts the 10 folded best-relevant
    pivots and counts strictly-better docs per query (first_rel_rank =
    that count + 1 — a rank WITHOUT ranking).  Driver state is
    blocks x queries x 21 rows, never corpus-sized."""
    N_Q, TOPK = 10, 10
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qdf = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
            filter=(pc.field("vec_id") < N_Q),
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Qm = np.stack(
        [
            np.floor(np.asarray(v, np.float64) * 10000.0).astype(np.int64)
            for v in qdf["embedding"]
        ]
    )  # (N_Q, dim)
    qids = qdf["vec_id"].to_numpy(np.int64)
    qlabels = qdf["label"].to_numpy(np.int64)

    def _mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        X = np.floor(flat * 10000.0).astype(np.int64).reshape(len(col), -1)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return X, ids, labels

    def pass_a(t: pa.Table) -> pa.Table:
        X, ids, labels = _mat(t)
        S = X @ Qm.T  # (n, N_Q) int64
        out_q, out_kind, out_sim, out_id, out_rel = [], [], [], [], []
        for k in range(N_Q):
            keep = ids != qids[k]
            s, di, rel = S[keep, k], ids[keep], labels[keep] == qlabels[k]
            if len(s) == 0:
                continue
            # local top-10 by (sim DESC, id ASC)
            order = np.lexsort((di, -s))[:TOPK]
            out_q.extend([qids[k]] * len(order))
            out_kind.extend([0] * len(order))
            out_sim.extend(s[order])
            out_id.extend(di[order])
            out_rel.extend(rel[order].astype(np.int64))
            # local best-relevant argmax + relevant count
            if rel.any():
                ri = np.flatnonzero(rel)
                best = ri[np.lexsort((di[ri], -s[ri]))[0]]
                out_q.append(qids[k])
                out_kind.append(1)
                out_sim.append(s[best])
                out_id.append(di[best])
                out_rel.append(int(rel.sum()))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
                "sim": pa.array(out_sim, pa.int64()),
                "id": pa.array(out_id, pa.int64()),
                "rel": pa.array(out_rel, pa.int64()),
            }
        )

    parts = (
        emb.map_batches(pass_a, batch_format="pyarrow").to_pandas()
    )  # blocks x queries x 21 rows — driver-bounded by design
    rows = []
    best = {}
    for qid, grp in parts.groupby("qid"):
        top = grp[grp["kind"] == 0].sort_values(
            ["sim", "id"], ascending=[False, True], kind="mergesort"
        ).head(TOPK)
        br = grp[grp["kind"] == 1]
        if br.empty:
            continue  # zero relevant docs: drop (twin's inner join)
        n_rel = int(br["rel"].sum())
        b = br.sort_values(["sim", "id"], ascending=[False, True]).iloc[0]
        best[int(qid)] = (int(b["sim"]), int(b["id"]))
        rel_top = top["rel"].to_numpy()
        rel_in_top10 = int(rel_top.sum())
        dcg = 0.0
        for i, r in enumerate(rel_top, 1):
            if r:
                dcg = dcg + 1.0 / np.log2(1.0 + float(i))
        idcg = 0.0
        for i in range(1, min(n_rel, TOPK) + 1):
            idcg = idcg + 1.0 / np.log2(1.0 + float(i))
        rows.append(
            {
                "query_id": int(qid),
                "n_rel": n_rel,
                "rel_in_top10": rel_in_top10,
                "dcg": dcg,
                "idcg": idcg,
            }
        )

    # pass B: first_rel_rank = 1 + #docs strictly better than the best
    # relevant doc, per query (broadcast 10 pivots, streamed count)
    bq = np.array(sorted(best.keys()), np.int64)
    bsim = np.array([best[int(q)][0] for q in bq], np.int64)
    bid = np.array([best[int(q)][1] for q in bq], np.int64)

    def pass_b(t: pa.Table) -> pa.Table:
        X, ids, labels = _mat(t)
        S = X @ Qm.T
        out_q, out_n = [], []
        for j, q in enumerate(bq):
            k = int(np.flatnonzero(qids == q)[0])
            keep = ids != q
            s, di = S[keep, k], ids[keep]
            better = (s > bsim[j]) | ((s == bsim[j]) & (di < bid[j]))
            out_q.append(q)
            out_n.append(int(better.sum()))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nb": pa.array(out_n, pa.int64()),
            }
        )

    nb = (
        emb.map_batches(pass_b, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(Sum("nb", alias_name="nb"))
        .to_pandas()
        .set_index("qid")["nb"]
    )
    out = []
    for r in rows:
        frr = int(nb[r["query_id"]]) + 1
        out.append(
            {
                "query_id": r["query_id"],
                "first_rel_rank": frr,
                "n_rel": r["n_rel"],
                "rel_in_top10": r["rel_in_top10"],
                "mrr": 1.0 / float(frr),
                "recall_at_10": float(r["rel_in_top10"]) / float(r["n_rel"]),
                "ndcg_at_10": (r["dcg"] / r["idcg"]) if r["idcg"] else 0.0,
            }
        )
    return pd.DataFrame(out).sort_values("query_id").reset_index(drop=True)


# ------------------------------------------------- TPC-H shape batch 2
# (round 4: q6/q7/q9/q14/q17/q18/q19/q22 shapes over the columns this
# corpus carries; every adaptation away from the canonical spec —
# missing partsupp/shipmode/container/phone columns — is stated in the
# docstring and mirrored verbatim in the SQL twin.)


def _cents(price, frac) -> pa.Array:
    """floor(price * frac * 100) as int64 — the repo-wide exact-integer
    revenue quantization (see q10_returned_items)."""
    return pc.cast(
        pc.floor(pc.multiply(pc.multiply(price, frac), pa.scalar(100.0))),
        pa.int64(),
    )


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue increase from discount-band lineitems
    shipped in 1996 (qty < 24, discount in [0.04, 0.06]) -> one row
    (revenue).

    Scale shape: EVERY predicate is pushed into the parquet read (date
    band, discount band, quantity cap) so only qualifying rows leave
    storage, and only two columns are read; per-batch partial sums of
    integer cents fold through a driver-side scalar sum — no shuffle at
    all."""
    from datetime import datetime

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= lo)
            & (pc.field("l_shipdate") < hi)
            & (pc.field("l_discount") >= 0.04)
            & (pc.field("l_discount") <= 0.06)
            & (pc.field("l_quantity") < 24.0)
        ),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"], t["l_discount"])
        tot = pc.sum(c).as_py() or 0
        return pa.table({"cents": pa.array([tot], pa.int64())})

    cents = li.map_batches(partial, batch_format="pyarrow").sum("cents") or 0
    return pd.DataFrame({"revenue": [round(int(cents) / 100.0, 2)]})


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: shipping volume between two trading nations —
    lineitems whose SUPPLIER sits in one of {NATION_1, NATION_2} and
    whose ordering CUSTOMER sits in the other, grouped by (supplier
    nation, customer nation, ship year) -> (supp_nation, cust_nation,
    l_year, revenue).

    Scale shape: both nation filters are pushed into the supplier /
    customer parquet reads (each side shrinks ~12x before any join);
    supplier and customer are sf-scaled so both go through
    hash-partitioned Dataset.joins (q5 convention); the lineitem stream
    is pre-aggregated to (orderkey, supp nation, year) integer-cent
    partials BEFORE the orders join; the final grouped sum is
    combiner-first.  Nation names attach from a 2-entry driver dict."""
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    keys = sorted(
        int(k) for k, v in name_of.items() if v in ("NATION_1", "NATION_2")
    )

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=(pc.field("s_nationkey").isin(keys)),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=(pc.field("c_nationkey").isin(keys)),
    )
    empty = pd.DataFrame(
        {
            "supp_nation": pd.Series([], dtype=str),
            "cust_nation": pd.Series([], dtype=str),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64),
        }
    )
    # a fully-empty pushdown read yields schema-less blocks that the
    # hash join rejects; an empty trade side means an empty result
    if supp.limit(1).count() == 0 or cust.limit(1).count() == 0:
        return empty
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    oc = (
        joins.hash_join(
            orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
        )
        .select_columns(["o_orderkey", "c_nationkey"])
        .repartition(8)
    )

    li = _lineitem(
        sf_dir,
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    ls = joins.hash_join(
        li, supp, on="l_suppkey", right_on="s_suppkey", num_partitions=8
    ).repartition(8)

    def pre_agg(t: pa.Table) -> pa.Table:
        c = _cents(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        yr = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "s_nationkey": t["s_nationkey"],
                    "l_year": yr,
                    "c": c,
                }
            )
            .group_by(["l_orderkey", "s_nationkey", "l_year"])
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["l_orderkey", "s_nationkey", "l_year", "cents"])

    lo_ = joins.hash_join(
        ls.map_batches(pre_agg, batch_format="pyarrow"),
        oc,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = sn != cn  # both already in {k1, k2}: cross pairs only
        t = t.filter(pa.array(keep))
        g = (
            pa.table(
                {
                    "s_nationkey": t["s_nationkey"],
                    "c_nationkey": t["c_nationkey"],
                    "l_year": t["l_year"],
                    "cents": t["cents"],
                }
            )
            .group_by(["s_nationkey", "c_nationkey", "l_year"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["s_nationkey", "c_nationkey", "l_year", "cents"])

    agg = (
        lo_.map_batches(partial, batch_format="pyarrow")
        .groupby(["s_nationkey", "c_nationkey", "l_year"])
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    agg["supp_nation"] = agg["s_nationkey"].map(name_of)
    agg["cust_nation"] = agg["c_nationkey"].map(name_of)
    agg["revenue"] = [round(int(c) / 100.0, 2) for c in agg["cents"]]
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return (
        agg[["supp_nation", "cust_nation", "l_year", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


def q9_product_type_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in this corpus, so
    profit is discounted revenue rather than revenue minus supply
    cost): for lineitems of parts whose name contains 'gear', profit by
    (supplier nation, ship year) -> (n_name, o_year, profit).

    Scale shape: part collapses to its matching KEYS distributed (name
    scan inside map_batches — substring match is not a parquet page
    predicate) and semi-joins into lineitem via a hash join; the
    surviving stream pre-aggregates to (suppkey, year) integer-cent
    partials BEFORE the supplier join (q5's combiner-before-join
    convention: join #2 moves ~|supplier| x |years| rows, never
    ~|lineitem|); nation names attach from the 25-row driver dict."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def keys_only(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], "gear")
        return pa.table({"p_partkey": t["p_partkey"].filter(m)})

    pkeys = part.map_batches(keys_only, batch_format="pyarrow")
    li = _lineitem(
        sf_dir,
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lp = joins.hash_join(
        li, pkeys, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)

    def pre_agg(t: pa.Table) -> pa.Table:
        c = _cents(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        yr = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        g = (
            pa.table({"l_suppkey": t["l_suppkey"], "o_year": yr, "c": c})
            .group_by(["l_suppkey", "o_year"])
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["l_suppkey", "o_year", "cents"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    js = joins.hash_join(
        lp.map_batches(pre_agg, batch_format="pyarrow"),
        supp,
        on="l_suppkey",
        right_on="s_suppkey",
        num_partitions=8,
    ).repartition(8)

    agg = (
        js.groupby(["s_nationkey", "o_year"])
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["n_name"] = agg["s_nationkey"].map(name_of)
    agg["profit"] = [round(int(c) / 100.0, 2) for c in agg["cents"]]
    agg["o_year"] = agg["o_year"].astype(np.int64)
    return (
        agg[["n_name", "o_year", "profit"]]
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: PROMO-type share of September-1997 revenue ->
    one row (promo_revenue, total_revenue) — both sums emitted instead
    of the ratio (repo parity rule: no division before the hash).

    Scale shape: the one-month shipdate band is pushed into the
    lineitem read (~1/80 of the table leaves storage); part ships only
    (p_partkey, p_type) through a hash-partitioned join; conditional
    integer-cent partials fold through two scalar sums."""
    from datetime import datetime

    lo, hi = datetime(1997, 9, 1), datetime(1997, 10, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = joins.hash_join(
        li, part, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        promo = pc.equal(t["p_type"], "PROMO")
        pc_sum = pc.sum(pc.if_else(promo, c, pa.scalar(0, pa.int64()))).as_py() or 0
        tot = pc.sum(c).as_py() or 0
        return pa.table(
            {
                "promo_cents": pa.array([pc_sum], pa.int64()),
                "total_cents": pa.array([tot], pa.int64()),
            }
        )

    # one-row-per-block partials: the fold table is #blocks-sized, so a
    # single driver fold replaces two full executions of the join
    parts = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo_cents = int(parts["promo_cents"].sum()) if len(parts) else 0
    total_cents = int(parts["total_cents"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "promo_revenue": [round(int(promo_cents) / 100.0, 2)],
            "total_revenue": [round(int(total_cents) / 100.0, 2)],
        }
    )


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape (no p_container column: brand filter only):
    revenue from Brand#11 lineitems whose quantity is below 20% of that
    part's average ordered quantity -> one row (revenue).

    Scale shape: the brand filter is an equality pushed into the part
    read (keys only: ~1/25 of partkeys leave storage); lineitem
    semi-joins to those keys via a hash join and the NARROW surviving
    3-column stream is pinned once (two consumers: the per-part stats
    pass and the below-average filter pass — at 100 TB this pin is
    ~1/25 of lineitem x 3 columns in the object store, which spills
    rather than re-reading the full table twice); per-part quantity
    stats are combiner-first; the avg test is the integer
    cross-multiplication ``100 * qty_cents * cnt < 20 * qtysum_cents``
    (exact — no division, no float avg)."""
    pk = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filter=(pc.field("p_brand") == "Brand#11"),
    )
    li = _lineitem(sf_dir, ["l_partkey", "l_quantity", "l_extendedprice"])
    lib = (
        joins.hash_join(li, pk, on="l_partkey", right_on="p_partkey", num_partitions=8)
        .repartition(8)
        .materialize()
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        g = (
            pa.table({"l_partkey": t["l_partkey"], "qc": qc})
            .group_by("l_partkey")
            .aggregate([("qc", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["l_partkey", "qtysum_cents", "cnt"])

    stats = (
        lib.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(
            Sum("qtysum_cents", alias_name="qtysum_cents"),
            Sum("cnt", alias_name="cnt"),
        )
    )
    j = joins.hash_join(
        lib.map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "qty_cents": pc.cast(
                        pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))),
                        pa.int64(),
                    ),
                    "price_cents": pc.cast(
                        pc.floor(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        stats,
        on="l_partkey",
        num_partitions=8,
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        qty = t["qty_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        qsum = t["qtysum_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = t["price_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = 100 * qty * cnt < 20 * qsum
        return pa.table({"cents": pa.array([int(price[keep].sum())], pa.int64())})

    cents = j.map_batches(partial, batch_format="pyarrow").sum("cents") or 0
    return pd.DataFrame({"revenue": [round(int(cents) / 100.0, 2)]})


def q18_large_volume_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    300, with their customer -> (c_custkey, c_name, o_orderkey,
    o_orderdate_s, o_totalprice, sum_qty), top-100 by (totalprice DESC,
    orderkey).  Order dates ship as int64 epoch seconds (repo
    convention — no timestamp-zone hazards in the hash).

    Scale shape: per-order quantity sums are combiner-first; the
    HAVING > 300 filter drops to a tiny survivor set map-side BEFORE
    any join; orders and customer attach through hash-partitioned
    joins (survivors are corpus-scaled — a fixed fraction of orders —
    so no driver broadcast); the top-100 is a global sort on an
    already-small table."""
    li = _lineitem(sf_dir, ["l_orderkey", "l_quantity"])

    def qsum_partial(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        g = (
            pa.table({"o_orderkey": t["l_orderkey"], "qc": qc})
            .group_by("o_orderkey")
            .aggregate([("qc", "sum")])
        )
        return g.rename_columns(["o_orderkey", "qty_cents"])

    big = (
        li.map_batches(qsum_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("qty_cents", alias_name="qty_cents"))
        # HAVING as a vectorized batch filter (never a per-row lambda)
        .map_batches(
            lambda t: t.filter(pc.greater(t["qty_cents"], 30000)),
            batch_format="pyarrow",
        )
        # merge sparse aggregate partitions' zero-column empty blocks
        # before the join; the pin is the HAVING survivor set (narrow,
        # <<1% of orders) and backs the empty-guard count below
        .repartition(8)
        .materialize()
    )
    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_name": pd.Series([], dtype=str),
            "o_orderkey": pd.Series([], dtype=np.int64),
            "o_orderdate_s": pd.Series([], dtype=np.int64),
            "o_totalprice": pd.Series([], dtype=np.float64),
            "sum_qty": pd.Series([], dtype=np.float64),
        }
    )
    if big.count() == 0:
        return empty
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    jo = joins.hash_join(
        big, orders, on="o_orderkey", num_partitions=8
    ).repartition(8)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    jc = joins.hash_join(
        jo, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
    ).repartition(8)
    df = jc.to_pandas()  # survivor set: HAVING-filtered, human-sized
    if df.empty:
        return empty
    # Dataset.join drops the RIGHT key column; o_custkey == c_custkey
    df["c_custkey"] = df["o_custkey"].astype(np.int64)
    df["o_orderdate_s"] = (
        df["o_orderdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
    )
    df["sum_qty"] = [round(int(c) / 100.0, 2) for c in df["qty_cents"]]
    df = df.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(100)
    return df[
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate_s", "o_totalprice", "sum_qty"]
    ].reset_index(drop=True)


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (no container/shipmode columns: brand x size x
    quantity bands only): revenue from lineitems matching any of three
    (brand, size-band, quantity-band) disjuncts -> one row (revenue).

    Scale shape: the shared bound ``l_quantity <= 30`` (the union of
    the three bands) is pushed into the lineitem read; part ships only
    (p_partkey, p_brand, p_size) through the hash join; the disjunction
    evaluates as three vectorized numpy masks per batch."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_quantity") <= 30.0),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    j = joins.hash_join(
        li, part, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_pandas().to_numpy()
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = (
            ((brand == "Brand#12") & (size >= 1) & (size <= 5) & (qty >= 1) & (qty <= 11))
            | ((brand == "Brand#23") & (size >= 1) & (size <= 10) & (qty >= 10) & (qty <= 20))
            | ((brand == "Brand#34") & (size >= 1) & (size <= 15) & (qty >= 20) & (qty <= 30))
        )
        c = _cents(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        return pa.table({"cents": pa.array([int(c[m].sum())], pa.int64())})

    cents = j.map_batches(partial, batch_format="pyarrow").sum("cents") or 0
    return pd.DataFrame({"revenue": [round(int(cents) / 100.0, 2)]})


def q22_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape (no phone column: grouped by nation instead of
    country code): customers with above-average POSITIVE account
    balance and NO orders, counted per nation -> (n_name, numcust,
    totacctbal).

    Scale shape: the global positive-balance average folds from
    per-batch (cents, count) partials (two int64s per block — never a
    float avg: the candidate test is the integer cross-multiplication
    ``bal_cents * n > sum_cents``); candidates anti-join to orders via
    the combiner-first distinct-key anti join (ops/joins.anti_join);
    the per-nation rollup is a 25-row aggregate with names from the
    driver dict."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(t: pa.Table) -> pa.Table:
        bc = pc.cast(
            pc.floor(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64()
        )
        pos = pc.greater(t["c_acctbal"], 0.0)
        s = pc.sum(pc.if_else(pos, bc, pa.scalar(0, pa.int64()))).as_py() or 0
        n = pc.sum(pc.cast(pos, pa.int64())).as_py() or 0
        return pa.table(
            {"s": pa.array([s], pa.int64()), "n": pa.array([n], pa.int64())}
        )

    fold = cust.map_batches(avg_partial, batch_format="pyarrow").to_pandas()
    s_tot, n_tot = int(fold["s"].sum()), int(fold["n"].sum())
    if n_tot == 0:
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=str),
                "numcust": pd.Series([], dtype=np.int64),
                "totacctbal": pd.Series([], dtype=np.float64),
            }
        )

    def above_avg(t: pa.Table) -> pa.Table:
        bc = (
            pc.cast(pc.floor(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = bc * n_tot > s_tot
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
                "bal_cents": pa.array(bc[keep], pa.int64()),
            }
        )

    cand = cust.map_batches(above_avg, batch_format="pyarrow")
    # "dormant" = no orders on or after 1999-01-01 (every customer in
    # this corpus has SOME order, so the canonical no-orders-ever test
    # is vacuous; the date floor is pushed into the orders read)
    from datetime import datetime

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_orderdate") >= datetime(1999, 1, 1)),
    )
    no_orders = joins.anti_join(
        cand,
        recent,
        on="c_custkey",
        right_on="o_custkey",
        num_partitions=8,
    ).repartition(8)  # merge the join's zero-column empty blocks

    def nation_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"c_nationkey": t["c_nationkey"], "bc": t["bal_cents"]})
            .group_by("c_nationkey")
            .aggregate([("bc", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["c_nationkey", "bal_cents", "numcust"])

    agg = (
        no_orders.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("bal_cents", alias_name="bal_cents"),
            Sum("numcust", alias_name="numcust"),
        )
        .to_pandas()
    )
    if agg.empty:  # empty aggregate drops all columns — retype
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=str),
                "numcust": pd.Series([], dtype=np.int64),
                "totacctbal": pd.Series([], dtype=np.float64),
            }
        )
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["n_name"] = agg["c_nationkey"].map(name_of)
    agg["totacctbal"] = [round(int(c) / 100.0, 2) for c in agg["bal_cents"]]
    agg["numcust"] = agg["numcust"].astype(np.int64)
    return (
        agg[["n_name", "numcust", "totacctbal"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


# --------------------------------------------- round-4 late additions
# (window cummax, information-theoretic aggregates, positional phrase
# search, robust winsorized stats)


def events_running_max(sf_dir: str) -> rd.Dataset:
    """Cumulative MAX window (SQL ``max(...) OVER (PARTITION BY user
    ORDER BY ts, event_id)``) -> (user_id, event_id, run_max_cents):
    each user's running all-time-high spend in integer cents (exact —
    the repo-wide window quantization).  Null values and null
    timestamps are excluded on both sides (a null row's window max
    is NOT null in SQL, so keeping them would need three-valued
    carry logic for zero analytic value).

    Scale shape: one shuffle on user_id, numpy ``maximum.accumulate``
    within the group (ops/analytic.ordered_apply)."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts", "value"]), batch_format="pandas"
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "run_max_cents": np.maximum.accumulate(cents),
            }
        )

    return analytic.ordered_apply(clean, "user_id", ["ts", "event_id"], per_key)


def user_event_entropy(sf_dir: str) -> rd.Dataset:
    """Shannon entropy of each user's event-type distribution (nats)
    -> (user_id, n_events, entropy): the behavioral-diversity signal
    (H = ln N - sum(c * ln c) / N over the per-type counts c).

    Scale shape: counts are combiner-first on (user, type); the
    entropy fold runs per user over <=|event types| rows (map_groups
    on an already-aggregated narrow table).  The float expression is
    IDENTICAL on both sides over exact integer counts (<=5 log terms
    per user — the nll/ndcg tolerance class)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n"].to_numpy(np.int64).astype(np.float64)
        N = c.sum()
        ent = float(np.log(N) - (c * np.log(c)).sum() / N)
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_events": [np.int64(N)],
                "entropy": [ent],
            }
        )

    return counts.groupby("user_id").map_groups(fold, batch_format="pandas")


def source_unigram_kl(sf_dir: str) -> pd.DataFrame:
    """KL divergence of each source's unigram distribution from the
    whole-corpus distribution (nats) -> (source, n_tokens, kl): the
    standard domain-shift / mixture diagnostic in corpus curation
    (which slice of the mix is most unlike the blend).

    Scale shape: (source, token) counts are combiner-first; the fold
    table is |sources| x |vocab| (vocabulary-bounded, the repo-wide
    bounded-driver contract shared with word_count_global); KL terms
    are the IDENTICAL float expression over exact integer counts on
    both sides, summed per source."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        src_out, tok_out = [], []
        for s, x in zip(df["source"], df["text"]):
            toks = ws_tokens(x or "")
            src_out.extend([s] * len(toks))
            tok_out.extend(toks)
        g = (
            pd.DataFrame({"source": src_out, "token": tok_out})
            .groupby(["source", "token"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |sources| x |vocab| — bounded by design
    )
    if counts.empty:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=str),
                "n_tokens": pd.Series([], dtype=np.int64),
                "kl": pd.Series([], dtype=np.float64),
            }
        )
    ns = counts.groupby("source")["n"].sum()
    nt = counts.groupby("token")["n"].sum()
    nn = float(counts["n"].sum())
    rows = []
    for s, grp in counts.groupby("source"):
        p = grp["n"].to_numpy(np.float64) / float(ns[s])
        q = nt[grp["token"]].to_numpy(np.float64) / nn
        rows.append(
            {
                "source": s,
                "n_tokens": np.int64(ns[s]),
                "kl": float((p * np.log(p / q)).sum()),
            }
        )
    return pd.DataFrame(rows).sort_values("source").reset_index(drop=True)


def phrase_search(sf_dir: str) -> rd.Dataset:
    """Positional PHRASE search ('hash join' as adjacent whitespace
    tokens) -> (doc_id, n_hits) for docs containing the phrase — the
    exact-match retrieval primitive the boolean AND search
    (doc_search_and) cannot express (AND ignores adjacency).

    Scale shape: embarrassingly parallel — each batch tokenizes its
    docs and counts adjacent (t[i], t[i+1]) = ('hash', 'join') pairs
    vectorized (one shifted numpy equality per doc); no shuffle, no
    index build.  Overlapping occurrences count individually, same as
    the ordinality self-join in the twin."""
    P1, P2 = "hash", "join"
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def hits(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_id, out_n = [], []
        for i, x in zip(ids, t["text"].to_pylist()):
            toks = np.array(ws_tokens(x or ""), dtype=object)
            if len(toks) < 2:
                continue
            n = int(((toks[:-1] == P1) & (toks[1:] == P2)).sum())
            if n > 0:
                out_id.append(i)
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hits": pa.array(out_n, pa.int64()),
            }
        )

    return docs.map_batches(hits, batch_format="pyarrow")


def events_value_winsorized(sf_dir: str) -> pd.DataFrame:
    """Winsorized per-type spend (values clamped to the [p05, p95]
    DISCRETE quantiles before summing) -> (event_type, n, win_cents):
    the outlier-robust revenue total.  Quantile bounds are order
    statistics over integer cents (quantile_disc's floor(q*(n-1))
    index rule, pinned by the events_p50_disc oracle) — actual data
    values, so the clamp is bit-exact on both sides; no interpolation
    enters the hash.

    Scale shape: the bounds pass is one map_groups per event type
    (low-cardinality keys only — same contract as events_p50_disc);
    the 10-number bound table broadcasts in a closure and the clamp +
    sum streams combiner-first."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["value"]), batch_format="pandas"
    ).materialize()  # two consumers: bounds pass + clamp pass

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.sort(np.floor(df["value"].to_numpy() * 100.0).astype(np.int64))
        n = len(cents)
        # quantile_disc's index rule is ceil(q*n)-1 (the smallest i
        # with (i+1)/n >= q) — measured against DuckDB per quantile;
        # floor(q*(n-1)) coincides only at q=0.5
        lo = cents[max(int(np.ceil(0.05 * n)) - 1, 0)]
        hi = cents[max(int(np.ceil(0.95 * n)) - 1, 0)]
        return pd.DataFrame(
            {"event_type": [df["event_type"].iloc[0]], "lo": [lo], "hi": [hi]}
        )

    b = (
        clean.groupby("event_type")
        .map_groups(bounds, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=str),
            "n": pd.Series([], dtype=np.int64),
            "win_cents": pd.Series([], dtype=np.int64),
        }
    )
    if b.empty:
        return empty
    lo_of = dict(zip(b["event_type"], b["lo"].astype(np.int64)))
    hi_of = dict(zip(b["event_type"], b["hi"].astype(np.int64)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        lo = df["event_type"].map(lo_of).to_numpy(np.int64)
        hi = df["event_type"].map(hi_of).to_numpy(np.int64)
        w = np.minimum(np.maximum(cents, lo), hi)
        g = (
            pd.DataFrame({"event_type": df["event_type"], "w": w})
            .groupby("event_type", sort=False)
            .agg(win_cents=("w", "sum"), n=("w", "size"))
            .reset_index()
        )
        return g

    agg = (
        clean.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("win_cents", alias_name="win_cents"), Sum("n", alias_name="n")
        )
        .to_pandas()
    )
    agg["n"] = agg["n"].astype(np.int64)
    agg["win_cents"] = agg["win_cents"].astype(np.int64)
    return (
        agg[["event_type", "n", "win_cents"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def export_arrow_ipc_roundtrip(sf_dir: str) -> rd.Dataset:
    """Arrow IPC (Feather-v2 stream) sink + source round trip ->
    (doc_id, fingerprint): write the documents table as
    content-addressed ``.arrows`` shards (sources/ipc.py — the
    zero-parse interchange format between Arrow-native engines), read
    the shards back, and fingerprint the text that survived.  The
    DuckDB twin fingerprints the ORIGINAL table, so a hash match
    proves byte-exact round trip with no text-encoding layer at all —
    the IPC member of the sink/source matrix (parquet / hive / CSV /
    JSONL / jsonl.gz / tar / IPC)."""
    import hashlib
    import os
    import shutil

    from .sources import ipc

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_ipc_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    manifest = ipc.write_ipc_shards(docs, out_dir, key_col="doc_id")
    assert manifest.count() >= 1
    back = ipc.read_ipc_shards(out_dir)

    fp = _fp_roundtrip

    return back.map_batches(fp, batch_format="pyarrow")


def vocab_coverage_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve -> (rank, token, n, cum_n): corpus
    token counts in (count DESC, token) order with the running
    cumulative count — the read-off for "how big a vocab covers X% of
    tokens" that sizes every tokenizer.  All-integer output
    (hash-exact).

    Scale shape: counts are combiner-first (word_count_global's
    contract); the curve itself is a vocabulary-bounded driver
    cumsum."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = []
        for x in df["text"]:
            toks.extend(ws_tokens(x or ""))
        return (
            pd.DataFrame({"token": toks})
            .groupby("token", sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-bounded
    )
    if counts.empty:
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "token": pd.Series([], dtype=str),
                "n": pd.Series([], dtype=np.int64),
                "cum_n": pd.Series([], dtype=np.int64),
            }
        )
    counts = counts.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    counts["rank"] = np.arange(1, len(counts) + 1, dtype=np.int64)
    counts["n"] = counts["n"].astype(np.int64)
    counts["cum_n"] = counts["n"].cumsum().astype(np.int64)
    return counts[["rank", "token", "n", "cum_n"]]


def events_type_day_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-square test of independence between event_type and
    day-of-week -> one row (n, dof, chi2): is behaviour uniform across
    the week, the first screen on any activity table.  The FULL R x C
    grid enters the statistic (a zero observed cell still contributes
    its expected count), chi2 is rounded to 6 dp on BOTH sides (a
    35-term float sum is the nll tolerance class; the explicit round
    keeps the hash deterministic).

    Scale shape: (type, dow) counts are combiner-first; the statistic
    folds over an R x C driver grid (5 x 7 — category-bounded)."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["ts"])
        dow = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy()
        # pandas Monday=0 -> SQL dayofweek Sunday=0
        dow_sql = (dow + 1) % 7
        return (
            pd.DataFrame({"event_type": df["event_type"], "dow": dow_sql})
            .groupby(["event_type", "dow"], sort=False)
            .size()
            .reset_index(name="n")
        )

    c = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # R x C grid — category-bounded
    )
    if c.empty:
        return pd.DataFrame({"n": [np.int64(0)], "dof": [np.int64(0)], "chi2": [0.0]})
    grid = c.pivot_table(
        index="event_type", columns="dow", values="n", fill_value=0, aggfunc="sum"
    ).to_numpy(np.float64)
    # full grid over OBSERVED category levels (a level absent from the
    # whole table has expected 0 everywhere and drops from dof, same
    # as the twin's cross join over observed levels)
    n = grid.sum()
    e = grid.sum(axis=1, keepdims=True) * grid.sum(axis=0, keepdims=True) / n
    chi2 = float(((grid - e) ** 2 / e).sum())
    dof = (grid.shape[0] - 1) * (grid.shape[1] - 1)
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "dof": [np.int64(dof)],
            "chi2": [round(chi2, 6)],
        }
    )


def copurchase_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the co-purchase graph (Newman's r: the
    Pearson correlation of endpoint degrees over the edge list, both
    orientations) -> one row (n_edges, assortativity): do popular
    parts co-sell with popular parts, the standard mixing diagnostic.

    Scale shape: the edge list is pinned once (two consumers: the
    degree count and the moment pass); degrees attach through two
    hash-partitioned joins (never a driver degree map — nodes are
    sf-scaled); the statistic folds from per-batch 4-sum integer
    moment partials (sx, sxx, sxy, m — exact, the events_value_corr
    sketch family; symmetric orientation makes sy=sx, syy=sxx) and the
    final ratio of exact int64s is bit-identical on both sides.  At
    100 TB the moment products approach int64 range — split into
    hi/lo lanes or re-center degrees, the sketch stays mergeable."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = (
        graph.copurchase_edges(li)
        .select_columns(["part_a", "part_b"])
        .repartition(8)
        .materialize()
    )
    deg = grouped_count(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t["part_a"].combine_chunks(),
                            t["part_b"].combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        "deg",
    ).repartition(8)
    j1 = joins.hash_join(
        edges,
        deg.map_batches(
            lambda t: pa.table({"part_a": t["node"], "da": t["deg"]}),
            batch_format="pyarrow",
        ),
        on="part_a",
        num_partitions=8,
    ).repartition(8)
    j2 = joins.hash_join(
        j1,
        deg.map_batches(
            lambda t: pa.table({"part_b": t["node"], "db": t["deg"]}),
            batch_format="pyarrow",
        ),
        on="part_b",
        num_partitions=8,
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        da = t["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["db"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m": pa.array([2 * len(da)], pa.int64()),
                "sx": pa.array([int((da + db).sum())], pa.int64()),
                "sxx": pa.array([int((da * da + db * db).sum())], pa.int64()),
                "sxy": pa.array([int((2 * da * db).sum())], pa.int64()),
            }
        )

    f = j2.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = int(f["m"].sum())
    sx, sxx, sxy = (int(f[c].sum()) for c in ("sx", "sxx", "sxy"))
    den = m * sxx - sx * sx
    r = None if den == 0 else float(m * sxy - sx * sx) / float(den)
    return pd.DataFrame(
        {"n_edges": [np.int64(m // 2)], "assortativity": [r]}
    )


def customer_balance_gini(sf_dir: str) -> rd.Dataset:
    """Gini coefficient of positive customer balances per nation ->
    (n_name, n_custs, gini): the inequality statistic via the exact
    rank-sum identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over ascending integer cents — all terms exact int64 (tie order
    cannot change the sum: tied x contribute identical products), so
    the final ratio is bit-identical to the twin's.

    Scale shape: one map_groups per nation (low-cardinality keys only
    — the events_p50_disc contract: each task holds one nation's
    balances); names attach from the 25-row driver dict."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_acctbal"],
        filter=(pc.field("c_acctbal") > 0.0),
    )
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.sort(
            np.floor(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        )
        n = len(cents)
        sx = int(cents.sum())
        six = int((np.arange(1, n + 1, dtype=np.int64) * cents).sum())
        gini = float(2 * six - (n + 1) * sx) / float(n * sx)
        return pd.DataFrame(
            {
                "n_name": [name_of[int(df["c_nationkey"].iloc[0])]],
                "n_custs": [np.int64(n)],
                "gini": [gini],
            }
        )

    return cust.groupby("c_nationkey").map_groups(
        per_nation, batch_format="pandas"
    )


def orders_top_prices_with_ties(sf_dir: str) -> pd.DataFrame:
    """Top orders by RANK() <= 10 — WITH ties (every order whose price
    has fewer than 10 strictly-greater rows qualifies, so the result
    can exceed 10 rows) -> (o_orderkey, o_totalprice, rnk): the
    tie-honest leaderboard row_number()-based top-k cannot express.

    Scale shape: rank WITHOUT ranking — per-block top-10 partials fold
    to the boundary value (the 10th-highest price including
    duplicates) on the driver; qualifying rows then come from a
    predicate-pushdown re-read (price >= boundary), and ranks are
    assigned on the survivor set (<= 10 + ties, human-sized).  No
    global sort of the table anywhere."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def local_top(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        v = np.sort(v[~np.isnan(v)])[::-1][:10]
        return pa.table({"o_totalprice": pa.array(v, pa.float64())})

    cand = (
        orders.map_batches(local_top, batch_format="pyarrow")
        .to_pandas()["o_totalprice"]
        .sort_values(ascending=False)
        .head(10)
    )
    if cand.empty:
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_totalprice": pd.Series([], dtype=np.float64),
                "rnk": pd.Series([], dtype=np.int64),
            }
        )
    boundary = float(cand.iloc[-1])
    surv = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") >= boundary),
    ).to_pandas()
    surv = surv.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    p = surv["o_totalprice"].to_numpy()
    # rank = #strictly greater + 1 (vectorized over the survivor set)
    surv["rnk"] = np.array(
        [int((p > x).sum()) + 1 for x in p], dtype=np.int64
    )
    surv = surv[surv["rnk"] <= 10]
    return surv[["o_orderkey", "o_totalprice", "rnk"]].reset_index(drop=True)


def minhash_recall_report(sf_dir: str) -> pa.Table:
    """Near-dedup quality EVALUATION -> one row (n_exact, n_lsh, n_hit,
    recall_pct, precision_pct): the LSH-pruned verified pair set
    (ngram_jaccard_pairs) measured against the EXACT all-pairs 3-gram
    Jaccard >= 0.3 ground truth (ngram_jaccard_exact) — the
    measure-don't-guess harness for the dedup family, the sibling of
    ann_recall_report for vector search.  Precision is the sanity rail
    (the LSH path verifies TRUE Jaccard on every candidate, so any
    value under 100 means the verify join broke); recall quantifies
    what the banding misses.  Rows-only (MinHash is not
    SQL-expressible); the planted-dup pytest pins recall == 100 on a
    corpus whose duplicates are known.

    Scale shape: both inputs are the existing distributed pipelines'
    outputs — near-dup PAIR sets (dup-bounded, not corpus-bounded) —
    compared on the driver."""
    def pair_set(df: pd.DataFrame) -> set:
        # an empty distributed result can drop its columns entirely
        if df.empty or "id_a" not in df.columns:
            return set()
        return set(zip(df["id_a"], df["id_b"]))

    w = pair_set(ngram_jaccard_exact(sf_dir).to_pandas())
    g = pair_set(ngram_jaccard_pairs(sf_dir).to_pandas())
    hit = len(w & g)
    recall = 100 if not w else int(np.floor(100.0 * hit / len(w)))
    precision = 100 if not g else int(np.floor(100.0 * hit / len(g)))
    return pa.table(
        {
            "n_exact": pa.array([len(w)], pa.int64()),
            "n_lsh": pa.array([len(g)], pa.int64()),
            "n_hit": pa.array([hit], pa.int64()),
            "recall_pct": pa.array([recall], pa.int64()),
            "precision_pct": pa.array([precision], pa.int64()),
        }
    )


def chunk_dedup_reassembly(sf_dir: str) -> rd.Dataset:
    """Sub-document dedup (C4/RefinedWeb-style): explode docs into
    NON-overlapping 32-token chunks, keep each distinct chunk's single
    globally-first occurrence (earliest (doc_id, chunk_id)), and
    reassemble every doc from its surviving chunks -> (doc_id,
    n_chunks, n_kept, text_dedup).  Catches repeated boilerplate that
    document-level dedup can't touch (shared footers, quoted blocks).

    Scale shape: the chunk explode is row-parallel (doc_chunks'
    vectorized kernel, stride == size); ownership is combiner-first
    (per-batch min-pack partials per fingerprint, one grouped Min —
    chunk bodies never enter the ownership shuffle, only (fp, pack));
    the keep flag attaches via a hash-partitioned join on fp; docs
    reassemble with one groupby(doc_id).  The pack key is
    ``doc_id * 100000 + chunk_id`` (documented bound: <100k chunks
    per doc — 3.2M tokens; wider docs need a struct Min).
    Zero-token docs emit no row (no chunks — the twin's semantics)."""
    from .hashing import md5_hex as _md5

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = docs.map_batches(
        lambda t: text.chunk_batch(t, size=32, stride=32),
        batch_format="pyarrow",
    ).materialize()  # two consumers: ownership pass + reassembly join

    def fp_pack(t: pa.Table) -> pa.Table:
        fps = [_md5(x) for x in t["chunk_text"].to_pylist()]
        pack = pc.add(
            pc.multiply(pc.cast(t["doc_id"], pa.int64()), pa.scalar(100000)),
            pc.cast(t["chunk_id"], pa.int64()),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "chunk_id": pc.cast(t["chunk_id"], pa.int64()),
                "chunk_text": t["chunk_text"],
                "fp": pa.array(fps, pa.string()),
                "pack": pack,
            }
        )

    tagged = chunks.map_batches(fp_pack, batch_format="pyarrow").materialize()
    if tagged.count() == 0:  # empty corpus: schema-less blocks break joins
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chunks": pa.array([], pa.int64()),
                    "n_kept": pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                }
            )
        )

    def own_partial(t: pa.Table) -> pa.Table:
        g = t.select(["fp", "pack"]).group_by("fp").aggregate([("pack", "min")])
        return g.rename_columns(["fp", "mp"])

    owners = (
        tagged.map_batches(own_partial, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("mp", alias_name="mp"))
        .repartition(8)
    )
    j = joins.hash_join(tagged, owners, on="fp", num_partitions=8).repartition(8)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("chunk_id", kind="mergesort")
        kept = df["pack"].to_numpy() == df["mp"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": [np.int64(df["doc_id"].iloc[0])],
                "n_chunks": [np.int64(len(df))],
                "n_kept": [np.int64(int(kept.sum()))],
                "text_dedup": [" ".join(df["chunk_text"].to_numpy()[kept])],
            }
        )

    return j.groupby("doc_id").map_groups(reassemble, batch_format="pandas")


def user_value_twap(sf_dir: str) -> rd.Dataset:
    """Time-weighted value exposure per user (TWAP numerator /
    denominator) -> (user_id, n_events, num_cents_us, den_us): each
    event's value (integer cents) held until the user's NEXT event
    (SQL ``lead``), i.e. sum(cents_i * gap_us_i) and sum(gap_us_i)
    over all non-terminal events — the exact-integer decomposition of
    the time-weighted average (the repo parity rule: no division
    before the hash; num/den is the TWAP).  Users with one event (no
    gaps) drop on both sides.

    Scale shape: one shuffle on user_id, vectorized shift within the
    group (ops/analytic.ordered_apply).  int64 bounds: cents (~1e4) x
    gap_us (~1e10) x rows/user — documented safe to ~1e4 events/user
    at day-scale gaps; re-center to ms at 100 TB."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    clean = ev.map_batches(
        lambda df: df.dropna(subset=["ts", "value"]), batch_format="pandas"
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=df["user_id"].dtype),
                    "n_events": pd.Series([], dtype=np.int64),
                    "num_cents_us": pd.Series([], dtype=np.int64),
                    "den_us": pd.Series([], dtype=np.int64),
                }
            )
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        gap = ts_us[1:] - ts_us[:-1]
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_events": [np.int64(len(df))],
                "num_cents_us": [np.int64((cents[:-1] * gap).sum())],
                "den_us": [np.int64(gap.sum())],
            }
        )

    return analytic.ordered_apply(clean, "user_id", ["ts", "event_id"], per_key)


def events_hourly_profile(sf_dir: str) -> rd.Dataset:
    """Activity profile by hour of day -> (event_type, hour, n): the
    telemetry heatmap input (when does each behaviour happen).
    All-integer output; combiner-first counts; one narrow shuffle of
    |types| x 24 rows per block."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        hr = pc.cast(pc.hour(t["ts"]), pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "hour": hr})
            .group_by(["event_type", "hour"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )


def doc_ngram_novelty(sf_dir: str) -> rd.Dataset:
    """Per-doc 3-gram NOVELTY against all earlier docs (doc_id order)
    -> (doc_id, n_shingles, n_novel): how much genuinely new content
    each document adds — the curation signal behind dataset-growth
    curves (novelty collapsing to ~0 means the crawl is saturated).
    A doc's distinct word-3-grams are novel iff no smaller-doc_id doc
    contains them; each shingle's owner is its global min doc_id.

    Scale shape: the same combiner-first Min-ownership pattern as
    chunk_dedup_reassembly at shingle granularity — per-batch
    (shingle, min doc_id) partials, one grouped Min, then a
    hash-partitioned join back to the per-doc shingle table; bodies
    never shuffle, only (hash, id) pairs.  Shingles ship as int64
    fingerprints (fingerprint64), not strings."""
    from .hashing import fingerprint64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        out_id, out_fp = [], []
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = ws_tokens(x or "")
            fps = {
                fingerprint64(" ".join(toks[j : j + 3]))
                for j in range(len(toks) - 2)
            }
            out_id.extend([i] * len(fps))
            out_fp.extend(fps)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "fp": pa.array(out_fp, pa.int64()),
            }
        )

    sh = docs.map_batches(shingles, batch_format="pyarrow").materialize()
    if sh.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                }
            )
        )

    def own_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("fp").aggregate([("doc_id", "min")])
        return g.rename_columns(["fp", "owner"])

    owners = (
        sh.map_batches(own_partial, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("owner", alias_name="owner"))
        .repartition(8)
    )
    j = joins.hash_join(sh, owners, on="fp", num_partitions=8).repartition(8)

    def per_doc(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "doc_id": t["doc_id"],
                    "one": pa.array(np.ones(len(t), np.int64), pa.int64()),
                    "novel": pc.cast(
                        pc.equal(t["owner"], t["doc_id"]), pa.int64()
                    ),
                }
            )
            .group_by("doc_id")
            .aggregate([("one", "sum"), ("novel", "sum")])
        )
        return g.rename_columns(["doc_id", "n_shingles", "n_novel"])

    return (
        j.map_batches(per_doc, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_shingles", alias_name="n_shingles"),
            Sum("n_novel", alias_name="n_novel"),
        )
    )


# ------------------------------------------------- TPC-H shape batch 3
# (round 4: q4/q8/q11/q12/q13/q15/q16/q20/q21 shapes.  As with batch 2,
# every adaptation away from the canonical spec — this corpus has no
# partsupp / l_commitdate / l_receiptdate / l_shipmode — is stated in
# the docstring and mirrored verbatim in the SQL twin.  "Late" is
# always defined as l_shipdate more than K days after o_orderdate.)


_US_PER_DAY = 86_400_000_000  # timestamp[us] day quantum


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (no l_commitdate/l_receiptdate: "late" is a
    lineitem shipped >60 days after the order date): orders placed in
    1997Q3 with at least one late lineitem, counted per priority ->
    (o_orderpriority, order_count).

    Scale shape: the quarter filter is pushed into the orders read
    (the join's build side shrinks ~20x before any shuffle); lineitem
    streams through ONE hash-partitioned join carrying only (orderkey,
    shipdate); the EXISTS collapses combiner-first to distinct
    (orderkey, priority) rows — the final shuffle moves one narrow row
    per qualifying order, never per lineitem."""
    from datetime import datetime

    lo, hi = datetime(1997, 7, 1), datetime(1997, 10, 1)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    empty = pd.DataFrame(
        {
            "o_orderpriority": pd.Series([], dtype=str),
            "order_count": pd.Series([], dtype=np.int64),
        }
    )
    if orders.limit(1).count() == 0:
        return empty
    li = _lineitem(sf_dir, ["l_orderkey", "l_shipdate"])
    j = joins.hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    ).repartition(8)

    def late_distinct(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        odate = pc.cast(t["o_orderdate"], pa.int64())
        late = pc.greater(
            pc.subtract(ship, odate), pa.scalar(60 * _US_PER_DAY, pa.int64())
        )
        t = t.filter(late)
        # per-batch EXISTS combiner: one row per (order, priority)
        return (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "o_orderpriority": t["o_orderpriority"],
                }
            )
            .group_by(["l_orderkey", "o_orderpriority"])
            .aggregate([])
        )

    cand = j.map_batches(late_distinct, batch_format="pyarrow")
    dedup = (
        cand.groupby("l_orderkey")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    )
    agg = grouped_count(dedup, ["o_orderpriority"], "order_count").to_pandas()
    if agg.empty:
        return empty
    agg["order_count"] = agg["order_count"].astype(np.int64)
    return (
        agg[["o_orderpriority", "order_count"]]
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: among PROMO-type parts ordered by AMERICA-region
    customers in 1996-1997, NATION_1-supplied revenue vs total revenue
    by order year -> (o_year, nation_revenue, total_revenue).  (The
    canonical mkt_share ratio is not emitted — the repo convention is
    sum+sum, never a rounded quotient, for bit-exact oracle hashes.)

    Scale shape: the part filter is a pushed parquet predicate and
    collapses to a broadcastable key set ONLY implicitly — parts flow
    through a hash join (part is sf-scaled); lineitem pre-aggregates to
    (orderkey, year-invariant cents, nation-flagged cents) partials
    before the orders join; customer region membership resolves via the
    25-row driver nation dict, never a shuffle."""
    from datetime import datetime

    empty = pd.DataFrame(
        {
            "o_year": pd.Series([], dtype=np.int64),
            "nation_revenue": pd.Series([], dtype=np.float64),
            "total_revenue": pd.Series([], dtype=np.float64),
        }
    )
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    # empty dimension reads drop columns entirely (pandas of an empty
    # Dataset) — an empty region/nation means an empty share report
    if region.empty or nation.empty:
        return empty
    amer_rows = region.loc[region["r_name"] == "AMERICA", "r_regionkey"]
    tgt_rows = nation.loc[nation["n_name"] == "NATION_1", "n_nationkey"]
    if amer_rows.empty or tgt_rows.empty:
        return empty
    amer_key = int(amer_rows.iloc[0])
    amer_nations = sorted(
        int(k)
        for k, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
        if int(rk) == amer_key
    )
    target_key = int(tgt_rows.iloc[0])

    pkeys = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filter=(pc.field("p_type") == "PROMO"),
    )
    if pkeys.limit(1).count() == 0:
        return empty

    li = _lineitem(
        sf_dir, ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    lp = joins.hash_join(
        li, pkeys, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    ls = joins.hash_join(
        lp, supp, on="l_suppkey", right_on="s_suppkey", num_partitions=8
    ).repartition(8)

    def pre_agg(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        is_t = pc.equal(t["s_nationkey"], pa.scalar(target_key))
        nc = pc.if_else(is_t, c, pa.scalar(0, pa.int64()))
        g = (
            pa.table({"l_orderkey": t["l_orderkey"], "tc": c, "nc": nc})
            .group_by("l_orderkey")
            .aggregate([("tc", "sum"), ("nc", "sum")])
        )
        return g.rename_columns(["l_orderkey", "tot_cents", "nat_cents"])

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    if orders.limit(1).count() == 0:
        return empty
    lo_j = joins.hash_join(
        ls.map_batches(pre_agg, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    ).repartition(8)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=(pc.field("c_nationkey").isin(amer_nations)),
    )
    if cust.limit(1).count() == 0:
        return empty
    lc = joins.hash_join(
        lo_j, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
    ).repartition(8)

    def year_partial(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        g = (
            pa.table({"o_year": yr, "tc": t["tot_cents"], "nc": t["nat_cents"]})
            .group_by("o_year")
            .aggregate([("tc", "sum"), ("nc", "sum")])
        )
        return g.rename_columns(["o_year", "tot_cents", "nat_cents"])

    agg = (
        lc.map_batches(year_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("tot_cents", alias_name="tot_cents"),
            Sum("nat_cents", alias_name="nat_cents"),
        )
        .to_pandas()
    )
    if agg.empty:
        return empty
    agg["nation_revenue"] = [round(int(c) / 100.0, 2) for c in agg["nat_cents"]]
    agg["total_revenue"] = [round(int(c) / 100.0, 2) for c in agg["tot_cents"]]
    agg["o_year"] = agg["o_year"].astype(np.int64)
    return (
        agg[["o_year", "nation_revenue", "total_revenue"]]
        .sort_values("o_year")
        .reset_index(drop=True)
    )


def q11_important_brands(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape (no partsupp: "inventory value" is
    floor(p_retailprice*100)*p_size integer cents): brands whose summed
    value exceeds 1/25 of the global total -> (p_brand, value).

    Scale shape: the two-pass global-threshold idiom — pass 1 folds
    per-batch (brand, cents) partials to a 25-row grouped sum; the
    global total is then a driver-side integer, and the HAVING filter is
    the exact integer cross-multiplication ``25*brand > total`` (never
    a float fraction).  One narrow shuffle total."""
    part = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.multiply(
            pc.cast(
                pc.floor(pc.multiply(t["p_retailprice"], pa.scalar(100.0))),
                pa.int64(),
            ),
            pc.cast(t["p_size"], pa.int64()),
        )
        g = (
            pa.table({"p_brand": t["p_brand"], "c": cents})
            .group_by("p_brand")
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["p_brand", "cents"])

    agg = (
        part.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame(
            {
                "p_brand": pd.Series([], dtype=str),
                "value": pd.Series([], dtype=np.float64),
            }
        )
    total = int(agg["cents"].sum())
    keep = agg[25 * agg["cents"].astype(np.int64) > total].copy()
    keep["value"] = [round(int(c) / 100.0, 2) for c in keep["cents"]]
    return keep[["p_brand", "value"]].sort_values("p_brand").reset_index(drop=True)


def q12_late_shipment_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (no l_shipmode/l_receiptdate: groups by
    l_linestatus, "late" = shipped >90 days after order date, 1997 ship
    year): per linestatus, late-line counts split by order priority ->
    (l_linestatus, high_line_count, low_line_count).

    Scale shape: the ship-year filter is pushed into the lineitem read;
    the join carries three narrow columns; the CASE aggregation is a
    per-batch (status, high, low) partial so the final shuffle moves
    ~3 rows per block."""
    from datetime import datetime

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_linestatus"],
        filter=(
            (pc.field("l_shipdate") >= datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime(1998, 1, 1))
        ),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    empty = pd.DataFrame(
        {
            "l_linestatus": pd.Series([], dtype=str),
            "high_line_count": pd.Series([], dtype=np.int64),
            "low_line_count": pd.Series([], dtype=np.int64),
        }
    )
    if li.limit(1).count() == 0:
        return empty
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = joins.hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        odate = pc.cast(t["o_orderdate"], pa.int64())
        late = pc.greater(
            pc.subtract(ship, odate), pa.scalar(90 * _US_PER_DAY, pa.int64())
        )
        t = t.filter(late)
        pri = t["o_orderpriority"]
        high = pc.or_(
            pc.equal(pri, pa.scalar("1-URGENT")), pc.equal(pri, pa.scalar("2-HIGH"))
        )
        hi = pc.cast(high, pa.int64())
        lo = pc.cast(pc.invert(high), pa.int64())
        g = (
            pa.table({"l_linestatus": t["l_linestatus"], "h": hi, "l": lo})
            .group_by("l_linestatus")
            .aggregate([("h", "sum"), ("l", "sum")])
        )
        return g.rename_columns(["l_linestatus", "high_line_count", "low_line_count"])

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
        .to_pandas()
    )
    if agg.empty:
        return empty
    agg["high_line_count"] = agg["high_line_count"].astype(np.int64)
    agg["low_line_count"] = agg["low_line_count"].astype(np.int64)
    return (
        agg[["l_linestatus", "high_line_count", "low_line_count"]]
        .sort_values("l_linestatus")
        .reset_index(drop=True)
    )


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of per-customer open-order counts
    (orders with status <> 'F'), INCLUDING zero-order customers ->
    (c_count, custdist).

    Scale shape: orders collapse combiner-first to (custkey, n) — the
    only sf-scaled shuffle moves one row per customer with open orders;
    the zero fill is a hash-partitioned LEFT OUTER join from the
    key-only customer read; the final distribution is a second
    combiner-first count over an integer key with ~tens of distinct
    values."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_orderstatus") != "F"),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    counts = grouped_count(orders, ["o_custkey"], "c_count")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    # Ray's hash join cannot finalize a zero-row side (tuning.py): no
    # open orders at all degenerates to one (c_count=0, |customer|) row
    if counts.limit(1).count() == 0:
        n_cust = cust.count()
        if n_cust == 0:
            return pd.DataFrame(
                {
                    "c_count": pd.Series([], dtype=np.int64),
                    "custdist": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "c_count": np.array([0], dtype=np.int64),
                "custdist": np.array([n_cust], dtype=np.int64),
            }
        )
    j = joins.hash_join(
        cust, counts, on="c_custkey", right_on="o_custkey",
        how="left_outer", num_partitions=8,
    ).repartition(8)

    def fill_partial(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(t["c_count"], pa.int64()), pa.scalar(0, pa.int64()))
        g = (
            pa.table({"c_count": n})
            .group_by("c_count")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["c_count", "custdist"])

    agg = (
        j.map_batches(fill_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()
    )
    agg["c_count"] = agg["c_count"].astype(np.int64)
    agg["custdist"] = agg["custdist"].astype(np.int64)
    return (
        agg[["c_count", "custdist"]]
        .sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum lineitem revenue
    over 1997Q1 -> (s_suppkey, s_name, total_revenue).

    Scale shape: the quarter filter is pushed into the lineitem read;
    revenue folds combiner-first to one integer-cent row per supplier;
    the global max is a distributed ``Dataset.max`` (never a driver
    sort), and only the argmax row(s) — in expectation one — leave the
    cluster to pick up names from a key-filtered supplier read."""
    from datetime import datetime

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime(1997, 4, 1))
        ),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=str),
            "total_revenue": pd.Series([], dtype=np.float64),
        }
    )
    if li.limit(1).count() == 0:
        return empty

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = (
            pa.table({"l_suppkey": t["l_suppkey"], "c": c})
            .group_by("l_suppkey")
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["l_suppkey", "cents"])

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    m = rev.max("cents")
    winners = rev.filter(expr=f"cents == {int(m)}").to_pandas()
    keys = sorted(int(k) for k in winners["l_suppkey"])
    names = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filter=(pc.field("s_suppkey").isin(keys)),
    ).to_pandas()
    out = winners.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = [round(int(c) / 100.0, 2) for c in out["cents"]]
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def q16_supplier_breadth(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (no partsupp: the part-supplier relation is the
    set of (partkey, suppkey) pairs observed in lineitem): distinct
    suppliers who shipped each non-'Brand#13' brand with size in
    {9,14,19,23,36,45,49,3} -> (p_brand, supplier_cnt).

    Scale shape: both part predicates are pushed into the parquet read;
    lineitem carries two columns through one hash join; the distinct
    (brand, suppkey) collapse is combiner-first (per-batch pa.group_by
    dedup, then one grouped first) so the count-distinct shuffle moves
    one narrow row per observed pair, never per lineitem."""
    sizes = [9, 14, 19, 23, 36, 45, 49, 3]
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        filter=(
            (pc.field("p_brand") != "Brand#13") & (pc.field("p_size").isin(sizes))
        ),
    )
    empty = pd.DataFrame(
        {
            "p_brand": pd.Series([], dtype=str),
            "supplier_cnt": pd.Series([], dtype=np.int64),
        }
    )
    if part.limit(1).count() == 0:
        return empty
    li = _lineitem(sf_dir, ["l_partkey", "l_suppkey"])
    j = joins.hash_join(
        li, part, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)

    def pair_distinct(t: pa.Table) -> pa.Table:
        return (
            t.select(["p_brand", "l_suppkey"])
            .group_by(["p_brand", "l_suppkey"])
            .aggregate([])
        )

    pairs = (
        j.map_batches(pair_distinct, batch_format="pyarrow")
        .groupby(["p_brand", "l_suppkey"])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    )
    agg = grouped_count(pairs, ["p_brand"], "supplier_cnt").to_pandas()
    if agg.empty:
        return empty
    agg["supplier_cnt"] = agg["supplier_cnt"].astype(np.int64)
    return (
        agg[["p_brand", "supplier_cnt"]].sort_values("p_brand").reset_index(drop=True)
    )


def q20_part_promotion(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape (no partsupp: "stocked enough" becomes "shipped
    more than 300 quantity units"): suppliers who shipped >300 total
    quantity of 'gear'-named parts during 1997 -> (s_suppkey, s_name).

    Scale shape: the nested semi-join chain — part collapses to its
    matching keys distributed (substring match inside map_batches),
    semi-joins into the date-pruned lineitem read, folds combiner-first
    to per-supplier integer quantity-cents, and only the above-threshold
    keys (driver-bounded by |supplier|) fetch names from a key-filtered
    read."""
    from datetime import datetime

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def keys_only(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], "gear")
        return pa.table({"p_partkey": t["p_partkey"].filter(m)})

    pkeys = part.map_batches(keys_only, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(
            (pc.field("l_shipdate") >= datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime(1998, 1, 1))
        ),
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=str),
        }
    )
    if li.limit(1).count() == 0 or pkeys.limit(1).count() == 0:
        return empty
    j = joins.hash_join(
        li, pkeys, on="l_partkey", right_on="p_partkey", num_partitions=8
    ).repartition(8)

    def qty_partial(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        g = (
            pa.table({"l_suppkey": t["l_suppkey"], "q": qc})
            .group_by("l_suppkey")
            .aggregate([("q", "sum")])
        )
        return g.rename_columns(["l_suppkey", "qty_cents"])

    per_supp = (
        j.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("qty_cents", alias_name="qty_cents"))
        .filter(expr="qty_cents > 30000")
        .to_pandas()
    )
    if per_supp.empty:
        return empty
    keys = sorted(int(k) for k in per_supp["l_suppkey"])
    names = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filter=(pc.field("s_suppkey").isin(keys)),
    ).to_pandas()
    names["s_suppkey"] = names["s_suppkey"].astype(np.int64)
    return (
        names[["s_suppkey", "s_name"]].sort_values("s_suppkey").reset_index(drop=True)
    )


def q21_waiting_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape (no l_commitdate/l_receiptdate: the "supplier
    who kept the order waiting" is the UNIQUE supplier whose lineitem
    carries the order's latest ship date, in 'F'-status orders with at
    least two distinct suppliers): top-10 such suppliers by wait count
    -> (s_suppkey, s_name, numwait).

    Scale shape: lineitem semi-joins to the status-pruned orders keys,
    pre-aggregates combiner-first to one (orderkey, suppkey, max ship)
    row per pair, and the per-order EXISTS / NOT-EXISTS pair resolves
    inside ONE groupby(orderkey).map_groups with numpy (per-group state
    is the order's supplier list — bounded by order width, never corpus
    size); wait counts fold combiner-first and only the top-10 rows
    fetch names."""
    okeys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=(pc.field("o_orderstatus") == "F"),
    )
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=str),
            "numwait": pd.Series([], dtype=np.int64),
        }
    )
    if okeys.limit(1).count() == 0:
        return empty
    li = _lineitem(sf_dir, ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = joins.hash_join(
        li, okeys, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    ).repartition(8)

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("ship_us", "max")])
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "smax"])

    from ray.data.aggregate import Max

    pairs = (
        j.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("smax", alias_name="smax"))
    )

    def waiting(t: pa.Table) -> pa.Table:
        # one order per group: >=2 distinct suppliers AND exactly one
        # supplier at the order max ship date -> that supplier waited
        if t.num_rows < 2:
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        smax = t["smax"].to_numpy(zero_copy_only=False)
        at_max = smax == smax.max()
        if int(at_max.sum()) != 1:
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_suppkey": pa.array([int(supp[at_max.argmax()])], pa.int64())}
        )

    waits = pairs.groupby("l_orderkey").map_groups(waiting, batch_format="pyarrow")
    agg = grouped_count(waits, ["l_suppkey"], "numwait").to_pandas()
    if agg.empty:
        return empty
    agg = agg.sort_values(
        ["numwait", "l_suppkey"], ascending=[False, True]
    ).head(10)
    keys = sorted(int(k) for k in agg["l_suppkey"])
    names = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filter=(pc.field("s_suppkey").isin(keys)),
    ).to_pandas()
    out = agg.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["numwait"] = out["numwait"].astype(np.int64)
    return (
        out[["s_suppkey", "s_name", "numwait"]]
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


# ------------------------------------------- round-4 final-session ops
# (running count-distinct, dyadic EWMA, gap profile, mutual-kNN graph)


def user_running_distinct_types(sf_dir: str) -> rd.Dataset:
    """Running COUNT-DISTINCT window -> (user_id, event_id, n_seen):
    per user in (ts, event_id) order, how many distinct event types the
    user has produced up to and including each event.  SQL has no
    ``count(distinct) OVER``; the oracle uses the standard
    first-occurrence-flag + running-sum rewrite, which is exactly the
    numpy kernel (ops/analytic.running_distinct).  One shuffle on
    user_id."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return analytic.running_distinct(ev, "user_id", "ts", "event_id", "event_type")


def events_value_ewma(sf_dir: str) -> rd.Dataset:
    """Dyadic-weight EWMA trendline -> (user_id, event_id, ewma):
    sum_{k=0..7} cents[t-k] * 2^-(k+1) per user in (ts, event_id)
    order.  Powers-of-two weights over integer cents make every term
    and partial sum exactly representable, so the value hash matches
    the SQL twin bit-for-bit (ops/analytic.ewma_pow2 docstring).  One
    shuffle on user_id."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return analytic.ewma_pow2(ev, "user_id", "ts", "event_id", "value", n_terms=8)


def user_gap_profile(sf_dir: str) -> rd.Dataset:
    """Inter-arrival gap profile -> one row per user: (user_id, n_gaps,
    min_gap_us, max_gap_us, sum_gap_us), exact int64 microseconds;
    single-event users report (0, -1, -1, 0).  The burst/lull shape
    feeds session-timeout tuning (the gap histogram picks the session
    gap threshold).  One shuffle on user_id."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return analytic.gap_stats(ev, "user_id", "ts", "event_id")


def knn_graph_mutual(sf_dir: str) -> rd.Dataset:
    """Mutual cosine 3-NN graph over the embeddings table ->
    (vec_a, vec_b) undirected edges where each endpoint is in the
    other's top-3 (ops/ann.knn_graph_mutual: chunk-pair distributed
    all-pairs top-k + reciprocity filter — the standard graph
    sparsifier before community/dedup passes)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.knn_graph_mutual(emb, k=3)


def copurchase_pagerank(sf_dir: str) -> rd.Dataset:
    """EXACT-INTEGER PageRank over the support>=2 co-purchase graph ->
    (node, rank_units): int64 micro-unit ranks (unit = 1e9), 4
    bulk-synchronous iterations (ops/graph.pagerank_int).  All-integer
    floor arithmetic makes the trajectory bit-exact under any
    partitioning, so the DuckDB twin (one unrolled CTE per iteration)
    value-hash-matches — the first ORACLE-checked exposure of the
    iterative-join PageRank machinery (the float variant keeps its
    numpy power-iteration parity test).

    Scale shape: adjacency+degree materialized once; each iteration
    re-shuffles only the narrow (node, pr) vector through one hash
    join and one combiner-first grouped sum."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li, min_count=2)
    return graph.pagerank_int(graph.symmetrize_edges(edges), iters=4)


def copurchase_shortest_paths(sf_dir: str) -> rd.Dataset:
    """Bounded-depth single-source shortest paths (6 Bellman-Ford
    relaxation rounds, ops/graph.bellman_ford_int) from the smallest
    part id in the support>=2 co-purchase graph -> (node, dist).
    Edge weight = 1000 // co_count + 1 (cheaper between frequently
    co-purchased parts) — integer weights, integer min-plus folds, so
    the result is bit-exact and the SQL twin unrolls the same 6
    rounds.  Extends copurchase_bfs_hops (unweighted reachability) to
    the WEIGHTED shortest-path shape.

    Scale shape: the frontier/dist vector is the only per-round
    shuffle (one hash join + one grouped min); adjacency materialized
    once; per-round driver traffic is zero."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li, min_count=2).map_batches(
        lambda t: pa.table(
            {
                "part_a": t["part_a"],
                "part_b": t["part_b"],
                "w": pc.add(
                    pc.divide(
                        pa.scalar(1000, pa.int64()),
                        pc.cast(t["co_count"], pa.int64()),
                    ),
                    pa.scalar(1, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    # the single source: smallest node id in the edge set (part_a holds
    # the smaller endpoint of every canonical edge) — one driver scalar
    src = edges.aggregate(Min("part_a"))["min(part_a)"]
    if src is None:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
            )
        )
    sym = graph.symmetrize_edges(edges, weight_col="w")
    return graph.bellman_ford_int(sym, source=int(src), iters=6)


def copurchase_kcore(sf_dir: str) -> "rd.Dataset | pa.Table":
    """3-core of the support>=2 co-purchase graph (iterative peeling
    to fixpoint, ops/graph.kcore) -> (node, deg): the maximal subgraph
    where every part co-occurs with >= 3 surviving parts — the
    standard densest-region extraction before community detection.
    At sf0.01 peeling takes 10 rounds and keeps 935 of 1880 nodes (a
    real multi-round fixpoint, not a single filter).

    The SQL twin unrolls 14 peel rounds — safe because peeling is
    idempotent at the fixpoint; the engine loops to convergence with
    one scalar of driver traffic per round.  Edges shrink
    monotonically so rounds get cheaper.

    The 3-core CAN be globally empty (it is at sf0.1, where support>=2
    spreads 3.6k edges over 20k parts — max degree 6 peels to
    nothing); ray.data drops the schema of a 0-row dataset on
    ``to_pandas``, so the empty case hands the TYPED empty table to
    the driver directly."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li, min_count=2)
    out = graph.kcore(graph.symmetrize_edges(edges), k=3).materialize()
    if out.count() == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64()),
            }
        )
    return out


def event_value_bootstrap(sf_dir: str) -> rd.Dataset:
    """Deterministic multiplier bootstrap over event values -> 16 rows
    (replicate, wsum_cents, wn): replicate r weights each event by
    nibble_r(md5(event_id)) % 3 (mean-1 integer multiplicities 0/1/2
    read from the r-th hex char of ONE md5 per event), then folds the
    weighted sum and weighted count as exact int64 — the downstream
    CI is wsum/wn spread across replicates.  Content-addressed, so
    partitioning-independent and SQL-twin-exact (DuckDB md5 + strpos
    nibble decode); the classic Poisson-bootstrap shape for
    uncertainty on streaming aggregates without resampling passes.

    Scale shape: one streaming pass; per-batch partials are a (16 x
    batch) int64 matmul; only 16-row partials shuffle."""
    ev = _read(sf_dir, "events", ["event_id", "value"])
    R = 16

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "replicate": pa.array([], pa.int64()),
                    "ws_partial": pa.array([], pa.int64()),
                    "wn_partial": pa.array([], pa.int64()),
                }
            )
        cents = (
            pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        hexes = b"".join(
            md5_hex(str(i))[:R].encode("ascii") for i in t["event_id"].to_pylist()
        )
        x = np.frombuffer(hexes, np.uint8).reshape(-1, R).astype(np.int64)
        # ascii hex -> nibble value: '0'-'9' minus 48, 'a'-'f' minus 87
        nib = x - 48 - (x >= 97) * 39
        m = nib % 3
        return pa.table(
            {
                "replicate": pa.array(np.arange(1, R + 1), pa.int64()),
                "ws_partial": pa.array(m.T @ cents, pa.int64()),
                "wn_partial": pa.array(m.sum(axis=0), pa.int64()),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("replicate")
        .aggregate(
            Sum("ws_partial", alias_name="wsum_cents"),
            Sum("wn_partial", alias_name="wn"),
        )
    )


def user_active_coverage(sf_dir: str) -> rd.Dataset:
    """Interval-UNION coverage per user -> (user_id, n_islands,
    covered_us): each event opens a 5-minute activity interval
    [ts, ts+300s); overlapping intervals merge (the classic
    merge-overlapping-intervals / gaps-and-islands shape), and the
    output is the island count and the total covered microseconds —
    exact int64, so hash-exact vs the SQL twin's running-max window.

    Scale shape: ONE shuffle on ``part = user_id % P`` co-locates each
    user's intervals; within a partition the island scan is fully
    vectorized numpy over the (user, start)-sorted frame (prefix
    running max of interval ends per user, no Python per-row loop).
    Per-user interval counts are event counts — bounded by user
    activity, the same contract as the sessionizer."""
    P = 32
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    SPAN = 300_000_000  # 5 min in us

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        uid = pc.cast(t["user_id"], pa.int64())
        s = pc.cast(t["ts"], pa.int64())  # timestamp[us] -> epoch us
        return pa.table(
            {
                "part": pc.bit_wise_and(uid, pa.scalar(P - 1, pa.int64())),
                "user_id": uid,
                "s": s,
            }
        )

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_islands": pd.Series([], dtype=np.int64),
                    "covered_us": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "s"], kind="mergesort").reset_index(
            drop=True
        )
        u = df["user_id"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        e = s + SPAN
        new_user = np.ones(len(u), bool)
        new_user[1:] = u[1:] != u[:-1]
        # exclusive per-user running max of interval ends: grouped
        # cummax (vectorized) shifted by one — the global shift leaks
        # across user boundaries only at new_user rows, which open a
        # new island unconditionally anyway
        prev_max = (
            pd.Series(e).groupby(df["user_id"], sort=False).cummax().shift(1)
        )
        new_island = new_user | (s > prev_max.to_numpy())
        # an island is a contiguous run in (user, s) order whose
        # interval union is [first s, max e] — segment-reduce the ends
        start_idx = np.flatnonzero(new_island)
        starts = s[start_idx]
        ends = np.maximum.reduceat(e, start_idx)
        covered = ends - starts
        users_per_island = u[start_idx]
        out = pd.DataFrame({"user_id": users_per_island, "covered": covered})
        g = out.groupby("user_id", sort=False)["covered"].agg(["count", "sum"])
        return pd.DataFrame(
            {
                "user_id": g.index.to_numpy(np.int64),
                "n_islands": g["count"].to_numpy(np.int64),
                "covered_us": g["sum"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(islands, batch_format="pandas")
        .select_columns(["user_id", "n_islands", "covered_us"])
    )


def embedding_vq_counts(sf_dir: str) -> rd.Dataset:
    """Vector-quantization assignment histogram -> (centroid_id, n):
    every embedding is assigned to its nearest of 8 FIXED centroids
    (the 8 smallest vec_ids, the IVF coarse-assignment step with a
    deterministic codebook) by maximum inner product over
    integer-quantized vectors (floor(x*1000) int64) — exact integer
    scores, ties to the smallest centroid id, so the histogram is
    bit-exact vs the SQL twin (double dot products over integer
    values <= 2^53 are exact).

    Scale shape: centroid selection is a combiner-first smallest-k
    (per-block partial top-8 by id, one 8-row merge); the tiny
    quantized codebook broadcasts via ray.put; assignment is one
    streaming int64 matmul per batch; only 8-row count partials
    shuffle."""
    import ray

    from .ops.ann import _to_matrix

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    K = 8

    def local_smallest(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        ids = pc.cast(t["vec_id"], pa.int64()).combine_chunks().to_numpy()
        keep = np.sort(np.argsort(ids, kind="stable")[:K])
        return t.take(pa.array(keep, pa.int64()))

    cent_tbl = pa.concat_tables(
        [
            tt
            for tt in ray.get(
                emb.map_batches(local_smallest, batch_format="pyarrow")
                .repartition(1)
                .map_batches(local_smallest, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if tt.num_columns
        ]
    )
    order = np.argsort(cent_tbl["vec_id"].to_numpy())
    cent_ids = cent_tbl["vec_id"].to_numpy()[order].astype(np.int64)
    C = np.floor(_to_matrix(cent_tbl["embedding"]) * 1000.0).astype(np.int64)[order]
    cref = ray.put((cent_ids, C))

    class Assign:
        def __init__(self):
            self.cent_ids, self.C = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "centroid_id": pa.array([], pa.int64()),
                        "n_partial": pa.array([], pa.int64()),
                    }
                )
            Q = np.floor(_to_matrix(t["embedding"]) * 1000.0).astype(np.int64)
            # argmax returns the FIRST maximum; centroids sorted by id,
            # so ties break to the smallest centroid id == the SQL
            # twin's ORDER BY s DESC, cid
            best = np.argmax(Q @ self.C.T, axis=1)
            counts = np.bincount(best, minlength=len(self.cent_ids))
            return pa.table(
                {
                    "centroid_id": pa.array(self.cent_ids, pa.int64()),
                    "n_partial": pa.array(counts, pa.int64()),
                }
            )

    return (
        emb.map_batches(Assign, batch_format="pyarrow", concurrency=2)
        .groupby("centroid_id")
        .aggregate(Sum("n_partial", alias_name="n"))
        .filter(expr="n > 0")
    )


def resolution_pairwise_eval(sf_dir: str) -> rd.Dataset:
    """Pairwise CLUSTERING EVALUATION of the entity-resolution output
    -> one row (tp_pairs, pred_pairs, truth_pairs): the exact
    count-algebra inputs to pairwise precision (tp/pred) and recall
    (tp/truth) — predicted clusters are supplier_entity_resolution's
    canon ids (Levenshtein<=1 transitive closure), truth clusters are
    suppliers sharing a normalized name (lowercased, non-alphanumerics
    stripped).  Pair counts never materialize pairs: each is a
    sum of C(size, 2) over group sizes (same-cell for TP, per-pred /
    per-truth marginals), so everything shuffled is (pred, truth, m)
    contingency cells — bounded by the entity count, exact int64.

    The record-linkage evaluation methodology (pairwise P/R over a
    gold partition) as a distributed count-algebra query; the SQL twin
    recomputes the closure and the same three sums."""
    import ray

    from .ops import fuzzy

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    pairs = fuzzy.levenshtein_neardup_pairs(
        supp, k=1, id_col="s_suppkey", name_col="s_name"
    ).map_batches(
        lambda t: pa.table({"id_a": t["s1"], "id_b": t["s2"]}),
        batch_format="pyarrow",
    )
    cmap_df = dedup.components_from_pairs(
        pairs, pa.int64(), num_partitions=8
    ).to_pandas()  # bounded: matched entities only
    cmap_ref = ray.put(
        dict(zip(cmap_df["doc_id"], cmap_df["cluster_id"]))
        if len(cmap_df)
        else {}
    )

    class Cells:
        def __init__(self):
            self.cmap = ray.get(cmap_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["s_suppkey"].to_pylist()
            pred = pa.array([self.cmap.get(i, i) for i in ids], pa.int64())
            truth = pc.replace_substring_regex(
                pc.utf8_lower(t["s_name"]), "[^a-z0-9]", ""
            )
            g = (
                pa.table({"pred": pred, "truth": truth})
                .group_by(["pred", "truth"])
                .aggregate([([], "count_all")])
            )
            return pa.table(
                {
                    "pred": g["pred"],
                    "truth": g["truth"],
                    "m_partial": pc.cast(g["count_all"], pa.int64()),
                }
            )

    cells = (
        supp.map_batches(Cells, batch_format="pyarrow", concurrency=(1, 4))
        .groupby(["pred", "truth"])
        .aggregate(Sum("m_partial", alias_name="m"))
        .materialize()  # three consumers below
    )

    def _pair_sum(ds: rd.Dataset, col: str) -> int:
        # sum of C(m, 2) as a streaming partial + one scalar driver fold
        def partial(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"p": pa.array([0], pa.int64())})
            m = (
                pc.cast(t[col], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {"p": pa.array([int((m * (m - 1) // 2).sum())], pa.int64())}
            )

        s = ds.map_batches(partial, batch_format="pyarrow").aggregate(Sum("p"))
        return int(s["sum(p)"] or 0)

    tp = _pair_sum(cells, "m")
    pred_sizes = (
        cells.groupby("pred").aggregate(Sum("m", alias_name="sz"))
    )
    truth_sizes = (
        cells.groupby("truth").aggregate(Sum("m", alias_name="sz"))
    )
    pred_pairs = _pair_sum(pred_sizes, "sz")
    truth_pairs = _pair_sum(truth_sizes, "sz")
    return rd.from_arrow(
        pa.table(
            {
                "tp_pairs": pa.array([tp], pa.int64()),
                "pred_pairs": pa.array([pred_pairs], pa.int64()),
                "truth_pairs": pa.array([truth_pairs], pa.int64()),
            }
        )
    )


def q2_min_cost_supplier(sf_dir: str) -> rd.Dataset:
    """TPC-H Q2 shape (no partsupp: the part-supplier cost relation is
    min(floor(l_extendedprice*100)) over lineitem's observed
    (partkey, suppkey) pairs — the q16 convention): for size-15 parts,
    the EUROPE supplier(s) achieving each part's minimum cost ->
    top 25 by (s_acctbal DESC, n_name, s_name, p_partkey) with columns
    (s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost).
    Completes the 22/22 TPC-H shape inventory.

    Scale shape: the correlated MIN-subquery is a grouped min +
    self-join back (one extra narrow shuffle on partkey), never a
    per-part subquery; nation x region (fixed-size) broadcasts into
    the supplier read as a key filter; parts read with the size
    pushdown; the final top-25 is combiner-first (per-block local
    top-25, one 25-row merge)."""
    empty = pd.DataFrame(
        {
            "s_acctbal": pd.Series([], dtype=np.float64),
            "s_name": pd.Series([], dtype=str),
            "n_name": pd.Series([], dtype=str),
            "p_partkey": pd.Series([], dtype=np.int64),
            "p_brand": pd.Series([], dtype=str),
            "supply_cost": pd.Series([], dtype=np.float64),
        }
    )
    # fixed-size side: EUROPE nation keys + names (25 nations).  Empty
    # dimension reads drop columns entirely (pandas of an empty
    # Dataset), and hash_join cannot finalize zero-row partitions —
    # guard both, same convention as q8.
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    if region.empty or nation.empty:
        return empty
    eur = nation.merge(
        region[region["r_name"] == "EUROPE"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]
    if eur.empty:
        return empty
    nat_keys = [int(k) for k in eur["n_nationkey"]]
    nmap = dict(zip(eur["n_nationkey"], eur["n_name"]))

    li = _lineitem(sf_dir, ["l_partkey", "l_suppkey", "l_extendedprice"])

    def ps_partial(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        g = (
            pa.table(
                {"l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"], "c": c}
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("c", "min")])
        )
        return pa.table(
            {
                "p_partkey": g["l_partkey"],
                "s_suppkey": g["l_suppkey"],
                "cost_partial": pc.cast(g["c_min"], pa.int64()),
            }
        )

    ps = (
        li.map_batches(ps_partial, batch_format="pyarrow")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Min("cost_partial", alias_name="cost"))
        .repartition(8)
        .materialize()
    )
    if ps.count() == 0:  # empty lineitem: nothing to join
        return empty
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        filter=(pc.field("s_nationkey").isin(nat_keys)),
        override_num_blocks=_blocks(sf_dir, "supplier"),
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": t["s_name"],
                "s_acctbal": t["s_acctbal"],
                "n_name": pa.array(
                    [nmap[int(k)] for k in t["s_nationkey"].to_pylist()],
                    pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        filter=(pc.field("p_size") == 15),
        override_num_blocks=_blocks(sf_dir, "part"),
    )
    # join ORDER: parts first — the p_size=15 filter keeps ~1/50 of
    # parts, so joining it first prunes the (partkey, suppkey) cost
    # relation 50x before the supplier join and everything downstream
    # (the materialize, the grouped min, the winner join) runs on the
    # pruned stream.  At sf0.1 the two orders measure within noise
    # (5.65s vs 5.32s warm best-of-3 — join fixed costs dominate); the
    # reorder is for the at-scale shuffle volume, where join #2's
    # input is 1/50 of ps instead of ~1/5 (inner joins commute)
    j = joins.hash_join(ps, parts, on="p_partkey", num_partitions=8).repartition(8)
    j = joins.hash_join(j, supp, on="s_suppkey", num_partitions=8).repartition(8)
    j = j.materialize()  # consumed twice: grouped min + winner join
    mn = (
        j.map_batches(
            lambda t: (
                lambda g: pa.table(
                    {"p_partkey": g["p_partkey"], "mc_partial": g["cost_min"]}
                )
            )(
                pa.table({"p_partkey": t["p_partkey"], "cost": t["cost"]})
                .group_by("p_partkey")
                .aggregate([("cost", "min")])
            ),
            batch_format="pyarrow",
        )
        .groupby("p_partkey")
        .aggregate(Min("mc_partial", alias_name="mc"))
        .repartition(8)
    )
    winners = (
        joins.hash_join(j, mn, on="p_partkey", num_partitions=8)
        .repartition(8)
        .map_batches(
            lambda t: t.filter(pc.equal(t["cost"], t["mc"])),
            batch_format="pyarrow",
        )
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "s_acctbal": pd.Series([], dtype=np.float64),
                    "s_name": pd.Series([], dtype=str),
                    "n_name": pd.Series([], dtype=str),
                    "p_partkey": pd.Series([], dtype=np.int64),
                    "p_brand": pd.Series([], dtype=str),
                    "supply_cost": pd.Series([], dtype=np.float64),
                }
            )
        df = df.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
            kind="mergesort",
        ).head(25)
        return pd.DataFrame(
            {
                "s_acctbal": df["s_acctbal"].to_numpy(np.float64),
                "s_name": df["s_name"].astype(str),
                "n_name": df["n_name"].astype(str),
                "p_partkey": df["p_partkey"].to_numpy(np.int64),
                "p_brand": df["p_brand"].astype(str),
                "supply_cost": (
                    df["cost"].to_numpy(np.int64) / 100.0
                    if "cost" in df
                    else df["supply_cost"].to_numpy(np.float64)
                ),
            }
        )

    return (
        winners.map_batches(local_top, batch_format="pandas")
        .repartition(1)
        .map_batches(local_top, batch_format="pandas")
    )


def events_late_arrivals(sf_dir: str) -> rd.Dataset:
    """STREAMING WATERMARK late-arrival detection -> (event_id,
    user_id, lateness_us): an event is LATE if its timestamp is more
    than 60s behind the watermark at its arrival position — the §2.9
    streaming semantics (late data vs a watermark) expressed as a
    batch query, exact int64 microseconds so hash-exact vs the SQL
    running-max window twin.  The synthetic events table is perfectly
    time-ordered by event_id (zero inversions, measured), so the
    arrival sequence REPLAYS a deterministic out-of-order ingestion:
    arrival = (event_id//16)*16 + 15 - event_id%16 (each 16-block
    delivered in reverse — integer arithmetic both sides).  The
    watermark is the exclusive running max event time over everything
    that arrived before.

    Scale shape: the one-unbounded-partition window runs on the
    range-partitioned shard-carry pattern
    (ops/analytic.global_exclusive_prefix_max): one shuffle on the
    sketch-derived shard id, per-shard vectorized exclusive cummax,
    num_shards driver ints of carry state."""
    from .ops import analytic

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        eid = pc.cast(t["event_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        arrival = (eid // 16) * 16 + 15 - (eid % 16)
        return pa.table(
            {
                "arrival": pa.array(arrival, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "t_us": pc.cast(t["ts"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
            }
        )

    wm = analytic.global_exclusive_prefix_max(
        ev.map_batches(prep, batch_format="pyarrow"),
        order_col="arrival",
        val_col="t_us",
        keep_cols=["event_id", "user_id"],
    )
    LATE_US = 60_000_000
    SENT = np.iinfo(np.int64).min

    def late(df: pd.DataFrame) -> pd.DataFrame:
        pm = df["prev_max"].to_numpy(np.int64)
        t = df["t_us"].to_numpy(np.int64)
        mask = (pm != SENT) & (t < pm - LATE_US)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64)[mask],
                "user_id": df["user_id"].to_numpy(np.int64)[mask],
                "lateness_us": (pm - LATE_US - t)[mask],
            }
        )

    return wm.map_batches(late, batch_format="pandas")


def media_meta_scan(sf_dir: str) -> rd.Dataset:
    """Header-only media metadata scan -> (kind, fmt, n, sum_h, sum_w):
    container format + dimensions parsed from HEADER BYTES ONLY
    (ops/media.sniff_media_meta — for PNG that skips the whole zlib
    stream), then a combiner-first grouped aggregate.  The 100-TB
    shape for corpus shape statistics: per-blob work is a 256-byte
    header slice, no decode, and only (kind, fmt) micro-rows shuffle.
    Rows-only by nature (payloads are invisible to SQL); sniff ==
    decode is pinned by pytest across all six real codecs."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")

    def attach_and_sniff(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["kind"], value_set=pa.array(["image", "audio", "video"]))
        )
        payloads = [
            media.synth_payload(k, r)
            for k, r in zip(t["kind"].to_pylist(), t["media_ref"].to_pylist())
        ]
        t = t.append_column("payload", pa.array(payloads, pa.binary()))
        m = media.sniff_meta_batch(t)
        # per-batch partial: (kind, fmt) -> n, sum_h, sum_w
        g = m.group_by(["kind", "fmt"]).aggregate(
            [("dim0", "sum"), ("dim1", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "kind": g["kind"],
                "fmt": g["fmt"],
                "n": g["count_all"],
                "sum_h": g["dim0_sum"],
                "sum_w": g["dim1_sum"],
            }
        )

    partials = spans.map_batches(attach_and_sniff, batch_format="pyarrow")
    out = partials.groupby(["kind", "fmt"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_h", alias_name="sum_h"),
        Sum("sum_w", alias_name="sum_w"),
    )
    return out


def _perceptual_neardup(sf_dir: str, kind: str, max_hamming: int = 3) -> rd.Dataset:
    """Shared body for image/audio perceptual near-dup: media spans of
    one modality -> planted-dup payloads -> PerceptualHasher actor pool
    (payload bodies die inside the stage; only ref + int64 signature
    rows continue) -> generic banded Hamming self-join with guaranteed
    recall at hamming <= 3 (4 x 16-bit pigeonhole)."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")

    def attach(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], kind))
        payloads = [
            media.synth_neardup_payload(k, r)
            for k, r in zip(t["kind"].to_pylist(), t["media_ref"].to_pylist())
        ]
        return t.append_column("payload", pa.array(payloads, pa.binary()))

    sigs = spans.map_batches(attach, batch_format="pyarrow").map_batches(
        media.PerceptualHasher,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows
        concurrency=(1, 4),
    )
    return dedup.hamming64_neardup_pairs(
        sigs,
        max_hamming=max_hamming,
        id_col="media_ref",
        sig_col="sig",
        n_blocks=4,
    )


def image_phash_neardup(sf_dir: str) -> rd.Dataset:
    """Image near-duplicate detection -> (id_a, id_b, hamming): REAL
    decode (PNG/BMP/PPM magic dispatch) -> 32x32 grayscale -> DCT
    perceptual hash (ops/media.phash64) -> banded Hamming self-join.
    Finds re-encoded / lightly-edited copies of the same picture:
    the planted content families land at hamming <= 2 (measured) while
    unrelated images sit >= 14, so the guaranteed-recall threshold 3
    separates exactly.  Rows-only; family detection + brute-force
    parity pinned by pytest."""
    return _perceptual_neardup(sf_dir, "image")


def audio_fp_neardup(sf_dir: str) -> rd.Dataset:
    """Audio near-duplicate detection -> (id_a, id_b, hamming): WAV
    decode -> 9-frame x 9-band energy grid -> Haitsma-Kalker delta
    bits (ops/media.audio_fp64) -> banded Hamming self-join.  Gain-
    and-noise-robust copy detection; planted families at hamming <= 3,
    unrelated clips >= 10 (measured).  Rows-only; pytest parity."""
    return _perceptual_neardup(sf_dir, "audio")


def events_value_percentiles_exact(sf_dir: str) -> pa.Table:
    """EXACT global percentiles (p25/p50/p90/p99) of event value ->
    (q_pct, value_cents) via iterative histogram refinement
    (ops/sketch.exact_quantiles_refine): distributed selection in
    ~4 streaming scans of one pruned int column — values never
    shuffle, no worker holds more than a block, and the answer is the
    actual element (quantile_disc), not a sketch estimate.  All four
    quantiles share each scan (one bincount per quantile per block).
    Contrast: events_median_value/p95 use the mergeable KMV sketch
    (exact only below its cap); this is the exact-at-any-scale path."""
    from .ops import sketch

    ev = _read(sf_dir, "events", ["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        return pa.table(
            {"cents": pa.array(np.floor(v * 100.0).astype(np.int64))}
        )

    cds = ev.map_batches(to_cents, batch_format="pyarrow")
    qs = (0.25, 0.50, 0.90, 0.99)
    try:
        vals = sketch.exact_quantiles_refine(cds, "cents", qs)
    except ValueError:  # empty input: the SQL twin yields NULL quantiles
        vals = [None] * len(qs)
    return pa.table(
        {
            "q_pct": pa.array([25, 50, 90, 99], pa.int64()),
            "value_cents": pa.array(vals, pa.int64()),
        }
    )


def events_value_quartile_bins(sf_dir: str) -> rd.Dataset:
    """Exact quantile binning -> (bin, n): the distributed-selection
    primitive (ops/sketch.exact_quantiles_refine) computes the EXACT
    quartile edges in ~4 shared scans, then one streaming pass assigns
    ``bin = searchsorted(edges, cents)`` (== the SQL CASE chain on
    <=q1/<=q2/<=q3) and a combiner-first count folds per bin.  The
    equal-frequency discretizer feature pipelines need, with exact
    edges at any scale — a sketch-derived edge here silently shifts
    bin populations; the DuckDB twin recomputes edges via
    quantile_disc so any drift breaks the hash."""
    from .ops import sketch

    ev = _read(sf_dir, "events", ["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        return pa.table(
            {"cents": pa.array(np.floor(v * 100.0).astype(np.int64))}
        )

    cds = ev.map_batches(to_cents, batch_format="pyarrow")
    try:
        edges = np.array(
            sketch.exact_quantiles_refine(cds, "cents", (0.25, 0.50, 0.75)),
            dtype=np.int64,
        )
    except ValueError:  # empty input: the SQL GROUP BY yields no rows
        return rd.from_arrow(
            pa.table(
                {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        )

    def bin_partial(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(
            np.searchsorted(edges, cents, side="left"), minlength=4
        )
        return pa.table(
            {
                "bin": pa.array(np.arange(4, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        cds.map_batches(bin_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        # collapsed edges (q1 == q2 under heavy ties) empty a bin; the
        # SQL GROUP BY never emits that row, so neither do we
        .filter(expr="n > 0")
    )


def video_phash_neardup(sf_dir: str) -> rd.Dataset:
    """Content-based VIDEO near-duplicate detection -> (id_a, id_b,
    n_matched): real animated-GIF decode -> evenly-spaced frame
    sampling (ops/media.sample_frames, up to 8 frames) -> per-frame
    DCT pHash -> frame-level banded Hamming join -> per-video-pair
    matched-frame count, kept at >= 3 matched frames.  The standard
    CBVR near-dup shape: frame payloads die inside the hasher pool
    (only ref#frame + int64 rows continue), the join shuffles
    signature micro-rows, and the video-level aggregate is
    combiner-first.  Rows-only; planted families + frame-sampling
    invariants pinned by pytest."""
    from . import pipeline
    from .ops import media

    MIN_MATCHED = 3
    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")

    def attach(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "video"))
        payloads = [
            media.synth_neardup_payload("video", r)
            for r in t["media_ref"].to_pylist()
        ]
        return pa.table(
            {
                "media_ref": t["media_ref"],
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    frame_sigs = spans.map_batches(attach, batch_format="pyarrow").map_batches(
        media.VideoFrameHasher,
        batch_format="pyarrow",
        batch_size=128,  # wide rows: whole animations per payload
        concurrency=(1, 4),
    )

    def fid(t: pa.Table) -> pa.Table:
        refs = t["media_ref"].to_pylist()
        idx = t["frame_idx"].to_pylist()
        return pa.table(
            {
                "fid": pa.array(
                    [f"{r}#{i:02d}" for r, i in zip(refs, idx)], pa.string()
                ),
                "sig": t["sig"],
            }
        )

    pairs = dedup.hamming64_neardup_pairs(
        frame_sigs.map_batches(fid, batch_format="pyarrow"),
        max_hamming=3,
        id_col="fid",
        sig_col="sig",
        n_blocks=4,
    )

    def vid_partial(df: pd.DataFrame) -> pd.DataFrame:
        va = df["id_a"].str.rsplit("#", n=1).str[0]
        vb = df["id_b"].str.rsplit("#", n=1).str[0]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        keep = lo != hi  # same-video frame matches are not duplicates
        part = pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})
        out = part.groupby(["id_a", "id_b"], sort=False).size().reset_index()
        out.columns = ["id_a", "id_b", "n_matched"]
        out["n_matched"] = out["n_matched"].astype(np.int64)
        return out

    return (
        pairs.map_batches(vid_partial, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("n_matched", alias_name="n_matched"))
        .filter(expr=f"n_matched >= {MIN_MATCHED}")
    )


def ann_topk_sq8(sf_dir: str) -> rd.Dataset:
    """Scalar-quantized (uint8) vector search with exact float
    rescoring (ops/ann.sq8_topk): approximate candidates over 4x-
    smaller codes, then exact cosine on only the candidate rows — the
    memory-bound production pattern.  Rows-only; recall-vs-brute and
    exactness-of-rescore pinned by pytest."""
    ids, mat = _query_vectors(sf_dir)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.sq8_topk(corpus, ids, mat, k=10)


def _range_shard_bounds(ds: rd.Dataset, col: str):
    """Quartile boundaries (3 floats) for a 4-shard range partition,
    from the mergeable quantile sketch; ``None`` on empty input.
    Boundary ACCURACY only affects shard balance, never correctness —
    equal keys always route to the same shard."""
    from .ops.sketch import grouped_quantile

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int64)))

    q = grouped_quantile(
        ds.map_batches(add_key, batch_format="pyarrow"),
        "_g",
        col,
        q={"q1": 0.25, "q2": 0.5, "q3": 0.75},
        ndigits=None,
    ).to_pandas()
    if not len(q):
        return None
    b = q.iloc[0]
    return np.array([b["q1"], b["q2"], b["q3"]], dtype=np.float64)


def documents_global_ordinals(sf_dir: str) -> rd.Dataset:
    """Globally-CONTIGUOUS row numbers (0-based, ordered by
    (n_chars, doc_id)) -> (doc_id, ordinal) WITHOUT a global sort:
    sketch-derived range boundaries route rows to ordered shards
    (ties share a shard, so the order stays total), ONE shuffle, a
    per-shard local sort with positions, then the driver folds just
    num_shards counts into exclusive prefix offsets and a final map
    adds offset[shard] + pos.  The offsets fold is the distributed
    prefix-sum trick that assigns contiguous ids / ECDF ranks at any
    scale — boundary ACCURACY only affects shard balance, never the
    order.  Oracle: ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"]).materialize()
    bounds = _range_shard_bounds(docs, "n_chars")
    if bounds is None:  # empty table: the ROW_NUMBER twin yields 0 rows
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "ordinal": pa.array([], pa.int64()),
                }
            )
        )

    def shard(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "shard": pa.array(s),
            }
        )

    def local_sort(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "shard": df["shard"].to_numpy(),
                "pos": np.arange(len(df), dtype=np.int64),
            }
        )

    sharded = (
        docs.map_batches(shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(local_sort, batch_format="pandas")
        .materialize()  # consumed twice: counts fold + ordinal map
    )
    def count_partial(t: pa.Table) -> pa.Table:
        # a batch may span shard groups — group within the batch
        g = t.group_by("shard").aggregate([([], "count_all")])
        return pa.table(
            {"shard": g["shard"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        sharded.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("shard")["n"]
        .sum()
    )
    offs = np.zeros(4, dtype=np.int64)
    for s_id, n in counts.items():  # exclusive prefix sum, 4 ints
        if s_id + 1 < 4:
            offs[s_id + 1 :] += int(n)

    def to_ordinal(t: pa.Table) -> pa.Table:
        s = t["shard"].to_numpy(zero_copy_only=False)
        p = t["pos"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ordinal": pa.array(offs[s] + p, pa.int64()),
            }
        )

    return sharded.map_batches(to_ordinal, batch_format="pyarrow")


def user_longest_streak(sf_dir: str) -> rd.Dataset:
    """Longest run of CONSECUTIVE active days per user -> (user_id,
    longest_streak, n_active_days): the gaps-and-islands shape on the
    calendar axis (retention analytics).  Combiner-first: per-batch
    distinct (user, day) micro-rows are the only shuffle; the per-user
    task sorts its bounded day set and takes the max run of day-diff
    == 1 (vectorized split on diff > 1).  Day arithmetic is exact
    integer microseconds // 86400e6, same convention as the set-algebra
    day queries.  Oracle: the day - ROW_NUMBER() islands trick."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        g = pa.table({"user_id": t["user_id"], "day": day}).group_by(
            ["user_id", "day"]
        ).aggregate([])
        return g

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(df["day"].to_numpy())  # sorted distinct
        runs = np.split(days, np.nonzero(np.diff(days) > 1)[0] + 1)
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "longest_streak": np.array(
                    [max(len(r) for r in runs)], dtype=np.int64
                ),
                "n_active_days": np.array([len(days)], dtype=np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def peak_concurrent_sessions(sf_dir: str) -> pa.Table:
    """Global PEAK CONCURRENCY over 30-minute-gap user sessions ->
    one row (peak_concurrency, at_us): the sweep-line shape (capacity
    planning: 'how many sessions were ever open at once, and when
    first').  Sessions-at-equal-instant rule: an end at time t closes
    BEFORE a start at t opens (delta -1 sorts first), mirrored exactly
    in the SQL twin's ORDER BY (t, delta).

    Scale shape: session intervals come from ONE part-colocate shuffle
    on user (vectorized gap-split per partition); their +-1 deltas are
    range-sharded by time (sketch boundaries — accuracy only affects
    shard balance, equal times share a shard so the order stays
    total); each shard sorts locally and emits THREE ints (total sum,
    max prefix, first argmax time); the driver folds num_shards
    micro-rows into exclusive offsets — the distributed prefix-sum
    trick again, never a global sort."""
    P = 32
    GAP_US = 1_800_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["ts"])
        out = df[["user_id", "ts"]].copy()
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        # datetime64[us] first: a bare int64 cast reads NANOSECONDS when
        # pandas materializes timestamp[us] as datetime64[ns], turning
        # the 30-minute gap into 1.8 seconds (repo-wide ts convention)
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        order = np.lexsort((us, uid))
        us, uid = us[order], uid[order]
        new_s = np.ones(len(us), dtype=bool)
        if len(us) > 1:
            new_s[1:] = (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > GAP_US)
        starts = np.nonzero(new_s)[0]
        ends = np.append(starts[1:], len(us)) - 1
        return pd.DataFrame(
            {"start_us": us[starts], "end_us": us[ends]}
        )

    iv = (
        ev.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(intervals, batch_format="pandas")
    )

    def deltas(t: pa.Table) -> pa.Table:
        s = t["start_us"].to_numpy(zero_copy_only=False)
        e = t["end_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, e]), pa.int64()),
                "delta": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
                    )
                ),
            }
        )

    dd = iv.map_batches(deltas, batch_format="pyarrow").materialize()
    if dd.count() == 0:
        # the SQL twin's scalar subqueries always yield ONE row — on an
        # empty/all-NULL-ts table that row is (NULL, NULL); mirror it
        return pa.table(
            {
                "peak_concurrency": pa.array([None], pa.int64()),
                "at_us": pa.array([None], pa.int64()),
            }
        )
    bounds = _range_shard_bounds(dd, "t")

    def shard(t: pa.Table) -> pa.Table:
        s = np.searchsorted(
            bounds, t["t"].to_numpy(zero_copy_only=False).astype(np.float64),
            side="right",
        ).astype(np.int64)
        return t.append_column("shard", pa.array(s))

    def local_sweep(df: pd.DataFrame) -> pd.DataFrame:
        t = df["t"].to_numpy()
        d = df["delta"].to_numpy()
        order = np.lexsort((d, t))  # ends (-1) before starts (+1) at ties
        t, d = t[order], d[order]
        run = np.cumsum(d)
        i = int(np.argmax(run))  # first occurrence = smallest t at max
        return pd.DataFrame(
            {
                "shard": [df["shard"].iloc[0]],
                "total": np.array([run[-1]], dtype=np.int64),
                "max_prefix": np.array([run[i]], dtype=np.int64),
                "t_at": np.array([t[i]], dtype=np.int64),
            }
        )

    parts = (
        dd.map_batches(shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(local_sweep, batch_format="pandas")
        .to_pandas()
        .sort_values("shard")
    )
    offs = np.concatenate([[0], np.cumsum(parts["total"].to_numpy())[:-1]])
    peaks = offs + parts["max_prefix"].to_numpy()
    peak = int(peaks.max())
    at = int(parts["t_at"].to_numpy()[np.nonzero(peaks == peak)[0][0]])
    return pa.table(
        {
            "peak_concurrency": pa.array([peak], pa.int64()),
            "at_us": pa.array([at], pa.int64()),
        }
    )


def kg_entity_neighborhood(sf_dir: str) -> rd.Dataset:
    """2-hop neighborhood of the KG's top-degree entity -> (entity,
    dist): the 'what surrounds this hub' subgraph query a KG serves
    interactively, run as bounded-depth frontier BFS (ops/graph.
    bfs_hops) over the deduplicated edge table.  Entity ids are
    strings, so they pass through the vocabulary-bounded node
    dictionary (sorted -> rank, the M12 convention) before the integer
    BFS and are mapped back after.  Source = highest-degree entity,
    ties to the lexicographically smallest.  Rows-only (the upstream
    extraction is neural); BFS parity is pinned by ops-level pytest
    and a driver-BFS check on the small graph."""
    import ray

    from .ops import graph

    g = kg_graph(sf_dir)
    nodes_df = g["nodes"].to_pandas()  # vocabulary-bounded (distinct surfaces)
    if nodes_df.empty:  # empty corpus (pandas of an empty ds drops columns)
        return rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    ents = sorted(nodes_df["entity_id"])
    ids = {e: i for i, e in enumerate(ents)}
    edges = g["edges"].materialize()  # consumed twice: degree + BFS

    def deg_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["subj_entity"].combine_chunks(), t["obj_entity"].combine_chunks()]
        )
        gb = pa.table({"e": both}).group_by("e").aggregate([([], "count_all")])
        return pa.table({"e": gb["e"], "n": pc.cast(gb["count_all"], pa.int64())})

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("e")["n"]
        .sum()
        .reset_index()
        .sort_values(["n", "e"], ascending=[False, True])
    )
    if not len(deg):  # empty corpus: no edges, no neighborhood
        return rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    source = ids[deg["e"].iloc[0]]
    # the dictionary is the SORTED entity list, so encoding is a
    # vectorized Arrow index_in against the broadcast value set — no
    # per-edge Python dict lookups
    ents_ref = ray.put(pa.array(ents, pa.string()))

    def to_int_edges(t: pa.Table, _ref=ents_ref) -> pa.Table:
        vs = ray.get(_ref)
        return pa.table(
            {
                "part_a": pc.cast(
                    pc.index_in(t["subj_entity"], value_set=vs), pa.int64()
                ),
                "part_b": pc.cast(
                    pc.index_in(t["obj_entity"], value_set=vs), pa.int64()
                ),
            }
        )

    out = graph.bfs_hops(
        edges.map_batches(to_int_edges, batch_format="pyarrow"),
        source,
        max_depth=2,
    )
    rev = pa.array(ents, pa.string())

    def back(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pc.take(rev, t["node"]),
                "dist": pc.cast(t["dist"], pa.int64()),
            }
        )

    return out.map_batches(back, batch_format="pyarrow")


def _kg_link_prediction(sf_dir: str, model_name: str, lr: float) -> pa.Table:
    """Shared link-prediction query body: train a KGE model
    (ops/kge.py — data-parallel sparse-gradient epochs over the
    deduplicated edge table) and return the top-3 predicted tails for
    the 5 highest-degree subject entities under their most frequent
    outgoing relation -> (head, rel, rank, tail, score).  Rows-only:
    the upstream extraction is neural and the training objective is
    iterative; correctness is pinned by ops-level pytest (loss
    monotonicity, mean-rank-beats-chance, determinism, partitioning
    independence, finite-difference-checked gradients for BOTH
    scorers)."""
    from .ops import kge

    g = kg_graph(sf_dir)
    edges = g["edges"]
    model = kge.train_kge(
        edges, model=model_name, dim=32, epochs=50, lr=lr, seed=0
    )
    if not model["entities"]:
        return pa.table(
            {
                "head": pa.array([], pa.string()),
                "rel": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "tail": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            }
        )

    # pick query heads: top-5 subject entities by outgoing edge count,
    # each with its most frequent relation (combiner-first grouped
    # count; crossing rows bounded by distinct (subj, rel) pairs)
    def pair_partial(t: pa.Table) -> pa.Table:
        gb = (
            pa.table(
                {"h": t["subj_entity"], "r": t["pred_label"]}
            )
            .group_by(["h", "r"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "h": gb["h"],
                "r": gb["r"],
                "n": pc.cast(gb["count_all"], pa.int64()),
            }
        )

    pairs = (
        edges.map_batches(pair_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["h", "r"])["n"]
        .sum()
        .reset_index()
    )
    deg = pairs.groupby("h")["n"].sum().reset_index(name="deg")
    top_heads = deg.sort_values(["deg", "h"], ascending=[False, True]).head(5)[
        "h"
    ]
    queries = []
    for h in top_heads:
        sub = pairs[pairs["h"] == h].sort_values(
            ["n", "r"], ascending=[False, True]
        )
        queries.append((h, sub.iloc[0]["r"]))
    return kge.predict_tails(model, queries, k=3)


def kg_transe_link_prediction(sf_dir: str) -> pa.Table:
    """TransE link prediction over the built KG (rows-only; see
    _kg_link_prediction)."""
    return _kg_link_prediction(sf_dir, "transe", lr=0.02)


def kg_distmult_link_prediction(sf_dir: str) -> pa.Table:
    """DistMult (bilinear-diagonal) link prediction over the built KG
    (rows-only; see _kg_link_prediction).  Same training harness as
    TransE — the scorer registry pattern applied to KGE."""
    return _kg_link_prediction(sf_dir, "distmult", lr=0.05)


def kg_complex_link_prediction(sf_dir: str) -> pa.Table:
    """ComplEx link prediction over the built KG (rows-only; see
    _kg_link_prediction).  The antisymmetric-capable scorer of the
    registry (Im(R) breaks s(h,r,t)=s(t,r,h) — the one that can fit
    directional relations DistMult is structurally blind to)."""
    return _kg_link_prediction(sf_dir, "complex", lr=0.1)


def kg_rotate_link_prediction(sf_dir: str) -> pa.Table:
    """RotatE link prediction over the built KG (rows-only; see
    _kg_link_prediction).  The COMPOSITION-capable scorer of the
    registry (Sun et al. 2019): relations are element-wise complex
    rotations, so r3 = r1 o r2 is representable exactly (phase
    addition) — the geometry TransE approximates and DistMult/ComplEx
    cannot express."""
    return _kg_link_prediction(sf_dir, "rotate", lr=0.1)


def bloom_join_urgent_lineitems(sf_dir: str) -> pd.DataFrame:
    """Revenue rollup of lineitems belonging to URGENT high-value
    orders -> (o_orderstatus, n_items, revenue), via the
    Bloom-prefiltered exact join (ops/joins.bloom_prefilter_join).

    Scale shape: the selective build side (priority + price predicates
    pushed into the orders read) folds into a fixed-size OR-merged
    Bloom filter over orderkeys; the ~128 KB bit array broadcasts once
    and prunes ~96% of the lineitem stream BEFORE the hash-partition
    shuffle.  No false negatives + the real join removes false
    positives, so the result is EXACT — the SQL twin is the plain
    join, which is the point: same answer, a fraction of the
    exchange."""
    from .ops.joins import bloom_prefilter_join

    build = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
        filter=(
            (pc.field("o_orderpriority") == "1-URGENT")
            & (pc.field("o_totalprice") > 400000.0)
        ),
        override_num_blocks=_blocks(sf_dir, "orders"),
    )
    probe = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_blocks(sf_dir, "lineitem"),
    )
    joined = bloom_prefilter_join(
        probe, build, on="l_orderkey", right_on="o_orderkey"
    ).repartition(4)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderstatus" not in t.column_names:
            return pa.table(
                {
                    "o_orderstatus": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        disc = pc.subtract(pa.scalar(1.0), t["l_discount"])
        cents = _cents(t["l_extendedprice"], disc)
        g = (
            pa.table({"o_orderstatus": t["o_orderstatus"], "cents": cents})
            .group_by(["o_orderstatus"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "n_items": pc.cast(g["count_all"], pa.int64()),
                "cents": pc.cast(g["cents_sum"], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"o_orderstatus": [], "n_items": [], "revenue": []}
        ).astype({"o_orderstatus": str, "n_items": "int64", "revenue": float})
    out = (
        parts.groupby("o_orderstatus")[["n_items", "cents"]]
        .sum()
        .reset_index()
        .sort_values("o_orderstatus")
    )
    out["revenue"] = (out["cents"] / 100.0).round(2)
    return out[["o_orderstatus", "n_items", "revenue"]].reset_index(drop=True)


def kg_relation_schema(sf_dir: str) -> pa.Table:
    """Ontology induction over the built KG: the (subject type,
    object type) signature distribution of every relation ->
    (pred_label, subj_type, obj_type, n_edges, weight) sorted by
    (pred_label, -n_edges, subj_type, obj_type).  This is the
    schema-inspection query a KG consumer runs to learn what a
    relation MEANS (e.g. GEN-AFF is Person->Org 80% of the time).

    Scale shape: the node table is vocabulary-bounded (distinct
    canonical entities), so its entity_id -> entity_type map broadcasts
    once via ray.put (the LinkEntities convention); the edge stream
    maps types on via Arrow index_in + take and pre-aggregates
    per-batch, so the one grouped exchange moves (distinct signature)
    rows per block, never edges.  Rows-only: the upstream extraction
    is neural."""
    import ray

    g = kg_graph(sf_dir)
    nodes_df = g["nodes"].to_pandas()  # vocabulary-bounded
    empty = pa.table(
        {
            "pred_label": pa.array([], pa.string()),
            "subj_type": pa.array([], pa.string()),
            "obj_type": pa.array([], pa.string()),
            "n_edges": pa.array([], pa.int64()),
            "weight": pa.array([], pa.int64()),
        }
    )
    if nodes_df.empty:
        return empty
    ids = pa.array(sorted(nodes_df["entity_id"]), pa.string())
    type_of = dict(zip(nodes_df["entity_id"], nodes_df["entity_type"]))
    types = pa.array([type_of[e] for e in ids.to_pylist()], pa.string())
    map_ref = ray.put((ids, types))

    def partial(t: pa.Table) -> pa.Table:
        id_arr, ty_arr = ray.get(map_ref)
        st = pc.take(ty_arr, pc.index_in(t["subj_entity"], value_set=id_arr))
        ot = pc.take(ty_arr, pc.index_in(t["obj_entity"], value_set=id_arr))
        gb = (
            pa.table(
                {
                    "pred_label": t["pred_label"],
                    "subj_type": st,
                    "obj_type": ot,
                    "weight": pc.cast(t["weight"], pa.int64()),
                }
            )
            .group_by(["pred_label", "subj_type", "obj_type"])
            .aggregate([("weight", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "pred_label": gb["pred_label"],
                "subj_type": gb["subj_type"],
                "obj_type": gb["obj_type"],
                "n_edges": pc.cast(gb["count_all"], pa.int64()),
                "weight": pc.cast(gb["weight_sum"], pa.int64()),
            }
        )

    parts = (
        g["edges"]
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: distinct (pred, type, type) signatures
    )
    if parts.empty:
        return empty
    out = (
        parts.groupby(["pred_label", "subj_type", "obj_type"])[
            ["n_edges", "weight"]
        ]
        .sum()
        .reset_index()
    )
    out = out.sort_values(
        ["pred_label", "n_edges", "subj_type", "obj_type"],
        ascending=[True, False, True, True],
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def kg_link_prediction_eval(sf_dir: str) -> pa.Table:
    """Held-out link-prediction quality of the KGE model over the
    built KG -> one row per model (model, n_train, n_test, n_eval,
    mean_rank, mrr, hits1, hits3, hits10).

    Protocol: content-addressed 80/20 edge split (pure function of the
    triple — partitioning-independent), train each scorer on the train
    split only, evaluate FILTERED tail ranking (known true tails of the
    same (head, relation) excluded) on the test split.  Rows-only: the
    metric is the oracle — pinned by ops-level pytest on a planted
    graph where hits@10 must beat the random-ranking baseline."""
    from .ops import kge

    g = kg_graph(sf_dir)
    train, test = kge.split_edges_holdout(g["edges"])
    train = train.materialize()

    def to_triples(ds) -> list[tuple[str, str, str]]:
        df = ds.to_pandas()  # edge table: bounded by distinct triples
        if df.empty:
            return []
        return list(
            zip(df["subj_entity"], df["pred_label"], df["obj_entity"])
        )

    test_triples = to_triples(test)
    all_triples = test_triples + to_triples(train)
    rows = []
    for name, lr in (
        ("transe", 0.02),
        ("distmult", 0.05),
        ("complex", 0.1),
        ("rotate", 0.1),
    ):
        model = kge.train_kge(
            train, model=name, dim=32, epochs=50, lr=lr, seed=0
        )
        m = kge.evaluate_link_prediction(model, all_triples, test_triples)
        rows.append(
            {
                "model": name,
                "n_train": len(all_triples) - len(test_triples),
                "n_test": len(test_triples),
                **m,
            }
        )
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------- declarative TPC-H KG
#
# Relational -> KG "triplification" (the R2RML / direct-mapping
# methodology): typed entity ids '<type>:<key>' and one (subj, pred,
# obj) edge family per foreign-key or fact relationship.  Unlike the
# neural kg_* pipelines this KG is a pure function of the relational
# tables, so construction AND the downstream graph queries are
# SQL-oracle-checkable end to end.


def _typed_id(prefix: str, keys: pa.ChunkedArray | pa.Array) -> pa.Array:
    """int keys -> '<prefix>:<key>' typed entity ids, vectorized."""
    out = pc.binary_join_element_wise(
        pa.scalar(prefix), pc.cast(keys, pa.string()), ":"
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _kg_edge_batch(
    subj_type: str, pred: str, obj_type: str, subj_col: str, obj_col: str
):
    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "subj": _typed_id(subj_type, t[subj_col]),
                "pred": pa.array([pred] * n, pa.string()),
                "obj": _typed_id(obj_type, t[obj_col]),
            }
        )

    return f


def tpch_kg_edges(sf_dir: str) -> rd.Dataset:
    """Declarative KG construction from the relational tables
    (relational -> triple direct mapping) -> (subj, pred, obj) with
    typed ids '<type>:<key>'.  Six edge families: customer/supplier
    located_in nation, nation part_of region, order placed_by customer,
    order contains part and part supplied_by supplier (the latter two
    DISTINCT projections of the lineitem fact table).

    Scale shape: each family is a per-batch column projection (no
    exchange at all for the FK families); the two lineitem-derived
    families dedup combiner-first (per-batch distinct, then one grouped
    pass over narrow key pairs) — document bodies/measures never move.
    This is the oracle-checkable twin of the NEURAL KG built by
    pipeline.run_kg: same output contract (typed nodes, labeled edges),
    fully relational provenance."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        _kg_edge_batch("customer", "located_in", "nation", "c_custkey", "c_nationkey"),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        _kg_edge_batch("supplier", "located_in", "nation", "s_suppkey", "s_nationkey"),
        batch_format="pyarrow",
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).map_batches(
        _kg_edge_batch("nation", "part_of", "region", "n_nationkey", "n_regionkey"),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _kg_edge_batch("order", "placed_by", "customer", "o_orderkey", "o_custkey"),
        batch_format="pyarrow",
    )
    li_op = _distinct_pairs(
        _lineitem(sf_dir, ["l_orderkey", "l_partkey"]), "l_orderkey", "l_partkey"
    ).map_batches(
        _kg_edge_batch("order", "contains", "part", "l_orderkey", "l_partkey"),
        batch_format="pyarrow",
    )
    li_ps = _distinct_pairs(
        _lineitem(sf_dir, ["l_partkey", "l_suppkey"]), "l_partkey", "l_suppkey"
    ).map_batches(
        _kg_edge_batch("part", "supplied_by", "supplier", "l_partkey", "l_suppkey"),
        batch_format="pyarrow",
    )
    return cust.union(supp, nat, orders, li_op, li_ps)


def _distinct_pairs(ds: rd.Dataset, a: str, b: str) -> rd.Dataset:
    """Combiner-first distinct over a 2-column projection: per-batch
    dedup so the one grouped exchange moves narrow distinct pairs."""

    def local(t: pa.Table) -> pa.Table:
        return t.select([a, b]).group_by([a, b]).aggregate([])

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby([a, b])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    )


def kg_metapath_counts(sf_dir: str) -> rd.Dataset:
    """Relation-composition census over the declarative TPC-H KG ->
    (pred_1, pred_2, n_paths): for every ordered relation pair, how
    many length-2 paths a -pred_1-> b -pred_2-> c exist.  This is the
    metapath statistic KG systems use to mine candidate inference
    rules (e.g. placed_by o located_in ~ 'order shipped to nation') and
    to pick metapaths for heterogeneous-graph embeddings.

    Scale shape: one hash-partitioned self-join on the shared midpoint
    entity, then combiner-first counting of the (pred_1, pred_2) pairs
    — the relation-pair domain is schema-sized, so the final exchange
    is tiny.  Skewed midpoints (a hub customer) fan out across hash
    partitions; at 100 TB salt the midpoint key for the pathological
    celebrity-entity case."""
    from .ops import joins
    from .ops.agg import grouped_count

    e = tpch_kg_edges(sf_dir).materialize()  # two join sides below
    left = e.map_batches(
        lambda t: pa.table({"pred_1": t["pred"], "mid": t["obj"]}),
        batch_format="pyarrow",
    )
    right = e.map_batches(
        lambda t: pa.table({"mid2": t["subj"], "pred_2": t["pred"]}),
        batch_format="pyarrow",
    )
    paths = joins.hash_join(
        left, right, on="mid", right_on="mid2", num_partitions=8
    ).repartition(8)
    return grouped_count(
        paths.map_batches(
            lambda t: t.select(["pred_1", "pred_2"]) if t.num_rows else
            pa.table({"pred_1": pa.array([], pa.string()),
                      "pred_2": pa.array([], pa.string())}),
            batch_format="pyarrow",
        ),
        ["pred_1", "pred_2"],
        "n_paths",
    )


def kg_type_constraints(sf_dir: str) -> rd.Dataset:
    """Ontology induction over the declarative TPC-H KG -> (pred,
    subj_type, obj_type, n_edges): the type-signature distribution of
    every relation, recovered from the data (not the schema) by
    splitting the typed ids.  The oracle-checkable twin of
    kg_relation_schema (whose upstream is neural): a KG consumer runs
    this to learn what a relation MEANS and to spot mis-typed edges.

    Scale shape: per-batch string split + per-batch partial count;
    the one grouped exchange moves (distinct signature) rows per block
    — schema-sized, never edge-sized."""
    from .ops.agg import grouped_count

    e = tpch_kg_edges(sf_dir)

    def sig(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pred": t["pred"],
                "subj_type": pc.list_element(
                    pc.split_pattern(t["subj"], ":"), 0
                ),
                "obj_type": pc.list_element(
                    pc.split_pattern(t["obj"], ":"), 0
                ),
            }
        )

    return grouped_count(
        e.map_batches(sig, batch_format="pyarrow"),
        ["pred", "subj_type", "obj_type"],
        "n_edges",
    )


def copurchase_clustering(sf_dir: str) -> rd.Dataset:
    """Local clustering coefficient over the co-purchase graph ->
    (node, degree, n_triangles, coeff_ppm): how clique-like each
    part's co-purchase neighborhood is (the transitivity signal
    recommender systems and fraud pipelines read).  coeff_ppm =
    floor(2e6 * triangles / (deg*(deg-1))) — exact integers, so the
    SQL twin hash-matches.  Scale shape: ops/graph.
    clustering_coefficients (distributed wedge+closing joins for the
    per-vertex triangle credits, combiner-first degrees, one left-outer
    hash join)."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li)
    return graph.clustering_coefficients(edges)


def copurchase_communities(sf_dir: str) -> rd.Dataset:
    """Community detection over the co-purchase graph -> (node,
    community): THREE bulk-synchronous rounds of deterministic label
    propagation (most frequent neighbor label, ties to the smallest —
    ops/graph.label_propagation).  Communities group parts that sell
    together; the fixed round count makes the result a pure function of
    the edge set, pinned by an UNROLLED SQL twin (one CTE per round).

    Scale shape: per round one hash join (adjacency x narrow label
    vector), one combiner-first grouped count, and the per-node argmax
    as a single grouped MAX over a packed int64 (count, -label) key —
    no per-group Python, the adjacency shuffles once."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li)
    return graph.label_propagation(edges, rounds=3)


def documents_time_travel(sf_dir: str) -> rd.Dataset:
    """Snapshot TIME TRAVEL (the lakehouse ``AS OF`` read) ->
    (version, doc_id, fingerprint): version 1 of a versioned table is
    written (docs with doc_id % 3 != 0), a CDC changelog (inserts: the
    % 3 == 0 docs; deletes: % 7 == 0; updates: ' [v2]' appended where
    % 11 == 0) is MERGE-applied and committed as version 2, and BOTH
    snapshots are then read back FROM STORAGE — the v1 read happens
    after the v2 commit, so a hash match proves old snapshots stay
    byte-stable under new writes (checkpoint.write_table_version /
    read_table_version: append-only version dirs, atomic tmp-rename
    commits, manifest-gated reads).

    Scale shape: snapshots are partitioned parquet streamed in and out
    (no driver materialization); the merge is ops/joins.apply_changelog
    (anti-join on narrow keys + union of upsert payloads)."""
    import tempfile

    from . import checkpoint
    from .ops import joins

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    v1 = docs.map_batches(
        lambda t: t.filter(pa.array(t["doc_id"].to_numpy() % 3 != 0)),
        batch_format="pyarrow",
    )
    root = tempfile.mkdtemp(prefix="deepie-timetravel-")
    checkpoint.write_table_version(v1, root)

    def changelog(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ins = ids % 3 == 0
        dele = (ids % 3 != 0) & (ids % 7 == 0)
        upd = (ids % 3 != 0) & (ids % 7 != 0) & (ids % 11 == 0)
        t_ins = pa.table(
            {
                "doc_id": pa.array(ids[ins], pa.int64()),
                "text": txt.filter(pa.array(ins)),
                "op": pa.array(["I"] * int(ins.sum()), pa.string()),
            }
        )
        t_del = pa.table(
            {
                "doc_id": pa.array(ids[dele], pa.int64()),
                "text": txt.filter(pa.array(dele)),
                "op": pa.array(["D"] * int(dele.sum()), pa.string()),
            }
        )
        upd_txt = pc.binary_join_element_wise(
            txt.filter(pa.array(upd)),
            pa.scalar(" [v2]"),
            "",
        )
        t_upd = pa.table(
            {
                "doc_id": pa.array(ids[upd], pa.int64()),
                "text": upd_txt,
                "op": pa.array(["U"] * int(upd.sum()), pa.string()),
            }
        )
        return pa.concat_tables([t_ins, t_del, t_upd])

    changes = docs.map_batches(changelog, batch_format="pyarrow")
    v2 = joins.apply_changelog(
        checkpoint.read_table_version(root, 1), changes, key_col="doc_id"
    )
    checkpoint.write_table_version(v2, root)

    def tag(version: int):
        def f(t: pa.Table) -> pa.Table:
            out = _fp_roundtrip(t)
            return out.append_column(
                "version", pa.array([version] * out.num_rows, pa.int64())
            )

        return f

    # the AS OF reads — both from storage, v1 read AFTER v2's commit
    r1 = checkpoint.read_table_version(root, 1).map_batches(
        tag(1), batch_format="pyarrow"
    )
    r2 = checkpoint.read_table_version(root, 2).map_batches(
        tag(2), batch_format="pyarrow"
    )
    return r1.union(r2)


def user_event_pattern_counts(sf_dir: str) -> rd.Dataset:
    """Sequence PATTERN MATCHING over event streams (the
    MATCH_RECOGNIZE-lite every CEP engine ships) -> (user_id, n_events,
    n_vcp): per user, how many times the CONTIGUOUS pattern
    view -> click -> purchase occurs in the time-ordered event
    sequence (non-overlapping occurrences, counted left to right).

    Scale shape: the same one-shuffle part-colocate plan as
    user_event_sequences (each user's rows gather once, P vectorized
    pandas calls); the pattern scan is a vectorized string count over
    the per-user-bounded sequence — never corpus-bounded state.  The
    SQL twin counts via the length-difference-of-replace identity over
    the identical ordered string_agg."""
    P = 32
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "event_type"]].copy()
        out.insert(0, "part", out["user_id"].to_numpy() % P)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=True)
        seq = g["event_type"].agg(",".join)
        n = g.size()
        n_vcp = seq.str.count("view,click,purchase").astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": seq.index.to_numpy(),
                "n_events": n.to_numpy().astype(np.int64),
                "n_vcp": n_vcp.to_numpy(),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "n_events", "n_vcp"])
    )


def orders_ivm_status_counts(sf_dir: str) -> rd.Dataset:
    """INCREMENTAL VIEW MAINTENANCE end to end -> (o_orderstatus,
    n_orders): the grouped-count materialized view over orders is
    refreshed under a deterministic CDC changelog (keys %10==0 update
    their status to 'P', %10==1 delete, %10==2 insert a shifted-key 'O'
    copy) WITHOUT recomputing from the base table — retract/add deltas
    only (ops/agg.ivm_grouped_count_refresh; old groups come from a
    narrow semi-join of exactly the touched keys).  The DuckDB twin
    recomputes the view from the fully merged table, so a hash match
    proves the delta algebra equals a full recompute — the materialized
    -view refresh path of every lakehouse."""
    from .ops.agg import grouped_count, ivm_grouped_count_refresh

    base = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    view = grouped_count(base, ["o_orderstatus"], "n_orders")

    def changelog(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        s = t["o_orderstatus"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        m = k % 10
        upd_k = k[m == 0]
        del_k = k[m == 1]
        del_s = s.filter(pa.array(m == 1))
        ins_k = k[m == 2] + 1_000_000_000
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.concatenate([upd_k, del_k, ins_k]), pa.int64()
                ),
                "o_orderstatus": pa.chunked_array(
                    [
                        pa.array(["P"] * len(upd_k), pa.string()),
                        del_s,
                        pa.array(["O"] * len(ins_k), pa.string()),
                    ]
                ).combine_chunks(),
                "op": pa.array(
                    ["U"] * len(upd_k) + ["D"] * len(del_k) + ["I"] * len(ins_k)
                ),
            }
        )

    changes = base.map_batches(changelog, batch_format="pyarrow").materialize()
    return ivm_grouped_count_refresh(
        view, base, changes, key_col="o_orderkey", group_col="o_orderstatus",
        count_col="n_orders",
    )


def coverage_pick_docs(sf_dir: str) -> pa.Table:
    """Submodular data curation: greedy MAX-COVERAGE selection of the
    3 documents that jointly cover the most distinct word-3-grams ->
    (round, doc_id, gain, covered_total) in pick order
    (ops/sample.greedy_max_coverage — broadcast covered set, streamed
    marginal gains, packed-argmax pick; only each winner's own gram
    list reaches the driver).  The facility-location step of coreset /
    diverse-subset selection pipelines; pinned by an UNROLLED 3-round
    SQL twin."""
    from .ops import sample

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return sample.greedy_max_coverage(docs, k=3, unit="gram3")


def audio_spectral_features(sf_dir: str) -> rd.Dataset:
    """Audio FEATURE EXTRACTION over the interleaved corpus ->
    (doc_id, span_idx, media_ref, n_frames, centroid_hz, bandwidth_hz,
    flux): every audio span's synthesized-WAV payload is decoded
    (ops/media.decode_wav) and summarized with a real Hann-window STFT
    spectrogram (ops/media.audio_spectral_stats — power-weighted
    centroid/bandwidth, gain-invariant flux).  The per-clip spectral
    summary a multimodal curation pipeline keys quality and
    content-typing decisions on.  Rows-only: the DSP has no SQL twin;
    the spectrogram is pinned by numpy-parity and pure-tone pytest.

    Scale shape: embarrassingly parallel map over spans (payload decode
    + one batched rfft per clip); floats rounded to 6 dp for stable
    cross-run comparison."""
    from . import pipeline
    from .ops import media

    docs = pipeline.read_documents(sf_dir)
    spans = docs.map_batches(media.explode_media_spans, batch_format="pyarrow")
    audio = spans.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")),
        batch_format="pyarrow",
    )

    def feats(t: pa.Table) -> pa.Table:
        rows = {
            "doc_id": [],
            "span_idx": [],
            "media_ref": [],
            "n_frames": [],
            "centroid_hz": [],
            "bandwidth_hz": [],
            "flux": [],
        }
        for d, i, r in zip(
            t["doc_id"].to_pylist(),
            t["span_idx"].to_pylist(),
            t["media_ref"].to_pylist(),
        ):
            pcm, rate = media.decode_wav(media.synth_payload("audio", r))
            s = media.audio_spectral_stats(pcm, rate)
            rows["doc_id"].append(d)
            rows["span_idx"].append(i)
            rows["media_ref"].append(r)
            rows["n_frames"].append(s["n_frames"])
            rows["centroid_hz"].append(round(s["centroid_hz"], 6))
            rows["bandwidth_hz"].append(round(s["bandwidth_hz"], 6))
            rows["flux"].append(round(s["flux"], 6))
        return pa.table(
            {
                # doc_id is a STRING in the interleaved span schema
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "span_idx": pa.array(rows["span_idx"], pa.int64()),
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "n_frames": pa.array(rows["n_frames"], pa.int64()),
                "centroid_hz": pa.array(rows["centroid_hz"], pa.float64()),
                "bandwidth_hz": pa.array(rows["bandwidth_hz"], pa.float64()),
                "flux": pa.array(rows["flux"], pa.float64()),
            }
        )

    return audio.map_batches(feats, batch_format="pyarrow")


def ann_topk_mmr(sf_dir: str) -> pa.Table:
    """DIVERSIFIED vector search (MMR rerank, lambda=0.7) ->
    (query_id, rank, neighbor_id, mmr_score) for query vectors
    vec_id < 3: the brute-force shortlist is re-ranked so each pick
    trades relevance against similarity to what's already shown
    (ops/ann.mmr_rerank — two-stage: streamed shortlist, query-bounded
    greedy).  Rows-only: pinned by the numpy-greedy parity and
    planted-duplicate demotion tests."""
    ids, mat = _query_vectors(sf_dir, n=3)
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.mmr_rerank(corpus, ids, mat, k=10, shortlist=50, lam=0.7)


def knn_label_eval(sf_dir: str) -> rd.Dataset:
    """kNN CLASSIFICATION evaluation over the labeled embeddings ->
    (label, n, n_correct): each vector's label predicted by MAJORITY
    VOTE among its 5 exact cosine nearest neighbors (self excluded;
    neighbor ties to the smaller id, vote ties to the smaller label),
    scored against the true label, accuracy counted per class — the
    leave-one-out kNN probe every embedding pipeline runs to check the
    space is label-coherent.

    Scale shape: neighbors come from ops/ann.all_pairs_knn (chunk-pair
    distributed all-pairs top-k — also the mutual-kNN engine); labels
    attach by ONE hash join of narrow (id, label) rows; the vote is a
    combiner-first (query, label) count folded to a single grouped MAX
    over a packed ``count * 16 + (15 - label)`` key (labels < 16 here;
    widen the base for bigger label spaces); class accuracy is a final
    combiner-first count."""
    from .ops import joins
    from .ops.agg import grouped_count
    from ray.data.aggregate import Max, Sum

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    knn = ann.all_pairs_knn(
        emb.select_columns(["vec_id", "embedding"]), k=5
    )
    labels = emb.map_batches(
        lambda t: pa.table(
            {
                "lid": pc.cast(t["vec_id"], pa.int64()),
                "lab": pc.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # two join consumers (votes + truth)

    votes = grouped_count(
        joins.hash_join(knn, labels, on="neighbor_id", right_on="lid")
        .repartition(8)
        .map_batches(
            lambda t: pa.table({"query_id": t["query_id"], "lab": t["lab"]}),
            batch_format="pyarrow",
        ),
        ["query_id", "lab"],
        "n_votes",
    )

    B = 16

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "query_id" not in t.column_names:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "pk": pa.array([], pa.int64())}
            )
        n = t["n_votes"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "query_id": t["query_id"],
                "pk": pa.array(n * B + (B - 1 - lab), pa.int64()),
            }
        )

    pred = (
        votes.map_batches(pack, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Max("pk", alias_name="pk"))
        .repartition(8)
        .map_batches(
            lambda t: pa.table(
                {
                    "query_id": pc.cast(t["query_id"], pa.int64()),
                    "pred": pa.array(
                        (B - 1)
                        - (
                            t["pk"].to_numpy(zero_copy_only=False) % B
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )
            if t.num_rows
            else pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "pred": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )

    scored = joins.hash_join(
        pred, labels, on="query_id", right_on="lid"
    ).repartition(8)

    def per_class(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lab" not in t.column_names:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "n_correct": pa.array([], pa.int64()),
                }
            )
        correct = (
            t["pred"].to_numpy(zero_copy_only=False)
            == t["lab"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "label": t["lab"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                    "c": pa.array(correct),
                }
            )
            .group_by(["label"])
            .aggregate([("one", "sum"), ("c", "sum")])
        )
        return pa.table(
            {
                "label": g["label"],
                "n": pc.cast(g["one_sum"], pa.int64()),
                "n_correct": pc.cast(g["c_sum"], pa.int64()),
            }
        )

    return (
        scored.map_batches(per_class, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("n", alias_name="n"), Sum("n_correct", alias_name="n_correct")
        )
    )


def embedding_dbscan_clusters(sf_dir: str) -> rd.Dataset:
    """DBSCAN density clustering over the embeddings table (cosine >=
    0.35 neighborhoods, min_pts=2) -> (vec_id, cluster, is_core) for
    every vector: density-connected core points share a cluster (min
    reachable core id), border points adopt the minimum cluster among
    their core neighbors, noise is -1 (ops/cluster.embedding_dbscan —
    composed entirely from verified primitives: the chunk-pair eps
    graph, combiner-first degrees, narrow semi/anti joins, size-gated
    connected components).  The density-based complement of k-means /
    SemDeDup in the clustering family; oracle: cross-join eps graph +
    recursive-CTE reachability in DuckDB."""
    from .ops import cluster

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cluster.embedding_dbscan(emb, eps_cos=0.35, min_pts=2)


def copurchase_edge_churn(sf_dir: str) -> rd.Dataset:
    """TEMPORAL GRAPH churn -> (year_a, year_b, n_a, n_b, n_common,
    jaccard_ppm) for consecutive ship years: how much of the
    co-purchase graph (distinct within-order part pairs whose lineitems
    shipped in that year) survives year over year — the graph-evolution
    diagnostic behind drift detection on relationship data.  Jaccard is
    exact integer ppm.

    Scale shape: ONE distinct pass over (year, order, part) triples,
    the per-year pair explode as a hash join on (year, order), a
    distinct-edge pass, then a composite-key self-join on
    (part_a, part_b, year+1) — every exchange moves narrow key rows;
    the per-year totals are a years-bounded driver fold."""
    from .ops import joins
    from .ops.agg import grouped_count

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey", "l_shipdate"])

    def tri(t: pa.Table) -> pa.Table:
        y = pc.year(t["l_shipdate"])
        g = (
            pa.table(
                {
                    "y": pc.cast(y, pa.int64()),
                    "o": t["l_orderkey"],
                    "p": t["l_partkey"],
                }
            )
            .group_by(["y", "o", "p"])
            .aggregate([])
        )
        return g

    # distinct via the sort-shuffle path, NOT groupby().aggregate: the
    # ~600k one-row groups cost Aggregate's finalizer one Python call
    # each (ops/agg.sorted_distinct rationale); reduceat stays in numpy
    from .ops.agg import sorted_distinct

    triples = (
        sorted_distinct(
            li.map_batches(tri, batch_format="pyarrow"), ["y", "o", "p"]
        )
        .repartition(8)
        .materialize()  # both pair-join sides
    )
    left = triples.map_batches(
        lambda t: pa.table({"y": t["y"], "o": t["o"], "a": t["p"]}),
        batch_format="pyarrow",
    )
    right = triples.map_batches(
        lambda t: pa.table({"y": t["y"], "o": t["o"], "b": t["p"]}),
        batch_format="pyarrow",
    )
    joined = joins.hash_join(
        left, right, on=("y", "o"), num_partitions=8
    ).repartition(8)

    def pair_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "y": pa.array([], pa.int64()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                }
            )
        t = t.filter(pc.less(t["a"], t["b"]))
        return t.select(["y", "a", "b"]).group_by(["y", "a", "b"]).aggregate([])

    edges = (
        sorted_distinct(
            joined.map_batches(pair_distinct, batch_format="pyarrow"),
            ["y", "a", "b"],
        )
        .repartition(8)
        .materialize()  # per-year counts + both churn-join sides
    )

    n_by_year = {
        int(r["y"]): int(r["n"])
        for r in grouped_count(
            edges.map_batches(
                lambda t: t.select(["y"]), batch_format="pyarrow"
            ),
            ["y"],
            "n",
        ).take_all()
    }  # years-bounded

    nxt = edges.map_batches(
        lambda t: pa.table(
            {
                "y2": pc.add(t["y"], 1),
                "a": t["a"],
                "b": t["b"],
            }
        ),
        batch_format="pyarrow",
    )
    cur = edges.map_batches(
        lambda t: pa.table({"y2": t["y"], "a": t["a"], "b": t["b"]}),
        batch_format="pyarrow",
    )
    common = grouped_count(
        joins.hash_join(nxt, cur, on=("y2", "a", "b"), num_partitions=8)
        .repartition(8)
        .map_batches(
            lambda t: t.select(["y2"]) if t.num_rows and "y2" in t.column_names
            else pa.table({"y2": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        ["y2"],
        "n_common",
    ).to_pandas()  # years-bounded
    common_by = dict(
        zip(common["y2"].astype(int) - 1, common["n_common"].astype(int))
    )

    years = sorted(n_by_year)
    rows = []
    for ya in years:
        yb = ya + 1
        if yb not in n_by_year:
            continue
        na, nb = n_by_year[ya], n_by_year[yb]
        nc = int(common_by.get(ya, 0))
        union = na + nb - nc
        rows.append(
            {
                "year_a": ya,
                "year_b": yb,
                "n_a": na,
                "n_b": nb,
                "n_common": nc,
                "jaccard_ppm": (1_000_000 * nc) // union if union else 0,
            }
        )
    out = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("year_a", pa.int64()),
                ("year_b", pa.int64()),
                ("n_a", pa.int64()),
                ("n_b", pa.int64()),
                ("n_common", pa.int64()),
                ("jaccard_ppm", pa.int64()),
            ]
        ),
    )
    return rd.from_arrow(out)


def hot_parts_cms(sf_dir: str) -> rd.Dataset:
    """EXACT frequent parts (>= 45 lineitems) -> (l_partkey, n) via the
    count-min-sketch two-pass pattern (ops/sketch.frequent_items_cms):
    pass 1 folds a global fixed-size CMS (per-batch partials, salted
    sum merge, bounded driver fold); pass 2 broadcasts the sketch once
    and prunes the grouped exact count to items whose estimate clears
    the threshold.  Output is exact because CMS never underestimates
    (no false negatives at the prune) and survivors are re-counted for
    real — the sketch only bounds what the verify shuffle moves.  The
    after-the-fact point-query complement of the Misra-Gries top-k
    (word_topk_approx)."""
    from .ops.sketch import frequent_items_cms

    def local_counts(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"l_partkey": t["l_partkey"]})
            .group_by("l_partkey")
            .aggregate([([], "count_all")])
        )
        return pa.table({"l_partkey": g["l_partkey"], "n": g["count_all"]})

    li = _lineitem(sf_dir, ["l_partkey"])
    counts = li.map_batches(
        local_counts, batch_format="pyarrow"
    ).materialize()  # consumed by both CMS passes
    return frequent_items_cms(counts, "l_partkey", "n", threshold=45)


def copurchase_random_walks(sf_dir: str) -> rd.Dataset:
    """Graph-embedding corpus prep -> (walk_id, pos, node): one
    deterministic 3-step walk per node over the co-purchase graph
    (ops/graph.random_walks — content-addressed md5 step rule, packed
    (hash, nbr) argmin, one frontier join per step).  The DeepWalk /
    node2vec data-generation stage with an exact unrolled SQL twin:
    every step is min(md5(walk:step:nbr) packed with nbr) over the
    frontier's neighbors."""
    from .ops import graph

    li = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    edges = graph.copurchase_edges(li).materialize()
    return graph.random_walks(edges, k_steps=3)


def doc_packing_global(sf_dir: str) -> rd.Dataset:
    """GLOBAL deterministic sequence packing -> (doc_id, n_tokens,
    seq_id): docs in doc_id order fill contiguous 4096-token training
    sequences, seq_id = exclusive-prefix-sum(n_tokens) // 4096 — the
    partitioning-independent, SQL-expressible complement of the
    block-local greedy ``doc_packing`` (whose pack ids depend on block
    boundaries by design).  Runs on the distributed prefix-sum
    primitive (ops/analytic.global_exclusive_prefix_sum: sketch-
    bounded range shards, ONE shuffle, per-shard cumsum, driver folds
    num_shards ints).  Token rule is text_token_counts' oracle
    convention (len of the RE2 \\s+ split, empties included)."""
    from .ops.analytic import global_exclusive_prefix_sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    per = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pc.cast(
                    pc.list_value_length(
                        pc.split_pattern_regex(t["text"], pattern=r"\s+")
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    cum = global_exclusive_prefix_sum(per, "doc_id", "n_tokens")
    return cum.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": df["n_tokens"].to_numpy(np.int64),
                "seq_id": df["cum_before"].to_numpy(np.int64) // 4096,
            }
        ),
        batch_format="pandas",
    )


def interleaved_pack(sf_dir: str) -> rd.Dataset:
    """Interleaved MULTIMODAL sequence packing -> (doc_id, n_spans,
    n_media, cost, seq_id): each interleaved document (text + media
    spans, the flagship's input shape) gets a modality-aware token
    cost — text spans at their whitespace token count, media spans at
    a flat 64-token placeholder (the vision-token budget convention) —
    and docs pack doc-atomically into 4096-token sequences by the same
    global prefix-sum rule as doc_packing_global, so span order inside
    a doc and doc order across the corpus are both preserved (the
    north-rule span-sequence invariant).  Rows-only: the span synth is
    the deterministic Python stand-in for the Lance corpus, so there
    is no SQL twin by nature; invariants are pytest-pinned."""
    from . import pipeline
    from .hashing import ws_tokens
    from .ops.analytic import global_exclusive_prefix_sum

    docs = pipeline.read_documents(sf_dir)

    def span_costs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        spans_col = t["spans"].to_pylist()
        out_n, out_id, out_ns, out_nm, out_cost = [], [], [], [], []
        for did, spans in zip(ids, spans_col):
            ns = len(spans or [])
            nm = 0
            cost = 0
            for s in spans or []:
                if s["kind"] == "text":
                    cost += len(ws_tokens(s["text"] or ""))
                else:
                    nm += 1
                    cost += 64
            # synth keys are "doc-%08d"; the numeric suffix is the
            # total order the packer fills sequences in
            out_n.append(int(str(did).rsplit("-", 1)[-1]))
            out_id.append(str(did))
            out_ns.append(ns)
            out_nm.append(nm)
            out_cost.append(cost)
        return pa.table(
            {
                "doc_n": pa.array(out_n, pa.int64()),
                "doc_id": pa.array(out_id, pa.string()),
                "n_spans": pa.array(out_ns, pa.int64()),
                "n_media": pa.array(out_nm, pa.int64()),
                "cost": pa.array(out_cost, pa.int64()),
            }
        )

    per = docs.map_batches(span_costs, batch_format="pyarrow")
    cum = global_exclusive_prefix_sum(
        per, "doc_n", "cost", keep_cols=["doc_id", "n_spans", "n_media"]
    )
    return cum.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(str),
                "n_spans": df["n_spans"].to_numpy(np.int64),
                "n_media": df["n_media"].to_numpy(np.int64),
                "cost": df["cost"].to_numpy(np.int64),
                "seq_id": df["cum_before"].to_numpy(np.int64) // 4096,
            }
        ),
        batch_format="pandas",
    )


def supplier_shipment_overlaps(sf_dir: str) -> rd.Dataset:
    """Concurrent-shipment diagnostic -> (l_suppkey, n_overlaps): for
    each supplier, how many PAIRS of its lineitems had overlapping
    transit windows [l_shipdate, l_shipdate + l_quantity days] (the
    synth lineitem has no receiptdate; quantity-as-transit-days is the
    deterministic stand-in both sides compute identically) — the
    interval-interval self-join (ops/joins.interval_overlap_pairs:
    grid cells, one equi-join on (supplier, cell), exact-overlap
    filter, ownership-cell dedup-free emission), aggregated
    combiner-first.  Lineitem identity is l_orderkey*10 +
    l_linenumber (linenumber <= 7), dates are int32 epoch days."""
    from .ops.agg import grouped_count
    from .ops.joins import interval_overlap_pairs

    li = _lineitem(
        sf_dir,
        ["l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"],
    )

    def to_intervals(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32())
        q = pc.cast(t["l_quantity"], pa.int64())
        return pa.table(
            {
                "k": t["l_suppkey"],
                "i": pc.add(
                    pc.multiply(pc.cast(t["l_orderkey"], pa.int64()), 10),
                    pc.cast(t["l_linenumber"], pa.int64()),
                ),
                "s": s,
                "e": pc.add(pc.cast(s, pa.int64()), q),
            }
        )

    ints = li.map_batches(to_intervals, batch_format="pyarrow")
    pairs = interval_overlap_pairs(
        ints, key="k", id_col="i", start_col="s", end_col="e", cell=32
    )
    return (
        grouped_count(
            pairs.map_batches(
                lambda t: pa.table({"l_suppkey": t["k"]}), batch_format="pyarrow"
            ),
            ["l_suppkey"],
            "n_overlaps",
        )
    )


def export_orc_roundtrip(sf_dir: str) -> rd.Dataset:
    """ORC sink + source round trip -> (doc_id, fingerprint): write the
    documents table as content-addressed ``.orc`` shards
    (sources/orc.py — the Hive/Presto-world columnar interchange
    member of the sink/source matrix: parquet / hive / CSV / JSONL /
    jsonl.gz / tar / IPC / ORC), read the shards back, and fingerprint
    the text that survived.  The DuckDB twin fingerprints the ORIGINAL
    table, so a hash match proves exact text round trip through the
    ORC encode/decode."""
    import hashlib
    import os
    import shutil

    from .sources import orc

    out_dir = (
        f"/tmp/deepie_export/p{os.getpid()}_orc_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    manifest = orc.write_orc_shards(docs, out_dir, key_col="doc_id")
    assert manifest.count() >= 1
    back = orc.read_orc_shards(out_dir)
    return back.map_batches(_fp_roundtrip, batch_format="pyarrow")


def corpus_health_report(sf_dir: str) -> rd.Dataset:
    """The daily corpus-operations dashboard in ONE small row ->
    (n_docs, n_tokens, n_distinct_texts, n_dup_docs, n_langs,
    n_sources, max_doc_tokens, avg_doc_tokens): total volume, token
    mass, exact-duplicate burden, language/source diversity — the
    composed health check a data team runs before every training
    export, built entirely from combiner-first passes.

    Scale shape: one pass computes per-batch (count, token sum, max)
    partials; distinct-text count rides the exact-dedup fingerprint
    machinery (per-batch md5 distinct -> grouped count, bodies never
    shuffle); lang/source diversity are vocabulary-bounded grouped
    distincts.  Driver folds a handful of scalar partials.  All-integer
    output (avg = integer division) so the oracle hash-matches."""
    from ray.data.aggregate import Max, Sum

    from .ops.dedup import exact_dedup_keys

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def partials(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern_regex(t["text"], pattern=r"\s+")
        )
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array(
                    [int(pc.sum(ntok).as_py() or 0)], pa.int64()
                ),
                "max_doc_tokens": pa.array(
                    [int(pc.max(ntok).as_py() or 0)], pa.int64()
                ),
            }
        )

    base = (
        docs.map_batches(partials, batch_format="pyarrow")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Max("max_doc_tokens", alias_name="max_doc_tokens"),
        )
    )  # driver-side dict of 3 ints
    n_docs = int(base["n_docs"] or 0)
    n_tokens = int(base["n_tokens"] or 0)
    max_tok = int(base["max_doc_tokens"] or 0)

    n_distinct = exact_dedup_keys(docs, "text", "doc_id").count()

    def col_distinct(col: str) -> int:
        return (
            docs.map_batches(
                lambda t, _c=col: t.select([_c]).group_by(_c).aggregate([]),
                batch_format="pyarrow",
            )
            .groupby(col)
            .aggregate(Min(col, alias_name="_m"))
            .count()
        )

    out = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_distinct_texts": pa.array([n_distinct], pa.int64()),
            "n_dup_docs": pa.array([n_docs - n_distinct], pa.int64()),
            "n_langs": pa.array([col_distinct("lang")], pa.int64()),
            "n_sources": pa.array([col_distinct("source")], pa.int64()),
            "max_doc_tokens": pa.array([max_tok], pa.int64()),
            "avg_doc_tokens": pa.array(
                [n_tokens // n_docs if n_docs else 0], pa.int64()
            ),
        }
    )
    return rd.from_arrow(out)
