"""Generic analytics operators (SURVEY §2 #20-24).

The engine stays a full DataFrame engine: TPC-H-style aggregations/joins over
the star schema and window analytics over `events`. All money math goes
through decimal(18,6) (exact, order-insensitive — deterministic on any
partitioning) and is cast back to double only at the output edge. Timestamps
are formatted to strings at the output edge so oracle hashing is
representation-stable.

Scale notes:
- q1/q6: single scan, partial aggregation map-side; filters/pruning reach the
  parquet scan (verify via .explain: PushedFilters, ReadSchema).
- q3: orders⋈customer is dim-filtered (broadcast customer-side after the
  segment filter); lineitem join shuffles on orderkey only.
- events windows: per-user session windows shuffle once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..constants import (
    DEC,
    Q3_DATE,
    Q3_SEGMENT,
    Q4_DATE_HI,
    Q4_DATE_LO,
    Q5_DATE_HI,
    Q5_DATE_LO,
    Q5_REGION,
    Q6_DISC_HI,
    Q6_DISC_LO,
    Q6_QTY,
    Q6_YEAR,
    SESSION_GAP_MS,
)
from ..session import configure


def _dec(c) -> F.Column:
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    li = io.table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC)
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price.cast(DEC) * (one + _dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    cust = io.table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == Q3_SEGMENT)
    orders = io.table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp"))
    li = io.table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
    one = F.lit(1).cast(DEC)
    revenue = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))).cast("double")
    # broadcast ONLY the segment-filtered customer dim; orders is a fact
    # (the date filter passes ~half the table), so lineitem⋈orders must be
    # a shuffle join on orderkey — broadcasting the orders side would scale
    # with the fact table and OOM executors at 100×
    return (
        li.join(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    li = io.table(spark, sf_dir, "lineitem")
    # range predicate, not year(): function calls on the column defeat
    # parquet filter pushdown (verified via explain: PushedFilters)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q6_YEAR + 1}-01-01").cast("timestamp"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders in a date range with ≥1 late-shipped lineitem
    (l_shipdate > o_orderdate), counted by priority.

    The EXISTS becomes a LEFT SEMI join — at scale it shuffles both sides on
    orderkey once and never materializes the multiplicity of matching
    lineitems (no post-join distinct)."""
    configure(spark)
    orders = io.table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_HI).cast("timestamp"))
    )
    li = io.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share
    the nation, restricted to one region and one order year.

    Join shape at scale: nation⋈region is tiny and broadcast into both dim
    paths; customer and supplier are dims broadcast into the fact joins, so
    the only real shuffles are lineitem⋈orders on orderkey."""
    configure(spark)
    region = io.table(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    nation = io.table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = io.table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = io.table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = io.table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_DATE_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        # "local" supplier: same nation as the customer
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: share of revenue from PROMO parts in one ship-year.

    part is a dim → broadcast into the filtered lineitem scan; single
    aggregation, no fact shuffle at all (the final agg is a 1-row reduce)."""
    configure(spark)
    part = io.table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = io.table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q6_YEAR + 1}-01-01").cast("timestamp"))
    )
    one = F.lit(1).cast(DEC)
    disc = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(DEC)))
            .alias("promo"),
            F.sum(disc).alias("total"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"), 6
            ).alias("promo_pct"),
            F.col("total").cast("double").alias("revenue"),
            "n_items",
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by ship year —
    supplier in one nation, customer in the other, both directions.

    Join shape at scale: nation is tiny → broadcast into customer and
    supplier, which are dims → broadcast into the fact joins; the only real
    shuffle is lineitem⋈orders on orderkey. The nation-pair filter happens
    on the broadcast side before the facts are touched."""
    from ..constants import Q7_NATION_A, Q7_NATION_B

    configure(spark)
    nation = io.table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    ).select("n_nationkey", "n_name")
    supp = io.table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = io.table(spark, sf_dir, "customer").join(
        F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    orders = io.table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top customers by revenue lost to returned items
    (l_returnflag = 'R') for orders placed in one quarter.

    Scale shape: customer broadcasts into the aggregated result (join AFTER
    the groupBy on custkey, so the join input is ≤ |customers| aggregated
    rows, not fact rows); lineitem⋈orders shuffles on orderkey."""
    from ..constants import Q10_DATE_HI, Q10_DATE_LO, Q10_TOPK

    configure(spark)
    orders = io.table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = io.table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = io.table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    one = F.lit(1).cast(DEC)
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(Q10_TOPK)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds Q18_QTY, with
    customer and order details.

    Scale shape: the HAVING aggregation partial-aggregates quantity map-side
    and reduces lineitem to ≤ |orders| rows BEFORE any join; orders joins on
    the (tiny) surviving key set; customer broadcasts."""
    from ..constants import Q18_QTY

    configure(spark)
    li = io.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    orders = io.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = io.table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            "c_name",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of orders-per-customer, INCLUDING
    zero-order customers (the outer-join case Q4/Q18 never exercise).

    Scale shape: orders aggregates to per-custkey counts FIRST (partial agg
    map-side, output ≤ |customers| rows), then customer left-joins the
    aggregated rows — both sides shuffle once on custkey; the second
    aggregation keys on the tiny c_count domain.

    Output: (c_count, n_custs)."""
    configure(spark)
    cust = io.table(spark, sf_dir, "customer").select("c_custkey")
    ocnt = (
        io.table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = cust.join(ocnt, cust.c_custkey == ocnt.o_custkey, "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_custs"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) with maximum revenue in one quarter.

    Scale shape: lineitem reduces to per-suppkey revenue (one shuffle,
    partial agg); the scalar max is a 1-row aggregate CROSS-broadcast back
    into the aggregated rows (never into facts); supplier is a dim →
    broadcast. Revenue is decimal-summed then cast, so the max-equality
    predicate is deterministic cross-engine.

    Output: (suppkey, s_name, total_revenue)."""
    from ..constants import Q15_DATE_HI, Q15_DATE_LO

    configure(spark)
    li = io.table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_DATE_HI).cast("timestamp"))
    )
    one = F.lit(1).cast(DEC)
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("max_rev"))
    supp = io.table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("l_suppkey").alias("suppkey"), "s_name", "total_revenue")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue from lineitems matching any of three
    (brand, part-size, quantity-band) alternatives — the disjunctive-
    predicate case Catalyst must NOT naively push as a conjunction.

    Scale shape: part is a dim filtered to the union of brand alternatives
    before broadcast (the disjunction references both sides, so it applies
    post-join, but the brand ∈ {…} prefilter shrinks the broadcast); the
    fact side never shuffles — single scan, 1-row reduce.

    Output: (revenue, n_items)."""
    from ..constants import Q19_ALTS

    configure(spark)
    brands = [b for b, _, _, _ in Q19_ALTS]
    part = (
        io.table(spark, sf_dir, "part")
        .where(F.col("p_brand").isin(brands))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = None
    for brand, size_max, qty_lo, qty_hi in Q19_ALTS:
        alt = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_max))
            & (F.col("l_quantity").between(qty_lo, qty_hi))
        )
        cond = alt if cond is None else cond | alt
    one = F.lit(1).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregation: ROLLUP over (returnflag, linestatus) —
    per-group, per-flag subtotals and the grand total in ONE pass (the
    OLAP-cube surface a reporting layer expects from a full engine).

    Scale shape: rollup's Expand would triple the FACT rows before the
    aggregation (measured 2× slower than the plain groupBy at sf0.1), so
    the facts first collapse to the tiny (flag, status) grid with exact
    decimal sums — one shuffle, partial agg map-side — and the rollup's
    Expand runs over those few aggregated rows. Decimal addition is
    reassociative, so subtotals of group sums are bit-identical to a
    direct rollup. NULL grouping markers are coalesced to 'ALL' at the
    edge so the output is flat scalars.

    Output: (returnflag, linestatus, sum_qty, revenue, n_items)."""
    configure(spark)
    li = io.table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC)
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("q"),
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))).alias("r"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("q").cast("double").alias("sum_qty"),
            F.sum("r").cast("double").alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "revenue",
            "n_items",
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click→purchase conversion funnel: a purchase CONVERTS if the
    same user clicked within the preceding FUNNEL_WINDOW_MS. Same
    carry-forward shape as the as-of join (one shuffle on user_id, no
    range-join candidate explosion); the conversion test is a window delta.

    Output: (user_id, n_purchases, n_converted, conv_rate)."""
    from pyspark.sql.window import Window

    from ..constants import FUNNEL_WINDOW_MS

    configure(spark)
    ev = io.table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_id", "ts", "event_type")
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.unix_millis("ts")).alias("c_ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("click_ms", F.last("c_ms", ignorenulls=True).over(w))
    purchases = carried.where(F.col("event_type") == "purchase").select(
        "user_id",
        (
            F.col("click_ms").isNotNull()
            & ((F.unix_millis("ts") - F.col("click_ms")) <= FUNNEL_WINDOW_MS)
        ).cast("int").alias("converted"),
    )
    return purchases.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("converted").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: a new session starts after a >30min gap per user.

    Batch twin of the streaming sessionizer; single shuffle on user_id.
    """
    from pyspark.sql.window import Window

    configure(spark)
    ev = io.table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms"), _dec("value").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "ts")
    new_sess = F.when(
        F.lag("ms").over(w).isNull() | ((F.col("ms") - F.lag("ms").over(w)) > SESSION_GAP_MS), 1
    ).otherwise(0)
    sess = ev.withColumn("sess_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select("user_id", "sess_id", "session_start", "n_events", "sum_value")
    )


def events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the TOPK_USERS highest-value users per event_type.

    At scale: partial agg map-side on (event_type, user_id), then the rank
    window shuffles only the aggregated rows on event_type. Decimal sum →
    double at the edge keeps the rank key cross-engine deterministic."""
    from ..constants import TOPK_USERS
    from pyspark.sql.window import Window

    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    g = ev.groupBy("event_type", "user_id").agg(
        F.sum(_dec("value")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        g.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOPK_USERS)
        .drop("rn")
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark has no built-in for: each purchase is
    matched to the user's most recent click at or before it (same-ts click
    counts only if its event_id is smaller; no match → NULLs).

    Implemented as union + carry-forward (last ignorenulls over a per-user
    ordered window) rather than a range join: one shuffle on user_id, O(n)
    per user, no candidate-pair explosion — the scalable MERGE_ASOF shape.

    Output: (user_id, purchase_id, purchase_ts, click_id, click_ts)."""
    from pyspark.sql.window import Window

    configure(spark)
    ev = io.table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_id", "ts", "event_type")
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last("c_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"),
    )
    return carried.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date, counted on each
    later activity day as a day offset — the product-analytics matrix every
    events pipeline serves.

    Scale shape: first-seen is a min-aggregation on user_id (partial agg
    map-side); the events⋈cohort join re-shuffles on user_id once (the
    cohort side is ≤ |users| rows, broadcastable when users are a dim); the
    final count-distinct keys on the tiny (cohort_date, day_offset) domain.

    Output: (cohort_date, day_offset, n_active)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_d").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact value percentiles per event type (p50/p90/p99, linear
    interpolation — Spark `percentile` ≡ DuckDB `quantile_cont`).

    At 100 TB the exact sort-based percentile gives way to
    `approx_percentile` (t-digest) — same query shape, bounded memory; the
    exact form is kept here because the oracle can verify it bit-for-bit.

    Output: (event_type, p50, p90, p99, n_events)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style late-shipment audit, adapted to this schema (the
    synthetic lineitem has no shipmode/commit/receipt dates): per order
    priority, how many lineitems shipped more than LATE_DAYS after the order
    date vs total — the on-time-delivery breakdown by urgency class.

    Scale shape: one shuffle (lineitem⋈orders on orderkey), conditional
    partial aggregates map-side after the join, result bounded at the
    priority cardinality. Only 2 orders columns and 2 lineitem columns are
    read (pruned scan).

    Output: (o_orderpriority, n_late, n_total, late_ratio)."""
    from ..constants import Q12_LATE_DAYS

    configure(spark)
    orders = io.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = io.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "o_orderpriority",
            "n_late",
            "n_total",
            F.round(F.col("n_late") / F.col("n_total"), 6).alias("late_ratio"),
        )
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style "suppliers who kept orders waiting": for finished
    ('F') orders with lineitems from >1 distinct supplier where EXACTLY ONE
    supplier shipped late (> LATE_DAYS past the order date), attribute the
    wait to that supplier and count per supplier.

    The classic formulation is a triple self-join on lineitem
    (EXISTS + NOT EXISTS); here it collapses into ONE aggregation: per
    order, count distinct suppliers and distinct LATE suppliers, keep
    (n_supp > 1 AND n_late = 1), then join the single late supplier's key
    back out via max(CASE). At scale that is one orderkey shuffle and a
    supplier-keyed count over qualifying orders — the lineitem table is
    touched once, not three times.

    Output: top-Q21_TOPK (s_name, numwait), ties broken by name."""
    from ..constants import Q21_LATE_DAYS, Q21_TOPK

    configure(spark)
    orders = io.table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
    ).cast("int")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "n_late"
            ),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = io.table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOPK)
    )


def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity matrix: one row per day, one count column per event
    type — the wide monitoring table dashboards read. Spark `pivot` with an
    EXPLICIT value list (constants.EVENT_TYPES): no distinct-discovery job,
    stable output schema at any scale, and the pivot compiles to conditional
    partial aggregates — one small keyed shuffle of (days × types) rows.

    Output: (day, click, error, purchase, signup, view)."""
    from ..constants import EVENT_TYPES

    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct users per event type — approx_count_distinct
    (HyperLogLog++) is THE cardinality path at 100 TB: fixed-size sketch per
    group, map-side mergeable, no distinct-shuffle of the key universe
    (exact count_distinct re-shuffles every distinct (type, user) pair).

    Honestly gated: the sketch estimate is engine-specific, so this entry
    is rows-only in the driver gate; tests/test_operators.py asserts the
    estimate lands within 5% of the exact count, and the exact twin is what
    the SQL-gated events_topk_users family already covers.

    Output: (event_type, n_events, approx_users)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def events_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin of events_approx_distinct: the sketch VALUE is
    engine-specific (rows-only gate), but the sketch CONTRACT — the HLL++
    estimate lands within 5% of the exact distinct count — is deterministic
    and SQL-assertable. The oracle emits the exact counts with a literal
    TRUE per group; this side emits the measured boolean, so the value-hash
    matches iff every group's estimate honours the tolerance AND the exact
    counts agree. Together the two entries gate both the scale path (the
    sketch) and its accuracy claim.

    Output: (event_type, n_events, exact_users, within_5pct)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("_approx"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_5pct"),
    )


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through BUCKETED tables — the co-located
    fact⋈fact join strategy: orders and lineitem are written once bucketed
    (and sorted) on orderkey into the same bucket count, so the join needs
    NO exchange on either side — the scans come up pre-partitioned and
    the only shuffle left in the whole plan is the tiny priority
    aggregate. This is THE layout decision that amortizes at 100 TB:
    every orderkey-keyed join downstream of the write (Q3/Q4/Q12/Q18/Q21
    shapes) stops paying its dominant shuffle. Plan-contract tested: no
    hashpartitioning on orderkey anywhere, bucketed scans on both sides.

    The bucketed copies are written once per (process, sf_dir) — the
    one-time cost a warehouse pays at ingest, not per query.

    Output: (o_orderpriority, revenue, n_items)."""
    import os
    import re as _re

    from ..constants import BUCKET_N, DEC

    configure(spark)
    tag = _re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(sf_dir.rstrip("/")))
    specs = {
        "orders": (["o_orderkey", "o_orderpriority"], "o_orderkey"),
        "lineitem": (["l_orderkey", "l_extendedprice", "l_discount"], "l_orderkey"),
    }
    names = {}
    for t, (cols, key) in specs.items():
        name = f"enn_bucketed_{t}_{tag}"
        names[t] = name
        if not spark.catalog.tableExists(name):
            path = os.path.join(io.scratch_dir(f"bucketed_{t}", sf_dir), "tbl")
            # repartition on the bucket key first: one writer task per
            # bucket → one file per bucket, which is what lets the read
            # side trust sortBy and drop the per-query Sort entirely
            (
                io.table(spark, sf_dir, t)
                .select(*cols)
                .repartition(BUCKET_N, F.col(key))
                .write.bucketBy(BUCKET_N, key)
                .sortBy(key)
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(name)
            )
    orders = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    # hint("merge"): at gate scale orders fits the broadcast threshold, which
    # would hide the point — force the sort-merge path to PROVE the bucketed
    # sides join with no exchange. (OSS Spark does not trust sortBy order on
    # read — SPARK-19256 — so the per-bucket sorts remain; the eliminated
    # exchange is the part that matters at 100 TB.)
    return (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health: doc count, token volume, mean quality —
    the monitoring rollup a data pipeline reports per crawl/source."""
    from ..operators.textops import quality_score

    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True).select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "quality", "n_tokens")
    return (
        docs.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum(F.col("quality").cast(DEC)).cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_quality"
            ),
        )
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) 1-hour windows every 15 minutes — the overlapping-
    window rollup dashboards query ("events in the last hour, refreshed
    every 15"). Each event lands in exactly 4 windows.

    Scale shape: `F.window(ts, 1h, 15m)` expands each row to its 4 windows
    BEFORE the aggregation, so partial aggregation still combines map-side
    and the shuffle carries only (window, partial-agg) rows — never 4× the
    events. Decimal sums keep the totals order-insensitive.

    Output: (window_start, n_events, sum_value)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction (`props` is a JSON string):
    per event_type stats of the numeric `$.k` property — the
    schema-on-read path every event pipeline needs for loosely-typed
    payloads. get_json_object evaluates JVM-side (Catalyst JsonPath), no
    Python in the pass; the aggregation is the usual decimal-exact rollup.

    Output: (event_type, n_events, min_k, max_k, avg_k)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(
                F.sum(F.col("k").cast(DEC)).cast("double") / F.count("k"), 6
            ).alias("avg_k"),
        )
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: events whose value deviates more than
    ZSCORE_TAU population standard deviations from their event_type mean.

    Determinism at any partitioning: the per-type moments come from EXACT
    decimal sums (Σv in decimal(18,6), Σ round(v²,6) in decimal(28,6) —
    order-insensitive), cast to double once; mean/std/z are then pure
    double arithmetic on identical inputs on both engines. The tiny
    per-type moment table broadcasts back onto the scan — the fact rows
    never shuffle.

    Output: (event_id, event_type, value, z) for |z| > ZSCORE_TAU."""
    from ..constants import ZSCORE_TAU

    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("s1"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("s2"),
    )
    mom = mom.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(mom), "event_type")
        .where(F.abs(z) > F.lit(ZSCORE_TAU))
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


def events_user_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running lifetime value per user: cumulative event value in event-time
    order — the classic ordered-window analytic (running totals).

    One shuffle on user_id; within the frame the sum runs in DECIMAL, so
    the prefix sums are exact and identical on any engine (a double
    running sum would be order-dependent only in its rounding; decimal
    removes even that). Ties in ts break on event_id for a total order.

    Output: (event_id, user_id, cum_value)."""
    from pyspark.sql.window import Window

    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("cum_value"),
    )


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness per day — the product-analytics headline
    metric. WAU needs a 7-day DISTINCT count, which no window frame
    supports; the scalable formulation: collapse to distinct (user, day)
    once, EXPLODE each pair onto the 7 target days it contributes to
    (a fixed ×7, orders of magnitude below raw events), and aggregate
    ONCE — per (user, target-day) keep an active-on-that-day flag, then
    per target day wau = row count and dau = flag sum. DAU riding the
    same tree (instead of a second countDistinct branch) means the
    events table is scanned once, not twice, and no multi-distinct
    Expand appears. Phantom trailing days (tday past the last observed
    day) are exactly the dau = 0 rows, so the observed-day broadcast
    join collapses to a filter.

    Output: (day, dau, wau, stickiness = dau/wau)."""
    configure(spark)
    ev = io.table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("tday"),
    )
    per_user = contrib.groupBy("user_id", "tday").agg(
        F.max((F.col("tday") == F.col("day")).cast("int")).alias("act")
    )
    agg = per_user.groupBy("tday").agg(
        F.sum("act").alias("dau"), F.count(F.lit(1)).alias("wau")
    )
    return agg.where(F.col("dau") > 0).select(
        F.date_format("tday", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling activity per user, evaluated AT each event —
    the time-RANGE window analytic (feature-engineering staple: "activity in
    the last N days" as a model feature), distinct from the ROWS frames of
    events_user_ltv and the fixed hop grid of events_sliding_window.

    RANGE frame over epoch-millis: rows with equal ts are frame peers on
    every engine, so ties need no break for determinism; the value sum runs
    in DECIMAL (exact, order-free). One user-keyed exchange, one sort —
    the same shape at 100 TB with users as the distribution key.

    Output: (event_id, user_id, n_7d, value_7d)."""
    from pyspark.sql.window import Window

    configure(spark)
    seven_days_ms = 7 * 86400 * 1000
    ev = io.table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ms"), _dec("value").alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms")
        .rangeBetween(-(seven_days_ms - 1), 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum("v").over(w).cast("double").alias("value_7d"),
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: of the revenue from customers
    in one region, the fraction supplied by one nation, per order year.

    Scale shape: nation⋈region prunes customers to the region BEFORE any
    fact is touched; customer and supplier collapse to broadcast key sets /
    flags; lineitem⋈orders is the only real shuffle (orderkey). The share
    division happens on per-year decimal-exact sums — a handful of rows.

    Output: (order_year, mkt_share, region_revenue)."""
    from ..constants import Q8_NATION, Q8_REGION

    configure(spark)
    nation = io.table(spark, sf_dir, "nation")
    region = io.table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    rnation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = io.table(spark, sf_dir, "customer").join(
        F.broadcast(rnation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = (
        io.table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", (F.col("n_name") == Q8_NATION).alias("is_target"))
    )
    orders = io.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast(DEC)
    amount = _dec("l_extendedprice") * (one - _dec("l_discount"))
    zero = F.lit(0).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("is_target"), amount).otherwise(zero)).alias("tgt"),
            F.sum(amount).alias("tot"),
        )
        .select(
            "order_year",
            F.round(F.col("tgt").cast("double") / F.col("tot").cast("double"), 6).alias(
                "mkt_share"
            ),
            F.col("tot").cast("double").alias("region_revenue"),
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by supplier nation and year, for
    parts whose name contains Q9_PART_WORD. The schema has no partsupp, so
    profit is the discounted revenue (documented substitution for
    `amount - ps_supplycost*qty`); the join/aggregation shape is Q9's.

    Scale shape: the name-filtered part set broadcasts into lineitem (the
    filter prunes facts before the orderkey shuffle); supplier⋈nation is a
    broadcast chain; lineitem⋈orders shuffles once on orderkey.

    Output: (nation, order_year, profit)."""
    from ..constants import Q9_PART_WORD

    configure(spark)
    part = io.table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_PART_WORD)
    ).select("p_partkey")
    nation = io.table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = io.table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    orders = io.table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast(DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("profit")
        )
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier diversity: distinct suppliers per (brand,
    type, size) bucket, excluding one brand and restricted to a size list.
    The schema has no partsupp; lineitem's (l_partkey, l_suppkey) is the
    part↔supplier association (documented substitution).

    Scale shape: the filtered part dim broadcasts into the fact scan; the
    distinct + count pipeline shuffles once on the grouping key after a
    map-side distinct partial.

    Output: (p_brand, p_type, p_size, supplier_cnt)."""
    from ..constants import Q16_EXCL_BRAND, Q16_SIZES

    configure(spark)
    part = io.table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND) & F.col("p_size").isin(Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = io.table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: lineitems of one brand
    whose quantity is below Q17_QTY_FRAC × that part's average quantity —
    the correlated-aggregate-subquery pattern, decorrelated Spark-style.

    Scale shape: the per-part average is an aggregation of the BRAND's
    lineitems only (part filter broadcasts into the scan first), producing a
    small per-partkey threshold table that broadcasts back onto the same
    filtered scan — the correlated subquery becomes two passes over a
    pruned fact subset, no row-at-a-time re-execution, facts never shuffle.

    Output: 1 row (avg_yearly, n_items)."""
    from ..constants import Q17_BRAND, Q17_QTY_FRAC

    configure(spark)
    part = io.table(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    avg_q = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        li.join(F.broadcast(avg_q), "l_partkey")
        .where(F.col("l_quantity") < F.lit(Q17_QTY_FRAC) * F.col("aq"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style dormant high-balance customers: above-average account
    balance (among positive balances) and NO orders in the dormancy window
    — scalar subquery + anti-join, grouped by nation (the schema has no
    phone column; nation replaces the country-code prefix).

    Scale shape: the global average is a 1-row aggregate cross-broadcast
    into the customer scan; the anti-join shuffles customers once against
    the date-pruned orders keys (both sides pre-projected to the key); the
    final rollup groups a few hundred survivors by nationkey.

    Output: (nation, n_cust, total_acctbal)."""
    from ..constants import Q22_DATE_HI, Q22_DATE_LO

    configure(spark)
    cust = io.table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    active = (
        io.table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q22_DATE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q22_DATE_HI).cast("timestamp"))
        )
        .select("o_custkey")
    )
    nation = io.table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (r8 — completes the 22-query
    suite): for each part matching a type/size filter, the region's
    supplier(s) offering it at the lowest supply cost. No partsupp in the
    schema, so supply cost = MIN lot price observed in lineitem per
    (part, supplier) pair (documented substitution; exact double MIN, no
    division, so the engine comparison is bit-stable).

    Scale shape (r9 — prune BEFORE the shuffle, matching q11/q20): the
    type/size part filter (~1/150 of parts) and the region's supplier key
    set (~1/5 of suppliers) both broadcast into the fact SCAN — as an
    inner join and a semi-join respectively — so the one real shuffle
    (the (partkey, suppkey) MIN aggregation) carries only ~0.1% of the
    distinct-pair universe instead of all of it. Supplier attributes
    re-join the dim-sized aggregate broadcast-side; the per-part MIN
    re-join is a broadcast of a dim-sized aggregate. MIN per
    (part, supplier) is over the same rows either way, and the post-agg
    inner join dropped exactly the groups the semi-join now prunes, so
    results are identical (same oracle). ORDER BY is a total order
    (acctbal desc, nation, supplier, partkey), so the TOPN cut is
    deterministic on any partitioning. Plan contract:
    tests/test_plans.py::test_q2_broadcasts_part_below_aggregate.

    Output: (s_acctbal, s_name, nation, p_partkey, p_name, supply_cost)."""
    from ..constants import Q2_MAX_SIZE, Q2_REGION, Q2_TOPN, Q2_TYPE

    configure(spark)
    part = io.table(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    ).select("p_partkey", "p_name")
    region = io.table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    nation = io.table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    rsupp = io.table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    cost = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(rsupp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    sc = cost.join(F.broadcast(rsupp), F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = sc.groupBy("p_partkey").agg(F.min("supply_cost").alias("min_cost"))
    return (
        sc.join(
            F.broadcast(min_cost.withColumnRenamed("p_partkey", "mc_partkey")),
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(Q2_TOPN)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose value supplied by one
    nation's suppliers exceeds a fraction of that nation's total supplied
    value. Value = exact-decimal SUM of lot prices per part (partsupp
    substitution via lineitem, matching q16/q9).

    Scale shape: the nation's supplier key set broadcasts into the fact
    scan (prunes before the shuffle); per-part value is one map-side-
    combined aggregation on partkey; the national total is a 1-row
    aggregate cross-broadcast back — the scalar subquery never re-executes
    per row. Threshold compare happens in double on both engines from the
    same exact decimals.

    Output: (partkey, value), value > Q11_FRACTION × total."""
    from ..constants import Q11_FRACTION, Q11_NATION

    configure(spark)
    nation = io.table(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    nsupp = io.table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(nsupp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .where(
            F.col("v").cast("double")
            > F.lit(Q11_FRACTION) * F.col("t").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("value"),
        )
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style potential part promotion: suppliers in one nation
    holding excess availability of a name-filtered part — available
    quantity > frac × the quantity they shipped of it in the target year.
    No partsupp, so availability = quantity shipped AFTER the target year
    (future stock proxy; documented substitution, mirrored in the oracle —
    without it `total > frac × in-year` would be vacuously true).

    Scale shape: the name-filtered part set broadcasts into both fact
    scans; in-year and post-year quantities are two partkey+suppkey
    aggregations of disjoint date slices of the SAME pruned scan; the
    candidate supplier set is KB-sized and semi-joins the nation's
    suppliers broadcast-side.

    Output: (s_name, s_acctbal)."""
    from ..constants import Q20_AVAIL_FRAC, Q20_NATION, Q20_PART_WORD, Q20_YEAR

    configure(spark)
    gparts = io.table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q20_PART_WORD)
    ).select("p_partkey")
    li = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(F.broadcast(gparts), F.col("l_partkey") == F.col("p_partkey"))
    )
    y_lo = F.lit(f"{Q20_YEAR}-01-01").cast("timestamp")
    y_hi = F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp")
    shipped = (
        li.where((F.col("l_shipdate") >= y_lo) & (F.col("l_shipdate") < y_hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_y"))
    )
    avail = (
        li.where(F.col("l_shipdate") >= y_hi)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("avail_qty"))
    )
    cand = (
        avail.join(shipped, ["l_partkey", "l_suppkey"])
        .where(
            F.col("avail_qty").cast("double")
            > F.lit(Q20_AVAIL_FRAC) * F.col("qty_y").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = io.table(spark, sf_dir, "nation").where(F.col("n_name") == Q20_NATION)
    return (
        io.table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cand), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
