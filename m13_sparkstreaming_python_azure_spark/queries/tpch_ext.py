"""TPC-H decision-support shapes beyond the reference's own queries —
EXISTS/NOT-EXISTS semi- and anti-join composition, decorrelated scalar
subqueries, outer-join double aggregation, having + join-back, and
conditional-ratio aggregates (SURVEY.md §2.3/§2.4 GAP rows).

The driver fixtures have no `partsupp` table and no
`l_shipmode/l_commitdate/l_receiptdate/c_phone` columns, so Q2/Q11/Q20
are out of reach and Q4/Q9/Q12/Q16/Q17/Q21/Q22 are *shape-preserving
adaptations*: the join/subquery structure (the part Catalyst has to
plan) is faithful; the filter columns are remapped to what the fixtures
carry. Each docstring states the mapping.

Scale notes (100 TB): nation/supplier/region sides are broadcast
explicitly (bounded dimension tables); part/orders joins carry no hint
so AQE picks broadcast at test scale but falls back to shuffle joins
when the dimension outgrows the threshold on a real cluster. Self-joins
on lineitem shuffle on l_orderkey only, with id-projected probe sides.

Float discipline per .claude/skills/verify/SKILL.md: exact decimal sums,
floor(x*1eN + 0.5) quotient rounding, multiply-through instead of
comparing against a float average (5*qty*cnt < sum, bal*cnt > total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table

_DEC = "decimal(18,6)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with at least one
    late line (EXISTS correlated semi-join). `late` is adapted to
    l_shipdate > o_orderdate + 60 days (fixtures lack l_commitdate).
    The semi-join carries the correlated inequality in the join
    condition, so Spark plans one shuffled left-semi hash join — no
    per-row subquery."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_discount_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single selective scan-aggregate — the canonical
    predicate-pushdown probe (shipdate range + discount band + quantity
    cap all reach the parquet scan; no join, no shuffle beyond the
    single-row final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC)),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) across a
    5-way join with a substring filter on p_name. Fixtures lack
    partsupp, so unit cost is adapted to p_retailprice * 0.8 (same join
    graph minus the partsupp hop). Profit terms are computed in double
    with a fixed expression order, then summed exactly as decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.8) * F.col("l_quantity")
    ).cast(_DEC)
    joined = (
        li.join(part.select("p_partkey", "p_retailprice"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts via a
    filtered LEFT OUTER join (customers with zero qualifying orders must
    appear with c_count = 0) and a second aggregation over the first —
    the double-agg shape. The ON-clause-only filter is expressed by
    pre-filtering the preserved-null side before the outer join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    ).select("o_custkey", "o_orderkey")
    counts = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-ratio aggregate (CASE inside sum ÷ total
    sum) over the part join for one ship month. Both sums are exact
    decimals; the percentage quotient is rounded with the floor trick so
    both engines divide bit-identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    num = F.round(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _disc_price())
            .otherwise(F.lit(0.0))
            .cast(_DEC)
        ),
        2,
    ).cast("double")
    den = F.round(F.sum(_disc_price().cast(_DEC)), 2).cast("double")
    return joined.agg(
        (F.floor(F.lit(100) * num / den * 10000 + F.lit(0.5)) / 10000).alias(
            "promo_revenue_pct"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-max subquery join-back — keep
    the supplier(s) whose quarterly revenue equals the maximum. Revenue
    is a rounded exact decimal cast to double, so the equality join
    against max() is deterministic. The single-row max side is
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price().cast(_DEC)), 2)
        .cast("double")
        .alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue.join(
            F.broadcast(best),
            F.col("total_revenue") == F.col("best_revenue"),
        )
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT IN supplier exclusion. Fixtures lack partsupp, so the
    part↔supplier relation comes from lineitem; the excluded set is
    adapted to suppliers with s_acctbal < 100 (no comment column). The
    NOT IN (non-nullable, non-empty) compiles to a broadcast anti-join
    before the wide distinct aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 27, 33, 40)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 100
    ).select("s_suppkey")
    kept = li.join(
        F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    joined = kept.join(
        part.select("p_partkey", "p_brand", "p_type", "p_size"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue from small-quantity lines —
    correlated per-part average decorrelated into a groupBy + join-back.
    The float-average comparison l_quantity < 0.2 * avg(l_quantity) is
    multiplied through to 5*qty*cnt < sum(qty), which is exact in
    doubles (integral quantities), so both engines agree at the
    boundary. Brand filter stands in for Q17's brand+container."""
    part3 = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        part3, F.col("l_partkey") == F.col("p_partkey")
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("sumq")
    )
    joined = li.join(stats, F.col("l_partkey") == F.col("sp_partkey")).filter(
        F.lit(5) * F.col("l_quantity") * F.col("cnt") < F.col("sumq")
    )
    total = F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2).cast("double")
    return joined.agg(
        (F.floor(total / 7 * 100 + F.lit(0.5)) / 100).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds a threshold
    (HAVING over a groupBy), joined back to orders + customer. The
    having-side aggregate runs first on the narrow (orderkey, quantity)
    projection; the survivors (≈1%) then drive the join, so the wide
    columns never shuffle for disqualified orders."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose line was the *only* late one in
    a multi-supplier finalized order — EXISTS (another supplier's line
    in the order) AND NOT EXISTS (another supplier's late line).
    `late` adapted to l_shipdate > o_orderdate + 90 days. Both
    existence checks are orderkey-shuffled semi/anti self-joins with
    id-only probe sides; the supplier name join is broadcast."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li_f = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
    late = li_f.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    l1 = late.join(
        others,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the
    cohort-average balance with no recent orders, aggregated per
    segment. c_mktsegment stands in for the phone country code; "no
    orders at all" (vacuous in the fixtures) becomes "no orders since
    2000-01-01". The scalar avg subquery is decorrelated to a broadcast
    single-row cross join, and the average comparison is multiplied
    through (bal*cnt > total, exact decimals)."""
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(segs)
    )
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total"),
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(stats)).filter(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt") > F.col("total")
    )
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("totacctbal"),
    )


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in for the missing `partsupp` fixture: one row per observed
    (l_partkey, l_suppkey) pair with min unit price as the supply cost and
    total shipped quantity as availability. Derived identically in the
    DuckDB oracles, so the Q2/Q11/Q20 *shapes* — the part Catalyst has to
    plan — run against a real multi-key aggregate, not a fake table."""
    li = load_table(spark, sf_dir, "lineitem")
    # Hash-partitioning on l_partkey alone satisfies the (l_partkey,
    # l_suppkey) clustering this aggregate requires AND the per-part
    # window/aggregate consumers downstream (Q2's min-cost window), so the
    # whole chain runs off this single shuffle.
    return li.repartition("l_partkey").groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("ps_availqty"),
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within one region, for a
    part-type bracket. The correlated min-cost subquery is decorrelated to
    a per-part window min over the region-filtered offers — and because the
    offer aggregate and the window share the `l_partkey` clustering, an
    explicit repartition on it makes BOTH run off ONE shuffle.

    `ps_supplycost` = min observed unit price (exact double min — equality
    against the window min is bit-safe in both engines)."""
    ps = _derived_partsupp(spark, sf_dir).select(
        "l_partkey", "l_suppkey", "ps_supplycost"
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 5)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sup_region = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        ps.join(F.broadcast(parts.select("p_partkey", "p_name")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup_region), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("__min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("__min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").alias("ps_partkey"),
            "p_name",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
    )


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, kept when above a fixed fraction (0.1%) of that nation's
    total — a decorrelated global-scalar subquery, broadcast as a
    single-row cross join with the comparison multiplied through
    (value * 1000 > total, exact decimals)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    national = li.join(
        F.broadcast(
            sup.join(
                F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
            ).select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    value = national.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("__value")
    )
    total = value.agg(F.sum("__value").alias("__total"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("__value") * 1000 > F.col("__total"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("__value", 2).cast("double").alias("value"),
        )
    )


def q_ship_priority_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lineitems bucketed by order-to-ship delay (the
    fixture stand-in for l_shipmode), counting critical-priority vs other
    orders per bucket with conditional aggregates — one fact-fact shuffle
    join on l_orderkey, then a tiny grouped count."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1996-01-01"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("__delay", delay)
        .filter((F.col("__delay") >= 30) & (F.col("__delay") <= 119))
        .groupBy(
            F.floor(F.col("__delay") / 30).cast("int").alias("delay_bucket")
        )
        .agg(
            F.count_if(critical).alias("high_line_count"),
            F.count_if(~critical).alias("low_line_count"),
        )
    )


def q_excess_supply_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of a name-matched part family whose
    total observed quantity exceeds 5× what they shipped in 1997 — the
    nested IN-subquery chain (parts → part-supplier availability →
    suppliers) planned as a broadcast semi-join into an aggregate join,
    then a semi-join onto supplier with the nation dimension broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _derived_partsupp(spark, sf_dir).select(
        "l_partkey", "l_suppkey", "ps_availqty"
    )
    target_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    qty97 = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__qty97"))
    )
    excess = (
        ps.join(
            F.broadcast(target_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(qty97, on=["l_partkey", "l_suppkey"])
        .filter(F.col("ps_availqty") > F.col("__qty97") * 5)
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        sup.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


TPCH_EXT_QUERIES = {
    "order_priority_count": q_order_priority_count,
    "discount_revenue_forecast": q_discount_revenue_forecast,
    "product_type_profit": q_product_type_profit,
    "customer_order_distribution": q_customer_order_distribution,
    "promo_revenue_ratio": q_promo_revenue_ratio,
    "top_supplier_revenue": q_top_supplier_revenue,
    "supplier_part_variety": q_supplier_part_variety,
    "small_quantity_revenue": q_small_quantity_revenue,
    "large_volume_customers": q_large_volume_customers,
    "waiting_suppliers": q_waiting_suppliers,
    "idle_customer_balance": q_idle_customer_balance,
    "min_cost_supplier": q_min_cost_supplier,
    "important_stock": q_important_stock,
    "ship_priority_delay": q_ship_priority_delay,
    "excess_supply_suppliers": q_excess_supply_suppliers,
}

TPCH_EXT_ORACLES = {
    "min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS ps_supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        offers AS (
            SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
                   p_partkey AS ps_partkey, p_name,
                   ps_supplycost,
                   min(ps_supplycost) OVER (PARTITION BY l_partkey) AS mc
            FROM ps
            JOIN part ON l_partkey = p_partkey
                     AND p_type = 'LARGE' AND p_size <= 5
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        )
        SELECT s_acctbal, s_name, n_name, ps_partkey, p_name,
               round(ps_supplycost, 2) AS supplycost
        FROM offers WHERE ps_supplycost = mc
    """,
    "important_stock": """
        WITH value AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
            GROUP BY l_partkey
        ),
        tot AS (SELECT sum(v) AS total FROM value)
        SELECT l_partkey AS ps_partkey,
               CAST(round(v, 2) AS DOUBLE) AS value
        FROM value, tot
        WHERE v * 1000 > total
    """,
    "ship_priority_delay": """
        SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 30)
                    AS INT) AS delay_bucket,
               count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
                   AS high_line_count,
               count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                   AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND date_diff('day', o_orderdate, l_shipdate) BETWEEN 30 AND 119
        GROUP BY 1
    """,
    "excess_supply_suppliers": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        s97 AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty97
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM ps JOIN s97 USING (l_partkey, l_suppkey)
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
            )
            AND ps_availqty > qty97 * 5
        )
    """,
    "order_priority_count": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "discount_revenue_forecast": """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "product_type_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   - p_retailprice * 0.8 * l_quantity
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY n_name, year(o_orderdate)
    """,
    "customer_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> 'F'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "promo_revenue_ratio": """
        SELECT floor(100
                     * CAST(round(sum(CAST(CASE WHEN p_type = 'PROMO'
                                           THEN l_extendedprice * (1 - l_discount)
                                           ELSE 0.0 END AS DECIMAL(18,6))), 2)
                            AS DOUBLE)
                     / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                           AS DECIMAL(18,6))), 2) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "top_supplier_revenue": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(18,6))), 2) AS DOUBLE)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "supplier_part_variety": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 14, 20, 27, 33, 40)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 100
          )
        GROUP BY p_brand, p_type, p_size
    """,
    "small_quantity_revenue": """
        WITH li AS (
            SELECT l.* FROM lineitem l
            JOIN part p ON l_partkey = p_partkey AND p_brand = 'Brand#3'
        ),
        st AS (
            SELECT l_partkey, count(*) AS cnt, sum(l_quantity) AS sumq
            FROM li GROUP BY l_partkey
        )
        SELECT floor(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                          AS DOUBLE) / 7 * 100 + 0.5) / 100 AS avg_yearly,
               count(*) AS n_items
        FROM li JOIN st USING (l_partkey)
        WHERE 5 * l_quantity * cnt < sumq
    """,
    "large_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               sum_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        ) ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND o3.o_orderstatus = 'F'
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
    """,
    "idle_customer_balance": """
        WITH stats AS (
            SELECT count(*) AS cnt,
                   sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
              AND c_acctbal > 0
        )
        SELECT c_mktsegment,
               count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS totacctbal
        FROM customer, stats
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
          AND CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_mktsegment
    """,
}
