"""TPC-H-shaped analytical benchmark queries over the synthetic star
schema. These anchor bench.py against BASELINE and exercise the
join/agg machinery at scale.

Scale notes (100 TB): every query filters the fact table *before*
joining (predicate pushdown to the parquet scan), joins dimensions
via broadcast (no fact-table shuffle for dims), and aggregates with
map-side partial combine.

Determinism note: money columns are exact 2-decimal values stored as
double; we cast to DECIMAL before summing so aggregates are exact
and order-independent — bit-identical across engines (and across
cluster re-runs), then surfaced as rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast


def _dec(col: str, scale: int = 2) -> Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Pricing summary report: group the filtered fact table by the
    two flag columns; sums/averages in exact decimal. Single scan,
    map-side combine, O(|groups|) shuffle."""
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 4).alias(
                "avg_price"
            ),
            F.round(F.sum(_dec("l_discount")).cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Top-10 orders by revenue for one market segment. customer is
    broadcast; orders⋈lineitem is the only shuffle. The final ORDER
    BY+LIMIT is TakeOrderedAndProject (no global sort)."""
    cust = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ord_f = orders.where(F.col("o_orderdate") < F.lit("1998-03-15")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > F.lit("1995-03-15")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(
            ord_f.join(broadcast(cust), ord_f.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue by nation where customer and supplier share a nation.
    All dimensions broadcast; lineitem shuffles once (to orders)."""
    r = region.where(F.col("r_name") == "ASIA")
    n = nation.join(broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = customer.join(
        broadcast(n.select(F.col("n_nationkey").alias("c_nk"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "c_nationkey")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """Pure filter+sum over the fact table — the pushdown showcase.
    All predicates reach the parquet scan."""
    return lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue")
    )


def q4_late_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-priority checking (q4 shape on the reduced schema):
    orders with at least one line item shipped after the order date,
    counted per priority. LEFT SEMI join — the EXISTS never
    materializes matching line items, and Spark builds the hash side
    from the pre-projected two columns only."""
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Returned-item reporting: top-20 customers by revenue of
    returned ('R') line items. Fact-fact join shuffles once on the
    order key; customer broadcasts; TakeOrderedAndProject top-k."""
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Promotion revenue share for one month: conditional decimal
    aggregate over the part-joined facts (part broadcasts), ratio in
    a fixed double op order so engines agree bit-for-bit."""
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(
        broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total = F.sum(revenue)
    return joined.agg(
        F.round(
            promo.cast("double") * 100.0 / total.cast("double"), 4
        ).alias("promo_revenue_pct")
    )


def q7_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """Volume shipping between two nations, by (supplier nation,
    customer nation, year). Both nation-tagged dimension sides
    broadcast onto the fact scan; the only shuffle is
    lineitem⋈orders and the final tiny group."""
    n2 = nation.where(F.col("n_name").isin(nation_a, nation_b))
    s = supplier.join(
        broadcast(n2.select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    c = customer.join(
        broadcast(n2.select(F.col("n_nationkey").alias("c_nk"),
                            F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Top supplier by quarterly revenue: per-supplier decimal sums,
    then an equality join against the broadcast scalar max — exact
    (decimal) so the max-match is deterministic across engines."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(broadcast(max_rev), rev.total_rev == max_rev.max_rev)
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: int = 180,
) -> DataFrame:
    """Large-volume customers: orders whose line items sum past a
    quantity threshold. The HAVING runs on the fact-side aggregate
    BEFORE the join back (tiny hash side), customer broadcasts, and
    the top-100 is TakeOrderedAndProject."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", F.col("sum_qty").cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """OR-of-ANDs predicate revenue (q19 shape on the reduced
    schema): part broadcasts, and the disjunction stays a single
    codegen'd filter on the joined stream — no union-of-scans."""
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#6") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.where(cond).agg(F.sum(revenue).cast("double").alias("revenue"))


def q22_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customers with above-average balances and no recent orders
    (q22 shape; "recent" because every synthetic customer has some
    order): the scalar average broadcasts (exact decimal sum /
    count, one double division), the recency check is a LEFT ANTI
    join whose date filter pushes to the orders scan, and the
    per-nation rollup is a tiny group."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = (
        customer.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    no_orders = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
