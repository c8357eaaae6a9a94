"""Extended TPC-H-shaped workloads (Q4/Q7/Q10/Q12/Q13/Q14/Q15/Q18/Q19/Q22
adapted to the fixture schema — no partsupp/comment/shipmode columns, so the
classic predicates are mapped onto the columns that exist; see TESTDATA.md).

These widen the analytics surface beyond analytics.py (Q1/Q3/Q5/Q6) with the
operator shapes the originals exercise:

- Q4  : EXISTS semi join with a non-equi component (l_shipdate > o_orderdate)
- Q7  : nation-pair volume — disjunctive join-level predicate + year rollup
- Q10 : returned-item revenue, deterministic top-20
- Q12 : CASE-inside-SUM conditional aggregation over a lateness predicate
- Q13 : left-outer count + histogram-of-counts (double aggregation)
- Q14 : conditional-revenue ratio (LIKE predicate, single-row result)
- Q15 : top supplier(s) by revenue = scalar-max subquery against an aggregate
- Q18 : HAVING on a grouped fact, joined back to dims
- Q19 : OR-of-AND-groups disjunctive predicate pushed into a part join
- Q22 : substring-derived grouping + scalar avg subquery + anti join

Scale notes: dims (nation/supplier/part at these SFs) broadcast; fact-fact
joins shuffle on the orderkey; every aggregation is partial+final. The Q15
global max is a 1-row broadcast cross join, never a single-partition window.
Money sums use the exact integer-cents scheme from analytics.py.

Reference parity anchor: the reference's own validation layer is plain
aggregation SQL over diff_result (/root/reference/tools/step_ledger.py:253-259,
README.md:186-196); these queries are that layer generalized to the warehouse
tables a checkatron user diffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from checkatron_spark.analytics import _cents, _dollars, _revenue_cents, _REV_SQL
from checkatron_spark.sources.tables import load_table

__all__ = ["QUERIES", "oracles"]


def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a quarter having >=1 line shipped after the order
    date (commit/receipt adapted to l_shipdate), counted per priority.
    The EXISTS becomes a left-semi join whose condition carries the
    non-equi comparison alongside the orderkey equi-key."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-07-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-10-01'"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flowing between two nations in either direction,
    by (supplier nation, customer nation, ship year). The nation-pair
    disjunction filters AFTER the dim joins (both dims broadcast)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dollars(F.sum(_revenue_cents())).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(_rev_c) AS DOUBLE) / 100.0 AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year, {_REV_SQL} AS _rev_c
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer in a quarter,
    deterministic top-20 (row_number, custkey tiebreak)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-10-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01'"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    grouped = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(F.sum(_revenue_cents()).alias("_rev_c"))
    )
    # Distributed top-k (TakeOrderedAndProject), then rank over <=20 rows —
    # avoids funnelling one-row-per-customer through a single window task.
    top = grouped.orderBy(
        F.col("_rev_c").desc(), F.col("c_custkey").asc()
    ).limit(20)
    w = Window.orderBy(F.col("_rev_c").desc(), F.col("c_custkey").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
            _dollars(F.col("_rev_c")).alias("revenue"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


Q10_SQL = f"""
WITH grouped AS (
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment, SUM({_REV_SQL}) AS _rev_c
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
)
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       CAST(_rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (ORDER BY _rev_c DESC, c_custkey) AS rnk
      FROM grouped)
WHERE rnk <= 20
"""


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: lines shipped >60 days after ordering (shipmode adapted to
    l_linestatus buckets), with CASE-inside-SUM splitting high- vs
    low-priority orders."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL '60' DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL '60' DAY
GROUP BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts — a left outer
    join (customers with zero qualifying orders count as 0) feeding a
    second aggregation over the counts themselves."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: share of a month's revenue from promo parts — LIKE
    predicate inside conditional aggregation, single-row ratio result.
    Both sums stay exact integer cents; the one double division at the
    end is bit-portable."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-09-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-10-01'"))
    )
    part = load_table(spark, "part", sf_dir)
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(promo, _revenue_cents()).otherwise(F.lit(0))).alias("_promo_c"),
            F.sum(_revenue_cents()).alias("_total_c"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("_promo_c").cast("double")
                / F.col("_total_c").cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            _dollars(F.col("_total_c")).alias("total_revenue"),
        )
    )


Q14_SQL = f"""
SELECT round(100.0 * CAST(_promo_c AS DOUBLE) / CAST(_total_c AS DOUBLE), 6)
           AS promo_revenue_pct,
       CAST(_total_c AS DOUBLE) / 100.0 AS total_revenue
FROM (
    SELECT SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_SQL} ELSE 0 END)
               AS _promo_c,
           SUM({_REV_SQL}) AS _total_c
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue. The
    global max over the per-supplier aggregate is a 1-row broadcast cross
    join — never a no-partition window (which would single-thread the
    aggregate at scale)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01'"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue_cents()).alias("_rev_c"))
    mx = rev.agg(F.max("_rev_c").alias("_max_c"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev_c") == F.col("_max_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", _dollars(F.col("_rev_c")).alias("total_revenue")
        )
    )


Q15_SQL = f"""
WITH rev AS (
    SELECT l_suppkey, SUM({_REV_SQL}) AS _rev_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(_rev_c AS DOUBLE) / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE _rev_c = (SELECT MAX(_rev_c) FROM rev)
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total line quantity exceeds 300 (HAVING on a
    grouped fact), joined back to orders+customer for context."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("_qty_c"))
        .filter(F.col("_qty_c") > 300 * 100)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            _dollars(F.col("_qty_c")).alias("total_qty"),
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(_qty_c AS DOUBLE) / 100.0 AS total_qty
FROM (
    SELECT l_orderkey, SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
               AS _qty_c
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 30000
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR of AND-groups spanning both join sides (brand x
    quantity-band x size-band). Stays one equi-join on partkey with the
    disjunction as a post-join filter Catalyst can partially push."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            _dollars(F.sum(_revenue_cents())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


def q22_global_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: "cntrycode" derived by substring (last 2 chars of c_name),
    customers above the average positive balance with no 1995 orders —
    scalar-avg subquery (exact cents compare) + anti join + derived-key
    aggregation."""
    cust = load_table(spark, "customer", sf_dir)
    orders95 = load_table(spark, "orders", sf_dir).filter(
        F.expr("year(o_orderdate) = 1995")
    )
    bal_c = _cents(F.col("c_acctbal"))
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_c).alias("_sum_c"), F.count(F.lit(1)).alias("_n")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        # exact integer compare: bal > avg  <=>  bal * n > sum
        .filter(bal_c * F.col("_n") > F.col("_sum_c"))
        .join(orders95, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring(F.col("c_name"), -2, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dollars(F.sum(bal_c)).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT code, COUNT(*) AS numcust,
       CAST(SUM(_bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM (
    SELECT substring(c_name, length(c_name) - 1, 2) AS code,
           CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS _bal_c
    FROM customer
    WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
          * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
        > (SELECT SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
           FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND year(o_orderdate) = 1995)
)
GROUP BY code
"""


def q_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based frame, vs the ROWS frame in
    customer_running_total): per customer, the exact-cents revenue of all
    orders in the trailing 30 days including peers with the same date —
    RANGE frames are deterministic under order-date ties where ROWS frames
    are not."""
    orders = load_table(spark, "orders", sf_dir)
    # day-number ordering (datediff from epoch): tz-free, works for
    # TIMESTAMP_NTZ, and at day granularity the -30..0 RANGE frame is
    # exactly the oracle's INTERVAL 30 DAY PRECEDING (dates are midnight)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _dollars(F.sum(_cents(F.col("o_totalprice"))).over(w)).alias(
            "trailing_30d_rev"
        ),
    )


TRAILING_30D_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS trailing_30d_rev
FROM orders
"""


def q_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window coverage beyond row_number: ntile quartiles and
    percent_rank over order value (orderkey tiebreak makes both
    deterministic), aggregated to per-(status, quartile) bands. The window
    partitions on status — a global ntile would be a single-partition sort
    at scale, so rank within a partition key (or pre-aggregate) instead."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    banded = orders.select(
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        _cents(F.col("o_totalprice")).alias("_price_c"),
    )
    return banded.groupBy("o_orderstatus", "quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("pr"), 6).alias("min_pr"),
        F.round(F.max("pr"), 6).alias("max_pr"),
        _dollars(F.sum("_price_c")).alias("sum_price"),
    )


PRICE_QUARTILES_SQL = """
SELECT o_orderstatus, quartile, COUNT(*) AS n_orders,
       round(MIN(pr), 6) AS min_pr, round(MAX(pr), 6) AS max_pr,
       CAST(SUM(_price_c) AS DOUBLE) / 100.0 AS sum_price
FROM (
    SELECT o_orderstatus,
           ntile(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS quartile,
           percent_rank() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS pr,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS _price_c
    FROM orders
)
GROUP BY o_orderstatus, quartile
"""


def q_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group WITHOUT F.corr: engine-native corr
    merges partial moments in partition order (FP-nondeterministic), so the
    moments are accumulated as exact BIGINT sums (quantity in cents,
    price in whole dollars — scales chosen so every cross-product stays
    under 2^63 at 100x this SF) and the closed-form combination happens
    once, in doubles, with a fixed operation order both engines share."""
    li = load_table(spark, "lineitem", sf_dir)
    q = _cents(F.col("l_quantity"))
    p = F.floor(F.col("l_extendedprice")).cast("bigint")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(q * q).alias("sqq"),
        F.sum(p * p).alias("spp"),
        F.sum(q * p).alias("sqp"),
    )
    n, sq, sp = [F.col(c).cast("double") for c in ("n", "sq", "sp")]
    sqq, spp, sqp = [F.col(c).cast("double") for c in ("sqq", "spp", "sqp")]
    corr = (n * sqp - sq * sp) / (
        F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)
    )
    return agg.select(
        "l_returnflag", "n", F.round(corr, 6).alias("qty_price_corr")
    )


QTY_PRICE_CORR_SQL = """
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round((n * sqp - sq * sp)
             / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6)
           AS qty_price_corr
FROM (
    SELECT l_returnflag,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(q) AS DOUBLE) AS sq, CAST(SUM(p) AS DOUBLE) AS sp,
           CAST(SUM(q * q) AS DOUBLE) AS sqq,
           CAST(SUM(p * p) AS DOUBLE) AS spp,
           CAST(SUM(q * p) AS DOUBLE) AS sqp
    FROM (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS q,
               CAST(floor(l_extendedprice) AS BIGINT) AS p
        FROM lineitem
    )
    GROUP BY l_returnflag
)
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier detection per event type (the training-data outlier
    gate): mean/variance from exact integer-milli sums via a window over
    the group — one shuffle, no second scan — then a deterministic double
    threshold compare. Returns per-type outlier counts and bounds."""
    ev = load_table(spark, "events", sf_dir)
    m = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("event_type")
    base = ev.select("event_type", m.alias("_m"))
    base = (
        base.withColumn("_n", F.count(F.lit(1)).over(w).cast("double"))
        .withColumn("_s", F.sum("_m").over(w).cast("double"))
        .withColumn("_ss", F.sum(F.col("_m") * F.col("_m")).over(w).cast("double"))
    )
    mean = F.col("_s") / F.col("_n")
    var = (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n")) / F.col("_n")
    is_out = F.abs(F.col("_m").cast("double") - mean) > F.lit(3.0) * F.sqrt(var)
    return (
        base.withColumn("_out", is_out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("_out"), 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(mean), 6).alias("mean_milli"),
            F.round(F.max(F.sqrt(var)), 6).alias("sd_milli"),
        )
    )


VALUE_OUTLIERS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN abs(CAST(m AS DOUBLE) - s / n) > 3.0 *
                     sqrt((ss - s * s / n) / n)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(MAX(s / n), 6) AS mean_milli,
       round(MAX(sqrt((ss - s * s / n) / n)), 6) AS sd_milli
FROM (
    SELECT event_type, m,
           CAST(COUNT(*) OVER w AS DOUBLE) AS n,
           CAST(SUM(m) OVER w AS DOUBLE) AS s,
           CAST(SUM(m * m) OVER w AS DOUBLE) AS ss
    FROM (SELECT event_type,
                 CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS m
          FROM events)
    WINDOW w AS (PARTITION BY event_type)
)
GROUP BY event_type
"""


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, hour) the opening/closing/min/max
    value — the classic time-series rollup. First/last are anchored with
    (ts, event_id) row_numbers instead of min_by/max_by so ties on ts are
    deterministic and the oracle matches exactly; both windows share one
    shuffle (same partitioning)."""
    ev = load_table(spark, "events", sf_dir)
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    base = ev.select("event_type", hour, "ts", "event_id", "value")
    wa = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rd", F.row_number().over(wd))
        .groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


OHLC_SQL = """
WITH ranked AS (
    SELECT event_type, date_trunc('hour', ts) AS hour, value,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS ra,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rd
    FROM events
)
SELECT event_type, hour,
       MAX(CASE WHEN ra = 1 THEN value END) AS open,
       MAX(CASE WHEN rd = 1 THEN value END) AS close,
       MIN(value) AS low, MAX(value) AS high, COUNT(*) AS n_events
FROM ranked GROUP BY event_type, hour
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day (cohort), counted
    per activity day — the (cohort, activity) matrix every growth dashboard
    computes. Two aggregations + one join; the cohort table is small (one
    row per user) and broadcasts."""
    ev = load_table(spark, "events", sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    cohort = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("activity_day")).distinct()
    return (
        activity.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_day", "activity_day")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


COHORT_SQL = """
SELECT cohort_day, activity_day, COUNT(DISTINCT user_id) AS n_active
FROM (SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS activity_day
      FROM events) a
JOIN (SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS cohort_day
      FROM events GROUP BY user_id) c USING (user_id)
GROUP BY cohort_day, activity_day
"""


def q_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, did a purchase happen AFTER the first
    signup? One conditional-min aggregation pass per user, then a global
    rollup — no self-join (the naive funnel is events-x-events; the
    min-per-stage form is one shuffle on user_id)."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)
        ).alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("last_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


FUNNEL_SQL = """
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_signed_up,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL
                 AND last_purchase > first_signup THEN 1 ELSE 0 END)
           AS BIGINT) AS n_converted
FROM (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
           MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
    FROM events GROUP BY user_id
)
"""


_GS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
       / 100.0 AS sum_price
FROM {table}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-status totals,
    per-priority totals, and the grand total in ONE aggregate pass — via
    the spark.sql surface (the DataFrame API has no grouping-sets
    constructor), sharing the exact-cents arithmetic with the oracle
    verbatim."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gs")
    return spark.sql(_GS_SQL.format(table="orders_gs"))


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]


def q_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status x priority, priorities spread into
    columns. Values are declared up front, so the pivot stays one
    partial+final aggregate — no extra distinct-values job."""
    orders = load_table(spark, "orders", sf_dir)
    piv = orders.groupBy("o_orderstatus").pivot(
        "o_orderpriority", _PRIORITIES
    ).agg(F.count(F.lit(1)))
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("bigint").alias(a)
            for v, a in zip(_PRIORITIES, _PRIO_ALIAS)
        ],
    )


PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_notspec,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_low
FROM orders GROUP BY o_orderstatus
"""


def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: part numeric attributes to long form (attr, val) —
    the narrow shape feature stores and profilers consume."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


UNPIVOT_SQL = """
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE)
FROM part
"""


QUERIES = {
    "q4_priority_count": q4_priority_count,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q12_late_priority": q12_late_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume": q18_large_volume,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_global_balance": q22_global_balance,
    "pivot_status_priority": q_pivot_priority,
    "unpivot_part_attrs": q_unpivot_part,
    "trailing_30d_revenue": q_trailing_30d_revenue,
    "orders_grouping_sets": q_grouping_sets,
    "events_ohlc_hourly": q_events_ohlc,
    "price_quartiles": q_price_quartiles,
    "qty_price_corr": q_qty_price_corr,
    "value_outliers_3sigma": q_value_outliers,
    "cohort_retention": q_cohort_retention,
    "signup_funnel": q_signup_funnel,
}


def oracles() -> dict[str, str]:
    return {
        "pivot_status_priority": PIVOT_SQL,
        "unpivot_part_attrs": UNPIVOT_SQL,
        "trailing_30d_revenue": TRAILING_30D_SQL,
        "orders_grouping_sets": _GS_SQL.format(table="orders"),
        "events_ohlc_hourly": OHLC_SQL,
        "price_quartiles": PRICE_QUARTILES_SQL,
        "qty_price_corr": QTY_PRICE_CORR_SQL,
        "value_outliers_3sigma": VALUE_OUTLIERS_SQL,
        "cohort_retention": COHORT_SQL,
        "signup_funnel": FUNNEL_SQL,
        "q4_priority_count": Q4_SQL,
        "q7_volume_shipping": Q7_SQL,
        "q10_returned_items": Q10_SQL,
        "q12_late_priority": Q12_SQL,
        "q13_customer_distribution": Q13_SQL,
        "q14_promo_effect": Q14_SQL,
        "q15_top_supplier": Q15_SQL,
        "q18_large_volume": Q18_SQL,
        "q19_disjunctive_revenue": Q19_SQL,
        "q22_global_balance": Q22_SQL,
    }
