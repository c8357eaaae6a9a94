"""General analytics workloads: multi-way joins, grouped aggregation, window
functions — the query surface a warehouse user of the reference would run on
the diff results and source tables (README.md:186-196 summary/drilldown
generalized), expressed TPC-H-style over the shared fixtures.

Determinism rules for the DuckDB oracles:
- SUMs of money doubles go through floor(x*100+0.5) integer cents per row
  (pure IEEE ops, bit-identical on both engines) -> exact, order-independent
  BIGINT aggregation; one final /100.0 for presentation.
- AVGs are a single FP division of the exact sum, rounded — bit-portable.
- top-k uses row_number() with a unique-id tiebreak — no LIMIT ambiguity.

Scale notes: every join below keys on the natural equi-key, so Catalyst picks
shuffle joins for fact-fact and broadcast-hash for the dims (region/nation/
supplier fit any broadcast threshold at 100 TB; AQE re-plans if not).
Aggregations are partial+final (map-side combine) — check .explain for
HashAggregate pairs and BroadcastHashJoin on the dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from checkatron_spark.sources.tables import load_table

# Money math determinism: Spark's double->decimal cast rounds the exact
# binary expansion (BigDecimal HALF_UP) while DuckDB converts via double
# multiplication — they disagree on edge values. So currency amounts are
# converted to integer cents with pure IEEE double ops (mul, add, floor),
# which are bit-identical on both engines; sums are exact BIGINT adds; the
# single final /100.0 division is deterministic.


def _cents(col: F.Column, scale: float = 100.0) -> F.Column:
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("bigint")


def _revenue_cents() -> F.Column:
    return _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))


_REV_SQL = "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"


def _dollars(col: F.Column) -> F.Column:
    return col.cast("double") / F.lit(100.0)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with decimal sums."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("_base_c"),
            F.sum(_revenue_cents()).alias("_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            _dollars(F.col("_qty_c")).alias("sum_qty"),
            _dollars(F.col("_base_c")).alias("sum_base_price"),
            _dollars(F.col("_disc_c")).alias("sum_disc_price"),
            "count_order",
            F.round(
                (F.col("_qty_c").cast("double") / F.lit(100.0))
                / F.col("count_order"),
                6,
            ).alias("avg_qty"),
        )
    )


_QTY_C = "CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)"
_BASE_C = "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"

PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(_qty_c AS DOUBLE) / 100.0 AS sum_qty,
       CAST(_base_c AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(_disc_c AS DOUBLE) / 100.0 AS sum_disc_price,
       count_order,
       round((CAST(_qty_c AS DOUBLE) / 100.0) / count_order, 6) AS avg_qty
FROM (
    SELECT l_returnflag, l_linestatus,
           SUM({_QTY_C}) AS _qty_c,
           SUM({_BASE_C}) AS _base_c,
           SUM({_REV_SQL}) AS _disc_c,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
)
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped revenue + deterministic top-10
    (row_number over revenue desc, orderkey asc — decimal compare, no FP
    ties)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    grouped = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-03-15'"))
            & (F.col("l_shipdate") > F.expr("TIMESTAMP '1998-03-15'"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_cents()).alias("_rev_c"))
    )
    # Distributed top-k: orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge) — no single-task global window
    # funnel.  The rank window then runs over the <=10 surviving rows.
    top = grouped.orderBy(
        F.col("_rev_c").desc(), F.col("l_orderkey").asc()
    ).limit(10)
    w = Window.orderBy(F.col("_rev_c").desc(), F.col("l_orderkey").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("l_orderkey", "o_orderdate", "o_orderpriority",
                _dollars(F.col("_rev_c")).alias("revenue"),
                F.col("rnk").cast("int").alias("rnk"))
    )


TOP_REVENUE_ORDERS_SQL = f"""
WITH grouped AS (
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           SUM({_REV_SQL}) AS _rev_c
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(_rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, row_number() OVER (ORDER BY _rev_c DESC, l_orderkey) AS rnk
    FROM grouped
)
WHERE rnk <= 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through region->nation->supplier/customer.
    The dims (region/nation/supplier) broadcast; the fact-fact join
    (orders-lineitem) shuffles on orderkey."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            _dollars(F.sum(_revenue_cents())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REGION_REVENUE_SQL = f"""
SELECT r_name, n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by total price (per-group window top-k)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice",
                F.col("rnk").cast("int").alias("rnk"))
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
)
WHERE rnk <= 2
"""


def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) decimal revenue per customer over order date —
    frame-based window aggregation, exact decimal arithmetic."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _dollars(
            F.sum(_cents(F.col("o_totalprice"))).over(w)
        ).alias("running_total"),
    )


CUSTOMER_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) / 100.0 AS running_total
FROM orders
"""


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped stats with min/max/avg over part attributes."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.sum(_cents(F.col("p_retailprice"))).alias("_price_c"),
        )
        .select(
            "p_type",
            "n_parts",
            "min_size",
            "max_size",
            _dollars(F.col("_price_c")).alias("sum_price"),
            F.round(
                (F.col("_price_c").cast("double") / F.lit(100.0))
                / F.col("n_parts"),
                6,
            ).alias("avg_price"),
        )
    )


PART_TYPE_STATS_SQL = """
SELECT p_type, n_parts, min_size, max_size,
       CAST(_price_c AS DOUBLE) / 100.0 AS sum_price,
       round((CAST(_price_c AS DOUBLE) / 100.0) / n_parts, 6) AS avg_price
FROM (
    SELECT p_type, COUNT(*) AS n_parts, MIN(p_size) AS min_size,
           MAX(p_size) AS max_size,
           SUM(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS _price_c
    FROM part GROUP BY p_type
)
"""


def q_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join: customers holding at least one urgent
    order. Semi joins shuffle only the keys and short-circuit per match —
    at scale, prefer them over join+distinct (no fanout, smaller shuffle)."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-EXISTS-style left-anti join (TPC-H Q22 flavor): customers who
    placed no urgent order (every fixture customer has SOME order, so the
    priority filter keeps the result non-empty and the check meaningful)."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


CUSTOMERS_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: order counts + exact revenue at (status,
    priority), per-status subtotals, and the grand total. One hash
    aggregate pass with grouping sets — Spark expands the sets map-side,
    so it's still a single shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars(F.sum(_cents(F.col("o_totalprice")))).alias("sum_price"),
        )
    )


ORDERS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
       / 100.0 AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_rollup_from_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup REUSE: the monthly aggregate is computed by
    re-aggregating the materialized daily partials, never rescanning orders
    — at 100 TB the daily layer is bytes-per-day while the raw table is the
    100 TB, so every coarser granularity (week/month/quarter) must derive
    from partials. Exactness is structural: counts and integer-cent sums
    are associative, so sum-of-daily-sums is bit-identical to the direct
    monthly aggregate — which is precisely what the oracle (a direct
    monthly rollup of the raw table) grades. n_days is computed FROM the
    daily layer (one row per day), pinning that the intermediate
    granularity actually exists in the plan."""
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_cents(F.col("o_totalprice"))).alias("_cents"),
    )
    return daily.groupBy(F.trunc("day", "month").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("_n").alias("n_orders"),
        _dollars(F.sum("_cents")).alias("revenue"),
    )


ROLLUP_FROM_PARTIALS_SQL = """
SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
       / 100.0 AS revenue
FROM orders GROUP BY 1
"""


def q_supplier_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, supplier account-balance sign): all grouping-set
    combinations in one pass."""
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("bal_sign", F.when(F.col("s_acctbal") >= 0, "pos").otherwise("neg"))
        .cube("n_name", "bal_sign")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


SUPPLIER_CUBE_SQL = """
SELECT n_name, bal_sign, COUNT(*) AS n_suppliers
FROM (
    SELECT n_name,
           CASE WHEN s_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_sign
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
) GROUP BY CUBE (n_name, bal_sign)
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation: customers and distinct order dates per
    market segment (expands to a partial-distinct two-phase aggregate)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("o_orderdate").alias("n_order_dates"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


DISTINCT_COUNTS_SQL = """
SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(DISTINCT o_orderdate) AS n_order_dates, COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling equi-width histogram of o_totalprice (width 25k):
    bin id + count + exact bin bounds. One map-side-combined aggregate —
    the profile of a 100 TB column costs one scan; bins (≈ range/width)
    stay tiny regardless of row count."""
    orders = load_table(spark, "orders", sf_dir)
    bin_id = F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("bigint")
    return (
        orders.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
    )


PRICE_HISTOGRAM_SQL = """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_orders, MIN(o_totalprice) AS bin_min,
       MAX(o_totalprice) AS bin_max
FROM orders GROUP BY 1
"""


def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same order
    at least 2 times (the co-occurrence-counting step of a recommender /
    embedding pipeline). Self-join of lineitem on l_orderkey with
    ``p1 < p2`` — per-order fanout is items², bounded by basket size (TPC-H
    ≈ 4-7 items), NOT by table size, so the shuffle grows linearly with
    orders. DISTINCT inside the basket first so duplicate part lines don't
    inflate counts. A pathological mega-basket would need a per-order item
    cap (slice after a row_number window) — not needed at TPC-H shapes."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


PART_COOCCURRENCE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity check: orphaned foreign keys across the star
    schema, as one stacked report (orders→customer, lineitem→orders,
    supplier→nation). Each arm is a broadcast/shuffled ANTI join — key-only
    shuffle, no fanout; the stack is a UNION ALL of tiny violation sets.
    At 100 TB each arm prunes to the key column at the scan."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    def arm(child, fk, parent, pk, label):
        return (
            child.select(F.col(fk).alias("fk_value"))
            .join(parent.select(F.col(pk).alias(pk)), F.col("fk_value") == F.col(pk), "left_anti")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("relation"), "n_orphans")
        )

    return (
        arm(orders, "o_custkey", cust, "c_custkey", "orders->customer")
        .unionByName(arm(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"))
        .unionByName(arm(supp, "s_nationkey", nation, "n_nationkey", "supplier->nation"))
    )


FK_VIOLATIONS_SQL = """
SELECT 'orders->customer' AS relation,
       (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
          (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
UNION ALL
SELECT 'supplier->nation',
       (SELECT COUNT(*) FROM supplier WHERE s_nationkey NOT IN
          (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL))
"""


def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/completeness profile of orders in ONE aggregate pass
    (no per-column scans): count_if(col IS NULL) for every column, unpivoted
    to (column_name, n_nulls, n_rows)."""
    orders = load_table(spark, "orders", sf_dir)
    cols = orders.columns
    aggs = [
        F.count_if(F.col(c).isNull()).alias(f"n_{c}") for c in cols
    ] + [F.count(F.lit(1)).alias("n_rows")]
    wide = orders.groupBy().agg(*aggs)
    stack_args = ", ".join(f"'{c}', n_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls)",
        "n_rows",
    )


def _null_profile_sql() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, "
        f"COUNT(*) FILTER (WHERE {c} IS NULL) AS n_nulls, "
        f"COUNT(*) AS n_rows FROM orders"
        for c in cols
    )
    return arms


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — the query whose entire
    cost is how little of the file the scan reads (predicate pushdown +
    column pruning; see tests/test_plans.py)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dollars(
                F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_quantity < 24
"""


def q_parts_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape: parts priced above their own
    type's average. Decorrelated Spark-side as a window average — one
    shuffle on p_type instead of a per-row subquery. Average in exact
    integer cents so the threshold compare is FP-free."""
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_type")
    price_c = _cents(F.col("p_retailprice"))
    return (
        part.withColumn("_sum_c", F.sum(price_c).over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        # exact compare: price*n > sum  <=>  price > avg, all in BIGINT
        .filter(price_c * F.col("_n") > F.col("_sum_c"))
        .select("p_partkey", "p_type", "p_retailprice")
    )


PARTS_ABOVE_TYPE_AVG_SQL = """
SELECT p_partkey, p_type, p_retailprice
FROM part p
WHERE CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
      * (SELECT COUNT(*) FROM part p2 WHERE p2.p_type = p.p_type)
    > (SELECT SUM(CAST(floor(p2.p_retailprice * 100.0 + 0.5) AS BIGINT))
       FROM part p2 WHERE p2.p_type = p.p_type)
"""


def q_repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 1997 (set-op coverage
    beyond the reference's UNION/UNION ALL)."""
    orders = load_table(spark, "orders", sf_dir)
    y96 = orders.filter(F.expr("year(o_orderdate) = 1996")).select("o_custkey")
    y97 = orders.filter(F.expr("year(o_orderdate) = 1997")).select("o_custkey")
    return y96.intersect(y97)


REPEAT_CUSTOMERS_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_churned_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1996 but not in 1997."""
    orders = load_table(spark, "orders", sf_dir)
    y96 = orders.filter(F.expr("year(o_orderdate) = 1996")).select("o_custkey")
    y97 = orders.filter(F.expr("year(o_orderdate) = 1997")).select("o_custkey")
    # subtract = SQL EXCEPT (set semantics): a 1996 customer with ANY 1997
    # order is excluded, regardless of multiplicities on either side
    return y96.subtract(y97)


CHURNED_CUSTOMERS_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_approx_distincts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregation: Apache DataSketches HLL distinct counts and
    an approximate quantile per segment — the constant-memory versions of
    distinct_counts/percentiles for 100 TB cardinalities. At lgConfigK=14
    the HLL sketch is still in exact (coupon/set) mode at the fixtures'
    per-group cardinality, and percentile_approx at accuracy 10000 returns
    the exact discrete median for the fixture group sizes — so the declared
    query is graded against the exact COUNT(DISTINCT)/quantile_disc oracle
    (the honest-estimate regime beyond set mode is pinned in
    tests/test_approx.py). Spark's approx_count_distinct (HLL++ dense-only)
    is NOT used here: it estimates even at tiny cardinalities."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("o_custkey", F.lit(14))
            ).alias("approx_customers"),
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


APPROX_DISTINCTS_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS approx_customers,
       quantile_disc(o_totalprice, 0.5) AS approx_median,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def q_price_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT interpolated quantiles (q1/median/q3 of order value
    by priority): Spark's ``percentile`` and DuckDB's ``quantile_cont`` share
    the (1-g)*lo + g*hi interpolation, and integer-cent inputs keep every
    product exact in a double — bit-identical across engines. Exact
    percentiles sort within the group (bounded groups only at 100 TB; the
    sketch path for unbounded cardinalities is ``approx_distincts``)."""
    orders = load_table(spark, "orders", sf_dir)
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    g = orders.select("o_orderpriority", cents.alias("_c")).groupBy(
        "o_orderpriority"
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.percentile("_c", F.lit(0.25)) / F.lit(100.0)).alias("q1_price"),
        (F.percentile("_c", F.lit(0.5)) / F.lit(100.0)).alias("median_price"),
        (F.percentile("_c", F.lit(0.75)) / F.lit(100.0)).alias("q3_price"),
    )


def price_quantiles_by_priority_sql() -> str:
    c = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
    return (
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        f"quantile_cont({c}, 0.25) / 100.0 AS q1_price, "
        f"quantile_cont({c}, 0.5) / 100.0 AS median_price, "
        f"quantile_cont({c}, 0.75) / 100.0 AS q3_price "
        "FROM orders GROUP BY o_orderpriority"
    )


# $500 histogram bins: TPC-H order totals top out near $600k, so the
# merged histogram is bounded (~1200 bins) BY CONSTRUCTION at any SF
_QH_BIN_CENTS = 50_000


def q_price_quantiles_from_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantiles — the sketch algebra exact percentiles lack:
    per-day value histograms (the materialized partial a pipeline stores
    next to its daily rollups) merge by plain count addition into the
    global histogram, and quantiles read off the merged cumulative walk.
    Contrast with ``percentile``: exact but not mergeable (needs the raw
    column); the binned quantile is deterministic, mergeable, and exact AT
    BIN RESOLUTION — quantile(q) = the smallest bin whose running count
    reaches ceil(q*N), the quantile_disc rule applied to bin ids. The
    oracle computes the same binned quantile straight from the raw rows,
    so the grade pins merge == direct.

    Plan: two chained map-side-combined aggregates (day×bin, then bin),
    then ONE row carries the sorted (bin, n) array (bounded ~1200 structs)
    and an O(bins) fold extracts each requested q — no global window, no
    driver collect. At 100 TB the raw scan builds the daily layer once;
    every later quantile request costs O(days × bins)."""
    orders = load_table(spark, "orders", sf_dir)
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    binned = orders.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderdate").alias("_day"),
        F.floor(cents.cast("double") / F.lit(float(_QH_BIN_CENTS)))
        .cast("bigint")
        .alias("bin"),
    )
    partials = binned.groupBy("_day", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    merged = partials.groupBy("bin").agg(F.sum("n").alias("n"))
    hist = merged.agg(
        F.sort_array(F.collect_list(F.struct("bin", "n"))).alias("_h"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    qs = hist.select(
        F.explode(
            F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("q"),
        "_h",
        "n_total",
    )
    target = F.ceil(F.col("q") * F.col("n_total")).cast("bigint")
    init = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(-1).cast("bigint").alias("bin"),
    )

    def _walk(acc, x):
        cum = acc["cum"] + x["n"]
        return F.when(acc["bin"] >= 0, acc).otherwise(
            F.when(
                cum >= target,
                F.struct(cum.alias("cum"), x["bin"].alias("bin")),
            ).otherwise(
                F.struct(cum.alias("cum"), F.lit(-1).cast("bigint").alias("bin"))
            )
        )

    found = F.aggregate(F.col("_h"), init, _walk)
    return qs.select(
        "q",
        found["bin"].alias("bin"),
        (found["bin"].cast("double") * F.lit(_QH_BIN_CENTS / 100.0)).alias(
            "bin_lo"
        ),
        found["cum"].alias("n_le"),
        "n_total",
    )


def price_quantiles_from_partials_sql() -> str:
    b = _QH_BIN_CENTS
    return f"""
WITH bins AS (
    SELECT CAST(floor(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                      / {float(b)}) AS BIGINT) AS bin
    FROM orders WHERE o_totalprice IS NOT NULL
),
hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM bins GROUP BY bin),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM hist),
cum AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS n_le FROM hist),
qs AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q)
SELECT qs.q AS q, MIN(c.bin) AS bin,
       CAST(MIN(c.bin) AS DOUBLE) * {b / 100.0} AS bin_lo,
       CAST(MIN(c.n_le) AS BIGINT) AS n_le, t.n_total
FROM qs CROSS JOIN tot t
JOIN cum c ON c.n_le >= CAST(ceil(qs.q * t.n_total) AS BIGINT)
GROUP BY qs.q, t.n_total
"""


QUERIES = {
    "price_quantiles_by_priority": q_price_quantiles_by_priority,
    "price_quantiles_from_partials": q_price_quantiles_from_partials,
    "q1_pricing_summary": q_pricing_summary,
    "q3_top_revenue_orders": q_top_revenue_orders,
    "q5_region_revenue": q_region_revenue,
    "top_orders_per_customer": q_top_orders_per_customer,
    "customer_running_total": q_customer_running_total,
    "part_type_stats": q_part_type_stats,
    "customers_semi_join": q_customers_semi,
    "customers_anti_join": q_customers_anti,
    "orders_rollup": q_orders_rollup,
    "rollup_from_partials": q_rollup_from_partials,
    "supplier_cube": q_supplier_cube,
    "distinct_counts": q_distinct_counts,
    "price_histogram": q_price_histogram,
    "part_cooccurrence": q_part_cooccurrence,
    "fk_violations": q_fk_violations,
    "null_profile": q_null_profile,
    "q6_forecast_revenue": q_forecast_revenue,
    "parts_above_type_avg": q_parts_above_type_avg,
    "repeat_customers_intersect": q_repeat_customers_intersect,
    "churned_customers_except": q_churned_customers_except,
    "approx_distincts": q_approx_distincts,
}


def oracles() -> dict[str, str]:
    return {
        "price_quantiles_from_partials": price_quantiles_from_partials_sql(),
        "customers_semi_join": CUSTOMERS_SEMI_SQL,
        "customers_anti_join": CUSTOMERS_ANTI_SQL,
        "q6_forecast_revenue": FORECAST_REVENUE_SQL,
        "parts_above_type_avg": PARTS_ABOVE_TYPE_AVG_SQL,
        "repeat_customers_intersect": REPEAT_CUSTOMERS_INTERSECT_SQL,
        "churned_customers_except": CHURNED_CUSTOMERS_EXCEPT_SQL,
        "orders_rollup": ORDERS_ROLLUP_SQL,
        "rollup_from_partials": ROLLUP_FROM_PARTIALS_SQL,
        "supplier_cube": SUPPLIER_CUBE_SQL,
        "distinct_counts": DISTINCT_COUNTS_SQL,
        "price_histogram": PRICE_HISTOGRAM_SQL,
        "price_quantiles_by_priority": price_quantiles_by_priority_sql(),
        "part_cooccurrence": PART_COOCCURRENCE_SQL,
        "fk_violations": FK_VIOLATIONS_SQL,
        "null_profile": _null_profile_sql(),
        "q1_pricing_summary": PRICING_SUMMARY_SQL,
        "q3_top_revenue_orders": TOP_REVENUE_ORDERS_SQL,
        "q5_region_revenue": REGION_REVENUE_SQL,
        "top_orders_per_customer": TOP_ORDERS_PER_CUSTOMER_SQL,
        "customer_running_total": CUSTOMER_RUNNING_TOTAL_SQL,
        "part_type_stats": PART_TYPE_STATS_SQL,
        "approx_distincts": APPROX_DISTINCTS_SQL,
    }
