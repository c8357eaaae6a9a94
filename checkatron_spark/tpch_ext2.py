"""Remaining TPC-H-shaped workloads (Q2/Q8/Q9/Q11/Q16/Q17/Q20/Q21) adapted to
the fixture schema.  The fixture has no ``partsupp`` table, so the part↔supplier
relationship is derived from ``lineitem`` (distinct (l_partkey, l_suppkey)
pairs); commit/receipt dates are adapted to ``l_shipdate`` lateness vs
``o_orderdate`` (see TESTDATA.md for the schema).

Operator shapes these add over tpch_ext.py:

- Q2  : correlated-MIN subquery (per-part minimum unit cost) resolved as an
        aggregate + equi join back on the group key, 4-dim snowflake join
- Q8  : market-share ratio — two conditional sums over a 6-table join, by year
- Q9  : product-type profit — profit expression over part x lineitem, by
        (nation, year)
- Q11 : important-stock screen — grouped value HAVING > fraction of a scalar
        global total (1-row broadcast cross join, never a single-partition
        window)
- Q16 : distinct-supplier count per part attribute group with a NOT-IN
        supplier exclusion (anti join on a filtered dim)
- Q17 : small-quantity revenue — per-part average threshold applied back to
        the fact; the threshold compare is kept in exact integer space
        (lq * 2 * n < sum_lq) so Spark and the oracle agree bit-for-bit
- Q20 : nested semi-join chain (parts by name -> high-volume shipments ->
        suppliers in one nation)
- Q21 : sole-late-supplier screen — semi join (another supplier exists on the
        order) + anti join (no OTHER supplier was late) with a non-equi
        component on the supplier key, then a top-k count

Scale notes: every dim join here broadcasts (nation/region/supplier/part are
tiny relative to the facts); fact-side aggregations are partial+final on the
shuffle key they already carry (l_partkey / l_orderkey), so each query is one
fact shuffle plus broadcasts.  The Q11 and Q17 "scalar threshold" patterns
deliberately avoid windows over an unpartitioned frame — at 100 TB a global
window would serialize on one task, while the 1-row broadcast join stays
parallel.  Money stays in exact integer cents (analytics._cents) until the
final projection.

Reference parity anchor: the reference's validation layer is plain aggregate
SQL over diff_result (/root/reference/tools/step_ledger.py:253-259,
/root/reference/README.md:186-196); these queries generalize that layer to the
warehouse tables a checkatron user diffs, completing the classic 22-query
shape coverage started in analytics.py (Q1/Q3/Q5/Q6) and tpch_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from checkatron_spark.analytics import _REV_SQL, _cents, _dollars, _revenue_cents
from checkatron_spark.sources.tables import load_table

__all__ = ["QUERIES", "oracles"]


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each STANDARD part of size <= 10, the EUROPE supplier(s)
    offering it at the minimum observed unit price.  The correlated MIN
    subquery becomes: aggregate unit cost per (part, supplier), take the
    per-part MIN, and join back on (partkey, min_cost).  Unit price is
    floor(extendedprice / quantity * 100 + 0.5) cents — identical IEEE double
    ops on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")

    unit_cents = _cents(F.col("l_extendedprice") / F.col("l_quantity"))
    # per-(part, supplier) min unit cost among EUROPE suppliers of the slice
    offer = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min(unit_cents).alias("_unit_c"))
    )
    best = offer.groupBy(F.col("l_partkey").alias("_bp")).agg(
        F.min("_unit_c").alias("_best_c")
    )
    return (
        offer.join(
            best,
            (F.col("l_partkey") == F.col("_bp"))
            & (F.col("_unit_c") == F.col("_best_c")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            _dollars(F.col("_unit_c")).alias("min_cost"),
        )
    )


_UNIT_SQL = "CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)"

Q2_SQL = f"""
WITH offer AS (
    SELECT l_partkey, l_suppkey, s_name, n_name,
           MIN({_UNIT_SQL}) AS _unit_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND p_size <= 10 AND r_name = 'EUROPE'
    GROUP BY l_partkey, l_suppkey, s_name, n_name
)
SELECT l_partkey AS p_partkey, s_name, n_name,
       CAST(_unit_c AS DOUBLE) / 100.0 AS min_cost
FROM offer
WHERE _unit_c = (SELECT MIN(o2._unit_c) FROM offer o2
                 WHERE o2.l_partkey = offer.l_partkey)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_1 suppliers' share of ECONOMY-part revenue sold to
    ASIA customers, per order year.  Numerator and denominator are exact
    integer-cent conditional sums; the ratio goes double only at the end."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_cn_reg")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    rev = _revenue_cents()
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(reg), F.col("_cn_reg") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))).alias("_num"),
            F.sum(rev).alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double")).alias("mkt_share"),
        )
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_SQL} ELSE 0 END)
            AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on parts whose name contains 'red', per supplier
    nation and ship year.  With no partsupp.ps_supplycost in the fixture,
    cost is modeled as quantity * p_retailprice * 0.8 (fixed margin), kept in
    exact integer cents."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("red"))
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    cost_c = _cents(F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.8))
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(_dollars(F.sum(_revenue_cents() - cost_c)).alias("sum_profit"))
    )


_COST_SQL = "CAST(floor(l_quantity * p_retailprice * 0.8 * 100.0 + 0.5) AS BIGINT)"

Q9_SQL = f"""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(SUM({_REV_SQL} - {_COST_SQL}) AS DOUBLE) / 100.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(l_shipdate)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value from NATION_3 suppliers exceeds
    0.1% of the total shipped value from those suppliers.  The scalar global
    total is a 1-row aggregate cross-joined (broadcast) against the per-part
    aggregate — no global window, no driver collect."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    val_c = _cents(F.col("l_extendedprice") * F.col("l_quantity"))
    scoped = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), val_c.alias("_v"))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("_v").alias("_part_v"))
    total = scoped.agg(F.sum("_v").alias("_total_v"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_part_v").cast("double") > F.col("_total_v").cast("double") * F.lit(0.001))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _dollars(F.col("_part_v")).alias("part_value"),
        )
    )


_VAL_SQL = "CAST(floor(l_extendedprice * l_quantity * 100.0 + 0.5) AS BIGINT)"

Q11_SQL = f"""
WITH scoped AS (
    SELECT l_partkey, {_VAL_SQL} AS _v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS p_partkey, CAST(SUM(_v) AS DOUBLE) / 100.0 AS part_value
FROM scoped
GROUP BY l_partkey
HAVING CAST(SUM(_v) AS DOUBLE) >
       (SELECT CAST(SUM(_v) AS DOUBLE) * 0.001 FROM scoped)
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size bucket) for
    non-Brand#1 parts, excluding flagged suppliers (acctbal < 0 stands in for
    the 'customer complaints' NOT IN list).  The exclusion is an anti join on
    the filtered supplier dim; supplier-part pairs come from lineitem."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") != "Brand#1")
    bad = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0)
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", (F.floor(F.col("p_size") / F.lit(10)) * 10).alias("size_bucket"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type,
       CAST(floor(p_size / 10) * 10 AS BIGINT) AS size_bucket,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, CAST(floor(p_size / 10) * 10 AS BIGINT)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost if Brand#3 small-quantity
    orders stopped: sum(extendedprice)/7 over lineitems with quantity below
    half the part's average quantity.  The correlated AVG becomes a per-part
    aggregate broadcast back; the threshold compare stays in integer space
    (lq * 2 * n_rows < sum_lq) so both engines agree exactly."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    lq = _cents(F.col("l_quantity"))  # quantity in exact hundredths
    scoped = li.join(
        F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", lq.alias("_lq"), _cents(F.col("l_extendedprice")).alias("_ep_c"))
    stats = scoped.groupBy(F.col("l_partkey").alias("_sp")).agg(
        F.sum("_lq").alias("_sum_lq"), F.count(F.lit(1)).alias("_n")
    )
    return (
        scoped.join(stats, F.col("l_partkey") == F.col("_sp"))
        .filter(F.col("_lq") * F.lit(2) * F.col("_n") < F.col("_sum_lq"))
        .agg(
            (F.sum("_ep_c").cast("double") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly")
        )
    )


_LQ_SQL = "CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)"
_EP_SQL = "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"

Q17_SQL = f"""
WITH scoped AS (
    SELECT l_partkey, {_LQ_SQL} AS _lq, {_EP_SQL} AS _ep_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3'
), stats AS (
    SELECT l_partkey AS _sp, SUM(_lq) AS _sum_lq, COUNT(*) AS _n
    FROM scoped GROUP BY l_partkey
)
SELECT CAST(SUM(_ep_c) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM scoped JOIN stats ON l_partkey = _sp
WHERE _lq * 2 * _n < _sum_lq
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: NATION_5 suppliers who shipped more than 60 units of some
    green-named part during 1997 — a nested semi-join chain (parts by name ->
    high-volume (part, supplier) shipments -> suppliers)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
    )
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").startswith("green"))
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5")
    heavy = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("_qty_c"))
        .filter(F.col("_qty_c") > 60 * 100)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
  AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'green%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
      HAVING SUM({_LQ_SQL}) > 6000
  )
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: top-20 suppliers by count of multi-supplier orders on which
    they were the ONLY late shipper (late = shipped >90 days after the order
    date; the fixture has no commit/receipt dates).  EXISTS becomes a left
    semi join with a non-equi suppkey component; NOT EXISTS a left anti join."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    others = pairs.select(
        F.col("l_orderkey").alias("_o2"), F.col("l_suppkey").alias("_s2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("_o3"), F.col("l_suppkey").alias("_s3")
    )
    sole_late = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("_o2")) & (F.col("l_suppkey") != F.col("_s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("_o3")) & (F.col("l_suppkey") != F.col("_s3")),
            "left_anti",
        )
    )
    supp = load_table(spark, "supplier", sf_dir)
    counted = (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )
    # Distributed top-20 (TakeOrderedAndProject) — the final rank used to be
    # a partition-less window over one-row-per-supplier, a single-task
    # funnel at scale.
    return counted.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(20)


Q21_SQL = """
WITH pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
), sole AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM late l
    WHERE EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = l.l_orderkey
                    AND p.l_suppkey <> l.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l.l_orderkey
                        AND l2.l_suppkey <> l.l_suppkey)
)
SELECT s_name, numwait FROM (
    SELECT s_name, COUNT(*) AS numwait,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s_name) AS _rn
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
)
WHERE _rn <= 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_count": q16_supplier_count,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_sole_late_supplier": q21_sole_late_supplier,
}


def oracles() -> dict[str, str]:
    return {
        "q2_min_cost_supplier": Q2_SQL,
        "q8_market_share": Q8_SQL,
        "q9_product_profit": Q9_SQL,
        "q11_important_parts": Q11_SQL,
        "q16_supplier_count": Q16_SQL,
        "q17_small_quantity_revenue": Q17_SQL,
        "q20_excess_suppliers": Q20_SQL,
        "q21_sole_late_supplier": Q21_SQL,
    }
