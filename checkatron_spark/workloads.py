"""Driver-facing workloads: the flagship diff scenario and its SQL oracles.

The flagship diffs two snapshots of ``orders``: "before" drops some keys,
"after" drops different keys, flips ``o_orderstatus``, NULLs ``o_totalprice``
on a deterministic subset, and adds an after-only ``o_channel`` column — so
every status code (0/1/2/3) and row status (4/5/NULL) appears. Perturbations
use integer modulus only, so the Spark DataFrame build and the DuckDB oracle
SQL compute bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from checkatron_spark.operators.diff import diff
from checkatron_spark.plans.sqlgen import render_diff_sql, render_summary_sql
from checkatron_spark.sources.tables import load_table

ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]
AFTER_COLS = ORDERS_COLS + ["o_channel"]

# SQL fragments mirrored 1:1 by the DataFrame builders below
BEFORE_SRC_SQL = "(SELECT * FROM orders WHERE o_orderkey % 19 <> 3) b_src"
AFTER_SRC_SQL = (
    "(SELECT o_orderkey, o_custkey, "
    "CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus, "
    "CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice, "
    "o_orderdate, o_orderpriority, 'web' AS o_channel "
    "FROM orders WHERE o_orderkey % 23 <> 7) a_src"
)


def orders_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") % 19 != 3
    )


def orders_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.filter(F.col("o_orderkey") % 23 != 7)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.lit(None).cast("double")
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn("o_channel", F.lit("web"))
    )


def diff_orders(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    return diff(
        orders_before(spark, sf_dir), orders_after(spark, sf_dir),
        ["o_orderkey"], **kw,
    )


def diff_orders_oracle_sql() -> str:
    return render_diff_sql(
        BEFORE_SRC_SQL, AFTER_SRC_SQL, ["o_orderkey"], ORDERS_COLS, AFTER_COLS
    )


def diff_orders_summary_oracle_sql() -> str:
    up = [c.upper() for c in AFTER_COLS]
    return render_summary_sql(diff_orders_oracle_sql(), up)


def diff_orders_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-pruned incremental diff of the flagship snapshots
    (operators/incremental.py): identical to ``diff_orders`` restricted to
    the key-buckets whose (count, checksum) changed."""
    from checkatron_spark.operators.incremental import diff_incremental

    return diff_incremental(
        orders_before(spark, sf_dir),
        orders_after(spark, sf_dir),
        ["o_orderkey"],
        n_buckets=64,
    )


def _incr_csum_sql(cols: list[str]) -> str:
    parts = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), chr(0))" for c in cols)
    return (
        f"('0x' || substring(md5(concat_ws(chr(1), {parts})), 1, 8))::BIGINT"
    )


def _incr_changed_sql(n_buckets: int = 64) -> str:
    csum = _incr_csum_sql(ORDERS_COLS)  # common columns only (no o_channel)
    side = (
        "SELECT o_orderkey % {n} AS bucket, COUNT(*) AS n, SUM({c}) AS s "
        "FROM {src} GROUP BY 1"
    )
    bck = side.format(n=n_buckets, c=csum, src=BEFORE_SRC_SQL)
    ack = side.format(n=n_buckets, c=csum, src=AFTER_SRC_SQL)
    return (
        f"SELECT COALESCE(bck.bucket, ack.bucket) FROM ({bck}) bck "
        f"FULL OUTER JOIN ({ack}) ack ON bck.bucket = ack.bucket "
        f"WHERE bck.n IS DISTINCT FROM ack.n OR bck.s IS DISTINCT FROM ack.s"
    )


def diff_orders_incremental_oracle_sql() -> str:
    pred = f"o_orderkey % 64 IN ({_incr_changed_sql(64)})"
    return render_diff_sql(
        BEFORE_SRC_SQL, AFTER_SRC_SQL, ["o_orderkey"], ORDERS_COLS, AFTER_COLS,
        before_where=pred, after_where=pred,
    )


def diff_nullkey_presence_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NULL-first-key quirk, fixed (SURVEY.md §2.3): the row whose key is
    legitimately NULL on both sides (orderkey 0, NULLed here) is matched by
    the null-safe join, and ``presence_fix=True`` reports it as present-both
    (_row_status NULL) instead of the reference's misclassified 4. Row drops
    on each side keep real 4/5 rows in the result."""
    orders = load_table(spark, "orders", sf_dir)
    nullify = F.when(F.col("o_orderkey") == 0, F.lit(None).cast("long")).otherwise(
        F.col("o_orderkey")
    )
    before = orders.withColumn("o_orderkey", nullify).filter(
        F.coalesce(F.col("o_orderkey") % 41, F.lit(0)) != 2
    )
    after = (
        orders.withColumn("o_orderkey", nullify)
        .filter(F.coalesce(F.col("o_orderkey") % 43, F.lit(0)) != 3)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_custkey") % 10 == 1, F.lit("F2")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    return diff(before, after, ["o_orderkey"], presence_fix=True)


def _nullkey_status_sql(b: str, a: str) -> str:
    return (
        f"CAST(CASE WHEN {b} IS NULL AND {a} IS NULL THEN 0 "
        f"WHEN {b} IS NULL AND {a} IS NOT NULL THEN 2 "
        f"WHEN {b} IS NOT NULL AND {a} IS NULL THEN 3 "
        f"WHEN {b} = {a} THEN 0 ELSE 1 END AS INTEGER)"
    )


def diff_nullkey_presence_fix_oracle_sql() -> str:
    nullify = "CASE WHEN o_orderkey = 0 THEN NULL ELSE o_orderkey END"
    b_src = (
        f"SELECT {nullify} AS o_orderkey, o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority, TRUE AS __p FROM orders "
        f"WHERE COALESCE(({nullify}) % 41, 0) <> 2"
    )
    a_src = (
        f"SELECT {nullify} AS o_orderkey, o_custkey, "
        f"CASE WHEN o_custkey % 10 = 1 THEN 'F2' ELSE o_orderstatus END "
        f"AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, "
        f"TRUE AS __p FROM orders WHERE COALESCE(({nullify}) % 43, 0) <> 3"
    )
    cols = ORDERS_COLS
    status = ",\n       ".join(
        f'{_nullkey_status_sql("b." + c, "a." + c)} AS "{c.upper()}"'
        for c in cols
    )
    return (
        f"WITH b AS ({b_src}), a AS ({a_src})\n"
        f"SELECT CAST(CASE WHEN b.__p IS NULL THEN 4 "
        f"WHEN a.__p IS NULL THEN 5 END AS INTEGER) AS \"_row_status\",\n"
        f'       COALESCE(b.o_orderkey, a.o_orderkey) AS "K_O_ORDERKEY",\n'
        f"       {status}\n"
        f"FROM b FULL OUTER JOIN a "
        f"ON b.o_orderkey IS NOT DISTINCT FROM a.o_orderkey"
    )


def diff_orders_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-compare mode (§7.3 hardening, flag-gated off by default):
    |b-a| <= 0.01 counts as a match on o_totalprice. The after side jitters
    price by +0.005 (inside tolerance -> status 0) on key%3==0 and +5.0
    (outside -> status 1) on key%7==0."""
    orders = load_table(spark, "orders", sf_dir)
    after = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(5.0))
        .when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(0.005))
        .otherwise(F.col("o_totalprice")),
    )
    return diff(
        orders, after, ["o_orderkey"], tolerances={"o_totalprice": 0.01}
    )


def diff_orders_tolerance_oracle_sql() -> str:
    a_price = (
        "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 5.0 "
        "WHEN o_orderkey % 3 = 0 THEN o_totalprice + 0.005 "
        "ELSE o_totalprice END"
    )
    def st(b, a, pred):
        return (
            f"CAST(CASE WHEN {b} IS NULL AND {a} IS NULL THEN 0 "
            f"WHEN {b} IS NULL AND {a} IS NOT NULL THEN 2 "
            f"WHEN {b} IS NOT NULL AND {a} IS NULL THEN 3 "
            f"WHEN {pred} THEN 0 ELSE 1 END AS INTEGER)"
        )
    cols_sql = []
    for c in ORDERS_COLS:
        b, a = f"b.{c}", f"a.{c}"
        pred = (
            f"abs(CAST({b} AS DOUBLE) - CAST({a} AS DOUBLE)) <= 0.01"
            if c == "o_totalprice"
            else f"{b} = {a}"
        )
        cols_sql.append(f'{st(b, a, pred)} AS "{c.upper()}"')
    status = ",\n       ".join(cols_sql)
    return (
        f"WITH b AS (SELECT *, TRUE AS __p FROM orders),\n"
        f"a AS (SELECT o_orderkey, o_custkey, o_orderstatus, "
        f"{a_price} AS o_totalprice, o_orderdate, o_orderpriority, "
        f"TRUE AS __p FROM orders)\n"
        f"SELECT CAST(CASE WHEN b.__p IS NULL THEN 4 "
        f"WHEN a.__p IS NULL THEN 5 END AS INTEGER) AS \"_row_status\",\n"
        f'       COALESCE(b.o_orderkey, a.o_orderkey) AS "K_O_ORDERKEY",\n'
        f"       {status}\n"
        f"FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey"
    )


def diff_orders_ts_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-truncation compare mode: equality at 'minute' granularity
    on o_orderdate. The after side shifts dates +30 seconds (same minute —
    fixture dates are midnight-aligned -> status 0) on key%3==0 and +2 days
    (status 1) on key%7==0."""
    orders = load_table(spark, "orders", sf_dir)
    after = orders.withColumn(
        "o_orderdate",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.col("o_orderdate") + F.expr("INTERVAL '2' DAY"),
        )
        .when(
            F.col("o_orderkey") % 3 == 0,
            F.col("o_orderdate") + F.expr("INTERVAL '30' SECOND"),
        )
        .otherwise(F.col("o_orderdate")),
    )
    return diff(orders, after, ["o_orderkey"], ts_trunc="minute")


def diff_orders_ts_trunc_oracle_sql() -> str:
    a_date = (
        "CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL '2' DAY "
        "WHEN o_orderkey % 3 = 0 THEN o_orderdate + INTERVAL '30' SECOND "
        "ELSE o_orderdate END"
    )
    def st(b, a, pred):
        return (
            f"CAST(CASE WHEN {b} IS NULL AND {a} IS NULL THEN 0 "
            f"WHEN {b} IS NULL AND {a} IS NOT NULL THEN 2 "
            f"WHEN {b} IS NOT NULL AND {a} IS NULL THEN 3 "
            f"WHEN {pred} THEN 0 ELSE 1 END AS INTEGER)"
        )
    cols_sql = []
    for c in ORDERS_COLS:
        b, a = f"b.{c}", f"a.{c}"
        pred = (
            f"date_trunc('minute', {b}) = date_trunc('minute', {a})"
            if c == "o_orderdate"
            else f"{b} = {a}"
        )
        cols_sql.append(f'{st(b, a, pred)} AS "{c.upper()}"')
    status = ",\n       ".join(cols_sql)
    return (
        f"WITH b AS (SELECT *, TRUE AS __p FROM orders),\n"
        f"a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        f"{a_date} AS o_orderdate, o_orderpriority, "
        f"TRUE AS __p FROM orders)\n"
        f"SELECT CAST(CASE WHEN b.__p IS NULL THEN 4 "
        f"WHEN a.__p IS NULL THEN 5 END AS INTEGER) AS \"_row_status\",\n"
        f'       COALESCE(b.o_orderkey, a.o_orderkey) AS "K_O_ORDERKEY",\n'
        f"       {status}\n"
        f"FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey"
    )


SCD_COMPARE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
SCD_LOAD_TS = "1998-12-01 00:00:00"


def scd2_orders_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge delta between the flagship snapshots: current = before
    (valid_from = o_orderdate), updates = after. Emits close-outs for
    changed/deleted keys and new versions for changed/new keys — exactly
    the rows a warehouse MERGE would write (operators/scd.py)."""
    from checkatron_spark.operators.scd import scd2_delta

    current = orders_before(spark, sf_dir).withColumn(
        "valid_from", F.col("o_orderdate")
    )
    updates = orders_after(spark, sf_dir)
    return scd2_delta(
        current,
        updates,
        ["o_orderkey"],
        SCD_COMPARE_COLS,
        load_ts=F.lit(SCD_LOAD_TS).cast("timestamp"),
    )


def scd2_orders_delta_oracle_sql() -> str:
    cc = SCD_COMPARE_COLS
    cols = ", ".join(cc)
    ts = f"TIMESTAMP '{SCD_LOAD_TS}'"
    b_sel = ", ".join(f"b.{c} AS b_{c}" for c in cc)
    a_sel = ", ".join(f"a.{c} AS a_{c}" for c in cc)
    changed = " OR ".join(f"b_{c} IS DISTINCT FROM a_{c}" for c in cc)
    return (
        f"WITH b AS (SELECT o_orderkey, {cols}, o_orderdate AS valid_from, "
        f"TRUE AS p FROM {BEFORE_SRC_SQL}),\n"
        f"a AS (SELECT o_orderkey, {cols}, TRUE AS p FROM {AFTER_SRC_SQL}),\n"
        f"j AS (SELECT b.o_orderkey AS bk, a.o_orderkey AS ak, "
        f"b.p AS bp, a.p AS ap, b.valid_from, {b_sel}, {a_sel} "
        f"FROM b FULL OUTER JOIN a "
        f"ON b.o_orderkey IS NOT DISTINCT FROM a.o_orderkey)\n"
        f"SELECT 'close' AS action, bk AS o_orderkey, "
        f"{', '.join(f'b_{c} AS {c}' for c in cc)}, "
        f"valid_from, {ts} AS valid_to, FALSE AS is_current "
        f"FROM j WHERE bp AND (ap IS NULL OR {changed})\n"
        f"UNION ALL\n"
        f"SELECT 'insert' AS action, ak AS o_orderkey, "
        f"{', '.join(f'a_{c} AS {c}' for c in cc)}, "
        f"{ts} AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, "
        f"TRUE AS is_current "
        f"FROM j WHERE ap AND (bp IS NULL OR {changed})"
    )


DRIFT_SPECS = {"o_orderkey": 1.0, "o_custkey": 1.0, "o_totalprice": 100.0}


def drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level drift profile between the flagship snapshots
    (operators/drift.py): 2 single-row aggregate scans, no join — the
    cheap "did anything move?" gate that runs before a row-level diff."""
    from checkatron_spark.operators.drift import drift_profile

    return drift_profile(
        orders_before(spark, sf_dir), orders_after(spark, sf_dir), DRIFT_SPECS
    )


def drift_orders_oracle_sql() -> str:
    def side(src: str, c: str, scale: float) -> str:
        # all-BIGINT lane (incl. the CAST around SUM: DuckDB SUM(BIGINT) is
        # HUGEINT, which the driver's value-hash renders differently)
        sc = f"CAST(floor(CAST({c} AS DOUBLE) * {scale} + 0.5) AS BIGINT)"
        return (
            f"SELECT COUNT(*) AS n, "
            f"COUNT(*) FILTER (WHERE {c} IS NULL) AS nulls, "
            f"CAST(SUM({sc}) AS BIGINT) AS s, "
            f"MIN({sc}) AS mn, MAX({sc}) AS mx "
            f"FROM {src}"
        )

    arms = []
    for c, scale in DRIFT_SPECS.items():
        arms.append(
            f"SELECT '{c}' AS column_name, "
            f"b.n AS n_before, a.n AS n_after, "
            f"b.nulls AS nulls_before, a.nulls AS nulls_after, "
            f"b.s AS sum_before, a.s AS sum_after, "
            f"b.mn AS min_before, a.mn AS min_after, "
            f"b.mx AS max_before, a.mx AS max_after "
            f"FROM ({side(BEFORE_SRC_SQL, c, scale)}) b, "
            f"({side(AFTER_SRC_SQL, c, scale)}) a"
        )
    return "\nUNION ALL\n".join(arms)


def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table fingerprint: 64 per-bucket (count, checksum) rows
    over orders (operators/incremental.py bucket_checksums). The primitive
    for comparing two 100 TB replicas across clusters — each side computes
    its 64-row fingerprint locally (one map-side-combined scan, no data
    movement) and only mismatched buckets are ever transferred."""
    from checkatron_spark.operators.incremental import bucket_checksums

    orders = load_table(spark, "orders", sf_dir)
    return bucket_checksums(
        orders, F.col("o_orderkey") % 64, ORDERS_COLS
    )


def table_checksum_orders_oracle_sql() -> str:
    csum = _incr_csum_sql(ORDERS_COLS)
    return (
        f"SELECT o_orderkey % 64 AS bucket, COUNT(*) AS n_rows, "
        f"CAST(SUM({csum}) AS BIGINT) AS checksum FROM orders GROUP BY 1"
    )


def diff3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way merge diff (operators/merge3.py): base = orders; ours
    deletes key%19==3, rewrites status on %11==0 and doubles price on
    %17==0; theirs rewrites status on %11==0 (same value when %2==0 —
    convergent; different otherwise — conflict) and NULLs price on %13==0.
    Exercises every code 0-4 plus row-level delete."""
    from checkatron_spark.operators.merge3 import diff3

    orders = load_table(spark, "orders", sf_dir)
    base = orders
    ours = (
        orders.filter(F.col("o_orderkey") % 19 != 3)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("O2")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 17 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
    )
    theirs = (
        orders.withColumn(
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 11 == 0,
                F.when(F.col("o_orderkey") % 2 == 0, F.lit("O2")).otherwise(
                    F.lit("T2")
                ),
            ).otherwise(F.col("o_orderstatus")),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.lit(None).cast("double")
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return diff3(
        base, ours, theirs, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


def diff3_orders_oracle_sql() -> str:
    def st(col: str) -> str:
        oc = f"b.{col} IS DISTINCT FROM o.{col}"
        tc = f"b.{col} IS DISTINCT FROM t.{col}"
        return (
            f"CAST(CASE WHEN NOT ({oc}) AND NOT ({tc}) THEN 0 "
            f"WHEN ({oc}) AND NOT ({tc}) THEN 1 "
            f"WHEN NOT ({oc}) AND ({tc}) THEN 2 "
            f"WHEN o.{col} IS NOT DISTINCT FROM t.{col} THEN 3 "
            f"ELSE 4 END AS INTEGER) AS \"{col.upper()}\""
        )

    return (
        "WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice, "
        "TRUE AS p FROM orders),\n"
        "o AS (SELECT o_orderkey, "
        "CASE WHEN o_orderkey % 11 = 0 THEN 'O2' ELSE o_orderstatus END "
        "AS o_orderstatus, "
        "CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice * 2 "
        "ELSE o_totalprice END AS o_totalprice, TRUE AS p "
        "FROM orders WHERE o_orderkey % 19 <> 3),\n"
        "t AS (SELECT o_orderkey, "
        "CASE WHEN o_orderkey % 11 = 0 THEN "
        "(CASE WHEN o_orderkey % 2 = 0 THEN 'O2' ELSE 'T2' END) "
        "ELSE o_orderstatus END AS o_orderstatus, "
        "CASE WHEN o_orderkey % 13 = 0 THEN NULL "
        "ELSE o_totalprice END AS o_totalprice, TRUE AS p FROM orders)\n"
        "SELECT COALESCE(b.o_orderkey, o.o_orderkey, t.o_orderkey) "
        'AS "K_O_ORDERKEY",\n'
        '  COALESCE(b.p, FALSE) AS "in_base", '
        'COALESCE(o.p, FALSE) AS "in_ours", '
        'COALESCE(t.p, FALSE) AS "in_theirs",\n'
        f"  {st('o_orderstatus')},\n"
        f"  {st('o_totalprice')}\n"
        "FROM b FULL OUTER JOIN o "
        "ON b.o_orderkey IS NOT DISTINCT FROM o.o_orderkey "
        "FULL OUTER JOIN t "
        "ON COALESCE(b.o_orderkey, o.o_orderkey) "
        "IS NOT DISTINCT FROM t.o_orderkey"
    )


def diff_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key diff with per-side WHERE filters (P1 + composite key):
    before/after are overlapping shipdate slices of lineitem."""
    li = load_table(spark, "lineitem", sf_dir)
    before = li.filter(F.col("l_suppkey") % 7 != 2)
    after = li.withColumn(
        "l_quantity",
        F.when(F.col("l_partkey") % 17 == 0, F.col("l_quantity") + F.lit(1.0))
        .otherwise(F.col("l_quantity")),
    )
    return diff(
        before, after, ["l_orderkey", "l_linenumber"],
        before_where="l_orderkey % 5 <> 4",
        after_where="l_orderkey % 5 <> 4 AND l_orderkey % 31 <> 6",
    )


LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]


def diff_lineitem_oracle_sql() -> str:
    before_src = "(SELECT * FROM lineitem WHERE l_suppkey % 7 <> 2) b_src"
    after_src = (
        "(SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "CASE WHEN l_partkey % 17 = 0 THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM lineitem) a_src"
    )
    return render_diff_sql(
        before_src, after_src, ["l_orderkey", "l_linenumber"],
        LINEITEM_COLS, LINEITEM_COLS,
        before_where="l_orderkey % 5 <> 4",
        after_where="l_orderkey % 5 <> 4 AND l_orderkey % 31 <> 6",
    )


# --------------------------------------------------------------------------
# CDC patch family (operators/patch.py): compact changefeed + delta apply
# --------------------------------------------------------------------------
# Scoped to the shared 6-column schema (the after-only o_channel column is
# constant-valued drift, not churn — including it would make every common
# row an "update" and defeat the churn-proportional story).

DELTA_VALUE_COLS = [
    "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
]


def delta_compact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact CDC delta between the flagship snapshots: one row per
    inserted/updated/deleted key with the surviving values — the changefeed
    a replication system would ship instead of the full snapshot
    (operators/patch.py::compact_delta; output is proportional to churn)."""
    from checkatron_spark.operators.patch import compact_delta

    cols = ["o_orderkey"] + DELTA_VALUE_COLS
    return compact_delta(
        orders_before(spark, sf_dir).select(*cols),
        orders_after(spark, sf_dir).select(*cols),
        ["o_orderkey"],
        DELTA_VALUE_COLS,
    )


def delta_compact_orders_oracle_sql() -> str:
    vc = DELTA_VALUE_COLS
    b_sel = ", ".join(f"b.{c} AS b_{c}" for c in vc)
    a_sel = ", ".join(f"a.{c} AS a_{c}" for c in vc)
    changed = " OR ".join(f"b_{c} IS DISTINCT FROM a_{c}" for c in vc)
    pick = ", ".join(f"CASE WHEN ap THEN a_{c} ELSE b_{c} END AS {c}" for c in vc)
    return (
        f"WITH b AS (SELECT *, TRUE AS p FROM {BEFORE_SRC_SQL}),\n"
        f"a AS (SELECT *, TRUE AS p FROM {AFTER_SRC_SQL}),\n"
        f"j AS (SELECT b.o_orderkey AS bk, a.o_orderkey AS ak, "
        f"b.p AS bp, a.p AS ap, {b_sel}, {a_sel} "
        f"FROM b FULL OUTER JOIN a "
        f"ON b.o_orderkey IS NOT DISTINCT FROM a.o_orderkey)\n"
        f"SELECT CASE WHEN bp IS NULL THEN 'I' WHEN ap IS NULL THEN 'D' "
        f"ELSE 'U' END AS _op,\n"
        f"  COALESCE(bk, ak) AS o_orderkey, {pick}\n"
        f"FROM j WHERE bp IS NULL OR ap IS NULL OR {changed}"
    )


def apply_delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct the after snapshot (shared columns) as before + compact
    delta (operators/patch.py::apply_delta). The oracle is the after
    snapshot itself — the roundtrip must be bit-exact."""
    from checkatron_spark.operators.patch import apply_delta, compact_delta

    cols = ["o_orderkey"] + DELTA_VALUE_COLS
    base = orders_before(spark, sf_dir).select(*cols)
    delta = compact_delta(
        base, orders_after(spark, sf_dir).select(*cols),
        ["o_orderkey"], DELTA_VALUE_COLS,
    )
    return apply_delta(base, delta, ["o_orderkey"], DELTA_VALUE_COLS)


def apply_delta_roundtrip_oracle_sql() -> str:
    cols = ", ".join(["o_orderkey"] + DELTA_VALUE_COLS)
    return f"SELECT {cols} FROM {AFTER_SRC_SQL}"


def delta_compose_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed composition: the 3-state chain before → orders → after
    yields two feeds; ``compose_deltas`` merges them and one ``apply_delta``
    must land on the after snapshot (operators/patch.py). Exercises the full
    op algebra — I·U, U·D, D·I revival, I·D cancellation — against the same
    oracle as apply_delta_roundtrip."""
    from checkatron_spark.operators.patch import (
        apply_delta,
        compact_delta,
        compose_deltas,
    )

    cols = ["o_orderkey"] + DELTA_VALUE_COLS
    before = orders_before(spark, sf_dir).select(*cols)
    mid = load_table(spark, "orders", sf_dir).select(*cols)
    after = orders_after(spark, sf_dir).select(*cols)
    keys = ["o_orderkey"]
    d1 = compact_delta(before, mid, keys, DELTA_VALUE_COLS)
    d2 = compact_delta(mid, after, keys, DELTA_VALUE_COLS)
    composed = compose_deltas(d1, d2, keys, DELTA_VALUE_COLS)
    return apply_delta(before, composed, keys, DELTA_VALUE_COLS)


def ivm_orders_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): a per-priority
    count+sum view materialized over the before snapshot is brought current
    with the before→after changefeed — adjustment cost ∝ churn, the base
    is never rescanned. The oracle recomputes the view directly over the
    after snapshot; both must hash-match exactly (integer-cents sums)."""
    from checkatron_spark.operators.ivm import maintain_sum_view, sum_view
    from checkatron_spark.operators.patch import compact_delta

    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")

    def frame(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey", "o_orderpriority", cents.alias("price_c")
        )

    b = frame(orders_before(spark, sf_dir))
    a = frame(orders_after(spark, sf_dir))
    view = sum_view(b, ["o_orderpriority"], ["price_c"])
    delta = compact_delta(
        b, a, ["o_orderkey"], ["o_orderpriority", "price_c"],
        include_before=True,
    )
    maintained = maintain_sum_view(
        view, delta, ["o_orderpriority"], ["price_c"]
    )
    return maintained.select(
        "o_orderpriority",
        "n_rows",
        (F.col("sum_price_c").cast("double") / F.lit(100.0)).alias("sum_price"),
    )


def ivm_orders_totals_oracle_sql() -> str:
    return (
        "SELECT o_orderpriority, COUNT(*) AS n_rows, "
        "CAST(SUM(COALESCE(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT), "
        "0)) AS DOUBLE) / 100.0 AS sum_price "
        f"FROM {AFTER_SRC_SQL} GROUP BY o_orderpriority"
    )


def ivm_orders_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX view maintenance with partial rescan (operators/ivm.py):
    dirty groups (extremum retracted by the changefeed) are recomputed via
    a semi-joined scan of the after snapshot; clean groups adjust
    arithmetically. Oracle: the view recomputed directly over after."""
    from checkatron_spark.operators.ivm import maintain_minmax_view, minmax_view
    from checkatron_spark.operators.patch import compact_delta

    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")

    def frame(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey", "o_orderpriority", cents.alias("price_c")
        )

    b = frame(orders_before(spark, sf_dir))
    a = frame(orders_after(spark, sf_dir))
    view = minmax_view(b, ["o_orderpriority"], "price_c")
    delta = compact_delta(
        b, a, ["o_orderkey"], ["o_orderpriority", "price_c"],
        include_before=True,
    )
    maintained = maintain_minmax_view(
        view, delta, a, ["o_orderpriority"], "price_c"
    )
    return maintained.select(
        "o_orderpriority",
        "n_rows",
        (F.col("min_price_c").cast("double") / F.lit(100.0)).alias("min_price"),
        (F.col("max_price_c").cast("double") / F.lit(100.0)).alias("max_price"),
    )


def ivm_orders_minmax_oracle_sql() -> str:
    c = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
    return (
        "SELECT o_orderpriority, COUNT(*) AS n_rows, "
        f"CAST(MIN({c}) AS DOUBLE) / 100.0 AS min_price, "
        f"CAST(MAX({c}) AS DOUBLE) / 100.0 AS max_price "
        f"FROM {AFTER_SRC_SQL} GROUP BY o_orderpriority"
    )


# dim-side changefeed fixture for join-view IVM: customers gain/lose rows
# and churn an attribute between the "before" and "after" dim snapshots —
# % 31 == 2 rows are absent BEFORE (so their AFTER arrival is a dim INSERT
# that must resolve previously-dangling facts), % 29 == 5 rows are deleted
# AFTER, and % 17 == 0 survivors get an acctbal bump (dim UPDATE)
_DIM_FK_MOVE = (
    "CASE WHEN o_orderkey % 37 = 1 THEN o_custkey + 1 ELSE o_custkey END"
)
CUST_BEFORE_SQL = (
    "(SELECT c_custkey AS o_custkey, c_name, c_acctbal "
    "FROM customer WHERE c_custkey % 31 <> 2) cb"
)
CUST_AFTER_SQL = (
    "(SELECT c_custkey AS o_custkey, c_name, "
    "CASE WHEN c_custkey % 17 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END "
    "AS c_acctbal FROM customer WHERE c_custkey % 29 <> 5) ca"
)


def ivm_join_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view IVM (operators/ivm.py maintain_join_view): the enriched
    orders⋈customer view materialized over the BEFORE snapshots is brought
    current from compact changefeeds on BOTH sides — fact churn (the
    flagship before→after orders perturbation plus an fk re-point on
    o_orderkey % 37 == 1), dim updates (acctbal bump), dim deletes (orders
    pointing at them drop out), and dim inserts that resolve previously-
    dangling facts. The oracle recomputes the join over the after
    snapshots; both must hash-match exactly."""
    from checkatron_spark.operators.ivm import join_view, maintain_join_view
    from checkatron_spark.operators.patch import compact_delta

    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    f_b = orders_before(spark, sf_dir).select(*fact_cols)
    f_a = orders_after(spark, sf_dir).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 37 == 1, F.col("o_custkey") + 1)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_totalprice",
    )

    cust = load_table(spark, "customer", sf_dir)
    d_b = cust.filter(F.col("c_custkey") % 31 != 2).select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    d_a = cust.filter(F.col("c_custkey") % 29 != 5).select(
        F.col("c_custkey").alias("o_custkey"),
        "c_name",
        F.when(
            F.col("c_custkey") % 17 == 0, F.col("c_acctbal") + F.lit(10.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )

    view = join_view(f_b, d_b, "o_custkey")
    delta_f = compact_delta(
        f_b, f_a, ["o_orderkey"], ["o_custkey", "o_totalprice"]
    )
    delta_d = compact_delta(
        d_b, d_a, ["o_custkey"], ["c_name", "c_acctbal"]
    )
    out = maintain_join_view(
        view, delta_f, delta_d, f_a, d_a, ["o_orderkey"], "o_custkey"
    )
    return out.select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_acctbal"
    )


def ivm_join_enriched_oracle_sql() -> str:
    return (
        "SELECT o.o_orderkey, ca.o_custkey, o.o_totalprice, "
        "ca.c_name, ca.c_acctbal "
        f"FROM (SELECT o_orderkey, {_DIM_FK_MOVE} AS o_custkey, "
        f"o_totalprice FROM {AFTER_SRC_SQL}) o "
        f"JOIN {CUST_AFTER_SQL} ON o.o_custkey = ca.o_custkey"
    )


def zorder_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (functions/layout.py): Morton-interleave
    (o_custkey, order-date-days) into a 32-bit key, group by its high bits
    (65536-cell buckets) and report each bucket's min/max rectangle in both
    dimensions. Tight rectangles = tight parquet footer stats = both
    filters prune after a Z-ordered write. Pure codegen bit arithmetic +
    one aggregation; bit-identical to the DuckDB oracle."""
    from checkatron_spark.functions.layout import zorder_key2

    o = load_table(spark, "orders", sf_dir)
    a = (F.col("o_custkey") % F.lit(65536)).cast("bigint")
    b = (
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("bigint")
        % F.lit(65536)
    )
    z = zorder_key2(a, b)
    return (
        o.select(
            F.shiftright(z, 16).alias("zbucket"),
            a.alias("_a"),
            b.alias("_b"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_a").alias("min_cust"),
            F.max("_a").alias("max_cust"),
            F.min("_b").alias("min_day"),
            F.max("_b").alias("max_day"),
        )
    )


def zorder_bucket_audit_oracle_sql() -> str:
    from checkatron_spark.functions.layout import zorder_key2_sql

    a = "(o_custkey % 65536)"
    b = "(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 65536)"
    z = zorder_key2_sql(a, b)
    return (
        f"SELECT ({z} >> 16) AS zbucket, COUNT(*) AS n_rows, "
        f"MIN({a}) AS min_cust, MAX({a}) AS max_cust, "
        f"MIN({b}) AS min_day, MAX({b}) AS max_day "
        f"FROM orders GROUP BY 1"
    )


def cdc_log_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-style log compaction (operators/patch.py::compact_log): the two
    sequenced feeds of the before → orders → after chain form an append log;
    keep-latest-per-key compaction + ONE apply must equal replaying both
    feeds in order (oracle: the after snapshot)."""
    from checkatron_spark.operators.patch import (
        apply_delta,
        compact_delta,
        compact_log,
    )

    cols = ["o_orderkey"] + DELTA_VALUE_COLS
    keys = ["o_orderkey"]
    before = orders_before(spark, sf_dir).select(*cols)
    mid = load_table(spark, "orders", sf_dir).select(*cols)
    after = orders_after(spark, sf_dir).select(*cols)
    log = (
        compact_delta(before, mid, keys, DELTA_VALUE_COLS)
        .withColumn("_seq", F.lit(1))
        .unionByName(
            compact_delta(mid, after, keys, DELTA_VALUE_COLS)
            .withColumn("_seq", F.lit(2))
        )
    )
    latest = compact_log(log, keys, ["_seq"])
    return apply_delta(before, latest, keys, DELTA_VALUE_COLS)


def map_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entry MAP-column diff (operators/mapdiff.py): the flagship
    snapshots' metadata packed as map<string,string> — after gains a
    'channel' entry and perturbs 'status' — diffed at entry granularity.
    The oracle enumerates the three entry keys analytically; the Spark side
    runs the generic map-explode machinery."""
    from checkatron_spark.operators.mapdiff import map_diff

    def pack(df: DataFrame, with_channel: bool) -> DataFrame:
        pairs = [
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ]
        if with_channel:
            pairs += [F.lit("channel"), F.col("o_channel")]
        return df.select("o_orderkey", F.create_map(*pairs).alias("meta"))

    b = pack(orders_before(spark, sf_dir), False)
    a = pack(orders_after(spark, sf_dir), True)
    return map_diff(b, a, ["o_orderkey"], "meta")


def map_diff_orders_oracle_sql() -> str:
    rs = "CASE WHEN bp IS NULL THEN 4 WHEN ap IS NULL THEN 5 END"

    def st(bv: str, av: str) -> str:
        return (
            f"CASE WHEN ({bv}) IS NULL AND ({av}) IS NULL THEN 0 "
            f"WHEN ({bv}) IS NULL THEN 2 "
            f"WHEN ({av}) IS NULL THEN 3 "
            f"WHEN ({bv}) = ({av}) THEN 0 ELSE 1 END"
        )

    ent = lambda key, bv, av, where: (  # noqa: E731
        f"SELECT {rs} AS \"_row_status\", COALESCE(bk, ak) AS \"K_o_orderkey\", "
        f"'{key}' AS entry_key, {st(bv, av)} AS status FROM j{where}"
    )
    return (
        "WITH b AS (SELECT o_orderkey, o_orderstatus, o_orderpriority, "
        f"TRUE AS p FROM {BEFORE_SRC_SQL}),\n"
        "a AS (SELECT o_orderkey, o_orderstatus, o_orderpriority, o_channel, "
        f"TRUE AS p FROM {AFTER_SRC_SQL}),\n"
        "j AS (SELECT b.o_orderkey AS bk, a.o_orderkey AS ak, b.p AS bp, "
        "a.p AS ap, b.o_orderstatus AS b_st, a.o_orderstatus AS a_st, "
        "b.o_orderpriority AS b_pr, a.o_orderpriority AS a_pr, "
        "a.o_channel AS a_ch FROM b FULL OUTER JOIN a "
        "ON b.o_orderkey IS NOT DISTINCT FROM a.o_orderkey)\n"
        + ent("status", "CASE WHEN bp THEN b_st END",
              "CASE WHEN ap THEN a_st END", "")
        + "\nUNION ALL\n"
        + ent("priority", "CASE WHEN bp THEN b_pr END",
              "CASE WHEN ap THEN a_pr END", "")
        + "\nUNION ALL\n"
        + ent("channel", "NULL", "CASE WHEN ap THEN a_ch END", " WHERE ap")
    )
