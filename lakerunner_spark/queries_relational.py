"""Relational query catalog: multi-join / heavy-aggregation queries.

These exercise the Spark planes the telemetry operators lean on —
broadcast vs shuffle join selection, partial aggregation, semi-join
pruning — at bench scale (sf0.1). TPC-H-shaped over the driver's
synthetic star schema (dates adapted to the generated 1995-2001 range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import load_table

# Date cutoffs within the synthetic data's 1995-2001 range. The parquet
# date columns surface as TIMESTAMP_NTZ; comparing against NTZ literals
# is calendar-based and timezone-free on both engines.
_D_1996_01_01 = "1996-01-01"
_D_1996_03_15 = "1996-03-15"
_D_1997_01_01 = "1997-01-01"
_D_1998_09_02 = "1998-09-02"


def _ntz(date_str: str) -> F.Column:
    return F.expr(f"TIMESTAMP_NTZ '{date_str} 00:00:00'")


@register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           pround(sum(l_quantity), 2) AS sum_qty,
           pround(sum(l_extendedprice), 2) AS sum_base_price,
           pround(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           pround(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           pround(avg(l_quantity), 6) AS avg_qty,
           pround(avg(l_extendedprice), 6) AS avg_price,
           pround(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_D_1998_09_02}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy aggregation; Catalyst: filter+projection pushdown, partial agg."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ntz(_D_1998_09_02))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _pr(F.sum("l_quantity"), 2).alias("sum_qty"),
            _pr(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _pr(F.sum(disc_price), 2).alias("sum_disc_price"),
            _pr(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            _pr(F.avg("l_quantity"), 6).alias("avg_qty"),
            _pr(F.avg("l_extendedprice"), 6).alias("avg_price"),
            _pr(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           pround(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_D_1996_03_15}'
      AND l_shipdate > TIMESTAMP '{_D_1996_03_15}'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + global top-n (TakeOrderedAndProject).

    customer is small relative to lineitem -> broadcast it; at 100 TB the
    orders⋈lineitem join shuffles on orderkey (its natural co-location
    key — bucketed layouts make it shuffle-free).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ntz(_D_1996_03_15)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ntz(_D_1996_03_15)
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
            ).select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            _pr(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier",
    f"""
    SELECT n_name,
           pround(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{_D_1996_01_01}'
      AND o_orderdate < TIMESTAMP '{_D_1997_01_01}'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join: dimension tables broadcast, fact joins shuffle on keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(_D_1996_01_01))
        & (F.col("o_orderdate") < _ntz(_D_1997_01_01))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _pr(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT pround(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_D_1996_01_01}'
      AND l_shipdate < TIMESTAMP '{_D_1997_01_01}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+agg — all predicates reach the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ntz(_D_1996_01_01))
        & (F.col("l_shipdate") < _ntz(_D_1997_01_01))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _pr(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           pround(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{_D_1996_01_01}'
      AND o_orderdate < TIMESTAMP '{_D_1996_03_15}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join + agg + top-n: fact-fact shuffle join on orderkey,
    dims broadcast, TakeOrderedAndProject for the limit."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(_D_1996_01_01))
        & (F.col("o_orderdate") < _ntz(_D_1996_03_15))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _pr(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "tpch_q12_priority_lines",
    f"""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '{_D_1996_01_01}'
      AND l_shipdate < TIMESTAMP '{_D_1997_01_01}'
    GROUP BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped join + conditional aggregation (CASE partial-agg
    pushdown), adapted to the synthetic schema's columns."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz(_D_1996_01_01))
        & (F.col("l_shipdate") < _ntz(_D_1997_01_01))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "w5_running_revenue",
    f"""
    SELECT o_custkey, o_orderkey,
           pround(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    WHERE o_custkey < 100
    """,
)
def w5_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running total + sequence per customer (general window
    surface beyond the telemetry RANGE frames)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _pr(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "u2_union_streams",
    f"""
    SELECT event_type, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS chq_timestamp,
           value
    FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_type, CAST(epoch_ns(ts) // 1000000 AS BIGINT), value
    FROM events WHERE event_type = 'purchase' AND value > 100.0
    """,
)
def u2_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: unionByName of per-leaf result streams."""
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, sf_dir)
    a = e.filter(F.col("event_type") == "error")
    b = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
    cols = ["event_type", "chq_timestamp", "value"]
    return a.select(cols).unionByName(b.select(cols))

@register(
    "tpch_q4_order_priority",
    f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_D_1996_01_01}'
      AND o_orderdate < TIMESTAMP '{_D_1997_01_01}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS → left-semi shuffle join on orderkey (both sides
    hash-partitioned on the key; semi-join never materializes lineitem
    columns, so the scan prunes to l_orderkey+l_returnflag only)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(_D_1996_01_01))
        & (F.col("o_orderdate") < _ntz(_D_1997_01_01))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q22_idle_rich_customers",
    f"""
    SELECT c_mktsegment, count(*) AS numcust,
           pround(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT pround(avg(c_acctbal), 2) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: broadcast scalar threshold (cross-join of a 1-row agg,
    never a collect) + left-anti join against date-filtered orders.
    The threshold is rounded on both engines so the comparison is
    bit-identical (see oracle-parity rules)."""
    cust = load_table(spark, sf_dir, "customer")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(_pr(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ntz("2000-01-01")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _pr(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    """
    SELECT pround(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) ON l_partkey = pk
    WHERE l_quantity < qty_limit
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped correlated scalar subquery, decorrelated as a
    pre-aggregated self-join: both sides hash-partition on partkey, so
    the agg output reuses the join's exchange. Quantities are
    integer-valued doubles → the avg is order-independent and exact."""
    li = load_table(spark, sf_dir, "lineitem")
    limits = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(limits, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(_pr(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q18_large_volume",
    """
    SELECT c_name, c_custkey, o_orderkey,
           pround(o_totalprice, 2) AS o_totalprice_r,
           pround(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150.0)
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice_r DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped HAVING-IN subquery → semi-join on a pre-aggregated key
    set; sum(l_quantity) is exact over integer-valued doubles. Shuffle
    joins co-partition on orderkey; customer dim broadcasts; the final
    top-n is TakeOrderedAndProject (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qsum"))
        .filter(F.col("qsum") > 150.0)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_okey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(_pr(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _pr(F.col("o_totalprice"), 2).alias("o_totalprice_r"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice_r").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )
