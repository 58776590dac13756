"""General DataFrame operator surface over the driver's TPC-H-ish tables.

These queries exercise the operator families from SURVEY.md §2 (joins,
aggregations, windows, filters, set ops, scalar functions) on relational
data so the driver's DuckDB oracle can hash-check them.  The graph-semantic
operators (adjacency, closure, TRAPI) live in ``queries/graph.py``; the
LLM-pipeline operators in ``queries/pipeline.py``.

Scale notes (100 TB readiness):
- every aggregation is expressed so Spark plans partial (map-side) aggs;
- joins put the small dimension on the broadcast side;
- filters are written against raw columns so they push down to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ploverdb_spark.catalog import load, register

# Exact money arithmetic: decimal casts make the sum order-independent and
# bit-identical between Spark and DuckDB; final cast back to double.
_DEC = "decimal(18,2)"


@register(
    "a1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: groupBy + partial-aggregated sums "
    "(SURVEY §2.4 aggregation family; decimal-exact for oracle parity).",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "j2_region_revenue",
    oracle="""
    SELECT
      n.n_name AS nation,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE') AND o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
    doc="One-hop-expansion analog (SURVEY §2.3 J2): fact-to-dimension hash "
    "joins with broadcast dims and a pushed-down filter.",
)
def j2_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
        )
    )


@register(
    "j1_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
    doc="Referential-integrity / orphan detection via anti-join "
    "(SURVEY §2.3 J1, plover.py:1113-1129 behavior re-expressed). The "
    "price filter keeps the result non-empty at sf0.01 so the check is "
    "non-trivial.",
)
def j1_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "a2_first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn = 1
    """,
    doc="First-example-per-group (SURVEY §2.4 A2, plover.py:1156-1163): "
    "top-1 per group with deterministic tie-break.",
)
def a2_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 optimization (guide §2.3 "aggregate before you shuffle"): the
    # row_number window form sorted ALL orders by (custkey, date, key)
    # behind a full exchange just to keep row 1 per customer; min_by
    # over the (date, key) struct returns the SAME row (unique
    # o_orderkey tie-break, lexicographic struct order == the window's
    # ORDER BY) from a hash aggregation with map-side partial agg — no
    # sort, and the shuffle carries one row per (customer, map
    # partition) instead of every order.  Results proven identical
    # (exceptAll 0 both directions at sf0.1; oracle green at both SFs);
    # interleaved A/B min-of-6: 0.332 -> 0.229 s, every paired rep
    # faster.
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.min_by(
                F.struct("o_orderkey", "o_orderdate"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("__r")
        )
        .select("o_custkey", "__r.o_orderkey", "__r.o_orderdate")
    )


@register(
    "a3_segment_nations",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT n.n_name)), '|') AS nations
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c_mktsegment
    """,
    doc="Category->prefix-set aggregation analog (SURVEY §2.4 A3, "
    "plover.py:1221-1228): collect_set with sorted output for determinism. "
    "The set is serialized '|'-joined so the driver's hasher can handle it.",
)
def a3_segment_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(F.sort_array(F.collect_set("n_name")), "|").alias("nations"),
        )
    )


@register(
    "f5_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Top-k with unique tie-break (SURVEY §2.8 limits; answer-cutoff "
    "F5 analog plover.py:2051-2058).",
)
def f5_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


@register(
    "a6_conditional_grouping",
    oracle="""
    SELECT
      o_orderpriority,
      CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS bucket,
      COUNT(*) AS n,
      CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
      CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority,
             CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END
    """,
    doc="Conditional result-grouping key (SURVEY §2.4 A6 is_set semantics, "
    "plover.py:2330-2387): when/otherwise grouping + exact min/max.",
)
def a6_conditional_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = F.when(F.col("o_totalprice") > 150000, F.lit("big")).otherwise(F.lit("small"))
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "set_ops_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
    doc="Set algebra (SURVEY §2.8): INTERSECT of row sets (reference uses "
    "Python set intersection, plover.py:2041,2047,2082).",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big_spenders = (
        orders.where(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(big_spenders)


@register(
    "f1_event_type_stats",
    oracle="""
    SELECT
      event_type,
      CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(MIN(value) AS DOUBLE) AS min_value,
      CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)
    """,
    doc="Predicate filter + time-bucketed aggregation over the events table "
    "(SURVEY §2.5 F1/F2 filter family; batch analog of the streaming path).",
)
def f1_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.where(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
    )


@register(
    "j3_doubly_pinned",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
      AND l.l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
    """,
    doc="Doubly-pinned semi-join (SURVEY §2.3 J3, plover.py:2068-2095): "
    "both endpoints constrained via left-semi joins.",
)
def j3_doubly_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") > 40)
    supplier = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey, "left_semi")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    )


@register(
    "j11_order_parts",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT l_partkey)), '|') AS parts
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 5
    """,
    doc="Batch neighbors analog (SURVEY §2.3 J11, plover.py:1982-2009): one "
    "aggregation replaces the reference's per-id loop.",
)
def j11_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(F.sort_array(F.collect_set("l_partkey")), lambda x: x.cast("string")),
                "|",
            ).alias("parts"),
        )
        .where(F.col("n_lines") >= 5)
    )
