"""Window-function and temporal-join operators over the events table.

The reference has no window functions (SURVEY §2.8) — these queries are
part of the beyond-reference general DataFrame surface: sessionization,
lag/running aggregates, rollup grouping sets, and an as-of join, each the
kind of operator a large-scale event/training-data pipeline needs.

Scale notes: every window partitions by a high-cardinality key (user_id /
order), so work distributes; the as-of join pre-filters both sides before
the range condition, and the rollup is one pass with partial aggregation.

Timestamps are compared as truncated epoch seconds on BOTH engines
(Spark ``cast(ts as long)`` == DuckDB ``floor(epoch(ts))``) so the oracle
hash never depends on sub-second parquet precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ploverdb_spark.catalog import load, register

_DEC = "decimal(18,2)"

SESSION_GAP_SEC = 1800


@register(
    "w1_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts_sec,
             CASE WHEN ts_sec - LAG(ts_sec) OVER w > {SESSION_GAP_SEC}
                       OR LAG(ts_sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts_sec,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_sec, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_sec) AS session_start,
           MAX(ts_sec) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: per-user gap>30min breaks via lag + running sum "
    "(two windows, one shuffle on user_id), then per-session aggregation.",
)
def w1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("ts_sec")
    )
    w = W.partitionBy("user_id").orderBy("ts_sec", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            (F.col("ts_sec") - F.lag("ts_sec").over(w) > SESSION_GAP_SEC)
            | F.lag("ts_sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_sec").alias("session_start"),
        F.max("ts_sec").alias("session_end"),
    )


@register(
    "w2_rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Grouping sets via ROLLUP (status, priority): hierarchical "
    "subtotals + grand total in one partial-aggregated pass.",
)
def w2_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
    )


@register(
    "w3_value_deltas",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE user_id <= 100
    )
    SELECT user_id, event_id,
           CAST(v - COALESCE(LAG(v) OVER w, CAST(0 AS DECIMAL(18,6)))
                AS DOUBLE) AS delta,
           CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS running_total
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    """,
    doc="Lag deltas + running totals per user (ordered analytic windows; "
    "decimal accumulation keeps the running sum order-exact).",
)
def w3_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") <= 100)
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("long").alias("ts_sec"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (
            F.col("v")
            - F.coalesce(F.lag("v").over(w), F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("delta"),
        F.sum("v")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
    )


@register(
    "j12_asof_last_order",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events WHERE user_id <= 50
    ), o AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT)
               AS order_sec
      FROM orders
    ), ranked AS (
      SELECT e.user_id, e.event_id, e.ts_sec, o.o_orderkey, o.order_sec,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.order_sec DESC, o.o_orderkey DESC)
               AS rn
      FROM e JOIN o ON o.o_custkey = e.user_id AND o.order_sec <= e.ts_sec
    )
    SELECT user_id, event_id, ts_sec,
           o_orderkey AS last_order_key, order_sec AS last_order_sec
    FROM ranked WHERE rn = 1
    """,
    doc="As-of join (operator the reference lacks, SURVEY §2.3 note): for "
    "each event, that user's most recent order at-or-before the event — "
    "equi-join on user + range condition + per-event top-1 window. At "
    "scale the equi-key bounds the range-join blowup per key.",
)
def j12_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") <= 50)
        .select("user_id", "event_id", F.col("ts").cast("long").alias("ts_sec"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_sec"),
    )
    joined = events.join(
        orders,
        (orders.o_custkey == events.user_id) & (orders.order_sec <= events.ts_sec),
    )
    # r12 optimization (guide §2.3 "aggregate before you shuffle"): the
    # per-event top-1 was a row_number window — a full sort of the
    # range-join blowup behind its exchange.  max_by over the
    # (order_sec, o_orderkey) struct picks the SAME row (unique
    # o_orderkey tie-break; lexicographic struct order == the window's
    # ORDER BY ... DESC pair) from a hash aggregation whose map-side
    # partial agg collapses each event's matching orders BEFORE the
    # shuffle — the term that matters at scale, where the range join
    # multiplies rows per event.  Results proven identical (exceptAll 0
    # both directions at sf0.1; oracle green at both SFs); interleaved
    # A/B min-of-6: 0.457 -> 0.412 s.
    return (
        joined.groupBy("user_id", "event_id", "ts_sec")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "order_sec"),
                F.struct("order_sec", "o_orderkey"),
            ).alias("__r")
        )
        .select(
            "user_id",
            "event_id",
            "ts_sec",
            F.col("__r.o_orderkey").alias("last_order_key"),
            F.col("__r.order_sec").alias("last_order_sec"),
        )
    )
