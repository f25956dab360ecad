"""Relational core (TPC-H-shaped) and event-stream queries (streaming-shaped, batch-checked).

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import (
    _register,
    _t,
)


# ===========================================================================
# 2. relational core (TPC-H-shaped)
# ===========================================================================


@_register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-agg with partial aggregation; money integer-
    scaled to cents so the cross-engine hash is exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_c"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_price_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "top_revenue_orders",
    oracle="""
SELECT o.o_orderkey, c.c_mktsegment,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, c.c_mktsegment
ORDER BY revenue_c DESC, o_orderkey LIMIT 10
""",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (TPC-H Q3 shape). The
    customer dim is broadcast; lineitem⋈orders shuffles on orderkey."""
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_c")
        )
        .orderBy(F.col("revenue_c").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "segment_order_stats",
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       count(DISTINCT o.o_custkey) AS n_customers,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
)
def q_segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + multi-agg with exact distinct count."""
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_c"),
        )
        .orderBy("c_mktsegment")
    )


@_register(
    "nation_customer_rollup",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation, count(c.c_custkey) AS n_customers
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name, n.n_name ORDER BY region, nation
""",
)
def q_nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-dim-fact join chain, broadcast all the way (J1/J2 shape)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(r)
        .join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("region", "nation")
    )


@_register(
    "order_lines_topk",
    oracle="""
SELECT o_orderkey, l_linenumber, price_c, rk FROM (
  SELECT l_orderkey AS o_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
                                     l_linenumber) AS rk
  FROM lineitem
) WHERE rk <= 2 AND o_orderkey % 100 = 0
ORDER BY o_orderkey, rk
""",
)
def q_order_lines_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O5 shape — per-group top-k window (2 priciest lines per order;
    sampled 1-in-100 orders to keep the result compact)."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    w = Window.partitionBy("l_orderkey").orderBy(
        price_c.desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("price_c", price_c)
        .withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 2) & (F.col("l_orderkey") % 100 == 0))
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "price_c", "rk")
        .orderBy("o_orderkey", "rk")
    )


@_register(
    "customer_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c
FROM orders WHERE o_custkey % 50 = 0
ORDER BY o_custkey, o_orderkey
""",
)
def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window (running revenue per customer, sampled)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w).alias("running_c"),
    ).orderBy("o_custkey", "o_orderkey")


# ===========================================================================
# 3. events (streaming-shaped, batch-checked)
# ===========================================================================


@_register(
    "events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type
""",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregation (the batch twin of the Structured
    Streaming rollup in streaming/). The window key is a rendered STRING:
    formatting round-trips the stored wall-clock value identically in any
    session timezone, where epoch seconds would shift."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_str"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
        .orderBy("hour_str", "event_type")
    )


@_register(
    "events_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via lag + cumulative flag-sum — the
    batch form of streaming session windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    epoch = F.unix_millis(F.col("ts").cast("timestamp"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (epoch - F.lag(epoch).over(w) > 1800000) | F.lag(epoch).over(w).isNull(), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wc))
    return (
        sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_millis(F.max("ts").cast("timestamp")) - F.unix_millis(F.min("ts").cast("timestamp")))
            .cast("long")
            .alias("duration_ms"),
        )
        .orderBy("user_id", "session_id")
    )


# ===========================================================================
