"""Relational operators from SURVEY.md §2 over the driver tables.

Coverage mapping (reference → here):
- A5/A8/A10 page/metric roll-ups        → pricing_summary
- J8 equi joins + broadcast dims        → top_revenue_nations
- J1–J3 interval joins                  → size_bucket_interval_join
- A1/A2 trap-range interval union       → interval_union_islands
- A2 session clustering (Δy<3 analog)   → event_sessions
- W1 prev-line feature                  → prev_event_transitions
- W4 annotation gap fill                → forward_fill_signup
- W2 adjacent-row pairing               → adjacent_line_pairs
- W6 sequential IDs                     → seq_ids_global
- A4/A9 median & column stats           → median_stats_by_lang
- O6 skip-processed anti join           → orders_without_returns
- O5 dedupe                             → dedupe_prefix_fingerprint (dedup.py)
- C1 regex extraction                   → json_props_extract
- grouping-set style roll-up            → rollup_order_counts

Every computed column is aliased identically in the Spark plan and the
DuckDB oracle SQL; float aggregates are rounded on both sides so the
driver's value-hash compares stably.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import load

# --------------------------------------------------------------------------
# pricing_summary — TPC-H Q1 shape (map-side partial agg, no join)
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 4)                              AS avg_qty,
       round(avg(l_discount), 4)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# top_revenue_nations — 4-way equi join; small dims broadcast explicitly
# --------------------------------------------------------------------------

def q_top_revenue_nations(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"))
    )


SQL_TOP_REVENUE_NATIONS = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC
"""


# --------------------------------------------------------------------------
# size_bucket_interval_join — range/interval join (J1–J3 analog)
# --------------------------------------------------------------------------

_BUCKETS = [(1, 10, "small"), (11, 25, "medium"), (26, 50, "large")]


def q_size_bucket_interval_join(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    buckets = spark.createDataFrame(_BUCKETS, "lo int, hi int, bucket string")
    return (
        part.join(
            F.broadcast(buckets),
            (F.col("p_size") >= F.col("lo")) & (F.col("p_size") <= F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
        )
        .orderBy("bucket")
    )


SQL_SIZE_BUCKET_INTERVAL_JOIN = """
SELECT bucket, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_retail
FROM part
JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large'))
     AS b(lo, hi, bucket)
  ON p_size >= lo AND p_size <= hi
GROUP BY bucket
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# event_sessions — gaps-and-islands sessionization (A1/A2/W3 analog)
# --------------------------------------------------------------------------

def q_event_sessions(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # total order (ts alone can have duplicates within a user — lag/frame
    # would be nondeterministic and diverge from the ROWS-frame oracle)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval comparison (tz-free, works on TIMESTAMP_NTZ)
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


SQL_EVENT_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# prev_event_transitions — W1 lag feature
# --------------------------------------------------------------------------

def q_prev_event_transitions(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "event_type")
    )


SQL_PREV_EVENT_TRANSITIONS = """
WITH lagged AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*) AS n
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""


# --------------------------------------------------------------------------
# forward_fill_signup — W4 gap-fill via running window
# --------------------------------------------------------------------------

def q_forward_fill_signup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.withColumn(
        "last_signup_ts",
        F.max(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).over(w),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("last_signup_ts").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_after_signup"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SQL_FORWARD_FILL_SIGNUP = """
WITH filled AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_signup_ts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN last_signup_ts IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_after_signup,
       count(*) AS n_events
FROM filled GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# adjacent_line_pairs — W2 lead pairing
# --------------------------------------------------------------------------

def q_adjacent_line_pairs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in this corpus — extend the
    # ordering to a total order so lead() is deterministic across engines
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    return (
        li.withColumn("next_qty", F.lead("l_quantity").over(w))
        .where(F.col("next_qty").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("next_qty") > F.col("l_quantity"), 1).otherwise(0)
            ).cast("bigint").alias("n_increasing"),
        )
        .orderBy("l_returnflag")
    )


SQL_ADJACENT_LINE_PAIRS = """
WITH nxt AS (
  SELECT l_returnflag, l_quantity,
         lead(l_quantity) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey,
                      l_extendedprice, l_quantity) AS next_qty
  FROM lineitem
)
SELECT l_returnflag, count(*) AS n_pairs,
       CAST(sum(CASE WHEN next_qty > l_quantity THEN 1 ELSE 0 END) AS BIGINT)
         AS n_increasing
FROM nxt WHERE next_qty IS NOT NULL
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# seq_ids_global — W6 deterministic sequential ids
# --------------------------------------------------------------------------

def q_seq_ids_global(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    # Pre-limit so Spark plans a TakeOrderedAndProject (parallel partial
    # top-k) instead of dragging the whole table through one WindowExec
    # task; the unpartitioned row_number then runs over only 100 rows.
    top = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
    # constant-valued but non-foldable partition key (a foldable literal
    # would be optimized out of the spec): input is the bounded top-100,
    # and a non-empty spec keeps WindowExec's single-partition warning out
    # of the gate logs
    w = Window.partitionBy(F.pmod(F.col("o_orderkey"), F.lit(1))).orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        top.withColumn("seq", F.row_number().over(w))
        .select("seq", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("seq")
    )


SQL_SEQ_IDS_GLOBAL = """
SELECT seq, o_orderkey, price FROM (
  SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS seq,
         o_orderkey, round(o_totalprice, 2) AS price
  FROM orders
) WHERE seq <= 100 ORDER BY seq
"""


# --------------------------------------------------------------------------
# median_stats_by_lang — A4/A9 per-group stats incl. exact median
# --------------------------------------------------------------------------

def q_median_stats_by_lang(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.stddev_samp("n_chars"), 4).alias("sd_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_chars"),
        )
        .orderBy("lang")
    )


SQL_MEDIAN_STATS_BY_LANG = """
SELECT lang, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       round(avg(n_chars), 4) AS avg_chars,
       round(stddev_samp(n_chars), 4) AS sd_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS median_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# orders_without_returns — O6 left anti join (the resume primitive)
# --------------------------------------------------------------------------

def q_orders_without_returns(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(returned, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


SQL_ORDERS_WITHOUT_RETURNS = """
SELECT o_orderstatus, count(*) AS n_orders
FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# rank_topk_parts — top-k per group window
# --------------------------------------------------------------------------

def q_rank_topk_parts(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "p_brand", "rk", "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
        )
        .orderBy("p_brand", "rk")
    )


SQL_RANK_TOPK_PARTS = """
SELECT p_brand, rk, p_partkey, price FROM (
  SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
) WHERE rk <= 3 ORDER BY p_brand, rk
"""


# --------------------------------------------------------------------------
# rollup_order_counts — grouping-sets roll-up
# --------------------------------------------------------------------------

def q_rollup_order_counts(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
        .orderBy("priority", "status")
    )


SQL_ROLLUP_ORDER_COUNTS = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY priority, status
"""


# --------------------------------------------------------------------------
# interval_union_islands — A1 trap-range interval union at SQL level
# --------------------------------------------------------------------------

def q_interval_union_islands(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_max = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    iv = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("iv_end"),
    )
    flagged = iv.withColumn(
        "island_start",
        F.when(
            F.col("o_orderdate") > F.max("iv_end").over(prev_max), 1
        )
        .when(F.lag("o_orderdate").over(w).isNull(), 1)
        .otherwise(0),
    )
    per_cust = flagged.groupBy("o_custkey").agg(
        F.sum("island_start").cast("bigint").alias("n_islands")
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_islands").cast("bigint").alias("islands"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


SQL_INTERVAL_UNION_ISLANDS = """
WITH iv AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         o_orderdate + INTERVAL 7 DAY AS iv_end
  FROM orders
), flagged AS (
  SELECT o_custkey,
         CASE WHEN lag(o_orderdate) OVER w IS NULL THEN 1
              WHEN o_orderdate > max(iv_end) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS island_start
  FROM iv
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), per_cust AS (
  SELECT o_custkey, CAST(sum(island_start) AS BIGINT) AS n_islands
  FROM flagged GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(sum(n_islands) AS BIGINT) AS islands,
       count(*) AS n_customers
FROM per_cust JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# json_props_extract — C1 regex extraction from semi-structured column
# --------------------------------------------------------------------------

def q_json_props_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


SQL_JSON_PROPS_EXTRACT = """
SELECT event_type,
       round(avg(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)), 4)
         AS avg_k,
       max(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# supplier_balance_by_nation — remaining dims coverage (supplier ⋈ nation)
# --------------------------------------------------------------------------

def q_supplier_balance_by_nation(spark, sf_dir):
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.round(F.max("s_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("n_name")
    )


SQL_SUPPLIER_BALANCE_BY_NATION = """
SELECT n_name, count(*) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_bal,
       round(max(s_acctbal), 2) AS max_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --------------------------------------------------------------------------
# revenue_by_region — full dim chain region←nation←customer←orders
# --------------------------------------------------------------------------

def q_revenue_by_region(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("r_name")
    )


SQL_REVENUE_BY_REGION = """
SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --------------------------------------------------------------------------
# monthly_order_trend — C1 date bucketing + window delta
# --------------------------------------------------------------------------

def q_monthly_order_trend(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    # Unpartitioned window, but over the POST-aggregation month table
    # (~tens of rows at any scale) — benign, unlike a window over a raw
    # scan. The plan-audit sweep's hazard detector sees the bounding
    # HashAggregate below the exchange and passes this without any
    # allowlist entry.
    w = Window.orderBy("month")
    return (
        monthly.withColumn(
            "prev_n", F.lag("n_orders").over(w)
        )
        .select(
            F.date_format("month", "yyyy-MM").alias("ym"),
            "n_orders",
            "revenue",
            (F.col("n_orders") - F.coalesce(F.col("prev_n"), F.lit(0)))
            .cast("bigint")
            .alias("delta"),
        )
        .orderBy("ym")
    )


SQL_MONTHLY_ORDER_TREND = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT strftime(month, '%Y-%m') AS ym, n_orders, revenue,
       CAST(n_orders - coalesce(lag(n_orders) OVER (ORDER BY month), 0)
            AS BIGINT) AS delta
FROM monthly ORDER BY ym
"""


# --------------------------------------------------------------------------
# event_value_quantiles — multi-quantile aggregation
# --------------------------------------------------------------------------

def q_event_value_quantiles(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


SQL_EVENT_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# sketch_distinct_users — HLL++ approx distinct (sketch op; rows-only:
# sketch estimates are engine-specific; tolerance oracle in tests)
# --------------------------------------------------------------------------

def q_sketch_distinct_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# sketch_value_percentiles — approx_percentile sketch (rows-only: sketch
# estimates are engine-specific; tolerance-vs-exact oracle in tests)
# --------------------------------------------------------------------------

def q_sketch_value_percentiles(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, 0.5, 10000)").alias("ap50"),
            F.expr("approx_percentile(value, 0.95, 10000)").alias("ap95"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# deterministic_sample — O3/O4 seeded sampling, engine-portable via md5
# --------------------------------------------------------------------------

def q_deterministic_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # hash-based bernoulli sample (~1/8): portable across engines, unlike
    # rand(seed) — the reference's random.sample(seed=42) analog
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1"
    )
    return (
        docs.where(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


SQL_DETERMINISTIC_SAMPLE = """
SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
GROUP BY lang ORDER BY lang
"""


def q_stratified_sample(spark, sf_dir):
    """Per-language fixed-quota deterministic sample (O3/O4 stratified
    variant): a training-data pipeline draws balanced per-stratum subsets
    (per language/source/domain) for eval sets and ablations. Rank within
    each stratum by a content-independent hash of the key (seeded shuffle
    analog, same md5 trick as ``deterministic_sample``) and keep the first
    K — one shuffle on the stratum key, identical rows on any cluster."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
) WHERE rk <= 20 ORDER BY lang, doc_id
"""


# --------------------------------------------------------------------------
# similarity_match_join — J7 bag-of-words coverage theta join with greedy
# best-match (row_number) — reference GROBID↔GS matcher analog
# --------------------------------------------------------------------------

def similarity_match_join(docs, max_word_df: int | None = None):
    """Bag-of-words coverage theta join with greedy best-match (J7).

    Words are hashed to int64 map-side — the join shuffle carries (bigint,
    doc_id) pairs, never word text (the DuckDB oracle joins on text;
    results identical modulo 64-bit collisions).

    ``max_word_df`` is the web-scale stop-word guard (same class as
    ``dedup.MAX_SHINGLE_DF``): a word in k docs yields k² join rows, so at
    100 TB pass e.g. ``max_word_df=10_000``. It defaults to None because a
    meaningful threshold is corpus-relative — the driver fixture draws
    from a ~31-word vocabulary where every word is in >1/3 of all docs, so
    ANY useful absolute cap would zero the fixture. Coverage denominators
    always use the FULL per-doc word count, so surviving pairs score
    identically with or without the cap.
    """
    words = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.split(F.trim("text"), r"\s+"), lambda w: F.xxhash64(w)
                )
            )
        ).alias("w"),
    )
    left = words.where(F.col("source") == "src0").select(
        F.col("doc_id").alias("id_a"), "w"
    )
    right = words.where(F.col("source") == "src1").select(
        F.col("doc_id").alias("id_b"), "w"
    )
    sizes_a = left.groupBy("id_a").agg(F.count(F.lit(1)).alias("na"))
    jl, jr = left, right
    if max_word_df is not None:
        kept = (
            words.groupBy("w")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") <= max_word_df)
            .select("w")
        )
        jl = jl.join(kept, "w")
        jr = jr.join(kept, "w")
    shared = (
        jl.join(jr, "w")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    from pyspark.sql import Window

    # filter on the UNROUNDED ratio (the oracle's WHERE shared/na > 0.4);
    # rounding happens only in the output projection
    cov = (
        shared.join(sizes_a, "id_a")
        .where((F.col("shared") / F.col("na")) > 0.4)
        .withColumn("coverage", F.round(F.col("shared") / F.col("na"), 4))
    )
    w = Window.partitionBy("id_a").orderBy(
        F.desc("coverage"), F.asc("id_b")
    )
    return (
        cov.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("id_a", "id_b", "coverage")
        .orderBy("id_a")
    )


def q_similarity_match_join(spark, sf_dir):
    return similarity_match_join(load(spark, sf_dir, "documents"))


def similarity_match_join_1to1(docs, max_word_df: int | None = None):
    """One-to-one variant of the J7 matcher: each right-side doc is used at
    most once (the reference's GROBID↔GS greedy matcher consumes each
    prediction via seen-sets, table_extractor2_table_json_converter.py:
    168-178). Two stacked row_number passes: best candidate per ``id_a``
    (coverage desc, id_b asc), then best surviving claim per ``id_b``
    (coverage desc, id_a asc) — the standard distributed reduction of greedy
    bipartite matching (each pass is one shuffle on a short key; no
    driver-side iteration)."""
    from pyspark.sql import Window

    best = similarity_match_join(docs, max_word_df=max_word_df)
    w_b = Window.partitionBy("id_b").orderBy(
        F.desc("coverage"), F.asc("id_a")
    )
    return (
        best.withColumn("rk", F.row_number().over(w_b))
        .where(F.col("rk") == 1)
        .select("id_a", "id_b", "coverage")
        .orderBy("id_a")
    )


def q_similarity_match_join_1to1(spark, sf_dir):
    return similarity_match_join_1to1(load(spark, sf_dir, "documents"))


SQL_SIMILARITY_MATCH_JOIN = """
WITH words AS (
  SELECT doc_id, source, unnest(list_distinct(string_split_regex(trim(text),
         '\\s+'))) AS w
  FROM documents
), l AS (SELECT doc_id AS id_a, w FROM words WHERE source = 'src0'),
   r AS (SELECT doc_id AS id_b, w FROM words WHERE source = 'src1'),
   sizes AS (SELECT id_a, count(*) AS na FROM l GROUP BY id_a),
   shared AS (
     SELECT id_a, id_b, count(*) AS shared
     FROM l JOIN r USING (w) GROUP BY id_a, id_b
   ),
   cov AS (
     SELECT id_a, id_b, round(shared / na, 4) AS coverage
     FROM shared JOIN sizes USING (id_a)
     WHERE shared / na > 0.4
   )
SELECT id_a, id_b, coverage FROM (
  SELECT id_a, id_b, coverage,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY coverage DESC, id_b) AS rk
  FROM cov
) WHERE rk = 1 ORDER BY id_a
"""


SQL_SIMILARITY_MATCH_JOIN_1TO1 = """
WITH words AS (
  SELECT doc_id, source, unnest(list_distinct(string_split_regex(trim(text),
         '\\s+'))) AS w
  FROM documents
), l AS (SELECT doc_id AS id_a, w FROM words WHERE source = 'src0'),
   r AS (SELECT doc_id AS id_b, w FROM words WHERE source = 'src1'),
   sizes AS (SELECT id_a, count(*) AS na FROM l GROUP BY id_a),
   shared AS (
     SELECT id_a, id_b, count(*) AS shared
     FROM l JOIN r USING (w) GROUP BY id_a, id_b
   ),
   cov AS (
     SELECT id_a, id_b, round(shared / na, 4) AS coverage
     FROM shared JOIN sizes USING (id_a)
     WHERE shared / na > 0.4
   ),
   best_a AS (
     SELECT id_a, id_b, coverage FROM (
       SELECT id_a, id_b, coverage,
              row_number() OVER (PARTITION BY id_a
                                 ORDER BY coverage DESC, id_b) AS rk
       FROM cov
     ) WHERE rk = 1
   )
SELECT id_a, id_b, coverage FROM (
  SELECT id_a, id_b, coverage,
         row_number() OVER (PARTITION BY id_b
                            ORDER BY coverage DESC, id_a) AS rk
  FROM best_a
) WHERE rk = 1 ORDER BY id_a
"""


# --------------------------------------------------------------------------
# domain-mixture resampling (weighted source mixing for training corpora)
# --------------------------------------------------------------------------

def domain_mixture_sample(
    docs: "DataFrame", weights: dict[str, float], key: str = "source"
) -> "DataFrame":
    """Resample a corpus to a target domain mixture (the Pile/Dolma-style
    source-weighting step): given per-source weights, keep the LARGEST
    subset realizing the target ratios without oversampling any source —
    N = floor(min_i(count_i / w_i)) mixture units, quota_i = floor(w_i·N).
    Weights need not be normalized (the math is scale-invariant); sources
    absent from ``weights`` are dropped. A WEIGHTED source absent from the
    corpus makes the mixture infeasible at any size — the result is empty
    (count 0 → N = 0), not a silently ratio-violating subset.

    Fully declarative — no driver round trip: per-source counts and quotas
    are a tiny aggregate joined back via broadcast, and the per-source
    ranking is the same content-independent md5 hash-rank as
    ``deterministic_sample`` (same rows selected on any cluster, any
    partitioning). The quota join runs BEFORE the rank window, so only
    rows from weighted sources enter the one shuffle — a corpus that is
    mostly unweighted sources never pays for ranking them; the quota side
    stays broadcast no matter the corpus size.
    """
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], f"{key} string, w double"
    )
    counts = docs.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    # left join FROM the weights: a weighted-but-absent source contributes
    # cnt=0 and pins n_units (and therefore every quota) to zero
    # (left-outer can only broadcast its RIGHT side — counts is the tiny
    # per-source aggregate, so it is the hinted build side)
    per_source = wdf.join(F.broadcast(counts), key, "left").select(
        key, "w", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    n_units = per_source.agg(
        F.floor(F.min(F.col("cnt") / F.col("w"))).alias("n_units")
    )
    quotas = per_source.crossJoin(F.broadcast(n_units)).select(
        key, F.floor(F.col("w") * F.col("n_units")).alias("quota")
    )
    rk_w = Window.partitionBy(key).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(quotas), key)
        .withColumn("rk", F.row_number().over(rk_w))
        .where(F.col("rk") <= F.col("quota"))
        .select(key, "doc_id", "rk")
    )


# the one shared weight definition for the gate query — the oracle SQL
# enumerates the SAME literals (VALUES clause) instead of reconstructing
# weights from sources present in the data, so both engines agree that a
# weighted-but-absent source makes the mixture infeasible (empty result)
MIXTURE_WEIGHTS = {f"src{i}": float(i % 4 + 1) for i in range(20)}


def q_domain_mixture_sample(spark, sf_dir):
    # target mixture: weight (i % 4) + 1 for srcN — non-uniform on purpose
    picked = domain_mixture_sample(
        load(spark, sf_dir, "documents"), MIXTURE_WEIGHTS
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


_MIXTURE_VALUES = ", ".join(
    f"('{s}', {w})" for s, w in MIXTURE_WEIGHTS.items()
)

SQL_DOMAIN_MIXTURE_SAMPLE = f"""
WITH wts(source, w) AS (
  VALUES {_MIXTURE_VALUES}
), counts AS (
  SELECT source, count(*) AS cnt FROM documents GROUP BY source
), per_source AS (
  SELECT w.source, w.w, coalesce(c.cnt, 0) AS cnt
  FROM wts w LEFT JOIN counts c USING (source)
), n_units AS (
  SELECT floor(min(cnt / w)) AS n FROM per_source
), quotas AS (
  SELECT source, floor(w * n) AS quota
  FROM per_source CROSS JOIN n_units
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT r.source, CAST(count(*) AS BIGINT) AS n_kept,
       min(r.doc_id) AS first_doc
FROM ranked r JOIN quotas q ON r.source = q.source AND r.rk <= q.quota
GROUP BY r.source ORDER BY r.source
"""


# --------------------------------------------------------------------------
# as-of join (nearest preceding match per key) — J-family custom operator
# --------------------------------------------------------------------------

def asof_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> "DataFrame":
    """For each left row, attach the right row with the greatest ``ts`` not
    exceeding the left row's ``ts`` within the same ``key`` — the classic
    as-of join (event attribution, point-in-time lookups, slowly-changing
    dims), which Spark lacks as a built-in.

    Implementation is the union-and-forward-fill shape, NOT a range join:
    tag both sides, union, and take ``last(right_payload, ignorenulls=True)``
    over a ROWS window ordered by (ts, side, tiebreak) with right rows
    sorting before left rows at equal ``ts`` (as-of is inclusive). This
    costs ONE shuffle on ``key`` — a range join would explode to
    O(|L_k|·|R_k|) candidate pairs per key before picking the max, which at
    web scale is the difference between a window pass and a cross-product.
    All expressions are built-ins inside whole-stage codegen.

    Determinism: if the right side can carry several rows at the same
    (key, ts), pass ``tiebreak`` (last-wins ascending, any orderable type)
    or pre-dedupe; otherwise which of the tied rows wins is plan-dependent.

    Nulls: right rows with a NULL ``ts`` never match (the ANSI/DuckDB
    ASOF contract — ``l.ts >= NULL`` is never true); left rows with a
    NULL ``ts`` come back with no-match NULLs.

    ``right_cols`` are the right-side columns to attach; names must not
    collide with left columns (alias on the way in).
    """
    l_cols = [c for c in left.columns]
    r_payload = [c for c in right_cols if c != ts]
    r_schema = dict(right.dtypes)
    l_schema = dict(left.dtypes)
    # a NULL-ts right row would sort NULLS FIRST (i.e. "before all time")
    # and forward-fill into left rows that have no true preceding match
    right = right.where(F.col(ts).isNotNull())
    # keep the tiebreak's own (orderable) type: casting to long would turn
    # e.g. a string tiebreak into all-NULL and silently lose determinism
    tb_type = r_schema[tiebreak] if tiebreak is not None else "long"
    tb = (
        F.col(tiebreak)
        if tiebreak is not None
        else F.lit(None).cast(tb_type)
    )
    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(r_schema[c]).alias(c) for c in r_payload],
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        *[
            F.lit(None).cast(l_schema[c]).alias(c)
            for c in l_cols
        ],
        *[F.col(c) for c in r_payload],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward-fill ONE struct per right row, not each payload column
    # independently: per-column last(ignorenulls) would skip a genuinely
    # NULL field of the matched right row and fill it from an OLDER row,
    # mixing fields across right rows (diverges from ANSI/DuckDB ASOF,
    # which returns the matched row intact, nulls included)
    matched = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__ts").alias("__rts"),
            *[F.col(c) for c in r_payload],
        ),
    )
    filled = lhs.unionByName(rhs).select(
        "*",
        F.last(matched, ignorenulls=True).over(w).alias("__f"),
    )
    return filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in l_cols],
        F.col("__f.__rts").alias(f"{ts}_right"),
        *[F.col(f"__f.{c}").alias(c) for c in r_payload],
    )


def q_asof_view_attribution(spark, sf_dir):
    """Attribute each click to the most recent preceding view by the same
    user. Views are pre-deduped to one row per (user, ts) keeping the max
    event_id (both engines), so the as-of pick is fully deterministic; the
    gap is exact integer microseconds (timestamps are µs-granular in both
    engines — a seconds-granularity diff would diverge on boundary-counting
    vs floor semantics)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    joined = asof_join(
        clicks,
        views,
        key="user_id",
        ts="ts",
        right_cols=["view_id", "view_value"],
        tiebreak="view_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.expr("timestampdiff(MICROSECOND, ts_right, ts)").alias("gap_us"),
        "view_id",
        "view_value",
    ).orderBy("click_id")


SQL_ASOF_VIEW_ATTRIBUTION = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts FROM events
  WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS view_id,
         max_by(value, event_id) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT c.click_id, c.user_id,
       date_diff('microsecond', v.ts, c.ts) AS gap_us,
       v.view_id, v.view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.click_id
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "asof_view_attribution": q_asof_view_attribution,
    "domain_mixture_sample": q_domain_mixture_sample,
    "sketch_distinct_users": q_sketch_distinct_users,
    "sketch_value_percentiles": q_sketch_value_percentiles,
    "deterministic_sample": q_deterministic_sample,
    "stratified_sample": q_stratified_sample,
    "similarity_match_join": q_similarity_match_join,
    "similarity_match_join_1to1": q_similarity_match_join_1to1,
    "supplier_balance_by_nation": q_supplier_balance_by_nation,
    "revenue_by_region": q_revenue_by_region,
    "monthly_order_trend": q_monthly_order_trend,
    "event_value_quantiles": q_event_value_quantiles,
    "top_revenue_nations": q_top_revenue_nations,
    "size_bucket_interval_join": q_size_bucket_interval_join,
    "event_sessions": q_event_sessions,
    "prev_event_transitions": q_prev_event_transitions,
    "forward_fill_signup": q_forward_fill_signup,
    "adjacent_line_pairs": q_adjacent_line_pairs,
    "seq_ids_global": q_seq_ids_global,
    "median_stats_by_lang": q_median_stats_by_lang,
    "orders_without_returns": q_orders_without_returns,
    "rank_topk_parts": q_rank_topk_parts,
    "rollup_order_counts": q_rollup_order_counts,
    "interval_union_islands": q_interval_union_islands,
    "json_props_extract": q_json_props_extract,
}

ORACLE = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "asof_view_attribution": SQL_ASOF_VIEW_ATTRIBUTION,
    "domain_mixture_sample": SQL_DOMAIN_MIXTURE_SAMPLE,
    "deterministic_sample": SQL_DETERMINISTIC_SAMPLE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "similarity_match_join": SQL_SIMILARITY_MATCH_JOIN,
    "similarity_match_join_1to1": SQL_SIMILARITY_MATCH_JOIN_1TO1,
    "supplier_balance_by_nation": SQL_SUPPLIER_BALANCE_BY_NATION,
    "revenue_by_region": SQL_REVENUE_BY_REGION,
    "monthly_order_trend": SQL_MONTHLY_ORDER_TREND,
    "event_value_quantiles": SQL_EVENT_VALUE_QUANTILES,
    "top_revenue_nations": SQL_TOP_REVENUE_NATIONS,
    "size_bucket_interval_join": SQL_SIZE_BUCKET_INTERVAL_JOIN,
    "event_sessions": SQL_EVENT_SESSIONS,
    "prev_event_transitions": SQL_PREV_EVENT_TRANSITIONS,
    "forward_fill_signup": SQL_FORWARD_FILL_SIGNUP,
    "adjacent_line_pairs": SQL_ADJACENT_LINE_PAIRS,
    "seq_ids_global": SQL_SEQ_IDS_GLOBAL,
    "median_stats_by_lang": SQL_MEDIAN_STATS_BY_LANG,
    "orders_without_returns": SQL_ORDERS_WITHOUT_RETURNS,
    "rank_topk_parts": SQL_RANK_TOPK_PARTS,
    "rollup_order_counts": SQL_ROLLUP_ORDER_COUNTS,
    "interval_union_islands": SQL_INTERVAL_UNION_ISLANDS,
    "json_props_extract": SQL_JSON_PROPS_EXTRACT,
}
