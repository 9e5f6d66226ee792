"""Relational operator surface (SURVEY.md §2.B, milestone M1).

Each query exists twice: a DataFrame-API implementation (Spark) and an ANSI
SQL string (the DuckDB oracle the driver runs side-by-side). Parity rules
observed throughout — these are the difference between green and red on the
driver's value-hash compare:

* every computed column is aliased identically on both sides;
* float aggregates are ``round()``-ed on both sides (engine-order float sums
  differ at ~1e-9 relative; rounding absorbs it);
* timestamps/dates are stringified in final projections (Spark returns
  tz-aware values under Arrow, DuckDB naive — same instant, different hash);
* DuckDB integer ``sum()`` returns HUGEINT → explicitly CAST to BIGINT;
* every LIMIT/top-k has a total-order ORDER BY (unique tie-break columns),
  ordering on the *rounded* measure so near-equal floats can't swap ranks;
* DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics.

Scale notes are inline per query: what shuffles, what broadcasts, and why
the plan survives 1000 executors × 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _fmt_ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan + 2-key groupBy.

    Scale: partial aggregation map-side (Catalyst HashAggregate partial →
    final over 2-key groups), so the shuffle carries ~#groups rows per task,
    not the 100 TB scan. Filter and 7-column projection push to parquet.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                              AS sum_qty,
       round(sum(l_extendedprice), 2)                                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                      AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)        AS sum_charge,
       round(avg(l_quantity), 4)                                              AS avg_qty,
       round(avg(l_extendedprice), 4)                                         AS avg_price,
       round(avg(l_discount), 4)                                              AS avg_disc,
       count(*)                                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered 3-way join + group + top-k.

    Scale: customer-filter is small relative to lineitem → Catalyst
    broadcasts it (verified in test_plans); orders⋈lineitem shuffles on
    orderkey. Top-10 via TakeOrderedAndProject — no global sort.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp_ntz"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp_ntz"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            _fmt_ts("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')        AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join, revenue per nation.

    Scale: region/nation/supplier/customer are dims → broadcast; the only
    big-big shuffle is orders⋈lineitem on orderkey. Join order is left to
    Catalyst+AQE (it reorders by runtime stats).
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q05_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; the pushdown showcase.

    Scale: all three predicates and the 2-column projection reach the
    parquet reader (PushedFilters); single scalar out — shuffle is one row
    per task.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q06_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-line revenue per customer, top 20."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Core operator micro-queries: filter/project, join family, set ops, dedup
# ---------------------------------------------------------------------------

def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate — both fully pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") > 0.08)
            & (F.col("l_quantity") >= 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND l_discount > 0.08
  AND l_quantity >= 45
"""


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi inner join fact⋈dim (reference 2.A#6 APPLIES_TO link).

    Scale: customer ≪ orders → broadcast hash join, zero shuffle of the
    fact side.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
    )


Q_JOIN_INNER_SQL = """
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers + per-customer agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


Q_JOIN_LEFT_AGG_SQL = """
SELECT c_custkey, c_name,
       count(o_orderkey)           AS n_orders,
       round(sum(o_totalprice), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi = EXISTS probe (reference 2.A#3 match-or-create probe)."""
    cust = _t(spark, sf_dir, "customer")
    orders_1999 = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1999)
    return cust.join(orders_1999, cust.c_custkey == orders_1999.o_custkey, "left_semi") \
               .select("c_custkey", "c_name")


Q_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1999)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti = NOT EXISTS (reference 2.A#3 'create only if absent',
    2.A#8 delete propagation)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti") \
               .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))


Q_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


ORDER_STATUSES = ["F", "O", "P"]


def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per event type: sample stddev/variance of the
    value, correlation and sample covariance of (value, user_id). Spark and
    DuckDB share the sample formulas exactly (skewness/kurtosis are omitted
    — the engines use different estimator conventions)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.var_samp("value"), 4).alias("var_value"),
            F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias("corr_value_user"),
            F.round(F.covar_samp("value", F.col("user_id").cast("double")), 4).alias("covar_value_user"),
        )
        .orderBy("event_type")
    )


Q_AGG_STATS_SQL = """
SELECT event_type,
       round(stddev_samp(value), 4)                           AS sd_value,
       round(var_samp(value), 4)                              AS var_value,
       round(corr(value, CAST(user_id AS DOUBLE)), 4)         AS corr_value_user,
       round(covar_samp(value, CAST(user_id AS DOUBLE)), 4)   AS covar_value_user
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority, statuses fanned out to columns.
    Explicit value list (the scale rule — an unlisted pivot needs an extra
    distinct pass over the data to discover columns)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ORDER_STATUSES],
    ).orderBy("o_orderpriority")


Q_AGG_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the customer metric columns stacked into
    (metric, value) rows — the wide→long reshape."""
    cust = _t(spark, sf_dir, "customer")
    wide = cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return (
        wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("metric")
    )


Q_AGG_UNPIVOT_SQL = """
SELECT metric, count(*) AS n, round(sum(value), 2) AS total
FROM (
  SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
)
GROUP BY metric ORDER BY metric
"""


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles of customers by balance within each segment, rolled
    up to per-(segment, quartile) stats."""
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


Q_WINDOW_NTILE_SQL = """
SELECT c_mktsegment, quartile, count(*) AS n,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM (SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer)
GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame window: per user, rolling 1-hour sum of event values
    ordered by time — the value-based frame (rows frames are covered by
    window_running_sum). Ordered on epoch seconds so both engines agree on
    the frame arithmetic exactly."""
    ev = _t(spark, sf_dir, "events")
    epoch_s = F.unix_millis(F.col("ts").cast("timestamp")) / 1000
    w = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return (
        ev.select("event_id", "user_id", "value", epoch_s.alias("ts_s"))
        .withColumn("rolling_1h_sum", F.round(F.sum("value").over(w), 2))
        .select("event_id", "user_id", "rolling_1h_sum")
    )


Q_WINDOW_RANGE_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
         AS rolling_1h_sum
FROM events
"""


def q_join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every purchase, the same user's latest view at or
    before it — the time-series join Spark lacks natively (DuckDB spells it
    ASOF JOIN; the oracle uses exactly that).

    Spark composition: union both sides with a marker, one window pass per
    user ordered by (ts, marker) carrying the last seen view timestamp
    forward, then keep the purchases. One shuffle on user_id total —
    strictly better than the per-pair range join at 100 TB because state
    is a single last_value, not a candidate set.
    """
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", ts.alias("ts"), F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", ts.alias("ts"), F.lit(1).alias("is_purchase"), "event_id")
    # views sort before purchases at equal ts → "at or before" semantics
    w = W.partitionBy("user_id").orderBy("ts", "is_purchase") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = views.unionByName(purchases).withColumn(
        "last_view_ts",
        F.last(F.when(F.col("is_purchase") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        tagged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
        )
    )


Q_JOIN_ASOF_SQL = """
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90 / p99) per event type — the
    data-profiling aggregate. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` both use linear interpolation → value-exact oracle.

    Scale: exact percentile shuffles values per group; at 100 TB switch to
    ``approx_percentile`` (t-digest sketch, mergeable map-side) — same call
    shape, bounded memory.
    """
    ev = _t(spark, sf_dir, "events")
    qarr = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qarr.alias("_q"),
        )
        # scalar columns, not an array — array cells stringify differently
        # across engines in hash-compare harnesses
        .select(
            "event_type", "n",
            F.round(F.get("_q", 0), 4).alias("p50"),
            F.round(F.get("_q", 1), 4).alias("p90"),
            F.round(F.get("_q", 2), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


Q_AGG_QUANTILES_SQL = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


N_SALT = 8


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salting for a skewed join key — the manual counterpart to
    AQE's skew-join splitting, shown end-to-end because at 100 TB you often
    salt *before* the shuffle rather than letting AQE repair it after.

    The skew is manufactured: every 'view' event collapses onto hot key 0
    (views dominate the corpus). Fact side gets salt = event_id % 8; the
    dim side explodes each key into all 8 salts; the join key becomes
    (key, salt) so the hot key spreads over 8 partitions instead of one.
    The oracle states the same join unsalted — salting must be
    result-invariant.
    """
    ev = _t(spark, sf_dir, "events")
    skew_key = F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.col("user_id"))
    fact = ev.select(
        skew_key.cast("long").alias("k"),
        "value",
        F.pmod(F.col("event_id"), F.lit(N_SALT)).cast("int").alias("salt"),
    )
    dim = (
        ev.select(F.col("user_id").cast("long").alias("k")).distinct()
        .withColumn("grp", F.pmod(F.col("k"), F.lit(7)).cast("int"))
        .withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALT)])))
    )
    return (
        fact.join(dim, ["k", "salt"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("grp")
    )


Q_JOIN_SALTED_SQL = """
WITH fact AS (
  SELECT CASE WHEN event_type = 'view' THEN 0 ELSE user_id END AS k, value
  FROM events
), dim AS (
  SELECT DISTINCT user_id AS k, user_id % 7 AS grp FROM events
)
SELECT CAST(grp AS INTEGER) AS grp, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM fact JOIN dim USING (k)
GROUP BY grp ORDER BY grp
"""


def q_join_range_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join: events within 10 min after each signup, same user.

    Scale: a naive (user_id) equi-join + range filter degenerates to a
    per-user cross product. Instead both sides get a 10-minute time bucket;
    the left side explodes to its bucket and the successor bucket, making
    the join a pure equi-join on (user_id, bucket) whose per-key cardinality
    is bounded by event rate — the standard band-join decomposition. The
    oracle states the same semantics as a plain range join.
    """
    ev = _t(spark, sf_dir, "events")
    bucket_ms = 600_000
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    signups = (
        base.filter(F.col("event_type") == "signup")
        .withColumn("bkt", F.explode(F.array(
            F.floor(F.col("ts_ms") / bucket_ms),
            F.floor(F.col("ts_ms") / bucket_ms) + 1,
        )))
        .select(F.col("event_id").alias("signup_event_id"),
                F.col("user_id").alias("s_user_id"),
                F.col("ts_ms").alias("s_ts_ms"), "bkt")
    )
    follows = base.withColumn("bkt", F.floor(F.col("ts_ms") / bucket_ms))
    return (
        signups.join(
            follows,
            (signups.s_user_id == follows.user_id)
            & (signups.bkt == follows.bkt)
            & (follows.ts_ms > signups.s_ts_ms)
            & (follows.ts_ms <= signups.s_ts_ms + bucket_ms),
        )
        .groupBy("signup_event_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


Q_JOIN_RANGE_SQL = """
SELECT s.event_id AS signup_event_id, count(*) AS n_follow
FROM events s JOIN events f
  ON f.user_id = s.user_id
 AND f.ts >  s.ts
 AND f.ts <= s.ts + INTERVAL 10 MINUTE
WHERE s.event_type = 'signup'
GROUP BY s.event_id
"""


def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT across two ingest epochs (reference batch labels)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1998).select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct()


Q_SETOP_UNION_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
UNION
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1998).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


Q_SETOP_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
"""


def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1998).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


Q_SETOP_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
"""


def q_setop_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set operations in one result, each row tagged by operator.

    One registry key covering SURVEY §2.B's union/intersect/except row
    (reference 2.A#12 epoch reconciliation): customers active in 1997 vs
    1998 classified via UNION DISTINCT / INTERSECT / EXCEPT. The three
    branches share one scan shape, so Catalyst reuses the pushed-down
    orders scan; each setop is a hash shuffle on custkey — at scale they
    run as three independent stages over the same exchange.
    """
    # Build each epoch side ONCE: composing the three standalone queries
    # re-derived both filtered sides per setop — six orders scans in one
    # plan, none reused at execution (r05 scan-multiplicity audit). The
    # materialized sides are distinct custkey sets (bounded by the
    # customer dimension), read three times cheaply.
    orders = _t(spark, sf_dir, "orders")
    def side(year: int):
        return (orders.filter(F.year("o_orderdate") == year)
                .select(F.col("o_custkey").alias("custkey")).distinct()
                .localCheckpoint(eager=True))
    a, b = side(1997), side(1998)
    u = a.union(b).distinct().select(F.lit("union").alias("op"), "custkey")
    i = a.intersect(b).select(F.lit("intersect").alias("op"), "custkey")
    e = a.subtract(b).select(F.lit("except").alias("op"), "custkey")
    return u.unionByName(i).unionByName(e)


Q_SETOP_OPS_SQL = f"""
SELECT 'union' AS op, custkey FROM ({Q_SETOP_UNION_SQL})
UNION ALL
SELECT 'intersect' AS op, custkey FROM ({Q_SETOP_INTERSECT_SQL})
UNION ALL
SELECT 'except' AS op, custkey FROM ({Q_SETOP_EXCEPT_SQL})
"""


# ---------------------------------------------------------------------------
# Aggregation variants: count-distinct, rollup, cube
# ---------------------------------------------------------------------------

def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


Q_AGG_COUNT_DISTINCT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey)   AS n_customers,
       count(*)                    AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders GROUP BY o_orderpriority
"""


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct next to the exact count (SURVEY §2.B
    "approx variant"). HLL sketches are not bit-compatible across engines,
    so the raw approx value can't be hash-compared — but the operator's
    CONTRACT can: each engine's own sketch must land within 5% of exact.
    The output carries the exact count plus that boolean, both
    deterministic per engine, making the query oracle-checkable while
    still exercising the sketch (at scale approx is the only affordable
    form — no exact-distinct shuffle; the sketch merges map-side).
    rel_error < 5% per group is additionally asserted with the raw values
    in tests/test_functions.py.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        )
        .select(
            "o_orderpriority", "exact_customers",
            (F.abs(F.col("approx_customers") - F.col("exact_customers"))
             / F.col("exact_customers") <= 0.05).alias("approx_ok"),
        )
    )


Q_AGG_APPROX_DISTINCT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_customers,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
         * 1.0 / count(DISTINCT o_custkey) <= 0.05 AS approx_ok
FROM orders GROUP BY o_orderpriority
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (catalog-stats shape)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


Q_AGG_ROLLUP_SQL = """
SELECT r_name, n_name,
       round(sum(c_acctbal), 2) AS total_bal,
       count(*)                 AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


Q_AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    (status, priority), (status), and grand total, skipping the
    (priority)-only set a CUBE would add."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


Q_AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window (SURVEY §2.B windows).

    Scale: one shuffle on the partition key; rank filter applied before any
    further join, so downstream sees ≤3 rows/customer.
    """
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over the event stream per user."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .withColumn("next_type", F.lead("event_type").over(w))
        .select(
            "event_id", "user_id",
            F.round(F.col("value") - F.col("prev_value"), 2).alias("value_delta"),
            "next_type",
        )
    )


Q_WINDOW_LAG_SQL = """
SELECT event_id, user_id,
       round(value - lag(value)  OVER w, 2) AS value_delta,
       lead(event_type) OVER w              AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running total per customer over order history."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


Q_WINDOW_RUNNING_SQL = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders
"""


def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), not a full sort — the survives-100TB version of ORDER BY
    LIMIT."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


Q_SORT_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Scalar-function surfaces: string / date / array / JSON (reference 2.A#14-25)
# ---------------------------------------------------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery mirroring the reference's sanitizers
    (new-converter.js:44-55 sanitizeRelationship/formatNodeLabel) applied to
    part attributes. DuckDB regexp_replace needs 'g' for replace-all parity.
    """
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.regexp_replace("p_type", "[^a-zA-Z0-9]", "_")).alias("type_sanitized"),
        F.regexp_extract("p_name", "^(\\w+)", 1).alias("name_first_word"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim(F.lower("p_brand")).alias("brand_lower"),
    )


Q_STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(regexp_replace(p_type, '[^a-zA-Z0-9]', '_', 'g')) AS type_sanitized,
       regexp_extract(p_name, '^(\\w+)', 1)                    AS name_first_word,
       length(p_name)                                          AS name_len,
       concat_ws('::', p_brand, p_type)                        AS brand_type,
       substring(p_name, 1, 5)                                 AS name_prefix,
       trim(lower(p_brand))                                    AS brand_lower
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parsing/trunc (reference stores dates as strings and never
    computes on them — here promoted to real date logic, SURVEY §1.2)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


Q_DATE_FUNCS_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       quarter(o_orderdate)           AS order_quarter,
       count(*)                       AS n_orders,
       round(sum(o_totalprice), 2)    AS revenue
FROM orders GROUP BY 1, 2
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → re-aggregate word counts over documents (the
    fan-out pattern of reference 2.A#16/#17). Top-50 with total order."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(50)
    )


Q_ARRAY_FUNCS_SQL = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 50
"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date + array scalar-function battery as ONE registry key
    (SURVEY §2.B rows 26-28; reference sanitizers new-converter.js:44-55 and
    date/array fan-out 2.A#14-17). Three branches with a common
    (family, key, str_val, num_val) schema unioned together:

    - string: sanitize/regexp/concat over part attributes
    - date:   format/quarter over orders
    - array:  split/slice/array_join/size over documents

    Each branch is a pure projection — no shuffle, scan-pruned to the
    referenced columns; the union is a no-shuffle concatenation.
    """
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    docs = _t(spark, sf_dir, "documents")
    s = part.select(
        F.lit("string").alias("family"),
        F.col("p_partkey").cast("long").alias("key"),
        F.concat_ws(
            "::",
            F.upper(F.regexp_replace("p_type", "[^a-zA-Z0-9]", "_")),
            F.regexp_extract("p_name", "^(\\w+)", 1),
            F.trim(F.lower("p_brand")),
            F.substring("p_name", 1, 5),
        ).alias("str_val"),
        F.length("p_name").cast("long").alias("num_val"),
    )
    d = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("date").alias("family"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.concat_ws(
            "::",
            F.date_format("o_orderdate", "yyyy-MM"),
            F.dayofweek("o_orderdate").cast("string"),
        ).alias("str_val"),
        F.quarter("o_orderdate").cast("long").alias("num_val"),
    )
    a = docs.select(
        F.lit("array").alias("family"),
        F.col("doc_id").cast("long").alias("key"),
        F.array_join(
            F.slice(F.split(F.lower("text"), " "), 1, 3), "-"
        ).alias("str_val"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("num_val"),
    )
    return s.unionByName(d).unionByName(a)


Q_SCALAR_FUNCS_SQL = """
SELECT 'string' AS family,
       CAST(p_partkey AS BIGINT) AS key,
       concat_ws('::',
                 upper(regexp_replace(p_type, '[^a-zA-Z0-9]', '_', 'g')),
                 regexp_extract(p_name, '^(\\w+)', 1),
                 trim(lower(p_brand)),
                 substring(p_name, 1, 5))      AS str_val,
       CAST(length(p_name) AS BIGINT)          AS num_val
FROM part
UNION ALL
SELECT 'date',
       CAST(o_orderkey AS BIGINT),
       concat_ws('::', strftime(o_orderdate, '%Y-%m'),
                 CAST(dayofweek(o_orderdate) + 1 AS VARCHAR)),
       CAST(quarter(o_orderdate) AS BIGINT)
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT 'array',
       CAST(doc_id AS BIGINT),
       array_to_string(list_slice(string_split(lower(text), ' '), 1, 3), '-'),
       CAST(len(string_split(text, ' ')) AS BIGINT)
FROM documents
"""


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props (SURVEY §2.B map/JSON fn)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


Q_JSON_FUNCS_SQL = """
SELECT event_type,
       count(*)                                                   AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT))        AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Sessionization (batch) + catalog stats
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window functions —
    the batch twin of streaming session_window (oracle-checkable)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    flagged = ev.select(
        "user_id", "event_id", "ts",
        F.when(
            ms - F.lag(ms).over(w) > 30 * 60 * 1000, 1
        ).otherwise(F.when(F.lag(ms).over(w).isNull(), 1).otherwise(0)).alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    per_session = sess.groupBy("user_id", "session_seq").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.max("n_events").alias("max_session_events"),
    )


Q_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
              WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000 THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), per_session AS (
  SELECT user_id, session_seq, count(*) AS n_events
  FROM sess GROUP BY user_id, session_seq
)
SELECT user_id, count(*) AS n_sessions,
       round(avg(n_events), 4) AS avg_events_per_session,
       max(n_events)           AS max_session_events
FROM per_session GROUP BY user_id
"""


def q_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count catalog over every table — the information_schema-style
    introspection surface the reference hardcodes (first-graph.py:65-136)."""
    from ..io import TABLE_NAMES
    parts = []
    for name in TABLE_NAMES:
        parts.append(
            _t(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(name).alias("tbl"), "n_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


Q_CATALOG_STATS_SQL = """
SELECT 'region' AS tbl, count(*) AS n_rows FROM region
UNION ALL SELECT 'nation', count(*) FROM nation
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'supplier', count(*) FROM supplier
UNION ALL SELECT 'part', count(*) FROM part
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'documents', count(*) FROM documents
UNION ALL SELECT 'embeddings', count(*) FROM embeddings
"""


OVERLAP_BUCKET_MS = 3_600_000   # hour grid; sessions here are minutes-long
OVERLAP_GAP_MS = 30 * 60 * 1000


def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: build per-user session intervals (same
    30-min-gap construction as q_sessionize), then count cross-user pairs
    of CONCURRENT sessions and their total overlap — the interval×interval
    theta join (a.start<=b.end AND b.start<=a.end) that point-in-range
    q_join_range_follow doesn't cover.

    Scale: the naive form is all-pairs over every session. Instead each
    interval explodes onto the hour buckets it spans (replication factor =
    interval length / bucket width, ~1 here), making the pair search a pure
    equi-join on bucket; pairs spanning several shared buckets dedup by
    (user, seq) keys BEFORE the rollup, so the distinct runs on id tuples,
    never on payloads. Hot buckets (concurrency spikes) are the skew axis —
    at 100 TB you'd salt the bucket key exactly like join_salted_skew.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    flagged = ev.select(
        "user_id", "event_id", "ts", ms.alias("ts_ms"),
        F.when(ms - F.lag(ms).over(w) > OVERLAP_GAP_MS, 1)
         .otherwise(F.when(F.lag(ms).over(w).isNull(), 1).otherwise(0))
         .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "seq",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    iv = sess.groupBy("user_id", "seq").agg(
        F.min("ts_ms").alias("st"), F.max("ts_ms").alias("en"))
    bucketed = iv.withColumn(
        "bkt",
        F.explode(F.sequence(
            F.floor(F.col("st") / OVERLAP_BUCKET_MS),
            F.floor(F.col("en") / OVERLAP_BUCKET_MS),
        )),
    )
    a = bucketed.select(
        F.col("user_id").alias("ua"), F.col("seq").alias("sa"),
        F.col("st").alias("sta"), F.col("en").alias("ena"), "bkt")
    b = bucketed.select(
        F.col("user_id").alias("ub"), F.col("seq").alias("sb"),
        F.col("st").alias("stb"), F.col("en").alias("enb"), "bkt")
    pairs = (
        a.join(b, "bkt")
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("sta") <= F.col("enb"))
            & (F.col("stb") <= F.col("ena"))
        )
        .select(
            "ua", "sa", "ub", "sb",
            (F.least("ena", "enb") - F.greatest("sta", "stb")).alias("ov_ms"),
        )
        .distinct()
    )
    return (
        pairs.groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum("ov_ms").cast("long").alias("total_overlap_ms"),
        )
        .orderBy("user_a", "user_b")
    )


Q_JOIN_INTERVAL_OVERLAP_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
              WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {OVERLAP_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts_ms,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seq
  FROM flagged
), iv AS (
  SELECT user_id, seq, min(ts_ms) AS st, max(ts_ms) AS en
  FROM sess GROUP BY user_id, seq
), p AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         least(a.en, b.en) - greatest(a.st, b.st) AS ov_ms
  FROM iv a JOIN iv b
    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
)
SELECT user_a, user_b, count(*) AS n_overlaps,
       CAST(sum(ov_ms) AS BIGINT) AS total_overlap_ms
FROM p GROUP BY user_a, user_b ORDER BY user_a, user_b
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q05_local_supplier_volume": q05_local_supplier_volume,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "filter_project": q_filter_project,
    "join_inner": q_join_inner,
    "join_left_agg": q_join_left_agg,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_salted_skew": q_join_salted_skew,
    "join_asof_last_view": q_join_asof_last_view,
    "window_range_frame": q_window_range_frame,
    "agg_pivot": q_agg_pivot,
    "agg_unpivot": q_agg_unpivot,
    "window_ntile": q_window_ntile,
    "agg_quantiles": q_agg_quantiles,
    "agg_stats_moments": q_agg_stats_moments,
    "join_range_follow": q_join_range_follow,
    "setop_ops": q_setop_ops,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_approx_distinct": q_agg_approx_distinct,  # contract-checked HLL
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "window_topk_per_group": q_window_topk_per_group,
    "window_lag_delta": q_window_lag_delta,
    "window_running_sum": q_window_running_sum,
    "sort_topk": q_sort_topk,
    "scalar_funcs": q_scalar_funcs,
    "json_funcs": q_json_funcs,
    "sessionize": q_sessionize,
    "join_interval_overlap": q_join_interval_overlap,
    "catalog_stats": q_catalog_stats,
}

ORACLE = {
    "q01_pricing_summary": Q01_SQL,
    "q03_shipping_priority": Q03_SQL,
    "q05_local_supplier_volume": Q05_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q10_returned_items": Q10_SQL,
    "filter_project": Q_FILTER_PROJECT_SQL,
    "join_inner": Q_JOIN_INNER_SQL,
    "join_left_agg": Q_JOIN_LEFT_AGG_SQL,
    "join_semi": Q_JOIN_SEMI_SQL,
    "join_anti": Q_JOIN_ANTI_SQL,
    "join_salted_skew": Q_JOIN_SALTED_SQL,
    "join_asof_last_view": Q_JOIN_ASOF_SQL,
    "window_range_frame": Q_WINDOW_RANGE_SQL,
    "agg_pivot": Q_AGG_PIVOT_SQL,
    "agg_unpivot": Q_AGG_UNPIVOT_SQL,
    "window_ntile": Q_WINDOW_NTILE_SQL,
    "agg_quantiles": Q_AGG_QUANTILES_SQL,
    "agg_stats_moments": Q_AGG_STATS_SQL,
    "join_range_follow": Q_JOIN_RANGE_SQL,
    "setop_ops": Q_SETOP_OPS_SQL,
    "agg_count_distinct": Q_AGG_COUNT_DISTINCT_SQL,
    "agg_approx_distinct": Q_AGG_APPROX_DISTINCT_SQL,
    "agg_rollup": Q_AGG_ROLLUP_SQL,
    "agg_cube": Q_AGG_CUBE_SQL,
    "agg_grouping_sets": Q_AGG_GROUPING_SETS_SQL,
    "window_topk_per_group": Q_WINDOW_TOPK_SQL,
    "window_lag_delta": Q_WINDOW_LAG_SQL,
    "window_running_sum": Q_WINDOW_RUNNING_SQL,
    "sort_topk": Q_SORT_TOPK_SQL,
    "scalar_funcs": Q_SCALAR_FUNCS_SQL,
    "json_funcs": Q_JSON_FUNCS_SQL,
    "sessionize": Q_SESSIONIZE_SQL,
    "join_interval_overlap": Q_JOIN_INTERVAL_OVERLAP_SQL,
    "catalog_stats": Q_CATALOG_STATS_SQL,
}
