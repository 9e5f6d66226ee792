"""Extended TPC-H-shaped surface (SURVEY.md §2.B relational rows, widened).

The driver testdata is TPC-H-*ish*: no ``partsupp``, and several classic
columns (commit/receipt dates, phone, container, mfgr) are trimmed. Each
query below keeps the *operator shape* of its TPC-H namesake — correlated
EXISTS, scalar subquery in HAVING, decorrelated per-group average,
OR-of-ANDs pushdown, left-join distribution, CASE aggregation — adapted to
the available columns. The shape, not the constant, is what exercises the
engine; docstrings note the adaptation.

Parity rules follow operators/relational.py: identical aliases both sides,
rounded float aggregates, stringified timestamps, BIGINT casts for DuckDB
integer sums, total-order sorts under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _fmt_ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Q4 — order priority checking: correlated EXISTS → left-semi join
# ---------------------------------------------------------------------------

def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → semi-join). Classic uses
    l_commitdate < l_receiptdate (absent); adapted predicate:
    a lineitem shipped after the order date.

    Scale: the semi-join shuffles both sides on orderkey once; the
    non-equi part (l_shipdate > o_orderdate) evaluates inside the join —
    no extra pass. Quarter filter prunes orders at the scan.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with the nation dim joined twice
    (supplier side and customer side), symmetric pair filter, group by
    (nation, nation, year).

    Scale: nation/supplier/customer are dims → broadcast; the only big
    shuffle is lineitem⋈orders on orderkey. Year derives from l_shipdate
    post-join (no extra scan).
    """
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") <= _ts("1997-12-31"))
    )
    pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        pair.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q07_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT)                  AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: share-of-total via conditional aggregation over a
    7-way join. Adapted: p_type = 'PROMO' (flat type column), customers in
    region EUROPE, measured supplier nation NATION_5.

    Scale: all dims broadcast; single big shuffle lineitem⋈orders; the
    share is two partial sums in one aggregate — no second pass.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") <= _ts("1997-12-31"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.n_nationkey)
        .join(F.broadcast(reg), cn.n_regionkey == reg.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), sup.s_nationkey == sn.s_nk)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol), 4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q08_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation × year
# ---------------------------------------------------------------------------

def q09_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dim, supplier-nation rollup by
    order year. Classic profit subtracts ps_supplycost (partsupp absent);
    adapted measure = discounted revenue.

    Scale: part filter broadcast; lineitem⋈orders is the shuffle.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q09_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


# ---------------------------------------------------------------------------
# Q11 — important stock: HAVING against a scalar subquery
# ---------------------------------------------------------------------------

def q11_acctbal_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group HAVING > scalar-subquery fraction of global).
    Adapted from ps_supplycost*ps_availqty (partsupp absent) to supplier
    account balances per nation vs 5% of the global total.

    Scale: the scalar global total is a 1-row DataFrame cross-joined
    (broadcast) into the grouped result — one extra stage, no driver
    round-trip, works identically at any size.
    """
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("_raw_total"))
    )
    global_total = sup.agg((F.sum("s_acctbal") * F.lit(0.05)).alias("_threshold"))
    return (
        per_nation.crossJoin(F.broadcast(global_total))
        .filter(F.col("_raw_total") > F.col("_threshold"))
        .select("n_name", F.round(F.col("_raw_total"), 2).alias("total_acctbal"))
        .orderBy(F.desc("total_acctbal"), "n_name")
    )


Q11_SQL = """
SELECT n_name, round(sum(s_acctbal), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.05 FROM supplier)
ORDER BY total_acctbal DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q12 — CASE aggregation (shipping-mode proxy)
# ---------------------------------------------------------------------------

def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional counts via CASE inside one aggregate).
    l_shipmode is absent → grouped by l_returnflag; the high/low split on
    o_orderpriority is verbatim Q12.
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double group)
# ---------------------------------------------------------------------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join (customers with zero orders kept),
    count per customer, then a histogram of those counts.

    Scale: first groupBy shuffles on custkey (same key as the join — AQE
    reuses the exchange); second groupBy is over ~#distinct-counts rows.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) c_orders
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (single-row conditional ratio)
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: 100 * conditional-sum / sum in one aggregate over
    lineitem⋈part for one month. p_type = 'PROMO' exactly (flat type)."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-06-01")) & (F.col("l_shipdate") < _ts("1996-07-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev), 4,
            ).alias("promo_revenue")
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar max join-back)
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue-per-supplier "view", then equality against
    its own scalar max. Revenue rounded to 2 *before* the max compare on
    both sides so a 1e-9 cross-engine difference cannot flip the winner.

    Scale: the revenue aggregate shuffles on suppkey once; the max is a
    1-row broadcast back onto it. No driver collect.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (decorrelated per-group average)
# ---------------------------------------------------------------------------

def q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (0.2 × per-part avg
    quantity) decorrelated into a groupBy + equi-join — the rewrite
    Catalyst itself applies to the SQL form.

    Scale: per-part averages shuffle lineitem on partkey once and the
    result is dim-sized → broadcast back. p_container absent → brand-only
    part filter.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    li_brand = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice")
    per_part_avg = (
        li_brand.groupBy(F.col("l_partkey").alias("_pk"))
        .agg(F.avg("l_quantity").alias("_avg_qty"))
    )
    return (
        li_brand.join(per_part_avg, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (IN over a grouped HAVING)
# ---------------------------------------------------------------------------

def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orderkeys whose summed quantity clears a threshold
    (HAVING), joined back to orders + customer. Threshold 150 (vs classic
    300) because the testdata has ~4 lineitems/order.

    Scale: the HAVING aggregate shuffles lineitem on orderkey; its
    survivors are rare → broadcast into the join-back (left-semi shape).
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("_ok"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == F.col("_ok"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            _fmt_ts("o_orderdate").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       round(o_totalprice, 2)                     AS o_totalprice,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (OR-of-ANDs predicate pushdown)
# ---------------------------------------------------------------------------

def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    branches evaluated inside one join. p_container absent → branches use
    (p_brand, p_size, l_quantity) only.

    Scale: Catalyst extracts the common l_partkey equi-key so this stays a
    hash join (not a nested-loop); per-branch part predicates push to the
    part scan via the OR-merge of (brand,size) bounds.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    b1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# Q22 — customers with balance above average and no orders
# ---------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar avg subquery + NOT EXISTS (anti-join).
    c_phone absent → grouped by c_mktsegment instead of country code; and
    because this testdata gives every customer at least one order, "no
    orders" is adapted to "no URGENT orders" so the result is non-trivial.

    Scale: avg is a 1-row broadcast; the anti-join shuffles on custkey.
    orders side filtered + projected to the single join column before the
    shuffle.
    """
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (min-per-group + join-back)
# ---------------------------------------------------------------------------

def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min subquery decorrelated into a grouped
    min + equality join-back. partsupp is absent → the "supply cost" is the
    minimum observed unit price (extendedprice/quantity) per
    (part, supplier) in lineitem; per part, keep the cheapest supplier(s).

    Scale: unit costs aggregate on (partkey, suppkey) — one shuffle of
    lineitem; the per-part min is dim-sized and broadcasts back. Rounded
    before the equality compare on both engines (float-tie discipline).
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 1).select("p_partkey", "p_name")
    li = _t(spark, sf_dir, "lineitem")
    # unit_cost feeds both the per-part min and the join-back — without a
    # materialization boundary the lineitem scan + join + aggregation
    # re-ran per reference (r15: 2 lineitem / 3 part scans → 1 / 2). The
    # aggregate output is (part, supplier)-sized, the cheap side to hold.
    # r16: lazy — computes once inside the consuming action (the
    # broadcast build is the first consumer) instead of a serial job at
    # construction; sharing and plan shape unchanged.
    unit_cost = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("supply_cost"))
    ).localCheckpoint(eager=False)
    # checkpointed inputs carry no stats, so the dim-sized per-part min
    # needs its broadcast made explicit (CLAUDE.md LogicalRDD rule)
    min_cost = F.broadcast(
        unit_cost.groupBy(F.col("l_partkey").alias("_pk"))
        .agg(F.min("supply_cost").alias("_min_cost")))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        unit_cost.join(
            min_cost,
            (unit_cost.l_partkey == F.col("_pk")) & (unit_cost.supply_cost == F.col("_min_cost")),
        )
        .join(sup, unit_cost.l_suppkey == sup.s_suppkey)
        .join(part, unit_cost.l_partkey == part.p_partkey)
        .select(
            F.col("p_name"), F.col("l_partkey").alias("p_partkey"),
            "s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "supply_cost",
        )
        .orderBy("p_partkey", "s_name")
    )


Q02_SQL = """
WITH unit_cost AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS supply_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = 1
  GROUP BY l_partkey, l_suppkey
)
SELECT p_name, l_partkey AS p_partkey, s_name,
       round(s_acctbal, 2) AS s_acctbal, supply_cost
FROM unit_cost
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE supply_cost = (SELECT min(u2.supply_cost) FROM unit_cost u2
                     WHERE u2.l_partkey = unit_cost.l_partkey)
ORDER BY p_partkey, s_name
"""


# ---------------------------------------------------------------------------
# Q16 — supplier count per part attributes (NOT IN + count distinct)
# ---------------------------------------------------------------------------

def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN exclusion subquery (anti-join) + grouped
    count-distinct. partsupp absent → part↔supplier association via
    lineitem; the excluded-supplier predicate (classic: comment LIKE
    '%Complaints%') becomes a deterministic acctbal < 0 blacklist.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1") \
        .select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").dropDuplicates()
    bad_sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_sup, li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers of promoted parts (nested semi-join chain)
# ---------------------------------------------------------------------------

def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a two-level semi-join chain — suppliers who shipped
    a meaningful quantity of PROMO parts in 1996 (inner grouped HAVING
    replaces the partsupp availqty threshold), projected through nation.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    qualified = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("promo_qty"))
        .filter(F.col("promo_qty") > 50)
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sup.join(qualified, sup.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 50)
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who alone returned items (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS (another supplier in the same order) AND
    NOT EXISTS (another supplier who also failed) — receipt/commit dates are
    absent, so "failed" is l_returnflag = 'R'. Semi + anti join against the
    same lineitem relation with inequality on suppkey.

    Scale: all three lineitem roles shuffle on orderkey (one exchange each,
    AQE dedups the scan); the count aggregates on suppkey afterwards.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R") \
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk2"))
    l3 = l1.select(F.col("ok").alias("ok3"), F.col("sk").alias("sk3"))
    sole = (
        l1.join(l2, (l1.ok == l2.ok) & (l1.sk != l2.sk2), "left_semi")
        .join(l3, (l1.ok == l3.ok3) & (l1.sk != l3.sk3), "left_anti")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(sup, sole.sk == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Association-rule mining over order baskets (market-basket analysis)
# ---------------------------------------------------------------------------

def q_assoc_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brand co-occurrence in orders:
    support / directional confidence / lift for every brand pair, exact
    integer ppm via floor division.

    Baskets are orders; items are the DISTINCT part brands in each order
    (25 brands → ≤ C(25,2) = 300 pair groups at every sf, so the output is
    sf-invariant in SHAPE while every count scales with the data).

    Scale: the corpus crosses the wire ONCE — one lineitem scan (broadcast
    part dim) groupBy-collapses to per-order sorted brand ARRAYS
    (bounded: the item alphabet is 25 brands; a high-cardinality item
    domain would cap the set the khop_grouped way), checkpointed because
    three consumers read it. Pairs come from array combinatorics on that
    relation — no self-join, no second corpus shuffle (the ORACLE is the
    naive (o,b)⋈(o,b) self-join, so driver equality proves the rewrite);
    the pair groupBy collapses map-side to ≤ C(25,2)=300 rows per task,
    brand counts to ≤25, the basket total to 1 broadcast row.

    Overflow discipline: lift's numerator n_orders·pair_cnt stays < 2^62
    up to ~2×10^9 orders; the ppm scaling downshifts num and den by a
    common power-of-two picked by an integer CASE on the numerator
    (identical floor semantics both engines — profiling.py's
    ``_ppm_downshift_sql`` rationale), with the denominator floored at 1
    (reachable only past the downshift scale, identically in both).
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
               .groupBy(F.col("l_orderkey").alias("o"))
               .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
               .localCheckpoint(eager=True))
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    brand_cnt = (baskets.select(F.explode("bs").alias("b"))
                 .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")))
    pairs = (baskets.select(F.explode(F.expr(
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS b1, y AS b2))))"
    )).alias("p"))
        .groupBy(F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2"))
        .agg(F.count(F.lit(1)).alias("pair_cnt")))
    c1 = brand_cnt.select(F.col("b").alias("b1"), F.col("cnt").alias("cnt1"))
    c2 = brand_cnt.select(F.col("b").alias("b2"), F.col("cnt").alias("cnt2"))
    num = "(n_orders * pair_cnt)"
    d = (f"(CASE WHEN {num} < {1 << 42} THEN 1 "
         f"WHEN {num} < {1 << 50} THEN 256 "
         f"WHEN {num} < {1 << 58} THEN 65536 ELSE 16777216 END)")
    return (pairs.join(F.broadcast(c1), "b1").join(F.broadcast(c2), "b2")
            .crossJoin(F.broadcast(tot))
            .select(
                "b1", "b2",
                F.col("pair_cnt").cast("long").alias("pair_cnt"),
                F.expr("pair_cnt * 1000000L div n_orders").alias("support_ppm"),
                F.expr("pair_cnt * 1000000L div cnt1").alias("conf12_ppm"),
                F.expr("pair_cnt * 1000000L div cnt2").alias("conf21_ppm"),
                F.expr(f"({num} div {d}) * 1000000 div "
                       f"greatest((cnt1 * cnt2) div {d}, 1L)").alias("lift_ppm"),
            )
            .orderBy(F.desc("pair_cnt"), "b1", "b2"))


ASSOC_SQL = f"""
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
), tot AS (SELECT count(DISTINCT o) AS n_orders FROM ob),
bc AS (SELECT b, count(*) AS cnt FROM ob GROUP BY b),
pc AS (
  SELECT a.b AS b1, x.b AS b2, count(*) AS pair_cnt
  FROM ob a JOIN ob x ON a.o = x.o AND a.b < x.b
  GROUP BY 1, 2
)
SELECT b1, b2, CAST(pair_cnt AS BIGINT) AS pair_cnt,
       CAST(pair_cnt * 1000000 // n_orders AS BIGINT) AS support_ppm,
       CAST(pair_cnt * 1000000 // c1.cnt AS BIGINT) AS conf12_ppm,
       CAST(pair_cnt * 1000000 // c2.cnt AS BIGINT) AS conf21_ppm,
       CAST(((n_orders * pair_cnt) // (CASE WHEN (n_orders * pair_cnt) < {1 << 42} THEN 1
              WHEN (n_orders * pair_cnt) < {1 << 50} THEN 256
              WHEN (n_orders * pair_cnt) < {1 << 58} THEN 65536 ELSE 16777216 END))
            * 1000000 // greatest((c1.cnt * c2.cnt) // (CASE WHEN (n_orders * pair_cnt) < {1 << 42} THEN 1
              WHEN (n_orders * pair_cnt) < {1 << 50} THEN 256
              WHEN (n_orders * pair_cnt) < {1 << 58} THEN 65536 ELSE 16777216 END), 1) AS BIGINT) AS lift_ppm
FROM pc JOIN bc c1 ON pc.b1 = c1.b JOIN bc c2 ON pc.b2 = c2.b
CROSS JOIN tot
ORDER BY pair_cnt DESC, b1, b2
"""


# ---------------------------------------------------------------------------
# Pareto skyline (non-dominated frontier) — window rewrite vs NOT-EXISTS spec
# ---------------------------------------------------------------------------

def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline over parts: minimize retail price, maximize size.
    A part is dominated iff another part is no worse on both axes and
    strictly better on at least one.

    The ORACLE is the O(n²) NOT-EXISTS dominance spec; the Spark side runs
    the O(n log n) rewrite — two running-max windows over price order:

      dominated ⇔ max(size | price' < price)  ≥ size     (strictly cheaper)
                 ∨ max(size | price' ≤ price) > size      (no pricier)

    so driver bit-equality is a machine-checked proof the rewrite matches
    the quadratic definition, ties included (same pattern as
    dedup_prefix_filter vs the naive join).

    Prices are floor-money doubles → exact integer cents via
    round(·×100) (HALF_UP in both engines) so the RANGE frame bound
    ``-1 cent`` means "strictly cheaper", never "one float ulp".

    Scale: the windows are global (skyline needs a total price order), so
    a grid pre-prune runs first: per price-bucket max sizes (map-side
    combined, ≤ |buckets| rows) → running max over the TINY bucket
    relation → broadcast back; any point strictly below the prefix-max of
    strictly-cheaper buckets is dominated by a witness in those buckets
    and is dropped distributed-side. Survivors (≤ |buckets| × |distinct
    sizes| in the worst case, tiny in practice) flow into the global
    window. The naive spec never runs on Spark.
    """
    from pyspark.sql.window import Window as W

    pts = (_t(spark, sf_dir, "part")
           .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
           .select("p_partkey",
                   F.round(F.col("p_retailprice") * 100, 0).cast("long")
                   .alias("price_c"),
                   F.col("p_size").cast("int").alias("size")))
    # grid pre-prune: bucket = price_c div 100 (1-currency-unit cells).
    # Two part scans by design (same shape as drift's bounds pass): the
    # first collapses map-side to ≤|buckets| rows, the second filters
    # against the broadcast prefix — checkpointing the corpus-sized pts
    # relation instead would not survive 100 TB.
    bkt = (pts.groupBy(F.expr("price_c div 100").alias("bk"))
           .agg(F.max("size").alias("bmax")))
    prefix = bkt.select(
        "bk",
        F.max("bmax").over(
            W.orderBy("bk").rowsBetween(W.unboundedPreceding, -1)).alias("pmax"))
    survivors = (pts.withColumn("bk", F.expr("price_c div 100"))
                 .join(F.broadcast(prefix), "bk")
                 .filter(F.col("pmax").isNull() | (F.col("size") >= F.col("pmax")))
                 .select("p_partkey", "price_c", "size"))
    wlt = W.orderBy("price_c").rangeBetween(W.unboundedPreceding, -1)
    wle = W.orderBy("price_c").rangeBetween(W.unboundedPreceding, 0)
    sky = (survivors
           .withColumn("mx_lt", F.max("size").over(wlt))
           .withColumn("mx_le", F.max("size").over(wle))
           .filter((F.col("mx_lt").isNull() | (F.col("mx_lt") < F.col("size")))
                   & (F.col("mx_le") <= F.col("size"))))
    return (sky.select("p_partkey", "price_c", "size")
            .orderBy("price_c", F.desc("size"), "p_partkey"))


SKYLINE_SQL = """
WITH pts AS MATERIALIZED (
  SELECT p_partkey, CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
         CAST(p_size AS INT) AS size
  FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT p_partkey, price_c, size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_c <= p.price_c AND q.size >= p.size
    AND (q.price_c < p.price_c OR q.size > p.size)
)
ORDER BY price_c, size DESC, p_partkey
"""


QUERIES = {
    "q02_min_cost_supplier": q02_min_cost_supplier,
    "q04_priority_exists": q04_priority_exists,
    "q07_volume_shipping": q07_volume_shipping,
    "q16_supplier_count": q16_supplier_count,
    "q20_promo_part_suppliers": q20_promo_part_suppliers,
    "q21_sole_returner": q21_sole_returner,
    "q08_market_share": q08_market_share,
    "q09_profit_by_nation": q09_profit_by_nation,
    "q11_acctbal_share": q11_acctbal_share,
    "q12_priority_case_agg": q12_priority_case_agg,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_avg": q17_small_qty_avg,
    "q18_large_volume": q18_large_volume,
    "q19_or_of_ands": q19_or_of_ands,
    "q22_idle_customers": q22_idle_customers,
    "assoc_basket_rules": q_assoc_basket_rules,
    "skyline_pareto": q_skyline_pareto,
}

ORACLE = {
    "q02_min_cost_supplier": Q02_SQL,
    "q04_priority_exists": Q04_SQL,
    "q16_supplier_count": Q16_SQL,
    "q20_promo_part_suppliers": Q20_SQL,
    "q21_sole_returner": Q21_SQL,
    "q07_volume_shipping": Q07_SQL,
    "q08_market_share": Q08_SQL,
    "q09_profit_by_nation": Q09_SQL,
    "q11_acctbal_share": Q11_SQL,
    "q12_priority_case_agg": Q12_SQL,
    "q13_order_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_avg": Q17_SQL,
    "q18_large_volume": Q18_SQL,
    "q19_or_of_ands": Q19_SQL,
    "q22_idle_customers": Q22_SQL,
    "assoc_basket_rules": ASSOC_SQL,
    "skyline_pareto": SKYLINE_SQL,
}
