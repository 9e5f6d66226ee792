"""Mutation semantics as oracle-checkable queries (SURVEY.md §2.B Mutation).

The reference's write path is three verbs: MERGE/match-or-create upsert
(`xml2neo.py:32-41`, `new-converter.js:27-30`), cascading predicate delete
(`deleteneo.py:10-12`), and property SET (`new-converter.js:136-140`). The
GraphStore implements them against the nodes/edges tables (tested in
tests/test_graph_xml.py); here the same set-based plans run over the
relational testdata so the DuckDB oracle can value-check them — each query
returns the *post-mutation* state, which is how an immutable-table engine
expresses a write (write-temp-then-swap at the storage layer, io.py).

Scale notes: upsert = left-anti + union (one shuffle on the merge key;
Delta-style MERGE at 100 TB); delete cascade = anti-joins against the
deleted key set (broadcast when the delete predicate is selective);
SET = a pure column rewrite, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE an updates batch into ``customer`` and aggregate the merged
    table. The batch (derived deterministically so the oracle can rebuild
    it): every customer with a negative balance gets the balance negated
    (update), and every BUILDING customer with balance > 9000 is inserted
    again under custkey+10_000_000 (insert).

    Plan shape = exactly GraphStore.merge_nodes: existing rows not hit by
    an update survive via left-anti on the key, then union the batch.
    """
    cust = _t(spark, sf_dir, "customer")
    updates = (
        cust.filter(F.col("c_acctbal") < 0)
        .withColumn("c_acctbal", -F.col("c_acctbal"))
    )
    inserts = (
        cust.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .withColumn("c_custkey", F.col("c_custkey") + F.lit(10_000_000))
    )
    # the batch feeds the anti-join key side AND the union — without
    # materialization each reference re-derives updates+inserts (5
    # customer scans in one plan, r05 audit). A real MERGE source is an
    # incoming batch that exists independently of the target; checkpoint
    # makes the demo's derived batch behave like one (3 scans: target +
    # the two batch derivations).
    batch = updates.unionByName(inserts).localCheckpoint(eager=True)
    merged = (
        cust.join(batch.select("c_custkey"), "c_custkey", "left_anti")
        .unionByName(batch)
    )
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


MERGE_UPSERT_SQL = """
WITH merged AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal
  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000)
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal,
       round(min(c_acctbal), 2) AS min_acctbal
FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def delete_cascade_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETACH-DELETE semantics (deleteneo.py:10-12) on relational data:
    delete orders matching a predicate and cascade to their lineitems,
    then summarize the surviving tables — the same filter + anti-join pair
    GraphStore.delete_where applies to nodes/edges."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pred = (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "5-LOW")
    deleted_keys = orders.filter(pred).select("o_orderkey")
    surviving_orders = orders.filter(~pred)
    surviving_li = li.join(deleted_keys, li.l_orderkey == deleted_keys.o_orderkey, "left_anti")
    n_orders = surviving_orders.agg(F.count(F.lit(1)).alias("n_orders"))
    li_stats = surviving_li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("surviving_revenue"),
    )
    return n_orders.crossJoin(li_stats)


DELETE_CASCADE_SQL = """
SELECT (SELECT count(*) FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')) AS n_orders,
       count(*) AS n_lineitems,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS surviving_revenue
FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                         WHERE o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
"""


def property_set_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property SET (new-converter.js:136-140): conditionally overwrite a
    column — PROMO parts get a 10% price raise — and aggregate the updated
    table. Pure projection rewrite: zero shuffles before the final group."""
    part = _t(spark, sf_dir, "part")
    updated = part.withColumn(
        "p_retailprice",
        F.when(F.col("p_type") == "PROMO", F.round(F.col("p_retailprice") * 1.1, 2))
        .otherwise(F.col("p_retailprice")),
    )
    return (
        updated.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
        .orderBy("p_brand")
    )


PROPERTY_SET_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(sum(CASE WHEN p_type = 'PROMO' THEN round(p_retailprice * 1.1, 2)
                      ELSE p_retailprice END), 2) AS total_price
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: compare ``orders`` (v1) against a
    deterministically mutated v2 (delete every key % 89 = 0, update
    priority+price on surviving keys % 97 = 0, insert key-shifted copies
    of keys % 101 = 0) and emit one row per changed key tagged
    insert/delete/update with old/new values — the change feed a
    downstream incremental consumer reads after a batch of writes.

    Scale: one co-partitioned full-outer join on the key (both sides
    shuffle once on o_orderkey; unchanged keys are filtered AFTER the
    join by Catalyst's generated predicate, so nothing materializes but
    the changed rows). This is the MERGE-diff plan shape a Delta/Iceberg
    CDF implements natively at 100 TB.
    """
    v1 = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    surviving = v1.filter(F.col("o_orderkey") % 89 != 0)
    touched = F.col("o_orderkey") % 97 == 0
    v2 = surviving.select(
        "o_orderkey",
        F.when(touched, F.lit("0-DIFF")).otherwise(F.col("o_orderpriority"))
         .alias("o_orderpriority"),
        F.when(touched, F.col("o_totalprice") + 100.0)
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    ).unionByName(
        v1.filter(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 2_000_000_000).alias("o_orderkey"),
            "o_orderpriority", "o_totalprice",
        )
    )
    a = v1.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("old_priority"),
        F.col("o_totalprice").alias("old_total"),
    )
    b = v2.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("new_priority"),
        F.col("o_totalprice").alias("new_total"),
    )
    d = a.join(b, "o_orderkey", "full_outer")
    change_type = (
        F.when(F.col("old_priority").isNull(), "insert")
        .when(F.col("new_priority").isNull(), "delete")
        .when(
            (F.col("old_priority") != F.col("new_priority"))
            | (F.col("old_total") != F.col("new_total")),
            "update",
        )
    )
    return (
        d.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            "change_type", "o_orderkey", "old_priority", "new_priority",
            F.round("old_total", 2).alias("old_total"),
            F.round("new_total", 2).alias("new_total"),
        )
    )


TABLE_DIFF_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
), v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN '0-DIFF' ELSE o_orderpriority END
           AS o_orderpriority,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS o_totalprice
  FROM v1 WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderkey + 2000000000, o_orderpriority, o_totalprice
  FROM v1 WHERE o_orderkey % 101 = 0
), d AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.o_orderpriority AS old_priority, b.o_orderpriority AS new_priority,
         a.o_totalprice AS old_total, b.o_totalprice AS new_total
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
)
SELECT CASE WHEN old_priority IS NULL THEN 'insert'
            WHEN new_priority IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o_orderkey, old_priority, new_priority,
       round(old_total, 2) AS old_total, round(new_total, 2) AS new_total
FROM d
WHERE old_priority IS NULL OR new_priority IS NULL
   OR old_priority <> new_priority OR old_total <> new_total
"""


# SCD2 version moduli: v2 touches keys % 97, v3 keys % 59 (co-prime so
# some keys change twice, most never)
SCD2_V2_MOD = 97
SCD2_V3_MOD = 59


def scd2_build_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: fold a 3-version history of
    orders (deterministic updates: v2 bumps priority/price on keys % 97,
    v3 on keys % 59) into validity-interval rows — one row per key per
    CHANGED state, with [valid_from_v, valid_to_v) version bounds and an
    is_current flag. The warehouse temporal-versioning operator a MERGE
    stream feeds.

    Spark shape: union the versions (explode-style, single scan of the
    base — versions derive per-row), ONE window partitioned by key ordered
    by version doing both the change-collapse (lag) and the interval close
    (lead). Scale: one keyed shuffle (the window), no joins at all; at
    100 TB the window state per key is the version count (3), constant.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    touched2 = F.col("o_orderkey") % SCD2_V2_MOD == 0
    touched3 = F.col("o_orderkey") % SCD2_V3_MOD == 0
    versions = o.select(
        "o_orderkey",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v"),
        "o_orderpriority", "o_totalprice",
    ).select(
        "o_orderkey", "v",
        F.when((F.col("v") >= 2) & touched2, F.lit("2-UPDATED"))
         .when((F.col("v") >= 3) & touched3, F.lit("3-REPRICED"))
         .otherwise(F.col("o_orderpriority")).alias("prio"),
        F.round(
            F.col("o_totalprice")
            + F.when((F.col("v") >= 2) & touched2, 50.0).otherwise(0.0)
            + F.when((F.col("v") >= 3) & touched3, 25.0).otherwise(0.0),
            2,
        ).alias("price"),
    )
    w = W.partitionBy("o_orderkey").orderBy("v")
    changed = versions.withColumn(
        "chg",
        F.lag("prio").over(w).isNull()
        | (F.col("prio") != F.lag("prio").over(w))
        | (F.col("price") != F.lag("price").over(w)),
    ).filter(F.col("chg"))
    out = changed.withColumn("valid_to_v", F.lead("v").over(w))
    return out.select(
        "o_orderkey",
        "prio",
        "price",
        F.col("v").alias("valid_from_v"),
        "valid_to_v",
        F.col("valid_to_v").isNull().alias("is_current"),
    )


SCD2_BUILD_SQL = f"""
WITH versions AS (
  SELECT o_orderkey, v,
         CASE WHEN v >= 2 AND o_orderkey % {SCD2_V2_MOD} = 0 THEN '2-UPDATED'
              WHEN v >= 3 AND o_orderkey % {SCD2_V3_MOD} = 0 THEN '3-REPRICED'
              ELSE o_orderpriority END AS prio,
         round(o_totalprice
               + CASE WHEN v >= 2 AND o_orderkey % {SCD2_V2_MOD} = 0
                      THEN 50.0 ELSE 0.0 END
               + CASE WHEN v >= 3 AND o_orderkey % {SCD2_V3_MOD} = 0
                      THEN 25.0 ELSE 0.0 END, 2) AS price
  FROM orders, (SELECT unnest(range(1, 4)) AS v)
), flagged AS (
  SELECT o_orderkey, v, prio, price,
         lag(prio) OVER w IS NULL
           OR prio <> lag(prio) OVER w
           OR price <> lag(price) OVER w AS chg
  FROM versions
  WINDOW w AS (PARTITION BY o_orderkey ORDER BY v)
), changed AS (
  SELECT o_orderkey, v, prio, price FROM flagged WHERE chg
)
SELECT o_orderkey, prio, price,
       CAST(v AS INT) AS valid_from_v,
       CAST(lead(v) OVER w2 AS INT) AS valid_to_v,
       lead(v) OVER w2 IS NULL AS is_current
FROM changed
WINDOW w2 AS (PARTITION BY o_orderkey ORDER BY v)
"""


def scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: every lineitem fact joins the SCD2
    dimension row that was VALID AT the fact's as-of version — the
    no-future-leakage join a warehouse uses for historically-correct
    reporting and a training pipeline uses to keep features from leaking
    future state into past examples. Facts carry a deterministic as-of
    version (l_linenumber cycled through the 3 dimension versions); the
    join predicate is business-key equality plus interval containment
    ``valid_from_v <= av < coalesce(valid_to_v, +inf)``.

    Scale shape: an EQUI join on the business key with the interval test
    as a residual predicate — one keyed shuffle; the dimension side holds
    ≤ version-count rows per key (bounded by construction), so the join
    fan-out per fact row is the interval count, never a range explosion.
    Exactly one dimension row matches each fact (intervals partition the
    version axis) — asserted by the rollup's fact count equaling the raw
    fact count.
    """
    scd2 = scd2_build_orders(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.col("l_linenumber") % 3 + 1).cast("int").alias("av"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    joined = li.join(
        scd2,
        (li.o_orderkey == scd2.o_orderkey)
        & (F.col("valid_from_v") <= F.col("av"))
        & (F.col("valid_to_v").isNull() | (F.col("av") < F.col("valid_to_v"))),
    )
    return (
        joined.groupBy("prio", "av")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("prio", "av")
    )


SCD2_PIT_JOIN_SQL = f"""
WITH scd2 AS (
  SELECT * FROM ({SCD2_BUILD_SQL})
), facts AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(l_linenumber % 3 + 1 AS INT) AS av,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
)
SELECT s.prio, f.av,
       count(*) AS n_facts,
       round(sum(f.rev), 2) AS revenue
FROM facts f
JOIN scd2 s
  ON s.o_orderkey = f.o_orderkey
 AND s.valid_from_v <= f.av
 AND (s.valid_to_v IS NULL OR f.av < s.valid_to_v)
GROUP BY s.prio, f.av
ORDER BY s.prio, f.av
"""


QUERIES = {
    "mutation_merge_upsert": merge_upsert_customers,
    "mutation_delete_cascade": delete_cascade_orders,
    "mutation_property_set": property_set_parts,
    "mutation_table_diff": table_diff_orders,
    "mutation_scd2_build": scd2_build_orders,
    "mutation_scd2_pit_join": scd2_pit_join,
}

ORACLE = {
    "mutation_merge_upsert": MERGE_UPSERT_SQL,
    "mutation_delete_cascade": DELETE_CASCADE_SQL,
    "mutation_property_set": PROPERTY_SET_SQL,
    "mutation_table_diff": TABLE_DIFF_SQL,
    "mutation_scd2_build": SCD2_BUILD_SQL,
    "mutation_scd2_pit_join": SCD2_PIT_JOIN_SQL,
}
