"""TPC-H-shaped analytics over the driver testdata star schema.

The reference pipeline has no joins/sorts/subqueries at all (SURVEY.md §2.5);
these queries prove the engine's full relational surface on the shapes the
TPC-H benchmark standardizes: selective join chains (Q3/Q10), EXISTS
semi-joins (Q4), single-pass conditional aggregation (Q12/Q14), window-max
(Q15), HAVING-subquery joins (Q18), disjunctive pushdown predicates (Q19),
and scalar-subquery + anti-join (Q22). Columns are adapted to the driver
schema (TESTDATA.md) — e.g. no l_commitdate, so Q4's lateness predicate is
``l_shipdate > o_orderdate``.

Scale posture: broadcast hints go ONLY on true dims (region/nation/customer/
supplier/part — tiny relative to the facts). Orders-derived join sides
(orders filtered by date/status, orders⋈customer intermediates) never carry
a hint: an explicit hint bypasses AQE's size gate, so at 100x it would OOM
executors instead of degrading to sort-merge. AQE picks their strategy at
runtime. The fact table shuffles only for its final groupBy; all money math
routes through decimal (functions/exact.py) so results are order-independent
and bit-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_data_pipeline_spark.functions.exact import davg, dsum, usum
from aws_data_pipeline_spark.operators import joins
from aws_data_pipeline_spark.plans import register
from aws_data_pipeline_spark.plans.analytics import _REV_SQL, _rev_spark, _sum_rev
from aws_data_pipeline_spark.plans.common import T, dsum_sql


# -- Q3: shipping priority (selective 3-way join + deterministic top-k) ----


@register(
    "q3_shipping_priority",
    sql=f"""
    SELECT l.l_orderkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: both selective filters push into the scans, the
    customer dim broadcasts into orders, one shuffle for the groupBy, then a
    global top-k (ties broken by l_orderkey so LIMIT is deterministic).
    No broadcast hint on the orders-derived side: the date cut keeps most of
    orders, so the strategy is left to AQE — broadcast while it fits the
    threshold, sort-merge beyond it (a forced hint would OOM at 100x)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = li.join(
        o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey")),
        li.l_orderkey == o.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_rev().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# -- Q4: order priority checking (EXISTS -> left-semi join) ----------------


@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS compiles to a left-semi join (no fact-side
    duplication, no distinct needed); the date filter prunes orders before
    the join. Lateness predicate adapted to l_shipdate > o_orderdate."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = joins.semi_join(
        o,
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# -- Q6: forecast revenue change (pure pushed-down scan-agg) ---------------


@register(
    "q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate reaches the parquet scan as a pushed filter
    (.explain shows all four in PushedFilters) — the archetypal
    scan-dominated query; no shuffle at all beyond the final 1-row agg."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(12,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("line_count"),
    )


# -- Q10: returned item reporting (join chain + top-20 by lost revenue) ----


@register(
    "q10_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer over a
    half-year window; dims broadcast, single groupBy shuffle, deterministic
    top-20 (revenue desc, custkey tiebreak)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    joined = joins.enrich(
        li,
        [
            # orders is fact-derived (the date cut scales with SF) — no
            # hint, AQE picks broadcast only while it measurably fits
            (o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey, False),
            (c, o.o_custkey == c.c_custkey),
            (n.select("n_nationkey", "n_name"), c.c_nationkey == F.col("n_nationkey")),
        ],
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_sum_rev().alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            F.col("n_name").alias("nation_name"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# -- Q12: shipping priority classes (single-pass conditional aggregation) --


@register(
    "q12_priority_by_shipyear",
    sql="""
    SELECT CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY YEAR(l.l_shipdate)
    """,
)
def q12_priority_by_shipyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional SUM(CASE...) folds what would be two
    filtered scans into one pass (reference-style code would run two jobs);
    shipmode adapted to o_orderpriority classes. No broadcast hint on orders
    — it is a fact table, so the strategy is left to AQE: broadcast while the
    projected (o_orderkey, o_orderpriority) side fits the threshold, sort-
    merge beyond it (a forced broadcast would OOM at 100x)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# -- Q14: promotion effect (conditional ratio over a join) -----------------


@register(
    "q14_promo_effect",
    sql=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS line_count
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share in one pass — part broadcast,
    both branches of the ratio computed in the same aggregate (exact decimal
    sums, then one IEEE double division, so it bit-matches the oracle)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _rev_spark()).otherwise(F.lit(0))
    return joined.agg(
        (F.lit(100.0) * usum(promo, 4) / _sum_rev())
        .cast("double")
        .alias("promo_revenue_pct"),
        F.count("*").alias("line_count"),
    )


# -- Q15: top supplier (aggregate -> window max, no self-join) -------------


@register(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the scalar-subquery MAX becomes a window max over an
    empty frame — one extra exchange instead of a second scan+self-join
    (the decimal-exact revenue makes the equality comparison safe)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _sum_rev().alias("total_revenue")
    )
    # global max via a one-row aggregate broadcast back as an equi-join —
    # NOT an unpartitioned window, which would single-partition every
    # supplier's revenue row through one WindowExec task at scale
    mx = rev.agg(F.max("total_revenue").alias("__max"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == mx.__max).drop("__max")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(s), top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -- Q18: large-volume customers (HAVING subquery as a semi-join) ----------


@register(
    "q18_large_volume_customers",
    sql=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery (orders whose lineitems sum past a
    quantity threshold) is an aggregate + semi-join. The qualifying-key set
    is a data-dependent aggregate (HAVING-selective at test SF, but its size
    scales with orders), so no forced broadcast — AQE chooses the strategy
    from the set's measured runtime size."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "decimal(12,2)").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    filtered = li.join(big, "l_orderkey", "left_semi")
    joined = joins.enrich(
        filtered,
        [
            # full orders — a fact, never hinted (AQE decides, q12 pattern)
            (o, filtered.l_orderkey == o.o_orderkey, False),
            (c, o.o_custkey == c.c_custkey),
        ],
    )
    return joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(dsum("l_quantity", "decimal(12,2)").alias("sum_qty"))


# -- Q19: disjunctive predicates (OR-of-ANDs pushed into one join) ---------


@register(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS line_count
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — one broadcast
    hash join on p_partkey with the disjunction as a post-join residual
    (naive engines do three scans and union; this is a single pass)."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & q.between(20, 40))
    )
    return j.filter(cond).agg(
        _sum_rev().alias("revenue"),
        F.count("*").alias("line_count"),
    )


# -- Q22: idle rich customers (scalar subquery + anti join) ----------------


@register(
    "q22_idle_rich_customers",
    sql="""
    SELECT n.n_name AS nation_name, COUNT(*) AS num_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders —
    the scalar AVG broadcasts as a 1-row cross join, NOT EXISTS is a
    left-anti join on the (deduplicated, broadcast) order keys."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal", "decimal(12,2)").alias("__avg"))
    )
    o_keys = T(spark, sf_dir, "orders").select("o_custkey").distinct()
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__avg"))
    idle = joins.anti_join(rich, o_keys, rich.c_custkey == F.col("o_custkey"))
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("num_custs"),
            dsum("c_acctbal", "decimal(12,2)").alias("total_acctbal"),
        )
    )


# -- Q5: local supplier volume (6-way join, customer nation == supplier) ---


@register(
    "q5_local_supplier_volume",
    sql=f"""
    SELECT n.n_name AS nation_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full 6-table star join where the local-supplier
    condition (customer and supplier share a nation) rides on the supplier
    join. Region/nation/supplier/customer all broadcast; the date filter
    pushes into the orders scan (reference has no joins at all; SURVEY.md
    §2.5). Join order is chosen to shrink the fact BEFORE its one shuffle:
    lineitem joins the broadcast ASIA-supplier dim first (map-side, drops
    ~4/5 of lines at this selectivity), and only the surviving slice
    shuffles into the orderkey join against the fact-sized orders⋈customer
    intermediate — which carries no broadcast hint; AQE picks broadcast vs
    sort-merge by its runtime size, exactly as in q12."""
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    s = T(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    li_asia = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    return (
        li_asia.join(
            oc,
            (li_asia.l_orderkey == oc.o_orderkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(_sum_rev().alias("revenue"))
    )


# -- Q7: volume shipping between two nations ------------------------------


@register(
    "q7_volume_shipping",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume. The nation pair predicate is
    applied to the two broadcast dim chains BEFORE the fact join, so lineitem
    rows from uninvolved nations are dropped at the hash-join probe, not
    carried to the groupBy shuffle. orders⋈customer is orders-sized (the
    customer side is nation-filtered but orders is not), so that join side
    carries no broadcast hint — AQE decides, as in q12."""
    nations = ("NATION_1", "NATION_2")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    s = T(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = T(spark, sf_dir, "customer").join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("n2_nationkey"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("n2_nationkey"),
    ).select("c_custkey", "cust_nation")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_sum_rev().alias("revenue"))
    )


# -- Q8: national market share --------------------------------------------


@register(
    "q8_market_share",
    sql=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation_name = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT YEAR(o.o_orderdate) AS o_year, {_REV_SQL} AS volume,
             n1.n_name AS nation_name
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part volume sold into
    AMERICA, per order year. The share is one conditional aggregate over a
    single fact pass (not two filtered scans); numerator and denominator sum
    exactly in decimal and only the final ratio is double. The region-
    filtered customer set still leaves orders⋈customer orders-scale, so no
    broadcast hint on it — AQE chooses (q12 pattern); true dims (part,
    supplier chains) keep their hints."""
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = T(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("n2_nationkey"))
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"), F.col("n_name").alias("nation_name")
    )
    s = T(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_nationkey")
    ).select("s_suppkey", "nation_name")
    c = T(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey")
    ).select("c_custkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = _rev_spark()
    zero = F.lit(0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(oc, li.l_orderkey == oc.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("o_year")
        .agg(
            (
                usum(F.when(F.col("nation_name") == "NATION_3", vol).otherwise(zero), 4)
                / usum(vol, 4)
            ).alias("mkt_share")
        )
    )


# -- Q13: customer order-count distribution (outer join + double groupBy) --


@register(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k non-finished orders —
    LEFT join keeps zero-order customers (COUNT over the null o_orderkey is
    0), then a second, much smaller groupBy builds the histogram. The join
    predicate filters orders BEFORE the join (pushed), not after (which would
    turn the outer join inner and lose the zeros)."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -- Q17: small-quantity-order revenue (correlated scalar subquery) --------


@register(
    "q17_small_quantity_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated AVG-per-part subquery is decorrelated
    into one groupBy — but only AFTER restricting lineitem to Brand#13 parts
    via a broadcast semi-join. Only probed parts ever need a threshold, so
    aggregating the full fact first (then broadcasting a |part|-sized
    threshold table) would waste ~the whole aggregation and OOM the
    broadcast at 100× scale. The threshold side's size is data-dependent
    (|Brand#13 parts|), so no forced hint — AQE picks the join strategy.
    Quantities are integral doubles, so the double AVG is exact and
    order-independent — safe against the oracle."""
    p = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # semi-join keeps ALL lineitems of the probed parts (the correlated
    # subquery averages over every lineitem of the part, so this slice is
    # exactly the aggregation domain)
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    thresholds = brand_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(thresholds, brand_li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice", "decimal(12,2)") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# -- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ----------


@register(
    "q21_suppliers_kept_waiting",
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_5'
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted to this schema: shipped more than 90
    days after order date — there is no commit/receipt date, cf. Q4). The
    EXISTS/NOT-EXISTS pair collapses into two window aggregates over the same
    order partition: distinct suppliers in the order > 1, and distinct LATE
    suppliers == 1 (the candidate row is itself late, so ==1 means "me
    alone"). One shuffle on l_orderkey replaces two correlated semi-joins.
    orders filtered only by status 'F' keeps ~half the table — fact-sized —
    so the lineitem⋈orders join carries no broadcast hint (AQE decides, q12
    pattern); the nation-filtered supplier dim keeps its hint."""
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = T(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    enriched = lo.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    return (
        enriched.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
