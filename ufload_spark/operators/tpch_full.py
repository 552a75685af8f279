"""TPC-H completion: the 14 queries beyond the original eight in
``analytics.py``, adapted to the fixture schema where TPC-H columns are
absent (no partsupp / shipmode / receiptdate / container / phone) while
preserving each query's distinctive PLAN SHAPE — the correlated scalar
subquery of Q17, the double-correlated EXISTS/NOT EXISTS of Q21, the
disjunctive pushdown of Q19, and so on. Together with analytics.py this
gives the engine a presence for all 22 TPC-H queries.

The reference has no query corpus at all (SURVEY §5 — 3 unit tests on name
parsing); this module is the "analytics engine breadth" the rebuild target
mandates beyond reference parity.

Scale notes follow the house rules: FIXED-cardinality dims (nation=25,
region=5) and 1-row scalars carry explicit broadcast hints; sides that
GROW with the corpus (customer/part/supplier and per-part/per-supplier
derived frames) are deliberately UNHINTED — the planner broadcasts them
from accurate file-size estimates at bench scale, and at 1000× they
degrade to a shuffle join instead of forcing a driver OOM (an explicit
hint overrides any size check — the r6 pagerank incident class).
Fact-fact joins shuffle on their keys (bucketing candidates), aggregates
partial map-side, no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    # built lazily: pyspark 4 Column construction needs an active context,
    # and this module imports at registry-load time before any session exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "tpch_q2_cheapest_supplier",
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, min(unit_price) AS best_price
  FROM offers GROUP BY l_partkey
)
SELECT p.p_partkey, s.s_name, n.n_name,
       round(o.unit_price, 4) AS unit_price
FROM offers o
JOIN best  b ON o.l_partkey = b.l_partkey AND o.unit_price = b.best_price
JOIN part  p ON o.l_partkey = p.p_partkey
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation   n ON s.s_nationkey = n.n_nationkey
JOIN region   r ON n.n_regionkey = r.r_regionkey
WHERE p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
""",
    doc="TPC-H Q2 shape (adapted: offers derived from lineitem, no "
    "partsupp): min-cost supplier per part via agg + equality join-back",
)
def tpch_q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's `ps_supplycost = (SELECT min ...)` correlated-min becomes an
    aggregate + equality join-back — the decorrelation Catalyst/DuckDB both
    apply. The min is a pure selection (no float summation), so the
    equality join on the double is engine-stable. offers/best shuffle on
    partkey once and reuse the partitioning across both aggregates."""
    li = table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    # rename the re-aggregated side: both frames share the lineitem lineage,
    # and Spark can't disambiguate l_partkey across a self-derived join
    best = (
        offers.groupBy(F.col("l_partkey").alias("bk"))
        .agg(F.min("unit_price").alias("best_price"))
    )
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        offers.join(
            best,
            (offers.l_partkey == best.bk)
            & (offers.unit_price == best.best_price),
        )
        .drop("bk")
        .join(p, offers.l_partkey == p.p_partkey)
        .join(s, offers.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round("unit_price", 4).alias("unit_price"),
        )
    )


@register(
    "tpch_q4_priority_checking",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 (lateness = shipped >90 days after order; fixtures lack "
    "commit/receipt dates): correlated EXISTS → left-semi join",
)
def tpch_q4_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelates to a left-semi join on orderkey with the
    inequality as a join residual. The quarter filter prunes orders at the
    scan; the semi join shuffles both sides on orderkey (bucketing
    candidate at scale)."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").alias("l")
    oa = o.alias("o")
    late = (F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    return (
        oa.join(li, (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, yr, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS yr, {_REV_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, yr
""",
    doc="TPC-H Q7 volume shipping: two-nation trade flows per year, "
    "symmetric disjunctive nation predicate",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation pair predicate is applied after two broadcast joins to
    the (25-row) nation dim — the fact tables never shuffle for it. The
    only real exchanges are lineitem⋈orders and orders⋈customer."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""
SELECT yr, round(sum(CASE WHEN nation = 'NATION_6' THEN volume ELSE 0 END)
                / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS yr, {_REV_SQL} AS volume, n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY yr
""",
    doc="TPC-H Q8 market share: one nation's share of regional volume per "
    "year — conditional-sum ratio over an 8-way star join",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest join tree in the suite. part/supplier/nation/region all
    broadcast; the two fact exchanges (lineitem⋈orders on orderkey,
    +customer on custkey) carry only the projected volume columns."""
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _rev().alias("volume")
    df = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("yr"), vol, "nation")
    )
    national = F.sum(F.when(F.col("nation") == "NATION_6", F.col("volume")).otherwise(0.0))
    return df.groupBy("yr").agg(
        F.round(national / F.sum("volume"), 4).alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    f"""
SELECT n_name AS nation, year(o_orderdate) AS yr,
       round(sum({_REV_SQL}), 2) AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
    doc="TPC-H Q9 shape (profit = discounted revenue; fixtures lack "
    "ps_supplycost): product-line profit per nation per year",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIKE filter prunes part before the broadcast, shrinking the
    build side; profit aggregates per (nation, year) with map-side
    partials."""
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum(_rev()), 2).alias("profit"))
    )


@register(
    "tpch_q11_important_parts",
    f"""
WITH partvalue AS (
  SELECT l_partkey, sum({_REV_SQL}) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, round(value, 2) AS value
FROM partvalue
WHERE value > (SELECT sum(value) * 0.001 FROM partvalue)
""",
    doc="TPC-H Q11 shape (value from shipped revenue; fixtures lack "
    "partsupp): parts above a fraction of total regional value — "
    "aggregate reused by a global scalar subquery",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-part aggregate feeds BOTH the output rows and the global
    threshold — one shuffle on partkey, then a broadcast of the 1-row
    total (no second scan of lineitem). At 100 TB the partvalue frame is
    the thing to persist; locally Catalyst reuses the exchange."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    partvalue = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value"))
    )
    threshold = partvalue.agg((F.sum("value") * 0.001).alias("thr"))
    return (
        partvalue.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
    )


@register(
    "tpch_q12_priority_by_delay",
    """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    doc="TPC-H Q12 shape (speed class from ship delay; fixtures lack "
    "shipmode): priority counts per shipping-speed class",
)
def tpch_q12_priority_by_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's conditional-count pair over a fact-fact join, grouped by a
    derived key. The year filter pushes to the lineitem scan; one shuffle
    on orderkey then a 2-group aggregate."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    speed = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "SLOW",
    ).otherwise("FAST")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, round(sum({_REV_SQL}), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 top supplier: quarterly revenue view + scalar-max "
    "equality join-back",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view-then-max pattern: revenue aggregates once (shuffle on
    suppkey), the 1-row max broadcasts back. Revenue is rounded to 2 dp on
    both engines BEFORE max/equality so the join key is float-stable."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_part_counts",
    """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape (supplier-part pairs from lineitem, exclusion = "
    "negative balance; fixtures lack partsupp/comments): distinct-supplier "
    "counts with a NOT-IN anti join",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN becomes a broadcast anti join against the (tiny) excluded
    supplier set — no NULL-semantics hazard since s_suppkey is non-null.
    The distinct-count aggregate expands on (brand,type,size,suppkey) then
    collapses; both steps partial map-side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 10
  AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
""",
    doc="TPC-H Q17 (brand+size stand in for the absent container): "
    "small-quantity revenue via correlated per-part average",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated avg decorrelates to a per-part aggregate joined back
    on partkey. Quantities are integral, so avg = exact-int-sum / count is
    bit-identical across engines — the inequality threshold is stable.
    The per-part avg frame is tiny (one row per part) → broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
SELECT round(sum({_REV_SQL}), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    doc="TPC-H Q19 (brand/size/quantity stand in for container/shipmode): "
    "disjunction-of-conjunctions predicate over a join",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OR-of-ANDs predicate straddles both tables, so it can't fully
    push down — but Catalyst derives the single-table implications (brand
    IN (...), quantity <= 30) and pushes THOSE to each scan, shrinking the
    broadcast build and probe before the residual disjunction runs."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.where(pred).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@register(
    "tpch_q20_bulk_suppliers",
    """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
), shipped AS (
  SELECT l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN red_parts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 250)
""",
    doc="TPC-H Q20 shape (shipped volume stands in for partsupp "
    "availability): bulk red-part suppliers via nested semi joins",
)
def tpch_q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested-IN chain: part filter → per-supplier shipped-quantity
    aggregate → threshold keyset → semi join into supplier. Quantity sums
    are integral (exact), so the threshold is engine-stable. Each stage's
    output is orders of magnitude smaller than its input — the keyset
    broadcast at the end."""
    gp = table(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    shipped = (
        li.join(gp, li.l_partkey == gp.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                    ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    doc="TPC-H Q21 (lateness = shipped >60 days after order): suppliers "
    "solely responsible for late multi-supplier orders — EXISTS + NOT "
    "EXISTS double correlation",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature double-correlated query, decorrelated into per-order
    distinct-supplier COUNTS instead of self-joins: a late line qualifies
    iff its order has ≥ 2 distinct suppliers overall (the EXISTS — some
    OTHER supplier participated) and exactly 1 distinct LATE supplier
    (the NOT EXISTS — nobody else was late; that one must be the line's
    own supplier).

    The count form replaces a 6M-row left-semi shuffle plus a left-anti
    join with map-side-combinable aggregates: the partial distinct
    collapses (orderkey, suppkey) pairs before the exchange, so the
    shuffled bytes are the distinct-pair set, not the full lineitem
    stream (measured ~25% faster at sf1 than the semi/anti form, same
    rows). The late-supplier distinct count runs as a window over ONE
    evaluation of the lateness join (r11 — the aggregate-then-rejoin
    form executed that join twice); lineitem is scanned twice, each
    pruned to 2-3 columns with the lateness filter pushed down where it
    applies; both branches exchange on orderkey, so one bucketed layout
    serves them at scale."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")

    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    all_cnt = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("all_s")
    )
    # Single-late-supplier test as a WINDOW over one evaluation of `late`
    # (r11 optimization): the aggregate-then-rejoin form referenced the
    # late subtree twice — once under the countDistinct aggregate, once as
    # the join probe — and the two exchanges differ (partial-agg map side
    # vs raw rows), so the lineitem⋈orders lateness join executed twice.
    # size(collect_set) over the order partition is the same distinct
    # count, per-partition state is bounded by the order's line count,
    # and the late join now runs once.
    w_late = Window.partitionBy("l_orderkey")
    cand = (
        late.withColumn(
            "late_s", F.size(F.collect_set("l_suppkey").over(w_late))
        )
        .where(F.col("late_s") == 1)
        .drop("late_s")
        .join(all_cnt.where(F.col("all_s") >= 2), "l_orderkey")
    )
    return (
        cand.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_global_sales",
    """
WITH wealthy AS (
  SELECT c_custkey % 7 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
)
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM wealthy
GROUP BY cntrycode
""",
    doc="TPC-H Q22 shape (custkey mod stands in for the absent phone "
    "country code; dormant = no orders since 1999): wealthy dormant "
    "customers per code — scalar-avg subquery + anti join",
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global positive-balance average) broadcast as a
    1-row frame, then an anti join against recent orders on custkey. The
    anti join is the only shuffle; the average reuses the customer scan."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
