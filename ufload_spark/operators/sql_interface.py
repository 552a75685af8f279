"""SQL front-end parity (OP-SNK-2): the same SQL text on both engines.

The reference ships literal SQL strings to PostgreSQL (reference
ufload/db.py:73-95 mkpsql/psql). The Spark analog is ``spark.sql`` over
registered views — and for the ANSI-compatible subset, the exact same
string runs on DuckDB, so these queries register ONE string as both the
Spark implementation and the oracle. That is the strongest possible parity
statement: not equivalent plans, the identical query text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import register_views

#: ANSI-subset SQL accepted verbatim by Spark SQL and DuckDB.
_LATEST_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts FROM ranked WHERE rn = 1
"""

_REVENUE_SQL = """
SELECT n_name, o_orderpriority,
       round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus <> 'F'
GROUP BY n_name, o_orderpriority
"""


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "sql_latest_event_per_user",
    _LATEST_SQL,
    doc="OP-SNK-2 SQL executor: identical SQL text runs on spark.sql and "
    "the DuckDB oracle (CTE + window rank)",
)
def sql_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _LATEST_SQL)


@register(
    "sql_revenue_rollup",
    _REVENUE_SQL,
    doc="OP-SNK-2 SQL executor: identical SQL text on both engines "
    "(multi-join + aggregate)",
)
def sql_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _REVENUE_SQL)


_GROUPING_SETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

_LATERAL_SQL = """
SELECT c_custkey, t.max_price
FROM customer c, LATERAL (
  SELECT max(o_totalprice) AS max_price FROM orders WHERE o_custkey = c.c_custkey
) t
WHERE c_custkey < 50
"""


@register(
    "sql_grouping_sets",
    _GROUPING_SETS_SQL,
    doc="OP-SNK-2 SQL executor: explicit GROUPING SETS (the generalization "
    "rollup/cube compile to), identical text on both engines",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregation in ONE pass: Catalyst expands grouping
    sets into a single Expand + hash aggregate — one scan serves every
    granularity, versus one scan per rollup level done naively."""
    return _run(spark, sf_dir, _GROUPING_SETS_SQL)


@register(
    "sql_lateral_correlated",
    _LATERAL_SQL,
    doc="OP-SNK-2 SQL executor: correlated LATERAL subquery, identical "
    "text on both engines",
)
def sql_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL — the per-row subquery surface. Catalyst decorrelates it
    into an aggregate + left outer join on o_custkey (no per-row
    re-execution; `.explain` shows a plain join, which is why this scales
    where a literal nested-loop interpretation would not)."""
    return _run(spark, sf_dir, _LATERAL_SQL)


_RECURSIVE_BOM_SQL = """
WITH RECURSIVE walk AS (
  SELECT p_partkey AS root, p_partkey AS pk, 0 AS depth,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part WHERE p_partkey < 4
  UNION ALL
  SELECT w.root, c.p_partkey AS pk, w.depth + 1 AS depth,
         CAST(floor(c.p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM walk w
  JOIN part c ON CAST(floor(c.p_partkey / 4.0) AS BIGINT) = w.pk
             AND c.p_partkey >= 4
)
SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(cents) AS BIGINT) AS subtree_cents
FROM walk GROUP BY root
"""


@register(
    "sql_recursive_bom",
    _RECURSIVE_BOM_SQL,
    doc="OP-SNK-2 SQL executor: WITH RECURSIVE bill-of-materials explosion "
    "— identical SQL text on spark.sql (Spark 4 recursive CTEs) and DuckDB; "
    "subtree size/depth/cents rollup per root, exact integers",
)
def sql_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recursive-query surface (Spark 4's ``WITH RECURSIVE``), exercised
    as a bill-of-materials explosion: a containment forest derived from
    part keys (parent = ⌊key/4⌋, roots are keys < 4 — every part reduces
    to a root, so the forest spans the table ~6 levels deep at these key
    ranges), walked from the roots with depth tracking, then rolled up to
    per-root subtree size, height and exact retail cents. The SAME query
    text is the DuckDB oracle — the strongest parity statement this
    module makes, now extended to iterative SQL.

    Scale shape: Spark executes each recursion step as a join of the
    previous frontier against the part table — the BFS frontier-expansion
    shape (`graph_bfs_distances`) expressed declaratively; the engine
    terminates when a step yields no rows. Depth is data-bounded
    (log₄ of the key domain), and each step's join keys on the parent
    expression, so at 100 TB the walk is as partitionable as any
    equi-join chain.

    Reference analog: none (extension surface — SQL executor family,
    OP-SNK-2; reference ships literal SQL to PostgreSQL, db.py:73-95).
    """
    return _run(spark, sf_dir, _RECURSIVE_BOM_SQL)
