"""The "de-live" sanitization suite (SURVEY §2.11) as pure DataFrame rewrites.

The reference turns a production snapshot into a sandbox through an ordered
sequence of SQL UPDATE/DELETE/INSERT mutations (reference ufload/db.py:342-537).
In a columnar engine, in-place mutation is re-expressed as
transform-and-rewrite: each UPDATE becomes ``withColumn(when(pred, new)
.otherwise(old))``, each DELETE becomes a filter or anti-join, and
INSERT…RETURNING becomes deterministic id assignment via
``max(existing_id) + row_number()``.

Input frames are derived from the fixtures (FIXTURES.md §B3): ``users`` from
``customer``, ``groups``/``membership`` from market segments, ``cron`` from
``part`` — so the DuckDB oracle sees identical inputs.

Scale: every step is a narrow map over the table being rewritten except the
joins, whose build sides (groups, spec rows) are tiny → broadcast. One full
rewrite pass at 100 TB is a scan + map + write, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

#: DuckDB CTEs for the derived de-live inputs (FIXTURES.md §B3).
DELIVE_CTE = """
WITH users AS (
  SELECT c_custkey AS id, lower(c_name) AS login, 'LIVE' AS password,
         true AS active, c_mktsegment AS dept
  FROM customer
), groups AS (
  SELECT dense_rank() OVER (ORDER BY name) AS gid, name,
         length(name) % 2 = 0 AS visible
  FROM (SELECT DISTINCT c_mktsegment AS name FROM customer)
), membership AS (
  SELECT u.id AS uid, g.gid AS gid FROM users u JOIN groups g ON u.dept = g.name
), cron AS (
  SELECT p_partkey AS id, p_type AS model, true AS active FROM part
)
"""


def users(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.lower("c_name").alias("login"),
        F.lit("LIVE").alias("password"),
        F.lit(True).alias("active"),
        F.col("c_mktsegment").alias("dept"),
    )


def groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    distinct = c.select(F.col("c_mktsegment").alias("name")).distinct()
    # SCALE GUARD: partition-less window = a single-reducer sort. Safe here
    # ONLY because the domain is the distinct market segments (5 rows, and
    # bounded by the business domain, not the data volume). Do not copy
    # this pattern onto per-row tables — for dense ids over an unbounded
    # domain use a keyed window or hash-derived ids instead.
    w = Window.orderBy("name")
    return distinct.select(
        F.dense_rank().over(w).alias("gid"),
        "name",
        (F.length("name") % 2 == 0).alias("visible"),
    )


def membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = users(spark, sf_dir)
    g = groups(spark, sf_dir)
    # groups is a ≤5-row dim → broadcast; no shuffle of users
    return u.join(F.broadcast(g), u.dept == g.name).select(
        u.id.alias("uid"), g.gid.alias("gid")
    )


_KEEP_LOGINS = ("customer#000000002", "customer#000000003")


@register(
    "delive_password_stomp",
    DELIVE_CTE
    + f"""
SELECT id,
  CASE WHEN id = 1 THEN 'admin_sandbox' ELSE login END AS login,
  CASE WHEN id = 1 THEN 'ADMIN_PW'
       WHEN login IN {_KEEP_LOGINS} THEN 'PER_USER_PW'
       ELSE 'SANDBOX_PW' END AS password,
  (id = 1 OR login IN {_KEEP_LOGINS}) AS active
FROM users
""",
    doc="§2.11 password stomping / admin rename / deactivation (db.py:442-533)",
)
def delive_password_stomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-users password stomp, per-user override list, admin reset+rename,
    deactivate everyone not allow-listed — the reference's UPDATE chain on
    res_users (db.py:442-451,522-525,532-533) as one conditional projection."""
    u = users(spark, sf_dir)
    keep = F.col("login").isin(*_KEEP_LOGINS)
    is_admin = F.col("id") == 1
    return u.select(
        "id",
        F.when(is_admin, F.lit("admin_sandbox")).otherwise(F.col("login")).alias("login"),
        F.when(is_admin, F.lit("ADMIN_PW"))
        .when(keep, F.lit("PER_USER_PW"))
        .otherwise(F.lit("SANDBOX_PW"))
        .alias("password"),
        (is_admin | keep).alias("active"),
    )


_DISABLED_MODELS = ("PROMO", "ECONOMY")


@register(
    "delive_disable_cron",
    DELIVE_CTE
    + f"""
SELECT id, model,
  (active AND model NOT IN {_DISABLED_MODELS}) AS active,
  CASE WHEN model = 'STANDARD'
       THEN TIMESTAMP '2026-01-01 00:00:00' + INTERVAL 1 HOUR
       ELSE NULL END AS nextcall
FROM cron
""",
    doc="§2.11 cron disable by model list + nextcall push (db.py:377-407)",
)
def delive_disable_cron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disable scheduled jobs whose model is in the kill list and push the
    next call time an hour out (reference db.py:377-391,398,407)."""
    p = table(spark, sf_dir, "part")
    cron = p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_type").alias("model"),
        F.lit(True).alias("active"),
    )
    return cron.select(
        "id",
        "model",
        (F.col("active") & ~F.col("model").isin(*_DISABLED_MODELS)).alias("active"),
        F.when(
            F.col("model") == "STANDARD",
            F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.expr("INTERVAL 1 HOUR"),
        ).alias("nextcall"),
    )


@register(
    "delive_hide_groups",
    DELIVE_CTE
    + """
SELECT m.uid, m.gid FROM membership m
WHERE NOT EXISTS (SELECT 1 FROM groups g WHERE g.gid = m.gid AND NOT g.visible)
""",
    doc="OP-JOIN-2 semi-join DELETE: drop membership of hidden groups (db.py:423)",
)
def delive_hide_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DELETE FROM rel WHERE gid IN (SELECT … WHERE NOT visible)`` as a
    left-anti join keeping the complement (reference db.py:420-423)."""
    m = membership(spark, sf_dir)
    hidden = groups(spark, sf_dir).where(~F.col("visible")).select("gid")
    return m.join(F.broadcast(hidden), "gid", "left_anti").select("uid", "gid")


@register(
    "delive_user_dept_join",
    DELIVE_CTE
    + """
SELECT u.id, g.gid AS context_department_id
FROM users u LEFT JOIN groups g ON u.dept = g.name AND g.visible
""",
    doc="OP-JOIN-1 update-from-join: set department id from dim (db.py:503-506)",
)
def delive_user_dept_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE users SET context_department_id = d.id FROM dept d WHERE …``
    as a broadcast left join + projection (reference db.py:503-506); rows with
    no visible department keep NULL."""
    u = users(spark, sf_dir)
    g = groups(spark, sf_dir).where(F.col("visible"))
    joined = u.join(F.broadcast(g), u.dept == g.name, "left")
    return joined.select(u.id.alias("id"), g.gid.alias("context_department_id"))


_NEW_USER_SPECS = [
    # login:dept — the createusers spec shape (reference db.py:475-494)
    ("sandbox_admin", "BUILDING"),
    ("sandbox_ops", "FURNITURE"),
    ("sandbox_qa", "MACHINERY"),
]


@register(
    "delive_create_users",
    DELIVE_CTE
    + """
, spec AS (
  SELECT * FROM (VALUES
    ('sandbox_admin', 'BUILDING'),
    ('sandbox_ops',   'FURNITURE'),
    ('sandbox_qa',    'MACHINERY')
  ) AS s(login, dept)
), new_users AS (
  SELECT (SELECT max(id) FROM users)
           + row_number() OVER (ORDER BY login) AS id,
         login, dept
  FROM spec
)
SELECT n.id, n.login, g.gid
FROM new_users n LEFT JOIN groups g ON n.dept = g.name
""",
    doc="§2.11 INSERT…RETURNING + insert-select membership (db.py:498-515)",
)
def delive_create_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User creation: serial id assignment (INSERT…RETURNING, db.py:498-500)
    becomes ``max(existing_id) + row_number() ORDER BY login`` — deterministic
    under parallelism; the group membership insert-select (db.py:513-515) is a
    broadcast lookup join."""
    u = users(spark, sf_dir)
    g = groups(spark, sf_dir)
    spec = spark.createDataFrame(_NEW_USER_SPECS, "login string, dept string")
    max_id = u.agg(F.max("id").alias("mx"))
    w = Window.orderBy("login")
    new_users = (
        spec.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(max_id))
        .select((F.col("mx") + F.col("rn")).alias("id"), "login", "dept")
    )
    return new_users.join(F.broadcast(g), new_users.dept == g.name, "left").select(
        "id", "login", "gid"
    )


@register(
    "delive_logo_banner",
    """
SELECT n_nationkey AS id,
       base64(encode('SANDBOX_LOGO_' || n_name)) AS logo,
       'THIS IS A SANDBOX COPY — ' || n_name AS banner,
       CASE WHEN n_regionkey % 2 = 0 THEN 'd:\\' ELSE '/tmp' END AS backup_path
FROM nation
""",
    doc="§2.11 logo/banner injection + platform-dependent backup config "
    "(db.py:426-439); OP-FN-7 base64 encode",
)
def delive_logo_banner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logo injection as a base64 literal column (reference db.py:426), the
    dollar-quoted sandbox banner (db.py:429), and the platform-dependent
    backup path reset (db.py:431-439) — one narrow projection per config
    row, no shuffle."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("id"),
        F.base64(F.encode(F.concat(F.lit("SANDBOX_LOGO_"), F.col("n_name")), "UTF-8"))
        .alias("logo"),
        F.concat(F.lit("THIS IS A SANDBOX COPY — "), F.col("n_name")).alias("banner"),
        F.when(F.col("n_regionkey") % 2 == 0, F.lit("d:\\"))
        .otherwise(F.lit("/tmp"))
        .alias("backup_path"),
    )


@register(
    "delive_sequence_bump",
    """
SELECT o_orderpriority AS sequence_name,
       max(o_orderkey) + 1000 AS number_next,
       TIMESTAMP '2026-01-01 00:00:00' + INTERVAL 1 HOUR AS next_run
FROM orders GROUP BY o_orderpriority
""",
    doc="OP-FN-10 arithmetic: sequence bump number_next+1000 and "
    "timestamp + interval (cli/main.py:456, db.py:407)",
)
def delive_sequence_bump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sync-sequence bump (reference cli/main.py:456
    ``number_next=number_next+1000``) and interval push (db.py:407) over a
    sequences frame derived from orders — partial aggregation map-side, tiny
    final shuffle on the 5 priority keys."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("sequence_name")).agg(
        (F.max("o_orderkey") + 1000).alias("number_next"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.expr("INTERVAL 1 HOUR")
        ).alias("next_run"),
    )


@register(
    "delive_ilike_groups",
    DELIVE_CTE
    + """
SELECT gid, name, false AS visible FROM groups WHERE name ILIKE '%ur%'
""",
    doc="OP-FIL-9 ILIKE predicate: hide groups by case-insensitive pattern "
    "(db.py:422)",
)
def delive_ilike_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE res_groups SET visible='f' WHERE name ILIKE '<pat>'``
    (reference db.py:422) — the matched rows with visibility stomped."""
    g = groups(spark, sf_dir)
    return g.where(F.col("name").ilike("%ur%")).select(
        "gid", "name", F.lit(False).alias("visible")
    )
