"""Data-quality governance operators (extension surface): a declarative
constraint audit and an ANALYZE-style column profile.

A 100 TB training pipeline gates every ingest batch on a constraint suite
(the public Deequ / Great Expectations pattern) and feeds the optimizer /
skew planning from per-column statistics (the ANALYZE TABLE pattern). Both
are implemented here as ONE-SCAN aggregates: every constraint metric (and
every column's profile) is computed as conditional partials inside a single
hash aggregate over the fact table, then unpivoted driver-free into one row
per constraint/column with ``stack``. The only second pass is the
referential-integrity check — an anti-join against the dimension key set,
which Spark broadcasts (the dimension is the small side at any scale).

Reference analog: none (the reference trusts its inputs; this is the
extension mandate's pipeline-governance surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

#: containment domain for o_orderstatus (the fixture generator's domain)
_STATUS_DOMAIN = ("O", "F", "P")
#: freshness floor: the fixture epoch start
_FRESH_FLOOR = "1992-01-01"


@register(
    "quality_constraint_audit",
    f"""
WITH base AS (
  SELECT count(*) AS n_rows,
         count(o_custkey) AS n_custkey,
         count(DISTINCT o_orderkey) AS n_distinct_key,
         count(*) FILTER (WHERE o_orderstatus IN ('O','F','P')) AS n_in_domain,
         count(*) FILTER (WHERE o_totalprice > 0) AS n_positive,
         count(*) FILTER (WHERE o_orderdate >= DATE '{_FRESH_FLOOR}') AS n_fresh
  FROM orders
), orph AS (
  SELECT count(*) AS n_orphans
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT constraint_name, round(metric, 6) AS metric, passed FROM (
  SELECT 'size_nonempty' AS constraint_name,
         CAST(n_rows AS DOUBLE) AS metric, n_rows > 0 AS passed
  FROM base
  UNION ALL SELECT 'completeness_o_custkey',
         CAST(n_custkey AS DOUBLE) / n_rows, n_custkey = n_rows FROM base
  UNION ALL SELECT 'uniqueness_o_orderkey',
         CAST(n_distinct_key AS DOUBLE) / n_rows, n_distinct_key = n_rows
  FROM base
  UNION ALL SELECT 'containment_o_orderstatus',
         CAST(n_in_domain AS DOUBLE) / n_rows, n_in_domain = n_rows FROM base
  UNION ALL SELECT 'positivity_o_totalprice',
         CAST(n_positive AS DOUBLE) / n_rows, n_positive = n_rows FROM base
  UNION ALL SELECT 'freshness_o_orderdate',
         CAST(n_fresh AS DOUBLE) / n_rows, n_fresh = n_rows FROM base
  UNION ALL SELECT 'referential_o_custkey',
         CAST(n_orphans AS DOUBLE), n_orphans = 0 FROM orph
)
""",
    doc="Deequ-style declarative constraint suite over orders: completeness, "
    "uniqueness, domain containment, positivity, freshness and referential "
    "integrity — six metrics from ONE scan (conditional partials in a single "
    "aggregate) plus one broadcast anti-join for the foreign key",
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-gate constraint report: one row per declared constraint
    with its measured metric and pass flag.

    Plan shape: a single hash aggregate over ``orders`` computes every
    in-table metric as conditional partials (``count_if`` — map-side
    combined, so the fact table is scanned ONCE no matter how many
    constraints are declared); the referential check is a ``left_anti``
    against the ``customer`` key set, broadcast because the dimension's
    keys are the small side at any fact-table scale. The two single-row
    aggregates cross-join trivially and ``stack`` unpivots them into the
    report — no shuffle besides the two aggregates themselves.

    At 100 TB this is the exact shape you want: constraint count does not
    multiply scan count, and adding a constraint is adding one partial to
    an aggregate that already exists.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")

    base = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_key"),
        F.count_if(F.col("o_orderstatus").isin(*_STATUS_DOMAIN)).alias(
            "n_in_domain"
        ),
        F.count_if(F.col("o_totalprice") > 0).alias("n_positive"),
        F.count_if(F.col("o_orderdate") >= F.lit(_FRESH_FLOOR).cast("date")).alias(
            "n_fresh"
        ),
    )
    orphans = (
        o.join(
            c.select("c_custkey"),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_orphans"))
    )
    wide = base.crossJoin(F.broadcast(orphans))
    report = wide.selectExpr(
        """stack(7,
  'size_nonempty', CAST(n_rows AS DOUBLE), n_rows > 0,
  'completeness_o_custkey', CAST(n_custkey AS DOUBLE) / n_rows,
      n_custkey = n_rows,
  'uniqueness_o_orderkey', CAST(n_distinct_key AS DOUBLE) / n_rows,
      n_distinct_key = n_rows,
  'containment_o_orderstatus', CAST(n_in_domain AS DOUBLE) / n_rows,
      n_in_domain = n_rows,
  'positivity_o_totalprice', CAST(n_positive AS DOUBLE) / n_rows,
      n_positive = n_rows,
  'freshness_o_orderdate', CAST(n_fresh AS DOUBLE) / n_rows,
      n_fresh = n_rows,
  'referential_o_custkey', CAST(n_orphans AS DOUBLE), n_orphans = 0
) AS (constraint_name, metric, passed)"""
    )
    return report.select(
        "constraint_name", F.round("metric", 6).alias("metric"), "passed"
    )


@register(
    "stats_column_profile",
    """
WITH base AS (
  SELECT count(*) AS n_rows,
         count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
         CAST(min(o_orderkey) AS DOUBLE) AS mn_key,
         CAST(max(o_orderkey) AS DOUBLE) AS mx_key,
         count(o_custkey) AS nn_cust, count(DISTINCT o_custkey) AS nd_cust,
         CAST(min(o_custkey) AS DOUBLE) AS mn_cust,
         CAST(max(o_custkey) AS DOUBLE) AS mx_cust,
         count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS nd_st,
         min(o_orderstatus) AS smn_st, max(o_orderstatus) AS smx_st,
         count(o_totalprice) AS nn_pr, count(DISTINCT o_totalprice) AS nd_pr,
         round(min(o_totalprice), 2) AS mn_pr, round(max(o_totalprice), 2) AS mx_pr,
         count(o_orderdate) AS nn_dt, count(DISTINCT o_orderdate) AS nd_dt,
         CAST(epoch(min(o_orderdate)) AS DOUBLE) AS mn_dt,
         CAST(epoch(max(o_orderdate)) AS DOUBLE) AS mx_dt,
         count(o_orderpriority) AS nn_pri,
         count(DISTINCT o_orderpriority) AS nd_pri,
         min(o_orderpriority) AS smn_pri, max(o_orderpriority) AS smx_pri
  FROM orders
)
SELECT column_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
       min_str, max_str FROM (
  SELECT 'o_orderkey' AS column_name, n_rows, nn_key AS n_nonnull,
         nd_key AS n_distinct, mn_key AS min_num, mx_key AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM base
  UNION ALL SELECT 'o_custkey', n_rows, nn_cust, nd_cust, mn_cust, mx_cust,
         NULL, NULL FROM base
  UNION ALL SELECT 'o_orderstatus', n_rows, nn_st, nd_st, NULL, NULL,
         smn_st, smx_st FROM base
  UNION ALL SELECT 'o_totalprice', n_rows, nn_pr, nd_pr, mn_pr, mx_pr,
         NULL, NULL FROM base
  UNION ALL SELECT 'o_orderdate', n_rows, nn_dt, nd_dt, mn_dt, mx_dt,
         NULL, NULL FROM base
  UNION ALL SELECT 'o_orderpriority', n_rows, nn_pri, nd_pri, NULL, NULL,
         smn_pri, smx_pri FROM base
)
""",
    doc="ANALYZE-style column profile of orders: per-column non-null count, "
    "exact NDV, min/max — all six columns from one aggregate (Spark expands "
    "the multi-distinct into one pass), unpivoted to a stats-table row per "
    "column; the input the optimizer/skew planner reads",
)
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table statistics as data: ``(column_name, n_rows, n_nonnull,
    n_distinct, min_num, max_num, min_str, max_str)`` per column of
    ``orders``. Numeric and timestamp columns report numeric min/max
    (timestamps as epoch seconds — engine-neutral, no string formatting
    drift); string columns report string min/max.

    Plan shape: ONE aggregate computes every column's profile — Spark
    plans the six exact ``count(DISTINCT ...)`` via a single Expand (rows
    multiplied by the distinct-aggregate count, then two-stage hash agg),
    which is the standard multi-distinct strategy and still one scan of
    the table. ``stack`` unpivots the single row into the stats table. At
    100 TB you'd sooner trade exact NDV for ``approx_count_distinct``
    partials (no Expand; see ``approx_distinct_parts``), but the exact
    form is what ANALYZE publishes and what the oracle can pin.
    """
    o = table(spark, sf_dir, "orders")
    base = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.count_distinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("double").alias("mn_key"),
        F.max("o_orderkey").cast("double").alias("mx_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.count_distinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("mn_cust"),
        F.max("o_custkey").cast("double").alias("mx_cust"),
        F.count("o_orderstatus").alias("nn_st"),
        F.count_distinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").alias("smn_st"),
        F.max("o_orderstatus").alias("smx_st"),
        F.count("o_totalprice").alias("nn_pr"),
        F.count_distinct("o_totalprice").alias("nd_pr"),
        F.round(F.min("o_totalprice"), 2).alias("mn_pr"),
        F.round(F.max("o_totalprice"), 2).alias("mx_pr"),
        F.count("o_orderdate").alias("nn_dt"),
        F.count_distinct("o_orderdate").alias("nd_dt"),
        F.min("o_orderdate").cast("timestamp_ltz").cast("long").cast("double").alias("mn_dt"),
        F.max("o_orderdate").cast("timestamp_ltz").cast("long").cast("double").alias("mx_dt"),
        F.count("o_orderpriority").alias("nn_pri"),
        F.count_distinct("o_orderpriority").alias("nd_pri"),
        F.min("o_orderpriority").alias("smn_pri"),
        F.max("o_orderpriority").alias("smx_pri"),
    )
    return base.selectExpr(
        """stack(6,
  'o_orderkey', n_rows, nn_key, nd_key, mn_key, mx_key,
      CAST(NULL AS STRING), CAST(NULL AS STRING),
  'o_custkey', n_rows, nn_cust, nd_cust, mn_cust, mx_cust,
      CAST(NULL AS STRING), CAST(NULL AS STRING),
  'o_orderstatus', n_rows, nn_st, nd_st, CAST(NULL AS DOUBLE),
      CAST(NULL AS DOUBLE), smn_st, smx_st,
  'o_totalprice', n_rows, nn_pr, nd_pr, mn_pr, mx_pr,
      CAST(NULL AS STRING), CAST(NULL AS STRING),
  'o_orderdate', n_rows, nn_dt, nd_dt, mn_dt, mx_dt,
      CAST(NULL AS STRING), CAST(NULL AS STRING),
  'o_orderpriority', n_rows, nn_pri, nd_pri, CAST(NULL AS DOUBLE),
      CAST(NULL AS DOUBLE), smn_pri, smx_pri
) AS (column_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
      min_str, max_str)"""
    )


#: k-anonymity floor and l-diversity floor for the privacy audit
K_ANON_MIN = 5
L_DIVERSE_MIN = 3


@register(
    "privacy_k_anonymity",
    f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
)
SELECT c_nationkey, bal_band,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
       count(*) >= {K_ANON_MIN} AS k_anonymous,
       count(DISTINCT c_mktsegment) >= {L_DIVERSE_MIN} AS l_diverse
FROM qi GROUP BY 1, 2
""",
    doc=f"privacy audit: k-anonymity (k >= {K_ANON_MIN}) and l-diversity "
    f"(l >= {L_DIVERSE_MIN} distinct sensitive values) per quasi-identifier "
    "group (nation x $1000 balance band) — one hash aggregate",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release-gate privacy audit (Sweeney's k-anonymity, Machanavajjhala
    et al.'s l-diversity): project the table onto its quasi-identifiers —
    here nation plus a $1000 account-balance band, the attributes an
    attacker could link from public data — and measure, per QI group,
    the re-identification crowd size ``k`` (rows sharing the QI tuple)
    and the sensitive-attribute diversity ``l`` (distinct market
    segments). A group with k < :data:`K_ANON_MIN` re-identifies
    individuals by linkage; one with l < :data:`L_DIVERSE_MIN` leaks the
    sensitive value even when k is large (the homogeneity attack). The
    output is the per-group evidence table a release pipeline joins back
    to suppress or generalize failing groups before publishing.

    The balance band is floor(balance/1000) — a deterministic IEEE
    divide-then-floor both engines compute identically (no rounding
    ties: the quotient magnitudes sit far from representation edges).

    Scale shape: ONE hash aggregate keyed by the QI tuple with map-side
    partials; distinct-count of a ≤5-value domain adds a bounded
    per-group state. No join, no window — at 100 TB this is a single
    shuffle of group partials.

    Reference analog: none (extension surface — governance family,
    beside `quality_constraint_audit`; `corpus_pii_scrub` is the
    unstructured-text sibling).
    """
    c = table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    return qi.groupBy("c_nationkey", "bal_band").agg(
        F.count("*").cast("bigint").alias("k"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
        (F.count("*") >= K_ANON_MIN).alias("k_anonymous"),
        (F.countDistinct("c_mktsegment") >= L_DIVERSE_MIN).alias("l_diverse"),
    )


#: DP release parameters: Laplace scale b = Δf/ε with sensitivity 1 (one
#: customer moves one count) and ε = 0.5; noisy counts below the floor are
#: suppressed from release.
DP_LAPLACE_SCALE = 2.0
DP_RELEASE_MIN = 10.0


@register(
    "privacy_dp_noisy_counts",
    f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
), u AS (
  SELECT c_nationkey, c_mktsegment, n,
         CAST(('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || '|'
                 || c_mktsegment), 1, 12))::BIGINT AS DOUBLE)
           / 281474976710656.0 AS u01
  FROM g
), noised AS (
  SELECT c_nationkey, c_mktsegment, n,
         round(-{DP_LAPLACE_SCALE} * sign(u01 - 0.5)
               * ln(1.0 - 2.0 * abs(u01 - 0.5)), 6) AS noise
  FROM u
)
SELECT c_nationkey, c_mktsegment,
       round(n + noise, 6) + 0.0 AS noisy_count,
       (n + noise) >= {DP_RELEASE_MIN} AS released
FROM noised
""",
    doc=f"differentially-private release counts (Laplace b={DP_LAPLACE_SCALE}, "
    "sensitivity 1): per (nation, segment) customer counts + inverse-CDF "
    "Laplace noise drawn from the content-addressed md5 uniform — "
    f"deterministic cross-engine; noisy counts < {DP_RELEASE_MIN} suppressed",
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Dwork et al.'s Laplace
    mechanism): per (nation, market segment) customer counts plus
    Laplace(b = Δf/ε) noise, b = :data:`DP_LAPLACE_SCALE` for ε = 0.5 at
    sensitivity 1. The noise draw is the engine's content-addressed
    hash-sampling discipline, not random(): u = md5(group key) mapped to
    [0, 1) via 12 hex chars / 2^48, pushed through the Laplace inverse CDF
    −b·sign(u−½)·ln(1−2|u−½|) — every engine, run and cluster layout adds
    the identical noise, so the release is reproducible AND the DuckDB
    oracle can verify it bit-for-bit. (A production release would swap the
    group key for a keyed secret-salted hash; the mechanism and plan shape
    are identical.) Groups whose noisy count falls below
    :data:`DP_RELEASE_MIN` are flagged suppressed — the thresholding step
    every DP release pipeline applies to avoid leaking tiny cohorts.

    Float discipline: the ln argument is an exact dyadic rational
    (|2h − 2^48|/2^48), the single libm ln is rounded to 6 decimals per
    row, and the final add re-rounds — the χ²/JSD per-term discipline.

    Scale shape: ONE hash aggregate on the (nation, segment) key with
    map-side partials, then a row-local noise map over the ≤125-row group
    frame. No join, no window.

    Reference analog: none (extension surface — governance family, the
    release half of `privacy_k_anonymity`'s audit).
    """
    c = table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n")
    )
    u01 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("c_nationkey").cast("string"),
                        F.col("c_mktsegment"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(281474976710656.0)
    )
    noise = F.round(
        F.lit(-DP_LAPLACE_SCALE)
        * F.signum(u01 - 0.5)
        * F.log(F.lit(1.0) - 2.0 * F.abs(u01 - 0.5)),
        6,
    )
    noised = g.select("c_nationkey", "c_mktsegment", "n", noise.alias("noise"))
    return noised.select(
        "c_nationkey",
        "c_mktsegment",
        (F.round(F.col("n") + F.col("noise"), 6) + F.lit(0.0)).alias(
            "noisy_count"
        ),
        ((F.col("n") + F.col("noise")) >= DP_RELEASE_MIN).alias("released"),
    )


#: t-closeness threshold in micro-units of total variation distance
#: (Li et al. 2007 suggest t ≈ 0.15–0.2 for categorical attributes; the
#: audit reports the exact distance, the flag applies this floor)
T_CLOSE_MICRO = 200_000


@register(
    "privacy_t_closeness",
    f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
), grp AS (
  SELECT c_nationkey, bal_band, CAST(count(*) AS BIGINT) AS k
  FROM qi GROUP BY 1, 2
), gs AS (
  SELECT c_nationkey, bal_band, c_mktsegment, CAST(count(*) AS BIGINT) AS n_gs
  FROM qi GROUP BY 1, 2, 3
), seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_s FROM customer GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM customer
), dense AS (
  SELECT g.c_nationkey, g.bal_band, g.k, s.c_mktsegment, s.n_s,
         coalesce(x.n_gs, 0) AS n_gs
  FROM grp g CROSS JOIN seg s
  LEFT JOIN gs x ON x.c_nationkey = g.c_nationkey
                AND x.bal_band = g.bal_band
                AND x.c_mktsegment = s.c_mktsegment
), dist AS (
  SELECT c_nationkey, bal_band, any_value(k) AS k,
         CAST(sum(abs(CAST(n_gs AS HUGEINT) * t.n
                      - CAST(n_s AS HUGEINT) * k)) AS HUGEINT) AS num,
         any_value(t.n) AS n
  FROM dense CROSS JOIN tot t
  GROUP BY 1, 2
)
SELECT c_nationkey, bal_band, k,
       CAST(num * 1000000 // (2 * CAST(k AS HUGEINT) * n) AS BIGINT)
         AS tvd_micro,
       num * 1000000 // (2 * CAST(k AS HUGEINT) * n) <= {T_CLOSE_MICRO}
         AS t_close
FROM dist
""",
    doc=f"privacy audit, t-closeness (Li et al. 2007): per QI group, the "
    "total variation distance between the group's sensitive-attribute "
    "distribution and the global one, in exact integer micro-units; "
    f"flagged when TVD <= {T_CLOSE_MICRO / 1e6:g}",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third classic release-gate audit, completing the
    k-anonymity / l-diversity pair (`privacy_k_anonymity`): l-diversity
    is blind to SKEW — a group can hold 3 distinct segments at
    99/0.5/0.5% and still leak — so t-closeness bounds the DISTANCE
    between each quasi-identifier group's sensitive distribution and the
    corpus-wide one. For an unordered categorical attribute the standard
    distance is total variation, TVD = ½·Σ_s |p_g(s) − p(s)|, computed
    here entirely in integers: |n_gs·N − n_s·k| summed over the DENSE
    group×segment grid (absent segments contribute n_s·k — omitting them
    would understate the distance), then ONE floor division to
    micro-units per group. Same numeric discipline as the EMD drift
    family (events_emd_drift), whose HUGEINT-operand floor-division
    lesson (r7 EMD defect) this inherits.

    Scale shape: two stacked hash aggregates off one scan (QI-group k,
    QI×segment counts), a ≤|segments|-row broadcast for the global
    distribution, a bounded 5× dense fan-out of the GROUP table (not the
    data), and a group-keyed final aggregate. No window, no global sort;
    at 100 TB this is two shuffles of group-sized partials.

    Reference analog: none (extension surface — governance family).
    """
    c = table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    grp = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count("*").cast("bigint").alias("k")
    )
    gs = qi.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_gs")
    )
    seg = c.groupBy("c_mktsegment").agg(F.count("*").cast("bigint").alias("n_s"))
    tot = c.agg(F.count("*").cast("bigint").alias("n"))
    dense = (
        grp.crossJoin(F.broadcast(seg))
        .join(gs, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .withColumn("n_gs", F.coalesce("n_gs", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(tot))
    )
    dec = "decimal(38,0)"
    dist = dense.groupBy("c_nationkey", "bal_band").agg(
        F.any_value("k").alias("k"),
        F.sum(
            F.abs(
                F.col("n_gs").cast(dec) * F.col("n")
                - F.col("n_s").cast(dec) * F.col("k")
            )
        ).alias("num"),
        F.any_value("n").alias("n"),
    )
    tvd = F.expr(
        "CAST(num * 1000000 div (2 * CAST(k AS decimal(38,0)) * n) AS BIGINT)"
    )
    return dist.select(
        "c_nationkey",
        "bal_band",
        "k",
        tvd.alias("tvd_micro"),
        (tvd <= T_CLOSE_MICRO).alias("t_close"),
    )


@register(
    "quality_reconciliation",
    """
WITH line_cents AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) * 100 + 0.5
         ) AS BIGINT)) AS BIGINT) AS gross_cents
  FROM lineitem GROUP BY l_orderkey
), o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS header_cents
  FROM orders
), joined AS (
  SELECT o.o_orderkey, o.header_cents, l.l_orderkey AS lk,
         l.n_lines, l.gross_cents
  FROM o FULL OUTER JOIN line_cents l ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(n_lines), 0) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND lk IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_orders,
       CAST(sum(CASE WHEN lk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orders_without_lines,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_line_orders,
       CAST(sum(CASE WHEN header_cents = gross_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_amount_match,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NOT NULL AND lk IS NOT NULL
                     THEN abs(header_cents - gross_cents) END), 0) AS BIGINT)
         AS drift_cents_total
FROM joined
""",
    doc="two-table reconciliation audit: full-outer orders vs lineitem "
    "rollup — childless headers, orphan lines, exact-cents amount matches "
    "and total absolute drift, all exact integers in one pass",
)
def quality_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The month-end reconciliation every finance/data-engineering team
    runs between a header table and its detail rollup: join orders to the
    per-order lineitem gross (price × (1−discount) × (1+tax), half-up
    cents per LINE so the sum is an exact BIGINT) FULL OUTER, then count
    the four populations an auditor asks for — matched orders, headers
    with no lines, orphaned details, exact amount agreement — plus the
    total absolute drift in cents. Per-line quantization is the
    documented spec (quantize-then-sum), so both engines sum identical
    integers; the float product inside the quantize follows one
    parenthesized evaluation order.

    Scale shape: one lineitem hash aggregate on its natural key, one
    equi-join to orders on the same key (co-located for free under the
    bucketed layout `layout_bucketed_orderkey_join` demonstrates), one
    global single-row rollup. The full-outer join is the honest shape —
    semi/anti pairs would need two probes of the same build side.

    Reference analog: the reference audits restored DBs against manifest
    expectations (cloud backup lists vs restore results); this is that
    control generalized to header/detail ledger parity.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    line_cents = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(
            F.floor(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * (1 + F.col("l_tax"))
                * 100
                + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("gross_cents"),
    )
    oo = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("header_cents"),
    )
    j = oo.join(
        line_cents, oo.o_orderkey == line_cents.l_orderkey, "full_outer"
    )
    matched = F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull()
    return j.agg(
        F.count("o_orderkey").cast("bigint").alias("n_orders"),
        F.coalesce(F.sum("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
        F.sum(F.when(matched, 1).otherwise(0)).cast("bigint").alias("n_matched_orders"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orders_without_lines"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphan_line_orders"),
        F.sum(
            F.when(F.col("header_cents") == F.col("gross_cents"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_amount_match"),
        F.coalesce(
            F.sum(
                F.when(
                    matched, F.abs(F.col("header_cents") - F.col("gross_cents"))
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("drift_cents_total"),
    )
