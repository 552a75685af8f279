"""Python UDTF surface (§2.10 extension): lateral table functions.

The reference's upgrade walk expands each instance's (current, target)
version pair into the ordered chain of intermediate patch steps it must
apply (reference cli/main.py:640-663: the per-instance loop calls
``upgrade_app`` once per pending patch). Row-to-many-rows with per-row
logic is exactly what Spark 4's Python UDTF API models: the function sits
in a LATERAL join, the engine plans it like any other table source, and
each input row's expansion happens executor-side.

Slow-path discipline (same rule as every Python surface here): a UDTF is
the ESCAPE HATCH for row-expanding logic Spark can't express natively —
this one is deliberately small (a bounded per-instance chain, like the
reference's patch list), and the surrounding query stays JVM-side. For a
pure integer range the built-in ``sequence``+``explode`` is the fast path;
the UDTF form exists because real chain logic (version-string formatting,
skip rules, per-step metadata) lives in Python where the reference keeps
it, and the oracle pins that both forms agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table


class UpgradeSteps:
    """Expand (cur, tgt) into one row per pending patch step.

    Mirrors the reference's per-instance upgrade loop: from the version
    AFTER the current one through the target, in order, with the patch
    name the reference would fetch (``ufp<step>.patch.zip``,
    cli/main.py:554 naming).
    """

    def eval(self, cur: int, tgt: int):
        for step in range(cur + 1, tgt + 1):
            yield step, f"ufp{step}.patch.zip"


@register(
    "udtf_upgrade_chain",
    """
WITH inst AS (
  SELECT n_name AS instance,
         CAST(n_nationkey % 4 AS INT) AS cur,
         CAST(4 + n_nationkey % 3 AS INT) AS tgt
  FROM nation
)
SELECT instance, cur, tgt,
       CAST(unnest(range(cur + 1, tgt + 1)) AS INT) AS step_no,
       'ufp' || CAST(unnest(range(cur + 1, tgt + 1)) AS VARCHAR)
           || '.patch.zip' AS patch
FROM inst
""",
    doc="Python UDTF in a LATERAL join: per-instance upgrade chain "
    "expansion (row → ordered patch steps)",
)
def udtf_upgrade_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each instance (one per nation, version fields derived from the key)
    lateral-joins the :class:`UpgradeSteps` UDTF, yielding the ordered
    patch chain the reference's upgrade loop would apply. The UDTF runs
    executor-side per input row; planning, the join, and everything around
    it stay JVM-side. Registration is per-session (the driver imports us
    into a plain session), with a query-unique view name so concurrent
    invocations never collide."""
    import os as _os

    udtf_fn = F.udtf(UpgradeSteps, returnType="step_no int, patch string")
    spark.udtf.register("ufload_upgrade_steps", udtf_fn)
    inst = table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("instance"),
        (F.col("n_nationkey") % 4).cast("int").alias("cur"),
        (F.lit(4) + F.col("n_nationkey") % 3).cast("int").alias("tgt"),
    )
    view = f"ufload_inst_{_os.getpid()}"
    inst.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT instance, cur, tgt, s.step_no, s.patch
        FROM {view}, LATERAL ufload_upgrade_steps(cur, tgt) AS s
        """
    )
