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


class ParseTsv:
    """Polymorphic UDTF: parse a tab-separated line into TYPED columns whose
    schema comes from a constant DDL string at PLAN time (``analyze``) — the
    record-parsing shape of the reference's fixup specs (OP-FN-9,
    delive create-users record parsing, reference delive.sql analog) as a
    dynamic-schema table function. The engine calls ``analyze`` once during
    resolution with the foldable spec argument; each ``eval`` converts the
    split fields to the declared types, with unparseable cells becoming
    NULL (try_cast semantics, OP-FN-10)."""

    #: self-contained spec parser — the analyze/eval workers have no
    #: SparkContext, so StructType.fromDDL (which round-trips through the
    #: JVM parser) is unavailable there
    @staticmethod
    def _parse_spec(spec: str):
        from pyspark.sql.types import DoubleType, LongType, StringType

        types = {
            "long": LongType(),
            "bigint": LongType(),
            "string": StringType(),
            "double": DoubleType(),
        }
        out = []
        for part in spec.split(","):
            name, typ = part.strip().rsplit(" ", 1)
            out.append((name.strip(), types[typ.strip().lower()]))
        return out

    @staticmethod
    def analyze(line, spec):
        from pyspark.sql.types import StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        fields = ParseTsv._parse_spec(spec.value)
        return AnalyzeResult(
            schema=StructType([StructField(n, t) for n, t in fields])
        )

    def eval(self, line: str, spec: str):
        from pyspark.sql.types import DoubleType, LongType

        if not hasattr(self, "_fields"):
            self._fields = self._parse_spec(spec)
        parts = (line or "").split("\t")
        row = []
        for i, (_, typ) in enumerate(self._fields):
            raw = parts[i] if i < len(parts) else None
            if raw is None:
                row.append(None)
            elif isinstance(typ, (LongType, DoubleType)):
                try:
                    row.append(
                        int(raw) if isinstance(typ, LongType) else float(raw)
                    )
                except ValueError:
                    row.append(None)
            else:
                row.append(raw)
        yield tuple(row)


@register(
    "udtf_log_parse",
    """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents GROUP BY lang
""",
    doc="polymorphic Python UDTF (analyze-time schema from a DDL literal) "
    "typing the custom source's log lines in a LATERAL join",
)
def udtf_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the two Spark-4 Python extension APIs: the custom data
    source scans the log backlog (one Arrow hop), and the polymorphic
    :class:`ParseTsv` UDTF types each line against a DDL spec resolved at
    plan time — so the downstream aggregate is over real typed columns,
    not string slices. The oracle recomputes from ``documents``, proving
    source + dynamic-schema parse round-tripped every value."""
    from ufload_spark.sources.pysource import ensure_fixture_logs, register_source

    register_source(spark)
    logs = ensure_fixture_logs(sf_dir)
    spark.udtf.register("ufload_parse_tsv", F.udtf(ParseTsv))
    lines = spark.read.format("ufload_logs").option("path", logs).load()
    view = f"ufload_lines_{__import__('os').getpid()}"
    lines.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT p.lang, count(*) AS n_docs,
               sum(p.n_chars) AS total_chars,
               min(p.doc_id) AS min_doc_id
        FROM {view},
             LATERAL ufload_parse_tsv(
               line, 'doc_id long, lang string, n_chars long') AS p
        GROUP BY p.lang
        """
    )


class UserPath:
    """Stateful per-partition UDTF: consume ONE user's events in event-time
    order and emit a single summary row at partition end — the sequential
    per-entity walk (reference analog: the per-instance polling loops,
    cli/main.py:640-663) expressed through Spark 4's PARTITION BY table
    argument, which guarantees each UDTF instance sees exactly one
    partition's rows in the requested order."""

    def __init__(self) -> None:
        self.uid = None
        self.n = 0
        self.path: list[str] = []
        self.prev = None
        self.switches = 0

    def eval(self, row) -> None:
        self.uid = row["user_id"]
        self.n += 1
        et = row["event_type"]
        if len(self.path) < 5:
            self.path.append(et)
        if self.prev is not None and et != self.prev:
            self.switches += 1
        self.prev = et

    def terminate(self):
        if self.uid is not None:
            yield self.uid, self.n, ">".join(self.path), self.switches


@register(
    "udtf_user_paths",
    """
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER w AS rn,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*) AS n_events,
       string_agg(CASE WHEN rn <= 5 THEN event_type END, '>' ORDER BY rn)
         AS path,
       CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> event_type
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
FROM ordered GROUP BY user_id
""",
    doc="Python UDTF over a PARTITION BY table argument: per-user "
    "sequential walk (first-5 path + state-switch count) emitted at "
    "partition end — the stateful per-entity escape hatch",
)
def udtf_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third UDTF surface tier: a TABLE argument with PARTITION BY /
    ORDER BY. The engine shuffles events once on user_id, feeds each
    user's rows to a fresh :class:`UserPath` instance in (ts, event_id)
    order, and the instance emits its summary in ``terminate`` — real
    sequential state (path prefix, previous type, switch counter) that
    plain aggregates would need collect_list gymnastics for, while the
    partitioning/ordering contract stays with the engine. The oracle
    reconstructs the same walk with windows, pinning that the UDTF's
    per-partition stream really arrives complete and ordered.

    Scale: one exchange on the partition key; per-instance state is O(1).
    """
    import os as _os

    udtf_fn = F.udtf(
        UserPath,
        returnType="user_id long, n_events long, path string, n_switches long",
    )
    spark.udtf.register("ufload_user_path", udtf_fn)
    ev = table(spark, sf_dir, "events")
    view = f"ufload_events_{_os.getpid()}"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT p.user_id, p.n_events, p.path, p.n_switches
        FROM ufload_user_path(
          TABLE({view}) PARTITION BY user_id ORDER BY (ts, event_id)
        ) AS p
        """
    )
