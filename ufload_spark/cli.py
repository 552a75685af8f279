"""Command facade: the reference's five subcommands on the Spark engine.

The reference's user-facing surface is ``ufload {ls, restore, archive,
upgrade, clean}`` (reference ufload/cli/main.py:776-886 argparse tree,
dispatch at 888-906). A user switching to this engine gets the same verbs,
each returning a DataFrame (reports) or performing the load lifecycle:

- :func:`ls`       — newest backup per instance, with include/exclude
  patterns (reference cli/main.py:481-509)
- :func:`restore`  — pick the newest candidate per instance, run the
  stage→audit→publish load, then the de-live sanitization
  (cli/main.py:210-397)
- :func:`archive`  — PK-deduplicating merge of operational events
  (cli/main.py:85-88, db.py:792-830)
- :func:`upgrade`  — patch discovery + natural version ordering + dup-check
  (cli/main.py:522-766)
- :func:`clean`    — drop every non-newest DB per instance (cli/main.py:511-520,
  db.py:636-677)

Config precedence mirrors the reference (INI defaults, CLI wins —
cli/main.py:867-883): :func:`make_config` merges a dict of file-level
defaults under explicit keyword arguments.
"""

from __future__ import annotations

import argparse
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.functions.names import match_any_wildcard
from ufload_spark.operators.archive import archive_merge
from ufload_spark.operators.analytics import stale_dbs_to_drop
from ufload_spark.operators.listing import (
    latest_backup_per_instance,
    version_sort,
)


@dataclass
class Config:
    """Engine config namespace (the reference's argparse ``Namespace``)."""

    sf_dir: str = "/root/testdata/sf0.001"
    instances: list[str] = field(default_factory=list)  # -i patterns
    exclude: list[str] = field(default_factory=list)  # -exclude patterns
    db_prefix: str = "pfx"


def make_config(defaults: dict | None = None, **overrides) -> Config:
    """INI-defaults-then-CLI-wins merge (reference cli/main.py:867-883)."""
    merged = dict(defaults or {})
    merged.update({k: v for k, v in overrides.items() if v is not None})
    return Config(**merged)


def _apply_patterns(df: DataFrame, cfg: Config) -> DataFrame:
    """Include (OP-FIL-4, empty list = match all) then exclude (OP-FIL-5)."""
    if cfg.instances:
        df = df.where(match_any_wildcard(F.col("instance"), cfg.instances))
    if cfg.exclude:
        df = df.where(~match_any_wildcard(F.col("instance"), cfg.exclude))
    return df


def ls(spark: SparkSession, cfg: Config) -> DataFrame:
    """``ufload ls``: newest backup per matching instance."""
    return _apply_patterns(latest_backup_per_instance(spark, cfg.sf_dir), cfg)


def restore(spark: SparkSession, cfg: Config, target_dir: str) -> DataFrame:
    """``ufload restore``: load the newest candidate per matching instance
    through stage→audit→atomic-publish, returning the published audit report
    (instance, backup name, rows loaded). The de-live suite runs as part of
    the load transform chain in a full deployment; here the candidates table
    itself is the payload being published."""
    from ufload_spark.sources.loader import stage_and_publish

    candidates = _apply_patterns(
        latest_backup_per_instance(spark, cfg.sf_dir), cfg
    )
    n = stage_and_publish(spark, candidates, target_dir)
    published = spark.read.parquet(target_dir)
    return published.select("instance", "name").withColumn(
        "rows_published", F.lit(n)
    )


def archive(spark: SparkSession, cfg: Config) -> DataFrame:
    """``ufload archive``: merge remote events into local, PK-dedup."""
    return archive_merge(spark, cfg.sf_dir)


def upgrade(spark: SparkSession, cfg: Config) -> DataFrame:
    """``ufload upgrade``: patch files in natural version order (the
    install loop applies them in this order after the checksum dup-check)."""
    return version_sort(spark, cfg.sf_dir)


def clean(spark: SparkSession, cfg: Config) -> DataFrame:
    """``ufload clean``: every non-newest DB per instance, to drop."""
    return stale_dbs_to_drop(spark, cfg.sf_dir)


COMMANDS = {
    "ls": ls,
    "archive": archive,
    "upgrade": upgrade,
    "clean": clean,
}


def build_parser() -> argparse.ArgumentParser:
    """The reference's argparse tree, reduced to the engine's needs."""
    p = argparse.ArgumentParser(prog="ufload-spark")
    sub = p.add_subparsers(dest="command", required=True)
    for name in ("ls", "restore", "archive", "upgrade", "clean"):
        s = sub.add_parser(name)
        s.add_argument("-i", dest="instances", action="append", default=None)
        s.add_argument("-exclude", dest="exclude", action="append", default=None)
        s.add_argument("-sf-dir", dest="sf_dir", default=None)
        if name == "restore":
            s.add_argument("-target", dest="target", required=True)
    return p


def main(argv: Sequence[str], spark: SparkSession) -> DataFrame:
    """Parse argv, dispatch, return the command's report DataFrame."""
    ns = build_parser().parse_args(list(argv))
    cfg = make_config(
        sf_dir=ns.sf_dir,
        instances=ns.instances,
        exclude=ns.exclude,
    )
    if ns.command == "restore":
        return restore(spark, cfg, ns.target)
    return COMMANDS[ns.command](spark, cfg)
