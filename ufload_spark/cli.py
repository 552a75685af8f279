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
  (cli/main.py:522-766); the post-install polling state machine (auth
  ladder, restart poll, module-update poll, main.py:599-699) lives in
  :mod:`ufload_spark.upgrade` over injectable probes
- :func:`clean`    — drop every non-newest DB per instance (cli/main.py:511-520,
  db.py:636-677)

Config precedence mirrors the reference (INI defaults, CLI wins —
cli/main.py:867-883): :func:`read_ini_defaults` reads the ``$HOME/.ufload``-
style config file's global + per-command sections, and :func:`make_config`
merges them under explicit keyword arguments. ``-n`` dry-run
(cli/main.py:796, db.py:13-14) makes :func:`restore` return the planned
actions without writing anything.
"""

from __future__ import annotations

import argparse
import configparser
import os
from collections.abc import Sequence
from dataclasses import dataclass, field, fields

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
    dry_run: bool = False  # -n: no real work, only show what would happen


#: the reference merges these global sections plus the command's own section
#: (cli/main.py:867-881)
_GLOBAL_SECTIONS = ("onedrive", "postgres", "logs", "sync")


def read_ini_defaults(path: str, command: str | None = None) -> dict:
    """Read an INI config file the way the reference reads ``$HOME/.ufload``
    (cli/main.py:867-883): global sections apply everywhere, the section
    named after the subcommand layers on top; values become argparse-style
    DEFAULTS, so explicit CLI args still win. Unknown keys are kept (and
    filtered against Config's fields at merge time); list-valued settings
    are comma-separated strings in the file."""
    cp = configparser.ConfigParser()
    cp.read(path)
    merged: dict = {}
    for section in (*_GLOBAL_SECTIONS, *((command,) if command else ())):
        if cp.has_section(section):
            merged.update(dict(cp.items(section)))
    return merged


_LIST_FIELDS = ("instances", "exclude")
_BOOL_FIELDS = ("dry_run",)


def make_config(defaults: dict | None = None, **overrides) -> Config:
    """INI-defaults-then-CLI-wins merge (reference cli/main.py:867-883).
    Keys Config doesn't know are dropped (the reference's set_defaults would
    carry them as inert Namespace attributes); INI string values are coerced
    to the field's shape (comma-split lists, boolean-ish strings)."""
    known = {f.name for f in fields(Config)}
    merged = {k: v for k, v in (defaults or {}).items() if k in known}
    merged.update({k: v for k, v in overrides.items() if v is not None})
    for k in _LIST_FIELDS:
        if isinstance(merged.get(k), str):
            merged[k] = [p.strip() for p in merged[k].split(",") if p.strip()]
    for k in _BOOL_FIELDS:
        if isinstance(merged.get(k), str):
            merged[k] = merged[k].strip().lower() in ("1", "true", "yes", "on")
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
    itself is the payload being published.

    With ``cfg.dry_run`` (the reference's ``-n``, cli/main.py:796 /
    db.py:13-14) nothing is written: the planned actions come back as a
    DataFrame (instance, name, the target it WOULD publish to)."""
    from ufload_spark.sources.loader import stage_and_publish

    candidates = _apply_patterns(
        latest_backup_per_instance(spark, cfg.sf_dir), cfg
    )
    if cfg.dry_run:
        return candidates.select(
            "instance",
            "name",
            F.lit("stage+publish").alias("planned_action"),
            F.lit(target_dir).alias("target"),
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


def default_config_path() -> str:
    """The reference reads ``$HOME/.ufload`` (``ufload.txt`` on win32,
    cli/main.py:868-872)."""
    return os.path.join(os.path.expanduser("~"), ".ufload")


def build_parser() -> argparse.ArgumentParser:
    """The reference's argparse tree, reduced to the engine's needs.
    ``-n`` and ``-config`` are top-level, like the reference's."""
    p = argparse.ArgumentParser(prog="ufload-spark")
    p.add_argument("-n", dest="dry_run", action="store_true", default=None)
    p.add_argument("-config", dest="config", default=None)
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
    """Parse argv, merge INI defaults under CLI args, dispatch, return the
    command's report DataFrame."""
    ns = build_parser().parse_args(list(argv))
    ini = read_ini_defaults(ns.config or default_config_path(), ns.command)
    cfg = make_config(
        ini,
        sf_dir=ns.sf_dir,
        instances=ns.instances,
        exclude=ns.exclude,
        dry_run=ns.dry_run,
    )
    if ns.command == "restore":
        return restore(spark, cfg, ns.target)
    return COMMANDS[ns.command](spark, cfg)
