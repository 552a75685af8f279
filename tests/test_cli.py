"""The command facade: the reference's five verbs on the engine."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from ufload_spark import cli


def test_ls_lists_latest_per_instance(spark):
    out = cli.ls(spark, cli.Config(sf_dir=SF_DIR)).collect()
    assert len(out) > 0
    # one row per instance (latest only)
    instances = [r["instance"] for r in out]
    assert len(instances) == len(set(instances))


def test_ls_include_exclude(spark):
    all_rows = cli.ls(spark, cli.Config(sf_dir=SF_DIR)).collect()
    inst = all_rows[0]["instance"]
    only = cli.ls(spark, cli.Config(sf_dir=SF_DIR, instances=[inst])).collect()
    assert {r["instance"] for r in only} == {inst}
    without = cli.ls(spark, cli.Config(sf_dir=SF_DIR, exclude=[inst])).collect()
    assert inst not in {r["instance"] for r in without}


def test_restore_publishes(spark, tmp_path):
    target = str(tmp_path / "published")
    report = cli.restore(spark, cli.Config(sf_dir=SF_DIR), target).collect()
    assert len(report) > 0
    assert all(r["rows_published"] == len(report) for r in report)


def test_clean_and_upgrade_run(spark):
    assert cli.clean(spark, cli.Config(sf_dir=SF_DIR)).count() >= 0
    up = cli.upgrade(spark, cli.Config(sf_dir=SF_DIR))
    assert up.count() > 0


def test_main_dispatch(spark):
    df = cli.main(["ls", "-sf-dir", SF_DIR], spark)
    assert df.count() > 0


def test_config_merge_cli_wins():
    cfg = cli.make_config({"sf_dir": "/from/ini"}, sf_dir="/from/cli")
    assert cfg.sf_dir == "/from/cli"
    cfg2 = cli.make_config({"sf_dir": "/from/ini"}, sf_dir=None)
    assert cfg2.sf_dir == "/from/ini"


def test_unknown_command_rejected(spark):
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"], spark)
