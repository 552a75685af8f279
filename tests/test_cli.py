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


def test_ini_defaults_cli_wins(tmp_path, spark):
    """Reference precedence (cli/main.py:867-883): INI sections become
    DEFAULTS; an explicit CLI arg beats the file."""
    ini = tmp_path / "ufload.ini"
    ini.write_text(
        "[postgres]\ndb_prefix = inifix\n"
        f"[ls]\nsf_dir = {SF_DIR}\ninstances = OCG_INST1,OCG_INST2\n"
    )
    merged = cli.read_ini_defaults(str(ini), "ls")
    assert merged["db_prefix"] == "inifix"  # global section applies
    cfg = cli.make_config(merged)
    assert cfg.sf_dir == SF_DIR and cfg.instances == ["OCG_INST1", "OCG_INST2"]
    # CLI wins over the file
    cfg2 = cli.make_config(merged, sf_dir="/from/cli", instances=["X"])
    assert cfg2.sf_dir == "/from/cli" and cfg2.instances == ["X"]
    # unknown INI keys are dropped, not an error
    cfg3 = cli.make_config({"no_such_key": "v", "sf_dir": SF_DIR})
    assert cfg3.sf_dir == SF_DIR
    # end-to-end through main(): file default steers the command
    # (patterns are substrings, reference cloud.py:150-159 — so OCG_INST1
    # also matches OCG_INST1x)
    df = cli.main(["-config", str(ini), "ls"], spark)
    got = {r["instance"] for r in df.collect()}
    assert got and all("OCG_INST1" in i or "OCG_INST2" in i for i in got)
    assert "OCG_INST5" not in got


def test_restore_dry_run_writes_nothing(spark, tmp_path):
    """-n (reference cli/main.py:796): show the plan, touch nothing."""
    target = str(tmp_path / "published")
    plan = cli.restore(
        spark, cli.Config(sf_dir=SF_DIR, dry_run=True), target
    ).collect()
    assert len(plan) > 0
    assert all(r["planned_action"] == "stage+publish" for r in plan)
    assert all(r["target"] == target for r in plan)
    import os

    assert not os.path.exists(target)
