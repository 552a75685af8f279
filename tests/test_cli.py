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


def test_restore_runs_composed_chain(spark, tmp_path):
    """cli.restore now drives the full SURVEY §3.1 chain: probe-on-failure
    candidates, audit-gated publish, de-live audit columns, stale counts."""
    target = str(tmp_path / "published")
    cfg = cli.Config(sf_dir=SF_DIR, instances=["OCG_INST0"], hidegroups=True)
    report = cli.restore(spark, cfg, target).collect()
    assert len(report) == 1
    row = report[0]
    assert row["instance"] == "OCG_INST0"
    assert row["n_attempts"] >= 1
    assert "stale_dropped" in row.asDict()
    # the de-live audit columns rode along (default step set: no
    # create_users — no -createusers flag — but password stomp on)
    assert row["active_users"] == 3
    assert "created_users" not in row.asDict()
    assert row["visible_membership_rows"] >= 0


@pytest.mark.slow  # ~20 s: runs the composed restore chain twice per flag
def test_restore_flag_effects_on_composed_plan(spark, tmp_path):
    """Each reference knob changes the composed output (VERDICT r7 #5):
    -live drops every audit column, -no-clean drops the stale pass,
    -nopwreset drops the stomp, -pwlist changes the keep list's effect,
    -banner rewrites the banner probe, -createusers enables the insert."""
    target = str(tmp_path / "t")
    base = dict(sf_dir=SF_DIR, instances=["OCG_INST0"])
    cols = lambda cfg: set(  # noqa: E731
        cli.restore(spark, cfg, target).columns
    )
    live = cols(cli.Config(**base, live=True))
    assert "active_users" not in live and "stale_dropped" in live
    noclean = cols(cli.Config(**base, noclean=True))
    assert "stale_dropped" not in noclean and "active_users" in noclean
    nopw = cols(cli.Config(**base, nopwreset=True))
    assert "active_users" not in nopw
    withusers = cols(cli.Config(**base, createusers="u1:BUILDING"))
    assert "created_users" in withusers
    hidegroups = cols(cli.Config(**base, hidegroups=True))
    assert {"visible_membership_rows", "hidden_groups"} <= hidegroups
    assert "visible_membership_rows" not in cols(cli.Config(**base))
    # content knobs: a one-login pwlist shrinks the active allow-list
    # (admin + 1 instead of admin + 2); a custom banner still audits green
    row = cli.restore(
        spark,
        cli.Config(**base, pwlist="customer#000000002:npw", banner="QA COPY "),
        target,
    ).collect()[0]
    assert row["active_users"] == 2
    assert row["banner_rows"] > 0


def test_restore_file_and_dir_entry_points(spark, tmp_path):
    """-file / -dir restore local archives through the same audited sink
    (reference cli/main.py:140-208): good archives publish, corrupt ones
    are reported failed without aborting the batch."""
    import zipfile

    zdir = tmp_path / "zips"
    zdir.mkdir()
    good = zdir / "OCG_INST9-20250101-120000-A-UF2.1-2p3.zip"
    with zipfile.ZipFile(good, "w") as z:
        z.writestr("inst.dump", "DUMP")
    bad = zdir / "OCG_INST9-20250102-120000-A-UF2.1-2p3.zip"
    bad.write_bytes(b"NOT A ZIP")
    target = str(tmp_path / "out")
    one = cli.restore(
        spark, cli.Config(sf_dir=SF_DIR, file=str(good)), target
    ).collect()
    assert len(one) == 1 and one[0]["ok"] and one[0]["dump_rows"] == 1
    assert one[0]["db_name"] == "pfx_OCG_INST9_20250101_1200"
    both = {
        r["name"]: r
        for r in cli.restore(
            spark, cli.Config(sf_dir=SF_DIR, dir=str(zdir)), target
        ).collect()
    }
    assert len(both) == 2
    assert both[good.name]["ok"] and not both[bad.name]["ok"]
    # dry-run plans, writes nothing
    plan = cli.restore(
        spark, cli.Config(sf_dir=SF_DIR, dir=str(zdir), dry_run=True), target
    ).collect()
    assert {r["planned_action"] for r in plan} == {"extract+stage+publish"}


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
    assert all(
        r["planned_action"] == "probe:extract+stage+publish" for r in plan
    )
    # the plan is the probe list: top-3 ranked candidates per instance
    assert {r["rn"] for r in plan} <= {1, 2, 3}
    assert all(r["target"] == target for r in plan)
    import os

    assert not os.path.exists(target)
