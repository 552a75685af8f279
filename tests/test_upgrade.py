"""Upgrade polling state machine: ladder counts, cadences, short-circuits
and timeouts — all with injected sleep, no server, no real clock."""

from __future__ import annotations

import pytest

from ufload_spark.upgrade import (
    AUTH_MAX_RETRIES,
    MODULE_UPDATE_POLL,
    RESTART_POLL,
    AuthFailed,
    ModulesUpdating,
    ModuleUpdateTimeout,
    PollPolicy,
    RestartTimeout,
    RevisionsAvailable,
    ServerUnreachable,
    VersionMismatch,
    await_module_update,
    await_restart,
    run_upgrade,
    sync_with_retry,
)


class FakeSleep:
    def __init__(self):
        self.calls: list[float] = []

    def __call__(self, s: float) -> None:
        self.calls.append(s)


def test_policies_match_reference_budgets():
    """main.py:641-643 (1 s × 300) and :668-670 (5 s × 360)."""
    assert RESTART_POLL.max_attempts == 300
    assert MODULE_UPDATE_POLL.max_attempts == 360
    assert AUTH_MAX_RETRIES == 10


def test_auth_ladder_retries_then_succeeds():
    sleep = FakeSleep()
    fails = {"n": 3}

    def sync_once():
        if fails["n"] > 0:
            fails["n"] -= 1
            raise AuthFailed("Authentification Failed")

    assert sync_with_retry(sync_once, sleep=sleep) == "synced"
    assert sleep.calls == [1.0, 1.0, 1.0]  # one 1 s sleep per retry


def test_auth_ladder_gives_up_after_ten():
    sleep = FakeSleep()

    def sync_once():
        raise AuthFailed("Authentification Failed")

    with pytest.raises(AuthFailed):
        sync_with_retry(sync_once, sleep=sleep)
    assert len(sleep.calls) == 10  # exactly the reference's ladder height


def test_revisions_available_short_circuits_without_sleeping():
    sleep = FakeSleep()

    def sync_once():
        raise RevisionsAvailable("There is/are 3 revision(s) available.")

    assert sync_with_retry(sync_once, sleep=sleep) == "updates_available"
    assert sleep.calls == []


def test_unknown_sync_error_propagates():
    with pytest.raises(RuntimeError, match="boom"):
        sync_with_retry(lambda: (_ for _ in ()).throw(RuntimeError("boom")),
                        sleep=FakeSleep())


def test_restart_poll_waits_until_first_response():
    sleep = FakeSleep()
    down = {"n": 5}

    def probe():
        if down["n"] > 0:
            down["n"] -= 1
            raise ServerUnreachable("refused")
        # an HTTP 500 page still proves the process is up — probe returns

    assert await_restart(probe, sleep=sleep) == 6
    assert sleep.calls == [1.0] * 6  # 1 s cadence, sleep-then-probe


def test_restart_poll_times_out_at_300():
    sleep = FakeSleep()

    def probe():
        raise ServerUnreachable("refused")

    with pytest.raises(RestartTimeout):
        await_restart(probe, sleep=sleep)
    assert len(sleep.calls) == 300  # the full 300 s budget at 1 s


def test_module_poll_5s_cadence_and_socket_errors_keep_waiting():
    sleep = FakeSleep()
    script = [ModulesUpdating("ServerUpdate: Server is updating modules ..."),
              ServerUnreachable("conn reset"),
              ModulesUpdating("ServerUpdate: Server is updating modules ..."),
              None]

    def probe():
        e = script.pop(0)
        if e is not None:
            raise e

    assert await_module_update(probe, sleep=sleep) == 4
    assert sleep.calls == [5.0] * 4


def test_module_poll_timeout():
    sleep = FakeSleep()
    tiny = PollPolicy(interval_s=5.0, max_time_s=25.0)

    def probe():
        raise ModulesUpdating("ServerUpdate: Server is updating modules ...")

    with pytest.raises(ModuleUpdateTimeout):
        await_module_update(probe, policy=tiny, sleep=sleep)
    assert len(sleep.calls) == 5


def test_run_upgrade_single_app_upgrade_then_break():
    """Second instance's sync reports revisions pending: the app upgrade
    fires once, the restart is awaited, and the walk stops — the
    reference's break at main.py:661."""
    sleep = FakeSleep()
    events: list[str] = []

    def connect(inst):
        events.append(f"connect:{inst}")

    def sync(inst):
        events.append(f"sync:{inst}")
        if inst == "b":
            raise RevisionsAvailable("revisions")

    def upgrade_app(inst):
        events.append(f"upgrade:{inst}")

    restart_down = {"n": 2}

    def restart_probe():
        if restart_down["n"] > 0:
            restart_down["n"] -= 1
            raise ServerUnreachable("starting")

    rep = run_upgrade(
        ["a", "b", "c"],
        connect=connect,
        sync=sync,
        upgrade_app=upgrade_app,
        restart_probe=restart_probe,
        rpc_probe=lambda inst: None,
        sleep=sleep,
    )
    assert events == ["connect:a", "sync:a", "connect:b", "sync:b", "upgrade:b"]
    assert rep.synced == ["a"] and rep.upgraded_via == "b"
    assert rep.restart_probes == 3  # 2 refusals + the first response


def test_run_upgrade_version_mismatch_triggers_upgrade():
    def connect(inst):
        raise VersionMismatch("OpenERP version doesn't match database version!")

    rep = run_upgrade(
        ["only"],
        connect=connect,
        sync=lambda inst: None,
        upgrade_app=lambda inst: None,
        restart_probe=lambda: None,
        rpc_probe=lambda inst: None,
        sleep=FakeSleep(),
    )
    assert rep.upgraded_via == "only" and rep.synced == []


def test_run_upgrade_migrate_db_polls_every_instance():
    sleep = FakeSleep()
    waits = {"a": 3, "b": 0}

    def rpc_probe(inst):
        if waits[inst] > 0:
            waits[inst] -= 1
            raise ModulesUpdating("ServerUpdate: Server is updating modules ...")

    rep = run_upgrade(
        ["a", "b"],
        connect=lambda inst: None,
        sync=lambda inst: None,
        upgrade_app=lambda inst: None,
        restart_probe=lambda: None,
        rpc_probe=rpc_probe,
        migrate_db=True,
        sleep=sleep,
    )
    assert rep.synced == ["a", "b"] and rep.upgraded_via is None
    assert rep.modules_updated == {"a": 4, "b": 1}
