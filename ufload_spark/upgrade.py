"""Upgrade orchestration: the reference's polling state machine, testable.

The reference's ``upgrade`` verb does more than patch discovery (which
:func:`ufload_spark.cli.upgrade` covers): after installing patches it walks
every instance through a sync-server handshake with three distinct polling
loops (reference ufload/cli/main.py:599-699):

1. **auth-retry ladder** — ``manual_sync`` may transiently fail auth while
   the server settles; retry up to 10 times at 1 s before giving up
   (main.py:611-627). A "revision(s) available" response is not an error:
   it means an app update is pending.
2. **restart poll** — after ``manual_upgrade`` the server restarts; probe
   its HTTP login endpoint every 1 s for at most 300 s until it answers
   (main.py:638-661). Any HTTP response — even an error status — means the
   server is up; only connection refusal means it is still starting.
   (The reference's flag handling inverts ``starting_up`` such that the
   loop can exit on the first refused connection and keep polling after a
   success; this module implements the evident intent — wait until the
   first response, fail at timeout — rather than porting the quirk.)
3. **module-update poll** — with ``migratedb``, each instance is probed
   every 5 s for at most 1800 s while its RPC endpoint reports
   "Server is updating modules ..." (or is not answering at all);
   exceeding the budget raises (main.py:665-699).

Everything external is injected (probes, sleep), so the ladder/poll/timeout
semantics — attempt counts, sleep cadence, short-circuits — are exact and
unit-tested without a server or a clock. The reference counts attempts, not
wall time (``max_incrementation = max_time/sleep_time``); so does this.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PollPolicy:
    """Attempt cadence: probe every ``interval_s``, at most
    ``max_time_s / interval_s`` attempts (the reference's
    ``max_incrementation``)."""

    interval_s: float
    max_time_s: float

    @property
    def max_attempts(self) -> int:
        return int(self.max_time_s / self.interval_s)


#: restart: 1 s × 300 (main.py:641-643); modules: 5 s × 360 (main.py:668-670)
RESTART_POLL = PollPolicy(interval_s=1.0, max_time_s=300.0)
MODULE_UPDATE_POLL = PollPolicy(interval_s=5.0, max_time_s=1800.0)
#: auth ladder: up to 10 retries at 1 s (main.py:621-624)
AUTH_MAX_RETRIES = 10
AUTH_RETRY_SLEEP_S = 1.0


class AuthFailed(RuntimeError):
    """The sync server rejected credentials (reference: RPCError ending in
    'Authentification Failed...'). Transient during settle; retried."""


class RevisionsAvailable(RuntimeError):
    """Sync refused because app revisions are pending (reference: RPCError
    matching 'Cannot check for updates: There is/are N revision(s)
    available.'). Not a failure — the signal that an upgrade is needed."""


class VersionMismatch(RuntimeError):
    """Connect refused: app version != database version (main.py:604-608).
    Also a pending-upgrade signal."""


class ModulesUpdating(RuntimeError):
    """Instance RPC answered 'ServerUpdate: Server is updating modules ...'
    (main.py:685) — keep waiting."""


class ServerUnreachable(OSError):
    """Connection refused / socket error — server down or still starting."""


class RestartTimeout(TimeoutError):
    """Server did not answer within the restart budget (main.py:659-660)."""


class ModuleUpdateTimeout(TimeoutError):
    """Instance still updating modules at budget exhaustion (main.py:697-698)."""


def sync_with_retry(
    sync_once: Callable[[], None],
    *,
    max_retries: int = AUTH_MAX_RETRIES,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Run one manual sync with the reference's auth-retry ladder.

    Returns ``"synced"`` on success or ``"updates_available"`` when the
    server reports pending revisions. :class:`AuthFailed` is retried
    ``max_retries`` times at 1 s (main.py:611-627) then re-raised; any
    other exception propagates immediately.
    """
    attempts = 0
    while True:
        try:
            sync_once()
            return "synced"
        except RevisionsAvailable:
            return "updates_available"
        except AuthFailed:
            if attempts >= max_retries:
                raise
            sleep(AUTH_RETRY_SLEEP_S)
            attempts += 1


def poll_until(
    probe: Callable[[], bool],
    policy: PollPolicy,
    *,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Sleep-then-probe until ``probe()`` is True; returns the attempt
    count (1-based). Raises :class:`TimeoutError` after
    ``policy.max_attempts`` false probes — callers wrap it in the loop's
    specific timeout type."""
    for attempt in range(1, policy.max_attempts + 1):
        sleep(policy.interval_s)
        if probe():
            return attempt
    raise TimeoutError(
        f"not ready after {policy.max_attempts} probes "
        f"({policy.max_time_s:.0f}s at {policy.interval_s:.0f}s)"
    )


def await_restart(
    http_probe: Callable[[], None],
    *,
    policy: PollPolicy = RESTART_POLL,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Wait for the upgraded server to answer HTTP again (main.py:638-661).

    ``http_probe`` models a GET of the login page: returning means the
    server responded (any status — an HTTP error page still proves the
    process is up, exactly like the reference's pass on HTTPError);
    raising :class:`ServerUnreachable` means connection refused. Returns
    the number of probes taken; raises :class:`RestartTimeout` after the
    300 s budget."""

    def up() -> bool:
        try:
            http_probe()
            return True
        except ServerUnreachable:
            return False

    try:
        return poll_until(up, policy, sleep=sleep)
    except TimeoutError as e:
        raise RestartTimeout(f"server did not restart: {e}") from e


def await_module_update(
    rpc_probe: Callable[[], None],
    *,
    policy: PollPolicy = MODULE_UPDATE_POLL,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Wait for an instance to finish updating its modules
    (main.py:665-699). ``rpc_probe`` models ``connect_rpc``: returning
    means ready; :class:`ModulesUpdating` or :class:`ServerUnreachable`
    mean keep waiting (the reference treats socket errors the same as the
    updating message); anything else propagates. Raises
    :class:`ModuleUpdateTimeout` after the 1800 s budget."""

    def ready() -> bool:
        try:
            rpc_probe()
            return True
        except (ModulesUpdating, ServerUnreachable):
            return False

    try:
        return poll_until(ready, policy, sleep=sleep)
    except TimeoutError as e:
        raise ModuleUpdateTimeout(f"modules still updating: {e}") from e


@dataclass
class UpgradeReport:
    """What happened, per instance — the testable trace of the state
    machine (the reference logs the same transitions via ``progress``)."""

    synced: list[str] = field(default_factory=list)
    upgraded_via: str | None = None  # instance whose sync triggered the app upgrade
    restart_probes: int = 0
    modules_updated: dict[str, int] = field(default_factory=dict)


def run_upgrade(
    instances: Sequence[str],
    *,
    connect: Callable[[str], None],
    sync: Callable[[str], None],
    upgrade_app: Callable[[str], None],
    restart_probe: Callable[[], None],
    rpc_probe: Callable[[str], None],
    migrate_db: bool = False,
    restart_policy: PollPolicy = RESTART_POLL,
    module_policy: PollPolicy = MODULE_UPDATE_POLL,
    sleep: Callable[[float], None] = time.sleep,
) -> UpgradeReport:
    """The reference's per-instance upgrade walk (main.py:597-699):

    for each instance — connect it to the sync server (a
    :class:`VersionMismatch` marks an update pending), run the
    auth-laddered sync; if either path reports updates available, trigger
    the app upgrade ONCE, await the restart, and stop walking (the
    reference ``break``s — one app upgrade serves every instance).
    Afterwards, with ``migrate_db``, poll every instance until its module
    update completes.
    """
    report = UpgradeReport()
    update_available = False
    for inst in instances:
        try:
            connect(inst)
        except VersionMismatch:
            update_available = True
        outcome = sync_with_retry(lambda: sync(inst), sleep=sleep)
        if outcome == "updates_available":
            update_available = True
        if update_available:
            upgrade_app(inst)
            report.upgraded_via = inst
            report.restart_probes = await_restart(
                restart_probe, policy=restart_policy, sleep=sleep
            )
            break
        report.synced.append(inst)
    if migrate_db and not update_available:
        for inst in instances:
            report.modules_updated[inst] = await_module_update(
                lambda: rpc_probe(inst), policy=module_policy, sleep=sleep
            )
    return report
