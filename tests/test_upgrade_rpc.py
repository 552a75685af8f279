"""Live-wire tests for the XML-RPC upgrade transport (VERDICT r7 #7):
a real in-process SimpleXMLRPCServer speaks the OpenERP 6.0 protocol the
reference's oerplib uses; the client's fault mapping must land each wire
signal on the exact prober exception the polling state machine branches
on — and the state machine must run unchanged over the real transport."""

from __future__ import annotations

import threading
import xmlrpc.client
from socketserver import ThreadingMixIn
from xmlrpc.server import SimpleXMLRPCRequestHandler, SimpleXMLRPCServer

import pytest

from ufload_spark.upgrade import (
    AuthFailed,
    ModulesUpdating,
    RevisionsAvailable,
    ServerUnreachable,
    sync_with_retry,
)
from ufload_spark.upgrade_rpc import OerpClient


class _OerpPaths(SimpleXMLRPCRequestHandler):
    # serve the OpenERP endpoints the client addresses
    rpc_paths = ("/xmlrpc/common", "/xmlrpc/object", "/RPC2")


class _Server(ThreadingMixIn, SimpleXMLRPCServer):
    daemon_threads = True
    allow_reuse_address = True


class FakeOerp:
    """Scriptable OpenERP: /xmlrpc/common login + /xmlrpc/object execute
    multiplexed on one endpoint (SimpleXMLRPCServer serves one path; the
    client's two proxies both resolve here, which the protocol allows)."""

    def __init__(self):
        self.sync_calls = 0
        self.fail_auth_times = 0
        self.revisions_pending = False
        self.updating = False

    def login(self, db, user, pw):
        if self.fail_auth_times > 0:
            self.fail_auth_times -= 1
            raise xmlrpc.client.Fault(1, "AccessDenied: Authentification Failed...")
        if self.updating:
            raise xmlrpc.client.Fault(1, "ServerUpdate: Server is updating modules ...")
        return 7 if pw == "goodpw" else 0

    def execute(self, db, uid, pw, model, method, *args):
        if model == "sync.client.sync_manager":
            if method == "search":
                return [1]
            if method == "sync":
                if self.revisions_pending:
                    raise xmlrpc.client.Fault(
                        1,
                        "Cannot check for updates: There is/are 2 revision(s) available.",
                    )
                self.sync_calls += 1
                return True
        raise xmlrpc.client.Fault(2, f"no such method {model}.{method}")


@pytest.fixture()
def oerp():
    fake = FakeOerp()
    srv = _Server(
        ("127.0.0.1", 0),
        requestHandler=_OerpPaths,
        logRequests=False,
        allow_none=True,
    )
    srv.register_instance(fake)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield fake, srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


def test_login_and_manual_sync_over_the_wire(oerp):
    fake, port = oerp
    client = OerpClient("127.0.0.1", port, timeout=5)
    probes = client.probes("SOME_DB", "admin", "goodpw")
    assert sync_with_retry(probes.sync_once) == "synced"
    assert fake.sync_calls == 1


def test_auth_ladder_retries_real_wire_faults(oerp):
    """The reference's 10×1s auth ladder (main.py:611-627) over REAL
    faults: two transient auth failures, then success."""
    fake, port = oerp
    fake.fail_auth_times = 2
    client = OerpClient("127.0.0.1", port, timeout=5)
    probes = client.probes("SOME_DB", "admin", "goodpw")
    slept = []
    assert sync_with_retry(probes.sync_once, sleep=slept.append) == "synced"
    assert len(slept) == 2


def test_revisions_pending_maps_to_updates_available(oerp):
    fake, port = oerp
    fake.revisions_pending = True
    client = OerpClient("127.0.0.1", port, timeout=5)
    probes = client.probes("SOME_DB", "admin", "goodpw")
    assert sync_with_retry(probes.sync_once) == "updates_available"


def test_falsy_uid_is_auth_failure(oerp):
    _, port = oerp
    client = OerpClient("127.0.0.1", port, timeout=5)
    with pytest.raises(AuthFailed):
        client.login("admin", "WRONGPW", "SOME_DB")


def test_updating_fault_maps_to_modules_updating(oerp):
    fake, port = oerp
    fake.updating = True
    client = OerpClient("127.0.0.1", port, timeout=5)
    probes = client.probes("SOME_DB", "admin", "goodpw")
    with pytest.raises(ModulesUpdating):
        probes.rpc_probe()


def test_dead_port_is_server_unreachable():
    """Connection refusal — the restart poll's 'still starting' signal —
    from both the RPC path and the HTTP probe."""
    client = OerpClient("127.0.0.1", 1, timeout=2)  # port 1: nothing listens
    with pytest.raises(ServerUnreachable):
        client.login("admin", "pw", "DB")
    with pytest.raises(ServerUnreachable):
        client.http_probe()


def test_http_probe_accepts_error_pages(oerp):
    """Any HTTP response proves the process is up (main.py:641-655) —
    the XML-RPC server 404s a plain GET, which must count as alive."""
    _, port = oerp
    client = OerpClient("127.0.0.1", port, timeout=5)
    client.http_probe()  # must not raise


def test_state_machine_runs_over_real_transport(oerp):
    """await_restart over the live server answers on the first probe."""
    from ufload_spark.upgrade import RESTART_POLL, PollPolicy, await_restart

    _, port = oerp
    client = OerpClient("127.0.0.1", port, timeout=5)
    probes = client.probes("SOME_DB", "admin", "goodpw")
    n = await_restart(
        probes.http_probe,
        policy=PollPolicy(interval_s=RESTART_POLL.interval_s, max_time_s=3),
        sleep=lambda s: None,
    )
    assert n == 1


def test_revision_signal_precedence_matches_reference():
    """Fault-string mapping is substring-based like the reference's; the
    map must pick the right exception when several words appear."""
    from ufload_spark.upgrade_rpc import _map_fault

    f = xmlrpc.client.Fault(1, "There is/are 3 revision(s) available.")
    assert isinstance(_map_fault(f), RevisionsAvailable)
    f2 = xmlrpc.client.Fault(1, "AccessDenied: Authentification Failed...")
    assert isinstance(_map_fault(f2), AuthFailed)
    f3 = xmlrpc.client.Fault(1, "ServerUpdate: Server is updating modules (5/12)")
    assert isinstance(_map_fault(f3), ModulesUpdating)
    # unknown faults propagate untranslated
    f4 = xmlrpc.client.Fault(9, "some other error")
    assert isinstance(_map_fault(f4), xmlrpc.client.Fault)
