"""Registry invariants the driver gate depends on."""

from __future__ import annotations

from ufload_spark.plans.registry import _driver_verified_names, load_all


def test_every_query_has_an_oracle():
    """0 rows-only checks: every registered query carries DuckDB oracle SQL."""
    missing = [n for n, q in load_all().items() if q.oracle is None]
    assert missing == []


def test_unverified_queries_ordered_first():
    """The driver samples ~50 entries per round in iteration order; queries
    without a green CORRECTNESS_r*.json row must come first so driver-side
    coverage converges across rounds."""
    verified = _driver_verified_names()
    names = list(load_all())
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, f"unverified {n!r} after verified entries"


def test_hash_failed_row_counts_as_unverified(tmp_path):
    """A driver artifact row with rows+schema green but hash_match false is NOT
    verified — the value hash is part of the correctness gate, and omitting it
    from this predicate is exactly what kept source_schema_evolution (r3: hash
    fail) sorted last and never re-sampled."""
    import json

    artifact = {
        "hash_failed": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": False,
            "err": None,
        },
        "fully_green": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "errored": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": "boom",
        },
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(artifact))
    verified = _driver_verified_names(repo_root=str(tmp_path))
    assert verified == {"fully_green"}


def test_registry_names_unique_and_nonempty():
    reg = load_all()
    assert len(reg) >= 110
    assert all(n and n == q.name for n, q in reg.items())
