"""The committed TAINT_LEDGER.json must stay consistent with the live
registry — a stale ledger (query added/renamed without re-running
tools/taint_ledger.py) or a rotation that drops a must-cover entry
below the cap fails here instead of at the judge."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

LEDGER = os.path.join(os.path.dirname(__file__), "..", "TAINT_LEDGER.json")


def _ledger() -> dict:
    with open(LEDGER) as fh:
        return json.load(fh)


def test_ledger_matches_registry():
    led = _ledger()
    reg = list(entrymod.queries())
    assert led["registry_size"] == len(reg), (
        "registry changed since the ledger was built — re-run "
        "tools/taint_ledger.py"
    )
    assert set(led["per_query"]) == set(reg)


def test_ledger_must_cover_is_in_cap():
    led = _ledger()
    head = set(list(entrymod.queries())[: led["cap"]])
    missing = [q for q in led["must_cover"] if q not in head]
    assert not missing, (
        f"must-cover entries below the driver cap: {missing} — "
        "rotate _CHECK_FIRST or re-run tools/taint_ledger.py"
    )
    assert not led["displaced"]
    assert not led["problems"]


def test_ledger_never_checked_have_no_green():
    led = _ledger()
    for q in led["never_checked"]:
        assert led["per_query"][q]["last_green_round"] is None


def test_ledger_oracle_shas_current():
    """Oracle drift detection only works if the recorded SHAs describe
    the oracles as committed."""
    import hashlib

    led = _ledger()
    oracles = entrymod.oracle_sql()
    stale = [
        q
        for q, row in led["per_query"].items()
        if row.get("oracle_sha")
        and q in oracles
        and row["oracle_sha"]
        != hashlib.sha256(oracles[q].encode()).hexdigest()[:16]
    ]
    assert not stale, (
        f"oracle text changed after the ledger was built: {stale} — "
        "re-run tools/taint_ledger.py"
    )
