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


def test_drift_flags_semantics():
    """The r8+ drift detector: recorded-then-changed values taint;
    missing values on either side never do."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from taint_ledger import drift_flags

    prev = {
        "q1": {"oracle_sha": "aaa", "fingerprint": "plan:1"},
        "q2": {"oracle_sha": None, "fingerprint": None},
    }
    assert drift_flags(prev, "q1", "aaa", "plan:1") == (False, False)
    assert drift_flags(prev, "q1", "bbb", "plan:1") == (True, False)
    assert drift_flags(prev, "q1", "aaa", "plan:2") == (False, True)
    # no recorded baseline (new query / rows-only gate): never drifts
    assert drift_flags(prev, "q2", "ccc", "plan:3") == (False, False)
    assert drift_flags(prev, "q3", "ccc", "plan:3") == (False, False)
    # current side missing (fingerprint unobtainable this run): no flag
    assert drift_flags(prev, "q1", None, None) == (False, False)


def test_previous_ledger_comes_from_git_history():
    """The drift baseline must be the last COMMITTED earlier-round
    ledger — the working file is overwritten by every run, so reading
    it would disengage drift on a same-round re-run."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from taint_ledger import _previous_ledger

    led = _ledger()
    # from a FUTURE round's perspective, the committed r7 ledger is the
    # baseline and must carry per-query oracle shas + fingerprints
    prev = _previous_ledger(led["current_round"] + 1)
    assert prev is not None
    assert prev["current_round"] <= led["current_round"]
    rows = prev["per_query"]
    assert any(r.get("oracle_sha") for r in rows.values())
    assert any(
        str(r.get("fingerprint", "")).startswith("plan:") for r in rows.values()
    )
    # from THIS round's perspective there is no earlier-round ledger yet
    # unless one was committed by a prior round
    same = _previous_ledger(led["current_round"])
    assert same is None or same["current_round"] < led["current_round"]


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
