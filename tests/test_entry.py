"""Driver-contract conformance: entry() runs, every queries() entry runs at
sf0.001, every oracle key exists in queries()."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_check_first_names_all_resolve():
    """A typo in _CHECK_FIRST silently loses the front-loading (the
    ordering comprehension skips unknown names) — so pin that every
    listed name exists in the registry, and that the gate-relevant
    head has no duplicates."""
    import __spark_entry__ as e

    reg = set(e.queries())
    missing = [n for n in e._CHECK_FIRST if n not in reg]
    assert not missing, f"_CHECK_FIRST names not in registry: {missing}"
    assert len(e._CHECK_FIRST) == len(set(e._CHECK_FIRST)), "duplicates"


def test_r8_rotation_inside_driver_cap():
    """The correctness driver checks the first 50 entries. The r8
    must-cover set is the LINE-LEVEL one computed by
    tools/taint_ledger.py on the final r8 tree (committed as
    TAINT_LEDGER.json): 3 never-checked r8 gates
    (weighted_reservoir_sample, epoch_shard_plan, token_budget_fill) +
    41 line-tainted (the t_adaptive loader migration's 42 gates and
    the streaming-argmax key-type fix) — all in-cap, zero
    displacements. This test re-derives the containment from the
    committed ledger instead of pinning names, so a ledger/cap drift
    fails here before the driver runs."""
    import json
    import os

    import __spark_entry__ as e

    head = list(e.queries())[:50]
    assert len(head) == 50
    led = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "TAINT_LEDGER.json"))
    )
    assert led["displaced"] == []
    assert led["problems"] == []
    # every must-cover entry sits inside the driver cap
    for name in led["must_cover"]:
        assert name in head, name
    # the r8-new gates are present and never-checked entries lead
    for name in ("weighted_reservoir_sample", "epoch_shard_plan",
                 "token_budget_fill"):
        assert name in led["never_checked"] and name in head
