"""Driver-contract invariants for __spark_entry__ (no Spark session needed).

The external driver evaluates only the FIRST 50 queries() entries per
round; these tests pin the two properties that keep the whole surface
verified anyway:

1. full oracle coverage — every queries() entry has an oracle_sql()
   entry, so the local replica (tools/check_oracles.py, which iterates
   queries() itself) value-checks the complete set every round and a
   coverage drop cannot silently widen the unverified tail;
2. the rotation rule — queries() orders entries by last-driver-evaluated
   round ascending (new first), so every entry missing from the latest
   CORRECTNESS_r*.json lands inside the 50-entry driver window this round.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import __spark_entry__ as entrymod

REPO = Path(entrymod.__file__).resolve().parent

DRIVER_CAP = 50


def test_every_query_has_a_value_checked_oracle():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing = sorted(qs - oracles)
    assert not missing, f"queries without oracle_sql (rows-only): {missing}"
    orphans = sorted(oracles - qs)
    assert not orphans, f"oracle_sql entries without a query: {orphans}"


def test_rotation_puts_stalest_queries_inside_driver_window():
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not files:
        return  # fresh checkout: no history, nothing to rotate against
    latest = json.loads(files[-1].read_text())
    order = list(entrymod.queries())
    window = set(order[:DRIVER_CAP])
    overdue = [k for k in order if k not in latest]
    outside = sorted(set(overdue) - window)
    assert not outside, (
        f"queries unevaluated in {files[-1].name} but outside the "
        f"first-{DRIVER_CAP} driver window: {outside}"
    )


def test_rotation_order_matches_history():
    hist = entrymod._driver_history()
    order = list(entrymod.queries())
    keyed = [(hist.get(k, -1), k) for k in order]
    assert keyed == sorted(keyed), "queries() not in (last_round, name) order"


def test_query_names_are_driver_safe():
    for name, fn in entrymod.queries().items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(fn), name
