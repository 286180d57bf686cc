"""The freshness-rotation policy, enforced mechanically (judge-r13
item 1): the DRIVER_WINDOW must be planned so that after the coming
round's driver run, no declared query's last hash-green proof is
older than round - 4. These tests recompute the ledger from the
checked-in CORRECTNESS_r*.json records (not the cached STALENESS.json)
so a forgotten rotation fails CI even if the JSON wasn't regenerated.

No Spark session needed beyond suite import (collect_suite builds
closures, it does not execute queries).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ledger():
    from tools.staleness import ledger

    return ledger(REPO)


def test_ledger_consistency():
    led = _ledger()
    assert led["as_of_round"] >= 13
    assert led["declared_queries"] == led["proven_queries"] + len(
        led["never_proven"]
    )
    assert sum(led["histogram"].values()) == led["proven_queries"]


def test_window_covers_everything_below_next_floor():
    """Every query whose last driver proof would fall below the
    *floor >= round - 4* policy after the NEXT driver run must be in
    the window the driver will check, and every never-proven (new)
    query must be there too — otherwise the rotation plan violates
    the standing policy by construction."""
    from vizlinc_ingester_spark.suite import DRIVER_WINDOW

    led = _ledger()
    next_round = led["as_of_round"] + 1
    floor = next_round - 4
    window = set(DRIVER_WINDOW)
    must_rotate = sorted(
        n for n, r in led["last_green"].items() if r < floor
    )
    missing = [n for n in must_rotate if n not in window]
    assert not missing, (
        f"queries falling below the r{floor} floor after r{next_round} "
        f"but not in DRIVER_WINDOW: {missing}"
    )
    unproven_missing = [n for n in led["never_proven"] if n not in window]
    assert not unproven_missing, (
        f"new queries never driver-proven and not in DRIVER_WINDOW: "
        f"{unproven_missing}"
    )


def test_window_size_matches_driver_record():
    """The driver's correctness record stops at the first 50 queries()
    entries (observed every round since r1); a window larger than 50
    silently drops its tail, smaller wastes proof slots."""
    from vizlinc_ingester_spark.suite import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
