"""Approx sketches (HLL++ distinct counts, approx percentiles) must
land within their error bounds of the exact answers — the correctness
check the hash gate can't express cross-engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.suite.relational import (
    _cents,
    _events,
    q_events_approx_profile,
    q_events_exact_profile,
    q_value_percentiles,
)

SF = "/root/testdata/sf0.01"


def test_approx_profile_within_bounds(spark):
    """Bounds the sketch profile against its driver-hash-proven exact
    twin (q_events_exact_profile shares the loader + grouping), so the
    only un-gated query is error-bounded against gated values."""
    approx = {r["event_type"]: r for r in q_events_approx_profile(spark, SF).collect()}
    exact = {r["event_type"]: r for r in q_events_exact_profile(spark, SF).collect()}
    exact_p = {r["event_type"]: r for r in q_value_percentiles(spark, SF).collect()}

    assert set(approx) == set(exact)
    for et, row in approx.items():
        # HLL++ with rsd=0.02: allow 5 sigma
        rel = abs(row["approx_users"] - exact[et]["n_users"]) / exact[et]["n_users"]
        assert rel <= 0.10, (et, row["approx_users"], exact[et]["n_users"])
        rel_v = abs(row["approx_values"] - exact[et]["n_values"]) / max(
            exact[et]["n_values"], 1
        )
        assert rel_v <= 0.10, (et, row["approx_values"], exact[et]["n_values"])
        assert row["n_events"] == exact[et]["n_events"]
        # percentile_approx with accuracy 10000 on ~2k rows/group is
        # exact-rank; allow one value of slack around the interpolated
        # exact percentile (approx returns an actual data value,
        # exact interpolates between two).
        assert abs(row["ap50_cents"] - exact_p[et]["p50_micro"] / 1e6) <= 100
        assert abs(row["ap99_cents"] - exact_p[et]["p99_micro"] / 1e6) <= 500
        assert row["n_events"] > 0
