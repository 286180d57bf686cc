"""Property-based check: asof_join's union+window formulation agrees
with the naive theta-join + rank reference on adversarial generated
inputs (duplicate right timestamps excluded per the operator's
documented contract, empty sides, all-unmatched lefts, ties between
left and right ts)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st


def _rows(draw_keys, draw_ts, n):
    return st.lists(
        st.tuples(draw_keys, draw_ts),
        min_size=0,
        max_size=n,
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=_rows(st.integers(0, 3), st.integers(0, 50), 30),
    rights=_rows(st.integers(0, 3), st.integers(0, 50), 30),
    forward=st.booleans(),
)
def test_asof_matches_bruteforce(spark, lefts, rights, forward):
    from vizlinc_ingester_spark.operators.temporal import asof_join

    # dedupe right (key, ts) — documented determinism contract
    rights = list({(k, t): None for k, t in rights}.keys())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in rights], "k long, rts long, rval long"
    )
    direction = "forward" if forward else "backward"
    got = {
        (r["lid"]): (r["rts_matched"], r["rval"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", direction=direction
        ).collect()
    }

    # brute force in Python
    want = {}
    for i, (k, t) in enumerate(lefts):
        cands = [
            (rk, rt) for (rk, rt) in rights
            if rk == k and (rt <= t if direction == "backward" else rt >= t)
        ]
        if not cands:
            want[i] = (None, None)
        else:
            rt = max(c[1] for c in cands) if direction == "backward" else min(
                c[1] for c in cands
            )
            want[i] = (rt, k * 1000 + rt)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=_rows(st.integers(0, 2), st.integers(0, 40), 20),
    rights=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 40),
            st.one_of(st.none(), st.integers(0, 9)),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_null_values_come_from_matched_row(spark, lefts, rights):
    """With NULLs sprinkled through right-side value columns, every
    output row's (x, y) must equal the matched right row's (x, y)
    verbatim — never a stitch of two rows (the per-column
    last(ignorenulls) bug class)."""
    from vizlinc_ingester_spark.operators.temporal import asof_join

    rights = list({(k, t): (x, y) for k, t, x, y in rights}.items())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(
        [(k, t, x, y) for (k, t), (x, y) in rights],
        "k long, rts long, x long, y long",
    )
    got = {
        r["lid"]: (r["rts_matched"], r["x"], r["y"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts"
        ).collect()
    }
    rmap = {(k, t): (x, y) for (k, t), (x, y) in rights}
    for i, (k, t) in enumerate(lefts):
        cands = [rt for (rk, rt) in rmap if rk == k and rt <= t]
        if not cands:
            assert got[i] == (None, None, None)
        else:
            rt = max(cands)
            x, y = rmap[(k, rt)]
            assert got[i] == (rt, x, y)
