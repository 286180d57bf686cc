"""Regression tests for the round-2 code-review findings: each test
pins the exact failure scenario that the oracle-parity gate could not
catch (both engines previously shared the defective behavior, or the
defect lives on the replay/failure path)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators.dedup import simhash_near_dups
from vizlinc_ingester_spark.operators.geocode import resolve_locations
from vizlinc_ingester_spark.operators.temporal import asof_join
from vizlinc_ingester_spark.streaming.ingest import (
    idempotent_append,
    read_accumulated,
)


def test_asof_join_carries_one_right_row(spark):
    """A right row with a NULL in one value column must NOT stitch
    that column from an older right row: the carried values all come
    from the matched row."""
    left = spark.createDataFrame([("u", 3)], "k string, lts long")
    right = spark.createDataFrame(
        [("u", 1, 5, 7), ("u", 2, None, 9)],
        "k string, rts long, x long, y long",
    )
    row = asof_join(left, right, ["k"], "lts", "rts").collect()[0]
    assert row.rts_matched == 2
    assert row.x is None  # from the ts=2 row, not 5 from ts=1
    assert row.y == 9


def test_asof_join_tolerance_applies_to_matched_row_only(spark):
    """With a tolerance, a stale value from outside tolerance must not
    leak in just because the newest right row is within tolerance."""
    left = spark.createDataFrame([("u", 100)], "k string, lts long")
    right = spark.createDataFrame(
        [("u", 1, 5), ("u", 99, None)], "k string, rts long, x long"
    )
    row = asof_join(
        left, right, ["k"], "lts", "rts", tolerance=10
    ).collect()[0]
    assert row.rts_matched == 99
    assert row.x is None  # ts=1 is 99 units away — outside tolerance


def test_simhash_banding_catches_high_bit_diffs(spark):
    """Pairs whose differing bits all fall in the high byte were
    missed by high-byte bucketing; 4x4-bit banding must find them.
    simhash('a b') vs an engineered near-identical doc shares low
    bands, so instead assert directly on the guarantee: every pair
    with hamming <= 3 in the corpus is emitted (exhaustive check)."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common tokens here always") for i in range(12)],
        "doc_id long, text string",
    )
    from vizlinc_ingester_spark.operators.dedup import simhash_docs
    from vizlinc_ingester_spark.functions.hashing import hamming16

    sh = simhash_docs(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    exhaustive = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", hamming16(F.col("sa"), F.col("sb")))
        .filter(F.col("h") <= 3)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dups(docs).collect()
    }
    assert banded == exhaustive
    assert exhaustive  # non-vacuous: the corpus does contain near-dups


def test_geocode_nested_suffix_single_result(spark):
    """Gazetteer names nested as suffixes ('COREA' inside 'REPUBLICA
    DE COREA') must yield ONE location per entity — the most specific
    (longest) match — not one row per matching country."""
    locs = spark.createDataFrame(
        [(1, "BAHIA DE REPUBLICA DE COREA")], "entity_id long, text string"
    )
    gaz = spark.createDataFrame(
        [("COREA", 1.0, 2.0), ("REPUBLICA DE COREA", 3.0, 4.0)],
        "country string, lat double, lon double",
    )
    rows = resolve_locations(locs, gaz).collect()
    assert len(rows) == 1
    assert rows[0].country == "REPUBLICA DE COREA"
    assert rows[0].latitude == 3.0


def test_idempotent_append_replay(spark, tmp_path):
    """Replaying the same micro-batch (the foreachBatch at-least-once
    path) must not duplicate rows; a NEW batch id must append."""
    path = os.path.join(str(tmp_path), "acc")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    idempotent_append(df, 0, path)
    idempotent_append(df, 0, path)  # replay of batch 0
    assert read_accumulated(spark, path).count() == 2
    idempotent_append(df, 1, path)  # genuinely new batch
    assert read_accumulated(spark, path).count() == 4
    assert "batch_id" not in read_accumulated(spark, path).columns


def test_stateful_sessionize_multichunk_groups(spark, sf_dir):
    """Force Arrow to split each user's micro-batch rows into many tiny
    chunks: the accumulator must concatenate+sort them before scanning
    (per-chunk sorting with carried state gap-splits on chunk
    boundaries). Output must still equal the batch twin."""
    from vizlinc_ingester_spark.suite.relational import q_events_sessionize
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_sessionize_state,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            (r.user_id, r.session_id, r.n_events, r.duration_s)
            for r in q_streaming_sessionize_state(spark, sf_dir).collect()
        }
        want = {
            (r.user_id, r.session_id, r.n_events, r.duration_s)
            for r in q_events_sessionize(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_events_loader_guard_and_cache(spark, sf_dir, tmp_path):
    """r5 ADVICE: _events must fail loudly on an unexpected physical ts
    type instead of silently corrupting event-time math, and must hand
    back the same (cached) normalized DataFrame per (session, dir)."""
    import pytest

    from vizlinc_ingester_spark.suite.relational import _events

    a = _events(spark, sf_dir)
    b = _events(spark, sf_dir)
    assert a is b  # per-session cache hit
    assert dict(a.dtypes)["ts"] == "bigint"

    bad_dir = str(tmp_path / "bad_sf")
    import os

    os.makedirs(bad_dir)
    spark.range(3).selectExpr(
        "id AS event_id", "CAST(id AS STRING) AS ts"
    ).write.parquet(os.path.join(bad_dir, "events.parquet"))
    with pytest.raises(ValueError, match="unexpected dtype"):
        _events(spark, bad_dir)


def test_promo_revenue_floor_division_at_larger_sf(spark):
    """r5 ADVICE (high): promo_bps must use floor division on both
    engines — at sf0.1 the truncate-vs-round divergence was 1611 vs
    1612. Verify the Spark side now floors (div) by checking the
    invariant promo_bps == promo_c4 * 10000 // total_c4 exactly."""
    import os

    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("sf0.1 testdata absent")
    from vizlinc_ingester_spark.suite.relational import q_promo_revenue

    r = q_promo_revenue(spark, sf).collect()[0]
    assert r["promo_bps"] == r["promo_c4"] * 10000 // r["total_c4"]


def test_plan_memo_lru_eviction_and_reuse(spark):
    """r5 verdict #7: the session plan memo is LRU-bounded — 2x
    overflow evicts oldest entries without breaking reuse of hot
    ones."""
    from vizlinc_ingester_spark import session as S

    spark_key = spark
    S._PLAN_MEMO.pop(spark_key, None)
    old_max = S.PLAN_MEMO_MAX_ENTRIES
    S.PLAN_MEMO_MAX_ENTRIES = 4
    try:
        builds = []

        def builder(i):
            def b():
                builds.append(i)
                return spark.range(i + 1)
            return b

        # fill to 2x the bound
        for i in range(8):
            S.plan_memo(spark, ("lru_t", i), builder(i))
        per = S._PLAN_MEMO[spark_key]
        assert len(per) == 4
        # newest 4 survive; a hit on a survivor does NOT rebuild
        n_builds = len(builds)
        df = S.plan_memo(spark, ("lru_t", 7), builder(7))
        assert len(builds) == n_builds and df.count() == 8
        # evicted oldest rebuilds
        S.plan_memo(spark, ("lru_t", 0), builder(0))
        assert builds[-1] == 0
        # a hit refreshes LRU position: touch 5, then add 2 new -> 5 stays
        S.plan_memo(spark, ("lru_t", 5), builder(5))
        for i in (100, 101):
            S.plan_memo(spark, ("lru_t", i), builder(i))
        assert ("lru_t", 5) in S._PLAN_MEMO[spark_key]
    finally:
        S.PLAN_MEMO_MAX_ENTRIES = old_max
        S._PLAN_MEMO.pop(spark_key, None)


def test_plan_memo_opt_out_invalidates(spark):
    """r5 ADVICE (medium): memo=False bypasses AND evicts the stale
    entry, so stale persisted results cannot be returned after the
    underlying files change."""
    from vizlinc_ingester_spark import session as S

    S._PLAN_MEMO.pop(spark, None)
    calls = []

    def build(tag):
        def b():
            calls.append(tag)
            return spark.range(3)
        return b

    S.plan_memo(spark, ("inv_t",), build("first"))
    S.plan_memo(spark, ("inv_t",), build("hit"))
    assert calls == ["first"]
    S.plan_memo(spark, ("inv_t",), build("fresh"), memo=False)
    assert calls == ["first", "fresh"]
    # the stale entry is gone: the next memoized call rebuilds
    S.plan_memo(spark, ("inv_t",), build("rebuilt"))
    assert calls == ["first", "fresh", "rebuilt"]
    S._PLAN_MEMO.pop(spark, None)


def test_plan_key_includes_schema(spark):
    from vizlinc_ingester_spark.session import plan_key

    a = spark.range(5).selectExpr("id AS x")
    b = spark.range(5).selectExpr("CAST(id AS INT) AS x")
    ka, kb = plan_key(a, "p"), plan_key(b, "p")
    assert ka is not None and ka != kb  # schema disambiguates


def test_read_spread_probe(spark, sf_dir, tmp_path):
    """r5 verdict #4: the single-split spread is conditional — a
    narrow scan with heavy per-row work repartitions; heavy=False or
    a wide scan leaves the plan shuffle-free."""
    import os

    from vizlinc_ingester_spark.session import (
        read_spread, scan_splits_estimate, spread_if_narrow,
    )

    p = os.path.join(sf_dir, "documents.parquet")
    assert scan_splits_estimate(spark, p) < 8
    wide = read_spread(spark, p, "doc_id", heavy=False)
    assert "Exchange" not in wide._jdf.queryExecution().optimizedPlan().toString()
    narrow = read_spread(spark, p, "doc_id", heavy=True)
    assert "RepartitionByExpression" in narrow._jdf.queryExecution().optimizedPlan().toString()
    # unknown path (e.g. hdfs:// on a cluster) -> treated as wide
    assert scan_splits_estimate(spark, "/no/such/path") >= 1 << 20
    # DataFrame-level twin: narrow input spreads, wide input passes through
    df = spark.read.parquet(p)
    assert "RepartitionByExpression" in (
        spread_if_narrow(df, "doc_id")._jdf.queryExecution().optimizedPlan().toString()
    )
    already_wide = df.repartition(32, "doc_id")
    again = spread_if_narrow(already_wide, "doc_id")
    plan = again._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("RepartitionByExpression") == 1  # no second shuffle


def test_materialize_ctes_postcondition_trips_on_reformat():
    """ADVICE r12: _materialize_ctes is a line-anchored regex; a
    generator reformat (indented CTE, uppercase name) used to
    silently drop the MATERIALIZED hint and regress the DP oracle to
    its >250s quadratic form. The post-condition assertion must trip
    on exactly those shapes and stay quiet on the shapes the
    generators emit."""
    import pytest

    from vizlinc_ingester_spark.suite.ner import _materialize_ctes

    ok = "WITH a AS (SELECT 1),\nb AS (\n SELECT 2\n)\nSELECT * FROM b"
    out = _materialize_ctes(ok)
    assert "b AS MATERIALIZED (" in out
    # ValueError, not AssertionError, since ADVICE r12: a bare assert
    # vanishes under `python -O`, silently re-opening the regression
    with pytest.raises(ValueError, match="indented"):
        _materialize_ctes("WITH a AS (SELECT 1),\n  indented AS (\nSELECT 2)")
    with pytest.raises(ValueError, match="Upper"):
        _materialize_ctes("WITH a AS (SELECT 1),\nUpperName AS (SELECT 2)")
    # recursive dp* CTEs stay unmaterialized without tripping
    dp = _materialize_ctes("WITH RECURSIVE x AS (SELECT 1),\na AS (SELECT 1),\ndp AS (SELECT 2)")
    assert "\ndp AS (" in dp and "\na AS MATERIALIZED (" in dp


def test_collect_suite_rejects_query_name_collisions(monkeypatch):
    """Judge r11 finding 1: temporal.py's events_funnel silently
    shadowed relational.py's for five rounds. collect_suite now
    asserts per-module name disjointness."""
    import pytest

    from vizlinc_ingester_spark.suite import collect_suite, temporal

    q, o = collect_suite()
    assert "events_funnel" in q and "events_funnel_first_touch" in q
    # RuntimeError, not AssertionError, since ADVICE r12 (python -O
    # strips bare asserts); the guard now also covers ORACLES and
    # orphan oracles
    monkeypatch.setitem(temporal.QUERIES, "dedup_exact", temporal.QUERIES["events_funnel"])
    with pytest.raises(RuntimeError, match="dedup_exact"):
        collect_suite()
    monkeypatch.delitem(temporal.QUERIES, "dedup_exact")
    monkeypatch.setitem(temporal.ORACLES, "dedup_exact", "SELECT 1")
    with pytest.raises(RuntimeError, match="dedup_exact"):
        collect_suite()


def test_kn_overflow_guard_fails_loudly_both_engines(spark):
    """ADVICE r11: past 15*T*B >= 2^63 the exact-rational KN form
    wrapped silently in Spark but raised in DuckDB. Both engines now
    fail loudly on the SAME condition."""
    import duckdb
    import pytest

    from vizlinc_ingester_spark.suite.textstats import (
        _SQL_KN_GUARD,
        kn_model_from_counts,
    )

    # Spark: one bigram with a count big enough that T*B*15 >= 9e18
    c2 = spark.createDataFrame(
        [("a", "b", 10**18)], "w1 string, w2 string, c2 long"
    )
    with pytest.raises(Exception, match="kn_int64_overflow"):
        kn_model_from_counts(c2).collect()
    # and stays quiet at sane scale
    small = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "w1 string, w2 string, c2 long"
    )
    assert kn_model_from_counts(small).count() == 2
    # DuckDB: the rendered guard is an impossible VARCHAR->BIGINT cast
    con = duckdb.connect()
    sql = "SELECT " + _SQL_KN_GUARD.format(term="CAST(1 AS BIGINT)") + (
        " AS x FROM (SELECT CAST(1000000000000000000 AS BIGINT) AS t,"
        " CAST(1 AS BIGINT) AS b)"
    )
    with pytest.raises(duckdb.ConversionException):
        con.execute(sql)
    ok_sql = "SELECT " + _SQL_KN_GUARD.format(term="CAST(1 AS BIGINT)") + (
        " AS x FROM (SELECT CAST(100 AS BIGINT) AS t, CAST(7 AS BIGINT) AS b)"
    )
    assert con.execute(ok_sql).fetchone()[0] == 1
    con.close()
