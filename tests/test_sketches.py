"""Sketch + interval-merge semantics tests.

1. The interval-merge (gaps-and-islands) coverage inside
   ``q_dedup_exact_substr`` must equal the naive position-explode
   union it replaced — property-tested on adversarial random corpora
   (heavy duplication, overlapping and adjacent repeated windows).
2. CMS never underestimates (the structural guarantee).
3. HLL registers are permutation-invariant (mergeability in the
   aggregation sense): shuffled input produces identical registers.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from vizlinc_ingester_spark.suite.dedup import SUBSTR_L, q_dedup_exact_substr
from vizlinc_ingester_spark.suite.sketches import q_hll_users, q_token_cms


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "sfprop")
    df.coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


def _explode_coverage(spark, sf_dir):
    """The replaced naive form: explode every covered position,
    distinct, count — ground truth for the interval merge."""
    from vizlinc_ingester_spark.suite.dedup import _docs, stable_hash64

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    base = d.select(
        "doc_id", F.size(toks).cast("long").alias("n"), toks.alias("t")
    )
    grams = base.filter(F.col("n") >= SUBSTR_L).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - SUBSTR_L + 1),
                lambda i: F.struct(
                    i.cast("long").alias("start"),
                    stable_hash64(
                        F.array_join(F.slice(F.col("t"), i, SUBSTR_L), " ")
                    ).alias("gh"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.start").alias("start"), F.col("g.gh").alias("gh"))
    dup_gh = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    occ = grams.join(dup_gh, "gh", "left_semi")
    return {
        r["doc_id"]: r["c"]
        for r in occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + SUBSTR_L - 1)
            ).alias("pos"),
        )
        .dropDuplicates(["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_interval_merge_equals_position_union(spark, tmp_path):
    """Adversarial corpus: tiny vocabulary + shared phrases force
    dense, overlapping, adjacent repeated windows — every island
    topology the merge must handle."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    phrase = " ".join(vocab[:4]) + " " + " ".join(vocab[:4])  # repeated core
    texts = []
    for _ in range(40):
        n = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.7:
            words.insert(rng.randrange(len(words) + 1), phrase)
        texts.append(" ".join(words) if words else "x")
    sf = _write_docs(spark, tmp_path, texts)

    got = {
        r["doc_id"]: r["covered_tokens"]
        for r in q_dedup_exact_substr(spark, sf).collect()
        if r["covered_tokens"] > 0
    }
    want = _explode_coverage(spark, sf)
    assert got == want


def test_cms_never_underestimates(spark):
    rows = q_token_cms(spark, "/root/testdata/sf0.001").collect()
    assert rows, "CMS candidate set empty — raise CMS_T?"
    for r in rows:
        assert r["overestimate"] >= 0, r
        assert r["cms_est"] >= r["exact_cnt"], r


def test_hll_registers_permutation_invariant(spark, tmp_path):
    """Register state must not depend on row order or partitioning —
    the property that makes HLL a mergeable distributed aggregate."""
    base = q_hll_users(spark, "/root/testdata/sf0.001").collect()
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    shuffled = e.orderBy(F.rand(seed=7)).repartition(13)
    out = str(tmp_path / "sfshuf")
    shuffled.write.mode("overwrite").parquet(out + "/events.parquet")
    again = q_hll_users(spark, out).collect()
    key = lambda rows: sorted((r["event_type"], r["s_pow"], r["v_zero"], r["est_micro"]) for r in rows)
    assert key(base) == key(again)


def test_hll_estimate_within_bounds(spark):
    """3/sqrt(m) ~ 13% relative-error envelope at m=64 (3 sigma) for
    the raw regime; linear counting is tighter. Loose bound: 25%."""
    for r in q_hll_users(spark, "/root/testdata/sf0.001").collect():
        est = r["est_micro"] / 1e6
        assert abs(est - r["exact_users"]) / r["exact_users"] < 0.25, r


def test_kcore_rounds_is_fixpoint(spark):
    """KCORE_ROUNDS peels must be a fixpoint at the test SF — one
    more round changes nothing (the honesty condition for the fixed
    unroll; at scale the driver loops until dropped == 0)."""
    import vizlinc_ingester_spark.suite.graph_q as gq

    base = {
        (r["entity_id"], r["core_degree"])
        for r in gq.q_sn_kcore(spark, "/root/testdata/sf0.001").collect()
    }
    orig = gq.KCORE_ROUNDS
    try:
        gq.KCORE_ROUNDS = orig + 1
        more = {
            (r["entity_id"], r["core_degree"])
            for r in gq.q_sn_kcore(spark, "/root/testdata/sf0.001").collect()
        }
    finally:
        gq.KCORE_ROUNDS = orig
    assert base == more


def test_kmv_registers_merge_by_union(spark):
    """The 100 TB claim: per-split KMV register sets merged by
    union-then-retake-K must equal the whole-corpus registers —
    set semantics make the sketch split-invariant."""
    from pyspark.sql import Window

    from vizlinc_ingester_spark.functions.hashing import stable_hash64
    from vizlinc_ingester_spark.suite.relational import _events
    from vizlinc_ingester_spark.suite.sketches import KMV_K, q_kmv_users

    sf = "/root/testdata/sf0.01"
    e = _events(spark, sf)
    h = stable_hash64(F.col("user_id").cast("string"))
    dh = e.select("event_type", h.alias("h"))

    def k_smallest(df):
        w = Window.partitionBy("event_type").orderBy(F.asc("h"))
        return (
            df.distinct()
            .withColumn("k_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("k_rank") <= KMV_K)
        )

    # split on an arbitrary predicate uncorrelated with h's order
    half_a = k_smallest(dh.filter(F.col("h") % 7 < 3))
    half_b = k_smallest(dh.filter(F.col("h") % 7 >= 3))
    merged = k_smallest(
        half_a.select("event_type", "h").unionByName(
            half_b.select("event_type", "h")
        )
    )
    whole = {
        (r.event_type, r.k_rank, r.kmv_hash)
        for r in q_kmv_users(spark, sf).collect()
    }
    got = {(r.event_type, r.k_rank, r.h) for r in merged.collect()}
    assert got == whole


def test_bloom_words_merge_by_or(spark):
    """Per-split Bloom filters merged word-wise by bit_or must equal
    the whole-corpus filter, and the gated probe results must agree
    with direct membership recomputation."""
    from vizlinc_ingester_spark.functions.hashing import stable_hash64
    from vizlinc_ingester_spark.suite.relational import _events
    from vizlinc_ingester_spark.suite.sketches import (
        BLOOM_D,
        _bloom_bit,
        q_bloom_users,
    )

    sf = "/root/testdata/sf0.01"
    e = _events(spark, sf)
    keys = e.select(F.col("user_id").cast("string").alias("k")).distinct()

    def words_of(kdf):
        bits = None
        for r in range(BLOOM_D):
            br = kdf.select(_bloom_bit(r, F.col("k")).alias("bit"))
            bits = br if bits is None else bits.unionByName(br)
        return (
            bits.select(
                F.expr("bit div 32").cast("long").alias("word_idx"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))"
                ).alias("mask"),
            )
            .groupBy("word_idx")
            .agg(F.expr("bit_or(mask)").alias("bits"))
        )

    whole = {
        (r.word_idx, r.bits) for r in words_of(keys).collect()
    }
    low = F.substring("k", -1, 1).isin("0", "1", "2", "3")
    ha = words_of(keys.filter(low))
    hb = words_of(keys.filter(~low))
    merged = {
        (r.word_idx, r.bits)
        for r in ha.unionByName(hb)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .collect()
    }
    assert merged == whole

    # probe sanity: a present probe id always hits
    rows = q_bloom_users(spark, sf).collect()
    assert all(r.bloom_hit == 1 for r in rows if r.exact_present == 1)


def test_histogram_cells_merge_by_add(spark):
    """Given SHARED bounds, per-split histograms merged by cell-wise
    add must equal the whole-corpus histogram — the mergeability that
    makes equi-width histograms the gateable quantile structure."""
    from vizlinc_ingester_spark.suite.relational import _events
    from vizlinc_ingester_spark.suite.sketches import HIST_B

    sf = "/root/testdata/sf0.01"
    e = _events(spark, sf).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    bounds = e.groupBy("event_type").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    idx = F.expr(
        f"least({HIST_B - 1}, ((cents - lo) * {HIST_B}) div (hi - lo + 1))"
    ).cast("long")

    def cells(df):
        return (
            df.join(F.broadcast(bounds), "event_type")
            .select("event_type", idx.alias("bucket"))
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    whole = {
        (r.event_type, r.bucket): r.cnt for r in cells(e).collect()
    }
    merged: dict = {}
    for half in (e.filter("event_id % 2 = 0"), e.filter("event_id % 2 = 1")):
        for r in cells(half).collect():
            k = (r.event_type, r.bucket)
            merged[k] = merged.get(k, 0) + r.cnt
    assert merged == whole
