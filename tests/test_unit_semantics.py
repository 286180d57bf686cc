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
