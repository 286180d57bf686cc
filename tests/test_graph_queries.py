"""Structural invariants for the graph-analytics suite (beyond the
hash-vs-DuckDB gate in test_oracle_parity.py): PageRank mass
conservation, triangle edge-closure, funnel stage ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.suite import graph_q, temporal
from vizlinc_ingester_spark.suite.graph_q import PR_SCALE


def test_pagerank_mass_and_positivity(spark, sf_dir):
    ranks = graph_q.q_sn_pagerank(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r.rank_scaled for r in ranks)
    # Integer floor-division leaks at most a few units per node per
    # iteration; total mass stays within n*iters*2 units of SCALE.
    assert abs(total - PR_SCALE) < n * (graph_q.PR_ITERS + 1) * 2
    assert all(r.rank_scaled > 0 for r in ranks)


def test_pagerank_degree_correlation(spark, sf_dir):
    """Highest-degree node should outrank the lowest-degree node —
    a sanity check that contributions actually flow along edges."""
    deg = {r.entity_id: r.degree for r in graph_q.q_sn_degrees(spark, sf_dir).collect()}
    pr = {r.entity_id: r.rank_scaled for r in graph_q.q_sn_pagerank(spark, sf_dir).collect()}
    hi = max(deg, key=deg.get)
    lo = min(deg, key=deg.get)
    if deg[hi] > deg[lo]:
        assert pr[hi] > pr[lo]


def test_triangles_are_closed(spark, sf_dir):
    edges = {
        (r.src_entity_id, r.dst_entity_id)
        for r in graph_q.sn_edges(spark, sf_dir).collect()
    }
    tris = graph_q.q_sn_triangles(spark, sf_dir).collect()
    assert len(tris) > 0
    for t in tris:
        assert t.a < t.b < t.c
        assert (t.a, t.b) in edges
        assert (t.b, t.c) in edges
        assert (t.a, t.c) in edges


def test_degrees_sum_to_twice_edges(spark, sf_dir):
    n_edges = graph_q.sn_edges(spark, sf_dir).count()
    total_deg = (
        graph_q.q_sn_degrees(spark, sf_dir)
        .agg(F.sum("degree").alias("s"))
        .collect()[0]
        .s
    )
    assert total_deg == 2 * n_edges


def test_funnel_stage_ordering(spark, sf_dir):
    rows = temporal.q_events_funnel(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.stage >= 2:
            assert r.click_us > r.signup_us
        else:
            assert r.click_us is None
        if r.stage == 3:
            assert r.purchase_us > r.click_us
        else:
            assert r.purchase_us is None
