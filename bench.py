"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). Wall-clock per query + total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per engine area (full coref DAG, social network,
# relational joins/aggs, sessionization, dedup, ANN, text analysis).
HEADLINE = [
    "within_doc_entities_person",
    "across_doc_entities_person",
    "social_network",
    "document_entity_counts",
    "pricing_summary",
    "revenue_by_nation",
    "events_sessionize",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "lang_id",
    "doc_fingerprint",
]


def main() -> None:
    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite import collect_suite

    spark = get_spark("vizlinc-bench", shuffle_partitions=2 * CPUS)
    queries, _ = collect_suite()

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        t0 = time.perf_counter()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
