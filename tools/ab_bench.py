"""Targeted A/B timing for a subset of headline queries — the same
methodology as bench.py (fresh session, sf0.001 warm-up, noop sink,
pass-major min-of-N) so per-query numbers are comparable with a full
bench run on the same box. Used during optimization rounds to measure
touched queries without paying a full sweep per edit.

Usage: python tools/ab_bench.py q1,q2,... [runs]
Prints one JSON line {query: {min, med, runs}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite import collect_suite

    spark = get_spark("vizlinc-ab", shuffle_partitions=2 * CPUS)
    queries, _ = collect_suite()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {name}: {type(exc).__name__}: {exc}"[:200],
                  file=sys.stderr)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
    out = {
        n: {
            "min": round(min(s), 3),
            "med": round(sorted(s)[len(s) // 2], 3),
            "runs": [round(x, 3) for x in s],
        }
        for n, s in samples.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
