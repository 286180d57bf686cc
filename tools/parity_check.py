"""Targeted oracle-parity check: run named queries() entries in Spark
and their oracle_sql() in DuckDB over one sf dir, compare with the
same order-insensitive harness the test suite uses.

Usage: python tools/parity_check.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from oracle_harness import compare, duck_con

    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite import collect_suite

    spark = get_spark("vizlinc-parity")
    queries, oracles = collect_suite()
    con = duck_con(sf_dir)
    n_bad = 0
    for name in names:
        try:
            ok, msg = compare(queries[name](spark, sf_dir), con, oracles[name])
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"{type(exc).__name__}: {exc}"[:300]
        print(("PASS" if ok else "FAIL"), name, "-", msg)
        n_bad += 0 if ok else 1
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
