"""Dump .explain('formatted') for every bench headline query to
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
files: the judge checks plan claims against these).

Usage: python tools/capture_plans.py [--tag r14] [--suffix before]
       [--sf /root/testdata/sf0.1] [--only q1,q2,...]

Construction-time side effects (streaming queries run their ingest
streams at build time; events_approx_profile collects its sketch
estimates) execute as part of the capture — the captured plan is the
plan of the RETURNED DataFrame, i.e. what the noop sink in bench.py
times after those effects.
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from bench import HEADLINE, ONCE_TIMED
    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite import collect_suite

    names = list(HEADLINE) + sorted(ONCE_TIMED.values())
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("vizlinc-capture-plans")
    queries, _ = collect_suite()
    failed: list[str] = []
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {exc}"[:300])
    print(f"captured {len(names) - len(failed)}/{len(names)}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
