"""Machine-readable freshness ledger (judge-r13 item 1): compute each
declared query's last driver-hash-green round from the accumulated
CORRECTNESS_r*.json records and write STALENESS.json, so the per-round
DRIVER_WINDOW rotation is planned from data instead of hand-curated
comment arithmetic.

A query counts green in round N when its CORRECTNESS_rN row has
rows_match + schema_match and (hash_match OR no oracle was declared —
the driver's weaker rows-only check for non-SQL-expressible ops).

Standing policy (judge-r13): the freshness floor must satisfy
``last_green >= current_round - 4`` for every query old enough to have
been proven; rows violating it are listed under "stale" with the
rounds they have waited.

Usage:  python tools/staleness.py [repo_dir]   (default: repo root)
Writes <repo>/STALENESS.json and prints a summary histogram.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def ledger(repo: str) -> dict:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)

    last_green: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("hash_match") is None)
                and not row.get("err")
            )
            if ok:
                last_green[name] = rnd

    current = max(rounds) if rounds else 0
    floor = current - 4
    declared = _declared_queries(repo)
    stale = {
        n: {"last_green": r, "rounds_stale": current - r}
        for n, r in sorted(last_green.items())
        if r < floor and n in declared
    }
    never = sorted(n for n in declared if n not in last_green)
    hist: dict[str, int] = {}
    for n, r in last_green.items():
        if n in declared:
            hist[f"r{r}"] = hist.get(f"r{r}", 0) + 1
    return {
        "as_of_round": current,
        "floor_policy": "last_green >= round - 4",
        "floor_round": floor,
        "declared_queries": len(declared),
        "proven_queries": sum(1 for n in last_green if n in declared),
        "histogram": dict(sorted(hist.items(), key=lambda kv: int(kv[0][1:]))),
        "stale": stale,
        "never_proven": never,
        "last_green": {
            n: last_green[n] for n in sorted(last_green) if n in declared
        },
    }


def _declared_queries(repo: str) -> set[str]:
    sys.path.insert(0, repo)
    from vizlinc_ingester_spark.suite import collect_suite

    queries, _ = collect_suite()
    return set(queries)


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = ledger(repo)
    path = os.path.join(repo, "STALENESS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {path}")
    print("histogram:", out["histogram"])
    print(f"stale (< r{out['floor_round']}): {len(out['stale'])}")
    for n, row in out["stale"].items():
        print(f"  {n}: last green r{row['last_green']}")
    if out["never_proven"]:
        print("never proven by driver:", out["never_proven"])


if __name__ == "__main__":
    main()
