"""sf0.1 -> sf1 scaling probe (judge-r13 item 5): measure the five
heaviest queries at two data scales and report the observed scaling
exponent per query, turning the "would hold at 100x" design grade
from extrapolation into two measured points.

The sf1 input is 10x key-shifted replication of the driver's sf0.1
parquet (documents: doc_id shifted, text rotated with a copy prefix
so shingle/signature cardinality actually grows 10x; events:
event_id/user_id shifted so distinct cardinalities grow 10x, ts
jittered per copy). Generate it with the embedded SQL below (DuckDB)
into --sf1-dir; only documents.parquet and events.parquet are needed
by the probe set.

Method: one warm-up run of each query at the smallest sf
(JIT/codegen), then one untimed pre-run at EACH measured scale
(plan-memo artifacts are keyed per input plan, so small-sf warm-up
does not build the large-scale stores), then min-of-N at each scale,
interleaved pass-major like bench.py. Exponent =
log(t_sf1/t_sf01) / log(10); near 1.0 = linear. For the
streaming_*_insert queries the pre-run changes nothing: their
per-invocation re-ingest IS the measured operator (the store is
rebuilt per call by design), so their rows include the full stream
ingest at both scales — the honest production cost.

Usage: python tools/scale_probe.py [--sf1-dir /tmp/sf1_probe]
Prints one JSON line; paste the table into PLANS.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "streaming_lsh_insert",
    "simjoin_allpairs",
    "streaming_lang_quality_report",
    "events_approx_profile",
    "dedup_minhash_lsh",
]

GEN_SQL = """
-- documents (10x, distinct shingles):
COPY (
  SELECT doc_id + i*10000000 AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE 'copia ' || CAST(i AS VARCHAR) || ' ' || text END AS text,
         lang, source,
         CAST(length(CASE WHEN i = 0 THEN text
              ELSE 'copia ' || CAST(i AS VARCHAR) || ' ' || text END)
              AS BIGINT) AS n_chars
  FROM read_parquet('<sf0.1>/documents.parquet'),
       generate_series(0, 9) AS g(i)
) TO '<sf1>/documents.parquet' (FORMAT PARQUET);
-- events (10x, distinct users):
COPY (
  SELECT event_id + i*100000000 AS event_id, ts + to_seconds(i) AS ts,
         user_id + i*10000000 AS user_id, event_type, value, props
  FROM read_parquet('<sf0.1>/events.parquet'),
       generate_series(0, 9) AS g(i)
) TO '<sf1>/events.parquet' (FORMAT PARQUET);
-- embeddings (10x, key-shifted; copy 0 keeps the original ids so the
-- fixed seed/query/centroid prefixes vec_id < C stay the same sets —
-- the vector payload repeats, which is fine for SCALING probes: the
-- per-row assignment/signature work is what grows 10x):
COPY (
  SELECT vec_id + i*10000000 AS vec_id, embedding, label
  FROM read_parquet('<sf0.1>/embeddings.parquet'),
       generate_series(0, 9) AS g(i)
) TO '<sf1>/embeddings.parquet' (FORMAT PARQUET);
"""


def ensure_sf1(sf01: str, sf1: str) -> None:
    if os.path.isfile(os.path.join(sf1, "documents.parquet")):
        return
    import duckdb

    os.makedirs(sf1, exist_ok=True)
    con = duckdb.connect()
    for stmt in GEN_SQL.replace("<sf0.1>", sf01).replace("<sf1>", sf1).split(
        ";"
    ):
        # strip comment LINES inside the chunk, not chunks that merely
        # START with a comment — each COPY above is prefixed by one,
        # and the old chunk-level filter skipped both statements
        # entirely (self-review r14: the tool could never provision
        # sf1 on a fresh host)
        sql = "\n".join(
            ln for ln in stmt.splitlines()
            if ln.strip() and not ln.strip().startswith("--")
        )
        if sql.strip():
            con.execute(sql)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1_probe")
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--warm-dir",
        default="/root/testdata/sf0.001",
        help="smallest-sf dir for the codegen/JIT warm-up pass; "
        "skipped if missing",
    )
    ap.add_argument(
        "--probes",
        default=None,
        help="comma-separated query names to probe instead of the "
        "default five-heaviest set",
    )
    args = ap.parse_args()
    if args.probes:
        PROBES[:] = [p for p in args.probes.split(",") if p]
    ensure_sf1(args.sf01_dir, args.sf1_dir)

    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite import collect_suite

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale-probe", shuffle_partitions=2 * cpus)
    queries, _ = collect_suite()

    def run(name: str, sf: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up at the smallest sf (codegen/JIT)
    if os.path.isdir(args.warm_dir):
        for name in PROBES:
            run(name, args.warm_dir)
    # one untimed pre-run at EACH measured scale: plan-memo artifacts
    # (streamed stores, trained models) are keyed per input plan, so
    # the sf0.001 warm-up does not build the sf0.1/sf1 artifacts and
    # the first timed sample would otherwise pay the one-shot build
    # (self-review r14: the docstring promised this; now it happens).
    # Per-invocation-by-design queries (streaming_*_insert) simply
    # run once more — their timed samples re-execute the full ingest
    # either way, which is the measured operator.
    for name in PROBES:
        run(name, args.sf01_dir)
        run(name, args.sf1_dir)
    samples: dict[str, dict[str, list[float]]] = {
        n: {"sf0.1": [], "sf1": []} for n in PROBES
    }
    for _pass in range(args.runs):
        for name in PROBES:
            samples[name]["sf0.1"].append(run(name, args.sf01_dir))
        for name in PROBES:
            samples[name]["sf1"].append(run(name, args.sf1_dir))
    out = {}
    for name in PROBES:
        a = min(samples[name]["sf0.1"])
        b = min(samples[name]["sf1"])
        out[name] = {
            "sf0.1_sec": round(a, 2),
            "sf1_sec": round(b, 2),
            "exponent": round(math.log(b / a) / math.log(10), 3),
        }
    print(json.dumps({"probe": "sf0.1->sf1", "loadavg": os.getloadavg(),
                      "queries": out}))


if __name__ == "__main__":
    main()
