"""Deterministic sketches under the cross-engine hash gate.

The sketches a 100 TB profile actually runs — count-min (frequency)
and HyperLogLog (cardinality) — are usually exempted from exact
correctness gates because implementations differ. Here both are built
from the repo's stable 60-bit hash with EXACT integer register/cell
arithmetic, so the sketch CONTENTS (not just the query shape) are
hash-proven against DuckDB: the same discipline the suite applies to
floats (micro-units) applied to sketch state.

Why this matters at scale: both summaries are mergeable by
construction (CMS cells add; HLL registers max), which is exactly the
map-side-combinable aggregation shape Spark executes as partial aggs —
the corpus is scanned once and only the tiny summary crosses the
shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    MINHASH_PERMS,
    P,
    sql_stable_hash64,
    stable_hash64,
)

QUERIES: dict = {}
ORACLES: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import read_spread

    return read_spread(
        spark, os.path.join(sf_dir, "documents.parquet"), "doc_id"
    )


# --- count-min sketch ------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # counters per row
CMS_T = 200    # candidate cut: tokens with exact count >= T are reported


def _cms_col(r: int, tok):
    """Row-r counter index for a token: an independent permuted hash
    (the MinHash permutation constants) reduced mod CMS_W. Both
    engines compute the identical integer."""
    a, b = MINHASH_PERMS[r]
    return ((F.lit(a) * (stable_hash64(tok) % F.lit(P)) + F.lit(b)) % F.lit(P)) % CMS_W


def _sql_cms_col(r: int, expr: str) -> str:
    a, b = MINHASH_PERMS[r]
    return f"((({a} * ({sql_stable_hash64(expr)} % {P}) + {b}) % {P}) % {CMS_W})"


def q_token_cms(spark, sf_dir):
    """Count-min sketch over the corpus token stream, with the sketch
    itself under the hash gate: every heavy token (exact count >=
    CMS_T) is reported with its exact count, its CMS estimate (min
    over CMS_D counters), and the overestimate — which the CMS
    guarantee bounds by eps*N with probability 1-delta
    (eps = e/CMS_W, delta = e^-CMS_D).

    Plan at 100 TB: ONE pass over tokens (the exact per-token counts,
    map-side combinable); the CMS_D-way hash fan-out then runs over
    the vocabulary-sized count table, not the corpus stream, and the
    cell rollup lands on at most CMS_D*CMS_W = 4096 cells. The
    estimate join broadcasts the finished sketch. Merging two
    corpora's sketches is cell-wise addition — the property that lets
    profile jobs run per-partition and combine."""
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(F.split("text", " ")).alias("w"))
    # ONE corpus pass: the per-token exact counts; the CMS cells then
    # derive from this vocabulary-sized table (cell count = sum of
    # counts of tokens hashing there — identical values to hashing
    # the raw stream, at vocab cost instead of corpus cost x CMS_D).
    tok_counts = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    cells = (
        tok_counts.select(
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_col(r, F.col("w")).alias("c"),
                        )
                        for r in range(CMS_D)
                    ]
                )
            ).alias("rc"),
        )
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.sum("exact_cnt").cast("long").alias("cnt"))
    )
    heavy = tok_counts.filter(F.col("exact_cnt") >= CMS_T)
    probes = heavy.select(
        "w", "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_col(r, F.col("w")).alias("c"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select("w", "exact_cnt", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("w")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("cnt").cast("long").alias("cms_est"),
        )
        .select(
            F.col("w").alias("token"), "exact_cnt", "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long")
            .alias("overestimate"),
        )
    )


def _cms_oracle() -> str:
    cell_rows = " UNION ALL ".join(
        f"SELECT w, {r} AS r, {_sql_cms_col(r, 'w')} AS c FROM toks"
        for r in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT w, exact_cnt, {r} AS r, {_sql_cms_col(r, 'w')} AS c FROM heavy"
        for r in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
rc AS ({cell_rows}),
cells AS (
  SELECT r, c, CAST(count(*) AS BIGINT) AS cnt FROM rc GROUP BY r, c
),
heavy AS (
  SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY w HAVING count(*) >= {CMS_T}
),
probes AS ({probe_rows})
SELECT p.w AS token, any_value(p.exact_cnt) AS exact_cnt,
       CAST(min(cells.cnt) AS BIGINT) AS cms_est,
       CAST(min(cells.cnt) - any_value(p.exact_cnt) AS BIGINT) AS overestimate
FROM probes p JOIN cells ON p.r = cells.r AND p.c = cells.c
GROUP BY p.w
"""


QUERIES["token_cms"] = q_token_cms
ORACLES["token_cms"] = _cms_oracle()


# --- HyperLogLog with exact-register gate ----------------------------------

HLL_P = 6                 # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 60        # stable_hash64 yields 60-bit values
HLL_W_BITS = HLL_HASH_BITS - HLL_P  # 54 suffix bits feed rho


def q_hll_users(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type — with the
    REGISTERS under the hash gate, not just the query shape: bucket =
    LOW HLL_P hash bits (h mod 64), rho = leading-zero count of the
    54-bit high quotient (h >> HLL_P) + 1 (computed as 55 -
    bit_length, an exact integer on both engines — no float log2),
    register = max rho. The dyadic sum
    sum(2^-M_j) is kept as the exact int64 sum(2^(54 - M_j)) so no
    float accumulation happens before the single final divide; the
    estimate (with the standard linear-counting small-range
    correction) is micro-floored. ``exact_users`` rides along so the
    sketch error is visible in the gated output.

    Plan at 100 TB: register building is a (type, bucket) max — fully
    map-side combinable; only 64 registers per group survive. Merging
    two corpora's registers is element-wise max — the mergeability
    that makes HLL THE distributed-cardinality structure."""
    from .relational import _events

    e = _events(spark, sf_dir)
    h = stable_hash64(F.col("user_id").cast("string"))
    bw = e.select(
        "event_type",
        "user_id",
        (h % HLL_M).alias("bucket"),
        # exact integer >> (Spark's / on longs is IEEE double division,
        # which rounds for quotients >= 2^53 — the oracle uses // so
        # both engines must compute the identical integer)
        F.shiftright(h, HLL_P).alias("wbits"),
    )
    rho = F.when(F.col("wbits") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(F.col("wbits")))
    )
    regs = (
        bw.withColumn("rho", rho.cast("long"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    # all HLL_M registers, absent buckets at 0
    types = e.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").alias("bucket"))
        )
    )
    full = grid.join(regs, ["event_type", "bucket"], "left").select(
        "event_type", "bucket",
        F.coalesce(F.col("m_j"), F.lit(0)).cast("long").alias("m_j"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    summed = full.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(1L, cast({HLL_W_BITS + 1} - m_j as int))"))
        .cast("long").alias("s_pow"),
        F.sum((F.col("m_j") == 0).cast("long")).cast("long").alias("v_zero"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(2 ** (HLL_W_BITS + 1)))
        / F.col("s_pow").cast("double")
    )
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / F.col("v_zero").cast("double")
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v_zero") > 0), lc
    ).otherwise(raw)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        summed.join(exact, "event_type")
        .select(
            "event_type", "s_pow", "v_zero",
            F.floor(est * 1000000.0).cast("long").alias("est_micro"),
            "exact_users",
        )
    )


def _hll_oracle() -> str:
    h = sql_stable_hash64("CAST(user_id AS VARCHAR)")
    # DuckDB parses bare decimal literals as DECIMAL (which overflows
    # on these magnitudes) — every float literal must be an explicit
    # DOUBLE so both engines run the identical IEEE-double formula.
    a = f"CAST({0.7213 / (1.0 + 1.079 / float(HLL_M))!r} AS DOUBLE)"
    m2 = f"CAST({float(HLL_M * HLL_M)!r} AS DOUBLE)"
    p2 = f"CAST({float(2 ** (HLL_W_BITS + 1))!r} AS DOUBLE)"
    mf = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    return f"""
WITH bw AS (
  SELECT event_type, user_id,
         {h} % {HLL_M} AS bucket,
         {h} // {HLL_M} AS wbits
  FROM events
),
rho_t AS (
  SELECT event_type, bucket,
         CASE WHEN wbits = 0 THEN {HLL_W_BITS + 1}
              ELSE {HLL_W_BITS + 1} - length(bin(wbits)) END AS rho
  FROM bw
),
regs AS (
  SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS m_j
  FROM rho_t GROUP BY event_type, bucket
),
grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) g
),
full_regs AS (
  SELECT grid.event_type, grid.bucket,
         CAST(coalesce(regs.m_j, 0) AS BIGINT) AS m_j
  FROM grid LEFT JOIN regs
    ON grid.event_type = regs.event_type AND grid.bucket = regs.bucket
),
summed AS (
  SELECT event_type,
         CAST(sum(CAST(1 AS BIGINT) << CAST({HLL_W_BITS + 1} - m_j AS INT))
              AS BIGINT) AS s_pow,
         CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
  FROM full_regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.s_pow, s.v_zero,
       CAST(floor(
         CASE WHEN ({a} * {m2} * {p2} / CAST(s_pow AS DOUBLE))
                   <= CAST(2.5 AS DOUBLE) * {HLL_M}
                   AND v_zero > 0
              THEN {mf} * ln({mf} / CAST(v_zero AS DOUBLE))
              ELSE {a} * {m2} * {p2} / CAST(s_pow AS DOUBLE)
         END * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS est_micro,
       e.exact_users
FROM summed s JOIN exact e ON s.event_type = e.event_type
"""


QUERIES["hll_users"] = q_hll_users
ORACLES["hll_users"] = _hll_oracle()
