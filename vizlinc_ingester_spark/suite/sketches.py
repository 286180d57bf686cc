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
    # r14 optimization (guide §2.4, §5): the counts table used to be
    # CONSUMED twice per action (cells fan-out + heavy probes), each
    # consumer re-running the corpus explode+groupBy; localCheckpoint
    # materializes the vocab-bounded table once — 2 corpus passes -> 1.
    tok_counts = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    ).localCheckpoint(eager=False)
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
        .localCheckpoint(eager=False)
    )
    # all HLL_M registers, absent buckets at 0.
    # r14 optimization (guide §2.4, §5): regs is bounded
    # (<= |types| x HLL_M rows) and consumed twice (type list + the
    # grid left join), so localCheckpoint pins it — the corpus
    # register sweep runs once. The type list derives from regs
    # instead of a THIRD corpus scan + full-width distinct shuffle —
    # every event type has >= 1 user, so regs carries every type.
    # 3 corpus passes -> 2 (registers + the exact countDistinct the
    # gate requires).
    types = regs.select("event_type").distinct()
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


# --- KMV (k-minimum-values) distinct sketch --------------------------------

KMV_K = 64
KMV_SALT = 16             # phase-1 buckets for the two-level top-K
_KMV_SPACE = float(2**60)  # stable_hash64 range is [0, 2^60)


def kmv_registers(typed_hashes: DataFrame) -> DataFrame:
    """(event_type, h) -> the KMV_K smallest DISTINCT hashes per type
    with k_rank, via the salted two-level selection (see q_kmv_users).
    Idempotent under duplicates, so it is ALSO the register merge:
    union any register sets and re-apply — union-then-retake-K.
    The streaming twin calls this once per micro-batch."""
    from pyspark.sql import Window

    dh = typed_hashes.distinct()
    w1 = Window.partitionBy("event_type", F.col("h") % KMV_SALT).orderBy(
        F.asc("h")
    )
    p1 = (
        dh.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= KMV_K)
        .drop("r1")
    )
    w2 = Window.partitionBy("event_type").orderBy(F.asc("h"))
    return (
        p1.withColumn("k_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("k_rank") <= KMV_K)
    )


def q_kmv_users(spark, sf_dir):
    """KMV (k-minimum-values) distinct-user sketch per event type —
    the order-statistics cardinality sketch (Bar-Yossef 2002; the
    core of Theta sketches), complementing HLL's register family:
    keep the KMV_K smallest distinct 60-bit user-id hashes; the K-th
    smallest estimates density, est = (K-1) * 2^60 / h_K (exact
    distinct count when fewer than K survive). The REGISTERS (all K
    kept hashes, ranked) are under the hash gate, plus the
    micro-floored estimate and the exact count riding along —
    the same contents-gated discipline as token_cms / hll_users.

    Why KMV next to HLL: the kept-hash set is mergeable by
    union-then-retake-K (set semantics — works under ANY partition
    or corpus split), supports set-intersection estimates HLL
    cannot (Theta), and its registers are verbatim hash values —
    directly auditable.

    Plan at 100 TB: distinct (type, h) is one map-side-combinable
    shuffle; the K-smallest selection is two-level (the
    cluster_balanced_sample discipline): rank within
    (type, h % KMV_SALT) keep K — every phase-1 window partition is
    a 1/KMV_SALT hash slice, never a whole type — then re-rank the
    <= KMV_SALT*K survivors per type (bounded by construction). The
    global K smallest are contained in the union of per-slice K
    smallest, so the result is identical to the oracle's direct
    global rank. Only the final float division leaves integer space,
    micro-floored with the identical literal sequence both engines."""
    from .relational import _events

    e = _events(spark, sf_dir)
    h = stable_hash64(F.col("user_id").cast("string"))
    kept = kmv_registers(e.select("event_type", h.alias("h")))
    return kmv_finalize(kept, e)


def kmv_finalize(kept: DataFrame, events: DataFrame) -> DataFrame:
    """Registers -> gated output: estimate from h_K (or the exact
    small-set branch), plus the exact_users verification rider
    recomputed over ``events``.

    r14 optimization (guide §2.4, §5): ``kept`` is consumed twice
    (the summary rollup AND the output join), re-running the whole
    register lineage — for the batch query that was the corpus
    distinct+rank sweep twice per action. The register set is
    bounded (<= |types| x KMV_K rows), so localCheckpoint pins it;
    one registers pass + the exact countDistinct pass remain."""
    kept = kept.localCheckpoint(eager=False)
    summ = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("h_max"),
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(_KMV_SPACE)
        / F.col("h_max").cast("double")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        kept.join(summ, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "k_rank",
            F.col("h").alias("kmv_hash"),
            F.floor(est * 1000000.0).cast("long").alias("est_micro"),
            "exact_users",
        )
    )


def _kmv_oracle() -> str:
    h = sql_stable_hash64("CAST(user_id AS VARCHAR)")
    km1 = f"CAST({float(KMV_K - 1)!r} AS DOUBLE)"
    space = f"CAST({_KMV_SPACE!r} AS DOUBLE)"
    # oracle states the semantics directly: global K smallest per type
    # (the Spark two-level form is contained-in-union identical)
    return f"""
WITH dh AS (
  SELECT DISTINCT event_type, {h} AS h FROM events
),
kept AS (
  SELECT event_type, h,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY h ASC) AS BIGINT) AS k_rank
  FROM dh QUALIFY k_rank <= {KMV_K}
),
summ AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         max(h) AS h_max
  FROM kept GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
)
SELECT k.event_type, k.k_rank, k.h AS kmv_hash,
       CAST(floor(
         CASE WHEN s.n_kept < {KMV_K} THEN CAST(s.n_kept AS DOUBLE)
              ELSE {km1} * {space} / CAST(s.h_max AS DOUBLE)
         END * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS est_micro,
       e.exact_users
FROM kept k
JOIN summ s ON k.event_type = s.event_type
JOIN exact e ON k.event_type = e.event_type
"""


QUERIES["kmv_users"] = q_kmv_users
ORACLES["kmv_users"] = _kmv_oracle()


# --- Bloom filter with exact-word gate -------------------------------------

BLOOM_M = 1024                  # bits
BLOOM_W = BLOOM_M // 32         # 32 words of 32 bits (no sign-bit shifts)
BLOOM_D = 3                     # hash functions (MinHash perms 0..2)
BLOOM_PROBE_N = 32              # low probe ids 0..31 (present at sf>=0.01)
BLOOM_ABSENT_BASE = 1_000_000_000  # +32 ids absent at EVERY sf


def _bloom_bit(r: int, key):
    """Bit index of hash r for a key — the CMS row-hash construction
    reduced mod BLOOM_M; both engines compute the identical integer."""
    a, b = MINHASH_PERMS[r]
    return (
        (F.lit(a) * (stable_hash64(key) % F.lit(P)) + F.lit(b)) % F.lit(P)
    ) % BLOOM_M


def _sql_bloom_bit(r: int, expr: str) -> str:
    a, b = MINHASH_PERMS[r]
    return (
        f"((({a} * ({sql_stable_hash64(expr)} % {P}) + {b}) % {P})"
        f" % {BLOOM_M})"
    )


def q_bloom_users(spark, sf_dir):
    """Bloom membership filter over the distinct user-id set — the
    third sketch family next to CMS (frequency) and HLL/KMV
    (cardinality): BLOOM_M=1024 bits as BLOOM_W=32 words of 32 low bits each (packing stops at bit 31 so neither engine ever shifts into the int64 sign bit, which DuckDB rejects as overflow),
    BLOOM_D=3 bits per key from the CMS permuted-hash construction.
    Contents-gated by the token_cms probe discipline: a fixed probe
    id set (0..31 — present from sf0.01 up — plus 32 ids offset by
    BLOOM_ABSENT_BASE that are absent at EVERY sf) is tested
    against the filter — ``bloom_hit`` (all D bits set) vs
    ``exact_present`` exposes real false positives in the gated rows
    — and ``n_bits_set`` (popcount over all words) rides along as a
    digest of the full register state.

    Plan at 100 TB: distinct keys -> D (word, mask) rows each ->
    ``bit_or`` per word: map-side combinable, <= BLOOM_W rows cross
    the shuffle at any corpus size; merging corpora is word-wise OR
    (tests/test_sketches.py pins split-invariance). The probe join
    broadcasts the BLOOM_W-word (32-word) filter. Spark's own join-time bloom
    (InjectRuntimeFilter) is this exact structure — here it is a
    queryable, mergeable artifact."""
    from .relational import _events

    e = _events(spark, sf_dir)
    # r14 optimization (guide §2.4): no .distinct() before the word
    # fold or the membership probe — bit_or is idempotent and the
    # probe is a semi-join, so duplicate keys change NO value, while
    # the distinct's full-key exchange was the only corpus-sized
    # shuffle in the query.
    keys = e.select(F.col("user_id").cast("string").alias("k"))
    return bloom_finalize(bloom_words(keys), keys, e.sparkSession)


def bloom_words(keys: DataFrame) -> DataFrame:
    """String keys -> the filter's (word_idx, bits) words (duplicate
    keys are harmless: bit_or is idempotent). Words from any key
    subsets merge by word-wise bit_or — the streaming twin folds
    per-batch words into its store this way.

    r14 optimization (guide §2.4): the BLOOM_D bit rows come from ONE
    in-row explode instead of a BLOOM_D-way union — the union form
    re-evaluated the whole ``keys`` subtree once per hash function
    (3 corpus passes for one filter build). Multiset-identical bit
    stream, and the per-word rollup stays map-side combinable
    (<= BLOOM_W rows cross the shuffle at any corpus size)."""
    bits = keys.select(
        F.explode(
            F.array(*[_bloom_bit(r, F.col("k")) for r in range(BLOOM_D)])
        ).alias("bit")
    )
    return (
        bits.select(
            F.expr("bit div 32").cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_finalize(words: DataFrame, keys: DataFrame, spark) -> DataFrame:
    """Filter words + the exact key set -> the gated probe table.

    r14 optimization (guide §2.4, §3.1): the words relation used to be
    consumed TWICE (the popcount aggregate and the probe join — two
    full evaluations of the corpus word-fold lineage per action); it
    now folds once into a single broadcast row carrying the word map
    AND the popcount. The exact-presence semi-join is flipped so the
    broadcast side is the fixed 64-row probe set (the old form had
    the corpus-sized key relation on the right of a left-semi, an
    unbroadcastable shuffle join). Values unchanged: element_at on
    the map is the old left-join NULL semantics, the semi-join +
    distinct is duplicate-insensitive."""
    frow = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("wmap"),
        F.sum(F.expr("bit_count(bits)")).cast("long").alias("n_bits_set"),
    )
    lows = spark.range(BLOOM_PROBE_N)
    probes = (
        lows.unionByName(
            lows.select((F.col("id") + BLOOM_ABSENT_BASE).alias("id"))
        ).select(F.col("id").alias("probe_id"))
    )
    pk = F.col("probe_id").cast("string")
    pbits = probes.select(
        "probe_id",
        F.explode(
            F.array(*[_bloom_bit(r, pk) for r in range(BLOOM_D)])
        ).alias("bit"),
    )
    wbits = F.expr("element_at(wmap, word_idx)")
    hit = (
        pbits.select(
            "probe_id",
            F.expr("bit div 32").cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))"
            ).alias("mask"),
        )
        .crossJoin(F.broadcast(frow))
        .select(
            "probe_id",
            "n_bits_set",
            F.when(
                wbits.isNotNull()
                & (wbits.bitwiseAND(F.col("mask")) == F.col("mask")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("b"),
        )
        .groupBy("probe_id")
        .agg(
            (F.min("b") == 1).cast("long").alias("bloom_hit"),
            F.min("n_bits_set").alias("n_bits_set"),
        )
    )
    exact = (
        keys.select(F.col("k").cast("long").alias("probe_id"))
        .join(F.broadcast(probes), "probe_id", "left_semi")
        .distinct()
        .select("probe_id", F.lit(1).cast("long").alias("exact_present"))
    )
    return (
        hit.join(F.broadcast(exact), "probe_id", "left")
        .select(
            "probe_id",
            "bloom_hit",
            F.coalesce(F.col("exact_present"), F.lit(0).cast("long")).alias(
                "exact_present"
            ),
            (
                (F.col("bloom_hit") == 1)
                & (F.coalesce(F.col("exact_present"), F.lit(0)) == 0)
            )
            .cast("long")
            .alias("false_positive"),
            "n_bits_set",
        )
    )


def _bloom_oracle() -> str:
    key = "CAST(user_id AS VARCHAR)"
    bit_rows = " UNION ALL ".join(
        f"SELECT {_sql_bloom_bit(r, 'k')} AS bit FROM dk" for r in range(BLOOM_D)
    )
    probe_bits = " UNION ALL ".join(
        f"SELECT probe_id, {_sql_bloom_bit(r, 'CAST(probe_id AS VARCHAR)')} AS bit"
        " FROM probes"
        for r in range(BLOOM_D)
    )
    return f"""
WITH dk AS (SELECT DISTINCT {key} AS k FROM events),
bits AS ({bit_rows}),
words AS (
  SELECT CAST(bit // 32 AS BIGINT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS bits
  FROM bits GROUP BY 1
),
nset AS (SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS n_bits_set FROM words),
probes AS (
  SELECT unnest(range(0, {BLOOM_PROBE_N})) AS probe_id
  UNION ALL
  SELECT unnest(range({BLOOM_ABSENT_BASE},
                      {BLOOM_ABSENT_BASE} + {BLOOM_PROBE_N})) AS probe_id
),
pbits AS ({probe_bits}),
hit AS (
  SELECT p.probe_id,
         CAST(min(CASE WHEN w.bits IS NOT NULL
                        AND (w.bits & (CAST(1 AS BIGINT)
                                       << CAST(p.bit % 32 AS INT)))
                            = (CAST(1 AS BIGINT)
                               << CAST(p.bit % 32 AS INT))
                       THEN 1 ELSE 0 END) = 1 AS BIGINT) AS bloom_hit
  FROM pbits p LEFT JOIN words w ON CAST(p.bit // 32 AS BIGINT) = w.word_idx
  GROUP BY p.probe_id
),
exact AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS probe_id,
         CAST(1 AS BIGINT) AS exact_present
  FROM events
)
SELECT h.probe_id, h.bloom_hit,
       CAST(coalesce(e.exact_present, 0) AS BIGINT) AS exact_present,
       CAST(CASE WHEN h.bloom_hit = 1 AND e.exact_present IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS false_positive,
       n.n_bits_set
FROM hit h LEFT JOIN exact e ON h.probe_id = e.probe_id
CROSS JOIN nset n
"""


QUERIES["bloom_users"] = q_bloom_users
ORACLES["bloom_users"] = _bloom_oracle()


# --- equi-width histogram with gated cells + quantile estimate -------------

HIST_B = 64  # buckets per event type


def q_value_histogram(spark, sf_dir):
    """Equi-width value histogram per event type with the CELLS under
    the hash gate, plus an exact-integer median estimate read off the
    cumulative histogram and the true interpolated median riding
    along — the mergeable-quantiles structure (t-digest's gateable
    cousin: given shared bounds, histograms merge by cell-wise add,
    so profile jobs run per-partition and combine; the
    ``events_approx_profile`` t-digest's cluster state is
    engine-defined, so it gates integer ACCEPTANCE columns against
    its published rank-error bound, while THIS sketch is exact).

    Algebra (both engines, all int64): cents = round(value*100);
    per-type bounds lo/hi are exact min/max; bucket =
    least(B-1, (cents-lo)*B div (hi-lo+1)); estimate = midpoint of
    the first bucket whose cumulative count reaches (n+1) div 2.
    Two corpus passes (bounds, then counts — the price of shared
    bounds, which mergeability requires); the cumulative window runs
    per type over <= HIST_B rows, bounded by construction."""
    from pyspark.sql import Window

    from .relational import _events

    e = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # r14 optimization (guide §2.4, §5): bounds is consumed FOUR
    # times (bucket index, cum join, est, final output) and cells
    # twice (cum chain + output) — each broadcast branch re-evaluated
    # its corpus rollup. Both are bounded (|types| rows; |types| x
    # HIST_B cells), so localCheckpoint pins them: the corpus is
    # bucketed once and bounded once, plus the exact-percentile
    # rider's own pass.
    bounds = e.groupBy("event_type").agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    ).localCheckpoint(eager=False)
    w_expr = "(hi - lo + 1)"
    idx = F.expr(
        f"least({HIST_B - 1}, ((cents - lo) * {HIST_B}) div {w_expr})"
    ).cast("long")
    cells = (
        e.join(F.broadcast(bounds), "event_type")
        .select("event_type", idx.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("cum", F.sum("cnt").over(wcum))
    med_bucket = (
        cum.join(F.broadcast(bounds), "event_type")
        .filter(F.col("cum") >= F.expr("(n_total + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("bucket").alias("m_idx"))
    )
    est = med_bucket.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.expr(
            f"lo + (m_idx * {w_expr}) div {HIST_B}"
            f" + ({w_expr} div {HIST_B}) div 2"
        ).cast("long").alias("est_p50_cents"),
    )
    exact = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.floor(F.expr("percentile(cents, 0.5)") * 1000000.0)
            .cast("long")
            .alias("exact_p50_micro")
        )
    )
    return (
        cells.join(F.broadcast(bounds), "event_type")
        .join(F.broadcast(est), "event_type")
        .join(F.broadcast(exact), "event_type")
        .select(
            "event_type", "bucket", "cnt",
            F.col("lo").alias("lo_cents"), F.col("hi").alias("hi_cents"),
            "n_total", "est_p50_cents", "exact_p50_micro",
        )
    )


def _hist_oracle() -> str:
    w_expr = "(hi - lo + 1)"
    return f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
bounds AS (
  SELECT event_type, min(cents) AS lo, max(cents) AS hi,
         CAST(count(*) AS BIGINT) AS n_total
  FROM c GROUP BY event_type
),
cells AS (
  SELECT c.event_type,
         CAST(least({HIST_B - 1},
                    ((cents - lo) * {HIST_B}) // {w_expr}) AS BIGINT)
           AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c JOIN bounds USING (event_type)
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
  FROM cells
),
med AS (
  SELECT cum.event_type, min(bucket) AS m_idx
  FROM cum JOIN bounds ON cum.event_type = bounds.event_type
  WHERE cum >= (n_total + 1) // 2
  GROUP BY 1
),
est AS (
  SELECT med.event_type,
         CAST(lo + (m_idx * {w_expr}) // {HIST_B}
              + ({w_expr} // {HIST_B}) // 2 AS BIGINT) AS est_p50_cents
  FROM med JOIN bounds ON med.event_type = bounds.event_type
),
exact AS (
  SELECT event_type,
         CAST(floor(quantile_cont(cents, 0.5) * 1000000.0) AS BIGINT)
           AS exact_p50_micro
  FROM c GROUP BY event_type
)
SELECT cells.event_type, bucket, cnt, lo AS lo_cents, hi AS hi_cents,
       n_total, est_p50_cents, exact_p50_micro
FROM cells
JOIN bounds ON cells.event_type = bounds.event_type
JOIN est ON cells.event_type = est.event_type
JOIN exact ON cells.event_type = exact.event_type
"""


QUERIES["value_histogram"] = q_value_histogram
ORACLES["value_histogram"] = _hist_oracle()
