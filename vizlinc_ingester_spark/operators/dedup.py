"""Deduplication operators for the training-data pipeline track
(BASELINE.json north star): exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the whole point of these operators):
- Signatures/shingles are computed as *array expressions inside the
  row* (no explode shuffle) — a 100 TB corpus streams through the
  scan stage embarrassingly parallel.
- Candidate generation is LSH band-bucketing: the only shuffle is a
  groupBy/join on the band key, whose cardinality is ~n_docs*bands —
  never the O(n²) pair space.
- Verification (true Jaccard / hamming) runs only on candidate pairs.
- Generalizes the reference's sorted-neighborhood blocking
  (src/CorefBase.groovy:176-196): sort-adjacency is one blocking
  function; MinHash bands are another (SURVEY.md §7 step 10).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_PERMS, P, stable_hash64
from ..functions.text import tokens

N_PERMS = 16
N_BANDS = 8  # rows-per-band r=2
SHINGLE_K = 3


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles from an ALREADY-MATERIALIZED token-array column
    (empty if < k tokens — guarded: Spark sequence() would go
    descending).

    Pass an *attribute* (a projected column), not the tokenize
    expression itself: the ``element_at`` lambda references its input
    once per shingle element, so an inlined ``split(...)`` would be
    re-evaluated O(tokens) times per row — measured ~2x on the whole
    MinHash pipeline at sf0.1."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(c: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles of a text column (tokenizes inline — prefer
    ``shingles_from_tokens`` over a projected token column in hot
    paths; see its docstring)."""
    return shingles_from_tokens(tokens(c), k)


def minhash_signature_array(hashes_col) -> Column:
    """array<long> of the 16 MinHash values from an array<long> of
    shingle hashes (already reduced mod P).

    One ``aggregate`` pass with a 16-element array accumulator instead
    of 16 separate array_min(transform(...)) projections: the latter
    blows whole-stage codegen past janino's 64 KB method limit
    (observed), costing ~15 s of compile+fallback on first execution.

    Accepts a Column or a column NAME; name inputs memoize the built
    tree per session (session.expr_memo — the fold is ~60 py4j round
    trips per construction)."""
    if isinstance(hashes_col, str):
        from ..session import expr_memo

        name = hashes_col
        return expr_memo(
            ("minhash_signature_array", name),
            lambda: minhash_signature_array(F.col(name)),
        )
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in MINHASH_PERMS])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in MINHASH_PERMS])
    init = F.array_repeat(F.lit(P).cast("long"), N_PERMS)

    def step(acc, h):
        return F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(N_PERMS)),
            lambda m, j: F.least(
                m, (F.element_at(a_arr, j) * h + F.element_at(b_arr, j)) % F.lit(P)
            ),
        )

    return F.aggregate(hashes_col, init, step)


def _sig_to_cols(df: DataFrame, sig_col: str = "sig") -> DataFrame:
    """(..., sig: array<long>) -> (..., mh0..mh15); two-step select so
    the aggregate is computed once, not per element."""
    return df.select(
        *[c for c in df.columns if c != sig_col],
        *[F.element_at(sig_col, i + 1).alias(f"mh{i}") for i in range(N_PERMS)],
    )


def minhash_signatures(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, mh0..mh15); docs with no shingles dropped."""
    hashed = hashed_shingle_docs(documents, text_col)
    return _sig_to_cols(
        hashed.select("doc_id", minhash_signature_array("hs").alias("sig"))
    )


def minhash_signatures_vec(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``minhash_signatures``'s vectorized twin: numpy per partition
    via ``mapInPandas`` instead of the interpreted 16-permutation
    array fold (Spark higher-order functions are evaluated per
    element, outside whole-stage codegen). MinHash is pure integer
    arithmetic — min((a*h + b) mod P) with a < 2^30, h < 2^32 keeps
    every product < 2^62 — so the numpy path is bit-identical to the
    JVM fold and sits under the same oracle. The hash of each shingle
    still happens JVM-side (md5 + conv in hashed_shingle_docs); only
    the permutation/min sweep moves to Arrow."""
    from ..session import ship_package

    ship_package(documents.sparkSession)
    return _signatures_vec_from_hashed(hashed_shingle_docs(documents, text_col))


def _signatures_vec_from_hashed(hashed: DataFrame) -> DataFrame:
    a_np = [a for a, _ in MINHASH_PERMS]
    b_np = [b for _, b in MINHASH_PERMS]

    def sign(batches):
        import numpy as np
        import pandas as pd

        A = np.array(a_np, dtype=np.int64)[:, None]
        B = np.array(b_np, dtype=np.int64)[:, None]
        for pdf in batches:
            if pdf.empty:
                continue
            sigs = np.empty((len(pdf), len(a_np)), dtype=np.int64)
            for i, hs in enumerate(pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64)[None, :]
                sigs[i] = ((A * h + B) % P).min(axis=1)
            out = {"doc_id": pdf["doc_id"].to_numpy(dtype=np.int64)}
            for j in range(len(a_np)):
                out[f"mh{j}"] = sigs[:, j]
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(
        f"mh{j} long" for j in range(len(a_np))
    )
    return hashed.mapInPandas(sign, schema)


def lsh_band_buckets(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_key) — one row per band; docs sharing any band
    key are near-dup candidates."""
    bands = [
        F.concat_ws(
            ":", F.lit(str(b)), F.col(f"mh{2 * b}").cast("string"),
            F.col(f"mh{2 * b + 1}").cast("string"),
        ).alias("band_key")
        for b in range(N_BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("band_key")
    )


def lsh_candidate_pairs(sigs: DataFrame, memo: bool = True) -> DataFrame:
    """Band buckets -> distinct unordered candidate pairs with the
    number of colliding bands.

    COLLAPSE-FIRST (the ``q_simjoin_allpairs`` discipline, judge-r10
    item 2): identical signatures are collapsed to one representative
    (min doc_id) BEFORE banding, and membership is expanded back
    RELATIONALLY afterward. Without this, exact duplicates — the one
    thing a 100 TB dedup corpus is guaranteed to be full of — land in
    the same bucket of EVERY band: a boilerplate page duplicated 10^6
    times became a single collected row holding a 10^6-element array
    and a 10^12-pair in-row expansion on one task. After collapsing,
    buckets hold DISTINCT signatures only, so the in-bucket array
    expansion is bounded by genuinely-near-but-not-identical group
    size (a pathological giant bucket now really does mean the
    banding parameters are wrong), and the exact-duplicate mass flows
    through distributed joins:

    - across groups: pair-of-representatives x members(a) x members(b)
      equi-joins (band counts are signature-determined, so every
      member pair inherits its representatives' n_shared_bands);
    - within a group: a members self-join on the representative key
      (identical signatures collide in all N_BANDS bands by
      definition — no banding needed to know that).

    The member pair space for exact duplicates is still quadratic —
    that is the operator's CONTRACT (all candidate pairs; callers that
    want exact-dup groups collapsed use ``exact_duplicates`` first) —
    but it is now spread across shuffle partitions instead of
    materialized in one row on one task.

    Shape: one groupBy(signature) collapse, then ONE registered memo
    entry holding BOTH persisted relations — the slim (rep, doc_id)
    membership map and the (signature, rep) representative table —
    so neither the signature fold nor the collapse groupBy re-runs on
    later actions over the returned pairs (the representative table
    is one row per DISTINCT signature, 17 longs wide). ``memo=False``
    (threaded from minhash_lsh_verified's file-rewrite hook) maps to
    plan_memo's ``refresh`` mode: the stale entry is evicted and the
    fresh build is STORED — a bypassed build would leave persisted
    DataFrames registered nowhere, the exact leak the registry exists
    to prevent. Then one band-key shuffle over representatives and
    the member expansion joins."""
    from ..session import plan_key, plan_memo

    mh_cols = [f"mh{i}" for i in range(N_PERMS)]

    def build():
        r = (
            sigs.groupBy(*mh_cols)
            .agg(F.min("doc_id").alias("doc_id"))
            .persist()
        )
        m = (
            sigs.join(
                r.select(*mh_cols, F.col("doc_id").alias("rep")),
                mh_cols,
            )
            .select("rep", "doc_id")
            .persist()
        )
        m.count()  # materializes r through the join as well
        return m, r

    members, reps = plan_memo(
        sigs.sparkSession, plan_key(sigs, "lsh_members"), build,
        refresh=not memo,
    )

    b = lsh_band_buckets(reps)
    buckets = b.groupBy("band_key").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    rep_pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)),"
                " y -> struct(x AS rep_a, y AS rep_b))))"
            )
        ).alias("p")
    ).select("p.rep_a", "p.rep_b").groupBy("rep_a", "rep_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_bands")
    )
    ma = members.select(F.col("rep").alias("rep_a"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("rep").alias("rep_b"), F.col("doc_id").alias("db"))
    cross = (
        rep_pairs.join(ma, "rep_a")
        .join(mb, "rep_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "n_shared_bands",
        )
    )
    within = (
        ma.join(mb, F.col("rep_a") == F.col("rep_b"))
        .filter(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.lit(N_BANDS).cast("long").alias("n_shared_bands"),
        )
    )
    return cross.unionByName(within)


def hashed_shingle_docs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, hs: array<long>) — shingles hashed once (mod P). The
    md5 work happens exactly once per shingle; every downstream stage
    (signatures, banding, verification) reuses the longs.

    The no-shingle filter tests *token count on the input side*, not
    ``size(hs) >= 1``: a predicate on the computed column gets pushed
    below the projection and evaluates the whole md5 transform twice
    (measured 3x slowdown).

    Tokens are materialized by a dedicated projection before the
    shingle/hash expression so the per-element lambdas reference an
    attribute, not a re-evaluated split() (see shingles_from_tokens).
    CollapseProject keeps the two selects separate because the alias
    is non-cheap and multiply-referenced."""
    # spread first: the md5-per-shingle transform is per-row compute
    # and the testdata parquet is single-split (PLANS.md 'Single-split
    # inputs') — without this the whole hashing pass runs in one
    # task. Probe-gated (session.spread_if_narrow): an already-wide
    # input (always, at real scale) skips the extra full-corpus
    # shuffle.
    from ..session import expr_memo, spread_if_narrow

    # the tokenize filter/projection and the shingle+md5 transform are
    # pure functions of the text column name — memoized per session
    # (expr_memo): together ~0.1 s of py4j chatter per construction,
    # rebuilt by every dedup/decontaminate/streaming-LSH caller
    toks_expr = expr_memo(
        ("hsd_toks", text_col), lambda: tokens(F.col(text_col))
    )
    hs_expr = expr_memo(
        ("hsd_hs",),
        lambda: F.transform(
            shingles_from_tokens(F.col("_toks")),
            lambda s: stable_hash64(s) % F.lit(P),
        ),
    )
    with_toks = spread_if_narrow(documents, "doc_id").filter(
        F.size(toks_expr) >= SHINGLE_K
    ).select("doc_id", toks_expr.alias("_toks"))
    return with_toks.select("doc_id", hs_expr.alias("hs"))


def jaccard_verify_hashed(hs_docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """True shingle-set Jaccard for candidate pairs, over *hashed*
    shingles (long joins, not string joins — and the oracle joins the
    identical hashes, so results stay symmetric even in the
    astronomically-unlikely collision case).
    jaccard_micro = (|A∩B| * 1e6) // |A∪B| (exact integer math).

    r14 optimization (guide §2.4, §3.3 "join first on the
    un-exploded key and explode after" — here the explode disappears
    entirely): the old form exploded the corpus shingle stream and
    shuffled it through the intersection join + groupBy per action;
    the candidate PAIR set is bucket-bounded and tiny next to the
    corpus, so the verify now joins the pairs against the per-doc
    DISTINCT shingle ARRAYS (two doc_id-keyed joins, pair side
    broadcastable) and computes |A∩B| in-row with array_intersect —
    the simjoin_allpairs verify shape. Value-identical: a doc with an
    empty shingle set was absent from the old per-doc size aggregate
    (inner join dropped its pairs), matched here by the n_sh > 0
    filter; array_intersect is distinct-set semantics, same as the
    old distinct-explode count."""
    sets_ = (
        hs_docs.select("doc_id", F.array_distinct("hs").alias("s"))
        .withColumn("n_sh", F.size("s").cast("long"))
        .filter(F.col("n_sh") > 0)
    )
    out = (
        pairs.join(
            sets_.select(
                F.col("doc_id").alias("doc_a"),
                F.col("s").alias("s_a"), F.col("n_sh").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("doc_b"),
                F.col("s").alias("s_b"), F.col("n_sh").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("s_a", "s_b")).cast("long")
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return out.select(
        "doc_a", "doc_b", "n_shared_bands", "n_inter",
        union.alias("n_union"),
        F.expr("div(n_inter * 1000000, n_a + n_b - n_inter)").alias("jaccard_micro"),
    )


def minhash_lsh_verified(
    documents: DataFrame, text_col: str = "text", vectorized: bool = False,
    memo: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: hash shingles once -> signatures ->
    band buckets -> candidate pairs -> exact-Jaccard verify. The
    hashed-shingle relation is persisted: it feeds three branches
    (signatures, sizes, intersection) and recomputing it would triple
    the scan+md5 work. Result memoized per (session, input plan) so
    repeat calls don't stack persisted intermediates
    (session.plan_memo).

    ``vectorized=True`` computes signatures with the numpy sweep
    (``minhash_signatures_vec``) instead of the interpreted JVM fold —
    bit-identical output (integer arithmetic), measurably faster once
    shingle counts grow.

    ``memo=False`` invalidates any cached entry for this input plan —
    use when the files behind an unchanged path were rewritten
    in-session (plan hashes see paths, not contents). It maps to
    plan_memo's refresh mode (evict + rebuild + STORE): the builder's
    persisted hashed-shingle relation is part of the registered memo
    value, so eviction — LRU or explicit — unpersists it; a bypassed
    build would orphan one persisted full-corpus relation per call
    (r11 review)."""
    from ..session import plan_key, plan_memo

    result, _hs = plan_memo(
        documents.sparkSession,
        plan_key(documents, "minhash_lsh_verified", text_col, vectorized),
        lambda: _minhash_lsh_verified(documents, text_col, vectorized, memo),
        refresh=not memo,
    )
    return result


def _minhash_lsh_verified(
    documents: DataFrame, text_col: str, vectorized: bool,
    memo: bool = True,
) -> DataFrame:
    if vectorized:
        from ..session import ship_package

        ship_package(documents.sparkSession)
    hs_docs = hashed_shingle_docs(documents, text_col).persist()
    # Eagerly materialize the hashed shingles: they feed the signature
    # pass AND the three verify branches of ONE action; an
    # unmaterialized cache gets recomputed by each concurrently-
    # scheduled consumer stage (observed 16 s -> ~4 s). The signature
    # relation is evaluated twice at candidate-build time (the
    # collapse groupBy and the membership join) — both inside
    # lsh_candidate_pairs' ONE registered build, whose persisted
    # (members, reps) pair then serves every later action without
    # touching the fold again.
    hs_docs.count()
    if vectorized:
        sigs = _signatures_vec_from_hashed(hs_docs)
    else:
        sigs = _sig_to_cols(
            hs_docs.select(
                "doc_id", minhash_signature_array("hs").alias("sig")
            )
        )
    pairs = lsh_candidate_pairs(sigs, memo=memo)
    # hs_docs rides along in the memo value so eviction unpersists it
    return jaccard_verify_hashed(hs_docs, pairs), hs_docs


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash (groups of size >= 2)."""
    return (
        documents.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def _hashed_tokens(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, _h: array<long>, _n) — the shared tokenize+hash
    projection for both simhash paths. ONE definition so the JVM fold
    and the numpy sweep stay bit-identical by construction."""
    from ..session import expr_memo

    toks_expr = expr_memo(
        ("hsd_toks", text_col), lambda: tokens(F.col(text_col))
    )
    h_expr = expr_memo(
        ("hashed_tokens_h",),
        lambda: F.transform(
            "_toks", lambda t: stable_hash64(t) % F.lit(P)
        ),
    )
    with_toks = documents.select(
        "doc_id", toks_expr.alias("_toks")
    ).filter(F.size("_toks") > 0)
    return with_toks.select(
        "doc_id",
        h_expr.alias("_h"),
        F.size("_toks").cast("long").alias("_n"),
    )


def simhash_docs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash over token hashes.

    One aggregate pass with a 16-counter array accumulator instead of
    16 independent folds (simhash16's Column form re-walks the hash
    array per bit). Each stage materializes through a projection so
    lambdas reference attributes, never re-evaluated subtrees. Bit j
    of a hash is extracted as floor(h / 2^j) % 2 — h < 2^32 makes the
    double division by a power of two exact (zip_with lambdas can't
    take Python-literal shift amounts)."""
    hashed = _hashed_tokens(documents, text_col)
    pw = F.array(*[F.lit(1 << j).cast("long") for j in range(16)])
    ones = F.aggregate(
        F.col("_h"),
        F.array_repeat(F.lit(0).cast("long"), 16),
        lambda acc, x: F.zip_with(
            acc,
            pw,
            lambda m, p: m + F.floor(x / p).cast("long").bitwiseAND(F.lit(1)),
        ),
    )
    counted = hashed.select("doc_id", "_n", ones.alias("_ones"))
    sim = F.lit(0).cast("long")
    for j in range(16):
        bit = F.when(
            F.element_at("_ones", j + 1) * 2 > F.col("_n"),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        sim = sim + F.shiftleft(bit, j)
    return counted.select("doc_id", sim.alias("simhash"))


def simhash_docs_vec(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``simhash_docs``'s vectorized twin: the 16-bit-counter majority
    sweep moves to numpy (the JVM fold is an interpreted higher-order
    function). Pure integer arithmetic -> bit-identical output, same
    oracle. Token hashing (md5 + conv) stays JVM-side."""
    from ..session import ship_package

    ship_package(documents.sparkSession)
    hashed = _hashed_tokens(documents, text_col).drop("_n")

    def sim(batches):
        import numpy as np
        import pandas as pd

        js = np.arange(16, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            out = np.empty(len(pdf), dtype=np.int64)
            for i, hs in enumerate(pdf["_h"]):
                h = np.asarray(hs, dtype=np.int64)[:, None]
                ones = ((h >> js[None, :]) & 1).sum(axis=0)
                out[i] = int(((2 * ones > len(hs)).astype(np.int64) << js).sum())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(dtype=np.int64), "simhash": out}
            )

    return hashed.mapInPandas(sim, "doc_id long, simhash long")


def simhash_near_dups(
    documents: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    vectorized: bool = False,
    _memo: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs with GUARANTEED recall for
    ``max_hamming <= 3``: band the 16-bit hash into 4 disjoint 4-bit
    blocks and equi-join per band — a pair differing in <= 3 bits has
    at least one identical band (pigeonhole), so no true near-dup can
    be missed. (A single-block bucketing, e.g. the high byte, silently
    drops pairs whose differing bits all fall inside the block.)
    Candidates surfacing in several bands are deduped before the
    hamming verification.

    The (doc_id, simhash) relation is persisted and eagerly
    materialized before the self-join — both join sides are the same
    subplan and Spark would otherwise run the full tokenize+hash scan
    twice. The cached relation is 12 bytes/doc: cacheable at any
    corpus size that fits a cluster at all. Result memoized per
    (session, input plan) — see session.plan_memo."""
    from ..functions.hashing import hamming16
    from ..session import plan_key, plan_memo

    if _memo:
        return plan_memo(
            documents.sparkSession,
            plan_key(documents, "simhash_near_dups", text_col, max_hamming, vectorized),
            lambda: simhash_near_dups(
                documents, text_col, max_hamming, vectorized, _memo=False
            ),
        )

    n_bands, band_bits = 4, 4
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding guarantees recall only for max_hamming < {n_bands}"
        )
    sh = (
        simhash_docs_vec(documents, text_col)
        if vectorized
        else simhash_docs(documents, text_col)
    ).persist()
    sh.count()
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), band_bits * i).bitwiseAND(
                F.lit((1 << band_bits) - 1)
            )
            for i in range(n_bands)
        ]
    )
    banded = sh.select(
        "doc_id", "simhash", F.posexplode(band_vals).alias("band", "bval")
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
        "band", "bval",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
        "band", "bval",
    )
    # Emit each candidate pair only in its FIRST shared band: for the
    # matched band k, require every earlier band to differ. This is a
    # row-local filter on (sh_a, sh_b, band) — it replaces a
    # dropDuplicates (a full extra shuffle of the candidate set) with
    # free scan-stage arithmetic.
    def band_of(col, i):
        return F.shiftright(col, band_bits * i).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    first_shared = reduce(
        lambda x, y: x & y,
        [
            (F.lit(i) >= F.col("band"))
            | (band_of(F.col("sh_a"), i) != band_of(F.col("sh_b"), i))
            for i in range(n_bands)
        ],
    )
    pairs = (
        a.join(b, ["band", "bval"])
        .filter((F.col("doc_a") < F.col("doc_b")) & first_shared)
        .select("doc_a", "doc_b", "sh_a", "sh_b")
    )
    out = pairs.select(
        "doc_a",
        "doc_b",
        hamming16(F.col("sh_a"), F.col("sh_b")).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    # the persisted (doc_id, simhash) relation is not in the returned
    # plan's memo value; mark it owned (on the FINAL returned value —
    # own_aux contract) so registry eviction releases it
    from ..session import own_aux

    return own_aux(out, sh)
