"""Learned NER tagger behind the model seam (SURVEY.md §2.11, round 6).

The reference ships a *trained* CRF classifier as its extraction
model (src/EntityExtractor.groovy:12-14) and a tool that produces
``(token, tag)`` training rows from entity-annotated XML
(src/XMLToTSVConverter.groovy:28-42). Until now the repo exercised
the model seam only with dictionary extractors; this module closes
the loop with an actually *learned* model:

    tagged XML --S10--> (token, tag) rows --train--> model tables
    raw text   --S10--> tokens          --apply--> typed mentions

The model is a most-frequent-tag unigram tagger with a 2-char-suffix
backoff — the classic supervised baseline (HMM/perceptron taggers
report against it). Spark-first design:

- training is two map-side-combinable ``groupBy`` counts plus a
  per-key argmax window; the model size is bounded by |vocab| and
  |suffix alphabet|, never the corpus — broadcastable at any scale;
- application is a broadcast hash join per token (the same
  "index the text, probe the model" shape as
  ``extract_mentions_tokenjoin``) with a suffix-join fallback;
- integer counts and a (count desc, tag asc) argmax keep every stage
  deterministic and SQL-expressible, so TRAIN and APPLY both sit
  under the cross-engine hash gate — unlike an order-dependent
  online learner (averaged perceptron), which could only be gated
  rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: entity classes the tagger learns; everything else is 'O'
#: (the reference CRF emits PERSON/ORGANIZATION/LOCATION + O,
#: src/EntityExtractor.groovy:19-34 writes only typed hits)
TAG_CLASSES = ("PERSON", "ORGANIZATION", "LOCATION")
SUFFIX_LEN = 2


def _argmax_tag(counts: DataFrame, *keys: str) -> DataFrame:
    """counts(*keys, tag, cnt) -> (*keys, tag, cnt): the most frequent
    tag per key, ties broken by tag ascending (deterministic)."""
    w = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("tag"))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def train_tagger(
    token_tags: DataFrame,
    token_col: str = "token",
    tag_col: str = "tag",
) -> tuple[DataFrame, DataFrame]:
    """(token, tag) training rows -> (token_model, suffix_model).

    token_model(token, tag, cnt): most-frequent tag per exact token.
    suffix_model(suffix, tag, cnt): most-frequent tag per last-
    SUFFIX_LEN characters — the unknown-word backoff. Both are pure
    aggregations (one shuffle each, keyed on token/suffix) over rows
    the S10 converter emits; 'O' rows participate so the models can
    learn *against* tagging a token.
    """
    base = token_tags.select(
        F.col(token_col).alias("token"), F.col(tag_col).alias("tag")
    ).filter(F.col("token") != "")
    tok_counts = base.groupBy("token", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    suf_counts = (
        base.select(F.expr(f"right(token, {SUFFIX_LEN})").alias("suffix"), "tag")
        .groupBy("suffix", "tag")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return _argmax_tag(tok_counts, "token"), _argmax_tag(suf_counts, "suffix")


def apply_tagger(
    tokens: DataFrame,
    token_model: DataFrame,
    suffix_model: DataFrame,
    token_col: str = "token",
) -> DataFrame:
    """Tag a token stream with the learned model: exact-token match,
    then suffix backoff, then 'O'. Adds ``pred_tag`` and
    ``model_src`` ('token' | 'suffix' | 'default'); input columns
    pass through. Both model tables broadcast (vocab-bounded); the
    token stream itself never shuffles."""
    tm = F.broadcast(
        token_model.select("token", F.col("tag").alias("__tok_tag"))
    )
    sm = F.broadcast(
        suffix_model.select("suffix", F.col("tag").alias("__suf_tag"))
    )
    out = (
        tokens.withColumn("__tok", F.col(token_col))
        .join(tm, F.col("__tok") == tm["token"], "left")
        .drop(tm["token"])
        .withColumn("__suf", F.expr(f"right({token_col}, {SUFFIX_LEN})"))
        .join(sm, F.col("__suf") == sm["suffix"], "left")
        .drop("suffix")
    )
    return (
        out.withColumn(
            "pred_tag",
            F.coalesce(F.col("__tok_tag"), F.col("__suf_tag"), F.lit("O")),
        )
        .withColumn(
            "model_src",
            F.when(F.col("__tok_tag").isNotNull(), "token")
            .when(F.col("__suf_tag").isNotNull(), "suffix")
            .otherwise("default"),
        )
        .drop("__tok", "__tok_tag", "__suf", "__suf_tag")
    )


# --- context (bigram) tagger — round 7 -------------------------------------

#: sentence-boundary previous token for the first token of a document
CTX_BOS = "<S>"


def train_tagger_ctx(
    token_tags: DataFrame,
    token_col: str = "token",
    prev_col: str = "prev",
    tag_col: str = "tag",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(prev, token, tag) training rows -> (bigram_model, token_model,
    suffix_model).

    The reference extraction model is a context-sensitive CRF
    (src/EntityExtractor.groovy:12-14); this is the count-based
    context feature in the same deterministic algebra as
    ``train_tagger``: bigram_model(prev, token, tag, cnt) is the
    most-frequent tag per (previous token, token) pair, and the
    unigram + suffix models come from the identical rows so the
    backoff chain bigram -> unigram -> suffix -> 'O' is trained on
    one pass over the corpus.

    Scale: three map-side-combinable counts + per-key argmax windows.
    The bigram table is bounded by distinct (prev, token) PAIRS —
    Heaps-law sublinear in corpus size but larger than the vocab, so
    unlike the unigram/suffix tables it is NOT force-broadcast at
    apply time; the join keys on token so AQE picks broadcast vs
    shuffled-hash by actual size.
    """
    base = token_tags.select(
        F.col(prev_col).alias("prev"),
        F.col(token_col).alias("token"),
        F.col(tag_col).alias("tag"),
    ).filter(F.col("token") != "")
    big_counts = base.groupBy("prev", "token", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bigram_model = _argmax_tag(big_counts, "prev", "token")
    token_model, suffix_model = train_tagger(base)
    return bigram_model, token_model, suffix_model


# --- HMM + Viterbi sequence decoder — round 10 -----------------------------
#
# The reference extraction model is a Stanford CRF — a SEQUENCE
# decoder (src/EntityExtractor.groovy:12-14), not a per-token
# classifier. The count taggers above pick each token's tag
# independently; this closes the qualitative gap with a first-order
# HMM decoded by Viterbi: transition counts over adjacent TAG pairs +
# add-one-smoothed emission counts, all scores floored to integer
# micro-nats (the lm_doc_scores/PMI discipline) so the DP is exact
# integer arithmetic and the full decode sits under the cross-engine
# hash gate (oracle: DuckDB list_reduce fold over the same scores).
#
# Spark-first split of the work:
#  - emission scoring = a vocab-bounded LEFT JOIN (the token stream
#    probes the model, exactly like apply_tagger) — stays JVM-side;
#  - the only Python crossing is the per-document DP itself
#    (Arrow-batched shuffle-free mapInPandas, numpy int64,
#    vectorized across each batch's documents);
#  - the transition matrix is (K+1)xK = 20 integers — the one O(1)
#    driver crossing, same stance as the PQ codebook.

#: alphabetical tag order; every argmax tie-break picks the FIRST
#: entry of this tuple (mirrored by np.argmax and the oracle's
#: ordered >= CASE chain)
VIT_TAGS = ("LOCATION", "O", "ORGANIZATION", "PERSON")
#: single-char path codes (G = ORGANIZATION; order matches VIT_TAGS)
VIT_CODES = ("L", "O", "G", "P")
VIT_BOS = "<B>"
VIT_BUCKETS = 64  # doc-bucket fan-out of the non-doc_clustered decode path


def train_hmm(
    labeled: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "idx",
    token_col: str = "token",
    tag_col: str = "tag",
):
    """(doc, idx, token, tag) rows -> (trans, emis_wide, defaults).

    trans(ptag, tag, score): add-one-smoothed first-order transition
    log-probs over the COMPLETE (BOS+K)xK grid, score = floor(1e6 *
    ln((c(p,t)+1)/(c(p)+K))). emis_wide(token, e_L/e_O/e_G/e_P):
    per-token emission scores floor(1e6 * ln((c(t,tok)+1)/(n_t+V)));
    defaults(d_L/../d_P) is the 1-row unseen-token score per tag.
    Training is two map-side-combinable counts (tag pairs; token) —
    the tag-pair lag window keys on the same doc axis as every coref
    window. Model sizes: 20 rows + |vocab| rows + 1 row."""
    spark = labeled.sparkSession
    k = len(VIT_TAGS)
    w = Window.partitionBy(doc_col).orderBy(idx_col)
    pairs = labeled.select(
        F.coalesce(F.lag(tag_col).over(w), F.lit(VIT_BOS)).alias("ptag"),
        F.col(tag_col).alias("tag"),
    )
    tcnt = pairs.groupBy("ptag", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ptot = tcnt.groupBy("ptag").agg(F.sum("c").cast("long").alias("tot"))
    grid = spark.createDataFrame(
        [(p, t) for p in (VIT_BOS,) + VIT_TAGS for t in VIT_TAGS],
        "ptag string, tag string",
    )
    trans = (
        grid.join(tcnt, ["ptag", "tag"], "left")
        .join(ptot, "ptag", "left")
        .select(
            "ptag",
            "tag",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("tot"), F.lit(0)) + k).cast("double")
                )
                * 1000000.0
            )
            .cast("long")
            .alias("score"),
        )
    )
    base = labeled.filter(F.col(token_col) != "").select(
        F.col(token_col).alias("token"), F.col(tag_col).alias("tag")
    )
    cnt_cols = [
        F.sum(F.when(F.col("tag") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"c_{c}")
        for t, c in zip(VIT_TAGS, VIT_CODES)
    ]
    ecnt = base.groupBy("token").agg(*cnt_cols)
    stats = base.agg(
        F.countDistinct("token").cast("long").alias("v"),
        *[
            F.sum(F.when(F.col("tag") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{c}")
            for t, c in zip(VIT_TAGS, VIT_CODES)
        ],
    )

    def escore(num, den):
        return (
            F.floor(F.log(num.cast("double") / den.cast("double")) * 1000000.0)
            .cast("long")
        )

    emis_wide = ecnt.crossJoin(F.broadcast(stats)).select(
        "token",
        *[
            escore(
                F.col(f"c_{c}") + 1, F.col(f"n_{c}") + F.col("v")
            ).alias(f"e_{c}")
            for c in VIT_CODES
        ],
    )
    defaults = stats.select(
        *[
            escore(F.lit(1), F.col(f"n_{c}") + F.col("v")).alias(f"d_{c}")
            for c in VIT_CODES
        ]
    )
    return trans, emis_wide, defaults


def train_hmm_features(
    labeled: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "idx",
    token_col: str = "token",
    tag_col: str = "tag",
):
    """CRF-style feature emissions for the HMM seam (the reference
    loads a feature-rich Stanford CRF, src/EntityExtractor.groovy:
    12-14): alongside ``train_hmm``'s exact-token emissions, train a
    SUFFIX emission table under a naive-Bayes factorization —
    P(suffix|tag) with add-one smoothing over the suffix alphabet,
    score = floor(1e6 * ln((c(suf,tag)+1)/(n_tag + V_suf))).
    Returns (trans, emis_wide, defaults, suf_wide, suf_defaults);
    the first three are ``train_hmm``'s verbatim. The suffix table is
    bounded by the distinct-suffix count (charset^SUFFIX_LEN at
    worst) — broadcastable at any corpus size, trained by one more
    map-side-combinable count over the same pass."""
    trans, emis_wide, defaults = train_hmm(
        labeled, doc_col, idx_col, token_col, tag_col
    )
    base = labeled.filter(F.col(token_col) != "").select(
        F.expr(f"right({token_col}, {SUFFIX_LEN})").alias("suffix"),
        F.col(tag_col).alias("tag"),
    )
    cnt_cols = [
        F.sum(F.when(F.col("tag") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"c_{c}")
        for t, c in zip(VIT_TAGS, VIT_CODES)
    ]
    scnt = base.groupBy("suffix").agg(*cnt_cols)
    stats = base.agg(
        F.countDistinct("suffix").cast("long").alias("v"),
        *[
            F.sum(F.when(F.col("tag") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{c}")
            for t, c in zip(VIT_TAGS, VIT_CODES)
        ],
    )

    def escore(num, den):
        return (
            F.floor(F.log(num.cast("double") / den.cast("double")) * 1000000.0)
            .cast("long")
        )

    suf_wide = scnt.crossJoin(F.broadcast(stats)).select(
        "suffix",
        *[
            escore(
                F.col(f"c_{c}") + 1, F.col(f"n_{c}") + F.col("v")
            ).alias(f"se_{c}")
            for c in VIT_CODES
        ],
    )
    suf_defaults = stats.select(
        *[
            escore(F.lit(1), F.col(f"n_{c}") + F.col("v")).alias(f"sd_{c}")
            for c in VIT_CODES
        ]
    )
    return trans, emis_wide, defaults, suf_wide, suf_defaults


def _decode_doc_runs(scored: DataFrame, decode, out_schema: str) -> DataFrame:
    """Run a per-complete-documents pandas kernel over ``scored`` with
    ``mapInPandas``, buffering the trailing partial document across
    Arrow batch boundaries (r14 optimization, guide §2.4): the decode
    input is ALREADY doc-clustered — every caller's token stream comes
    off a doc_id-keyed window (or a per-doc posexplode), so all rows
    of a document are consecutive within their partition — and the
    old ``groupBy(doc_id % VIT_BUCKETS).applyInPandas`` tail re-paid a
    full token-stream exchange just to re-establish that property.

    Contiguity is load-bearing for correctness, so it is GUARDED, not
    assumed: each kernel call checks that doc ids form one run each
    (run count == distinct count) and that no document re-appears
    after its run closed earlier in the partition; a violation raises
    with the offending doc_id rather than silently decoding a
    document in fragments. What the guard CANNOT see is a document
    split ACROSS partitions (each side looks like a clean run), which
    is why callers must opt in via ``doc_clustered=True`` — the
    default decode path keeps the explicit doc-bucket exchange."""
    import numpy as np
    import pandas as pd

    def run(batches):
        carry = None
        done: set = set()

        def check_and_decode(pdf):
            ids = pdf["doc_id"].to_numpy()
            uniq = np.unique(ids)
            n_runs = int((ids[1:] != ids[:-1]).sum()) + 1
            if n_runs != len(uniq):
                raise ValueError(
                    "viterbi decode input not doc-contiguous: "
                    f"{n_runs} runs over {len(uniq)} docs in one batch"
                )
            reappeared = done.intersection(uniq.tolist())
            if reappeared:
                raise ValueError(
                    "viterbi decode input not doc-contiguous: doc_ids "
                    f"{sorted(reappeared)[:5]} re-appeared after their "
                    "run closed"
                )
            done.update(uniq.tolist())
            return decode(pdf)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if not n:
                continue
            ids = pdf["doc_id"].to_numpy()
            earlier = np.nonzero(ids != ids[-1])[0]
            head_n = int(earlier[-1]) + 1 if len(earlier) else 0
            carry = pdf.iloc[head_n:]
            if head_n:
                yield check_and_decode(pdf.iloc[:head_n])
        if carry is not None and len(carry):
            yield check_and_decode(carry)

    return scored.mapInPandas(run, out_schema)


def _decode_tail(
    scored: DataFrame, decode, out_schema: str, doc_clustered: bool
) -> DataFrame:
    """Route the decode kernel: shuffle-free doc-run streaming when
    the caller vouches its rows are doc-clustered per partition
    (every ner.py stream: doc_id-window or per-doc-explode lineage),
    else the always-correct doc-bucket exchange."""
    if doc_clustered:
        return _decode_doc_runs(scored, decode, out_schema)
    return (
        scored.withColumn(
            "__vb", F.pmod(F.col("doc_id"), F.lit(VIT_BUCKETS)).cast("int")
        )
        .groupBy("__vb")
        .applyInPandas(decode, out_schema)
    )


def apply_viterbi(
    tokens: DataFrame,
    trans_scores: dict,
    emis_wide: DataFrame,
    defaults: DataFrame,
    carry_cols: tuple = (),
    suf_wide: DataFrame | None = None,
    suf_defaults: DataFrame | None = None,
    doc_clustered: bool = False,
) -> DataFrame:
    """Decode (doc_id, idx, token [, carry...]) with the trained HMM:
    emission scores arrive via a vocab-bounded LEFT JOIN (unseen
    tokens take the broadcast 1-row defaults), then one Arrow-batched
    ``mapInPandas`` pass (``_decode_doc_runs``) runs the integer
    Viterbi DP vectorized across each batch's documents (numpy int64;
    np.argmax's first-max = the VIT_TAGS tie order). Adds
    ``pred_tag``; ``carry_cols`` pass through untouched. With
    ``doc_clustered=True`` (every ner.py stream: doc_id-window or
    per-doc-explode lineage) the token stream does NOT shuffle here
    at all — r14: the old doc-bucket ``applyInPandas`` exchange
    re-clustered rows those callers already deliver doc-contiguous;
    the default keeps the bucket exchange for arbitrary inputs.
    Per-batch state is that batch's docs x K scores — flat, never a
    corpus sort.

    ``suf_wide``/``suf_defaults`` (from ``train_hmm_features``) add a
    CRF-style SUFFIX emission feature under a naive-Bayes
    factorization: e(token) = log P(token|tag) + log P(suffix|tag),
    both integer micro-nats, summed BEFORE the DP — the decoder and
    its oracle are unchanged, only the per-token emission column
    changes. The suffix table is bounded by the suffix alphabet
    (broadcast at any corpus size); its value is on UNSEEN tokens,
    which otherwise all share one flat default vector."""
    import numpy as np
    import pandas as pd

    k = len(VIT_TAGS)
    bos = np.array(
        [trans_scores[(VIT_BOS, t)] for t in VIT_TAGS], dtype=np.int64
    )
    amat = np.array(
        [[trans_scores[(p, t)] for t in VIT_TAGS] for p in VIT_TAGS],
        dtype=np.int64,
    )
    scored = tokens.join(F.broadcast(emis_wide), "token", "left").crossJoin(
        F.broadcast(defaults)
    )
    if suf_wide is not None:
        scored = (
            scored.withColumn(
                "__suf", F.expr(f"right(token, {SUFFIX_LEN})")
            )
            .join(
                F.broadcast(
                    suf_wide.withColumnRenamed("suffix", "__suf")
                ),
                "__suf",
                "left",
            )
            .crossJoin(F.broadcast(suf_defaults))
        )
        emis_expr = lambda c: (  # noqa: E731
            F.coalesce(F.col(f"e_{c}"), F.col(f"d_{c}"))
            + F.coalesce(F.col(f"se_{c}"), F.col(f"sd_{c}"))
        )
    else:
        emis_expr = lambda c: F.coalesce(  # noqa: E731
            F.col(f"e_{c}"), F.col(f"d_{c}")
        )
    scored = scored.select(
        "doc_id",
        "idx",
        "token",
        *carry_cols,
        *[emis_expr(c).alias(f"e_{c}") for c in VIT_CODES],
    )
    ecols = [f"e_{c}" for c in VIT_CODES]
    # carry columns keep their INPUT types (a hardcoded 'string' here
    # silently mis-declared e.g. a long id and produced an Arrow cast
    # failure or a wrong output schema at runtime)
    in_types = {f.name: f.dataType.simpleString() for f in tokens.schema.fields}
    missing = [c for c in carry_cols if c not in in_types]
    assert not missing, f"carry_cols not in tokens schema: {missing}"
    out_schema = ", ".join(
        ["doc_id long", "idx long", "token string"]
        + [f"{c} {in_types[c]}" for c in carry_cols]
        + ["pred_tag string"]
    )

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "idx"], kind="mergesort")
        doc_ids, starts = np.unique(
            pdf["doc_id"].to_numpy(), return_index=True
        )
        ends = np.append(starts[1:], len(pdf))
        lens = ends - starts
        nd, mx = len(doc_ids), int(lens.max()) if len(lens) else 0
        em = np.zeros((nd, mx, k), dtype=np.int64)
        flat = pdf[ecols].to_numpy(dtype=np.int64)
        for d in range(nd):
            em[d, : lens[d]] = flat[starts[d] : ends[d]]
        scores = bos[None, :] + em[:, 0, :]
        bp = np.zeros((nd, mx, k), dtype=np.int8)
        for step in range(1, mx):
            act = lens > step
            if not act.any():
                break
            cand = scores[act][:, :, None] + amat[None, :, :]
            bp[act, step] = cand.argmax(axis=1)  # first max = tag order
            scores[act] = cand.max(axis=1) + em[act, step]
        tags = np.zeros((nd, mx), dtype=np.int8)
        pred = np.empty(len(pdf), dtype=object)
        for d in range(nd):
            n = int(lens[d])
            cur = int(scores[d].argmax())
            tags[d, n - 1] = cur
            for i in range(n - 1, 0, -1):
                cur = int(bp[d, i, cur])
                tags[d, i - 1] = cur
            for i in range(n):
                pred[starts[d] + i] = VIT_TAGS[tags[d, i]]
        res = pdf[["doc_id", "idx", "token", *carry_cols]].copy()
        res["pred_tag"] = pred
        return res

    return _decode_tail(scored, decode, out_schema, doc_clustered)


def train_hmm2(
    labeled: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "idx",
    token_col: str = "token",
    tag_col: str = "tag",
):
    """Second-order (trigram) HMM: (doc, idx, token, tag) rows ->
    (trans2, emis_wide, defaults). trans2(p2, p1, tag, score) holds
    add-one-smoothed TRIGRAM transition log-probs over the complete
    reachable context grid — (BOS,BOS), (BOS,t) and every (t,t') —
    i.e. (1 + K + K^2) x K = 84 integers through the driver (the same
    O(1) stance as the 20-int first-order matrix and the PQ
    codebook); score = floor(1e6 * ln((c(p2,p1,t)+1)/(c(p2,p1)+K))).
    Emissions are IDENTICAL to the first-order model (``train_hmm``'s
    emission half is reused verbatim), so any accuracy delta between
    the two decoders is attributable to the transition order alone.
    Training is one two-lag window + a map-side-combinable count —
    the same doc-keyed shuffle as every coref window."""
    spark = labeled.sparkSession
    k = len(VIT_TAGS)
    w = Window.partitionBy(doc_col).orderBy(idx_col)
    trips = labeled.select(
        F.coalesce(F.lag(tag_col, 2).over(w), F.lit(VIT_BOS)).alias("p2"),
        F.coalesce(F.lag(tag_col, 1).over(w), F.lit(VIT_BOS)).alias("p1"),
        F.col(tag_col).alias("tag"),
    )
    tcnt = trips.groupBy("p2", "p1", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ptot = tcnt.groupBy("p2", "p1").agg(
        F.sum("c").cast("long").alias("tot")
    )
    ctxs = [(VIT_BOS, VIT_BOS)] + [(VIT_BOS, t) for t in VIT_TAGS] + [
        (a, b) for a in VIT_TAGS for b in VIT_TAGS
    ]
    grid = spark.createDataFrame(
        [(a, b, t) for a, b in ctxs for t in VIT_TAGS],
        "p2 string, p1 string, tag string",
    )
    trans2 = (
        grid.join(tcnt, ["p2", "p1", "tag"], "left")
        .join(ptot, ["p2", "p1"], "left")
        .select(
            "p2",
            "p1",
            "tag",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("tot"), F.lit(0)) + k).cast("double")
                )
                * 1000000.0
            )
            .cast("long")
            .alias("score"),
        )
    )
    _trans1, emis_wide, defaults = train_hmm(
        labeled, doc_col, idx_col, token_col, tag_col
    )
    return trans2, emis_wide, defaults


def apply_viterbi2(
    tokens: DataFrame,
    trans2_scores: dict,
    emis_wide: DataFrame,
    defaults: DataFrame,
    carry_cols: tuple = (),
    doc_clustered: bool = False,
) -> DataFrame:
    """Second-order Viterbi decode: DP state = the TAG PAIR
    (t_{i-1}, t_i) — K^2 = 16 states — scored with the trigram
    transitions from ``train_hmm2``. Same execution shape as the
    first-order ``apply_viterbi`` (vocab-bounded emission join,
    shuffle-free ``_decode_doc_runs`` mapInPandas, numpy DP vectorized
    across each batch's documents; exact int64 scores); the per-doc DP cost grows
    K-fold (K^3 candidate lattice per step) and the backpointer array
    is (docs, steps, K, K) int8 — still ~2 KB per 124-token document.
    Tie-breaks mirror the oracle exactly: argmax over the predecessor
    tag takes the FIRST max in VIT_TAGS order; the final state argmax
    is lexicographic-(t_{n-2}, t_{n-1}) in VIT_TAGS order (numpy
    row-major ravel = the oracle's p1-major ordered >= CASE chain)."""
    import numpy as np
    import pandas as pd

    k = len(VIT_TAGS)
    bos0 = np.array(
        [trans2_scores[(VIT_BOS, VIT_BOS, t)] for t in VIT_TAGS],
        dtype=np.int64,
    )
    bos1 = np.array(
        [[trans2_scores[(VIT_BOS, p, t)] for t in VIT_TAGS] for p in VIT_TAGS],
        dtype=np.int64,
    )
    amat = np.array(
        [
            [[trans2_scores[(a, b, t)] for t in VIT_TAGS] for b in VIT_TAGS]
            for a in VIT_TAGS
        ],
        dtype=np.int64,
    )
    scored = (
        tokens.join(F.broadcast(emis_wide), "token", "left")
        .crossJoin(F.broadcast(defaults))
        .select(
            "doc_id",
            "idx",
            "token",
            *carry_cols,
            *[
                F.coalesce(F.col(f"e_{c}"), F.col(f"d_{c}")).alias(f"e_{c}")
                for c in VIT_CODES
            ],
        )
    )
    ecols = [f"e_{c}" for c in VIT_CODES]
    in_types = {f.name: f.dataType.simpleString() for f in tokens.schema.fields}
    missing = [c for c in carry_cols if c not in in_types]
    assert not missing, f"carry_cols not in tokens schema: {missing}"
    out_schema = ", ".join(
        ["doc_id long", "idx long", "token string"]
        + [f"{c} {in_types[c]}" for c in carry_cols]
        + ["pred_tag string"]
    )

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "idx"], kind="mergesort")
        doc_ids, starts = np.unique(
            pdf["doc_id"].to_numpy(), return_index=True
        )
        ends = np.append(starts[1:], len(pdf))
        lens = ends - starts
        nd, mx = len(doc_ids), int(lens.max()) if len(lens) else 0
        em = np.zeros((nd, mx, k), dtype=np.int64)
        flat = pdf[ecols].to_numpy(dtype=np.int64)
        for d in range(nd):
            em[d, : lens[d]] = flat[starts[d] : ends[d]]
        v1 = bos0[None, :] + em[:, 0, :]  # (nd, k): state = t_0
        scores = np.zeros((nd, k, k), dtype=np.int64)
        if mx > 1:
            # (nd, p1=t_0, t=t_1)
            scores = v1[:, :, None] + bos1[None, :, :] + em[:, 1, None, :]
        bp = np.zeros((nd, mx, k, k), dtype=np.int8)
        for step in range(2, mx):
            act = lens > step
            if not act.any():
                break
            # (na, p2, p1, t)
            cand = scores[act][:, :, :, None] + amat[None, :, :, :]
            bp[act, step] = cand.argmax(axis=1)  # first max = tag order
            scores[act] = cand.max(axis=1) + em[act, step, None, :]
        pred = np.empty(len(pdf), dtype=object)
        for d in range(nd):
            n = int(lens[d])
            tags = np.zeros(n, dtype=np.int64)
            if n == 1:
                tags[0] = int(v1[d].argmax())
            else:
                best = int(scores[d].ravel().argmax())  # p1-major ravel
                tags[n - 2], tags[n - 1] = divmod(best, k)
                for i in range(n - 1, 1, -1):
                    tags[i - 2] = int(bp[d, i, tags[i - 1], tags[i]])
            for i in range(n):
                pred[starts[d] + i] = VIT_TAGS[tags[i]]
        res = pdf[["doc_id", "idx", "token", *carry_cols]].copy()
        res["pred_tag"] = pred
        return res

    return _decode_tail(scored, decode, out_schema, doc_clustered)


def apply_tagger_ctx(
    tokens: DataFrame,
    bigram_model: DataFrame,
    token_model: DataFrame,
    suffix_model: DataFrame,
    token_col: str = "token",
    prev_col: str = "prev",
) -> DataFrame:
    """Tag a token stream with the context model: exact (prev, token)
    bigram match, then exact-token, then suffix backoff, then 'O'.
    Adds ``pred_tag`` and ``model_src`` ('bigram' | 'token' |
    'suffix' | 'default'). The unigram/suffix tables broadcast
    (vocab-bounded); the bigram join is left to AQE (see
    ``train_tagger_ctx``). The token stream itself only shuffles if
    the bigram join does."""
    bm = bigram_model.select(
        F.col("prev").alias("__b_prev"),
        F.col("token").alias("__b_tok"),
        F.col("tag").alias("__big_tag"),
    )
    with_big = tokens.join(
        bm,
        (F.col(prev_col) == F.col("__b_prev"))
        & (F.col(token_col) == F.col("__b_tok")),
        "left",
    ).drop("__b_prev", "__b_tok")
    out = apply_tagger(with_big, token_model, suffix_model, token_col)
    return (
        out.withColumn(
            "pred_tag", F.coalesce(F.col("__big_tag"), F.col("pred_tag"))
        )
        .withColumn(
            "model_src",
            F.when(F.col("__big_tag").isNotNull(), "bigram").otherwise(
                F.col("model_src")
            ),
        )
        .drop("__big_tag")
    )
