"""Probe: HMM-initialized batch perceptron (normalized discriminative
fine-tune) — held-out accuracy ladder over (step, epochs).

The r12 verdict attributes the zero-init perceptron's ~0.82 plateau
(vs the generative HMM's 0.9335) to count-space scale imbalance,
closable only by per-distribution normalization. This probe measures
the scaled-integer fix: initialize the batch perceptron at the HMM's
micro-nat weights (per-distribution normalized by construction) and
apply integer-step discriminative updates

    w_k = w_{k-1} + STEP * (Phi(gold) - Phi(viterbi_{w_{k-1}}))

entirely in int64 — no exp, no new float ops, same decode machinery.

Usage: python tools/probe_norm_perceptron.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
STEPS = [100, 200]
MAX_EPOCHS = 8


def main() -> None:
    from vizlinc_ingester_spark.operators.tagger import (
        VIT_BOS,
        VIT_CODES,
        VIT_TAGS,
        apply_viterbi,
        train_hmm,
    )
    from vizlinc_ingester_spark.session import get_spark
    from vizlinc_ingester_spark.suite.ner import _ctx_tokens, _docs, _span_gold

    spark = get_spark("probe-norm-perc", shuffle_partitions=16)
    from pyspark.sql import Window

    train_docs = _docs(spark, SF).filter(F.col("doc_id") % 2 == 0)
    held_docs = _docs(spark, SF).filter(F.col("doc_id") % 2 == 1)
    labeled = (
        _span_gold(_ctx_tokens(train_docs))
        .select("doc_id", "idx", "token", "tag")
        .persist()
    )
    held = (
        _span_gold(_ctx_tokens(held_docs))
        .withColumnRenamed("tag", "gold_tag")
        .select("doc_id", "idx", "token", "gold_tag")
        .persist()
    )
    n_held = held.count()
    labeled.count()

    trans, ew0, defaults = train_hmm(labeled)
    tmat0 = {(r["ptag"], r["tag"]): r["score"] for r in trans.collect()}
    ew0 = ew0.persist()
    ew0.count()

    def acc(tmat, ew) -> float:
        dec = apply_viterbi(
            held, tmat, ew, defaults, carry_cols=("gold_tag",)
        )
        ok = dec.agg(
            F.sum((F.col("pred_tag") == F.col("gold_tag")).cast("long"))
        ).collect()[0][0]
        return ok / n_held

    print(f"sf_dir={SF} n_held={n_held}")
    print(f"HMM baseline (epoch 0): {acc(tmat0, ew0):.4f}", flush=True)

    w = Window.partitionBy("doc_id").orderBy("idx")
    gtc = {
        (r["ptag"], r["tag"]): r["c"]
        for r in labeled.select(
            F.coalesce(F.lag("tag").over(w), F.lit(VIT_BOS)).alias("ptag"),
            "tag",
        )
        .groupBy("ptag", "tag")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    gc = labeled.groupBy("token").agg(
        *[
            F.sum((F.col("tag") == t).cast("long")).cast("long").alias(f"g_{c}")
            for t, c in zip(VIT_TAGS, VIT_CODES)
        ]
    ).persist()
    gc.count()
    grid = [(p, t) for p in (VIT_BOS,) + VIT_TAGS for t in VIT_TAGS]

    for step in STEPS:
        tmat = dict(tmat0)
        pkcs = []  # per-epoch prediction count tables
        for k in range(1, MAX_EPOCHS + 1):
            # current emission table, flat: ew0 + step*((k-1)*g - sum p_j)
            ew_k = gc
            for j, pk in enumerate(pkcs):
                ew_k = ew_k.join(
                    pk.select(
                        "token",
                        *[F.col(f"p_{c}").alias(f"p{j}_{c}") for c in VIT_CODES],
                    ),
                    "token",
                    "left",
                )
            ew_k = ew0.join(ew_k, "token").select(
                "token",
                *[
                    (
                        F.col(f"e_{c}")
                        + F.lit(step)
                        * (
                            F.lit(len(pkcs)) * F.col(f"g_{c}")
                            - sum(
                                (
                                    F.coalesce(
                                        F.col(f"p{j}_{c}"),
                                        F.lit(0).cast("long"),
                                    )
                                    for j in range(len(pkcs))
                                ),
                                F.lit(0).cast("long"),
                            )
                        )
                    ).cast("long").alias(f"e_{c}")
                    for c in VIT_CODES
                ],
            )
            pred = apply_viterbi(
                labeled.select("doc_id", "idx", "token"), tmat, ew_k, defaults
            ).localCheckpoint()
            ptc = {
                (r["ptag"], r["tag"]): r["c"]
                for r in pred.select(
                    F.coalesce(F.lag("pred_tag").over(w), F.lit(VIT_BOS)).alias(
                        "ptag"
                    ),
                    F.col("pred_tag").alias("tag"),
                )
                .groupBy("ptag", "tag")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
                .collect()
            }
            train_err = sum(
                abs(gtc.get(k2, 0) - ptc.get(k2, 0)) for k2 in grid
            )
            tmat = {
                k2: tmat[k2] + step * (gtc.get(k2, 0) - ptc.get(k2, 0))
                for k2 in grid
            }
            pkc = pred.groupBy("token").agg(
                *[
                    F.sum((F.col("pred_tag") == t).cast("long"))
                    .cast("long")
                    .alias(f"p_{c}")
                    for t, c in zip(VIT_TAGS, VIT_CODES)
                ]
            )
            pkcs.append(pkc)
            # final (unaveraged) weights after k updates
            ew_fin = ew0.join(
                _joined_preds(gc, pkcs, VIT_CODES), "token"
            ).select(
                "token",
                *[
                    (
                        F.col(f"e_{c}")
                        + F.lit(step)
                        * (
                            F.lit(len(pkcs)) * F.col(f"g_{c}")
                            - F.col(f"psum_{c}")
                        )
                    ).cast("long").alias(f"e_{c}")
                    for c in VIT_CODES
                ],
            )
            a = acc(tmat, ew_fin)
            print(
                f"step={step} E={k} held_acc={a:.4f}"
                f" train_tdelta={train_err}",
                flush=True,
            )


def _joined_preds(gc, pkcs, codes):
    out = gc
    for j, pk in enumerate(pkcs):
        out = out.join(
            pk.select(
                "token", *[F.col(f"p_{c}").alias(f"p{j}_{c}") for c in codes]
            ),
            "token",
            "left",
        )
    return out.select(
        "token",
        *[F.col(f"g_{c}") for c in codes],
        *[
            sum(
                (
                    F.coalesce(F.col(f"p{j}_{c}"), F.lit(0).cast("long"))
                    for j in range(len(pkcs))
                ),
                F.lit(0).cast("long"),
            ).alias(f"psum_{c}")
            for c in codes
        ],
    )


if __name__ == "__main__":
    main()
