import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from vizlinc_ingester_spark.session import get_spark
from vizlinc_ingester_spark.functions.hashing import stable_hash64
from vizlinc_ingester_spark.suite.dedup import SUBSTR_L, _docs

spark = get_spark("ab-substr", shuffle_partitions=64)
SF = "/root/testdata/sf0.1"

def islands_from(occ):
    occ2 = occ.withColumn("end", F.col("start") + SUBSTR_L - 1)
    w = Window.partitionBy("doc_id").orderBy("start")
    pme = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    occ2 = occ2.withColumn("new_island", (pme.isNull() | (F.col("start") > pme)).cast("long")) \
               .withColumn("island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return occ2.groupBy("doc_id", "island").agg(F.min("start").cast("long").alias("s"), F.max("end").cast("long").alias("e"))

def stats_query(base, occ, islands):
    n_rep = occ.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_repeated_grams"))
    covered = islands.select("doc_id", (F.col("e")-F.col("s")+1).cast("long").alias("ilen")).groupBy("doc_id").agg(F.sum("ilen").cast("long").alias("covered_tokens"))
    stats = base.select("doc_id","n_tokens", F.greatest(F.col("n_tokens")-SUBSTR_L+1, F.lit(0)).cast("long").alias("n_grams")).join(n_rep,"doc_id","left").join(covered,"doc_id","left")
    cov = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long")
    return stats.select("doc_id","n_tokens","n_grams",
        F.coalesce(F.col("n_repeated_grams"),F.lit(0)).cast("long").alias("n_repeated_grams"),
        cov.alias("covered_tokens"),
        F.expr("div(coalesce(covered_tokens, 0) * cast(1000000 as bigint), n_tokens)").alias("covered_micro"))

def build(variant):
    d = _docs(spark, SF)
    toks = F.split("text", " ")
    base = d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"), toks.alias("t"))
    qual = base.filter(F.col("n_tokens") >= SUBSTR_L)
    tr = F.transform(F.sequence(F.lit(1), F.col("n_tokens") - SUBSTR_L + 1),
        lambda i: F.struct(i.cast("long").alias("start"),
            stable_hash64(F.array_join(F.slice(F.col("t"), i, SUBSTR_L), " ")).alias("gh")))
    if variant == "old":
        grams = qual.select("doc_id", F.explode(tr).alias("g")).select("doc_id", F.col("g.start").alias("start"), F.col("g.gh").alias("gh"))
        dup_gh = grams.groupBy("gh").agg(F.countDistinct("doc_id").alias("nd")).filter(F.col("nd")>=2).select("gh")
        occ = grams.join(dup_gh, "gh", "left_semi")
    elif variant == "inrow":
        garr = qual.select("doc_id", tr.alias("g"))
        grams = garr.select("doc_id", F.explode("g").alias("x")).select("doc_id", F.col("x.start").alias("start"), F.col("x.gh").alias("gh"))
        dup_gh = garr.select(F.explode(F.array_distinct(F.transform("g", lambda x: x["gh"]))).alias("gh")).groupBy("gh").agg(F.count(F.lit(1)).alias("nd")).filter(F.col("nd")>=2).select("gh")
        occ = grams.join(dup_gh, "gh", "left_semi")
    else:  # ckpt
        garr = qual.select("doc_id", tr.alias("g")).localCheckpoint()
        grams = garr.select("doc_id", F.explode("g").alias("x")).select("doc_id", F.col("x.start").alias("start"), F.col("x.gh").alias("gh"))
        dup_gh = garr.select(F.explode(F.array_distinct(F.transform("g", lambda x: x["gh"]))).alias("gh")).groupBy("gh").agg(F.count(F.lit(1)).alias("nd")).filter(F.col("nd")>=2).select("gh")
        occ = grams.join(dup_gh, "gh", "left_semi").localCheckpoint()
    return stats_query(base, occ, islands_from(occ))

variants = ["old", "inrow", "ckpt"]
# warm-up
for v in variants:
    build(v).write.format("noop").mode("overwrite").save()
times = {v: [] for v in variants}
for r in range(4):
    for v in variants:
        t0 = time.perf_counter()
        build(v).write.format("noop").mode("overwrite").save()
        times[v].append(time.perf_counter() - t0)
for v in variants:
    s = sorted(times[v])
    print(v, "min", round(s[0],3), "med", round(s[len(s)//2],3), [round(x,3) for x in times[v]])
