"""Interleaved paired A/B adjudicating the r14 persist decisions on
q94 (dup_span_stats exploded-gram persist), q132 (span_dedup exploded-
span persist) and q237 (bpe_train lazy localCheckpoint) — r14 verdict
item 4: the paired sf0.1 readings (1.12x/1.14x/2.43x) conflicted with
the plan evidence and isolated re-measures.

Local copies of the operators carry a toggle; the real entry bodies'
arguments are replicated exactly. Variants run interleaved
(with/without, same session, N rounds) at the SF of $SPARK_GRAFT_SF_DIR.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q94.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import calibration_probe  # noqa: E402
from polars_pipe_spark import get_spark  # noqa: E402
from polars_pipe_spark.functions.text import tokens  # noqa: E402


def dup_span_stats_ab(df, text_col, id_col, k, do_persist):
    t = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
    gram = F.when(
        F.size(t) >= k,
        F.transform(idx, lambda i: F.md5(F.array_join(F.slice(t, i, k), " "))),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(F.col(id_col).alias("id"), F.explode(F.array(gram)).alias("__g"))
    pos = grams.select("id", F.explode("__g").alias("g"))
    if do_persist:
        pos = pos.persist()
    counts = pos.groupBy("g").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        pos.join(counts, "g")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_windows"),
        )
    )
    all_docs = df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")
    return all_docs.select(
        "id",
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        (F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double")).alias(
            "dup_fraction"
        ),
    )


def span_dedup_ab(df, text_col, id_col, span_tokens, do_persist):
    tok_df = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    n_spans = F.floor((n + span_tokens - 1) / F.lit(float(span_tokens))).cast("int")
    spans = F.when(n_spans > 0, F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(t, i * span_tokens + 1, span_tokens), " "),
    )).otherwise(F.array().cast("array<string>"))
    ex = (
        tok_df.select("id", F.posexplode(spans).alias("pos", "span"))
        .withColumn("skey", F.md5("span"))
    )
    if do_persist:
        ex = ex.persist()
    own = ex.groupBy("skey").agg(
        F.min(F.col("id") * 1000000 + F.col("pos")).alias("owner")
    )
    kept = ex.join(own, "skey").withColumn(
        "kept", (F.col("id") * 1000000 + F.col("pos")) == F.col("owner")
    )
    return kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct(F.col("pos"), F.col("span")))
                    )
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias("cleaned_text"),
    ).withColumnRenamed("id", id_col)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    which = os.environ.get("AB_QUERIES", "q94,q132").split(",")

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="ab_q94")
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    calibration_probe(spark)
    print("calib_pre", min(calibration_probe(spark), calibration_probe(spark)))

    docs = entry_mod._t_par(spark, sf_dir, "documents")

    def run(tag, df):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(tag)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    results: dict[str, list[float]] = {}
    for _ in range(rounds):
        for do_persist in (True, False):
            tag_p = "persist" if do_persist else "nopersist"
            if "q94" in which:
                dt = run(f"q94 {tag_p}",
                         dup_span_stats_ab(docs, "text", "doc_id", 8, do_persist))
                results.setdefault(f"q94 {tag_p}", []).append(dt)
                print("q94", tag_p, dt, flush=True)
            if "q132" in which:
                dt = run(f"q132 {tag_p}",
                         span_dedup_ab(docs, "text", "doc_id", 20, do_persist))
                results.setdefault(f"q132 {tag_p}", []).append(dt)
                print("q132", tag_p, dt, flush=True)
    for tag, samples in sorted(results.items()):
        print("BEST", tag, min(samples), "all", samples)
    print("calib_post", min(calibration_probe(spark), calibration_probe(spark)))


if __name__ == "__main__":
    main()
