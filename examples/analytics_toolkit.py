"""Analytics-toolkit tour: the round-4 statistical/quality operators,
composed over the TPC-H-ish testdata. Run:

    python examples/analytics_toolkit.py [sf_dir]

Stages (each one of the engine's oracle-checked operators):
  1. bloom-pruned join     — runtime md5-bucket filter ahead of the join
  2. grouped OLS           — per-nation regression from exact moments
  3. k-anonymity audit     — counts-only privacy report pre-release
  4. weighted quantiles    — quantity-weighted price percentiles, exact
  5. integer-lattice kmeans— oracle-replayable Lloyd iterations
  6. gap-fill interpolate  — integer linear backfill of a daily series
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_pipe_spark import get_spark
from polars_pipe_spark.functions.similarity import kmeans_train_exact
from polars_pipe_spark.operators.aggregates import grouped_ols, weighted_quantiles
from polars_pipe_spark.operators.inspect import k_anonymity_report
from polars_pipe_spark.operators.joins import bloom_prune_join
from polars_pipe_spark.operators.windows import gap_fill_interpolate


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="analytics_toolkit")
    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731

    print("== 1. bloom-pruned join (orders ⋈ high-balance customers)")
    rich = t("customer").filter(F.col("c_acctbal") > 7500).select("c_custkey")
    joined = bloom_prune_join(t("orders"), rich, "o_custkey", "c_custkey")
    print(f"   joined rows: {joined.count()}")

    print("== 2. per-nation OLS: lifetime order value ~ account balance")
    cust = t("customer").select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
    )
    per_cust = t("orders").groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    ols = grouped_ols(
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey),
        ["c_nationkey"], "x", "y",
    )
    ols.orderBy("c_nationkey").show(5)

    print("== 3. k-anonymity / l-diversity before a release")
    k_anonymity_report(
        t("customer"), ["c_nationkey", "c_mktsegment"], k=5,
        sensitive_col="c_acctbal",
    ).show()

    print("== 4. quantity-weighted price quartiles (exact, no global sort)")
    base = t("lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.round(F.col("l_quantity")).cast("long").alias("w"),
    )
    for q, (rank, val) in sorted(
        weighted_quantiles(base, "v", "w", [0.25, 0.5, 0.75]).items()
    ):
        print(f"   p{int(q * 100)}: value_cents={val} (weight rank {rank})")

    print("== 5. integer-lattice k-means (oracle-replayable training)")
    kmeans_train_exact(
        t("embeddings"), "embedding", "vec_id", k=4, iterations=2
    ).select("cluster_id", "n_vecs", "mean_sse").orderBy("cluster_id").show()

    print("== 6. gap-filled daily per-user value series")
    ev = t("events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    per = ev.groupBy("user_id", day.alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    bounds = per.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    filled = gap_fill_interpolate(
        spine.join(per, ["user_id", "day"], "left"), "user_id", "day", "v"
    )
    filled.groupBy("fill_kind").count().show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
