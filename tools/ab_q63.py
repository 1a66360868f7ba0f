"""Eager-vs-lazy localCheckpoint A/B for the q63 sf10 regression
(r14 verdict item 3).

Replicates the q63 path (minhash_near_dups -> connected components)
with the CC loop's three checkpoint sites parameterised:

  all_lazy    — r14 shipped code (eager=False everywhere)
  all_eager   — r13 form (eager=True everywhere)
  edges_eager — hypothesis fix: only `edges` eager. With everything
                lazy, round-1's join job reads `edges` through TWO
                unmaterialised branches (directly and via the lazy
                `labels` init), so the whole upstream minhash pipeline
                (the persisted-but-unfilled `pairs`) races and can run
                twice inside one job; the per-round label checkpoint
                has a single first consumer (the fixpoint aggregate)
                and keeps the one-job-per-round win.

Usage: SPARK_GRAFT_SF_DIR=/tmp/pps_scale/sf10 python tools/ab_q63.py [runs]
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
from polars_pipe_spark.functions.dedup import minhash_near_dups  # noqa: E402


def dedup_clusters_ab(pairs, eager_edges, eager_labels, eager_rounds,
                      max_iterations=10, explode_edges=False):
    if explode_edges:
        # both directions from ONE scan of pairs: the unionByName form
        # reads the (unfilled) pairs persist through two branches that
        # race to compute the whole upstream near-dup pipeline
        edges = (
            pairs.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                        ),
                        F.struct(
                            F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .distinct()
            .localCheckpoint(eager=eager_edges)
        )
    else:
        edges = (
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
            .distinct()
            .localCheckpoint(eager=eager_edges)
        )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=eager_labels)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        upd = F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label")))
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                upd.alias("label"),
                (upd < F.col("label")).cast("int").alias("chg"),
            )
            .localCheckpoint(eager=eager_rounds)
        )
        changed = new_labels.agg(F.sum("chg")).first()[0]
        labels = new_labels
        if not changed:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


VARIANTS = {
    "all_lazy": ((False, False, False), False),
    "all_eager": ((True, True, True), False),
    "edges_eager": ((True, False, False), False),
    "explode_eager": ((True, False, False), True),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pps_scale/sf10")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    variants = os.environ.get("AB_VARIANTS", "all_lazy,edges_eager,all_eager").split(",")
    spark = get_spark(app_name="ab_q63")
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    calibration_probe(spark)
    print("calib_pre", min(calibration_probe(spark), calibration_probe(spark)))

    # read through the entry helper (gated round-robin repartition) so
    # the measured pipeline parallelism matches the real q63 exactly
    import __spark_entry__ as entry_mod

    docs = entry_mod._t_par(spark, sf_dir, "documents")
    for variant in variants:
        flags, explode_edges = VARIANTS[variant]
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"q63ab {variant}")
            t0 = time.time()
            pairs = minhash_near_dups(
                docs, "text", "doc_id",
                shingle_k=3, sig_k=8, n_bands=4, threshold=0.2,
            ).select("id_a", "id_b").persist()
            out = dedup_clusters_ab(pairs, *flags, explode_edges=explode_edges)
            out.select(F.col("node").alias("doc_id"), "cluster_id").write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
            pairs.unpersist()
        print(variant, "best", min(samples), "all", samples, flush=True)

    print("calib_post", min(calibration_probe(spark), calibration_probe(spark)))


if __name__ == "__main__":
    main()
