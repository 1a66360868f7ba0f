"""Stage-level A/B for the q61 sf10 regression (r14 verdict item 2).

Reconstructs q61's phases under three key schemes and times each with
the noop sink in ONE session, calibration-probed, so the hashed-key
join blowup can be located before deciding between a partial revert
(JVM keygen + string keys) and a skew/strategy fix.

Variants:
  expr_hash   — r14 shipped code: deletion_keys_expr + xxhash64 longs
  expr_str    — partial revert: deletion_keys_expr, raw string keys
  udf_str     — r13 form: pandas-UDF keygen, string keys

Phases per variant:
  keygen — cust-side explode only (noop)
  full   — the whole query (noop)

Usage: SPARK_GRAFT_SF_DIR=/tmp/pps_scale/sf10 python tools/ab_q61.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import calibration_probe  # noqa: E402
from polars_pipe_spark import get_spark  # noqa: E402
from polars_pipe_spark.operators.joins import (  # noqa: E402
    deletion_key_hashes_expr,
    deletion_keys_expr,
)


def udf_keys():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def keys(names: pd.Series) -> pd.Series:
        out = []
        for s in names:
            if s is None:
                out.append([])
                continue
            ks = {s}
            d1 = [s[:i] + s[i + 1 :] for i in range(len(s))]
            ks.update(d1)
            for t in d1:
                ks.update(t[:j] + t[j + 1 :] for j in range(len(t)))
            out.append(sorted(ks))
        return pd.Series(out)

    return keys


def build(spark, sf_dir, variant):
    # read through the entry helper so the scan matches the real q61
    import __spark_entry__ as entry_mod

    reader = (
        entry_mod._t_par if variant.startswith(("repart", "fix")) else entry_mod._t
    )
    cust = reader(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), F.lower(F.col("c_name")).alias("name")
    )
    probes = cust.filter(F.col("cust_id") % 97 == 0).select(
        F.col("cust_id").alias("probe_id"),
        F.concat(F.substring("name", 1, 2), F.substring("name", 4, 100)).alias(
            "probe_name"
        ),
    )

    if variant in ("expr_hash", "repart_hash"):
        def keyed(c):
            return F.explode(
                F.transform(deletion_keys_expr(c, 2), lambda k: F.xxhash64(k))
            ).alias("kh")
    elif variant == "fix":
        def keyed(c):
            return F.explode(deletion_key_hashes_expr(c, 2)).alias("kh")
    elif variant == "expr_str":
        def keyed(c):
            return F.explode(deletion_keys_expr(c, 2)).alias("kh")
    elif variant == "udf_str":
        keys = udf_keys()

        def keyed(c):
            return F.explode(keys(F.col(c))).alias("kh")
    else:
        raise SystemExit(variant)

    cust_k = cust.select("cust_id", "name", keyed("name"))
    probe_k = probes.select("probe_id", "probe_name", keyed("probe_name"))
    cand = (
        cust_k.join(F.broadcast(probe_k), "kh")
        .select("cust_id", "name", "probe_id", "probe_name")
        .distinct()
    )
    full = (
        cand.withColumn("dist", F.levenshtein("name", "probe_name"))
        .filter(F.col("dist") <= 2)
        .select("probe_id", "cust_id", "name", "probe_name", "dist")
    )
    return cust_k, cand, full


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pps_scale/sf10")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    phases = os.environ.get("AB_PHASES", "keygen,join,full").split(",")
    variants = os.environ.get(
        "AB_VARIANTS", "expr_hash,expr_str,udf_str"
    ).split(",")
    spark = get_spark(app_name="ab_q61")
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    calibration_probe(spark)
    print("calib_pre", min(calibration_probe(spark), calibration_probe(spark)))

    for variant in variants:
        cust_k, cand, full = build(spark, sf_dir, variant)
        sel = {"keygen": cust_k, "join": cand, "full": full}
        for phase in phases:
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"q61ab {variant} {phase}")
                t0 = time.time()
                noop(sel[phase])
                samples.append(round(time.time() - t0, 2))
            print(variant, phase, "best", min(samples), "all", samples, flush=True)

    print("calib_post", min(calibration_probe(spark), calibration_probe(spark)))


if __name__ == "__main__":
    main()
