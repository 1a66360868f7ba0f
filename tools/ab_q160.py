"""Interleaved paired A/B for q160/q256's fuzzy_join key form at sf10.

Toggles fuzzy_join between hash-then-distinct (r15) and
distinct-then-hash (r14) by monkeypatching deletion_key_hashes_expr,
running the REAL entry queries A/B/A/B in one session so window drift
cannot masquerade as a code effect (q160's sf10 run-to-run spread was
20.6-37.7 s across three windows).

Usage: SPARK_GRAFT_SF_DIR=/tmp/pps_scale/sf10 python tools/ab_q160.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import polars_pipe_spark.operators.joins as J  # noqa: E402
from bench import calibration_probe  # noqa: E402
from polars_pipe_spark import get_spark  # noqa: E402

NEW_FORM = J.deletion_key_hashes_expr


def old_form(col, max_dist):
    return F.transform(
        J.deletion_keys_expr(col, max_dist), lambda k: F.xxhash64(k)
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pps_scale/sf10")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = os.environ.get("AB_QUERIES", "q160_fuzzy_join,q256_entity_resolution").split(",")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    spark = get_spark(app_name="ab_q160")
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    calibration_probe(spark)
    print("calib_pre", min(calibration_probe(spark), calibration_probe(spark)))

    results: dict[tuple[str, str], list[float]] = {}
    for _ in range(rounds):
        for form_name, form in (("new", NEW_FORM), ("old", old_form)):
            J.deletion_key_hashes_expr = form
            for q in queries:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab {q} {form_name}")
                t0 = time.time()
                qmap[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.time() - t0, 2)
                results.setdefault((q, form_name), []).append(dt)
                print(q, form_name, dt, flush=True)
    J.deletion_key_hashes_expr = NEW_FORM
    for (q, form_name), samples in sorted(results.items()):
        print("BEST", q, form_name, min(samples), "all", samples)
    print("calib_post", min(calibration_probe(spark), calibration_probe(spark)))


if __name__ == "__main__":
    main()
