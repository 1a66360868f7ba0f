"""Interleaved paired A/B for q237 (bpe_encode_stats) — r14 verdict
item 4: conflicting r14 readings (paired 2.43x vs isolated 0.86x) for
the bpe_train lazy-localCheckpoint conversion.

Toggles EVERY localCheckpoint in the query between shipped behavior
(lazy where written) and forced eager=True by wrapping
DataFrame.localCheckpoint, running the real entry q237 interleaved in
one session.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q237.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402

from bench import calibration_probe  # noqa: E402
from polars_pipe_spark import get_spark  # noqa: E402

_ORIG = DataFrame.localCheckpoint


def _forced_eager(self, eager=True):
    return _ORIG(self, eager=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qname = os.environ.get("AB_QUERY", "q237_bpe_encode")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    spark = get_spark(app_name="ab_q237")
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    calibration_probe(spark)
    print("calib_pre", min(calibration_probe(spark), calibration_probe(spark)))

    results: dict[str, list[float]] = {}
    for _ in range(rounds):
        for variant in ("shipped_lazy", "forced_eager"):
            DataFrame.localCheckpoint = (
                _forced_eager if variant == "forced_eager" else _ORIG
            )
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{qname} {variant}")
            t0 = time.time()
            qmap[qname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 2)
            results.setdefault(variant, []).append(dt)
            print(qname, variant, dt, flush=True)
    DataFrame.localCheckpoint = _ORIG
    for variant, samples in sorted(results.items()):
        print("BEST", qname, variant, min(samples), "all", samples)
    print("calib_post", min(calibration_probe(spark), calibration_probe(spark)))


if __name__ == "__main__":
    main()
