"""Statistics battery tour: the drift/testing toolkit over the events
stream, every statistic exact where exactness is possible. Run:

    python examples/statistics_battery.py [sf_dir]

Stages (each one of the engine's oracle-checked operators):
  1. two-sample KS          — exact ECDF distance, hierarchical prefix sum
  2. Mann–Whitney U         — tie-corrected integer midranks, no global sort
  3. one-way ANOVA          — F from exact integer moments
  4. Wilson intervals       — binomial CIs that never leave [0,1]
  5. Theil–Sen trend        — median of pairwise slopes, outlier-proof
  6. seasonal backtest      — WAPE/bias of the t−7 baseline, integer ppm
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from polars_pipe_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="statistics_battery")
    qs = entry.queries()
    for name, title in [
        ("q239_ks_drift", "Kolmogorov–Smirnov: purchase vs click values"),
        ("q255_mann_whitney", "Mann–Whitney U (tie-corrected, exact)"),
        ("q240_anova", "one-way ANOVA across event types"),
        ("q247_wilson_intervals", "Wilson 95% CIs for purchase share by dow"),
        ("q259_theil_sen", "Theil–Sen robust daily trend"),
        ("q262_seasonal_backtest", "seasonal-naive backtest (WAPE/bias)"),
    ]:
        print(f"== {title} ==")
        qs[name](spark, sf_dir).show(10, truncate=False)


if __name__ == "__main__":
    main()
