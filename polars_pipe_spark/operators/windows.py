"""Window-based operators: sessionization, top-k per group.

Spark-native extension surface (no reference implementation — SURVEY.md
§2.9). All windows are PARTITIONED (never a bare global orderBy window),
so they scale: cost is one hash shuffle on the partition key + per-key
sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based session ids per user: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``.

    Classic two-window formulation: lag to detect gaps, running sum of
    new-session flags to number sessions. Deterministic given a total
    order — pass ``tiebreak_cols`` when ``ts_col`` can tie.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = gap_minutes * 60.0
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("double") - prev_ts.cast("double") > gap_sec)
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(wsum))


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """k best rows per group by the given ordering (must be total for
    determinism — include a unique tiebreaker column)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def time_spine(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    start: str,
    end: str,
    step: str = "1 hour",
    bucket_col: str = "bucket_ts",
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Gap-filled time series: for every distinct key, emit one row per
    ``step`` bucket in [start, end] (inclusive), left-joined with the
    aggregated events of that bucket; empty buckets keep the spine row
    with zero/null aggregates.

    Scale: the spine is a per-key ``sequence()`` array exploded on the
    executors — no driver-side range loop, no cross join against a
    materialised calendar table; the only shuffles are the distinct on
    keys and the (key, bucket) aggregation join. Step granularity must
    match the truncation unit implied by the bucket (pass step='1 hour'
    with hourly truncation).
    """
    unit = step.split()[-1].rstrip("s")  # '1 hour' -> 'hour'
    lo, hi = F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
    spine = (
        df.select(F.col(key_col)).distinct()
        .withColumn(bucket_col, F.explode(F.sequence(lo, hi, F.expr(f"INTERVAL {step}"))))
    )
    aggs = agg_exprs or {"n_events": F.count(F.lit(1))}
    per_bucket = (
        df.filter((F.col(ts_col) >= lo) & (F.col(ts_col) <= hi))
        .groupBy(key_col, F.date_trunc(unit, F.col(ts_col)).alias(bucket_col))
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    out = spine.join(per_bucket, [key_col, bucket_col], "left")
    # count-like aggregates fill 0 on empty buckets; others stay null
    if agg_exprs is None:
        out = out.withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
    return out


def debounce(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cooldown_minutes: float = 30.0,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep only the FIRST event of each burst per key: an event is
    suppressed when it follows its predecessor by ≤ ``cooldown_minutes``
    (alert de-noising, retry collapsing, at-most-once-per-window
    triggers). A burst is exactly a session, so this is sessionize +
    keep-rank-1 — one shuffle on the key, one ordered window pass.
    """
    s = sessionize(
        df, key_col, ts_col, gap_minutes=cooldown_minutes,
        tiebreak_cols=tiebreak_cols, session_col="__sess",
    )
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col, "__sess").orderBy(*order)
    return (
        s.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sess")
    )


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel conversion: for each entity, stage i counts as
    reached only if its earliest occurrence is at-or-after the earliest
    qualifying occurrence of stage i-1 (classic product-analytics
    funnel). Returns one row per stage with ``n_converted``.

    Strategy: ONE aggregate computes min(ts) per (key, stage) as a
    conditional-min pivot — no window, no self-joins per stage — then
    the ordered-reach condition folds left-to-right as row expressions
    on the per-key frame (one row per key), and a second small aggregate
    counts conversions. Two shuffles total regardless of funnel depth.
    """
    mins = df.groupBy(key_col).agg(
        *[
            F.min(F.when(F.col(stage_col) == s, F.col(ts_col))).alias(f"__t{i}")
            for i, s in enumerate(stages)
        ]
    )
    # reach_i = t_i is not null and t_i >= reach_ts_{i-1}; carry the
    # qualifying timestamp forward so out-of-order stages break the chain
    reach = F.col("__t0")
    flags = [reach.isNotNull().cast("long").alias("__r0")]
    for i in range(1, len(stages)):
        reach = F.when(
            reach.isNotNull() & (F.col(f"__t{i}") >= reach), F.col(f"__t{i}")
        )
        flags.append(reach.isNotNull().cast("long").alias(f"__r{i}"))
    per_key = mins.select(*flags)
    totals = per_key.agg(
        *[F.sum(f"__r{i}").alias(f"__n{i}") for i in range(len(stages))]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"__n{i}").alias("n_converted"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return totals.select(F.explode(stage_rows).alias("s")).select(
        "s.stage_idx", "s.stage", "s.n_converted"
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "filled",
    kind_col: str = "fill_kind",
) -> DataFrame:
    """Fill the NULL slots of a (spine-complete) integer time series:
    interior gaps linearly INTERPOLATE between the surrounding known
    samples, trailing gaps carry the last observation forward (LOCF),
    and leading gaps (nothing observed yet) stay NULL — the standard
    sensor/metric backfill semantics.

    ``order_col`` must be integer-valued (day number, epoch bucket) and
    ``value_col`` integer-scaled (e.g. cents): the interpolation
    ``prev + ((next − prev)·(t − t_prev)) DIV (t_next − t_prev)`` is
    then EXACT integer arithmetic — deterministic and engine-portable
    (Spark ``DIV`` and DuckDB ``//`` both truncate toward zero).

    Shape: two per-key ordered window passes (running last-known
    backward, first-known forward) over the already-keyed spine — the
    same partitioning the spine join produced, no extra shuffle beyond
    the window sort; no self-joins, no explode.
    """
    v, d = F.col(value_col), F.col(order_col)
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    staged = df.select(
        "*",
        F.last(v, ignorenulls=True).over(w_back).alias("__pv"),
        F.last(F.when(v.isNotNull(), d), ignorenulls=True).over(w_back).alias("__pd"),
        F.first(v, ignorenulls=True).over(w_fwd).alias("__nv"),
        F.first(F.when(v.isNotNull(), d), ignorenulls=True).over(w_fwd).alias("__nd"),
    )
    return staged.selectExpr(
        *df.columns,
        f"""CASE
              WHEN {value_col} IS NOT NULL THEN {value_col}
              WHEN __pv IS NOT NULL AND __nv IS NOT NULL THEN
                __pv + (({order_col} - __pd) * (__nv - __pv)) DIV (__nd - __pd)
              WHEN __pv IS NOT NULL THEN __pv
            END AS {out_col}""",
        f"""CASE
              WHEN {value_col} IS NOT NULL THEN 'known'
              WHEN __pv IS NOT NULL AND __nv IS NOT NULL THEN 'interp'
              WHEN __pv IS NOT NULL THEN 'locf'
              ELSE 'leading'
            END AS {kind_col}""",
    )
