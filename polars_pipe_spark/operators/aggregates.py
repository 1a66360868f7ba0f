"""Aggregation helpers for skewed data.

``salted_agg``: two-stage aggregation for hot keys. Stage 1 groups by
(key, salt) — the hot key's rows spread over ``n_salts`` reducers — and
computes PARTIAL aggregates; stage 2 groups by key and merges. Results
are identical to a direct groupBy for the supported algebraic aggregates;
the win is that no single reducer sees all rows of a hot key.

AQE's skew-join handling covers joins; this covers aggregations whose
per-key cardinality is extreme (e.g. counting tokens where one token is
40% of a 100 TB corpus). For merely-large data, plain groupBy + map-side
partial aggregation (automatic) is already optimal — use salting only
when a key's row count exceeds what one task should hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (partial agg builder, merge agg builder)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: {out_name: (agg_fn_name, col)} with agg_fn_name in
    sum/count/min/max (mean = sum+count composed by the caller).

    Example::

        salted_agg(df, ["token"], {"n": ("count", "token"),
                                   "total": ("sum", "value")})
    """
    unknown = [a for a, (fn, _) in aggs.items() if fn not in _ALGEBRAIC]
    if unknown:
        raise KeyError(f"non-algebraic aggregates not saltable: {unknown}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def mean_via_salted(df: DataFrame, group_cols: list[str], col: str, out: str = "mean") -> Column:
    """Convenience: skew-safe mean = salted sum / salted count."""
    agged = salted_agg(
        df, group_cols, {"__sum": ("sum", col), "__cnt": ("count", col)}
    )
    return agged.withColumn(out, F.col("__sum") / F.col("__cnt")).drop("__sum", "__cnt")


def robust_group_stats(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    med_col: str = "med",
    mad_col: str = "mad",
) -> DataFrame:
    """Exact per-group median and MAD (median absolute deviation) — the
    outlier-robust twin of mean/std z-scoring for quality filtering.

    Exact MAD is irreducibly two-pass (the deviation needs the median
    first): pass 1 aggregates (median, n) per group; pass 2 re-joins the
    per-group median (broadcast — the group table is orders of magnitude
    smaller than the data) and aggregates the absolute deviations. Both
    passes are single shuffles on the group key with partial aggregation.

    Output: one row per group — (*group_cols, n, med, mad).
    """
    g = list(group_cols)
    med = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"), F.percentile(col, 0.5).alias(med_col)
    )
    joined = df.join(F.broadcast(med), g)
    return joined.groupBy(*g).agg(
        F.max("n").alias("n"),
        F.max(med_col).alias(med_col),
        F.percentile(F.abs(F.col(col) - F.col(med_col)), 0.5).alias(mad_col),
    )


def equidepth_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram with EXACT bucket bounds:
    interior bounds are ``percentile_disc`` VALUES (actual data points,
    rank ``ceil(q·n)−1`` — no interpolation arithmetic, so bounds are
    reproducible bit-for-bit on any engine), computed by the shared
    distributed-selection machinery; bucket assignment is then a static
    literal-bounds expression — no sort of the full data, no ntile.

    r9 plan fix (found by the sf1 sweep, 105 s → ~2 s): the old form
    ran ``percentile_disc`` × (n_buckets−1) in one agg — Spark's
    implementation BUFFERS EVERY VALUE per aggregate, nine copies of
    the whole column through one reducer — and then assigned buckets
    with an interpreted per-row HOF over the broadcast bounds. Bounds
    now come from :func:`exact_quantiles`'s selection loop at the
    percentile_disc ranks (every job a map-side-combinable aggregate),
    and the assignment is a codegen'd sum of literal comparisons.

    Output: (bucket, n_rows, lo, hi) — bucket b holds rows where
    bounds[b-1] < x <= bounds[b] (b in [0, n_buckets-1]).
    """
    import math

    qs = [i / n_buckets for i in range(1, n_buckets)]
    base = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    n, lo, hi = base.agg(F.count(F.lit(1)), F.min("__v"), F.max("__v")).first()
    bounds: list = []
    if n:
        ks = sorted({max(int(math.ceil(q * n)) - 1, 0) for q in qs})
        vals = _exact_ranks(base, ks, n, lo, hi, 10_000, 100_000)
        bounds = [vals[max(int(math.ceil(q * n)) - 1, 0)] for q in qs]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
    return (
        df.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )


def skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Key-skew diagnostic: the ``top_n`` hottest keys with their share
    of all rows, their ratio to the MEDIAN key's row count, and the salt
    fan-out that would level them (``ceil(n_rows / median)`` reducers of
    median size). This is the measurement step before reaching for
    ``salted_agg``/``salted_join`` — salt only what the report proves hot.

    Plan: one groupBy for per-key counts, a 1-row global summary
    (broadcast), TakeOrdered for the top-n — no global sort, no collect.
    """
    g = list(key_cols)
    counts = df.groupBy(*g).agg(F.count(F.lit(1)).alias("n_rows"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.percentile("n_rows", 0.5).alias("median_rows"),
    )
    return (
        counts.crossJoin(F.broadcast(summary))
        .select(
            *g,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total_rows").cast("double")).alias(
                "row_share"
            ),
            (F.col("n_rows").cast("double") / F.col("median_rows")).alias("skew_ratio"),
            F.ceil(F.col("n_rows").cast("double") / F.col("median_rows"))
            .cast("long")
            .alias("suggested_salts"),
            "n_keys",
            "total_rows",
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in g])
        .limit(top_n)
    )


def grouped_pandas_stats(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """Per-group quartile statistics via ``applyInPandas`` (grouped-map
    Arrow path) — the escape hatch for per-group logic Catalyst can't
    express (model fits, custom solvers); THIS body is deliberately a
    computation with a SQL twin so the whole path stays oracle-checkable:
    numpy 'linear' percentiles on integer data are bit-identical to
    quantile_cont (dyadic fractions × integers stay exact).

    Scale: one shuffle on the group key; each group must fit a worker's
    memory (grouped-map contract — use only when per-group size is
    bounded; unbounded groups belong in plain aggregations).

    Output: (*group_cols, n, q1, median, q3, iqr).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    out_fields = ", ".join(f"{c} string" for c in group_cols)
    schema = f"{out_fields}, n long, q1 double, median double, q3 double, iqr double"

    def stats(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[col].to_numpy(dtype="float64")
        q1, med, q3 = np.percentile(v, [25, 50, 75], method="linear")
        return pd.DataFrame(
            {
                **{c: [k] for c, k in zip(group_cols, key)},
                "n": [len(v)],
                "q1": [q1],
                "median": [med],
                "q3": [q3],
                "iqr": [q3 - q1],
            }
        )

    return df.groupBy(*group_cols).applyInPandas(stats, schema)


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int = 10_000,
    direct_threshold: int = 100_000,
) -> dict[float, tuple[int, float]]:
    """EXACT order statistics without a global sort — distributed
    selection by iterative histogram narrowing.

    For each q the target is the 0-based rank ``floor((n-1)*q)`` (the
    'lower' discrete quantile — an actual element, so any engine that
    sorts the column agrees on the value). Rather than sorting n rows
    through a single reducer (``percentile``/NTILE — the one-reducer
    shape this repo bans), each round runs ONE aggregate job: an
    equi-width histogram of ``n_buckets`` counts, the driver locates the
    bucket containing the rank from the ≤n_buckets cumulative counts,
    and the next round recurses into that bucket. Ranges shrink by
    ~n_buckets× per round — ceil(log_10000 n) rounds (3 aggregate scans
    at a trillion rows), then a TakeOrdered top-(k+1) finishes inside
    the ≤``direct_threshold``-row bucket. Constant-value buckets
    short-circuit (skew-proof: a million copies of one value resolve
    without enumeration).

    Returns {q: (rank, value)}. Scale notes: every job is a full-scan
    aggregate with map-side partials; the per-round filter is a plain
    range predicate, so it pushes down to parquet min/max stats and
    later rounds often skip row groups entirely.
    """
    import math

    base = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    # shared first round: one stats job + one histogram job serve ALL
    # requested quantiles; only the (rare) per-bucket recursion diverges.
    n, lo, hi = base.agg(
        F.count(F.lit(1)), F.min("__v"), F.max("__v")
    ).first()
    if n == 0:
        return {float(q): (0, None) for q in qs}
    ranks = {float(q): int(math.floor((n - 1) * q)) for q in qs}
    vals = _exact_ranks(
        base, sorted(set(ranks.values())), n, lo, hi, n_buckets, direct_threshold
    )
    return {q: (k, vals[k]) for q, k in ranks.items()}


def _exact_ranks(
    base: DataFrame,
    ks: list[int],
    n: int,
    lo,
    hi,
    n_buckets: int,
    direct_threshold: int,
) -> dict[int, float]:
    """Shared selection core: value at each 0-based rank in ``ks`` of
    the non-null ``__v`` column (stats (n, lo, hi) already computed by
    the caller). One histogram job serves every requested rank; only the
    per-bucket recursion diverges. Used by :func:`exact_quantiles`
    (ranks floor((n−1)q)) and :func:`equidepth_histogram`
    (percentile_disc ranks ceil(q·n)−1)."""
    out: dict[int, float] = {}
    if lo == hi:
        return {k: lo for k in ks}
    width = (float(hi) - float(lo)) / n_buckets
    if width <= 0.0 or n <= direct_threshold:
        return {k: _take_rank(base, k) for k in ks}
    b_expr = F.least(
        F.floor((F.col("__v") - float(lo)) / width).cast("long"),
        F.lit(n_buckets - 1).cast("long"),
    )
    hist = sorted(
        (r["b"], r["c"])
        for r in base.groupBy(b_expr.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # r14: resolve every rank whose target bucket already fits
    # ``direct_threshold`` in ONE shared job (window row_number per
    # bucket over the union of target buckets) instead of a
    # stats+TakeOrdered job pair PER rank — the histogram told us each
    # bucket's row count, so the per-rank "is it small enough yet?"
    # probe jobs were pure overhead. Only oversized buckets (count >
    # direct_threshold) still recurse. The window is bounded by
    # construction: every partition is a single bucket whose row count
    # the histogram measured at ≤ direct_threshold.
    direct: dict[int, tuple[int, int]] = {}  # k -> (bucket, in-bucket rank)
    for k in ks:
        seen = 0
        for b, c in hist:
            if seen + c > k:
                if c <= direct_threshold:
                    direct[k] = (b, k - seen)
                else:
                    cond = (
                        (F.col("__v") >= float(lo) + (b - 1) * width)
                        & (F.col("__v") <= float(lo) + (b + 2) * width)
                        & (b_expr == b)
                    )
                    out[k] = _select_rank(
                        base.filter(cond), k - seen, n_buckets, direct_threshold
                    )
                break
            seen += c
    if direct:
        from pyspark.sql import Window  # noqa: PLC0415

        bucket_ids = sorted({b for b, _ in direct.values()})
        # range conjunct: superset of every target bucket (1-bucket slack
        # each side) — exists only so parquet min/max row-group pruning
        # applies; membership itself uses the IDENTICAL bucket expression
        # the histogram counted with (float-boundary safety, see above).
        range_cond = None
        for b in bucket_ids:
            rc = (F.col("__v") >= float(lo) + (b - 1) * width) & (
                F.col("__v") <= float(lo) + (b + 2) * width
            )
            range_cond = rc if range_cond is None else (range_cond | rc)
        wanted: dict[int, list[int]] = {}
        for b, rk in direct.values():
            wanted.setdefault(b, []).append(rk + 1)
        rn_cond = None
        for b, rns in wanted.items():
            c = (F.col("__bk") == b) & F.col("__rn").isin(rns)
            rn_cond = c if rn_cond is None else (rn_cond | c)
        w = Window.partitionBy("__bk").orderBy("__v")
        rows = (
            base.filter(range_cond & b_expr.isin([int(b) for b in bucket_ids]))
            .select("__v", b_expr.alias("__bk"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(rn_cond)
            .collect()
        )
        vals = {(r["__bk"], r["__rn"]): r["__v"] for r in rows}
        for k, (b, rk) in direct.items():
            out[k] = vals[(b, rk + 1)]
    return out


def _take_rank(cur: DataFrame, k: int) -> float:
    """Element at 0-based rank k of a bounded frame: TakeOrdered
    top-(k+1), then its max — one driver row, never a full sort."""
    return cur.orderBy("__v").limit(k + 1).agg(F.max("__v")).first()[0]


def _select_rank(
    base: DataFrame, k: int, n_buckets: int, direct_threshold: int
) -> float:
    cur, cur_k = base, k
    while True:
        n_cur, lo, hi = cur.agg(
            F.count(F.lit(1)), F.min("__v"), F.max("__v")
        ).first()
        if lo == hi:
            return lo
        if n_cur <= direct_threshold:
            return _take_rank(cur, cur_k)
        width = (float(hi) - float(lo)) / n_buckets
        if width <= 0.0:  # denormal-narrow range: finish directly
            return _take_rank(cur, cur_k)
        b_expr = F.least(
            F.floor((F.col("__v") - float(lo)) / width).cast("long"),
            F.lit(n_buckets - 1).cast("long"),
        )
        hist = sorted(
            (r["b"], r["c"])
            for r in cur.groupBy(b_expr.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        seen = 0
        for b, c in hist:
            if seen + c > cur_k:
                cur_k -= seen
                # membership must use the IDENTICAL bucket expression the
                # histogram counted with — a reconstructed range predicate
                # can disagree at float boundaries and silently lose rows.
                # The one-bucket-slack range conjunct is a strict superset
                # under any rounding; it exists only so parquet min/max
                # row-group pruning applies on later rounds.
                cond = (
                    (F.col("__v") >= float(lo) + (b - 1) * width)
                    & (F.col("__v") <= float(lo) + (b + 2) * width)
                    & (b_expr == b)
                )
                cur = cur.filter(cond)
                break
            seen += c


def trimmed_mean(
    df: DataFrame,
    col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> tuple[float, float, int, float]:
    """Trimmed mean without a global sort: the trim thresholds are EXACT
    order statistics from :func:`exact_quantiles` (histogram-narrowing
    selection), then one aggregate averages the in-range values with a
    DECIMAL sum (addition-order independent — a double sum would change
    with partitioning). Returns (lo_val, hi_val, n_kept, mean).

    The thresholds being actual elements makes the whole statistic
    engine-independent: any system that sorts the column and averages
    the same closed range reproduces it bit-for-bit.
    """
    qs = exact_quantiles(df, col, [lo_q, hi_q])
    lo_val, hi_val = qs[lo_q][1], qs[hi_q][1]
    c = F.col(col)
    row = (
        df.filter(c.isNotNull() & (c >= lo_val) & (c <= hi_val))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(c.cast("decimal(28,6)")) / F.count(F.lit(1))
            ).cast("double").alias("mean"),
        )
        .first()
    )
    return float(lo_val), float(hi_val), int(row["n"]), float(row["mean"])


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """Per-group simple linear regression (OLS) from EXACT moments.

    ``x_col``/``y_col`` must be integer-valued (scale money to cents
    first): the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,( Σy²))
    are summed in DECIMAL(38,0) — exact, order-free, mergeable — so the
    whole regression is ONE map-side-combinable aggregate per group, and
    the only floating-point steps are the final divisions, computed in a
    fixed expression order any engine reproduces bit-identically:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)        as DOUBLE
        intercept = (Σy − slope·Σx) / n                     as DOUBLE
        corr_r    = num / (sqrt(den_x) · sqrt(den_y))       as DOUBLE

    Degenerate groups (zero x-variance) get NULL slope/intercept/corr.
    Scale: a single groupBy — the same shuffle profile as any grouped
    sum; no second pass, no residual join, no driver math. Exactness
    bound: intermediate products must fit DECIMAL(38,0) (|n·Σxy| <
    10³⁸) — far beyond any realistic cents-scaled corpus.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("decimal(38,0)")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("decimal(38,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    den_x = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    den_y = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    slope = F.when(den_x != 0.0, num / den_x)
    intercept = F.when(
        den_x != 0.0,
        (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double"))
        / F.col("__n").cast("double"),
    )
    corr = F.when(
        (den_x != 0.0) & (den_y != 0.0), num / (F.sqrt(den_x) * F.sqrt(den_y))
    )
    return agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        corr.alias("corr_r"),
    )


def percentile_cont(
    df: DataFrame,
    col: str,
    ps: list[float],
    n_buckets: int = 10_000,
    direct_threshold: int = 100_000,
) -> dict[float, float | None]:
    """EXACT interpolated (continuous) percentiles WITHOUT the
    single-reducer ``F.percentile`` aggregate: Spark's exact percentile
    buffers EVERY value of the column in ONE aggregation buffer (the
    same one-reducer shape :func:`equidepth_histogram` banned in r9).
    This form reduces each percentile to the TWO order statistics
    around the interpolation position, fetches them through the shared
    histogram-narrowing selection core (:func:`_exact_ranks` — every
    job a map-side-combinable aggregate), and interpolates on the
    driver with Spark's own formula::

        h = (n - 1) * p;  lo = floor(h);  hi = ceil(h)
        value = (hi - h) * v[lo] + (h - lo) * v[hi]     # v = sorted col

    which is bit-for-bit what ``F.percentile`` computes (getPercentile
    in Spark's Percentile aggregate), so swapping a call site cannot
    change a query's output (pinned by
    ``test_percentile_cont_bitwise_matches_spark``). NULLs excluded,
    matching the aggregate.
    """
    import math

    base = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    n, lo, hi = base.agg(F.count(F.lit(1)), F.min("__v"), F.max("__v")).first()
    if not n:
        return {float(p): None for p in ps}
    ranks: set[int] = set()
    for p in ps:
        h = (n - 1) * float(p)
        ranks.add(int(math.floor(h)))
        ranks.add(int(math.ceil(h)))
    vals = _exact_ranks(
        base, sorted(ranks), n, lo, hi, n_buckets, direct_threshold
    )
    out: dict[float, float | None] = {}
    for p in ps:
        h = (n - 1) * float(p)
        lo_r, hi_r = int(math.floor(h)), int(math.ceil(h))
        lv = float(vals[lo_r])
        if hi_r == lo_r:
            out[float(p)] = lv
        else:
            out[float(p)] = (hi_r - h) * lv + (h - lo_r) * float(vals[hi_r])
    return out


def grouped_percentile_cont(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    ps: list[float],
    n_buckets: int = 10_000,
    direct_threshold: int = 100_000,
) -> dict[tuple, dict[float, float]]:
    """Per-group interpolated percentiles with SHARED jobs across all
    groups — the grouped escape from per-group ``F.percentile``, whose
    aggregation buffer holds EVERY value of its group in one reducer
    task (15M-row groups at sf10 made q62 a 68 s straggler).

    Caller contract: group cardinality is BOUNDED (a stats row and a
    histogram per group land on the driver) — no stricter than the
    per-group ``F.percentile`` shape it replaces, where each group was
    already a single reducer.

    Job count is constant in group count and percentile count: one
    per-group stats job; one per-(group, bucket) histogram job over the
    groups big enough to need narrowing; one shared row_number window
    job fetching EVERY group's target order statistics at once (small
    groups resolve whole under a sentinel bucket id −1, large groups
    through their located buckets; every window partition is bounded by
    ``direct_threshold`` / the group size, known before the job runs).
    A bucket still exceeding ``direct_threshold`` rows (extreme value
    skew) recurses through :func:`_select_rank` per rank. Interpolation
    uses Spark's ``F.percentile`` formula (see :func:`percentile_cont`)
    so call sites produce bit-identical output.

    Returns {group_key_tuple: {p: value}} over groups with ≥ 1 non-NULL
    value (all-NULL groups are absent — the aggregate form returns NULL
    there; callers reattach those rows from their own counts).
    """
    import math

    g = list(group_cols)
    base = df.select(
        *[F.col(c) for c in g], F.col(val_col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    stats = (
        base.groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("__v").alias("__lo"),
            F.max("__v").alias("__hi"),
        )
        .collect()
    )
    info: dict[tuple, dict] = {}
    for r in stats:
        key = tuple(r[c] for c in g)
        ranks: set[int] = set()
        for p in ps:
            h = (r["__n"] - 1) * float(p)
            ranks.add(int(math.floor(h)))
            ranks.add(int(math.ceil(h)))
        info[key] = {
            "n": r["__n"], "lo": r["__lo"], "hi": r["__hi"],
            "ranks": sorted(ranks),
        }

    def key_cond(key: tuple):
        c = None
        for col_name, kv in zip(g, key):
            e = F.col(col_name) == F.lit(kv)
            c = e if c is None else (c & e)
        return c

    # vals[key][absolute_rank] = value; filled by (a) constant-range
    # groups, (b) the shared window job, (c) per-bucket recursion.
    vals: dict[tuple, dict[int, float]] = {k: {} for k in info}
    # (key, bucket_id, [(absolute_rank, row_number_target)], row_cond)
    window_parts: list[tuple[tuple, int, list[tuple[int, int]], object]] = []
    # one CASE column gives every large group its OWN equi-width bucket
    # id; small/whole groups fall through to the sentinel −1, so the
    # same column also partitions the shared window job for them.
    bk_expr = F.lit(-1).cast("long")
    hist_groups: dict[tuple, float] = {}
    for key, meta in info.items():
        if meta["lo"] == meta["hi"]:
            for k in meta["ranks"]:
                vals[key][k] = meta["lo"]
            continue
        width = (float(meta["hi"]) - float(meta["lo"])) / n_buckets
        if meta["n"] <= direct_threshold or width <= 0.0:
            window_parts.append(
                (key, -1, [(k, k + 1) for k in meta["ranks"]], key_cond(key))
            )
            continue
        hist_groups[key] = width
        bk_expr = F.when(
            key_cond(key),
            F.least(
                F.floor((F.col("__v") - float(meta["lo"])) / width).cast("long"),
                F.lit(n_buckets - 1).cast("long"),
            ),
        ).otherwise(bk_expr)
    if hist_groups:
        hg_cond = None
        for key in hist_groups:
            c = key_cond(key)
            hg_cond = c if hg_cond is None else (hg_cond | c)
        hist_rows = (
            base.filter(hg_cond)
            .groupBy(*g, bk_expr.alias("__bk"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        )
        hists: dict[tuple, list[tuple[int, int]]] = {}
        for r in hist_rows:
            key = tuple(r[c] for c in g)
            hists.setdefault(key, []).append((r["__bk"], r["__c"]))
        for key, width in hist_groups.items():
            hist = sorted(hists[key])
            counts = dict(hist)
            lo = float(info[key]["lo"])
            offsets: dict[int, int] = {}
            acc = 0
            for b, c in hist:
                offsets[b] = acc
                acc += c
            per_bucket: dict[int, list[tuple[int, int]]] = {}
            for k in info[key]["ranks"]:
                b = None
                for bb, cc in hist:
                    if offsets[bb] + cc > k:
                        b = bb
                        break
                per_bucket.setdefault(b, []).append((k, k - offsets[b] + 1))
            for b, targets in per_bucket.items():
                cond = (
                    key_cond(key)
                    & (F.col("__v") >= lo + (b - 1) * width)
                    & (F.col("__v") <= lo + (b + 2) * width)
                    & (bk_expr == b)
                )
                if counts[b] <= direct_threshold:
                    window_parts.append((key, b, targets, cond))
                else:
                    for abs_k, rn in targets:
                        vals[key][abs_k] = _select_rank(
                            base.filter(cond).select("__v"),
                            abs_k - offsets[b],
                            n_buckets,
                            direct_threshold,
                        )
    if window_parts:
        from pyspark.sql import Window  # noqa: PLC0415

        part_cond = None
        rn_cond = None
        for key, b, targets, cond in window_parts:
            part_cond = cond if part_cond is None else (part_cond | cond)
            c = (
                key_cond(key)
                & (F.col("__bk") == b)
                & F.col("__rn").isin([rn for _k, rn in targets])
            )
            rn_cond = c if rn_cond is None else (rn_cond | c)
        w = Window.partitionBy(*g, "__bk").orderBy("__v")
        rows = (
            base.filter(part_cond)
            .select(*g, "__v", bk_expr.alias("__bk"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(rn_cond)
            .collect()
        )
        got: dict[tuple, dict[tuple[int, int], float]] = {}
        for r in rows:
            key = tuple(r[c] for c in g)
            got.setdefault(key, {})[(r["__bk"], r["__rn"])] = r["__v"]
        for key, b, targets, _cond in window_parts:
            for abs_k, rn in targets:
                vals[key][abs_k] = got[key][(b, rn)]
    out: dict[tuple, dict[float, float]] = {}
    for key, meta in info.items():
        out[key] = {}
        for p in ps:
            h = (meta["n"] - 1) * float(p)
            lo_r, hi_r = int(math.floor(h)), int(math.ceil(h))
            lv = float(vals[key][lo_r])
            if hi_r == lo_r:
                out[key][float(p)] = lv
            else:
                out[key][float(p)] = (hi_r - h) * lv + (h - lo_r) * float(
                    vals[key][hi_r]
                )
    return out


def weighted_quantiles(
    df: DataFrame,
    val_col: str,
    weight_col: str,
    qs: list[float],
    n_buckets: int = 10_000,
    direct_threshold: int = 100_000,
) -> dict[float, tuple[int, int]]:
    """EXACT weighted order statistics — :func:`exact_quantiles`
    generalised to integer weights (revenue-weighted medians, token-
    weighted percentiles). Semantics: over the expanded multiset where
    each row appears ``weight`` times (W = Σweights), quantile q is the
    element at 0-based rank ``floor((W-1)·q)`` — an actual data value,
    so any engine that sorts and accumulates integer weights agrees
    exactly.

    Same distributed-selection shape as the unweighted form: each round
    is ONE aggregate (per-bucket weight sums + row counts), the driver
    narrows into the bucket whose cumulative weight covers the target,
    and a bounded TakeOrdered walk finishes once the bucket holds ≤
    ``direct_threshold`` ROWS (row count bounds the collect; weight
    totals can be astronomically larger). Weights must be positive
    integers; rows with NULL value/weight are excluded.

    Returns {q: (weight_rank, value)}.
    """
    base = df.select(
        F.col(val_col).alias("__v"), F.col(weight_col).cast("long").alias("__w")
    ).filter(F.col("__v").isNotNull() & (F.col("__w") > 0))
    W = base.agg(F.sum("__w")).first()[0]
    if not W:
        return {float(q): (0, None) for q in qs}
    # r14: share the selection rounds across ALL requested quantiles —
    # the old form re-ran the full narrowing (stats job + histogram job
    # + direct walk) from scratch PER q, recomputing identical
    # first-round jobs nq times. One stats job + one weighted histogram
    # now serve every rank, and every rank whose bucket already fits
    # ``direct_threshold`` resolves in ONE shared cumulative-weight
    # window job (same job-batching as :func:`_exact_ranks`). Only
    # oversized buckets still recurse, one narrowing per rank.
    ranks = sorted({int((W - 1) * q) for q in qs})
    vals = _weighted_ranks(base, ranks, n_buckets, direct_threshold)
    return {
        float(q): (int((W - 1) * q), vals[int((W - 1) * q)]) for q in qs
    }


def _weighted_ranks(
    base: DataFrame,
    ks: list[int],
    n_buckets: int,
    direct_threshold: int,
) -> dict[int, int]:
    """Value at each 0-based WEIGHT rank in ``ks`` of the (__v, __w)
    frame. One stats job + one weighted-histogram job serve every rank;
    ranks whose bucket holds ≤ ``direct_threshold`` ROWS share one
    cumulative-weight window job; oversized buckets fall back to the
    per-rank narrowing loop (:func:`_select_weighted_rank`)."""
    out: dict[int, int] = {}
    n_rows, lo, hi = base.agg(
        F.count(F.lit(1)), F.min("__v"), F.max("__v")
    ).first()
    if lo == hi:
        return {k: lo for k in ks}
    width = (float(hi) - float(lo)) / n_buckets
    if n_rows <= direct_threshold or width <= 0.0:
        # bounded direct walk, ONE sorted collect shared by every rank
        rows = base.orderBy("__v").limit(n_rows).collect()
        seen = 0
        i = 0
        remaining = list(ks)
        for r in rows:
            seen += r["__w"]
            while i < len(remaining) and remaining[i] < seen:
                out[remaining[i]] = r["__v"]
                i += 1
            if i == len(remaining):
                break
        for k in remaining[i:]:
            out[k] = rows[-1]["__v"]
        return out
    b_expr = F.least(
        F.floor((F.col("__v") - float(lo)) / width).cast("long"),
        F.lit(n_buckets - 1).cast("long"),
    )
    hist = sorted(
        (r["b"], r["w"], r["c"])
        for r in base.groupBy(b_expr.alias("b"))
        .agg(F.sum("__w").alias("w"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    direct: dict[int, tuple[int, int]] = {}  # k -> (bucket, in-bucket weight rank)
    for k in ks:
        seen = 0
        for b, w, c in hist:
            if seen + w > k:
                cond = (
                    (F.col("__v") >= float(lo) + (b - 1) * width)
                    & (F.col("__v") <= float(lo) + (b + 2) * width)
                    & (b_expr == b)
                )
                if c <= direct_threshold:
                    direct[k] = (b, k - seen)
                else:
                    out[k] = _select_weighted_rank(
                        base.filter(cond), k - seen, n_buckets, direct_threshold
                    )
                break
            seen += w
    if direct:
        from pyspark.sql import Window  # noqa: PLC0415

        bucket_ids = sorted({b for b, _ in direct.values()})
        # range conjunct: superset of every target bucket (1-bucket
        # slack each side) so parquet min/max row-group pruning applies;
        # membership itself uses the IDENTICAL bucket expression the
        # histogram counted with (float-boundary safety).
        range_cond = None
        for b in bucket_ids:
            rc = (F.col("__v") >= float(lo) + (b - 1) * width) & (
                F.col("__v") <= float(lo) + (b + 2) * width
            )
            range_cond = rc if range_cond is None else (range_cond | rc)
        # per-row running weight: ROWS frame, NOT the default RANGE frame
        # — RANGE includes all __v-tie peers in the cumulative, which can
        # leave a target with no owning row (every peer's cum-w already
        # past it). With a ROWS frame cum is strictly increasing (w > 0),
        # so exactly one row owns each target: cum-w > t on the row whose
        # weight span covers t. Tie order among equal __v is free — any
        # order selects the same VALUE.
        w = (
            Window.partitionBy("__bk")
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum("__w").over(w)
        tgt_cond = None
        for k, (b, rk) in direct.items():
            c = (
                (F.col("__bk") == b)
                & (F.col("__cw") > rk)
                & ((F.col("__cw") - F.col("__w")) <= rk)
            )
            tgt_cond = c if tgt_cond is None else (tgt_cond | c)
        rows = (
            base.filter(range_cond & b_expr.isin([int(b) for b in bucket_ids]))
            .select("__v", "__w", b_expr.alias("__bk"))
            .withColumn("__cw", cum)
            .filter(tgt_cond)
            .collect()
        )
        found = [
            (r["__bk"], r["__cw"], r["__w"], r["__v"]) for r in rows
        ]
        for k, (b, rk) in direct.items():
            for fb, fcw, fw, fv in found:
                if fb == b and fcw > rk and fcw - fw <= rk:
                    out[k] = fv
                    break
    return out


def _select_weighted_rank(
    base: DataFrame, k: int, n_buckets: int, direct_threshold: int
):
    cur, cur_k = base, k
    while True:
        n_rows, lo, hi = cur.agg(
            F.count(F.lit(1)), F.min("__v"), F.max("__v")
        ).first()
        if lo == hi:
            return lo
        if n_rows <= direct_threshold:
            rows = cur.orderBy("__v").limit(n_rows).collect()
            seen = 0
            for r in rows:
                if seen + r["__w"] > cur_k:
                    return r["__v"]
                seen += r["__w"]
            return rows[-1]["__v"]
        width = (float(hi) - float(lo)) / n_buckets
        if width <= 0.0:
            # denormal-narrow float range — fall back to a direct walk
            rows = cur.orderBy("__v").limit(n_rows).collect()
            seen = 0
            for r in rows:
                if seen + r["__w"] > cur_k:
                    return r["__v"]
                seen += r["__w"]
            return rows[-1]["__v"]
        b_expr = F.least(
            F.floor((F.col("__v") - float(lo)) / width).cast("long"),
            F.lit(n_buckets - 1).cast("long"),
        )
        hist = sorted(
            (r["b"], r["w"])
            for r in cur.groupBy(b_expr.alias("b"))
            .agg(F.sum("__w").alias("w"))
            .collect()
        )
        seen = 0
        for b, w in hist:
            if seen + w > cur_k:
                cur_k -= seen
                cond = (
                    (F.col("__v") >= float(lo) + (b - 1) * width)
                    & (F.col("__v") <= float(lo) + (b + 2) * width)
                    & (b_expr == b)
                )
                cur = cur.filter(cond)
                break
            seen += w
