"""Data-integrity operators: order-invariant table checksums, cross-split
exact-content leakage audit, and exact frequency-floor heavy hitters.

Extends the reference's validation surface (reference
``src/polars_pipe/validation.py`` — column contracts / filter splits) with
the warehouse-level integrity checks a 100 TB lake needs:

- ``table_checksum`` — did a replication / migration / rewrite preserve a
  table exactly?  Order-invariant (sum of per-row content hashes), so the
  source and the rewritten copy can be compared without sorting either
  side.  ONE aggregation, map-side partial, no shuffle beyond the final
  1-row combine — the cheapest possible full-table verification.
- ``split_leakage`` — did an exact duplicate document land on both sides
  of a train/eval split?  Grouped by content fingerprint (near-unique key,
  no skew), pair counts only over fingerprints that actually straddle
  splits — the audit that catches eval contamination a per-row hash split
  cannot prevent when the corpus itself contains duplicates.
- ``heavy_hitters`` — the exact version of the Misra–Gries question:
  every token whose corpus frequency exceeds ``threshold_ppm`` parts per
  million.  Integer cross-multiply (no float division), broadcast 1-row
  total.  At 100 TB the token-count table is vocabulary-sized (≪ corpus),
  so the same two-aggregate shape holds.

All pure ``F.*`` expressions — no Python row UDFs, no windows over
unbounded frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: modulus keeping the checksum inside a BIGINT on both engines
CHECKSUM_MOD = 1 << 62


def row_fingerprint_int(*cols: str | Column) -> Column:
    """48-bit BIGINT content hash of the ``|``-joined string rendering of
    ``cols`` (nulls render as ``chr(0)`` so NULL != '' != '0').  Uses the
    first 12 md5 hex digits via ``conv(hex, 16, 10)`` — portable to any
    engine with md5 + string ops, and evaluated as one JVM expression."""
    rendered = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00")
        )
        for c in cols
    ]
    return F.conv(F.substring(F.md5(F.concat_ws("|", *rendered)), 1, 12), 16, 10).cast(
        "long"
    )


def table_checksum(df: DataFrame, cols: list[str], table_name: str) -> DataFrame:
    """One (table_name, n_rows, checksum) row.  ``checksum`` is the sum of
    per-row 48-bit content hashes mod 2^62 — order-invariant, so two
    physically different layouts of the same rows (repartitioned,
    compacted, sorted) produce the same value.  The sum is carried in
    DECIMAL(38,0): a BIGINT sum would overflow beyond ~2^15 rows, and at
    100 TB scale the row count is ~1e12."""
    fp = row_fingerprint_int(*cols)
    return df.agg(
        F.lit(table_name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(fp.cast("decimal(38,0)"))
            % F.lit(CHECKSUM_MOD).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("checksum"),
    )


def split_leakage(
    df: DataFrame, fingerprint_col: str | Column, split_col: str
) -> DataFrame:
    """Per ordered split-pair, the number of distinct content fingerprints
    present in BOTH splits (and the number of documents carrying them).
    Shape: group by fingerprint (near-unique → no skew), keep only
    fingerprints spanning ≥2 splits (a tiny frame — the duplicate
    population), then enumerate that frame's split pairs.  The corpus is
    scanned once; no self-join of the full table."""
    fp = (
        F.col(fingerprint_col) if isinstance(fingerprint_col, str) else fingerprint_col
    )
    per_split = (
        df.select(fp.alias("fp"), F.col(split_col).alias("split"))
        .groupBy("fp", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    a = per_split.select(
        "fp",
        F.col("split").alias("split_a"),
        F.col("n_docs").alias("docs_a"),
    )
    b = per_split.select(
        "fp",
        F.col("split").alias("split_b"),
        F.col("n_docs").alias("docs_b"),
    )
    pairs = a.join(b, "fp").filter(F.col("split_a") < F.col("split_b"))
    return pairs.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_shared_fingerprints"),
        F.sum(F.col("docs_a") + F.col("docs_b")).alias("n_leaked_docs"),
    )


def heavy_hitters(
    token_df: DataFrame, token_col: str = "token", threshold_ppm: int = 1000
) -> DataFrame:
    """Every token whose exact corpus frequency exceeds ``threshold_ppm``
    parts per million: ``1_000_000 * cnt > threshold_ppm * total`` —
    integer cross-multiply, no float division, deterministic output set.
    Two aggregates: the vocabulary count (vocab-sized, ≪ corpus) and a
    broadcast 1-row total."""
    counts = token_df.groupBy(F.col(token_col).alias("token")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = token_df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.lit(1_000_000) * F.col("cnt") > F.lit(threshold_ppm) * F.col("total"))
        .select("token", "cnt", "total")
    )


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Deterministic CMS hash h_row(key): first 8 hex chars of
    md5(row || ':' || key) as an integer, mod width — identical in any
    engine with md5 (the q30 seed-extraction pattern)."""
    h = F.md5(F.concat(F.lit(str(row)), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch table (Cormode & Muthukrishnan 2005): the
    ``depth × width`` counter grid as rows ``(row, bucket, cnt)``.

    Scale shape: ONE pass over the corpus — each input row contributes
    ``depth`` (row, bucket) increments via a literal-array explode, then
    a single partial-agg groupBy on the (row, bucket) key (cardinality ≤
    depth·width, tiny) — this is exactly the mergeable-sketch property:
    sketches of two partitions/days sum cell-wise. No driver state; the
    grid itself is the output."""
    if width < 1 or depth < 1:
        raise ValueError(
            f"count_min_sketch: width={width} and depth={depth} must be >= 1"
        )
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    probe_keys: DataFrame,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """CMS point estimates for a bounded probe-key set, alongside exact
    counts: ``est = min over rows of grid[row][h_row(key)]`` — the
    classic one-sided estimator (est ≥ exact always; the audit column
    proves it row by row). The probe side is broadcast; the grid is
    depth·width rows, also broadcast — the only corpus-scale work is the
    sketch build and the exact-count groupBy it is audited against."""
    grid = count_min_sketch(df, key_col, width, depth)
    probes = probe_keys.select(F.col(key_col).alias("key")).distinct()
    probe_cells = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col("key"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("key", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    est = (
        probe_cells.join(F.broadcast(grid), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    return (
        est.join(exact, "key", "left")
        .select(
            "key",
            F.coalesce("exact", F.lit(0)).cast("long").alias("exact"),
            F.col("est").cast("long").alias("est"),
            (F.col("est") >= F.coalesce("exact", F.lit(0))).alias("never_undercounts"),
        )
    )


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    m: int = 64,
) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet et al. 2007) with EXPLICIT
    registers — the mergeable-cardinality counterpart to
    :func:`count_min_sketch` (Spark's ``approx_count_distinct`` wraps
    HLL++ as a black box; this one exposes the register state so
    sketches from different partitions/days merge by register-wise MAX,
    and every intermediate is engine-reproducible for the oracle).

    Determinism choices: the 64-bit value hash comes from md5 hex
    (register = first 32 bits mod m, rank = 33 − bit_length of the next
    32 bits, so rank ∈ [1, 33]); the harmonic-mean denominator is the
    INTEGER Σ_j 2^(40−M_j) via shiftleft (≤ 64·2^40 ≈ 7e13 — exact, no
    float accumulation ordering); the single double division and the
    standard small-range linear-counting correction use identical
    operand order in both engines.

    Returns one row: ``(m, n_exact, n_zero_regs, s_scaled, est)`` —
    ``n_exact`` is the exact distinct count the estimate is audited
    against.
    """
    if m < 1:
        raise ValueError(f"hll_cardinality: m={m} must be >= 1")
    key = F.col(key_col).cast("string")
    h = F.md5(key)
    reg = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(33)).otherwise(33 - F.length(F.bin(h2)))
    regs = df.select(reg.alias("reg"), rank.alias("rank")).groupBy("reg").agg(
        F.max("rank").alias("m_r")
    )
    spark = df.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("reg"))
        .join(regs, "reg", "left")
        .select(F.coalesce("m_r", F.lit(0)).alias("m_r"))
    )
    summary = full.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - m_r)")).alias("s_scaled"),
        F.sum(F.when(F.col("m_r") == 0, 1).otherwise(0)).alias("n_zero_regs"),
    )
    exact = df.agg(F.countDistinct(key).alias("n_exact"))
    alpha_expr = f"0.7213 / (1.0 + 1.079 / {m}.0)"
    raw = f"({alpha_expr}) * {m}.0 * {m}.0 * CAST(shiftleft(CAST(1 AS BIGINT), 40) AS DOUBLE) / CAST(s_scaled AS DOUBLE)"
    est = (
        f"CASE WHEN n_zero_regs > 0 AND ({raw}) <= 2.5 * {m}.0 "
        f"THEN {m}.0 * ln({m}.0 / CAST(n_zero_regs AS DOUBLE)) "
        f"ELSE ({raw}) END"
    )
    return (
        summary.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).cast("long").alias("m"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_zero_regs").cast("long").alias("n_zero_regs"),
            F.col("s_scaled").cast("long").alias("s_scaled"),
            F.round(F.expr(est), 4).alias("est"),
        )
    )


def hll_cardinality_by(
    df: DataFrame,
    group_col: str,
    key_col: str,
    m: int = 64,
) -> DataFrame:
    """Grouped :func:`hll_cardinality`: one register set PER GROUP (the
    "distinct users per segment" shape). Untouched registers are never
    materialised — ``n_zero = m − present`` and their 2^40 mass is added
    arithmetically, so the per-group state is ≤ m rows and the whole
    computation is two partial-agg shuffles on (group, reg) then
    (group). Same integer denominator and estimator as the global form.

    Returns one row per group:
    ``(<group_col>, m, n_exact, n_zero_regs, s_scaled, est)``.
    """
    if m < 1:
        raise ValueError(f"hll_cardinality_by: m={m} must be >= 1")
    key = F.col(key_col).cast("string")
    h = F.md5(key)
    reg = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(33)).otherwise(33 - F.length(F.bin(h2)))
    regs = (
        df.select(F.col(group_col).alias("g"), reg.alias("reg"), rank.alias("rank"))
        .groupBy("g", "reg")
        .agg(F.max("rank").alias("m_r"))
    )
    summary = regs.groupBy("g").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - m_r)"))
            + (F.lit(m) - F.count(F.lit(1)))
            * F.expr("shiftleft(CAST(1 AS BIGINT), 40)")
        ).alias("s_scaled"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero_regs"),
    )
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(key).alias("n_exact")
    )
    alpha_expr = f"0.7213 / (1.0 + 1.079 / {m}.0)"
    raw = (
        f"({alpha_expr}) * {m}.0 * {m}.0 * "
        f"CAST(shiftleft(CAST(1 AS BIGINT), 40) AS DOUBLE) / CAST(s_scaled AS DOUBLE)"
    )
    est = (
        f"CASE WHEN n_zero_regs > 0 AND ({raw}) <= 2.5 * {m}.0 "
        f"THEN {m}.0 * ln({m}.0 / CAST(n_zero_regs AS DOUBLE)) "
        f"ELSE ({raw}) END"
    )
    return summary.join(exact, "g").select(
        F.col("g").alias(group_col),
        F.lit(m).cast("long").alias("m"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_zero_regs").cast("long").alias("n_zero_regs"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
        F.round(F.expr(est), 4).alias("est"),
    )
