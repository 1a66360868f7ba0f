"""Deterministic sampling and dataset splitting for training pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed-dependent but not
reproducible across engines or partitionings; training-data pipelines
want CONTENT-DETERMINISTIC sampling: the same row lands in the same
split everywhere, forever. These use md5 of a key column — portable to
any engine (the DuckDB oracle reproduces it exactly), stable under
repartitioning, and uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(col: str | Column, n_buckets: int = 100) -> Column:
    """Uniform bucket in [0, n_buckets) from the first 4 md5 nibbles of
    the key (pure expression arithmetic — no engine-specific hash)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    val = F.lit(0)
    for i in range(1, 5):
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        val = val * 16 + nib
    return val % n_buckets


def hash_sample(df: DataFrame, key_col: str, fraction: float, n_buckets: int = 100) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key content."""
    return df.filter(md5_bucket(key_col, n_buckets) < int(fraction * n_buckets))


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    split_col: str = "split",
    n_buckets: int = 100,
) -> DataFrame:
    """Label every row 'train'/'test' deterministically by key content —
    rows never migrate between splits as the dataset grows."""
    cut = int(test_fraction * n_buckets)
    return df.withColumn(
        split_col,
        F.when(md5_bucket(key_col, n_buckets) < cut, F.lit("test")).otherwise(F.lit("train")),
    )


def cluster_aware_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    test_fraction: float = 0.1,
    id_a: str = "id_a",
    id_b: str = "id_b",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/test split: every member of a near-duplicate
    cluster lands in the SAME split, so no test document has a training
    near-copy (the leakage a naive per-row split causes). Rows outside
    any cluster are their own singleton cluster (cluster_id = own id).

    Shape: transitive closure over the pair list (iterative min-label,
    lineage-truncated), one left join to attach cluster ids, then the
    content-hash split keyed by cluster id. The pair/cluster frames are
    proportional to the duplicate population, not the corpus.
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(pairs, id_a, id_b)
    with_cluster = (
        df.join(clusters, df[id_col] == clusters["node"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
        .drop("node")
    )
    return train_test_split(with_cluster, "cluster_id", test_fraction, split_col)


def _check_global_window(
    part_col: str | None, allow_global_window: bool, fn: str
) -> None:
    """Refuse the single-partition global-window default (r12 verdict
    task 4a): ``part_col=None`` plans ALL rows through one window task —
    correct on a laptop frame, a one-reducer wall at corpus scale. The
    caller must say ``allow_global_window=True`` out loud, mirroring the
    cumulative registry's mandatory ``order_by`` contract."""
    if part_col is None and not allow_global_window:
        raise ValueError(
            f"{fn}: part_col=None plans a SINGLE-PARTITION global window "
            "(every row through one task). Pass part_col to pack per "
            "group in parallel, or allow_global_window=True to accept "
            "the one-reducer plan on a small frame."
        )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    bin_tokens: int = 2048,
    part_col: str | None = None,
    allow_global_window: bool = False,
) -> DataFrame:
    """Greedy context-window packing: assign each document a bin id so
    consecutive documents fill ~bin_tokens-token training sequences.

    Semantics (declared, deterministic): documents are ordered by
    ``id_col`` within ``part_col`` (or globally when None); a document's
    bin is ``floor(preceding_tokens / bin_tokens)`` — i.e. bins are cut
    by running-token offset, a document straddling a boundary belongs to
    the bin where it starts.

    Scale: ALWAYS pass ``part_col`` on big data — the window then
    partitions by it (per-source packing, parallel). A None part_col is
    a SINGLE-PARTITION global window and is refused unless
    ``allow_global_window=True`` (r12 verdict: the scale-killer must not
    be one default away — same contract as the cumulative registry's
    mandatory order_by). One shuffle, no UDFs. Oracle-expressible as a
    SQL window.
    """
    from pyspark.sql import Window

    _check_global_window(part_col, allow_global_window, "pack_sequences")
    if part_col is None:
        w = Window.orderBy(id_col)
        part_exprs = []
    else:
        w = Window.partitionBy(part_col).orderBy(id_col)
        part_exprs = [F.col(part_col)]
    preceding = F.coalesce(
        F.sum(token_col).over(w) - F.col(token_col), F.lit(0)
    ).cast("long")
    return df.select(
        *part_exprs,
        F.col(id_col),
        F.col(token_col),
        F.floor(preceding / bin_tokens).cast("long").alias("bin_id"),
    )


def pack_attention_bins(
    df: DataFrame,
    token_col: str,
    id_col: str,
    bin_tokens: int = 2048,
    part_col: str | None = None,
    allow_global_window: bool = False,
) -> DataFrame:
    """Tokenizer-aware sequence packing with cross-document attention-mask
    boundaries: one row per packed training sequence (bin) carrying the
    in-sequence start offset of every member document — exactly the
    boundary list a block-diagonal cross-document attention mask is built
    from at collate time (each document attends only within itself).

    Extends :func:`pack_sequences`' declared semantics (bins cut by
    running-token offset ordered by ``id_col``; a document straddling a
    boundary belongs to the bin where it STARTS), so a document's offset
    within its bin is ``preceding_tokens % bin_tokens``.

    Output: ``(part_col?, bin_id, n_docs, total_tokens,
    boundaries array<long>)`` with boundaries sorted ascending —
    all-integer cells, oracle-exact.

    Scale: the same single window shuffle as pack_sequences (ALWAYS pass
    ``part_col`` on big data — a None part_col is a single-partition
    global window) plus one groupBy whose groups hold ~``bin_tokens``
    tokens of documents by construction, so the collected boundary list
    is bounded regardless of corpus size. A None part_col is refused
    unless ``allow_global_window=True``.
    """
    from pyspark.sql import Window

    _check_global_window(part_col, allow_global_window, "pack_attention_bins")
    if part_col is None:
        w = Window.orderBy(id_col)
        keys = []
    else:
        w = Window.partitionBy(part_col).orderBy(id_col)
        keys = [part_col]
    tok = F.col(token_col).cast("long")
    preceding = F.coalesce(F.sum(tok).over(w) - tok, F.lit(0)).cast("long")
    placed = df.select(
        *keys,
        F.col(id_col),
        tok.alias("__tok"),
        F.floor(preceding / bin_tokens).cast("long").alias("bin_id"),
        (preceding % bin_tokens).cast("long").alias("__offset"),
    )
    return placed.groupBy(*keys, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("total_tokens"),
        F.array_sort(F.collect_list("__offset")).alias("boundaries"),
    )


def mix_sources(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    n_buckets: int = 1000,
) -> DataFrame:
    """Deterministic data-mixture reweighting: keep ~weights[source] of
    each source's rows, selected by content hash of ``key_col`` so the
    sample is stable under repartitioning, engine changes, and dataset
    growth. The weight lookup is a broadcast map join (a CASE chain for
    few sources would also codegen, but the join scales to thousands of
    sources); the filter itself is one pure-expression predicate on the
    scan — no shuffle of the data side."""
    spark = df.sparkSession
    rows = [(s, float(w)) for s, w in weights.items()]
    wdf = F.broadcast(
        spark.createDataFrame(rows, f"{source_col} string, __w double")
    )
    joined = df.join(wdf, source_col, "left")
    cut = F.floor(F.coalesce(F.col("__w"), F.lit(default_weight)) * n_buckets)
    return joined.filter(md5_bucket(key_col, n_buckets) < cut).drop("__w")


def packed_texts(
    df: DataFrame,
    text_col: str,
    token_col: str,
    id_col: str,
    bin_tokens: int = 2048,
    part_col: str | None = None,
    sep: str = " ",
    allow_global_window: bool = False,
) -> DataFrame:
    """Materialise the training sequences that :func:`pack_sequences`
    assigns: one row per bin with the documents' text concatenated in
    ``id_col`` order.

    Scale: the concat is a grouped ``collect_list(struct(id, text))``
    sorted per bin — bins are ~``bin_tokens`` tokens by construction, so
    each group is small and bounded regardless of corpus size; the only
    shuffle is the groupBy on (part, bin). Output columns:
    ``(part?, bin_id, n_docs, sum_tokens, seq_text)``.
    """
    from pyspark.sql import Window

    _check_global_window(part_col, allow_global_window, "packed_texts")
    # pack_sequences projects away the text column, so recompute the bin
    # assignment here over the full row instead of joining back (one
    # window pass — same single shuffle as pack_sequences itself).
    if part_col is None:
        w = Window.orderBy(id_col)
        keys = []
    else:
        w = Window.partitionBy(part_col).orderBy(id_col)
        keys = [part_col]
    preceding = F.coalesce(
        F.sum(token_col).over(w) - F.col(token_col), F.lit(0)
    ).cast("long")
    binned = df.withColumn("bin_id", F.floor(preceding / bin_tokens).cast("long"))
    docs = F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col(text_col))))
    return binned.groupBy(*keys, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("sum_tokens"),
        F.array_join(F.transform(docs, lambda s: s[text_col]), sep).alias("seq_text"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    k: int,
    prefilter_buckets: int | None = None,
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum, chosen deterministically by
    content-hash order (md5 of the key, key as tiebreak) — the same rows
    win under any partitioning or engine, unlike ``sampleBy`` (seeded,
    fraction-not-count, engine-specific).

    Scale: one shuffle on the strata + a per-stratum sort. When strata
    are huge relative to ``k``, pass ``prefilter_buckets`` to hash-filter
    each stratum to ~``2k`` survivors BEFORE the sort-heavy window — the
    filter is a scan-side predicate, so the window sorts only the
    survivors. The pre-filter keeps rows whose bucket falls below
    ``2k/stratum`` of the hash space, which keeps all md5-order winners
    as long as the stratum estimate is not >2x under — it is a
    performance knob for known stratum sizes, not a default.
    """
    order = F.md5(F.col(key_col).cast("string"))
    if prefilter_buckets is not None:
        df = df.filter(md5_bucket(key_col, prefilter_buckets) < max(2 * k, 1))
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def md5_unit(col: str | Column) -> Column:
    """Deterministic uniform double in (0, 1) from 8 md5 nibbles of the
    key — portable expression arithmetic (the DuckDB oracle reproduces
    it digit for digit), stable under repartitioning."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    val = F.lit(0).cast("long")
    for i in range(1, 9):
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        val = val * 16 + nib
    return (val + 1).cast("double") / float(16**8 + 1)


def weighted_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: ``k`` rows
    (per group), inclusion probability proportional to ``weight_col``.

    Efraimidis–Spirakis A-ES: rank by ``ln(u)/w`` descending where ``u``
    is a content-hash uniform — equivalent to ranking ``u^(1/w)`` but
    numerically stable for large weights. Content-derived ``u`` makes
    the draw reproducible across engines, partitionings and reruns —
    ``df.sample``'s seed is none of those.

    Scale: one shuffle on the group keys + per-group sort of rank keys
    (doubles). For the global case (``group_cols=None``) the ordered
    window would collapse to one partition, so take the top-k with
    ``orderBy().limit()`` (TakeOrderedAndProject) instead.

    Rows with NULL or non-positive weight are excluded up front: weight 0
    would yield ``ln(u)/0 = -inf`` (silent exclusion) and a negative
    weight a positive rank key that sorts FIRST, silently inverting the
    sampling semantics.
    """
    wt = F.col(weight_col).cast("double")
    df = df.filter(wt > 0)
    es_key = F.log(md5_unit(key_col)) / wt
    if not group_cols:
        return df.orderBy(es_key.desc(), F.col(key_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(es_key.desc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weights per group: w_g ∝ n_g**alpha,
    normalised over groups — the standard multilingual/multi-domain
    rebalancing rule (alpha=1 keeps natural proportions, alpha→0 flattens
    to uniform). Returns one row per group with n_rows, weight (double)
    and, if ``budget`` is given, target_rows = floor(budget * weight).

    Scale: ONE count aggregate over the corpus (map-side combine), then
    all arithmetic happens on the tiny per-group frame; the corpus is
    never re-scanned. For cross-engine exactness prefer alpha=0.5 —
    pow(x, 0.5) lowers to sqrt, which IEEE requires correctly rounded,
    so Spark and any SQL oracle agree bit-for-bit; general alpha goes
    through libm pow and may differ in the last ulp across runtimes.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    scaled = (
        F.sqrt(F.col("n_rows").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    )
    w = Window.partitionBy()  # bounded: one row per group, never corpus-sized
    out = counts.withColumn("__s", scaled).withColumn(
        "weight", F.col("__s") / F.sum("__s").over(w)
    )
    if budget is not None:
        out = out.withColumn(
            "target_rows", F.floor(F.col("weight") * F.lit(int(budget))).cast("long")
        )
    return out.drop("__s")


def quality_bins(
    df: DataFrame,
    score_col: str | Column,
    n_bins: int = 10,
    token_col: str | Column | None = None,
) -> DataFrame:
    """Curriculum binning: fixed-width bins over a [0,1] quality score —
    bin = min(floor(score*n_bins), n_bins-1) — with per-bin doc counts
    (and token sums when ``token_col`` is given). Fixed-width bins need
    NO global sort or NTILE window (the one-reducer shape); binning is a
    pure row expression and the aggregate is an ordinary groupBy.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    bin_id = F.least(
        F.floor(s * n_bins).cast("long"), F.lit(n_bins - 1).cast("long")
    ).alias("bin_id")
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_col is not None:
        t = F.col(token_col) if isinstance(token_col, str) else token_col
        df = df.withColumn("__qb_tok", t)
        aggs.append(F.sum("__qb_tok").alias("sum_tokens"))
    return df.groupBy(bin_id).agg(*aggs)


def length_bucket_stats(
    df: DataFrame,
    token_col: str | Column,
    boundaries: list[int],
) -> DataFrame:
    """Padding-waste report for length-bucketed batching: assign each
    document to the smallest boundary ≥ its token count (docs longer
    than the last boundary truncate to it) and report, per bucket,
    document count, real tokens, capacity (n_docs × boundary) and
    wasted padding — the table that decides a training run's bucket
    boundaries. Pure row expression + one groupBy; boundaries are a
    bounded literal list."""
    t = F.col(token_col) if isinstance(token_col, str) else token_col
    bs = sorted(boundaries)
    bucket = F.lit(bs[-1])
    for b in reversed(bs[:-1]):
        bucket = F.when(t <= b, F.lit(b)).otherwise(bucket)
    eff = F.least(t, F.lit(bs[-1]))  # tokens kept after truncation
    return (
        df.select(bucket.alias("bucket"), eff.alias("__tok"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket")).alias("capacity"),
            (F.col("n_docs") * F.col("bucket") - F.col("sum_tokens")).alias(
                "padding_waste"
            ),
        )
    )
