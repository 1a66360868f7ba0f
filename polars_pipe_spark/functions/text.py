"""Text analysis for training-data pipelines: tokenisation, quality
scoring, language-ID heuristic, fingerprinting.

Pure ``F.*`` column expressions — JVM-side, whole-stage-codegen'd — so
they run at full scan speed over a 100 TB documents table, each with an
exact SQL equivalent for the DuckDB oracle. Exceptions are the declared
Arrow-kernel seams for per-token hashing work that Spark's higher-order
functions evaluate INTERPRETED (``cdc_chunks_kernel``, the r8/r9
scale-bug class; the BPE trainer/encoder): bit-exact twins of their
expression forms, parity test-pinned.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic, documented marker sets for the language-ID heuristic.
# (A real pipeline would plug a fastText-style model in via pandas_udf —
# the *shape* here is the scale-relevant part: pure column expressions.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu"],
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokeniser: letter runs, digit runs, single non-space symbols
# (the classic GPT-2 pre-tokenisation shape, expressible as a regex).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: str | Column) -> Column:
    """lower + strip edges + collapse inner whitespace runs to one space."""
    return F.regexp_replace(F.trim(F.lower(_c(col))), r"\s+", " ")


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of the normalised text (empty string → [])."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RE), 0))


def avg_word_len(col: str | Column) -> Column:
    t = tokens(col)
    total_chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.when(
        F.size(t) > 0, total_chars.cast("double") / F.size(t)
    ).otherwise(F.lit(0.0))


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    c = _c(col)
    n = F.length(c)
    puncts = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, puncts.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length docs and
    stopword presence, penalises extreme punctuation density.

    score = 0.4*min(n_tokens/100, 1) + 0.4*min(stopword_ratio*5, 1)
          + 0.2*(1 - min(punct_ratio*10, 1))
    """
    ntok = token_count(col).cast("double")
    return F.round(
        F.least(ntok / 100.0, F.lit(1.0)) * 0.4
        + F.least(stopword_ratio(col) * 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio(col) * 10.0, F.lit(1.0))) * 0.2,
        6,
    )


def quality_classifier(
    col: str | Column, threshold: float = 0.5
) -> dict[str, Column]:
    """Document-level quality classifier: a logistic composition of the
    ``text_stats`` features plus Gopher-style hard reject rules.

    ``quality_prob`` is sigmoid(z) rounded to 6 decimals, with

        z = -1.5 + 2.5*min(n_tokens/200, 1) + 3*min(stopword_ratio*5, 1)
            - 2*min(punct_ratio*10, 1) + [2 <= avg_word_len <= 12]
            + 0.5*[lang_pred = 'en']

    ``reject_reason`` applies rule gates in a fixed order (too_short /
    low_stopword / high_punct / weird_word_len / ok), and ``verdict`` is
    'keep' iff no rule fired AND quality_prob >= threshold.

    Everything is expression arithmetic over already-oracled features —
    the only transcendental is one exp(), rounded to 6 decimals before
    any comparison. Weights are binary-exact floats, additions mirror
    the oracle's left-associative order.

    r14 (guide §1.2/§4.1): the token array is LET-BOUND once per row via
    ``transform(array(tokens(col)), t -> struct(...))[0]``. The naive
    inlined form repeated the split/regexp tokenization ~25 times inside
    one expression tree; a PROJECT de-duplicates that via whole-stage
    codegen subexpression elimination, but a FILTER does not, and the
    higher-order sub-expressions are CodegenFallback (interpreted, no
    CSE) — ``docs.filter(verdict == 'keep')`` alone measured 19.3 s at
    sf1 vs 1.9 s for the identical expression in a Project. Binding the
    array as a lambda argument makes the single tokenization structural
    (a lambda variable is evaluated once wherever the expression sits).
    Every sub-formula is unchanged with the lambda variable substituted
    for ``tokens(col)``, so all three outputs are value-identical
    (pinned by the q128/q144/q150 oracles and the threshold tests)."""
    c = _c(col)
    pr = punct_ratio(col)

    def _in_markers(markers: list[str]):
        return lambda x: x.isin(*markers)

    def _fields(t: Column) -> Column:
        ntok = F.size(t).cast("double")
        hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
        sr = F.when(
            F.size(t) > 0, hits.cast("double") / F.size(t)
        ).otherwise(F.lit(0.0))
        total_chars = F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        awl = F.when(
            F.size(t) > 0, total_chars.cast("double") / F.size(t)
        ).otherwise(F.lit(0.0))
        scores = {
            lang: F.size(F.filter(t, _in_markers(markers)))
            for lang, markers in LANG_MARKERS.items()
        }
        pairs = F.array(
            *[
                F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
                for lang in sorted(LANG_MARKERS)
            ]
        )
        best = F.aggregate(
            pairs,
            F.struct(F.lit(-1).alias("score"), F.lit("").alias("lang")),
            lambda acc, p: F.when(p.score > acc.score, p).otherwise(acc),
        )
        lang_pred = F.when(best.score > 0, best.lang).otherwise(F.lit("unknown"))
        z = (
            F.lit(-1.5)
            + F.least(ntok / 200.0, F.lit(1.0)) * 2.5
            + F.least(sr * 5.0, F.lit(1.0)) * 3.0
            - F.least(pr * 10.0, F.lit(1.0)) * 2.0
            + F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
            + F.when(lang_pred == "en", F.lit(0.5)).otherwise(F.lit(0.0))
        )
        prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        reason = (
            F.when(ntok < 10, F.lit("too_short"))
            .when(sr < 0.01, F.lit("low_stopword"))
            .when(pr > 0.2, F.lit("high_punct"))
            .when((awl < 2.0) | (awl > 12.0), F.lit("weird_word_len"))
            .otherwise(F.lit("ok"))
        )
        verdict = F.when(
            (reason == "ok") & (prob >= threshold), F.lit("keep")
        ).otherwise(F.lit("drop"))
        return F.struct(
            prob.alias("quality_prob"),
            reason.alias("reject_reason"),
            verdict.alias("verdict"),
        )

    packed = F.transform(F.array(tokens(c)), _fields)[0]
    return {
        "quality_prob": packed.getField("quality_prob"),
        "reject_reason": packed.getField("reject_reason"),
        "verdict": packed.getField("verdict"),
    }


def clean_text(col: str | Column) -> Column:
    """C4-style cleaning battery, RE2-safe (no backreferences, so the
    same patterns run identically under Java regex and DuckDB's RE2):

    1. strip control characters (C0 except tab/newline, DEL),
    2. squeeze runs of ! ? , ; to one, runs of 4+ dots to '...',
    3. collapse whitespace runs to a single space and trim.
    """
    c = _c(col)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"!{2,}", "!")
    c = F.regexp_replace(c, r"\?{2,}", "?")
    c = F.regexp_replace(c, r",{2,}", ",")
    c = F.regexp_replace(c, r";{2,}", ";")
    c = F.regexp_replace(c, r"\.{4,}", "...")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Marker-hit count per language over the token array."""
    t = tokens(col)

    def _in_markers(markers: list[str]):
        # closure (NOT a default-arg lambda — a 2-arg lambda would receive
        # the array index as its second argument)
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(t, _in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str | Column, default: str = "unknown") -> Column:
    """argmax language by marker hits; ties broken by language-name order;
    all-zero → default."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # explicit left-fold keeps the FIRST language among equal max scores
    # (array_max on structs would keep the last)
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("").alias("lang")),
        lambda acc, p: F.when(p.score > acc.score, p).otherwise(acc),
    )
    return F.when(best.score > 0, best.lang).otherwise(F.lit(default))


def doc_fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of the normalised text (content-defined,
    whitespace/case-insensitive). md5 is available in both Spark and
    DuckDB → oracle-checkable."""
    return F.md5(normalize_text(col))


def shingles(col: str | Column, k: int = 3) -> Column:
    """Word k-shingles of the normalised text (fewer than k words → one
    shingle of the whole text)."""
    t = tokens(col)
    n = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n <= k, F.array(F.array_join(t, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, k), " "))
    )


def text_stats(col: str | Column) -> dict[str, Column]:
    """The full per-document stat bundle, one pass."""
    return {
        "n_tokens": token_count(col),
        "n_bpe_tokens": bpe_token_count(col),
        "avg_word_len": F.round(avg_word_len(col), 6),
        "punct_ratio": F.round(punct_ratio(col), 6),
        "stopword_ratio": F.round(stopword_ratio(col), 6),
        "quality": quality_score(col),
        "lang_pred": lang_id(col),
        "fingerprint": doc_fingerprint(col),
    }


# ---------------------------------------------------------------------------
# PII scrubbing (pure expressions; regexes chosen to parse identically in
# Java regex and RE2 so the DuckDB oracle matches byte-for-byte)
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement token)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (one scan, three regex extracts)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(_c(col), F.lit(pat), 0))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def scrub_pii(col: str | Column) -> Column:
    """Replace every PII match with its redaction token. Order is fixed
    (email → ipv4 → phone) so engines agree on overlapping matches."""
    out = _c(col)
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# Repetition quality (Gopher-style signals, public: Rae et al. 2021)
# ---------------------------------------------------------------------------


def dup_line_fraction(col: str | Column) -> Column:
    """Excess-duplicate-line fraction: (n_lines - n_distinct_lines) /
    n_lines — 0.0 for single-line docs, 0.25 for [a,b,a,c]. Pure
    expression — full scan speed."""
    lines = F.split(_c(col), "\n")
    n = F.size(lines)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(lines))).cast("double") / n
    )


def top_ngram_fraction(df, text_col: str, id_col: str, n: int = 2):
    """Per-document fraction of word n-grams taken by the single most
    frequent n-gram (the Gopher top-2-gram signal).

    Deliberately NOT a per-row array fold (that is O(len²) per document —
    quadratic in the long-document tail at 100 TB). Instead: explode the
    n-grams once, two-level aggregate (count per (doc, gram) → max per
    doc), join the max back. Linear work, standard shuffles, AQE-skew
    safe. Returns (id_col, top_ngram_frac)."""
    t = tokens(text_col)
    sz = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(sz - n, F.lit(0)))
    grams = F.when(sz < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, n), " "))
    )
    g = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    per_gram = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    return per_doc.select(
        F.col(id_col),
        F.round(F.col("top_c").cast("double") / F.col("total_c"), 6).alias(
            "top_ngram_frac"
        ),
    )


def char_pair_counts(df, text_col: str, id_col: str | None = None):
    """Corpus-wide adjacent-character-pair frequencies within whitespace
    tokens — the statistic the first BPE merge round maximises (count
    the pair, merge the argmax, repeat). One round is a pure corpus
    aggregate, so it runs as a single explode + groupBy at any scale;
    the iterative merge loop is a driver-side fold over these counts.

    Per document the pair list is built with ONE array expression
    (flatten over tokens) and exploded once — no per-word explode, so
    the shuffle input is one row per pair occurrence and map-side
    partial aggregation collapses it before the exchange. Returns
    (pair, n) with BIGINT counts.
    """
    pairs = F.expr(
        f"""flatten(transform({{t}}, w ->
              IF(length(w) < 2,
                 CAST(array() AS array<string>),
                 transform(sequence(1, length(w) - 1),
                           i -> substring(w, i, 2)))))""".format(t="__cpc_toks")
    )
    base = df.select(tokens(text_col).alias("__cpc_toks"))
    return (
        base.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def oov_stats(df, text_col: str, id_col: str, vocab) -> "DataFrame":
    """Per-document out-of-vocabulary statistics against a ``vocab``
    frame with a single ``token`` column (typically the top-k corpus
    tokens — a tokenizer's effective vocabulary). Returns one row per
    document: ``n_tokens``, ``n_oov``, and ``oov_micros`` (scaled
    integer fraction — BIGINT through any cross-engine hash gate).

    Shape: one explode keyed on token, a broadcast-size vocab join
    (vocabularies are bounded — 30-100k entries — so the join never
    shuffles the corpus side on token), and a per-document count
    aggregate. Empty documents keep a row via the left join back onto
    the id frame."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tagged = toks.join(
        F.broadcast(vocab.select("token").withColumn("__in_v", F.lit(1))),
        "token",
        "left",
    )
    per_doc = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    base = df.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.when(
            F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
            F.expr("(n_oov * 1000000) DIV n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("oov_micros"),
    )


def bpe_train(
    df,
    text_col: str,
    n_merges: int = 10,
    return_word_table: bool = False,
):
    """Train ``n_merges`` BPE merges (Sennrich-style) and return them as
    [(left, right, pair_count)] in merge order.

    The classic formulation runs on the distinct-WORD frequency table,
    not the corpus: one corpus-scale aggregate builds (word, freq), and
    every later round touches only that table (distinct words ≪ corpus
    — millions of rows at 100 TB, safely distributed). Per round: ONE
    aggregate counts adjacent symbol pairs weighted by word frequency
    (map-side combined), the argmax merge comes back as a bounded
    1-row TakeOrdered collect (ties: count desc, left asc, right asc —
    total order), and a pure array-fold expression applies the merge
    leftmost-non-overlapping to every symbol sequence.
    ``localCheckpoint`` truncates the plan each round — without it the
    fold nests n_merges deep and codegen blows up (the q63
    label-propagation lesson).

    Merge-count monotonicity (each chosen count ≤ the previous — new
    pairs created by a merge can occur at most as often as the merge
    itself) is the oracle-checkable property q169 asserts.
    """
    # lazy checkpoints throughout the loop (r14): eager=False still
    # truncates lineage and caches the partitions, but materialisation
    # happens inside the FIRST job that reads the frame (the next
    # round's pair-count aggregate) instead of as its own job — halving
    # the per-round job count (8 rounds used to schedule 8 standalone
    # checkpoint jobs on top of the 8 aggregate+argmax jobs).
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("seq", F.split(F.col("w"), ""))
        .select("w", "freq", "seq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.expr(
                        "CASE WHEN size(seq) < 2 THEN array() "
                        "ELSE transform(sequence(1, size(seq) - 1), "
                        "i -> struct(element_at(seq, i) AS l, element_at(seq, i + 1) AS r)) END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((l, r, cnt))
        merged = l + r
        words = words.withColumn(
            "seq",
            F.aggregate(
                F.col("seq"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(l))
                    & (x == F.lit(r)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        ).localCheckpoint(eager=False)
    if return_word_table:
        return merges, words
    return merges


def bpe_encode_stats(df, text_col: str, id_col: str, n_merges: int = 8):
    """The APPLY half of the BPE story: train ``n_merges`` merges
    (:func:`bpe_train`), encode the corpus with them, and report
    per-document tokenization stats.

    Scale shape: encoding runs once per DISTINCT word (the word table the
    training loop already maintains — millions of rows at 100 TB, never
    the corpus), and the corpus side joins to it AFTER a
    (doc, word)-grained pre-aggregate, so the shuffle carries one row per
    distinct (doc, word) pair with map-side combine; AQE skew-join
    splitting covers stopword-heavy words.

    Returns one row per document with ≥ 1 token:
    ``(doc_id, n_words, n_chars, n_bpe_symbols)`` — ``n_chars`` is the
    pre-merge symbol count (characters across word occurrences), so
    ``n_chars − n_bpe_symbols`` is exactly the merge saving.
    """
    _, words = bpe_train(df, text_col, n_merges, return_word_table=True)
    wt = words.select("w", F.size("seq").alias("__n_sym"))
    tok = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("__n_occ"))
    )
    return (
        tok.join(wt, "w")
        .groupBy(id_col)
        .agg(
            F.sum("__n_occ").alias("n_words"),
            F.sum(F.length("w") * F.col("__n_occ")).alias("n_chars"),
            F.sum(F.col("__n_sym") * F.col("__n_occ")).alias("n_bpe_symbols"),
        )
    )


def normalize_url(col: str | Column) -> Column:
    """Canonicalise a URL the way web-corpus dedup pipelines do before
    URL-level dedup (C4 / CCNet style): lowercase scheme and host, strip
    a leading ``www.``, drop default ports (``:80`` http / ``:443``
    https), drop the fragment, drop ``utm_*`` tracking parameters, and
    sort the surviving query parameters so parameter order doesn't split
    duplicates. Pure ``F.*`` expressions (regexp + array HOFs) — runs
    inside whole-stage codegen, no UDF; an engine-portable spec any SQL
    dialect with regex + list ops can reproduce.
    """
    u = F.regexp_replace(_c(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    # default-port stripping is gated on the SCHEME (r4 ADVICE): :80 is
    # only the default for http and :443 only for https — https://h:80/x
    # must NOT merge with https://h/x
    port_stripped = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(port_stripped, r"^www\.", "")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & (~p.rlike("^utm_")),
            )
        ),
        "&",
    )
    # an input with no '://' has no scheme to canonicalise — return NULL
    # rather than a degenerate ':///...' string (r4 ADVICE)
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
        )
    )


def registrable_domain(host_or_url: str | Column) -> Column:
    """Last-two-label registrable domain (``a.b.example.com`` →
    ``example.com``) — the grouping key for per-domain caps and domain
    mixing weights. A heuristic, not a full public-suffix-list lookup
    (no PSL data in this environment; the seam is this one function).
    Accepts a bare host or a URL (host is extracted if '://' present).
    """
    s = _c(host_or_url)
    host = F.when(
        s.contains("://"), F.regexp_extract(s, r"://([^/?#]*)", 1)
    ).otherwise(s)
    host = F.lower(F.regexp_replace(host, r":\d+$", ""))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def cdc_chunks(col: str | Column, window: int = 3, mask: int = 16) -> Column:
    """Content-defined chunking (the restic/borgbackup/LBFS idea applied
    to token streams): a chunk boundary falls AFTER token i whenever the
    hash of the trailing ``window``-gram ≡ 0 (mod ``mask``) — the
    boundary depends only on LOCAL content, so inserting text early in a
    document does not shift later chunk boundaries (fixed-size chunking
    would re-split everything downstream; that is the whole point of
    CDC for dedup storage). Expected chunk length ≈ ``mask`` tokens.

    Returns an ``array<string>`` of chunk texts (space-joined token
    spans). Pure array HOFs — engine-portable; the rolling hash is the
    first 8 md5 hex chars (the shared md5-int convention), so any SQL
    engine reproduces identical boundaries.
    """
    if window < 1 or mask < 1:
        raise ValueError(
            f"cdc_chunks: window={window} and mask={mask} must be >= 1 "
            "(mask is the expected chunk length in tokens)"
        )
    t = tokens(col)
    n = F.size(t)
    # boundary after position i (1-based) if i >= window and
    # md5int(t[i-window+1..i] joined) % mask == 0; the LAST position is
    # never a boundary (the final chunk always closes at n)
    idx = F.sequence(F.lit(1), n)
    gram = lambda i: F.array_join(  # noqa: E731
        F.slice(t, i - window + 1, F.lit(window)), " "
    )
    h = lambda i: F.conv(F.substring(F.md5(gram(i)), 1, 8), 16, 10).cast(  # noqa: E731
        "long"
    )
    bounds = F.filter(
        idx, lambda i: (i >= window) & (i < n) & (h(i) % mask == 0)
    )
    # chunk j spans (bpos[j], bpos[j+1]]; bpos = 0 ++ bounds ++ n
    bpos = F.concat(F.array(F.lit(0)), bounds, F.array(n))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(bpos) - 1),
        lambda j: F.array_join(
            F.slice(
                t,
                F.element_at(bpos, j) + 1,
                F.element_at(bpos, j + 1) - F.element_at(bpos, j),
            ),
            " ",
        ),
    )
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(chunks)


def cdc_chunks_kernel(col: str | Column, window: int = 3, mask: int = 16) -> Column:
    """Arrow-batched twin of :func:`cdc_chunks` — identical boundaries
    and chunk texts (r9, same interpreted-HOF class as the r8 kernels:
    the expression form evaluates an md5 + base-conv INSIDE ``F.filter``
    once per TOKEN in the interpreter — ~10M interpreted hash evals at
    sf1 made q250 the sweep's 4th-slowest query at 119 s).

    Exactness contract: tokenisation mirrors ``tokens()`` for ASCII
    corpora — Java ``trim`` strips code points <= U+0020, Java ``\\s``
    is the ASCII class ``[ \\t\\n\\x0B\\f\\r]``, ``lower`` agrees with
    Python on ASCII (the same pure-ASCII precondition the q27 packed-
    gram kernel documents; non-ASCII corpora should keep the expression
    form). The rolling hash is the identical md5-first-8-hex int, the
    boundary rule ``i >= window and i < n and h % mask == 0``, and the
    chunk spans are the same ``(bpos[j], bpos[j+1]]`` slices — parity
    pinned by ``test_cdc_kernel_matches_expression``. Declared
    pandas-UDF seam (per-row rolling-hash chunker)."""
    import hashlib  # noqa: PLC0415
    import re  # noqa: PLC0415

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    if window < 1 or mask < 1:
        raise ValueError(
            f"cdc_chunks_kernel: window={window} and mask={mask} must be "
            ">= 1 (mask is the expected chunk length in tokens)"
        )
    java_trim = "".join(chr(c) for c in range(0x21))  # trim(): cp <= U+0020
    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII)

    @pandas_udf("array<string>")
    def chunker(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            if s is None:
                out.append(None)
                continue
            norm = ws.sub(" ", s.lower().strip(java_trim))
            toks = [] if norm == "" else norm.split(" ")
            n = len(toks)
            if n == 0:
                out.append([])
                continue
            bounds = [0]
            for i in range(window, n):  # 1-based boundary i in [window, n)
                gram = " ".join(toks[i - window : i])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
                if h % mask == 0:
                    bounds.append(i)
            bounds.append(n)
            out.append(
                [
                    " ".join(toks[bounds[j] : bounds[j + 1]])
                    for j in range(len(bounds) - 1)
                ]
            )
        return pd.Series(out)

    return chunker(_c(col))
