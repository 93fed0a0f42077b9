"""Data-quality report operators (reference SURVEY.md §2.5 A13/A14,
§2.6 T4: row-wise missingness scores and top-missing reports,
scripts/rebuild_and_merge_cities_it.py:301-319)."""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # module level: pandas_udf type-hint resolution
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def missingness_score(cols: Sequence[str]) -> Column:
    """Number of NULLs across `cols` (pandas isna().sum(axis=1))."""
    terms = [F.when(F.col(c).isNull(), 1).otherwise(0) for c in cols]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def any_notnull(cols: Sequence[str]) -> Column:
    """Boolean OR of non-nullness per source group (A14)."""
    cond = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        cond = cond | F.col(c).isNotNull()
    return cond


def top_missing_report(
    df: DataFrame,
    check_cols: Sequence[str],
    rank_col: str,
    n: int = 500,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Worst-N rows by (missing count desc, rank_col desc) — the
    reference's unmatched_top500.csv artifact (T4)."""
    scored = df.withColumn("missing_count", missingness_score(check_cols))
    return (
        scored.filter(F.col("missing_count") > 0)
        .orderBy(F.desc("missing_count"), F.desc(rank_col), *[F.asc(c) for c in id_cols])
        .limit(n)
    )


# --- Pre-training text quality gate (round 3) ----------------------------

# One source of truth for the Gopher/C4-shaped keep/drop bounds; the
# docs_text_profile catalog oracle mirrors these numbers in SQL.
QUALITY_GATE = {
    "min_tokens": 5,
    "max_tokens": 10_000,
    "min_avg_token_len": 2.0,
    "max_avg_token_len": 12.0,
    "min_stopword_ratio": 0.01,
    "max_dup_3gram_frac": 0.5,
    "max_digit_token_frac": 0.5,
    "max_pii_hits": 0,
}


def passes_quality_expr(
    n_tokens: Column | str = "n_tokens",
    avg_token_len: Column | str = "avg_token_len",
    stopword_ratio: Column | str = "stopword_ratio",
    dup_3gram_frac: Column | str = "dup_3gram_frac",
    digit_token_frac: Column | str = "digit_token_frac",
    n_pii_hits: Column | str = "n_pii_hits",
) -> Column:
    """Composite keep/drop gate over the computed quality signals."""
    g = QUALITY_GATE
    col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    return (
        col(n_tokens).between(g["min_tokens"], g["max_tokens"])
        & col(avg_token_len).between(
            g["min_avg_token_len"], g["max_avg_token_len"]
        )
        & (col(stopword_ratio) >= g["min_stopword_ratio"])
        & (col(dup_3gram_frac) <= g["max_dup_3gram_frac"])
        & (col(digit_token_frac) <= g["max_digit_token_frac"])
        & (col(n_pii_hits) <= g["max_pii_hits"])
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep at most ``k`` rows per key by the given ordering — the
    per-DOMAIN cap of web-corpus curation (RefinedWeb sec. 3.1: bound
    any single site's share of the corpus so crawl-frequency skew
    doesn't become training-mixture skew), keyed on
    ``functions.text.url_domain`` — or, when the corpus carries hosted
    content (github.io, blogspot.com, ...), on
    ``functions.text.registrable_domain`` (round 6: full
    publicsuffix.org rule semantics incl. the PRIVATE-section
    registries, so every *.github.io user counts as their own domain
    instead of pooling under one cap; round 8: both keys are wired
    through the curate CLI — ``run_pipeline.py --mode curate
    --cap-per-domain K --cap-key domain|regdomain [--psl DAT]``).
    One shuffle on the key; the rank is
    a per-key window, so a mega-domain serializes within its one task
    — acceptable because the cap itself bounds what survives and the
    window carries only the ordering columns. For adversarial
    mega-key skew, pre-thin with a salted two-phase top-k (the
    per_window_topn shape) in front of this exact window."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


# --- Compression-ratio repetitiveness signal (round 5) -------------------


def compression_signals(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Append ``zlib_len`` and ``compression_ratio`` (raw utf-8 bytes /
    deflate bytes) per document.

    The compression ratio is the cheapest model-free repetitiveness
    detector in production curation stacks: boilerplate, keyword
    stuffing, and template spam compress far better than natural prose
    (natural English deflates ~2.5-3.5x; heavy repetition 10x+), and it
    catches repeats LONGER than the 3-gram window of the heuristic gate
    (dup_3gram_frac) at a fraction of the cost of an LM pass. Gate on
    e.g. ``compression_ratio <= 6`` alongside QUALITY_GATE.

    Runs as an Arrow-batched pandas UDF (zlib releases the GIL, so the
    32 task threads of local[32] genuinely parallelize; on a cluster
    it's embarrassingly parallel, zero shuffles). Deterministic for a
    fixed zlib level — the test pins exact parity with driver-side
    zlib. Empty/NULL text gets ratio 0.0 (never NULL: a gate predicate
    ``ratio <= x`` must not silently drop the row via NULL semantics —
    same trap as the curate gate's ANSI divide guard)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if isinstance(t, str) and t
            else 0
        )

    zl = _zlen(F.col(text_col))
    raw_bytes = F.octet_length(F.col(text_col))
    return (
        df.withColumn("zlib_len", zl)
        .withColumn(
            "compression_ratio",
            F.when(
                F.col("zlib_len") > 0,
                F.round(
                    raw_bytes.cast("double") / F.col("zlib_len").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_shared: int = 1,
    strategy: str = "broadcast",
    bloom_bits: int = 1 << 24,
    bloom_hashes: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """TEXT-side benchmark decontamination: flag every training
    document sharing at least ``min_shared`` distinct ``n``-gram token
    windows with any eval-suite document — the lexical complement of
    :func:`~.similarity.semantic_decontaminate` (which sees only
    embeddings; a verbatim benchmark answer survives paraphrase-level
    embedding thresholds and vice versa). ``n=13`` is the GPT-3 /
    Brown et al. 2020 appendix-C convention; fixture-scale callers
    (the ``contam`` catalog branch) pass ``n=3``.

    Returns one row per FLAGGED training doc: ``(id,
    n_shared_ngrams, n_eval_docs)`` — how many distinct windows hit
    the suite, and how many distinct eval documents were matched.
    Unflagged docs are absent (retrieval semantics, like
    semantic_decontaminate).

    Scale shape: the eval suite is bounded by contract and rides as a
    BROADCAST of its distinct window hashes (16-byte md5 each — a
    60-task suite at ~10^5 windows is megabytes); the train side is
    one scan + window explode + broadcast-hash join + one groupBy(id)
    partial agg, never a corpus x corpus shuffle. The train explode
    repartitions to cluster width first: the ngram+md5 projection is
    per-row compute whose parallelism otherwise inherits the parquet
    layout (the sf1-soak 2-partition trap; AQE sizes by bytes, not
    compute).

    ``strategy='bloom'`` is the scale path past the broadcast
    contract: when the eval suite's distinct windows outgrow a raw
    hash broadcast (~10^7+, GBs of 16-byte hashes), its windows are
    folded into a SQL-native Bloom filter instead — each window sets
    ``bloom_hashes`` bits of a ``bloom_bits``-bit filter, packed as a
    (word, bits) table of 64-bit words via ``bit_or`` (at most
    bloom_bits/64 rows, ~3x the raw bitmap with row overhead but
    ~10x smaller than the hashes it replaces). The train side then
    runs ``bloom_hashes`` successive map-side BROADCAST joins against
    that word table — a window drops at the FIRST unset bit, so rows
    shrink probe by probe with zero train-side shuffle — and only the
    surviving ~fp-rate fraction joins the exact eval hash set, whose
    verification makes the output IDENTICAL to the broadcast strategy
    (Bloom false positives die there; test-pinned, even at an
    absurdly dense filter). Size ``bloom_bits`` to ~8-16 bits per
    distinct eval window (fp ~2.4-0.5% at bloom_hashes=4); an
    overdense filter is CORRECT but prefilters nothing — the
    candidate count measures it. Positions derive from
    ``xxhash64(window_md5, probe_index)`` — engine-deterministic,
    no RNG."""
    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        word_ngrams,
        words_of,
    )

    if min_shared < 1:
        raise ValueError(
            f"ngram_decontaminate: min_shared must be >= 1, got {min_shared}"
        )
    if strategy not in ("broadcast", "bloom"):
        raise ValueError(
            "ngram_decontaminate: strategy must be 'broadcast' or "
            f"'bloom', got {strategy!r}"
        )
    if strategy == "bloom" and (bloom_bits < 64 or bloom_hashes < 1):
        raise ValueError(
            "ngram_decontaminate: bloom_bits must be >= 64 and "
            f"bloom_hashes >= 1, got {bloom_bits}/{bloom_hashes}"
        )

    def doc_windows(df: DataFrame) -> DataFrame:
        # tokens_col: pre-tokenized array<string> (shared-tokenize
        # contract, operators/lm.py _tok_expr) — both sides' window
        # build skips the regex tokenize when the caller already paid
        # for it once.
        tok = F.col(tokens_col) if tokens_col else words_of(F.col(text_col))
        return df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(tok, n))
            ).alias("__ng"),
        ).select(id_col, F.md5("__ng").alias("__h"))

    ev = doc_windows(eval_docs).select(
        F.col(id_col).alias("__eval_id"), "__h"
    )
    if tokens_col:
        # pre-tokenized callers own the layout (the shared tokens
        # relation is built at cluster width before it is persisted);
        # a repartition here would re-shuffle the token arrays for
        # nothing
        tr = doc_windows(train)
    else:
        par = train.sparkSession.sparkContext.defaultParallelism
        tr = doc_windows(train.repartition(par))

    if strategy == "bloom":
        m = int(bloom_bits)

        def pos(col, i):
            return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m))

        words = (
            ev.select("__h")
            .distinct()
            .select(
                F.explode(
                    F.array(
                        *[pos(F.col("__h"), i) for i in range(bloom_hashes)]
                    )
                ).alias("__pos")
            )
            .groupBy(F.shiftright(F.col("__pos"), 6).alias("__word"))
            .agg(
                F.bit_or(
                    # pyspark's shiftleft() wrapper takes only a
                    # Python int for numBits; the SQL function itself
                    # accepts a column — call it directly
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        F.pmod(F.col("__pos"), F.lit(64)).cast("int"),
                    )
                ).alias("__bits")
            )
        )
        # one broadcast hash join per probe; a window drops at its
        # FIRST unset bit, so each successive join sees fewer rows
        # and the train side never shuffles
        for i in range(bloom_hashes):
            p = pos(F.col("__h"), i)
            wtab = F.broadcast(
                words.select(
                    F.col("__word").alias(f"__w{i}"),
                    F.col("__bits").alias(f"__b{i}"),
                )
            )
            tr = (
                tr.withColumn(f"__w{i}", F.shiftright(p, 6))
                .withColumn(
                    f"__m{i}",
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        F.pmod(p, F.lit(64)).cast("int"),
                    ),
                )
                .join(wtab, f"__w{i}")
                .filter(
                    F.col(f"__b{i}").bitwiseAND(F.col(f"__m{i}")) != 0
                )
                .drop(f"__w{i}", f"__b{i}", f"__m{i}")
            )
        # exact verification: only the bloom-surviving fraction joins
        # the true hash set — false positives die here, making the
        # output identical to strategy='broadcast'
        joined = tr.join(ev, "__h")
    else:
        joined = tr.join(F.broadcast(ev), "__h")
    return (
        joined.groupBy(id_col)
        .agg(
            F.countDistinct("__h").alias("n_shared_ngrams"),
            F.countDistinct("__eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_shared_ngrams") >= min_shared)
    )
