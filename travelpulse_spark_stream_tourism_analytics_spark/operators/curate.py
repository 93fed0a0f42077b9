"""End-to-end corpus curation: gate -> redact -> dedup -> chunk -> pack.

The batch spine of a training-data ingest, composed from the engine's
oracled operators (each stage is independently hash-checked through
the catalog; this module only sequences them):

1. PII redaction (functions/text.redact_pii) — redact-then-gate, so a
   doc is dropped for its content quality, not for containing an
   address we can scrub; the gate's PII term still guards residual
   unredacted spans
2. quality signals + keep/drop gate over the REDACTED text
   (plans/text_queries docs_text_profile columns;
   operators/quality.QUALITY_GATE bounds)
3. exact dedup on the redacted text, keep lowest doc_id
   (two docs differing only in redacted spans are the same sample)
4. overlapping token-window chunking (operators/chunking)
5. fixed-token-budget sequence packing (operators/chunking.pack_chunks)

Scale: stages 1-2 are zero-shuffle projections fused into the scan;
stage 3 is one shuffle on md5(text); stage 4 is map-side; stage 5 is
one shuffle on shard_id. Four stages, two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    pii_count,
    redact_pii,
    word_ngrams,
    words_of,
)
from travelpulse_spark_stream_tourism_analytics_spark.operators.chunking import (
    chunk_documents,
    pack_chunks,
)
from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
    passes_quality_expr,
)

_STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]

# Window width for the strip-boilerplate stage (fixture scale;
# production corpora use ~50 tokens — same plan, one knob).
_BOILER_WINDOW = 8


def quality_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The gate's input signals as columns (same definitions as the
    oracled docs_text_profile columns), plus ``passes_quality``."""
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    toks = words_of(F.col(text_col))
    staged = docs.select(
        "*",
        toks.alias("__toks"),
        word_ngrams(toks, 3).alias("__ngrams"),
    )
    n_tok = F.size("__toks").cast("double")
    n_stop = F.size(F.filter("__toks", lambda x: F.array_contains(stop, x)))
    # Every per-token ratio is guarded on n_tok > 0: under Spark 4's
    # default ANSI mode an unguarded x / n_tok on an empty or
    # punctuation-only document throws DIVIDE_BY_ZERO and kills the
    # whole job (ADVICE r3). Zero-token docs get NULL signals and a
    # false gate (n_tokens=0 fails min_tokens, and false AND NULL is
    # false), i.e. they are dropped, not fatal.
    has_tok = F.size("__toks") > 0
    return staged.select(
        *docs.columns,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.when(
            has_tok,
            F.round(F.length(F.concat_ws("", F.col("__toks"))) / n_tok, 6),
        ).alias("avg_token_len"),
        F.when(has_tok, F.round(n_stop / n_tok, 6)).alias("stopword_ratio"),
        F.when(
            F.size("__ngrams") > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("__ngrams"))
                / F.size("__ngrams").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
        F.when(
            has_tok,
            F.round(
                F.size(F.filter("__toks", lambda x: x.rlike("^[0-9]+$")))
                / n_tok,
                6,
            ),
        ).alias("digit_token_frac"),
        pii_count(F.col(text_col)).alias("n_pii_hits"),
        F.when(
            has_tok,
            F.round(
                F.least(F.lit(1.0), F.size("__toks") / F.lit(200.0))
                * (F.lit(1.0) - n_stop / n_tok),
                6,
            ),
        ).alias("quality_score"),
    ).withColumn("passes_quality", passes_quality_expr())


def fuzzy_neardup_assignment(
    unique: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_score",
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    k_minhash: int = 12,
    n_bands: int = 4,
    n_rows: int = 3,
):
    """The fuzzy near-dup SELECTION stage as one shared helper:
    MinHash+LSH candidates -> exact n-gram Jaccard verify -> star
    connected components -> quality-aware canonical assignment
    (components.canonical_best over ``score_col``). Returns
    ``(assignment, comp)`` where assignment covers every doc in
    ``scores`` (isolated docs keep themselves) and comp is the raw
    (node, comp) relation. Both curate_corpus(fuzzy=True) and the
    soak's kept-vs-dropped quality measurement call THIS function, so
    the soak can never silently measure a different chain than
    production (round-5 review finding)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators import (
        dedup,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.components import (
        canonical_best,
        connected_components_star,
    )

    shingled = dedup.exploded_shingles(unique, id_col, text_col, shingle_n)
    sigs = dedup.minhash_signatures(shingled, id_col, k_minhash)
    bands = dedup.lsh_bands(sigs, id_col, n_bands, n_rows)
    pairs = dedup.lsh_candidate_pairs(bands, id_col)
    verified = dedup.pair_jaccard(pairs, shingled, id_col).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    comp = connected_components_star(verified)
    return canonical_best(scores, comp, id_col, score_col), comp


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    capacity: int = 1024,
    n_shards: int = 8,
    fuzzy: bool = False,
    jaccard_threshold: float = 0.5,
    strip_boilerplate: int | None = None,
    despan_min_copies: int | None = None,
    ppl_tail_frac: float | None = None,
    lm_ref: DataFrame | None = None,
    classifier_model: dict | None = None,
    classifier_threshold: float = 0.5,
    bpe_model: dict | None = None,
    repetition_gate: bool = False,
    repetition_thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation chain; returns packed training samples
    (doc_id, chunk_idx, chunk_uid, chunk_text, n_chunk_tokens,
    shard_id, pack_id) from the kept, redacted, deduped corpus.

    With ``fuzzy=True`` a near-duplicate stage runs after exact dedup:
    MinHash+LSH candidates -> exact n-gram Jaccard verify at
    ``jaccard_threshold`` -> star connected components ->
    quality-aware canonical selection (components.canonical_best on
    the profile quality_score), so each near-dup family contributes
    exactly its cleanest member. Adds the banded-join shuffles of the
    oracled docs_minhash_neardup_pairs pipeline; everything else is
    unchanged.

    With ``ppl_tail_frac=f`` (round 5) a CCNet perplexity stage runs
    after dedup: a unigram LM trains on ``lm_ref`` (trusted corpus) or
    the deduped corpus itself, and the worst ``f`` of documents by
    mean NLL are dropped — the paper's "reject the tail" policy as a
    chain stage (operators/lm.py holds the scoring machinery; the
    catalog's ppl_bucket branch oracles the same terciles).

    With ``strip_boilerplate=K`` (round 4) a CHUNK-level boilerplate
    filter runs after chunking: any chunk containing a
    ``_BOILER_WINDOW``-token window that appears verbatim in >= K
    distinct kept documents (dedup.substring_dup_spans — the
    Lee et al. 2022 exact-substring family) is dropped before packing.
    This removes licenses/templates/navigation that survive
    document-level dedup because their surrounding text differs. Two
    extra shuffles: the span-hash aggregation and the chunk anti-join
    on a broadcastable span table.

    With ``despan_min_copies=K`` (round 10) the GENTLER alternative
    runs instead-of-or-before chunking: dedup.remove_dup_spans cuts
    the duplicated ``_BOILER_WINDOW``-token spans out of each kept
    document's token stream (one global keeper occurrence survives,
    Lee et al. ExactSubstr removal) and the rest of the document
    continues into chunking — where ``strip_boilerplate`` drops whole
    chunks, this keeps the unique remainder. Composable with
    ``strip_boilerplate`` (removal first, then the chunk filter sees
    the rewritten stream). Adds remove_dup_spans' cost: one span-hash
    shuffle plus the id-keyed removal fold-back.

    Two execution repairs (round 4, measured 48 s -> ~12 s at sf0.1):
    the input repartitions to cluster width before the regex-heavy
    redact+gate projection (a single-row-group parquet fixture
    otherwise runs the whole chain on ONE core — the same layout
    lesson as repair_coarse_scan), and the signal relation is
    scoped_persist'ed BEFORE the passes_quality filter. The persist
    placement is load-bearing twice over: (a) downstream stages (dedup
    groupBy, semi-join, shingles, score lookup, chunker) otherwise
    RE-EXECUTE the 8-regex-pass lineage per consumer, and (b) an
    unpersisted filter gets predicate-pushed below the repartition
    into the parquet scan, with the tokenize+redact chain substituted
    SIX times into the one predicate — measured 38 s on one core at
    sf0.1 for a 0.5 s projection. The cache is the barrier pushdown
    cannot cross (the local-mode analogue of materializing between
    pipeline stages to parquet, bounded by the _cache contract)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        scoped_persist,
    )

    par = docs.sparkSession.sparkContext.defaultParallelism
    scrubbed = docs.repartition(par).select(
        F.col(id_col), redact_pii(F.col(text_col)).alias(text_col)
    )
    signals = quality_signals(scrubbed, id_col, text_col)
    keep_expr = F.col("passes_quality")
    if repetition_gate:
        # round 6 (--repetition-gate, batch twin of the streaming
        # ingest gate): the Gopher character-mass rules catch
        # SCATTERED phrase repetition the heuristic dup-3-gram signal
        # structurally misses. The gate boolean is a COLUMN of the
        # persisted signals projection, not a predicate above it —
        # a filter predicate re-evaluates per downstream consumer
        # (dedup groupBy, semi-join, shingles, chunker), while a
        # persisted column evaluates once at materialization
        # (ADVICE r6; the same persist-placement lesson as round 4).
        from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
            passes_repetition_gate,
        )

        signals = signals.select(
            "*",
            passes_repetition_gate(
                F.col(text_col), repetition_thresholds
            ).alias("passes_repetition"),
        )
        keep_expr = keep_expr & F.col("passes_repetition")
    gated = scoped_persist(signals, "curate.signals").filter(keep_expr)
    redacted = gated.select(id_col, text_col)
    keep = (
        redacted.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .drop("__h")
    )
    unique = redacted.join(keep, id_col, "left_semi")
    if fuzzy:
        # The fuzzy path reads ``unique`` three times (the score
        # lookup, the shingle explode feeding the LSH pair build, and
        # the post-winner chunking input at exec) across SEPARATE
        # actions — without a persist the exact-dedup shuffle and the
        # signals-cache scan re-run per consumer (round 11, guide §5
        # cache discipline; measured ~0.5-1 s per recompute at sf0.1).
        unique = scoped_persist(unique, "curate.unique")
        scores = gated.select(id_col, "quality_score").join(
            unique.select(id_col), id_col, "left_semi"
        )
        assignment, _comp = fuzzy_neardup_assignment(
            unique, scores, id_col, text_col,
            jaccard_threshold=jaccard_threshold,
        )
        winners = assignment.filter(F.col(id_col) == F.col("canonical_id"))
        unique = unique.join(
            winners.select(id_col), id_col, "left_semi"
        )
    if classifier_model is not None:
        # Trained-classifier gate (round 5): keep documents the
        # fastText-shape model (operators/classifier.py, trained
        # offline on a labeled seed set — the GPT-3/LLaMA "looks like
        # trusted text" gate) scores at or above the threshold.
        # Inference is one hashed-BoW pass + a broadcast weights join;
        # the model dict is {dim, weights, bias} as serialized by
        # run_pipeline --mode train-classifier.
        from travelpulse_spark_stream_tourism_analytics_spark.operators.classifier import (
            score_quality,
        )

        probs = score_quality(
            unique,
            classifier_model["weights"],
            classifier_model["bias"],
            id_col,
            text_col,
            dim=int(classifier_model["dim"]),
        )
        keep_cls = probs.filter(
            F.col("quality_prob") >= float(classifier_threshold)
        ).select(id_col)
        unique = unique.join(keep_cls, id_col, "left_semi")
    if ppl_tail_frac is not None:
        # CCNet perplexity stage (round 5, Wenzek et al. 2020): drop
        # the worst ppl_tail_frac of the deduped corpus by unigram-LM
        # NLL. The LM trains on ``lm_ref`` when a trusted corpus is
        # supplied (the paper's setup); otherwise on the deduped
        # corpus itself — self-perplexity, which flags statistical
        # outliers (gibberish, wrong-language debris) rather than
        # off-domain text. The cut edge rides as a broadcast 1-row
        # aggregate like ppl_buckets; ties keep LEFT (<= edge).
        from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
            lm_score_docs,
            unigram_lm,
        )

        lm = unigram_lm(
            lm_ref if lm_ref is not None else unique, text_col
        )
        scored = lm_score_docs(unique, lm, id_col, text_col)
        edge = scored.agg(
            F.percentile(
                F.col("nll"), F.lit(1.0 - float(ppl_tail_frac))
            ).alias("__edge")
        )
        keep_ppl = (
            scored.crossJoin(F.broadcast(edge))
            .filter(F.col("nll") <= F.col("__edge"))
            .select(id_col)
        )
        unique = unique.join(keep_ppl, id_col, "left_semi")
    if despan_min_copies is not None:
        # exact-substring REMOVAL (round 10): cut the duplicated
        # _BOILER_WINDOW-token spans out of each kept document's token
        # stream (one global keeper occurrence survives) and let the
        # unique remainder continue into chunking — the gentler
        # alternative to strip_boilerplate's whole-chunk drop. Runs
        # BEFORE the chunker (and before strip_boilerplate's span
        # scan, which then sees the rewritten stream), so the two
        # compose: after removal, surviving spans occur once globally
        # and no longer clear any >= K copies bar.
        from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
            remove_dup_spans,
        )

        rewritten = remove_dup_spans(
            unique, text_col, id_col, _BOILER_WINDOW,
            min_copies=despan_min_copies,
        )
        unique = rewritten.select(
            id_col, F.col("text_dedup").alias(text_col)
        )
    chunks = chunk_documents(
        unique, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    )
    if strip_boilerplate is not None:
        from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
            substring_dup_spans,
        )

        spans = substring_dup_spans(
            unique, text_col, id_col, _BOILER_WINDOW
        ).filter(F.col("n_copies") >= strip_boilerplate)
        chunk_windows = chunks.select(
            "chunk_uid",
            F.explode(
                F.array_distinct(
                    word_ngrams(words_of(F.col("chunk_text")), _BOILER_WINDOW)
                )
            ).alias("__w"),
        ).select("chunk_uid", F.md5("__w").alias("text_hash"))
        # No forced broadcast: the span table is usually small (spans
        # repeated in >= K docs), but a boilerplate-heavy crawl can
        # produce millions — let Spark pick broadcast vs shuffle
        # semi-join by size.
        tainted = chunk_windows.join(
            spans.select("text_hash"), "text_hash", "left_semi"
        ).select("chunk_uid").distinct()
        chunks = chunks.join(tainted, "chunk_uid", "left_anti")
    packed = pack_chunks(
        chunks,
        id_col=id_col,
        capacity=capacity,
        n_shards=n_shards,
    )
    if bpe_model is not None:
        # training-ready output: append the packed chunk's BPE token
        # ids (operators/bpe.py model artifact from --mode train-bpe).
        # Map-side Arrow-batched encode over broadcast KB tables —
        # adds zero shuffles to the chain.
        from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
            bpe_encode_ids,
        )

        packed = bpe_encode_ids(packed, bpe_model, text_col="chunk_text")
    return packed


def corpus_report(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus health: doc counts, quality-gate pass rate,
    mean quality score / token count, and PII incidence — the
    monitoring table a curation pipeline publishes per ingest batch.
    One scan (the signals are the same zero-shuffle projections) and
    one partial-aggregated shuffle on source. The input repartitions
    to cluster width first: the signal substitution otherwise lands in
    the scan stage, whose parallelism is the file layout's (measured
    4.3 s single-core vs 0.5 s wide at sf0.1)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sig = quality_signals(docs.repartition(par), id_col, text_col)
    return sig.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("passes_quality").cast("double")), 6).alias(
            "pass_rate"
        ),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.round(
            F.avg((F.col("n_pii_hits") > 0).cast("double")), 6
        ).alias("pii_rate"),
    )
