#!/usr/bin/env python3
"""Production entry point: start the full streaming KPI topology.

The engine's equivalent of the reference's
``spark-submit spark/kafka_to_metrics.py`` — sources are selected by
CLI flag so the same topology runs against Kafka in production or a
wire-JSONL directory tree (dir/{weather,flight,booking}/) anywhere
else.

  python run_pipeline.py --source file --path /tmp/wire \\
      --pushgateway http://localhost:9091 --once
  python run_pipeline.py --source kafka --bootstrap broker:9092
  python run_pipeline.py --source kafka-replay --path /tmp/frames --once

kafka-replay streams recorded binary Kafka frames (the parquet layout
of streaming.sources.write_kafka_frame_fixture, dir/{weather,flight,
booking}/) through the production frame decode — the full topology
over the byte-exact Kafka path, no broker required.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from travelpulse_spark_stream_tourism_analytics_spark.schemas import (
    BOOKING_SCHEMA,
    CITY_DIM_SCHEMA,
    FLIGHT_SCHEMA,
    WEATHER_SCHEMA,
)
from travelpulse_spark_stream_tourism_analytics_spark.session import get_spark
from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import (
    parse_events,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.pipeline import (
    build_all_queries,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
    MemoryMetricSink,
    PrometheusPushSink,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
    file_stream,
    kafka_frame_replay,
    kafka_stream,
)

# Reference's 20-row inline geo lookup (spark/kafka_to_metrics.py:372-394)
# — public GeoNames ids/coordinates.
CITY_DIM_ROWS = [
    ("3165524", "Roma", 41.9028, 12.4964),
    ("3173435", "Milano", 45.4642, 9.1900),
    ("3169070", "Napoli", 40.8518, 14.2681),
    ("3176959", "Firenze", 43.7699, 11.2556),
    ("3164600", "Venezia", 45.4408, 12.3155),
]


def run_dedup(spark, docs_path: str, out_dir: str, once: bool = True,
              trigger: str = "10 seconds", gate: bool = False,
              bits: int = 16, ttl_ms: int | None = None,
              baseline_path: str | None = None, metric_sink=None,
              max_files_per_trigger: int | None = None,
              repetition_gate: bool = False,
              repetition_thresholds: dict | None = None) -> dict:
    """Streaming ingest dedup pipeline (``--mode dedup``): a JSONL
    document stream ({doc_id, text} records) flows through a stateless
    SimHash projection into the stateful banded near-dup index
    (streaming/stateful.py) and emits the per-document verdict table
    (doc_id, is_dup, dup_of) as append-mode parquet — the decision
    stream a training-data ingest joins against to drop duplicates.
    With ``gate=True`` (``--gate``) the quality keep/drop gate
    (operators/curate.quality_signals over the PII-redacted text) runs
    FIRST as a stateless projection, so low-quality docs never reach
    the stateful index — ingest-time filtering at stream speed.

    With ``gate=True`` AND ``baseline_path`` (round 5) a MONITORING
    query runs alongside the data plane: each micro-batch's
    quality_score distribution is bucketed on the baseline corpus's
    decile edges (computed once, a plan constant) and its PSI against
    the baseline shares is pushed through ``metric_sink`` as the
    ``ingest_psi_quality_score`` gauge — drift monitoring at ingest
    time, not only in ``--mode report``. The monitor is a stateless
    projection + one 10-row aggregate per batch; separating it from
    the dedup query keeps the data plane's state/checkpoint lineage
    untouched when monitoring is reconfigured (the standard
    data/monitor plane split).

    Returns {'docs': n, 'dups': n, 'psi_batches': n} after draining
    (once=True)."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        redact_pii,
        words_of,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        simhash16_expr,
        simhash64_expr,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
        neardup_verdicts,
        streaming_neardup_evidence,
    )

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(docs_path)
    stats = {"docs": 0, "dups": 0, "psi_batches": 0}
    monitor_q = None
    if gate:
        from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
            quality_signals,
        )

        signals = quality_signals(
            docs.select("doc_id", redact_pii(F.col("text")).alias("text"))
        )
        if baseline_path:
            from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
                bucket_shares,
                psi_from_shares,
                quantile_edges,
                shares_dict,
            )
            from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
                MemoryMetricSink,
            )

            sink = metric_sink if metric_sink is not None else MemoryMetricSink()
            par = spark.sparkContext.defaultParallelism
            # Redact the baseline before signalling, exactly as the
            # data plane does for the stream: PII-bearing baselines
            # would otherwise tokenize differently ('a@b.com' = 4
            # tokens raw vs 1 redacted) and hold the gauge above zero
            # with no real drift.
            base_docs = _load_docs(spark, baseline_path).repartition(par)
            base_sig = quality_signals(
                base_docs.select(
                    "doc_id", redact_pii(F.col("text")).alias("text")
                )
            ).filter(F.col("n_tokens") > 0)
            edges = quantile_edges(base_sig, "quality_score", 10)
            base_shares = shares_dict(base_sig, "quality_score", edges)

            def monitor_fn(batch_df, batch_id):
                scored = batch_df.filter(F.col("n_tokens") > 0)
                # ONE aggregation per batch: shares and the batch size
                # come from the same 10-row collect.
                rows = bucket_shares(scored, "quality_score", edges).collect()
                if not rows:
                    return
                val = psi_from_shares(
                    base_shares, {r["bucket"]: r["share"] for r in rows}
                )
                stats["psi_batches"] += 1
                sink.push(
                    {
                        "ingest_psi_quality_score": (None, round(val, 6)),
                        "ingest_batch_docs": (
                            None,
                            float(sum(r["n"] for r in rows)),
                        ),
                    }
                )

            monitor_work = tempfile.mkdtemp(prefix="tp_psi_")
            monitor_q = (
                signals.select("doc_id", "n_tokens", "quality_score")
                .writeStream.outputMode("append")
                .foreachBatch(monitor_fn)
                .option(
                    "checkpointLocation",
                    os.path.join(monitor_work, "chk"),
                )
                .trigger(
                    **({"availableNow": True} if once
                       else {"processingTime": trigger})
                )
                .start()
            )
        keep = F.col("passes_quality")
        if repetition_gate:
            # round 6: the Gopher repetition rules as an ingest gate —
            # the heuristic gate's dup_3gram check misses SCATTERED
            # repetition (a phrase recurring with unique filler between
            # occurrences keeps every 3-gram distinct); the character-
            # mass rules catch it. Pure array expressions on the same
            # redacted text, still a stateless projection. Thresholds
            # come from --rep-threshold overrides (round 7); the ONE
            # gate definition is functions/text.passes_repetition_gate,
            # shared with the batch curate chain.
            from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
                passes_repetition_gate,
            )

            keep = keep & passes_repetition_gate(
                F.col("text"), repetition_thresholds
            )
        docs = signals.filter(keep).select("doc_id", "text")
    elif repetition_gate:
        raise ValueError("run_dedup: --repetition-gate requires --gate")
    fp_expr = simhash64_expr if bits == 64 else simhash16_expr
    stream = docs.select(
        "doc_id",
        fp_expr(F.array_distinct(words_of(F.col("text")))).alias("fp"),
    )

    def batch_fn(df, _bid):
        v = neardup_verdicts(df)
        v.write.mode("append").parquet(out_dir)
        rows = v.groupBy().agg(
            F.count("*").alias("n"), F.sum(F.col("is_dup").cast("long")).alias("d")
        ).collect()[0]
        stats["docs"] += rows["n"] or 0
        stats["dups"] += rows["d"] or 0

    work = tempfile.mkdtemp(prefix="tp_dedup_")
    q = (
        streaming_neardup_evidence(
            stream, "doc_id", "fp", bits=bits,
            n_bands=4 if bits == 64 else None, ttl_ms=ttl_ms,
        )
        .writeStream.outputMode("update")
        .foreachBatch(batch_fn)
        .option("checkpointLocation", os.path.join(work, "chk"))
        .trigger(
            **({"availableNow": True} if once else {"processingTime": trigger})
        )
        .start()
    )
    if once:
        try:
            q.awaitTermination()
            if monitor_q is not None:
                monitor_q.awaitTermination()
        finally:
            # One-shot drains leave no resumable state worth keeping:
            # clean both checkpoint trees (a cron'd daily ingest would
            # otherwise accumulate tp_dedup_*/tp_psi_* dirs forever).
            import shutil

            shutil.rmtree(work, ignore_errors=True)
            if monitor_q is not None:
                shutil.rmtree(monitor_work, ignore_errors=True)
    else:  # pragma: no cover - long-running service mode
        spark.streams.awaitAnyTermination()
    return stats


def run_curate(spark, docs_path: str, out_dir: str, fuzzy: bool = False,
               strip_boilerplate: int | None = None,
               despan_min_copies: int | None = None,
               ppl_tail: float | None = None,
               lm_ref_path: str | None = None,
               classifier_model_path: str | None = None,
               classifier_threshold: float = 0.5,
               bpe_model_path: str | None = None,
               repetition_gate: bool = False,
               repetition_thresholds: dict | None = None,
               cap_per_domain: int | None = None,
               cap_key: str = "domain",
               psl_path: str | None = None) -> dict:
    """Batch corpus curation (``--mode curate``): documents (a parquet
    dir/file or JSONL dir with {doc_id, text[, url]}) flow through the
    quality gate -> PII redaction -> exact dedup -> chunking ->
    sequence packing chain (operators/curate.py) and land as packed
    training samples, one parquet partition tree per shard — the
    file-per-shard layout a trainer's data loader reads. Returns
    {'docs': in, 'kept': post-gate-and-dedup, 'samples': chunks,
    'packs': bins}.

    With ``cap_per_domain=K`` a per-site share cap (RefinedWeb sec.
    3.1, quality.cap_per_key) runs FIRST, keyed on the doc's ``url``
    column: ``cap_key='domain'`` caps on the raw host
    (functions.text.url_domain); ``cap_key='regdomain'`` caps on the
    PSL registrable domain (functions.text.registrable_domain) so
    hosted-content publishers — two ``*.github.io`` users, say — each
    get their OWN cap instead of pooling under one host suffix
    (VERDICT r6 item 6 / r7 item 3). ``psl_path`` loads a full
    publicsuffix.org ``public_suffix_list.dat`` (load_psl) for
    production rule coverage; default is the built-in snapshot.
    Deterministic keep: lowest ``doc_id`` first within a key."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    wants_url = cap_per_domain is not None
    if any(
        name.endswith((".json", ".jsonl"))
        for name in os.listdir(docs_path)
        if os.path.isfile(os.path.join(docs_path, name))
    ):
        schema = "doc_id long, text string" + (
            ", url string" if wants_url else ""
        )
        docs = spark.read.schema(schema).json(docs_path)
    else:
        table = os.path.join(docs_path, "documents.parquet")
        docs = spark.read.parquet(
            table if os.path.exists(table) else docs_path
        )
    if wants_url:
        from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
            load_psl,
            registrable_domain,
            url_domain,
        )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
            cap_per_key,
        )

        if "url" not in docs.columns:
            raise ValueError(
                "--cap-per-domain needs a 'url' column in the input docs"
            )
        if docs.where(F.col("url").isNotNull()).limit(1).count() == 0:
            raise ValueError(
                "--cap-per-domain: the 'url' column is entirely null — "
                "every document would pool under one cap key"
            )
        if cap_key == "regdomain":
            rules = load_psl(psl_path) if psl_path else None
            key = registrable_domain(F.col("url"), rules=rules)
        elif cap_key == "domain":
            key = url_domain(F.col("url"))
        else:
            raise ValueError(f"cap_key must be domain|regdomain, got {cap_key!r}")
        # Docs with no usable cap key (null url, or a non-URL string
        # where the extractors yield '') are EXEMPT from the cap: they
        # are not one publisher, and pooling them under a single
        # pseudo-domain silently truncates e.g. a 30%-null-url corpus
        # to K docs (ADVICE r8). Surfaced, not silent.
        # localCheckpoint: the key expression (a ~9k-rule PSL literal
        # map under --cap-key regdomain) is referenced by the count
        # plus BOTH filter branches below — without the barrier the
        # filters inline it 3x and push it into the scan (the repo's
        # recorded pushdown-duplication trap).
        keyed = docs.withColumn("__cap_key", key).localCheckpoint()
        keyless = F.col("__cap_key").isNull() | (F.col("__cap_key") == "")
        n_keyless = keyed.where(keyless).count()
        if n_keyless:
            print(
                f">>> cap-per-domain: {n_keyless} docs carry no usable "
                "cap key (null url / non-URL string) — exempt from the "
                "cap, kept uncapped"
            )
        docs = (
            cap_per_key(
                keyed.where(~keyless),
                "__cap_key",
                cap_per_domain,
                order_by=[F.col("doc_id")],
            )
            .unionByName(keyed.where(keyless))
            .drop("__cap_key")
        )
    lm_ref = _load_docs(spark, lm_ref_path) if lm_ref_path else None
    model = None
    if classifier_model_path:
        import json as _json

        with open(classifier_model_path) as f:
            model = _json.load(f)
    bpe_model = None
    if bpe_model_path:
        from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
            load_bpe_model,
        )

        bpe_model = load_bpe_model(bpe_model_path)
    packed = curate_corpus(docs, fuzzy=fuzzy,
                           strip_boilerplate=strip_boilerplate,
                           despan_min_copies=despan_min_copies,
                           ppl_tail_frac=ppl_tail, lm_ref=lm_ref,
                           classifier_model=model,
                           classifier_threshold=classifier_threshold,
                           bpe_model=bpe_model,
                           repetition_gate=repetition_gate,
                           repetition_thresholds=repetition_thresholds)
    packed.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    agg = out.agg(
        F.count("*").alias("samples"),
        F.countDistinct("doc_id").alias("kept"),
        F.countDistinct("shard_id", "pack_id").alias("packs"),
    ).collect()[0]
    return {
        "docs": docs.count(),
        "kept": agg["kept"],
        "samples": agg["samples"],
        "packs": agg["packs"],
    }


def run_train_classifier(spark, docs_path: str, labels_path: str,
                         out_path: str, dim: int = 1024,
                         iters: int = 30) -> dict:
    """Train the fastText-shape quality classifier
    (``--mode train-classifier``): documents (parquet/JSONL dir) plus
    a (doc_id, label in {0,1}) parquet of seed judgments -> hashed
    bag-of-words features -> distributed full-batch logistic
    regression -> a {dim, weights, bias} JSON model that
    ``--mode curate --classifier-model`` gates with. Returns
    {'docs', 'pos', 'train_acc'}."""
    import json as _json

    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.classifier import (
        hashed_bow_features,
        score_quality,
        train_quality_classifier,
    )

    docs = _load_docs(spark, docs_path)
    labels = spark.read.parquet(labels_path).select(
        "doc_id", F.col("label").cast("int").alias("label")
    )
    feats = hashed_bow_features(docs, dim=dim).persist()
    try:
        w, b = train_quality_classifier(
            feats, labels, dim=dim, iters=iters
        )
    finally:
        feats.unpersist()
    with open(out_path, "w") as f:
        _json.dump({"dim": dim, "weights": w, "bias": b}, f)
    acc_row = (
        score_quality(docs, w, b, dim=dim)
        .join(labels, "doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").alias("pos"),
            F.avg(
                ((F.col("quality_prob") > 0.5).cast("int")
                 == F.col("label")).cast("double")
            ).alias("acc"),
        )
        .collect()[0]
    )
    return {
        "docs": acc_row["n"],
        "pos": acc_row["pos"],
        "train_acc": round(float(acc_row["acc"]), 4),
    }


def run_text_index_stream(spark, docs_path: str, index_dir: str,
                          max_files_per_trigger: int | None = None) -> dict:
    """Streaming ingest for the persistent inverted index (``--mode
    text-index --stream``): a JSONL docs stream folds into the on-disk
    index one micro-batch at a time through foreachBatch — the first
    batch builds the index, every later batch rides
    ``add_to_text_index``. Because chained adds equal a bulk build
    BIT-FOR-BIT (every BM25 input is exact), the streamed index equals
    the batch-built index over the same corpus — test-pinned.

    Redelivery safety: foreachBatch may replay a batch after a
    failure; ``validate=True`` turns the replayed (now id-overlapping)
    add into a crisp error instead of silently double-counting tf —
    the index is a side-effecting sink, so exactly-once must come from
    the id-disjointness contract, not the checkpoint."""
    import shutil
    import tempfile

    from travelpulse_spark_stream_tourism_analytics_spark.operators.text_index import (
        add_to_text_index,
        build_text_index,
    )

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(docs_path)
    stats = {"batches": 0}

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if not os.path.exists(os.path.join(index_dir, "stats.json")):
            build_text_index(batch_df, index_dir)
        else:
            add_to_text_index(spark, index_dir, batch_df, validate=True)
        stats["batches"] += 1

    chk = tempfile.mkdtemp(prefix="tp_tidx_chk_")
    q = (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(chk, ignore_errors=True)
    return stats


def run_dedup_batch(spark, docs_path: str, out_dir: str,
                    index_path: str, bits: int = 64,
                    retain_min_id: int | None = None) -> dict:
    """Incremental BATCH ingest dedup (``--mode dedup-batch``): dedupe
    a new document batch (JSONL or parquet dir) against the PERSISTED
    fingerprint index of everything previously accepted, write the
    per-doc verdicts as parquet, and atomically replace the index with
    index ∪ new fingerprints — the daily "new crawl vs historical
    corpus" surface (operators/dedup.incremental_simhash_neardups;
    parity contract: chaining runs equals one whole-corpus batch op).
    The index artifact holds (doc_id, simhash) only — the corpus text
    is never rescanned. Returns {'docs', 'dups', 'index_rows'}."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        words_of,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        incremental_simhash_neardups,
        simhash16_expr,
        simhash64_expr,
    )

    if any(
        name.endswith((".json", ".jsonl"))
        for name in os.listdir(docs_path)
        if os.path.isfile(os.path.join(docs_path, name))
    ):
        docs = spark.read.schema("doc_id long, text string").json(docs_path)
    else:
        docs = _load_docs(spark, docs_path)
    fp_expr = simhash64_expr if bits == 64 else simhash16_expr
    new_sims = docs.select(
        "doc_id",
        fp_expr(F.array_distinct(words_of(F.col("text")))).alias("simhash"),
    )
    index = (
        spark.read.parquet(index_path)
        if os.path.isdir(index_path) and os.listdir(index_path)
        else None
    )
    verdicts, updated = incremental_simhash_neardups(
        new_sims, index, bits=bits
    )
    if retain_min_id is not None:
        # Retention (the batch twin of the streaming TTL): ids are
        # arrival-ordered, so dropping fingerprints below the floor
        # bounds the index to the dedup horizon — older docs simply
        # stop being dup_of candidates, exactly like an evicted
        # streaming bucket.
        updated = updated.filter(F.col("doc_id") >= retain_min_id)
    verdicts.write.mode("overwrite").parquet(out_dir)
    # Write-then-swap so a failed run never truncates the live index.
    tmp_idx = index_path.rstrip("/") + ".next"
    updated.write.mode("overwrite").parquet(tmp_idx)
    import shutil

    if os.path.isdir(index_path):
        shutil.rmtree(index_path)
    os.rename(tmp_idx, index_path)
    v = spark.read.parquet(out_dir)
    row = v.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_dup").cast("long")).alias("d"),
    ).collect()[0]
    return {
        "docs": row["n"] or 0,
        "dups": row["d"] or 0,
        "index_rows": spark.read.parquet(index_path).count(),
    }


def _load_docs(spark, docs_path: str):
    from pyspark.sql import functions as F

    table = os.path.join(docs_path, "documents.parquet")
    docs = spark.read.parquet(table if os.path.exists(table) else docs_path)
    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit("all"))
    return docs


def run_report(
    spark,
    docs_path: str,
    out_dir: str | None = None,
    baseline_path: str | None = None,
) -> list:
    """Corpus health report (``--mode report``): per-source pass rate,
    mean quality/tokens, PII incidence over a documents dir
    (operators/curate.corpus_report); optionally written as parquet
    for dashboarding, always printed as one JSON line per source.

    With ``--baseline <docs dir>`` (round 4) the report also emits a
    drift line: the PSI of this batch's quality_score and n_tokens
    distributions against the baseline corpus (operators/drift.py) —
    the ingest-batch alarm that catches a source going stale or a
    scraper change shifting the quality profile, with the conventional
    0.1 / 0.25 investigate/act thresholds attached."""
    import json as _json

    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        corpus_report,
        quality_signals,
    )

    docs = _load_docs(spark, docs_path)
    rep = corpus_report(docs)
    if out_dir:
        rep.write.mode("overwrite").parquet(out_dir)
    rows = [r.asDict() for r in rep.orderBy("source").collect()]
    for r in rows:
        print(_json.dumps(r))
    if baseline_path:
        from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
            psi,
        )

        par = spark.sparkContext.defaultParallelism
        cand_sig = quality_signals(docs.repartition(par)).filter(
            F.col("n_tokens") > 0
        )
        base_sig = quality_signals(
            _load_docs(spark, baseline_path).repartition(par)
        ).filter(F.col("n_tokens") > 0)
        drift = {
            "drift_vs": baseline_path,
            "psi_quality_score": round(
                psi(base_sig, cand_sig, "quality_score"), 6
            ),
            "psi_n_tokens": round(psi(base_sig, cand_sig, "n_tokens"), 6),
            "thresholds": {"investigate": 0.1, "act": 0.25},
        }
        # embedding-SPACE drift (round 10) when both corpora carry an
        # embeddings table: per-cell occupancy PSI against a fixed
        # quantizer drawn from the BASELINE (16 usable vectors in
        # deterministic md5 order — a distribution can rotate in
        # embedding space without moving any scalar marginal, which
        # is exactly what the two PSI lines above cannot see)
        cand_et = os.path.join(docs_path, "embeddings.parquet")
        base_et = os.path.join(baseline_path, "embeddings.parquet")
        if os.path.exists(cand_et) and os.path.exists(base_et):
            from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
                embedding_psi,
            )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
                dot,
            )

            base_emb = _load_embeddings(spark, baseline_path)
            cand_emb = _load_embeddings(spark, docs_path)
            nrm = F.sqrt(dot(F.col("v"), F.col("v")))
            seeds = (
                base_emb.withColumn("__n", nrm)
                .filter(
                    F.col("__n").isNotNull()
                    & ~F.isnan("__n")
                    & (F.col("__n") > 0)
                    & (F.col("__n") < F.lit(float("inf")))
                )
                .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
                .limit(16)
                .select(
                    F.col("vec_id").alias("cell_id"), F.col("v").alias("sv")
                )
            )
            drift["psi_embedding"] = round(
                embedding_psi(
                    base_emb, cand_emb, seeds, id_col="vec_id", vec_col="v"
                ),
                6,
            )
        print(_json.dumps(drift))
        rows.append(drift)
    return rows


def run_centrality(
    spark,
    edges_path: str,
    out_dir: str,
    iterations: int = 4,
    max_t: int = 6,
    seeds_path: str | None = None,
    undirected: bool = False,
) -> dict:
    """Link-graph quality signals (``--mode centrality``): weighted
    PageRank (+ TrustRank when ``--seeds`` names a trusted node list)
    and HyperBall truncated harmonic in-centrality over an edge parquet
    of (src, dst[, w]) — the host-level ranking pass a web-corpus
    curation pipeline runs before per-document gating (harmonic
    centrality is how Common Crawl derivatives rank hosts; PageRank is
    the classic link-quality prior). One output row per node:
    (node, rank[, trustrank], harmonic, reach), written as parquet for
    the curate chain to join on a doc's host column.

    Real link graphs are full of SINK hosts (linked-to, never linking
    out). Directed mode therefore runs PageRank with
    ``dangling='redistribute'`` (operators/graph.py pagerank_multi) —
    the textbook treatment: the node universe is src UNION dst and
    each iteration redistributes the sinks' rank mass over the
    teleport distribution, conserving total mass. (Rounds 3-5 patched
    sinks with unit self-loops instead, which changes semantics: a
    self-loop lets the sink RETAIN its own rank each step rather than
    returning it to the system.) ``--undirected`` symmetrizes every
    edge instead (centrality over the underlying undirected graph,
    for both PageRank and HyperBall).
    """
    import json as _json

    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        hyperball,
        pagerank_multi,
        undirect,
    )

    edges = spark.read.parquet(edges_path)
    if "w" not in edges.columns:
        edges = edges.withColumn("w", F.lit(1))
    edges = edges.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        F.col("w").cast("long"),
    )
    if undirected:
        edges = undirect(edges)
    variants: dict = {"rank": None}
    if seeds_path:
        variants["trustrank"] = spark.read.parquet(seeds_path).select(
            F.col("node").cast("string")
        )
    ranks = pagerank_multi(
        edges, variants, iterations=iterations,
        cache_site="cli.centrality.edges",
        dangling="contract" if undirected else "redistribute",
    )
    harm = hyperball(edges, max_t=max_t)
    result = ranks.join(harm, "node", "full_outer")
    result.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    top = back.orderBy(F.desc("harmonic")).limit(1).collect()
    summary = {
        "nodes": back.count(),
        "iterations": iterations,
        "max_t": max_t,
        "top_harmonic_node": top[0]["node"] if top else None,
        "out": out_dir,
    }
    print(">>> centrality; " + _json.dumps(summary))
    return summary


def _load_embeddings(spark, path: str):
    """(vec_id, v array<double>) from an embeddings parquet table or a
    testdata dir containing embeddings.parquet — the shared loader for
    every embeddings-driven CLI mode (knn-graph, decontam)."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        as_double_vec,
    )

    table = os.path.join(path, "embeddings.parquet")
    raw = spark.read.parquet(table if os.path.exists(table) else path)
    return raw.select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )


def _guard_out_overwrite(ap, out: str, reads) -> None:
    """Refuse --out equal to any input dir of a mode that writes with
    mode('overwrite') — Spark DELETES the target before the read plan
    executes, so a user passing --out pointing at an input would lose
    the input silently (review round 10: the --update-graph guard,
    hoisted and applied to EVERY overwrite-to---out mode). realpath,
    not abspath: a symlinked --out still clobbers the dir Spark reads.

    ``reads`` is a sequence of (flag_name, path) pairs; None/empty
    paths are skipped."""
    out_real = os.path.realpath(out)
    for flag, p in reads:
        if p and os.path.realpath(p) == out_real:
            ap.error(
                f"--out must differ from {flag}: Spark cannot "
                "overwrite a parquet dir this job reads "
                "(write to a new dir, then swap)"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=["kpis", "dedup", "dedup-batch", "curate", "report",
                 "train-classifier", "train-bpe", "compact",
                 "build-ann-index", "ann-search", "knn-graph",
                 "decontam", "cluster-sample", "centrality", "search",
                 "text-index", "shard", "ann-delete"],
        default="kpis",
        help="kpis: the 16-query tourism topology; dedup: streaming "
        "document near-dup verdicts (--path is a JSONL docs dir, "
        "--out the verdict parquet); dedup-batch: incremental ingest "
        "dedup of a new batch (--path) against the persisted "
        "fingerprint index (--index), verdicts to --out, index "
        "updated in place; curate: batch gate->redact->"
        "dedup->chunk->pack over a documents dir (--path) into packed "
        "training-sample parquet (--out); report: per-source corpus "
        "health JSON over a documents dir (--path; --out optional); "
        "compact: rewrite a small-file parquet dir (--path) into "
        "target-sized files (--out, --target-mb, optional --sort-by "
        "for a range-clustered stats-pruning layout); knn-graph: "
        "top-k cosine neighbors for EVERY vector of an embeddings "
        "table (--path) using an ann index's IVF centroids as the "
        "quantizer (--index), edges to --out — fully distributed, "
        "no driver-side query collect; decontam: embedding-space "
        "benchmark decontamination — flag every training vector "
        "(--path) whose max cosine against the eval suite (--eval) "
        "reaches --min-cosine, flagged rows to --out; cluster-sample: "
        "embedding-cluster-balanced subsampling — assign every vector "
        "(--path) to its max-cosine cell of an ann index's IVF "
        "centroids (--index) and keep at most --cap per cell in "
        "deterministic md5 order, kept rows to --out; search: BM25 "
        "full-text retrieval over a documents dir (--path) for "
        "--query keyword queries (repeatable), or query-by-example "
        "with --by-doc — RRF-fused with the exact cosine ranking "
        "when the dir has a matching embeddings table (hybrid "
        "search); prints the ranking, or parquet to --out; with "
        "--index (a text-index dir) the lexical ranking is served "
        "from the persisted inverted index instead of re-tokenizing "
        "the corpus; text-index: build the persistent inverted index "
        "(--path docs dir, --out index dir, --n-buckets), or fold a "
        "NEW doc batch into an existing one (--path batch, --index "
        "index dir — id overlap is validated and fails); shard: "
        "deterministic corpus shuffle + shard export — every row of "
        "--path gets (shard, pos) from the md5(id || ':' || seed) "
        "shuffle key, written to --out partitioned by shard with a "
        "per-shard manifest (count, token sum, id checksum) a trainer "
        "can verify shards against; (--shuffle-seed, --n-shards) "
        "fully determine the layout, so an epoch replays bit-for-bit",
    )
    ap.add_argument(
        "--n-shards",
        type=int,
        default=64,
        help="--mode shard: shard count — size well above the "
        "executor count so each shard's within-shard sort is bounded "
        "(web scale wants 8-64k)",
    )
    ap.add_argument(
        "--shuffle-seed",
        default="",
        help="--mode shard: epoch seed — a different seed is an "
        "independent deterministic epoch order",
    )
    ap.add_argument(
        "--verify",
        action="store_true",
        help="--mode shard: verify an existing export (--path is the "
        "export dir) against its manifest instead of writing one — "
        "per-shard count/checksum/position check, exit 1 on any "
        "mismatch",
    )
    ap.add_argument(
        "--n-buckets",
        type=int,
        default=64,
        help="--mode text-index: postings partition count — a q-term "
        "search scans ~q/n_buckets of the postings directories, so "
        "size UP with the corpus (web scale wants 1024+)",
    )
    ap.add_argument(
        "--cap", type=int, default=1000,
        help="--mode cluster-sample: max vectors kept per cluster",
    )
    ap.add_argument(
        "--eval",
        help="--mode decontam: eval-suite embeddings parquet/dir "
        "(small by construction — it packs into one broadcast row)",
    )
    ap.add_argument(
        "--min-cosine", type=float, default=0.99,
        help="--mode decontam: flag threshold on the rounded cosine "
        "(default 0.99 — the semantic_decontaminate library default)",
    )
    ap.add_argument(
        "--ngrams",
        type=int,
        default=None,
        metavar="N",
        help="--mode decontam: TEXT-side instead of embedding-side — "
        "flag training docs sharing verbatim N-gram token windows "
        "with any --eval doc (GPT-3 convention: 13); --path/--eval "
        "are docs dirs here",
    )
    ap.add_argument(
        "--min-shared",
        type=int,
        default=1,
        metavar="K",
        help="--mode decontam --ngrams: flag at >= K distinct shared "
        "windows (default 1)",
    )
    ap.add_argument(
        "--bloom-bits",
        type=int,
        default=0,
        metavar="M",
        help="--mode decontam --ngrams: fold the eval suite's windows "
        "into an M-bit SQL-native Bloom prefilter instead of "
        "broadcasting their raw hashes — the scale path for eval "
        "suites past ~10^7 windows; output is IDENTICAL (survivors "
        "are exactly verified). Size M to ~8-16 bits per distinct "
        "eval window. 0 (default) = plain broadcast",
    )
    ap.add_argument(
        "--cells", type=int, default=0,
        help="--mode build-ann-index: IVF coarse cells; 0 (default) "
        "auto-sizes to max(16, round(sqrt(n_vectors))) — the FAISS "
        "guideline (a fixed cell count degrades the probing ceiling "
        "as the corpus grows)",
    )
    ap.add_argument(
        "--seeds", default=None,
        help="--mode centrality: parquet of trusted nodes (node "
        "column) — adds a TrustRank column fused into the same "
        "power-iteration loop",
    )
    ap.add_argument(
        "--iterations", type=int, default=4,
        help="--mode centrality: PageRank power iterations",
    )
    ap.add_argument(
        "--max-t", type=int, default=6, dest="max_t",
        help="--mode centrality: HyperBall radius horizon",
    )
    ap.add_argument(
        "--undirected", action="store_true",
        help="--mode centrality: symmetrize edges (centrality over the "
        "underlying undirected graph); default treats the graph as "
        "directed, redistributing sink-node rank mass over the "
        "teleport distribution each iteration",
    )
    ap.add_argument(
        "--pq-m", type=int, default=None,
        help="--mode build-ann-index: PQ subquantizers (must divide "
        "dim); default auto-sizes to ~4 dims per subspace — the "
        "measured recall/size operating point (round 8)",
    )
    ap.add_argument(
        "--pq-codes", type=int, default=256,
        help="--mode build-ann-index: centroids per PQ subspace",
    )
    ap.add_argument(
        "--k", type=int, default=10, help="--mode ann-search: neighbors"
    )
    ap.add_argument(
        "--n-probe", type=int, default=4,
        help="--mode ann-search: IVF cells probed per query",
    )
    ap.add_argument(
        "--rerank", type=int, default=None,
        help="--mode ann-search: exact-rerank shortlist size "
        "(needs a store_vectors index)",
    )
    ap.add_argument(
        "--assignment", choices=["auto", "plan", "broadcast", "two-level"],
        default="auto",
        help="--mode knn-graph: cell-assignment strategy — plan "
        "constants (small quantizers), broadcast numpy + pandas UDF "
        "(the sqrt(N)-cells path), auto (switch above 256 cells), or "
        "two-level (coarse-then-fine; the quantizer stays a DataFrame "
        "— the >200k-cell regime where even a broadcast matrix is "
        "unreasonable)",
    )
    ap.add_argument(
        "--n-coarse-probe", type=int, default=None,
        help="--mode knn-graph --assignment two-level: coarse cells "
        "probed per vector when ranking fine cells (recall knob of "
        "the first quantization level); default = sqrt of the drawn "
        "coarse count (recall-guided — see the SOAK_r10 curve)",
    )
    ap.add_argument(
        "--update-graph",
        help="--mode knn-graph: fold --path (a NEW embedding batch) "
        "into this existing edge parquet instead of rebuilding — "
        "requires --old-path (the already-indexed embeddings); with "
        "the same quantizer/k/n-probe the chained result equals a "
        "whole-corpus rebuild bit-for-bit. New and old vec_ids must "
        "be DISJOINT (a re-delivered batch would duplicate edge "
        "sets) — this mode validates that and fails on overlap",
    )
    ap.add_argument(
        "--old-path",
        help="--mode knn-graph --update-graph: embeddings parquet/dir "
        "of the corpus the existing graph covers",
    )
    ap.add_argument(
        "--delete-ids",
        help="--mode knn-graph --update-graph: instead of folding a "
        "new batch, DELETE these vec_ids (a parquet of vec_id rows) "
        "(also: --mode text-index --index IDX --delete-ids P deletes "
        "those doc_ids from the inverted index, victim buckets only) "
        "from the existing --update-graph edges — dropped vertices "
        "vanish and every survivor whose stored top-k pointed at one "
        "is re-ranked against the remaining corpus (--path = the "
        "embeddings the graph covers); with the same quantizer/k/"
        "n-probe the result equals a rebuild over the survivors "
        "bit-for-bit; never-existed ids are ignored (replay-safe)",
    )
    ap.add_argument(
        "--n-merges",
        type=int,
        default=200,
        help="--mode train-bpe: number of BPE merges to learn",
    )
    ap.add_argument(
        "--bpe-model",
        help="--mode curate: BPE model JSON from --mode train-bpe; "
        "packed samples then carry input_ids (array<int>)",
    )
    ap.add_argument(
        "--query",
        action="append",
        help="--mode search: a keyword query (repeatable; each gets "
        "its own BM25 ranking)",
    )
    ap.add_argument(
        "--by-doc",
        type=int,
        help="--mode search: query-by-example doc_id — BM25 over that "
        "doc's terms; if the corpus dir also has an embeddings table "
        "with a matching vec_id, the lexical ranking is RRF-fused "
        "with the exact cosine ranking (hybrid search)",
    )
    ap.add_argument(
        "--top-n",
        type=int,
        default=10,
        help="--mode search: results per query",
    )
    ap.add_argument(
        "--target-mb",
        type=int,
        default=128,
        help="--mode compact: target output file size in MB",
    )
    ap.add_argument(
        "--sort-by",
        help="--mode compact: comma-separated columns; output files "
        "then cover disjoint key ranges (min/max stats prune)",
    )
    ap.add_argument(
        "--zorder-by",
        dest="zorder_by",
        help="--mode compact: comma-separated 2-4 NUMERIC columns; "
        "OPTIMIZE ZORDER BY — files cluster along the Morton curve so "
        "min/max stats prune on ANY of the columns (mutually "
        "exclusive with --sort-by)",
    )
    ap.add_argument("--out", help="output dir for --mode dedup/curate")
    ap.add_argument(
        "--strip-boilerplate",
        type=int,
        default=None,
        metavar="K",
        help="--mode curate: drop chunks containing a window repeated "
        "verbatim in >= K kept docs (exact-substring boilerplate)",
    )
    ap.add_argument(
        "--despan-min-copies",
        type=int,
        default=None,
        metavar="K",
        help="--mode curate: exact-substring REMOVAL — cut windows "
        "repeated verbatim in >= K kept docs out of each document's "
        "token stream (one global keeper occurrence survives) before "
        "chunking; the gentler alternative to --strip-boilerplate's "
        "whole-chunk drop",
    )
    ap.add_argument(
        "--labels",
        help="--mode train-classifier: parquet of (doc_id, label in "
        "{0,1}) seed judgments over the --path corpus",
    )
    ap.add_argument(
        "--dim",
        type=int,
        default=1024,
        help="--mode train-classifier: hashed bag-of-words dimension",
    )
    ap.add_argument(
        "--iters",
        type=int,
        default=30,
        help="--mode train-classifier: gradient-descent iterations",
    )
    ap.add_argument(
        "--classifier-model",
        help="--mode curate: JSON model from --mode train-classifier; "
        "keep docs the classifier scores >= --classifier-threshold",
    )
    ap.add_argument(
        "--classifier-threshold",
        type=float,
        default=0.5,
        help="--mode curate: probability cut for --classifier-model",
    )
    ap.add_argument(
        "--ppl-tail",
        type=float,
        help="--mode curate: drop the worst FRACTION of deduped docs "
        "by unigram-LM mean NLL (CCNet tail-reject); the LM trains on "
        "--lm-ref when given, else on the deduped corpus itself",
    )
    ap.add_argument(
        "--lm-ref",
        help="--mode curate: parquet docs dir of a TRUSTED corpus to "
        "train the perplexity LM on (used with --ppl-tail)",
    )
    ap.add_argument(
        "--index",
        help="--mode dedup-batch: directory holding the persisted "
        "(doc_id, simhash) fingerprint index; created on first run, "
        "atomically replaced with index+batch after each ingest",
    )
    ap.add_argument(
        "--index-retain-min-id",
        type=int,
        help="--mode dedup-batch: drop index fingerprints with "
        "doc_id below this floor after the ingest (bounded dedup "
        "horizon — the batch twin of the streaming TTL)",
    )
    ap.add_argument(
        "--baseline",
        help="--mode report: docs dir of a BASELINE corpus; emits PSI "
        "drift of quality_score / n_tokens vs it, plus psi_embedding "
        "(embedding-SPACE drift: per-cell occupancy PSI against a "
        "baseline-drawn quantizer) when both corpora carry an "
        "embeddings table. --mode dedup with "
        "--gate: per-micro-batch ingest PSI gauge of quality_score vs "
        "the baseline, pushed through the metrics sink",
    )
    ap.add_argument(
        "--source", choices=["kafka", "file", "kafka-replay"], default="file"
    )
    ap.add_argument(
        "--path",
        help="wire JSONL root (file source) or recorded-frame root (kafka-replay)",
    )
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--pushgateway", default=os.environ.get("PUSHGATEWAY_URL", ""))
    ap.add_argument("--watermark", default=os.environ.get("WATERMARK", "45 seconds"))
    ap.add_argument("--trigger", default=os.environ.get("TRIGGER", "10 seconds"))
    ap.add_argument("--topn", type=int, default=int(os.environ.get("TOPN", "10")))
    ap.add_argument(
        "--once", action="store_true", help="availableNow: drain inputs and exit"
    )
    ap.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=None,
        metavar="N",
        help="streaming modes: cap input files per micro-batch "
        "(maxFilesPerTrigger)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="--mode text-index --index IDX: fold a JSONL docs STREAM "
        "at --path into the index one micro-batch at a time "
        "(availableNow; first batch builds, later batches add — "
        "streamed == bulk build bit-for-bit by the chained-add "
        "contract)"
    )
    ap.add_argument(
        "--ttl-ms",
        type=int,
        default=None,
        help="dedup mode: evict near-dup index buckets idle this many "
        "ms (bounded state for unbounded streams); default keeps "
        "state forever",
    )
    ap.add_argument(
        "--fuzzy",
        action="store_true",
        help="curate mode: add the near-dup stage (MinHash+LSH -> "
        "Jaccard verify -> components -> quality-aware canonical)",
    )
    ap.add_argument(
        "--bits",
        type=int,
        choices=[16, 64],
        default=16,
        help="dedup mode: SimHash fingerprint width — 16 is the "
        "oracle-matchable fixture width, 64 the production width "
        "(random collisions ~2.4e-15)",
    )
    ap.add_argument(
        "--gate",
        action="store_true",
        help="dedup mode: apply the quality keep/drop gate (on redacted "
        "text) before the near-dup index",
    )
    ap.add_argument(
        "--repetition-gate",
        action="store_true",
        dest="repetition_gate",
        help="dedup mode (with --gate): also drop docs failing the "
        "Gopher repetition rules (top-2-gram / dup-5-gram character "
        "fractions, duplicate-line fractions) — catches scattered "
        "phrase repetition the heuristic gate's dup-3-gram check "
        "misses",
    )
    ap.add_argument(
        "--cap-per-domain",
        type=int,
        dest="cap_per_domain",
        metavar="K",
        help="--mode curate: keep at most K documents per site before "
        "the curation chain (RefinedWeb per-domain cap; input docs "
        "need a 'url' column; deterministic lowest-doc_id-first keep)",
    )
    ap.add_argument(
        "--cap-key",
        choices=("domain", "regdomain"),
        default="domain",
        dest="cap_key",
        help="--cap-per-domain key: 'domain' = raw host (url_domain); "
        "'regdomain' = PSL registrable domain (registrable_domain) so "
        "hosted-content publishers (two *.github.io users) each get "
        "their own cap",
    )
    ap.add_argument(
        "--psl",
        dest="psl_path",
        metavar="DAT",
        help="--cap-key regdomain: a publicsuffix.org "
        "public_suffix_list.dat file to load the full rule set from "
        "(default: the built-in snapshot)",
    )
    ap.add_argument(
        "--rep-threshold",
        action="append",
        dest="rep_thresholds",
        metavar="KEY=VALUE",
        help="override a Gopher repetition-gate threshold (repeatable): "
        "KEY one of top_2gram_char_frac, dup_5gram_char_frac, "
        "dup_line_frac, dup_line_char_frac; defaults are the Gopher "
        "table-A1 values pinned by the oracle gate "
        "(e.g. --rep-threshold dup_5gram_char_frac=0.25 for a code "
        "corpus that legitimately repeats more)",
    )
    args = ap.parse_args()
    rep_thresholds = None
    if args.rep_thresholds:
        rep_thresholds = {}
        for kv in args.rep_thresholds:
            key, _, val = kv.partition("=")
            if not val:
                ap.error(f"--rep-threshold wants KEY=VALUE, got {kv!r}")
            try:
                rep_thresholds[key] = float(val)
            except ValueError:
                ap.error(f"--rep-threshold {key}: {val!r} is not a number")
        if not args.repetition_gate:
            ap.error(
                "--rep-threshold has no effect without --repetition-gate"
            )
    if args.psl_path and args.cap_key != "regdomain":
        ap.error("--psl has no effect without --cap-key regdomain")
    if args.cap_key != "domain" and args.cap_per_domain is None:
        ap.error("--cap-key has no effect without --cap-per-domain")

    spark = get_spark("travelpulse-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "report":
        if not args.path:
            ap.error("--mode report requires --path (docs dir)")
        run_report(spark, args.path, args.out, baseline_path=args.baseline)
        return

    if args.mode == "centrality":
        if not args.path or not args.out:
            ap.error(
                "--mode centrality requires --path (edge parquet of "
                "src,dst[,w]) and --out (node-signal parquet)"
            )
        run_centrality(
            spark, args.path, args.out, iterations=args.iterations,
            max_t=args.max_t, seeds_path=args.seeds,
            undirected=args.undirected,
        )
        return

    if args.mode == "build-ann-index":
        if not args.path or not args.out:
            ap.error(
                "--mode build-ann-index requires --path (embeddings "
                "parquet/dir) and --out (index dir)"
            )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
            build_ann_index,
        )

        table = os.path.join(args.path, "embeddings.parquet")
        emb = spark.read.parquet(
            table if os.path.exists(table) else args.path
        )
        meta = build_ann_index(
            emb, args.out, n_cells=args.cells or None, m=args.pq_m,
            k_codes=args.pq_codes,
        )
        print(
            f">>> ann index built; {meta['n_vectors']} vectors, "
            f"{meta['n_cells']} cells, m={meta['m']} x "
            f"{meta['k_codes']} codes -> {args.out}"
        )
        return

    if args.mode == "ann-search":
        if not args.path or not args.out or not args.index:
            ap.error(
                "--mode ann-search requires --path (queries parquet: "
                "qid, qv), --index (index dir) and --out (results "
                "parquet)"
            )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
            ann_search,
        )

        _guard_out_overwrite(
            ap, args.out, [("--path", args.path), ("--index", args.index)]
        )
        queries = spark.read.parquet(args.path)
        res = ann_search(
            spark, args.index, queries, k=args.k, n_probe=args.n_probe,
            rerank=args.rerank,
        )
        res.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            f">>> ann search done; {n} (query, neighbor) rows "
            f"(k={args.k}, n_probe={args.n_probe}, "
            f"rerank={args.rerank}) -> {args.out}"
        )
        return

    if args.mode == "knn-graph":
        if not args.path or not args.out or not args.index:
            ap.error(
                "--mode knn-graph requires --path (embeddings "
                "parquet/dir), --index (an ann index dir — its IVF "
                "centroids are the quantizer) and --out (graph parquet)"
            )
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
            ivf_knn_graph,
            two_level_knn_graph,
        )

        _guard_out_overwrite(
            ap,
            args.out,
            [
                ("--path", args.path),
                ("--index", args.index),
                ("--update-graph", args.update_graph),
                ("--old-path", args.old_path),
                ("--delete-ids", args.delete_ids),
            ],
        )
        emb = _load_embeddings(spark, args.path)
        cents = spark.read.parquet(
            os.path.join(args.index, "centroids.parquet")
        ).select(F.col("cell").alias("cell_id"), F.col("center").alias("sv"))
        # Clamp n_probe to the index's cell count (ADVICE r8): the
        # --n-probe default is documented for ann-search, which clamps
        # implicitly; a small index must not hard-fail here under the
        # same defaults.
        n_cells = cents.count()
        n_probe = min(args.n_probe, n_cells)
        if args.delete_ids and not args.update_graph:
            ap.error(
                "--delete-ids requires --update-graph (the edge "
                "parquet to repair)"
            )
        if args.update_graph and args.delete_ids:
            if args.assignment == "two-level":
                ap.error(
                    "--update-graph supports the flat assignment "
                    "paths (auto|plan|broadcast) only"
                )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
                delete_from_knn_graph,
            )

            graph = delete_from_knn_graph(
                spark.read.parquet(args.update_graph),
                emb,
                spark.read.parquet(args.delete_ids).select("vec_id"),
                "vec_id",
                "v",
                cents,
                k=args.k,
                n_probe=n_probe,
                assignment=args.assignment,
            )
        elif args.update_graph:
            if not args.old_path:
                ap.error(
                    "--update-graph requires --old-path (the "
                    "embeddings the existing graph covers)"
                )
            if args.assignment == "two-level":
                ap.error(
                    "--update-graph supports the flat assignment "
                    "paths (auto|plan|broadcast) only"
                )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
                incremental_knn_graph,
            )

            graph = incremental_knn_graph(
                spark.read.parquet(args.update_graph),
                _load_embeddings(spark, args.old_path),
                emb,
                "vec_id",
                "v",
                cents,
                k=args.k,
                n_probe=n_probe,
                assignment=args.assignment,
                validate=True,
            )
        elif args.assignment == "two-level":
            graph = two_level_knn_graph(
                emb, "vec_id", "v", cents, k=args.k, n_probe=n_probe,
                n_coarse_probe=args.n_coarse_probe,
            )
        else:
            graph = ivf_knn_graph(
                emb, "vec_id", "v", cents, k=args.k, n_probe=n_probe,
                assignment=args.assignment,
            )
        mode_tag = (
            "pruned"
            if args.delete_ids
            else ("updated" if args.update_graph else "built")
        )
        graph.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            f">>> knn graph {mode_tag}; {n} (vector, neighbor) edges "
            f"(k={args.k}, n_probe={n_probe}, "
            f"assignment={args.assignment}) -> {args.out}"
        )
        return

    if args.mode == "decontam":
        if not args.path or not args.eval or not args.out:
            ap.error(
                "--mode decontam requires --path (training embeddings "
                "parquet/dir, or docs dir with --ngrams), --eval "
                "(eval-suite embeddings or docs) and --out (flagged "
                "rows parquet)"
            )
        if args.ngrams:
            # TEXT-side decontamination (late round 10): verbatim
            # n-gram overlap with the eval suite — the lexical
            # complement of the embedding path below
            from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
                ngram_decontaminate,
            )

            _guard_out_overwrite(
                ap, args.out, [("--path", args.path), ("--eval", args.eval)]
            )
            flagged = ngram_decontaminate(
                _load_docs(spark, args.path),
                _load_docs(spark, args.eval),
                n=args.ngrams,
                min_shared=args.min_shared,
                strategy="bloom" if args.bloom_bits else "broadcast",
                bloom_bits=args.bloom_bits or (1 << 24),
            )
            flagged.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(
                f">>> decontam done; {n} training docs flagged "
                f"({args.ngrams}-gram overlap >= {args.min_shared}) "
                f"-> {args.out}"
            )
            return
        from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
            semantic_decontaminate,
        )

        _guard_out_overwrite(
            ap, args.out, [("--path", args.path), ("--eval", args.eval)]
        )
        flagged = semantic_decontaminate(
            _load_embeddings(spark, args.path),
            _load_embeddings(spark, args.eval),
            "vec_id",
            "v",
            min_cosine=args.min_cosine,
        )
        flagged.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            f">>> decontam done; {n} training vectors flagged "
            f"(min_cosine={args.min_cosine}) -> {args.out}"
        )
        return

    if args.mode == "cluster-sample":
        if not args.path or not args.index or not args.out:
            ap.error(
                "--mode cluster-sample requires --path (embeddings "
                "parquet/dir), --index (an ann index dir — its IVF "
                "centroids are the clusters) and --out (kept rows "
                "parquet)"
            )
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
            cluster_balanced_sample,
        )

        _guard_out_overwrite(
            ap, args.out, [("--path", args.path), ("--index", args.index)]
        )
        cents = spark.read.parquet(
            os.path.join(args.index, "centroids.parquet")
        ).select(F.col("cell").alias("cell_id"), F.col("center").alias("sv"))
        kept = cluster_balanced_sample(
            _load_embeddings(spark, args.path),
            cents,
            cap=args.cap,
            id_col="vec_id",
            vec_col="v",
        ).select("vec_id", "cell_id", "cluster_rank", "own_cosine")
        kept.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            f">>> cluster sample done; {n} vectors kept "
            f"(cap={args.cap} per cell) -> {args.out}"
        )
        return

    if args.mode == "ann-delete":
        if not args.index or not args.delete_ids or args.path or args.out:
            ap.error(
                "--mode ann-delete requires --index (an ann index "
                "dir) and --delete-ids (a parquet of ids), and takes "
                "neither --path nor --out: victim cells rewrite in "
                "place, the frozen quantizer/codebooks are untouched"
            )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
            delete_from_ann_index,
        )

        meta = delete_from_ann_index(
            spark, args.index, spark.read.parquet(args.delete_ids)
        )
        print(
            f">>> ann index pruned; now {meta['n_vectors']} vectors "
            f"-> {args.index}"
        )
        return

    if args.mode == "shard" and args.verify:
        if not args.path or args.out:
            ap.error(
                "--mode shard --verify takes --path (an existing "
                "shard export dir) and no --out"
            )
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
            verify_shards,
        )

        rows = verify_shards(spark, args.path).collect()
        bad = [r for r in rows if not r["ok"]]
        for r in sorted(bad, key=lambda r: (r["shard"] is None, r["shard"])):
            print(
                f"shard {r['shard']}: MISMATCH (docs {r['n_docs']} vs "
                f"stored {r['n_docs_stored']}, checksum_ok="
                f"{r['checksum_ok']}, dense_ok={r['dense_ok']})"
            )
        print(
            f">>> shard verify {'FAILED' if bad else 'ok'}; "
            f"{len(rows) - len(bad)}/{len(rows)} shards match "
            f"-> {args.path}"
        )
        if bad:
            raise SystemExit(1)
        return

    if args.mode == "shard":
        if not args.path or not args.out:
            ap.error(
                "--mode shard requires --path (a documents parquet/"
                "dir) and --out (the shard export dir)"
            )
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
            words_of,
        )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
            shard_manifest,
            shuffled_shards,
        )

        _guard_out_overwrite(ap, args.out, [("--path", args.path)])
        docs = _load_docs(spark, args.path)
        id_col = "doc_id" if "doc_id" in docs.columns else docs.columns[0]
        tokens_col = None
        if "n_tokens" in docs.columns:
            tokens_col = "n_tokens"
        elif "text" in docs.columns:
            docs = docs.withColumn(
                "n_tokens", F.size(words_of(F.col("text"))).cast("long")
            )
            tokens_col = "n_tokens"
        assigned = shuffled_shards(
            docs, n_shards=args.n_shards, seed=args.shuffle_seed,
            id_col=id_col, validate=True,
        )
        # one shuffle total: the row_number window already hash-
        # partitioned on shard, so the partitioned write reuses it;
        # sortWithinPartitions gives a sequential reader pos order
        # on disk, not just as a column
        (
            assigned.repartition(args.n_shards, "shard")
            .sortWithinPartitions("shard", "pos")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(args.out, "shards"))
        )
        written = spark.read.parquet(os.path.join(args.out, "shards"))
        man = shard_manifest(
            written, id_col=id_col, tokens_col=tokens_col
        )
        man.write.mode("overwrite").parquet(
            os.path.join(args.out, "manifest.parquet")
        )
        stats = man.agg(
            F.count("*").alias("shards"),
            F.sum("n_docs").alias("docs"),
            F.min(F.col("positions_dense").cast("int")).alias("dense"),
        ).collect()[0]
        if stats["dense"] != 1:
            raise SystemExit(
                "shard export integrity check failed: a shard's "
                "positions are not contiguous 1..n"
            )
        print(
            f">>> shard export done; {stats['docs']} rows into "
            f"{stats['shards']} shards (seed="
            f"{args.shuffle_seed!r}) -> {args.out}"
        )
        return

    if args.mode == "text-index":
        if args.delete_ids:
            # deletion repair: no docs dir needed, just the index and
            # the victim id parquet
            if not args.index or args.out or args.path:
                ap.error(
                    "--mode text-index --delete-ids requires --index "
                    "(and takes neither --path nor --out: victims are "
                    "identified by id, buckets rewritten in place)"
                )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.text_index import (
                delete_from_text_index,
            )

            stats = delete_from_text_index(
                spark, args.index, spark.read.parquet(args.delete_ids)
            )
            print(
                f">>> text index pruned; now {stats['n_docs']} docs, "
                f"{stats['total_tokens']} tokens -> {args.index}"
            )
            return
        if args.stream:
            if not args.path or not args.index or args.out:
                ap.error(
                    "--mode text-index --stream requires --path (JSONL "
                    "docs stream dir) and --index (the index dir; "
                    "created by the first batch) — no --out"
                )
            st = run_text_index_stream(
                spark, args.path, args.index,
                max_files_per_trigger=args.max_files_per_trigger,
            )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.text_index import (
                load_text_index_stats,
            )

            stats = load_text_index_stats(args.index)
            print(
                f">>> text index streamed; {st['batches']} batches, now "
                f"{stats['n_docs']} docs, {stats['total_tokens']} tokens "
                f"-> {args.index}"
            )
            return
        if not args.path or (bool(args.out) == bool(args.index)):
            ap.error(
                "--mode text-index requires --path (docs dir) and "
                "EITHER --out (build a new index there) OR --index "
                "(fold the --path batch into that existing index), or "
                "--index with --delete-ids (deletion repair), or "
                "--index with --stream (streaming ingest)"
            )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.text_index import (
            add_to_text_index,
            build_text_index,
        )

        docs = _load_docs(spark, args.path)
        if args.out:
            _guard_out_overwrite(ap, args.out, [("--path", args.path)])
            stats = build_text_index(
                docs, args.out, n_buckets=args.n_buckets
            )
            print(
                f">>> text index built; {stats['n_docs']} docs, "
                f"{stats['total_tokens']} tokens, "
                f"{stats['n_buckets']} buckets -> {args.out}"
            )
        else:
            stats = add_to_text_index(spark, args.index, docs, validate=True)
            print(
                f">>> text index updated; now {stats['n_docs']} docs, "
                f"{stats['total_tokens']} tokens -> {args.index}"
            )
        return

    if args.mode == "search":
        if not args.path or (not args.query and args.by_doc is None):
            ap.error(
                "--mode search requires --path (docs dir) and --query "
                "(repeatable keyword query) or --by-doc (doc_id for "
                "query-by-example / hybrid search)"
            )
        if args.out:
            # before ANY read: bm25_rank runs an eager stats job, and
            # the write below is mode('overwrite')
            _guard_out_overwrite(ap, args.out, [("--path", args.path)])
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.operators.retrieval import (
            bm25_rank,
            rrf_fuse,
        )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
            brute_force_knn,
        )
        from pyspark.sql.window import Window

        docs = _load_docs(spark, args.path)
        use_index = bool(args.index)
        if use_index:
            if not os.path.exists(os.path.join(args.index, "stats.json")):
                ap.error(
                    f"--index {args.index} is not a text index (no "
                    "stats.json) — build one with --mode text-index"
                )
            from travelpulse_spark_stream_tourism_analytics_spark.operators.text_index import (
                search_text_index,
            )

        def lex_rank(queries_df, top_n):
            if use_index:
                return search_text_index(
                    spark, args.index, queries_df, top_n=top_n
                )
            return bm25_rank(docs, queries_df, top_n=top_n)

        if args.query:
            queries = spark.createDataFrame(
                [(i, q) for i, q in enumerate(args.query)],
                "query_id long, query_text string",
            )
            ranked = lex_rank(queries, args.top_n)
            kind = "bm25-index" if use_index else "bm25"
        else:
            qdoc = docs.filter(F.col("doc_id") == args.by_doc).select(
                F.col("doc_id").alias("query_id"),
                F.col("text").alias("query_text"),
            )
            if not qdoc.limit(1).count():
                ap.error(f"--by-doc {args.by_doc} not found in --path")
            # lexical: BM25 over the query doc's terms, self excluded
            # then re-ranked (top_n+1 fetched — at most one self row)
            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            lex = (
                lex_rank(qdoc, args.top_n + 1)
                .filter(F.col("doc_id") != F.col("query_id"))
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= args.top_n)
                .select("query_id", "rank", "doc_id")
            )
            emb_table = os.path.join(args.path, "embeddings.parquet")
            if os.path.exists(emb_table):
                emb = _load_embeddings(spark, args.path)
                qv = emb.filter(F.col("vec_id") == args.by_doc).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                )
                wv = Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id")
                )
                vec = (
                    brute_force_knn(
                        emb, qv, "vec_id", "query_id", "v", k=args.top_n
                    )
                    .withColumn(
                        "rank", F.row_number().over(wv).cast("long")
                    )
                    .select(
                        "query_id", "rank",
                        F.col("neighbor_id").alias("doc_id"),
                    )
                )
                ranked = rrf_fuse([lex, vec], top_n=args.top_n)
                kind = "hybrid-rrf"
            else:
                ranked = lex.withColumn(
                    "n_systems", F.lit(1).cast("long")
                ).withColumn("score", F.lit(None).cast("double"))
                kind = "bm25-by-doc"
        if args.out:
            ranked.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(f">>> search done; {kind}, {n} results -> {args.out}")
        else:
            rows = ranked.orderBy("query_id", "rank").collect()
            for r in rows:
                print(
                    f"q{r['query_id']} #{r['rank']} doc {r['doc_id']}"
                    + (
                        f" score {r['score']}"
                        if "score" in ranked.columns and r["score"] is not None
                        else ""
                    )
                )
            print(f">>> search done; {kind}, {len(rows)} results")
        return

    if args.mode == "train-bpe":
        if not args.path or not args.out:
            ap.error("--mode train-bpe requires --path (docs dir) and --out")
        from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
            save_bpe_model,
            train_bpe_model,
        )

        docs = _load_docs(spark, args.path)
        model = train_bpe_model(docs, n_merges=args.n_merges)
        save_bpe_model(model, args.out)
        print(
            f">>> bpe trained; {len(model['merges'])} merges, vocab "
            f"{len(model['vocab'])} -> {args.out}"
        )
        return

    if args.mode == "compact":
        if not args.path or not args.out:
            ap.error("--mode compact requires --path (parquet dir) and --out")
        from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
            compact_parquet,
        )

        report = compact_parquet(
            spark,
            args.path,
            args.out,
            target_file_bytes=args.target_mb * 1024 * 1024,
            sort_by=[c.strip() for c in args.sort_by.split(",")]
            if args.sort_by
            else (),
            zorder_by=[c.strip() for c in args.zorder_by.split(",")]
            if args.zorder_by
            else (),
        )
        b, a = report["before"], report["after"]
        print(
            f">>> compacted; {b['n_files']} files "
            f"({b['total_bytes']} B, {b['n_small']} small) -> "
            f"{a['n_files']} files ({a['total_bytes']} B) -> {args.out}"
        )
        return

    if args.mode == "curate":
        if not args.path or not args.out:
            ap.error("--mode curate requires --path (docs dir) and --out")
        stats = run_curate(spark, args.path, args.out, fuzzy=args.fuzzy,
                         strip_boilerplate=args.strip_boilerplate,
                         despan_min_copies=args.despan_min_copies,
                         ppl_tail=args.ppl_tail, lm_ref_path=args.lm_ref,
                         classifier_model_path=args.classifier_model,
                         classifier_threshold=args.classifier_threshold,
                         bpe_model_path=args.bpe_model,
                         repetition_gate=args.repetition_gate,
                         repetition_thresholds=rep_thresholds,
                         cap_per_domain=args.cap_per_domain,
                         cap_key=args.cap_key,
                         psl_path=args.psl_path)
        print(
            f">>> curated; {stats['docs']} docs in, {stats['kept']} kept, "
            f"{stats['samples']} packed samples in {stats['packs']} "
            f"sequences -> {args.out}"
        )
        return

    if args.mode == "train-classifier":
        if not args.path or not args.labels or not args.out:
            ap.error(
                "--mode train-classifier requires --path (docs dir), "
                "--labels (label parquet) and --out (model JSON path)"
            )
        stats = run_train_classifier(
            spark, args.path, args.labels, args.out,
            dim=args.dim, iters=args.iters,
        )
        print(
            f">>> classifier trained; {stats['docs']} labeled docs "
            f"({stats['pos']} positive), train accuracy "
            f"{stats['train_acc']} -> {args.out}"
        )
        return

    if args.mode == "dedup-batch":
        if not args.path or not args.out or not args.index:
            ap.error(
                "--mode dedup-batch requires --path (new docs), "
                "--out (verdict parquet) and --index (fingerprint dir)"
            )
        stats = run_dedup_batch(
            spark, args.path, args.out, args.index, bits=args.bits,
            retain_min_id=args.index_retain_min_id,
        )
        print(
            f">>> batch deduped; {stats['docs']} new docs, "
            f"{stats['dups']} near-dups vs index+batch; index now "
            f"{stats['index_rows']} fingerprints -> {args.index}"
        )
        return

    if args.mode == "dedup":
        if not args.path or not args.out:
            ap.error("--mode dedup requires --path (docs dir) and --out")
        sink = (
            PrometheusPushSink(args.pushgateway, job_name="tourism_ingest")
            if args.pushgateway
            else None
        )
        stats = run_dedup(
            spark, args.path, args.out, once=args.once, trigger=args.trigger,
            gate=args.gate, repetition_gate=args.repetition_gate,
            repetition_thresholds=rep_thresholds,
            bits=args.bits, ttl_ms=args.ttl_ms,
            baseline_path=args.baseline, metric_sink=sink,
        )
        print(
            f">>> dedup drained; {stats['docs']} docs, "
            f"{stats['dups']} flagged as near-dups -> {args.out}"
        )
        return

    if args.source == "kafka":
        wires = {
            kind: kafka_stream(spark, topic, args.bootstrap)
            for kind, topic in [
                ("weather", os.environ.get("WEATHER_TOPIC", "weather.events.v1")),
                ("flight", os.environ.get("FLIGHT_TOPIC", "flight.events.v1")),
                ("booking", os.environ.get("BOOKING_TOPIC", "booking.events.v1")),
            ]
        }
    else:
        if not args.path:
            ap.error(f"--path required for --source {args.source}")
        mk = kafka_frame_replay if args.source == "kafka-replay" else file_stream
        wires = {
            kind: mk(spark, os.path.join(args.path, kind))
            for kind in ("weather", "flight", "booking")
        }

    weather = parse_events(wires["weather"], WEATHER_SCHEMA)
    flights = parse_events(wires["flight"], FLIGHT_SCHEMA)
    bookings = parse_events(wires["booking"], BOOKING_SCHEMA)
    city_dim = spark.createDataFrame(CITY_DIM_ROWS, CITY_DIM_SCHEMA)

    sink = (
        PrometheusPushSink(args.pushgateway) if args.pushgateway else MemoryMetricSink()
    )
    trigger = (
        {"availableNow": True} if args.once else {"processingTime": args.trigger}
    )
    work = tempfile.mkdtemp(prefix="tp_pipeline_")
    queries, _scorer = build_all_queries(
        spark,
        weather,
        flights,
        bookings,
        city_dim,
        sink,
        checkpoint_root=os.environ.get("CHECKPOINT_ROOT", os.path.join(work, "chk")),
        staging_dir=os.path.join(work, "staging"),
        watermark=args.watermark,
        trigger=trigger,
        topn=args.topn,
    )
    print(f">>> {len(queries)} streaming queries started ({args.source} source)")
    if args.once:
        for q in queries:
            q.awaitTermination()
        if isinstance(sink, MemoryMetricSink):
            print(f">>> drained; {len(sink.latest())} distinct metrics computed")
    else:
        spark.streams.awaitAnyTermination()


if __name__ == "__main__":
    main()
