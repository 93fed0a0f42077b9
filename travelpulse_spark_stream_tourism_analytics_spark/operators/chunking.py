"""Document chunking for training-data pipelines.

Splits documents into overlapping token windows — the preprocessing
step between raw documents and tokenized training samples. Pure array
expressions over one scan: the explode is map-side, chunk ids are
content-independent (doc_id + index) so re-runs are stable, and no
shuffle happens at all unless a downstream op groups. At 100 TB this
is embarrassingly parallel and the output is ~(n_tokens/stride)x the
row count with bounded row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import words_of


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc, text) -> one row per overlapping token-window chunk.

    Chunks start every ``chunk_tokens - overlap`` tokens; the last
    chunk may be short; an empty document yields one empty chunk (so
    every input doc survives into the output — droppable by a trivial
    filter if unwanted). ``chunk_uid`` = md5("{doc_id}:{idx}") is
    engine-portable and reproducible.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap={overlap} must be < chunk_tokens={chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = words_of(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5(
            F.concat_ws(":", F.col(id_col).cast("string"), F.col("chunk_idx"))
        ).alias("chunk_uid"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
    capacity: int = 1024,
    n_shards: int = 8,
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget bins.

    The training-sample packing step — chunks are laid out in a
    deterministic order (doc_id, chunk_idx) inside each hash shard
    (``doc_id % n_shards``) and binned by running token total:
    ``pack_id = floor(tokens_before_this_chunk / capacity)``. This is
    the distributed approximation of sequential next-fit: bins are
    contiguous and ordered, and a bin's total can exceed ``capacity``
    only by its final chunk (< chunk_tokens), which real pipelines
    absorb as truncation/padding slack. Exact next-fit (carry the
    remainder into the next bin decision) is inherently sequential;
    this closed form needs only a per-shard running sum.

    Scale shape: the window partitions by shard — pick ``n_shards`` ~
    corpus_tokens / shard_budget so each shard is one output file's
    worth, exactly how packed training shards are written. No global
    order, no single-partition window.
    """
    w = (
        Window.partitionBy("shard_id")
        .orderBy(F.col(id_col), F.col(idx_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(tokens_col).over(w)
    return chunks.withColumn(
        "shard_id", (F.col(id_col) % n_shards).cast("long")
    ).withColumn(
        "pack_id",
        F.floor((run - F.col(tokens_col)) / F.lit(float(capacity))).cast(
            "long"
        ),
    )
