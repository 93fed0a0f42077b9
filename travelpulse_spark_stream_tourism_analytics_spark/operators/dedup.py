"""Deduplication operators for large-scale text pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup, all as pure
DataFrame transforms built on codegen'd expressions (no Python UDFs).

Portability/determinism: hashes are md5 hex strings (or hex-digit
arithmetic on them), identical in every engine, so each stage is
DuckDB-oracle-checkable. xxhash64/murmur would be faster but
engine-specific; at 100 TB the md5 cost is still dominated by the
shuffle, and swapping the hash is a one-liner.

Scale design:
- shingling explodes rows map-side only; the single shuffle is the
  groupBy(doc_id) that folds k min-hashes in one pass;
- LSH banding turns the quadratic all-pairs problem into an equi-join
  on (band_idx, band_hash) — each bucket is tiny, so the join output
  stays near-linear; skewed buckets are split by AQE;
- the exact-Jaccard verify stage only runs on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    word_ngrams,
    words_of,
)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle set of a text column."""
    return F.array_distinct(word_ngrams(words_of(text), n))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one shuffle on a 16-byte key."""
    return df.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count("*").alias("n_copies"),
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs; docs shorter than n words drop out.

    Repartitions on the id first: document corpora often arrive in a
    few large files, and without this the explode + k-hash compute runs
    on as many tasks as there are input splits."""
    return df.repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str, k: int = 12
) -> DataFrame:
    """k-permutation MinHash via seeded md5: sig_i = min(md5('i:'||s)).

    One groupBy computes all k minima in a single shuffle pass
    (map-side partial min per hash function).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_bands(sigs: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """Fold the signature into `bands` bucket keys of `rows` hashes each."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col),
        F.explode(F.array(*band_structs)).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    The bands relation is persisted before the self-join — otherwise
    the whole shingle->minhash lineage executes twice (measured ~2x
    wall-clock at sf0.1). At cluster scale you would materialize
    signatures to parquet between stages for the same reason."""
    bands_df = bands_df.persist()
    a = bands_df.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = bands_df.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def pair_jaccard(
    pairs: DataFrame, shingled: DataFrame, id_col: str
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verify stage).

    Joins each side's shingle set; |A∩B| from the matched rows,
    |A∪B| = |A|+|B|-|A∩B|. Runs only on LSH candidates, so the join
    fan-out is bounded by bucket sizes, not the corpus.
    """
    shingled = shingled.persist()  # read 3x below (sizes, side a, side b)
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    sa = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over distinct word unigrams.

    Bit j of a word = parity of hex digit j of md5(word); document bit
    j is set when more than half the words have it set. Pure
    conv/substring arithmetic — portable and codegen'd.
    """
    w = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(F.array_distinct(words_of(F.col(text_col)))).alias("w")
    )
    h = F.md5("w")
    bit_sums = [
        F.sum(F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int") % 2).alias(
            f"s{j}"
        )
        for j in range(16)
    ]
    agg = w.groupBy(id_col).agg(F.count("*").alias("n_words"), *bit_sums)
    simhash = None
    for j in range(16):
        bit = F.when(F.col(f"s{j}") * 2 > F.col("n_words"), F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        simhash = bit if simhash is None else simhash + bit
    return agg.select(F.col(id_col), simhash.cast("long").alias("simhash"))


def simhash16_expr(distinct_words: Column) -> Column:
    """16-bit SimHash as a pure array expression over a distinct-word
    array column — the single-pass form for wide profile projections:
    no explode, no groupBy, no join-back, so SimHash rides along a
    single scan with the other per-document features. Identical bit
    semantics to :func:`simhash16` (parity of hex digit j of
    md5(word), majority vote); an empty word set hashes to 0.
    """
    md5s = F.transform(distinct_words, lambda w: F.md5(w))
    n = F.size(distinct_words)

    def parity(j: int):
        # closure factory: a 2-arg lambda (h, j=j) would be treated by
        # F.filter as an (element, index) lambda and clobber j
        return lambda h: (
            F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int") % 2 == 1
        )

    sim: Column = F.lit(0)
    for j in range(16):
        s_j = F.size(F.filter(md5s, parity(j)))
        sim = sim + F.when(s_j * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    return sim.cast("long")


def simhash_neardup_pairs(sims: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Buckets on the high byte (pigeonhole: ≤3 differing bits of 16
    usually leaves one byte intact — a recall/scale trade documented
    here; the exact variant would join on both byte halves).
    """
    hi = (F.col("simhash") / F.lit(256)).cast("long").alias("bucket")
    a = sims.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), hi)
    b = sims.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), hi)
    hamming = F.bit_count(
        F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
