"""Z-order layout: Morton-code math and file-skipping effectiveness."""

import glob
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.operators.layout import (
    morton_code,
    normalize_u16,
    zorder_layout,
)


def _py_morton(vals, k, bits):
    """Bit-at-a-time reference interleave (no magic numbers). The
    engine uses a stride-4 spread for 3 columns (one wasted lane), so
    the stride is 4 whenever k >= 3."""
    stride = 2 if k == 2 else 4
    z = 0
    for j in range(bits):
        for i, v in enumerate(vals):
            if (v >> j) & 1:
                z |= 1 << (j * stride + (k - 1 - i))
    return z


@pytest.mark.parametrize("k,bits", [(2, 16), (3, 15), (4, 15)])
def test_morton_matches_bitwise_reference(spark, k, bits):
    rng = random.Random(7)
    rows = [
        tuple(rng.randrange(1 << bits) for _ in range(k)) for _ in range(500)
    ]
    # corners: zeros, all-ones, single high bit per lane
    rows += [tuple(0 for _ in range(k)), tuple((1 << bits) - 1 for _ in range(k))]
    for i in range(k):
        rows.append(tuple((1 << (bits - 1)) if j == i else 0 for j in range(k)))
    df = spark.createDataFrame(
        rows, ", ".join(f"c{i} long" for i in range(k))
    )
    got = {
        tuple(r[f"c{i}"] for i in range(k)): r["z"]
        for r in df.withColumn(
            "z", morton_code([F.col(f"c{i}") for i in range(k)])
        ).collect()
    }
    for vals, z in got.items():
        assert z == _py_morton(vals, k, bits), vals
        assert z >= 0  # sign bit never set => LONG order == curve order


def test_morton_locality_beats_single_column_sort(spark):
    """The defining property: ordering by the Morton code bounds BOTH
    dimensions within any contiguous chunk, while a single-column sort
    leaves the other dimension unconstrained."""
    rng = random.Random(11)
    rows = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    z_sorted = (
        df.withColumn("z", morton_code([F.col("a"), F.col("b")]))
        .orderBy("z")
        .collect()
    )
    a_sorted = df.orderBy("a").collect()
    chunk = 256

    def mean_worst_span(ordered):
        """Mean over chunks of the WIDER dimension's span. Equal-count
        chunks cover equal curve measure either way — the Z win is the
        SHAPE: squarish boxes instead of full-axis slivers, which is
        what a 2-D box predicate prunes against."""
        spans = []
        for i in range(0, len(ordered), chunk):
            part = ordered[i : i + chunk]
            aspan = max(r["a"] for r in part) - min(r["a"] for r in part) + 1
            bspan = max(r["b"] for r in part) - min(r["b"] for r in part) + 1
            spans.append(max(aspan, bspan))
        return sum(spans) / len(spans)

    # a-sorted chunks span ~the entire b axis; Z chunks bound both
    # dimensions to (at most a few) 16384-wide quadrant cells.
    assert mean_worst_span(a_sorted) > 0.9 * 65536
    assert mean_worst_span(z_sorted) < 0.55 * 65536


def test_normalize_u16_clamps_and_is_monotone(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.999,), (50.0,), (99.9,), (100.0,), (250.0,)],
        "x double",
    )
    vals = [
        r["u"]
        for r in df.select(
            normalize_u16(F.col("x"), 0, 100).alias("u")
        ).collect()
    ]
    assert vals[0] == 0 and vals[1] == 0  # clamped low
    assert vals[-1] == 65535 and vals[-2] == 65535  # clamped high
    assert vals == sorted(vals)  # monotone
    assert vals[2] == 32767 and vals[3] == 32768  # affine midpoint


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """File-skipping proof: for a 2-D box predicate, the fraction of
    parquet files whose min/max [a,b] ranges overlap the box must be
    much lower under the Z layout than under an unordered write. This
    is exactly the statistic Spark's parquet reader (and any lakehouse
    table format) prunes by."""
    rng = random.Random(3)
    rows = [(rng.randrange(65536), rng.randrange(65536), i) for i in range(40000)]
    df = spark.createDataFrame(rows, "a long, b long, payload long")

    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain_dir)
    zorder_layout(df, [F.col("a"), F.col("b")], n_files=16).write.parquet(z_dir)

    def overlap_fraction(d):
        lo, hi = 10000, 14000  # a 6%-of-axis box in both dims
        files = sorted(glob.glob(f"{d}/part-*.parquet"))
        assert len(files) >= 8
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                cols = {
                    md.row_group(g).column(c).path_in_schema: md.row_group(
                        g
                    ).column(c).statistics
                    for c in range(md.row_group(g).num_columns)
                }
                sa, sb = cols["a"], cols["b"]
                if sa.min <= hi and sa.max >= lo and sb.min <= hi and sb.max >= lo:
                    hit += 1
                    break
        return hit / len(files)

    plain_frac, z_frac = overlap_fraction(plain_dir), overlap_fraction(z_dir)
    assert plain_frac == 1.0  # random layout: every file overlaps
    assert z_frac <= 0.5  # Z layout: most files skipped (measured ~0.1-0.2)

    # and the data survives the layout unchanged
    back = spark.read.parquet(z_dir)
    assert back.count() == 40000
    assert back.agg(F.sum("payload")).collect()[0][0] == sum(
        r[2] for r in rows
    )
