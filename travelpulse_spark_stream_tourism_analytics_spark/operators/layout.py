"""Space-filling-curve data layout (Z-order / Morton clustering).

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group min/max statistics prune scans, but they only work
for columns the data is physically clustered by. Sorting by one column
gives perfect pruning on it and none on the others; interleaving the
bits of several columns into a Morton (Z-order) code and sorting by
that gives GOOD pruning on every participating column at once — the
standard lakehouse layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``,
public literature: Morton 1966, the Delta Lake paper VLDB'20).

Everything here is built-in integer expressions (shifts and masks in
whole-stage codegen) — no UDFs, no shuffles beyond the final
``repartitionByRange`` that any clustered write needs anyway. The bit
arithmetic uses the classic power-of-two "spread" magic numbers, which
are plain 64-bit integer ops and therefore reproducible in ANSI SQL —
the catalog twin replays them verbatim in DuckDB (bit-exact parity).

Reference scope note: the reference engine has no layout optimizer —
this is part of the beyond-reference training-data-pipeline surface
(file-skipping is what makes repeated curation passes over a 100 TB
corpus affordable).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit value so its bits occupy every
# k-th position of a 64-bit lane, for k = 2 and k = 4 interleave
# widths. Masks are the standard Morton magic numbers.
_SPREAD_2 = [
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
_SPREAD_4 = [
    (24, 0x000000FF000000FF),
    (12, 0x000F000F000F000F),
    (6, 0x0303030303030303),
    (3, 0x1111111111111111),
]

BITS_PER_COL = 16


def _spread(col: Column, steps: list[tuple[int, int]], bits: int) -> Column:
    """Spread the low ``bits`` bits of ``col`` per the (shift, mask)
    steps."""
    x = col.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in steps:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(cols: Sequence[Column]) -> Column:
    """Interleave the low 16 bits of 2 (or up to 4) integer columns
    into one LONG Morton code. Column i contributes bit j of its value
    to bit ``j*k + (k-1-i)`` of the code (k = len(cols)), so the first
    column owns the most-significant bit of each group — ordering by
    the code recursively quarters (k=2) the 2-D key space.

    Callers normalize to 16-bit lanes first (mask an id, bucketize a
    price, day-number a date) — ``normalize_u16`` below covers the
    common cases. Pure integer expressions: stays in whole-stage
    codegen, and replays verbatim in the DuckDB SQL twin.
    """
    k = len(cols)
    if k == 2:
        steps, bits = _SPREAD_2, 16
    elif k in (3, 4):
        # 4-lane spread leaves every 4th bit position; 3 columns just
        # waste one lane (still a valid space-filling interleave).
        # 15 bits per lane, not 16: bit 15 of lane 0 would land on bit
        # 15*4+3 = 63 — the sign — and invert the sort order.
        steps, bits = _SPREAD_4, 15
    else:
        raise ValueError(f"morton_code: 2-4 columns, got {k}")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        z = z.bitwiseOR(
            F.shiftleft(_spread(c.cast("long"), steps, bits), k - 1 - i)
        )
    return z


def normalize_u16(col: Column, lo: float | int, hi: float | int) -> Column:
    """Linearly bucketize a numeric column from [lo, hi) onto the
    0..65535 lane a Morton dimension needs, clamping outliers. The
    mapping is a plan-constant affine transform — deterministic,
    SQL-twinnable, and monotone (order-preserving), which is all a
    space-filling curve needs."""
    span = float(hi) - float(lo)
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(65536.0)
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(65535))


def zorder_layout(
    df: DataFrame,
    dims: Sequence[Column],
    n_files: int,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` for write: Morton-code the given (pre-normalized
    16-bit) dimension columns, range-partition into ``n_files`` output
    files, and sort within each — so every parquet row group covers a
    tight hyper-rectangle of the dimension space and min/max stats
    prune scans on ANY of the dimensions.

    One shuffle (the range partitioner any clustered write pays) plus a
    partition-local sort; the Morton expression itself is map-side
    integer codegen. Write the result with a plain
    ``.write.parquet(...)`` — the layout, not the writer, is the
    operator."""
    return (
        df.withColumn(z_col, morton_code(dims))
        .repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
        .drop(z_col)
    )
