"""Multi-dimensional file layout: Z-order clustering for data skipping
(the Iceberg ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(a, b)')`` analog, expressed as plain DataFrame ops).

Why: parquet/Iceberg scan pruning works off per-file (and per-row-group)
min/max stats. A layout sorted on one column prunes perfectly on that
column and not at all on any other — every file spans the full range of
the second dimension. Interleaving the bits of several columns' ranks
into one Z-value and range-partitioning on it gives every file a small
bounding box in ALL clustered dimensions, so selective filters on any
of them skip most files.

All JVM expressions: per-column rank via ``percent_rank`` (one window
over the sort — at production scale swap in approx quantile boundaries
computed once and a broadcast lookup to avoid the global window; the
interleave itself is pure bit math either way), bit interleave via an
unrolled shift/or expression, then ``repartitionByRange`` on the
Z-value + ``sortWithinPartitions`` so row groups inside each file
cluster too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# bits per dimension; 16 bits × 2-4 dims stays comfortably in a long
_BITS = 16


def _rank_bits(c: str, bits: int = _BITS) -> Column:
    """Column rank quantized to [0, 2^bits): equal-frequency buckets so
    skew in the raw values cannot collapse the Z-curve."""
    pr = F.percent_rank().over(Window.orderBy(F.col(c)))
    return F.least(
        (pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def z_value(cols: list[str], bits: int = _BITS) -> Column:
    """Bit-interleaved Z-address of the rows' per-column ranks (column
    i contributes bit b to output position b*len(cols)+i)."""
    ranks = [_rank_bits(c, bits) for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return out


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Write df Z-order-clustered on ``cols``: range-partition by the
    Z-value (n_files contiguous curve segments = n_files files whose
    min/max boxes are small in every clustered dimension), sorted
    within partitions for row-group-level stats."""
    (
        df.withColumn("_z", z_value(cols))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
