"""Z-order data layout — multi-column locality for min/max pruning.

A table range-partitioned and sorted on ONE column prunes scans filtered
on that column only; filters on a second column read everything. Z-order
(Morton) interleaving maps k columns into one sort key whose contiguous
ranges are small k-dimensional rectangles — every file's min/max stats
then bound EVERY participating column, and a filter on any of them skips
most files. This is what Delta OPTIMIZE ZORDER BY does transactionally;
plain parquet gets the same layout from repartitionByRange + sort on the
z-value below.

The z-value is pure integer bit arithmetic (shift/and/or), identical in
Spark and DuckDB — the layout query is oracle-checkable bit-for-bit.
Production note: real z-ordering first rank-normalizes each column into
[0, 2^bits) (range-partition percentiles give the ranks); the helpers
here interleave the caller-provided already-bounded ints and leave
normalization to the caller, keeping the expression deterministic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each (already bounded,
    non-negative) integer column: bit b of column i lands at position
    b * len(cols) + i. Inputs must fit in ``bits`` bits — reduce them
    first (mod / rank-normalize), or high bits are silently dropped."""
    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            src = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, b * n + i))
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_value_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB twin of ``zorder_value`` — same bit placement."""
    n = len(exprs)
    terms = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            terms.append(f"(((CAST({e} AS BIGINT) >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, zcol: Column,
                   num_files: int = 16, mode: str = "overwrite") -> None:
    """Lay the table out in z-order: range-partition on the z-value (each
    output file owns a contiguous z-range = a small rectangle in the
    original columns), sort within partitions so row groups inherit the
    locality too, write parquet. Readers filtering on ANY interleaved
    column then prune on footer min/max stats."""
    (df.withColumn("_z", zcol)
       .repartitionByRange(num_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode(mode).parquet(path))
