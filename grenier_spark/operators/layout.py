"""Z-order (Morton) data layout clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
footers carry per-file min/max column statistics, and engines (Spark,
Trino, DuckDB, Iceberg/Delta data skipping) prune files whose ranges miss
the predicate. Range stats are only selective if the LAYOUT clusters the
data — sorting by one column makes its stats tight and every other
column's useless. Z-ordering interleaves the bits of k columns so files
are tight on ALL of them at once: bit i of column j lands at position
``i*k + j`` of the z-value, sorting by which walks the k-dimensional
Morton curve.

Everything here is exact integer arithmetic in unrolled JVM column
expressions (shift/and/or — whole-stage codegen, no UDF, no shuffle for
the key itself), with a textual SQL twin (:func:`zorder_sql`) so the
chain is oracle-checkable bit for bit. ``zorder_layout`` then
``repartitionByRange`` on the key — one range shuffle, Spark's range
sampler picks balanced boundaries — and sorts within partitions, which is
exactly the write pattern that makes every output file a small
hyperrectangle of the key space.

Columns are masked to ``bits`` low bits first (both engines), so negative
or oversized values wrap identically instead of corrupting the
interleave. For value domains wider than 2^bits, pre-bucket (e.g.
``F.floor(col / width)``) — layout needs locality, not full precision.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_sql", "zorder_layout"]


def zorder_key(cols: Sequence[str], bits: int = 16) -> Column:
    """The Morton interleave of ``cols`` (masked to ``bits`` low bits
    each) as one BIGINT column; ``len(cols) * bits`` must fit in 63."""
    cols = list(cols)
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """DuckDB/ANSI twin of :func:`zorder_key` over SQL expressions —
    the identical unrolled shift/mask chain, BIGINT throughout."""
    exprs = list(exprs)
    k = len(exprs)
    mask = (1 << bits) - 1
    terms = []
    for j, e in enumerate(exprs):
        v = f"(({e})::BIGINT & {mask})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * k + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(df: DataFrame, cols: Sequence[str], n_files: int,
                  bits: int = 16) -> DataFrame:
    """Cluster ``df`` for writing: range-partition into ``n_files``
    z-contiguous slices and sort within each — every output file covers a
    contiguous Morton range, so its per-column min/max stats are tight on
    ALL layout columns. Write the result with ``.write.parquet(...)``."""
    z = zorder_key(cols, bits)
    return (df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
