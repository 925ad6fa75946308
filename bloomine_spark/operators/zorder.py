"""Z-order (Morton) data layout: multi-dimensional clustering for
file/row-group skipping — the lakehouse layout op behind
``OPTIMIZE ... ZORDER BY`` (Delta) and Iceberg's sort-order rewrite.

Sorting a table by one column makes parquet min/max footer stats
selective for THAT column only; a 100 TB table queried by two or more
dimensions (user AND time, host AND score) needs the bits of all query
dimensions interleaved into one sort key so that every file covers a
small HYPERCUBE of the key space instead of a thin slab of one
dimension. Readers then skip files whose per-column min/max ranges miss
the predicate box — on ALL dimensions at once.

* ``z_value`` — pure-codegen Morton interleave of k non-negative
  integer columns at ``bits`` bits each (an integer expression fold:
  32 shift/mask terms for 2×16 bits; no UDF).
* ``zorder_layout`` — normalize each dimension to its global
  [min, max] → ``bits``-bit grid ranks (one tiny 1-row aggregate,
  broadcast), compute the z-value, ``repartitionByRange`` +
  ``sortWithinPartitions`` on it. The output is write-ready: each
  parquet file then holds one contiguous z-range = one hypercube.

Evidence protocol (BENCH/zorder_probe.py): write the same table
unsorted / single-column-sorted / z-ordered, then count the files whose
parquet footer min/max ranges intersect a 2-D predicate box — the
deterministic, reader-independent measure of skipping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "zorder_layout"]


def z_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (non-negative
    integers; caller normalizes). Column i contributes bit b to output
    bit ``b·k + i``. Total bits ``k·bits`` must fit a long (≤ 63)."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-order needs >= 2 columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return out


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 64,
) -> DataFrame:
    """Rewrite ``df`` into z-order: each dimension is affinely mapped to
    its global [min, max] onto a ``2^bits`` grid (the 1-row min/max
    relation broadcasts), dimensions interleave into ``__z``, and the
    result is range-partitioned + sorted by it into ``n_files``
    contiguous z-ranges. Write with ``.write.parquet`` — one file per
    partition, each covering one hypercube of the key space.

    NULLs map to grid cell 0 (they sort together, matching the
    null-first convention of min/max stats); constant dimensions map to
    cell 0 everywhere.
    """
    if not (1 <= bits <= 30):
        raise ValueError("bits must be in [1, 30]")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    joined = df.join(F.broadcast(stats))
    grid = F.lit((1 << bits) - 1)
    ranks = []
    for c in cols:
        x = F.col(c).cast("double")
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = hi - lo
        r = F.when(
            x.isNull() | (span <= 0.0), F.lit(0)
        ).otherwise(
            F.least(grid, F.floor((x - lo) / span * (1 << bits)).cast("long"))
        )
        ranks.append(r.alias(f"__g_{c}"))
    with_z = joined.select(*df.columns, *ranks).withColumn(
        "__z", z_value([f"__g_{c}" for c in cols], bits)
    )
    return (
        with_z.repartitionByRange(int(n_files), "__z")
        .sortWithinPartitions("__z")
        .drop(*[f"__g_{c}" for c in cols])
    )
