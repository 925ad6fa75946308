"""Dataset profiling and feature discretization — the "look before you
train" tier of a data pipeline: per-column statistics a curation run
records beside its outputs (null rates, cardinalities, ranges,
moments), and equal-frequency binning for feature columns.

Profiling is ONE aggregate over the table — every per-column statistic
rides the same groupBy-less pass (count/sum/min/max/approx or exact
distinct), then unpivots to the long (column, metric) shape reports
want. At 100 TB the plan is a single scan with partial aggregation;
nothing is per-column-scanned.

Binning follows the classic quantile discretization: cut points are
exact rank statistics (deterministic — ``percentile_approx`` would not
replay across engines), assignment is a broadcast range join
expressed as a ``CASE`` over the bin edges so the assignment pass is
pure codegen over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "equal_freq_bins", "assign_bins"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per (column, metric) with a DOUBLE
    value — ``n`` (non-null count), ``null_frac``, ``n_distinct``,
    and for numeric columns ``min`` / ``max`` / ``mean``. String/other
    columns profile count/nulls/cardinality only (their min/max rows
    are absent, keeping the value column uniformly numeric).

    One scan: all statistics are columns of a single aggregate row,
    unpivoted via ``stack``. ``exact_distinct=False`` swaps in
    ``approx_count_distinct`` (the HLL path) for web-scale tables
    where exact cardinality is itself a shuffle.
    """
    all_cols = list(df.columns)
    cols = columns or all_cols
    numeric_types = (
        "byte", "short", "integer", "long", "float", "double", "decimal"
    )
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in numeric_types
    }
    # positional rename BEFORE any reference: both F.col(name) and
    # df[name] PARSE attribute names, so a column containing an
    # unpaired backtick is unaddressable by name — toDF renames by
    # position without parsing (review finding)
    safe = df.toDF(*[f"_c{i}" for i in range(len(all_cols))])
    pos = {name: i for i, name in enumerate(all_cols)}
    total = F.count(F.lit(1))
    aggs = []
    labels: list[tuple[str, str]] = []  # positional (column, metric)

    def add(c: str, metric: str, expr) -> None:
        aggs.append(expr.alias(f"_m{len(labels)}"))
        labels.append((c, metric))

    for c in cols:
        ref = F.col(f"_c{pos[c]}")
        nn = F.count(ref)
        add(c, "n", nn.cast("double"))
        # ANSI guard (r6 ADVICE): an empty table profiles to NULL
        # fractions instead of DIVIDE_BY_ZERO
        add(
            c, "null_frac",
            F.when(total > 0, (total - nn) / total).cast("double"),
        )
        if not exact_distinct:
            # HLL partials fold into the same single-pass aggregate
            add(c, "n_distinct", F.approx_count_distinct(ref).cast("double"))
        if c in numeric:
            add(c, "min", F.min(ref).cast("double"))
            add(c, "max", F.max(ref).cast("double"))
            add(c, "mean", F.avg(ref).cast("double"))
    row = safe.agg(*aggs)
    triples = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(m).alias("metric"),
                F.col(f"_m{i}").alias("value"),
            )
            for i, (c, m) in enumerate(labels)
        ]
    )
    out = row.select(F.explode(triples).alias("t")).select(
        "t.column_name", "t.metric", "t.value"
    )
    if exact_distinct:
        # Exact cardinalities run as one pruned-scan aggregate PER column
        # instead of riding the shared aggregate: N exact countDistincts
        # in one agg make Spark Expand every input row N+1 ways (a ~17x
        # row multiplication on a 16-column table) — per-column aggs read
        # one parquet column each (same total bytes as the single scan),
        # expand nothing, and their subtrees run as independent stages.
        # Same (column, metric, value) rows; output order is unchanged
        # for consumers that sort (the driver canon does).
        for c in cols:
            ref = F.col(f"_c{pos[c]}")
            out = out.unionByName(
                safe.agg(F.countDistinct(ref).cast("double").alias("value"))
                .select(
                    F.lit(c).alias("column_name"),
                    F.lit("n_distinct").alias("metric"),
                    "value",
                )
            )
    return out


def equal_freq_bins(
    df: DataFrame, value_col: str, n_bins: int
) -> list[float]:
    """Exact equal-frequency cut points: the ``n_bins - 1`` interior
    boundaries are the values at ranks ``ceil(i * n / n_bins)``
    (1-indexed), i.e. the largest value of each bin prefix — exact
    rank statistics, not interpolated quantiles, so the edges are
    values that EXIST in the data and replay identically in any
    engine. One sort-free pass: a count + a window-free
    ``TakeOrderedAndProject``-able rank filter (the rank relation is
    (value, rank) — n rows, but only n_bins-1 survive the filter
    before collect).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v")
    )
    n = vals.count()
    if n == 0:
        return []
    targets = sorted(
        {
            -(-i * n // n_bins)  # ceil(i*n/n_bins), integer-exact
            for i in range(1, n_bins)
        }
    )
    # exact global rank WITHOUT a single-partition window: range-
    # partitioned sort + zipWithIndex (the 2-pass partition-offset
    # rank) — the one legitimate RDD drop-down, since a global
    # Window.orderBy collapses to one task at scale
    tset = {int(t) - 1 for t in targets}  # 0-indexed
    hit = (
        vals.sort("v")
        .rdd.zipWithIndex()
        .filter(lambda p: p[1] in tset)
        .map(lambda p: (p[1], p[0]["v"]))
        .collect()
    )
    return [float(v) for _, v in sorted(hit)]


def assign_bins(
    df: DataFrame, value_col: str, edges: list[float], out_col: str = "bin"
) -> DataFrame:
    """Assign each row its equal-frequency bin: bin i covers values
    ≤ edges[i] (last bin unbounded), NULLs get bin -1. The edges are a
    handful of literals, so the assignment compiles to one codegen
    CASE chain — zero exchange, broadcast-free."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(
            F.col(value_col) <= F.lit(float(edges[i])), F.lit(i)
        ).otherwise(expr)
    return df.withColumn(
        out_col,
        F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(expr),
    )
