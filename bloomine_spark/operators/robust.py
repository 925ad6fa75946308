"""Robust per-group statistics: median/MAD outlier flagging and
winsorization — the distribution-hygiene pass a training-data pipeline
runs over per-document metrics (token counts, quality scores, loss
values) before thresholding on them, because means and standard
deviations are themselves corrupted by the outliers they are meant to
find.

* ``mad_outliers`` — the modified z-score (Iglewicz & Hoaglin 1993):
  ``Mᵢ = 0.6745·(xᵢ − median)/MAD``, flag ``|Mᵢ| > threshold``
  (canonical 3.5). Median and MAD are EXACT per group (Spark's
  ``median`` — the interpolated percentile both engines share), not
  sketch approximations: the flag is a per-row keep/drop decision, so
  it must be reproducible bit-for-bit across engines and runs.
* ``winsorize`` — clip to exact per-group percentiles (default
  p01/p99); the standard tail-taming transform before any
  mean/variance-based downstream stat.

Plan shape at 100 TB: one hash exchange on the group key; medians/
percentiles and the clip bounds are window aggregates over it, the
row-level score is pure codegen after. Group cardinality (sources) is
small relative to rows, so the exchange is the same one any per-source
aggregate pays. For a SINGLE global group at extreme scale swap the
exact percentile for the KLL/t-digest sketches in
``bloomine_spark.sketch`` (documented trade: the flag stops being
exactly reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mad_outliers", "winsorize"]

# the standard-normal consistency constant: median(|X - med|) = MAD
# estimates sigma·Φ⁻¹(3/4); 0.6745 ≈ Φ⁻¹(3/4) makes M a z-score analog
MZ_CONST = 0.6745


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-row modified z-scores within each group:
    ``(group, id, value, med, mad, mz, is_outlier)``.

    ``mz`` is NULL (and ``is_outlier`` false) when the group's MAD is 0
    — a degenerate group where over half the values equal the median
    carries no robust scale, and flagging everything off the median
    would be wrong. Values are cast to double before the quantiles so
    integer metrics interpolate identically across engines.
    """
    x = F.col(value_col).cast("double")
    with_med = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        x.alias("value"),
    ).withColumn("med", F.median("value").over(Window.partitionBy("group")))
    scored = with_med.withColumn(
        "mad",
        F.median(F.abs(F.col("value") - F.col("med"))).over(
            Window.partitionBy("group")
        ),
    ).withColumn(
        "mz",
        # raw double, NOT engine-rounded: the IEEE sequence
        # 0.6745*(x-med)/mad is bit-identical across engines, while each
        # engine's round() disagrees at exact .5-ulp boundaries
        F.when(
            F.col("mad") != 0.0,
            F.lit(MZ_CONST) * (F.col("value") - F.col("med")) / F.col("mad"),
        ),
    )
    return scored.withColumn(
        "is_outlier",
        F.coalesce(F.abs(F.col("mz")) > F.lit(float(threshold)), F.lit(False)),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Adds ``p_lo``/``p_hi`` (the exact per-group percentiles, shared
    linear interpolation) and ``<value_col>_w`` — the value clipped into
    [p_lo, p_hi]. Input rows and columns pass through unchanged."""
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    g = Window.partitionBy(group_col)
    x = F.col(value_col).cast("double")
    return (
        df.withColumn("p_lo", F.percentile(x, F.lit(float(lower))).over(g))
        .withColumn("p_hi", F.percentile(x, F.lit(float(upper))).over(g))
        .withColumn(
            f"{value_col}_w",
            F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), x)),
        )
    )
