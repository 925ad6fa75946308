"""Time-series window analytics over event logs: time-range rolling
aggregates, finite-horizon EWMA smoothing, and SCD2 interval
construction (the temporal-table primitive).

* ``rolling_stats`` — per-key aggregates over a trailing TIME window
  (``RANGE BETWEEN interval PRECEDING AND CURRENT ROW``), not a row
  window: event streams are irregular, so "last 7 days" and "last N
  rows" are different semantics and the time one is what monitoring
  and feature pipelines mean. Sums run as exact decimals — a double
  sum's value depends on addition order (Spark's running frame vs an
  engine's segment tree), so cross-engine/runs-stable rollups must be
  decimal.
* ``ewma`` — exponential smoothing with a finite ``horizon`` (only the
  last H events contribute): the infinite-history recurrence is a
  sequential scan, but the (1−α)^k tail below machine epsilon is pure
  noise, so the truncated form Σ α(1−α)^j·x_{t−j} / Σ α(1−α)^j over a
  bounded lag window is both relational (``lag`` columns, no UDF) and
  numerically equal to the recurrence once H ≳ 40 for typical α. The
  normalizing denominator makes the head of each series exact too.
* ``scd2_intervals`` — change-event log → type-2 slowly-changing
  dimension: ``(key, value, valid_from, valid_to, is_current)`` with
  ``valid_to`` = next change's timestamp (NULL while current). One
  window per key; consecutive equal values collapse first
  (gaps-and-islands) so intervals are maximal.

Plan shape at 100 TB: everything here is one hash exchange on the key
plus ordered windows within the partition — the same envelope as any
sessionization; nothing joins, nothing is quadratic in events-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_stats", "ewma", "scd2_intervals"]


def rolling_stats(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 7 * 86400,
) -> DataFrame:
    """Adds trailing-time-window aggregates per key: ``roll_n`` (event
    count), ``roll_sum`` (exact decimal, emitted as double after one
    terminal round), ``roll_min``/``roll_max`` over the
    ``[ts − window_s, ts]`` range, inclusive both ends.

    The range key is integer MICROSECONDS (``unix_micros``) — exact, no
    sub-second truncation, and a RANGE frame over it is value-defined
    (peers always whole), so the result is independent of row order
    within equal timestamps on every engine."""
    # timestampdiff from the NTZ epoch instead of unix_micros: works for
    # TIMESTAMP and TIMESTAMP_NTZ inputs alike (unix_micros rejects NTZ),
    # and any fixed zone offset cancels inside a RANGE frame anyway
    base = events.withColumn(
        "__sec",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            f" CAST(`{ts_col}` AS TIMESTAMP_NTZ))"
        ),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__sec")
        .rangeBetween(-int(window_s) * 1_000_000, 0)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    return (
        base.withColumn("roll_n", F.count("*").over(w))
        .withColumn(
            "roll_sum",
            F.round(F.sum(dec).over(w), 4).cast("double"),
        )
        .withColumn("roll_min", F.min(F.col(value_col)).over(w))
        .withColumn("roll_max", F.max(F.col(value_col)).over(w))
        .drop("__sec")
    )


def ewma(
    events: DataFrame,
    alpha: float,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
    horizon: int = 40,
) -> DataFrame:
    """Adds ``ewma``: Σ_{j=0..H−1} α(1−α)^j·x_{t−j} normalized by the
    weights actually present (so the first events of a series are exact
    smoothed means, not biased toward an implicit zero history).

    The per-row value is a FIXED left-to-right sum of ``horizon``
    terms — identical FP sequence on any engine and any partitioning,
    unlike a running-frame double sum. Ordering must be unique per key:
    pass ``order_tiebreak`` (e.g. an event id) when timestamps can tie,
    otherwise the lag assignment is nondeterministic.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    x = F.col(value_col).cast("double")
    num = F.lit(0.0)
    den = F.lit(0.0)
    # left-to-right: j = horizon-1 .. 0 so the freshest term adds LAST
    # with the largest weight (stable tail-first accumulation)
    for j in range(horizon - 1, -1, -1):
        term = F.lag(x, j).over(w)
        wgt = alpha * (1.0 - alpha) ** j
        num = num + F.coalesce(term * F.lit(wgt), F.lit(0.0))
        den = den + F.when(term.isNotNull(), F.lit(wgt)).otherwise(0.0)
    return events.withColumn("ewma", num / den)


def scd2_intervals(
    updates: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Change-event log → maximal SCD2 validity intervals:
    ``(key, value, valid_from, valid_to, is_current)``.

    Consecutive equal values collapse (an "update" that doesn't change
    the value extends the interval, it doesn't split it); ``valid_to``
    is the next DIFFERENT value's timestamp, NULL on the current row.
    Duplicate (key, ts) rows are invalid input for a change log and are
    resolved arbitrarily — dedupe upstream. Plan: one hash exchange on
    the key, two ordered windows (change detection, then the island
    fold), one aggregate."""
    w = Window.partitionBy("key").orderBy("ts")
    changed = (
        updates.select(
            F.col(key).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        .withColumn("__prev", F.lag("value").over(w))
        .withColumn(
            "__chg",
            (
                F.col("__prev").isNull()
                | ~F.col("value").eqNullSafe(F.col("__prev"))
            ).cast("int"),
        )
        .withColumn(
            "__isl",
            F.sum("__chg").over(
                Window.partitionBy("key")
                .orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    islands = changed.groupBy("key", "__isl").agg(
        F.first("value").alias("value"),
        F.min("ts").alias("valid_from"),
    )
    w2 = Window.partitionBy("key").orderBy("valid_from")
    return (
        islands.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            F.col("key").alias(key),
            "value",
            "valid_from",
            "valid_to",
            "is_current",
        )
    )


def scd2_apply_changes(
    current: DataFrame,
    changes: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    validate: bool = True,
) -> DataFrame:
    """Incremental SCD2 maintenance — apply a new change batch to an
    existing type-2 table WITHOUT recomputing history (the lakehouse
    MERGE pattern for temporal tables): closed intervals are immutable
    and pass through untouched; only the CURRENT row of each affected
    key re-enters the window machinery, stitched with the batch's
    events through :func:`scd2_intervals` (a batch value equal to the
    open row's value extends the interval rather than splitting it —
    the same consecutive-equal collapse as the batch operator).

    Invariant (pytest-pinned): ``apply(intervals(log₁), log₂) ==
    intervals(log₁ ∪ log₂)`` whenever every key's log₂ events are
    strictly after its open interval's start. ``validate=True`` fails
    fast on batch events at or before an affected key's
    ``valid_from`` (late/conflicting data needs a history rebuild, not
    a silent mis-stitch). New keys flow through the stitch with no
    current row.

    Scale shape: the change batch is small by assumption; affected
    keys' open rows arrive via one semi-join, the stitch windows run
    over (batch + one row per affected key), and the untouched table —
    the 100 TB side — is a pure pass-through union with zero shuffle.
    """
    cur = current.select(
        F.col(key).alias("key"), "value", "valid_from", "valid_to",
        "is_current",
    )
    chg = changes.select(
        F.col(key).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    # the change batch — and therefore its key set and the affected
    # open rows — is small by this operator's documented contract, so
    # the semi/anti probes of the (100 TB-scale) current table carry
    # explicit broadcast hints: with runtime-size-only auto-broadcast
    # (session posture, r7) the planner would otherwise stage these as
    # shuffle joins of the big side first
    affected = F.broadcast(chg.select("key").distinct())
    open_rows = cur.filter(F.col("is_current")).join(
        affected, "key", "left_semi"
    )
    if validate:
        n_late = (
            chg.join(
                F.broadcast(open_rows.select("key", "valid_from")), "key"
            )
            .filter(F.col("ts") <= F.col("valid_from"))
            .count()
        )
        if n_late:
            raise ValueError(
                f"{n_late} change event(s) at or before an affected "
                "key's open valid_from — late/conflicting data requires "
                "a history rebuild (scd2_intervals over the full log)"
            )
    untouched = cur.filter(~F.col("is_current")).unionByName(
        cur.filter(F.col("is_current")).join(affected, "key", "left_anti")
    )  # affected carries the broadcast hint above
    stitched = scd2_intervals(
        open_rows.select(
            "key", F.col("valid_from").alias("ts"), "value"
        ).unionByName(chg),
        key="key",
        ts_col="ts",
        value_col="value",
    ).select("key", "value", "valid_from", "valid_to", "is_current")
    return untouched.unionByName(stitched).select(
        F.col("key").alias(key), "value", "valid_from", "valid_to",
        "is_current",
    )
