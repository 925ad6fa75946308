"""Temporal/event-sequence operators: as-of join, windowed funnel,
retention cohorts.

These are the event-analytics primitives Spark's DataFrame API lacks as
built-ins (pandas has ``merge_asof``; ClickHouse has ``windowFunnel``),
re-expressed as pure Catalyst plans:

* ``asof_join`` — the union+window formulation: both sides are unioned
  and hash-partitioned by key ONCE, a single ordered window carries the
  most recent right-side payload forward, and left rows read it with
  ``last(..., ignorenulls)``. No join node exists in the plan at all, so
  there is no per-key cross product and no range-explode — the shuffle
  volume is exactly |left| + |right| rows regardless of key skew in
  match counts, which is what survives a 100 TB event log. (The naive
  formulation — equi-join on key + ``ts <= ts`` filter + argmax window —
  materializes |matches-per-key|² intermediates on hot keys.)
* ``window_funnel`` — k ordered stages resolved in k-1 bounded passes:
  each pass is one filtered scan + one narrow key join + one min-agg, so
  the plan size is O(steps), never O(events). The greedy
  earliest-completion semantics (each stage takes the earliest candidate
  after the previous stage, all within ``window_us`` of stage 1) are
  deterministic and SQL-expressible, which is what the DuckDB oracle
  replays.
* ``retention_cohorts`` — first-touch weekly cohorts as pure integer
  week-index arithmetic (no engine-specific ``date_trunc`` week-start
  conventions ride the result).

Reference behavior parity: the reference engine has no event-time ops
(it is a sequence screener); these extend the engine for the
training-data/analytics tier the brief asks for beyond the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "window_funnel", "retention_cohorts"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks the LATEST right row of
    the same key with ``right_ts <= left_ts`` (inclusive — pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics), left-outer (a left
    row with no prior right row keeps nulls).

    Right payload columns ride a single struct; a right column whose
    name collides with a left column (including the key/ts columns)
    comes back with ``suffix`` appended. ``tolerance_us`` additionally
    nulls matches older than the tolerance (microseconds), matching
    pandas' ``tolerance``.

    The right side should be unique per (key, ts); among exact
    duplicates the carried row is the union sort order's last, which is
    engine-stable only if the caller dedupes first.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload_cols = [c for c in right.columns if c not in keys]
    if not payload_cols:
        raise ValueError("right side has no payload columns besides the keys")

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__payload"),
    )
    payload_type = r.schema["__payload"].dataType
    l = left.select(  # noqa: E741
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    # right sorts BEFORE left at equal __ts (side 0 < 1) -> inclusive match
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__m", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance_us is not None:
        ok = (
            F.expr(
                f"timestampdiff(MICROSECOND, __m.`{right_ts}`, `{left_ts}`)"
            )
            <= F.lit(int(tolerance_us))
        )
        matched = matched.withColumn(
            "__m", F.when(ok, F.col("__m")).otherwise(F.lit(None).cast(payload_type))
        )
    out_cols = [F.col(c) for c in left.columns]
    taken = set(left.columns)
    for c in payload_cols:
        name = c + suffix if c in taken else c
        out_cols.append(F.col("__m").getField(c).alias(name))
    return matched.select(*out_cols)


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_us: int = 48 * 3600 * 1_000_000,
) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: per key, how far through the
    ordered ``steps`` sequence the key progressed, where stage 1 anchors
    at the key's EARLIEST step-1 event and each later stage takes the
    earliest matching event STRICTLY after the previous stage, no later
    than ``window_us`` after stage 1 (greedy earliest-completion — the
    deterministic, relationally-expressible funnel).

    Output: one row per key that reached stage 1, with ``t1..tk``
    timestamps (null once a stage is missed; later stages stay null) and
    ``n_steps``. Plan: k-1 passes of (filtered scan -> min-agg -> narrow
    key join); nothing in the plan grows with per-key event counts
    except the scans themselves.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, st in enumerate(steps[1:], start=2):
        cand = events.filter(F.col(type_col) == st).select(
            F.col(key), F.col(ts_col).alias("__cts")
        )
        step_i = (
            cur.join(cand, key)
            .filter(
                (F.col("__cts") > F.col(f"t{i - 1}"))
                & (
                    F.expr("timestampdiff(MICROSECOND, t1, __cts)")
                    <= F.lit(int(window_us))
                )
            )
            .groupBy(key)
            .agg(F.min("__cts").alias(f"t{i}"))
        )
        cur = cur.join(step_i, key, "left")
    n = F.lit(1)
    for i in range(2, len(steps) + 1):
        n = n + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return cur.withColumn("n_steps", n.cast("int"))


def retention_cohorts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
) -> DataFrame:
    """First-touch weekly retention matrix: a key's cohort is the week
    (7-day bucket counted from ``epoch``) of its first event; every
    (key, active week) pair then lands in ``(cohort_week, week_offset)``
    with distinct-key and event counts.

    Week indices are integer ``floor(datediff / 7)`` — no
    ``date_trunc('week')`` start-of-week convention rides the output, so
    the relation is engine-portable by construction. Plan: one key-agg
    for first touch, one narrow key join back, one pair-agg.
    """
    first = events.groupBy(key).agg(F.min(ts_col).alias("__first_ts"))
    ep = F.lit(epoch).cast("date")
    joined = events.select(F.col(key), F.col(ts_col)).join(first, key)
    week = lambda c: F.floor(F.datediff(F.to_date(c), ep) / 7)  # noqa: E731
    return (
        joined.withColumn("cohort_week", week("__first_ts").cast("int"))
        .withColumn(
            "week_offset",
            (week(ts_col) - week("__first_ts")).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct(key).alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )
