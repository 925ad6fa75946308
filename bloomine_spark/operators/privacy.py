"""Privacy / compliance operators: k-anonymity auditing (with
l-diversity) and generalization-ladder anonymization — the release
gate a corpus or feature table passes before leaving a data enclave
(Sweeney 2002, "k-anonymity: a model for protecting privacy";
Machanavajjhala 2007, "l-diversity"). The PII *scrubbing* stage lives
in ``operators.textops.scrub_pii``; these operate on the structured
side: quasi-identifier columns whose combination can re-identify a
person even after direct identifiers are gone.

Everything here is pure DataFrame algebra — equivalence classes are
groupBy keys, diversity is a countDistinct, and the generalization
ladder is a chain of group-size windows over shrinking remainders —
so Catalyst sees ordinary aggregates and the plans scale like any
other grouped query (the widest shuffle carries one row per input
row with only the quasi columns + id).

Determinism contract: given the same input and ladder, the output is
a pure function of the data (no RNG, no floats beyond the caller's
own expressions), so DuckDB oracles replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "generalize_to_k"]


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int | None = None,  # noqa: E741 - the literature's own name
) -> DataFrame:
    """One row per equivalence class (distinct quasi-identifier
    combination): ``class_size``, ``k_violation`` (size < k), and —
    when ``sensitive_col`` is given — ``n_sensitive`` (distinct
    sensitive values in the class) plus ``l_violation`` (n_sensitive <
    l): a k-anonymous class can still leak if everyone in it shares
    the same sensitive value. NULL quasi values form their own class
    (SQL grouping semantics — documented, matching the oracle).

    One shuffle: the groupBy on the quasi columns; distinct-count of
    the sensitive column rides the same aggregate.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "k_violation", F.col("class_size") < F.lit(int(k))
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "l_violation", F.col("n_sensitive") < F.lit(int(l))
        )
    return out


def generalize_to_k(
    df: DataFrame,
    id_col: str,
    levels: list[dict[str, Column]],
    k: int,
) -> DataFrame:
    """Local-recoding generalization: publish each row at the FINEST
    ladder level whose equivalence class (computed over the rows still
    unpublished at that level) reaches size k; rows that fail every
    level are suppressed (``gen_level`` -1, quasi columns NULL).

    ``levels`` is the generalization ladder, finest first — each entry
    maps the SAME output column names to progressively coarser
    expressions (classic ladders: full ZIP → ZIP3 → ZIP1 → NULL, age →
    5-year band → decade). Level sizes are computed over the remainder,
    not the full table: a row only competes with rows that also failed
    the finer levels, which is what lets coarse levels absorb the tail
    (the standard local-recoding semantics; global recoding would
    generalize everyone to the coarsest conforming level).

    Plan shape: per level one count-window over the remainder keyed by
    that level's expressions — L levels = L narrow shuffles of
    (id, quasi) rows, with the remainder shrinking each step. The
    output carries (id, gen_level, *quasi) and every published class
    has >= k rows at its own level by construction (pinned in tests).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not levels:
        raise ValueError("levels must be non-empty")
    names = list(levels[0].keys())
    for lv in levels[1:]:
        if list(lv.keys()) != names:
            raise ValueError("every level must map the same output columns")
    reserved = {f"_q_{c}" for c in names} | {"_csize"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with reserved helper "
            "names (_q_<name>/_csize); rename them before generalizing"
        )
    remainder = df
    published = []
    for li, lv in enumerate(levels):
        staged = remainder.select(
            "*", *[expr.alias(f"_q_{c}") for c, expr in lv.items()]
        )
        qcols = [f"_q_{c}" for c in names]
        sized = staged.withColumn(
            "_csize", F.count("*").over(Window.partitionBy(*qcols))
        )
        ok = sized.filter(F.col("_csize") >= F.lit(int(k)))
        published.append(
            ok.select(
                F.col(id_col),
                F.lit(li).alias("gen_level"),
                # quasi outputs are uniformly strings so every level —
                # and the all-NULL suppressed rows — union cleanly
                *[F.col(f"_q_{c}").cast("string").alias(c) for c in names],
            )
        )
        remainder = sized.filter(F.col("_csize") < F.lit(int(k))).drop(
            "_csize", *qcols
        )
    suppressed = remainder.select(
        F.col(id_col),
        F.lit(-1).alias("gen_level"),
        *[F.lit(None).cast("string").alias(c) for c in names],
    )
    out = published[0]
    for p in published[1:]:
        out = out.unionByName(p)
    return out.unionByName(suppressed)
