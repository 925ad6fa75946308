"""Temperature-weighted source mixing — the sampling step between a
curated corpus and epoch assembly in an LLM pretraining pipeline
(sources drawn with probability proportional to ``tokens^alpha``, the
GPT-3 / LLaMA mixture rule: alpha < 1 upweights small high-quality
sources and downweights the web crawl).

Everything is deterministic and pure Catalyst, so a 100 TB mixture job
is reproducible bit-for-bit and the DuckDB oracle hash-checks the exact
realized copy counts. Cross-engine float identity is engineered, not
hoped for:

* every corpus-scale sum is INTEGER (token counts) — no float
  accumulation order to disagree on;
* the per-source weight arithmetic is scalar doubles with a pinned
  evaluation order: ``sqrt`` (IEEE-mandated correctly rounded — the
  reason ``alpha=0.5`` is the hash-checked default) and an ORDERED
  cumulative sum for the weight normalization (a plain ``SUM(double)``
  re-associates differently per engine/partitioning; a running sum in
  ``ORDER BY source`` order is one fixed sequence of additions);
* the per-doc fractional-epoch decision compares an integer 32-bit md5
  bucket against ``floor(frac * 2^32)`` computed from those identical
  doubles — an exact integer comparison, immune to ulp drift.

Plan shape at scale: the mixture plan is a per-source aggregate (a few
hundred rows from a partial-agg scan), realization is a broadcast join
plus a map-side hash compare, and upsampling is a map-side
``explode(sequence(...))`` — no extra shuffle anywhere; the only sort
in the end-to-end epoch assembly is the packing window itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "temperature_mixture_plan",
    "realize_mixture",
    "explode_epochs",
    "unimax_plan",
]

_TWO32 = 4294967296.0


def _bucket32(key_col):
    """First 8 md5 hex chars of the stringified key as a BIGINT in
    [0, 2^32) — the same engine-portable bucket as packing.hash_split."""
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def temperature_mixture_plan(
    docs: DataFrame,
    alpha: float = 0.5,
    token_budget: int | None = None,
    budget_ratio: tuple[int, int] = (3, 2),
    group_col: str = "source",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """Build the per-source sampling plan: weight ∝ tok^alpha, token
    quota = budget * weight / Σweights, epochs = quota / tok.

    ``token_budget=None`` derives the budget relationally as
    ``total_tokens * budget_ratio`` in integer arithmetic (default 3/2:
    upsample the corpus by half) — no driver-side collect.

    Returns one row per source:
      tok        exact token count (long)
      weight     tok^alpha (double; sqrt when alpha == 0.5)
      quota      token quota (double)
      epochs     quota / tok (double)
      n_full     floor(epochs) — guaranteed whole copies per doc
      frac_thr   floor(frac(epochs) * 2^32) — the md5-bucket threshold
                 for the probabilistic extra copy
    """
    per_src = docs.groupBy(group_col).agg(
        F.sum(F.col(ntok_col).cast("long")).alias("tok")
    )
    if alpha == 0.5:
        weight = F.sqrt(F.col("tok").cast("double"))
    elif alpha == 1.0:
        weight = F.col("tok").cast("double")
    else:  # pow is not IEEE correctly-rounded: fine for jobs, not oracles
        weight = F.pow(F.col("tok").cast("double"), F.lit(float(alpha)))
    per_src = per_src.withColumn("weight", weight)

    # Pinned-order normalization: running sum over ORDER BY source, then
    # the (order-insensitive, exact) MAX picks the final total. The
    # tiny single-partition window is over the per-source table (
    # hundreds of rows), not the corpus.
    w_cum = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per_src = (
        per_src.withColumn("_wcum", F.sum("weight").over(w_cum))
        .withColumn("_wtot", F.max("_wcum").over(w_all))
        .withColumn("_toktot", F.sum("tok").over(w_all))
    )
    if token_budget is not None:
        budget = F.lit(int(token_budget)).cast("long")
    else:
        num, den = budget_ratio
        # true integer division (DIV), not a double round-trip
        budget = F.expr(f"_toktot * {int(num)} DIV {int(den)}").cast("long")
    per_src = (
        per_src.withColumn(
            "quota",
            budget.cast("double") * F.col("weight") / F.col("_wtot"),
        )
        .withColumn("epochs", F.col("quota") / F.col("tok").cast("double"))
        .withColumn("n_full", F.floor("epochs").cast("long"))
        .withColumn(
            "frac_thr",
            F.floor(
                (F.col("epochs") - F.col("n_full").cast("double")) * _TWO32
            ).cast("long"),
        )
    )
    return per_src.select(
        group_col, "tok", "weight", "quota", "epochs", "n_full", "frac_thr"
    )


def realize_mixture(
    docs: DataFrame,
    plan: DataFrame,
    key_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Assign each doc its exact copy count under the plan:
    ``n_copies = n_full + (md5_bucket32(key) < frac_thr)``.

    A doc's copy count is a pure function of (its key, the plan row), so
    it is stable across runs and partitionings; docs with n_copies == 0
    are dropped (a source sampled below one epoch keeps the
    deterministic ``frac_thr/2^32`` fraction of its docs). Broadcast
    join — the plan is per-source."""
    sel = F.broadcast(
        plan.select(group_col, "n_full", "frac_thr")
    )
    return (
        docs.join(sel, group_col)
        .withColumn(
            "n_copies",
            (
                F.col("n_full")
                + (_bucket32(key_col) < F.col("frac_thr")).cast("long")
            ),
        )
        .drop("n_full", "frac_thr")
        .filter(F.col("n_copies") > 0)
    )


def explode_epochs(realized: DataFrame) -> DataFrame:
    """One row per (doc, epoch) copy: map-side
    ``explode(sequence(0, n_copies-1))`` — feeds straight into
    ``packing.pack_context_windows`` with order key (epoch, doc_id)."""
    return realized.withColumn(
        "epoch",
        F.explode(F.sequence(F.lit(0), (F.col("n_copies") - 1).cast("int"))),
    ).drop("n_copies")


def unimax_plan(
    docs: DataFrame,
    max_epochs: int = 4,
    token_budget: int | None = None,
    budget_ratio: tuple[int, int] = (1, 2),
    group_col: str = "source",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """UniMax sampling (Chung et al. 2023): allocate a token budget
    across sources as UNIFORMLY as possible, subject to no source
    repeating more than ``max_epochs`` times — the fairness-first
    alternative to temperature mixing (which still lets the head
    language dwarf the tail). The optimum is a waterfill: sources whose
    capacity ``cap = max_epochs·tok`` sits below the water level are
    taken whole; every other source gets the identical level
    ``(B − Σ capped) / (n − k)``.

    The waterfill is closed-form relational algebra, no iteration: sort
    sources by capacity ascending and a source is capped iff
    ``cap·(remaining sources) + (capacity prefix before it) < B`` — an
    ALL-INTEGER cross-multiplication (long token counts; with S sources
    the product stays < 2^63 for corpora to ~10^15 tokens), so the
    capped set is engine-exact and the only floats are the final two
    divisions. ``token_budget=None`` derives B as
    ``total_tokens · budget_ratio`` in integer arithmetic (default 1/2:
    train on half the corpus's token mass).

    Returns one row per source: tok, capacity, capped, allocated
    (tokens, double), epochs (allocated/tok). Σ allocated == B whenever
    Σ capacity ≥ B; otherwise every source is capped (budget
    unreachable) and Σ allocated == Σ capacity.

    Plan shape at 100 TB: one partial-agg scan to per-source token
    counts, then windows over the tiny per-source relation — identical
    cost to ``temperature_mixture_plan``.
    """
    per_src = docs.groupBy(group_col).agg(
        F.sum(F.col(ntok_col).cast("long")).alias("tok")
    ).withColumn(
        "capacity", (F.lit(int(max_epochs)).cast("long") * F.col("tok"))
    )
    w_ord = Window.orderBy("capacity", group_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per_src = (
        per_src.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_pre", F.sum("capacity").over(w_cum))
        .withColumn("_n", F.count("*").over(w_all))
        .withColumn("_toktot", F.sum("tok").over(w_all))
    )
    if token_budget is not None:
        budget = F.lit(int(token_budget)).cast("long")
    else:
        num, den = budget_ratio
        budget = F.expr(f"_toktot * {int(num)} DIV {int(den)}").cast("long")
    per_src = per_src.withColumn("_b", budget).withColumn(
        "capped",
        F.col("capacity") * (F.col("_n") - F.col("_rn") + 1)
        + (F.col("_pre") - F.col("capacity"))
        < F.col("_b"),
    )
    per_src = (
        per_src.withColumn(
            "_k", F.sum(F.col("capped").cast("long")).over(w_all)
        )
        .withColumn(
            "_capsum",
            F.sum(
                F.when(F.col("capped"), F.col("capacity")).otherwise(F.lit(0))
            ).over(w_all),
        )
        .withColumn(
            "allocated",
            F.when(F.col("capped"), F.col("capacity").cast("double"))
            .otherwise(
                (F.col("_b") - F.col("_capsum")).cast("double")
                / (F.col("_n") - F.col("_k")).cast("double")
            ),
        )
        .withColumn(
            "epochs", F.col("allocated") / F.col("tok").cast("double")
        )
    )
    return per_src.select(
        group_col, "tok", "capacity", "capped", "allocated", "epochs"
    )
