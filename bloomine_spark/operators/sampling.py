"""Deterministic stratified sampling — the eval/holdout-subset
primitive of a training-data pipeline: an EXACT per-group quota chosen
by md5 rank, so the sample is a pure function of content keys (stable
under corpus growth within a group only at the margin, fully stable
under repartitioning/engine, and auditable — the same property the
98/1/1 hash split relies on).

Plan shape at 100 TB: one hash shuffle on the group key and a rank
window per group; with a quota k the window can be replaced by a
per-partition partial top-k (the TakeOrdered pattern) — documented
here, plain window kept because group counts (sources) keep partitions
balanced after the hash exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample"]


def stratified_sample(
    docs: DataFrame,
    n_per_group: int,
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, selected by ascending
    md5(key) with the raw key as the deterministic tie-break; emits
    `sample_rank` (1-based within group)."""
    key = F.col(key_col).cast("string")
    w = Window.partitionBy(group_col).orderBy(F.md5(key), key)
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )
