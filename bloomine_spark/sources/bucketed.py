"""Bucketed-table co-located joins — zero-exchange hydration at 100 TB.

The screening pipeline's widest join is read hydration: the (huge) corpus
joined back to per-read results on (source, doc_id) — the reference does
this implicitly by re-reading each sample's FASTQ per stage
(/root/reference/bloomine/run.py:26-61). A plain equi-join shuffles BOTH
sides on the key; at 100 TB the corpus-side exchange dominates the job.

Spark's bucketing removes that exchange structurally: both tables are
written pre-hash-partitioned into the same number of buckets on the same
keys (and sorted within buckets), so a sort-merge join reads matching
buckets side by side — **no Exchange, no Sort, on either side, for every
future join** against the same keys. The shuffle is paid once at write
time and amortized over every downstream stage (hydration, cascade
re-joins, per-probe extraction), which is exactly the access pattern of a
grid run.

Usage shape::

    write_bucketed(corpus, "seqs_b", keys=["source", "doc_id"], buckets=512)
    write_bucketed(hits,   "hits_b", keys=["source", "doc_id"], buckets=512)
    joined = bucketed_join(spark, "seqs_b", "hits_b",
                           keys=["source", "doc_id"])
    # plan: SortMergeJoin over two bucketed FileScans, zero Exchange

Bucket-count sizing at scale: buckets ≈ corpus_bytes / 256 MB, rounded to
a power of two; every table that will co-join must use the SAME count
(Spark requires equal bucket counts to elide the exchange on both sides).

Bucketed tables live in the session's warehouse (`saveAsTable` — bucketing
metadata needs the catalog; plain `.parquet(path)` writes cannot record
it). The plan-audit test pins the zero-exchange property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table.

    Sorting within buckets on the join keys lets the downstream
    sort-merge join skip its Sort as well as its Exchange.
    """
    (
        df.write.mode(mode)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket specs this plans as a sort-merge join directly
    over the bucketed file scans — zero Exchange. The join itself is a
    plain DataFrame join; this helper only documents/asserts the contract
    that both tables were bucketed on ``keys``.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=keys, how=how)
