"""Bloom-filter semi-join: prefilter the big side of a join with a Bloom
built from the small side's keys — the reference's FP-prescreen idea (F1,
/root/reference/src/BlooMineUtils.cpp:337-346) lifted from "pattern in
read" to "key in build side".

Why it matters at 100 TB: a plain semi/inner join shuffles the ENTIRE big
side on the join key. With a Bloom prefilter the big side is cut to
(matches + FP·non-matches) BEFORE the exchange, so shuffle volume tracks
the match rate instead of the table size. Spark's own runtime-filter
pushdown (spark.sql.optimizer.runtime.bloomFilter.enabled) covers the
equi-join case adaptively; this operator makes the strategy explicit,
mergeable (the filter builds as a distributed UDAF, partials OR-merged),
reusable across multiple joins of the same key set, and correct by
construction — Bloom FPs are removed by the exact join that follows, so
results are EXACTLY the semi-join (oracle-checkable).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomine_spark.sketch.bloom import BloomFilter, reference_sizing
from bloomine_spark.sketch.core import sketch_agg_global


class _BloomOverHashes(BloomFilter):
    """BloomFilter with the sketch value-object update contract
    (update_values over already-hashed uint64 keys)."""

    def update_values(self, values: np.ndarray) -> None:
        self.update_hashes(np.asarray(values, dtype=np.uint64))


def build_key_bloom(
    small: DataFrame, key_col: str, fp: float = 1e-4, n_expected: int | None = None
) -> BloomFilter:
    """Distributed Bloom build over the small side's keys (mergeable UDAF:
    per-partition partials, OR-merge fan-in). ``n_expected`` sizes the
    filter; default = exact distinct count of the build side (one cheap
    aggregation of the SMALL side only)."""
    if n_expected is None:
        n_expected = small.select(key_col).distinct().count()
    keyed = small.select(F.xxhash64(F.col(key_col)).alias("_kh"))
    m, k = reference_sizing(max(n_expected, 1), fp)

    def factory():
        return _BloomOverHashes.empty(m, k)

    return sketch_agg_global(keyed, "_kh", factory)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    fp: float = 1e-4,
) -> DataFrame:
    """EXACT ``big SEMI JOIN small ON key`` with a Bloom prefilter.

    Plan: (1) build the key Bloom from the small side (distributed,
    mergeable), (2) broadcast its bytes and drop big-side rows whose key
    misses the filter — this happens BEFORE any exchange, inside the scan
    stage, (3) exact semi-join on the survivors removes Bloom FPs. The
    result equals the plain semi-join row-for-row.
    """
    # one evaluation of the distinct keys serves both EAGER consumers
    # (sizing count, Bloom build scan); both complete inside this call, so
    # the cache is released before returning — long-lived sessions calling
    # this repeatedly (e.g. the curate pipeline) must not accumulate
    # persisted frames
    keys = small.select(key_col).distinct().persist()
    try:
        bloom = build_key_bloom(keys, key_col, fp=fp, n_expected=keys.count())
    finally:
        keys.unpersist()
    bc = big.sparkSession.sparkContext.broadcast(bloom.to_bytes())

    # build and probe must share one hash family: both sides key on
    # F.xxhash64 (JVM-side), and the Bloom is probed over that hash column
    hashed_big = big.withColumn("_kh", F.xxhash64(F.col(key_col)))

    import pyarrow as pa

    out_schema = hashed_big.schema

    def probe(batches) -> Iterator["pa.RecordBatch"]:
        bf = BloomFilter.from_bytes(bc.value)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            kh = rb.column(rb.schema.get_field_index("_kh")).to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)
            hit = bf.contains_hashes(kh)
            if not hit.any():
                continue
            yield rb.take(pa.array(np.flatnonzero(hit)))

    survivors = hashed_big.mapInArrow(probe, schema=out_schema).drop("_kh")
    # exact phase: FPs die here; broadcast hint is Catalyst's call if small.
    # A semi-join ignores build-side duplicates, so the raw projection is
    # used (not the now-unpersisted `keys`) — one fresh small-side scan at
    # materialization instead of a leaked cache entry.
    return survivors.join(small.select(key_col), on=key_col, how="left_semi")
