"""Mergeable sketch kernels: Bloom, HLL, count-min, KLL, t-digest.

Each sketch is a plain-numpy value object with
``update_hashes/update_values(batch) → None``, ``merge(other) → None``,
``estimate/...``, and ``to_bytes()/from_bytes()`` for shuttling partial
states through Spark as binary columns. Distributed aggregation lives in
``bloomine_spark.sketch.core.sketch_agg``.
"""

from bloomine_spark.sketch.bloom import BloomFilter  # noqa: F401
