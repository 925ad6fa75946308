"""Mergeable sketch kernels: Bloom, HLL, count-min, KLL, t-digest.

Each sketch is a plain-numpy value object with
``update_hashes/update_values(batch) → None``, ``merge(other) → None``,
``estimate/...``, and ``to_bytes()/from_bytes()`` for shuttling partial
states through Spark as binary columns. Distributed aggregation lives in
``bloomine_spark.sketch.core.sketch_agg``.
"""

from bloomine_spark.sketch.bloom import BloomFilter  # noqa: F401
from bloomine_spark.sketch.cms import CountMinSketch  # noqa: F401
from bloomine_spark.sketch.hll import HyperLogLog  # noqa: F401
from bloomine_spark.sketch.kll import KLL  # noqa: F401
from bloomine_spark.sketch.tdigest import TDigest  # noqa: F401
