"""Count–min sketch for token frequency estimation.

Cormode–Muthukrishnan 2005: d×w counter matrix, element routed through d
seeded hash rows, point estimate = min over rows. Never underestimates;
overestimate ≤ εN with probability ≥ 1−δ for w=⌈e/ε⌉, d=⌈ln(1/δ)⌉.
Merge = elementwise add → counter-exact associativity under any partition
grouping.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from bloomine_spark.functions.hashing import hash_u64

_MAGIC = b"CMS1"


@dataclass
class CountMinSketch:
    d: int
    w: int
    counts: np.ndarray  # int64[d, w]
    n: int = 0          # total updates (for the εN bound)

    @classmethod
    def empty(cls, epsilon: float = 1e-3, delta: float = 1e-3) -> "CountMinSketch":
        w = math.ceil(math.e / epsilon)
        d = math.ceil(math.log(1.0 / delta))
        return cls(d, w, np.zeros((d, w), dtype=np.int64), 0)

    @classmethod
    def with_shape(cls, d: int, w: int) -> "CountMinSketch":
        return cls(d, w, np.zeros((d, w), dtype=np.int64), 0)

    def _base_hashes(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(h1, h2) per value for Kirsch–Mitzenmacher row derivation:
        row r probes column (h1 + r·h2) mod w — two hash computations
        instead of d, the same construction as the Bloom filter
        (KM 2006: preserves the CMS guarantee asymptotically)."""
        from bloomine_spark.functions.hashing import _SM_M1, splitmix64

        h1 = hash_u64(np.asarray(values), seed=1)
        h2 = splitmix64(h1 ^ _SM_M1) | np.uint64(1)
        return h1, h2

    def _row_idx(self, values: np.ndarray, r: int) -> np.ndarray:
        h1, h2 = self._base_hashes(values)
        return self._km_idx(h1, h2, r)

    def _km_idx(self, h1: np.ndarray, h2: np.ndarray, r: int) -> np.ndarray:
        return ((h1 + np.uint64(r) * h2) % np.uint64(self.w)).astype(np.int64)

    # cache-blocking chunk (see hll.py): hash temporaries for 2^16 values
    # stay L2-resident, so the d hash passes don't stream DRAM per row
    _CHUNK = 1 << 16

    def update_values(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values)
        for i in range(0, len(v), self._CHUNK):
            c = v[i : i + self._CHUNK]
            h1, h2 = self._base_hashes(c)  # hashed once, reused by all rows
            for r in range(self.d):
                # one row at a time: bincount beats unbuffered np.add.at
                # ~10x, and never materializing the (d × n) index matrix
                # keeps transient allocations small
                self.counts[r] += np.bincount(
                    self._km_idx(h1, h2, r), minlength=self.w
                )
        self.n += len(v)

    def estimate_values(self, values: np.ndarray) -> np.ndarray:
        """Vectorized point queries → int64 estimates (min over rows)."""
        if len(values) == 0:
            return np.empty(0, dtype=np.int64)
        h1, h2 = self._base_hashes(np.asarray(values))
        est = self.counts[0][self._km_idx(h1, h2, 0)]
        for r in range(1, self.d):
            est = np.minimum(est, self.counts[r][self._km_idx(h1, h2, r)])
        return est

    def estimate(self, value) -> int:
        return int(self.estimate_values(np.array([value]))[0])

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("shape mismatch")
        self.counts += other.counts
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<qqq", self.d, self.w, self.n)
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a CMS blob")
        d, w, n = struct.unpack("<qqq", data[4:28])
        counts = np.frombuffer(data[28:], dtype=np.int64).reshape(d, w).copy()
        return cls(d, w, counts, n)
