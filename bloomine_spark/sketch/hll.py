"""HyperLogLog for distinct-cardinality estimation (e.g. distinct n-grams).

Standard Flajolet–Fuhr–Gandouet–Meunier 2007 construction: m=2^b registers,
register j keeps the max leading-zero rank of hashes routed to it; estimates
use the alpha_m bias constant with linear-counting small-range correction.
Relative error ≤ 1.04/√m. Merge = elementwise register max → exactly
associative and commutative (state-identical under any partition grouping).

This is the sketch the north rule adds on top of the reference's exact
``kmer_array.size()`` distinct count (/root/reference/src/BlooMineUtils.cpp:91);
Spark's built-in ``approx_count_distinct`` (HLL++) is kept as a sanity
baseline in tests, not used in the implementation.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from bloomine_spark.functions.hashing import hash_u64

_MAGIC = b"HLL1"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass
class HyperLogLog:
    b: int
    registers: np.ndarray  # uint8[2^b]
    hashed_input: bool = False  # True when update_values receives pre-hashed u64

    @classmethod
    def empty(cls, b: int = 12, hashed_input: bool = False) -> "HyperLogLog":
        if not (4 <= b <= 18):
            raise ValueError("b must be in [4,18]")
        return cls(b, np.zeros(1 << b, dtype=np.uint8), hashed_input)

    @property
    def m(self) -> int:
        return 1 << self.b

    # cache-blocking chunk: every update pass allocates several full-length
    # temporaries; at 2^16 values each stays ~512 KB — inside L2 — so the
    # kernel's ~10 array passes hit cache instead of streaming to DRAM.
    # (The round-1 scaling analysis showed the co-located workers saturate
    # the single VM's memory bus; this cuts per-token DRAM traffic.)
    _CHUNK = 1 << 16

    def update_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        h = h.astype(np.uint64, copy=False)
        for i in range(0, len(h), self._CHUNK):
            self._update_chunk(h[i : i + self._CHUNK])

    def _update_chunk(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.b)).astype(np.int64)
        rest = (h << np.uint64(self.b)) | (np.uint64(1) << np.uint64(self.b - 1))
        # rank = clz(rest)+1, via the float64 exponent (frexp): ~6x faster
        # than a branchy binary search. Clearing the low 11 bits prevents
        # round-to-nearest from crossing a power of two (float64 mantissa is
        # 53 bits); values < 2^11 are exactly representable, so fall back to
        # the raw value when the cleared form is zero.
        high = rest & ~np.uint64(0x7FF)
        xf = np.where(high == 0, rest, high).astype(np.float64)
        exponent = np.frexp(xf)[1]  # bit_length of rest
        rank = (65 - exponent).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def update_values(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values)
        if self.hashed_input:
            self.update_hashes(v.astype(np.uint64, copy=False))
            return
        # hash per cache-sized chunk too, so the hash temporaries and the
        # rank pipeline share the same resident working set
        for i in range(0, len(v), self._CHUNK):
            self._update_chunk(hash_u64(v[i : i + self._CHUNK]))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.b != other.b:
            raise ValueError("register count mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros > 0:
                return m * np.log(m / zeros)  # linear counting
        if raw > (1 << 32) / 30.0:
            return -(1 << 32) * np.log(1.0 - raw / (1 << 32))
        return float(raw)

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<bb", self.b, int(self.hashed_input))
            + self.registers.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        if data[:4] != _MAGIC:
            raise ValueError("not an HLL blob")
        b, hashed = struct.unpack("<bb", data[4:6])
        return cls(b, np.frombuffer(data[6:], dtype=np.uint8).copy(), bool(hashed))
