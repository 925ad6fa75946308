"""Count-Sketch (Charikar–Chen–Farach-Colton 2002) with the AMS second
moment (F2) estimator (Alon–Matias–Szegedy 1996).

d×w SIGNED counter matrix: element x routes to column ``h_r(x)`` in every
row r and adds ``s_r(x) ∈ {±1}``. Point estimate = median over rows of
``s_r(x)·C[r, h_r(x)]`` — UNBIASED (unlike count-min's one-sided
overestimate), error ≤ ε·√F2 w.p. 1−δ for w = O(1/ε²), d = O(ln 1/δ).
Each row's ``Σ_j C[r,j]²`` is the AMS estimator of F2 = Σ_x f_x² (the
repeated-token mass a dedup/curation pass monitors: F2/N² is the corpus
self-collision rate); the sketch's F2 estimate is the median over rows.
Merge = elementwise add → counter-exact associativity under any partition
grouping, and F2-of-merged == merged-F2 by construction.

Routing reuses the cms.py scheme (one splitmix64 base hash, per-row
multiply-shift with distinct odd constants — chosen there over
Kirsch–Mitzenmacher after measuring KM's correlated tails at power-of-two
widths); the sign is the TOP BIT of a second multiply with row-distinct
odd constants, so sign and column are computed by two multiplies per row
with no extra hashing pass. Signs from multiply-shift are not 4-wise
independent in the textbook sense; the variance consequences are gated
empirically (tests/test_countsketch.py bounds with measured slack), the
repo's standard practice for kernel hash families.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from bloomine_spark.functions.hashing import hash_u64, splitmix64

_MAGIC = b"CSK1"


def _odd_consts(lo: int, n: int) -> np.ndarray:
    return splitmix64(np.arange(lo, lo + n, dtype=np.uint64)) | np.uint64(1)


@dataclass
class CountSketch:
    d: int
    w: int
    counts: np.ndarray  # int64[d, w]
    n: int = 0          # total updates

    @classmethod
    def empty(cls, epsilon: float = 0.02, delta: float = 1e-2) -> "CountSketch":
        # point error ≤ ε√F2 needs w ≈ 3/ε²; round w UP to a power of two
        # (bound only tightens, routing becomes multiply-shift).
        w = 1 << math.ceil(math.log2(3.0 / (epsilon * epsilon)))
        d = math.ceil(math.log(1.0 / delta))
        d += (d % 2 == 0)  # odd row count → integer medians
        return cls(d, w, np.zeros((d, w), dtype=np.int64), 0)

    @classmethod
    def with_shape(cls, d: int, w: int) -> "CountSketch":
        if w & (w - 1):
            raise ValueError("w must be a power of two")
        return cls(d, w, np.zeros((d, w), dtype=np.int64), 0)

    @property
    def _shift(self) -> np.uint64:
        return np.uint64(64 - int(math.log2(self.w)))

    def _consts(self):
        c = getattr(self, "_cs", None)
        if c is None:
            # column constants match cms.py's range; sign constants live
            # in a disjoint splitmix index range → independent streams
            c = self._cs = (
                _odd_consts(1, self.d),
                _odd_consts(10_001, self.d),
            )
        return c

    _CHUNK = 1 << 15

    def _scratch(self):
        s = getattr(self, "_buf", None)
        if s is None:
            n = self._CHUNK
            s = self._buf = (
                np.empty(n, np.uint64),
                np.empty(n, np.uint64),
                np.empty(n, np.uint64),
            )
        return s

    def update_values(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        from bloomine_spark.functions.hashing import _SM_GAMMA

        v = np.asarray(values)
        col_c, sgn_c = self._consts()
        shift = self._shift
        seed_mix = np.uint64(int(_SM_GAMMA))  # seed=1, matches hash_u64
        for i in range(0, len(v), self._CHUNK):
            c = v[i : i + self._CHUNK]
            hb, tb, sb = (b[: len(c)] for b in self._scratch())
            np.copyto(hb, c, casting="unsafe")
            np.add(hb, seed_mix, out=hb)
            splitmix64(hb, inplace=True)
            for r in range(self.d):
                np.multiply(hb, col_c[r], out=tb)
                np.right_shift(tb, shift, out=tb)
                np.multiply(hb, sgn_c[r], out=sb)
                np.right_shift(sb, np.uint64(63), out=sb)
                # counters stay integer: one bincount per sign
                idx = tb.view(np.int64)
                neg = sb.view(np.int64).astype(bool)
                self.counts[r] += np.bincount(
                    idx[~neg], minlength=self.w
                )
                self.counts[r] -= np.bincount(
                    idx[neg], minlength=self.w
                )
        self.n += len(v)

    def _routes(self, values: np.ndarray):
        h = hash_u64(np.asarray(values), seed=1)
        col_c, sgn_c = self._consts()
        shift = self._shift
        idx = np.empty((self.d, len(h)), dtype=np.int64)
        sgn = np.empty((self.d, len(h)), dtype=np.int64)
        for r in range(self.d):
            idx[r] = ((h * col_c[r]) >> shift).astype(np.int64)
            sgn[r] = 1 - 2 * ((h * sgn_c[r]) >> np.uint64(63)).astype(np.int64)
        return idx, sgn

    def estimate_values(self, values: np.ndarray) -> np.ndarray:
        """Unbiased point estimates: median over rows of signed counters."""
        if len(values) == 0:
            return np.empty(0, dtype=np.int64)
        idx, sgn = self._routes(values)
        ests = np.take_along_axis(self.counts, idx, axis=1) * sgn
        return np.median(ests, axis=0).astype(np.int64)

    def estimate(self, value) -> int:
        return int(self.estimate_values(np.array([value]))[0])

    def f2_estimate(self) -> int:
        """AMS second moment: median over rows of Σ_j C[r,j]²."""
        per_row = np.einsum("ij,ij->i", self.counts, self.counts)
        return int(np.median(per_row))

    def merge(self, other: "CountSketch") -> "CountSketch":
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
    def from_bytes(cls, data: bytes) -> "CountSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a CountSketch blob")
        d, w, n = struct.unpack("<qqq", data[4:28])
        counts = np.frombuffer(data[28:], dtype=np.int64).reshape(d, w).copy()
        return cls(d, w, counts, n)
