"""KLL quantile sketch (Karnin–Lang–Liberty 2016).

Compactor-hierarchy sketch for rank/quantile queries with additive rank
error ≤ ε·n w.h.p. at k ≈ (1/ε)·√log(1/δ). Level h items carry weight 2^h;
compaction sorts a full level and promotes every other item (random parity)
to the level above.

Merge concatenates levels then re-compacts. Merged *estimates* are
grouping-dependent only through the compaction coin; the error bound holds
for any grouping (property-tested), while Bloom/CMS/HLL give state-exact
associativity.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


class KLL:
    def __init__(self, k: int = 200, seed: int = 7):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed)
        self._buf: list[np.ndarray] = []  # level-0 staging
        self._buf_len = 0

    # -- capacity ----------------------------------------------------------
    def _cap(self, h: int) -> int:
        # top level gets k, lower levels decay by c^depth, floor 2
        depth = len(self.levels) - 1 - h
        return max(int(np.ceil(self.k * (_C ** depth))), 2)

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    # -- update ------------------------------------------------------------
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._buf.append(v)
        self._buf_len += len(v)
        self.n += len(v)
        if self._buf_len >= self._cap(0):
            self._drain_buf()
            self._compress()

    def _drain_buf(self) -> None:
        if self._buf:
            self.levels[0] = np.concatenate([self.levels[0], *self._buf])
            self._buf = []
            self._buf_len = 0

    def _compress(self) -> None:
        while True:
            total = sum(len(lv) for lv in self.levels)
            if total <= self._total_cap():
                return
            # compact the lowest level over its capacity
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    self._compact_level(h)
                    break
            else:
                return

    def _compact_level(self, h: int) -> None:
        lv = np.sort(self.levels[h])
        odd = len(lv) % 2
        if odd:
            # keep one straggler at this level
            keep, lv = lv[-1:], lv[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        offset = int(self._rng.integers(0, 2))
        promoted = lv[offset::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- merge -------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("k mismatch")
        self._drain_buf()
        other._drain_buf()
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()
        return self

    # -- queries -----------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        self._drain_buf()
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> int:
        """Estimated number of items ≤ x."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return 0
        return int(w[v <= x].sum())

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target))
        return float(v[min(i, len(v) - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        v, w = self._weighted_items()
        if len(v) == 0:
            return [float("nan")] * len(qs)
        cw = np.cumsum(w)
        out = []
        for q in qs:
            i = int(np.searchsorted(cw, q * cw[-1]))
            out.append(float(v[min(i, len(v) - 1)]))
        return out

    # -- serde -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._drain_buf()
        head = struct.pack("<qqq", self.k, self.n, len(self.levels))
        body = b""
        for lv in self.levels:
            body += struct.pack("<q", len(lv)) + lv.tobytes()
        return _MAGIC + head + body

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        if data[:4] != _MAGIC:
            raise ValueError("not a KLL blob")
        k, n, nlev = struct.unpack("<qqq", data[4:28])
        sk = cls(k=int(k))
        sk.n = int(n)
        sk.levels = []
        off = 28
        for _ in range(nlev):
            (ln,) = struct.unpack("<q", data[off : off + 8])
            off += 8
            sk.levels.append(
                np.frombuffer(data[off : off + 8 * ln], dtype=np.float64).copy()
            )
            off += 8 * ln
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        return sk
