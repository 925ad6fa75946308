"""t-digest quantile sketch (Dunning & Ertl, merging-digest variant).

Centroids sized by the k1 scale function — tight near q=0/1, loose in the
middle — giving accurate tail quantiles with bounded state. Merge =
concatenate centroids + one compression pass (deterministic given the
sorted centroid stream). Estimates under different partition groupings
agree within the digest's accuracy (property-tested tolerance), like KLL.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


class TDigest:
    def __init__(self, compression: float = 100.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_len = 0

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + sum(float(w.sum()) for w in self._buf_w)

    # k1 scale function: k(q) = δ/(2π)·asin(2q−1)
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * np.pi) * np.arcsin(2 * q - 1)

    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._buf_m.append(v)
        self._buf_w.append(np.ones(len(v), dtype=np.float64))
        self._buf_len += len(v)
        if self._buf_len >= 8 * self.compression:
            self._compress()

    def _compress(self) -> None:
        if self._buf_len == 0 and len(self.means) <= 2 * self.compression:
            return
        m = np.concatenate([self.means, *self._buf_m]) if self._buf_m else self.means
        w = (
            np.concatenate([self.weights, *self._buf_w])
            if self._buf_w
            else self.weights
        )
        self._buf_m, self._buf_w, self._buf_len = [], [], 0
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()

        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = m[0], w[0]
        q0 = 0.0
        k0 = float(self._k(np.array([q0]))[0])
        for i in range(1, len(m)):
            q_new = q0 + (cur_w + w[i]) / total
            if self._k(np.array([min(q_new, 1.0)]))[0] - k0 <= 1.0:
                # merge into current centroid
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                k0 = float(self._k(np.array([min(q0, 1.0)]))[0])
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        self._buf_m.append(other.means.copy())
        self._buf_w.append(other.weights.copy())
        self._buf_len += len(other.means)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        cum = np.cumsum(w) - w / 2.0
        target = q * w.sum()
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def to_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<dq", self.compression, len(self.means))
        return _MAGIC + head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        if data[:4] != _MAGIC:
            raise ValueError("not a t-digest blob")
        compression, n = struct.unpack("<dq", data[4:20])
        td = cls(compression)
        off = 20
        td.means = np.frombuffer(data[off : off + 8 * n], dtype=np.float64).copy()
        off += 8 * n
        td.weights = np.frombuffer(data[off : off + 8 * n], dtype=np.float64).copy()
        return td
