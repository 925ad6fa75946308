"""Misra–Gries heavy-hitters summary (mergeable).

Classic frequent-items sketch: ≤ m−1 counters; any item with true count
> n/m is guaranteed present, and every estimate satisfies
``true − n/m ≤ est ≤ true``. Merging follows Agarwal et al., "Mergeable
Summaries" (PODS 2012 / TODS 2013): sum counters by item, then if more than
m−1 remain subtract the m-th largest count from all and drop non-positive —
the combined error stays ≤ (n1+n2)/m under ANY merge tree, which is what
makes it a valid distributed UDAF.

Batch update treats the batch's exact counts as an error-free summary and
merges it in — fully vectorized (np.unique + one sort), no per-item loop.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGS1"


class MisraGries:
    def __init__(self, m: int = 64):
        if m < 2:
            raise ValueError("m must be >= 2")
        self.m = m
        self.items = np.empty(0, dtype=np.int64)   # sorted by item
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0

    def _combine(self, items: np.ndarray, counts: np.ndarray) -> None:
        if len(self.items):
            items = np.concatenate([self.items, items])
            counts = np.concatenate([self.counts, counts])
        order = np.argsort(items, kind="stable")
        items, counts = items[order], counts[order]
        # sum duplicate items (segment sum over sorted keys)
        first = np.ones(len(items), dtype=bool)
        first[1:] = items[1:] != items[:-1]
        seg = np.flatnonzero(first)
        summed = np.add.reduceat(counts, seg)
        uniq = items[seg]
        if len(uniq) > self.m - 1:
            # subtract the m-th largest count, drop non-positive
            kth = np.partition(summed, len(summed) - self.m)[len(summed) - self.m]
            summed = summed - kth
            keep = summed > 0
            uniq, summed = uniq[keep], summed[keep]
        self.items, self.counts = uniq, summed

    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.int64)
        if len(v) == 0:
            return
        u, c = np.unique(v, return_counts=True)
        self._combine(u, c)
        self.n += len(v)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.m != other.m:
            raise ValueError("capacity mismatch")
        self._combine(other.items.copy(), other.counts.copy())
        self.n += other.n
        return self

    def estimate(self, item: int) -> int:
        i = np.searchsorted(self.items, item)
        if i < len(self.items) and self.items[i] == item:
            return int(self.counts[i])
        return 0

    def estimate_values(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values, dtype=np.int64)
        if len(self.items) == 0:
            return np.zeros(len(v), dtype=np.int64)
        i = np.searchsorted(self.items, v)
        i = np.minimum(i, len(self.items) - 1)
        hit = self.items[i] == v
        return np.where(hit, self.counts[i], 0)

    def top_k(self, k: int) -> list[tuple[int, int]]:
        """(item, est_count) of the k largest counters, count desc / item asc."""
        if len(self.items) == 0:
            return []
        order = np.lexsort((self.items, -self.counts))[:k]
        return [(int(self.items[i]), int(self.counts[i])) for i in order]

    def to_bytes(self) -> bytes:
        head = struct.pack("<qqq", self.m, self.n, len(self.items))
        return _MAGIC + head + self.items.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        if data[:4] != _MAGIC:
            raise ValueError("not a MisraGries blob")
        m, n, sz = struct.unpack("<qqq", data[4:28])
        sk = cls(int(m))
        sk.n = int(n)
        off = 28
        sk.items = np.frombuffer(data[off : off + 8 * sz], dtype=np.int64).copy()
        off += 8 * sz
        sk.counts = np.frombuffer(data[off : off + 8 * sz], dtype=np.int64).copy()
        return sk
