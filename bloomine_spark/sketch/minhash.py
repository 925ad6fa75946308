"""MinHash signature sketch: mergeable set-similarity fingerprints.

k-permutation minwise hashing (Broder's classic construction, the same
public scheme behind datasketch/Spark MinHashLSH): permutation ``j`` is
simulated by xor-ing a per-slot seed into the element hash and re-mixing
with splitmix64; the sketch keeps the MINIMUM per slot over the set.

Why it belongs in the north-rule UDAF family:

* **Mergeable** — elementwise ``min`` is associative/commutative/idempotent,
  so partition-local sketches tree-merge EXACTLY (not just within error
  bounds: any partitioning yields the bit-identical signature).
* **Similarity algebra** — for sets A, B: P[min_j(A) == min_j(B)] =
  J(A, B), so the matching-slot fraction estimates Jaccard with stderr
  ``sqrt(J(1-J)/num_perm)``. Containment and union-size follow.
* **Distinct count for free** — each slot's minimum is the min of n iid
  uniforms on [0, 2^64); the MLE over k independent minima gives
  ``n̂ = k / Σ_j (min_j / 2^64) − 1`` (the classic minimum-value /
  KMV-style estimator), relative error ≈ 1/√k.

Value-object contract of sketch/core.py: update_values / merge / to_bytes /
from_bytes, so ``sketch_agg_global`` / ``sketch_agg`` distribute it
unchanged (grouped Arrow partials → tree-merge, O(num_perm) state per
group at any data volume).

Relation to operators/dedup.py: that module computes per-DOCUMENT
signatures for LSH banding (a different axis — row-wise, not aggregated);
this sketch AGGREGATES a column into one signature per group so whole
sources/partitions/datasets can be compared in O(num_perm).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from bloomine_spark.functions.hashing import hash_u64, splitmix64

_MAGIC = b"MNH1"
_U64_SPAN = float(2**64)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _seed_mix(num_perm: int) -> np.ndarray:
    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))


@dataclass
class MinHashSketch:
    num_perm: int
    sig: np.ndarray  # uint64[num_perm]; empty set = all 0xFF..FF

    @classmethod
    def empty(cls, num_perm: int = 128) -> "MinHashSketch":
        return cls(num_perm=num_perm,
                   sig=np.full(num_perm, _U64_MAX, dtype=np.uint64))

    # cache-blocking chunk (see hll.py/theta.py): per chunk the hashed
    # values stay L2-resident across the num_perm re-mix passes instead of
    # streaming the whole batch num_perm times
    _CHUNK = 1 << 15

    # ---------------------------------------------------------------- update
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values)
        if len(v) == 0:
            return
        seeds = _seed_mix(self.num_perm)
        buf = np.empty(min(len(v), self._CHUNK), dtype=np.uint64)
        for i in range(0, len(v), self._CHUNK):
            h = hash_u64(v[i : i + self._CHUNK])
            b = buf[: len(h)]
            for j in range(self.num_perm):
                np.bitwise_xor(h, seeds[j], out=b)
                splitmix64(b, inplace=True)
                m = b.min()
                if m < self.sig[j]:
                    self.sig[j] = m

    # ----------------------------------------------------------------- merge
    def merge(self, other: "MinHashSketch") -> "MinHashSketch":
        if other.num_perm != self.num_perm:
            raise ValueError(
                f"minhash num_perm mismatch: {self.num_perm} vs "
                f"{other.num_perm}"
            )
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    # -------------------------------------------------------------- estimate
    def estimate(self) -> float:
        """Distinct-count estimate from the slot minima (min-value MLE):
        n̂ = k / Σ(min_j/2^64) − 1; exact 0 for the empty sketch."""
        if bool(np.all(self.sig == _U64_MAX)):
            return 0.0
        s = float(np.sum(self.sig / _U64_SPAN))
        return max(self.num_perm / s - 1.0, 0.0)

    def jaccard(self, other: "MinHashSketch") -> float:
        """Estimated Jaccard similarity: matching-slot fraction
        (stderr ≈ sqrt(J(1−J)/num_perm))."""
        if other.num_perm != self.num_perm:
            raise ValueError("minhash num_perm mismatch")
        return float(np.mean(self.sig == other.sig))

    def containment(self, other: "MinHashSketch") -> float:
        """Estimated |A∩B| / |A| via the union trick:
        C = J(A,B) · (|A∪B|̂ / |A|̂)."""
        u = MinHashSketch(self.num_perm, self.sig.copy()).merge(
            MinHashSketch(other.num_perm, other.sig.copy())
        )
        a_est = self.estimate()
        if a_est == 0:
            return 0.0
        return min(self.jaccard(other) * u.estimate() / a_est, 1.0)

    # ----------------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<I", self.num_perm) + self.sig.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MinHashSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a minhash sketch blob")
        (num_perm,) = struct.unpack("<I", blob[4:8])
        sig = np.frombuffer(
            blob[8 : 8 + 8 * num_perm], dtype=np.uint64
        ).copy()
        return cls(num_perm=num_perm, sig=sig)
