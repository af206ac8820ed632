"""HyperLogLog — mergeable distinct-count sketch (public algorithm,
Flajolet et al. 2007, with the standard small-range linear-counting
correction).

Used as the approximate path for per-key distinct-page counts in
canonicalization: at 1e12 documents an exact per-(triple,url) stage can
dominate the shuffle, while one 2^p-byte sketch per triple is constant-size
and merges associatively (SURVEY.md A9 scale note). Registers are numpy
arrays; add() is vectorized over a batch of hashes.
"""

from __future__ import annotations

import numpy as np


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    @staticmethod
    def _mix(h: np.ndarray) -> np.ndarray:
        """MurmurHash3 fmix64 finalizer — FNV-1a avalanches poorly in its
        HIGH bits for short-suffix keys (e.g. sequential urls), which starves
        the register index; the finalizer fixes the distribution."""
        with np.errstate(over="ignore"):
            h = h.copy()
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        return h

    def add_hashes(self, hashes: np.ndarray) -> "HLL":
        """Vectorized add of pre-hashed uint64 values."""
        h = self._mix(hashes.astype(np.uint64, copy=False))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1, computed via float log2 trick is
        # lossy; use a shift loop over the 64-p relevant bits (vectorized)
        rank = np.ones(len(h), dtype=np.uint8)
        mask_top = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        alive = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p):
            top_zero = alive & ((cur & mask_top) == 0)
            if not top_zero.any():
                break
            rank[top_zero] += 1
            alive = top_zero
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        e = alpha * m * m / inv
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())
