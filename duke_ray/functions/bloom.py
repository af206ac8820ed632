"""Distributed Bloom filter over an int64 hash column.

The semi/anti-join pre-filter: a Bloom filter built from the SMALL(er)
side lets the big side split rows into definitely-absent (bloom
negative — handled locally, never shuffled) and maybe-present (bloom
positive — verified through the exact exchange). Exactness never
depends on the false-positive rate; the filter only reduces shuffle
volume, so the caller's oracle is unchanged.

Build topology (range-sharded, no bitmap OR tree): bit positions are
hash-partitioned by ``pos // shard_size``, each shard partition sets
bits in its DISJOINT slice and emits one (shard, bits) row, the driver
concatenates ``n_shards`` slices. Shipping cost = k positions per key,
paid once per base snapshot; the bitmap itself (m/8 bytes) is the only
driver-side object and broadcasts via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_K = 3  # double-hashed probes per key


def _mix64(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def bloom_positions(h: np.ndarray, m_bits: int) -> np.ndarray:
    """(n,) int64/uint64 hashes -> (k, n) uint64 bit positions
    (double hashing: pos_j = h1 + j * h2 mod m, h2 forced odd)."""
    h1 = h.astype(np.uint64)
    h2 = _mix64(h1) | np.uint64(1)
    with np.errstate(over="ignore"):
        return np.stack(
            [(h1 + np.uint64(j) * h2) % np.uint64(m_bits) for j in range(_K)]
        )


def build_bloom_bits(
    hashes: "ray.data.Dataset",
    col: str = "h",
    m_bits: int = 1 << 27,
    n_shards: int = 64,
) -> np.ndarray:
    """-> packed uint8 bitmap of m_bits/8 bytes. ``m_bits`` must be a
    multiple of 8 * n_shards (disjoint byte-aligned shard slices)."""
    if m_bits % (8 * n_shards) != 0:
        raise ValueError("m_bits must be a multiple of 8 * n_shards")
    shard_bits = m_bits // n_shards

    def pos_rows(b: pa.Table) -> pa.Table:
        h = b[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.unique(bloom_positions(h, m_bits).reshape(-1))
        return pa.table(
            {
                "shard": pa.array((pos // np.uint64(shard_bits)).astype(np.int64)),
                "pos": pa.array(pos.astype(np.int64)),
            }
        )

    def set_bits(t: pa.Table) -> pa.Table:
        shard = t["shard"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_shards = []
        out_bits = []
        for s in np.unique(shard):
            local = pos[shard == s] - s * shard_bits
            bits = np.zeros(shard_bits // 8, np.uint8)
            np.bitwise_or.at(bits, local >> 3, np.uint8(1) << (local & 7).astype(np.uint8))
            out_shards.append(int(s))
            out_bits.append(bits.tobytes())
        return pa.table(
            {"shard": pa.array(out_shards, pa.int64()), "bits": pa.array(out_bits, pa.binary())}
        )

    from ..state.exchange import partitioned_reduce

    rows = hashes.map_batches(pos_rows, batch_format="pyarrow", batch_size=65536)
    slices = partitioned_reduce(rows, "shard", set_bits, n_meta=n_shards).to_pandas()
    bitmap = np.zeros(m_bits // 8, np.uint8)
    for s, b in zip(slices["shard"], slices["bits"]):
        sl = np.frombuffer(b, np.uint8)
        start = int(s) * (shard_bits // 8)
        bitmap[start : start + len(sl)] |= sl
    return bitmap


def bloom_contains(bitmap: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(n,) bool: True = maybe present, False = DEFINITELY absent."""
    m_bits = len(bitmap) * 8
    pos = bloom_positions(h, m_bits)
    hit = np.ones(pos.shape[1], bool)
    for j in range(_K):
        p = pos[j].astype(np.int64)
        hit &= (bitmap[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
    return hit
