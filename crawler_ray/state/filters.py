"""Approximate-membership filters for the URL-seen set.

The reference keeps one unbounded ``map[string]bool`` guarded by a mutex
(``engine/crawler.go:16-17,163-177``) — fine for one process, hopeless at a
10^10-URL frontier. Here each seen-set *shard* (see stages/seen.py) owns:

- a **CuckooFilter**: ~2 bytes/key at 95% load, supports **delete** — required
  by the reference's unmark-on-failure semantics (``engine/crawler.go:179-185``);
- a **BloomFilter** fallback (no delete → failures tracked in an exact
  side-set by the shard actor when bloom is selected);
- an optional **exact** uint64 set for the verification path (tests, small
  scale) so seen-set equality against the oracle is exact, not probabilistic.

Sizing (SURVEY.md §4): 10^10 keys / 256 shards ≈ 39M keys/shard ≈ 84 MB/shard
cuckoo at 2 B/key ×1.05 overhead — comfortably in actor heap; shard count is
the scaling knob.

Keys are uint64 digests (functions/url.url_hash64). Pure numpy, no deps.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    """(2,4)-cuckoo filter over uint64 keys, 16-bit fingerprints."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, rng_seed: int = 42):
        nbuckets = 1
        while nbuckets * self.SLOTS < capacity / 0.95:
            nbuckets *= 2
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)
        self.size = 0
        self.rng = np.random.default_rng(rng_seed)

    # fingerprint: top 16 bits, 0 remapped to 1 (0 marks empty slot)
    @staticmethod
    def _fp(key: np.uint64) -> np.uint16:
        fp = np.uint16((int(key) >> 48) & 0xFFFF)
        return np.uint16(1) if fp == 0 else fp

    def _i1(self, key: np.uint64) -> int:
        return int(np.uint64(key) & self.mask)

    def _i2(self, i1: int, fp: np.uint16) -> int:
        return int((np.uint64(i1) ^ (np.uint64(fp) * _MIX)) & self.mask)

    def contains(self, key: int) -> bool:
        k = np.uint64(key)
        fp = self._fp(k)
        i1 = self._i1(k)
        if fp in self.table[i1]:
            return True
        return fp in self.table[self._i2(i1, fp)]

    def add(self, key: int) -> bool:
        """Insert; returns False only on table-full (caller should resize/shard)."""
        k = np.uint64(key)
        fp = self._fp(k)
        i1 = self._i1(k)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        # evict
        i = i1 if self.rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self.rng.integers(self.SLOTS))
            fp, self.table[i, slot] = self.table[i, slot], fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        return False

    def remove(self, key: int) -> bool:
        """Delete one copy of the fingerprint (unmark-on-failure path)."""
        k = np.uint64(key)
        fp = self._fp(k)
        i1 = self._i1(k)
        for i in (i1, self._i2(i1, fp)):
            row = self.table[i]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                self.size -= 1
                return True
        return False

    def dump(self) -> dict:
        return {"kind": "cuckoo", "table": self.table.copy(), "size": self.size}

    @classmethod
    def load(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = state["table"].copy()
        f.nbuckets = f.table.shape[0]
        f.mask = np.uint64(f.nbuckets - 1)
        f.size = int(state["size"])
        f.rng = np.random.default_rng(42)
        return f


class BloomFilter:
    """Plain bloom over uint64 keys (k derived hashes); no delete —
    shard actors pair it with an exact failed-set when selected."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        import math

        nbits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.nbits = 1 << (nbits - 1).bit_length()
        self.k = max(1, round(self.nbits / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.nbits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64)
        h1 = keys
        h2 = (keys >> np.uint64(17)) ^ (keys * _MIX)
        idx = np.empty((self.k, keys.size), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.nbits)
        return idx

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0).astype(bool)

    def dump(self) -> dict:
        return {"kind": "bloom", "bits": self.bits.copy(), "k": self.k, "nbits": self.nbits}

    @classmethod
    def load(cls, state: dict) -> "BloomFilter":
        f = cls.__new__(cls)
        f.bits = state["bits"].copy()
        f.k = int(state["k"])
        f.nbits = int(state["nbits"])
        return f
