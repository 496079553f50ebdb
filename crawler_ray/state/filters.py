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


def in_sorted(keys: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` in a sorted uint64 array."""
    if sorted_arr.size == 0:
        return np.zeros(keys.size, dtype=bool)
    idx = np.searchsorted(sorted_arr, keys)
    idx_c = np.minimum(idx, sorted_arr.size - 1)
    return (idx < sorted_arr.size) & (sorted_arr[idx_c] == keys)


class SortedKeySet:
    """Vectorized exact uint64 set: sorted base array + small sorted pending
    run, merged when pending grows past ``merge_n``. Replaces the per-row
    Python ``int(k) in set`` probes that serialized the seen shards
    (VERDICT r1 §wrong-5) with searchsorted batch probes."""

    def __init__(self, keys: np.ndarray | None = None, merge_n: int = 1 << 16):
        self.base = (
            np.sort(np.asarray(keys, dtype=np.uint64))
            if keys is not None and len(keys)
            else np.empty(0, np.uint64)
        )
        self.pending = np.empty(0, np.uint64)
        self.merge_n = merge_n

    def __len__(self) -> int:
        return int(self.base.size + self.pending.size)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        m = in_sorted(keys, self.base)
        if self.pending.size:
            m |= in_sorted(keys, self.pending)
        return m

    def add(self, keys: np.ndarray) -> None:
        """Insert keys (caller guarantees unique and not present)."""
        if not len(keys):
            return
        self.pending = np.union1d(self.pending, keys.astype(np.uint64))
        if self.pending.size > self.merge_n:
            self.base = np.union1d(self.base, self.pending)
            self.pending = np.empty(0, np.uint64)

    def remove(self, keys: np.ndarray) -> None:
        if not len(keys):
            return
        keys = np.sort(keys.astype(np.uint64))
        if self.pending.size:
            self.pending = self.pending[~in_sorted(self.pending, keys)]
        if self.base.size:
            self.base = self.base[~in_sorted(self.base, keys)]

    def to_array(self) -> np.ndarray:
        return np.union1d(self.base, self.pending) if self.pending.size else self.base.copy()


class CuckooFilter:
    """(2,4)-cuckoo filter over uint64 keys, 16-bit fingerprints.

    A small stash catches the fingerprint displaced when an insert exhausts
    MAX_KICKS — without it a full shard silently *lost* a previously stored
    key on kick failure (ADVICE r1), letting refetch loops through. ``add``
    now only returns False once the stash itself overflows, and the caller
    (stages/seen.py) surfaces that instead of discarding it."""

    SLOTS = 4
    MAX_KICKS = 500
    STASH_MAX = 64

    def __init__(self, capacity: int, rng_seed: int = 42):
        nbuckets = 1
        while nbuckets * self.SLOTS < capacity / 0.95:
            nbuckets *= 2
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)
        self.size = 0
        self.rng = np.random.default_rng(rng_seed)
        self.stash: list[tuple[int, int]] = []  # (bucket_index, fingerprint)

    # fingerprint: top 16 bits, 0 remapped to 1 (0 marks empty slot)
    @staticmethod
    def _fp(key: np.uint64) -> np.uint16:
        fp = np.uint16((int(key) >> 48) & 0xFFFF)
        return np.uint16(1) if fp == 0 else fp

    def _i1(self, key: np.uint64) -> int:
        return int(np.uint64(key) & self.mask)

    def _i2(self, i1: int, fp: np.uint16) -> int:
        return int((np.uint64(i1) ^ (np.uint64(fp) * _MIX)) & self.mask)

    def _vec_fp_i1_i2(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        keys = keys.astype(np.uint64)
        fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = (keys & self.mask).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fp.astype(np.uint64) * _MIX)) & self.mask).astype(np.int64)
        return fp, i1, i2

    def contains(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.uint64))[0])

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized probe: gather both candidate buckets, compare broadcast."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._vec_fp_i1_i2(keys)
        fpc = fp[:, None]
        hit = (self.table[i1] == fpc).any(axis=1) | (self.table[i2] == fpc).any(axis=1)
        for bi, sfp in self.stash:
            hit |= (fp == sfp) & ((i1 == bi) | (i2 == bi))
        return hit

    def _insert_round(self, buckets: np.ndarray, fp: np.ndarray, todo: np.ndarray) -> np.ndarray:
        """One vectorized insert round into ``buckets[todo]``: dedupe buckets
        (one winner per bucket avoids scatter races), place winners with an
        empty slot; returns the still-unplaced subset of ``todo``."""
        if not todo.size:
            return todo
        b = buckets[todo]
        _, first = np.unique(b, return_index=True)
        winners = todo[first]
        rows = self.table[buckets[winners]]
        empty = rows == 0
        has_empty = empty.any(axis=1)
        placeable = winners[has_empty]
        if placeable.size:
            slot = empty[has_empty].argmax(axis=1)
            self.table[buckets[placeable], slot] = fp[placeable]
            self.size += placeable.size
        placed = np.zeros(buckets.size, dtype=bool)
        placed[placeable] = True
        return todo[~placed[todo]]

    def add_many(self, keys: np.ndarray) -> bool:
        """Vectorized bulk insert (caller guarantees keys unique and absent).
        Happy path: empty-slot placement at i1 then i2, a few rounds each;
        leftovers (bucket conflicts / full buckets) fall back to scalar
        kick-eviction. Returns False if any key could not be stored."""
        if not len(keys):
            return True
        keys = np.asarray(keys, dtype=np.uint64)
        fp, i1, i2 = self._vec_fp_i1_i2(keys)
        todo = np.arange(keys.size)
        for buckets in (i1, i2, i1, i2):
            todo = self._insert_round(buckets, fp, todo)
            if not todo.size:
                return True
        ok = True
        for j in todo:
            ok &= self.add(int(keys[j]))
        return ok

    def add(self, key: int) -> bool:
        """Insert; returns False only when the table AND stash are full
        (caller should resize/shard — see stages/seen.py)."""
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
        # evict, recording the kick chain so a failed insert can be unwound
        # (the chain displaces OTHER keys' fingerprints; aborting without
        # rollback would silently lose one of them — ADVICE r1)
        i = i1 if self.rng.integers(2) else i2
        kicks: list[tuple[int, int]] = []
        for _ in range(self.MAX_KICKS):
            slot = int(self.rng.integers(self.SLOTS))
            kicks.append((i, slot))
            fp, self.table[i, slot] = self.table[i, slot], fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        # kick budget exhausted: the displaced fingerprint (which belongs to
        # some previously stored key, reachable from bucket i) goes to the
        # stash instead of being dropped
        if len(self.stash) < self.STASH_MAX:
            self.stash.append((int(i), int(fp)))
            self.size += 1
            return True
        # stash full too: roll the kick chain back so every previously
        # stored key remains a member, and report failure for THIS key only
        for i, slot in reversed(kicks):
            fp, self.table[i, slot] = self.table[i, slot], fp
        return False

    def remove(self, key: int) -> bool:
        """Delete one copy of the fingerprint (unmark-on-failure path)."""
        k = np.uint64(key)
        fp = self._fp(k)
        i1 = self._i1(k)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                self.size -= 1
                return True
        for j, (bi, sfp) in enumerate(self.stash):
            if sfp == fp and bi in (i1, i2):
                self.stash.pop(j)
                self.size -= 1
                return True
        return False

    def dump(self) -> dict:
        return {
            "kind": "cuckoo",
            "table": self.table.copy(),
            "size": self.size,
            "stash": np.array(self.stash, dtype=np.int64).reshape(-1, 2),
        }

    @classmethod
    def load(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = state["table"].copy()
        f.nbuckets = f.table.shape[0]
        f.mask = np.uint64(f.nbuckets - 1)
        f.size = int(state["size"])
        f.rng = np.random.default_rng(42)
        f.stash = [(int(b), int(p)) for b, p in np.asarray(state.get("stash", np.empty((0, 2)))).reshape(-1, 2)]
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
