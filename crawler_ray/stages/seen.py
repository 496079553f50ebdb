"""Sharded URL-seen set: a pool of Ray actors, each owning one hash shard.

Replaces the reference's single mutex-guarded ``Visited map[string]bool``
(``engine/crawler.go:16-17,163-185``) with the scale design of SURVEY.md §7:
``num_shards`` actors, shard = ``url_hash64 % num_shards``; each shard holds a
cuckoo filter (delete-capable — needed for unmark-on-failure) plus an exact
uint64 set on the verification path.

Probing happens *inside* ``map_batches`` tasks: the stage function partitions
a batch's keys by shard, issues one ``check_and_add`` / ``contains`` RPC per
shard concurrently, and reassembles the row mask — one round-trip per
(batch × shard), not per row. The actors are the only mutable state in the
engine and serialize to numpy state dicts for checkpointing.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import ray

from crawler_ray.state.filters import BloomFilter, CuckooFilter

if TYPE_CHECKING:  # pragma: no cover
    pass


@ray.remote(num_cpus=0)
class SeenShard:
    # num_cpus=0: probe calls are sub-ms bursts; reserving CPU would carve
    # the budget out of the Data pool (8 shards × 0.25 starved a 2-cpu
    # session outright) — shards float and never block a map slot.
    """One hash shard of the URL-seen set."""

    def __init__(self, capacity: int = 1 << 20, mode: str = "cuckoo", exact: bool = True):
        self.mode = mode
        if mode == "cuckoo":
            self.filter = CuckooFilter(capacity)
        else:
            self.filter = BloomFilter(capacity)
            self.failed_exact: set[int] = set()  # bloom cannot delete
        self.exact: set[int] | None = set() if exact else None

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Membership probe WITHOUT insert (cross-iteration pre-filter)."""
        if self.exact is not None:
            return np.fromiter((int(k) in self.exact for k in keys), bool, len(keys))
        if self.mode == "bloom":
            hit = self.filter.contains_many(keys)
            if self.failed_exact:
                unfailed = np.fromiter(
                    (int(k) not in self.failed_exact for k in keys), bool, len(keys)
                )
                hit &= unfailed
            return hit
        return np.fromiter((self.filter.contains(int(k)) for k in keys), bool, len(keys))

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Mark-before-fetch (engine/crawler.go:90): returns already-seen mask;
        unseen keys are inserted atomically (the actor is the serialization
        point, replacing the reference's mutex)."""
        out = np.empty(len(keys), dtype=bool)
        if self.exact is not None:
            for i, k in enumerate(keys):
                k = int(k)
                seen = k in self.exact
                out[i] = seen
                if not seen:
                    self.exact.add(k)
                    if self.mode == "cuckoo":
                        self.filter.add(k)
                    else:
                        self.filter.add_many(np.array([k], dtype=np.uint64))
                        self.failed_exact.discard(k)
            return out
        if self.mode == "cuckoo":
            for i, k in enumerate(keys):
                k = int(k)
                seen = self.filter.contains(k)
                out[i] = seen
                if not seen:
                    self.filter.add(k)
            return out
        out = self.contains(keys)
        self.filter.add_many(keys[~out])
        for k in keys[~out]:
            self.failed_exact.discard(int(k))
        return out

    def remove(self, keys: np.ndarray) -> None:
        """Unmark-on-failure (engine/crawler.go:179-185)."""
        for k in keys:
            k = int(k)
            if self.exact is not None:
                self.exact.discard(k)
            if self.mode == "cuckoo":
                self.filter.remove(k)
            else:
                self.failed_exact.add(k)

    def count(self) -> int:
        if self.exact is not None:
            return len(self.exact)
        return self.filter.size if self.mode == "cuckoo" else -1

    def keys_exact(self) -> np.ndarray:
        """Exact key dump (verification path only)."""
        assert self.exact is not None
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))

    def dump(self) -> dict:
        state = {"mode": self.mode, "filter": self.filter.dump()}
        if self.exact is not None:
            state["exact"] = np.fromiter(self.exact, np.uint64, len(self.exact))
        if self.mode == "bloom":
            state["failed_exact"] = np.fromiter(
                self.failed_exact, np.uint64, len(self.failed_exact)
            )
        return state

    def restore(self, state: dict) -> None:
        self.mode = state["mode"]
        if state["filter"]["kind"] == "cuckoo":
            self.filter = CuckooFilter.load(state["filter"])
        else:
            self.filter = BloomFilter.load(state["filter"])
        self.exact = set(int(k) for k in state["exact"]) if "exact" in state else None
        if self.mode == "bloom":
            self.failed_exact = set(int(k) for k in state.get("failed_exact", []))


class SeenSet:
    """Driver-side handle bundle for the shard pool."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 20,
                 mode: str = "cuckoo", exact: bool = True):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(capacity_per_shard, mode, exact) for _ in range(num_shards)
        ]

    def _split(self, keys: np.ndarray) -> tuple[list[np.ndarray], np.ndarray]:
        shard_of = (keys % np.uint64(self.num_shards)).astype(np.int64)
        return [keys[shard_of == s] for s in range(self.num_shards)], shard_of

    def _fanout(self, method: str, keys: np.ndarray) -> np.ndarray:
        """One RPC per non-empty shard, concurrently; reassembled row mask."""
        parts, shard_of = self._split(keys)
        refs = {
            s: getattr(self.shards[s], method).remote(part)
            for s, part in enumerate(parts)
            if len(part)
        }
        masks = {s: m for s, m in zip(refs, ray.get(list(refs.values())))}
        out = np.zeros(len(keys), dtype=bool)
        for s, m in masks.items():
            out[shard_of == s] = m
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._fanout("contains", keys)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        return self._fanout("check_and_add", keys)

    def remove(self, keys: np.ndarray) -> None:
        parts, _ = self._split(keys)
        ray.get([
            self.shards[s].remove.remote(part)
            for s, part in enumerate(parts)
            if len(part)
        ])

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def keys_exact(self) -> np.ndarray:
        return np.concatenate(ray.get([s.keys_exact.remote() for s in self.shards]))

    def dump(self) -> list[dict]:
        return ray.get([s.dump.remote() for s in self.shards])

    def restore(self, states: list[dict]) -> None:
        assert len(states) == self.num_shards
        ray.get([s.restore.remote(st) for s, st in zip(self.shards, states)])


def seen_filter_fn(seen: SeenSet, mark: bool):
    """Build a ``map_batches`` task fn that drops already-seen rows.

    ``mark=False`` → pure pre-filter (``contains``); ``mark=True`` →
    mark-before-fetch (``check_and_add``). State lives in the shard actors;
    the stage itself is a stateless task, so Ray can run any number of copies.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column("h64").to_numpy(zero_copy_only=False).astype(np.uint64)
        seen_mask = seen.check_and_add(keys) if mark else seen.contains(keys)
        return batch.filter(pa.array(~seen_mask))

    return fn
