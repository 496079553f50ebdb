"""Sharded URL-seen set: a pool of Ray actors, each owning one hash shard.

Replaces the reference's single mutex-guarded ``Visited map[string]bool``
(``engine/crawler.go:16-17,163-185``) with the scale design of SURVEY.md §7:
``num_shards`` actors, shard = ``url_hash64 % num_shards``; each shard holds a
cuckoo filter (delete-capable — needed for unmark-on-failure) plus an exact
uint64 set on the verification path.

Probing happens *inside* ``map_batches`` tasks: the stage function partitions
a batch's keys by shard, issues one ``check_and_add`` / ``contains`` RPC per
shard concurrently, and reassembles the row mask — one round-trip per
(batch × shard), not per row. Within a shard every probe/insert is a
vectorized numpy pass (searchsorted over sorted key runs, gather-compare over
cuckoo buckets) — the r1 per-row ``int(k) in set`` loops were the
serialization point at 10^10-URL scale.

Checkpointing: shards track per-generation deltas (keys added / removed since
the last dump) so the driver persists O(new URLs this generation) per
checkpoint instead of re-dumping the full set every iteration (which was
quadratic over a long crawl). ``dump()`` remains for periodic compaction.
The actors are the only mutable state in the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from crawler_ray.state.filters import BloomFilter, CuckooFilter, SortedKeySet


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
            self.failed_exact = SortedKeySet()  # bloom cannot delete
        self.exact: SortedKeySet | None = SortedKeySet() if exact else None
        # per-generation delta log for incremental checkpoints: a
        # chronological event log (keys, is_add), netted order-aware in
        # dump_delta — a plain set-subtraction delta silently loses a key
        # that is marked, unmarked and re-marked within one generation
        # (ADVICE r2), even though today's driver never produces that order
        self._d_events: list[tuple[np.ndarray, bool]] = []

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Membership probe WITHOUT insert (cross-iteration pre-filter)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if self.exact is not None:
            return self.exact.contains(keys)
        hit = self.filter.contains_many(keys)
        if self.mode == "bloom" and len(self.failed_exact):
            hit &= ~self.failed_exact.contains(keys)
        return hit

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Mark-before-fetch (engine/crawler.go:90): returns already-seen mask;
        unseen keys are inserted atomically (the actor is the serialization
        point, replacing the reference's mutex)."""
        keys = np.asarray(keys, dtype=np.uint64)
        out = self.contains(keys)
        # within-batch duplicates: only the first occurrence reads as unseen
        # (the serial reference would have marked it before the second probe)
        first = np.zeros(len(keys), dtype=bool)
        _, first_idx = np.unique(keys, return_index=True)
        first[first_idx] = True
        out |= ~first
        new = keys[~out]
        if not new.size:
            return out
        if self.exact is not None:
            self.exact.add(new)
            if self.mode == "cuckoo":
                ok = self.filter.add_many(new)
            else:
                self.filter.add_many(new)
                self.failed_exact.remove(new)
                ok = True
        elif self.mode == "cuckoo":
            ok = self.filter.add_many(new)
        else:
            self.filter.add_many(new)
            self.failed_exact.remove(new)
            ok = True
        if not ok:
            # a silent False here loses seen keys and allows refetch loops
            # (ADVICE r1): a full shard is a sizing error the driver must see
            raise RuntimeError(
                "cuckoo seen-shard full (capacity exceeded even with stash); "
                "raise seen_capacity or num_seen_shards"
            )
        self._d_events.append((new, True))
        return out

    def remove(self, keys: np.ndarray) -> None:
        """Unmark-on-failure (engine/crawler.go:179-185)."""
        keys = np.unique(np.asarray(keys, dtype=np.uint64))
        if not keys.size:
            return
        if self.exact is not None:
            self.exact.remove(keys)
        if self.mode == "cuckoo":
            for k in keys:
                self.filter.remove(int(k))
        else:
            self.failed_exact.add(keys[~self.failed_exact.contains(keys)])
        self._d_events.append((keys, False))

    def count(self) -> int:
        if self.exact is not None:
            return len(self.exact)
        return self.filter.size if self.mode == "cuckoo" else -1

    def keys_exact(self) -> np.ndarray:
        """Exact key dump (verification path only)."""
        assert self.exact is not None
        return self.exact.to_array()

    def dump(self, clear_delta: bool = True) -> dict:
        """Full state (compaction checkpoints + restore base)."""
        state = {"mode": self.mode, "filter": self.filter.dump()}
        if self.exact is not None:
            state["exact"] = self.exact.to_array()
        if self.mode == "bloom":
            state["failed_exact"] = self.failed_exact.to_array()
        if clear_delta:
            # a full dump subsumes pending deltas; clearing keeps the next
            # delta relative to THIS checkpoint
            self._d_events.clear()
        return state

    def dump_delta(self) -> dict:
        """Net change since the previous dump/dump_delta, then reset.

        Order-aware netting: adds only ever log base-absent keys
        (check_and_add inserts new keys only) and removes only base-present
        ones, so per key the FIRST event tells whether it was in the base
        and the LAST whether it is in the final state:

        - first=add,    last=add    → net added   (incl. add→remove→re-add)
        - first=add,    last=remove → no change   (never in the base)
        - first=remove, last=remove → net removed
        - first=remove, last=add    → no change   (back to base membership)
        """
        if not self._d_events:
            return {"added": np.empty(0, np.uint64), "removed": np.empty(0, np.uint64)}
        keys = np.concatenate([k for k, _ in self._d_events])
        sign = np.concatenate(
            [np.full(len(k), is_add, dtype=bool) for k, is_add in self._d_events]
        )
        self._d_events.clear()
        uniq, first_idx = np.unique(keys, return_index=True)
        first_sign = sign[first_idx]
        _, rev_idx = np.unique(keys[::-1], return_index=True)  # same uniq order
        last_sign = sign[::-1][rev_idx]
        return {
            "added": uniq[first_sign & last_sign],
            "removed": uniq[~first_sign & ~last_sign],
        }

    def apply_delta(self, delta: dict) -> None:
        """Replay one checkpointed generation delta (resume path)."""
        added = np.asarray(delta["added"], dtype=np.uint64)
        removed = np.asarray(delta["removed"], dtype=np.uint64)
        if added.size:
            if self.exact is not None:
                self.exact.add(added[~self.exact.contains(added)])
            if self.mode == "cuckoo":
                if not self.filter.add_many(added):
                    # replaying into a full shard must fail loudly — a
                    # silently dropped key re-enables refetch loops
                    raise RuntimeError("seen shard over capacity during delta replay")
            else:
                self.filter.add_many(added)
                self.failed_exact.remove(added)
        if removed.size:
            if self.exact is not None:
                self.exact.remove(removed)
            if self.mode == "cuckoo":
                for k in removed:
                    self.filter.remove(int(k))
            else:
                self.failed_exact.add(removed[~self.failed_exact.contains(removed)])

    def restore(self, state: dict) -> None:
        self.mode = state["mode"]
        if state["filter"]["kind"] == "cuckoo":
            self.filter = CuckooFilter.load(state["filter"])
        else:
            self.filter = BloomFilter.load(state["filter"])
        self.exact = SortedKeySet(state["exact"]) if "exact" in state else None
        if self.mode == "bloom":
            self.failed_exact = SortedKeySet(state.get("failed_exact"))
        self._d_events.clear()


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
        per = ray.get([s.count.remote() for s in self.shards])
        if any(c < 0 for c in per):
            return -1  # bloom shards can't count — report unknown, not a sum of sentinels
        return sum(per)

    def keys_exact(self) -> np.ndarray:
        return np.concatenate(ray.get([s.keys_exact.remote() for s in self.shards]))

    def dump(self) -> list[dict]:
        return ray.get([s.dump.remote() for s in self.shards])

    def dump_delta(self) -> list[dict]:
        return ray.get([s.dump_delta.remote() for s in self.shards])

    def apply_delta(self, deltas: list[dict]) -> None:
        assert len(deltas) == self.num_shards
        ray.get([s.apply_delta.remote(d) for s, d in zip(self.shards, deltas)])

    def restore(self, states: list[dict]) -> None:
        assert len(states) == self.num_shards
        ray.get([s.restore.remote(st) for s, st in zip(self.shards, states)])


def seen_filter_fn(seen: SeenSet, mark: bool, skip_tasks: "frozenset[str] | None" = None):
    """Build a ``map_batches`` task fn that drops already-seen rows.

    ``mark=False`` → pure pre-filter (``contains``); ``mark=True`` →
    mark-before-fetch (``check_and_add``). State lives in the shard actors;
    the stage itself is a stateless task, so Ray can run any number of copies.

    ``skip_tasks``: task names whose rows bypass the visited check entirely
    (``Task.Reload``, engine/crawler.go:85 — in a multi-task engine the gate
    is per-row, since reload and non-reload tasks share one frontier).
    Bypassed rows are neither filtered nor marked.
    """
    import pyarrow.compute as pc

    skip_arr = pa.array(sorted(skip_tasks)) if skip_tasks else None

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if skip_arr is not None:
            skip_mask = pc.is_in(batch.column("task"), value_set=skip_arr)
            passed = batch.filter(skip_mask)
            batch = batch.filter(pc.invert(skip_mask))
            if batch.num_rows == 0:
                return passed
        keys = batch.column("h64").to_numpy(zero_copy_only=False).astype(np.uint64)
        seen_mask = seen.check_and_add(keys) if mark else seen.contains(keys)
        kept = batch.filter(pa.array(~seen_mask))
        if skip_arr is not None and passed.num_rows:
            return pa.concat_tables([kept, passed])
        return kept

    return fn
