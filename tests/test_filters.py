"""Unit tests: cuckoo / bloom membership filters (state/filters.py)."""

import numpy as np

from crawler_ray.state.filters import BloomFilter, CuckooFilter, SortedKeySet


def test_cuckoo_add_contains_remove():
    f = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    for k in keys:
        assert f.add(int(k))
    assert all(f.contains(int(k)) for k in keys)
    # delete (unmark-on-failure path) actually removes
    for k in keys[:100]:
        assert f.remove(int(k))
    fp = sum(f.contains(int(k)) for k in keys[:100])
    assert fp <= 5  # residual ≈ fp rate, not 100
    assert f.size == 4900


def test_cuckoo_fp_rate_reasonable():
    f = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**63, size=8000, dtype=np.uint64)
    for k in keys:
        f.add(int(k))
    probe = rng.integers(0, 2**63, size=10_000, dtype=np.uint64)
    fp = sum(f.contains(int(k)) for k in probe)
    assert fp / 10_000 < 0.01  # 16-bit fingerprints → ~0.1% expected


def test_cuckoo_dump_load_roundtrip():
    f = CuckooFilter(capacity=1000)
    for k in range(500):
        f.add(k * 7919)
    g = CuckooFilter.load(f.dump())
    assert all(g.contains(k * 7919) for k in range(500))
    assert g.size == f.size


def test_cuckoo_vectorized_matches_scalar():
    """contains_many / add_many agree with the scalar path."""
    rng = np.random.default_rng(19)
    keys = np.unique(rng.integers(0, 2**63, size=6000, dtype=np.uint64))
    f_vec = CuckooFilter(capacity=20_000)
    assert f_vec.add_many(keys)
    f_scal = CuckooFilter(capacity=20_000)
    for k in keys:
        assert f_scal.add(int(k))
    assert f_vec.contains_many(keys).all()
    assert f_vec.size == f_scal.size == len(keys)
    probe = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    got = f_vec.contains_many(probe)
    want = np.fromiter((f_scal.contains(int(k)) for k in probe), bool, len(probe))
    assert (got == want).all()


def test_cuckoo_stash_no_silent_loss():
    """Overfilling the table must not silently drop a previously stored key:
    every key whose add() returned True stays a member (ADVICE r1)."""
    f = CuckooFilter(capacity=256)
    rng = np.random.default_rng(23)
    keys = np.unique(rng.integers(0, 2**63, size=600, dtype=np.uint64))
    stored = [int(k) for k in keys if f.add(int(k))]
    assert len(stored) > 256  # pushed well past nominal capacity
    missing = [k for k in stored if not f.contains(k)]
    assert missing == []
    # stash entries survive dump/load and removal works from the stash
    g = CuckooFilter.load(f.dump())
    assert all(g.contains(k) for k in stored)


def test_sorted_key_set():
    s = SortedKeySet(merge_n=64)  # tiny merge threshold exercises compaction
    rng = np.random.default_rng(29)
    keys = np.unique(rng.integers(0, 2**63, size=1000, dtype=np.uint64))
    for i in range(0, len(keys), 37):  # uneven batches
        chunk = keys[i:i + 37]
        assert not s.contains(chunk).any()
        s.add(chunk)
        assert s.contains(chunk).all()
    assert len(s) == len(keys)
    assert s.contains(keys).all()
    other = np.setdiff1d(rng.integers(0, 2**63, size=500, dtype=np.uint64), keys)
    assert not s.contains(other).any()
    s.remove(keys[::3])
    assert not s.contains(keys[::3]).any()
    kept = np.setdiff1d(keys, keys[::3])
    assert s.contains(kept).all()
    assert set(s.to_array()) == set(int(k) for k in kept)


def test_bloom_vectorized():
    f = BloomFilter(capacity=10_000, fp_rate=0.01)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    f.add_many(keys)
    assert f.contains_many(keys).all()
    probe = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    fp = f.contains_many(probe).mean()
    assert fp < 0.03
    g = BloomFilter.load(f.dump())
    assert g.contains_many(keys).all()
