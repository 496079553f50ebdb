"""Unit tests: cuckoo / bloom membership filters (state/filters.py)."""

import numpy as np

from crawler_ray.state.filters import BloomFilter, CuckooFilter


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
