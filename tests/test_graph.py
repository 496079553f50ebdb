"""Distributed PageRank pinned against a dense numpy power iteration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _numpy_pagerank(edges: list[tuple[str, str]], iters: int, damping: float) -> dict[str, float]:
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        nxt = np.full(n, (1.0 - damping) / n + damping * dangling / n)
        for s, d in edges:
            nxt[idx[d]] += damping * r[idx[s]] / outdeg[idx[s]]
        r = nxt
    return dict(zip(nodes, r))


@pytest.mark.parametrize("damping", [0.85])
def test_pagerank_matches_dense_power_iteration(ray_session, damping):
    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    # hub-and-spoke + cycle + a dangling node (f has no outlinks)
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "a"), ("c", "a"), ("d", "a"),
        ("b", "c"), ("d", "e"), ("e", "f"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([s for s, _ in edges]),
                "dst_url": pa.array([d for _, d in edges]),
            }
        )
    )
    got = {
        r["url"]: r["rank"]
        for r in pagerank_edges(ds, iters=10, damping=damping).take_all()
    }
    want = _numpy_pagerank(edges, iters=10, damping=damping)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u
