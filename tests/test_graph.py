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


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("cc_cut", ["0", "1000000"])
def test_connected_components_matches_union_find(ray_session, monkeypatch, cc_cut):
    """cc_cut='0' forces the distributed superstep path; the default cut
    takes the driver min-label+pointer-jump fast path — identical labels."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import connected_components

    monkeypatch.setenv("CRAWLER_RAY_CC_CUT", cc_cut)

    # two chains (worst case for label propagation), a triangle, a 2-clique
    edges = [
        (5, 9), (9, 2), (2, 14),          # chain with min in the middle
        (20, 21), (21, 22), (22, 23),     # chain with min at one end
        (30, 31), (31, 32), (32, 30),     # triangle
        (40, 41),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([a for a, _ in edges], pa.int64()),
                "v": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(ds, src="u", dst="v").take_all()
    }
    assert got == _union_find_components(edges)


@pytest.mark.parametrize("damping", [0.85])
@pytest.mark.parametrize("pr_cut", ["0", "1000000"])
def test_pagerank_matches_dense_power_iteration(ray_session, monkeypatch, damping, pr_cut):
    """pr_cut='0' forces the BSP actor path; the default cut exercises the
    driver bincount path — both must match the dense oracle."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    monkeypatch.setenv("CRAWLER_RAY_PR_CUT", pr_cut)

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


def _brute_triangles(edges: list[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    total = 0
    seen = set()
    for a, b in edges:
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        total += len(adj[a] & adj[b])
    return total // 3


@pytest.mark.parametrize("tri_cut", ["0", "100000"])
def test_triangle_count_matches_brute_force(ray_session, monkeypatch, tri_cut):
    """Degree-oriented count equals the adjacency-set brute force, on a
    synthetic graph with hubs, duplicate and reversed edges, and
    self-loops — both through the distributed supersteps (cut disabled)
    and the adaptive local cut (identical result)."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import triangle_count_edges

    monkeypatch.setenv("CRAWLER_RAY_TRI_CUT", tri_cut)

    rng = np.random.default_rng(11)
    m = 600
    a = rng.integers(0, 60, m)
    b = rng.integers(0, 60, m)
    hub = np.zeros(40, dtype=np.int64)  # node 0 is a hub
    hub_b = rng.integers(0, 60, 40)
    src = np.concatenate([a, hub, a[:50]])  # duplicates included
    dst = np.concatenate([b, hub_b, b[:50]])
    names = np.array([f"u{i}" for i in range(60)], dtype=object)
    edges = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array(names[src], pa.string()),
                "dst_url": pa.array(names[dst], pa.string()),
            }
        )
    ).repartition(6)

    got = triangle_count_edges(edges)["n_triangles"][0].as_py()
    want = _brute_triangles(list(zip(src.tolist(), dst.tolist())))
    assert got == want, (got, want)


def test_link_graph_is_triangle_free(ray_session):
    """The generational crawl link graph is acyclic by construction —
    its undirected triangle count must be exactly 0 (the headline
    triangle_count query therefore runs over the similarity graph)."""
    from crawler_ray.pipelines.crawl_queries import link_graph
    from crawler_ray.pipelines.graph import triangle_count_edges

    got = triangle_count_edges(link_graph("/root/testdata/sf0.001"))
    assert got["n_triangles"][0].as_py() == 0


def test_ls_components_match_minlabel_and_long_path(ray_session, monkeypatch):
    """Large-star/small-star CC equals min-label on real similarity edges,
    and converges on a 2000-node path graph whose diameter would require
    2000 min-label supersteps (the O(log n) pointer-jumping claim).
    CC_CUT=0 forces both DISTRIBUTED paths (the adaptive driver cut would
    otherwise capture these driver-sized edge sets)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.pipelines.dedup import minhash_lsh_dups
    from crawler_ray.pipelines.graph import (
        connected_components,
        connected_components_ls,
    )

    monkeypatch.setenv("CRAWLER_RAY_CC_CUT", "0")

    pairs = minhash_lsh_dups("/root/testdata/sf0.001")
    a = connected_components(pairs, src="a_id", dst="b_id").to_pandas()
    b = connected_components_ls(pairs, src="a_id", dst="b_id").to_pandas()
    assert dict(zip(a.node, a.component)) == dict(zip(b.node, b.component))

    # path 0-1-2-...-1999 plus a disjoint triangle with ids above it
    n = 2000
    u = np.r_[np.arange(n - 1), [5000, 5001, 5000]]
    v = np.r_[np.arange(1, n), [5001, 5002, 5002]]
    edges = rd.from_arrow(pa.table({"u": u, "v": v}))
    got = connected_components_ls(edges).to_pandas()
    lab = dict(zip(got.node, got.component))
    assert len(lab) == n + 3
    assert all(lab[i] == 0 for i in range(n))
    assert all(lab[i] == 5000 for i in (5000, 5001, 5002))


@pytest.mark.parametrize("pr_cut", ["0", "1000000"])
def test_hits_matches_dense_power_iteration(ray_session, monkeypatch, pr_cut):
    monkeypatch.setenv("CRAWLER_RAY_PR_CUT", pr_cut)
    """Distributed HITS equals a dense numpy power iteration (same update
    order: a <- norm(A^T h), h <- norm(A a)) on a constructed graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.pipelines.graph import hits_edges

    rng = np.random.default_rng(7)
    n = 30
    src = rng.integers(0, n, 120)
    dst = (src + 1 + rng.integers(0, n - 1, 120)) % n  # no self-loops
    eds = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([f"u{i}" for i in src]),
                "dst_url": pa.array([f"u{i}" for i in dst]),
            }
        )
    )
    got = hits_edges(eds, iters=3).to_pandas()

    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[s, d] += 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(3):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    gh = dict(zip(got.url, got.hub))
    ga = dict(zip(got.url, got.auth))
    assert len(gh) == n
    for i in range(n):
        assert abs(gh[f"u{i}"] - h[i]) < 1e-8
        assert abs(ga[f"u{i}"] - a[i]) < 1e-8


def test_pagerank_self_loops_and_multi_edges(ray_session):
    """BSP PageRank preserves multi-edge multiplicity and handles
    self-loops — both flow through the same (outdeg, bincount) path the
    dense oracle models row-by-row."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    edges = [
        ("a", "a"),                       # self-loop
        ("a", "b"), ("a", "b"),           # doubled edge: 2/3 of a's mass to b
        ("b", "c"), ("c", "a"),
        ("d", "a"), ("d", "a"), ("d", "d"),
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
        for r in pagerank_edges(ds, iters=8, damping=0.85).take_all()
    }
    want = _numpy_pagerank(edges, iters=8, damping=0.85)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u


def test_bsp_graph_ops_empty_edges(ray_session):
    """Empty edge inputs return empty, correctly-typed results (the BSP
    setup short-circuits before spawning iteration state)."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import hits_edges, pagerank_edges

    empty = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([], pa.string()),
                "dst_url": pa.array([], pa.string()),
            }
        )
    )
    pr = pagerank_edges(empty, iters=3)
    assert pr.count() == 0
    assert set(pr.schema().names) == {"url", "rank"}
    ht = hits_edges(empty, iters=3)
    assert ht.count() == 0
    assert set(ht.schema().names) == {"url", "hub", "auth"}


def test_pagerank_sink_heavy_graph(ray_session):
    """A graph where most mass drains into dangling sinks: the dangling
    redistribution term dominates and must still match the dense oracle
    (and ranks must still sum to 1)."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    # one source fanning into 12 sinks, plus a 2-cycle feeding the source
    edges = [("s", f"sink{i}") for i in range(12)] + [("x", "s"), ("s", "x")]
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
        for r in pagerank_edges(ds, iters=12, damping=0.85).take_all()
    }
    want = _numpy_pagerank(edges, iters=12, damping=0.85)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u


def test_pagerank_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Kill/restart drive for the iterative BSP job: run 3 of 6
    iterations with checkpointing (the simulated kill), then re-invoke
    with iters=6 on the same checkpoint dir — the resumed run must start
    from the saved vectors (meta says 3) and produce ranks BIT-identical
    to an uninterrupted 6-iteration run (float64 Parquet round-trips
    exactly; summation order is deterministic)."""
    import json

    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    rng = np.random.default_rng(11)
    src = rng.integers(0, 40, 200)
    dst = (src + 1 + rng.integers(0, 39, 200)) % 40

    def ds():
        return rd.from_arrow(
            pa.table(
                {
                    "src_url": pa.array([f"u{i}" for i in src]),
                    "dst_url": pa.array([f"u{i}" for i in dst]),
                }
            )
        )

    import os

    # pin the BSP path for the uninterrupted baseline: the resume contract
    # (bit-identical restart) lives in the BSP layer, and the small-graph
    # driver cut — equal only to float association order — would otherwise
    # serve the un-checkpointed run
    os.environ["CRAWLER_RAY_PR_CUT"] = "0"
    try:
        full = {r["url"]: r["rank"] for r in pagerank_edges(ds(), iters=6).take_all()}
    finally:
        del os.environ["CRAWLER_RAY_PR_CUT"]

    ck = str(tmp_path / "pr_ck")
    import os

    os.makedirs(ck)
    pagerank_edges(ds(), iters=3, checkpoint_dir=ck, checkpoint_every=1)
    meta = json.load(open(os.path.join(ck, "meta.json")))
    assert meta["iters_done"] == 3

    resumed = {
        r["url"]: r["rank"]
        for r in pagerank_edges(
            ds(), iters=6, checkpoint_dir=ck, checkpoint_every=2
        ).take_all()
    }
    assert resumed == full  # exact equality, not approx
    assert json.load(open(os.path.join(ck, "meta.json")))["iters_done"] == 6

    # config drift must fail loudly, not silently restart
    with pytest.raises(ValueError):
        pagerank_edges(ds(), iters=6, checkpoint_dir=ck, damping=0.5)


def _numpy_ppr(
    edges: list[tuple[str, str]],
    iters: int,
    damping: float,
    seeds: dict[str, float],
) -> dict[str, float]:
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    s = np.zeros(n)
    for u, w in seeds.items():
        if u in idx:
            s[idx[u]] = w
    s /= s.sum()
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = s.copy()
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        nxt = (1.0 - damping + damping * dangling) * s
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / outdeg[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


@pytest.mark.parametrize("pr_cut", ["0", "1000000"])
def test_personalized_pagerank_matches_dense_oracle(ray_session, monkeypatch, pr_cut):
    monkeypatch.setenv("CRAWLER_RAY_PR_CUT", pr_cut)
    """Seeded teleport: restart + dangling mass both land on the seed
    distribution; seeds absent from the graph are dropped and the rest
    renormalized."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import pagerank_edges

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("a", "d"), ("d", "e"), ("e", "f"),   # f dangling
        ("g", "a"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([s for s, _ in edges]),
                "dst_url": pa.array([d for _, d in edges]),
            }
        )
    )
    seeds = {"a": 3.0, "e": 1.0, "zzz-not-in-graph": 5.0}
    got = {
        r["url"]: r["rank"]
        for r in pagerank_edges(ds, iters=9, damping=0.85, seeds=seeds).take_all()
    }
    want = _numpy_ppr(edges, iters=9, damping=0.85, seeds=seeds)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9, abs=1e-12), u

    # an entirely-absent seed set fails loudly
    with pytest.raises(ValueError):
        pagerank_edges(ds, iters=2, seeds={"nope": 1.0})


def test_rank_weighted_frontier_buckets(ray_session):
    """Composition pin: priority is exactly int.bit_length(rank_micro) for
    every url, and the crawl's hub pages (list/tag indexes) outrank leaf
    detail pages."""
    from crawler_ray.pipelines.crawl_queries import rank_weighted_frontier

    df = rank_weighted_frontier("/root/testdata/sf0.001", iters=5).to_pandas()
    assert len(df) > 0
    assert (df.priority == df.rank_micro.map(lambda v: int(v).bit_length())).all()
    # priority is monotone in rank, and the frontier covers every ranked
    # url exactly once (the ranks themselves are pinned by the dense
    # pagerank oracle)
    mono = df.sort_values("rank_micro").priority
    assert (mono.diff().dropna() >= 0).all()
    assert df.url.is_unique
    from crawler_ray.pipelines.graph import pagerank

    assert len(df) == pagerank("/root/testdata/sf0.001", iters=5).count()


@pytest.mark.parametrize("cut", ["driver", "distributed"])
def test_components_selfloops_and_past_2_53_ids(ray_session, monkeypatch, cut):
    """Parity pins for the two distributed-path bugs: (1) a node whose only
    edge is a self-loop must label as its own singleton on BOTH paths;
    (2) node ids above 2^53 must survive exactly (the superstep union used
    nullable int64 columns that pandas promoted to float64 — min() through
    float64 returned a component id that is no node's id)."""
    import ray.data as rd

    from crawler_ray.pipelines.graph import (
        connected_components,
        connected_components_ls,
    )

    if cut == "distributed":
        monkeypatch.setenv("CRAWLER_RAY_CC_CUT", "0")
    BIG = 2**53
    edges = pa.table(
        {
            "u": pa.array([BIG + 5, BIG + 3, 5, 7, 7], pa.int64()),
            "v": pa.array([BIG + 3, BIG + 1, 5, 8, 7], pa.int64()),
        }
    )
    want = {BIG + 1: BIG + 1, BIG + 3: BIG + 1, BIG + 5: BIG + 1, 5: 5, 7: 7, 8: 7}
    for fn in (connected_components, connected_components_ls):
        out = fn(rd.from_arrow(edges)).to_pandas()
        assert dict(zip(out.node, out.component)) == want, fn.__name__
