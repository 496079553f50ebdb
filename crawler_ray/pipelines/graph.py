"""Graph operators over the crawl link graph: distributed PageRank and
connected components.

The iterative-algorithm shape on Ray Data, without per-iteration joins:
all per-node and per-edge state is tagged ONCE with a coarse partition id
(``part = hash(key) % P``).  Connected components run the supersteps as
``groupby("part") → map_groups`` exchanges over that stable modulus.
PageRank and HITS go one step further: setup is a push shuffle straight
into a BSP (Pregel-style) layer of one stateful actor per partition
(``_GraphBsp``) — routing is factorized once and each round exchanges
only P×P small dense float64 vectors actor-to-actor through the object
store.  The previous design ran each round as two Dataset groupby
executions; its per-round executor + sort fixed cost (~1.2 s regardless
of CPU count) dominated iteration wall 10:1 on ≤10^6-edge graphs and
floored N-vs-4N scaling at ~0.4.  The BSP core removes the per-round
Dataset execution entirely; rounds are O(nodes/P) numpy work per actor
plus value-vector exchanges, which is the shape that survives a 256-node
cluster (static edge state never moves after setup; per-round network is
node-sized).

Driver-side values stay scalar: the dangling mass / changed-row count are
read from one-row-per-partition partials (O(P) driver traffic, never the
node table). ``P`` is the scale knob — it bounds shuffle fan-out at sandbox
scale and becomes #cores×k on a cluster; group payloads stay
O(edges / P).  ``_nparts_for`` caps P so small graphs don't pay 2×CPU
per-round task scheduling for sub-32k-row partitions.

The reference has no graph surface — this is a "beyond the reference"
link-analysis operator (its crawl stops at emitting links,
/root/reference/parse/doubangroup/douban_group.go:33-55).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


@ray.remote
class _PartCache:
    """Pins per-partition Arrow tables in the object store for iterative
    algorithms: a one-time load pass ``put``s each partition, and iteration
    tasks then read their partition zero-copy from the local store via the
    returned refs (fetched once per node on a cluster). The actor owns the
    ``ray.put`` objects, so their lifetime is the pipeline's — not any
    transient worker's — and dropping the actor handle frees everything."""

    def __init__(self) -> None:
        self._refs: dict[int, "ray.ObjectRef"] = {}

    def put(self, part: int, tbl: pa.Table) -> None:
        self._refs[part] = ray.put(tbl)

    def get_all(self) -> dict[int, "ray.ObjectRef"]:
        return dict(self._refs)


@ray.remote
class _GraphBsp:
    """One link-graph partition as a BSP (Pregel-style) actor — the shared
    iterate layer under PageRank and HITS: holds this hash(url) partition's
    node slice plus its edge slice with all routing FACTORIZED once —
    src→local-row positions, dst edges grouped by target partition, each
    target's url dictionary + bincount index. A PageRank round is

        scatter: c = rank[src_pos] / outdeg; per target q one
                 ``np.bincount`` → dense value vector (ray.put)
        gather:  rank = base + damping · Σ_q vals_q[pos_q]

    and a HITS iteration is the auth half-step (same scatter shape over
    hub mass) plus the hub half-step, which runs BACKWARD along the same
    handshake dictionaries: the dst-side owner returns its authority
    values aligned to each sender's dictionary, and the sender bincounts
    them onto its src rows — so one src-partitioned layout serves both
    directions with no second (dst-keyed) edge copy. All exchanges are
    pure float64 vectors (never urls, never edges). The node slice itself
    is built from the ``handshake``/``build_nodes`` pre-round: each actor
    ships its per-target dst url dictionaries once, and a partition's
    node set is unique(local srcs ∪ received dicts) — which removes the
    second edge-sized Dataset exchange the old node-table build paid
    (measured: setup was 2 exchanges ≈ 15 s of the 17 s 2-cpu wall at 2M
    edges, while all 6 BSP rounds cost ~1 s). Peer value arrays are
    accumulated in sender-part order, so the float sums — and the
    returned scores — are deterministic. Zero num_cpus: P can exceed the
    core count (the 8-partition floor on a 2-cpu session) and the actors
    are turn-based, never concurrently hot."""

    def __init__(self, P) -> None:
        self.P = P
        self.n = 0
        self._pieces: list[pa.Table] = []
        self.targets: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []

    def accept(self, piece: pa.Table) -> None:
        """Push-shuffle receiver: one hash(src)=p slice of one edge batch.
        Arrives through the object store (auto-dereferenced); kept as-is
        until ``factorize`` — arrival order doesn't matter because
        factorize re-sorts."""
        self._pieces.append(piece)

    def factorize(self) -> None:
        """Assemble the partition's edge slice from pushed pieces and
        factorize all routing. A deterministic (src, dst) sort makes every
        downstream float accumulation independent of piece arrival order;
        out-degree is a run-length count over the sorted srcs (ALL of a
        src's out-edges land here, so local counts are global)."""
        if self._pieces:
            e = pa.concat_tables(self._pieces).combine_chunks()
            self._pieces = []
            src = e["src_url"].to_numpy(zero_copy_only=False)
            dst = e["dst_url"].to_numpy(zero_copy_only=False)
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            self._src = src
            uniq_src, counts = np.unique(src, return_counts=True)
            self.inv_outdeg = np.repeat(1.0 / counts, counts)
            self._src_uniq = uniq_src
            dpart = (pd.util.hash_array(dst) % np.uint64(self.P)).astype(np.int32)
            for q in np.unique(dpart):
                sel = np.flatnonzero(dpart == q)
                uniq, inv = np.unique(dst[sel], return_inverse=True)
                self.targets.append((int(q), sel, inv.astype(np.int64), uniq))
        else:
            self._src = np.empty(0, dtype=object)
            self._src_uniq = np.empty(0, dtype=object)
            self.inv_outdeg = np.empty(0, dtype=np.float64)

    def handshake(self) -> dict:
        """{target part: ref(dst url dictionary)} — shipped once; every
        later round sends only a value vector aligned to this dictionary."""
        return {
            q: ray.put(pa.array(uniq, pa.string())) for q, _, _, uniq in self.targets
        }

    def build_nodes(self, incoming: list) -> int:
        """Assemble this partition's node slice from local srcs plus the
        dst dictionaries received from every sender (self included); the
        dangling mask is 'never a src anywhere' — and since hash(src)
        routes ALL of a url's out-edges here, local absence is global
        absence. Returns the node count for the driver's global n."""
        src_uniq = self._src_uniq
        dicts = [
            (p, ray.get(ref).to_numpy(zero_copy_only=False))
            for p, ref in sorted(incoming, key=lambda x: x[0])
        ]
        self.urls = np.unique(np.concatenate([src_uniq] + [a for _, a in dicts]))
        self._idx = pd.Index(self.urls)
        self.src_pos = self._idx.get_indexer(self._src)  # hash(src)=p ⇒ all hit
        self._pos_cache = {p: self._idx.get_indexer(a) for p, a in dicts}
        m = np.ones(len(self.urls), dtype=np.float64)
        if len(src_uniq):
            m[self._idx.get_indexer(src_uniq)] = 0.0
        self.m = m
        return len(self.urls)

    def init_ranks(self, n: int, damping: float) -> None:
        self.n = n
        self.damping = damping
        self.s = None  # uniform teleport unless set_seeds/scale_seeds runs
        self.rank = np.full(len(self.urls), 1.0 / n, dtype=np.float64)

    def set_seeds(self, piece: pa.Table) -> float:
        """Personalized teleport, phase 1: store this partition's slice of
        the seed set (pushed by hash(url) like everything else); seeds not
        present in the graph are dropped. Returns the locally-matched
        weight so the driver can normalize over matched seeds only."""
        urls = piece["url"].to_numpy(zero_copy_only=False)
        w = piece["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = self._idx.get_indexer(urls)
        ok = pos >= 0
        self._seed_pos, self._seed_w = pos[ok], w[ok]
        return float(self._seed_w.sum())

    def scale_seeds(self, total: float) -> None:
        """Phase 2: normalize to a distribution and restart from it (the
        standard personalized-PageRank r₀ = s)."""
        s = np.zeros(len(self.urls), dtype=np.float64)
        if len(getattr(self, "_seed_pos", ())):
            s[self._seed_pos] = self._seed_w / total
        self.s = s
        self.rank = s.copy()

    def accept_ranks(self, piece: pa.Table) -> None:
        """Checkpoint-restore receiver: one hash(url)=p slice of a saved
        (url, rank) table, pushed the same way edges are."""
        self._rank_pieces = getattr(self, "_rank_pieces", [])
        self._rank_pieces.append(piece)

    def apply_ranks(self) -> int:
        """Overwrite the freshly-initialized ranks with checkpointed
        values; every checkpoint url must exist in this partition (same
        edge set ⇒ same node set). Returns rows applied (driver sanity:
        Σ == n)."""
        applied = 0
        for piece in getattr(self, "_rank_pieces", []):
            urls = piece["url"].to_numpy(zero_copy_only=False)
            pos = self._idx.get_indexer(urls)
            if (pos < 0).any():
                raise ValueError(
                    "pagerank checkpoint does not match this edge set "
                    f"({int((pos < 0).sum())} unknown urls)"
                )
            self.rank[pos] = piece["rank"].to_numpy()
            applied += len(urls)
        self._rank_pieces = []
        return applied

    def scatter(self):
        d_p = float(np.sum(self.rank * self.m))
        c = self.rank[self.src_pos] * self.inv_outdeg
        out: dict[int, "ray.ObjectRef"] = {}
        for q, sel, inv, uniq in self.targets:
            vals = np.bincount(inv, weights=c[sel], minlength=len(uniq))
            out[q] = ray.put(vals)
        return out, d_p

    def gather(self, d_total: float, contribs: list) -> None:
        if self.s is None:
            base = (1.0 - self.damping) / self.n + self.damping * d_total / self.n
            new = np.full(len(self.urls), base, dtype=np.float64)
        else:
            # personalized teleport: restart mass and dangling mass both
            # land on the seed distribution instead of uniformly
            new = (1.0 - self.damping + self.damping * d_total) * self.s
        for p, ref in sorted(contribs, key=lambda x: x[0]):
            new[self._pos_cache[p]] += self.damping * ray.get(ref)
        self.rank = new

    def ranks_ref(self) -> "ray.ObjectRef":
        return ray.put(
            pa.table(
                {
                    "url": pa.array(self.urls, pa.string()),
                    "rank": pa.array(self.rank),
                }
            )
        )

    # ---- HITS (hubs & authorities) --------------------------------------

    def init_hits(self) -> None:
        self.h = np.ones(len(self.urls), dtype=np.float64)
        self.a = np.ones(len(self.urls), dtype=np.float64)

    def auth_scatter(self, inv_nh: float):
        """a-half: send Σ h[src] per unique dst (multiplicity preserved —
        each edge row contributes once), hub normalization applied lazily."""
        hs = self.h[self.src_pos] * inv_nh
        return {
            q: ray.put(np.bincount(inv, weights=hs[sel], minlength=len(uniq)))
            for q, sel, inv, uniq in self.targets
        }

    def auth_gather(self, contribs: list) -> float:
        new = np.zeros(len(self.urls), dtype=np.float64)
        for p, ref in sorted(contribs, key=lambda x: x[0]):
            new[self._pos_cache[p]] += ray.get(ref)
        self.a = new
        return float(np.square(new).sum())  # partial ‖a‖² for the driver

    def hub_backscatter(self, inv_na: float):
        """h-half, phase 1: the dst-side owner returns its (lazily
        normalized) authority values aligned to each sender's handshake
        dictionary — the reverse edge direction without a dst-keyed copy."""
        return {
            p: ray.put(self.a[pos] * inv_na) for p, pos in self._pos_cache.items()
        }

    def hub_gather(self, backs: list) -> float:
        """h-half, phase 2: per-edge authority = dict values[inv]; bincount
        onto this partition's src rows, accumulated in target order."""
        new = np.zeros(len(self.urls), dtype=np.float64)
        by_q = dict(
            (q, ray.get(ref)) for q, ref in sorted(backs, key=lambda x: x[0])
        )
        for q, sel, inv, uniq in self.targets:
            vals = by_q[q][inv]
            new += np.bincount(self.src_pos[sel], weights=vals, minlength=len(new))
        self.h = new
        return float(np.square(new).sum())

    def hits_ref(self, inv_nh: float, inv_na: float) -> "ray.ObjectRef":
        return ray.put(
            pa.table(
                {
                    "url": pa.array(self.urls, pa.string()),
                    "hub": pa.array(self.h * inv_nh),
                    "auth": pa.array(self.a * inv_na),
                }
            )
        )


# coarse shuffle fan-out: groups are the unit of parallelism for the local
# merges, so ≥ the sandbox's useful core count; each group holds
# O(edges / P) rows. A cluster run raises it with the corpus.
def _nparts() -> int:
    """Coarse-partition count for the graph shuffles, resolved once per
    pipeline call: 2× the executor's effective CPU budget (min 8) so the
    per-superstep map_groups tasks keep every core busy with slack for
    stragglers. A fixed count is a scale bug — at cluster scale partitions
    must grow with the machine, and every call site within one pipeline
    shares the value captured at build time (co-location requires one
    consistent modulus per exchange)."""
    from crawler_ray.pipelines.common import effective_cpus

    return max(8, 2 * effective_cpus())


def _nparts_for(rows: int) -> int:
    """Data-aware partition count for iterative exchanges: ``_nparts()``
    capped so each partition carries ≥~32k rows. A small graph split into
    2×CPUs partitions pays per-round task scheduling (~the whole round's
    wall at 10^5 edges) for compute that fits a handful of cores; at real
    scale rows/32k ≫ 2×CPUs and this is exactly ``_nparts()``. Floor 8
    keeps worst-case skew bounded. Call once per pipeline — every exchange
    in one run must share the modulus (co-location)."""
    return max(8, min(_nparts(), int(rows) // 32768 + 1))


_P = 8  # fallback default for direct _part32/_ipart callers


def _part32(vals, nparts: int = _P) -> pa.Array:
    """Deterministic vectorized value → partition id (pandas siphash with
    its fixed default key — stable across worker processes)."""
    if isinstance(vals, (pa.Array, pa.ChunkedArray)):
        vals = vals.to_pandas().to_numpy(dtype=object)
    h = pd.util.hash_array(np.asarray(vals, dtype=object))
    return pa.array((h % np.uint64(nparts)).astype(np.int32))


def _ipart(vals: np.ndarray, nparts: int = _P) -> np.ndarray:
    """Deterministic int64-key → partition id (multiplicative hash)."""
    return (
        (vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(nparts)
    ).astype(np.int32)


def _snapshot(ds: rd.Dataset) -> rd.Dataset:
    """Materialize AND cut the logical plan: return a fresh dataset whose
    plan is just the stored block refs (zero-copy — the arrow blocks stay
    in the object store). ``materialize()`` alone caches blocks but KEEPS
    the lineage plan, and every subsequent execution re-walks/re-optimizes
    it; in an iterative loop whose per-round plan references the previous
    round twice (HITS: contrib ∪ nodes both derive from `scores`) the plan
    tree doubles per round and driver-side plan handling grows 2^rounds —
    measured 0.04 s → 5.4 s per norm pass by round 5. The snapshot makes
    every round O(1) plan work."""
    return rd.from_arrow_refs(ds.materialize().to_arrow_refs())


def _block_sums(ds: rd.Dataset, expr) -> float:
    """Sum ``expr(table) -> float`` over a materialized dataset via
    one-row-per-block partials — O(blocks) driver traffic, never rows."""
    partial = ds.map_batches(
        lambda t: pa.table({"d": pa.array([expr(t)], pa.float64())}),
        batch_format="pyarrow",
    )
    return float(sum(r["d"] for r in partial.take_all()))


def _bsp_setup(edges: rd.Dataset):
    """Shared BSP-layer setup for the iterative link-graph scorers:
    materialize the edges, spawn one ``_GraphBsp`` actor per hash(src)
    partition, stream the edge batches into them (push shuffle — the only
    edge-sized movement in the whole op), factorize routing, and build the
    node slices from the handshake dictionaries. Returns
    (actors, sorted part list, global node count).

    P is 1× the core budget (not the 2× the groupby exchanges use): hash
    partitions are balanced and rounds are turn-based barriers, so extra
    actors add process-spawn cost without straggler slack; the row cap
    keeps small graphs from paying per-round scheduling for sub-32k
    partitions."""
    from crawler_ray.pipelines.common import effective_cpus

    edges = edges.materialize()
    P = max(8, min(max(8, effective_cpus()), edges.count() // 32768 + 1))
    actors = {p: _GraphBsp.options(num_cpus=0).remote(P) for p in range(P)}
    plist = sorted(actors)

    def push(t: pa.Table, _actors=actors) -> pa.Table:
        part = _part32(t["src_url"], P).to_numpy()
        pending = []
        for q in np.unique(part):
            piece = t.filter(pa.array(part == q)).select(["src_url", "dst_url"])
            pending.append(_actors[int(q)].accept.remote(piece))
        ray.get(pending)  # backpressure: the map can't outrun the actors
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    edges.map_batches(push, batch_size=65536, batch_format="pyarrow").materialize()
    ray.get([actors[p].factorize.remote() for p in plist])
    hs = ray.get([actors[p].handshake.remote() for p in plist])
    counts = ray.get(
        [
            actors[q].build_nodes.remote(
                [(p, hs[i][q]) for i, p in enumerate(plist) if q in hs[i]]
            )
            for q in plist
        ]
    )
    return actors, plist, int(sum(counts)), P


def pagerank_edges(
    edges: rd.Dataset,
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    seeds: "dict[str, float] | None" = None,
) -> rd.Dataset:
    """PageRank over an (src_url, dst_url) edge dataset; returns
    (url, rank) with ranks summing to 1. Fixed iteration count keeps the
    computation deterministic (no convergence predicate on floats).
    ``seeds`` ({url: weight}) switches to PERSONALIZED PageRank: restart
    and dangling mass teleport to the normalized seed distribution
    instead of uniformly — the crawl-frontier prioritization variant
    (score pages by proximity to the task's seed roots). Seed slices ship
    hash-partitioned like everything else; seeds absent from the graph
    are dropped and the rest renormalized.

    Iteration shape: a BSP layer of ``_GraphBsp`` partition actors. Setup is
    ONE streaming pass over the edge dataset — each batch splits by
    hash(src) and pushes its slices straight to the owning actors (a push
    shuffle: no sort, no all-to-all barrier, and actor process spawn
    overlaps the pass).  ``factorize`` then sorts each slice
    deterministically and factorizes routing (src→local-row positions,
    dst grouped by target partition with per-target url dictionaries); the
    node slices are built from the handshake dictionaries, so NOTHING
    edge-sized ever rides a Dataset exchange.  Each power round is scatter
    (per-target ``np.bincount``) + gather (positional adds) exchanging
    only small dense float64 vectors.  Earlier designs, in order: two
    groupby executions per round (~1.2 s fixed cost per round regardless
    of CPUs — 10:1 over useful compute on ≤10^6-edge graphs), then a
    sort-shuffle pin pass + a second node-table exchange (together ~15 s
    of a 17 s 2-cpu wall at 2M edges).  The per-actor slice must fit the
    actor heap — the same bound any pinned-partition layout carries; P
    scales with the cluster.

    Checkpoint/resume: with ``checkpoint_dir`` set, the node-sized
    (url, rank) state is written as sharded Parquet after every
    ``checkpoint_every`` iterations (and at completion), with a meta.json
    committed last (write-tmp + atomic rename — the repo's marker
    contract). A rerun rebuilds the graph from the SAME edge input, then
    pushes the newest checkpoint's rank vectors back through the hash
    routing — valid at any P, so a resumed job may use a different
    cluster size — and runs only the remaining iterations. Rank vectors
    round-trip Parquet exactly (float64), so a resumed run is
    bit-identical to an uninterrupted one. At 10^10 urls an iteration is
    expensive; restartability here is the same contract the crawl and the
    shard exporter already honor.
    """
    import json as _json
    import shutil as _shutil

    # adaptive driver cut (the ``_cc_small_cut`` pattern): below the cut a
    # link graph pays more in actor spawn + per-round barriers than the
    # whole computation costs locally, so one vectorized bincount power
    # iteration on the driver replaces the BSP layer — same math to within
    # float association order; the dense pytest oracle (rel 1e-9) pins both
    # paths. Checkpointed runs always take the BSP path (the resume
    # contract lives there). ``CRAWLER_RAY_PR_CUT=0`` disables.
    if checkpoint_dir is None:
        cut = int(os.environ.get("CRAWLER_RAY_PR_CUT", str(1_000_000)))
        if cut > 0:
            edges = edges.materialize()
            if edges.count() <= cut:
                df = edges.select_columns(["src_url", "dst_url"]).to_pandas()
                if len(df) == 0:
                    return rd.from_arrow(
                        pa.table(
                            {"url": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
                        )
                    )
                a = df["src_url"].to_numpy(dtype=object)
                b = df["dst_url"].to_numpy(dtype=object)
                nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
                ai, bi = inv[: len(a)], inv[len(a) :]
                nn = len(nodes)
                outdeg = np.bincount(ai, minlength=nn).astype(np.float64)
                dang = outdeg == 0.0
                inv_out = np.divide(1.0, outdeg, out=np.zeros(nn), where=~dang)
                if seeds:
                    pos = pd.Index(nodes).get_indexer(np.array(list(seeds), dtype=object))
                    w = np.array(list(seeds.values()), dtype=np.float64)
                    ok = pos >= 0
                    # same loud failures as the BSP path: no matched seeds,
                    # or matched seeds carrying zero total weight (a silent
                    # 0/0 here would NaN every rank)
                    if not ok.any() or w[ok].sum() <= 0.0:
                        raise ValueError("no pagerank seed mass present in the edge set")
                    s = np.zeros(nn)
                    s[pos[ok]] = w[ok] / w[ok].sum()
                    r = s.copy()
                else:
                    s = None
                    r = np.full(nn, 1.0 / nn)
                for _ in range(iters):
                    d = float(r[dang].sum())
                    contrib = damping * np.bincount(
                        bi, weights=r[ai] * inv_out[ai], minlength=nn
                    )
                    if s is None:
                        r = (1.0 - damping) / nn + damping * d / nn + contrib
                    else:
                        r = (1.0 - damping + damping * d) * s + contrib
                return rd.from_arrow(
                    pa.table({"url": pa.array(nodes, pa.string()), "rank": pa.array(r)})
                )

    actors, plist, n, P = _bsp_setup(edges)
    if n == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )
    ray.get([actors[p].init_ranks.remote(n, damping) for p in plist])

    seeds_sig = None
    if seeds:
        import hashlib as _hashlib

        items = sorted(seeds.items())
        seeds_sig = _hashlib.md5(repr(items).encode()).hexdigest()
        surls = np.array([u for u, _ in items], dtype=object)
        sw = np.array([float(w) for _, w in items], dtype=np.float64)
        spart = (pd.util.hash_array(surls) % np.uint64(P)).astype(np.int32)
        matched = ray.get(
            [
                actors[q].set_seeds.remote(
                    pa.table(
                        {
                            "url": pa.array(surls[spart == q], pa.string()),
                            "weight": pa.array(sw[spart == q]),
                        }
                    )
                )
                for q in plist
            ]
        )
        total = float(sum(matched))
        if total <= 0:
            raise ValueError("no personalization seed url exists in the graph")
        ray.get([actors[p].scale_seeds.remote(total) for p in plist])

    start_iter = 0
    meta_path = os.path.join(checkpoint_dir, "meta.json") if checkpoint_dir else None
    if checkpoint_dir and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
        if meta["n"] != n or meta["damping"] != damping or meta.get("seeds_sig") != seeds_sig:
            raise ValueError(
                "pagerank checkpoint was written for a different graph/config "
                f"(n={meta['n']} vs {n}, damping={meta['damping']} vs {damping}, "
                f"seeds_sig={meta.get('seeds_sig')} vs {seeds_sig})"
            )
        k = int(meta["iters_done"])
        if k > iters:
            raise ValueError(
                f"checkpoint already at iteration {k} > requested iters={iters}"
            )
        saved = rd.read_parquet(os.path.join(checkpoint_dir, f"ranks_{k:04d}"))

        def push_ranks(t: pa.Table, _actors=actors) -> pa.Table:
            part = _part32(t["url"], P).to_numpy()
            pending = []
            for q in np.unique(part):
                piece = t.filter(pa.array(part == q)).select(["url", "rank"])
                pending.append(_actors[int(q)].accept_ranks.remote(piece))
            ray.get(pending)
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        saved.map_batches(push_ranks, batch_size=65536, batch_format="pyarrow").materialize()
        applied = sum(ray.get([actors[p].apply_ranks.remote() for p in plist]))
        if applied != n:
            raise ValueError(f"checkpoint restored {applied} of {n} node ranks")
        start_iter = k

    def write_checkpoint(done: int) -> None:
        refs = ray.get([actors[p].ranks_ref.remote() for p in plist])
        d = os.path.join(checkpoint_dir, f"ranks_{done:04d}")
        tmp = d + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        rd.from_arrow_refs(refs).write_parquet(tmp)
        _shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        mtmp = meta_path + ".tmp"
        with open(mtmp, "w") as f:
            _json.dump(
                {"iters_done": done, "n": n, "damping": damping, "seeds_sig": seeds_sig},
                f,
            )
        os.replace(mtmp, meta_path)  # meta commits last — torn writes resume older

    for it in range(start_iter, iters):
        outs = ray.get([actors[p].scatter.remote() for p in plist])
        d_total = float(sum(d for _, d in outs))
        ray.get(
            [
                actors[q].gather.remote(
                    d_total,
                    [(p, outs[i][0][q]) for i, p in enumerate(plist) if q in outs[i][0]],
                )
                for q in plist
            ]
        )
        done = it + 1
        if checkpoint_dir and (
            (checkpoint_every > 0 and done % checkpoint_every == 0) or done == iters
        ):
            write_checkpoint(done)
    # detach results from the actors' lifetime: refs → new executor-owned
    # blocks, then the actors (and their pinned state) are released
    final_refs = ray.get([actors[p].ranks_ref.remote() for p in plist])
    out = (
        rd.from_arrow_refs(final_refs)
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    del actors
    return out





def pagerank(sf_dir: str, iters: int = 10, damping: float = 0.85) -> rd.Dataset:
    """PageRank over the synthetic corpus link graph (see
    ``crawl_queries.link_graph``); returns (url, rank_micro) with integer
    micro-ranks for a stable driver schema."""
    from crawler_ray.pipelines.crawl_queries import link_graph

    ranks = pagerank_edges(link_graph(sf_dir), iters=iters, damping=damping)
    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "rank_micro": pc.cast(
                    pc.round(pc.multiply(t["rank"], 1_000_000.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def pagerank_seeded(sf_dir: str, iters: int = 10, damping: float = 0.85) -> rd.Dataset:
    """Personalized PageRank seeded on the crawl task's seed roots — the
    frontier-prioritization scorer (pages ranked by link proximity to the
    seeds, the bias a focused crawler schedules by). Seeds come from the
    corpus seed frontier (uniform weights); rows-only in the driver
    (iterative float algorithm), pinned against a dense personalized
    power-iteration oracle in ``tests/test_graph.py``."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl_queries import link_graph
    from crawler_ray.sources.pages import synth_corpus

    corpus = synth_corpus(sf_dir)
    seed_urls = pq.read_table(corpus.seeds, columns=["url"])["url"].to_pylist()
    ranks = pagerank_edges(
        link_graph(sf_dir),
        iters=iters,
        damping=damping,
        seeds={u: 1.0 for u in seed_urls},
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "rank_micro": pc.cast(
                    pc.round(pc.multiply(t["rank"], 1_000_000.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


# nullable-int64 avoidance sentinel for the CC supersteps (see gather)
_CC_SENT = np.iinfo(np.int64).max


def _cc_small_cut(
    edges: rd.Dataset, src: str, dst: str, cut_rows: int | None = None
) -> "tuple[rd.Dataset, rd.Dataset | None]":
    """Adaptive driver cut shared by both components entry points (the
    ``shuffle_cut`` pattern, ``common.py``): similarity edges are typically
    a tiny fraction of the corpus, and below ``cut_rows`` (default 1M pairs
    ≈ 16 MB of int64 ids — comfortably driver-sized; override with
    ``CRAWLER_RAY_CC_CUT``, 0 disables) a vectorized min-label +
    pointer-jump over local numpy arrays replaces the distributed
    supersteps, whose per-round exchange floor (~1 s/round of pure
    scheduling) dwarfs the compute at that size. Above the cut the caller's
    distributed path runs on the already-materialized edges — identical
    (node, component = min id) labels either way.

    Returns ``(materialized_edges, small_result_or_None)``."""
    if cut_rows is None:
        cut_rows = int(os.environ.get("CRAWLER_RAY_CC_CUT", str(1_000_000)))
    mat = edges.materialize()
    if cut_rows <= 0 or mat.count() > cut_rows:
        return mat, None
    df = mat.select_columns([src, dst]).to_pandas()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
    )
    if len(df) == 0:
        return mat, rd.from_arrow(empty)
    a = df[src].to_numpy(dtype=np.int64)
    b = df[dst].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab
        m = np.minimum(lab[ai], lab[bi])
        lab = lab.copy()
        np.minimum.at(lab, ai, m)
        np.minimum.at(lab, bi, m)
        while True:  # pointer-jump to the round's fixpoint
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, old):
            break
    return mat, rd.from_arrow(
        pa.table({"node": pa.array(nodes), "component": pa.array(nodes[lab])})
    )


def connected_components(
    edges: rd.Dataset, src: str = "u", dst: str = "v", max_iters: int = 50
) -> rd.Dataset:
    """Connected components by min-label propagation; returns
    (node, component) with component = min node id in the component.

    Same pinned-edge iteration shape as ``pagerank_edges``: the undirected
    edge partitions are loaded into the object store ONCE (the same pass
    also seeds the label table, so setup is a single groupby), and each
    superstep is two node-sized exchanges — O(diameter) rounds, the right
    trade for near-dup clusters (tiny diameters); a web-graph-scale CC
    would add pointer-jumping (large-star/small-star) to cut rounds to
    O(log n). Convergence is a streamed changed-row count (one partial per
    block on the driver). Edge sets under the adaptive driver cut
    (``_cc_small_cut``) resolve locally instead."""
    edges, small = _cc_small_cut(edges, src, dst)
    if small is not None:
        return small
    P = _nparts_for(edges.count())

    # undirected, tagged by hash(u); node ids are int64
    def tag_und(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [t[src].combine_chunks().cast(pa.int64()), t[dst].combine_chunks().cast(pa.int64())]
        )
        v = pa.concat_arrays(
            [t[dst].combine_chunks().cast(pa.int64()), t[src].combine_chunks().cast(pa.int64())]
        )
        return pa.table(
            {
                "u": u,
                "v": v,
                "part": pa.array(_ipart(np.asarray(u), P)),
            }
        )

    cache = _PartCache.options(num_cpus=0).remote()

    def load_part(g: pd.DataFrame) -> pd.DataFrame:
        """Pin this partition's edges AND seed its labels in one pass."""
        p = int(g["part"].iat[0])
        tbl = pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64)),
                "v": pa.array(g["v"].to_numpy().astype(np.int64)),
            }
        )
        ray.get(cache.put.remote(p, tbl))
        uu = np.unique(g["u"].to_numpy())
        return pd.DataFrame(
            {"u": uu.astype(np.int64), "label": uu.astype(np.int64),
             "part": np.full(len(uu), p, dtype=np.int32)}
        )

    labels = (
        edges.map_batches(tag_und, batch_size=65536, batch_format="pyarrow")
        .groupby("part")
        .map_groups(load_part, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    if labels.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    refs = ray.get(cache.get_all.remote())  # {part: ObjectRef(arrow edges)}

    def scatter(g: pd.DataFrame) -> pd.DataFrame:
        """label rows of one hash(u) partition: read the pinned edge
        partition, send each node's label to its neighbors, pre-aggregated
        by min."""
        p = int(g["part"].iat[0])
        ref = refs.get(p)
        if ref is None:
            return pd.DataFrame({"u": [], "nbr": [], "part": []}).astype(
                {"u": "int64", "nbr": "int64", "part": "int32"}
            )
        e = ray.get(ref)  # zero-copy arrow read from the local store
        nbr = pd.Series(e["u"].to_numpy()).map(
            pd.Series(g["label"].to_numpy(), index=g["u"].to_numpy())
        )
        out = (
            pd.DataFrame({"u": e["v"].to_numpy(), "nbr": nbr.to_numpy()})
            .groupby("u", sort=False)["nbr"]
            .min()
        )
        uu = out.index.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"u": uu, "nbr": out.to_numpy().astype(np.int64), "part": _ipart(uu, P)}
        )

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        # INT64_MAX sentinels, not nulls: a nullable int64 arrow column
        # becomes float64 in pandas, and min() through float64 silently
        # corrupts node ids above 2^53 (hashed-url id range). The sentinel
        # keeps every array int64 end-to-end; min() against the sentinel
        # is the identity, matching the old null semantics exactly.
        is_lab = g["nbr"] == _CC_SENT if "nbr" in g else pd.Series(True, index=g.index)
        lab = g[is_lab]
        inc = g[~is_lab]
        m = inc.groupby("u", sort=False)["nbr"].min()
        got = m.reindex(lab["u"].to_numpy(), fill_value=_CC_SENT).to_numpy()
        old = lab["label"].to_numpy()
        new = np.minimum(old, got)
        return pd.DataFrame(
            {
                "u": lab["u"].to_numpy(),
                "label": new,
                "changed": (new < old).astype(np.int64),
                "part": lab["part"].to_numpy(),
            }
        )

    for _ in range(max_iters):
        inc = (
            labels.groupby("part")
            .map_groups(scatter, batch_format="pandas")
            .map_batches(
                lambda t: pa.table(
                    {
                        "u": t["u"],
                        "label": pa.array(
                            np.full(t.num_rows, _CC_SENT, np.int64)
                        ),
                        "nbr": t["nbr"],
                        "part": pc.cast(t["part"], pa.int32()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        lab_b = labels.map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "label": t["label"],
                    "nbr": pa.array(np.full(t.num_rows, _CC_SENT, np.int64)),
                    "part": t["part"],
                }
            ),
            batch_format="pyarrow",
        )
        new_labels = _snapshot(
            inc.union(lab_b)
            .groupby("part")
            .map_groups(gather, batch_format="pandas")
        )
        changed = _block_sums(
            new_labels, lambda t: float(pc.sum(t["changed"]).as_py() or 0)
        )
        labels = _snapshot(new_labels.map_batches(
            lambda t: pa.table({"u": t["u"], "label": t["label"], "part": t["part"]}),
            batch_size=65536,  # re-bundle: union+groupby doubles blocks per round
            batch_format="pyarrow",
        ))
        if changed == 0:
            break
    return labels.map_batches(
        lambda t: pa.table({"node": t["u"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def hits_edges(edges: rd.Dataset, iters: int = 20) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg '99) over an (src_url, dst_url)
    edge list; per iteration ``a ∝ Aᵀh`` then ``h ∝ Aa``, each L2-normalized
    — the other classic link-analysis scorer next to PageRank.

    Iteration shape: the shared ``_GraphBsp`` layer (see ``_bsp_setup`` /
    the class docstring). The auth half-step scatters hub mass along the
    forward routing exactly like PageRank; the hub half-step runs BACKWARD
    along the same handshake dictionaries — each dst-side owner returns
    its authority values aligned to the sender's dictionary and the sender
    bincounts them onto its src rows — so ONE src-partitioned edge layout
    serves both directions (the previous design pinned every edge twice
    under both endpoints and ran two Dataset groupby exchanges per
    half-step, ~1.2 s fixed cost each regardless of CPUs). L2 norms ride
    as O(P) scalar partials and are applied lazily; fixed iteration count
    keeps it deterministic."""
    # adaptive driver cut — same knob and rationale as pagerank_edges
    # (CRAWLER_RAY_PR_CUT, 0 disables): below it two bincounts per round on
    # the driver replace actor spawn + four barrier rounds per iteration;
    # normalization is a scalar per half-step, so the value stream is the
    # same math to float association order (dense oracle pins both paths).
    cut = int(os.environ.get("CRAWLER_RAY_PR_CUT", str(1_000_000)))
    if cut > 0:
        edges = edges.materialize()
        if edges.count() <= cut:
            df = edges.select_columns(["src_url", "dst_url"]).to_pandas()
            if len(df) == 0:
                return rd.from_arrow(
                    pa.table(
                        {
                            "url": pa.array([], pa.string()),
                            "hub": pa.array([], pa.float64()),
                            "auth": pa.array([], pa.float64()),
                        }
                    )
                )
            av = df["src_url"].to_numpy(dtype=object)
            bv = df["dst_url"].to_numpy(dtype=object)
            nodes, inv = np.unique(np.concatenate([av, bv]), return_inverse=True)
            ai, bi = inv[: len(av)], inv[len(av) :]
            nn = len(nodes)
            h = np.ones(nn)
            a = np.ones(nn)
            for _ in range(iters):
                a = np.bincount(bi, weights=h[ai], minlength=nn)
                na = float(np.linalg.norm(a))
                if na > 0:
                    a /= na
                h = np.bincount(ai, weights=a[bi], minlength=nn)
                nh = float(np.linalg.norm(h))
                if nh > 0:
                    h /= nh
            return rd.from_arrow(
                pa.table(
                    {
                        "url": pa.array(nodes, pa.string()),
                        "hub": pa.array(h),
                        "auth": pa.array(a),
                    }
                )
            )

    actors, plist, n, _P = _bsp_setup(edges)
    if n == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "hub": pa.array([], pa.float64()),
                      "auth": pa.array([], pa.float64())}))
    ray.get([actors[p].init_hits.remote() for p in plist])
    nh = na = 1.0
    for _ in range(iters):
        inv_nh = 1.0 / nh if nh > 0 else 0.0
        outs = ray.get([actors[p].auth_scatter.remote(inv_nh) for p in plist])
        sq = ray.get(
            [
                actors[q].auth_gather.remote(
                    [(p, outs[i][q]) for i, p in enumerate(plist) if q in outs[i]]
                )
                for q in plist
            ]
        )
        na = float(np.sqrt(sum(sq)))
        inv_na = 1.0 / na if na > 0 else 0.0
        backs = ray.get([actors[q].hub_backscatter.remote(inv_na) for q in plist])
        sqh = ray.get(
            [
                actors[p].hub_gather.remote(
                    [(q, backs[j][p]) for j, q in enumerate(plist) if p in backs[j]]
                )
                for p in plist
            ]
        )
        nh = float(np.sqrt(sum(sqh)))
    ih = 1.0 / nh if nh > 0 else 0.0
    ia = 1.0 / na if na > 0 else 0.0
    final_refs = ray.get([actors[p].hits_ref.remote(ih, ia) for p in plist])
    out = (
        rd.from_arrow_refs(final_refs)
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    del actors
    return out


def hits_scores(sf_dir: str, iters: int = 8) -> rd.Dataset:
    """HITS over the synthetic corpus link graph; integer micro-scores for
    a stable schema, pytest-pinned against a dense power-iteration oracle.
    Driver-gated through ``hits`` (4 iterations — each HITS iteration costs
    two full exchange rounds, 2× PageRank's)."""
    from crawler_ray.pipelines.crawl_queries import link_graph

    return hits_edges(link_graph(sf_dir), iters=iters).map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "hub_micro": pc.cast(pc.round(pc.multiply(t["hub"], 1_000_000.0)), pa.int64()),
                "auth_micro": pc.cast(pc.round(pc.multiply(t["auth"], 1_000_000.0)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def connected_components_ls(
    edges: rd.Dataset, src: str = "u", dst: str = "v", max_rounds: int = 60
) -> rd.Dataset:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    2014) — the pointer-jumping scale path: O(log n) rounds regardless of
    component diameter, where min-label propagation
    (``connected_components``) needs O(diameter) supersteps (a 10^4-long
    path graph would take 10^4 rounds there and ~14 here).

    Each half-round is ONE coarse-partition exchange of the current edge
    multiset plus a vectorized run-boundary pass — no per-node groups, no
    driver-held graph. Convergence = the canonical edge multiset's hash sum
    repeating (block partials, O(blocks) driver traffic). At the fixed
    point every component is a star centered at its min node; the label
    table falls out of the final edges. Edge sets under the adaptive driver
    cut (``_cc_small_cut``) resolve locally instead."""
    edges, small = _cc_small_cut(edges, src, dst)
    if small is not None:
        return small
    P = _nparts_for(edges.count())

    def seed(t: pa.Table) -> pa.Table:
        u = t[src].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[dst].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = u != v
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    def large_tag(t: pa.Table) -> pa.Table:
        # both directions so every node sees its full neighborhood
        u = np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()])
        v = np.concatenate([t["v"].to_numpy(), t["u"].to_numpy()])
        return pa.table({"u": u, "v": v, "part": pa.array(_ipart(u, P))})

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "v"], kind="mergesort", ignore_index=True)
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(u)]))
        m = np.minimum(np.minimum.reduceat(v, starts), u[starts])  # min(Γ(u) ∪ {u})
        keep = v > u  # attach only larger neighbors to the min
        out = pd.DataFrame({"u": v[keep], "v": m[run][keep]})
        out = out[out["u"] != out["v"]].drop_duplicates(ignore_index=True)
        return out

    def small_tag(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        a = np.maximum(u, v)  # child (larger endpoint)
        b = np.minimum(u, v)
        return pa.table({"a": a, "b": b, "part": pa.array(_ipart(a, P))})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["a", "b"]).sort_values(
            ["a", "b"], kind="mergesort", ignore_index=True
        )
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        run = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(a)]))
        m = np.minimum.reduceat(b, starts)  # all b < a, so min(Γ⁻ ∪ {a}) = min(b)
        mb = m[run]
        keep = b != mb  # smaller neighbors re-attach to the min…
        out = pd.DataFrame(
            {
                "u": np.concatenate([b[keep], a[starts]]),  # …plus the center itself
                "v": np.concatenate([mb[keep], m]),
            }
        )
        return out.drop_duplicates(ignore_index=True)

    def edge_hash_sum(t: pa.Table) -> float:
        a = np.maximum(t["u"].to_numpy(), t["v"].to_numpy()).astype(np.uint64)
        b = np.minimum(t["u"].to_numpy(), t["v"].to_numpy()).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
        # 24-bit per-row fold keeps every partial and the driver total an
        # exact float64 integer (≤2^40 per 64k block, ≤2^51 overall); the
        # (count, hash-sum) pair is the convergence signature
        return float((h >> np.uint64(40)).sum())

    def edge_hash_sum2(t: pa.Table) -> float:
        # Second INDEPENDENT fold (different multipliers + low bits): a
        # collision must now happen in both folds simultaneously for
        # convergence to be declared early on distinct edge multisets.
        a = np.maximum(t["u"].to_numpy(), t["v"].to_numpy()).astype(np.uint64)
        b = np.minimum(t["u"].to_numpy(), t["v"].to_numpy()).astype(np.uint64)
        h = (a * np.uint64(0xFF51AFD7ED558CCD)) ^ (b * np.uint64(0xC4CEB9FE1A85EC53))
        return float((h & np.uint64(0xFFFFFF)).sum())

    def selfloop_rows(t: pa.Table) -> pa.Table:
        # parity with the small cut and with connected_components: a node
        # whose only edge is a self-loop is still IN the graph and labels
        # as its own singleton component. Routed through the same label
        # partitions; dedup's groupby-min prefers a real component label
        # when the node also has proper edges.
        u = t[src].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[dst].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = np.unique(u[u == v])
        return pa.table({"node": n, "comp": n, "part": pa.array(_ipart(n, P))})

    sloops = edges.map_batches(selfloop_rows, batch_format="pyarrow").materialize()

    cur = edges.map_batches(seed, batch_format="pyarrow").materialize()
    if cur.count() == 0 and sloops.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    prev_sig = None
    for _ in range(max_rounds):
        cur = _snapshot(
            cur.map_batches(large_tag, batch_size=65536, batch_format="pyarrow")
            .groupby("part")
            .map_groups(large_star, batch_format="pandas")
            .map_batches(small_tag, batch_size=65536, batch_format="pyarrow")
            .groupby("part")
            .map_groups(small_star, batch_format="pandas")
            .map_batches(lambda t: t.select(["u", "v"]), batch_format="pyarrow")
        )
        sig = (
            cur.count(),
            _block_sums(cur, edge_hash_sum),
            _block_sums(cur, edge_hash_sum2),
        )
        if sig == prev_sig:
            break
        prev_sig = sig

    def labels(t: pa.Table) -> pa.Table:
        a = np.maximum(t["u"].to_numpy(), t["v"].to_numpy())
        b = np.minimum(t["u"].to_numpy(), t["v"].to_numpy())
        node = np.concatenate([a, b])
        comp = np.concatenate([b, b])
        return pa.table(
            {"node": node, "comp": comp, "part": pa.array(_ipart(node, P))}
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False, as_index=False)["comp"].min()
        return out.rename(columns={"comp": "component"}).astype(
            {"node": "int64", "component": "int64"}
        )

    lab_stream = cur.map_batches(labels, batch_size=65536, batch_format="pyarrow")
    if sloops.count():
        # self-loop singleton rows ride the same partitions; groupby-min
        # keeps the real component for nodes that also have proper edges
        lab_stream = lab_stream.union(sloops)
    return lab_stream.groupby("part").map_groups(dedup, batch_format="pandas")


def dedup_clusters(sf_dir: str, min_jacc: int = 50, method: str = "minlabel") -> rd.Dataset:
    """Near-duplicate clusters: connected components over the
    ``prefix_jaccard_pairs`` similarity edges at ``min_jacc`` percent.
    Returns (doc_id, cluster_id, cluster_size) for every doc in at least
    one qualifying pair; cluster_id = smallest doc_id in the cluster, the
    canonical representative a keep-one dedup pass would retain.
    ``method='ls'`` runs the large-star/small-star O(log n)-round variant
    instead of min-label propagation — same output, same oracle."""
    from crawler_ray.pipelines.dedup import prefix_jaccard_pairs

    pairs = prefix_jaccard_pairs(sf_dir).map_batches(
        lambda t, mj=min_jacc: t.filter(pc.greater_equal(t["jacc_pct"], mj)),
        batch_format="pyarrow",
    )
    cc = connected_components_ls if method == "ls" else connected_components
    comp = cc(pairs, src="a_id", dst="b_id")

    P = _nparts()

    # size per component + join back, via the same coarse-partition trick
    def tag_comp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "component": t["component"],
                "part": pa.array(_ipart(np.asarray(t["component"]), P)),
            }
        )

    def sized(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("component", sort=False)["node"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": g["node"],
                "cluster_id": g["component"],
                "cluster_size": sz.astype("int64"),
            }
        )

    return comp.map_batches(tag_comp, batch_format="pyarrow").groupby("part").map_groups(
        sized, batch_format="pandas"
    )


def _tri_small_cut(eds: rd.Dataset, src: str, dst: str) -> "pa.Table | None":
    """Adaptive driver cut for triangle counting (the ``_cc_small_cut``
    pattern): below ``CRAWLER_RAY_TRI_CUT`` edges (default 100k — wedge
    volume is O(m^1.5), so the local bound is ~3×10^7 pair checks) the
    whole count runs as one vectorized local pass — same orientation, same
    wedge closure, none of the ~4 Dataset executions whose fixed cost
    dwarfs the compute at that size. Returns None above the cut."""
    cut = int(os.environ.get("CRAWLER_RAY_TRI_CUT", "100000"))
    if cut <= 0 or eds.count() > cut:
        return None
    df = eds.select_columns([src, dst]).to_pandas()
    a = pd.util.hash_array(df[src].to_numpy(dtype=object)).astype(np.int64)
    b = pd.util.hash_array(df[dst].to_numpy(dtype=object)).astype(np.int64)
    u, v = np.minimum(a, b), np.maximum(a, b)
    keep = u != v
    e = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
    if not len(e):
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    nodes, inv = np.unique(
        np.concatenate([e["u"].to_numpy(), e["v"].to_numpy()]), return_inverse=True
    )
    n = len(nodes)
    deg = np.bincount(inv, minlength=n)
    ui, vi = inv[: len(e)], inv[len(e) :]
    fwd = (deg[ui] < deg[vi]) | ((deg[ui] == deg[vi]) & (ui < vi))
    aa = np.where(fwd, ui, vi)  # lower-ordered center
    bb = np.where(fwd, vi, ui)
    o = np.lexsort((bb, deg[bb], aa))  # neighbors in (deg, id) order per center
    aa, bb = aa[o], bb[o]
    packed = np.sort(aa.astype(np.int64) * n + bb)  # oriented edge keys
    starts = np.flatnonzero(np.r_[True, aa[1:] != aa[:-1]])
    ends = np.r_[starts[1:], len(aa)]
    total = 0
    for s, t in zip(starts, ends):  # runs are few and small by orientation
        if t - s < 2:
            continue
        nb = bb[s:t]
        i, j = np.triu_indices(len(nb), k=1)
        keys = nb[i].astype(np.int64) * n + nb[j]
        pos = np.searchsorted(packed, keys)
        pos = np.minimum(pos, len(packed) - 1)
        total += int((packed[pos] == keys).sum())
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def triangle_count_edges(edges: rd.Dataset, src: str = "src_url", dst: str = "dst_url") -> pa.Table:
    """Distributed triangle count over an undirected edge list.

    Node-iterator with degree orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    orient every edge toward the higher (degree, id) endpoint, generate
    wedges only from each node's *outgoing* (higher-ordered) neighbors —
    bounding total wedge volume by O(m^1.5) even on power-law graphs where
    the naive per-node pairs blow up on hubs — then close wedges against
    the oriented edge set, co-located by a coarse hash partition of the
    wedge endpoints (no Dataset.join).

    Degrees are broadcast as sorted arrays (node-table-sized: fine for a
    host graph; for a 10^10-node page graph attach degrees with the same
    two coarse-partition passes the PageRank setup uses instead).
    Below the adaptive cut (``_tri_small_cut``) the identical count runs
    locally instead.
    """
    eds = edges.materialize()
    small = _tri_small_cut(eds, src, dst)
    if small is not None:
        return small
    P = _nparts()

    def canon(t: pa.Table) -> pa.Table:
        a = pd.util.hash_array(t[src].to_pandas().to_numpy(dtype=object)).astype(np.int64)
        b = pd.util.hash_array(t[dst].to_pandas().to_numpy(dtype=object)).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v  # self-loops close no triangles
        return pa.table(
            {
                "u": pa.array(u[keep]),
                "v": pa.array(v[keep]),
                "part": pa.array(_ipart(u[keep], P)),
            }
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v", "part"]]

    # distinct undirected edges, co-located by hash(u) (u==min endpoint, so
    # a duplicate edge always lands in one partition)
    und = (
        eds.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()
    )

    # global degrees: per-block endpoint counts, driver-reduced (node-sized)
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [t["u"].to_numpy(zero_copy_only=False), t["v"].to_numpy(zero_copy_only=False)]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq), "deg": pa.array(cnt.astype(np.int64))})

    degs = (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("node", as_index=False)["deg"]
        .sum()
    )
    import ray

    deg_ref = ray.put((degs.node.to_numpy(), degs.deg.to_numpy()))

    # orient toward higher (deg, id); re-partition by the LOWER-ordered
    # endpoint so each center's outgoing neighbors co-locate
    def orient(t: pa.Table, ref=deg_ref) -> pa.Table:
        nodes, deg = ray.get(ref)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        du = deg[np.searchsorted(nodes, u)]
        dv = deg[np.searchsorted(nodes, v)]
        fwd = (du < dv) | ((du == dv) & (u < v))
        a = np.where(fwd, u, v)  # lower-ordered center
        b = np.where(fwd, v, u)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "part": pa.array(_ipart(a, P))})

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: per center, all unordered pairs of outgoing neighbors, keyed
    # (x, y) in (deg, id) order so they match the oriented edge exactly
    def wedges(g: pd.DataFrame, ref=deg_ref) -> pd.DataFrame:
        nodes, deg = ray.get(ref)
        xs: list[np.ndarray] = []
        ys: list[np.ndarray] = []
        for _, nb in g.groupby("a", sort=False)["b"]:
            n = nb.to_numpy()
            if len(n) < 2:
                continue
            d = deg[np.searchsorted(nodes, n)]
            n = n[np.lexsort((n, d))]  # ascending (deg, id)
            i, j = np.triu_indices(len(n), k=1)
            xs.append(n[i])
            ys.append(n[j])
        if not xs:
            return pd.DataFrame({"x": np.empty(0, np.int64), "y": np.empty(0, np.int64)})
        return pd.DataFrame({"x": np.concatenate(xs), "y": np.concatenate(ys)})

    wedge_ds = (
        oriented.groupby("part")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "part2", pa.array(_ipart(t["x"].to_numpy(zero_copy_only=False), P))
            ),
            batch_format="pyarrow",
        )
    )
    edge_keys = oriented.map_batches(
        lambda t: pa.table(
            {
                "x": t["a"],
                "y": t["b"],
                "part2": pa.array(_ipart(t["a"].to_numpy(zero_copy_only=False), P)),
            }
        ),
        batch_format="pyarrow",
    )

    # close wedges: oriented edges and wedges co-partition on hash(x)
    # (x is the lower-ordered endpoint on both sides), so the match is a
    # partition-local pandas merge — two marker columns distinguish the
    # unioned sides without a join operator
    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["is_edge"].to_numpy() == 1
        e = g[is_edge][["x", "y"]].drop_duplicates()
        w = g[~is_edge]
        n = int(w.merge(e, on=["x", "y"]).shape[0])
        return pd.DataFrame({"n": [n]})

    tagged = wedge_ds.map_batches(
        lambda t: t.append_column("is_edge", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    ).union(
        edge_keys.map_batches(
            lambda t: t.append_column("is_edge", pa.array(np.ones(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
    )
    total = int(
        tagged.groupby("part2")
        .map_groups(close_part, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def triangle_count(sf_dir: str) -> pa.Table:
    """Triangles in the near-duplicate similarity graph
    (``prefix_jaccard_pairs`` at ≥50% Jaccard) — a clique-ness audit of
    the dedup clusters: transitive near-dup groups show up as triangle
    mass, chains (A~B~C but A≁C) as its absence. (The crawl link graph is
    generationally acyclic by construction, so it has no triangles —
    pinned as such in the pytest.)"""
    from crawler_ray.pipelines.dedup import prefix_jaccard_pairs

    pairs = prefix_jaccard_pairs(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t["jacc_pct"], 50)),
        batch_format="pyarrow",
    )
    return triangle_count_edges(pairs, src="a_id", dst="b_id")


def dedup_clusters_ls(sf_dir: str) -> rd.Dataset:
    """``dedup_clusters`` via the large-star/small-star pointer-jumping
    components — the O(log n)-round web-scale path, checked against the
    SAME recursive-CTE oracle as the min-label variant."""
    return dedup_clusters(sf_dir, method="ls")


def hits(sf_dir: str) -> rd.Dataset:
    """Driver-gated HITS entry: ``hits_scores`` at a small fixed iteration
    count (4 — enough to separate hubs from authorities deterministically;
    the per-iteration cost is two full exchange rounds). Rows-only in the
    driver (iterative float algorithm); semantics are pinned against a
    dense power-iteration oracle in ``tests/test_graph.py``."""
    return hits_scores(sf_dir, iters=4)


QUERIES = {
    "pagerank": pagerank,
    "pagerank_seeded": pagerank_seeded,
    "hits": hits,
    "dedup_clusters": dedup_clusters,
    "dedup_clusters_ls": dedup_clusters_ls,
    "triangle_count": triangle_count,
}

_TRIANGLE_ORACLE = """
    WITH tok AS (
        SELECT doc_id, SUBSTR(text, 1, 100) AS p,
               LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS toks
        FROM documents
        QUALIFY ROW_NUMBER() OVER (PARTITION BY SUBSTR(text, 1, 100)
                                   ORDER BY doc_id) <= 256),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
        WHERE CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) > 0
              THEN (100 * LEN(LIST_INTERSECT(a.toks, b.toks)))
                   // LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
              ELSE 0 END >= 50),
    e AS (SELECT DISTINCT LEAST(a_id, b_id) AS u, GREATEST(a_id, b_id) AS v
          FROM pairs WHERE a_id <> b_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""

ORACLE_SQL: dict[str, str] = {
    "triangle_count": _TRIANGLE_ORACLE,
    "dedup_clusters": """
        WITH RECURSIVE tok AS (
            SELECT doc_id, SUBSTR(text, 1, 100) AS p,
                   LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS toks
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY SUBSTR(text, 1, 100)
                                       ORDER BY doc_id) <= 256),
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
            WHERE CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) > 0
                  THEN (100 * LEN(LIST_INTERSECT(a.toks, b.toks)))
                       // LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
                  ELSE 0 END >= 50),
        edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                  UNION SELECT b_id, a_id FROM pairs),
        reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS doc_id, CAST(MIN(v) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY u)
        SELECT c.doc_id, c.cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
                   AS cluster_size
        FROM comp c
    """,
}

# the LS variant computes the same clusters — same oracle
ORACLE_SQL["dedup_clusters_ls"] = ORACLE_SQL["dedup_clusters"]
