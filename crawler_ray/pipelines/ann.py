"""Similarity search over the ``embeddings`` table.

- **Brute-force cosine top-k** (the baseline, SQL-oracled): the query matrix
  ships once via ``ray.put``; every batch matmuls against it and emits only
  its local top-k per query, so the driver-side merge sees
  O(#batches × Q × k) rows, never the corpus. All arithmetic is float64 so
  the unnest-based double-precision DuckDB oracle hashes identically.
- **LSH-bucketed ANN** (the scale path, rows-only): random-hyperplane
  signatures (Charikar '02) bucket the corpus; queries probe their bucket ∪
  hamming-1 neighbors. Recall vs brute force is pinned by pytest.

At 100 TB the corpus-side pass stays a streaming map_batches; the LSH
variant's bucket build is one groupby shuffle and each query touches a few
buckets instead of everything.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from crawler_ray.pipelines.common import emb_matrix

NUM_QUERIES = 8
TOP_K = 10


def _emb_paths(sf_dir: str) -> list[str]:
    """Embedding parquet file list: the sf tables are one
    ``embeddings.parquet``; bench scaling corpora write N row-group-aligned
    ``embeddings-NNNN.parquet`` files so the cold read parallelizes across
    workers (sorted order keeps file 0 = the corpus head, preserving the
    first-k seeding contract)."""
    import glob

    p = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(p):
        return [p]
    out = sorted(glob.glob(f"{sf_dir}/embeddings-*.parquet"))
    if not out:
        raise FileNotFoundError(f"no embeddings parquet under {sf_dir}")
    return out


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    # predicate pushdown: only the query rows ever reach the driver — a
    # full-table read here was the corpus-sized driver materialization the
    # rest of this module is designed to avoid
    t = pa.concat_tables(
        pq.read_table(
            p,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", NUM_QUERIES)],
        )
        for p in _emb_paths(sf_dir)
    )
    qids = t["vec_id"].to_numpy()
    qmat = emb_matrix(t["embedding"])
    order = np.argsort(qids)
    return qids[order], qmat[order]


def _cos_e6(row: "np.ndarray") -> "np.ndarray":
    """int64 micro-cosines with DuckDB ROUND (half-away-from-zero)
    semantics — candidate selection and final ranking both run on THIS
    value, so engine and oracle agree at top-k boundaries up to an
    e6-crossing ulp (~1e-10/pair) instead of every raw-float tie.

    Non-finite cosines (a zero-norm vector divides 0/0 → NaN) are mapped to
    -2e6, below any real cosine (≥ -1e6): a NaN fed through ``astype(int64)``
    becomes INT64_MIN, whose negation in ``lexsort((ids, -e6))`` overflows
    back to INT64_MIN and ranks the degenerate vector FIRST. Callers
    additionally mask non-finite candidates out entirely."""
    v = np.where(np.isfinite(row), row, -2.0) * 1e6
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)


def ann_bruteforce_topk(sf_dir: str) -> pa.Table:
    """Top-k cosine neighbors for the first NUM_QUERIES vectors (self
    excluded), rank-ordered (cos desc, vec_id asc)."""
    qids, qmat = _load_queries(sf_dir)
    qnorm = np.linalg.norm(qmat, axis=1)
    q_ref = ray.put((qids, qmat, qnorm))

    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table, ref=q_ref) -> pa.Table:
        qids, qmat, qnorm = ray.get(ref)
        bids = t["vec_id"].to_numpy()
        bmat = emb_matrix(t["embedding"])
        bnorm = np.linalg.norm(bmat, axis=1)
        cos = (qmat @ bmat.T) / np.outer(qnorm, bnorm)  # Q × B
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            # exclude self AND zero-norm (NaN-cosine) vectors BEFORE
            # ranking: feeding ±inf/NaN through the int64 cast in _cos_e6
            # yields INT64_MIN, and -INT64_MIN in the lexsort key overflows
            # back to INT64_MIN, sorting the degenerate entry FIRST
            valid = (bids != qids[qi]) & np.isfinite(cos[qi])
            vbids = bids[valid]
            if len(vbids) == 0:
                continue
            e6 = _cos_e6(cos[qi][valid])
            k = min(TOP_K, len(vbids))
            idx = np.lexsort((vbids, -e6))[:k]
            for j in idx:
                out_q.append(int(qids[qi]))
                out_v.append(int(vbids[j]))
                out_c.append(int(e6[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_e6": pa.array(out_c, pa.int64()),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(partial)


def _merge_topk(partial: rd.Dataset) -> pa.Table:
    """Driver merge of per-batch local top-k rows: O(batches × Q × k),
    never corpus-sized; shared by all ANN variants."""
    heaps: dict[int, list] = {}
    for bt in partial.iter_batches(batch_format="pyarrow"):
        for q, v, c in zip(
            bt["query_id"].to_pylist(), bt["vec_id"].to_pylist(), bt["cos_e6"].to_pylist()
        ):
            heapq.heappush(heaps.setdefault(q, []), (c, -v))
            if len(heaps[q]) > TOP_K:
                heapq.heappop(heaps[q])
    out_q, out_r, out_v, out_c = [], [], [], []
    for q in sorted(heaps):
        best = sorted(heaps[q], key=lambda t: (-t[0], -t[1]))
        for rank, (c, negv) in enumerate(best, 1):
            out_q.append(q)
            out_r.append(rank)
            out_v.append(-negv)
            out_c.append(int(c))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_e6": pa.array(out_c, pa.int64()),
        }
    )


def _hyperplanes(dim: int, nbits: int, ntables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((ntables, nbits, dim))


def _buckets_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(ntables, n) bucket ids per table."""
    ntables, nbits, _ = planes.shape
    out = np.zeros((ntables, len(mat)), dtype=np.int64)
    for t in range(ntables):
        bits = (mat @ planes[t].T) > 0
        for b in range(nbits):
            out[t] |= bits[:, b].astype(np.int64) << b
    return out


def ann_lsh_topk(
    sf_dir: str, nbits: int = 10, ntables: int = 24, multiprobe: int = 1
) -> pa.Table:
    """Multi-table hyperplane LSH: a vector is a candidate for a query if it
    shares a probed bucket in ANY of ``ntables`` independent tables.
    ``multiprobe=1`` additionally probes each query bucket's hamming-1
    neighbors (query-side only — corpus signatures are computed once),
    trading candidate fraction for recall without more tables. Measured on
    the unclustered gaussian corpus at sf0.001: recall 0.80 at 26% of the
    corpus scored (the r1 12×6-bit no-multiprobe config was 0.54 at 19%);
    pytest pins both.

    One streaming map_batches pass does signatures + per-query candidate
    masking + local exact top-k — the r1 version concat'd all candidates
    (~20% of the corpus) onto the driver for re-ranking, which at 100 TB is
    a driver OOM. Now the driver merge sees O(batches × Q × k) rows, the
    same shape as the brute-force baseline."""
    qids, qmat = _load_queries(sf_dir)
    planes = _hyperplanes(qmat.shape[1], nbits, ntables)
    qbuckets = _buckets_of(qmat, planes)  # (ntables, Q)
    # probe set per (table, query): the bucket itself + hamming-<=multiprobe
    # neighbors, as a (ntables, Q, n_probes) array
    probes = [qbuckets]
    # all bucket codes within hamming-<=multiprobe (the old loop only ever
    # flipped single bits, so multiprobe=2 silently behaved as 1)
    import itertools

    for d in range(1, multiprobe + 1):
        for bits in itertools.combinations(range(nbits), d):
            mask = 0
            for b in bits:
                mask |= 1 << b
            probes.append(qbuckets ^ mask)
    qprobes = np.stack(probes, axis=2)  # (ntables, Q, P)
    qnorm = np.linalg.norm(qmat, axis=1)
    q_ref = ray.put((qids, qmat, qnorm, qprobes))
    planes_ref = ray.put(planes)

    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table, qref=q_ref, plref=planes_ref) -> pa.Table:
        qids, qmat, qnorm, qpr = ray.get(qref)
        planes = ray.get(plref)
        bids = t["vec_id"].to_numpy()
        mat = emb_matrix(t["embedding"])
        bks = _buckets_of(mat, planes)  # (ntables, n)
        # candidate mask per query: shares any probed bucket in ANY table
        match = np.zeros((len(qids), len(bids)), dtype=bool)
        for tt in range(planes.shape[0]):
            for p in range(qpr.shape[2]):
                match |= bks[tt][None, :] == qpr[tt, :, p][:, None]
        match &= bids[None, :] != qids[:, None]  # exclude self
        cos = (qmat @ mat.T) / np.outer(qnorm, np.linalg.norm(mat, axis=1))
        match &= np.isfinite(cos)  # exclude zero-norm (NaN-cosine) vectors
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            sel = np.flatnonzero(match[qi])
            if not sel.size:
                continue
            row = cos[qi, sel]
            k = min(TOP_K, sel.size)
            e6 = _cos_e6(row)
            idx = np.lexsort((bids[sel], -e6))[:k]
            for j in idx:
                out_q.append(int(qids[qi]))
                out_v.append(int(bids[sel[j]]))
                out_c.append(int(e6[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_e6": pa.array(out_c, pa.int64()),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(partial)


def _spherical_kmeans(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Lloyd iterations on unit vectors (cosine k-means); deterministic."""
    rng = np.random.default_rng(seed)
    s = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = s[rng.choice(len(s), size=min(k, len(s)), replace=False)].copy()
    for _ in range(iters):
        assign = (s @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = s[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_ivf_topk(
    sf_dir: str, n_centroids: int = 64, nprobe: int = 8, train_rows: int = 4096
) -> pa.Table:
    """IVF (inverted-file) ANN — the coarse-quantization scale path:

    1. train spherical k-means centroids on a deterministic sample (first
       ``train_rows`` in storage order — at 100 TB this is a bounded
       sample-and-train step, centroids broadcast via ``ray.put``);
    2. each query probes its ``nprobe`` nearest centroids;
    3. one streaming corpus pass assigns each vector to its centroid and
       computes exact local top-k per query restricted to probed cells;
    4. the driver merge sees O(batches × Q × k) rows.

    Fraction of corpus scored ≈ nprobe / n_centroids (cell sizes are
    near-uniform on this gaussian corpus). Recall vs brute force is pinned
    by pytest."""
    import pyarrow.parquet as pq

    qids, qmat = _load_queries(sf_dir)
    # iter_batches' batch_size is a MAX (a row-group boundary can hand back
    # fewer) — accumulate until train_rows rows, same as kmeans_fit, so the
    # k-means sample never silently shrinks below n_centroids
    chunks = []
    got = 0
    for path in _emb_paths(sf_dir):
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(batch_size=train_rows, columns=["embedding"]):
            chunks.append(np.vstack(batch.column("embedding").to_pylist()))
            got += len(chunks[-1])
            if got >= train_rows:
                break
        if got >= train_rows:
            break
    sample = np.concatenate(chunks)[:train_rows].astype(np.float64)
    cent = _spherical_kmeans(sample, n_centroids)

    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qsims = qn @ cent.T  # (Q, C)
    nprobe = min(nprobe, cent.shape[0])
    q_cells = np.argsort(-qsims, axis=1)[:, :nprobe]  # (Q, nprobe)
    qnorm = np.linalg.norm(qmat, axis=1)
    q_ref = ray.put((qids, qmat, qnorm, q_cells))
    cent_ref = ray.put(cent)

    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table, qref=q_ref, cref=cent_ref) -> pa.Table:
        qids, qmat, qnorm, q_cells = ray.get(qref)
        cent = ray.get(cref)
        bids = t["vec_id"].to_numpy()
        mat = emb_matrix(t["embedding"])
        bnorm = np.linalg.norm(mat, axis=1)
        assign = ((mat / bnorm[:, None]) @ cent.T).argmax(axis=1)  # (n,)
        # match[q, n] = vector n's cell is probed by query q
        match = (q_cells[:, :, None] == assign[None, None, :]).any(axis=1)
        match &= bids[None, :] != qids[:, None]
        cos = (qmat @ mat.T) / np.outer(qnorm, bnorm)
        match &= np.isfinite(cos)  # exclude zero-norm (NaN-cosine) vectors
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            sel = np.flatnonzero(match[qi])
            if not sel.size:
                continue
            row = cos[qi, sel]
            k = min(TOP_K, sel.size)
            e6 = _cos_e6(row)
            idx = np.lexsort((bids[sel], -e6))[:k]
            for j in idx:
                out_q.append(int(qids[qi]))
                out_v.append(int(bids[sel[j]]))
                out_c.append(int(e6[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_e6": pa.array(out_c, pa.int64()),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(partial)


KNN_K = 5


@ray.remote
def _knn_block(ta: pa.Table, block_refs: list, k: int) -> pa.Table:
    """Exact top-k neighbors for ONE source block against the whole corpus,
    streamed one corpus block at a time: memory is two blocks plus k
    candidates per source row, never the corpus. Similarities are ranked on
    the ROUNDED integer ``cos_e6`` (ties broken by neighbor id) so the
    ordering is bit-stable across engines — a float rank would be at the
    mercy of summation order."""
    ids_a = ta["vec_id"].to_numpy()
    mat_a = emb_matrix(ta["embedding"]).astype(np.float64)
    norm_a = np.linalg.norm(mat_a, axis=1)
    src_l, nbr_l, cos_l = [], [], []
    for ref in block_refs:  # nested refs: fetched one at a time, not all at once
        tb = ray.get(ref)
        if tb.num_rows == 0:
            continue
        ids_b = tb["vec_id"].to_numpy()
        mat_b = emb_matrix(tb["embedding"]).astype(np.float64)
        cos = (mat_a @ mat_b.T) / np.outer(norm_a, np.linalg.norm(mat_b, axis=1))
        # sentinel -2e6 (below any real e6-cosine, which is >= -1e6) marks
        # self-pairs and zero-norm NaN cosines; INT64_MIN here was a bug —
        # argpartition(-cos_e6) overflows -INT64_MIN back to INT64_MIN, so
        # the sentinel entered every local top-k and the keep-filter then
        # silently dropped the block's k-th best real candidate.
        # _cos_e6: DuckDB ROUND (half-away) semantics, same as every other
        # ANN path — np.round here was half-to-even, a latent oracle
        # divergence on an exactly-.5 micro-cosine
        SENT = -2_000_000
        cos_e6 = _cos_e6(cos)
        cos_e6[ids_a[:, None] == ids_b[None, :]] = SENT  # self
        kk = min(k, len(ids_b))
        part = np.argpartition(-cos_e6, kk - 1, axis=1)[:, :kk]  # local top-k
        rows = np.repeat(np.arange(len(ids_a)), kk)
        cols = part.ravel()
        src_l.append(rows)
        nbr_l.append(np.broadcast_to(ids_b, (len(ids_a), len(ids_b)))[rows, cols])
        cos_l.append(cos_e6[rows, cols])
    if not src_l:
        return pa.table({"vec_id": pa.array([], pa.int64()), "nn_rank": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()), "cos_e6": pa.array([], pa.int64())})
    src = np.concatenate(src_l)
    nbr = np.concatenate(nbr_l).astype(np.int64)
    ce6 = np.concatenate(cos_l)
    keep = ce6 != -2_000_000
    src, nbr, ce6 = src[keep], nbr[keep], ce6[keep]
    # global top-k per source row: sort (src asc, cos desc, nbr asc), then
    # rank-within-run via position minus run start
    order = np.lexsort((nbr, -ce6, src))
    src, nbr, ce6 = src[order], nbr[order], ce6[order]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    runs = np.diff(np.r_[starts, len(src)])
    rank = np.arange(len(src)) - np.repeat(starts, runs) + 1
    sel = rank <= k
    return pa.table(
        {
            "vec_id": pa.array(ids_a[src[sel]].astype(np.int64)),
            "nn_rank": pa.array(rank[sel].astype(np.int64)),
            "neighbor_id": pa.array(nbr[sel]),
            "cos_e6": pa.array(ce6[sel]),
        }
    )


def knn_graph(sf_dir: str, k: int = KNN_K, num_blocks: int | None = None) -> rd.Dataset:
    """Exact k-nearest-neighbor graph over the embedding corpus (cosine,
    k=5): the building block SemDeDup-style clustering and graph-based
    curation consume. One Ray task per source block streams the corpus
    block-by-block (same block-grid discipline as ``embedding_dup_pairs``:
    the driver holds refs only, O(N²) arithmetic runs distributed with
    bounded memory). For sub-quadratic scale use the IVF/LSH variants —
    this is the exact baseline the pytest recall gates compare against."""
    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])
    if num_blocks:
        emb = emb.repartition(num_blocks)
    blocks = emb.to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()), "nn_rank": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()), "cos_e6": pa.array([], pa.int64())})
        )
    return rd.from_arrow_refs([_knn_block.remote(b, blocks, k) for b in blocks])


_KM_SCALE = 1_000_000  # µ-unit integer partials: exact, order-insensitive sums


def kmeans_fit(
    sf_dir: str, k: int = 16, iters: int = 6, scale: int = _KM_SCALE,
    ds: "rd.Dataset | None" = None,
) -> "np.ndarray":
    """Exact full-corpus Euclidean k-means (Lloyd), the distributed
    trainer complementing the sample-trained ``_spherical_kmeans`` the
    IVF/semdedup paths use.  Per iteration ONE streaming pass: each batch
    assigns rows to the broadcast centroids (vectorized argmin on the
    expanded squared distance) and reduces to per-cluster µ-unit INTEGER
    coordinate sums + counts via a single flattened ``bincount`` — so the
    driver reduce sees O(blocks × k) rows of exact int64 partials, and the
    update is bit-identical regardless of batch boundaries or reduce
    order (the property the pytest oracle pins).  Empty clusters keep
    their previous centroid.  No shuffle at any point; the embedding
    column is decoded ONCE into plasma-pinned Arrow blocks and every
    Lloyd pass re-streams those (parquet decode was ~85%% of the
    per-iteration wall) — at 100 TB the column spills rather than
    re-decodes, and the materialize can be dropped to pure re-streaming
    if plasma+disk can't hold it.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(_emb_paths(sf_dir)[0])
    # accumulate batches until k rows: iter_batches' batch_size is a MAX —
    # a row-group boundary can hand back fewer, and the init contract the
    # pytest oracle pins is "the corpus's first k vectors"
    rows: list = []
    for b in pf.iter_batches(batch_size=max(k, 1), columns=["embedding"]):
        rows.extend(b.column("embedding").to_pylist())
        if len(rows) >= k:
            break
    if len(rows) < k:
        raise ValueError(f"k-means needs >= k={k} vectors, corpus has {len(rows)}")
    cent = np.vstack(rows[:k]).astype(np.float64)
    d = cent.shape[1]
    # ds: caller-shared plasma-pinned blocks (kmeans_clusters passes its
    # assignment input so the disk read+decode happens exactly once)
    col = (
        ds
        if ds is not None
        else rd.read_parquet(_emb_paths(sf_dir), columns=["embedding"]).materialize()
    )

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref, _k=k, _d=d, _s=scale) -> pa.Table:
            c = ray.get(_ref)
            m = emb_matrix(t["embedding"])
            d2 = (m * m).sum(1, keepdims=True) - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
            a = d2.argmin(1)
            q = np.rint(m * _s).astype(np.int64)
            flat = (a[:, None] * _d + np.arange(_d)[None, :]).ravel()
            # float64 bincount is exact here: per-batch |sum| ≤ 65536·scale/2 < 2^53
            sums = np.bincount(flat, weights=q.ravel().astype(np.float64), minlength=_k * _d)
            cnt = np.bincount(a, minlength=_k)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                    "n": pa.array(cnt.astype(np.int64)),
                    "sums": pa.array(
                        list(sums.astype(np.int64).reshape(_k, _d)),
                        pa.list_(pa.int64()),
                    ),
                }
            )

        parts = (
            col.map_batches(partial, batch_size=65536, batch_format="pyarrow")
            .to_pandas()  # O(blocks × k) rows
        )
        g = parts.groupby("cluster")
        n = g["n"].sum().to_numpy()
        sums = np.vstack(
            [np.sum(np.vstack(rows.to_numpy()), axis=0) for _, rows in g["sums"]]
        )
        nz = n > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / (float(scale) * n[nz][:, None])
    return cent


def kmeans_clusters(sf_dir: str, k: int = 16, iters: int = 6) -> rd.Dataset:
    """Per-vector cluster assignment from the exact distributed
    ``kmeans_fit`` trainer — one final streaming pass against the
    broadcast centroids.  Rows-only for the driver (iterative k-means is
    not SQL-expressible); pinned by a pytest oracle running the identical
    integer-exact update rule densely."""
    col = rd.read_parquet(
        _emb_paths(sf_dir), columns=["vec_id", "embedding"]
    ).materialize()
    cent = kmeans_fit(sf_dir, k=k, iters=iters, ds=col)
    ref = ray.put(cent)

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        m = emb_matrix(t["embedding"])
        d2 = (m * m).sum(1, keepdims=True) - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "cluster": pa.array(d2.argmin(1).astype(np.int64)),
            }
        )

    return col.map_batches(assign, batch_size=65536, batch_format="pyarrow")


QUERIES = {
    "kmeans_clusters": kmeans_clusters,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "knn_graph": knn_graph,
}

ORACLE_SQL = {
    "ann_bruteforce_topk": """
        WITH e AS (
            SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS i
            FROM embeddings),
        n AS (SELECT vec_id, SQRT(SUM(x*x)) AS nrm FROM e GROUP BY vec_id),
        d AS (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id, SUM(q.x*e.x) AS dot
            FROM e q JOIN e ON q.i = e.i AND q.vec_id < {nq} AND e.vec_id != q.vec_id
            GROUP BY q.vec_id, e.vec_id),
        cos AS (
            SELECT d.query_id, d.vec_id, d.dot / (na.nrm * nb.nrm) AS c
            FROM d JOIN n na ON na.vec_id = d.query_id JOIN n nb ON nb.vec_id = d.vec_id),
        ranked AS (
            SELECT query_id, vec_id, c,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY CAST(ROUND(c*1e6) AS BIGINT) DESC, vec_id) AS rank
            FROM cos)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
               CAST(ROUND(c*1e6) AS BIGINT) AS cos_e6
        FROM ranked WHERE rank <= {k}
    """.format(nq=NUM_QUERIES, k=TOP_K),
    "knn_graph": """
        WITH e AS (
            SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS i
            FROM embeddings),
        n AS (SELECT vec_id, SQRT(SUM(x*x)) AS nrm FROM e GROUP BY vec_id),
        d AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, SUM(a.x*b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id != b.vec_id
            GROUP BY a.vec_id, b.vec_id),
        cos AS (
            SELECT d.vec_id, d.neighbor_id,
                   CAST(ROUND(1e6 * d.dot / (na.nrm * nb.nrm)) AS BIGINT) AS cos_e6
            FROM d JOIN n na ON na.vec_id = d.vec_id
                   JOIN n nb ON nb.vec_id = d.neighbor_id),
        ranked AS (
            SELECT vec_id, neighbor_id, cos_e6,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos_e6 DESC, neighbor_id) AS nn_rank
            FROM cos)
        SELECT vec_id, CAST(nn_rank AS BIGINT) AS nn_rank, neighbor_id, cos_e6
        FROM ranked WHERE nn_rank <= {k}
    """.format(k=KNN_K),
}
