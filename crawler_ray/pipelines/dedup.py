"""Deduplication operators over the ``documents`` table.

The dedup family a web-scale training-data pipeline needs, each built on the
partitioning primitive that scales it:

- **exact**: hash-partition on content fingerprint → per-group first
  (one groupby shuffle keyed by md5(text); SQL-oracled);
- **blocked n-gram Jaccard**: blocking key (100-char prefix) → per-block
  pairwise token-set Jaccard (groupby(block).map_groups — the blocked
  similarity-join pattern; SQL-oracled);
- **MinHash + LSH**: shingle → minhash signature → band buckets →
  bucket-groupby for candidates → exact-Jaccard verification
  (Broder '97 / Leskovec-Rajaraman-Ullman ch.3; rows-only, pinned by pytest
  against brute force);
- **SimHash**: 64-bit simhash, 4×16-bit pigeonhole bands → hamming-≤3
  verification (Charikar '02, Manku et al. '07; rows-only, pytest-pinned);
- **embedding cosine near-dup**: brute-force double-precision cosine pairs
  over a broadcast matrix (SQL-oracled via an unnest-based double-precision
  oracle — DuckDB's ``list_cosine_similarity`` is float32 and hashes
  differently).

At 100 TB the LSH band-bucket groupby and the fingerprint groupby are the
all-to-all exchanges; candidate verification stays per-bucket-local.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from crawler_ray.pipelines.common import emb_matrix

_TOKEN_RE = re.compile(r"[^ ]+")

# --------------------------------------------------------------- exact dedup


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup: md5(text) fingerprint → groupby(fingerprint) keep the
    smallest doc_id (hash-partitioned first-wins)."""
    from ray.data.aggregate import Count, Min

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps, pa.string())})

    # Adaptive materialize-cut before the sort-based groupby (see
    # common.shuffle_cut: the Sort's resource reservation throttles the
    # fused fingerprint map at small CPU budgets; at large budgets the
    # unconditional cut was itself a 2× bench regression).
    from crawler_ray.pipelines.common import shuffle_cut

    ds = shuffle_cut(docs.map_batches(fp, batch_format="pyarrow"))
    agg = ds.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count")
    )
    import pyarrow.compute as pc

    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "fingerprint": t["fingerprint"],
                "dup_count": pc.cast(t["dup_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def dedup_keep_best(sf_dir: str) -> rd.Dataset:
    """Exact dedup keeping the *best* representative per fingerprint (the
    curation policy: longest doc wins, smallest doc_id breaks ties) —
    fingerprint is md5 of whitespace-normalized lowercased text, so
    near-identical boilerplate copies collapse.

    The argmax is ONE vectorized ``Max`` aggregate: (n_chars, -doc_id) is
    packed into a single int64 key ``n_chars * 2^32 + (2^32-1 - doc_id)``,
    whose numeric max IS the lexicographic winner — no map_groups, no
    per-group pandas, just the groupby shuffle every combiner already
    shrank. (Packing assumes doc_id < 2^32 and n_chars < 2^31; a corpus
    with wider ids packs into two int64 aggregates or a fixed-width binary
    key instead.)"""
    import re as _re

    from ray.data.aggregate import Count, Max

    _ws = _re.compile(r"\s+")
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def fp(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(_ws.sub(" ", s.lower()).strip().encode()).hexdigest()
            for s in t["text"].to_pylist()
        ]
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = n * (1 << 32) + ((1 << 32) - 1 - ids)
        return pa.table(
            {
                "fingerprint": pa.array(fps, pa.string()),
                "best_key": pa.array(key),
            }
        )

    from crawler_ray.pipelines.common import shuffle_cut

    agg = (
        # adaptive cut: keep the fingerprint map un-throttled by the Sort's
        # resource reservation at small CPU budgets (see dedup_exact)
        shuffle_cut(docs.map_batches(fp, batch_format="pyarrow"))
        .groupby("fingerprint")
        .aggregate(Max("best_key", alias_name="best_key"), Count(alias_name="dup_count"))
    )

    def decode(t: pa.Table) -> pa.Table:
        key = t["best_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "fingerprint": t["fingerprint"],
                "doc_id": pa.array(((1 << 32) - 1 - key % (1 << 32)).astype(np.int64)),
                "n_chars": pa.array((key >> 32).astype(np.int64)),
                "dup_count": pc.cast(t["dup_count"], pa.int64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


# ------------------------------------------------- blocked n-gram Jaccard


def prefix_jaccard_pairs(sf_dir: str, block_cap: int = 256) -> rd.Dataset:
    """Blocked similarity join: block on the first 100 chars, compute
    distinct-token Jaccard within each block (pairs a<b).

    Two-pass candidate shape: pass 1 shuffles only 8-byte block hashes
    (coarse-partition counts) to find blocks with ≥2 members — singleton
    blocks (the vast majority of a real corpus) can produce no pairs, so
    their TEXT never rides an exchange.  The multi-block hash set is
    broadcast once (``ray.put``); pass 2 filters the materialized blocked
    table to candidate docs and co-locates each surviving block by hash
    for the within-block pair pass.  The candidate set is dup-family-sized —
    if a corpus ever grew it beyond broadcast size, the fallback is the
    hash-partitioned join the dedup_clusters loser-removal already uses.
    A 64-bit block-hash collision only merges two blocks into one pandas
    group — pair generation re-checks block-string equality, so results
    are unaffected.

    Block membership is capped at the ``block_cap`` smallest doc_ids — a
    boilerplate-heavy corpus can put millions of docs behind one shared
    prefix, and an uncapped block is O(n²) Python in a single task. The
    SQL oracle applies the identical cap (QUALIFY ROW_NUMBER ≤ cap), so
    the semantics stay oracle-exact; beyond-cap members of a degenerate
    block are by construction near-identical boilerplate."""
    import ray

    NPARTS = 64  # blocks co-located by hash — most blocks are singletons,
    # and one pandas group per distinct prefix would be one tiny group per
    # document at corpus scale

    def _bh(texts: np.ndarray) -> np.ndarray:
        blocks = pd.Series(texts).str.slice(0, 100).to_numpy(dtype=object)
        return pd.util.hash_array(blocks)

    # ---- one corpus pass: blocked table materialized, hash-only counts --
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def blocked(t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        blocks = pd.Series(texts).str.slice(0, 100).to_numpy(dtype=object)
        bh = pd.util.hash_array(blocks)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "block": pa.array(blocks, pa.string()),
                "bh": pa.array(bh.astype(np.int64)),
                "part": pa.array((bh % np.uint64(NPARTS)).astype(np.int32)),
                "text": t["text"],
            }
        )

    ds = docs.map_batches(blocked, batch_format="pyarrow").materialize()

    # pass 1 over the materialized table: 8-byte hash counts only
    def count_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(t["bh"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "bh": pa.array(uniq),
                "c": pa.array(cnt.astype(np.int64)),
                "part": pa.array((uniq.astype(np.uint64) % np.uint64(NPARTS)).astype(np.int32)),
            }
        )

    def multi_blocks(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("bh", sort=False)["c"].sum()
        s = s[s >= 2]
        return pd.DataFrame(
            {"bh": s.index.to_numpy(np.int64), "c": s.to_numpy(np.int64)}
        )

    cand_df = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(multi_blocks, batch_format="pandas")
        .to_pandas()  # dup-family-sized; see docstring for fallback
    )
    cand = np.sort(cand_df["bh"].to_numpy(np.int64))
    cand_docs = int(cand_df["c"].sum())  # docs in multi-member blocks
    cand_ref = ray.put(cand)

    # pass 2: only candidate docs' text enters the exchange
    def gate(t: pa.Table, ref=cand_ref) -> pa.Table:
        cand = ray.get(ref)
        bh = t["bh"].to_numpy()
        pos = np.searchsorted(cand, bh)
        hit = np.zeros(len(bh), bool)
        if len(cand):
            inb = pos < len(cand)
            hit[inb] = cand[pos[inb]] == bh[inb]
        return t.filter(pa.array(hit)).drop_columns(["bh"])

    ds = ds.map_batches(gate, batch_format="pyarrow")

    def pairs(g: pd.DataFrame, cap=block_cap) -> pd.DataFrame:
        g = g.sort_values(["block", "doc_id"], kind="mergesort")
        blocks = g["block"].to_numpy()
        ids = g["doc_id"].to_numpy()
        texts = g["text"].to_numpy()
        starts = np.r_[0, np.nonzero(blocks[1:] != blocks[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(blocks)]
        multi = ends - starts >= 2
        a_ids, b_ids, jpct = [], [], []
        for s, e in zip(starts[multi], ends[multi]):
            e = min(e, s + cap)  # block cap (doc_id order — oracle matches)
            toks = [set(_TOKEN_RE.findall(t)) for t in texts[s:e]]
            for i in range(e - s):
                for j in range(i + 1, e - s):
                    inter = len(toks[i] & toks[j])
                    union = len(toks[i] | toks[j])
                    a_ids.append(ids[s + i])
                    b_ids.append(ids[s + j])
                    jpct.append((100 * inter) // union if union else 0)
        return pd.DataFrame(
            {
                "a_id": np.array(a_ids, np.int64),
                "b_id": np.array(b_ids, np.int64),
                "jacc_pct": np.array(jpct, np.int64),
            }
        )

    # adaptive candidate cut (the _cc_small_cut pattern): the count pass
    # already knows how many docs live in multi-member blocks; below the
    # cut the pair pass runs locally on one collect of exactly those rows
    # — strictly cheaper than the groupby exchange it replaces (same gate,
    # no sort). Above it, the coarse-partition exchange runs as before.
    cut = int(os.environ.get("CRAWLER_RAY_PAIRS_CUT", "20000"))
    if cand_docs <= cut:
        g = ds.to_pandas()
        out = pairs(g)
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return (
        ds.groupby("part")
        .map_groups(pairs, batch_format="pandas")
    )

def ngram_jaccard_pairs(sf_dir: str, k: int = 3, block_cap: int = 256) -> rd.Dataset:
    """Blocked word-k-gram (shingle) Jaccard similarity join — the n-gram
    twin of ``prefix_jaccard_pairs``: similarity is over distinct k-token
    shingles (order-sensitive, the resemblance measure MinHash estimates,
    Broder '97), so reordered boilerplate scores low where a bag-of-tokens
    Jaccard scores high.

    Blocking key = the document's first k tokens (its first shingle): any
    pair sharing it is a candidate. Same scale shape as the prefix join —
    blocks co-located by hash (coarse partition, not one pandas group per
    block), membership capped at the ``block_cap`` smallest doc_ids, and
    the oracle applies the identical cap."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    NPARTS = 64

    def blocked(t: pa.Table) -> pa.Table:
        import zlib

        texts = t["text"].to_pylist()
        blocks = [" ".join(_TOKEN_RE.findall(s)[:k]) for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "block": pa.array(blocks, pa.string()),
                "part": pa.array(
                    np.fromiter(
                        (zlib.crc32(b.encode()) % NPARTS for b in blocks),
                        np.int32, len(blocks),
                    )
                ),
                "text": t["text"],
            }
        )

    ds = docs.map_batches(blocked, batch_format="pyarrow").materialize()

    def pairs(g: pd.DataFrame, cap=block_cap) -> pd.DataFrame:
        g = g.sort_values(["block", "doc_id"], kind="mergesort")
        blocks = g["block"].to_numpy()
        ids = g["doc_id"].to_numpy()
        texts = g["text"].to_numpy()
        starts = np.r_[0, np.nonzero(blocks[1:] != blocks[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(blocks)]
        multi = ends - starts >= 2
        a_ids, b_ids, inter_l, union_l, jpct = [], [], [], [], []
        for s, e in zip(starts[multi], ends[multi]):
            e = min(e, s + cap)
            shingles = []
            for t in texts[s:e]:
                toks = _TOKEN_RE.findall(t)
                shingles.append(set(zip(*(toks[j:] for j in range(k)))))
            for i in range(e - s):
                for j in range(i + 1, e - s):
                    inter = len(shingles[i] & shingles[j])
                    union = len(shingles[i] | shingles[j])
                    a_ids.append(ids[s + i])
                    b_ids.append(ids[s + j])
                    inter_l.append(inter)
                    union_l.append(union)
                    jpct.append((100 * inter) // union if union else 0)
        return pd.DataFrame(
            {
                "a_id": np.array(a_ids, np.int64),
                "b_id": np.array(b_ids, np.int64),
                "inter_3grams": np.array(inter_l, np.int64),
                "union_3grams": np.array(union_l, np.int64),
                "jacc_pct": np.array(jpct, np.int64),
            }
        )

    # adaptive cut: a driver-sized blocked table (by doc count — this op
    # has no pre-gate pass to size the candidate family) runs the pair
    # pass locally, skipping the groupby exchange entirely
    cut = int(os.environ.get("CRAWLER_RAY_PAIRS_CUT", "20000"))
    if ds.count() <= cut:
        out = pairs(ds.to_pandas())
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return ds.groupby("part").map_groups(pairs, batch_format="pandas")


def semdedup(
    sf_dir: str,
    n_clusters: int = 64,
    tau_e6: int = 950_000,
    train_rows: int = 4096,
    cluster_cap: int = 4096,
) -> rd.Dataset:
    """SemDeDup-style semantic dedup over the ``embeddings`` table (Abbas
    et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): cluster with sample-trained spherical k-means,
    then within each cluster drop every vector whose cosine to an EARLIER
    (smaller vec_id) cluster member is ≥ tau — keeping one representative
    per semantic near-dup chain without any all-pairs pass over the corpus.

    Scale shape: centroids train on a bounded deterministic sample and
    broadcast via ``ray.put``; assignment is one streaming matmul pass; the
    only exchange is a groupby on cluster id (cells ≈ N / n_clusters, and
    n_clusters grows with the corpus); within-cell work is one gram-matrix
    block. Cells beyond ``cluster_cap`` members dedup against the capped
    earliest prefix only — the same bounded-fanout policy as the blocked
    Jaccard ops (beyond-cap members of a degenerate cell are boilerplate by
    construction). Rows-only for the driver (k-means is not
    SQL-expressible); the drop rule is pinned by pytest against a
    brute-force per-cluster model on constructed clusters.

    Returns (vec_id, cluster, keep, max_prior_cos_e6) — max_prior_cos_e6 =
    -1_000_000 marks "no earlier member" (the cell's first vector).
    """
    from crawler_ray.pipelines.ann import _emb_paths, _spherical_kmeans

    import pyarrow.parquet as pq

    # _emb_paths: the sf tables are one embeddings.parquet; bench scaling
    # corpora write N embeddings-NNNN.parquet files (file 0 = corpus head)
    pf = pq.ParquetFile(_emb_paths(sf_dir)[0])
    batch = next(pf.iter_batches(batch_size=train_rows, columns=["embedding"]))
    sample = np.vstack(batch.column("embedding").to_pylist()).astype(np.float64)
    cent = _spherical_kmeans(sample, n_clusters)
    cent_ref = ray.put(cent)

    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])

    def assign(t: pa.Table, ref=cent_ref) -> pa.Table:
        c = ray.get(ref)
        mat = emb_matrix(t["embedding"])
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        a = ((mat / nrm) @ c.T).argmax(axis=1)
        return t.append_column("cluster", pa.array(a.astype(np.int64)))

    def per_cluster(df: pd.DataFrame, cap=cluster_cap, tau=tau_e6) -> pd.DataFrame:
        df = df.sort_values("vec_id", kind="mergesort")
        m = np.vstack(df["embedding"].to_numpy())
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        m = m / nrm
        n = len(df)
        p = min(n, cap)
        cos = m @ m[:p].T  # n × p; predecessor mask: prefix index < row index
        mask = np.arange(p)[None, :] < np.arange(n)[:, None]
        mx = np.where(mask, cos, -np.inf).max(axis=1) if p else np.full(n, -np.inf)
        mx_e6 = np.where(np.isfinite(mx), np.rint(mx * 1e6), -1e6).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "cluster": df["cluster"].to_numpy(np.int64),
                "keep": mx_e6 < tau,
                "max_prior_cos_e6": mx_e6,
            }
        )

    return (
        emb.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pandas")
    )


# --------------------------------------------------------------- MinHash+LSH

_MERSENNE = (1 << 61) - 1


def _shingles_arr(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique uint64 k-gram hashes, vectorized: per-token md5
    (memoized per worker — vocabularies repeat heavily) + a windowed
    polynomial combine in numpy. The r1 version ran an md5 over the joined
    string of every k-gram (~1 µs × shingles × corpus — the minhash
    pipeline's hot spot)."""
    toks = _TOKEN_RE.findall(text.lower())
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    h = _token_hashes(toks)
    acc = h[:n].copy()
    mult = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio constant
    for j in range(1, k):
        # uint64 wraparound multiply-add: order-sensitive polynomial hash
        acc = acc * mult + h[j : j + n]
    return np.unique(acc)


def _shingles(text: str, k: int = 3) -> set[int]:
    return set(map(int, _shingles_arr(text, k)))


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _signature_arr(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not x.size:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    # (a*x + b) mod p in uint64: universal-ish hashing with wraparound is
    # fine for minhash; order-independent, so set or sorted array agree
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def _signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _signature_arr(np.fromiter(sh, np.uint64, len(sh)), a, b)


def minhash_lsh_dups(
    sf_dir: str,
    num_perm: int = 128,
    bands: int = 32,
    threshold_pct: int = 50,
    bucket_cap: int = 512,
) -> rd.Dataset:
    """MinHash signatures → LSH band buckets (the shuffle) → candidate pairs
    → exact shingle-Jaccard verification. Returns verified pairs
    (a_id, b_id, jacc_pct ≥ threshold).

    Shingle/band/bucket stages are always distributed; the TAIL (pair
    dedup + verification) is size-adaptive — below a row- AND byte-guarded
    cut it resolves on the driver (see the comment at the cut), above it
    every stage is distributed (the r1 version unconditionally collected
    candidate pairs into a driver set and re-scanned the corpus into a
    driver dict — a driver OOM at a real dup rate):

    1. shingle once per doc into a ``list<uint64>`` column (materialized so
       banding AND verification reuse it without re-shingling);
    2. band buckets via ``groupby(band_key)`` — the all-to-all exchange —
       emitting candidate pairs per bucket (bucket membership capped at
       ``bucket_cap`` smallest doc_ids: a degenerate boilerplate bucket is
       one near-dup cluster, and O(cap²) bounds its pair fan-out);
    3. pair-level dedup via a second groupby keyed by (a_id, b_id);
    4. verification joins each side's shingles back by hash-partitioned
       ``Dataset.join`` — candidate-sized, never corpus-sized, and never on
       the driver.
    """
    rows = num_perm // bands
    a, b = _minhash_params(num_perm)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shingle_rows(t: pa.Table) -> pa.Table:
        # sorted uint64 shingles packed to bytes: Acero hash joins reject
        # list<> payload columns, binary passes through fine
        shs = [_shingles_arr(s) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                # _shingles_arr output is already sorted unique
                "sh": pa.array([x.tobytes() for x in shs], pa.binary()),
            }
        )

    # batch_size coalesces the reader's ~800-row blocks to ~8 compute-sized
    # blocks: sh_ds feeds a sort and two joins, and per-piece scheduling on
    # 64 skinny blocks costs more than every UDF in this pipeline combined
    sh_ds = docs.map_batches(
        shingle_rows, batch_size=4096, batch_format="pyarrow"
    ).materialize()

    # the band key doubles as its own coarse partition id (`part` =
    # band_key mod NPARTS): the bucket→pairs groupby then has NPARTS
    # vectorized groups instead of one tiny pandas group per bucket —
    # ~150k per-group applies cost more than the rest of the pipeline
    # combined at sf0.1. NPARTS is the scale knob: each partition holds
    # (total band rows / NPARTS) skinny (doc_id, band_key) rows. 16 keeps
    # every core busy at sandbox scale without flooding the groupby's sort
    # with tiny shuffle pieces; a cluster run raises it with the corpus.
    NPARTS = 16

    def band_rows(t: pa.Table) -> pa.Table:
        # signature matrix for the whole batch, then one vectorized
        # FNV-1a-style mix per (doc, band) — equal band slices get equal
        # keys, different slices collide with ~2^-64 probability, which is
        # all LSH bucketing needs (an earlier per-band md5 loop was 7.7M
        # Python hash calls per 240k docs and dominated the pipeline)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = np.empty((len(ids), bands, rows), dtype=np.uint64)
        for i, sh in enumerate(t["sh"].to_pylist()):
            sigs[i] = _signature_arr(np.frombuffer(sh, dtype=np.uint64), a, b).reshape(
                bands, rows
            )
        prime = np.uint64(0x100000001B3)
        keys = np.full(
            (len(ids), bands),
            np.uint64(0xCBF29CE484222325),
            dtype=np.uint64,
        )
        keys ^= np.arange(bands, dtype=np.uint64)  # band index salts the key
        with np.errstate(over="ignore"):
            for r in range(rows):
                keys = (keys ^ sigs[:, :, r]) * prime
        keys = keys.ravel()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, bands)),
                "band_key": pa.array(keys),
                "part": pa.array((keys % NPARTS).astype(np.int32)),
            }
        )

    # materialize: the banded rows feed a sort-based groupby (an all-to-all
    # barrier); without the cut, the executor's reservation for the Sort
    # throttles band_rows to ~1 concurrent task (31 s vs 5 s at 8 cpus)
    banded = sh_ds.map_batches(band_rows, batch_format="pyarrow").materialize()

    def partition_pairs(g: pd.DataFrame, cap=bucket_cap) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.r_[0, change]
        ends = np.r_[change, len(keys)]
        multi = ends - starts >= 2
        a_out, b_out = [], []
        for s, e in zip(starts[multi], ends[multi]):
            run = np.unique(ids[s:e])[:cap]
            iu, ju = np.triu_indices(len(run), k=1)
            a_out.append(run[iu])
            b_out.append(run[ju])
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_out) if a_out else np.empty(0, np.int64),
                "b_id": np.concatenate(b_out) if b_out else np.empty(0, np.int64),
            }
        )

    cand = banded.groupby("part").map_groups(partition_pairs, batch_format="pandas")
    # pair-level dedup (a pair can surface from up to `bands` buckets, and
    # from different hash partitions): coarse-partition on a pair hash and
    # drop_duplicates vectorized per partition — a fine-key groupby
    # aggregate here sorts the full raw-pair stream by (a_id, b_id) in a
    # handful of tasks and costs more than every other stage combined
    DEDUP_PARTS = 16

    def pair_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["a_id", "b_id"])[["a_id", "b_id"]]
        return out

    cand_mat = cand.materialize()  # raw per-bucket pairs, ≤ bands× the true set
    empty = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
         "jacc_pct": pa.array([], pa.int64())}
    )
    # adaptive tail (the `shuffle_cut` pattern): below the cut the raw pair
    # stream is driver-sized, so pair dedup is one vectorized
    # drop_duplicates, the candidate docs' shingles come back through a
    # broadcast-membership filter over the materialized shingle table (a
    # streaming pass — no join shuffle, corpus never collected), and
    # verification runs on the driver. This replaces one pair-dedup
    # exchange plus TWO hash-join exchanges, each a fixed ~0.5 s of
    # join-actor setup that dwarfed the candidate-sized work at bench
    # scale. The cut is guarded TWICE — pair rows (CRAWLER_RAY_CAND_CUT,
    # default 200k; 0 forces distributed) AND estimated shingle BYTES the
    # driver would collect (avg bytes/doc × candidate docs ≤ ~512 MB) —
    # because a few pairs over huge documents is a driver-OOM shape the
    # row count alone can't see. Above either bound the distributed path
    # below is unchanged.
    cand_cut = int(os.environ.get("CRAWLER_RAY_CAND_CUT", str(200_000)))
    take_driver = cand_cut > 0 and cand_mat.count() <= cand_cut
    cp = None
    if take_driver:
        cp = cand_mat.to_pandas().drop_duplicates(["a_id", "b_id"])
        if cp.empty:
            return rd.from_arrow(empty)
        n_need = cp[["a_id", "b_id"]].stack().nunique()
        est_bytes = sh_ds.size_bytes() / max(1, sh_ds.count()) * n_need
        take_driver = est_bytes <= 512 * 1024 * 1024
    if take_driver:
        a_np = cp["a_id"].to_numpy(dtype=np.int64)
        b_np = cp["b_id"].to_numpy(dtype=np.int64)
        need_ref = ray.put(np.unique(np.concatenate([a_np, b_np])))

        def pick(t: pa.Table, _ref=need_ref) -> pa.Table:
            nd = ray.get(_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, nd)))

        shp = sh_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        shd = dict(zip(shp["doc_id"], shp["sh"]))
        a_ids, b_ids, jpct = [], [], []
        for x, y in zip(a_np, b_np):
            sa = np.frombuffer(shd[x], dtype=np.uint64)
            sb = np.frombuffer(shd[y], dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            pct = (100 * inter) // union if union else 0
            if pct >= threshold_pct:
                a_ids.append(int(x))
                b_ids.append(int(y))
                jpct.append(int(pct))
        return rd.from_arrow(
            pa.table(
                {
                    "a_id": pa.array(a_ids, pa.int64()),
                    "b_id": pa.array(b_ids, pa.int64()),
                    "jacc_pct": pa.array(jpct, pa.int64()),
                }
            )
        )

    cand_u = (
        cand_mat.map_batches(
            lambda t: pa.table(
                {
                    "a_id": t["a_id"],
                    "b_id": t["b_id"],
                    "pp": pa.array(
                        (
                            (
                                t["a_id"].to_numpy().astype(np.uint64)
                                * np.uint64(0x9E3779B97F4A7C15)
                                + t["b_id"].to_numpy().astype(np.uint64)
                            )
                            % DEDUP_PARTS
                        ).astype(np.int32)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("pp")
        .map_groups(pair_part, batch_format="pandas")
        .materialize()  # candidate-pair-sized, not corpus-sized
    )
    if cand_u.count() == 0:
        return rd.from_arrow(empty)

    # verification: join shingle lists for both sides (hash shuffle sized by
    # the candidate set)
    j1 = cand_u.join(sh_ds, join_type="inner", num_partitions=4,
                     on=("a_id",), right_on=("doc_id",))
    j1 = j1.map_batches(
        lambda t: pa.table({"a_id": t["a_id"], "b_id": t["b_id"], "sh_a": t["sh"]}),
        batch_format="pyarrow",
    )
    j2 = j1.join(sh_ds, join_type="inner", num_partitions=4,
                 on=("b_id",), right_on=("doc_id",))

    def verify(t: pa.Table, thr=threshold_pct) -> pa.Table:
        a_ids, b_ids, jpct = [], [], []
        for x, y, sa, sb in zip(
            t["a_id"].to_pylist(), t["b_id"].to_pylist(),
            t["sh_a"].to_pylist(), t["sh"].to_pylist(),
        ):
            sa = np.frombuffer(sa, dtype=np.uint64)
            sb = np.frombuffer(sb, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            pct = (100 * inter) // union if union else 0
            if pct >= thr:
                a_ids.append(x)
                b_ids.append(y)
                jpct.append(pct)
        return pa.table(
            {
                "a_id": pa.array(a_ids, pa.int64()),
                "b_id": pa.array(b_ids, pa.int64()),
                "jacc_pct": pa.array(jpct, pa.int64()),
            }
        )

    # materialize once (verified pairs are small): the count probe and the
    # caller's consumption must not re-run the join shuffles
    out = j2.map_batches(verify, batch_format="pyarrow").materialize()
    # normalize the empty-result schema (joins can drop to zero rows)
    return out if out.count() else rd.from_arrow(empty)


# ------------------------------------------------------------------- SimHash


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _window_occurrences(t: pa.Table, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Every k-token window occurrence of a batch, CORPUS-FLAT: returns
    (doc_id, pos, rolling_hash) arrays.  One dictionary-encode hashes each
    DISTINCT token once, one k-step numpy rolling pass covers the whole
    batch, and windows crossing a document boundary are masked out — the
    per-document Python loop this replaces was ~70%% of the span-op walls.
    Hash semantics are bit-identical to the per-doc version (same token
    md5s, same splitmix multiplier), which the span-op pytest oracles pin."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
    raw_lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "")
    doc_of_raw = np.repeat(np.arange(len(ids), dtype=np.int64), raw_lens)
    mask_np = nonempty.to_numpy(zero_copy_only=False)
    doc_of = doc_of_raw[mask_np]
    lens = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
    flat = flat.filter(nonempty)
    enc = flat.dictionary_encode()
    dhash = _token_hashes(enc.dictionary.to_pylist())
    h = dhash[enc.indices.to_numpy(zero_copy_only=False)]
    n = len(h) - k + 1
    if n <= 0:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = h[:n].copy()
    for j in range(1, k):
        acc = acc * mult + h[j : j + n]
    valid = doc_of[:n] == doc_of[k - 1 : k - 1 + n]
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    d = doc_of[:n][valid]
    pos = np.flatnonzero(valid) - starts[d]
    return ids[d], pos.astype(np.int64), acc[valid]


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """md5-derived uint64 per token, memoized per worker process (token
    vocabularies repeat heavily across documents)."""
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            if len(cache) > 1_000_000:  # bound worker memory
                cache.clear()
            h = cache[tok] = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        out[i] = h
    return out


def _simhash64(tokens: list[str]) -> int:
    """Charikar simhash: one vectorized (n_tokens × 64) bit-vote pass per
    document (the r1 version did 64 numpy ops PER TOKEN)."""
    if not tokens:
        return 0
    hs = _token_hashes(tokens)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    weights = (np.uint64(1) << shifts)[acc > 0]
    return int(weights.sum(dtype=np.uint64))


def _simhash64_batch(rows: np.ndarray, hs: np.ndarray, ndocs: int) -> np.ndarray:
    """Vectorized Charikar simhash for a whole batch: per-bit token votes
    accumulated per doc via bincount over the flat token array — 64 array
    passes per BATCH instead of a (tokens × 64) matrix per DOCUMENT.
    Bit-identical to ``_simhash64`` applied per document (the pytest pins
    that equivalence)."""
    out = np.zeros(ndocs, np.uint64)
    for b in range(64):
        v = (((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1).astype(
            np.float64
        )
        # float64 weights are exact for any realistic token count (< 2^53)
        acc = np.bincount(rows, weights=v, minlength=ndocs)
        out |= (acc > 0).astype(np.uint64) << np.uint64(b)
    return out


def simhash_dups(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit simhash, pigeonhole blocking on 4
    16-bit chunks (hamming ≤ 3 ⇒ one chunk identical), hamming
    verification. Blocks co-locate by hash partition (one pandas group per
    distinct 16-bit bucket would be ~singleton groups at any scale) and the
    cross-band pair dedup is a vectorized aggregate, not per-pair groups."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    NPARTS = 64

    def sh(t: pa.Table) -> pa.Table:
        # batch tokenize (same token set as _TOKEN_RE.findall on lowered
        # text: RE2 complement-split + empty filter), then one vectorized
        # simhash pass and a vectorized 4-band explode
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern="[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        vals = toks.values.to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(n), dtype=np.int64), n)
        keep = vals != ""
        hs = _token_hashes(vals[keep])
        h64 = _simhash64_batch(rows[keep], hs, len(n))
        dids = t["doc_id"].to_numpy()
        ids = np.repeat(dids, 4)
        h_rep = np.repeat(h64, 4)
        c = np.tile(np.arange(4, dtype=np.uint64), len(dids))
        chunk = (h_rep >> (np.uint64(16) * c)) & np.uint64(0xFFFF)
        karr = (c.astype(np.int64) << 16) | chunk.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "block": pa.array(karr),
                "part": pa.array((karr % NPARTS).astype(np.int32)),
                "simhash": pa.array(h_rep),
            }
        )

    # materialize: cut the simhash map from the downstream sort-groupby so
    # the executor's Sort reservation can't throttle it (see dedup_exact)
    banded = docs.map_batches(sh, batch_format="pyarrow").materialize()

    def pairs(g: pd.DataFrame, maxh=max_hamming) -> pd.DataFrame:
        g = g.drop_duplicates(["block", "doc_id"]).sort_values(
            ["block", "doc_id"], kind="mergesort"
        )
        blocks = g["block"].to_numpy()
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        starts = np.r_[0, np.nonzero(blocks[1:] != blocks[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(blocks)]
        multi = ends - starts >= 2
        a_ids, b_ids, ham = [], [], []
        for s, e in zip(starts[multi], ends[multi]):
            run_h = hs[s:e]
            run_i = ids[s:e]
            # vectorized pairwise hamming within the bucket
            iu, ju = np.triu_indices(e - s, k=1)
            x = run_h[iu] ^ run_h[ju]
            d = np.zeros(len(x), dtype=np.int64)
            while x.any():
                d += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            ok = d <= maxh
            a_ids.append(run_i[iu[ok]])
            b_ids.append(run_i[ju[ok]])
            ham.append(d[ok])
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pd.DataFrame(
            {"a_id": cat(a_ids), "b_id": cat(b_ids), "hamming": cat(ham)}
        )

    out = banded.groupby("part").map_groups(pairs, batch_format="pandas")
    return pair_min_dedup(out)


def pair_min_dedup(out: rd.Dataset) -> rd.Dataset:
    """Cross-band (a_id, b_id) min-hamming dedup shared by the pigeonhole
    near-dup ops (``simhash_dups``, ``multimodal.media_dedup_near``): the
    bands can emit the same pair up to #bands times with equal hamming.
    Below the adaptive cut (``CRAWLER_RAY_PAIR_CUT``, default 2M rows; 0
    forces the distributed path) the pair stream is driver-sized and one
    vectorized pandas groupby replaces the fine-key distributed
    min-aggregate's fixed sort-exchange; above it the distributed
    aggregate handles an arbitrarily large pair set."""
    out_mat = out.materialize()
    empty = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    cut = int(os.environ.get("CRAWLER_RAY_PAIR_CUT", str(2_000_000)))
    if cut > 0 and out_mat.count() <= cut:
        dfp = out_mat.to_pandas()
        # a zero-BLOCK stream (empty corpus) yields a DataFrame with no
        # columns at all, not just no rows — column access would KeyError
        if dfp.empty:
            return rd.from_arrow(empty)
        m = dfp.groupby(["a_id", "b_id"], as_index=False)["hamming"].min()
        return rd.from_arrow(
            pa.table(
                {
                    "a_id": pa.array(m["a_id"].to_numpy(dtype=np.int64)),
                    "b_id": pa.array(m["b_id"].to_numpy(dtype=np.int64)),
                    "hamming": pa.array(m["hamming"].to_numpy(dtype=np.int64)),
                }
            )
        )
    from ray.data.aggregate import Min

    return (
        out_mat.groupby(["a_id", "b_id"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .map_batches(
            lambda t: pa.table(
                {
                    "a_id": pc.cast(t["a_id"], pa.int64()),
                    "b_id": pc.cast(t["b_id"], pa.int64()),
                    "hamming": pc.cast(t["hamming"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


# -------------------------------------------------- embedding cosine near-dup


@ray.remote
def _cos_block_pair(
    ta: pa.Table, tb: pa.Table, threshold_e6: int, same_block: bool
) -> pa.Table:
    """One cell of the block-pair grid: exact cosine between two Arrow
    blocks, emitting each unordered pair over the threshold exactly once,
    canonically oriented (a_id < b_id). Memory is two blocks, never the
    corpus.

    The diagonal cell (``same_block``) keeps the upper triangle; a CROSS
    cell sees each unordered pair once in the bipartite product and must
    keep it regardless of which side holds the larger id — a ``b > a``
    mask there silently drops every pair whose larger id lives in the
    earlier block, and multi-file / parallel reads interleave blocks so
    block order is NOT id-monotonic (regression-pinned by
    ``test_emb_multifile_corpus_matches_single_file``)."""
    if ta.num_rows == 0 or tb.num_rows == 0:
        return pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
                         "cos_e6": pa.array([], pa.int64())})
    ids_a = ta["vec_id"].to_numpy()
    mat_a = np.vstack(ta["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ids_b = tb["vec_id"].to_numpy()
    mat_b = np.vstack(tb["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    cos = (mat_a @ mat_b.T) / np.outer(
        np.linalg.norm(mat_a, axis=1), np.linalg.norm(mat_b, axis=1)
    )
    cos_e6 = np.round(cos * 1e6).astype(np.int64)
    if same_block:
        mask = (cos_e6 >= threshold_e6) & (ids_b[None, :] > ids_a[:, None])
    else:
        mask = (cos_e6 >= threshold_e6) & (ids_b[None, :] != ids_a[:, None])
    r, c = np.nonzero(mask)
    lo, hi = ids_a[r].astype(np.int64), ids_b[c].astype(np.int64)
    return pa.table(
        {
            "a_id": pa.array(np.minimum(lo, hi)),
            "b_id": pa.array(np.maximum(lo, hi)),
            "cos_e6": pa.array(cos_e6[r, c]),
        }
    )


def embedding_dup_pairs(
    sf_dir: str, threshold_e6: int = 300_000, num_blocks: int | None = None
) -> rd.Dataset:
    """Near-dup pairs by embedding cosine ≥ threshold (double precision,
    exact — matches the SQL oracle bit-for-bit).

    An exact threshold join is inherently all-pairs; the scale question is
    WHERE the O(N²) runs. Here: the corpus is cut into Arrow blocks that
    stay in the object store (``to_arrow_refs`` — the driver holds refs
    only, unlike the r1 version which concat'd the whole matrix onto the
    driver and broadcast it), and each of the B(B+1)/2 block pairs is one
    Ray task doing a bounded-memory matmul. Output is a Dataset assembled
    from the result refs — never a driver table. The Dataset API has no
    pairwise cross-product primitive, hence raw tasks for the grid
    (per-brief: raw Ray only where the Dataset API can't express it).
    For sub-quadratic scale semantics use LSH/ANN (``ann_lsh_topk``) — an
    exact-threshold oracle can't be bucketed without losing recall.
    """
    from crawler_ray.pipelines.ann import _emb_paths

    emb = rd.read_parquet(_emb_paths(sf_dir), columns=["vec_id", "embedding"])
    if num_blocks:
        emb = emb.repartition(num_blocks)
    blocks = emb.to_arrow_refs()
    refs = [
        _cos_block_pair.remote(blocks[i], blocks[j], threshold_e6, i == j)
        for i in range(len(blocks))
        for j in range(i, len(blocks))
    ]
    if not refs:
        return rd.from_arrow(
            pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
                      "cos_e6": pa.array([], pa.int64())})
        )
    return rd.from_arrow_refs(refs)


_EMB_COS_CTE = """
    WITH e AS (
        SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings),
    n AS (SELECT vec_id, SQRT(SUM(x*x)) AS nrm FROM e GROUP BY vec_id),
    d AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.x*b.x) AS dot
        FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id),
    cos AS (
        SELECT d.a_id, d.b_id,
               CAST(ROUND(1e6 * d.dot / (na.nrm * nb.nrm)) AS BIGINT) AS cos_e6
        FROM d JOIN n na ON na.vec_id = d.a_id JOIN n nb ON nb.vec_id = d.b_id)
"""

# ------------------------------------------------ span-level exact substring


def dup_spans(sf_dir: str, k: int = 8, parts: int = 16) -> rd.Dataset:
    """Span-level exact-substring duplication profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for each
    document, how many of its distinct k-token windows occur verbatim in at
    least one OTHER document. Output ``(doc_id, n_spans, n_dup, dup_pct)``;
    documents shorter than k tokens have no windows and are omitted (the
    SQL oracle naturally excludes them too).

    This is the span-granularity member of the dedup family: doc-exact
    (``dedup_exact``), near-dup (minhash/simhash/jaccard/embedding) and
    span-exact cover the three dedup modalities of a training-data pipeline.

    Scale shape: per-doc distinct window hashes via the same memoized
    token-md5 + rolling polynomial as the shingler (64-bit equality stands
    in for string equality; ~2^-64 collision odds, deterministic per
    corpus); ONE corpus-windows-sized exchange — a coarse hash-partition
    groupby on the window hash, inside which distinct-doc counts and
    per-doc partials are one vectorized run-length pass — then a doc-sized
    ``groupby(doc_id).sum`` merges the ≤``parts`` partials per doc. No
    window strings ever shuffle (8-byte hashes only) and nothing touches
    the driver."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        # corpus-flat occurrences, then per-(doc, wh) dedup — one
        # drop_duplicates over int columns replaces the per-doc np.unique
        ids, _, wh = _window_occurrences(t, k)
        if len(ids):
            kept = ~pd.DataFrame({"d": ids, "w": wh}).duplicated().to_numpy()
            ids, wh = ids[kept], wh[kept]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "wh": pa.array(wh),
                "part": pa.array((wh % np.uint64(parts)).astype(np.int32)),
            }
        )

    # materialize: cut the window map from the groupby's Sort reservation
    # (see dedup_exact); batch_size coalesces reader blocks so the shuffle
    # moves compute-sized pieces
    ds = docs.map_batches(windows, batch_size=16384, batch_format="pyarrow").materialize()

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        # hash-based, no sorts: rows are distinct per (wh, doc), so
        # duplicated(keep=False) on wh == "window occurs in ≥2 docs"; the
        # per-doc partial is factorize + bincount (an argsort-based
        # run-length version cost ~3 s per 700k-row partition on this VM —
        # 10× the hash path — and pandas named-agg another 1.8 s)
        dup = g["wh"].duplicated(keep=False).to_numpy()
        codes, uniq = pd.factorize(g["doc_id"].to_numpy(), sort=False)
        ns = np.bincount(codes)
        nd = np.bincount(codes, weights=dup).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": uniq, "n_spans": ns.astype(np.int64), "n_dup": nd}
        )

    partials = ds.groupby("part").map_groups(count_part, batch_format="pandas")

    # per-doc merge of the ≤`parts` partials: coarse-partition on a doc
    # hash and run ONE vectorized pandas groupby per partition — a fine-key
    # `groupby(doc_id).sum()` here hits Ray's per-group aggregate overhead
    # (~0.3 ms/group; 240k groups took 80 s on arrow blocks and hung on
    # pandas blocks at bench scale)
    def add_dpart(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "dpart", pa.array(((ids * np.uint64(2654435761)) % np.uint64(parts)).astype(np.int32))
        )

    def merge_docs(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("doc_id", sort=False)[["n_spans", "n_dup"]].sum().reset_index()
        )
        out["dup_pct"] = (100 * out["n_dup"]) // out["n_spans"]
        return out

    return (
        partials.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(merge_docs, batch_format="pandas")
    )


def strip_dup_spans(
    sf_dir: str, k: int = 8, parts: int = 16, broadcast_cut: int = 8_000_000
) -> rd.Dataset:
    """Exact-substring REMOVAL (the second half of Lee et al. 2022 that
    ``dup_spans`` only profiles): every k-token window whose hash occurs
    ≥ 2 times in the corpus — cross-doc or within-doc — is cut from every
    occurrence, and each document re-emits as its surviving canonical
    token stream.  Output ``(doc_id, clean_text, n_tokens, n_cut)``;
    ``clean_text`` is the single-space join of the kept whitespace tokens
    (dedup.py's ``[^ ]+`` tokenizer — punctuation stays attached to its
    word; only inter-token spacing is canonicalized).  Documents shorter than k
    tokens carry no windows and pass through untouched (canonicalized).

    Scale shape: ONE exchange, moving only 8-byte hashes. Every window
    OCCURRENCE ships its rolling hash to a coarse hash partition, which
    emits only the (doc_id, pos) rows of duplicated hashes — one
    vectorized ``duplicated(keep=False)`` per partition. The duplication
    evidence is SPARSE (dup positions ≪ windows in a deduplicatable
    corpus), so below the adaptive cut it broadcasts via ``ray.put`` as
    two sorted numpy arrays and the rewrite is a stateless
    ``map_batches`` over the streaming docs — the corpus text never
    shuffles at all (the r4 design co-grouped text with positions
    through a doc-keyed exchange; that text all-to-all was the whole
    2→8=0.50 scaling wall). Past the cut the co-group fallback
    (tag-union + ``groupby(dpart)``) keeps the op unbounded-safe; either
    way the per-doc cut is a difference-array cover mask. Pytest-pinned
    against a single-process reference AND DuckDB-oracled: the SQL twin
    counts window STRINGS where the engine compares 64-bit rolling hashes
    — an independent derivation equal modulo ~2^-64 collisions."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        # corpus-flat: every occurrence with its in-doc position, packed
        # (doc_id << 24 | pos) into ONE int64 — 20 B/row through plasma and
        # the exchange instead of 28 (pos < 2^24 ≈ 16M tokens/doc; the
        # assert keeps a pathological mega-doc loud, not silently wrong)
        ids, pos, wh = _window_occurrences(t, k)
        assert len(pos) == 0 or int(pos.max()) < (1 << 24), "doc exceeds 2^24 tokens"
        # the doc side of the packed key gets the same loud guard: an id
        # ≥ 2^39 (or negative) would overflow the shift and silently group
        # dup positions under the wrong documents
        assert len(ids) == 0 or (
            int(ids.min()) >= 0 and int(ids.max()) < (1 << 39)
        ), "doc_id outside [0, 2^39) breaks the packed (doc_id << 24 | pos) key"
        key = (ids.astype(np.int64) << 24) | pos.astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key),
                "part": pa.array((wh % np.uint64(parts)).astype(np.int32)),
                "wh": pa.array(wh),
            }
        )

    win = docs.map_batches(windows, batch_size=16384, batch_format="pyarrow").materialize()

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["wh"].duplicated(keep=False).to_numpy()
        return g.loc[keep, ["key"]]

    # materialize: the dup evidence is consumed twice (count for the
    # adaptive cut, then collect-or-cogroup) and is a small fraction of the
    # window table either way
    dup = win.groupby("part").map_groups(dup_positions, batch_format="pandas").materialize()

    def _rebuild_arrays(
        ids_sorted: "np.ndarray", starts: "np.ndarray", pos_flat: "np.ndarray", t: pa.Table
    ) -> pa.Table:
        """Difference-array cover cut for one batch of docs against the
        (sorted-by-doc) dup-position arrays."""
        out_id, out_txt, out_n, out_cut = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _TOKEN_RE.findall(s)
            j = np.searchsorted(ids_sorted, did)
            if j < len(ids_sorted) and ids_sorted[j] == did:
                ps = pos_flat[starts[j] : starts[j + 1]]
                diff = np.zeros(len(toks) + 1, np.int64)
                np.add.at(diff, ps, 1)
                np.add.at(diff, ps + k, -1)
                covered = np.cumsum(diff[:-1]) > 0
                kept = [t_ for t_, c in zip(toks, covered) if not c]
                n_cut = int(covered.sum())
            else:
                kept, n_cut = toks, 0
            out_id.append(did)
            out_txt.append(" ".join(kept))
            out_n.append(len(toks))
            out_cut.append(n_cut)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "clean_text": pa.array(out_txt, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "n_cut": pa.array(out_cut, pa.int64()),
            }
        )

    # dup positions are 8 B/row packed; the default cut (8M ≈ 64 MB) is
    # comfortably broadcast and far past anything the sf corpora produce,
    # while a pathological everything-duplicated corpus still has the
    # distributed path (tests force it with broadcast_cut=0)
    if dup.count() <= broadcast_cut:
        dup_pd = dup.to_pandas()
        # zero window rows (every doc shorter than k tokens) yields a
        # schema-less dataset whose to_pandas() has no columns at all —
        # index ["key"] only when evidence exists
        keys = (
            np.sort(dup_pd["key"].to_numpy())  # doc-major, pos-minor
            if "key" in dup_pd.columns
            else np.array([], np.int64)
        )
        ids_all = keys >> 24
        pos_flat = keys & ((1 << 24) - 1)
        ids_sorted, starts0 = np.unique(ids_all, return_index=True)
        starts = np.r_[starts0, len(ids_all)]
        import ray

        ref = ray.put((ids_sorted, starts, pos_flat))

        def rebuild_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            return _rebuild_arrays(*ray.get(_ref), t)

        return docs.map_batches(rebuild_bcast, batch_size=16384, batch_format="pyarrow")

    dparts = parts

    from crawler_ray.pipelines.common import dpart_of

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dpart": dpart_of(ids, dparts),
                "doc_id": t["doc_id"],
                "pos": pa.array(np.full(t.num_rows, -1, np.int64)),
                "text": t["text"],
            }
        )

    def tag_dup(t: pa.Table) -> pa.Table:
        keys = t["key"].to_numpy(zero_copy_only=False)
        ids = keys >> 24
        return pa.table(
            {
                "dpart": dpart_of(ids, dparts),
                "doc_id": pa.array(ids),
                "pos": pa.array(keys & ((1 << 24) - 1)),
                "text": pa.nulls(t.num_rows, pa.string()),
            }
        )

    unioned = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        dup.map_batches(tag_dup, batch_format="pyarrow")
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["pos"].to_numpy() == -1
        texts = dict(zip(g.loc[is_doc, "doc_id"], g.loc[is_doc, "text"]))
        cuts: dict[int, list] = {}
        for did, p in zip(g.loc[~is_doc, "doc_id"], g.loc[~is_doc, "pos"]):
            cuts.setdefault(did, []).append(p)
        out_id, out_txt, out_n, out_cut = [], [], [], []
        for did, s in texts.items():
            toks = _TOKEN_RE.findall(s)
            ps = cuts.get(did)
            if ps:
                diff = np.zeros(len(toks) + 1, np.int64)
                pos_arr = np.asarray(ps, dtype=np.int64)
                np.add.at(diff, pos_arr, 1)
                np.add.at(diff, pos_arr + k, -1)
                covered = np.cumsum(diff[:-1]) > 0
            else:
                covered = np.zeros(len(toks), bool)
            kept = [t_ for t_, c in zip(toks, covered) if not c]
            out_id.append(did)
            out_txt.append(" ".join(kept))
            out_n.append(len(toks))
            out_cut.append(int(covered.sum()))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, np.int64),
                "clean_text": out_txt,
                "n_tokens": np.asarray(out_n, np.int64),
                "n_cut": np.asarray(out_cut, np.int64),
            }
        )

    return unioned.groupby("dpart").map_groups(rebuild, batch_format="pandas")


def minhash_dedup_keep(sf_dir: str, threshold_pct: int = 50) -> rd.Dataset:
    """End-to-end MinHash near-dedup — the RefinedWeb/Gopher corpus pass,
    composed from the distributed pieces: LSH candidate pairs (exact-
    Jaccard-verified, ``minhash_lsh_dups``) → connected components over the
    similarity edges → corpus-wide keep/drop. Emits one row per document:
    ``(doc_id, cluster_id, keep)`` with ``cluster_id`` = smallest doc_id in
    its near-dup cluster (its own id when unclustered) and ``keep=1``
    exactly for cluster representatives — the fraction of drops is the
    corpus duplication rate.

    Scale shape: the pair and component stages are the existing bounded
    exchanges; the final decision is one doc-sized union (full doc-id list
    + component labels) resolved inside coarse doc-hash partitions with a
    vectorized first-per-run pass — no driver set, no per-doc groups."""
    from crawler_ray.pipelines.graph import _ipart, _nparts, connected_components

    pairs = minhash_lsh_dups(sf_dir, threshold_pct=threshold_pct)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    P = _nparts()

    def comp_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["node"])
        return pa.table(
            {
                "doc_id": t["node"].combine_chunks().cast(pa.int64()),
                "cluster_id": t["component"].combine_chunks().cast(pa.int64()),
                "labeled": pa.array(np.ones(len(ids), np.int8)),
                "part": pa.array(_ipart(ids, P)),
            }
        )

    def self_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "cluster_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "labeled": pa.array(np.zeros(len(ids), np.int8)),
                "part": pa.array(_ipart(ids, P)),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    # adaptive resolve: component labels are pair-bounded (≤ 2 rows per
    # verified pair), so below the cut (CRAWLER_RAY_PAIR_CUT, 0 forces the
    # distributed path) they broadcast once via ray.put and the corpus-wide
    # decision is a stateless searchsorted map — no doc-sized union, no
    # partition exchange. Above the cut the co-partitioned resolve below
    # handles an arbitrarily large label set.
    comp_mat = comp.materialize()
    pair_cut = int(os.environ.get("CRAWLER_RAY_PAIR_CUT", str(2_000_000)))
    if pair_cut > 0 and comp_mat.count() <= pair_cut:
        lab = comp_mat.to_pandas()
        if lab.empty:
            # zero-BLOCK label stream (no dup components at all): to_pandas
            # has no columns, so skip straight to the all-self labeling
            nodes = np.empty(0, np.int64)
            labels = np.empty(0, np.int64)
        else:
            nodes = lab["node"].to_numpy(dtype=np.int64)
            labels = lab["component"].to_numpy(dtype=np.int64)
        order = np.argsort(nodes, kind="stable")
        lab_ref = ray.put((nodes[order], labels[order]))

        def label(t: pa.Table, _ref=lab_ref) -> pa.Table:
            nd, lb = ray.get(_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nd):
                idx = np.minimum(np.searchsorted(nd, ids), len(nd) - 1)
                hit = nd[idx] == ids
                cl = np.where(hit, lb[idx], ids)
            else:
                cl = ids
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "cluster_id": pa.array(cl),
                    "keep": pa.array((ids == cl).astype(np.int8)),
                }
            )

        return docs.map_batches(label, batch_format="pyarrow")

    both = comp_mat.map_batches(comp_rows, batch_format="pyarrow").union(
        docs.map_batches(self_rows, batch_format="pyarrow")
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # per doc: the labeled (component) row wins over the self row
        g = g.sort_values(["doc_id", "labeled"], ascending=[True, False],
                          kind="mergesort", ignore_index=True)
        ids = g["doc_id"].to_numpy()
        first = np.r_[True, ids[1:] != ids[:-1]]
        out = g[first]
        cl = out["cluster_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "cluster_id": cl,
                "keep": (out["doc_id"].to_numpy() == cl).astype(np.int8),
            }
        )

    return both.groupby("part").map_groups(resolve, batch_format="pandas")


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_keep_best": dedup_keep_best,
    "prefix_jaccard_pairs": prefix_jaccard_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_lsh_dups": minhash_lsh_dups,
    "minhash_dedup_keep": minhash_dedup_keep,
    "simhash_dups": simhash_dups,
    "embedding_dup_pairs": embedding_dup_pairs,
    "semdedup": semdedup,
    "dup_spans": dup_spans,
    "strip_dup_spans": strip_dup_spans,
}

ORACLE_SQL = {
    # Exact-substring removal twin: the engine compares 64-bit rolling
    # hashes of k-token windows; the SQL compares the window STRINGS
    # directly — identical results modulo ~2^-64 hash collisions, so this
    # is a genuinely independent derivation of the same semantics.
    "strip_dup_spans": """
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS toks FROM documents),
        win AS (
            SELECT doc_id, p,
                   array_to_string(list_slice(toks, p + 1, p + 8), ' ') AS w
            FROM (SELECT doc_id, toks, UNNEST(range(LEN(toks) - 7)) AS p
                  FROM tok WHERE LEN(toks) >= 8)),
        c AS (SELECT w, COUNT(*) AS cnt FROM win GROUP BY w),
        dup AS (SELECT doc_id, p FROM win JOIN c USING (w) WHERE cnt >= 2),
        cov AS (SELECT DISTINCT doc_id, UNNEST(range(p, p + 8)) AS p FROM dup),
        tokpos AS (
            SELECT doc_id, UNNEST(toks) AS tk,
                   GENERATE_SUBSCRIPTS(toks, 1) - 1 AS p, LEN(toks) AS n
            FROM tok),
        agg AS (
            SELECT t.doc_id,
                   COALESCE(string_agg(t.tk, ' ' ORDER BY t.p)
                            FILTER (WHERE c.p IS NULL), '') AS clean_text,
                   CAST(ANY_VALUE(t.n) AS BIGINT) AS n_tokens,
                   CAST(COUNT(c.p) AS BIGINT) AS n_cut
            FROM tokpos t
            LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
            GROUP BY t.doc_id)
        SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
               CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.n_cut, 0) AS BIGINT) AS n_cut
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "dedup_keep_best": """
        SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
               doc_id, n_chars,
               CAST(COUNT(*) OVER (
                   PARTITION BY MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
               ) AS BIGINT) AS dup_count
        FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
            ORDER BY n_chars DESC, doc_id) = 1
    """,
    "dedup_exact": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, MD5(text) AS fingerprint,
               COUNT(*) AS dup_count
        FROM documents GROUP BY MD5(text)
    """,
    "prefix_jaccard_pairs": """
        WITH tok AS (
            SELECT doc_id, SUBSTR(text, 1, 100) AS p,
                   LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS toks
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY SUBSTR(text, 1, 100)
                                       ORDER BY doc_id) <= 256)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) > 0
                    THEN (100 * LEN(LIST_INTERSECT(a.toks, b.toks)))
                         // LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
                    ELSE 0 END AS BIGINT) AS jacc_pct
        FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
    """,
    "ngram_jaccard_pairs": """
        WITH tok AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
            FROM documents),
        tris AS (
            SELECT doc_id,
                   ARRAY_TO_STRING(t[1:3], ' ') AS block,
                   LIST_DISTINCT(LIST_TRANSFORM(
                       RANGE(1, GREATEST(LEN(t) - 3 + 2, 1)),
                       i -> ARRAY_TO_STRING(t[i:i+2], ' '))) AS g
            FROM tok
            QUALIFY ROW_NUMBER() OVER (PARTITION BY ARRAY_TO_STRING(t[1:3], ' ')
                                       ORDER BY doc_id) <= 256)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(LEN(LIST_INTERSECT(a.g, b.g)) AS BIGINT) AS inter_3grams,
               CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.g, b.g))) AS BIGINT)
                   AS union_3grams,
               CAST(CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.g, b.g))) > 0
                    THEN (100 * LEN(LIST_INTERSECT(a.g, b.g)))
                         // LEN(LIST_DISTINCT(LIST_CONCAT(a.g, b.g)))
                    ELSE 0 END AS BIGINT) AS jacc_pct
        FROM tris a JOIN tris b ON a.block = b.block AND a.doc_id < b.doc_id
    """,
    "embedding_dup_pairs": _EMB_COS_CTE
    + """
        SELECT a_id, b_id, cos_e6 FROM cos WHERE cos_e6 >= 300000
    """,
    # window strings compared exactly here; the engine compares 64-bit
    # rolling hashes of the same token windows (collision odds ~2^-64)
    "dup_spans": """
        WITH tok AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
            FROM documents),
        pos AS (
            SELECT doc_id, t, UNNEST(RANGE(1, LEN(t) - 8 + 2)) AS i FROM tok),
        wins AS (
            SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+7], ' ') AS w FROM pos),
        wc AS (
            SELECT w, COUNT(*) AS dc FROM wins GROUP BY w),
        per AS (
            SELECT wins.doc_id, COUNT(*) AS n_spans,
                   SUM(CASE WHEN wc.dc >= 2 THEN 1 ELSE 0 END) AS n_dup
            FROM wins JOIN wc USING (w) GROUP BY wins.doc_id)
        SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
               CAST(n_dup AS BIGINT) AS n_dup,
               CAST(100 * n_dup // n_spans AS BIGINT) AS dup_pct
        FROM per
    """,
    # Charikar simhash twin: DuckDB recomputes the md5-prefix token hashes
    # (same bytes `_token_hashes` takes) and the per-bit ±1 vote in exact
    # integer SQL, then brute-forces all pairs with bit_count(xor) <= 3.
    # The engine's 4×16-bit pigeonhole blocking is lossless for hamming<=3
    # (3 differing bits can't touch all 4 chunks), so blocked == all-pairs.
    "simhash_dups": """
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(
                       REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z0-9]+'),
                       t -> t <> '')) AS tok
            FROM documents),
        th AS (
            SELECT doc_id, ('0x' || SUBSTR(MD5(tok), 1, 16))::UBIGINT AS h
            FROM toks),
        bits AS (
            SELECT doc_id, b.bit,
                   CASE WHEN SUM(CASE WHEN (h >> b.bit) & 1 = 1
                                      THEN 1 ELSE -1 END) > 0
                        THEN 1::UBIGINT ELSE 0::UBIGINT END AS v
            FROM th CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS bit) b
            GROUP BY doc_id, b.bit),
        sh AS (
            SELECT d.doc_id, COALESCE(s.simhash, 0::UBIGINT) AS simhash
            FROM documents d
            LEFT JOIN (SELECT doc_id, SUM(v << bit)::UBIGINT AS simhash
                       FROM bits GROUP BY doc_id) s USING (doc_id))
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               BIT_COUNT(XOR(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= 3
    """,
}


def _minhash_oracle_ctes(
    num_perm: int = 128,
    bands: int = 32,
    threshold_pct: int = 50,
    bucket_cap: int = 512,
) -> str:
    """CTE list for the DuckDB twin of ``minhash_lsh_dups`` — same defaults,
    ending in a ``pairs`` CTE of verified (a_id, b_id, jacc_pct).

    Every stage is re-derived in exact integer SQL: md5-prefix token hashes,
    the splitmix-multiplier k=3 shingle polynomial, the seed-42 (a, b)
    permutation table (inlined as VALUES — deterministic constants of the
    documented seed), (a*x + b) mod 2^64 mod M61 signatures, the FNV-1a band
    keys, cap-512 buckets, and exact integer Jaccard verification. uint64
    wraparound is emulated as UHUGEINT arithmetic masked with 2^64-1 (bitwise
    AND — a UHUGEINT ``%`` is a 128-bit divide and ~40x slower); every
    product stays under 2^128 (hash < 2^64 times multiplier < 2^64 is the
    widest). Emitted as a CTE list so ``minhash_dedup_keep`` can extend it
    with a recursive components CTE under the same WITH."""
    rows = num_perm // bands
    rng = np.random.default_rng(42)  # _minhash_params' documented seed
    hi = np.int64(_MERSENNE)
    pa_ = rng.integers(1, hi, size=num_perm, dtype=np.int64)
    pb_ = rng.integers(0, hi, size=num_perm, dtype=np.int64)
    params = ",".join(
        f"({p // rows},{p % rows},{int(pa_[p])}::UHUGEINT,{int(pb_[p])}::UHUGEINT)"
        for p in range(num_perm)
    )
    MASK = "18446744073709551615::UHUGEINT"  # 2^64 - 1
    MULT = "11400714819323198485::UHUGEINT"  # 0x9E3779B97F4A7C15
    FNV_OFFSET = 14695981039346656037  # 0xCBF29CE484222325
    FNV_PRIME = "1099511628211::UHUGEINT"  # 0x100000001B3
    sig_pivot = ",\n           ".join(
        f"MAX(CASE WHEN r = {r} THEN sig END) AS s{r}" for r in range(rows)
    )
    key = f"xor({FNV_OFFSET}::UBIGINT, band::UBIGINT)"
    for r in range(rows):
        key = f"(((xor({key}, s{r})::UHUGEINT * {FNV_PRIME}) & {MASK})::UBIGINT)"
    return f"""
    tokarr AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), ' '),
                           t -> t <> '') AS toks
        FROM documents),
    th AS (
        SELECT doc_id, GENERATE_SUBSCRIPTS(toks, 1) AS i,
               ('0x' || SUBSTR(MD5(UNNEST(toks)), 1, 16))::UBIGINT::UHUGEINT AS h
        FROM tokarr),
    sh AS (
        SELECT DISTINCT t0.doc_id,
               ((((((t0.h * {MULT}) & {MASK}) + t1.h) & {MASK})
                 * {MULT} & {MASK}) + t2.h) & {MASK} AS x
        FROM th t0
        JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.i = t0.i + 1
        JOIN th t2 ON t2.doc_id = t0.doc_id AND t2.i = t0.i + 2),
    params(band, r, pa, pb) AS (VALUES {params}),
    sig AS (
        SELECT doc_id, band, r,
               MIN((((x * pa + pb) & {MASK})::UBIGINT)
                   % 2305843009213693951::UBIGINT) AS sig
        FROM sh CROSS JOIN params GROUP BY doc_id, band, r),
    sigp AS (
        SELECT doc_id, band, {sig_pivot}
        FROM sig GROUP BY doc_id, band),
    bkey AS (SELECT doc_id, {key} AS key FROM sigp),
    bucket AS (
        SELECT doc_id, key FROM bkey
        QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id)
                <= {bucket_cap}),
    cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bucket x JOIN bucket y ON x.key = y.key AND x.doc_id < y.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.a_id, c.b_id, COUNT(*) AS i
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id AND sb.x = sa.x
        GROUP BY c.a_id, c.b_id),
    pairs AS (
        SELECT c.a_id, c.b_id,
               ((100 * COALESCE(i.i, 0))
                // (na.n + nb.n - COALESCE(i.i, 0)))::BIGINT AS jacc_pct
        FROM cand c
        JOIN sizes na ON na.doc_id = c.a_id
        JOIN sizes nb ON nb.doc_id = c.b_id
        LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
        WHERE (100 * COALESCE(i.i, 0))
              // (na.n + nb.n - COALESCE(i.i, 0)) >= {threshold_pct})"""


ORACLE_SQL["minhash_lsh_dups"] = (
    "WITH" + _minhash_oracle_ctes() + "\n    SELECT a_id, b_id, jacc_pct FROM pairs"
)

# components over the verified pairs via a recursive reachability CTE
# (min reachable doc_id == the engine's min-label supersteps); docs outside
# any pair keep themselves. Feasible because the driver's oracle scale is
# sf0.01 — the engine's distributed components path is the 100 TB shape.
ORACLE_SQL["minhash_dedup_keep"] = (
    "WITH RECURSIVE"
    + _minhash_oracle_ctes()
    + """,
    edges AS (SELECT a_id AS s, b_id AS d FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    cc(node, lbl) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, cc.lbl FROM cc JOIN edges e ON e.s = cc.node),
    lab AS (SELECT node, MIN(lbl) AS cluster_id FROM cc GROUP BY node)
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           (CASE WHEN d.doc_id = COALESCE(l.cluster_id, d.doc_id)
                 THEN 1 ELSE 0 END)::TINYINT AS keep
    FROM documents d LEFT JOIN lab l ON l.node = d.doc_id"""
)
