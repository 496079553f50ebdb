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
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

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

    ds = docs.map_batches(fp, batch_format="pyarrow")
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


# ------------------------------------------------- blocked n-gram Jaccard


def prefix_jaccard_pairs(sf_dir: str) -> rd.Dataset:
    """Blocked similarity join: block on the first 100 chars, compute
    distinct-token Jaccard within each block (pairs a<b)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def blocked(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "block": pa.array([s[:100] for s in texts], pa.string()),
                "text": t["text"],
            }
        )

    ds = docs.map_batches(blocked, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        toks = [set(_TOKEN_RE.findall(s)) for s in g["text"]]
        a_ids, b_ids, jpct = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(toks[i] & toks[j])
                union = len(toks[i] | toks[j])
                a_ids.append(ids[i])
                b_ids.append(ids[j])
                jpct.append((100 * inter) // union if union else 0)
        return pd.DataFrame(
            {
                "a_id": np.array(a_ids, np.int64),
                "b_id": np.array(b_ids, np.int64),
                "jacc_pct": np.array(jpct, np.int64),
            }
        )

    return ds.groupby("block").map_groups(pairs, batch_format="pandas")


# --------------------------------------------------------------- MinHash+LSH

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 3) -> set[int]:
    toks = _TOKEN_RE.findall(text.lower())
    return {
        int.from_bytes(hashlib.md5(" ".join(toks[i : i + k]).encode()).digest()[:8], "big")
        for i in range(max(0, len(toks) - k + 1))
    }


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not sh:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    x = np.fromiter(sh, np.uint64, len(sh))
    # (a*x + b) mod p, computed in python ints via object? stay in uint64:
    # universal-ish hashing with wraparound is fine for minhash
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_lsh_dups(
    sf_dir: str, num_perm: int = 128, bands: int = 32, threshold_pct: int = 50
) -> rd.Dataset:
    """MinHash signatures → LSH band buckets (the shuffle) → candidate pairs
    → exact shingle-Jaccard verification. Returns verified pairs
    (a_id, b_id, jacc_pct ≥ threshold)."""
    rows = num_perm // bands
    a, b = _minhash_params(num_perm)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        doc_ids, band_keys = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = _signature(_shingles(s), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows : (bi + 1) * rows]
                h = hashlib.md5(chunk.tobytes() + bi.to_bytes(2, "big")).hexdigest()[:16]
                doc_ids.append(did)
                band_keys.append(h)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "band_key": pa.array(band_keys, pa.string())}
        )

    banded = docs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        a_ids, b_ids = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_ids.append(ids[i])
                b_ids.append(ids[j])
        return pd.DataFrame({"a_id": np.array(a_ids, np.int64), "b_id": np.array(b_ids, np.int64)})

    cand = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    # candidate pairs are tiny relative to the corpus; dedupe + verify
    pair_set = set()
    for bt in cand.iter_batches(batch_format="pyarrow"):
        pair_set.update(zip(bt["a_id"].to_pylist(), bt["b_id"].to_pylist()))
    if not pair_set:
        return rd.from_arrow(
            pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
                      "jacc_pct": pa.array([], pa.int64())})
        )
    # verification: broadcast the shingle sets of candidate docs only
    need = sorted({i for p in pair_set for i in p})
    need_set = set(need)
    texts: dict[int, str] = {}
    for bt in docs.iter_batches(batch_format="pyarrow"):
        for did, s in zip(bt["doc_id"].to_pylist(), bt["text"].to_pylist()):
            if did in need_set:
                texts[did] = s
    sh_ref = ray.put({did: _shingles(texts[did]) for did in need})
    pairs_tbl = pa.table(
        {
            "a_id": pa.array([p[0] for p in sorted(pair_set)], pa.int64()),
            "b_id": pa.array([p[1] for p in sorted(pair_set)], pa.int64()),
        }
    )

    def verify(t: pa.Table, ref=sh_ref, thr=threshold_pct) -> pa.Table:
        sh = ray.get(ref)
        a_ids, b_ids, jpct = [], [], []
        for x, y in zip(t["a_id"].to_pylist(), t["b_id"].to_pylist()):
            sx, sy = sh[x], sh[y]
            union = len(sx | sy)
            pct = (100 * len(sx & sy)) // union if union else 0
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

    return rd.from_arrow(pairs_tbl).map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------------- SimHash


def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for tok in tokens:
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dups(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit simhash, pigeonhole blocking on 4
    16-bit chunks (hamming ≤ 3 ⇒ one chunk identical), hamming verification."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sh(t: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = _simhash64(_TOKEN_RE.findall(s.lower()))
            for c in range(4):
                chunk = (h >> (16 * c)) & 0xFFFF
                ids.append(did)
                keys.append(f"{c}:{chunk:04x}")
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "block": pa.array(keys, pa.string()),
                "simhash": pa.array(np.array(hashes, dtype=np.uint64)),
            }
        )

    banded = docs.map_batches(sh, batch_format="pyarrow")

    def pairs(g: pd.DataFrame, maxh=max_hamming) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].tolist()
        hs = [int(x) for x in g["simhash"]]
        a_ids, b_ids, ham = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= maxh:
                    a_ids.append(ids[i])
                    b_ids.append(ids[j])
                    ham.append(d)
        return pd.DataFrame(
            {"a_id": np.array(a_ids, np.int64), "b_id": np.array(b_ids, np.int64),
             "hamming": np.array(ham, np.int64)}
        )

    out = banded.groupby("block").map_groups(pairs, batch_format="pandas")
    # the 4 bands can produce the same pair up to 4×: distinct it
    return out.groupby(["a_id", "b_id"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# -------------------------------------------------- embedding cosine near-dup


def embedding_dup_pairs(sf_dir: str, threshold_e6: int = 300_000) -> pa.Table:
    """Near-dup pairs by embedding cosine ≥ threshold (double precision).

    The matrix ships once via ray.put; each batch matmuls against it —
    at scale this becomes blocked matmul over repartitioned id ranges."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tbl = pa.concat_tables(emb.iter_batches(batch_format="pyarrow")).combine_chunks()
    ids = tbl["vec_id"].to_numpy()
    mat = np.vstack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    mat_ref = ray.put((ids, mat, norms))

    def block(t: pa.Table, ref=mat_ref, thr=threshold_e6) -> pa.Table:
        all_ids, all_mat, all_norms = ray.get(ref)
        bids = t["vec_id"].to_numpy()
        bmat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        bnorms = np.linalg.norm(bmat, axis=1)
        cos = (bmat @ all_mat.T) / np.outer(bnorms, all_norms)
        cos_e6 = np.round(cos * 1e6).astype(np.int64)
        a_ids, b_ids, vals = [], [], []
        for r in range(len(bids)):
            mask = (cos_e6[r] >= thr) & (all_ids > bids[r])
            for cidx in np.flatnonzero(mask):
                a_ids.append(bids[r])
                b_ids.append(int(all_ids[cidx]))
                vals.append(int(cos_e6[r, cidx]))
        return pa.table(
            {
                "a_id": pa.array(np.array(a_ids, np.int64)),
                "b_id": pa.array(np.array(b_ids, np.int64)),
                "cos_e6": pa.array(np.array(vals, np.int64)),
            }
        )

    out = emb.map_batches(block, batch_format="pyarrow")
    parts = [b for b in out.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
         "cos_e6": pa.array([], pa.int64())}
    )


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

QUERIES = {
    "dedup_exact": dedup_exact,
    "prefix_jaccard_pairs": prefix_jaccard_pairs,
    "minhash_lsh_dups": minhash_lsh_dups,
    "simhash_dups": simhash_dups,
    "embedding_dup_pairs": embedding_dup_pairs,
}

ORACLE_SQL = {
    "dedup_exact": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, MD5(text) AS fingerprint,
               COUNT(*) AS dup_count
        FROM documents GROUP BY MD5(text)
    """,
    "prefix_jaccard_pairs": """
        WITH tok AS (
            SELECT doc_id, SUBSTR(text, 1, 100) AS p,
                   LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS toks
            FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) > 0
                    THEN (100 * LEN(LIST_INTERSECT(a.toks, b.toks)))
                         // LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
                    ELSE 0 END AS BIGINT) AS jacc_pct
        FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
    """,
    "embedding_dup_pairs": _EMB_COS_CTE
    + """
        SELECT a_id, b_id, cos_e6 FROM cos WHERE cos_e6 >= 300000
    """,
}
