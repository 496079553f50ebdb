"""Mergeable-sketch operators: count-min heavy hitters.

The 100-TB shape for "what are the most frequent keys": every batch folds
its local counts into a tiny fixed-size sketch (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch", J. Algorithms
2005) plus a bounded candidate list; sketches merge by elementwise add, so
the reduction tree moves O(d*w) integers per batch regardless of key
cardinality — no per-key shuffle, no driver-side dict of the key space.
(The HyperLogLog twin for distinct-counting lives in
``crawler_ray.pipelines.text.hll_token_cardinality``.)

Rows-only for the driver gate (a sketch is not SQL-expressible); exactness
at test scale is pinned by pytest against exact counts.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

CMS_DEPTH = 4
CMS_WIDTH = 2048
_CAND_PER_BATCH = 64  # local heavy-hitter candidates kept per batch


def _cms_indices(tokens: list[str] | np.ndarray) -> np.ndarray:
    """d row-indices per token, fully vectorized: one SipHash pass over the
    token array (``pd.util.hash_array`` — deterministic across processes),
    then d independent lanes via salted SplitMix64 finalizers, each mod w.
    No per-token Python hashing (the md5-per-token loop was the partial's
    hot spot)."""
    import pandas as pd

    arr = np.asarray(tokens, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    out = np.empty((len(arr), CMS_DEPTH), dtype=np.int64)
    for j in range(CMS_DEPTH):
        # salt precomputed mod 2^64 in Python ints: numpy warns on uint64
        # scalar wraparound even though the wrap is exactly what we want
        salt = np.uint64((j * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        lane = _splitmix64(h + salt)
        out[:, j] = (lane % np.uint64(CMS_WIDTH)).astype(np.int64)
    return out


def _sketch_row(sketch: np.ndarray, cands: list[str], counts: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "sketch": pa.array([sketch.tobytes()], pa.binary()),
            "cand": pa.array([cands], pa.list_(pa.string())),
            "cand_count": pa.array([counts.astype(np.int64)], pa.list_(pa.int64())),
        }
    )


def cms_top_tokens(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k tokens by total occurrence count, estimated with a count-min
    sketch. Candidates are each batch's local top tokens (a true global
    heavy hitter is a local heavy hitter in enough batches to surface);
    final counts come from the merged sketch, so a candidate missed by one
    batch's cap still gets its full global estimate."""

    def partial(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for s in t["text"].to_pylist():
            c.update(_TOKEN_RE.findall(s.lower()))
        toks = list(c.keys())
        cnts = np.fromiter(c.values(), np.int64, len(toks))
        sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        if toks:
            idx = _cms_indices(toks)
            for j in range(CMS_DEPTH):
                np.add.at(sketch[j], idx[:, j], cnts)
        top = np.argsort(-cnts, kind="stable")[:_CAND_PER_BATCH]
        return _sketch_row(sketch, [toks[i] for i in top], cnts[top])

    def merge(t: pa.Table) -> pa.Table:
        sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        for blob in t["sketch"].to_pylist():
            sketch += np.frombuffer(blob, dtype=np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
        # union candidates; per-batch counts are only a ranking hint past
        # this point (the merged sketch supplies the global estimate), so
        # keep the max hint per token and cap the union
        best: dict[str, int] = {}
        for cl, nl in zip(t["cand"].to_pylist(), t["cand_count"].to_pylist()):
            for tok, n in zip(cl, nl):
                if n > best.get(tok, -1):
                    best[tok] = n
        cands = sorted(best, key=lambda w: (-best[w], w))[: _CAND_PER_BATCH * 4]
        return _sketch_row(sketch, cands, np.array([best[w] for w in cands], np.int64))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    parts = docs.map_batches(partial, batch_format="pyarrow")
    # one merge level collapses up to 1024 batch-sketches per row; repeat
    # map_batches(merge) levels for larger block counts — each level is a
    # 1024-way reduction, so two levels cover ~10^6 input blocks
    merged = parts.map_batches(merge, batch_size=1024, batch_format="pyarrow")

    sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    cand: set[str] = set()
    for b in merged.iter_batches(batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            sketch += np.frombuffer(blob, dtype=np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
        for cl in b["cand"].to_pylist():
            cand.update(cl)

    toks = sorted(cand)
    if not toks:
        return pa.table({"token": pa.array([], pa.string()), "est_count": pa.array([], pa.int64())})
    idx = _cms_indices(toks)
    est = sketch[np.arange(CMS_DEPTH)[None, :], idx].min(axis=1)
    order = np.lexsort((np.array(toks, dtype=object), -est))[:k]
    return pa.table(
        {
            "token": pa.array([toks[i] for i in order], pa.string()),
            "est_count": pa.array(est[order].astype(np.int64)),
        }
    )


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized SplitMix64 finalizer (Steele et al., public domain) —
    uniform uint64 hashes for integer keys, no per-element Python."""
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_users_by_type(sf_dir: str, p: int = 12) -> rd.Dataset:
    """Per-key approximate COUNT(DISTINCT): HyperLogLog registers per
    (batch, event_type), merged by elementwise max inside a per-key
    groupby. The exact twin is ``distinct_users_by_type``
    (relational.py); this is the shape that survives when the per-key
    value sets are too big to dedup — the exchange moves one 2^p-byte
    blob per (batch, key), never the values, and works unchanged for
    millions of keys (per-host distinct URLs, per-domain distinct users)
    where a driver-side merge could not hold blocks×keys blobs.
    Rows-only: pytest pins the estimate against the exact count
    (stderr ≈ 1.04/sqrt(2^p) ≈ 1.6% at p=12)."""
    import pandas as pd

    from crawler_ray.pipelines.text import _hll_partial

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    nparts = 32  # coarse partitions: the exchange is O(keys) blobs either way,
    # but task count stays 32, not one pandas group per key (~100 µs/group
    # overhead would dominate at 10^5+ keys — per-host distinct URLs scale)

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uniq, inv = np.unique(et, return_inverse=True)
        h = _splitmix64(uid)
        part = (pd.util.hash_array(uniq, categorize=False) % np.uint64(nparts)).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": pa.array(list(uniq), pa.string()),
                "part": pa.array(part),
                "regs": pa.array(
                    [_hll_partial(h[inv == i], p).tobytes() for i in range(len(uniq))],
                    pa.binary(),
                ),
            }
        )

    m = 1 << p

    def merge_part(df: "pd.DataFrame") -> "pd.DataFrame":
        # vectorized within the partition: sort by key, max-reduce register
        # matrices at run boundaries, estimate all keys in one numpy pass
        df = df.sort_values("event_type", kind="stable")
        keys = df["event_type"].to_numpy()
        mat = np.frombuffer(b"".join(df["regs"]), np.uint8).reshape(len(df), m)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        merged = np.maximum.reduceat(mat, starts, axis=0)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.exp2(-merged.astype(np.float64)).sum(axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)  # linear-counting correction
        est[small] = m * np.log(m / zeros[small])
        return pd.DataFrame(
            {
                "event_type": keys[starts],
                "n_users_est": np.rint(est).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
    )


# ----------------------------------------------- histogram quantile sketch
HIST_BIN_C = 500_000  # $5,000 bins over order totalprice cents
HIST_QS = (25, 50, 75, 90, 99)


def approx_price_quantiles(sf_dir: str) -> pa.Table:
    """Approximate order-value quantiles from a **mergeable fixed-width
    histogram** — the streaming counterpart of the exact distributed
    ``price_quantiles``: each batch folds into (bin → count) partials, the
    driver merge is O(blocks × bins) small integers, and the quantile
    estimate is the upper edge of the first bin whose cumulative count
    reaches ``ceil(q·n/100)``. All integer arithmetic, so unlike t-digest
    the estimate is deterministic and SQL-checkable; error is bounded by
    the bin width. At 100 TB nothing changes: the histogram is a
    fixed-size partial regardless of row count."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()
        ).to_numpy()
        bins, counts = np.unique(c // HIST_BIN_C, return_counts=True)
        return pa.table(
            {"bin": pa.array(bins, pa.int64()), "cnt": pa.array(counts.astype(np.int64))}
        )

    merged: dict[int, int] = {}
    for b in orders.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for bi, ct in zip(b["bin"].to_pylist(), b["cnt"].to_pylist()):
            merged[bi] = merged.get(bi, 0) + ct
    bins = np.array(sorted(merged), dtype=np.int64)
    cum = np.cumsum([merged[b] for b in bins])
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    if n == 0:  # empty input: no quantiles, not an IndexError into bins[0]
        return pa.table(
            {"q_pct": pa.array([], pa.int64()), "value_hi_c": pa.array([], pa.int64())}
        )
    for q in HIST_QS:
        thr = (n * q + 99) // 100
        i = int(np.searchsorted(cum, thr))
        out_q.append(q)
        out_v.append(int(bins[i] + 1) * HIST_BIN_C)
    return pa.table(
        {"q_pct": pa.array(out_q, pa.int64()), "value_hi_c": pa.array(out_v, pa.int64())}
    )


QUERIES = {
    "cms_top_tokens": cms_top_tokens,
    "hll_users_by_type": hll_users_by_type,
    "approx_price_quantiles": approx_price_quantiles,
}
ORACLE_SQL: dict[str, str] = {
    "approx_price_quantiles": """
        WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) // {w} AS bin
                   FROM orders),
             b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY bin),
             t AS (SELECT SUM(cnt) AS n FROM b),
             cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM b),
             qs AS (SELECT UNNEST([25, 50, 75, 90, 99]) AS q)
        SELECT CAST(q AS BIGINT) AS q_pct,
               CAST((MIN(bin) + 1) * {w} AS BIGINT) AS value_hi_c
        FROM qs, cum, t
        WHERE cum >= (n * q + 99) // 100
        GROUP BY q
    """.format(w=HIST_BIN_C),
}
