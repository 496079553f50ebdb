"""Deterministic sampling / split operators for training-data curation.

At 100 TB you cannot afford a shuffle (or a wall-clock RNG) just to take a
sample: every operator here is a *stateless, vectorized filter* — a
multiplicative hash of the row key compared against a rate threshold — so
sampling streams at read speed, is reproducible across runs and cluster
sizes, and is expressible in ANSI SQL for the DuckDB oracles (the same
arithmetic, no engine-specific ``hash()``).

Hash: Knuth's multiplicative scheme ``(key * 2654435761) mod 2^32`` (TAOCP
vol. 3 §6.4). Keys are non-negative int64 ids, so the product fits in
uint64/int128 on both sides and the modulus is exact.

Reference parity note: the reference has no sampling surface at all — these
are the "beyond the reference" training-data operators the brief asks for
(nearest cousin is its md5-keyed dedup, /root/reference/collect/request.go:42).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_KNUTH = 2654435761  # floor(2^32 / golden ratio), odd → bijective mod 2^32
_M32 = 1 << 32

# documents Bernoulli sample rate (10%)
_DOC_RATE_NUM, _DOC_RATE_DEN = 1, 10
_DOC_THRESHOLD = _M32 * _DOC_RATE_NUM // _DOC_RATE_DEN

# per-event-type sampling rates (percent) — heavy downsample of the chatty
# types, keep every purchase; unknown types fall back to 10%
_EVENT_RATES_PCT = {"click": 50, "view": 10, "error": 5, "signup": 20, "purchase": 100}
_EVENT_DEFAULT_PCT = 10

# train/valid/test split boundaries over hash buckets 0..99
_TRAIN_END, _VALID_END = 80, 90


def _h32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash → uint64 values in [0, 2^32)."""
    return (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(_M32)


def hash_sample_docs(sf_dir: str) -> rd.Dataset:
    """10% deterministic Bernoulli sample of ``documents`` by doc_id hash.

    Pure streaming filter — no shuffle, no materialization, no RNG state;
    the same rows are kept on any cluster size or restart.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_h32(ids) < _DOC_THRESHOLD))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample_events(sf_dir: str) -> rd.Dataset:
    """Per-event-type stratified sample of ``events`` (deterministic rates).

    The rate table is a tiny constant captured in the closure (broadcast
    once with the function, not re-shipped per batch); the filter itself is
    one hash + one gather-compare per batch.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def fn(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        # dictionary-encode the type column so the rate lookup runs once per
        # distinct type, then gathers — O(uniques + rows)
        enc = pc.dictionary_encode(t["event_type"]).combine_chunks()
        # trailing slot = the default rate, indexed by null-filled codes: a
        # NULL event_type otherwise yields a null dictionary index whose
        # to_numpy floats to NaN and IndexErrors the gather — the oracle's
        # CASE falls to ELSE (default) for NULL, so the engine must too
        rates = np.array(
            [
                _EVENT_RATES_PCT.get(v, _EVENT_DEFAULT_PCT)
                for v in enc.dictionary.to_pylist()
            ]
            + [_EVENT_DEFAULT_PCT],
            dtype=np.uint64,
        )
        # rate 100 means keep-all: 100 * (2^32 // 100) = 4294967200 < 2^32
        # would drop hashes in the top [2^32-96, 2^32) sliver (~2.2e-8)
        per_type = np.where(
            rates == 100, np.uint64(_M32), rates * np.uint64(_M32 // 100)
        )
        codes = pc.fill_null(enc.indices, len(enc.dictionary)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        thresholds = per_type[codes]
        kept = t.filter(pa.array(_h32(ids) < thresholds))
        # doubles don't hash stably across engines — cents convention
        return pa.table(
            {
                "event_id": kept["event_id"],
                "event_type": kept["event_type"],
                # floor(x*100+0.5), NOT pc.round: Arrow rounds half-to-even while
                # DuckDB ROUND rounds half-away — exact-.5 products diverge
                "value_c": pc.cast(
                    pc.floor(pc.add(pc.multiply(kept["value"], 100.0), 0.5)), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def train_test_split(sf_dir: str) -> rd.Dataset:
    """Deterministic 80/10/10 train/valid/test split of ``documents``;
    returns per-split row counts and total chars (the audit summary a
    curation run logs — the full split is the same filter fused into the
    downstream pipeline, never a materialized copy of the data).

    Partial counts are computed per batch (combiner), so the groupby
    shuffles one row per (batch, split) — never the documents.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bucket = _h32(ids) % np.uint64(100)
        split = np.where(
            bucket < _TRAIN_END, "train", np.where(bucket < _VALID_END, "valid", "test")
        )
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(split, return_inverse=True)
        return pa.table(
            {
                "split": pa.array(uniq, pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "sum_chars": pa.array(
                    np.bincount(inv, weights=n_chars, minlength=len(uniq)).astype(np.int64)
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .sum(["n_docs", "sum_chars"])
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "split": t["split"],
                "n_docs": pc.cast(t["sum(n_docs)"], pa.int64()),
                "sum_chars": pc.cast(t["sum(sum_chars)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# PPS pivot: a doc with n_chars >= this is always kept
_PPS_PIVOT_CHARS = 400


def weighted_sample_docs(sf_dir: str) -> rd.Dataset:
    """Probability-proportional-to-size Bernoulli sample of ``documents``:
    ``P(keep) = min(1, n_chars / 400)`` — long documents always survive,
    short ones proportionally to length (the curation shape for keeping
    token mass rather than doc count). Pure integer hash-threshold
    compare (``h32(doc_id) * 400 < n_chars * 2^32``), so it streams with
    no shuffle and the DuckDB oracle reproduces it bit-for-bit."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = _h32(ids) * np.uint64(_PPS_PIVOT_CHARS) < n_chars * np.uint64(_M32)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


# per-source balanced subset size
_PER_SOURCE_K = 10


def balanced_sample_docs(sf_dir: str) -> pa.Table:
    """Deterministic K-docs-per-source balanced subset: within each source
    keep the K docs with the smallest ``(h32(doc_id), doc_id)`` — a
    reproducible "uniform draw" per stratum with no RNG. Block-local
    per-source top-K partials bound the exchange at blocks × |sources| × K
    rows; the final reduce merges on the driver over the bounded source
    domain. The SQL twin is QUALIFY ROW_NUMBER() per source over the same
    integer hash order."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = _h32(ids)
        src = t["source"].to_pandas().to_numpy(dtype=object)
        import pandas as pd

        df = pd.DataFrame({"doc_id": ids, "source": src, "h": h})
        # dropna=False: the oracle's PARTITION BY source keeps a NULL
        # partition; pandas' default groupby would silently drop it
        df = df.sort_values(["source", "h", "doc_id"]).groupby(
            "source", sort=False, dropna=False
        ).head(_PER_SOURCE_K)
        return pa.table(
            {
                "doc_id": pa.array(df.doc_id.to_numpy(), pa.int64()),
                "source": pa.array(df.source, pa.string()),
                "h": pa.array(df.h.to_numpy(), pa.uint64()),
            }
        )

    parts = ds.map_batches(partial, batch_size=65536, batch_format="pyarrow").to_pandas()
    keep = (
        parts.sort_values(["source", "h", "doc_id"])
        .groupby("source", sort=False, dropna=False)
        .head(_PER_SOURCE_K)
        .sort_values(["source", "doc_id"])
    )
    return pa.table(
        {
            "doc_id": pa.array(keep.doc_id.to_numpy(), pa.int64()),
            "source": pa.array(keep.source, pa.string()),
        }
    )


def temperature_mix_docs(sf_dir: str) -> rd.Dataset:
    """Temperature-rebalanced source mix (the GPT-3/PaLM data-mixing rule):
    target share of source s ∝ n_s^alpha with alpha = 1/2, drawing half the
    corpus, so rare sources are upweighted relative to their raw share.
    Per-source keep probability p_s = min(1, w_s·N/2 / (W·n_s)) with
    w_s = isqrt(n_s), W = Σ w_s — ALL integer arithmetic (Python bigints on
    the driver, HUGEINT in the oracle), so the kept set hash-matches the
    SQL exactly.

    Scale shape: one bounded-domain count pass (blocks × |sources| partial
    rows to the driver), thresholds broadcast in a closure, then the same
    stateless hash filter as every sampler here — no shuffle, no RNG."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def count_partial(t: pa.Table) -> pa.Table:
        # drop NULL sources HERE, not implicitly: the driver merge below
        # (pandas groupby) silently drops a None key while Arrow's group_by
        # emits it, and the oracle's total/wsum CTEs would count it — so
        # NULL-source rows are excluded from counts explicitly on BOTH
        # sides (oracle: WHERE source IS NOT NULL in the c CTE); they then
        # keep nothing via _thr.get(s, 0), matching the oracle's inner JOIN
        t = t.filter(pc.is_valid(t["source"]))
        gb = t.select(["source"]).group_by("source").aggregate([([], "count_all")])
        return gb.rename_columns(["source", "n"])

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # zero-block stream (empty corpus): no columns at all
        counts: dict = {}
    else:
        agg = parts.groupby("source", as_index=False)["n"].sum()
        counts = {s: int(n) for s, n in zip(agg["source"], agg["n"])}
    total = sum(counts.values())
    n_target = total // 2
    # the oracle's FLOOR(SQRT(double)) equals isqrt only below ~2^52; fail
    # loudly rather than silently hash-diverging on an absurd per-source
    # count (the whole-corpus doc count, not bytes, so 2^52 is generous)
    assert all(n < (1 << 52) for n in counts.values()), "source count exceeds sqrt-exact range"
    w = {s: math.isqrt(n) for s, n in counts.items()}
    wsum = sum(w.values())
    thr = {
        s: min(_M32, (_M32 * w[s] * n_target) // (wsum * counts[s]))
        for s in counts
    }

    def keep(t: pa.Table, _thr=thr) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        # .get(s, 0): a source unseen in the count pass (e.g. NULL, which
        # pandas' partial-merge groupby drops) keeps nothing — the same
        # rows the oracle's inner JOIN drops
        lim = np.fromiter((_thr.get(s, 0) for s in src), np.uint64, len(src))
        return t.filter(pa.array(_h32(ids) < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


QUERIES = {
    "temperature_mix_docs": temperature_mix_docs,
    "balanced_sample_docs": balanced_sample_docs,
    "weighted_sample_docs": weighted_sample_docs,
    "hash_sample_docs": hash_sample_docs,
    "stratified_sample_events": stratified_sample_events,
    "train_test_split": train_test_split,
}

ORACLE_SQL = {
    "temperature_mix_docs": f"""
        WITH c AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n
                   FROM documents WHERE source IS NOT NULL GROUP BY source),
        t AS (SELECT SUM(n) AS total FROM c),
        w AS (SELECT source, n, CAST(FLOOR(SQRT(n)) AS HUGEINT) AS w FROM c),
        ws AS (SELECT SUM(w) AS wsum FROM w),
        thr AS (SELECT source,
                       LEAST(CAST({_M32} AS HUGEINT),
                             (CAST({_M32} AS HUGEINT) * w
                              * ((SELECT total FROM t) // 2))
                             // ((SELECT wsum FROM ws) * n)) AS lim
                FROM w)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr USING (source)
        WHERE (CAST(d.doc_id AS HUGEINT) * {_KNUTH}) % {_M32} < thr.lim
    """,
    "balanced_sample_docs": f"""
        SELECT doc_id, source FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32}, doc_id) <= {_PER_SOURCE_K}
    """,
    "weighted_sample_docs": f"""
        SELECT doc_id, n_chars
        FROM documents
        WHERE (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32} * {_PPS_PIVOT_CHARS} < n_chars * {_M32}
    """,
    "hash_sample_docs": f"""
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32} < {_DOC_THRESHOLD}
    """,
    "stratified_sample_events": f"""
        SELECT event_id, event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
        FROM events
        WHERE (CAST(event_id AS HUGEINT) * {_KNUTH}) % {_M32} <
              CASE event_type
                   WHEN 'purchase' THEN {_M32}  -- rate 100: keep-all, exactly
                   ELSE CAST(CASE event_type
                        WHEN 'click' THEN 50 WHEN 'view' THEN 10
                        WHEN 'error' THEN 5 WHEN 'signup' THEN 20
                        ELSE 10 END AS BIGINT) * {_M32 // 100} END
    """,
    "train_test_split": f"""
        SELECT CASE WHEN b < {_TRAIN_END} THEN 'train'
                    WHEN b < {_VALID_END} THEN 'valid' ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM (SELECT n_chars, (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32} % 100 AS b
              FROM documents)
        GROUP BY 1
    """,
}
