"""Composed training-corpus preparation — the end-to-end cleanup chain a
100 TB web-text pipeline runs before tokenization, as ONE streaming Ray Data
pipeline (the integration op; every stage is also exposed standalone):

    language gate (lang_id == 'en')
  → quality gate (length / token-count / distinct-token-ratio keep flag)
  → exact dedup among survivors (md5(text) fingerprint, min doc_id wins)
  → near-dup removal (keep only connected-component representatives of the
    blocked-Jaccard similarity graph at 50%)

Scale shape: the three per-document signals (lang, quality, fingerprint)
are computed in one fused map_batches pass — they all derive from the same
row, so no joins between them; the language+quality filters run BEFORE any
shuffle so the exact-dedup exchange moves only survivors; exact dedup is
one hash(fingerprint) coarse-partition groupby (winner = min doc_id inside
the partition); and the near-dup loser set (nodes of the corpus-wide
similarity graph that are not their cluster's min-id representative) is
removed with a hash-partitioned ``left_anti`` join — never a driver-side
set. The whole chain is oracle-checked against a single DuckDB query that
composes the same four stages (including the recursive-CTE connected
components).

Per-stage semantics are the canonical single-op versions:
``text.lang_id`` / ``text.quality_score`` (same marker regexes and
thresholds), ``dedup.dedup_exact`` (raw-text md5), and
``graph.dedup_clusters`` (prefix-blocked Jaccard ≥ 50% components).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_NPARTS = 16


def prep_training_corpus(sf_dir: str) -> rd.Dataset:
    """Returns (doc_id, n_tokens, distinct_pct) for every document that
    survives the full prep chain."""
    from crawler_ray.pipelines.dedup import prefix_jaccard_pairs
    from crawler_ray.pipelines.graph import connected_components
    from crawler_ray.pipelines.text import _CJK_PY, _MARKERS

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def signals(t: pa.Table) -> pa.Table:
        """Fused per-doc pass: language, quality and fingerprint in one
        scan; rows failing the language or quality gate are dropped HERE,
        before anything shuffles."""
        txt = t["text"]
        # --- lang (text.lang_id semantics) ---
        c = {
            k: pc.count_substring_regex(txt, pattern=p).to_numpy().astype(np.int64)
            for k, p in _MARKERS.items()
        }
        c_zh = pc.count_substring_regex(txt, pattern=_CJK_PY).to_numpy().astype(np.int64)
        m_en, m_de, m_fr, m_es = c["en"], c["de"], c["fr"], c["es"]
        is_en = (
            (c_zh == 0) & (m_en > 0) & (m_en >= m_de) & (m_en >= m_fr) & (m_en >= m_es)
        )
        # --- quality (text.quality_score semantics, vectorized twin) ---
        from crawler_ray.pipelines.text import _doc_distinct_counts

        n_tok = pc.cast(
            pc.count_substring_regex(txt, pattern=r"[A-Za-z0-9]+"), pa.int64()
        ).to_numpy()
        n_distinct = _doc_distinct_counts(txt)
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64()).to_numpy()
        distinct_pct = np.where(n_tok > 0, (100 * n_distinct) // np.maximum(n_tok, 1), 0)
        keep = is_en & (n_chars >= 100) & (n_tok >= 20) & (distinct_pct >= 30)
        # --- fingerprint (dedup.dedup_exact semantics: raw-text md5) ---
        # convert ONLY gate survivors to Python strings: on web text most
        # rows fail the gate, and a whole-batch to_pylist materialized
        # every dropped row's text just to ignore it
        idx = np.nonzero(keep)[0]
        texts = txt.combine_chunks().take(pa.array(idx)).to_pylist()
        fps = [hashlib.md5(s.encode()).hexdigest() for s in texts]
        h = pd.util.hash_array(np.asarray(fps, dtype=object))
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(idx)),
                "n_tokens": pa.array(n_tok[idx]),
                "distinct_pct": pa.array(distinct_pct[idx].astype(np.int64)),
                "fingerprint": pa.array(fps, pa.string()),
                "part": pa.array((h % np.uint64(_NPARTS)).astype(np.int32)),
            }
        )

    filtered = docs.map_batches(signals, batch_size=4096, batch_format="pyarrow")

    def exact_winners(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby("fingerprint", sort=False)["doc_id"].transform("min")
        out = g[g["doc_id"] == win]
        return out[["doc_id", "n_tokens", "distinct_pct"]]

    survivors = filtered.groupby("part").map_groups(exact_winners, batch_format="pandas")

    # near-dup losers over the corpus-wide similarity graph: every node of
    # a ≥50%-Jaccard component except its min-id representative
    comp = connected_components(
        prefix_jaccard_pairs(sf_dir).map_batches(
            lambda t: t.filter(pc.greater_equal(t["jacc_pct"], 50)),
            batch_format="pyarrow",
        ),
        src="a_id",
        dst="b_id",
    )
    losers = comp.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
    )
    # loser set is pair-bounded (≤ 1 row per similarity-graph node), so the
    # size-adaptive anti-gate broadcasts it and the final cut is a
    # stateless filter; hash-shuffle left_anti fallback above the ceiling
    from crawler_ray.pipelines.relational import _anti_gate

    return _anti_gate(survivors, losers, "doc_id", "doc_id")




def _next_fit(ids, ntok, seq_len: int):
    """Shared greedy next-fit placement: (seq_ids, offsets) for doc_id-sorted
    ids with per-doc (already seq_len-capped) token counts — the ONE loop
    both pack_sequences and export_training_shards execute, so the two
    surfaces cannot drift."""
    import numpy as np

    seq_ids = np.empty(len(ids), np.int64)
    offsets = np.empty(len(ids), np.int64)
    cur_seq, fill = -1, seq_len + 1  # force a new bin on the first doc
    for i in range(len(ids)):
        if fill + ntok[i] > seq_len:
            cur_seq, fill = ids[i], 0
        seq_ids[i] = cur_seq
        offsets[i] = fill
        fill += ntok[i]
    return seq_ids, offsets


def pack_sequences(sf_dir: str, seq_len: int = 2048) -> rd.Dataset:
    """Greedy next-fit sequence packing: assign documents (in doc_id order
    within each block) to fixed-``seq_len`` training sequences, emitting
    the placement manifest ``(seq_id, doc_id, seq_offset_tok, n_tok)`` a
    tokenizer-side packer would execute. Whole-doc placement (docs longer
    than ``seq_len`` are truncated to it, counted in ``n_tok``); bins
    never cross block boundaries, so packing is embarrassingly parallel —
    the edge-of-block utilization loss is the price of zero shuffle and is
    what production packers accept per shard. ``seq_id`` = doc_id of the
    bin's first document (each doc starts exactly one bin → globally
    unique without coordination). Rows-only: next-fit is sequential per
    block, not SQL-expressible; invariants are pinned by pytest."""
    import numpy as np
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pack(t: pa.Table) -> pa.Table:
        order = pc.array_sort_indices(t["doc_id"])
        t = t.take(order)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ntok = np.minimum(
            pc.count_substring_regex(t["text"], pattern=r"[A-Za-z0-9]+")
            .to_numpy()
            .astype(np.int64),
            seq_len,
        )
        seq_ids, offsets = _next_fit(ids, ntok, seq_len)
        return pa.table(
            {
                "seq_id": pa.array(seq_ids),
                "doc_id": pa.array(ids),
                "seq_offset_tok": pa.array(offsets),
                "n_tok": pa.array(ntok),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def export_training_shards(
    sf_dir: str,
    out_root: str,
    seq_len: int = 2048,
    shards: int = 8,
) -> dict:
    """End-to-end training-data delivery, resumable at every stage: the
    curated corpus (full prep chain: language gate → quality gate → exact
    dedup → near-dup component removal) lands ONCE as Parquet under
    ``out_root/curated/`` (data first, ``_DONE`` marker last — the crawl
    checkpoint contract), then the packing manifest is produced per shard
    through ``sharded_run`` (``out_root/packed/shard=K/``): a killed
    export reruns only unfinished shards, never the curation pass.

    Packing here consumes the curated manifest's ``n_tokens`` directly
    (no re-tokenize); bins never cross shard-block boundaries, exactly as
    ``pack_sequences``. Returns the shard manifest."""
    import shutil as _sh

    from crawler_ray.pipelines.shard_runner import sharded_run

    # Markers are only valid for THIS (input, seq_len, shards) combination:
    # re-invoking the same out_root with different params must rerun, not
    # silently reuse stale curated data / packed manifests.
    params = f"sf_dir={os.path.abspath(sf_dir)} seq_len={seq_len} shards={shards}"
    pfile = os.path.join(out_root, "params.json")
    if os.path.exists(pfile):
        with open(pfile) as fh:
            if fh.read() != params:
                _sh.rmtree(os.path.join(out_root, "curated"), ignore_errors=True)
                _sh.rmtree(os.path.join(out_root, "packed"), ignore_errors=True)
                os.remove(pfile)
    if not os.path.exists(pfile):
        os.makedirs(out_root, exist_ok=True)
        with open(pfile + ".tmp", "w") as fh:
            fh.write(params)
        os.replace(pfile + ".tmp", pfile)

    cdir = os.path.join(out_root, "curated")
    marker = os.path.join(cdir, "_DONE")
    if not os.path.exists(marker):
        _sh.rmtree(cdir, ignore_errors=True)
        prep_training_corpus(sf_dir).write_parquet(cdir)
        with open(marker + ".tmp", "w") as fh:
            fh.write("ok")
        os.replace(marker + ".tmp", marker)
    files = sorted(
        os.path.join(cdir, f) for f in os.listdir(cdir) if f.endswith(".parquet")
    )

    def pack_stage(ds: rd.Dataset) -> rd.Dataset:
        def pack(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            order = pc.array_sort_indices(t["doc_id"])
            t = t.take(order)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            ntok = np.minimum(
                t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64), seq_len
            )
            seq_ids, offsets = _next_fit(ids, ntok, seq_len)
            return pa.table(
                {
                    "seq_id": pa.array(seq_ids),
                    "doc_id": pa.array(ids),
                    "seq_offset_tok": pa.array(offsets),
                    "n_tok": pa.array(ntok),
                }
            )

        return ds.map_batches(pack, batch_format="pyarrow")

    return sharded_run(files, pack_stage, os.path.join(out_root, "packed"), shards)


QUERIES = {"prep_training_corpus": prep_training_corpus, "pack_sequences": pack_sequences}

ORACLE_SQL = {
    "prep_training_corpus": r"""
        WITH RECURSIVE sig AS (
            SELECT doc_id, LENGTH(text) AS n_chars,
                   REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+') AS toks,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(the|and|of|to)\b')) AS m_en,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(der|die|das|und)\b')) AS m_de,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(le|la|les|et)\b')) AS m_fr,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(el|los|las|y)\b')) AS m_es,
                   LEN(REGEXP_EXTRACT_ALL(text, '[\x{4e00}-\x{9fff}]')) AS m_zh,
                   MD5(text) AS fingerprint
            FROM documents),
        base AS (
            SELECT doc_id,
                   CAST(LEN(toks) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN LEN(toks) > 0
                        THEN (100 * LEN(LIST_DISTINCT(toks))) // GREATEST(LEN(toks), 1)
                        ELSE 0 END AS BIGINT) AS distinct_pct,
                   fingerprint
            FROM sig
            WHERE m_zh = 0 AND m_en > 0 AND m_en >= m_de AND m_en >= m_fr
              AND m_en >= m_es
              AND n_chars >= 100 AND LEN(toks) >= 20
              AND (CASE WHEN LEN(toks) > 0
                   THEN (100 * LEN(LIST_DISTINCT(toks))) // GREATEST(LEN(toks), 1)
                   ELSE 0 END) >= 30),
        surv AS (
            SELECT doc_id, n_tokens, distinct_pct FROM base
            QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint)),
        tok AS (
            SELECT doc_id, SUBSTR(text, 1, 100) AS p,
                   LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS jtoks
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY SUBSTR(text, 1, 100)
                                       ORDER BY doc_id) <= 256),
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
            WHERE CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.jtoks, b.jtoks))) > 0
                  THEN (100 * LEN(LIST_INTERSECT(a.jtoks, b.jtoks)))
                       // LEN(LIST_DISTINCT(LIST_CONCAT(a.jtoks, b.jtoks)))
                  ELSE 0 END >= 50),
        edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                  UNION SELECT b_id, a_id FROM pairs),
        reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        losers AS (SELECT u AS doc_id FROM reach GROUP BY u
                   HAVING u <> MIN(v))
        SELECT s.doc_id, s.n_tokens, s.distinct_pct
        FROM surv s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
}
