"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline staples (language-ID, quality scoring, token
counting, fingerprinting), each a vectorized ``map_batches`` stage over
Arrow string columns — `pyarrow.compute` regex kernels where a kernel
exists, compiled-`re` row loops (C-bound) only where per-row sets are
needed. Outputs are integers/strings only, so the DuckDB oracles hash
identically.

The winnowing fingerprinter (rows-only) is the scale path for local
near-dup detection (Schleimer et al., "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
_WS_RE = re.compile(r"\s+")

# language marker sets — deliberately tiny n-gram/stopword heuristics; the
# point is a deterministic, SQL-reproducible classifier, not accuracy
_MARKERS = {
    "en": r"\b(the|and|of|to)\b",
    "de": r"\b(der|die|das|und)\b",
    "fr": r"\b(le|la|les|et)\b",
    "es": r"\b(el|los|las|y)\b",
}
_CJK_PY = r"[一-鿿]"
_CJK_SQL = r"[\x{4e00}-\x{9fff}]"


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# canonical empty output of bigram_familiarity's grams stage (module-level
# so the per-batch fast paths don't rebuild it)
_GRAMS_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "gram": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()),
        "part": pa.array([], pa.int32()),
    }
)


def _exact_lower(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercase that is the exact ``str.lower()`` twin: Arrow's
    ``utf8_lower`` is the SIMPLE Unicode mapping, Python's the FULL one —
    they differ on e.g. U+0130 ('İ' → 'i' vs 'i' + combining dot, which a
    token splitter then cuts differently). An all-ASCII batch (the hot
    path; the mappings agree on ASCII) takes the Arrow kernel; any batch
    with non-ASCII text falls back to per-row ``str.lower``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) and not pc.all(pc.string_is_ascii(texts)).as_py():
        return pa.array([s.lower() for s in texts.to_pylist()], pa.string())
    return pc.utf8_lower(texts)


def _doc_token_counts(
    ids: "np.ndarray", texts: pa.ChunkedArray | pa.Array
) -> tuple["np.ndarray", pa.Array, "np.ndarray"]:
    """Per-document token counts, fully vectorized — the Arrow-kernel twin
    of ``Counter(_TOKEN_RE.findall(s.lower()))`` per row (same (doc, token,
    count) multiset; within-doc token order is code order, not first-seen).

    One lower + ``split_pattern_regex`` pass over the column, then numpy:
    flatten with parent ids, dictionary-encode the flat tokens, and count
    (parent, code) pairs via ``np.unique`` on a packed int64 key. Returns
    (doc_ids, tokens, counts) sorted by (input row, token code) — each
    doc's rows contiguous, preserving the block-contract callers rely on.

    Case mapping: Arrow's ``utf8_lower`` is the SIMPLE Unicode mapping,
    Python's ``str.lower()`` the FULL one — they differ on e.g. U+0130
    ('İ' → 'i' vs 'i' + combining dot, which the splitter then cuts). An
    all-ASCII batch (the hot path; the two mappings agree on ASCII) takes
    the Arrow kernel; any batch with non-ASCII text falls back to Python
    ``str.lower`` so the multiset stays the exact findall/Counter twin.
    """
    low = _exact_lower(texts)
    lists = pc.split_pattern_regex(low, pattern=r"[^A-Za-z0-9]+")
    flat = lists.flatten()
    offs = lists.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
    # split emits "" at run boundaries (leading/trailing delimiters); the
    # dictionary code for "" (if present) is masked out below
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vocab = enc.dictionary
    k = len(vocab)
    empty_code = pc.index(vocab, "").as_py() if k else -1
    if empty_code >= 0:
        keep = codes != empty_code
        codes, parent = codes[keep], parent[keep]
    key, counts = np.unique(parent * k + codes, return_counts=True)
    p, c = key // max(k, 1), key % max(k, 1)
    return ids[p], vocab.take(pa.array(c, pa.int64())), counts.astype(np.int64)


def _doc_distinct_counts(texts: pa.ChunkedArray | pa.Array) -> "np.ndarray":
    """Distinct alnum-token count per row, vectorized — the Arrow/numpy
    twin of ``len(set(_TOKEN_RE.findall(s)))`` (case-preserving, matching
    ``quality_score``'s loop). Same split/encode/unique shape as
    ``_doc_token_counts`` but only the per-row distinct cardinality comes
    back."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(texts, pattern=r"[^A-Za-z0-9]+")
    offs = lists.offsets.to_numpy(zero_copy_only=False)
    n_rows = len(lists)
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))
    enc = pc.dictionary_encode(lists.flatten())
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    k = len(enc.dictionary)
    empty_code = pc.index(enc.dictionary, "").as_py() if k else -1
    if empty_code >= 0:
        keep = codes != empty_code
        codes, parent = codes[keep], parent[keep]
    uniq = np.unique(parent * max(k, 1) + codes)
    return np.bincount(uniq // max(k, 1), minlength=n_rows).astype(np.int64)


def token_stats(sf_dir: str) -> rd.Dataset:
    """Token counting: whitespace words + a BPE-ish alnum-token regex, all
    pyarrow.compute kernels (no Python loop)."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars2": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "n_tokens": pc.cast(pc.count_substring_regex(t["text"], pattern=r"[A-Za-z0-9]+"), pa.int64()),
                "n_words": pc.cast(pc.count_substring_regex(t["text"], pattern=r"[^ ]+"), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def quality_score(sf_dir: str) -> rd.Dataset:
    """Quality heuristics: length, token count, distinct-token ratio (the
    repetition signal) → integer score components + keep flag."""

    def fn(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=r"[A-Za-z0-9]+"), pa.int64()
        ).to_numpy()
        n_distinct = _doc_distinct_counts(t["text"])
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy()
        distinct_pct = np.where(n_tok > 0, (100 * n_distinct) // np.maximum(n_tok, 1), 0)
        keep = (n_chars >= 100) & (n_tok >= 20) & (distinct_pct >= 30)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "distinct_pct": pa.array(distinct_pct.astype(np.int64)),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(sf_dir: str) -> rd.Dataset:
    """Gopher-style quality rules (Rae et al. 2021 §A1.1, re-expressed as
    exact-integer signals so the DuckDB oracle hash-matches): word count
    bounds, mean word length band, symbol-to-word ratio, alphabetic-word
    fraction, and stop-word presence.  Fully vectorized — every signal is
    a pyarrow.compute kernel over the raw string column; no Python loop,
    no tokenised intermediate ever materializes."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        low = pc.utf8_lower(txt)
        n_words = pc.count_substring_regex(txt, pattern=r"[A-Za-z0-9]+").to_numpy().astype(np.int64)
        # total alnum chars == sum of token lengths (tokens are maximal runs)
        alnum_chars = (
            pc.count_substring_regex(txt, pattern=r"[A-Za-z0-9]").to_numpy().astype(np.int64)
        )
        d = np.maximum(n_words, 1)
        mean_word_len_e2 = (100 * alnum_chars) // d
        # a maximal alnum run containing >=1 letter matches exactly once
        alpha_words = (
            pc.count_substring_regex(txt, pattern=r"[0-9]*[A-Za-z][A-Za-z0-9]*")
            .to_numpy()
            .astype(np.int64)
        )
        alpha_word_pct = (100 * alpha_words) // d
        n_sym = (
            pc.count_substring(txt, pattern="#").to_numpy().astype(np.int64)
            + pc.count_substring(txt, pattern="...").to_numpy().astype(np.int64)
            + pc.count_substring(txt, pattern="…").to_numpy().astype(np.int64)
        )
        symbol_ratio_e4 = (10000 * n_sym) // d
        hits = np.zeros(t.num_rows, np.int64)
        for w in _GOPHER_STOPWORDS:
            hits += (
                pc.match_substring_regex(low, pattern=rf"(^|[^a-z0-9]){w}([^a-z0-9]|$)")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        # Gopher's published bands, with the mean-word-length ceiling and
        # stop-word minimum tightened so the gate is non-degenerate on the
        # synthetic word-salad corpus (hits saturate at 1 there)
        keep = (
            (n_words >= 50)
            & (n_words <= 100000)
            & (mean_word_len_e2 >= 300)
            & (mean_word_len_e2 <= 460)
            & (symbol_ratio_e4 <= 1000)
            & (alpha_word_pct >= 80)
            & (hits >= 1)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "mean_word_len_e2": pa.array(mean_word_len_e2),
                "symbol_ratio_e4": pa.array(symbol_ratio_e4),
                "alpha_word_pct": pa.array(alpha_word_pct),
                "stopword_hits": pa.array(hits),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def lang_id(sf_dir: str) -> rd.Dataset:
    """Language-ID: marker-token counts + CJK-char count, fixed-priority
    argmax — fully vectorized with count_substring_regex kernels."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        c = {
            k: pc.count_substring_regex(txt, pattern=p).to_numpy().astype(np.int64)
            for k, p in _MARKERS.items()
        }
        c_zh = pc.count_substring_regex(txt, pattern=_CJK_PY).to_numpy().astype(np.int64)
        pred = np.full(t.num_rows, "unk", dtype=object)
        # fixed priority: zh > en >= de >= fr >= es (ties break toward the
        # earlier entry; mirrored exactly in the SQL CASE chain)
        m_en, m_de, m_fr, m_es = c["en"], c["de"], c["fr"], c["es"]
        pred[(m_es > 0)] = "es"
        pred[(m_fr > 0) & (m_fr >= m_es)] = "fr"
        pred[(m_de > 0) & (m_de >= m_fr) & (m_de >= m_es)] = "de"
        pred[(m_en > 0) & (m_en >= m_de) & (m_en >= m_fr) & (m_en >= m_es)] = "en"
        pred[c_zh > 0] = "zh"
        return pa.table({"doc_id": t["doc_id"], "pred_lang": pa.array(pred, pa.string())})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Document fingerprint: md5 of whitespace-normalized lowercased text."""

    def fn(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(_WS_RE.sub(" ", s.lower()).strip().encode()).hexdigest()
            for s in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps, pa.string())})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _winnow(tokens: list[str], k: int = 5, w: int = 4) -> list[int]:
    """Winnowing: k-gram rolling hashes, per-window rightmost-minimum."""
    if len(tokens) < k:
        return []
    hashes = [
        int.from_bytes(hashlib.md5(" ".join(tokens[i : i + k]).encode()).digest()[:8], "big")
        for i in range(len(tokens) - k + 1)
    ]
    out: list[int] = []
    last = -1
    for i in range(max(1, len(hashes) - w + 1)):
        win = hashes[i : i + w]
        j = i + max(range(len(win)), key=lambda x: (win[x] <= min(win), x))
        if j != last:
            out.append(hashes[j - i + i])
            last = j
    return out


def winnow_fingerprints(sf_dir: str) -> rd.Dataset:
    """Winnowed k-gram fingerprints per doc (rows-only: algorithmic op)."""

    def fn(t: pa.Table) -> pa.Table:
        n_fp, min_fp = [], []
        for s in t["text"].to_pylist():
            fps = _winnow(_TOKEN_RE.findall(s.lower()))
            n_fp.append(len(fps))
            min_fp.append(f"{min(fps):016x}" if fps else "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array(n_fp, pa.int64()),
                "min_fp": pa.array(min_fp, pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _hll_partial(keys: "np.ndarray", p: int) -> "np.ndarray":
    """HyperLogLog register maxima for a batch of uint64 hashed keys."""
    import numpy as np

    m = 1 << p
    idx = (keys >> np.uint64(64 - p)).astype(np.int64)
    rest = keys << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    rank = np.full(len(keys), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # leading-zero count: int.bit_length per element (exact; float
        # log2 loses precision above 2^53)
        r = rest[nz]
        lz = np.fromiter((64 - int(x).bit_length() for x in r), np.uint8, len(r))
        rank[nz] = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: "np.ndarray") -> float:
    import numpy as np

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small-range correction
    return float(est)


def hll_token_cardinality(sf_dir: str, p: int = 12) -> "pa.Table":
    """Approximate distinct-token count over the whole corpus via
    HyperLogLog (Flajolet et al. '07) — the mergeable-sketch pattern: each
    batch emits its 2^p register maxima (one small binary blob), the global
    combine is an elementwise max, and the driver only ever sees register
    blobs. Exactness is pinned by pytest against the true distinct count
    (stderr ≈ 1.04/sqrt(2^p) ≈ 1.6% at p=12); rows-only for the driver."""
    import hashlib

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        toks = set()
        for s in t["text"].to_pylist():
            toks.update(_TOKEN_RE.findall(s.lower()))
        keys = np.fromiter(
            (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in toks),
            np.uint64, len(toks),
        )
        regs = _hll_partial(keys, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = _docs(sf_dir).map_batches(partial, batch_format="pyarrow")
    regs = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    return pa.table(
        {"approx_distinct_tokens": pa.array([int(round(_hll_estimate(regs)))], pa.int64())}
    )


def top_terms(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Corpus-wide document frequency: the top-k tokens by how many
    documents contain them (the vocabulary/stopword profile every corpus
    audit starts with).

    Scale shape: per-batch *distinct-per-doc* partial counts (each doc lives
    in exactly one batch, so per-batch distinct then global sum is exact
    count-distinct without a (doc, token) shuffle); the groupby moves one
    row per (batch, distinct-token) — vocabulary-sized, not corpus-sized —
    and the final sort+limit runs over the vocabulary only. Tokenization is
    RE2 `[^a-z0-9]+` splitting of lowercased text on BOTH sides (pyarrow
    and DuckDB embed RE2), so the oracle hashes identically.
    """

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern="[^a-z0-9]+"
        ).combine_chunks()
        flat = toks.flatten()
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        rows = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        vals = flat.to_numpy(zero_copy_only=False)  # object array of str
        keep = vals != ""
        # distinct (row, token) pairs within the batch, then count per token
        import pandas as pd

        df = pd.DataFrame({"r": rows[keep], "token": vals[keep]}).drop_duplicates()
        counts = df["token"].value_counts()
        return pa.table(
            {
                "token": pa.array(counts.index.to_numpy(), pa.string()),
                "df": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    # vocabulary-sized partials merge, rank and cut on the DRIVER — the
    # same Heaps-law bound that lets the sibling ops (inverted_index,
    # tfidf) hold and broadcast the whole vocabulary driver-side; the
    # distributed groupby+sort+limit version paid two fixed-cost exchanges
    # to produce k rows
    parts = _docs(sf_dir).map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pa.table(
        {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
    )
    if parts.empty:  # zero-block stream (empty corpus): no columns at all
        return rd.from_arrow(empty)
    agg = (
        parts.groupby("token", as_index=False)["df"]
        .sum()
        .sort_values(["df", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
    )
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(agg["token"].to_numpy(dtype=object), pa.string()),
                "df": pa.array(agg["df"].to_numpy().astype(np.int64)),
            }
        )
    )


def tfidf_top_terms(sf_dir: str, top_n: int = 3, parts: int = 16) -> rd.Dataset:
    """Per-document top-N TF-IDF terms (integer score ``tf*1e6 // df`` so
    the DuckDB oracle hashes exactly — no float log).

    Scale shape: ZERO corpus-sized shuffles. The DF table is
    vocabulary-sized (per-block ``dictionary_encode`` partials → one small
    groupby-sum), so it is broadcast once via ``ray.put`` and scores are a
    vectorized ``searchsorted`` lookup per block. The per-doc top-N runs
    per BLOCK with ``batch_size=None``: ``doc_tf`` emits each document's
    postings contiguously inside one output block and materialized blocks
    are never split mid-block, so every doc's rows are complete within the
    batch — one pandas sort per block, never one group per doc (~100 µs/
    group overhead kills per-doc map_groups at corpus scale). An earlier
    design hash-joined tf against DF and re-shuffled by doc partition —
    two corpus-sized all-to-alls this removes. If the vocabulary ever
    outgrew broadcast size, the fallback is that hash join (df is the only
    global state; the top-N never needed a shuffle).

    Doc-contiguity guarantee: ``doc_tf`` *yields* doc-aligned sub-tables of
    ~64k rows. Ray's block builder emits blocks at yielded-batch boundaries
    and only slices a block mid-batch when one batch alone exceeds half of
    ``target_max_block_size`` (BlockOutputBuffer, MAX_SAFE_BLOCK_SIZE_FACTOR
    = 1.5) — a few-MB yield never does, so no block boundary can fall inside
    a document's postings at any corpus size, not just when a map task's
    whole output happens to fit one block."""
    import pandas as pd

    def doc_tf(t: pa.Table):
        chunk_rows = 65536
        ids, toks, tfs = _doc_token_counts(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"]
        )
        # yield in ~chunk_rows doc-aligned slices: advance each cut to the
        # end of the straddled document so no doc spans two yielded batches
        start, n = 0, len(ids)
        while start < n:
            end = min(start + chunk_rows, n)
            while end < n and ids[end] == ids[end - 1]:  # finish the straddled doc
                end += 1
            yield pa.table(
                {
                    "doc_id": pa.array(ids[start:end], pa.int64()),
                    "token": toks.slice(start, end - start),
                    "tf": pa.array(tfs[start:end], pa.int64()),
                }
            )
            start = end

    # materialize: tf is consumed TWICE (the DF aggregate and the join) —
    # without the cut the tokenize map re-executes per consumer, and fused
    # with the DF groupby it is Sort-reservation-throttled too
    tf = _docs(sf_dir).map_batches(doc_tf, batch_format="pyarrow").materialize()
    if tf.count() == 0:
        # empty corpus: the zero-block partial streams below have
        # column-less to_pandas() frames — return the canonical empty
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tfidf_c": pa.array([], pa.int64()),
                }
            )
        )
    # DF from the same tf rows: one row per (doc, token) already, so a
    # count per token IS count-distinct-doc. Per-block dictionary partials
    # merge on the DRIVER (pandas groupby over block-vocab-sized rows) —
    # the full DF table is about to be driver-held and broadcast via
    # ray.put anyway, so a distributed groupby here bought nothing but a
    # ~1 s fixed Sort exchange on vocabulary-sized data.
    df = (
        tf.select_columns(["token"])
        .map_batches(
            lambda t: pa.table(
                {
                    "token": pc.dictionary_encode(t["token"].combine_chunks()).dictionary,
                    "df": pa.array(
                        np.bincount(
                            pc.dictionary_encode(t["token"].combine_chunks())
                            .indices.to_numpy(zero_copy_only=False)
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # block-vocab-sized partials; take_all iterates per row/cell
        .groupby("token", as_index=False)["df"]
        .sum()
    )
    import ray

    vocab = df["token"].to_numpy(dtype=object)
    order = np.argsort(vocab)
    df_ref = ray.put((vocab[order], df["df"].to_numpy(dtype=np.int64)[order]))

    def score_topn(t: pa.Table, ref=df_ref) -> pa.Table:
        vocab_s, dfs = ray.get(ref)
        toks = t["token"].to_numpy(zero_copy_only=False)
        d = dfs[np.searchsorted(vocab_s, toks)]
        s = (t["tf"].to_numpy(zero_copy_only=False) * 1_000_000) // d
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame(
            {
                "doc_id": ids,
                "token": toks,
                "tfidf_c": s.astype(np.int64),
            }
        ).sort_values(
            ["doc_id", "tfidf_c", "token"], ascending=[True, False, True], kind="mergesort"
        )
        out = g.groupby("doc_id", sort=False).head(top_n)
        # A doc's posting rows are contiguous within the batch doc_tf
        # emitted, but Ray's dynamic block splitting (target_max_block_size)
        # can cut one output batch into several blocks — the ONLY docs that
        # can straddle a cut are the first and last of each block. Flag
        # them: their per-block top-N is a superset-preserving partial
        # (every global top-N row is in its block's top-N; the sort order
        # is strict within a doc, tokens are unique), so a tiny
        # boundary-only re-top-N downstream restores exactness.
        out = out.assign(boundary=(out["doc_id"] == ids[0]) | (out["doc_id"] == ids[-1]))
        return pa.Table.from_pandas(out, preserve_index=False)

    # batch_size=None: one batch per materialized block — doc-local top-N
    # without any corpus-sized shuffle; straddle-prone boundary docs
    # (≤2 per block) are re-merged through a block-count-sized groupby.
    scored = tf.map_batches(
        score_topn, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = scored.map_batches(
        lambda t: t.filter(pc.invert(t["boundary"])).drop_columns(["boundary"]),
        batch_format="pyarrow",
    )

    def merge_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["boundary"]).sort_values(
            ["doc_id", "tfidf_c", "token"], ascending=[True, False, True], kind="mergesort"
        )
        return g.groupby("doc_id", sort=False).head(top_n)

    bds = scored.map_batches(
        lambda t: t.filter(t["boundary"].combine_chunks()), batch_format="pyarrow"
    )
    # ≤ 2 straddle-prone docs × top_n rows per block — block-count-bounded,
    # so the repair merges on the DRIVER below the adaptive cut (the r4
    # version paid a full Ray groupby exchange ~1 s fixed cost to merge a
    # few hundred rows — the whole 2.4× bench regression); past the cut the
    # distributed groupby fallback keeps the op unbounded-safe. The bound
    # comes from the materialized block count (metadata, free) — an exact
    # bds.count() here cost a whole extra pipeline execution.
    if scored.num_blocks() * 2 * top_n <= 1_000_000:
        g = bds.to_pandas()
        merged = merge_topn(g)
        return interior.union(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(merged["doc_id"].to_numpy(), pa.int64()),
                        "token": pa.array(merged["token"], pa.string()),
                        "tfidf_c": pa.array(merged["tfidf_c"].to_numpy(), pa.int64()),
                    }
                )
            )
        )
    boundary = bds.groupby("doc_id").map_groups(merge_topn, batch_format="pandas")
    return interior.union(boundary)


def inverted_index(sf_dir: str, min_df: int = 50, parts: int = 16) -> rd.Dataset:
    """Posting-list construction — the core web-index build: one
    (term, doc_id, tf) posting per document containing a frequent term
    (df ≥ ``min_df``; the df gate models the head/torso vocabulary a real
    index shards separately from the long tail).

    Scale shape: per-batch (term, doc, tf) partials (each doc lives in one
    batch, so rows are already distinct), then a df aggregate whose shuffle
    is VOCABULARY-sized (per-block ``np.unique`` partials → one small
    groupby-sum), not corpus-sized: the frequent-term set (df ≥ min_df —
    Heaps'-law-bounded head/torso vocabulary, ~10^6 terms × ~20 B even at
    web scale) is broadcast once via ``ray.put`` and the posting stream is
    gated by a vectorized membership test. An earlier hash-partition-by-term
    design shuffled the full posting table to compute df locally; at 8 cpus
    on 5.6M postings the Sort cost 11 s of wall for <2 s of work and the
    per-partition pandas gate 30 s of UDF — the broadcast gate removes the
    corpus-sized all-to-all entirely (the only shuffle a real sharded index
    still needs is the final write placement by term, which is the sink's
    partitioning, not a compute dependency). If the frequent vocabulary ever
    exceeded broadcast size, the fallback is a hash-partitioned semi-join of
    postings against the frequent-term table."""

    def doc_tf(t: pa.Table) -> pa.Table:
        ids, toks, tfs = _doc_token_counts(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"]
        )
        return pa.table(
            {
                "term": toks,
                "doc_id": pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    # materialize: the tokenize map is the expensive stage and is consumed
    # twice (df aggregate + gated filter); fused with a downstream shuffle
    # it is also Sort-reservation-throttled to ~1 concurrent task
    tf = _docs(sf_dir).map_batches(doc_tf, batch_format="pyarrow").materialize()

    def partial_df(t: pa.Table) -> pa.Table:
        # each (term, doc) row is already distinct, so a row count IS df
        terms, counts = np.unique(t["term"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"term": pa.array(terms, pa.string()), "df": pa.array(counts, pa.int64())})

    # vocabulary-sized partials merge on the DRIVER (the frequent-term set
    # is about to be driver-held for the ray.put broadcast regardless, so a
    # distributed groupby here only added a fixed Sort-exchange cost)
    freq_parts = tf.map_batches(partial_df, batch_format="pyarrow").to_pandas()
    fsum = freq_parts.groupby("term", as_index=False)["df"].sum()
    freq_tbl = fsum[fsum["df"] >= min_df]
    import ray

    freq_ref = ray.put(np.sort(freq_tbl["term"].to_numpy(dtype=object)))

    def gate(t: pa.Table, ref=freq_ref) -> pa.Table:
        freq = ray.get(ref)
        keep = np.isin(t["term"].to_numpy(zero_copy_only=False), freq)
        return t.filter(pa.array(keep))

    return tf.map_batches(gate, batch_format="pyarrow")


def repetition_signals(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    per-document fraction of bigram occurrences taken by the single most
    frequent bigram (``top_bigram_pct``), fraction of bigram occurrences
    that are repeats (``dup_bigram_pct``), and the trigram analogue of the
    first (``top_trigram_pct``) — the standard filters for boilerplate /
    machine-generated repetition in web text. Integer percentages so the
    DuckDB oracle hashes exactly.

    Scale shape: pure streaming ``map_batches``, no shuffle — every signal
    is a per-row reduction (Counter over adjacent token pairs, C-bound)."""
    from collections import Counter

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        top_bg = np.zeros(n, np.int64)
        dup_bg = np.zeros(n, np.int64)
        top_tg = np.zeros(n, np.int64)
        for i, s in enumerate(t["text"].to_pylist()):
            toks = _TOKEN_RE.findall(s.lower())
            if len(toks) >= 2:
                c2 = Counter(zip(toks, toks[1:]))
                tot2 = len(toks) - 1
                top_bg[i] = 100 * max(c2.values()) // tot2
                dup_bg[i] = 100 * (tot2 - len(c2)) // tot2
            if len(toks) >= 3:
                c3 = Counter(zip(toks, toks[1:], toks[2:]))
                top_tg[i] = 100 * max(c3.values()) // (len(toks) - 2)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "top_bigram_pct": pa.array(top_bg),
                "dup_bigram_pct": pa.array(dup_bg),
                "top_trigram_pct": pa.array(top_tg),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def ngram_contamination(sf_dir: str, n: int = 5, parts: int = 16) -> rd.Dataset:
    """Train/eval decontamination check — the standard pre-training hygiene
    op: for each *eval* document (``doc_id % 10 == 0``), what fraction of
    its distinct word 5-grams also appears in ANY *train* document
    (``doc_id % 10 != 0``)? Emits ``(doc_id, n_grams, n_hit, contam_pct)``
    per eval doc with ≥1 five-gram.

    Scale shape: one corpus-sized explode into distinct (gram, doc, side)
    rows, then ONE hash-partition-by-gram exchange; membership (gram seen
    on the train side) is decided entirely inside each partition with a
    vectorized ``isin`` — all rows of a gram share its partition, so no
    join and no driver-held gram set. Per-doc hit counts are partition-
    local partials summed by a tiny eval-doc-sized groupby. Grams travel
    as strings here for oracle byte-equality; at 100 TB the gram column
    would be a 128-bit hash (same partitioning, ~20× narrower exchange)."""
    import pandas as pd

    def grams(t: pa.Table) -> pa.Table:
        # eval rows keep (doc, gram); train rows only need the DISTINCT
        # gram set (membership is "in ANY train doc"), so cross-doc train
        # repeats are combined per batch before anything shuffles and the
        # train side ships no doc ids (sentinel -1)
        ids: list[int] = []
        gs: list[str] = []
        train: set[str] = set()
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _TOKEN_RE.findall(s.lower())
            seen = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            if did % 10 == 0:
                ids.extend([did] * len(seen))
                gs.extend(seen)
            else:
                train.update(seen)
        n_ev = len(gs)
        gs.extend(train)
        all_ids = np.concatenate(
            [np.asarray(ids, np.int64), np.full(len(train), -1, np.int64)]
        )
        ev = np.concatenate(
            [np.ones(n_ev, np.int8), np.zeros(len(train), np.int8)]
        )
        h = pd.util.hash_array(np.asarray(gs, dtype=object))
        return pa.table(
            {
                "doc_id": pa.array(all_ids),
                "gram": pa.array(gs, pa.string()),
                "is_eval": pa.array(ev),
                "part": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        train = g.loc[g["is_eval"] == 0, "gram"]
        e = g[g["is_eval"] == 1]
        if e.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "n_hit": pd.Series([], dtype="int64"),
                }
            )
        hit = e["gram"].isin(train).to_numpy().astype(np.int64)
        out = (
            pd.DataFrame({"doc_id": e["doc_id"].to_numpy(), "n_grams": 1, "n_hit": hit})
            .groupby("doc_id", sort=False, as_index=False)
            .sum()
        )
        return out.astype({"doc_id": "int64", "n_grams": "int64", "n_hit": "int64"})

    partials = (
        _docs(sf_dir)
        .map_batches(grams, batch_size=1024, batch_format="pyarrow")
        # materialize: the gram explode is the expensive map; cut it from
        # the sort-groupby so the Sort reservation can't serialize it
        .materialize()
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )

    # coarse doc-hash partitions + one vectorized pandas groupby each —
    # Ray's fine-key groupby(doc_id).sum() costs ~ms per group (see the
    # bigram_familiarity note; same fix)
    def add_dpart(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "dpart",
            pa.array(((ids * np.uint64(2654435761)) % np.uint64(parts)).astype(np.int32)),
        )

    def merge_docs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False, as_index=False)[["n_grams", "n_hit"]].sum()
        out["contam_pct"] = (100 * out["n_hit"]) // np.maximum(out["n_grams"], 1)
        return out.astype(
            {"doc_id": "int64", "n_grams": "int64", "n_hit": "int64",
             "contam_pct": "int64"}
        )

    return (
        partials.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(merge_docs, batch_format="pandas")
    )


def bigram_familiarity(sf_dir: str, parts: int = 16) -> rd.Dataset:
    """Corpus-LM fluency proxy (the integer-exact stand-in for an n-gram
    LM perplexity filter, CCNet-style): for every document, how common are
    its consecutive token bigrams across the WHOLE corpus? Emits
    ``(doc_id, n_bigrams, fam_sum, fam_avg_c)`` where ``fam_sum`` is the
    sum over the doc's bigram occurrences of that bigram's corpus-wide
    occurrence count and ``fam_avg_c = 1e6 * fam_sum // n_bigrams``.
    Low-familiarity docs are gibberish/boilerplate candidates; all
    arithmetic is integer so the DuckDB oracle hashes identically.

    Scale shape (same skeleton as ``ngram_contamination``): per-batch
    combine to (doc, bigram, count) rows, ONE hash-partition-by-bigram
    exchange; the corpus-wide count per bigram is a within-partition
    transform (all rows of a bigram share its partition — no join, no
    driver-held vocabulary), per-doc partials are partition-local, and the
    final reduce is a doc-sized groupby-sum. At 100 TB the bigram string
    column becomes a 128-bit hash with identical partitioning."""
    import pandas as pd

    def grams(t: pa.Table) -> pa.Table:
        # Arrow-kernel tokenize: [A-Za-z0-9]+ findall over the lowered text
        # ≡ non-empty pieces of a split on [^a-z0-9]+ (the regex eats each
        # separator run whole, so empties only appear at string edges and
        # dropping them preserves token adjacency). Bigrams are the
        # consecutive-token join masked at doc boundaries; per-(doc, gram)
        # counts come from one np.unique over (doc index, dictionary code)
        # packed keys — byte-identical rows to the Counter-loop original
        # (pinned by tests/test_text_vectorized.py; _exact_lower keeps the
        # full-vs-simple Unicode case-mapping parity).
        txt = _exact_lower(t["text"])
        toks = pc.split_pattern_regex(txt, "[^a-z0-9]+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        dix = np.repeat(np.arange(len(docs)), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        dix = dix[keep]
        n = len(dix)
        if n < 2:
            return _GRAMS_EMPTY
        same = dix[1:] == dix[:-1]
        if not same.any():
            return _GRAMS_EMPTY
        left = flat.slice(0, n - 1).filter(pa.array(same))
        right = flat.slice(1, n - 1).filter(pa.array(same))
        gram = pc.binary_join_element_wise(left, right, " ")
        gdix = dix[:-1][same]
        de = gram.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nc = len(de.dictionary)
        key = gdix.astype(np.int64) * nc + codes
        uk, counts = np.unique(key, return_counts=True)
        odix = (uk // nc).astype(np.int64)
        gcol = de.dictionary.take(pa.array(uk % nc))
        h = pd.util.hash_array(gcol.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": pa.array(docs[odix], pa.int64()),
                "gram": gcol,
                "cnt": pa.array(counts, pa.int64()),
                "part": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("gram", sort=False)["cnt"].transform("sum").to_numpy()
        cnt = g["cnt"].to_numpy()
        out = (
            pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "n_bigrams": cnt,
                    "fam_sum": cnt * tot,
                }
            )
            .groupby("doc_id", sort=False, as_index=False)
            .sum()
        )
        return out.astype(
            {"doc_id": "int64", "n_bigrams": "int64", "fam_sum": "int64"}
        )

    partials = (
        _docs(sf_dir)
        .map_batches(grams, batch_size=1024, batch_format="pyarrow")
        # cut the expensive explode map out of the sort-groupby's resource
        # reservation (same measured rationale as ngram_contamination)
        .materialize()
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )

    # per-doc merge of the ≤`parts` partials via coarse doc-hash partitions
    # + ONE vectorized pandas groupby each — Ray's fine-key
    # groupby(doc_id).sum() paid ~3 ms/group here (17 s of a 40 s wall at
    # sf0.1); the same partial rows reduce in <1 s this way (the dup_spans
    # merge pattern)
    def add_dpart(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "dpart",
            pa.array(((ids * np.uint64(2654435761)) % np.uint64(parts)).astype(np.int32)),
        )

    def merge_docs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False, as_index=False)[
            ["n_bigrams", "fam_sum"]
        ].sum()
        out["fam_avg_c"] = (1_000_000 * out["fam_sum"]) // np.maximum(out["n_bigrams"], 1)
        return out.astype(
            {"doc_id": "int64", "n_bigrams": "int64", "fam_sum": "int64",
             "fam_avg_c": "int64"}
        )

    return (
        partials.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(merge_docs, batch_format="pandas")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_batch_scores(
    texts: list[str], terms: tuple[str, ...], df: "np.ndarray", n_docs: int, avgdl: float
) -> "np.ndarray":
    """Okapi BM25 scores for one batch of documents against a fixed term
    set (Robertson-Walker '94 formula; float64, fixed term-order
    accumulation so every caller — engine batches and the pytest oracle —
    produces bit-identical scores)."""
    from collections import Counter

    n = len(texts)
    tf = np.zeros((n, len(terms)), dtype=np.float64)
    dl = np.zeros(n, dtype=np.float64)
    tset = {t: j for j, t in enumerate(terms)}
    for i, s in enumerate(texts):
        toks = _TOKEN_RE.findall(s.lower())
        dl[i] = len(toks)
        for tok, c in Counter(toks).items():
            j = tset.get(tok)
            if j is not None:
                tf[i, j] = c
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[:, None] / avgdl)
    with np.errstate(invalid="ignore"):
        contrib = np.where(tf > 0, idf[None, :] * tf * (BM25_K1 + 1.0) / denom, 0.0)
    # left-associative term accumulation (NOT np.sum's pairwise tree) so the
    # DuckDB oracle's c0+c1+c2+c3 expression reproduces the float bit-for-bit
    s = contrib[:, 0].copy() if contrib.shape[1] else np.zeros(n)
    for j in range(1, contrib.shape[1]):
        s = s + contrib[:, j]
    return s


def bm25_topk(
    sf_dir: str,
    terms: tuple[str, ...] = ("data", "join", "batch", "stream"),
    k: int = 20,
) -> pa.Table:
    """BM25 top-k retrieval over the document corpus for a fixed query —
    the lexical twin of ``ann_bruteforce_topk`` (text retrieval is the
    other half of similarity search). Emits ``(rank, doc_id, score_e6)``,
    ties broken by doc_id.

    Scale shape: pass 1 streams per-batch (df-per-term, n_docs, Σdl)
    partials — a terms×blocks driver combine; pass 2 streams scoring with
    the tiny stats broadcast in the closure, keeping only each batch's
    top-k candidates, so the driver merge is O(batches × k), exactly the
    ANN merge bound. DuckDB-oracled: the scorer's float ops are evaluated in
    a fixed parenthesization (left-associative term sum) that the SQL twin
    mirrors expression-for-expression, so both produce identical doubles;
    the pytest oracle additionally pins the scorer itself."""
    docs = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        dfp = np.zeros(len(terms), dtype=np.int64)
        sdl = 0
        for s in t["text"].to_pylist():
            toks = _TOKEN_RE.findall(s.lower())
            sdl += len(toks)
            tokset = set(toks)
            for j, term in enumerate(terms):
                dfp[j] += term in tokset
        return pa.table(
            {
                "term_idx": pa.array(np.arange(len(terms)), pa.int32()),
                "df": pa.array(dfp),
                "n_docs": pa.array(np.full(len(terms), t.num_rows, np.int64)),
                "sum_dl": pa.array(np.full(len(terms), sdl, np.int64)),
            }
        )

    sp = docs.map_batches(stats, batch_size=1024, batch_format="pyarrow").to_pandas()
    agg = sp.groupby("term_idx").agg(df=("df", "sum"), n=("n_docs", "sum"), dl=("sum_dl", "sum"))
    df = agg["df"].to_numpy().astype(np.float64)
    n_docs = int(agg["n"].iloc[0])
    avgdl = float(agg["dl"].iloc[0]) / max(n_docs, 1)

    def score(t: pa.Table) -> pa.Table:
        s = _bm25_batch_scores(t["text"].to_pylist(), terms, df, n_docs, avgdl)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]  # batch-local candidates
        return pa.table({"doc_id": pa.array(ids[order]), "score": pa.array(s[order])})

    cand = docs.map_batches(score, batch_size=1024, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort").head(k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(cand) + 1, dtype=np.int64)),
            "doc_id": pa.array(cand["doc_id"].to_numpy().astype(np.int64)),
            # half-up like the oracle's FLOOR(x*1e6+0.5); BM25 scores are ≥ 0
            "score_e6": pa.array(
                np.floor(cand["score"].to_numpy() * 1e6 + 0.5).astype(np.int64)
            ),
        }
    )


class DocEmbedder:
    """Batched-inference actor stage: the 'model' (a seeded random
    projection over hashed token features — a deterministic stand-in for a
    sentence-transformer; no ML runtime in this container) loads ONCE per
    actor in ``__init__``; ``__call__`` embeds a whole batch as one matmul.
    This is the shape a real encoder drops into unchanged: swap the weight
    init for a checkpoint load and the featurizer for a tokenizer."""

    FEATS = 256

    def __init__(self, dim: int = 64, seed: int = 42):
        import numpy as np

        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((self.FEATS, dim)).astype(np.float32)
        self.dim = dim

    def _featurize(self, texts: list[str]) -> "np.ndarray":
        import hashlib

        import numpy as np

        x = np.zeros((len(texts), self.FEATS), dtype=np.float32)
        for i, s in enumerate(texts):
            for w in _TOKEN_RE.findall(s.lower()):
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "big")
                x[i, h % self.FEATS] += 1.0
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        return x / np.maximum(norms, 1e-9)

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        emb = self._featurize(t["text"].to_pylist()) @ self.w  # one matmul per batch
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            }
        )


def doc_embeddings(sf_dir: str) -> rd.Dataset:
    """Embed every document with an actor-pool encoder (model in
    ``__init__``, batched matmul in ``__call__`` — the batched-model-
    inference pattern; rows-only, determinism pinned by pytest)."""
    return _docs(sf_dir).map_batches(
        DocEmbedder, concurrency=(1, 4), batch_size=256, batch_format="pyarrow"
    )


def source_mixture(sf_dir: str) -> pa.Table:
    """Per-source mixture statistics for corpus weighting: doc count,
    token sum, and each source's token share in ppm (integer, so the
    oracle hashes identically). Per-block (source, n_docs, n_tokens)
    combiners shrink the collect to blocks × |sources|; the share needs
    the global total, so the final reduce is driver-side over the bounded
    source domain — the numbers a mixture-sampling config is written
    from."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ntok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=r"[A-Za-z0-9]+"), pa.int64()
        )
        gb = pa.table({"source": t["source"], "n_tokens": ntok}).group_by("source").aggregate(
            [("n_tokens", "sum"), ("n_tokens", "count")]
        )
        return gb.rename_columns(["source", "n_tokens", "n_docs"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
    )
    total = int(agg.n_tokens.sum())
    ppm = (agg.n_tokens.to_numpy() * 1_000_000) // max(total, 1)
    return pa.table(
        {
            "source": pa.array(agg.source, pa.string()),
            "n_docs": pa.array(agg.n_docs.to_numpy(), pa.int64()),
            "n_tokens": pa.array(agg.n_tokens.to_numpy(), pa.int64()),
            "token_ppm": pa.array(ppm.astype(np.int64)),
        }
    )


def ccnet_buckets(sf_dir: str, parts: int = 16) -> rd.Dataset:
    """CCNet-style per-language quality buckets (Wenzek et al. 2020): each
    document lands in ``head`` / ``middle`` / ``tail`` of ITS language by
    the corpus-LM fluency proxy (``bigram_familiarity``), with
    mean-relative integer thresholds — head when 50·fam ≥ 51·mean(lang),
    tail when 50·fam < 49·mean(lang); the ±2%% band is tuned to the
    synthetic corpus's tight familiarity spread (p10–p90 ≈ ±4%%) so the
    gate is non-degenerate — so the oracle hash-matches exactly
    (rank-free thresholds avoid a global per-language sort).

    Scale shape: the two doc-sized signal tables co-locate in ONE
    doc-hash exchange (tag-union, the repo's co-group idiom); the
    per-language means are a bounded-domain reduce (≤ |langs| rows to
    the driver), broadcast back into a stateless bucket map."""
    fam = bigram_familiarity(sf_dir, parts=parts)
    lang = lang_id(sf_dir)

    from crawler_ray.pipelines.common import dpart_of

    def _dpart(ids: np.ndarray) -> pa.Array:
        return dpart_of(ids, parts)

    def tag_fam(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dpart": _dpart(ids),
                "doc_id": t["doc_id"],
                "fam_avg_c": pc.cast(t["fam_avg_c"], pa.int64()),
                "pred_lang": pa.nulls(t.num_rows, pa.string()),
            }
        )

    def tag_lang(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dpart": _dpart(ids),
                "doc_id": t["doc_id"],
                "fam_avg_c": pa.array(np.full(t.num_rows, -1, np.int64)),
                "pred_lang": t["pred_lang"],
            }
        )

    # adaptive attach: the lang side is one small string per doc, so below
    # the cut it broadcasts once via ray.put as (sorted doc_id, factorized
    # lang code) arrays and the join is a stateless searchsorted map over
    # the fam stream — no doc-keyed exchange. Above the cut the tag-union
    # co-group below (the repo's co-group idiom) handles corpus-sized
    # sides; identical inner-join semantics either way (fam rows without a
    # lang row drop, and vice versa).
    import pandas as pd
    import ray

    import os

    lang_mat = lang.materialize()
    if lang_mat.count() == 0:
        # empty corpus: zero-block streams downstream have column-less
        # to_pandas() frames — return the canonical empty table directly
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pred_lang": pa.array([], pa.string()),
                    "fam_avg_c": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        )
    bcast_cut = int(os.environ.get("CRAWLER_RAY_BCAST_ROWS", str(4_000_000)))
    if bcast_cut > 0 and lang_mat.count() <= bcast_cut:
        lp = lang_mat.to_pandas()
        codes, uniq = pd.factorize(lp["pred_lang"], sort=True)
        lids = lp["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(lids, kind="stable")
        lref = ray.put((lids[order], codes[order].astype(np.int32), uniq.to_numpy(dtype=object)))

        def attach(t: pa.Table, _ref=lref) -> pa.Table:
            nd, cd, un = ray.get(_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nd) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "fam_avg_c": pa.array([], pa.int64()),
                        "pred_lang": pa.array([], pa.string()),
                    }
                )
            idx = np.minimum(np.searchsorted(nd, ids), len(nd) - 1)
            hit = nd[idx] == ids
            kept = t.filter(pa.array(hit))
            return pa.table(
                {
                    "doc_id": kept["doc_id"],
                    "fam_avg_c": pc.cast(kept["fam_avg_c"], pa.int64()),
                    "pred_lang": pa.array(un[cd[idx[hit]]].astype(object), pa.string()),
                }
            )

        joined = fam.map_batches(attach, batch_format="pyarrow").materialize()
    else:
        unioned = fam.map_batches(tag_fam, batch_format="pyarrow").union(
            lang_mat.map_batches(tag_lang, batch_format="pyarrow")
        )

        def join_docs(g: pd.DataFrame) -> pd.DataFrame:
            f = g[g["fam_avg_c"] >= 0][["doc_id", "fam_avg_c"]]
            l = g[g["fam_avg_c"] < 0][["doc_id", "pred_lang"]]
            return f.merge(l, on="doc_id")  # inner: sub-2-token docs drop

        joined = (
            unioned.groupby("dpart").map_groups(join_docs, batch_format="pandas").materialize()
        )

    if joined.count() == 0:
        # zero-block JOINED stream: a non-empty corpus where no document
        # has >= 2 tokens leaves fam (and so the broadcast-attach output)
        # with zero blocks even though lang_id emitted rows — the lang_mat
        # guard above cannot see this case
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pred_lang": pa.array([], pa.string()),
                    "fam_avg_c": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        )

    def lang_partial(t: pa.Table) -> pa.Table:
        gb = (
            pa.table({"pred_lang": t["pred_lang"], "fam": t["fam_avg_c"]})
            .group_by("pred_lang")
            .aggregate([("fam", "sum"), ("fam", "count")])
        )
        return gb.rename_columns(["pred_lang", "fam_sum", "n"])

    parts_df = joined.map_batches(lang_partial, batch_format="pyarrow").to_pandas()
    agg = parts_df.groupby("pred_lang", as_index=False)[["fam_sum", "n"]].sum()
    means = {r.pred_lang: int(r.fam_sum) // int(r.n) for r in agg.itertuples()}

    def bucket(t: pa.Table, _m=means) -> pa.Table:
        fam_v = t["fam_avg_c"].to_numpy(zero_copy_only=False)
        langs = t["pred_lang"].to_numpy(zero_copy_only=False)
        m = np.fromiter((_m[s] for s in langs), np.int64, len(langs))
        out = np.where(
            50 * fam_v >= 51 * m, "head", np.where(50 * fam_v < 49 * m, "tail", "middle")
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": t["pred_lang"],
                "fam_avg_c": t["fam_avg_c"],
                "bucket": pa.array(out.astype(object), pa.string()),
            }
        )

    return joined.map_batches(bucket, batch_format="pyarrow")


QUERIES = {
    "source_mixture": source_mixture,
    "token_stats": token_stats,
    "quality_score": quality_score,
    "gopher_quality": gopher_quality,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "winnow_fingerprints": winnow_fingerprints,
    "hll_token_cardinality": hll_token_cardinality,
    "doc_embeddings": doc_embeddings,
    "top_terms": top_terms,
    "tfidf_top_terms": tfidf_top_terms,
    "inverted_index": inverted_index,
    "repetition_signals": repetition_signals,
    "ngram_contamination": ngram_contamination,
    "bigram_familiarity": bigram_familiarity,
    "ccnet_buckets": ccnet_buckets,
    "bm25_topk": bm25_topk,
}

ORACLE_SQL = {
    # Okapi BM25 twin: every float op parenthesized exactly as the engine
    # evaluates it (idf*tf then *2.2 then /denom; 0.75*dl then /avgdl; the
    # four term contributions summed LEFT-ASSOCIATIVELY as c0+c1+c2+c3),
    # so DuckDB's libm doubles reproduce the numpy scores bit-for-bit.
    "bm25_topk": r"""
        WITH d AS (
            SELECT doc_id,
                   CAST(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS DOUBLE) AS dl,
                   CAST(LEN(list_filter(regexp_extract_all(LOWER(text), '[a-z0-9]+'), x -> x = 'data')) AS DOUBLE) AS tf0,
                   CAST(LEN(list_filter(regexp_extract_all(LOWER(text), '[a-z0-9]+'), x -> x = 'join')) AS DOUBLE) AS tf1,
                   CAST(LEN(list_filter(regexp_extract_all(LOWER(text), '[a-z0-9]+'), x -> x = 'batch')) AS DOUBLE) AS tf2,
                   CAST(LEN(list_filter(regexp_extract_all(LOWER(text), '[a-z0-9]+'), x -> x = 'stream')) AS DOUBLE) AS tf3
            FROM documents),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(dl AS BIGINT)) / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS avgdl,
                   CAST(COUNT(*) FILTER (tf0 > 0) AS DOUBLE) AS df0,
                   CAST(COUNT(*) FILTER (tf1 > 0) AS DOUBLE) AS df1,
                   CAST(COUNT(*) FILTER (tf2 > 0) AS DOUBLE) AS df2,
                   CAST(COUNT(*) FILTER (tf3 > 0) AS DOUBLE) AS df3
            FROM d),
        sc AS (
            SELECT doc_id,
                   (CASE WHEN tf0 > 0 THEN ((ln(1.0 + ((s.n - s.df0) + 0.5) / (s.df0 + 0.5)) * tf0) * 2.2)
                         / (tf0 + 1.2 * ((1.0 - 0.75) + (0.75 * d.dl) / s.avgdl)) ELSE 0.0 END
                  + CASE WHEN tf1 > 0 THEN ((ln(1.0 + ((s.n - s.df1) + 0.5) / (s.df1 + 0.5)) * tf1) * 2.2)
                         / (tf1 + 1.2 * ((1.0 - 0.75) + (0.75 * d.dl) / s.avgdl)) ELSE 0.0 END
                  + CASE WHEN tf2 > 0 THEN ((ln(1.0 + ((s.n - s.df2) + 0.5) / (s.df2 + 0.5)) * tf2) * 2.2)
                         / (tf2 + 1.2 * ((1.0 - 0.75) + (0.75 * d.dl) / s.avgdl)) ELSE 0.0 END
                  + CASE WHEN tf3 > 0 THEN ((ln(1.0 + ((s.n - s.df3) + 0.5) / (s.df3 + 0.5)) * tf3) * 2.2)
                         / (tf3 + 1.2 * ((1.0 - 0.75) + (0.75 * d.dl) / s.avgdl)) ELSE 0.0 END) AS score
            FROM d CROSS JOIN s)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
               doc_id,
               CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_e6
        FROM sc ORDER BY score DESC, doc_id LIMIT 20
    """,
    "ccnet_buckets": r"""
        WITH t AS (
            SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, GREATEST(LEN(toks), 1)),
                          i -> toks[i] || ' ' || toks[i+1])) AS gram
            FROM t),
        c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1),
        d AS (SELECT g.doc_id, COUNT(*) AS n_bigrams, SUM(c.cnt) AS fam_sum
              FROM g JOIN c USING (gram) GROUP BY 1),
        lm AS (
            SELECT doc_id,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(the|and|of|to)\b')) AS m_en,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(der|die|das|und)\b')) AS m_de,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(le|la|les|et)\b')) AS m_fr,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(el|los|las|y)\b')) AS m_es,
                   LEN(REGEXP_EXTRACT_ALL(text, '[\x{4e00}-\x{9fff}]')) AS m_zh
            FROM documents),
        langs AS (
            SELECT doc_id,
                   CASE WHEN m_zh > 0 THEN 'zh'
                        WHEN m_en > 0 AND m_en >= m_de AND m_en >= m_fr AND m_en >= m_es THEN 'en'
                        WHEN m_de > 0 AND m_de >= m_fr AND m_de >= m_es THEN 'de'
                        WHEN m_fr > 0 AND m_fr >= m_es THEN 'fr'
                        WHEN m_es > 0 THEN 'es'
                        ELSE 'unk' END AS pred_lang
            FROM lm),
        j AS (SELECT d.doc_id, langs.pred_lang,
                     CAST((1000000 * d.fam_sum) // d.n_bigrams AS BIGINT) AS fam_avg_c
              FROM d JOIN langs USING (doc_id)),
        m AS (SELECT pred_lang, SUM(fam_avg_c) // COUNT(*) AS mu FROM j GROUP BY 1)
        SELECT j.doc_id, j.pred_lang, j.fam_avg_c,
               CASE WHEN 50 * j.fam_avg_c >= 51 * m.mu THEN 'head'
                    WHEN 50 * j.fam_avg_c < 49 * m.mu THEN 'tail'
                    ELSE 'middle' END AS bucket
        FROM j JOIN m USING (pred_lang)
    """,
    "source_mixture": """
        WITH s AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+'))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source)
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens * 1000000 // GREATEST(SUM(n_tokens) OVER (), 1) AS BIGINT)
                   AS token_ppm
        FROM s
    """,
    "repetition_signals": """
        WITH t AS (
            SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
            FROM documents),
        bg AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, GREATEST(LEN(toks), 1)),
                          i -> toks[i] || ' ' || toks[i+1])) AS g
            FROM t),
        bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bga AS (SELECT doc_id, MAX(c) AS maxc, SUM(c) AS tot,
                       COUNT(*) AS ndist
                FROM bgc GROUP BY 1),
        tg AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, GREATEST(LEN(toks) - 1, 1)),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
            FROM t),
        tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
        tga AS (SELECT doc_id, MAX(c) AS maxc, SUM(c) AS tot FROM tgc GROUP BY 1)
        SELECT d.doc_id,
               CAST(COALESCE((100 * bga.maxc) // bga.tot, 0) AS BIGINT) AS top_bigram_pct,
               CAST(COALESCE((100 * (bga.tot - bga.ndist)) // bga.tot, 0) AS BIGINT) AS dup_bigram_pct,
               CAST(COALESCE((100 * tga.maxc) // tga.tot, 0) AS BIGINT) AS top_trigram_pct
        FROM documents d
        LEFT JOIN bga ON d.doc_id = bga.doc_id
        LEFT JOIN tga ON d.doc_id = tga.doc_id
    """,
    "ngram_contamination": """
        WITH t AS (
            SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, GREATEST(LEN(toks) - 3, 1)),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                               || ' ' || toks[i+3] || ' ' || toks[i+4])) AS gram
            FROM t),
        gd AS (SELECT DISTINCT doc_id, gram FROM g),
        train AS (SELECT DISTINCT gram FROM gd WHERE doc_id % 10 <> 0),
        ev AS (SELECT gd.doc_id, COUNT(*) AS n,
                      SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS h
               FROM gd LEFT JOIN train tr ON gd.gram = tr.gram
               WHERE gd.doc_id % 10 = 0
               GROUP BY 1)
        SELECT doc_id, CAST(n AS BIGINT) AS n_grams, CAST(h AS BIGINT) AS n_hit,
               CAST((100 * h) // GREATEST(n, 1) AS BIGINT) AS contam_pct
        FROM ev
    """,
    "inverted_index": """
        WITH tok AS (
            SELECT doc_id,
                   UNNEST(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+')) AS term
            FROM documents),
        tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok2 GROUP BY 1, 2),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1)
        SELECT tf.term, tf.doc_id, tf.tf
        FROM tf JOIN df USING (term) WHERE df.df >= 50
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id,
                   UNNEST(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+')) AS token
            FROM documents),
        tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1)
        SELECT tf.doc_id, tf.token,
               CAST((tf.tf * 1000000) // df.df AS BIGINT) AS tfidf_c
        FROM tf JOIN df USING (token)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                   ORDER BY tfidf_c DESC, tf.token) <= 3
    """,
    "top_terms": """
        SELECT tok AS token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM (SELECT doc_id,
                     UNNEST(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY df DESC, tok
        LIMIT 50
    """,
    "token_stats": """
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars2,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS BIGINT) AS n_words
        FROM documents
    """,
    "quality_score": """
        WITH s AS (
            SELECT doc_id, LENGTH(text) AS n_chars,
                   REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+') AS toks
            FROM documents)
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               CAST(CASE WHEN LEN(toks) > 0
                    THEN (100 * LEN(LIST_DISTINCT(toks))) // GREATEST(LEN(toks), 1)
                    ELSE 0 END AS BIGINT) AS distinct_pct,
               CAST(CASE WHEN n_chars >= 100 AND LEN(toks) >= 20
                         AND (CASE WHEN LEN(toks) > 0
                              THEN (100 * LEN(LIST_DISTINCT(toks))) // GREATEST(LEN(toks), 1)
                              ELSE 0 END) >= 30
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM s
    """,
    "gopher_quality": r"""
        WITH s AS (
            SELECT doc_id, text,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]')) AS BIGINT) AS alnum_chars,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]*[A-Za-z][A-Za-z0-9]*')) AS BIGINT)
                       AS alpha_words,
                   CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
                        + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3
                        + (LENGTH(text) - LENGTH(REPLACE(text, '…', ''))) AS BIGINT) AS n_sym,
                   CAST((CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])the([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])be([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])to([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])of([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])and([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])that([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])have([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                      + (CASE WHEN REGEXP_MATCHES(LOWER(text), '(^|[^a-z0-9])with([^a-z0-9]|$)') THEN 1 ELSE 0 END)
                        AS BIGINT) AS stopword_hits
            FROM documents),
        m AS (
            SELECT doc_id, n_words, stopword_hits,
                   (100 * alnum_chars) // GREATEST(n_words, 1) AS mean_word_len_e2,
                   (10000 * n_sym) // GREATEST(n_words, 1) AS symbol_ratio_e4,
                   (100 * alpha_words) // GREATEST(n_words, 1) AS alpha_word_pct
            FROM s)
        SELECT doc_id, n_words, mean_word_len_e2, symbol_ratio_e4, alpha_word_pct,
               stopword_hits,
               CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                         AND mean_word_len_e2 BETWEEN 300 AND 460
                         AND symbol_ratio_e4 <= 1000
                         AND alpha_word_pct >= 80
                         AND stopword_hits >= 1
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m
    """,
    "lang_id": r"""
        WITH c AS (
            SELECT doc_id,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(the|and|of|to)\b')) AS m_en,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(der|die|das|und)\b')) AS m_de,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(le|la|les|et)\b')) AS m_fr,
                   LEN(REGEXP_EXTRACT_ALL(text, '\b(el|los|las|y)\b')) AS m_es,
                   LEN(REGEXP_EXTRACT_ALL(text, '[\x{4e00}-\x{9fff}]')) AS m_zh
            FROM documents)
        SELECT doc_id,
               CASE WHEN m_zh > 0 THEN 'zh'
                    WHEN m_en > 0 AND m_en >= m_de AND m_en >= m_fr AND m_en >= m_es THEN 'en'
                    WHEN m_de > 0 AND m_de >= m_fr AND m_de >= m_es THEN 'de'
                    WHEN m_fr > 0 AND m_fr >= m_es THEN 'fr'
                    WHEN m_es > 0 THEN 'es'
                    ELSE 'unk' END AS pred_lang
        FROM c
    """,
    "doc_fingerprint": r"""
        SELECT doc_id,
               MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "bigram_familiarity": """
        WITH t AS (
            SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, GREATEST(LEN(toks), 1)),
                          i -> toks[i] || ' ' || toks[i+1])) AS gram
            FROM t),
        c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1),
        d AS (SELECT g.doc_id, COUNT(*) AS n_bigrams, SUM(c.cnt) AS fam_sum
              FROM g JOIN c USING (gram) GROUP BY 1)
        SELECT doc_id,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(fam_sum AS BIGINT) AS fam_sum,
               CAST((1000000 * fam_sum) // n_bigrams AS BIGINT) AS fam_avg_c
        FROM d
    """,
}
