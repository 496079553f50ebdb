"""Curation / preprocessing operators over the ``documents`` table.

Three LM-data-pipeline staples the reference lacks, each a vectorized
``map_batches`` stage with a DuckDB oracle twin:

- ``pii_scrub`` — regex redaction of emails / phone numbers / IPv4
  addresses (the C4 / CCNet-style PII pass).  The synthetic corpus
  contains no PII, so the operator deterministically *plants* PII derived
  from ``doc_id`` — identically in the oracle SQL — before scrubbing;
  both engines then run the same RE2 patterns over the same dirty text
  (pyarrow and DuckDB both embed RE2, so the dialects agree).
- ``chunk_documents`` — fixed-size token chunking (the upstream of
  context-window packing): a 1→N explode built from segmented-arange
  chunk offsets over the split-token ListArray and ONE ``binary_join``
  kernel; no per-document Python loop.
- ``encode_tokens`` — vocabulary build (top-V tokens by corpus count)
  plus token-id encoding: the tokenizer front half of an LM pipeline.
  Vocab counts are vocabulary-sized partials (Heaps-law bounded, the
  ``top_terms`` argument); the encode pass is a stateless broadcast map
  (vocab ships once via ``ray.put``) — zero corpus-sized shuffles.

Scale notes: every stage is an Arrow-native per-batch transform; the only
driver collect is the V-row vocabulary.  Reference parity anchor: the
reference has no text-curation stages at all (its pipeline ends at rule
extraction, ``/root/reference/collect/parse.go``); these exist for the
100 TB training-data use the north star targets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# RE2 patterns, identical bytes on both engines (keep in sync with the
# oracle SQL below).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """Plant deterministic PII (from doc_id), then redact it: email →
    ``<EMAIL>``, phone → ``<PHONE>``, IPv4 → ``<IP>``, with per-type match
    counts.  Replacement order (email, phone, ip) is fixed and mirrored in
    the oracle."""

    def fn(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        s = lambda arr: pc.cast(pa.array(arr), pa.string())  # noqa: E731
        dirty = pc.binary_join_element_wise(
            t["text"],
            " reach user", s(d), "@mail", s(d % 5), ".com or +1-555-",
            pc.utf8_lpad(s(d % 10000), 4, "0"),
            " from 10.", s(d % 256), ".", s((d * 7) % 256), ".", s(d % 100),
            " end",
            "",
        )
        out = {"doc_id": t["doc_id"]}
        cur = dirty
        for name, pat, repl in (
            ("n_email", _EMAIL_RE, "<EMAIL>"),
            ("n_phone", _PHONE_RE, "<PHONE>"),
            ("n_ip", _IP_RE, "<IP>"),
        ):
            out[name] = pc.cast(pc.count_substring_regex(cur, pattern=pat), pa.int64())
            cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
        out["clean_text"] = cur
        return pa.table(out)

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


# defaults shared by the queries() entries AND their ORACLE_SQL twins — the
# SQL below is generated from these same constants, so a default change can
# never silently diverge the two sides (a NON-default call still has no
# oracle: the registered SQL always checks the default configuration)
CHUNK_TOKENS_DEFAULT = 64
VOCAB_SIZE_DEFAULT = 256


def chunk_documents(sf_dir: str, chunk_tokens: int = CHUNK_TOKENS_DEFAULT) -> rd.Dataset:
    """Split each document into consecutive ``chunk_tokens``-token chunks
    (space tokenization, last chunk ragged).  Fully vectorized 1→N
    explode: chunk boundaries are a refinement of the split-token
    ListArray's offsets (segmented arange), so re-joining is one
    ``binary_join`` kernel over a ListArray VIEW of the already-split
    token buffer — no per-document work."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(off)  # tokens per doc (>=1: split of "" is [""])
        nc = np.maximum((n + chunk_tokens - 1) // chunk_tokens, 1)
        total = int(nc.sum())
        rep = np.repeat(np.arange(len(n), dtype=np.int64), nc)
        base = np.concatenate(([0], np.cumsum(nc)[:-1]))
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(base, nc)
        cstart = off[:-1][rep] + chunk_id * chunk_tokens
        # within a doc chunk k ends where chunk k+1 starts, and the last
        # chunk ends at the doc end == the next doc's first chunk start,
        # so the starts alone (plus the final end) form a valid offsets
        # array — the ListArray is a zero-copy view over the token buffer
        list_off = np.empty(total + 1, np.int64)
        list_off[:-1] = cstart
        list_off[-1] = off[-1]
        lists = pa.ListArray.from_arrays(pa.array(list_off, pa.int32()), toks.values)
        return pa.table(
            {
                "doc_id": pa.array(t["doc_id"].to_numpy()[rep]),
                "chunk_id": pa.array(chunk_id),
                "chunk_text": pc.binary_join(lists, " "),
                "n_tokens": pa.array(np.diff(list_off)),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _token_explode(t: pa.Table):
    """(doc_id, 1-based pos, token) numpy views of a batch, space-split."""
    toks = pc.split_pattern(t["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(off)
    rows = np.repeat(np.arange(len(n), dtype=np.int64), n)
    # position within doc = global token index - doc's first token index
    pos = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(np.concatenate(([0], np.cumsum(n)[:-1])), n) + 1
    return rows, pos, toks.values


def encode_tokens(sf_dir: str, vocab_size: int = VOCAB_SIZE_DEFAULT) -> rd.Dataset:
    """Top-V vocabulary (count desc, token asc) + per-token id encoding.
    Output is the exploded (doc_id, pos, token_id) table (pos 1-based,
    OOV = -1) so the hash gate checks every token id."""
    docs = _docs(sf_dir)

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        gb = pa.table({"token": toks.values}).group_by(["token"]).aggregate([("token", "count")])
        return pa.table({"token": gb["token"], "c": pc.cast(gb["token_count"], pa.int64())})

    vocab = (
        docs.map_batches(counts, batch_format="pyarrow")
        # vocabulary-sized partials; keep the tokenize map un-throttled by
        # the groupby's reservation (same cut as top_terms)
        .materialize()
        .groupby("token")
        .sum("c")
        .to_pandas()
    )
    vocab = vocab.rename(columns={"sum(c)": "c"}).sort_values(
        ["c", "token"], ascending=[False, True], kind="mergesort"
    ).head(vocab_size)
    order = np.argsort(vocab["token"].to_numpy())
    vt = vocab["token"].to_numpy()[order]
    vid = np.arange(len(vocab), dtype=np.int64)[order]
    ref = ray.put((vt, vid))

    def enc(t: pa.Table, ref=ref) -> pa.Table:
        vt, vid = ray.get(ref)
        rows, pos, flat = _token_explode(t)
        vals = flat.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vt, vals)
        idx = np.minimum(idx, max(len(vt) - 1, 0))
        hit = vt[idx] == vals if len(vt) else np.zeros(len(vals), bool)
        tid = np.where(hit, vid[idx] if len(vt) else -1, -1)
        return pa.table(
            {
                "doc_id": pa.array(t["doc_id"].to_numpy()[rows]),
                "pos": pa.array(pos),
                "token_id": pa.array(tid.astype(np.int64)),
            }
        )

    return docs.map_batches(enc, batch_format="pyarrow")


QUERIES = {
    "pii_scrub": pii_scrub,
    "chunk_documents": chunk_documents,
    "encode_tokens": encode_tokens,
}

ORACLE_SQL = {
    "pii_scrub": r"""
        WITH dirty AS (
            SELECT doc_id,
                   text || ' reach user' || CAST(doc_id AS VARCHAR)
                        || '@mail' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com or +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 100 AS VARCHAR)
                        || ' end' AS s
            FROM documents),
        e AS (SELECT doc_id,
                     CAST(LEN(regexp_extract_all(s,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                     regexp_replace(s,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g') AS s
              FROM dirty),
        p AS (SELECT doc_id, n_email,
                     CAST(LEN(regexp_extract_all(s, '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
                     regexp_replace(s, '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g') AS s
              FROM e),
        i AS (SELECT doc_id, n_email, n_phone,
                     CAST(LEN(regexp_extract_all(s,
                          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                     regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                          '<IP>', 'g') AS s
              FROM p)
        SELECT doc_id, n_email, n_phone, n_ip, s AS clean_text FROM i
    """,
    "chunk_documents": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        c AS (SELECT doc_id, toks,
                     UNNEST(range(0, GREATEST((LEN(toks) + {CHUNK_TOKENS_DEFAULT - 1}) // {CHUNK_TOKENS_DEFAULT}, 1))) AS chunk_id
              FROM t)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(toks[chunk_id * {CHUNK_TOKENS_DEFAULT} + 1 : LEAST((chunk_id + 1) * {CHUNK_TOKENS_DEFAULT}, LEN(toks))], ' ')
                   AS chunk_text,
               CAST(LEAST((chunk_id + 1) * {CHUNK_TOKENS_DEFAULT}, LEN(toks)) - chunk_id * {CHUNK_TOKENS_DEFAULT} AS BIGINT) AS n_tokens
        FROM c
    """,
    "encode_tokens": f"""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        fl AS (SELECT doc_id, UNNEST(toks) AS token,
                      generate_subscripts(toks, 1) AS pos
               FROM tok),
        cnt AS (SELECT token, COUNT(*) AS c FROM fl GROUP BY 1),
        vocab AS (SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token) - 1 AS tid
                  FROM cnt QUALIFY tid < {VOCAB_SIZE_DEFAULT})
        SELECT fl.doc_id, CAST(fl.pos AS BIGINT) AS pos,
               CAST(COALESCE(v.tid, -1) AS BIGINT) AS token_id
        FROM fl LEFT JOIN vocab v USING (token)
    """,
}
