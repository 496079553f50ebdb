"""Semantics pins for the curation ops (pii_scrub / chunk_documents /
encode_tokens) on constructed corpora; the DuckDB oracle gate covers the
sf tables."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_pii_scrub_redacts_planted_and_inline(ray_session, tmp_path):
    from crawler_ray.pipelines.curate import pii_scrub

    # doc 7 also carries PII of its own, beyond the planted suffix
    sf = _write_docs(
        tmp_path,
        ["plain words here", "mail me at bob.smith@corp.example.org now"],
        ids=[3, 7],
    )
    df = pii_scrub(sf).to_pandas().set_index("doc_id")
    # planted suffix for doc 3: user3@mail3.com, +1-555-0003, 10.3.21.3
    assert df.loc[3, "n_email"] == 1
    assert df.loc[3, "n_phone"] == 1
    assert df.loc[3, "n_ip"] == 1
    assert (
        df.loc[3, "clean_text"]
        == "plain words here reach <EMAIL> or <PHONE> from <IP> end"
    )
    # doc 7: its own email plus the planted one
    assert df.loc[7, "n_email"] == 2
    assert "bob.smith" not in df.loc[7, "clean_text"]
    assert "@" not in df.loc[7, "clean_text"]


def test_chunk_documents_boundaries(ray_session, tmp_path):
    from crawler_ray.pipelines.curate import chunk_documents

    toks140 = " ".join(f"t{i}" for i in range(140))
    sf = _write_docs(tmp_path, [toks140, "a b", ""], ids=[0, 1, 2])
    df = (
        chunk_documents(sf)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = df[df.doc_id == 0]
    assert list(d0.n_tokens) == [64, 64, 12]  # 140 = 64 + 64 + 12
    assert d0.iloc[0].chunk_text.startswith("t0 t1 ")
    assert d0.iloc[0].chunk_text.endswith(" t63")
    assert d0.iloc[1].chunk_text.startswith("t64 ")
    assert d0.iloc[2].chunk_text == " ".join(f"t{i}" for i in range(128, 140))
    # reassembly: joining a doc's chunks with ' ' restores the text exactly
    assert " ".join(d0.chunk_text) == toks140
    assert list(df[df.doc_id == 1].chunk_text) == ["a b"]
    # empty text -> one chunk of the single empty token
    d2 = df[df.doc_id == 2]
    assert list(d2.chunk_text) == [""] and list(d2.n_tokens) == [1]


def test_encode_tokens_vocab_rank_and_oov(ray_session, tmp_path):
    from crawler_ray.pipelines.curate import encode_tokens

    # counts: b=4, a=3, c=1 -> vocab(top-2): b->0, a->1; c is OOV
    sf = _write_docs(tmp_path, ["a b b a", "b c b a"], ids=[0, 1])
    df = (
        encode_tokens(sf, vocab_size=2)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert list(df[df.doc_id == 0].token_id) == [1, 0, 0, 1]
    assert list(df[df.doc_id == 1].token_id) == [0, -1, 0, 1]
    assert list(df[df.doc_id == 1].pos) == [1, 2, 3, 4]


def test_encode_tokens_count_tie_breaks_lexicographic(ray_session, tmp_path):
    from crawler_ray.pipelines.curate import encode_tokens

    # x and y both appear twice: tie broken by token asc -> x=0, y=1
    sf = _write_docs(tmp_path, ["y x y x"], ids=[0])
    df = encode_tokens(sf, vocab_size=2).to_pandas().sort_values("pos")
    assert list(df.token_id) == [1, 0, 1, 0]
