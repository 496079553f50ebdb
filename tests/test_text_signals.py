"""Semantics pins for the repetition / contamination text ops on
constructed corpora (the DuckDB oracle gate covers the sf tables)."""

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


def test_repetition_signals_extremes(ray_session, tmp_path):
    from crawler_ray.pipelines.text import repetition_signals

    sf = _write_docs(
        tmp_path,
        [
            "spam " * 50,  # 49 occurrences of one bigram: top=100, dup=48/49
            " ".join(str(i) for i in range(60)),  # all distinct: 1-2% tops, dup=0
            "ab",  # single token: no bigrams at all -> zeros
        ],
    )
    df = repetition_signals(sf).to_pandas().set_index("doc_id")
    assert df.loc[0, "top_bigram_pct"] == 100
    assert df.loc[0, "dup_bigram_pct"] == 100 * 48 // 49  # repeats beyond first
    assert df.loc[0, "top_trigram_pct"] == 100
    assert df.loc[1, "dup_bigram_pct"] == 0
    assert df.loc[1, "top_bigram_pct"] <= 2
    assert (df.loc[2] == 0).all()


def test_ngram_contamination_copy_and_unique(ray_session, tmp_path):
    from crawler_ray.pipelines.text import ngram_contamination

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    clean = "uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 uniq7"
    filler = "one two three four five six seven eight nine"
    # doc 0/10 are eval (id % 10 == 0); doc 1 is train and equals doc 0
    sf = _write_docs(tmp_path, [leak, leak, filler, clean], ids=[0, 1, 2, 10])
    df = ngram_contamination(sf).to_pandas().set_index("doc_id")
    assert df.loc[0, "contam_pct"] == 100  # verbatim copy of a train doc
    assert df.loc[0, "n_grams"] == df.loc[0, "n_hit"] == 4  # 8 toks -> 4 5-grams
    assert df.loc[10, "n_hit"] == 0 and df.loc[10, "contam_pct"] == 0
    assert set(df.index) == {0, 10}  # train docs never emitted


def _write_docs_files(tmp_path, texts, docs_per_file):
    """documents.parquet as a DIRECTORY of many small files → many read
    blocks, exercising the block-contiguity assumptions of the zero-shuffle
    text ops (each doc's postings must stay whole within one block)."""
    import os

    d = tmp_path / "documents.parquet"
    os.makedirs(d)
    for f, start in enumerate(range(0, len(texts), docs_per_file)):
        chunk = texts[start : start + docs_per_file]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(start, start + len(chunk)), pa.int64()),
                    "text": pa.array(chunk),
                }
            ),
            d / f"part-{f:04d}.parquet",
        )
    return str(tmp_path)


def test_tfidf_and_inverted_index_multiblock(ray_session, tmp_path):
    """Brute-force equality on a corpus spread over 10 files/blocks —
    the sf0.01 oracle sweep reads one block, so it never catches a doc
    split across batches; this pins the batch_size=None block-local path."""
    import re
    from collections import Counter

    from crawler_ray.pipelines.text import inverted_index, tfidf_top_terms

    rngwords = [f"w{i:02d}" for i in range(17)]
    # doc i holds words w00..w(i%17), so df(wk) strictly decreases with k
    # (the min_df gate binds); leading repeats of w00 vary tf
    texts = [
        " ".join(["w00"] * (i % 3) + rngwords[: 1 + i % 17]) for i in range(100)
    ]
    sf = _write_docs_files(tmp_path, texts, docs_per_file=10)

    tok = re.compile(r"[A-Za-z0-9]+")
    tf = {i: Counter(tok.findall(t.lower())) for i, t in enumerate(texts)}
    df = Counter(w for c in tf.values() for w in c)

    # inverted_index: min_df=30 keeps a strict subset of the 17-term vocab
    got = inverted_index(sf, min_df=30).to_pandas()
    want = sorted(
        (w, i, n) for i, c in tf.items() for w, n in c.items() if df[w] >= 30
    )
    assert sorted(zip(got.term, got.doc_id, got.tf)) == want
    assert 0 < len({w for w, _, _ in want}) < 17  # gate actually binds

    # tfidf: per-doc top-3 with (score desc, token asc) tie-break
    got = tfidf_top_terms(sf, top_n=3).to_pandas()
    want = []
    for i, c in tf.items():
        scored = sorted(
            ((n * 1_000_000) // df[w], w) for w, n in c.items()
        )
        scored = sorted(scored, key=lambda s: (-s[0], s[1]))[:3]
        want.extend((i, w, s) for s, w in scored)
    assert sorted(zip(got.doc_id, got.token, got.tfidf_c)) == sorted(want)


def test_tfidf_survives_dynamic_block_splits(ray_session, tmp_path):
    """Force target_max_block_size tiny so Ray's dynamic block splitting
    cuts a doc's contiguous posting rows across blocks mid-doc — the
    boundary-doc rescue path must restore the exact per-doc top-N."""
    import re
    from collections import Counter

    from ray.data import DataContext

    from crawler_ray.pipelines.text import tfidf_top_terms

    words = [f"v{i:03d}" for i in range(120)]
    # long docs (≈100 distinct tokens each) so a tiny block cap splits them
    texts = [
        " ".join(["v000"] * (i % 4) + words[: 40 + (i * 7) % 80]) for i in range(60)
    ]
    sf = _write_docs_files(tmp_path, texts, docs_per_file=20)

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 2048  # ~tens of posting rows per block
    try:
        got = tfidf_top_terms(sf, top_n=3).to_pandas()
    finally:
        ctx.target_max_block_size = old

    tok = re.compile(r"[A-Za-z0-9]+")
    tf = {i: Counter(tok.findall(t.lower())) for i, t in enumerate(texts)}
    df = Counter(w for c in tf.values() for w in c)
    want = []
    for i, c in tf.items():
        scored = sorted(
            (((n * 1_000_000) // df[w], w) for w, n in c.items()),
            key=lambda s: (-s[0], s[1]),
        )[:3]
        want.extend((i, w, s) for s, w in scored)
    assert sorted(zip(got.doc_id, got.token, got.tfidf_c)) == sorted(want)


def test_bigram_familiarity_common_vs_rare(ray_session, tmp_path):
    from crawler_ray.pipelines.text import bigram_familiarity

    # docs 0 and 1 share the bigram stream "a b a b ..."; doc 2 is unique;
    # doc 3 has a single token (no bigrams -> absent from the output)
    sf = _write_docs(
        tmp_path,
        [
            "a b " * 10,         # 19 bigrams: 10x "a b", 9x "b a"
            "a b " * 10,         # identical twin
            "x y z",             # 2 bigrams seen once each
            "solo",              # no bigrams
        ],
    )
    df = bigram_familiarity(sf, parts=4).to_pandas().set_index("doc_id")
    assert sorted(df.index) == [0, 1, 2]
    # corpus counts: "a b" -> 20, "b a" -> 18
    for d in (0, 1):
        assert df.loc[d, "n_bigrams"] == 19
        assert df.loc[d, "fam_sum"] == 10 * 20 + 9 * 18
        assert df.loc[d, "fam_avg_c"] == 1_000_000 * (10 * 20 + 9 * 18) // 19
    assert df.loc[2, "n_bigrams"] == 2
    assert df.loc[2, "fam_sum"] == 2
    assert df.loc[2, "fam_avg_c"] == 1_000_000


def test_bm25_topk_matches_single_process_oracle(ray_session):
    """Distributed assembly (df/avgdl partials, batch top-k, driver merge)
    must reproduce a single-process BM25 ranking exactly — the scorer is
    shared, so this pins the distribution machinery."""
    import numpy as np
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import _TOKEN_RE, _bm25_batch_scores, bm25_topk

    sf = "/root/testdata/sf0.001"
    terms, k = ("data", "join", "batch", "stream"), 20
    got = bm25_topk(sf, terms=terms, k=k).to_pandas()

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    ids = np.asarray(t["doc_id"].to_pylist())
    df = np.array(
        [sum(term in set(_TOKEN_RE.findall(s.lower())) for s in texts) for term in terms],
        dtype=np.float64,
    )
    dl = sum(len(_TOKEN_RE.findall(s.lower())) for s in texts)
    scores = _bm25_batch_scores(texts, terms, df, len(texts), dl / len(texts))
    order = np.lexsort((ids, -scores))[:k]
    assert list(got.doc_id) == list(ids[order])
    assert list(got.score_e6) == [int(round(s * 1e6)) for s in scores[order]]
    assert list(got["rank"]) == list(range(1, k + 1))
    assert (np.diff(got.score_e6) <= 0).all()


def test_bpe_merges_vs_reference(ray_session):
    """Distributed BPE trainer ≡ the single-process reference (same
    tokenizer, greedy merge scan, and tie-break) on the real corpus: the
    full (rank, left, right, merged, pair_count) merge table matches
    exactly, so partitioning and incremental pair bookkeeping change
    nothing."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.bpe import bpe_merges, reference_bpe

    sf = "/root/testdata/sf0.001"
    got = bpe_merges(sf, n_merges=48).to_pandas()
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
    want = reference_bpe(texts, 48)
    assert got.equals(want)
    assert len(got) == 48 and (got.pair_count > 0).all()
    # merges really compose: some merged token is longer than 2 chars
    assert got.merged.str.len().max() > 2


def test_gopher_quality_rule_branches(ray_session, tmp_path):
    """Each Gopher rule trips on the doc built to violate exactly it."""
    from crawler_ray.pipelines.text import gopher_quality

    good = ("the quick brown fox jumps over a lazy dog near the " * 8).strip()
    sf = _write_docs(
        tmp_path,
        [
            good,                                   # passes every band
            "the ox " * 60,                         # mean word len 250 < 300
            "the " + "extraordinarily " * 60,       # mean word len > 460
            "word " * 30,                           # 31 words < 50
            ("the fox " + "# " * 0 + "ok ") * 30 + "#" * 40,  # symbol ratio
            ("12 34 56 78 90 " * 12 + "the fox"),   # alpha pct < 80
            "quick brown fox jumps high " * 12,     # zero stopword hits
        ],
    )
    df = gopher_quality(sf).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[0, "keep"] == 1
    assert list(df.keep[1:]) == [0, 0, 0, 0, 0, 0]
    assert df.loc[1, "mean_word_len_e2"] < 300
    assert df.loc[2, "mean_word_len_e2"] > 460
    assert df.loc[3, "n_words"] < 50
    assert df.loc[4, "symbol_ratio_e4"] > 1000
    assert df.loc[5, "alpha_word_pct"] < 80
    assert df.loc[6, "stopword_hits"] == 0
