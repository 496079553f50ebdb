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
