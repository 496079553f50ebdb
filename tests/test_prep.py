"""prep_training_corpus consistency: the fused single-pass pipeline must
equal the composition of the standalone operators it claims to fuse
(text.lang_id ∩ text.quality_score ∩ dedup_exact winners, minus
graph.dedup_clusters non-representatives)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_prep_equals_composed_standalone_ops(ray_session):
    from crawler_ray.pipelines.dedup import dedup_exact
    from crawler_ray.pipelines.graph import dedup_clusters
    from crawler_ray.pipelines.prep import prep_training_corpus
    from crawler_ray.pipelines.text import lang_id, quality_score

    lang = lang_id(SF).to_pandas()
    qual = quality_score(SF).to_pandas()
    en = set(lang.loc[lang["pred_lang"] == "en", "doc_id"])
    kept = qual[qual["keep"] == 1]
    survivors = en & set(kept["doc_id"])

    # identical texts have identical lang/quality signals, so the exact-dedup
    # winner over ALL docs is also the winner among survivors for any group
    # that survives at all
    winners = set(dedup_exact(SF).to_pandas()["doc_id"])
    clusters = dedup_clusters(SF).to_pandas()
    losers = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"])

    expected_ids = (survivors & winners) - losers

    got = prep_training_corpus(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(got["doc_id"]) == expected_ids
    assert len(got) == len(expected_ids)  # no duplicate rows

    # per-row payload matches quality_score's numbers exactly
    q = kept.set_index("doc_id")
    for _, row in got.iterrows():
        assert row["n_tokens"] == q.loc[row["doc_id"], "n_tokens"]
        assert row["distinct_pct"] == q.loc[row["doc_id"], "distinct_pct"]

    # sanity: the chain actually filters something at this sf
    assert 0 < len(got) < len(lang)


def test_pack_sequences_invariants(ray_session):
    """Packing manifest: every doc placed exactly once, offsets contiguous
    within a sequence, no sequence over seq_len, next-fit density (any two
    consecutive bins in a block together exceed seq_len)."""
    import pandas as pd

    from crawler_ray.pipelines.prep import pack_sequences

    L = 256
    m = pack_sequences("/root/testdata/sf0.001", seq_len=L).to_pandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
    assert sorted(m.doc_id) == sorted(docs.doc_id)
    assert m.doc_id.is_unique

    for seq_id, g in m.groupby("seq_id"):
        g = g.sort_values("seq_offset_tok")
        assert g.seq_offset_tok.iloc[0] == 0
        assert (g.seq_offset_tok.to_numpy()[1:]
                == (g.seq_offset_tok + g.n_tok).to_numpy()[:-1]).all()
        assert int((g.n_tok).sum()) <= L
        assert seq_id == g.doc_id.iloc[0]

    # determinism across runs
    m2 = pack_sequences("/root/testdata/sf0.001", seq_len=L).to_pandas()
    a = m.sort_values(["doc_id"]).reset_index(drop=True)
    b = m2.sort_values(["doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
