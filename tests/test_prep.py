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


def test_export_training_shards_resumable(ray_session, tmp_path):
    """Curate-once + pack-per-shard export: packed docs == curated docs,
    bins respect seq_len, a rerun skips everything, and deleting one
    shard's marker recomputes exactly that shard."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.prep import export_training_shards, prep_training_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "export")
    man1 = export_training_shards(sf, out, seq_len=256, shards=4)
    assert not any(v["skipped"] for v in man1.values())

    curated = prep_training_corpus(sf).to_pandas()
    packed_files = []
    for k in man1:
        sdir = os.path.join(out, "packed", f"shard={k}")
        packed_files += [os.path.join(sdir, f) for f in os.listdir(sdir) if f.endswith(".parquet")]
    packed = pq.read_table(packed_files).to_pandas()
    assert sorted(packed.doc_id) == sorted(curated.doc_id)
    per_seq = packed.groupby("seq_id")["n_tok"].sum()
    assert (per_seq <= 256).all()
    # offsets are contiguous within each bin
    for _, g in packed.sort_values(["seq_id", "seq_offset_tok"]).groupby("seq_id"):
        assert list(g.seq_offset_tok) == list(g.n_tok.cumsum().shift(fill_value=0))

    man2 = export_training_shards(sf, out, seq_len=256, shards=4)
    assert all(v["skipped"] for v in man2.values())

    os.remove(os.path.join(out, "packed", "shard=2", "_DONE"))
    shutil.rmtree(os.path.join(out, "packed", "shard=2"), ignore_errors=True)
    man3 = export_training_shards(sf, out, seq_len=256, shards=4)
    assert [k for k, v in man3.items() if not v["skipped"]] == [2]
