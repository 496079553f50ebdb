"""Parity pin for the Arrow-kernel bigram tokenize in bigram_familiarity.

The vectorized `grams` stage (split_pattern_regex + dictionary_encode +
packed-key np.unique) must emit exactly the rows of the straightforward
Counter-per-doc loop it replaced, as a multiset — on the real sf0.001
documents table and on the edge shapes (empty strings, single tokens,
separator-only text, unicode, duplicate doc_ids in one batch).
"""

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _reference(t: pa.Table):
    rows = []
    for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _TOKEN_RE.findall(s.lower())
        if len(toks) < 2:
            continue
        cnt = Counter(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
        rows.extend((did, g, c) for g, c in cnt.items())
    return sorted(rows)


def _run_grams(t: pa.Table):
    """Run the grams stage through the real pipeline entry: execute
    bigram_familiarity's first map over an in-memory documents table by
    monkeypatching the reader."""
    import crawler_ray.pipelines.text as text_mod

    orig = text_mod._docs
    try:
        import ray.data as rd

        text_mod._docs = lambda sf_dir: rd.from_arrow(t)
        ds = text_mod.bigram_familiarity("<inline>")
        return ds.to_pandas()
    finally:
        text_mod._docs = orig


def _final_reference(t: pa.Table):
    """Per-doc familiarity from the raw reference rows (whole-corpus counts)."""
    rows = _reference(t)
    corpus = Counter()
    for _, g, c in rows:
        corpus[g] += c
    per_doc = {}
    for did, g, c in rows:
        nb, fs = per_doc.get(did, (0, 0))
        per_doc[did] = (nb + c, fs + c * corpus[g])
    return sorted(
        (did, nb, fs, 1_000_000 * fs // max(nb, 1)) for did, (nb, fs) in per_doc.items()
    )


def test_bigram_familiarity_matches_counter_loop_on_sf0001(ray_session):
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    got = _run_grams(t)
    got_rows = sorted(
        zip(got["doc_id"], got["n_bigrams"], got["fam_sum"], got["fam_avg_c"])
    )
    assert [tuple(map(int, r)) for r in got_rows] == _final_reference(t)


def test_bigram_familiarity_edge_shapes(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 5, 7, 8], pa.int64()),
            "text": pa.array(
                [
                    "",  # empty -> no rows
                    "solo",  # single token -> no rows
                    " ,;- \t",  # separators only -> no rows
                    "A b A b a-B",  # case folding + repeated bigrams
                    "dup doc row one",  # duplicate doc_id across rows
                    "dup doc row two",
                    "café touché naïve 42",  # unicode separators
                    "Aİb c İ d",  # U+0130: full vs simple case mapping diverge
                ]
            ),
        }
    )
    got = _run_grams(t)
    got_rows = sorted(
        zip(got["doc_id"], got["n_bigrams"], got["fam_sum"], got["fam_avg_c"])
    )
    assert [tuple(map(int, r)) for r in got_rows] == _final_reference(t)
