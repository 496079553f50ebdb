"""Empty-corpus regression pins for the adaptive driver tails.

A zero-row documents table produces zero-BLOCK intermediate streams whose
``to_pandas()`` has no columns at all (not just no rows) — the driver-cut
fast paths must return their canonical empty schema instead of KeyError-ing
on a column access (this bit simhash_dups / media_dedup_near /
minhash_dedup_keep / ccnet_buckets).
"""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

OPS = [
    "dedup_exact",
    "minhash_lsh_dups",
    "minhash_dedup_keep",
    "simhash_dups",
    "media_dedup_near",
    "strip_dup_spans",
    "dup_spans",
    "bigram_familiarity",
    "ccnet_buckets",
    "tfidf_top_terms",
    "top_terms",
    "temperature_mix_docs",
]


@pytest.fixture(scope="module")
def empty_sf_dir():
    d = tempfile.mkdtemp(prefix="empty_sf_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.mark.parametrize("name", OPS)
def test_empty_documents_table_yields_zero_rows(ray_session, empty_sf_dir, name):
    import ray.data

    import __ray_entry__ as entrymod

    res = entrymod.queries()[name](empty_sf_dir)
    n = (
        res.count()
        if isinstance(res, ray.data.Dataset)
        else (res.num_rows if hasattr(res, "num_rows") else len(res))
    )
    assert n == 0


def test_ccnet_buckets_corpus_with_no_bigrams(ray_session):
    """A NON-empty corpus where no document has >= 2 tokens: lang_id emits
    rows but bigram_familiarity's stream is zero-block — ccnet must return
    its empty table, not KeyError on the column-less partials frame."""
    import ray.data

    import __ray_entry__ as entrymod

    d = tempfile.mkdtemp(prefix="tiny_tok_sf_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["solo", "the", " ,; "]),
                "lang": pa.array(["en", "en", "en"]),
                "source": pa.array(["a", "a", "b"]),
                "n_chars": pa.array([4, 3, 4], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    for name in ("ccnet_buckets", "bigram_familiarity"):
        res = entrymod.queries()[name](d)
        n = res.count() if isinstance(res, ray.data.Dataset) else res.num_rows
        assert n == 0, name
