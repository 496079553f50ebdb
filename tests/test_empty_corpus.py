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
