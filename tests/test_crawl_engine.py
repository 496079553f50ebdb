"""End-to-end: distributed engine ≡ single-process reference-semantics oracle.

Asserts the BASELINE.json equivalences on the sf0.001 synthetic corpus:
- crawl schedule equality: same (iteration, url, priority, seq, attempt,
  outcome) set under the same seed list + politeness budget;
- byte-identical extracted text per url (the input_hint invariant);
- item equality (payload JSON, per rule);
- final URL-seen-set equality (exact keys, from the checkpointed shards).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.pipelines.oracle import run_oracle


@pytest.fixture(scope="module")
def crawl_pair(ray_session, corpus_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    engine = run_crawl(corpus_small, out_dir=out, max_iterations=30)
    oracle = run_oracle(corpus_small, max_iterations=30)
    return engine, oracle


def _final_seen_keys(out_dir: str) -> set[int]:
    iters = sorted(d for d in os.listdir(out_dir) if d.startswith("iter_"))
    last = os.path.join(out_dir, iters[-1], "seen")
    keys: set[int] = set()
    for path in glob.glob(os.path.join(last, "shard_*.npz")):
        with np.load(path, allow_pickle=True) as z:
            if "exact" in z.files:
                keys.update(int(k) for k in z["exact"])
    return keys


def test_crawl_order_matches_oracle(crawl_pair):
    engine, oracle = crawl_pair
    df = engine.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(oracle.order)
    assert engine.iterations == oracle.iterations


def test_extracted_text_byte_identical(crawl_pair, corpus_small):
    """Engine text ≡ oracle text ≡ the corpus golden `text` column."""
    import pyarrow.parquet as pq

    engine, oracle = crawl_pair
    df = engine.text_dataset().to_pandas()
    eng = dict(zip(df.url, df.payload))
    assert eng == oracle.texts
    # and against the independently generated golden column for crawled pages
    pages = pq.read_table(corpus_small.pages, columns=["url", "text"])
    golden = dict(zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()))
    for url, text in eng.items():
        assert text == golden[url], url


def test_items_match_oracle(crawl_pair):
    engine, oracle = crawl_pair
    ds = engine.items_dataset("detail")
    df = ds.to_pandas()
    # rebuild payload JSON from typed columns for comparison
    fields = ["title", "author", "pages", "publisher", "score", "price", "intro"]
    eng = set()
    for _, row in df.iterrows():
        payload = json.dumps(
            {f: (int(row[f]) if f == "pages" else row[f]) for f in fields},
            ensure_ascii=False,
            sort_keys=True,
        )
        eng.add((row["url"], payload))
    orc = {(i["url"], i["payload"]) for i in oracle.items}
    assert eng == orc


def test_seen_set_equality(crawl_pair):
    engine, oracle = crawl_pair
    assert _final_seen_keys(engine.out_dir) == oracle.seen


def test_checkpoint_resume_no_refetch(crawl_pair, corpus_small, tmp_path_factory):
    """Kill after 3 generations, resume: final items equal the clean run and
    checkpointed generations are not re-crawled (BASELINE.json north_rule)."""
    import glob

    engine, _ = crawl_pair
    clean = engine.items_dataset("detail").to_pandas().sort_values("url").reset_index(drop=True)

    out = str(tmp_path_factory.mktemp("resume"))
    run_crawl(corpus_small, out_dir=out, max_iterations=3)  # simulated kill
    resumed = run_crawl(corpus_small, out_dir=out, max_iterations=30, resume=True)
    assert resumed.iterations == engine.iterations
    items = resumed.items_dataset("detail").to_pandas().sort_values("url").reset_index(drop=True)
    assert clean.equals(items)
    # iteration 0 outputs written exactly once (no refetch on resume)
    assert len(glob.glob(f"{out}/iter_0000/order/*.parquet")) == 1
    # resume on a completed run is a no-op
    again = run_crawl(corpus_small, out_dir=out, max_iterations=30, resume=True)
    assert again.stats == []


def test_item_schema_typed(crawl_pair):
    engine, _ = crawl_pair
    schema = engine.items_dataset("detail").schema()
    types = dict(zip(schema.names, schema.types))
    assert str(types["pages"]) == "int64"  # Atoi field typed
    assert "ts" in types
