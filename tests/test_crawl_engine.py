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
    """Reconstruct the final seen set from checkpoints: newest full shard
    dump, then replay the per-generation deltas after it."""
    iters = sorted(d for d in os.listdir(out_dir) if d.startswith("iter_"))
    full_idx = max(
        i for i, d in enumerate(iters)
        if glob.glob(os.path.join(out_dir, d, "seen", "shard_*.npz"))
    )
    keys: set[int] = set()
    for path in glob.glob(os.path.join(out_dir, iters[full_idx], "seen", "shard_*.npz")):
        with np.load(path, allow_pickle=True) as z:
            if "exact" in z.files:
                keys.update(int(k) for k in z["exact"])
    for d in iters[full_idx + 1:]:
        for path in glob.glob(os.path.join(out_dir, d, "seen", "delta_*.npz")):
            with np.load(path) as z:
                keys.update(int(k) for k in z["added"])
                keys.difference_update(int(k) for k in z["removed"])
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


def test_resume_after_midgeneration_crash(crawl_pair, corpus_small, tmp_path_factory):
    """A crash AFTER data writes but BEFORE manifest.json must not double the
    incomplete generation's outputs on resume: write_parquet appends
    uuid-named files, so the engine recreates an un-manifested iter dir
    before re-running it (ADVICE r1, high)."""
    import shutil

    engine, _ = crawl_pair
    clean_order = engine.order_dataset().to_pandas()

    out = str(tmp_path_factory.mktemp("midcrash"))
    run_crawl(corpus_small, out_dir=out, max_iterations=3)
    # simulate the mid-iteration crash: iter_0003 has partial parquet output
    # (copied from a complete generation) but no manifest
    crashed = os.path.join(out, "iter_0003", "order")
    os.makedirs(crashed)
    src = glob.glob(os.path.join(out, "iter_0002", "order", "*.parquet"))[0]
    shutil.copy(src, os.path.join(crashed, "leftover.parquet"))

    resumed = run_crawl(corpus_small, out_dir=out, max_iterations=30, resume=True)
    assert resumed.iterations == engine.iterations
    df = resumed.order_dataset().to_pandas()
    assert len(df) == len(clean_order)
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    clean = set(zip(clean_order.iteration, clean_order.url, clean_order.priority,
                    clean_order.seq, clean_order.attempt, clean_order.outcome))
    assert eng == clean


def test_truncated_manifest_falls_back(corpus_small, tmp_path_factory, ray_session):
    """A crash mid-manifest-write leaves unparseable JSON; resume must fall
    back to the previous complete generation instead of raising."""
    out = str(tmp_path_factory.mktemp("truncmanifest"))
    run_crawl(corpus_small, out_dir=out, max_iterations=3)
    with open(os.path.join(out, "iter_0002", "manifest.json"), "w") as fh:
        fh.write('{"iteration": 2, "comp')  # truncated
    resumed = run_crawl(corpus_small, out_dir=out, max_iterations=4, resume=True)
    # resumed from iter 1, so iteration 2 was re-run (and 3 ran fresh)
    assert {s["iteration"] for s in resumed.stats} == {2, 3}


def test_item_schema_typed(crawl_pair):
    engine, _ = crawl_pair
    schema = engine.items_dataset("detail").schema()
    types = dict(zip(schema.names, schema.types))
    assert str(types["pages"]) == "int64"  # Atoi field typed
    assert "ts" in types
