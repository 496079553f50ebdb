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


@pytest.fixture(scope="module", params=["driver", "distributed"])
def crawl_pair(request, ray_session, corpus_small, tmp_path_factory):
    """Engine-vs-oracle pair, run once per admission path: the adaptive
    driver admission (default at test frontiers) AND the distributed
    exchange chain (CRAWLER_RAY_ADMIT_DRIVER_CUT=0) — the whole downstream
    assertion surface (schedule, items, text) pins both to the oracle."""
    import os

    out = str(tmp_path_factory.mktemp("crawl"))
    old = os.environ.get("CRAWLER_RAY_ADMIT_DRIVER_CUT")
    if request.param == "distributed":
        os.environ["CRAWLER_RAY_ADMIT_DRIVER_CUT"] = "0"
    try:
        engine = run_crawl(corpus_small, out_dir=out, max_iterations=30)
    finally:
        if request.param == "distributed":
            if old is None:
                os.environ.pop("CRAWLER_RAY_ADMIT_DRIVER_CUT", None)
            else:
                os.environ["CRAWLER_RAY_ADMIT_DRIVER_CUT"] = old
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


def test_manifest_stage_metrics(crawl_pair):
    """D5 metrics surface: every completed generation's manifest carries
    structured per-stage rows (stage, sec, and the counts the stage knows)
    in execution order — the scrape surface replacing the reference's zap
    log (log/log.go:13-38)."""
    engine, _ = crawl_pair
    assert engine.stats, "no completed generations"
    for st in engine.stats:
        stages = st["stages"]
        names = [r["stage"] for r in stages]
        # core stages always present, in pipeline order
        core = ["admission", "fetch_extract", "order_write", "items_write",
                "text_write", "failures", "frontier_write", "seen_dump"]
        assert [n for n in names if n in core] == core
        for r in stages:
            assert r["sec"] >= 0
        by = {r["stage"]: r for r in stages}
        assert by["order_write"]["rows_out"] == st["scheduled"]
        assert by["frontier_write"]["rows_out"] == st["next_frontier"]
        # distributed admission reports the exchange's shuffle_bytes; the
        # adaptive driver path reports its payload as bytes_out instead
        adm = by["admission"]
        assert adm.get("shuffle_bytes", adm.get("bytes_out", 0)) > 0
        assert by["fetch_extract"]["bytes_out"] > 0
    # the manifest on disk matches what the result object reports
    with open(os.path.join(engine.out_dir, "iter_0000", "manifest.json")) as fh:
        m = json.load(fh)
    assert m["stages"] == engine.stats[0]["stages"]


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


def _mini_cycle_corpus(tmp_path) -> "object":
    """Two pages linking each other with the tag rule — under reload the
    crawl oscillates A→B→A→... until max_iterations; without reload it
    stops after both are seen."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.sources.pages import Corpus

    root = str(tmp_path / "cycle")
    os.makedirs(os.path.join(root, "pages"))
    pad = "<!-- " + "x" * 6200 + " -->"
    a_url, b_url = "https://h0.example.com/a", "https://h0.example.com/b"
    html_a = f'<html><body><a href="{b_url}" class="tag">B</a>{pad}</body></html>'
    html_b = f'<html><body><a href="{a_url}" class="tag">A</a>{pad}</body></html>'
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "url": pa.array([a_url, b_url]),
                "warc_ts": pa.array([ts, ts], pa.timestamp("us")),
                "html": pa.array([html_a.encode(), html_b.encode()], pa.binary()),
                "text": pa.array([b_url, a_url]),
                "lang": pa.array(["en", "en"]),
            }
        ),
        os.path.join(root, "pages", "part-0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([a_url]),
                "priority": pa.array([0], pa.int32()),
                "rule": pa.array(["tag"]),
                "depth": pa.array([0], pa.int32()),
                "seq": pa.array([0], pa.int64()),
            }
        ),
        os.path.join(root, "seeds.parquet"),
    )
    with open(os.path.join(root, "politeness.json"), "w") as fh:
        json.dump({"default": {"max_per_iter": 5}, "max_depth": 50, "max_attempts": 2}, fh)
    return Corpus(root=root, pages=os.path.join(root, "pages"),
                  seeds=os.path.join(root, "seeds.parquet"),
                  politeness=os.path.join(root, "politeness.json"), n_docs=2)


def test_reload_bypasses_seen(ray_session, tmp_path_factory):
    """Task.Reload disables the visited check (engine/crawler.go:85): the
    same URL is refetched across iterations, and engine ≡ oracle."""
    import dataclasses

    from crawler_ray.rules import SYNTH_TASK, RuleSpec, TaskSpec

    tmp = tmp_path_factory.mktemp("reloadc")
    corpus = _mini_cycle_corpus(tmp)
    cycle_task = TaskSpec(
        name="cycle",
        max_depth=50,
        rules={
            "tag": dataclasses.replace(SYNTH_TASK.rules["tag"], task="cycle", next_rule="tag")
        },
    )

    # without reload: A then B, then nothing (both seen)
    plain = run_crawl(corpus, task=cycle_task,
                      out_dir=str(tmp / "plain"), max_iterations=6)
    assert plain.order_dataset().count() == 2

    reload_task = dataclasses.replace(cycle_task, reload=True)
    engine = run_crawl(corpus, task=reload_task,
                       out_dir=str(tmp / "reload"), max_iterations=6)
    oracle = run_oracle(corpus, task=reload_task, max_iterations=6)
    df = engine.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(oracle.order)
    # the cycle keeps refetching: one fetch per iteration for all 6
    assert len(df) == 6
    assert df.groupby("url")["iteration"].nunique().max() >= 3


def test_composed_sustained_budget(ray_session, corpus_small, tmp_path_factory):
    """Two-window budget (burst per-iteration AND sustained per-K-iterations,
    limiter/limiter.go:16-45 composition): engine ≡ oracle with a config
    where the two windows bind at different iterations."""
    import dataclasses

    tmp = tmp_path_factory.mktemp("sustained")
    with open(corpus_small.politeness) as fh:
        pol = json.load(fh)
    pol.setdefault("default", {})["max_per_iter"] = 3
    pol["default"]["max_per_window"] = 4
    pol["default"]["window_iters"] = 2
    ppath = str(tmp / "politeness.json")
    with open(ppath, "w") as fh:
        json.dump(pol, fh)
    corpus = dataclasses.replace(corpus_small, politeness=ppath)

    engine = run_crawl(corpus, out_dir=str(tmp / "out"), max_iterations=30)
    oracle = run_oracle(corpus, max_iterations=30)
    df = engine.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(oracle.order)
    assert engine.iterations == oracle.iterations

    # both buckets actually bind somewhere: some (host, iter) hits the burst
    # cap (3) and some later one is clamped below it by the sustained window
    from crawler_ray.functions.url import host_of
    import pyarrow as pa

    df["host"] = host_of(pa.array(df.url)).to_pylist()
    per = df.groupby(["host", "iteration"]).size()
    assert (per == 3).any()
    clamped = per[(per > 0) & (per < 3)]
    assert len(clamped) > 0

    # resume rebuilds the trailing window from checkpoints: identical result
    out2 = str(tmp / "resume")
    run_crawl(corpus, out_dir=out2, max_iterations=2)
    resumed = run_crawl(corpus, out_dir=out2, max_iterations=30, resume=True)
    df2 = resumed.order_dataset().to_pandas()
    eng2 = set(zip(df2.iteration, df2.url, df2.priority, df2.seq, df2.attempt, df2.outcome))
    assert eng2 == eng


def test_cuckoo_only_mode_matches_oracle(ray_session, corpus_small, tmp_path_factory):
    """The filter-only seen configuration (exact=False — the 10^10-URL
    path) reproduces the oracle schedule at this scale (16-bit fingerprints
    ⇒ negligible FP rate on a 600-url frontier) and resumes from its
    filter-state checkpoints."""
    out = str(tmp_path_factory.mktemp("cuckoo_only"))
    res = run_crawl(corpus_small, out_dir=out, max_iterations=30,
                    exact_seen=False, seen_mode="cuckoo")
    orc = run_oracle(corpus_small, max_iterations=30)
    df = res.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(orc.order)

    # kill-and-resume in cuckoo-only mode (no exact arrays in checkpoints)
    out2 = str(tmp_path_factory.mktemp("cuckoo_resume"))
    run_crawl(corpus_small, out_dir=out2, max_iterations=3,
              exact_seen=False, seen_mode="cuckoo")
    r2 = run_crawl(corpus_small, out_dir=out2, max_iterations=30,
                   exact_seen=False, seen_mode="cuckoo", resume=True)
    df2 = r2.order_dataset().to_pandas()
    eng2 = set(zip(df2.iteration, df2.url, df2.priority, df2.seq, df2.attempt, df2.outcome))
    assert eng2 == eng


def test_redirects_followed_and_failed(crawl_pair):
    """The corpus's redirect surface is actually exercised: aliases resolve
    to the target detail body (1- and 2-hop), dead targets and the loop
    fail as missing (unmark + single retry), all under the alias url."""
    from crawler_ray.sources.pages import LOOP_URLS, _alias_kind

    engine, oracle = crawl_pair
    order = engine.order_dataset().to_pandas()
    by_url = order.groupby("url")["outcome"].agg(list)

    alias = order[order.url.str.contains("/d/")]
    assert len(alias) > 0, "corpus should link redirect aliases"
    ids = alias.url.str.rsplit("/", n=1).str[1].astype(int)
    kinds = {i: _alias_kind(i) for i in ids}
    assert {"single", "double", "dead"} <= set(kinds.values())

    tdf = engine.text_dataset().to_pandas()
    texts = dict(zip(tdf.url, tdf.payload))
    for u, i in zip(alias.url, ids):
        if kinds[i] == "dead":
            assert set(by_url[u]) == {"missing"} and len(by_url[u]) == 2, u
        elif i % 37 == 0:
            assert set(by_url[u]) == {"banned"}, u
        elif i % 41 == 0:
            assert by_url[u] == ["short"], u
        else:  # resolved: extraction ran on the target body under the alias
            assert by_url[u] == ["ok"], u
            assert f'"title-{i:06d}"' in texts[u], u
    # the loop link fails like a missing page: initial try + one retry
    assert by_url[LOOP_URLS[0]] == ["missing", "missing"]


def test_ban_backoff_engine_matches_oracle(ray_session, corpus_small, tmp_path_factory):
    """Adaptive politeness: hosts serving ban pages halve their budget per
    penalty level and recover on clean generations — engine ≡ oracle under
    the feature, and the ban fraction in the corpus actually engages it."""
    import glob

    out = str(tmp_path_factory.mktemp("backoff"))
    engine = run_crawl(corpus_small, out_dir=out, max_iterations=30, ban_backoff=True)
    oracle = run_oracle(corpus_small, max_iterations=30, ban_backoff=True)
    df = engine.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(oracle.order)
    assert engine.iterations == oracle.iterations
    pens = []
    for p in sorted(glob.glob(os.path.join(out, "iter_*", "backoff.json"))):
        with open(p) as fh:
            pens.append(json.load(fh)["penalty"])
    assert any(pens), "ban fraction should trigger at least one penalty"


def test_backoff_update_rule():
    from crawler_ray.stages.politeness import BACKOFF_MAX, apply_backoff_updates

    pen: dict[str, int] = {}
    apply_backoff_updates(pen, {"a", "b"}, {"a"})
    assert pen == {"a": 1}
    for _ in range(10):  # escalation caps
        apply_backoff_updates(pen, {"a"}, {"a"})
    assert pen == {"a": BACKOFF_MAX}
    apply_backoff_updates(pen, {"a"}, set())  # clean generation recovers
    assert pen == {"a": BACKOFF_MAX - 1}
    apply_backoff_updates(pen, set(), set())  # unscheduled host: no change
    assert pen == {"a": BACKOFF_MAX - 1}
    for _ in range(BACKOFF_MAX):
        apply_backoff_updates(pen, {"a"}, set())
    assert pen == {}  # fully recovered entries leave the dict


def test_tracking_params_canonicalized(crawl_pair):
    """Lists emit utm-noised hrefs (raw in the golden text), but admission
    canonicalizes them: no fetched url carries a tracking param and the
    noised details are fetched exactly once under their canonical url."""
    engine, _ = crawl_pair
    tdf = engine.text_dataset().to_pandas()
    noised = [
        u for p in tdf[tdf.rule == "list"].payload for u in p.split("\n") if "utm_" in u
    ]
    assert noised, "corpus should emit tracking-param links"
    order = engine.order_dataset().to_pandas()
    assert not order.url.str.contains("utm_").any()
    canon = {u.split("?", 1)[0] for u in noised}
    fetched = order[order.url.isin(canon)]
    assert set(fetched.url) == canon  # each noised target fetched (canonically)


def test_anchor_texts_vs_bruteforce(ray_session, corpus_small):
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl_queries import anchor_texts

    got = anchor_texts("/root/testdata/sf0.001").to_pandas()
    a_re = re.compile(r'<a[^>]*?href="([^"]+)"[^>]*?title="([^"]+)"')
    cnt: Counter = Counter()
    t = pq.read_table(corpus_small.pages, columns=["html"])
    for blob in t["html"].to_pylist():
        cnt.update(a_re.findall(blob.decode("utf-8", errors="replace")))
    want: dict[str, Counter] = {}
    for (dst, anchor), c in cnt.items():
        want.setdefault(dst, Counter())[anchor] = c
    assert len(got) == len(want)
    for _, row in got.iterrows():
        w = want[row.dst_url]
        assert row.n_anchors == sum(w.values())
        assert row.n_distinct == len(w)
        assert row.top_anchor == min(w, key=lambda a: (-w[a], a))


def test_incremental_recrawl_engine_matches_oracle(
    ray_session, corpus_small, crawl_pair, tmp_path_factory
):
    """Recrawl the same site one epoch later: every previously-fetched url
    refetches under normal politeness, unchanged pages are recorded but NOT
    re-extracted, and only the changed fraction emits items — engine ≡
    oracle on the full recrawl schedule."""
    import hashlib

    from crawler_ray.pipelines.crawl import build_ts_ledger, load_ledger, run_recrawl
    from crawler_ray.sources.pages import _changed_in_epoch, synth_corpus

    engine1, _ = crawl_pair
    c2 = synth_corpus("/root/testdata/sf0.001", epoch=1)
    out2 = str(tmp_path_factory.mktemp("recrawl"))
    engine2 = run_recrawl(c2, engine1.out_dir, out2, max_iterations=30)

    ldir = build_ts_ledger(engine1.out_dir)
    urls, ts, rules = load_ledger(ldir)
    seeds_rows = [
        {
            "url": u,
            "depth": 0,
            "priority": 0,
            "seq": hashlib.md5(u.encode()).digest(),
            "attempt": 0,
            "rule": rl,
            "carry": {},
        }
        for u, rl in zip(urls, rules)
    ]
    orc2 = run_oracle(
        c2,
        max_iterations=30,
        seeds_rows=seeds_rows,
        ledger=dict(zip(urls, (int(x) for x in ts))),
    )
    df = engine2.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(orc2.order)
    assert engine2.iterations == orc2.iterations

    # the ledger is refetched in full; most pages are unchanged
    assert set(df.url) == set(urls)
    n_unch = (df.outcome == "unchanged").sum()
    n_ok = (df.outcome == "ok").sum()
    assert n_unch > 0 and n_ok > 0 and n_unch > n_ok
    # only the changed fraction re-extracts, with epoch-1 content
    items2 = engine2.items_dataset("detail").to_pandas()
    ids = items2.url.str.rsplit("/", n=1).str[1].astype(int)
    assert len(items2) > 0 and all(_changed_in_epoch(i) for i in ids)
    assert all(
        p == f"{10 + (i + 7) % 90}.00" for i, p in zip(ids, items2.price)
    )


def test_recrawl_chain_ledger_carries_forward(
    ray_session, corpus_small, crawl_pair, tmp_path_factory
):
    """Chained recrawls: run2's ledger merges ok AND unchanged outcomes, so
    a third crawl of the same epoch-1 site sees NOTHING changed."""
    from crawler_ray.pipelines.crawl import run_recrawl
    from crawler_ray.sources.pages import synth_corpus

    engine1, _ = crawl_pair
    c2 = synth_corpus("/root/testdata/sf0.001", epoch=1)
    out2 = str(tmp_path_factory.mktemp("re2"))
    e2 = run_recrawl(c2, engine1.out_dir, out2, max_iterations=30)
    out3 = str(tmp_path_factory.mktemp("re3"))
    e3 = run_recrawl(c2, out2, out3, max_iterations=30)
    df2 = e2.order_dataset().to_pandas()
    df3 = e3.order_dataset().to_pandas()
    # same capture set refetched; every epoch-1 page now reads unchanged
    assert set(df3.url) == set(df2[df2.outcome.isin(["ok", "unchanged"])].url)
    assert set(df3.outcome) == {"unchanged"}
    assert e3.items_dataset("detail") is None or e3.items_dataset("detail").count() == 0


def test_ts_ledger_keeps_last_capture_per_url(ray_session, tmp_path):
    """A url fetched in several iterations (reload task) must appear ONCE
    in the ledger with its LATEST warc_ts — the searchsorted probe lands
    on the first of equal keys, so duplicates would resurrect the earliest
    capture time."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl import build_ts_ledger

    import json as _json

    out = tmp_path / "run"
    for it, ts in enumerate([100, 200, 150]):
        odir = out / f"iter_{it:04d}" / "order"
        odir.mkdir(parents=True)
        # the ledger only ingests COMPLETE iterations (crash-orphaned order
        # rows must not mark never-extracted pages 'unchanged')
        with open(out / f"iter_{it:04d}" / "manifest.json", "w") as fh:
            _json.dump({"iteration": it, "complete": True}, fh)
        pq.write_table(
            pa.table(
                {
                    "iteration": pa.array([it], pa.int32()),
                    "url": pa.array(["http://h0.example.com/a"]),
                    "priority": pa.array([0], pa.int32()),
                    "seq": pa.array([b"\x00"], pa.binary()),
                    "attempt": pa.array([0], pa.int32()),
                    "outcome": pa.array(["ok"]),
                    "h64": pa.array([7], pa.uint64()),
                    "warc_ts": pa.array([ts], pa.timestamp("us")),
                    "task": pa.array(["t"]),
                    "rule": pa.array(["r"]),
                }
            ),
            odir / "order_0.parquet",
        )
    ldir = build_ts_ledger(str(out), num_shards=4)
    import glob as g
    import json

    meta = json.load(open(f"{ldir}/meta.json"))
    assert meta["n_urls"] == 1
    ufile = g.glob(f"{ldir}/urls_*.npy")
    assert len(ufile) == 1
    s = ufile[0][-8:-4]
    urls = np.load(ufile[0])
    tss = np.load(f"{ldir}/ts_{s}.npy")
    assert len(urls) == 1 and len(tss) == 1
    assert int(tss[0]) == 200  # the max, not the first or last written


def test_ts_ledger_skips_incomplete_iterations(ray_session, tmp_path):
    """Order rows from a crash-orphaned (manifest-less or incomplete)
    iteration must NOT enter the ledger: their items/text were never
    written, and an 'unchanged' mark on recrawl would skip extracting
    pages no run ever extracted."""
    import json as _json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl import build_ts_ledger

    out = tmp_path / "run"

    def _iter(it, url, ts, complete, manifest=True):
        odir = out / f"iter_{it:04d}" / "order"
        odir.mkdir(parents=True)
        if manifest:
            with open(out / f"iter_{it:04d}" / "manifest.json", "w") as fh:
                _json.dump({"iteration": it, "complete": complete}, fh)
        pq.write_table(
            pa.table(
                {
                    "iteration": pa.array([it], pa.int32()),
                    "url": pa.array([url]),
                    "priority": pa.array([0], pa.int32()),
                    "seq": pa.array([b"\x00"], pa.binary()),
                    "attempt": pa.array([0], pa.int32()),
                    "outcome": pa.array(["ok"]),
                    "h64": pa.array([7], pa.uint64()),
                    "warc_ts": pa.array([ts], pa.timestamp("us")),
                    "task": pa.array(["t"]),
                    "rule": pa.array(["r"]),
                }
            ),
            odir / "order_0.parquet",
        )

    _iter(0, "http://h0.example.com/a", 100, complete=True)
    _iter(1, "http://h0.example.com/crashed", 200, complete=False)
    _iter(2, "http://h0.example.com/orphan", 300, complete=True, manifest=False)
    # write iter_2 without manifest: emulate crash before manifest write
    import os

    os.remove(out / "iter_0002" / "manifest.json") if (
        out / "iter_0002" / "manifest.json"
    ).exists() else None

    ldir = build_ts_ledger(str(out), num_shards=2)
    meta = _json.load(open(f"{ldir}/meta.json"))
    assert meta["n_urls"] == 1  # only the complete iteration's url
    import glob as g

    all_urls = []
    for f in g.glob(f"{ldir}/urls_*.npy"):
        all_urls.extend(np.load(f).tolist())
    assert all_urls == [b"http://h0.example.com/a"]
