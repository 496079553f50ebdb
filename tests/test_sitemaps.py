"""Sitemap ingestion: /sitemap.xml of each newly-seen host is fetched
through the control-plane (like robots.txt) and its <loc> URLs join the
same generation's frontier. The synthetic corpus plants orphan detail
pages (ids above n_docs) reachable ONLY via sitemaps, so ingestion has a
demonstrable frontier gain; engine ≡ oracle pins ordering, text, items
and the final seen set, including across a kill/resume."""

from __future__ import annotations

import shutil

import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.pipelines.oracle import run_oracle
from crawler_ray.sources.pages import synth_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(SF)


def _order_set(res):
    df = res.order_dataset().to_pandas()
    return set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))


def test_sitemap_crawl_matches_oracle(ray_session, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sm_out"))
    res = run_crawl(corpus, out_dir=out, max_iterations=30, sitemaps_from_corpus=True)
    orc = run_oracle(corpus, max_iterations=30, sitemaps_from_corpus=True)
    assert _order_set(res) == set(orc.order)
    t = res.text_dataset().to_pandas()
    assert dict(zip(t.url, t.payload)) == orc.texts
    items = res.items_dataset("detail")
    got = {r["url"] for r in items.take_all()}
    want = {i["url"] for i in orc.items}
    assert got == want


def test_orphans_only_reachable_via_sitemap(ray_session, corpus, tmp_path_factory):
    n_docs = corpus.n_docs
    orphan_prefixes = tuple(f"/detail/{i}" for i in range(n_docs, n_docs + 2))

    out_off = str(tmp_path_factory.mktemp("sm_off"))
    res_off = run_crawl(corpus, out_dir=out_off, max_iterations=30)
    urls_off = set(res_off.order_dataset().to_pandas().url)
    assert not any(u.endswith(p) for u in urls_off for p in orphan_prefixes)

    out_on = str(tmp_path_factory.mktemp("sm_on"))
    res_on = run_crawl(corpus, out_dir=out_on, max_iterations=30,
                       sitemaps_from_corpus=True)
    urls_on = set(res_on.order_dataset().to_pandas().url)
    # every orphan id that has a page must be scheduled exactly when
    # sitemaps are on (subject to its host's budget — give it enough
    # iterations that all budgets drain)
    hit = [u for u in urls_on if any(u.endswith(p) for p in orphan_prefixes)]
    assert hit, "sitemap-only pages never entered the frontier"
    assert urls_off < urls_on


def test_sitemap_resume_preserves_schedule(ray_session, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sm_resume"))
    run_crawl(corpus, out_dir=out, max_iterations=2, sitemaps_from_corpus=True)
    res = run_crawl(corpus, out_dir=out, max_iterations=30, resume=True,
                    sitemaps_from_corpus=True)
    out_clean = str(tmp_path_factory.mktemp("sm_clean"))
    clean = run_crawl(corpus, out_dir=out_clean, max_iterations=30,
                      sitemaps_from_corpus=True)
    assert _order_set(res) == _order_set(clean)
    shutil.rmtree(out, ignore_errors=True)
