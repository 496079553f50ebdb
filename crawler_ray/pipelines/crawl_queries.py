"""Crawl-family ``queries()`` entries.

The full frontier-engine queries (crawl_items/order/text, multitask,
recrawl, frontier_host_stats) are rows-only driver checks: their iterative
stateful scheduling (politeness windows, retry waves, seen-set dynamics) is
not SQL-expressible, so their semantics are pinned by the pytest oracle
suite (tests/test_crawl_engine.py) instead.

The CORPUS-SCOPED queries — ``link_graph``, ``anchor_texts``,
``page_fields``, ``host_page_stats`` — are one streaming rule-engine /
predicate pass over the whole pages table with no crawl dynamics, so each
gets a genuine DuckDB twin (``oracle_entries()``): an independent
``regexp_extract_all`` / groupby derivation over the same parquet. The SQL
embeds the deterministic corpus cache path for the driver's sf
(``ORACLE_SF_DIR``, default sf0.01 — set ``CRAWLER_RAY_ORACLE_SF`` to check
another sf locally).

The crawl runs once per (sf_dir, process) and is cached; the order/text/items
queries all read the same checkpointed run.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from crawler_ray.pipelines.crawl import CrawlResult, run_crawl
from crawler_ray.rules import SYNTH_TASK
from crawler_ray.sources.pages import synth_corpus
from crawler_ray.stages.extract import make_extract_fn

_CACHE: dict[str, CrawlResult] = {}
# sub-walls recorded by composed queries for bench attribution
LAST_WALLS: dict[str, float] = {}


def _crawl(sf_dir: str) -> CrawlResult:
    res = _CACHE.get(sf_dir)
    if res is None:
        corpus = synth_corpus(sf_dir)
        out = tempfile.mkdtemp(prefix="crawl_q_")
        res = run_crawl(corpus, out_dir=out, max_iterations=40)
        _CACHE[sf_dir] = res
    return res


def crawl_items(sf_dir: str) -> rd.Dataset:
    """Flagship output: extracted detail items (ItemFields + url + ts)."""
    ds = _crawl(sf_dir).items_dataset("detail")
    assert ds is not None
    return ds


def crawl_order(sf_dir: str) -> rd.Dataset:
    """The crawl schedule: (iteration, url, priority, seq hex, attempt, outcome)."""
    ds = _crawl(sf_dir).order_dataset()
    assert ds is not None
    return ds.map_batches(
        lambda t: pa.table(
            {
                "iteration": t["iteration"],
                "url": t["url"],
                "priority": t["priority"],
                "seq_hex": pa.array([b.hex() for b in t["seq"].to_pylist()], pa.string()),
                "attempt": t["attempt"],
                "outcome": t["outcome"],
            }
        ),
        batch_format="pyarrow",
    )


def crawl_text(sf_dir: str) -> rd.Dataset:
    """Byte-identical extracted text per crawled url."""
    ds = _crawl(sf_dir).text_dataset()
    assert ds is not None
    return ds


def frontier_host_stats(sf_dir: str) -> rd.Dataset:
    """groupby(host) over the crawl schedule: fetches + failures per host."""
    from ray.data.aggregate import Count, Sum

    order = _crawl(sf_dir).order_dataset()
    assert order is not None
    from crawler_ray.functions.url import host_of

    ds = order.map_batches(
        lambda t: pa.table(
            {
                "host": host_of(t["url"].combine_chunks()),
                "failed": pc.cast(
                    pc.is_in(t["outcome"], value_set=pa.array(["missing", "banned"])), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("host").aggregate(
        Count(alias_name="n_fetches"), Sum("failed", alias_name="n_failed")
    )


def link_graph(sf_dir: str) -> rd.Dataset:
    """Pure full-corpus extract (no frontier): every (src, dst) link edge —
    the batch rule engine applied to the whole pages table in one streaming
    pass (rule inferred from url shape, dispatched per row).

    ``CRAWLER_RAY_GRAPH_MULT`` scales the synthetic corpus for scaling
    measurements: at the default sf0.1 size (5k pages) the downstream graph
    ops are dominated by Ray's fixed per-shuffle cost, so an N-vs-4N
    comparison measures the operator floor, not the engine."""
    import os

    mult = int(os.environ.get("CRAWLER_RAY_GRAPH_MULT", "1"))
    corpus = synth_corpus(sf_dir, multiplier=mult) if mult > 1 else synth_corpus(sf_dir)
    pages = rd.read_parquet(corpus.pages, columns=["url", "html", "warc_ts"])

    def prep(t: pa.Table) -> pa.Table:
        rule = pc.replace_substring_regex(
            t["url"], pattern=r"^https://[^/]*/(tag|list|detail)/.*$", replacement=r"\1"
        )
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"],
                "html": t["html"],
                "warc_ts": t["warc_ts"],
                "rule": rule,
                "depth": pa.array([0] * n, pa.int32()),
                "seq": pa.array([b""] * n, pa.binary()),
                "carry": pa.array(["{}"] * n, pa.string()),
            }
        )

    ds = pages.map_batches(prep, batch_format="pyarrow")
    # cached task fn, not an actor pool: the Extractor's only state is
    # compiled regexes, and actor-pool spawn cost ~2 s before the first
    # page was extracted at sf0.1 (see stages.extract.make_extract_fn)
    ex = ds.map_batches(make_extract_fn(SYNTH_TASK), batch_format="pyarrow")
    def edges_fn(t: pa.Table) -> pa.Table:
        # text rows hold src url + newline-joined extracted link targets;
        # vectorized explode: split_pattern → list lengths → repeat/flatten
        # (this feeds pagerank/triangle/components — the graph-suite hot path)
        import numpy as np

        f = t.filter(
            pc.and_(pc.equal(t["kind"], "text"), pc.is_in(t["rule"], value_set=pa.array(["tag", "list"])))
        )
        parts = pc.split_pattern(pc.fill_null(f["payload"], "").combine_chunks(), "\n")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        src = f["url"].combine_chunks().take(pa.array(np.repeat(np.arange(len(parts)), lens)))
        dst = pc.list_flatten(parts)
        tbl = pa.table({"src_url": src, "dst_url": dst})
        # an empty payload splits to [""] — drop those placeholder edges
        return tbl.filter(pc.not_equal(tbl["dst_url"], ""))

    return ex.map_batches(edges_fn, batch_format="pyarrow")


def rank_weighted_frontier(sf_dir: str, iters: int = 10) -> rd.Dataset:
    """Rank-informed frontier prioritization — the crawl loop closed on its
    own link graph: PageRank over the corpus edges (``link_graph`` →
    ``pagerank_edges``, the BSP layer) buckets every url into an integer
    priority = bit_length(rank_micro), so a recrawl or refresh pass
    schedules hub pages first.  The bucket is computed by pure integer
    comparison against powers of two (no float log2 boundary risk), making
    the whole composition deterministic end-to-end; rows-only for the
    driver (iterative PageRank is not SQL-expressible), with the rank
    itself pinned by the dense pytest oracle and the bucketing pinned
    directly."""
    import numpy as np

    from crawler_ray.pipelines.graph import pagerank

    ranks = pagerank(sf_dir, iters=iters)

    def bucket(t: pa.Table) -> pa.Table:
        v = t["rank_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        prio = (v[:, None] >= (np.int64(1) << np.arange(63, dtype=np.int64))).sum(1)
        return pa.table(
            {
                "url": t["url"],
                "priority": pa.array(prio.astype(np.int64)),
                "rank_micro": t["rank_micro"],
            }
        )

    return ranks.map_batches(bucket, batch_format="pyarrow")


def recrawl_items(sf_dir: str) -> rd.Dataset:
    """Incremental-recrawl surface: crawl the corpus (shared cached run),
    then recrawl the SAME site one epoch later (``synth_corpus(epoch=1)``)
    against the first run's fetch ledger — returns the items the recrawl
    re-extracted, i.e. exactly the changed-content fraction. Rows-only;
    the schedule-level semantics are pinned by
    ``tests/test_crawl_engine.py::test_incremental_recrawl_engine_matches_oracle``."""
    import tempfile as _tf

    from crawler_ray.pipelines.crawl import run_recrawl

    key = sf_dir + "@recrawl"
    res = _CACHE.get(key)
    if res is None:
        first = _crawl(sf_dir)  # shared with the other crawl queries
        c2 = synth_corpus(sf_dir, epoch=1)
        out2 = _tf.mkdtemp(prefix="recrawl_q_")
        import time as _time

        t0 = _time.time()
        res = run_recrawl(c2, first.out_dir, out2, max_iterations=40)
        # the recrawl ENGINE's own wall, separate from the shared
        # first-crawl cache fill the composed query may also pay —
        # bench.py reports this as recrawl_only_sec
        LAST_WALLS["recrawl_only_sec"] = round(_time.time() - t0, 2)
        _CACHE[key] = res
    ds = res.items_dataset("detail")
    assert ds is not None
    return ds


def anchor_texts(sf_dir: str, nparts: int = 16) -> rd.Dataset:
    """Anchor-text aggregation over the link graph — the web-search /
    training-data signal the crawl's raw pages carry but no single page
    states: for every link TARGET, how many anchors point at it, how many
    distinct anchor strings, and the dominant anchor (most frequent,
    lexicographic min tie-break).

    Scale shape: one streaming pass over the pages corpus extracts
    (target, anchor, count) partials combined per batch, then ONE coarse
    target-hash partition exchange and a vectorized per-partition reduce —
    anchor strings shuffle once, grouped rows never leave their partition.
    Rows-only (the pages table is not an oracle view); pinned by a pytest
    brute force."""
    import re

    import numpy as np
    import pandas as pd

    corpus = synth_corpus(sf_dir)
    pages = rd.read_parquet(corpus.pages, columns=["url", "html"])
    a_re = re.compile(r'<a[^>]*?href="([^"]+)"[^>]*?title="([^"]+)"')

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        # only list-shaped pages carry titled anchors; cheap vectorized gate
        mask = pc.match_substring(t["html"], 'title="')
        for blob in t.filter(mask)["html"].to_pylist():
            cnt.update(a_re.findall(blob.decode("utf-8", errors="replace")))
        if not cnt:
            return pa.table(
                {
                    "dst_url": pa.array([], pa.string()),
                    "anchor": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        dst = np.array([k[0] for k in cnt], dtype=object)
        h = pd.util.hash_array(dst) % np.uint64(nparts)
        return pa.table(
            {
                "dst_url": pa.array(list(dst), pa.string()),
                "anchor": pa.array([k[1] for k in cnt], pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
                "part": pa.array(h.astype(np.int32)),
            }
        )

    def reduce_part(g: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            g.groupby(["dst_url", "anchor"], sort=False, as_index=False)["cnt"].sum()
            # (cnt desc, anchor asc) within target → first row per target is
            # the dominant anchor with the lexicographic tie-break
            .sort_values(["dst_url", "cnt", "anchor"],
                         ascending=[True, False, True], kind="mergesort",
                         ignore_index=True)
        )
        dst = g["dst_url"].to_numpy()
        starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
        ends = np.r_[starts[1:], len(dst)]
        return pd.DataFrame(
            {
                "dst_url": dst[starts],
                "n_anchors": np.add.reduceat(g["cnt"].to_numpy(), starts).astype(np.int64),
                "n_distinct": (ends - starts).astype(np.int64),
                "top_anchor": g["anchor"].to_numpy()[starts],
            }
        )

    return (
        pages.map_batches(partial, batch_size=1024, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pandas")
    )


def multitask_crawl_order(sf_dir: str) -> rd.Dataset:
    """Multi-task single-engine surface (engine/crawler.go:48-75): SYNTH_TASK
    and LINKSCAN_TASK seed into ONE engine run — shared frontier, shared
    URL-seen set, shared per-host politeness budget, per-task rule/depth
    dispatch by the frontier's ``task`` column — and this query returns the
    task-qualified schedule. Rows-only; engine ≡ two-task oracle is pinned
    by ``tests/test_multitask.py``."""
    import dataclasses
    import tempfile as _tf

    from crawler_ray.rules import LINKSCAN_TASK

    key = sf_dir + "@multitask"
    res = _CACHE.get(key)
    if res is None:
        corpus = synth_corpus(sf_dir)
        seeds = pq.read_table(corpus.seeds)
        n = seeds.num_rows
        # interleave task assignment with a shared middle range: even rows
        # → synth_crawl, odd + the middle quarter → linkscan (overlap
        # exercises the shared seen set: one fetch per url across tasks)
        idx = np.arange(n)
        is_scan = (idx % 2 == 1) | ((idx >= n // 4) & (idx < n // 2))
        seeds = seeds.append_column(
            "task",
            pa.array(np.where(is_scan, "linkscan", "synth_crawl")),
        ).set_column(
            seeds.schema.get_field_index("rule"),
            "rule",
            pa.array(
                np.where(is_scan, "hub", seeds.column("rule").to_numpy(zero_copy_only=False))
            ),
        )
        sdir = _tf.mkdtemp(prefix="mt_seeds_")
        spath = f"{sdir}/seeds.parquet"
        pq.write_table(seeds, spath)
        res = run_crawl(
            dataclasses.replace(corpus, seeds=spath),
            task=[SYNTH_TASK, LINKSCAN_TASK],
            out_dir=_tf.mkdtemp(prefix="mtcrawl_q_"),
            max_iterations=40,
        )
        _CACHE[key] = res
    ds = res.order_dataset()
    assert ds is not None
    return ds.map_batches(
        lambda t: pa.table(
            {
                "iteration": t["iteration"],
                "task": t["task"],
                "url": t["url"],
                "rule": t["rule"],
                "outcome": t["outcome"],
            }
        ),
        batch_format="pyarrow",
    )


def page_fields(sf_dir: str) -> rd.Dataset:
    """Full-corpus detail-field extraction (the R5 ``parseBookDetail``
    semantics, ``dobuan_book.go:131-149``) — the rule engine's
    field_extract kind applied to every ``/detail/`` page in one streaming
    pass, no frontier. ``title`` is carry-only (TmpData) and stays empty in
    a corpus-scoped pass; ``pages`` goes through the strict Atoi coercion.

    DuckDB-oracled: the twin re-derives every field with
    ``regexp_extract`` over the same html — two independent regex engines
    (Python ``re`` vs RE2) against the byte-identical extraction contract."""
    import json

    import pandas as pd

    corpus = synth_corpus(sf_dir)
    pages = rd.read_parquet(corpus.pages, columns=["url", "html", "warc_ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring_regex(t["url"], r"^https://[^/]*/detail/"))
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"],
                "html": t["html"],
                "warc_ts": t["warc_ts"],
                "rule": pa.array(["detail"] * n, pa.string()),
                "depth": pa.array([0] * n, pa.int32()),
                "seq": pa.array([b""] * n, pa.binary()),
                "carry": pa.array(["{}"] * n, pa.string()),
            }
        )

    ex = pages.map_batches(prep, batch_format="pyarrow").map_batches(
        make_extract_fn(SYNTH_TASK), batch_format="pyarrow"
    )

    def fields(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["kind"], "item"))
        rows = [json.loads(p) for p in f["payload"].to_pylist()]
        df = pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=["title", "author", "pages", "publisher", "score", "price", "intro"]
        )
        return pa.table(
            {
                "url": f["url"].combine_chunks(),
                "title": pa.array(df["title"], pa.string()),
                "author": pa.array(df["author"], pa.string()),
                "pages": pa.array(df["pages"], pa.int64()),
                "publisher": pa.array(df["publisher"], pa.string()),
                "score": pa.array(df["score"], pa.string()),
                "price": pa.array(df["price"], pa.string()),
                "intro": pa.array(df["intro"], pa.string()),
            }
        )

    return ex.map_batches(fields, batch_format="pyarrow")


def host_page_stats(sf_dir: str) -> rd.Dataset:
    """Per-host corpus stats through the engine's OWN predicates — the
    host partitioner (``functions/url.host_of``), the binary-direct
    ban-page detector (P3, ``engine/crawler.go:107``), the min-length
    gate (P4, ``engine/crawler.go:113``) and the redirect probe — as one
    vectorized map_batches + bounded groupby (64 hosts). DuckDB-oracled
    via ``contains``/``octet_length``/``starts_with`` twins."""
    from crawler_ray.functions.url import host_of
    from crawler_ray.sources.pages import BAN_STRING, MIN_BODY_BYTES, REDIRECT_PREFIX

    corpus = synth_corpus(sf_dir)
    pages = rd.read_parquet(corpus.pages, columns=["url", "html"])

    def partial(t: pa.Table) -> pa.Table:
        html = t["html"]
        g = (
            pa.table(
                {
                    "host": host_of(t["url"].combine_chunks()),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                    "banned": pc.cast(pc.match_substring(html, BAN_STRING), pa.int64()),
                    "short": pc.cast(
                        pc.less(pc.binary_length(html), MIN_BODY_BYTES), pa.int64()
                    ),
                    # binary-direct prefix match: a cast to pa.string()
                    # raises ArrowInvalid on any non-UTF-8 body (same
                    # rationale as the ban check in stages/extract.py)
                    "redirect": pc.cast(
                        pc.starts_with(html, REDIRECT_PREFIX), pa.int64()
                    ),
                }
            )
            .group_by(["host"])
            .aggregate([("one", "sum"), ("banned", "sum"), ("short", "sum"), ("redirect", "sum")])
        )
        return g.rename_columns(["host", "n_pages", "n_banned", "n_short", "n_redirect"])

    parts = pages.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("host", as_index=False)[
        ["n_pages", "n_banned", "n_short", "n_redirect"]
    ].sum()
    return pa.table(
        {
            "host": pa.array(agg.host, pa.string()),
            "n_pages": pa.array(agg.n_pages.to_numpy().astype(np.int64)),
            "n_banned": pa.array(agg.n_banned.to_numpy().astype(np.int64)),
            "n_short": pa.array(agg.n_short.to_numpy().astype(np.int64)),
            "n_redirect": pa.array(agg.n_redirect.to_numpy().astype(np.int64)),
        }
    )


_WARC_VERSION = "v1"


def synth_warc(sf_dir: str) -> str:
    """Deterministic WARC twin of the pages corpus, cached under /tmp.
    Pages whose url length is even land in plain ``.warc`` shards, odd in
    per-record-gzip ``.warc.gz`` shards (the Common Crawl layout), so one
    driver row proves BOTH parse paths of ``sources/warc.py``. Written by
    the Ray ``WarcDatasink`` — the write itself is a distributed pipeline."""
    import shutil

    from crawler_ray.sources.warc import WarcDatasink

    corpus = synth_corpus(sf_dir)
    out = f"/tmp/crawler_ray_cache/warc_{os.path.basename(corpus.root)}_{_WARC_VERSION}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    pages = rd.read_parquet(corpus.pages, columns=["url", "warc_ts", "html"])

    def half(t: pa.Table, parity: int) -> pa.Table:
        keep = pc.equal(
            pc.bit_wise_and(pc.utf8_length(t["url"]), pa.scalar(1, pa.int32())), parity
        )
        f = t.filter(keep)
        return pa.table({"url": f["url"], "warc_ts": f["warc_ts"], "payload": f["html"]})

    for parity, compress, sub in ((0, False, "plain"), (1, True, "gz")):
        pages.map_batches(
            lambda t, p=parity: half(t, p), batch_format="pyarrow"
        ).write_datasink(WarcDatasink(os.path.join(out, sub), compress=compress))
    with open(marker, "w"):
        pass
    return out


def warc_pages(sf_dir: str) -> rd.Dataset:
    """WARC source round trip: the pages corpus written to mixed
    plain/per-record-gzip WARC shards (one-time cached fixture), then read
    back through ``read_warc`` (streaming record parse, one task per
    shard). Emits per-record ``(url, ts_us, status, n_bytes,
    payload_md5)`` — the md5 proves byte-exact payload fidelity against
    the DuckDB twin computed from the parquet side."""
    import glob
    import hashlib

    from crawler_ray.sources.warc import read_warc

    wdir = synth_warc(sf_dir)
    paths = sorted(glob.glob(os.path.join(wdir, "plain", "*.warc"))) + sorted(
        glob.glob(os.path.join(wdir, "gz", "*.warc.gz"))
    )
    ds = read_warc(paths)

    def stats(t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        return pa.table(
            {
                "url": t["url"],
                "ts_us": t["warc_ts"].cast(pa.int64()),
                "status": t["status"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
                ),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


QUERIES = {
    "crawl_items": crawl_items,
    "crawl_order": crawl_order,
    "crawl_text": crawl_text,
    "multitask_crawl_order": multitask_crawl_order,
    "frontier_host_stats": frontier_host_stats,
    "link_graph": link_graph,
    "anchor_texts": anchor_texts,
    "page_fields": page_fields,
    "host_page_stats": host_page_stats,
    "recrawl_items": recrawl_items,
    "rank_weighted_frontier": rank_weighted_frontier,
    "warc_pages": warc_pages,
}

# The driver compares the Ray result against oracle SQL at THIS sf; the SQL
# below embeds the deterministic corpus cache path for it. Override locally
# (CRAWLER_RAY_ORACLE_SF) to sweep another sf with tools/check_queries.py.
ORACLE_SF_DIR = os.environ.get("CRAWLER_RAY_ORACLE_SF", "/root/testdata/sf0.01")


def oracle_entries() -> dict[str, str]:
    """DuckDB twins for the corpus-scoped crawl-family queries.

    Synthesizes (or reuses the cached) pages corpus for ``ORACLE_SF_DIR`` so
    the embedded ``read_parquet`` path exists regardless of whether the
    driver runs the SQL before or after the Ray query; returns {} if the sf
    tables are unavailable (the entries then degrade to rows-only)."""
    from crawler_ray.sources.pages import BAN_STRING, MIN_BODY_BYTES, REDIRECT_PREFIX

    try:
        corpus = synth_corpus(ORACLE_SF_DIR)
    except Exception:
        return {}
    pages = f"read_parquet('{os.path.join(corpus.pages, 'part-0.parquet')}')"
    return {
        # The rule engine's exact link regexes (rules.py SYNTH_TASK, cited to
        # parse/doubangroup/dobuan_book.go shapes), re-run by RE2 — raw hrefs,
        # no canonicalization, from every tag/list page (ban/short pages
        # included: this is the extract surface, not the crawl gate).
        "link_graph": rf"""
            WITH p AS (SELECT url, decode(html) AS h FROM {pages})
            SELECT url AS src_url,
                   UNNEST(regexp_extract_all(h, '<a href="([^"]+)" class="tag">([^<]+)</a>', 1)) AS dst_url
            FROM p WHERE regexp_matches(url, '^https://[^/]*/tag/')
            UNION ALL
            SELECT url AS src_url,
                   UNNEST(regexp_extract_all(h, '<a class="item" href="([^"]+)" title="([^"]+)">', 1)) AS dst_url
            FROM p WHERE regexp_matches(url, '^https://[^/]*/list/')
        """,
        "anchor_texts": rf"""
            WITH m AS (
                SELECT UNNEST(regexp_extract_all(h, '<a[^>]*?href="([^"]+)"[^>]*?title="([^"]+)"', 1)) AS dst_url,
                       UNNEST(regexp_extract_all(h, '<a[^>]*?href="([^"]+)"[^>]*?title="([^"]+)"', 2)) AS anchor
                FROM (SELECT decode(html) AS h FROM {pages})
                WHERE contains(h, 'title="')
            ),
            c AS (SELECT dst_url, anchor, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM m GROUP BY dst_url, anchor)
            SELECT dst_url,
                   CAST(SUM(cnt) AS BIGINT) AS n_anchors,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   (ARRAY_AGG(anchor ORDER BY cnt DESC, anchor))[1] AS top_anchor
            FROM c GROUP BY dst_url
        """,
        # TRY_CAST stands in for the strict Atoi only because the captured
        # value is digits-or-garbage here; the Python side is the
        # authoritative grammar (rules.py _atoi, pinned by pytest).
        "page_fields": rf"""
            SELECT url,
                   '' AS title,
                   regexp_extract(h, '<span class="pl"> author</span>:[\s\S]*?<a.*?>([^<]+)</a>', 1) AS author,
                   CAST(COALESCE(TRY_CAST(regexp_extract(h, '<span class="pl">pages:</span> ([^<]+)<br/>', 1) AS BIGINT), 0) AS BIGINT) AS pages,
                   regexp_extract(h, '<span class="pl">publisher:</span>\s*<a.*?>([^<]+)</a>', 1) AS publisher,
                   regexp_extract(h, '<strong class="score">([^<]+)</strong>', 1) AS score,
                   regexp_extract(h, '<span class="pl">price:</span>([^<]+)<br/>', 1) AS price,
                   regexp_extract(h, '<div class="intro">[\d\D]*?<p>([^<]+)</p></div>', 1) AS intro
            FROM (SELECT url, decode(html) AS h FROM {pages})
            WHERE regexp_matches(url, '^https://[^/]*/detail/')
        """,
        # WARC round trip: the engine derives these five columns from the
        # bytes it parsed back OUT of the WARC shards; the SQL derives them
        # from the parquet the shards were written FROM — equality proves
        # byte-exact archive fidelity (md5 over the identical UTF-8 bytes).
        "warc_pages": rf"""
            SELECT url,
                   CAST(epoch_us(warc_ts) AS BIGINT) AS ts_us,
                   CAST(200 AS BIGINT) AS status,
                   CAST(octet_length(html) AS BIGINT) AS n_bytes,
                   md5(decode(html)) AS payload_md5
            FROM {pages}
        """,
        "host_page_stats": rf"""
            SELECT split_part(split_part(url, '://', 2), '/', 1) AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(SUM(CASE WHEN contains(decode(html), '{BAN_STRING}') THEN 1 ELSE 0 END) AS BIGINT) AS n_banned,
                   CAST(SUM(CASE WHEN octet_length(html) < {MIN_BODY_BYTES} THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
                   CAST(SUM(CASE WHEN starts_with(decode(html), '{REDIRECT_PREFIX}') THEN 1 ELSE 0 END) AS BIGINT) AS n_redirect
            FROM {pages}
            GROUP BY host
        """,
    }


ORACLE_SQL: dict[str, str] = {}
