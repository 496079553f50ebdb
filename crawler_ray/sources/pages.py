"""Deterministic synthesis of the Common-Crawl-style ``pages`` input table.

Schema is exactly the BASELINE.json ``input_hint`` shape::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

The corpus mirrors the reference's three-page rule chain
(tag → list → detail, ``parse/doubangroup/dobuan_book.go``) at configurable
scale, seeded from the row count of ``{sf_dir}/documents.parquet`` so tests,
correctness runs and bench all scale with the driver's sf tables without any
external data:

- one **detail** page per document (intro text drawn from the document's own
  ``text`` column);
- one **list** page per ``FANOUT`` details, linking them with carried titles
  (exercises TmpData carry, R4);
- one **tag** page per ``FANOUT`` lists (the seed generation, R3);
- a deterministic fraction of pages embed the reference's anti-bot ban string
  (``engine/crawler.go:107``) or are shorter than the 6000-byte garbage
  threshold (``engine/crawler.go:113``) to exercise those filters;
- a deterministic fraction of linked detail URLs do **not exist** in the
  pages table — a simulated fetch failure driving the
  unmark-on-failure + single-retry path (``engine/crawler.go:179-194``);
- some list pages link into ``/private/`` paths disallowed by the synthetic
  robots config, exercising the politeness gate.

``text`` is the **golden extraction** for the page — written by the
generator from what it embedded, independently of the rule engine — so the
byte-identical invariant compares two independent derivations.

At 100 TB this generator is a test fixture only; real runs read existing
WARC-derived Parquet. Generation here is a driver-side loop (≤ ~60k pages at
sf0.1) cached under /tmp keyed by (sf_dir, generator version).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 7
FANOUT = 8
NUM_HOSTS = 64
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
BAN_STRING = "你访问豆瓣的方式有点像机器人程序"  # engine/crawler.go:107
MIN_BODY_BYTES = 6000  # engine/crawler.go:113-120

# HTTP-redirect simulation: a page whose body is exactly a meta-refresh to a
# target url. The reference's fetch follows server redirects transparently
# (Go ``http.Get``, collect/collect.go:41 — net/http chases up to 10 hops
# then errors); the simulated twin resolves these chains against the pages
# table with the same hop cap, so a redirect to a missing/looping target is
# a fetch FAILURE (unmark + single requeue), not a page.
REDIRECT_PREFIX = '<html><head><meta http-equiv="refresh" content="0;url='
REDIRECT_SUFFIX = '"></head></html>'
MAX_REDIRECTS = 10


def redirect_html(target: str) -> str:
    return REDIRECT_PREFIX + target + REDIRECT_SUFFIX

# deterministic multiplicative hash (Knuth) for host assignment
_KNUTH = 2654435761


def _host_for(i: int, skew: bool = True) -> str:
    # ~30% of detail pages land on one mega-host (skew on purpose,
    # FIXTURES.md §1); the uniform variant isolates engine scaling from the
    # semantic serialization a hot host imposes on per-host politeness
    if skew and i % 10 < 3:
        return "host00.example.com"
    return f"host{1 + (i * _KNUTH) % (NUM_HOSTS - 1):02d}.example.com"


@dataclass(frozen=True)
class Corpus:
    """Paths of one synthesized corpus."""

    root: str
    pages: str  # parquet dir
    seeds: str  # parquet file
    politeness: str  # json file
    n_docs: int


def _detail_exists(i: int) -> bool:
    """Detail pages with i % 29 == 0 are linked but absent → fetch failure."""
    return i % 29 != 0


def _alias_kind(i: int) -> str | None:
    """Redirect aliasing of existing detail pages: lists link ``/d/{i}``
    instead of ``/detail/{i}`` for these ids, and the corpus serves the
    alias as a meta-refresh page — 'single' (one hop), 'double' (two-hop
    chain through ``/d2/{i}``), or 'dead' (target absent → fetch failure)."""
    if not _detail_exists(i):
        return None
    return {5: "single", 11: "double", 16: "dead"}.get(i % 23)


# a deliberate 2-cycle: fetching either url exhausts the hop cap → failure
LOOP_URLS = (
    "https://host01.example.com/r/loop/0",
    "https://host01.example.com/r/loop/1",
)


def _changed_in_epoch(i: int) -> bool:
    """Details with i % 7 == 2 change content (and warc_ts) in epoch > 0 —
    the incremental-recrawl fraction."""
    return i % 7 == 2


# warc_ts advance for changed pages per epoch (1000 s in microseconds)
EPOCH_TS_BUMP_US = 1_000_000_000


def _detail_fields(i: int, intro: str, epoch: int = 0) -> dict[str, object]:
    price = 10 + (i + (7 * epoch if epoch and _changed_in_epoch(i) else 0)) % 90
    return {
        "title": f"title-{i:06d}",
        "author": f"Author {i % 97}",
        "pages": 50 + (i % 400),
        "publisher": f"Pub {i % 13}",
        "score": f"9.{i % 10}",
        "price": f"{price}.00",
        "intro": intro,
    }


def _detail_html(i: int, f: dict[str, object]) -> str:
    return (
        f"<html><body><h1>{f['title']}</h1>"
        f'<span class="pl"> author</span>:\n  <a href="/a/{i}">{f["author"]}</a><br/>'
        f'<span class="pl">publisher:</span> <a href="/p/{i}">{f["publisher"]}</a><br/>'
        f'<span class="pl">pages:</span> {f["pages"]}<br/>'
        f'<span class="pl">price:</span>{f["price"]}<br/>'
        f'<strong class="score">{f["score"]}</strong>'
        f'<div class="intro"><span>x</span><p>{f["intro"]}</p></div>'
        f"</body></html>"
    )


def _clean_text(s: str, limit: int = 60) -> str:
    out = s.replace("<", " ").replace(">", " ").replace("\n", " ")
    return out[:limit].strip()


def synth_corpus(
    sf_dir: str,
    cache_root: str = "/tmp/crawler_ray_cache",
    multiplier: int = 1,
    budget_divisor: int = 100,
    skew: bool = True,
    epoch: int = 0,
) -> Corpus:
    """Synthesize (or reuse cached) corpus for one sf directory.

    ``multiplier`` replicates the document set to scale the page count
    (bench corpora); ``budget_divisor`` sets per-host politeness budget =
    n_docs // divisor (smaller divisor ⇒ fewer, heavier crawl generations);
    ``skew=False`` drops the 30% mega-host (uniform host distribution).
    ``epoch > 0`` is the SAME site observed later: details with
    ``i % 7 == 2`` have changed content and a bumped ``warc_ts``
    (``EPOCH_TS_BUMP_US`` per epoch); every other page is byte-identical —
    the incremental-recrawl fixture.
    """
    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(docs_path).num_rows * multiplier
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}_v{GEN_VERSION}_{n_docs}"
        f"_b{budget_divisor}" + ("" if skew else "_uniform")
        + (f"_e{epoch}" if epoch else "")
    )
    root = os.path.join(cache_root, tag)
    corpus = Corpus(
        root=root,
        pages=os.path.join(root, "pages"),
        seeds=os.path.join(root, "seeds.parquet"),
        politeness=os.path.join(root, "politeness.json"),
        n_docs=n_docs,
    )
    done_marker = os.path.join(root, "_DONE")
    if os.path.exists(done_marker):
        return corpus
    os.makedirs(corpus.pages, exist_ok=True)

    doc_text = pq.read_table(docs_path, columns=["text"]).column("text").to_pylist()
    n_base = len(doc_text)

    # Two-phase generation keeps memory bounded at any multiplier: phase 1
    # builds lightweight (url, kind, id, page_index) descriptors and sorts
    # them by url (the fetch stage's row-group stats index needs a globally
    # url-sorted layout); phase 2 renders html/text in sorted order,
    # streaming one row group at a time into the Parquet writer.
    descriptors: list[tuple[str, str, int, int]] = []  # (url, kind, id, page_idx)
    page_idx = 0

    def add_desc(url: str, kind: str, ident: int) -> None:
        nonlocal page_idx
        descriptors.append((url, kind, ident, page_idx))
        page_idx += 1

    for i in range(n_docs):
        if _detail_exists(i):
            add_desc(f"https://{_host_for(i, skew)}/detail/{i}", "detail", i)
            ak = _alias_kind(i)
            if ak:
                add_desc(f"https://{_host_for(i, skew)}/d/{i}", "alias", i)
            if ak == "double":
                add_desc(f"https://{_host_for(i, skew)}/d2/{i}", "alias2", i)
    add_desc(LOOP_URLS[0], "loop", 0)
    add_desc(LOOP_URLS[1], "loop", 1)
    n_lists = (n_docs + FANOUT - 1) // FANOUT
    for j in range(n_lists):
        add_desc(f"https://{_host_for(j * 7, skew)}/list/{j}", "list", j)
    n_tags = (n_lists + FANOUT - 1) // FANOUT
    seed_urls: list[str] = []
    for k in range(n_tags):
        url = f"https://{_host_for(k * 13 + 1, skew)}/tag/{k}"
        add_desc(url, "tag", k)
        seed_urls.append(url)
    # orphan detail pages: valid details reachable ONLY through each host's
    # /sitemap.xml (ids live above n_docs, so no list's link range can ever
    # cover them) — the sitemap-ingestion feature's demonstrable frontier
    # gain. Ban/short fractions apply to them like any detail page.
    n_orphans = max(2, n_docs // 16)
    orphans_by_host: dict[str, list[str]] = {}
    for i in range(n_docs, n_docs + n_orphans):
        h = _host_for(i, skew)
        u = f"https://{h}/detail/{i}"
        orphans_by_host.setdefault(h, []).append(u)
        add_desc(u, "detail", i)
    sitemap_hosts = sorted(orphans_by_host)
    for hi, h in enumerate(sitemap_hosts):
        add_desc(f"https://{h}/sitemap.xml", "sitemap", hi)

    def render(kind: str, ident: int) -> tuple[str, str, int]:
        """→ (html, golden_text, filter_index) for one page."""
        if kind == "sitemap":
            h = sitemap_hosts[ident]
            body = "".join(f"<url><loc>{u}</loc></url>" for u in orphans_by_host[h])
            html = '<?xml version="1.0" encoding="UTF-8"?><urlset>' + body + "</urlset>"
            # fi=1: never ban-marked; the short-page padding appends an
            # XML-comment tail, harmless to the <loc> regex parse
            return html, "", 1
        if kind == "detail":
            i = ident
            f = _detail_fields(i, _clean_text(doc_text[i % n_base]), epoch)
            golden = (
                "" if (i % 37 == 0 or i % 41 == 0)
                else json.dumps(f, ensure_ascii=False, sort_keys=True)
            )
            return _detail_html(i, f), golden, i
        if kind == "alias":
            # golden = the TARGET detail's extraction (the fetch follows the
            # chain and parses the final body under the alias url); dead
            # targets never extract. fi=1: never banned, harmlessly padded.
            i = ident
            ak = _alias_kind(i)
            host = _host_for(i, skew)
            if ak == "dead":
                return redirect_html(f"https://{host}/gone/{i}"), "", 1
            hop = "d2" if ak == "double" else "detail"
            f = _detail_fields(i, _clean_text(doc_text[i % n_base]), epoch)
            golden = (
                "" if (i % 37 == 0 or i % 41 == 0)
                else json.dumps(f, ensure_ascii=False, sort_keys=True)
            )
            return redirect_html(f"https://{host}/{hop}/{i}"), golden, 1
        if kind == "alias2":
            i = ident
            return redirect_html(f"https://{_host_for(i, skew)}/detail/{i}"), "", 1
        if kind == "loop":
            return redirect_html(LOOP_URLS[1 - ident]), "", 1
        if kind == "list":
            j = ident
            links, golden_links = [], []
            for i in range(j * FANOUT, min((j + 1) * FANOUT, n_docs)):
                path = "d" if _alias_kind(i) else "detail"
                durl = f"https://{_host_for(i, skew)}/{path}/{i}"
                if i % 13 == 3:
                    # tracking-param noise: extraction emits the RAW href
                    # (golden includes it); canonicalization collapses it
                    # back to durl at admission, so the detail is fetched
                    # exactly once under its canonical url
                    durl += f"?utm_source=feed&utm_campaign=c{j}"
                links.append(f'<a class="item" href="{durl}" title="title-{i:06d}">d{i}</a>')
                golden_links.append(durl)
            if j % 19 == 2:  # redirect-loop link fraction (fetch failure)
                links.append(f'<a class="item" href="{LOOP_URLS[0]}" title="loop-{j}">l</a>')
                golden_links.append(LOOP_URLS[0])
            if j % 11 == 0:  # robots-disallowed link fraction
                durl = f"https://{_host_for(j * 7, skew)}/private/{j}"
                links.append(f'<a class="item" href="{durl}" title="private-{j}">p</a>')
                golden_links.append(durl)
            html = "<html><body><ul>" + "".join(links) + "</ul></body></html>"
            golden = "" if (j % 37 == 0 or j % 41 == 0) else "\n".join(golden_links)
            return html, golden, j
        k = ident
        links, golden_links = [], []
        for j in range(k * FANOUT, min((k + 1) * FANOUT, n_lists)):
            lurl = f"https://{_host_for(j * 7, skew)}/list/{j}"
            links.append(f'<a href="{lurl}" class="tag">t{j}</a>')
            golden_links.append(lurl)
        html = "<html><body>" + "".join(links) + "</body></html>"
        # seeds are never ban/short: index chosen so neither fraction triggers
        return html, "\n".join(golden_links), k * 37 * 41 + 1

    descriptors.sort(key=lambda d: d[0])
    row_group_size = max(256, min(1024, len(descriptors) // 32))
    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    with pq.ParquetWriter(os.path.join(corpus.pages, "part-0.parquet"), out_schema) as writer:
        for start in range(0, len(descriptors), row_group_size):
            batch = descriptors[start : start + row_group_size]
            urls, htmls, texts, langs, tss = [], [], [], [], []
            for url, kind, ident, pidx in batch:
                html, golden, fi = render(kind, ident)
                if fi % 37 == 0:  # ban-page fraction
                    html = html.replace("<body>", f"<body>{BAN_STRING}")
                if fi % 41 != 0:  # short-page fraction stays < 6000 bytes
                    deficit = MIN_BODY_BYTES - len(html.encode())
                    if deficit > 0:
                        html += "<!--" + "x" * deficit + "-->"
                urls.append(url)
                htmls.append(html.encode())
                texts.append(golden)
                langs.append("zh" if fi % 3 == 0 else "en")
                bump = (
                    EPOCH_TS_BUMP_US * epoch
                    if epoch and kind == "detail" and _changed_in_epoch(ident)
                    else 0
                )
                tss.append(EPOCH_US + pidx + bump)
            writer.write_table(
                pa.table(
                    {
                        "url": pa.array(urls, pa.string()),
                        "warc_ts": pa.array(tss, pa.timestamp("us")),
                        "html": pa.array(htmls, pa.binary()),
                        "text": pa.array(texts, pa.string()),
                        "lang": pa.array(langs, pa.string()),
                    }
                ),
                row_group_size=row_group_size,
            )

    seeds = pa.table(
        {
            "url": pa.array(seed_urls, type=pa.string()),
            "priority": pa.array([1] * len(seed_urls), type=pa.int32()),
            "rule": pa.array(["tag"] * len(seed_urls), type=pa.string()),
            "depth": pa.array([0] * len(seed_urls), type=pa.int32()),
            "seq": pa.array(range(len(seed_urls)), type=pa.int64()),
        }
    )
    pq.write_table(seeds, corpus.seeds)

    # Budgets scale with corpus size (budget ≈ rate × window; a bigger corpus
    # models a longer virtual window) so the iteration count stays roughly
    # constant across sf while per-iteration work scales — politeness deferral
    # is still exercised because list pages emit children in bursts.
    default_budget = max(6, n_docs // budget_divisor)
    politeness = {
        "default": {"max_per_iter": default_budget, "disallow": ["/private"]},
        "hosts": {
            "host00.example.com": {
                "max_per_iter": default_budget * 4,
                "disallow": ["/private"],
            }
        },
        "max_depth": 5,
        "max_attempts": 2,  # initial try + one retry (engine/crawler.go:186-193)
    }
    with open(corpus.politeness, "w") as fh:
        json.dump(politeness, fh)

    # persist the fetch probe index (memory-mapped by every fetch worker)
    from crawler_ray.stages.fetch import build_fetch_index

    build_fetch_index(corpus.pages)

    with open(done_marker, "w") as fh:
        fh.write("ok")
    return corpus
