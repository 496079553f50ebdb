"""Simulated fetch: frontier URL → (html, warc_ts) lookup against the pages
table.

The reference fetches live over HTTP per request (``collect/collect.go:33-91``)
with a test-injection path that substitutes a stored body
(``collect/request.go:25-26``, ``engine/crawler.go:95-97``). In this engine the
stored-body path is the *primary* fetch: pages live in Parquet
(``input_hint`` shape) and "fetching" a URL means probing that table.

Scale design — why this is an index probe, not a Dataset-join:
a crawl generation touches a small, unpredictable subset of a (100 TB) pages
corpus; re-shuffling the whole corpus per generation for a hash join would
move everything to fetch almost nothing. Instead the pages Parquet is laid
out **sorted by url** (a one-time layout cost, done by the corpus generator),
so each fetch actor only keeps the per-row-group ``[url_min, url_max]``
ranges from Parquet footers — O(#row-groups) memory, ~KB per GB of corpus —
and reads just the row groups its batch needs, with a small LRU over
decompressed groups. That is exactly how a WARC-backed refetch store works,
and it's embarrassingly parallel: any number of actors, no shuffle. (A
``Dataset.join`` fetch would be the right call if most of the corpus were
touched per generation; ``pipelines/relational.py`` exercises real joins.)

Fetch outcome semantics (``engine/crawler.go:95-120``):
- URL absent from the pages table → fetch failure (html = null) → the driver
  unmarks the seen-set entry and requeues once;
- present → html + warc_ts attached (charset transcode F3 is a no-op here:
  the corpus is UTF-8 by construction, as post-transcode bodies are).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Protocol, runtime_checkable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


@runtime_checkable
class Fetcher(Protocol):
    """The fetch extension surface — the batch equivalent of the reference's
    ``Fetcher`` interface (``collect/collect.go:26-28``: ``Get(*Request)
    ([]byte, error)``).

    An implementation is a callable batch stage: it receives a frontier
    batch with a ``url`` column and returns the batch with ``html``
    (binary, null = fetch failure) and ``warc_ts`` (timestamp) appended.
    Stateful setup (session pools, probe indexes, model loads) belongs in
    ``__init__`` — instances run inside ``map_batches`` actor pools or
    per-worker caches. ``SimulatedFetcher`` (Parquet probe) is the shipped
    implementation; a live-HTTP ``BrowserFetch`` equivalent would plug in
    here unchanged.
    """

    def __call__(self, batch: pa.Table) -> pa.Table: ...  # pragma: no cover


class SimulatedFetcher:
    """Actor-pool ``map_batches`` stage: stateful setup once per actor.

    ``deterministic = True`` declares that fetching the same url always
    yields the same bytes (the corpus is immutable) — the fused crawl stage
    uses this to resolve retry rows from the membership probe alone (a url
    that failed as *banned* is still present and still banned; one that
    failed as *missing* is still absent), skipping the row-group decompress
    a retry would otherwise repeat. A live fetcher must leave this False:
    its retries exist precisely because the outcome may change.
    """

    deterministic = True

    def __init__(self, pages_dir: str, lru_groups: int = 64):
        import json

        import numpy as np

        # Fast path: a persisted index (written by build_fetch_index, e.g.
        # at corpus-generation time) is memory-mapped — microseconds to
        # attach, one physical copy in page cache shared by every worker on
        # the node, and immune to Ray's idle-worker recycling between
        # generations (a cold rebuild costs seconds per fresh worker).
        idx_dir = os.path.join(pages_dir, "_fetch_index")
        if os.path.exists(os.path.join(idx_dir, "_DONE")):
            self.url_index = np.load(os.path.join(idx_dir, "urls.npy"), mmap_mode="r")
            self.offsets = np.load(os.path.join(idx_dir, "offsets.npy"))
            with open(os.path.join(idx_dir, "groups.json")) as fh:
                self.groups = [tuple(g) for g in json.load(fh)]
            # redirect resolution map (build_fetch_index): corpus position of
            # each redirect page → final resolved position, -1 = chain fails
            # (dead target or hop-cap/loop). Absent files (pre-redirect
            # indexes) degrade to "no redirects".
            rf = os.path.join(idx_dir, "redirect_from.npy")
            if os.path.exists(rf):
                self.r_from = np.load(rf)
                self.r_to = np.load(os.path.join(idx_dir, "redirect_to.npy"))
            else:
                self.r_from = np.empty(0, np.int64)
                self.r_to = np.empty(0, np.int64)
            self.files = {}
            self.lru = OrderedDict()
            self.lru_groups = lru_groups
            return

        # Build the probe index once per worker (__init__, not per batch):
        # the url column read in file order (the layout is globally
        # url-sorted — sources/pages.py) doubles as both the membership
        # index (a sorted fixed-width byte array, ~90 MB per million urls;
        # absent urls — fetch failures, the hot path on retry generations —
        # are rejected with one vectorized searchsorted instead of
        # decompressing a row group to prove absence) and the row-group
        # boundary index (position // offsets ⇒ (file, group) — no
        # per-group Parquet statistics calls, which cost seconds per
        # worker at ~1000 groups). At 10^10 urls this becomes a
        # per-row-group bloom + footer stats.
        groups: list[tuple[str, int]] = []  # (path, row_group), file order
        offsets = [0]  # cumulative first-row position per group
        url_parts = []
        for name in sorted(os.listdir(pages_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(pages_dir, name)
            md = pq.read_metadata(path)
            for rg in range(md.num_row_groups):
                groups.append((path, rg))
                offsets.append(offsets[-1] + md.row_group(rg).num_rows)
            url_parts.append(
                pq.read_table(path, columns=["url"]).column("url").to_numpy(zero_copy_only=False)
            )
        self.groups = groups
        self.offsets = np.array(offsets[1:], dtype=np.int64)  # end position per group
        # UTF-8 bytes, not str→S (which would ascii-encode and reject IRIs);
        # width = longest url in the corpus, so no truncation on the build
        # side and numpy's null-padded S comparison equals the byte order
        # Parquet sorted by (urls contain no NUL)
        byte_urls = [u.encode("utf-8") for part in url_parts for u in part]
        width = max((len(b) for b in byte_urls), default=1)
        all_urls = np.array(byte_urls, dtype=f"S{width}")
        if len(all_urls) > 1 and not (all_urls[:-1] <= all_urls[1:]).all():
            raise ValueError(f"pages layout under {pages_dir} is not url-sorted")
        self.url_index = all_urls
        # cold builds read only the url column; redirect resolution needs a
        # body scan, which build_fetch_index does once at corpus-layout time
        # (the persisted index is the redirect-aware path — synth_corpus
        # always writes it). A cold fetcher serves redirect bodies raw.
        self.r_from = np.empty(0, np.int64)
        self.r_to = np.empty(0, np.int64)
        self.files: dict[str, pq.ParquetFile] = {}
        self.lru: OrderedDict[int, tuple[pa.Array, pa.Array]] = OrderedDict()
        self.lru_groups = lru_groups

    def _group_arrays(self, g: int) -> tuple[pa.Array, pa.Array]:
        """(html, warc_ts-as-int64) Arrow arrays for global row-group ``g``.
        No url column read, no Python objects: the global index slice IS the
        group's url order, so callers address rows by position directly."""
        hit = self.lru.get(g)
        if hit is not None:
            self.lru.move_to_end(g)
            return hit
        path, rg = self.groups[g]
        pf = self.files.get(path)
        if pf is None:
            pf = self.files[path] = pq.ParquetFile(path)
        tbl = pf.read_row_group(rg, columns=["html", "warc_ts"])
        arrays = (
            tbl.column("html").combine_chunks(),
            tbl.column("warc_ts").cast(pa.int64()).combine_chunks(),
        )
        self.lru[g] = arrays
        while len(self.lru) > self.lru_groups:
            self.lru.popitem(last=False)
        return arrays

    def timestamps_at(self, pos: "np.ndarray") -> "np.ndarray":
        """int64 µs warc_ts at corpus positions — reads ONLY each touched
        row group's warc_ts column chunk (no html decompress; ~8 B/row
        cached per worker), so the deterministic retry fast path can emit
        order rows byte-identical to a real refetch."""
        import numpy as np

        cache = getattr(self, "_ts_groups", None)
        if cache is None:
            # LRU with the same bound as the html cache: workers persist
            # across generations, and an uncapped dict would pin every
            # touched group's ts column forever (8 B/row × corpus)
            cache = self._ts_groups = OrderedDict()
        out = np.empty(len(pos), np.int64)
        gpos = np.searchsorted(self.offsets, pos, side="right")
        for g in np.unique(gpos):
            gi = int(g)
            ts = cache.get(gi)
            if ts is not None:
                cache.move_to_end(gi)
            else:
                path, rg = self.groups[gi]
                pf = self.files.get(path)
                if pf is None:
                    pf = self.files[path] = pq.ParquetFile(path)
                ts = cache[gi] = (
                    pf.read_row_group(rg, columns=["warc_ts"])
                    .column("warc_ts")
                    .cast(pa.int64())
                    .to_numpy()
                )
                while len(cache) > self.lru_groups:
                    cache.popitem(last=False)
            sel = gpos == g
            g_start = int(self.offsets[gi - 1]) if gi > 0 else 0
            out[sel] = ts[pos[sel] - g_start]
        return out

    def membership(self, batch: pa.Table):
        """Vectorized membership probe: (exists mask, clamped corpus
        positions). Misses never touch row groups; the global searchsorted
        position of a hit is its exact corpus row (the layout is globally
        url-sorted), so pos - group_start addresses the group's html/ts
        arrays directly — no per-row Python anywhere."""
        import numpy as np

        if len(self.url_index) == 0:  # empty corpus: every probe misses
            n = batch.num_rows
            return np.zeros(n, bool), np.zeros(n, np.int64)
        width = self.url_index.dtype.itemsize
        url_bin = pc.cast(batch.column("url").combine_chunks(), pa.binary())
        url_np = url_bin.to_numpy(zero_copy_only=False)
        probe = url_np.astype(f"S{width}")  # > width truncates; rejected below
        lens = pc.binary_length(url_bin).to_numpy()
        pos = np.searchsorted(self.url_index, probe)
        pos_c = np.minimum(pos, len(self.url_index) - 1)
        # lens <= width ⇒ probe is exact (NUL-padded), so equality is exact
        # membership; a longer url can never be in a width-wide index.
        exists = (self.url_index[pos_c] == probe) & (lens <= width)
        if len(self.r_from):
            # redirect remap (precomputed at index build): a hit on a
            # redirect page resolves to its chain's FINAL position — the
            # body take below then serves the target's html/warc_ts, i.e.
            # redirect-following — or to a miss when the chain dies/loops.
            # One extra searchsorted over a tiny sorted array; zero cost for
            # corpora without redirects.
            ri = np.minimum(np.searchsorted(self.r_from, pos_c), len(self.r_from) - 1)
            is_r = exists & (self.r_from[ri] == pos_c)
            to = self.r_to[ri]
            exists = exists & ~(is_r & (to < 0))
            pos_c = np.where(is_r & (to >= 0), to, pos_c)
        return exists, pos_c

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        exists, pos_c = self.membership(batch)
        hit_idx = np.flatnonzero(exists)
        if hit_idx.size == 0:
            return batch.append_column(
                "html", pa.nulls(n, pa.binary())
            ).append_column("warc_ts", pa.nulls(n, pa.timestamp("us")))
        # group hits by row group; one Arrow take per touched group
        gpos = np.searchsorted(self.offsets, pos_c[hit_idx], side="right")
        order = np.argsort(gpos, kind="stable")
        hit_sorted = hit_idx[order]
        g_sorted = gpos[order]
        bounds = np.flatnonzero(np.r_[True, g_sorted[1:] != g_sorted[:-1]])
        sel = np.full(n, -1, dtype=np.int64)
        html_parts: list[pa.Array] = []
        ts_parts: list[pa.Array] = []
        base = 0
        for bi, lo in enumerate(bounds):
            hi = bounds[bi + 1] if bi + 1 < len(bounds) else len(g_sorted)
            g = int(g_sorted[lo])
            rows = hit_sorted[lo:hi]
            g_start = int(self.offsets[g - 1]) if g > 0 else 0
            local = pa.array(pos_c[rows] - g_start)
            html_g, ts_g = self._group_arrays(g)
            html_parts.append(html_g.take(local))
            ts_parts.append(ts_g.take(local))
            sel[rows] = base + np.arange(rows.size)
            base += rows.size
        # scatter hits back into batch order; null index → null output
        idx = pa.array(np.maximum(sel, 0), mask=sel < 0)
        htmls = pc.take(pa.concat_arrays(html_parts), idx)
        tss = pc.take(pa.concat_arrays(ts_parts), idx)
        return batch.append_column("html", htmls).append_column(
            "warc_ts", tss.cast(pa.timestamp("us"))
        )


class HttpFetcher:
    """Live-HTTP ``Fetcher`` — the reference's ``BrowserFetch`` semantics
    (``collect/collect.go:56-91``): per-request timeout, optional proxy,
    per-task ``Cookie`` header, seeded random User-Agent, status check
    (non-200 → fetch failure), charset sniff + transcode to UTF-8.

    A stateful batch stage: openers and the thread pool are built once per
    actor (``__init__``); per batch the urls fetch concurrently (network
    I/O — threads, not CPU), and bodies land as UTF-8 bytes so every
    downstream stage (ban match, extract) sees exactly what the simulated
    Parquet probe serves. ``warc_ts`` is the response's ``Last-Modified``
    (falling back to ``Date``) header — the live analogue of the WARC
    capture timestamp — or null when absent/unparseable.

    ``url_rewrite`` maps the logical url to a transport url (local test
    server, mirror, cache); headers and outcome semantics always follow the
    LOGICAL url, so rewritten fetches stay byte-identical to direct ones.
    Proxies rotate round-robin by batch row index (deterministic twin of
    the reference's atomic counter, ``proxy/proxy.go:12-42``).
    """

    def __init__(
        self,
        session=None,
        *,
        url_rewrite=None,
        max_parallel: int = 16,
    ):
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from crawler_ray.functions.web import FetchSession

        self.session = session or FetchSession()
        self.url_rewrite = url_rewrite
        if self.session.proxies:
            self.openers = [
                urllib.request.build_opener(
                    urllib.request.ProxyHandler({"http": p, "https": p})
                )
                for p in self.session.proxies
            ]
        else:
            self.openers = [urllib.request.build_opener()]
        self.pool = ThreadPoolExecutor(max_workers=max_parallel)

    def _fetch_one(self, url: str, row_index: int) -> tuple[bytes | None, int | None]:
        import urllib.error
        import urllib.request
        from email.utils import parsedate_to_datetime

        from crawler_ray.functions.web import transcode_utf8, user_agent_for

        headers = {}
        if self.session.random_ua:
            headers["User-Agent"] = user_agent_for(url, self.session.ua_seed)
        if self.session.cookie:
            headers["Cookie"] = self.session.cookie
        target = self.url_rewrite(url) if self.url_rewrite else url
        opener = self.openers[row_index % len(self.openers)]
        try:
            req = urllib.request.Request(target, headers=headers)
            with opener.open(req, timeout=self.session.timeout_s) as resp:
                if resp.status != 200:  # collect.go:44-47 / 82-85
                    return None, None
                raw = resp.read()
                stamp = resp.headers.get("Last-Modified") or resp.headers.get("Date")
        except (urllib.error.URLError, OSError, TimeoutError):
            return None, None
        ts: int | None = None
        if stamp:
            try:
                ts = int(parsedate_to_datetime(stamp).timestamp() * 1_000_000)
            except (ValueError, TypeError):
                ts = None
        # F3: sniff + transcode, so downstream always sees UTF-8 bytes
        return transcode_utf8(raw).encode("utf-8"), ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        results = list(self.pool.map(self._fetch_one, urls, range(len(urls))))
        htmls = pa.array([h for h, _ in results], type=pa.binary())
        tss = pa.array([t for _, t in results], type=pa.int64())
        return batch.append_column("html", htmls).append_column(
            "warc_ts", tss.cast(pa.timestamp("us"))
        )


def build_fetch_index(pages_dir: str) -> None:
    """Persist the fetch probe index next to the corpus (idempotent)."""
    import json

    import numpy as np

    idx_dir = os.path.join(pages_dir, "_fetch_index")
    if os.path.exists(os.path.join(idx_dir, "_DONE")):
        return
    os.makedirs(idx_dir, exist_ok=True)
    f = SimulatedFetcher(pages_dir)  # cold build
    r_from, r_to = _resolve_redirects(f)
    np.save(os.path.join(idx_dir, "urls.npy"), np.asarray(f.url_index))
    np.save(os.path.join(idx_dir, "offsets.npy"), f.offsets)
    np.save(os.path.join(idx_dir, "redirect_from.npy"), r_from)
    np.save(os.path.join(idx_dir, "redirect_to.npy"), r_to)
    with open(os.path.join(idx_dir, "groups.json"), "w") as fh:
        json.dump(f.groups, fh)
    with open(os.path.join(idx_dir, "_DONE"), "w") as fh:
        fh.write("ok")


def _resolve_redirects(f: "SimulatedFetcher"):
    """Scan the corpus once for meta-refresh redirect pages and resolve each
    chain to its final corpus position (−1 when the chain leaves the corpus
    or exceeds ``MAX_REDIRECTS`` hops — incl. loops). Part of the one-time
    layout cost: fetch workers then follow redirects with a pure position
    remap, never parsing bodies. Returns (sorted positions, final positions)
    as int64 arrays."""
    import re

    import numpy as np

    from crawler_ray.sources.pages import MAX_REDIRECTS, REDIRECT_PREFIX

    target_re = re.compile(re.escape(REDIRECT_PREFIX.encode()) + b'([^"]*)"')
    width = f.url_index.dtype.itemsize

    def pos_of(url_b: bytes) -> int:
        if len(url_b) > width:
            return -1
        probe = np.array([url_b], dtype=f"S{width}")
        p = int(np.searchsorted(f.url_index, probe[0]))
        if p < len(f.url_index) and f.url_index[p] == probe[0]:
            return p
        return -1

    target_of: dict[int, int] = {}
    base = 0
    for path, rg in f.groups:
        pf = f.files.get(path) or pq.ParquetFile(path)
        f.files[path] = pf
        html = pf.read_row_group(rg, columns=["html"]).column("html")
        starts = pc.starts_with(html, pattern=REDIRECT_PREFIX)
        for local in np.flatnonzero(np.asarray(starts)):
            m = target_re.match(html[int(local)].as_py())
            target_of[base + int(local)] = pos_of(m.group(1)) if m else -1
        base += len(html)

    def final_of(p: int) -> int:
        cur, hops = p, 0
        while True:
            nxt = target_of.get(cur)
            if nxt is None:
                return cur  # terminal body
            hops += 1
            if hops > MAX_REDIRECTS or nxt < 0:
                return -1
            cur = nxt

    r_from = np.array(sorted(target_of), dtype=np.int64)
    r_to = np.array([final_of(p) for p in r_from], dtype=np.int64)
    return r_from, r_to


_FETCHER_CACHE: dict[str, "SimulatedFetcher"] = {}


def make_fetch_fn(pages_dir: str):
    """Task-fn variant for the *iterative* driver: Ray Data actor pools are
    per-execution, so a per-generation ``map_batches(SimulatedFetcher, ...)``
    would rebuild the index every iteration. Ray worker *processes* persist
    across executions, so a module-level cache gives the same
    setup-once-per-worker property with zero per-iteration spin-up. The
    class form stays the right choice for one-shot pipelines."""

    def fn(batch: pa.Table) -> pa.Table:
        f = _FETCHER_CACHE.get(pages_dir)
        if f is None:
            f = _FETCHER_CACHE[pages_dir] = SimulatedFetcher(pages_dir)
        return f(batch)

    return fn


