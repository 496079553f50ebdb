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
    """Actor-pool ``map_batches`` stage: stateful setup once per actor."""

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
        self.files: dict[str, pq.ParquetFile] = {}
        self.lru: OrderedDict[tuple[str, int], dict[str, tuple[bytes, int]]] = OrderedDict()
        self.lru_groups = lru_groups

    def _group_lookup(self, path: str, rg: int) -> dict[str, tuple[bytes, int]]:
        lru_key = (path, rg)
        hit = self.lru.get(lru_key)
        if hit is not None:
            self.lru.move_to_end(lru_key)
            return hit
        pf = self.files.get(path)
        if pf is None:
            pf = self.files[path] = pq.ParquetFile(path)
        tbl = pf.read_row_group(rg, columns=["url", "html", "warc_ts"])
        lookup = dict(
            zip(
                tbl.column("url").to_pylist(),
                zip(
                    tbl.column("html").to_pylist(),
                    tbl.column("warc_ts").cast(pa.int64()).to_pylist(),
                ),
            )
        )
        self.lru[lru_key] = lookup
        while len(self.lru) > self.lru_groups:
            self.lru.popitem(last=False)
        return lookup

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        urls = batch.column("url").to_pylist()
        htmls: list[bytes | None] = [None] * len(urls)
        tss: list[int | None] = [None] * len(urls)
        # vectorized membership probe: misses never touch row groups.
        # Probe urls longer than the index width truncate silently — a
        # truncated prefix can only false-positive into one group read,
        # where the exact .get() still reports the miss.
        width = self.url_index.dtype.itemsize
        probe = np.array([u.encode("utf-8")[:width] for u in urls], dtype=f"S{width}")
        pos = np.searchsorted(self.url_index, probe)
        pos_c = np.minimum(pos, len(self.url_index) - 1)
        exists = self.url_index[pos_c] == probe
        # row position → row group, vectorized
        gpos = np.searchsorted(self.offsets, pos_c, side="right")
        for i in np.flatnonzero(exists):
            path, rg = self.groups[int(gpos[i])]
            entry = self._group_lookup(path, rg).get(urls[i])
            if entry is not None:
                htmls[i], tss[i] = entry
        return batch.append_column(
            "html", pa.array(htmls, type=pa.binary())
        ).append_column("warc_ts", pa.array(tss, type=pa.int64()).cast(pa.timestamp("us")))


def build_fetch_index(pages_dir: str) -> None:
    """Persist the fetch probe index next to the corpus (idempotent)."""
    import json

    import numpy as np

    idx_dir = os.path.join(pages_dir, "_fetch_index")
    if os.path.exists(os.path.join(idx_dir, "_DONE")):
        return
    os.makedirs(idx_dir, exist_ok=True)
    f = SimulatedFetcher(pages_dir)  # cold build
    np.save(os.path.join(idx_dir, "urls.npy"), np.asarray(f.url_index))
    np.save(os.path.join(idx_dir, "offsets.npy"), f.offsets)
    with open(os.path.join(idx_dir, "groups.json"), "w") as fh:
        json.dump(f.groups, fh)
    with open(os.path.join(idx_dir, "_DONE"), "w") as fh:
        fh.write("ok")


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


def split_fetch_outcome(batch: pa.Table) -> pa.Table:
    """Tag rows with fetch outcome for downstream routing (vectorized):
    ``outcome`` ∈ {ok, missing, banned, short}.

    - missing → failure path (requeue once, unmark) — engine/crawler.go:99-104
    - banned  → failure path too (SetFailure)       — engine/crawler.go:106-111
    - short   → dropped, stays marked visited       — engine/crawler.go:113-120
    """
    from crawler_ray.sources.pages import BAN_STRING, MIN_BODY_BYTES

    html = batch.column("html")
    missing = pc.is_null(html)
    html_str = pc.cast(pc.fill_null(html, b""), pa.string())
    banned = pc.match_substring(html_str, BAN_STRING)
    short = pc.less(pc.binary_length(pc.fill_null(html, b"")), MIN_BODY_BYTES)
    outcome = pc.if_else(
        missing,
        pa.scalar("missing"),
        pc.if_else(banned, pa.scalar("banned"), pc.if_else(short, pa.scalar("short"), pa.scalar("ok"))),
    )
    return batch.append_column("outcome", outcome)
