"""Iterative crawl driver: BFS generations as streaming Dataset pipelines.

Each generation runs one pipeline (SURVEY.md §3.1 "Ray translation"):

    read frontier → canonicalize+depth gate → robots filter
      → seen pre-filter (contains, no insert — the reference checks Visited
        *before* the rate limiter, engine/crawler.go:85-90, so already-seen
        rows must not consume politeness budget)
      → groupby(host) admission shuffle (within-iteration dedup + budget)
      → [admitted] mark-before-fetch (check_and_add) → simulated fetch
        (actor pool) → outcome split → extract (actor pool)
      → route: items sink ∪ golden-text sink ∪ next frontier
        (deferred ∪ retries ∪ children)

State: the SeenSet actor pool (sharded cuckoo/exact). Everything else flows
through the object store as Arrow blocks; per-iteration materializations are
of the *frontier-sized* stream only — the pages corpus is never globally
read or shuffled.

Checkpointing (the reference has none — engine/crawler.go:14-22): after
iteration *i*, ``iter_{i}/`` holds the next frontier (Parquet), seen-shard
dumps (npz), items/order/text outputs and a ``manifest.json`` with counts +
input signature; ``complete`` is written last, so resume = scan for the
newest complete manifest, restore shards, continue from its frontier. A
killed run never refetches checkpointed generations.

Failure semantics (engine/crawler.go:95-120,179-194): missing page or banned
body → unmark seen + requeue with attempt+1 (max_attempts total tries);
short body → dropped but stays visited.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from crawler_ray.rules import SYNTH_TASK, TaskSpec
from crawler_ray.sources.pages import Corpus
from crawler_ray.stages.extract import (
    canonicalize_fn,
    items_to_columns,
    make_fetch_extract_fn,
)
from crawler_ray.stages.politeness import (
    PolitenessConfig,
    admit_partition_fn,
    apply_backoff_updates,
    host_partition_of,
    robots_config,
    robots_filter_fn,
)
from crawler_ray.stages.seen import SeenSet, seen_filter_fn

# full seen-set compaction cadence; iterations in between checkpoint deltas
SEEN_COMPACT_EVERY = 8

# sitemap <loc> extraction (sitemaps are machine-generated; a regex parse
# is the standard fast path and matches the oracle byte-for-byte)
_LOC_RE = re.compile(r"<loc>(.*?)</loc>")

FRONTIER_COLS = ["url", "host", "key", "h64", "depth", "priority", "seq", "attempt", "task", "rule", "carry"]
_FRONTIER_TYPES = {
    "url": pa.string(),
    "host": pa.string(),
    "key": pa.string(),
    "h64": pa.uint64(),
    "depth": pa.int32(),
    "priority": pa.int32(),
    "seq": pa.binary(),
    "attempt": pa.int32(),
    "task": pa.string(),
    "rule": pa.string(),
    "carry": pa.string(),
}
FRONTIER_SCHEMA = pa.schema([(c, _FRONTIER_TYPES[c]) for c in FRONTIER_COLS])


def _cast_frontier(batch: pa.Table) -> pa.Table:
    """Normalize any branch (pandas round-trips widen ints) to the canonical
    frontier schema so unions line up."""
    arrays = [batch.column(c).cast(_FRONTIER_TYPES[c]) for c in FRONTIER_COLS]
    return pa.Table.from_arrays(arrays, schema=FRONTIER_SCHEMA)


def _keep(col: str, value) -> "callable":
    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(col), value))

    return fn


def _route(col: str, value) -> "callable":
    """Fused filter + canonical-schema cast for a frontier branch."""

    def fn(t: pa.Table) -> pa.Table:
        return _cast_frontier(t.filter(pc.equal(t.column(col), value)))

    return fn


def seed_frontier_table(seeds_path: str, default_task: str = "") -> pa.Table:
    """Seeds Parquet → generation-0 frontier. An optional ``task`` column
    assigns each seed to a task (the multi-task surface,
    ``engine/crawler.go:48-75`` seeds every configured task into the shared
    queue); rows without one belong to ``default_task`` (the primary)."""
    seeds = pq.read_table(seeds_path)
    n = seeds.num_rows
    seq = pa.array(
        [int(s).to_bytes(4, "big") for s in seeds.column("seq").to_pylist()],
        type=pa.binary(),
    )
    if "task" in seeds.column_names:
        task_col = pc.fill_null(seeds.column("task").cast(pa.string()), default_task)
    else:
        task_col = pa.array([default_task] * n, pa.string())
    return pa.Table.from_arrays(
        [
            seeds.column("url").cast(pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([0] * n, pa.uint64()),
            seeds.column("depth").cast(pa.int32()),
            seeds.column("priority").cast(pa.int32()),
            seq,
            pa.array([0] * n, pa.int32()),
            task_col,
            seeds.column("rule").cast(pa.string()),
            pa.array(["{}"] * n, pa.string()),
        ],
        schema=FRONTIER_SCHEMA,
    )


@dataclass
class CrawlResult:
    out_dir: str
    iterations: int
    stats: list[dict] = field(default_factory=list)

    def _gather(self, sub: str) -> list[str]:
        """Parquet files under iter_*/<sub>/ (files, not dirs — Ray's parquet
        reader wants concrete paths when given a list). ``sub`` may contain
        glob patterns (the multi-task items layout)."""
        import glob as _glob

        return sorted(
            _glob.glob(os.path.join(self.out_dir, "iter_*", sub, "*.parquet"))
        )

    def items_dataset(self, rule: str, task: str | None = None) -> "ray.data.Dataset | None":
        """Items for one rule. Single-task runs write ``items/rule=<r>``;
        multi-task runs write ``items/task=<t>/rule=<r>`` (rule names may
        collide across tasks). ``task=None`` gathers the rule across both
        layouts; pass a task name to select one task's output."""
        paths = self._gather(os.path.join("items", f"rule={rule}")) if task is None else []
        paths += self._gather(
            os.path.join("items", f"task={task or '*'}", f"rule={rule}")
        )
        return ray.data.read_parquet(paths) if paths else None

    def order_dataset(self) -> "ray.data.Dataset | None":
        paths = self._gather("order")
        return ray.data.read_parquet(paths) if paths else None

    def text_dataset(self) -> "ray.data.Dataset | None":
        paths = self._gather("text")
        return ray.data.read_parquet(paths) if paths else None


def _parquet_rows(path: str) -> int:
    """Row count from Parquet footers (no re-execution)."""
    if not os.path.isdir(path):
        return 0
    return sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _iter_host_stats(
    ckdir: str, with_outcomes: bool
) -> tuple[dict[str, int], set, set]:
    """ONE pass over a generation's order parquet: per-host scheduled
    counts (attempted fetches = admissions — the limiter consumes a token
    whether or not the fetch succeeds) plus, when ``with_outcomes``, the
    (scheduled hosts, hosts that served ≥1 ban page) backoff signal.
    Combined so a run with both the sustained window AND ban_backoff on
    reads and host-hashes each order file once, not twice."""
    from crawler_ray.functions.url import host_of

    odir = os.path.join(ckdir, "order")
    counts: dict[str, int] = {}
    sched: set[str] = set()
    banned: set[str] = set()
    if not os.path.isdir(odir):
        return counts, sched, banned
    cols = ["url", "outcome"] if with_outcomes else ["url"]
    for f in os.listdir(odir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(odir, f), columns=cols)
        hosts = np.asarray(host_of(t.column("url").combine_chunks()))
        uh, n = np.unique(hosts, return_counts=True)
        for h, c in zip(uh, n):
            counts[str(h)] = counts.get(str(h), 0) + int(c)
        if with_outcomes:
            sched.update(map(str, uh))
            bmask = np.asarray(pc.equal(t.column("outcome"), "banned").combine_chunks())
            if bmask.any():
                banned.update(map(str, np.unique(hosts[bmask])))
    return counts, sched, banned


def _iter_host_counts(ckdir: str) -> dict[str, int]:
    return _iter_host_stats(ckdir, with_outcomes=False)[0]


def _latest_complete_iter(out_dir: str) -> int | None:
    best = None
    if not os.path.isdir(out_dir):
        return None
    for d in os.listdir(out_dir):
        if not d.startswith("iter_"):
            continue
        mpath = os.path.join(out_dir, d, "manifest.json")
        if os.path.exists(mpath):
            try:
                with open(mpath) as fh:
                    m = json.load(fh)
            except (json.JSONDecodeError, OSError):
                # truncated manifest from a crash mid-write (pre-atomic-rename
                # checkpoints); fall back to the previous complete iteration
                continue
            if m.get("complete"):
                i = int(m["iteration"])
                best = i if best is None or i > best else best
    return best


def _read_manifest(out_dir: str, it: int) -> dict:
    with open(os.path.join(out_dir, f"iter_{it:04d}", "manifest.json")) as fh:
        return json.load(fh)


def _host_scheme_partial(t: pa.Table) -> pa.Table:
    """Per-block distinct (host, scheme) pairs — the robots warm set is
    host-cardinality-bounded, never row-bounded. ALL distinct pairs are
    emitted (not a per-block first occurrence) so the driver's min-scheme
    pick is block-layout-independent — the oracle reproduces it exactly."""
    if t.num_rows == 0:
        # np.char.partition of an empty array loses its column axis and
        # the [:, 1] below IndexErrors — a depth-capped last generation
        # can legitimately canonicalize every row away
        return pa.table(
            {"host": pa.array([], pa.string()), "scheme": pa.array([], pa.string())}
        )
    hosts = t["host"].to_numpy(zero_copy_only=False).astype(str)
    urls = t["url"].to_numpy(zero_copy_only=False).astype(str)
    part = np.char.partition(urls, "://")
    schemes = np.where(np.char.not_equal(part[:, 1], ""), part[:, 0], "https")
    # "\t" cannot occur in a host or scheme (numpy str arrays also cannot
    # hold NUL, which silently truncates)
    pairs = np.unique(np.char.add(np.char.add(hosts, "\t"), schemes))
    split = np.char.partition(pairs, "\t")
    return pa.table(
        {
            "host": pa.array(split[:, 0], pa.string()),
            "scheme": pa.array(split[:, 2], pa.string()),
        }
    )


def _fetch_control_bodies(
    pages_dir: str, new, fetcher_factory, fetcher_key: str, path: str = "/robots.txt"
) -> dict[str, str]:
    """Fetch ``<scheme>://<host><path>`` (robots.txt / sitemap.xml) for the
    given (host, scheme) rows through the SAME Fetcher path page fetches use
    (Parquet probe or a live HttpFetcher). Control-plane: no order rows, no
    seen marks. Returns host → body for hits only; misses mean 'absent'
    (allow-all for robots, no extra seeds for sitemaps)."""
    from crawler_ray.stages.fetch import make_fetch_fn

    urls = [f"{s}://{h}{path}" for h, s in zip(new["host"], new["scheme"])]
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "robots_host": pa.array(list(new["host"]), pa.string()),
        }
    )
    if fetcher_factory is None:
        fn = make_fetch_fn(pages_dir)
    else:
        # worker-level cache keyed by fetcher_key (the same persistence
        # trick as make_fetch_fn): a per-call closure cache built a fresh
        # live fetcher — thread pool, openers — every generation that
        # warmed new hosts, and never shut the old ones down
        def fn(batch: pa.Table, _key=f"control:{fetcher_key}", _ff=fetcher_factory) -> pa.Table:
            from crawler_ray.stages.fetch import _FETCHER_CACHE

            f = _FETCHER_CACHE.get(_key)
            if f is None:
                f = _FETCHER_CACHE[_key] = _ff()
            return f(batch)

    fetched = (
        ray.data.from_arrow(tbl).map_batches(fn, batch_format="pyarrow").to_pandas()
    )
    out: dict[str, str] = {}
    for h, body in zip(fetched["robots_host"], fetched["html"]):
        if body is not None:
            out[h] = bytes(body).decode("utf-8", errors="replace")
    return out


def run_crawl(
    corpus: Corpus,
    task: "TaskSpec | list[TaskSpec] | tuple[TaskSpec, ...]" = SYNTH_TASK,
    out_dir: str = "/tmp/crawler_ray_out",
    *,
    num_seen_shards: int = 4,
    seen_capacity: int | None = None,
    exact_seen: bool = True,
    seen_mode: str = "cuckoo",
    max_iterations: int = 64,
    fetch_concurrency: int | tuple = (1, 4),
    extract_concurrency: int | tuple = (1, 4),
    batch_size: int = 4096,
    resume: bool = False,
    fetcher_factory=None,
    fetcher_key: str = "simulated",
    robots_from_corpus: bool = False,
    sitemaps_from_corpus: bool = False,
    sitemap_rule: str = "detail",
    sitemap_depth: int = 1,
    sitemap_priority: int = 0,
    sitemap_task: str | None = None,
    robots_agent: str = "*",
    robots_window_s: float = 60.0,
    ban_backoff: bool = False,
    frontier_override: pa.Table | None = None,
    frontier_parquet: str | None = None,
    ledger_dir: str | None = None,
) -> CrawlResult:
    import dataclasses

    from crawler_ray.stages.extract import normalize_tasks

    # multi-task engine (engine/crawler.go:48-75 seeds every configured
    # task into ONE shared queue): all tasks share the frontier, seen set
    # and politeness state — a host crawled by two tasks spends one budget.
    # Per-task options (max_depth, reload, rules) apply per row via the
    # frontier's ``task`` column.
    task_list = normalize_tasks(task)
    tasks = {t.name: t for t in task_list}
    primary = task_list[0]
    if sitemap_task is None:
        sitemap_task = primary.name

    cfg = PolitenessConfig.from_json(corpus.politeness)
    depth_limits = {n: min(cfg.max_depth, t.max_depth) for n, t in tasks.items()}
    cfg = dataclasses.replace(cfg, max_depth=max(depth_limits.values()))
    # ALWAYS the per-task dict: the dict path is also the unknown-task drop
    # (missing-Trunk semantics the oracle enforces) — a scalar fast path
    # would let rows naming an unknown task (typo'd seed table, checkpoint
    # from a multi-task run resumed with fewer tasks) through to fetch.
    # Cost is one index_in+take per batch against an |tasks|-sized set.
    canon_depth: "int | dict" = depth_limits
    reload_tasks = frozenset(n for n, t in tasks.items() if t.reload)
    all_reload = len(reload_tasks) == len(tasks)
    seen_skip = reload_tasks if (reload_tasks and not all_reload) else None
    # trailing-window ledger for the composed sustained budget: host →
    # admissions per past iteration, kept only for the last (window-1)
    # generations. Rebuilt from the checkpointed order parquet on resume —
    # size is O(admissions per window), not O(hosts).
    track_window = (
        cfg.sustained_budget is not None or bool(cfg.host_sustained)
    ) and cfg.sustained_window > 1

    start_iter = 0
    frontier_tbl: pa.Table | None = None
    frontier_path: str | None = None
    last: int | None = None
    if resume:
        last = _latest_complete_iter(out_dir)
        if last is not None:
            m = _read_manifest(out_dir, last)
            # a checkpoint from a DIFFERENT corpus must fail loudly — seen
            # shards and frontier from corpus A silently corrupt a crawl of
            # corpus B (same validation contract as the pagerank checkpoint)
            sig = f"{corpus.root}:{corpus.n_docs}"
            got_sig = m.get("input_sig")
            if got_sig is not None and got_sig != sig:
                raise ValueError(
                    f"resume checkpoint in {out_dir!r} was written for input "
                    f"{got_sig!r}, not {sig!r} — refusing to mix corpora"
                )
            # shard layout must match the checkpoint: h64 % num_shards routing
            # and the shard_*.npz contents were written with the recorded
            # count — resuming under a different one silently corrupts the
            # seen set, so the manifest wins over the argument
            num_seen_shards = int(m.get("num_seen_shards", num_seen_shards))
            seen_mode = m.get("seen_mode", seen_mode)
            exact_seen = bool(m.get("exact_seen", exact_seen))
            frontier_path = os.path.join(out_dir, f"iter_{last:04d}", "next_frontier")
            start_iter = last + 1
    if frontier_path is None:
        if frontier_parquet is not None:
            # generation-0 frontier streamed from sharded Parquet (the
            # recrawl path): consumed exactly like a checkpointed
            # next_frontier, never a driver table
            frontier_path = frontier_parquet
        else:
            frontier_tbl = (
                frontier_override
                if frontier_override is not None
                else seed_frontier_table(corpus.seeds, default_task=primary.name)
            )
            if "task" not in frontier_tbl.column_names:
                # pre-multi-task override tables: all rows → primary task
                frontier_tbl = frontier_tbl.append_column(
                    "task",
                    pa.array([primary.name] * frontier_tbl.num_rows, pa.string()),
                )

    if seen_capacity is None:
        # size shards to ~4× the page count (cuckoo wants ≤95% load); at
        # 10^10 URLs this is the knob that picks the shard count instead
        seen_capacity = max(1 << 14, (corpus.n_docs * 8) // num_seen_shards)
    seen = SeenSet(
        num_shards=num_seen_shards,
        capacity_per_shard=seen_capacity,
        mode=seen_mode,
        exact=exact_seen,
    )
    if resume and last is not None:
        # restore = newest full dump at j ≤ last, then replay the per-
        # generation deltas (j, last] in order (checkpoints are incremental —
        # O(new keys) per generation — with a full compaction every
        # SEEN_COMPACT_EVERY iterations)
        j = last
        while j > 0 and _read_manifest(out_dir, j).get("seen_kind", "full") != "full":
            j -= 1
        ck = os.path.join(out_dir, f"iter_{j:04d}")
        states = []
        for s in range(num_seen_shards):
            with np.load(os.path.join(ck, "seen", f"shard_{s}.npz"), allow_pickle=True) as z:
                states.append(json.loads(str(z["meta"])) | {k: z[k] for k in z.files if k != "meta"})
        seen.restore([_unpack_shard_state(st) for st in states])
        for i in range(j + 1, last + 1):
            seendir = os.path.join(out_dir, f"iter_{i:04d}", "seen")
            deltas = []
            for s in range(num_seen_shards):
                with np.load(os.path.join(seendir, f"delta_{s}.npz")) as z:
                    deltas.append({"added": z["added"], "removed": z["removed"]})
            seen.apply_delta(deltas)

    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        # a FRESH run into a reused out_dir must not inherit generations a
        # previous (longer) run left behind: CrawlResult globs iter_*/, so
        # stale dirs would merge into items/order/text and a later resume
        # would continue the OLD frontier
        for d in os.listdir(out_dir):
            if d.startswith("iter_") and os.path.isdir(os.path.join(out_dir, d)):
                shutil.rmtree(os.path.join(out_dir, d))
    window: list[dict[str, int]] = []
    if track_window:
        for i in range(max(0, start_iter - cfg.sustained_window + 1), start_iter):
            window.append(_iter_host_counts(os.path.join(out_dir, f"iter_{i:04d}")))

    # robots-from-corpus warm cache (the north star's in-crawl robots.txt
    # cache): hosts already probed + the rules they contributed, restored
    # from the last complete iteration's robots.json on resume. The file is
    # O(hosts) JSON — at 10^10-URL scale it becomes a partitioned Parquet
    # side table with per-generation deltas, same as the seen shards.
    robots_checked: set[str] = set()
    # adaptive ban-backoff state: host → penalty level (each level halves
    # the admission budget). O(penalized hosts); checkpointed per
    # generation (backoff.json) and restored on resume like the caches.
    penalty: dict[str, int] = {}
    if ban_backoff and resume and last is not None:
        bpath = os.path.join(out_dir, f"iter_{last:04d}", "backoff.json")
        if os.path.exists(bpath):
            with open(bpath) as fh:
                penalty = {h: int(v) for h, v in json.load(fh)["penalty"].items()}
    # sitemap warm cache: hosts whose /sitemap.xml has been ingested. Same
    # O(hosts) JSON checkpoint/restore story as robots.json.
    sitemap_checked: set[str] = set()
    if sitemaps_from_corpus and resume and last is not None:
        spath = os.path.join(out_dir, f"iter_{last:04d}", "sitemaps.json")
        if os.path.exists(spath):
            with open(spath) as fh:
                sitemap_checked = set(json.load(fh)["checked"])
    if robots_from_corpus and resume and last is not None:
        rpath = os.path.join(out_dir, f"iter_{last:04d}", "robots.json")
        if os.path.exists(rpath):
            with open(rpath) as fh:
                rstate = json.load(fh)
            robots_checked = set(rstate["checked"])
            cfg = dataclasses.replace(
                cfg,
                disallow={**cfg.disallow,
                          **{h: tuple(v) for h, v in rstate["disallow"].items()}},
                host_budget={**cfg.host_budget,
                             **{h: int(v) for h, v in rstate["budget"].items()}},
            )
    if fetcher_factory is None:
        # idempotent: covers corpora generated before the index existed
        # (a live Fetcher needs no probe index — it may have no pages dir)
        from crawler_ray.stages.fetch import build_fetch_index

        build_fetch_index(corpus.pages)
    stats: list[dict] = []
    result = CrawlResult(out_dir=out_dir, iterations=start_iter)

    import time

    timing = os.environ.get("CRAWLER_RAY_TIMING") == "1"

    # structured per-stage metrics (reference D5, log/log.go:13-38): every
    # iteration's manifest carries one row per pipeline stage — wall
    # seconds plus whatever row/byte counts the stage naturally knows —
    # the scrape surface a cluster operator charts instead of grepping a
    # debug print. stage_rows is reset at the top of each generation;
    # _tick appends to it and optionally still prints under the env var.
    stage_rows: list[dict] = []

    def _tick(label: str, t0: float, stage: str | None = None, **extra) -> float:
        t1 = time.time()
        if timing:
            print(f"[crawl-timing] {label:28s} {t1 - t0:6.2f}s", flush=True)
        if stage is not None:
            row = {"stage": stage, "sec": round(t1 - t0, 4)}
            row.update({k: v for k, v in extra.items() if v is not None})
            stage_rows.append(row)
        return t1

    def _control_warm(hs, t0: float, it: int):
        """Shared robots/sitemap cache warm for hosts newly present in a
        generation's frontier (hs: deduped host/scheme pandas frame).
        Mutates cfg / robots_checked / sitemap_checked; returns (t0,
        sitemap locs to inject into THIS generation's frontier)."""
        nonlocal cfg

        locs: list[str] = []
        if robots_from_corpus and len(hs):
            new = hs[~hs["host"].isin(robots_checked)]
            if len(new):
                bodies = _fetch_control_bodies(
                    corpus.pages, new, fetcher_factory, fetcher_key
                )
                robots_checked.update(new["host"])
                if bodies:
                    cfg = robots_config(
                        bodies,
                        window_seconds=robots_window_s,
                        agent=robots_agent,
                        base=cfg,
                    )
            t0 = _tick(f"it{it} robots warm", t0, stage="robots_warm")
        if sitemaps_from_corpus and len(hs):
            new = hs[~hs["host"].isin(sitemap_checked)]
            if len(new):
                bodies = _fetch_control_bodies(
                    corpus.pages, new, fetcher_factory, fetcher_key,
                    path="/sitemap.xml",
                )
                sitemap_checked.update(new["host"])
                for h in sorted(bodies):
                    locs.extend(_LOC_RE.findall(bodies[h]))
            t0 = _tick(f"it{it} sitemap warm", t0, stage="sitemap_warm")
        return t0, locs

    def _sitemap_inj(locs: list[str]) -> pa.Table:
        """Frontier rows for sitemap-discovered urls (seq = md5(url), so
        the single-process oracle reproduces the ordering exactly)."""
        return pa.Table.from_arrays(
            [
                pa.array(locs, pa.string()),
                pa.array([""] * len(locs), pa.string()),
                pa.array([""] * len(locs), pa.string()),
                pa.array([0] * len(locs), pa.uint64()),
                pa.array([sitemap_depth] * len(locs), pa.int32()),
                pa.array([sitemap_priority] * len(locs), pa.int32()),
                pa.array(
                    [hashlib.md5(u.encode()).digest() for u in locs],
                    pa.binary(),
                ),
                pa.array([0] * len(locs), pa.int32()),
                pa.array([sitemap_task] * len(locs), pa.string()),
                pa.array([sitemap_rule] * len(locs), pa.string()),
                pa.array(["{}"] * len(locs), pa.string()),
            ],
            schema=FRONTIER_SCHEMA,
        )

    for it in range(start_iter, max_iterations):
        ckdir = os.path.join(out_dir, f"iter_{it:04d}")
        # a mid-iteration crash leaves partial parquet behind, and Ray's
        # write_parquet APPENDS uuid-named files rather than overwriting —
        # re-running an incomplete generation would double every output row
        # (ADVICE r1, high). The manifest is written last, so an iter dir
        # without one is by definition incomplete: recreate it.
        shutil.rmtree(ckdir, ignore_errors=True)
        os.makedirs(ckdir)
        t0 = it_t0 = time.time()
        stage_rows = []

        if frontier_path is not None:
            # an empty final frontier leaves no parquet files behind —
            # treat that as crawl-complete (also the resume-after-complete path)
            files = (
                [f for f in os.listdir(frontier_path) if f.endswith(".parquet")]
                if os.path.isdir(frontier_path)
                else []
            )
            if not files:
                break

        # ---- adaptive driver admission for small frontiers ----
        # Below CRAWLER_RAY_ADMIT_DRIVER_CUT rows (default 65536; 0
        # disables) the whole admission chain — canonicalize, control-file
        # warm, robots gate, seen pre-filter, host-partitioned politeness
        # admission, seen mark, url sort — runs as the SAME batch fns
        # applied once to a driver-held table: a generation this small pays
        # more in exchange fixed costs (two materializations, one
        # sort-shuffle, one range exchange, ~0.4-1.8 s/generation measured)
        # than the admission computes. Admitted sets are identical: every
        # fn is row-local, partition routing is the same host_partition_of,
        # and per-part admission is the same admit_partition_fn applied per
        # pandas group. The distributed chain in the else-branch is the
        # 10^10-frontier path and the engine-vs-oracle pytest pins both
        # (env-parametrized).
        driver_cut = int(os.environ.get("CRAWLER_RAY_ADMIT_DRIVER_CUT", "65536"))
        n_front = (
            _parquet_rows(frontier_path)
            if frontier_path is not None
            else frontier_tbl.num_rows
        )
        # shared by both admission paths (branch-independent): trailing
        # politeness-window usage and the host-hash partition count
        usage: dict[str, int] | None = None
        if track_window and window:
            usage = {}
            for counts in window:
                for h, n in counts.items():
                    usage[h] = usage.get(h, 0) + n
        n_parts = int(os.environ.get("CRAWLER_RAY_ADMIT_PARTS", "0")) or max(
            16, 2 * int(ray.cluster_resources().get("CPU", 8))
        )
        if 0 < driver_cut and n_front <= driver_cut:
            import pandas as pd

            tb = (
                pq.read_table(frontier_path)
                if frontier_path is not None
                else frontier_tbl
            )
            tb = canonicalize_fn(canon_depth, default_task=primary.name)(tb)
            if robots_from_corpus or sitemaps_from_corpus:
                hs = _host_scheme_partial(tb).to_pandas()
                if len(hs):
                    hs = hs.sort_values(["host", "scheme"]).drop_duplicates("host")
                t0, locs = _control_warm(hs, t0, it)
                if locs:
                    tb = pa.concat_tables(
                        [
                            tb,
                            canonicalize_fn(canon_depth, default_task=primary.name)(
                                _sitemap_inj(locs)
                            ),
                        ]
                    )
            tb = robots_filter_fn(cfg)(tb)
            if not all_reload:
                tb = seen_filter_fn(seen, mark=False, skip_tasks=seen_skip)(tb)
            adfn = admit_partition_fn(cfg, usage, penalty if ban_backoff else None)
            df = tb.append_column(
                "part", pa.array(host_partition_of(tb["host"], n_parts))
            ).to_pandas()
            if len(df):
                out_tbl = pa.Table.from_pandas(
                    pd.concat(
                        [adfn(g) for _, g in df.groupby("part", sort=True)],
                        ignore_index=True,
                    ),
                    preserve_index=False,
                )
                adm_tbl = _cast_frontier(
                    out_tbl.filter(pc.equal(out_tbl["admitted"], True))
                )
                def_tbl = _cast_frontier(
                    out_tbl.filter(pc.equal(out_tbl["admitted"], False))
                )
            else:
                adm_tbl = def_tbl = _cast_frontier(tb)
            if not all_reload and adm_tbl.num_rows:
                adm_tbl = seen_filter_fn(seen, mark=True, skip_tasks=seen_skip)(adm_tbl)
            if adm_tbl.num_rows:
                # same locality contract as the distributed sort("url"):
                # fetch batches walk the url-sorted pages layout
                adm_tbl = adm_tbl.sort_by([("url", "ascending")])
            t0 = _tick(
                f"it{it} admission (driver)",
                t0,
                stage="admission",
                rows_out=int(adm_tbl.num_rows + def_tbl.num_rows),
                # no exchange ran — report the admitted/deferred payload as
                # bytes_out instead of a fictitious shuffle_bytes
                bytes_out=int(adm_tbl.nbytes + def_tbl.nbytes),
            )
            deferred = ray.data.from_arrow(def_tbl)
            admitted = ray.data.from_arrow(adm_tbl).repartition(
                target_num_rows_per_block=batch_size
            )
        else:
            fr = (
                ray.data.read_parquet(frontier_path)
                if frontier_path is not None
                else ray.data.from_arrow(frontier_tbl)
            )
            # batch_size coalesces the read's auto-split blocks (~7k rows each)
            # into ~32k-row blocks: the admission groupby's sort-shuffle moves
            # #blocks × #partitions object pieces, and 216×216 pieces of
            # per-piece scheduling overhead cost more than the admission work
            fr = fr.map_batches(
                canonicalize_fn(canon_depth, default_task=primary.name),
                batch_size=32768,
                batch_format="pyarrow",
            )
            if robots_from_corpus or sitemaps_from_corpus:
                # warm the robots/sitemap caches for hosts newly present in
                # this generation's frontier BEFORE the robots gate (shared
                # _control_warm closure; the materialize is reused below)
                fr = fr.materialize()
                hs = fr.map_batches(_host_scheme_partial, batch_format="pyarrow").to_pandas()
                if len(hs):
                    # deterministic scheme per host regardless of block order
                    hs = hs.sort_values(["host", "scheme"]).drop_duplicates("host")
                t0, locs = _control_warm(hs, t0, it)
                if locs:
                    # sitemap URLs enter THIS generation's frontier and ride the
                    # normal canonicalize → robots → seen → admission path;
                    # seq = md5(url) is deterministic, so the single-process
                    # oracle reproduces ordering
                    fr = fr.union(
                        ray.data.from_arrow(_sitemap_inj(locs)).map_batches(
                            canonicalize_fn(canon_depth, default_task=primary.name),
                            batch_format="pyarrow",
                        )
                    )
            fr = fr.map_batches(robots_filter_fn(cfg), batch_format="pyarrow")
            # Task.Reload bypasses the visited check entirely (the reference
            # skips HasVisited when Reload is set, engine/crawler.go:85,
            # collect/option.go:14) — a re-crawlable task must refetch. With
            # mixed tasks the bypass is per row (seen_skip).
            if not all_reload:
                fr = fr.map_batches(
                    seen_filter_fn(seen, mark=False, skip_tasks=seen_skip),
                    batch_format="pyarrow",
                )
            # admission shuffle: one groupby per generation, keyed by a coarse
            # host-hash partition (every host in exactly one partition — the
            # politeness correctness requirement) rather than by host itself:
            # a real frontier has ~10^6+ hosts and per-host pandas groups are
            # pure overhead; within a partition admission is one vectorized pass.
            # Partition count scales with the session's CPUs (admitted sets are
            # invariant to it — a host never straddles parts): the sort-shuffle
            # moves #blocks × #parts pieces, and a fixed 64 cost ~2 s/generation
            # of pure piece scheduling on an 8-core run
            fr = fr.map_batches(
                lambda t, _np=n_parts: t.append_column(
                    "part", pa.array(host_partition_of(t["host"], _np))
                ),
                batch_format="pyarrow",
            )
            # materialize-cut before the sort-based groupby: fused with the
            # Sort, the streaming executor's sort reservation throttles the
            # canonicalize/seen map chain to ~1 concurrent task (same effect
            # measured on the dedup pipelines); the sort is a barrier anyway
            if os.environ.get("CRAWLER_RAY_ADMIT_CUT", "1") != "0":
                fr = fr.materialize()
            fr = fr.groupby("part").map_groups(
                admit_partition_fn(cfg, usage, penalty if ban_backoff else None),
                batch_format="pandas",
            )
            frontier_mat = fr.materialize()
            t0 = _tick(f"it{it} admission", t0, stage="admission",
                       rows_out=frontier_mat.count(),
                       shuffle_bytes=frontier_mat.size_bytes())
            if timing and os.environ.get("CRAWLER_RAY_STATS") == "1":
                print(f"[admission-stats it{it}]\n{frontier_mat.stats()}", flush=True)

            # route + cast fused, with batch_size coalescing: the admission
            # shuffle materializes many small blocks, and every stage fed tiny
            # blocks pays per-task overhead that grows with core count (the
            # frontier write was measurably SLOWER at 8 cores than 2 before
            # this) — one streaming re-bundle here keeps downstream block
            # counts ∝ rows/65536, not ∝ shuffle partitions
            deferred = frontier_mat.map_batches(
                _route("admitted", False), batch_size=65536, batch_format="pyarrow"
            )
            admitted = frontier_mat.map_batches(
                _route("admitted", True), batch_size=65536, batch_format="pyarrow"
            )
            if not all_reload:
                admitted = admitted.map_batches(
                    seen_filter_fn(seen, mark=True, skip_tasks=seen_skip),
                    batch_format="pyarrow",
                )
            # Align the fetch probe with the pages layout: admission blocks are
            # in (priority, seq) order, so without this sort every fetch batch
            # sprays across the host's whole row-group range and thrashes the
            # per-worker group cache (measured 8× slowdown on the mega-host
            # block). A range exchange keyed like the storage (url) makes each
            # row group decompress ~once per iteration and splits hot hosts
            # across workers — the same trick a 256-node run needs.
            admitted = admitted.sort("url")
            # a map_batches task consumes whole blocks: the 64k-row coalesced
            # blocks above would run the (expensive) fetch stage as one task
            # per 64k urls — split back to fetch-task-sized blocks, order
            # preserved (streaming split, no shuffle)
            admitted = admitted.repartition(target_num_rows_per_block=batch_size)
        # Fused fetch→classify→extract (FetchExtract): one map stage per
        # generation, cached per worker process; raw html never enters the
        # object store — only derived rows (order/failed/frontier/item/text)
        # are materialized.
        ex_mat = admitted.map_batches(
            make_fetch_extract_fn(corpus.pages, task_list, cfg.max_attempts,
                                  fetcher_factory, fetcher_key, ledger_dir),
            batch_size=batch_size,
            batch_format="pyarrow",
        ).materialize()
        t0 = _tick(f"it{it} mark+fetch+extract", t0, stage="fetch_extract",
                   rows_out=ex_mat.count(), bytes_out=ex_mat.size_bytes())
        if timing and os.environ.get("CRAWLER_RAY_STATS") == "1":
            print(f"[crawl-stats it{it}]\n{ex_mat.stats()}", flush=True)

        order = ex_mat.map_batches(
            lambda t, _it=it: (lambda f: pa.table(
                {
                    "iteration": pa.array([_it] * f.num_rows, pa.int32()),
                    "url": f.column("url"),
                    "priority": f.column("priority"),
                    "seq": f.column("seq"),
                    "attempt": f.column("attempt"),
                    "outcome": f.column("outcome"),
                    "h64": f.column("h64"),
                    # fetch ts + task + rule ride along so a later
                    # incremental recrawl can rebuild its ledger from order
                    # alone (and the failure unmark below is per-task)
                    "warc_ts": f.column("ts"),
                    "task": f.column("task"),
                    "rule": f.column("rule"),
                }
            ))(t.filter(pc.equal(t.column("kind"), "order"))),
            batch_size=65536,
            batch_format="pyarrow",
        )
        order.write_parquet(os.path.join(ckdir, "order"))
        n_sched = _parquet_rows(os.path.join(ckdir, "order"))
        if track_window or ban_backoff:
            it_counts, sched_hosts, banned_hosts = _iter_host_stats(
                ckdir, with_outcomes=ban_backoff
            )
        if track_window:
            window.append(it_counts)
            del window[: -(cfg.sustained_window - 1)]
        if ban_backoff:
            apply_backoff_updates(penalty, sched_hosts, banned_hosts)
            with open(os.path.join(ckdir, "backoff.json"), "w") as fh:
                json.dump({"penalty": penalty}, fh)
        t0 = _tick(f"it{it} order write n={n_sched}", t0, stage="order_write", rows_out=n_sched)

        # items sink, per rule (dynamic schema from ItemFields — W2);
        # row counts come from the written Parquet footers, not re-executions
        n_items = 0
        # materialize the item subset once: with R rules, the per-rule
        # writes then scan the (much smaller) item set instead of R full
        # passes over every ex_mat row kind
        items_all = ex_mat.map_batches(
            _keep("kind", "item"), batch_size=65536, batch_format="pyarrow"
        )
        item_rules = [
            (t, rn, spec)
            for t in task_list
            for rn, spec in t.rules.items()
            if spec.item_fields
        ]
        if len(item_rules) > 1:
            items_all = items_all.materialize()
        multi = len(task_list) > 1
        for t, rule_name, spec in item_rules:
            sel = items_all.map_batches(_keep("rule", rule_name), batch_format="pyarrow")
            if multi:  # rule names may collide across tasks
                sel = sel.map_batches(_keep("task", t.name), batch_format="pyarrow")
            typed = sel.map_batches(items_to_columns(t, rule_name), batch_format="pyarrow")
            # single-task keeps the flat layout; multi-task nests per task
            rule_dir = (
                os.path.join(ckdir, "items", f"task={t.name}", f"rule={rule_name}")
                if multi
                else os.path.join(ckdir, "items", f"rule={rule_name}")
            )
            typed.write_parquet(rule_dir)
            n_items += _parquet_rows(rule_dir)
        t0 = _tick(f"it{it} items write", t0, stage="items_write", rows_out=n_items)

        ex_mat.map_batches(
            _keep("kind", "text"), batch_size=65536, batch_format="pyarrow"
        ).select_columns(["url", "task", "rule", "payload"]).write_parquet(os.path.join(ckdir, "text"))
        t0 = _tick(f"it{it} text write", t0, stage="text_write")

        # children AND retry rows (FetchExtract emits both as kind=frontier)
        children = ex_mat.map_batches(
            _route("kind", "frontier"), batch_size=65536, batch_format="pyarrow"
        )

        # failure bookkeeping: unmark failed keys (requeue rows were already
        # emitted by FetchExtract as kind=frontier with attempt+1). The key
        # set comes from the order parquet ALREADY on local disk — a
        # footer-level column read, no extra Ray execution pass (the r1
        # iter_batches collection was one of the per-generation fixed costs
        # hurting scaling)
        fail_parts = []
        unmark_parts = []
        odir = os.path.join(ckdir, "order")
        if os.path.isdir(odir):
            bad = pa.array(["missing", "banned"])
            rl = pa.array(sorted(reload_tasks)) if reload_tasks else None
            for f in os.listdir(odir):
                if f.endswith(".parquet"):
                    t = pq.read_table(
                        os.path.join(odir, f), columns=["h64", "outcome", "task"]
                    )
                    mask = pc.is_in(t.column("outcome"), value_set=bad)
                    fail_parts.append(
                        t.column("h64").filter(mask).to_numpy(zero_copy_only=False).astype(np.uint64)
                    )
                    # unmark only rows whose task marked in the first place
                    # (reload tasks never mark — engine/crawler.go:85)
                    um = mask
                    if rl is not None:
                        um = pc.and_(mask, pc.invert(pc.is_in(t.column("task"), value_set=rl)))
                    unmark_parts.append(
                        t.column("h64").filter(um).to_numpy(zero_copy_only=False).astype(np.uint64)
                    )
        n_failed = int(sum(len(p) for p in fail_parts))
        n_unmark = int(sum(len(p) for p in unmark_parts))
        if n_unmark and not all_reload:  # nothing was marked under reload
            seen.remove(np.concatenate(unmark_parts))

        t0 = _tick(f"it{it} failures n={n_failed}", t0, stage="failures", rows_out=n_failed)
        # both branches are already coalesced to ~64k-row blocks, so the
        # union writes a handful of files per generation with no
        # repartition barrier (the r1 repartition(8) was an all-to-all of
        # hundreds of tiny blocks that anti-scaled with core count)
        nxt = deferred.union(children)
        next_path = os.path.join(ckdir, "next_frontier")
        if timing and os.environ.get("CRAWLER_RAY_SUBTICK") == "1":
            td = time.time()
            dm = deferred.materialize()
            print(f"[crawl-timing] it{it}   deferred mat n={dm.count()} {time.time()-td:6.2f}s", flush=True)
            td = time.time()
            cm = children.materialize()
            print(f"[crawl-timing] it{it}   children mat n={cm.count()} {time.time()-td:6.2f}s", flush=True)
            td = time.time()
            nxt = dm.union(cm)
        nxt.write_parquet(next_path)
        n_next = _parquet_rows(next_path)
        t0 = _tick(f"it{it} frontier write n={n_next}", t0, stage="frontier_write", rows_out=n_next)

        # seen-shard checkpoint: delta (O(keys touched this generation)) with
        # a full compaction every SEEN_COMPACT_EVERY iterations — the r1
        # full-dump-per-generation was O(total seen) I/O each iteration,
        # quadratic over a long crawl
        seendir = os.path.join(ckdir, "seen")
        os.makedirs(seendir, exist_ok=True)
        seen_kind = "full" if it % SEEN_COMPACT_EVERY == 0 else "delta"
        if seen_kind == "full":
            for s, st in enumerate(seen.dump()):
                _save_shard_state(os.path.join(seendir, f"shard_{s}.npz"), st)
        else:
            for s, d in enumerate(seen.dump_delta()):
                np.savez(os.path.join(seendir, f"delta_{s}.npz"),
                         added=d["added"], removed=d["removed"])
        t0 = _tick(f"it{it} seen dump ({seen_kind})", t0, stage="seen_dump")

        if sitemaps_from_corpus:
            with open(os.path.join(ckdir, "sitemaps.json"), "w") as fh:
                json.dump({"checked": sorted(sitemap_checked)}, fh)
        if robots_from_corpus:
            with open(os.path.join(ckdir, "robots.json"), "w") as fh:
                json.dump(
                    {
                        "checked": sorted(robots_checked),
                        "disallow": {h: list(v) for h, v in cfg.disallow.items()},
                        "budget": cfg.host_budget,
                    },
                    fh,
                )

        iter_stats = {
            "iteration": it,
            "sec": round(time.time() - it_t0, 3),
            "scheduled": n_sched,
            "failed": n_failed,
            "items": n_items,
            "next_frontier": n_next,
            "seen": seen.count(),
            "seen_kind": seen_kind,
            "num_seen_shards": num_seen_shards,
            "seen_mode": seen_mode,
            "exact_seen": exact_seen,
            "input_sig": f"{corpus.root}:{corpus.n_docs}",
            # per-stage metrics rows (D5): [{stage, sec, rows_out?,
            # bytes_out?, shuffle_bytes?}, ...] in execution order
            "stages": stage_rows,
            "complete": True,
        }
        # atomic rename: a crash mid-dump must not leave truncated JSON that
        # a later resume would trip over (ADVICE r1)
        mpath = os.path.join(ckdir, "manifest.json")
        with open(mpath + ".tmp", "w") as fh:
            json.dump(iter_stats, fh)
        os.replace(mpath + ".tmp", mpath)
        stats.append(iter_stats)
        result.iterations = it + 1

        frontier_path = next_path
        frontier_tbl = None
        if n_next == 0:
            break

    result.stats = stats
    return result


def _save_shard_state(path: str, st: dict) -> None:
    arrays = {}
    meta = {"mode": st["mode"], "filter_kind": st["filter"]["kind"]}
    for k, v in st["filter"].items():
        if isinstance(v, np.ndarray):
            arrays[f"filter_{k}"] = v
        elif k != "kind":
            meta[f"filter_{k}"] = v
    if "exact" in st:
        arrays["exact"] = st["exact"]
    if "failed_exact" in st:
        arrays["failed_exact"] = st["failed_exact"]
    # uncompressed: dump speed matters more than bytes (the cuckoo table is
    # mostly zeros; at scale one would delta-dump per shard instead)
    np.savez(path, meta=json.dumps(meta), **arrays)


def _unpack_shard_state(raw: dict) -> dict:
    meta = raw
    st: dict = {"mode": meta["mode"], "filter": {"kind": meta["filter_kind"]}}
    for k, v in meta.items():
        if k.startswith("filter_") and k != "filter_kind":
            st["filter"][k[len("filter_"):]] = v
    if "exact" in meta:
        st["exact"] = meta["exact"]
    if "failed_exact" in meta:
        st["failed_exact"] = meta["failed_exact"]
    return st


# ---------------------------------------------------------- incremental recrawl
def build_ts_ledger(out_dir: str, num_shards: int = 16) -> str:
    """Build (or reuse) the sharded fetch ledger of a completed crawl: one
    entry per successfully-fetched url — (url, last warc_ts, rule) —
    memory-mapped by recrawl fetch workers exactly like the fetch index.
    Read from the order checkpoints (outcome ok or unchanged), so a chain
    of recrawls keeps carrying each url's last-known capture time.

    The build is a Ray pipeline, never a driver materialization: the order
    checkpoints stream through a filter, shard by ``h64 % num_shards`` (the
    canonical url hash the order rows already carry), and each shard's task
    sorts its urls and writes ``urls_{s}.npy / ts_{s}.npy / rules_{s}.npy``
    plus a generation-0 FRONTIER_SCHEMA Parquet shard under ``frontier/``
    (seq = md5(url), the sitemap-injection convention the oracle mirrors).
    Driver traffic is one manifest row per shard — at 10^10 urls only
    ``num_shards`` scales up; no url ever rides to the driver."""
    ldir = os.path.join(out_dir, "_ts_ledger")
    if os.path.exists(os.path.join(ldir, "_DONE")) and os.path.exists(
        os.path.join(ldir, "meta.json")
    ):
        return ldir
    shutil.rmtree(ldir, ignore_errors=True)  # partial/old-layout build
    fdir = os.path.join(ldir, "frontier")
    os.makedirs(fdir, exist_ok=True)
    files = []
    for d in sorted(os.listdir(out_dir)):
        odir = os.path.join(out_dir, d, "order")
        if not (d.startswith("iter_") and os.path.isdir(odir)):
            continue
        # only COMPLETE iterations feed the ledger: a crash-orphaned iter
        # can hold order rows whose items/text were never written — marking
        # those urls "unchanged" on recrawl would skip extraction of pages
        # no run ever extracted (the same manifest gate resume uses)
        mpath = os.path.join(out_dir, d, "manifest.json")
        try:
            with open(mpath) as fh:
                if not json.load(fh).get("complete"):
                    continue
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            continue
        files.extend(
            os.path.join(odir, f)
            for f in sorted(os.listdir(odir))
            if f.endswith(".parquet")
        )
    if not files:
        raise ValueError(
            f"{out_dir!r} has no iter_*/order checkpoints — not a completed "
            "crawl output directory (point --recrawl-from at a finished run)"
        )
    need = {"url", "outcome", "warc_ts", "rule", "h64"}
    have = set(pq.read_schema(files[0]).names)
    if not need <= have:
        raise ValueError(
            f"{out_dir!r} order checkpoints lack columns {sorted(need - have)}: "
            "PREV_OUT was written by an older engine version (re-run the "
            "original crawl) or is not a crawl checkpoint directory"
        )
    # task is optional (pre-multi-task checkpoints) — "" maps back to the
    # recrawl's primary task at canonicalize time
    has_task = "task" in have
    cols = ["url", "outcome", "warc_ts", "rule", "h64"] + (["task"] if has_task else [])

    def shard_of(t: pa.Table) -> pa.Table:
        # null warc_ts rows (a live fetch without Date/Last-Modified) are
        # EXCLUDED: pandas would float them to NaN, the keep-last lexsort
        # would prefer the NaN over a real ts, and astype(int64) writes
        # INT64_MIN garbage — an url with no known capture time must simply
        # refetch on recrawl
        t = t.filter(
            pc.and_(
                pc.is_in(t["outcome"], value_set=pa.array(["ok", "unchanged"])),
                pc.is_valid(t["warc_ts"]),
            )
        )
        s = (t["h64"].to_numpy(zero_copy_only=False) % np.uint64(num_shards)).astype(
            np.int32
        )
        return pa.table(
            {
                "url": t["url"],
                "ts": t["warc_ts"].cast(pa.int64()),
                "task": t["task"] if has_task else pa.array([""] * t.num_rows, pa.string()),
                "rule": t["rule"],
                "h64": t["h64"],
                "shard": pa.array(s),
            }
        )

    def write_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        s = int(g["shard"].iloc[0])
        urls_b = [u.encode() for u in g["url"]]
        width = max((len(b) for b in urls_b), default=1)
        ua = np.array(urls_b, dtype=f"S{width}")
        # one entry per url, LAST warc_ts wins: a reload task fetches the
        # same url in many iterations, and the searchsorted probe on the
        # recrawl side lands on the FIRST of equal keys — sort by (url, ts)
        # and keep each run's last row so the ledger really is the
        # last-known capture time (the docstring contract)
        order = np.lexsort((g["ts"].to_numpy(), ua))
        ua_s = ua[order]
        last = np.r_[ua_s[1:] != ua_s[:-1], True]
        order = order[last]
        np.save(os.path.join(ldir, f"urls_{s:04d}.npy"), ua[order])
        np.save(
            os.path.join(ldir, f"ts_{s:04d}.npy"),
            g["ts"].to_numpy()[order].astype(np.int64),
        )
        rl = g["rule"].to_numpy()[order]
        rw = max((len(str(r)) for r in rl), default=1)
        np.save(os.path.join(ldir, f"rules_{s:04d}.npy"), rl.astype(f"S{rw}"))
        # generation-0 recrawl frontier shard (host/key recomputed by
        # canonicalize at iteration start; h64 rides along unchanged)
        u_sorted = [urls_b[i].decode() for i in order]
        n = len(u_sorted)
        tk = g["task"].to_numpy()[order]
        fr = pa.Table.from_arrays(
            [
                pa.array(u_sorted, pa.string()),
                pa.array([""] * n, pa.string()),
                pa.array([""] * n, pa.string()),
                pa.array(g["h64"].to_numpy()[order].astype(np.uint64), pa.uint64()),
                pa.array(np.zeros(n, np.int32)),
                pa.array(np.zeros(n, np.int32)),
                pa.array([hashlib.md5(u.encode()).digest() for u in u_sorted], pa.binary()),
                pa.array(np.zeros(n, np.int32)),
                pa.array([str(x) for x in tk], pa.string()),
                pa.array([str(r) for r in rl], pa.string()),
                pa.array(["{}"] * n, pa.string()),
            ],
            schema=FRONTIER_SCHEMA,
        )
        pq.write_table(fr, os.path.join(fdir, f"frontier_{s:04d}.parquet"))
        import pandas as pd

        return pd.DataFrame({"shard": [s], "n": [len(order)]})

    manifest = (
        ray.data.read_parquet(files, columns=cols)
        .map_batches(shard_of, batch_size=65536, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    with open(os.path.join(ldir, "meta.json"), "w") as fh:
        json.dump(
            {
                "num_shards": num_shards,
                "n_urls": int(manifest["n"].sum()) if len(manifest) else 0,
                "shards": {int(r.shard): int(r.n) for r in manifest.itertuples()},
            },
            fh,
        )
    with open(os.path.join(ldir, "_DONE"), "w") as fh:
        fh.write("ok")
    return ldir


def load_ledger(ledger_dir: str) -> tuple[list[str], np.ndarray, list[str]]:
    """Small-scale introspection/test helper: concatenate all ledger shards
    to (urls, ts, rules) on the caller. NOT part of the engine's data path —
    recrawl workers mmap individual shards (`extract.py` probe) and the
    generation-0 frontier streams from ``frontier/`` Parquet."""
    with open(os.path.join(ledger_dir, "meta.json")) as fh:
        meta = json.load(fh)
    urls: list[str] = []
    ts_parts: list[np.ndarray] = []
    rules: list[str] = []
    for s in range(int(meta["num_shards"])):
        up = os.path.join(ledger_dir, f"urls_{s:04d}.npy")
        if not os.path.exists(up):
            continue
        urls.extend(u.decode() for u in np.load(up))
        ts_parts.append(np.load(os.path.join(ledger_dir, f"ts_{s:04d}.npy")))
        rules.extend(r.decode() for r in np.load(os.path.join(ledger_dir, f"rules_{s:04d}.npy")))
    ts = np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
    return urls, ts, rules


def recrawl_frontier(ledger_dir: str) -> str:
    """Generation-0 frontier for an incremental recrawl: the sharded
    FRONTIER_SCHEMA Parquet directory ``build_ts_ledger`` wrote — every
    ledger url at depth 0, priority 0, its last rule, seq = md5(url)
    (deterministic, the same convention as sitemap injection — the oracle
    reproduces it). Returned as a path so ``run_crawl`` streams it exactly
    like a checkpointed ``next_frontier``; nothing materializes on the
    driver."""
    return os.path.join(ledger_dir, "frontier")


def run_recrawl(
    corpus: Corpus, prev_out_dir: str, out_dir: str, **kwargs
) -> CrawlResult:
    """Incremental recrawl: refetch everything the previous run captured
    (politeness, retries, checkpoint/resume all apply as usual), but pages
    whose ``warc_ts`` is unchanged from the ledger are recorded as outcome
    ``unchanged`` and NOT re-extracted — only changed/new subtrees produce
    items, text and children. ``corpus`` is the same site observed later
    (e.g. ``synth_corpus(..., epoch=1)``)."""
    ledger = build_ts_ledger(prev_out_dir)
    return run_crawl(
        corpus,
        out_dir=out_dir,
        frontier_parquet=recrawl_frontier(ledger),
        ledger_dir=ledger,
        **kwargs,
    )
