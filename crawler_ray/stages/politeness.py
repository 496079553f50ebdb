"""Politeness gate: robots rules + per-host crawl budget.

The reference rate-limits per *task* with composed token buckets and random
jitter sleeps (``limiter/limiter.go:16-45``, ``collect/request.go:47-56``) and
has no per-host fairness at all (SURVEY.md §4). Re-expressed for an
iterative-batch engine with a deterministic **virtual clock**:

- each crawl iteration represents one politeness window; a host's token
  bucket refills to ``max_per_iter`` tokens per window (equivalent to
  ``rate_per_s × window_seconds`` — the reference's composed-min rate maps to
  this budget);
- admission within a host follows the engine's defined total order
  ``(priority desc, seq asc)`` — the batch equivalent of the reference's
  priority-then-FIFO queue (``engine/schedule.go:45-75``);
- rows over budget are **deferred**, not dropped: they re-enter the next
  iteration's frontier with their original ``seq`` (so ordering is stable);
- robots ``disallow`` prefixes drop rows outright before budgeting.

Implemented as one ``groupby(host)`` shuffle per iteration (same host must be
decided by one group — a correctness requirement, SURVEY.md §7.3) whose
``map_groups`` fn also collapses within-iteration duplicate URLs (keep first
in order) — the batch analogue of the reference's sequential visited-check
inside one scheduler (``engine/crawler.go:85-90``). No wall-clock sleeps
anywhere, so runs are reproducible; jitter (``collect/request.go:51-53``) is
load-shaping noise with no data-semantic, dropped by design.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class PolitenessConfig:
    default_budget: int = 6
    host_budget: dict[str, int] = field(default_factory=dict)
    disallow: dict[str, tuple[str, ...]] = field(default_factory=dict)  # host → prefixes
    default_disallow: tuple[str, ...] = ()
    max_depth: int = 5
    max_attempts: int = 2
    # composed second window (limiter/limiter.go:16-45 multiLimiter, e.g.
    # burst 1/2s AND sustained 20/60s in config.toml:5): at most
    # ``sustained_budget`` admissions per host within any
    # ``sustained_window`` consecutive iterations, composed by min() with
    # the per-iteration burst budget. None disables the second bucket.
    sustained_budget: int | None = None
    sustained_window: int = 1
    host_sustained: dict[str, int] = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "PolitenessConfig":
        with open(path) as fh:
            cfg = json.load(fh)
        dflt = cfg.get("default", {})
        hosts = cfg.get("hosts", {})
        sustained = dflt.get("max_per_window")
        return cls(
            default_budget=int(dflt.get("max_per_iter", 6)),
            host_budget={h: int(v["max_per_iter"]) for h, v in hosts.items() if "max_per_iter" in v},
            disallow={h: tuple(v.get("disallow", ())) for h, v in hosts.items()},
            default_disallow=tuple(dflt.get("disallow", ())),
            max_depth=int(cfg.get("max_depth", 5)),
            max_attempts=int(cfg.get("max_attempts", 2)),
            sustained_budget=int(sustained) if sustained is not None else None,
            sustained_window=int(dflt.get("window_iters", 1)),
            host_sustained={
                h: int(v["max_per_window"]) for h, v in hosts.items() if "max_per_window" in v
            },
        )

    def budget(self, host: str) -> int:
        return self.host_budget.get(host, self.default_budget)

    def effective_budget(self, host: str, used_in_window: int) -> int:
        """min() composition of the burst and sustained buckets — the batch
        equivalent of the reference's multiLimiter (every limiter must have
        a token before the request proceeds)."""
        burst = self.budget(host)
        sustained = self.host_sustained.get(host, self.sustained_budget)
        if sustained is None:
            return burst
        return min(burst, max(0, sustained - used_in_window))

    def disallowed_prefixes(self, host: str) -> tuple[str, ...]:
        return self.disallow.get(host, self.default_disallow)


def parse_robots_txt(body: str, agent: str = "*") -> tuple[tuple[str, ...], float | None]:
    """Minimal RFC-9309-style robots.txt parse: returns (disallow path
    prefixes, crawl-delay seconds) for the best-matching user-agent group
    (exact agent match wins over ``*``). Empty ``Disallow:`` lines (allow
    all) are ignored; unknown directives are skipped."""
    groups: dict[str, tuple[list[str], float | None]] = {}
    current: list[str] = []
    in_group = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group:
                current = []
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, ([], None))
            in_group = True
            continue
        in_group = False
        if key == "disallow" and val:
            # RFC 9309 path values are absolute; a value without a leading
            # '/' can never match an URL path (the oracle's
            # path.startswith(p) is False for every '/'-rooted path, and
            # the engine's host-then-prefix regex would otherwise match the
            # prefix INSIDE the hostname and over-block the whole host)
            if not val.startswith("/"):
                continue
            for a in current:
                groups[a][0].append(val)
        elif key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                continue
            for a in current:
                groups[a] = (groups[a][0], delay)
    got = groups.get(agent.lower()) or groups.get("*")
    if got is None:
        return (), None
    return tuple(got[0]), got[1]


def robots_config(
    robots_bodies: dict[str, str],
    *,
    window_seconds: float = 60.0,
    default_budget: int = 6,
    agent: str = "*",
    base: PolitenessConfig | None = None,
) -> PolitenessConfig:
    """Build a PolitenessConfig from fetched robots.txt bodies (host →
    body): Disallow prefixes become per-host drop rules and Crawl-delay
    becomes the per-iteration budget (window_seconds / delay — one crawl
    generation models one politeness window). This is the warm 'robots
    cache' a live crawl maintains; the synthetic corpora bake the same
    shape into politeness.json directly."""
    import dataclasses
    import math

    base = base or PolitenessConfig(default_budget=default_budget)
    disallow = dict(base.disallow)
    host_budget = dict(base.host_budget)
    for host, body in robots_bodies.items():
        prefixes, delay = parse_robots_txt(body, agent=agent)
        if prefixes:
            disallow[host] = prefixes
        if delay and delay > 0:
            host_budget[host] = max(1, int(math.floor(window_seconds / delay)))
    return dataclasses.replace(base, disallow=disallow, host_budget=host_budget)


def robots_filter_fn(config: PolitenessConfig):
    """map_batches task fn dropping robots-disallowed URLs (vectorized:
    one ``starts_with`` kernel per distinct disallow prefix — prefix sets are
    tiny; the synthetic robots cache is baked into the config the same way a
    real robots fetcher would warm it once per host)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        urls = batch.column("url")
        hosts = batch.column("host")
        drop = pa.array([False] * batch.num_rows)
        # Replacement semantics, exactly disallowed_prefixes(host): a host
        # with ANY per-host disallow entry uses ONLY its own prefixes — the
        # default prefixes apply solely to hosts absent from the per-host
        # map (the oracle reads the same accessor; a blanket default here
        # over-filtered overridden hosts and diverged from it).
        overridden = sorted(config.disallow)
        if overridden:
            has_override = pc.is_in(hosts, value_set=pa.array(overridden))
        prefixes: dict[str, set[str | None]] = {}
        for p in config.default_disallow:
            prefixes.setdefault(p, set()).add(None)  # None = any non-overridden host
        for h, ps in config.disallow.items():
            for p in ps:
                prefixes.setdefault(p, set()).add(h)
        for prefix, scope in prefixes.items():
            # path starts with prefix ⇔ url starts with "https://{host}{prefix}".
            # The equivalence NEEDS the leading '/': without it [^/]* may
            # stop mid-hostname and the regex matches the prefix inside the
            # host itself, while the oracle's path.startswith(p) is False
            # for every '/'-rooted path — skip such config entries on both
            # sides (parse_robots_txt already drops them at parse time)
            if not prefix.startswith("/"):
                continue
            path_hit = pc.match_substring_regex(
                urls, r"^[a-z][a-z0-9+.-]*://[^/]*" + _re_escape(prefix)
            )
            scoped_hosts = sorted(s for s in scope if s is not None)
            hit = pa.array([False] * batch.num_rows)
            if None in scope:
                hit = path_hit if not overridden else pc.and_(
                    path_hit, pc.invert(has_override)
                )
            if scoped_hosts:
                host_hit = pc.is_in(hosts, value_set=pa.array(scoped_hosts))
                hit = pc.or_(hit, pc.and_(path_hit, host_hit))
            drop = pc.or_(drop, hit)
        return batch.filter(pc.invert(drop))

    return fn


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)


def admit_fn(config: PolitenessConfig, window_usage: dict[str, int] | None = None):
    """``groupby('host').map_groups`` fn: dedup-within-iteration then admit
    the top-``budget`` rows in ``(priority desc, seq asc)`` order; the rest
    get ``admitted = False`` and defer to the next iteration.

    ``window_usage`` (host → admissions in the trailing sustained window)
    feeds the composed two-bucket budget. Its size is O(admissions per
    window) — hosts admitted recently — NOT O(total hosts), so shipping it
    in the task closure stays bounded at any frontier scale.

    Sorting happens via numpy lexsort over fixed-width seq bytes — a hot
    host's group can be hundreds of thousands of rows and pandas
    object-dtype sorts were the serial straggler of the admission shuffle.
    """
    import numpy as np

    usage = window_usage or {}

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g.assign(admitted=False)
        # (priority desc, seq lexicographic asc): seq is variable-length
        # bytes where shorter prefixes sort first. Right-padding with 0x00
        # ties a seq with its own zero-extension (b'\x01' vs b'\x01\x00...'),
        # so original length joins the lexsort as the final tie-break —
        # together (padded bytes, length) reproduces Python bytes ordering
        # exactly, prefixes first (ADVICE r1)
        seqs = g["seq"].to_numpy()
        lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=len(seqs))
        width = max(1, int(lens.max()))
        seq_fixed = np.array([s.ljust(width, b"\0") for s in seqs], dtype=f"S{width}")
        order = np.lexsort((lens, seq_fixed, -g["priority"].to_numpy()))
        g = g.iloc[order]
        keep = ~g["key"].duplicated(keep="first").to_numpy()
        g = g.iloc[keep]
        host = g["host"].iloc[0]
        budget = config.effective_budget(host, usage.get(host, 0))
        admitted = np.zeros(len(g), dtype=bool)
        admitted[:budget] = True
        return g.assign(admitted=admitted)

    return fn


def host_partition_of(hosts, nparts: int):
    """Deterministic host → partition id (crc32 — stable across workers,
    unlike Python's salted hash()). Hosts repeat heavily within a frontier
    batch, so hash the dictionary of uniques and gather — O(uniques)
    digests instead of O(rows)."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        hosts = pa.array(list(hosts), pa.string())
    enc = pc.dictionary_encode(hosts)
    if isinstance(enc, pa.ChunkedArray):  # DictionaryArray has no combine_chunks
        enc = enc.combine_chunks()
    uniq = np.fromiter(
        (zlib.crc32(h.encode()) % nparts for h in enc.dictionary.to_pylist()),
        np.int32,
        len(enc.dictionary),
    )
    if len(uniq) == 0:
        return np.empty(0, np.int32)
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


def backoff_budget(
    config: PolitenessConfig,
    host: str,
    used_in_window: int,
    penalty: dict[str, int] | None,
) -> int:
    """Effective budget with the adaptive ban-backoff applied: each penalty
    level halves the composed budget (floor 1, so a backed-off host keeps
    probing and can recover). Shared by the engine's admission pass and the
    single-process oracle so the semantics have one definition."""
    budget = config.effective_budget(host, used_in_window)
    if penalty:
        p = penalty.get(host, 0)
        if p:
            # The penalty halves the budget but must never EXCEED the
            # composed limiter's budget: when the sustained window is
            # exhausted (budget == 0) a penalized host admits 0, not 1.
            return min(budget, max(1, budget >> p))
    return budget


BACKOFF_MAX = 6  # deepest penalty level: budget >> 6


def apply_backoff_updates(
    penalty: dict[str, int], scheduled_hosts, banned_hosts
) -> None:
    """One generation's adaptive-politeness update, shared engine/oracle:
    a host that served ≥1 ban page this generation escalates one penalty
    level (budget halves, capped at ``BACKOFF_MAX``); a scheduled host with
    a clean generation recovers one level. Hosts not scheduled keep their
    penalty — no signal, no change. The dict stays O(penalized hosts)."""
    for h in scheduled_hosts:
        if h in banned_hosts:
            penalty[h] = min(penalty.get(h, 0) + 1, BACKOFF_MAX)
        elif h in penalty:
            p = penalty[h] - 1
            if p:
                penalty[h] = p
            else:
                del penalty[h]


def admit_partition_fn(
    config: PolitenessConfig,
    window_usage: dict[str, int] | None = None,
    penalty: dict[str, int] | None = None,
):
    """Partition-level admission: one vectorized pass over ALL hosts hashed
    into this partition, replacing one pandas group per host (a real web
    frontier has ~10^6+ hosts; per-group overhead would dwarf the admission
    math). Per-host semantics match ``admit_fn`` (the single-host reference
    kept for the pytest parity suite) plus what that reference predates —
    the multi-task tiebreak and the ban-backoff penalty — every host's
    rows land in exactly one partition (crc32(host) % nparts), rows are
    lexsorted by (host, priority desc, seq, len), within-host duplicate
    keys keep the first, and each host admits its effective budget
    (ban-backoff penalties halve it per level when enabled; the dict is
    O(penalized hosts), shipped in the closure like ``window_usage``)."""
    import numpy as np

    usage = window_usage or {}

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g.assign(admitted=np.zeros(0, dtype=bool))
        seqs = g["seq"].to_numpy()
        lens = np.fromiter((len(s) for s in seqs), np.int64, len(seqs))
        width = max(1, int(lens.max()))
        # C-speed fixed-width conversion: numpy right-pads bytes with \0,
        # exactly the ljust the lexsort key needs (len is the tiebreak)
        seq_fixed = seqs.astype(f"S{width}")
        # sort string keys via factorize(sort=True) codes: identical order
        # to Python string compare, but the lexsort runs on int64 (6× —
        # object-dtype keys make np.lexsort call Python rich compares)
        hosts = g["host"].to_numpy()
        host_codes = pd.factorize(hosts, sort=True)[0]
        # task is the least-significant tiebreak: two tasks seeding the same
        # url with identical (priority, seq) must order deterministically
        # regardless of block arrival order (the oracle sorts the same way)
        keys = (lens, seq_fixed, -g["priority"].to_numpy(), host_codes)
        if "task" in g.columns:
            keys = (pd.factorize(g["task"].to_numpy(), sort=True)[0],) + keys
        order = np.lexsort(keys)
        g = g.iloc[order]
        keep = ~g.duplicated(subset=["host", "key"], keep="first").to_numpy()
        g = g.iloc[keep]
        h = g["host"].to_numpy()
        starts = np.r_[0, np.nonzero(h[1:] != h[:-1])[0] + 1]
        run_lens = np.diff(np.r_[starts, len(h)])
        rank = np.arange(len(h)) - np.repeat(starts, run_lens)
        budgets = np.fromiter(
            (backoff_budget(config, x, usage.get(x, 0), penalty) for x in h[starts]),
            np.int64, len(starts),
        )
        return g.assign(admitted=rank < np.repeat(budgets, run_lens))

    return fn
