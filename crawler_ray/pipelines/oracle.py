"""Single-process oracle: the reference's scheduler semantics, row at a time.

A deliberately boring reimplementation of the Go engine's worker loop
(``engine/crawler.go:77-134``) plus this engine's *defined* deterministic
total order (priority desc, seq lexicographic asc — SURVEY.md §7.4) and
per-iteration politeness windows. No Ray, no batching, no shuffles: dicts,
sets and lists, so tests compare the distributed engine against an
independently-structured model:

- priority-then-FIFO pull order  (engine/schedule.go:45-75)
- visited check before budget, mark-before-fetch (engine/crawler.go:85-90)
- fetch failure / ban → unmark + requeue once (engine/crawler.go:99-111,179-194)
- short body → dropped, stays visited (engine/crawler.go:113-120)
- depth gate (collect/request.go:34-40), robots + per-host budget windows

Shares only rules.py (the rule *specification*) with the engine; the
conformance suite pins those regexes against the reference's golden HTML
separately.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from crawler_ray.rules import SYNTH_TASK, TaskSpec, compile_task
from crawler_ray.sources.pages import (
    BAN_STRING,
    MAX_REDIRECTS,
    MIN_BODY_BYTES,
    REDIRECT_PREFIX,
    Corpus,
)
from crawler_ray.stages.politeness import PolitenessConfig

_REDIRECT_B = REDIRECT_PREFIX.encode()
_REDIRECT_RE = re.compile(re.escape(_REDIRECT_B) + b'([^"]*)"')


def _follow_redirects(page_map: dict, url: str):
    """Fetch with redirect-following (the Go ``http.Get`` semantics the
    engine's position-remap reproduces): chase meta-refresh chains up to
    ``MAX_REDIRECTS`` hops; a chain that leaves the corpus or loops is a
    fetch failure (None)."""
    page = page_map.get(url)
    for _ in range(MAX_REDIRECTS + 1):
        if page is None or not page[0].startswith(_REDIRECT_B):
            return page
        m = _REDIRECT_RE.match(page[0])
        if m is None:
            return page
        page = page_map.get(m.group(1).decode("utf-8", errors="replace"))
    return None


def _host(url: str) -> str:
    rest = url.split("://", 1)[1] if "://" in url else url
    return rest.split("/", 1)[0]


def _canon(url: str) -> str:
    from crawler_ray.functions.url import TRACKING_MID_RE, TRACKING_TAIL_RE

    url = url.split("#", 1)[0]
    url = re.sub(TRACKING_MID_RE, r"\1", url)
    url = re.sub(TRACKING_TAIL_RE, "", url)
    return url[:-1] if url.endswith("?") else url


def _h64(url: str) -> int:
    return int.from_bytes(hashlib.md5(url.encode() + b"GET").digest()[:8], "big")


def _ts_us(ts) -> int:
    """warc_ts (datetime from parquet to_pylist) → integer microseconds,
    matching the engine's int64 ledger representation."""
    import numpy as np

    return int(np.datetime64(ts, "us").astype(np.int64))


@dataclass
class OracleResult:
    order: list[tuple] = field(default_factory=list)  # (iteration, url, priority, seq, attempt, outcome)
    # (iteration, task, url, priority, seq, attempt, outcome) — the
    # task-qualified schedule (multi-task runs; aligned with `order`)
    order_full: list[tuple] = field(default_factory=list)
    items: list[dict] = field(default_factory=list)
    texts: dict[str, str] = field(default_factory=dict)  # url → extracted text
    # (task, url, text) rows — url alone is ambiguous when a reload task
    # re-extracts a url another task already produced
    text_rows: list[tuple] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)  # final h64 seen set
    iterations: int = 0


def run_oracle(
    corpus: Corpus,
    task: "TaskSpec | list[TaskSpec] | tuple[TaskSpec, ...]" = SYNTH_TASK,
    max_iterations: int = 64,
    robots_from_corpus: bool = False,
    sitemaps_from_corpus: bool = False,
    sitemap_rule: str = "detail",
    sitemap_depth: int = 1,
    sitemap_priority: int = 0,
    sitemap_task: str | None = None,
    robots_agent: str = "*",
    robots_window_s: float = 60.0,
    ban_backoff: bool = False,
    seeds_rows: list[dict] | None = None,
    ledger: dict[str, int] | None = None,
) -> OracleResult:
    from crawler_ray.stages.extract import normalize_tasks
    from crawler_ray.stages.politeness import (
        apply_backoff_updates,
        backoff_budget,
        robots_config,
    )

    task_list = normalize_tasks(task)
    tasks = {t.name: t for t in task_list}
    primary = task_list[0]
    if sitemap_task is None:
        sitemap_task = primary.name

    cfg = PolitenessConfig.from_json(corpus.politeness)
    limits = {n: min(cfg.max_depth, t.max_depth) for n, t in tasks.items()}
    rules = {
        (t.name, rn): cr for t in task_list for rn, cr in compile_task(t).items()
    }
    robots_checked: set[str] = set()
    sitemap_checked: set[str] = set()
    loc_re = re.compile(r"<loc>(.*?)</loc>")

    pages = pq.read_table(corpus.pages)
    page_map = {
        u: (h, t)
        for u, h, t in zip(
            pages.column("url").to_pylist(),
            pages.column("html").to_pylist(),
            pages.column("warc_ts").to_pylist(),
        )
    }

    if seeds_rows is not None:
        # recrawl mode: caller supplies the frontier (ledger urls with
        # seq = md5(url), mirroring the engine's recrawl_frontier)
        frontier = [dict(r) for r in seeds_rows]
    else:
        seeds = pq.read_table(corpus.seeds)
        frontier = [
            {
                "url": r["url"],
                "depth": r["depth"],
                "priority": r["priority"],
                "seq": int(r["seq"]).to_bytes(4, "big"),
                "attempt": 0,
                "task": r.get("task") or primary.name,
                "rule": r["rule"],
                "carry": {},
            }
            for r in seeds.to_pylist()
        ]
    for r in frontier:  # pre-multi-task seeds_rows carry no task
        if not r.get("task"):
            r["task"] = primary.name

    res = OracleResult()
    seen: set[int] = set()
    failed_once: set[int] = set()
    penalty: dict[str, int] = {}  # adaptive ban-backoff levels
    # trailing-window ledger for the composed sustained budget
    window: list[dict[str, int]] = []
    track_window = (
        cfg.sustained_budget is not None or bool(cfg.host_sustained)
    ) and cfg.sustained_window > 1

    for it in range(max_iterations):
        if not frontier:
            break
        res.iterations = it + 1
        if robots_from_corpus:
            # warm the robots cache for hosts newly in this generation's
            # depth-passing frontier (mirrors the engine: min scheme per
            # host, misses = allow-all, rules apply from this generation on)
            pairs: dict[str, str] = {}
            for r in frontier:
                if r["depth"] > limits.get(r["task"], -1):
                    continue
                url = _canon(r["url"])
                scheme = url.split("://", 1)[0] if "://" in url else "https"
                host = _host(url)
                if host not in pairs or scheme < pairs[host]:
                    pairs[host] = scheme
            bodies: dict[str, str] = {}
            for host, scheme in pairs.items():
                if host in robots_checked:
                    continue
                robots_checked.add(host)
                # through the same redirect-following fetch semantics as the engine
                # (a corpus MAY place a redirect at a control path)
                page = _follow_redirects(page_map, f"{scheme}://{host}/robots.txt")
                if page is not None:
                    bodies[host] = page[0].decode("utf-8", errors="replace")
            if bodies:
                cfg = robots_config(
                    bodies, window_seconds=robots_window_s,
                    agent=robots_agent, base=cfg,
                )
        if sitemaps_from_corpus:
            # ingest /sitemap.xml for hosts newly in this generation's
            # depth-passing frontier (pre-injection, same as the engine);
            # <loc> URLs join THIS generation's frontier with seq=md5(url)
            pairs: dict[str, str] = {}
            for r in frontier:
                if r["depth"] > limits.get(r["task"], -1):
                    continue
                url = _canon(r["url"])
                scheme = url.split("://", 1)[0] if "://" in url else "https"
                host = _host(url)
                if host not in pairs or scheme < pairs[host]:
                    pairs[host] = scheme
            for host in sorted(pairs):
                if host in sitemap_checked:
                    continue
                sitemap_checked.add(host)
                page = _follow_redirects(
                    page_map, f"{pairs[host]}://{host}/sitemap.xml"
                )
                if page is None:
                    continue
                for loc in loc_re.findall(page[0].decode("utf-8", errors="replace")):
                    frontier.append(
                        {
                            "url": loc,
                            "depth": sitemap_depth,
                            "priority": sitemap_priority,
                            "seq": hashlib.md5(loc.encode()).digest(),
                            "attempt": 0,
                            "task": sitemap_task,
                            "rule": sitemap_rule,
                            "carry": {},
                        }
                    )
        # canonicalize + depth + robots + cross-iteration seen
        rows = []
        for r in frontier:
            url = _canon(r["url"])
            # unknown task → dropped (missing Trunk); per-task depth limit
            if r["depth"] > limits.get(r["task"], -1):
                continue
            host = _host(url)
            path = url.split(host, 1)[1]
            if any(path.startswith(p) for p in cfg.disallowed_prefixes(host)):
                continue
            # Task.Reload bypasses the visited check (engine/crawler.go:85)
            if not tasks[r["task"]].reload and _h64(url) in seen:
                continue
            rows.append({**r, "url": url, "host": host})
        # per-host: order, dedup within iteration, admit budget
        by_host: dict[str, list[dict]] = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        usage: dict[str, int] = {}
        for counts in window:
            for h, n in counts.items():
                usage[h] = usage.get(h, 0) + n
        admitted: list[dict] = []
        deferred: list[dict] = []
        for host, group in by_host.items():
            # task is the least-significant tiebreak, matching the engine's
            # admission lexsort (politeness.py admit_partition_fn)
            group.sort(key=lambda r: (-r["priority"], r["seq"], r["task"]))
            kept, keys = [], set()
            for r in group:
                k = _h64(r["url"])
                if k in keys:
                    continue
                keys.add(k)
                kept.append(r)
            budget = backoff_budget(
                cfg, host, usage.get(host, 0), penalty if ban_backoff else None
            )
            admitted.extend(kept[:budget])
            deferred.extend(kept[budget:])
        if track_window:
            it_counts: dict[str, int] = {}
            for r in admitted:
                it_counts[r["host"]] = it_counts.get(r["host"], 0) + 1
            window.append(it_counts)
            del window[: -(cfg.sustained_window - 1)]

        children: list[dict] = []
        banned_hosts: set[str] = set()
        for r in admitted:
            k = _h64(r["url"])
            r_task = tasks[r["task"]]
            if not r_task.reload:
                seen.add(k)  # mark-before-fetch
            page = _follow_redirects(page_map, r["url"])
            html = page[0].decode("utf-8", errors="replace") if page else None
            if html is None:
                outcome = "missing"
            elif BAN_STRING in html:
                outcome = "banned"
            elif len(page[0]) < MIN_BODY_BYTES:
                outcome = "short"
            elif (
                ledger is not None
                and ledger.get(r["url"]) == _ts_us(page[1])
            ):
                outcome = "unchanged"  # incremental recrawl: skip extract
            else:
                outcome = "ok"
            res.order.append((it, r["url"], r["priority"], r["seq"], r["attempt"], outcome))
            res.order_full.append(
                (it, r["task"], r["url"], r["priority"], r["seq"], r["attempt"], outcome)
            )
            if outcome == "banned":
                banned_hosts.add(r["host"])
            if outcome in ("missing", "banned"):
                if not r_task.reload:
                    seen.discard(k)  # unmark-on-failure (never marked on reload)
                if r["attempt"] + 1 < cfg.max_attempts:
                    children.append({**r, "attempt": r["attempt"] + 1})
                continue
            if outcome in ("short", "unchanged"):
                continue  # stays marked; unchanged additionally skips extract
            rule = rules.get((r["task"], r["rule"]))
            if rule is None:
                continue
            kids, item = rule.extract(r["url"], html, r["carry"])
            spec = rule.spec
            for idx, (child_url, child_carry) in enumerate(kids):
                children.append(
                    {
                        "url": child_url,
                        "depth": r["depth"] + 1,
                        "priority": spec.child_priority,
                        "seq": r["seq"] + idx.to_bytes(4, "big"),
                        "attempt": 0,
                        "task": r["task"],
                        "rule": spec.next_rule or "",
                        "carry": child_carry,
                    }
                )
            if item is not None:
                res.items.append(
                    {
                        "task": r["task"],
                        "rule": r["rule"],
                        "url": r["url"],
                        "ts": page[1],
                        "payload": json.dumps(item, ensure_ascii=False, sort_keys=True),
                    }
                )
            if spec.kind == "link_extract":
                text = "\n".join(u for u, _ in kids)
            elif spec.kind == "predicate_extract":
                text = r["url"] if item is not None else ""
            else:
                text = json.dumps(item, ensure_ascii=False, sort_keys=True)
            res.texts[r["url"]] = text
            res.text_rows.append((r["task"], r["url"], text))

        if ban_backoff:
            apply_backoff_updates(
                penalty, {r["host"] for r in admitted}, banned_hosts
            )
        frontier = deferred + children

    res.seen = seen
    return res
