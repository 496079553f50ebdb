"""Declarative rule engine — replaces the reference's Go/JS ParseFuncs.

The reference dispatches per-request to a ``Rule.ParseFunc`` looked up by
``RuleName`` (``engine/crawler.go:122-126``); every shipped rule is one of
three shapes (SURVEY.md §2.4):

- **link_extract** (R1 ``douban_group.go:42-59``, R3 ``dobuan_book.go:65-91``,
  R4 ``dobuan_book.go:95-122``, R7 ``collect/rule.go:54-70``): run one regex
  with ≥1 capture group over the body; each match becomes a child request at
  ``depth+1`` with a configured next rule; optional URL prefix join
  (``dobuan_book.go:75``), optional second capture group carried to the child
  as TmpData (``dobuan_book.go:112-113``), optional per-page top-k truncation
  in match order (``dobuan_book.go:85-90,116-119`` — first 3).
- **predicate_extract** (R2 ``douban_group.go:61-74``, R8
  ``collect/rule.go:72-84``): body matches regex → emit the request URL as the
  item, else nothing.
- **field_extract** (R5 ``dobuan_book.go:131-149``): per-field regexes,
  first-submatch-or-empty (``ExtraString``, ``dobuan_book.go:151-158``);
  integer fields go through strconv.Atoi semantics (failure → 0,
  ``dobuan_book.go:133``); carried TmpData fields merge into the payload;
  wrapped in the Output envelope (``collect/rule.go:41-52``) with the
  wall-clock Time replaced by the deterministic page ``warc_ts``.

Rules are **data** (a RuleSpec row per rule) interpreted by one generic
vectorized operator — the Ray-Data-native equivalent of the reference's
rules-as-JS extension surface (R10, ``engine/crawler_store.go:33-88``): both
shipped JS rules are just parameterized calls to R7/R8, so a declarative spec
covers them with no JS VM.

Regex parity note (SURVEY.md §7.4): Go ``regexp`` is RE2. Every shipped rule
regex avoids backreferences/lookahead, and over UTF-8 text Python ``re``
produces identical spans for these patterns (``[^"]+``, ``[\\s\\S]*?``, lazy
quantifiers). The conformance suite (tests/test_conformance.py) pins this
against the reference's golden HTML for every rule regex.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from crawler_ray.functions.web import FetchSession


def _default_session():
    from crawler_ray.functions.web import FetchSession

    return FetchSession()


@dataclass(frozen=True)
class RuleSpec:
    """One rule row — see FIXTURES.md §3 for the tabular form."""

    task: str
    name: str
    kind: str  # 'link_extract' | 'predicate_extract' | 'field_extract'
    regex: str | None = None
    url_prefix: str = ""  # prefix-join for relative hrefs (dobuan_book.go:75)
    next_rule: str | None = None
    per_page_limit: int | None = None  # top-k truncation; None = unlimited
    carry_field: str | None = None  # group(2) carried to children under this key
    field_regexes: dict[str, str] = field(default_factory=dict)
    int_fields: tuple[str, ...] = ()  # fields parsed via Atoi semantics
    item_fields: tuple[str, ...] = ()  # declared output schema (ItemFields)
    child_priority: int = 0


@dataclass(frozen=True)
class TaskSpec:
    """Crawl task: rules + options (collect/option.go:9-22, collect/task.go:7-13)."""

    name: str
    rules: dict[str, RuleSpec]
    max_depth: int = 5  # collect/option.go:33
    reload: bool = False  # dedup bypass (collect/option.go:14)
    # per-task fetch session (collect/collect.go:62-91: cookie/proxy/UA/
    # timeout); consumed by live Fetcher implementations, carried through
    # the rules-as-data round-trip either way
    fetch: "FetchSession" = field(default_factory=lambda: _default_session())


def _atoi(s: str) -> int:
    """strconv.Atoi semantics: strict integer or 0 (dobuan_book.go:133).

    Go's Atoi rejects surrounding whitespace (unlike Python int()), so the
    accepted grammar is pinned explicitly.
    """
    return int(s) if re.fullmatch(r"[+-]?[0-9]+", s) else 0


class CompiledRule:
    """A RuleSpec with its regexes precompiled — built once per extract actor
    (in ``__init__``), never per batch."""

    __slots__ = ("spec", "pattern", "field_patterns")

    def __init__(self, spec: RuleSpec):
        self.spec = spec
        self.pattern = re.compile(spec.regex) if spec.regex else None
        self.field_patterns = {k: re.compile(v) for k, v in spec.field_regexes.items()}

    def extract(
        self, url: str, body: str, carry: dict[str, str]
    ) -> tuple[list[tuple[str, dict[str, str]]], dict | None]:
        """Run this rule over one page body.

        Returns ``(children, item)`` where children are
        ``(child_url, child_carry)`` in regex match order (already truncated
        to per_page_limit) and item is the payload dict or None —
        mirroring ParseResult (collect/request.go:29-32).
        """
        spec = self.spec
        if spec.kind == "link_extract":
            children: list[tuple[str, dict[str, str]]] = []
            limit = spec.per_page_limit
            for m in self.pattern.finditer(body):
                child_url = spec.url_prefix + m.group(1)
                child_carry = dict(carry)
                if spec.carry_field is not None:
                    child_carry[spec.carry_field] = m.group(2)
                children.append((child_url, child_carry))
                # truncation is applied after the full scan in the reference
                # (requests[:3]) but match order makes early-exit equivalent
                if limit is not None and len(children) >= limit:
                    break
            return children, None
        if spec.kind == "predicate_extract":
            # GetSunRoom: item is the request URL itself (douban_group.go:61-74)
            return [], ({"url": url} if self.pattern.search(body) else None)
        if spec.kind == "field_extract":
            payload: dict[str, object] = {}
            for fname in spec.item_fields:
                if fname in carry:  # TmpData merge (dobuan_book.go:131-132)
                    payload[fname] = carry[fname]
                    continue
                pat = self.field_patterns.get(fname)
                if pat is None:
                    payload[fname] = ""
                    continue
                m = pat.search(body)
                val = m.group(1) if m and m.lastindex else ""
                payload[fname] = _atoi(val) if fname in spec.int_fields else val
            return [], payload
        raise ValueError(f"unknown rule kind: {spec.kind}")


def compile_task(task: TaskSpec) -> dict[str, CompiledRule]:
    return {name: CompiledRule(spec) for name, spec in task.rules.items()}


# --------------------------------------------------------------------------
# Built-in rulesets: the reference's two shipped tasks, expressed as data.
# Regex literals are the *specification* being matched byte-for-byte.
# --------------------------------------------------------------------------

#: douban-book chain: tag page → book list → book detail
#: (parse/doubangroup/dobuan_book.go)
DOUBAN_BOOK = TaskSpec(
    name="douban_book_list",
    max_depth=5,
    rules={
        "tag": RuleSpec(
            task="douban_book_list",
            name="tag",
            kind="link_extract",
            # dobuan_book.go:63
            regex=r'<a href="([^"]+)" class="tag">([^<]+)</a>',
            url_prefix="https://book.douban.com",
            next_rule="book_list",
            per_page_limit=3,  # dobuan_book.go:85-90
        ),
        "book_list": RuleSpec(
            task="douban_book_list",
            name="book_list",
            kind="link_extract",
            # dobuan_book.go:93
            regex=r'<a.*?href="([^"]+)" title="([^"]+)"',
            next_rule="book_detail",
            per_page_limit=3,  # dobuan_book.go:116-119
            carry_field="书名",  # TmpData book_name (dobuan_book.go:112-113)
        ),
        "book_detail": RuleSpec(
            task="douban_book_list",
            name="book_detail",
            kind="field_extract",
            # dobuan_book.go:124-129
            field_regexes={
                "作者": r'<span class="pl"> 作者</span>:[\s\S]*?<a.*?>([^<]+)</a>',
                "出版社": r'<span class="pl">出版社:</span>\s*<a.*?>([^<]+)</a>',
                "页数": r'<span class="pl">页数:</span> ([^<]+)<br/>',
                "价格": r'<span class="pl">定价:</span>([^<]+)<br/>',
                "得分": r'<strong class="ll rating_num " property="v:average">([^<]+)</strong>',
                "简介": r'<div class="intro">[\d\D]*?<p>([^<]+)</p></div>',
            },
            int_fields=("页数",),
            # ItemFields order (dobuan_book.go:45-53)
            item_fields=("书名", "作者", "页数", "出版社", "得分", "价格", "简介"),
        ),
    },
)

#: douban-group chain: discussion list → sun-room predicate
#: (parse/doubangroup/douban_group.go)
DOUBAN_GROUP = TaskSpec(
    name="find_douban_sun_room",
    max_depth=5,
    rules={
        "group_list": RuleSpec(
            task="find_douban_sun_room",
            name="group_list",
            kind="link_extract",
            # douban_group.go:39 (cityListRe)
            regex=r'href="(https://www.douban.com/group/topic/[0-9a-zA-Z]+/)"[^>]*>([^<]+)</a>',
            next_rule="sun_room",
        ),
        "sun_room": RuleSpec(
            task="find_douban_sun_room",
            name="sun_room",
            kind="predicate_extract",
            # douban_group.go:40 (ContentRe)
            regex=r'<div class="topic-content">[\s\S]*?阳台[\s\S]*?<div',
            item_fields=("url",),
        ),
    },
)

#: The synthetic-corpus task (same three-shape chain over synthesized pages;
#: see sources/pages.py). Field regexes deliberately reuse the reference's
#: detail-page shapes so the byte-identical invariant is exercised end to end.
SYNTH_TASK = TaskSpec(
    name="synth_crawl",
    max_depth=5,
    rules={
        "tag": RuleSpec(
            task="synth_crawl",
            name="tag",
            kind="link_extract",
            regex=r'<a href="([^"]+)" class="tag">([^<]+)</a>',
            next_rule="list",
            per_page_limit=None,
        ),
        "list": RuleSpec(
            task="synth_crawl",
            name="list",
            kind="link_extract",
            regex=r'<a class="item" href="([^"]+)" title="([^"]+)">',
            next_rule="detail",
            carry_field="title",
        ),
        "detail": RuleSpec(
            task="synth_crawl",
            name="detail",
            kind="field_extract",
            field_regexes={
                "author": r'<span class="pl"> author</span>:[\s\S]*?<a.*?>([^<]+)</a>',
                "publisher": r'<span class="pl">publisher:</span>\s*<a.*?>([^<]+)</a>',
                "pages": r'<span class="pl">pages:</span> ([^<]+)<br/>',
                "price": r'<span class="pl">price:</span>([^<]+)<br/>',
                "score": r'<strong class="score">([^<]+)</strong>',
                "intro": r'<div class="intro">[\d\D]*?<p>([^<]+)</p></div>',
            },
            int_fields=("pages",),
            item_fields=("title", "author", "pages", "publisher", "score", "price", "intro"),
        ),
    },
)

# Second task over the same synthetic corpus — the multi-task engine
# surface (main/main.go:232-272 builds []*Task; engine/crawler.go:48-75
# seeds each into ONE shared queue): scan tag pages for list links, then
# flag list pages by predicate. Different rule names and a shallower
# depth than SYNTH_TASK, so per-task dispatch, per-task depth limits and
# the shared seen set are all exercised when the two run together.
LINKSCAN_TASK = TaskSpec(
    name="linkscan",
    max_depth=1,
    rules={
        "hub": RuleSpec(
            task="linkscan",
            name="hub",
            kind="link_extract",
            regex=r'<a href="([^"]+)" class="tag">([^<]+)</a>',
            next_rule="leaf",
        ),
        "leaf": RuleSpec(
            task="linkscan",
            name="leaf",
            kind="predicate_extract",
            regex=r'class="item"',
            item_fields=("url",),
        ),
    },
)

BUILTIN_TASKS: dict[str, TaskSpec] = {
    t.name: t for t in (DOUBAN_BOOK, DOUBAN_GROUP, SYNTH_TASK, LINKSCAN_TASK)
}


# --------------------------------------------------------------------------
# Rules as data (R10/S4 parity): the reference's extension surface is rules
# shipped as JS source strings interpreted at runtime
# (engine/crawler_store.go:33-88, TaskModel collect/task.go:16-22). Both
# shipped JS rules are parameterized link/predicate extracts, so the
# serializable form here is a table of RuleSpec rows (FIXTURES.md §3) — a
# user ships a Parquet/JSON rule table instead of code, and the one generic
# vectorized extract operator interprets it.
# --------------------------------------------------------------------------


def task_to_rows(task: TaskSpec) -> list[dict]:
    rows = []
    for spec in task.rules.values():
        rows.append(
            {
                "task": spec.task,
                "name": spec.name,
                "kind": spec.kind,
                "regex": spec.regex,
                "url_prefix": spec.url_prefix,
                "next_rule": spec.next_rule,
                "per_page_limit": spec.per_page_limit,
                "carry_field": spec.carry_field,
                "field_regexes": dict(spec.field_regexes),
                "int_fields": list(spec.int_fields),
                "item_fields": list(spec.item_fields),
                "child_priority": spec.child_priority,
                "max_depth": task.max_depth,
                "reload": task.reload,
                "cookie": task.fetch.cookie,
                "proxies": list(task.fetch.proxies),
                "ua_seed": task.fetch.ua_seed,
            }
        )
    return rows


def task_from_rows(rows: list[dict]) -> TaskSpec:
    """Rebuild a TaskSpec from its tabular form (inverse of task_to_rows)."""
    if not rows:
        raise ValueError("empty rule table")
    rules = {}
    for r in rows:
        rules[r["name"]] = RuleSpec(
            task=r["task"],
            name=r["name"],
            kind=r["kind"],
            regex=r.get("regex"),
            url_prefix=r.get("url_prefix") or "",
            next_rule=r.get("next_rule"),
            per_page_limit=r.get("per_page_limit"),
            carry_field=r.get("carry_field"),
            field_regexes=dict(r.get("field_regexes") or {}),
            int_fields=tuple(r.get("int_fields") or ()),
            item_fields=tuple(r.get("item_fields") or ()),
            child_priority=int(r.get("child_priority") or 0),
        )
    first = rows[0]
    from crawler_ray.functions.web import FetchSession

    return TaskSpec(
        name=first["task"],
        rules=rules,
        max_depth=int(first.get("max_depth", 5)),
        reload=bool(first.get("reload", False)),
        fetch=FetchSession(
            cookie=first.get("cookie") or "",
            proxies=tuple(first.get("proxies") or ()),
            ua_seed=int(first.get("ua_seed", 42)),
        ),
    )
