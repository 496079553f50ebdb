"""Extract stage: the generic rule-engine operator, plus canonicalize.

One actor-pool ``map_batches`` stage interprets *all* rules (SURVEY.md R1–R10
→ rules.py): regexes are compiled once per actor in ``__init__``; per batch
the stage decodes bodies and dispatches rows by their ``rule`` column
(``engine/crawler.go:122-126``). Output is a **union table** with a ``kind``
discriminator — Ray Data stages have one output, so frontier rows, item rows
and golden-text rows travel in one stream and the driver routes them with
vectorized filters on the materialized result:

- ``kind='frontier'``: child requests at depth+1 (ParseResult.Requests)
- ``kind='item'``: JSON payloads in declared ItemFields order
  (ParseResult.Items + Output envelope ``collect/rule.go:41-52``; wall-clock
  Time replaced by the page's ``warc_ts``)
- ``kind='text'``: the per-url extracted text (the byte-identical invariant
  column: link rules → newline-joined child urls, predicate rules → matched
  url or '', field rules → payload JSON with sorted keys)

The child ``seq`` is the parent's seq plus a 4-byte big-endian match index —
a length-prefixed total order ``(priority desc, seq lexicographic asc)`` that
reproduces the reference's priority-then-FIFO ordering deterministically
under any parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from crawler_ray.functions.url import canonicalize, host_of, url_hash64, urlseen_key
from crawler_ray.rules import BUILTIN_TASKS, CompiledRule, TaskSpec, compile_task

FRONTIER_FIELDS = [
    ("kind", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("key", pa.string()),
    ("h64", pa.uint64()),
    ("depth", pa.int32()),
    ("priority", pa.int32()),
    ("seq", pa.binary()),
    ("attempt", pa.int32()),
    ("rule", pa.string()),
    ("carry", pa.string()),
    ("ts", pa.timestamp("us")),
    ("payload", pa.string()),
    ("outcome", pa.string()),
]
EXTRACT_SCHEMA = pa.schema(FRONTIER_FIELDS)


def canonicalize_fn(max_depth: int):
    """Stateless map_batches task: canonical url + host + seen-key + shard
    hash, and the depth gate (``collect/request.go:34-40``). Fully
    vectorized except the md5 loop (hashlib is C-bound)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        batch = batch.filter(pc.less_equal(batch.column("depth"), max_depth))
        if batch.num_rows == 0:
            return batch
        urls = canonicalize(batch.column("url").combine_chunks())
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["url"] = urls
        cols["host"] = host_of(urls)
        cols["key"] = urlseen_key(urls)
        cols["h64"] = url_hash64(urls)
        return pa.table(cols)

    return fn


class Extractor:
    """Actor-pool stage; rules compiled once per actor."""

    def __init__(self, task: TaskSpec | str):
        if isinstance(task, str):
            task = BUILTIN_TASKS[task]
        self.task = task
        self.rules: dict[str, CompiledRule] = compile_task(task)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name, _ in FRONTIER_FIELDS}

        def emit(kind, url, host="", key="", h64=0, depth=0, priority=0, seq=b"",
                 attempt=0, rule="", carry="{}", ts=None, payload=None, outcome=""):
            out["kind"].append(kind)
            out["url"].append(url)
            out["host"].append(host)
            out["key"].append(key)
            out["h64"].append(h64)
            out["depth"].append(depth)
            out["priority"].append(priority)
            out["seq"].append(seq)
            out["attempt"].append(attempt)
            out["rule"].append(rule)
            out["carry"].append(carry)
            out["ts"].append(ts)
            out["payload"].append(payload)
            out["outcome"].append(outcome)

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        rules = batch.column("rule").to_pylist()
        depths = batch.column("depth").to_pylist()
        seqs = batch.column("seq").to_pylist()
        carries = batch.column("carry").to_pylist()
        if "warc_ts" in batch.column_names:
            tss = batch.column("warc_ts").to_pylist()
        else:
            tss = [None] * len(urls)

        for i in range(len(urls)):
            rule = self.rules.get(rules[i])
            if rule is None:
                continue  # unknown rule name: row dropped, as a missing Trunk entry would nil-deref in the reference — we drop instead
            body = htmls[i].decode("utf-8", errors="replace")
            carry = json.loads(carries[i]) if carries[i] else {}
            children, item = rule.extract(urls[i], body, carry)
            spec = rule.spec
            for idx, (child_url, child_carry) in enumerate(children):
                emit(
                    "frontier",
                    child_url,
                    depth=depths[i] + 1,
                    priority=spec.child_priority,
                    seq=seqs[i] + idx.to_bytes(4, "big"),
                    rule=spec.next_rule or "",
                    carry=json.dumps(child_carry, ensure_ascii=False, sort_keys=True),
                )
            if item is not None:
                payload = json.dumps(item, ensure_ascii=False, sort_keys=True)
                emit("item", urls[i], rule=rules[i], ts=tss[i], payload=payload)
            # golden-text row (byte-identical invariant)
            if spec.kind == "link_extract":
                text = "\n".join(u for u, _ in children)
            elif spec.kind == "predicate_extract":
                text = urls[i] if item is not None else ""
            else:
                text = json.dumps(item, ensure_ascii=False, sort_keys=True)
            emit("text", urls[i], rule=rules[i], ts=tss[i], payload=text)

        arrays = [
            pa.array(out[name], type=typ) for name, typ in FRONTIER_FIELDS
        ]
        return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


_EXTRACTOR_CACHE: dict[str, Extractor] = {}


def make_extract_fn(task: TaskSpec):
    """Task-fn variant with a per-worker-process Extractor cache (regexes
    compile once per worker) — see make_fetch_fn for why the iterative
    driver prefers cached tasks over per-execution actor pools."""

    def fn(batch: pa.Table) -> pa.Table:
        ex = _EXTRACTOR_CACHE.get(task.name)
        if ex is None:
            ex = _EXTRACTOR_CACHE[task.name] = Extractor(task)
        return ex(batch)

    return fn


class FetchExtract:
    """Fused fetch → outcome-classify → extract stage for the iterative
    driver: one ``map_batches`` pass per generation, so the raw ``html``
    bytes never enter the object store — a batch's pages are fetched,
    classified and parsed inside one task, and only the (small) derived rows
    flow on. Emits a union table with ``kind`` ∈:

    - ``order``: one row per attempted fetch with its outcome (the crawl
      schedule record, engine/crawler.go:95-120)
    - ``failed``: full frontier columns for missing/banned rows (the
      unmark-and-requeue path, engine/crawler.go:179-194); short bodies get
      an order row only (dropped but stay visited)
    - ``frontier`` / ``item`` / ``text``: the extract outputs (ok rows)
    """

    def __init__(self, pages_dir: str, task: TaskSpec):
        from crawler_ray.sources.pages import BAN_STRING, MIN_BODY_BYTES
        from crawler_ray.stages.fetch import SimulatedFetcher

        self.fetcher = SimulatedFetcher(pages_dir)
        self.extractor = Extractor(task)
        self.ban = BAN_STRING
        self.min_bytes = MIN_BODY_BYTES

    def __call__(self, batch: pa.Table) -> pa.Table:
        fetched = self.fetcher(batch)
        htmls = fetched.column("html").to_pylist()
        tss = fetched.column("warc_ts").to_pylist()
        cols = {
            name: fetched.column(name).to_pylist()
            for name in ("url", "host", "key", "h64", "depth", "priority", "seq",
                         "attempt", "rule", "carry")
        }

        out: dict[str, list] = {name: [] for name, _ in FRONTIER_FIELDS}

        def emit(kind, i, *, rule=None, ts=None, payload=None, outcome="",
                 url=None, depth=None, priority=None, seq=None, carry=None,
                 attempt=None):
            out["kind"].append(kind)
            out["url"].append(url if url is not None else cols["url"][i])
            out["host"].append(cols["host"][i])
            out["key"].append(cols["key"][i])
            out["h64"].append(cols["h64"][i])
            out["depth"].append(depth if depth is not None else cols["depth"][i])
            out["priority"].append(priority if priority is not None else cols["priority"][i])
            out["seq"].append(seq if seq is not None else cols["seq"][i])
            out["attempt"].append(attempt if attempt is not None else cols["attempt"][i])
            out["rule"].append(rule if rule is not None else cols["rule"][i])
            out["carry"].append(carry if carry is not None else cols["carry"][i])
            out["ts"].append(ts)
            out["payload"].append(payload)
            out["outcome"].append(outcome)

        rules = self.extractor.rules
        for i in range(len(htmls)):
            html = htmls[i]
            if html is None:
                outcome = "missing"
            else:
                body = html.decode("utf-8", errors="replace")
                if self.ban in body:
                    outcome = "banned"
                elif len(html) < self.min_bytes:
                    outcome = "short"
                else:
                    outcome = "ok"
            emit("order", i, outcome=outcome)
            if outcome in ("missing", "banned"):
                emit("failed", i, outcome=outcome)
                continue
            if outcome == "short":
                continue
            rule = rules.get(cols["rule"][i])
            if rule is None:
                continue  # unknown rule: dropped (missing Trunk entry)
            carry = json.loads(cols["carry"][i]) if cols["carry"][i] else {}
            children, item = rule.extract(cols["url"][i], body, carry)
            spec = rule.spec
            for idx, (child_url, child_carry) in enumerate(children):
                emit(
                    "frontier", i,
                    url=child_url,
                    depth=cols["depth"][i] + 1,
                    priority=spec.child_priority,
                    seq=cols["seq"][i] + idx.to_bytes(4, "big"),
                    rule=spec.next_rule or "",
                    carry=json.dumps(child_carry, ensure_ascii=False, sort_keys=True),
                    attempt=0,  # children start fresh regardless of parent retries
                )
            if item is not None:
                payload = json.dumps(item, ensure_ascii=False, sort_keys=True)
                emit("item", i, ts=tss[i], payload=payload)
            if spec.kind == "link_extract":
                text = "\n".join(u for u, _ in children)
            elif spec.kind == "predicate_extract":
                text = cols["url"][i] if item is not None else ""
            else:
                text = json.dumps(item, ensure_ascii=False, sort_keys=True)
            emit("text", i, ts=tss[i], payload=text)

        arrays = [pa.array(out[name], type=typ) for name, typ in FRONTIER_FIELDS]
        return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


_FETCH_EXTRACT_CACHE: dict[tuple[str, str], FetchExtract] = {}


def make_fetch_extract_fn(pages_dir: str, task: TaskSpec):
    """Per-worker-process cached FetchExtract task fn."""

    def fn(batch: pa.Table) -> pa.Table:
        fe = _FETCH_EXTRACT_CACHE.get((pages_dir, task.name))
        if fe is None:
            fe = _FETCH_EXTRACT_CACHE[(pages_dir, task.name)] = FetchExtract(pages_dir, task)
        return fe(batch)

    return fn


def items_to_columns(task: TaskSpec, rule_name: str):
    """map_batches fn: decode item JSON payloads into typed columns for the
    Parquet items sink (schema = ItemFields + url + ts, matching the
    reference's dynamic DDL W2 ``collector/sqlstorage/sqlstorage.go:68-88``
    with MEDIUMTEXT→string and the declared int fields typed int64)."""
    spec = task.rules[rule_name]

    def fn(batch: pa.Table) -> pa.Table:
        payloads = [json.loads(p) for p in batch.column("payload").to_pylist()]
        cols: dict[str, pa.Array] = {}
        for fname in spec.item_fields:
            typ = pa.int64() if fname in spec.int_fields else pa.string()
            cols[fname] = pa.array([p.get(fname, "") for p in payloads], type=typ)
        cols["url"] = batch.column("url")
        cols["ts"] = batch.column("ts")
        return pa.table(cols)

    return fn
