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
import os

import pyarrow as pa
import pyarrow.compute as pc

from crawler_ray.functions.url import canonicalize, host_of, url_identity
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
    ("task", pa.string()),
    ("rule", pa.string()),
    ("carry", pa.string()),
    ("ts", pa.timestamp("us")),
    ("payload", pa.string()),
    ("outcome", pa.string()),
]
EXTRACT_SCHEMA = pa.schema(FRONTIER_FIELDS)


def canonicalize_fn(max_depth: "int | dict[str, int]", default_task: str | None = None):
    """Stateless map_batches task: canonical url + host + seen-key + shard
    hash, and the depth gate (``collect/request.go:34-40``). Fully
    vectorized except the md5 loop (hashlib is C-bound).

    ``max_depth`` may be a per-task dict (the multi-task engine — each
    task's rows get its own ``min(politeness, task)`` limit; rows naming an
    unknown task are dropped, the missing-Trunk semantics). ``default_task``
    backfills the ``task`` column for pre-multi-task frontiers (older
    checkpoints / ledgers carry no task, or an empty string)."""
    limits = max_depth if isinstance(max_depth, dict) else None
    if limits is not None:
        _lim_keys = pa.array(list(limits), pa.string())
        _lim_vals = pa.array([limits[t] for t in limits], pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if default_task is not None:
            if "task" not in batch.column_names:
                batch = batch.append_column(
                    "task", pa.array([default_task] * batch.num_rows, pa.string())
                )
            else:
                tcol = batch.column("task")
                blank = pc.equal(pc.fill_null(tcol, ""), "")
                if pc.any(blank).as_py():
                    batch = batch.set_column(
                        batch.schema.get_field_index("task"),
                        "task",
                        pc.if_else(blank, pa.scalar(default_task), tcol).combine_chunks(),
                    )
        if limits is None:
            batch = batch.filter(pc.less_equal(batch.column("depth"), max_depth))
        else:
            # per-row limit by task; index_in miss → null limit → row dropped
            idx = pc.index_in(batch.column("task"), value_set=_lim_keys)
            lim = pc.take(_lim_vals, idx)
            batch = batch.filter(pc.less_equal(batch.column("depth"), lim))
        if batch.num_rows == 0:
            return batch
        urls = canonicalize(batch.column("url").combine_chunks())
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["url"] = urls
        cols["host"] = host_of(urls)
        cols["key"], cols["h64"] = url_identity(urls)
        return pa.table(cols)

    return fn


_COL_DEFAULTS = {
    "host": ("", pa.string()),
    "key": ("", pa.string()),
    "h64": (0, pa.uint64()),
    "depth": (0, pa.int32()),
    "priority": (0, pa.int32()),
    "attempt": (0, pa.int32()),
    "task": ("", pa.string()),
    "carry": ("{}", pa.string()),
}


def _with_defaults(batch: pa.Table) -> pa.Table:
    """Fill in any missing frontier columns so the columnar assembly below
    can treat every input uniformly (the full-corpus Extractor path feeds
    tables without host/key/h64)."""
    n = batch.num_rows
    for name, (val, typ) in _COL_DEFAULTS.items():
        if name not in batch.column_names:
            batch = batch.append_column(name, pa.array([val] * n, typ))
    if "warc_ts" not in batch.column_names:
        batch = batch.append_column("warc_ts", pa.nulls(n, pa.timestamp("us")))
    return batch


def _empty_extract_table() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], type=typ) for _, typ in FRONTIER_FIELDS], schema=EXTRACT_SCHEMA
    )


_BASE_COLS = [n for n, _ in FRONTIER_FIELDS if n not in ("kind", "ts", "payload", "outcome")]


def _rows_like(src: pa.Table, idx, kind: str, *, outcome=None, ts=None,
               payload=None) -> pa.Table:
    """Sub-table in EXTRACT_SCHEMA built by columnar ``take`` of the
    frontier columns — no per-row Python. Only the frontier base columns
    are taken (a take that drags the multi-MB ``html`` column along was
    ~25% of the fused stage's batch time)."""
    src = src.select(_BASE_COLS)
    sub = src.take(idx) if idx is not None else src
    n = sub.num_rows
    arrays = []
    for name, typ in FRONTIER_FIELDS:
        if name == "kind":
            arrays.append(pa.array([kind] * n, typ))
        elif name == "ts":
            arrays.append(ts if ts is not None else pa.nulls(n, typ))
        elif name == "payload":
            arrays.append(payload if payload is not None else pa.nulls(n, typ))
        elif name == "outcome":
            arrays.append(outcome if outcome is not None else pa.array([""] * n, typ))
        else:
            arrays.append(sub.column(name).cast(typ).combine_chunks())
    return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


def _extract_parts(
    rules: dict[tuple[str, str], CompiledRule],
    ok: pa.Table,
    bodies: list[str],
    default_task: str = "",
) -> list[pa.Table]:
    """Run the rule engine over rows of ``ok`` (frontier cols + warc_ts;
    decoded ``bodies`` aligned by row). ``rules`` is keyed by
    ``(task, rule)`` — the multi-task dispatch surface
    (``engine/crawler.go:122-126`` looks the rule up on the request's Task).

    The per-row work is only the C-bound regex scan (``rule.extract``); all
    output assembly is columnar (the r1 version appended 14 Python lists per
    emitted row — at ~10 emits per page that was the extract stage's real
    cost, not the regexes). Returns frontier/item/text sub-tables.
    """
    import numpy as np

    urls = ok.column("url").to_pylist()
    rules_col = ok.column("rule").to_pylist()
    tasks_col = ok.column("task").to_pylist()
    carries = ok.column("carry").to_pylist()
    seqs = ok.column("seq").to_pylist()
    tss = ok.column("warc_ts")

    child_parent: list[int] = []  # local row index of the parent
    child_url: list[str] = []
    child_seq: list[bytes] = []
    child_carry: list[str] = []
    child_rule: list[str] = []
    child_prio: list[int] = []
    item_local: list[int] = []
    item_payload: list[str] = []
    text_local: list[int] = []
    text_payload: list[str] = []
    for i in range(len(urls)):
        rule = rules.get((tasks_col[i] or default_task, rules_col[i]))
        if rule is None:
            continue  # unknown (task, rule): dropped (a missing Trunk entry)
        raw_carry = carries[i]
        # fast path: most rows carry nothing — skip the json round-trip
        carry = {} if not raw_carry or raw_carry == "{}" else json.loads(raw_carry)
        children, item = rule.extract(urls[i], bodies[i], carry)
        spec = rule.spec
        seq_i = seqs[i]
        next_rule = spec.next_rule or ""
        prio = spec.child_priority
        for idx, (curl, ccarry) in enumerate(children):
            child_parent.append(i)
            child_url.append(curl)
            child_seq.append(seq_i + idx.to_bytes(4, "big"))
            child_carry.append(
                "{}" if not ccarry else json.dumps(ccarry, ensure_ascii=False, sort_keys=True)
            )
            child_rule.append(next_rule)
            child_prio.append(prio)
        payload_json = (
            json.dumps(item, ensure_ascii=False, sort_keys=True) if item is not None else None
        )
        if item is not None:
            item_local.append(i)
            item_payload.append(payload_json)
        # golden-text row (byte-identical invariant); for field rules the
        # text IS the payload json — encode once
        if spec.kind == "link_extract":
            text = "\n".join(u for u, _ in children)
        elif spec.kind == "predicate_extract":
            text = urls[i] if item is not None else ""
        else:
            text = payload_json if payload_json is not None else json.dumps(item)
        text_local.append(i)
        text_payload.append(text)

    parts: list[pa.Table] = []
    if child_parent:
        par = np.asarray(child_parent)
        nc = len(child_parent)
        arrays = []
        for name, typ in FRONTIER_FIELDS:
            if name == "kind":
                arrays.append(pa.array(["frontier"] * nc, typ))
            elif name == "url":
                arrays.append(pa.array(child_url, typ))
            elif name == "depth":
                arrays.append(pc.add(ok.column("depth").take(par), 1).cast(typ))
            elif name == "priority":
                arrays.append(pa.array(child_prio, typ))
            elif name == "seq":
                arrays.append(pa.array(child_seq, typ))
            elif name == "attempt":
                # children start fresh regardless of parent retries
                arrays.append(pa.array([0] * nc, typ))
            elif name == "rule":
                arrays.append(pa.array(child_rule, typ))
            elif name == "carry":
                arrays.append(pa.array(child_carry, typ))
            elif name in ("ts", "payload"):
                arrays.append(pa.nulls(nc, typ))
            elif name == "outcome":
                arrays.append(pa.array([""] * nc, typ))
            else:  # host/key/h64: parent's values (recomputed by canonicalize)
                arrays.append(ok.column(name).take(par).cast(typ).combine_chunks())
        parts.append(pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA))
    if item_local:
        idx = np.asarray(item_local)
        parts.append(
            _rows_like(ok, idx, "item", ts=tss.take(idx),
                       payload=pa.array(item_payload, pa.string()))
        )
    if text_local:
        idx = np.asarray(text_local)
        parts.append(
            _rows_like(ok, idx, "text", ts=tss.take(idx),
                       payload=pa.array(text_payload, pa.string()))
        )
    return parts


def normalize_tasks(task) -> "list[TaskSpec]":
    """``TaskSpec | str | sequence of either`` → list of TaskSpecs (the
    multi-task engine surface, ``main/main.go:232-272`` builds ``[]*Task``)."""
    if isinstance(task, (TaskSpec, str)):
        task = [task]
    out = [BUILTIN_TASKS[t] if isinstance(t, str) else t for t in task]
    if not out:
        raise ValueError("at least one TaskSpec is required")
    names = [t.name for t in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate task names: {names}")
    return out


class Extractor:
    """Actor-pool stage; rules compiled once per actor. Accepts one task or
    a list — rules dispatch by the row's ``(task, rule)`` columns; rows with
    an empty task column belong to the first (primary) task."""

    def __init__(self, task: "TaskSpec | str | list"):
        tasks = normalize_tasks(task)
        self.task = tasks[0]
        self.tasks = {t.name: t for t in tasks}
        self.rules: dict[tuple[str, str], CompiledRule] = {
            (t.name, rn): cr for t in tasks for rn, cr in compile_task(t).items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_extract_table()
        bodies = [
            h.decode("utf-8", errors="replace") for h in batch.column("html").to_pylist()
        ]
        parts = _extract_parts(
            self.rules, _with_defaults(batch), bodies, default_task=self.task.name
        )
        return pa.concat_tables(parts) if parts else _empty_extract_table()


_EXTRACTOR_CACHE: dict[str, Extractor] = {}


def _tasks_key(task) -> str:
    return "+".join(t.name for t in normalize_tasks(task))


def make_extract_fn(task: TaskSpec):
    """Task-fn variant with a per-worker-process Extractor cache (regexes
    compile once per worker) — see make_fetch_fn for why the iterative
    driver prefers cached tasks over per-execution actor pools."""
    key = _tasks_key(task)

    def fn(batch: pa.Table) -> pa.Table:
        ex = _EXTRACTOR_CACHE.get(key)
        if ex is None:
            ex = _EXTRACTOR_CACHE[key] = Extractor(task)
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
    - ``frontier``: extracted children (ok rows) AND retry rows for
      missing/banned fetches with ``attempt+1 < max_attempts`` (the
      requeue path, engine/crawler.go:179-194, fused here so the driver
      needs no separate failure pass); short bodies get an order row only
      (dropped but stay visited). The driver unmarks failed keys from the
      order parquet's outcome column.
    - ``item`` / ``text``: the extract outputs (ok rows)
    """

    def __init__(self, pages_dir: str, task: "TaskSpec | list", max_attempts: int = 2,
                 fetcher_factory=None, ledger_dir: str | None = None):
        from crawler_ray.sources.pages import BAN_STRING, MIN_BODY_BYTES
        from crawler_ray.stages.fetch import SimulatedFetcher

        # fetcher_factory: the Fetcher extension seam (fetch.py protocol) —
        # e.g. lambda: HttpFetcher(session) for a live crawl; default is the
        # Parquet probe (the primary path per BASELINE.json input_hint). A
        # dict {task_name: factory} gives each task its own fetch session
        # (per-task cookie/proxy/UA — collect/collect.go:62-91); the batch
        # is then split by task around the fetch and re-concatenated (row
        # order within a batch is immaterial — ordering lives in seq).
        self.fetchers: dict[str, object] | None = None
        if isinstance(fetcher_factory, dict):
            self.fetchers = {name: f() for name, f in fetcher_factory.items()}
            self.fetcher = next(iter(self.fetchers.values()))
        else:
            self.fetcher = (
                fetcher_factory() if fetcher_factory else SimulatedFetcher(pages_dir)
            )
        self.extractor = Extractor(task)
        self.ban = BAN_STRING
        self.min_bytes = MIN_BODY_BYTES
        self.max_attempts = max_attempts
        # incremental-recrawl ledger (build_ts_ledger): SHARDED url-sorted
        # previous fetch timestamps (shard = h64 % num_shards), each shard
        # memory-mapped once per worker like the fetch index; an ok fetch
        # whose warc_ts equals the ledger entry becomes outcome "unchanged"
        # — recorded, kept marked, NOT re-extracted. Missing shard files are
        # empty shards (the build writes only populated ones).
        self.ledger_shards = None
        self.ledger_nshards = 0
        if ledger_dir is not None:
            import json

            import numpy as np

            with open(os.path.join(ledger_dir, "meta.json")) as fh:
                self.ledger_nshards = int(json.load(fh)["num_shards"])
            shards = []
            for s in range(self.ledger_nshards):
                up = os.path.join(ledger_dir, f"urls_{s:04d}.npy")
                if os.path.exists(up):
                    shards.append(
                        (
                            np.load(up, mmap_mode="r"),
                            np.load(os.path.join(ledger_dir, f"ts_{s:04d}.npy")),
                        )
                    )
                else:
                    shards.append(None)
            self.ledger_shards = shards

    def _ledger_same(self, url_bin: pa.Array, h64_np, ts_np) -> "np.ndarray":
        """Vectorized ledger probe shared by the conditional-fetch fast path
        and the post-fetch check: True where the url exists in the ledger
        with exactly this capture ts (searchsorted per ledger shard,
        h64 % nshards routing — the fetch index's S-width trick)."""
        import numpy as np

        raw = url_bin.to_numpy(zero_copy_only=False)
        lens = pc.binary_length(url_bin).to_numpy()
        sh = (h64_np % np.uint64(self.ledger_nshards)).astype(np.int64)
        same = np.zeros(len(raw), dtype=bool)
        for s in np.unique(sh):
            shard = self.ledger_shards[int(s)]
            if shard is None or not len(shard[0]):
                continue
            l_urls, l_ts = shard
            sel = np.flatnonzero(sh == s)
            width = l_urls.dtype.itemsize
            probe = raw[sel].astype(f"S{width}")
            pos = np.minimum(np.searchsorted(l_urls, probe), len(l_urls) - 1)
            hit = (l_urls[pos] == probe) & (lens[sel] <= width)
            same[sel] = hit & (l_ts[pos] == ts_np[sel])
        return same

    def _fetch(self, batch: pa.Table) -> pa.Table:
        if self.fetchers is None:
            return self.fetcher(batch)
        parts = []
        tcol = batch.column("task")
        for name in sorted(set(pc.drop_null(pc.unique(tcol)).to_pylist())):
            sub = batch.filter(pc.equal(tcol, name))
            parts.append(self.fetchers[name](sub))
        return pa.concat_tables(parts) if parts else self.fetcher(batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        pre_parts: list[pa.Table] = []
        # single deterministic-single-fetcher gate shared by the retry fast
        # path, the conditional-fetch fast path and the post-fetch ledger
        # probe skip: the skip is only provably all-False because the fast
        # path ran under the SAME predicate — keep it one expression
        det_single = self.fetchers is None and getattr(
            self.fetcher, "deterministic", False
        )
        if det_single and batch.num_rows:
            # Retry rows (attempt > 0) under a deterministic fetcher resolve
            # from the membership probe alone: a retry exists only for a
            # prior *missing* or *banned* outcome, and an immutable corpus
            # reproduces it exactly — present ⇒ it was (and is) banned,
            # absent ⇒ still missing. Skipping the refetch avoids
            # re-decompressing a row group per banned retry (measured: the
            # retry generation's fused stage burned ~80 s CPU on 32 cpus at
            # the bench scale re-reading multi-MB html just to re-find the
            # ban marker). Order rows, requeue rows and the seen-unmark path
            # are byte-identical to a real refetch; a live fetcher
            # (deterministic=False) always refetches.
            att_np = np.asarray(batch.column("attempt").combine_chunks())
            retry_np = att_np > 0
            if retry_np.any():
                retry = batch.filter(pa.array(retry_np))
                batch = batch.filter(pa.array(~retry_np))
                exists, pos_r = self.fetcher.membership(retry)
                outcome_r = pa.array(
                    np.where(exists, "banned", "missing"), pa.string()
                )
                # byte-identity with a real refetch: present (banned) rows
                # carry the page's warc_ts — a ts-only column read, no html
                ts_full = np.zeros(len(exists), np.int64)
                if exists.any():
                    ts_full[exists] = self.fetcher.timestamps_at(pos_r[exists])
                ts_r = pa.array(ts_full, pa.int64(), mask=~exists).cast(
                    pa.timestamp("us")
                )
                pre_parts.append(
                    _rows_like(retry, None, "order", outcome=outcome_r, ts=ts_r)
                )
                att_r = retry.column("attempt")
                again = np.flatnonzero(
                    np.asarray(att_np[retry_np]) + 1 < self.max_attempts
                )
                if again.size:
                    bumped_r = retry.set_column(
                        retry.schema.get_field_index("attempt"),
                        "attempt",
                        pc.add(att_r, 1).cast(pa.int32()),
                    )
                    pre_parts.append(_rows_like(bumped_r, again, "frontier"))
                if batch.num_rows == 0:
                    return pa.concat_tables(pre_parts)

        if self.ledger_shards is not None and det_single and batch.num_rows:
            # conditional fetch (the If-Modified-Since shape): probe
            # membership + capture ts WITHOUT touching html; a url whose
            # corpus ts equals its ledger entry is 'unchanged' — recorded,
            # kept marked, never extracted — so decompressing its body was
            # pure waste. The ledger holds only previously-ok urls, and the
            # corpus is immutable, so a ts-equal hit cannot reclassify as
            # banned/short: the emitted rows are byte-identical to a full
            # refetch. A live fetcher (deterministic=False) skips this and
            # relies on the post-fetch check below.
            import numpy as np

            exists_c, pos_c = self.fetcher.membership(batch)
            if exists_c.any():
                ts_probe = np.full(len(exists_c), -1, np.int64)
                ts_probe[exists_c] = self.fetcher.timestamps_at(pos_c[exists_c])
                url_bin = pc.cast(batch.column("url").combine_chunks(), pa.binary())
                h64_np = batch.column("h64").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                same_c = self._ledger_same(url_bin, h64_np, ts_probe) & exists_c
                if same_c.any():
                    unch = batch.filter(pa.array(same_c))
                    ts_u = pa.array(ts_probe[same_c], pa.int64()).cast(
                        pa.timestamp("us")
                    )
                    pre_parts.append(
                        _rows_like(
                            unch,
                            None,
                            "order",
                            outcome=pa.array(["unchanged"] * unch.num_rows),
                            ts=ts_u,
                        )
                    )
                    batch = batch.filter(pa.array(~same_c))
                    if batch.num_rows == 0:
                        return pa.concat_tables(pre_parts)

        fetched = self._fetch(batch)
        html = fetched.column("html")
        # vectorized outcome classification (engine/crawler.go:95-120)
        missing = pc.is_null(html)
        # binary-direct match (UTF-8 bytes of the ban string): a cast to
        # pa.string() raises ArrowInvalid on any non-UTF-8 body, and a live
        # fetcher's transcode can legitimately fall back to raw bytes.
        # match/length run on the nullable column and fill AFTER, so the
        # classify path never materializes a filled copy of the body bytes.
        banned = pc.fill_null(pc.match_substring(html, self.ban), False)
        short = pc.and_(
            pc.invert(pc.or_(missing, banned)),
            pc.less(pc.fill_null(pc.binary_length(html), 0), self.min_bytes),
        )
        outcome = pc.if_else(
            missing, pa.scalar("missing"),
            pc.if_else(banned, pa.scalar("banned"),
                       pc.if_else(short, pa.scalar("short"), pa.scalar("ok"))),
        )
        if self.ledger_shards is not None and not det_single:
            # incremental recrawl for LIVE fetchers: an ok body whose
            # warc_ts equals the previous run's ledger entry is "unchanged"
            # — vectorized searchsorted probes grouped by ledger shard
            # (h64 % nshards, the same S-width trick as the fetch index).
            # Deterministic fetchers skip this: their conditional-fetch
            # fast path above already removed every ts-equal row, so this
            # probe is provably all-False for them.
            out_np = np.asarray(outcome.combine_chunks(), dtype=object)
            ok_mask = out_np == "ok"
            if ok_mask.any():
                url_bin = pc.cast(fetched.column("url").combine_chunks(), pa.binary())
                ts_np = (
                    fetched.column("warc_ts").combine_chunks()
                    .cast(pa.int64()).fill_null(-1)
                    .to_numpy(zero_copy_only=False)
                )
                h64_np = fetched.column("h64").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                same = self._ledger_same(url_bin, h64_np, ts_np) & ok_mask
                if same.any():
                    out_np = np.where(same, "unchanged", out_np)
                    # keep chunked so downstream combine_chunks() calls hold
                    outcome = pa.chunked_array([pa.array(out_np, pa.string())])

        parts: list[pa.Table] = []
        # order: one row per attempted fetch (fetch ts attached — the next
        # run's ledger is built from these rows) — pure table ops
        parts.append(
            _rows_like(
                fetched, None, "order", outcome=outcome,
                ts=fetched.column("warc_ts").combine_chunks().cast(pa.timestamp("us")),
            )
        )
        # retry rows: failed fetches re-enter the next frontier with
        # attempt+1 (unchanged url/seq/priority — ordering stays stable)
        attempts = fetched.column("attempt")
        retry_mask = pc.and_(
            pc.or_(missing, banned),
            pc.less(pc.add(attempts, 1), self.max_attempts),
        )
        retry_idx = np.flatnonzero(np.asarray(retry_mask.combine_chunks()))
        if retry_idx.size:
            bumped = fetched.set_column(
                fetched.schema.get_field_index("attempt"),
                "attempt",
                pc.add(attempts, 1).cast(pa.int32()),
            )
            parts.append(_rows_like(bumped, retry_idx, "frontier"))
        # extraction only over ok rows; the take works on a slim projection
        # so the multi-MB html column is never copied — bodies are plucked
        # straight from the original column
        ok_idx = np.flatnonzero(np.asarray(pc.equal(outcome, "ok").combine_chunks()))
        if ok_idx.size:
            slim = fetched.select(_BASE_COLS + ["warc_ts"])
            ok_html = fetched.column("html").take(pa.array(ok_idx)).to_pylist()
            bodies = [h.decode("utf-8", errors="replace") for h in ok_html]
            parts.extend(
                _extract_parts(self.extractor.rules, slim.take(ok_idx), bodies,
                               default_task=self.extractor.task.name)
            )
        return pa.concat_tables(pre_parts + parts)


_FETCH_EXTRACT_CACHE: dict[tuple, FetchExtract] = {}


def make_fetch_extract_fn(pages_dir: str, task: "TaskSpec | list", max_attempts: int = 2,
                          fetcher_factory=None, fetcher_key: str = "simulated",
                          ledger_dir: str | None = None):
    """Per-worker-process cached FetchExtract task fn. ``fetcher_key`` names
    the fetcher variant in the worker cache (factories don't hash stably)."""
    tkey = _tasks_key(task)

    def fn(batch: pa.Table) -> pa.Table:
        key = (pages_dir, tkey, max_attempts, fetcher_key, ledger_dir)
        fe = _FETCH_EXTRACT_CACHE.get(key)
        if fe is None:
            fe = _FETCH_EXTRACT_CACHE[key] = FetchExtract(
                pages_dir, task, max_attempts, fetcher_factory, ledger_dir
            )
        return fe(batch)

    return fn


def items_to_columns(task: TaskSpec, rule_name: str):
    """map_batches fn: decode item JSON payloads into typed columns for the
    Parquet items sink (schema = ItemFields + url + ts, matching the
    reference's dynamic DDL W2 ``collector/sqlstorage/sqlstorage.go:68-88``
    with MEDIUMTEXT→string and the declared int fields typed int64)."""
    spec = task.rules[rule_name]

    def fn(batch: pa.Table) -> pa.Table:
        from crawler_ray.rules import _atoi

        payloads = [json.loads(p) for p in batch.column("payload").to_pylist()]
        cols: dict[str, pa.Array] = {}
        for fname in spec.item_fields:
            if fname in spec.int_fields:
                # declared-int fields may arrive as strings (carry-merged
                # values, or the ""-missing default) — coerce with the rule
                # engine's Atoi semantics instead of crashing the sink
                vals = [p.get(fname, "") for p in payloads]
                cols[fname] = pa.array(
                    [v if isinstance(v, int) else _atoi(str(v)) for v in vals],
                    type=pa.int64(),
                )
            else:
                cols[fname] = pa.array(
                    [p.get(fname, "") for p in payloads], type=pa.string()
                )
        cols["url"] = batch.column("url")
        cols["ts"] = batch.column("ts")
        return pa.table(cols)

    return fn
