"""CLI driver: ``python -m crawler_ray`` — the ``ray job submit`` surface.

Mirrors the reference's cobra CLI + config wiring
(``/root/reference/cmd/cmd.go:9-33``, ``main/main.go:232-272``): the
reference loads rules and task options from ``config.toml`` and runs the
engine; here the task arrives as a **rule table** (JSON list or Parquet of
RuleSpec rows — the rules-as-data extension surface, R10/S4) plus corpus
paths, and the run is checkpointed/resumable:

    python -m crawler_ray \
        --rules rules.json --pages PAGES_DIR --seeds seeds.parquet \
        --politeness politeness.json --out /tmp/crawl_out \
        [--resume] [--max-iterations N] [--num-seen-shards N] \
        [--seen-mode cuckoo|bloom] [--sqlite items.db]

On a real cluster the same invocation ships as
``ray job submit -- python -m crawler_ray ...`` — the driver only touches
manifests and footers; all data flows through Ray Data.

This is a CLI entry point, so it owns the Ray session (init guarded,
shutdown at exit) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_rule_table(path: str) -> "object":
    """Rule table → TaskSpec (JSON list of rows, or Parquet)."""
    from crawler_ray.rules import task_from_rows

    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        rows = pq.read_table(path).to_pylist()
    else:
        with open(path) as fh:
            rows = json.load(fh)
    return task_from_rows(rows)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="crawler_ray", description="Ray-Data-native crawl engine driver"
    )
    p.add_argument("--rules", required=True, action="append",
                   help="rule table: JSON list of RuleSpec rows, or Parquet. "
                        "Repeatable — each table is one task; all tasks run "
                        "in ONE engine with a shared frontier/seen/politeness "
                        "state (engine/crawler.go:48-75). Seeds rows may "
                        "carry a 'task' column; rows without one belong to "
                        "the first table's task")
    p.add_argument("--pages", required=True, help="pages Parquet dir (url-sorted)")
    p.add_argument("--seeds", required=True, help="seeds Parquet file")
    p.add_argument("--politeness", required=True, help="politeness JSON config")
    p.add_argument("--out", required=True, help="checkpoint/output dir")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest complete checkpoint in --out")
    p.add_argument("--recrawl-from", default=None, metavar="PREV_OUT",
                   help="incremental recrawl: refetch everything the completed "
                        "run in PREV_OUT captured, skipping unchanged pages "
                        "(warc_ts ledger); --seeds is ignored")
    p.add_argument("--max-iterations", type=int, default=64)
    p.add_argument("--num-seen-shards", type=int, default=4)
    p.add_argument("--seen-mode", choices=["cuckoo", "bloom"], default="cuckoo")
    p.add_argument("--approx-seen", action="store_true",
                   help="drop the exact verification set (filter-only shards, the 10^10-URL config)")
    p.add_argument("--sqlite", default=None,
                   help="also sink items into this sqlite db (dynamic DDL per rule)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray detect)")
    args = p.parse_args(argv)

    import pyarrow.parquet as pq

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from crawler_ray.pipelines.crawl import run_crawl
        from crawler_ray.sources.pages import Corpus

        tasks = [load_rule_table(p) for p in args.rules]
        task = tasks if len(tasks) > 1 else tasks[0]
        n_docs = sum(
            pq.read_metadata(os.path.join(args.pages, f)).num_rows
            for f in os.listdir(args.pages)
            if f.endswith(".parquet")
        )
        corpus = Corpus(
            root=os.path.dirname(os.path.abspath(args.pages)),
            pages=args.pages,
            seeds=args.seeds,
            politeness=args.politeness,
            n_docs=n_docs,
        )
        common = dict(
            task=task,
            out_dir=args.out,
            max_iterations=args.max_iterations,
            num_seen_shards=args.num_seen_shards,
            seen_mode=args.seen_mode,
            exact_seen=not args.approx_seen,
            resume=args.resume,
        )
        if args.recrawl_from:
            from crawler_ray.pipelines.crawl import run_recrawl

            out = common.pop("out_dir")
            res = run_recrawl(corpus, args.recrawl_from, out, **common)
        else:
            res = run_crawl(corpus, **common)
        if args.sqlite:
            from crawler_ray.stages.sink import write_items_sql

            multi = len(tasks) > 1
            for t in tasks:
                for rule_name, spec in t.rules.items():
                    if not spec.item_fields:
                        continue
                    ds = res.items_dataset(rule_name, task=t.name if multi else None)
                    if ds is not None:
                        # table name qualified per task when several tasks
                        # share a rule name (dynamic DDL, W2)
                        tbl = f"{t.name}__{rule_name}" if multi else rule_name
                        write_items_sql(ds, args.sqlite, tbl, list(spec.item_fields))
        print(
            json.dumps(
                {
                    "task": "+".join(t.name for t in tasks),
                    "out": args.out,
                    "iterations": res.iterations,
                    "scheduled": sum(s["scheduled"] for s in res.stats),
                    "items": sum(s["items"] for s in res.stats),
                    "stats": res.stats,
                },
                ensure_ascii=False,
            )
        )
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
