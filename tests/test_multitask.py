"""Multi-task single-engine crawl (engine/crawler.go:48-75 + main/main.go:232-272):
every configured task seeds into ONE shared scheduler run — shared frontier,
shared URL-seen set, shared per-host politeness budget — with per-task rules,
max_depth and reload dispatched by the frontier's ``task`` column.

Engine ≡ oracle on the task-qualified schedule, items and texts.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.pipelines.oracle import run_oracle
from crawler_ray.rules import LINKSCAN_TASK as LINKSCAN
from crawler_ray.rules import SYNTH_TASK, RuleSpec, TaskSpec, task_to_rows

pytestmark = pytest.mark.usefixtures("ray_session")


def _seeds_with_tasks(corpus, tmp_path, split=(0, 6, 2, 8)) -> str:
    """Rewrite the corpus seeds with a task column: synth_crawl gets seed
    rows [a,b), linkscan gets [c,d) — overlapping ranges exercise the
    shared seen set (one fetch per url across tasks)."""
    a, b, c, d = split
    s = pq.read_table(corpus.seeds).to_pylist()
    rows = [{**r, "task": "synth_crawl"} for r in s[a:b]]
    rows += [{**r, "task": "linkscan", "rule": "hub"} for r in s[c:d]]
    out = str(tmp_path / "seeds_mt.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in rows]),
                "priority": pa.array([r["priority"] for r in rows], pa.int32()),
                "rule": pa.array([r["rule"] for r in rows]),
                "depth": pa.array([r["depth"] for r in rows], pa.int32()),
                "seq": pa.array([r["seq"] for r in rows], pa.int64()),
                "task": pa.array([r["task"] for r in rows]),
            }
        ),
        out,
    )
    return out


def _order_full(res) -> set:
    df = res.order_dataset().to_pandas()
    return set(
        zip(df.iteration, df.task, df.url, df.priority, df.seq, df.attempt, df.outcome)
    )


def test_two_tasks_one_engine(corpus_small, tmp_path_factory):
    """Two tasks, one engine run: the task-qualified schedule, per-task
    items and texts all match the single-process oracle; overlapping seeds
    are fetched once (shared seen); linkscan's depth-1 limit binds."""
    import dataclasses

    tmp = tmp_path_factory.mktemp("multitask")
    corpus = dataclasses.replace(
        corpus_small, seeds=_seeds_with_tasks(corpus_small, tmp)
    )
    tasks = [SYNTH_TASK, LINKSCAN]

    engine = run_crawl(corpus, task=tasks, out_dir=str(tmp / "out"), max_iterations=30)
    oracle = run_oracle(corpus, task=tasks, max_iterations=30)

    assert _order_full(engine) == set(oracle.order_full)
    assert engine.iterations == oracle.iterations

    t = engine.text_dataset().to_pandas()
    assert set(zip(t.task, t.url, t.payload)) == set(oracle.text_rows)

    # per-task items, nested layout items/task=<t>/rule=<r>
    det = engine.items_dataset("detail", task="synth_crawl").to_pandas()
    want_det = {
        i["url"] for i in oracle.items if i["task"] == "synth_crawl" and i["rule"] == "detail"
    }
    assert set(det.url) == want_det and len(det) == len(want_det)
    leaf = engine.items_dataset("leaf", task="linkscan").to_pandas()
    want_leaf = {i["url"] for i in oracle.items if i["task"] == "linkscan"}
    assert set(leaf.url) == want_leaf and len(want_leaf) > 0
    assert glob.glob(
        os.path.join(str(tmp / "out"), "iter_*", "items", "task=linkscan", "rule=leaf", "*.parquet")
    )

    # shared seen set: overlapping seed urls (rows 2..5 in both tasks) were
    # fetched successfully exactly once across the two tasks (missing/banned
    # rows may appear twice — the one-retry requeue)
    df = engine.order_dataset().to_pandas()
    assert df[df.outcome == "ok"].url.value_counts().max() == 1

    # per-task rule dispatch actually ran both chains
    assert {"tag", "list", "detail"} <= set(df[df.task == "synth_crawl"].rule)
    assert {"hub", "leaf"} <= set(df[df.task == "linkscan"].rule)
    assert engine.iterations >= 3


def test_mixed_reload_tasks(tmp_path_factory):
    """A reload task and a normal task share one engine: the normal task's
    marks block itself but never the reload task, failures unmark only
    non-reload rows, and the whole interleaving matches the oracle."""
    import dataclasses

    from tests.test_crawl_engine import _mini_cycle_corpus

    tmp = tmp_path_factory.mktemp("mixed_reload")
    corpus = _mini_cycle_corpus(tmp)
    a_url, b_url = "https://h0.example.com/a", "https://h0.example.com/b"
    # seeds: cycle (no reload) starts at A; cycler (reload) starts at B
    seeds = str(tmp / "seeds_mt.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([a_url, b_url]),
                "priority": pa.array([0, 0], pa.int32()),
                "rule": pa.array(["tag", "tag"]),
                "depth": pa.array([0, 0], pa.int32()),
                "seq": pa.array([0, 1], pa.int64()),
                "task": pa.array(["cycle", "cycler"]),
            }
        ),
        seeds,
    )
    corpus = dataclasses.replace(corpus, seeds=seeds)

    base = SYNTH_TASK.rules["tag"]
    cycle = TaskSpec(
        name="cycle", max_depth=50,
        rules={"tag": dataclasses.replace(base, task="cycle", next_rule="tag")},
    )
    cycler = TaskSpec(
        name="cycler", max_depth=50, reload=True,
        rules={"tag": dataclasses.replace(base, task="cycler", next_rule="tag")},
    )

    engine = run_crawl(corpus, task=[cycle, cycler],
                       out_dir=str(tmp / "out"), max_iterations=6)
    oracle = run_oracle(corpus, task=[cycle, cycler], max_iterations=6)
    assert _order_full(engine) == set(oracle.order_full)

    df = engine.order_dataset().to_pandas()
    # the non-reload task exhausts once both pages are seen…
    assert df[df.task == "cycle"].iteration.max() <= 2
    # …while the reload task keeps oscillating through all 6 iterations
    assert df[df.task == "cycler"].iteration.nunique() == 6


def test_cli_multi_rules(corpus_small, tmp_path_factory, capsys):
    """`python -m crawler_ray --rules A --rules B` runs both tasks in one
    engine (rules-as-data round trip) and writes the nested items layout."""
    from crawler_ray.__main__ import main

    tmp = tmp_path_factory.mktemp("cli_mt")
    seeds = _seeds_with_tasks(corpus_small, tmp)
    ra, rb = str(tmp / "a.json"), str(tmp / "b.json")
    with open(ra, "w") as fh:
        json.dump(task_to_rows(SYNTH_TASK), fh)
    with open(rb, "w") as fh:
        json.dump(task_to_rows(LINKSCAN), fh)
    out = str(tmp / "out")
    rc = main([
        "--rules", ra, "--rules", rb,
        "--pages", corpus_small.pages, "--seeds", seeds,
        "--politeness", corpus_small.politeness,
        "--out", out, "--max-iterations", "30",
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["task"] == "synth_crawl+linkscan"
    assert info["scheduled"] > 0 and info["items"] > 0
    assert glob.glob(os.path.join(out, "iter_*", "items", "task=synth_crawl", "rule=detail", "*.parquet"))
    assert glob.glob(os.path.join(out, "iter_*", "items", "task=linkscan", "rule=leaf", "*.parquet"))


def test_canonicalize_drops_unknown_task_rows(ray_session):
    """The per-task depth gate doubles as the missing-Trunk drop: frontier
    rows naming a task outside the task set never reach admission/fetch —
    including in SINGLE-task runs (a resumed multi-task checkpoint or a
    typo'd seed table), where a scalar fast path once let them through."""
    import pyarrow as pa

    from crawler_ray.stages.extract import canonicalize_fn

    fn = canonicalize_fn({"known": 3}, default_task="known")
    batch = pa.table(
        {
            "url": pa.array(
                [
                    "http://h0.example.com/a",
                    "http://h0.example.com/b",
                    "http://h0.example.com/c",
                    "http://h0.example.com/d",
                ]
            ),
            "depth": pa.array([1, 1, 9, 1], pa.int32()),
            "task": pa.array(["known", "GHOST", "known", ""]),
        }
    )
    out = fn(batch)
    # GHOST dropped (unknown task), depth-9 dropped, "" backfills to known
    assert out.num_rows == 2
    assert set(out["task"].to_pylist()) == {"known"}
    assert set(out["url"].to_pylist()) == {
        "http://h0.example.com/a",
        "http://h0.example.com/d",
    }
