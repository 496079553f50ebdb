"""End-to-end: the douban-book rule chain through the distributed engine,
fed by the reference's own golden HTML corpus.

This reproduces the reference's TestBody flow (``collect/request.go:25-26``,
``engine/crawler.go:95-97``, task wiring ``parse/doubangroup/dobuan_book.go``)
as a real crawl: the three golden pages become the pages table, the
index-page url is the seed, and the engine must walk
tag → book-list → book-detail, carry 书名 across the hop, dedup the repeated
subject links via the seen-set, and emit exactly the reference's items.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.rules import DOUBAN_BOOK
from crawler_ray.sources.pages import Corpus

REF = "/root/reference/testhtml"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")

TAGS = ["小说", "随笔", "日本文学"]
SUBJECTS = ["35534519", "36104107", "36710597"]
TITLES = {"35534519": "素食者", "36104107": "长安的荔枝", "36710597": "食南之徒"}


@pytest.fixture(scope="module")
def douban_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("douban_corpus")
    pages_dir = root / "pages"
    pages_dir.mkdir()

    def read(name: str) -> bytes:
        with open(os.path.join(REF, name), "rb") as fh:
            return fh.read()

    rows = [("https://book.douban.com", read("index.html"))]
    rows += [(f"https://book.douban.com/tag/{t}", read("fiction_tag.html")) for t in TAGS]
    rows += [(f"https://book.douban.com/subject/{s}/", read("book_detail.html")) for s in SUBJECTS]
    rows.sort(key=lambda r: r[0])  # fetch index requires url-sorted layout
    tbl = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "warc_ts": pa.array(range(len(rows)), pa.timestamp("us")),
            "html": pa.array([b for _, b in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array(["zh"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(pages_dir / "part-0.parquet"), row_group_size=4)

    seeds = pa.table(
        {
            "url": pa.array(["https://book.douban.com"], pa.string()),
            "priority": pa.array([1], pa.int32()),  # douban seeds use Priority 1
            "rule": pa.array(["tag"], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    pq.write_table(seeds, str(root / "seeds.parquet"))
    with open(root / "politeness.json", "w") as fh:
        json.dump({"default": {"max_per_iter": 100, "disallow": []},
                   "hosts": {}, "max_depth": 5, "max_attempts": 2}, fh)
    return Corpus(
        root=str(root),
        pages=str(pages_dir),
        seeds=str(root / "seeds.parquet"),
        politeness=str(root / "politeness.json"),
        n_docs=len(rows),
    )


def test_douban_book_chain_end_to_end(ray_session, douban_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("douban_out"))
    res = run_crawl(douban_corpus, task=DOUBAN_BOOK, out_dir=out, max_iterations=10)

    items = res.items_dataset("book_detail")
    assert items is not None
    df = items.to_pandas().sort_values("url").reset_index(drop=True)
    # one item per distinct subject url — the 3 tag pages all link the same
    # 3 subjects; the seen-set collapses the 9 candidate fetches to 3
    assert list(df["url"]) == [f"https://book.douban.com/subject/{s}/" for s in SUBJECTS]
    # carried 书名 survives the list→detail hop (TmpData semantics)
    assert list(df["书名"]) == [TITLES[s] for s in SUBJECTS]
    # detail fields byte-equal the conformance goldens, incl. whitespace
    assert set(df["作者"]) == {"[韩] 韩江"}
    assert set(df["页数"]) == {208}
    assert set(df["得分"]) == {" 8.1 "}
    assert set(df["价格"]) == {" 48"}
    assert set(df["出版社"]) == {"四川文艺出版社"}

    # schedule: 1 index + 3 tag pages + 3 subject pages, all ok
    order = res.order_dataset().to_pandas()
    assert len(order) == 7
    assert set(order.outcome) == {"ok"}
    # priority-1 seed scheduled in generation 0, alone
    assert (order[order.iteration == 0].url == "https://book.douban.com").all()


def test_douban_cli_rules_as_data(douban_corpus, tmp_path_factory):
    """The golden-corpus e2e reproduced through the CLI with the rules
    supplied as DATA (task_to_rows → JSON), not Python constants — the
    reference's config.toml + cobra surface (main/main.go:232-272)."""
    import glob
    import sqlite3
    import subprocess
    import sys

    import pandas as pd
    import pyarrow.parquet as pq

    from crawler_ray.rules import DOUBAN_BOOK, task_to_rows

    tmp = tmp_path_factory.mktemp("douban_cli")
    rules_path = str(tmp / "rules.json")
    with open(rules_path, "w") as fh:
        json.dump(task_to_rows(DOUBAN_BOOK), fh, ensure_ascii=False)
    out = str(tmp / "out")
    db = str(tmp / "items.db")
    r = subprocess.run(
        [sys.executable, "-m", "crawler_ray",
         "--rules", rules_path, "--pages", douban_corpus.pages,
         "--seeds", douban_corpus.seeds, "--politeness", douban_corpus.politeness,
         "--out", out, "--max-iterations", "10", "--num-cpus", "2",
         "--sqlite", db],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["scheduled"] == 7
    assert summary["items"] == 3

    files = glob.glob(f"{out}/iter_*/items/rule=book_detail/*.parquet")
    df = pd.concat([pq.read_table(f).to_pandas() for f in files]).sort_values("url")
    assert list(df["书名"]) == ["素食者", "长安的荔枝", "食南之徒"]
    assert set(df["得分"]) == {" 8.1 "}  # byte-exact incl. whitespace

    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM book_detail").fetchone()[0] == 3
    con.close()

    # --resume on the completed out dir is a no-op (no re-crawl, no growth)
    r2 = subprocess.run(
        [sys.executable, "-m", "crawler_ray",
         "--rules", rules_path, "--pages", douban_corpus.pages,
         "--seeds", douban_corpus.seeds, "--politeness", douban_corpus.politeness,
         "--out", out, "--max-iterations", "10", "--num-cpus", "2", "--resume"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert s2["scheduled"] == 0 and s2["stats"] == []
    files2 = glob.glob(f"{out}/iter_*/items/rule=book_detail/*.parquet")
    assert sorted(files2) == sorted(files)


def test_douban_cli_recrawl_unchanged(douban_corpus, tmp_path_factory):
    """--recrawl-from against an UNCHANGED corpus: every previously-ok url
    refetches and records outcome 'unchanged'; nothing re-extracts."""
    import glob
    import subprocess
    import sys

    import pandas as pd
    import pyarrow.parquet as pq

    from crawler_ray.rules import DOUBAN_BOOK, task_to_rows

    tmp = tmp_path_factory.mktemp("douban_recrawl")
    rules_path = str(tmp / "rules.json")
    with open(rules_path, "w") as fh:
        json.dump(task_to_rows(DOUBAN_BOOK), fh, ensure_ascii=False)
    base = [sys.executable, "-m", "crawler_ray",
            "--rules", rules_path, "--pages", douban_corpus.pages,
            "--seeds", douban_corpus.seeds, "--politeness", douban_corpus.politeness,
            "--max-iterations", "10", "--num-cpus", "2"]
    out1, out2 = str(tmp / "out1"), str(tmp / "out2")
    r1 = subprocess.run(base + ["--out", out1], capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        base + ["--out", out2, "--recrawl-from", out1],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert s2["items"] == 0  # nothing changed, nothing re-extracted
    files = glob.glob(f"{out2}/iter_*/order/*.parquet")
    order = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert len(order) == 7 and set(order.outcome) == {"unchanged"}
