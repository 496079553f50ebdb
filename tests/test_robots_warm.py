"""Robots-from-corpus warm path: a host's Disallow / Crawl-delay come from a
``/robots.txt`` body FETCHED during the crawl (the north star's in-crawl
robots cache), not from the pre-baked politeness JSON — engine ≡ oracle,
including across kill/resume.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.pipelines.oracle import run_oracle
from crawler_ray.rules import RuleSpec, TaskSpec
from crawler_ray.sources.pages import MIN_BODY_BYTES, Corpus

HOST_A = "a.example.com"  # robots: Disallow /private/, Crawl-delay 30 → budget 2
HOST_B = "b.example.com"  # no robots page → default budget

ROBOTS_A = b"""# crawl policy
User-agent: *
Disallow: /private/
Crawl-delay: 30
"""

TASK = TaskSpec(
    name="robots_warm",
    max_depth=3,
    rules={
        "tag": RuleSpec(
            task="robots_warm",
            name="tag",
            kind="link_extract",
            regex=r'<a href="([^"]+)" class="tag">([^<]+)</a>',
            next_rule="tag",
        )
    },
)

PAD = b" " * MIN_BODY_BYTES


def _leaf(name: str) -> bytes:
    return b"<html><body>" + name.encode() + b"</body>" + PAD + b"</html>"


def _links(urls: list[str]) -> bytes:
    body = "".join(f'<a href="{u}" class="tag">{u}</a>' for u in urls).encode()
    return b"<html><body>" + body + PAD + b"</body></html>"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("robots_corpus")
    pages_dir = root / "pages"
    pages_dir.mkdir()

    a_children = [f"https://{HOST_A}/p{i}" for i in range(1, 7)]
    a_private = [f"https://{HOST_A}/private/p7", f"https://{HOST_A}/private/p8"]
    b_children = [f"https://{HOST_B}/q{i}" for i in range(1, 4)]

    rows = [(f"https://{HOST_A}/robots.txt", ROBOTS_A)]
    rows += [(f"https://{HOST_A}/", _links(a_children + a_private))]
    rows += [(u, _leaf(u)) for u in a_children + a_private]
    rows += [(f"https://{HOST_B}/", _links(b_children))]
    rows += [(u, _leaf(u)) for u in b_children]
    rows.sort(key=lambda r: r[0])
    tbl = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "warc_ts": pa.array(range(len(rows)), pa.timestamp("us")),
            "html": pa.array([b for _, b in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(pages_dir / "part-0.parquet"), row_group_size=4)

    seeds = pa.table(
        {
            "url": pa.array([f"https://{HOST_A}/", f"https://{HOST_B}/"], pa.string()),
            "priority": pa.array([1, 1], pa.int32()),
            "rule": pa.array(["tag", "tag"], pa.string()),
            "depth": pa.array([0, 0], pa.int32()),
            "seq": pa.array([0, 1], pa.int64()),
        }
    )
    pq.write_table(seeds, str(root / "seeds.parquet"))
    # NO host rules in the JSON: everything host-specific must come from
    # the fetched robots.txt body
    with open(root / "politeness.json", "w") as fh:
        json.dump({"default": {"max_per_iter": 100, "disallow": []},
                   "hosts": {}, "max_depth": 3, "max_attempts": 2}, fh)
    return Corpus(
        root=str(root), pages=str(pages_dir), seeds=str(root / "seeds.parquet"),
        politeness=str(root / "politeness.json"), n_docs=len(rows),
    )


def test_robots_warm_engine_equals_oracle(ray_session, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("robots_out"))
    res = run_crawl(corpus, task=TASK, out_dir=out, max_iterations=20,
                    robots_from_corpus=True)
    orc = run_oracle(corpus, task=TASK, max_iterations=20, robots_from_corpus=True)

    df = res.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(orc.order)
    assert res.iterations == orc.iterations

    # Disallow came from the fetched body: /private/ urls never scheduled,
    # and the robots.txt control fetch itself is not a schedule row
    assert not df.url.str.contains("/private/").any()
    assert not df.url.str.endswith("/robots.txt").any()
    # every allowed page was still reached eventually
    assert {u for u in df.url if u.startswith(f"https://{HOST_A}/p")} == {
        f"https://{HOST_A}/p{i}" for i in range(1, 7)
    }

    # Crawl-delay 30 + 60 s window → at most 2 host-A admissions/generation,
    # so the 6 children need ≥3 generations; host B (no robots) finishes in 1
    per_iter_a = df[df.url.str.contains(HOST_A)].groupby("iteration").size()
    assert per_iter_a.max() <= 2
    b_children = df[(df.url.str.contains(HOST_B)) & (df.iteration > 0)]
    assert set(b_children.iteration) == {1}


def test_robots_warm_resume(ray_session, corpus, tmp_path_factory):
    out_full = str(tmp_path_factory.mktemp("robots_full"))
    out_kill = str(tmp_path_factory.mktemp("robots_kill"))
    res_full = run_crawl(corpus, task=TASK, out_dir=out_full, max_iterations=20,
                         robots_from_corpus=True)
    run_crawl(corpus, task=TASK, out_dir=out_kill, max_iterations=2,
              robots_from_corpus=True)
    res_res = run_crawl(corpus, task=TASK, out_dir=out_kill, max_iterations=20,
                        resume=True, robots_from_corpus=True)

    a = res_full.order_dataset().to_pandas()
    b = res_res.order_dataset().to_pandas()
    key = lambda d: set(zip(d.iteration, d.url, d.priority, d.seq, d.attempt, d.outcome))  # noqa: E731
    assert key(a) == key(b)
    # the warmed cache was restored from robots.json, not re-fetched into
    # a different schedule
    assert res_res.iterations == res_full.iterations
