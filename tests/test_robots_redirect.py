"""Robots edge semantics, engine ≡ oracle:

1. A ``/robots.txt`` that is itself a redirect page — both the engine's
   control fetch (redirect-remapped SimulatedFetcher) and the oracle's
   ``_follow_redirects`` must serve the TARGET body's rules.
2. A malformed ``Disallow:`` value without a leading '/' (RFC 9309 paths
   are absolute) — dropped at parse time on both sides; it must neither
   block the named path nor (the engine regex bug it pins) match the
   prefix inside the HOSTNAME and wrongly block the whole host.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.pipelines.oracle import run_oracle
from crawler_ray.rules import RuleSpec, TaskSpec
from crawler_ray.sources.pages import MIN_BODY_BYTES, Corpus, redirect_html

HOST = "privatehost.example.com"  # host CONTAINS 'privatehost' (bug bait)

# served from the REDIRECT TARGET, not /robots.txt itself; the no-slash
# 'Disallow: privatehost' line must be ignored entirely
ROBOTS_BODY = b"""User-agent: *
Disallow: /secret/
Disallow: privatehost
"""

TASK = TaskSpec(
    name="robots_redirect",
    max_depth=3,
    rules={
        "tag": RuleSpec(
            task="robots_redirect",
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
    root = tmp_path_factory.mktemp("robots_redirect_corpus")
    pages_dir = root / "pages"
    pages_dir.mkdir()

    public = [f"https://{HOST}/p{i}" for i in range(1, 4)]
    secret = [f"https://{HOST}/secret/s1", f"https://{HOST}/secret/s2"]

    rows = [
        (
            f"https://{HOST}/robots.txt",
            redirect_html(f"https://{HOST}/robots-real.txt").encode(),
        ),
        (f"https://{HOST}/robots-real.txt", ROBOTS_BODY),
        (f"https://{HOST}/", _links(public + secret)),
    ]
    rows += [(u, _leaf(u)) for u in public + secret]
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
            "url": pa.array([f"https://{HOST}/"], pa.string()),
            "priority": pa.array([1], pa.int32()),
            "rule": pa.array(["tag"], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    pq.write_table(seeds, str(root / "seeds.parquet"))
    with open(root / "politeness.json", "w") as fh:
        json.dump(
            {"default": {"max_per_iter": 100, "disallow": []},
             "hosts": {}, "max_depth": 3, "max_attempts": 2}, fh)
    return Corpus(
        root=str(root), pages=str(pages_dir), seeds=str(root / "seeds.parquet"),
        politeness=str(root / "politeness.json"), n_docs=len(rows),
    )


def test_redirected_robots_and_no_slash_disallow(ray_session, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("robots_redirect_out"))
    res = run_crawl(corpus, task=TASK, out_dir=out, max_iterations=20,
                    robots_from_corpus=True)
    orc = run_oracle(corpus, task=TASK, max_iterations=20, robots_from_corpus=True)

    df = res.order_dataset().to_pandas()
    eng = set(zip(df.iteration, df.url, df.priority, df.seq, df.attempt, df.outcome))
    assert eng == set(orc.order)

    # rules came through the redirect: /secret/ is blocked
    assert not df.url.str.contains("/secret/").any()
    # the no-slash 'Disallow: privatehost' line is ignored — it must NOT
    # block the host whose NAME contains the prefix
    assert {u for u in df.url if u.startswith(f"https://{HOST}/p")} == set(
        f"https://{HOST}/p{i}" for i in range(1, 4)
    )


def test_host_scheme_partial_empty_table():
    """A depth-capped last generation can canonicalize every frontier row
    away; the robots/sitemap warm partial must not IndexError on the
    resulting 0-row table (np.char.partition loses the column axis)."""
    from crawler_ray.pipelines.crawl import _host_scheme_partial

    t = pa.table(
        {"host": pa.array([], pa.string()), "url": pa.array([], pa.string())}
    )
    out = _host_scheme_partial(t)
    assert out.num_rows == 0 and out.column_names == ["host", "scheme"]
