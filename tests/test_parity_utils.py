"""Parity utilities: charset sniff (F3), proxy rotation (F6), seeded UA (F7),
rules-as-data (R10/S4), SQL sink (W1-W3)."""

from __future__ import annotations

import sqlite3

import pytest

from crawler_ray.functions.web import (
    round_robin_proxy,
    sniff_charset,
    transcode_utf8,
    user_agent_for,
)
from crawler_ray.rules import SYNTH_TASK, compile_task, task_from_rows, task_to_rows
from crawler_ray.stages.sink import SqlItemSink


def test_sniff_charset():
    assert sniff_charset("<html>héllo</html>".encode()) == "utf-8"
    assert sniff_charset(b"\xef\xbb\xbfabc") == "utf-8"
    assert sniff_charset(b'<meta charset="GBK"><html>') == "gbk"
    assert sniff_charset(b"<meta http-equiv=x content=y charset=ISO-8859-1>") == "iso-8859-1"
    assert sniff_charset(b"\xff\xfea\x00") == "utf-16"
    assert sniff_charset(b"caf\xe9") == "latin-1"  # invalid utf-8 fallback
    assert transcode_utf8(b"caf\xe9") == "café"


def test_round_robin_proxy():
    pick = round_robin_proxy(["p0", "p1", "p2"])
    assert [pick(i) for i in range(7)] == ["p0", "p1", "p2", "p0", "p1", "p2", "p0"]
    with pytest.raises(ValueError):
        round_robin_proxy([])


def test_user_agent_deterministic():
    a = user_agent_for("https://x.com/1")
    assert a == user_agent_for("https://x.com/1")  # same url → same UA
    assert a.startswith("Mozilla/5.0")
    uas = {user_agent_for(f"https://x.com/{i}") for i in range(50)}
    assert len(uas) > 10  # variety across urls


def test_rules_roundtrip_through_table():
    rows = task_to_rows(SYNTH_TASK)
    rebuilt = task_from_rows(rows)
    assert rebuilt == SYNTH_TASK
    # a rebuilt task compiles and extracts identically
    body = '<a href="https://h/list/1" class="tag">t</a>'
    orig = compile_task(SYNTH_TASK)["tag"].extract("u", body, {})
    new = compile_task(rebuilt)["tag"].extract("u", body, {})
    assert orig == new


def test_sql_sink_ddl_batching_and_value_semantics(tmp_path):
    db = str(tmp_path / "items.db")
    sink = SqlItemSink(db, "book_detail", ["title", "pages"], batch_count=2)
    sink.save({"title": "a", "pages": 12, "Url": "u1", "Time": "t1"})
    # buffered: not yet flushed
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "book_detail"').fetchone()[0] == 0
    sink.save({"title": "b", "Url": "u2", "Time": "t2"})  # triggers flush at 2
    assert con.execute('SELECT COUNT(*) FROM "book_detail"').fetchone()[0] == 2
    rows = con.execute('SELECT title, pages, Url, Time FROM "book_detail" ORDER BY Url').fetchall()
    # non-string JSON-marshalled; missing → "" (sqlstorage.go:108-126)
    assert rows == [("a", "12", "u1", "t1"), ("b", "", "u2", "t2")]
    sink.close()


def test_sql_sink_streaming_from_dataset(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.stages.sink import write_items_sql

    import datetime

    ds = rd.from_items(
        [
            {"title": f"t{i}", "pages": i, "url": f"https://h/{i}",
             "ts": datetime.datetime(2026, 1, 1, 0, 0, i)}
            for i in range(25)
        ]
    )
    db = str(tmp_path / "s.db")
    n = write_items_sql(ds, db, "items", ["title", "pages"], batch_count=10)
    assert n == 25
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "items"').fetchone()[0] == 25
    r = con.execute('SELECT title, pages, Time FROM "items" WHERE Url="https://h/3"').fetchone()
    assert r == ("t3", "3", "2026-01-01 00:00:03")


def test_fetch_session_header_assembly():
    """BrowserFetch per-request setup parity (collect/collect.go:62-91):
    UA always, Cookie when configured, proxy round-robin by row index —
    all deterministic."""
    from crawler_ray.functions.web import FetchSession, build_headers, user_agent_for

    s = FetchSession(cookie="bid=abc123; ll=118282",
                     proxies=("http://p1:8888", "http://p2:8888"))
    h0 = build_headers(s, "https://book.douban.com", 0)
    assert h0["Cookie"] == "bid=abc123; ll=118282"
    assert h0["User-Agent"] == user_agent_for("https://book.douban.com")
    assert h0["X-Proxy"] == "http://p1:8888"
    assert build_headers(s, "https://book.douban.com", 1)["X-Proxy"] == "http://p2:8888"
    assert build_headers(s, "https://book.douban.com", 2)["X-Proxy"] == "http://p1:8888"
    # reproducible: same inputs, same headers
    assert build_headers(s, "https://book.douban.com", 0) == h0
    # no cookie configured → no Cookie header (the reference only sets it
    # when the task provides one)
    assert "Cookie" not in build_headers(FetchSession(), "https://x.test/", 0)


def test_fetch_session_rules_roundtrip():
    """Cookie/session config survives the rules-as-data round-trip."""
    import dataclasses

    from crawler_ray.functions.web import FetchSession
    from crawler_ray.rules import DOUBAN_BOOK, task_from_rows, task_to_rows

    task = dataclasses.replace(
        DOUBAN_BOOK, fetch=FetchSession(cookie="k=v", proxies=("http://p:1",))
    )
    back = task_from_rows(task_to_rows(task))
    assert back.fetch.cookie == "k=v"
    assert back.fetch.proxies == ("http://p:1",)


def test_simulated_fetcher_satisfies_protocol():
    from crawler_ray.stages.fetch import Fetcher, SimulatedFetcher

    assert issubclass(SimulatedFetcher, Fetcher)
