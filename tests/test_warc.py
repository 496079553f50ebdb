"""WARC source/sink: framing, multi-member gzip, Ray round trip, and the
corpus-scoped ``warc_pages`` query against its DuckDB twin."""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil

import pyarrow as pa
import pytest

from crawler_ray.sources.warc import (
    WarcDatasink,
    _inflate_members,
    build_record,
    parse_warc,
    read_warc,
)


def _records(n: int = 7) -> list[tuple[str, int, bytes, int]]:
    return [
        (f"https://h{i % 3}.example.com/p/{i}", 1_700_000_000_000_000 + i * 17, (f"body-{i}-".encode() * (i + 1)), 200 + (i % 2))
        for i in range(n)
    ]


def test_parse_round_trip_plain_and_framing():
    recs = _records()
    data = b"".join(build_record(u, ts, body, st) for u, ts, body, st in recs)
    # adversarial chunking: 1-byte chunks exercise every split point of the
    # CRLFCRLF delimiters and the Content-Length framing
    rows = list(parse_warc(iter([data[i : i + 1] for i in range(len(data))])))
    assert [(r["url"], r["warc_ts"], r["payload"], r["status"]) for r in rows] == recs


def test_parse_multi_member_gzip():
    recs = _records(5)
    gz = b"".join(
        gzip.compress(build_record(u, ts, body, st), mtime=0) for u, ts, body, st in recs
    )
    chunks = [gz[i : i + 11] for i in range(0, len(gz), 11)]
    rows = list(parse_warc(_inflate_members(iter(chunks))))
    assert [(r["url"], r["payload"]) for r in rows] == [(u, b) for u, _, b, _ in recs]


def test_parse_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\nContent-Length: 9\r\n\r\nsoftware\n\r\n\r\n"
    )
    u, ts, body, st = _records(1)[0]
    rows = list(parse_warc(iter([info + build_record(u, ts, body, st)])))
    assert len(rows) == 1 and rows[0]["url"] == u


def test_truncated_warc_raises():
    data = b"".join(build_record(u, ts, b, s) for u, ts, b, s in _records(2))
    with pytest.raises(ValueError, match="truncated WARC"):
        list(parse_warc(iter([data[:-30]])))
    with pytest.raises(ValueError, match="not a WARC record"):
        list(parse_warc(iter([b"HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n"])))


@pytest.mark.parametrize("compress", [False, True])
def test_ray_round_trip(ray_session, compress):
    import ray.data as rd

    t = pa.table(
        {
            "url": [f"https://h/{i}" for i in range(50)],
            "warc_ts": pa.array([1_000_000 + i for i in range(50)], pa.timestamp("us")),
            "payload": [f"page-{i}".encode() * (i % 5 + 1) for i in range(50)],
        }
    )
    out = f"/tmp/warc_rt_{'gz' if compress else 'plain'}"
    shutil.rmtree(out, ignore_errors=True)
    rd.from_arrow(t).repartition(3).write_datasink(WarcDatasink(out, compress=compress))
    suffix = ".warc.gz" if compress else ".warc"
    assert all(f.endswith(suffix) for f in os.listdir(out))
    back = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
    orig = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back.url) == list(orig.url)
    assert list(back.payload) == list(orig.payload)
    assert list(back.warc_ts) == list(orig.warc_ts)
    assert set(back.status) == {200}
    assert set(back.http_content_type) == {"text/html"}


def test_warc_pages_matches_duckdb(ray_session):
    import duckdb

    from crawler_ray.pipelines.crawl_queries import synth_warc, warc_pages
    from crawler_ray.sources.pages import synth_corpus

    sf = "/root/testdata/sf0.001"
    eng = (
        warc_pages(sf)
        .to_pandas()
        .sort_values(["url", "ts_us"])
        .reset_index(drop=True)
    )
    pages = os.path.join(synth_corpus(sf).pages, "part-0.parquet")
    orc = duckdb.sql(
        f"""
        SELECT url, CAST(epoch_us(warc_ts) AS BIGINT) AS ts_us,
               CAST(200 AS BIGINT) AS status,
               CAST(octet_length(html) AS BIGINT) AS n_bytes,
               md5(decode(html)) AS payload_md5
        FROM read_parquet('{pages}') ORDER BY url, ts_us
        """
    ).df()
    assert len(eng) == len(orc) and len(eng) > 0
    for col in ["url", "ts_us", "status", "n_bytes", "payload_md5"]:
        assert list(eng[col]) == list(orc[col]), col
    # both layouts actually present in the fixture (plain + per-record gzip)
    wdir = synth_warc(sf)
    assert os.listdir(os.path.join(wdir, "plain")) and os.listdir(os.path.join(wdir, "gz"))


def test_non_ascii_uri_round_trip():
    """WARC-Target-URI is written UTF-8 (review fix: ascii-encode crashed
    on IRIs); the reader's utf-8 decode round-trips it, including through
    1-byte adversarial chunking."""
    url = "https://h0.example.com/café/路径?q=ü"
    rec = build_record(url, 1_700_000_000_000_000, b"body", 200)
    rows = list(parse_warc(iter([rec[i : i + 1] for i in range(len(rec))])))
    assert len(rows) == 1 and rows[0]["url"] == url and rows[0]["payload"] == b"body"
