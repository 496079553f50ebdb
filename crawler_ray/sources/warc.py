"""WARC/1.0 source + sink for Ray Data — the native archive format of
web-crawl pipelines (ISO 28500; what Common Crawl ships).

Reader: ``read_warc(paths)`` → ``Dataset(url, warc_ts, status,
http_content_type, payload)``. Built on Ray's public
``FileBasedDatasource`` extension point so file listing, task splitting,
retries and ``include_paths`` come from the engine: one streaming read task
per WARC file — exactly the Common-Crawl unit of parallelism (a 256-node
cluster maps one ~1 GB ``.warc.gz`` shard per task). The parse is
incremental: fixed-size raw chunks → (multi-member) gzip inflate →
record-framing pull parser, so peak memory is one record + one chunk, never
the whole file.

Writer: ``WarcDatasink`` (public ``BlockBasedFileDatasink``): each output
block becomes one ``.warc`` / ``.warc.gz`` file of ``response`` records;
``compress=True`` writes ONE GZIP MEMBER PER RECORD (the Common Crawl
layout, which lets a reader seek to any record and inflate independently).

The reference crawler persists fetched pages through its Storager interface
(reference ``store/``); this module is the archive-format twin of that sink
plus the matching source, so a pipeline can round-trip page corpora through
the same format real crawls use.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import TYPE_CHECKING, Iterator

import numpy as np  # noqa: F401  (kept: sibling sources import pattern)
import pyarrow as pa

from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource

if TYPE_CHECKING:
    from ray.data.block import BlockAccessor

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
_US = 1_000_000

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("status", pa.int64()),
        ("http_content_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


def _warc_date(ts_us: int) -> str:
    """Microsecond ISO-8601 (WARC 1.1 allows fractional seconds; readers of
    1.0 archives accept it in practice)."""
    import datetime

    dt = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc) + datetime.timedelta(
        microseconds=int(ts_us)
    )
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    import datetime

    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.datetime.strptime(s, fmt).replace(tzinfo=datetime.timezone.utc)
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    return (dt - epoch) // datetime.timedelta(microseconds=1)


def build_record(
    url: str,
    ts_us: int,
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """One ``response`` record: WARC header + HTTP/1.1 response block,
    framed per ISO 28500 (CRLF after the header block, CRLFCRLF after the
    content block). The record id is a deterministic urn:uuid derived from
    (url, ts) so re-writing an identical corpus is byte-identical."""
    body = payload if isinstance(payload, bytes) else bytes(payload)
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    digest = hashlib.md5(f"{url}\x00{ts_us}".encode()).hexdigest()
    rid = f"{digest[:8]}-{digest[8:12]}-{digest[12:16]}-{digest[16:20]}-{digest[20:32]}"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode("ascii")
        # UTF-8, matching the reader's decode: IRIs with non-ASCII paths
        # are common in real frontiers and must round-trip through the sink
        + f"WARC-Target-URI: {url}\r\n".encode("utf-8")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode("ascii")
    )
    return head + _CRLF + http + _CRLF + _CRLF


def _inflate_members(chunks: "Iterator[bytes]") -> "Iterator[bytes]":
    """Streaming multi-member gzip inflate (Common Crawl = one member per
    record): feed raw chunks through successive ``decompressobj``s,
    re-priming on each member boundary via ``unused_data``."""
    d = zlib.decompressobj(wbits=31)
    for chunk in chunks:
        buf = chunk
        while buf:
            out = d.decompress(buf)
            if out:
                yield out
            if d.eof:
                buf = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                buf = b""
    tail = d.flush()
    if tail:
        yield tail


class _Framer:
    """Pull-parser buffer: read-until-delimiter / read-exactly over an
    incrementally fed byte stream."""

    def __init__(self, chunks: "Iterator[bytes]") -> None:
        self._chunks = chunks
        self._buf = bytearray()
        self._eof = False

    def _fill(self) -> bool:
        if self._eof:
            return False
        try:
            self._buf += next(self._chunks)
            return True
        except StopIteration:
            self._eof = True
            return False

    def until(self, delim: bytes) -> bytes | None:
        """Consume and return bytes up to (excluding) ``delim``; None at a
        clean EOF (nothing left but record separators)."""
        while True:
            i = self._buf.find(delim)
            if i >= 0:
                out = bytes(self._buf[:i])
                del self._buf[: i + len(delim)]
                return out
            if not self._fill():
                if not bytes(self._buf).strip(b"\r\n"):
                    return None
                raise ValueError("truncated WARC: EOF inside a record header")

    def exactly(self, n: int) -> bytes:
        while len(self._buf) < n:
            if not self._fill():
                raise ValueError("truncated WARC: EOF inside a content block")
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def parse_warc(chunks: "Iterator[bytes]") -> "Iterator[dict]":
    """Yield one dict per ``response`` record (other record types —
    warcinfo, request, metadata — are skipped, as CC readers do)."""
    fr = _Framer(chunks)
    while True:
        head = fr.until(_HDR_END)
        if head is None:
            return
        # inter-record CRLFCRLF separators ride ahead of the next header
        head = head.lstrip(b"\r\n")
        if not head:
            continue
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"not a WARC record header: {lines[0][:40]!r}")
        hdr: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            hdr[k.strip().lower()] = v.strip()
        clen = int(hdr[b"content-length"])
        block = fr.exactly(clen)
        if hdr.get(b"warc-type") != b"response" or not hdr.get(
            b"content-type", b""
        ).startswith(b"application/http"):
            continue
        http_head, _, body = block.partition(_HDR_END)
        status_line = http_head.split(_CRLF, 1)[0].split(b" ")
        status = int(status_line[1]) if len(status_line) > 1 else 0
        ctype = b""
        for ln in http_head.split(_CRLF)[1:]:
            k, _, v = ln.partition(b":")
            if k.strip().lower() == b"content-type":
                ctype = v.strip()
        yield {
            "url": hdr.get(b"warc-target-uri", b"").decode("utf-8"),
            "warc_ts": _parse_warc_date(hdr[b"warc-date"].decode("ascii")),
            "status": status,
            "http_content_type": ctype.decode("latin-1"),
            "payload": body,
        }


class WarcDatasource(FileBasedDatasource):
    """``read_datasource`` adapter: one streaming parse per WARC file."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, *, batch_rows: int = 2048, **kwargs):
        super().__init__(paths, **kwargs)
        self._batch_rows = batch_rows

    def _read_stream(self, f: "pa.NativeFile", path: str) -> "Iterator[pa.Table]":
        def chunks() -> "Iterator[bytes]":
            while True:
                c = f.read(4 << 20)
                if not c:
                    return
                yield c

        def peeked() -> "Iterator[bytes]":
            it = chunks()
            first = next(it, b"")
            if first.startswith(_GZIP_MAGIC):
                yield from _inflate_members(_chain_one(first, it))
            else:
                yield from _chain_one(first, it)

        rows: list[dict] = []
        for rec in parse_warc(peeked()):
            rows.append(rec)
            if len(rows) >= self._batch_rows:
                yield _rows_to_table(rows)
                rows = []
        if rows:
            yield _rows_to_table(rows)


def _chain_one(first: bytes, rest: "Iterator[bytes]") -> "Iterator[bytes]":
    if first:
        yield first
    yield from rest


def _rows_to_table(rows: "list[dict]") -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "status": pa.array([r["status"] for r in rows], pa.int64()),
            "http_content_type": pa.array(
                [r["http_content_type"] for r in rows], pa.string()
            ),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        }
    )


def read_warc(paths, **kwargs):
    import ray.data as rd

    return rd.read_datasource(WarcDatasource(paths, **kwargs))


class WarcDatasink(BlockBasedFileDatasink):
    """One ``.warc``/``.warc.gz`` file per output block. Input blocks need
    ``url`` + ``payload`` (binary); optional ``warc_ts`` (timestamp[us]),
    ``status``, ``http_content_type``. ``compress=True`` gzips each record
    as its own member (the Common Crawl layout)."""

    def __init__(self, path: str, *, compress: bool = False, **kwargs):
        self._compress = compress
        super().__init__(path, file_format="warc.gz" if compress else "warc", **kwargs)

    def write_block_to_file(self, block: "BlockAccessor", file: "pa.NativeFile") -> None:
        t = block.to_arrow()
        names = set(t.column_names)
        urls = t["url"].to_pylist()
        payloads = t["payload"].to_pylist()
        ts = (
            t["warc_ts"].cast(pa.int64()).to_pylist()
            if "warc_ts" in names
            else [0] * t.num_rows
        )
        status = t["status"].to_pylist() if "status" in names else [200] * t.num_rows
        ctype = (
            t["http_content_type"].to_pylist()
            if "http_content_type" in names
            else ["text/html"] * t.num_rows
        )
        for u, ts_us, st, ct, body in zip(urls, ts, status, ctype, payloads):
            rec = build_record(u, ts_us or 0, body or b"", st or 200, ct or "text/html")
            file.write(gzip.compress(rec, mtime=0) if self._compress else rec)
