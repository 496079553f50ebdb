"""Fetch-session utilities: charset detection, proxy rotation, user agents.

Parity items for the reference's fetch stack (SURVEY.md §2.2) that are
*configuration* of a fetch stage rather than dataflow:

- F3 charset detect/transcode (``collect/collect.go:93-101``): the reference
  sniffs the first 1 KiB with ``charset.DetermineEncoding`` and transcodes to
  UTF-8. Real fetches here are Parquet lookups of already-UTF-8 bodies, so
  the sniffer exists for the live-fetch path: BOM detection + ``<meta``
  charset scan + UTF-8 validation fallback, byte-stable.
- F6 round-robin proxy switcher (``proxy/proxy.go:12-42``): index = counter
  mod len; here the counter is the row index so assignment is deterministic
  and reproducible (the reference's atomic counter is not).
- F7 random user-agent (``extensions/randomua.go``): the reference draws
  versions from ``math/rand``; here versions derive from a seeded hash of
  the url so a re-run assigns identical UAs (reproducibility over entropy).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

_META_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.I)


def sniff_charset(body: bytes, peek: int = 1024) -> str:
    """Charset of an html body from its first ``peek`` bytes (F3)."""
    head = body[:peek]
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if head.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    m = _META_RE.search(head)
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def transcode_utf8(body: bytes) -> str:
    """Decode to UTF-8 text via the sniffed charset (errors replaced —
    matching the lossy-but-total behavior a crawler needs)."""
    cs = sniff_charset(body)
    try:
        return body.decode(cs, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def round_robin_proxy(proxies: list[str]):
    """F6: deterministic round-robin assignment by row index."""
    if not proxies:
        raise ValueError("proxy list is empty")

    def pick(row_index: int) -> str:
        return proxies[row_index % len(proxies)]

    return pick


_UA_TEMPLATES = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/{v}.0.{b}.{p} Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/{v}.0.{p} Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:{v}.0) Gecko/20100101 Firefox/{v}.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/{v}.0.{b}.{p} Safari/537.36 Edg/{v}.0.{b}.{p}",
)


def user_agent_for(url: str, seed: int = 42) -> str:
    """F7: deterministic UA per url (seeded hash replaces math/rand)."""
    h = int.from_bytes(hashlib.md5(f"{seed}:{url}".encode()).digest()[:8], "big")
    tpl = _UA_TEMPLATES[h % len(_UA_TEMPLATES)]
    return tpl.format(v=90 + (h >> 8) % 30, b=3000 + (h >> 16) % 2000, p=(h >> 32) % 200)


@dataclass(frozen=True)
class FetchSession:
    """Per-task fetch configuration — the reference's BrowserFetch options
    (``collect/collect.go:62-91``: proxy, user agent, **cookie**, timeout).
    A live Fetcher implementation consumes this; the Parquet probe ignores
    it, but header assembly is parity-tested either way."""

    cookie: str = ""  # collect/collect.go:69-75 (req.Header.Set("Cookie", ...))
    proxies: tuple[str, ...] = ()
    ua_seed: int = 42
    random_ua: bool = True
    timeout_s: float = 30.0


def build_headers(session: FetchSession, url: str, row_index: int) -> dict[str, str]:
    """Assemble the request headers + proxy the reference's BrowserFetch
    sets per request (UA always, Cookie when configured; proxy picked
    round-robin by row index). Deterministic per (session, url, row)."""
    headers: dict[str, str] = {}
    if session.random_ua:
        headers["User-Agent"] = user_agent_for(url, session.ua_seed)
    if session.cookie:
        headers["Cookie"] = session.cookie
    if session.proxies:
        headers["X-Proxy"] = round_robin_proxy(list(session.proxies))(row_index)
    return headers
