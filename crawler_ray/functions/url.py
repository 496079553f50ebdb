"""URL canonicalization / identity functions.

Reference semantics reproduced here:

- request identity = ``hex(md5(url + method))``
  (reference ``collect/request.go:42-45``) — this is the canonical
  URL-seen key, kept byte-compatible so the final seen set can be compared
  against the reference semantics oracle.
- host extraction feeds the per-host politeness budget and the
  frontier ``groupby(host)`` shuffle (the reference has no per-host
  fairness at all — SURVEY.md §4).

All functions are vectorized over Arrow arrays / numpy; no per-row Python in
the hot path beyond the md5 loop (hashlib has no batch API; the loop is over a
single batch and is C-bound inside hashlib).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# xxhash-style 64-bit mix over md5-derived bytes; used only for sharding /
# partitioning (not identity), so any stable uint64 works.
_U64 = np.uint64


def urlseen_key(urls: pa.Array | list[str], method: str = "GET") -> pa.Array:
    """hex(md5(url + method)) per url — reference collect/request.go:42-45."""
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    suffix = method.encode()
    return pa.array(
        [hashlib.md5(u.encode() + suffix).hexdigest() for u in urls],
        type=pa.string(),
    )


def url_hash64(urls: pa.Array | list[str], method: str = "GET") -> pa.Array:
    """Stable uint64 digest (first 8 bytes of md5(url+method), big-endian).

    Used for shard routing (seen-set actors), hash-join bucketing against the
    pages table and repartition-by-host-hash. Deterministic across processes
    (unlike Python ``hash``).
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    suffix = method.encode()
    vals = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        vals[i] = int.from_bytes(hashlib.md5(u.encode() + suffix).digest()[:8], "big")
    return pa.array(vals, type=pa.uint64())


def url_identity(urls: pa.Array | list[str], method: str = "GET") -> tuple[pa.Array, pa.Array]:
    """One md5 per url, both identity forms derived from it: (hex key,
    uint64 shard hash). ``urlseen_key`` + ``url_hash64`` separately would
    digest every url twice — at 1.5M frontier rows per generation that is
    the admission stage's single biggest Python cost."""
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    suffix = method.encode()
    keys: list[str] = []
    vals = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.md5(u.encode() + suffix).digest()
        keys.append(d.hex())
        vals[i] = int.from_bytes(d[:8], "big")
    return pa.array(keys, type=pa.string()), pa.array(vals, type=pa.uint64())


def host_of(urls: pa.Array) -> pa.Array:
    """Vectorized host extraction: strip scheme, take up to first '/'.

    Arrow-only (regex kernel), no Python loop.
    """
    # scheme://host/path → host
    return pc.replace_substring_regex(
        urls, pattern=r"^[a-z][a-z0-9+.-]*://([^/]*).*$", replacement=r"\1"
    )


# Tracking query parameters stripped during canonicalization (the
# click-identity noise that makes one logical page look like many URLs).
# The two regexes are shared verbatim with the oracle's Python ``re`` path —
# RE2 (Arrow) and Python ``re`` agree on these constructs by construction.
_TRACK = r"(?:utm_[A-Za-z0-9_]*|gclid|fbclid)"
# anchored on the preceding separator (captured and restored) so a "utm_"
# inside a parameter VALUE never matches
TRACKING_MID_RE = rf"([?&])(?:{_TRACK}=[^&#]*&)+"  # tracking run before another param
TRACKING_TAIL_RE = rf"[?&]{_TRACK}=[^&#]*$"  # trailing tracking param


def canonicalize(urls: pa.Array) -> pa.Array:
    """Canonical URL form: strip fragment, strip tracking query params
    (``utm_*`` / ``gclid`` / ``fbclid``), strip a trailing empty ``?``.

    The reference does no canonicalization (identity is the raw url
    string); we keep the transformation conservative and fully mirrored by
    the oracle so seen-keys still compare: fragment strip + tracking-param
    strip are what any real frontier must do to stop click-id noise from
    multiplying the seen set.
    """
    # strip #fragment
    out = pc.replace_substring_regex(urls, pattern=r"#.*$", replacement="")
    # strip tracking params: first those followed by another param (the
    # leading ?/& survives for what follows), then a trailing run
    out = pc.replace_substring_regex(out, pattern=TRACKING_MID_RE, replacement="\\1")
    out = pc.replace_substring_regex(out, pattern=TRACKING_TAIL_RE, replacement="")
    # strip trailing ? (empty query)
    out = pc.replace_substring_regex(out, pattern=r"\?$", replacement="")
    return out


def host_shard(hosts: pa.Array, num_shards: int) -> np.ndarray:
    """Deterministic shard id per host (same host → same shard, required for
    politeness-gate correctness, SURVEY.md §7.3)."""
    hl = hosts.to_pylist() if isinstance(hosts, (pa.Array, pa.ChunkedArray)) else hosts
    out = np.empty(len(hl), dtype=np.int64)
    for i, h in enumerate(hl):
        out[i] = int.from_bytes(hashlib.md5(h.encode()).digest()[:8], "big") % num_shards
    return out
