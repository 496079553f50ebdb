"""Property-based pins (hypothesis) over the pure-function kernels: WARC
framing, the window-occurrence rolling hash, the next-fit packer, the cuckoo
filter's no-false-negative contract, Atoi semantics and the media codecs.
All pure Python/numpy — no Ray session needed."""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# the CI box is contended; walls vary — never fail on timing
_S = settings(max_examples=50, deadline=None)

_payload = st.binary(min_size=0, max_size=200).flatmap(
    lambda b: st.sampled_from(
        [b, b + b"\r\n\r\n" + b, b"WARC/1.0\r\n" + b, b + b"\r\nContent-Length: 4\r\n"]
    )
)
_url = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E), min_size=1, max_size=40
).map(lambda s: f"https://h.example.com/{s}")


@_S
@given(
    recs=st.lists(
        st.tuples(_url, st.integers(0, 2**48), _payload, st.integers(100, 599)),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(1, 300),
    compress=st.booleans(),
)
def test_warc_roundtrip_adversarial(recs, chunk, compress):
    """Content-Length framing survives payloads that CONTAIN record
    delimiters and header-lookalike bytes, any chunk split, both layouts."""
    from crawler_ray.sources.warc import _inflate_members, build_record, parse_warc

    blobs = [build_record(u, ts, body, stt) for u, ts, body, stt in recs]
    if compress:
        raw = b"".join(gzip.compress(b, mtime=0) for b in blobs)
        chunks = iter([raw[i : i + chunk] for i in range(0, len(raw), chunk)])
        rows = list(parse_warc(_inflate_members(chunks)))
    else:
        raw = b"".join(blobs)
        rows = list(parse_warc(iter([raw[i : i + chunk] for i in range(0, len(raw), chunk)])))
    assert [(r["url"], r["warc_ts"], r["payload"], r["status"]) for r in rows] == recs


_token = st.text(alphabet="abc", min_size=1, max_size=3)


@_S
@given(
    docs=st.lists(st.lists(_token, min_size=0, max_size=12), min_size=1, max_size=6),
    k=st.integers(1, 5),
)
def test_window_occurrences_invariants(docs, k):
    """Per doc: exactly max(0, n_tokens-k+1) windows at positions 0..n-k;
    extra inter-token spacing never changes the hash sequence; equal token
    streams hash equal."""
    from crawler_ray.pipelines.dedup import _window_occurrences

    def table(texts):
        return pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )

    ids, pos, wh = _window_occurrences(table([" ".join(d) for d in docs]), k)
    by_doc = {i: pos[ids == i] for i in range(len(docs))}
    for i, d in enumerate(docs):
        expect = max(0, len(d) - k + 1)
        assert len(by_doc[i]) == expect
        assert sorted(by_doc[i].tolist()) == list(range(expect))
    # double-spaced twin: same token streams => identical (ids, pos, hash)
    ids2, pos2, wh2 = _window_occurrences(table(["  ".join(d) for d in docs]), k)
    assert np.array_equal(ids, ids2) and np.array_equal(pos, pos2) and np.array_equal(wh, wh2)
    # equal docs hash equal, window by window
    for i, d1 in enumerate(docs):
        for j, d2 in enumerate(docs):
            if d1 == d2:
                assert np.array_equal(wh[ids == i], wh[ids == j])


@_S
@given(
    ntok=st.lists(st.integers(1, 64), min_size=1, max_size=100),
    seq_len=st.integers(64, 256),
)
def test_next_fit_packer_invariants(ntok, seq_len):
    from crawler_ray.pipelines.prep import _next_fit

    ids = np.arange(1000, 1000 + len(ntok), dtype=np.int64)
    nt = np.asarray(ntok, np.int64)
    seq_ids, offsets = _next_fit(ids, nt, seq_len)
    assert (offsets >= 0).all() and (offsets + nt <= seq_len).all()
    # bins are contiguous runs labeled by their first doc's id, tightly packed
    start = 0
    for i in range(1, len(ids) + 1):
        if i == len(ids) or seq_ids[i] != seq_ids[start]:
            run = slice(start, i)
            assert seq_ids[start] == ids[start]
            assert offsets[start] == 0
            assert np.array_equal(
                offsets[run][1:], (offsets[run] + nt[run])[:-1]
            ), "bins must pack with no gaps"
            start = i
    # greedy next-fit: a doc opens a new bin ONLY when it would overflow
    for i in range(1, len(ids)):
        if seq_ids[i] != seq_ids[i - 1]:
            assert offsets[i - 1] + nt[i - 1] + nt[i] > seq_len


@_S
@given(
    keys=st.lists(
        st.integers(0, 2**62), min_size=1, max_size=300, unique=True
    ),
    drop_mod=st.integers(2, 5),
)
def test_cuckoo_never_false_negative(keys, drop_mod):
    """The seen-set contract the crawl engine relies on: a present key is
    ALWAYS reported present — across inserts and unrelated deletes."""
    from crawler_ray.state.filters import CuckooFilter

    f = CuckooFilter(capacity=4 * len(keys) + 64)
    arr = np.asarray(keys, np.int64)
    assert f.add_many(arr)
    assert f.contains_many(arr).all()
    removed = arr[::drop_mod]
    kept = np.setdiff1d(arr, removed)
    for k in removed.tolist():
        f.remove(k)
    if len(kept):
        assert f.contains_many(kept).all(), "delete of other keys lost a live key"


@_S
@given(n=st.integers(-(2**40), 2**40), junk=st.text(max_size=4))
def test_atoi_go_semantics(n, junk):
    from crawler_ray.rules import _atoi

    assert _atoi(str(n)) == n
    assert _atoi(f" {n}") == 0  # Go Atoi rejects surrounding whitespace
    assert _atoi(f"{n} ") == 0
    if not (junk.isdigit() and str(n).lstrip("+-").isdigit()):
        s = str(n) + junk
        import re

        assert _atoi(s) == (int(s) if re.fullmatch(r"[+-]?[0-9]+", s) else 0)


@_S
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    frames=st.integers(1, 4),
)
def test_media_codecs_roundtrip(h, w, seed, frames):
    """BMP (incl. non-multiple-of-4 row padding), WAV and the BMPV1 frame
    container all decode back to the exact pixels/samples written."""
    from crawler_ray.pipelines.multimodal import (
        decode_bmp24,
        decode_bmp_video,
        decode_wav_pcm,
        encode_bmp24,
        encode_bmp_video,
        encode_wav_pcm8,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp24(encode_bmp24(px)), px)
    samples = rng.integers(0, 256, 1 + seed % 50, dtype=np.uint8)
    got, bits, rate = decode_wav_pcm(encode_wav_pcm8(samples, rate=8000))
    assert bits == 8 and rate == 8000 and np.array_equal(got, samples)
    fs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(frames)]
    back = decode_bmp_video(encode_bmp_video(fs))
    assert len(back) == frames and all(np.array_equal(a, b) for a, b in zip(back, fs))
