"""Multimodal columns: opaque binary payloads + typed metadata.

Media (image/audio/video) travels as a ``binary`` column with typed
metadata columns, exactly like the pages ``html`` column — the Ray-side
plumbing (schema, actor-pool decode stage, small batch sizes for large
payloads, per-frame flat_map) is real and tested; the *codec* itself is
stubbed because no image/audio libraries exist in this container:

- ``MediaDecoder`` tries ``PIL`` at actor init (once per actor); absent, it
  falls back to a deterministic fake decoder that parses our self-describing
  fake header. A real deployment swaps the decode body only.
- ``frame_sample`` shows the 1→N explode (video → sampled frames) as a
  batch transform.

The synthetic media table is derived deterministically from the documents
table (seeded by doc_id), cached next to the pages corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

MEDIA_MAGIC = b"FAKEMEDIA1"


def synth_media(sf_dir: str, cache_root: str = "/tmp/crawler_ray_cache") -> str:
    """Deterministic media table: doc_id, media_type, media (binary with a
    self-describing header), declared_w, declared_h."""
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tag = f"media_{os.path.basename(os.path.normpath(sf_dir))}_{n}_v2"
    path = os.path.join(cache_root, tag + ".parquet")
    if os.path.exists(path):
        return path
    os.makedirs(cache_root, exist_ok=True)
    ids, types, blobs, ws, hs = [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        kind = ("image", "audio", "video")[i % 3]
        w, h = int(16 + (i % 32) * 8), int(16 + (i % 24) * 8)
        nframes = 1 if kind == "image" else (8 if kind == "video" else 0)
        payload = rng.integers(0, 256, size=256 + (i % 512), dtype=np.uint8).tobytes()
        header = (
            MEDIA_MAGIC
            + kind.encode().ljust(8, b"\0")
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + nframes.to_bytes(4, "big")
        )
        ids.append(i)
        if i % 5 == 4 and i >= 5:
            # every 5th row re-posts an earlier asset byte-for-byte (the
            # repost/mirror pattern content dedup exists for) — metadata
            # columns copied along so decode stays self-consistent
            types.append(types[i - 4])
            blobs.append(blobs[i - 4])
            ws.append(ws[i - 4])
            hs.append(hs[i - 4])
            continue
        types.append(kind)
        blobs.append(header + payload)
        ws.append(w)
        hs.append(h)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "media": pa.array(blobs, pa.binary()),
            "declared_w": pa.array(ws, pa.int32()),
            "declared_h": pa.array(hs, pa.int32()),
        }
    )
    pq.write_table(tbl, path)
    return path


class MediaDecoder:
    """Actor-pool decode stage: real-codec probe once per actor in
    ``__init__``; per-batch decode in ``__call__`` (small batches — payloads
    are large; batch_size is the memory knob here).

    Backend dispatch is the real-deployment seam: with ``PIL`` importable
    the decode body runs ``Image.open`` on the raw bytes (synthetic
    ``MEDIA_MAGIC`` blobs still take the header parse, so mixed corpora
    work); without it, only the deterministic fake decoder is available —
    this container ships no image/audio libraries, so the pil branch is
    exercised by module-injection in tests, not skipped code."""

    def __init__(self, backend: str | None = None):
        if backend is None:
            try:
                import PIL.Image  # noqa: F401

                backend = "pil"
            except ImportError:
                backend = "fake"
        self.backend = backend

    def _decode_fake(self, blob: bytes) -> tuple[str, int, int, int, int]:
        if not blob.startswith(MEDIA_MAGIC):
            return ("invalid", 0, 0, 0, 0)
        kind = blob[10:18].rstrip(b"\0").decode()
        w = int.from_bytes(blob[18:22], "big")
        h = int.from_bytes(blob[22:26], "big")
        nframes = int.from_bytes(blob[26:30], "big")
        body = np.frombuffer(blob[30:], dtype=np.uint8)
        return (kind, w, h, nframes, int(body.mean() * 1000) if len(body) else 0)

    def _decode_pil(self, blob: bytes) -> tuple[str, int, int, int, int]:
        import io

        from PIL import Image

        if blob.startswith(MEDIA_MAGIC):  # synthetic blob in a real env
            return self._decode_fake(blob)
        try:
            with Image.open(io.BytesIO(blob)) as im:
                w, h = im.size
                nframes = int(getattr(im, "n_frames", 1))
                arr = np.asarray(im.convert("L"), dtype=np.uint8)
                mean = int(arr.mean() * 1000) if arr.size else 0
                return ("image", int(w), int(h), nframes, mean)
        except Exception:  # undecodable bytes → invalid, not a crash
            return ("invalid", 0, 0, 0, 0)

    def _decode(self, blob: bytes) -> tuple[str, int, int, int, int]:
        if self.backend == "pil":
            return self._decode_pil(blob)
        return self._decode_fake(blob)

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds, ws, hs, nf, mb = [], [], [], [], []
        for blob in t["media"].to_pylist():
            k, w, h, n, m = self._decode(blob)
            kinds.append(k)
            ws.append(w)
            hs.append(h)
            nf.append(n)
            mb.append(m)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_type": t["media_type"],
                "decoded_type": pa.array(kinds, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(nf, pa.int32()),
                "mean_byte_m": pa.array(mb, pa.int64()),
                "n_bytes": pa.array([len(b) for b in t["media"].to_pylist()], pa.int64()),
            }
        )


def media_features(sf_dir: str) -> rd.Dataset:
    """Decode + feature-extract over the media table (actor pool, small
    batches because payloads are heavy)."""
    path = synth_media(sf_dir)
    ds = rd.read_parquet(path)
    return ds.map_batches(MediaDecoder, concurrency=(1, 4), batch_size=128, batch_format="pyarrow")


def frame_sample(sf_dir: str) -> rd.Dataset:
    """Video rows explode into sampled frame rows (every 2nd frame) — the
    1→N media transform shape."""
    feats = media_features(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        ids, frames = [], []
        for did, kind, n in zip(
            t["doc_id"].to_pylist(), t["decoded_type"].to_pylist(), t["n_frames"].to_pylist()
        ):
            if kind == "video":
                for f in range(0, n, 2):
                    ids.append(did)
                    frames.append(f)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
        )

    return feats.map_batches(explode, batch_format="pyarrow")


def media_dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact content dedup over the opaque media ``binary`` column — the
    multimodal twin of ``dedup_exact`` (reposted/mirrored assets collapse
    regardless of doc metadata). Per batch: md5 the payload bytes; then one
    groupby(digest) exchange keeps the smallest doc_id + dup_count. Only
    16-byte digests shuffle, never the payloads — at 100 TB of media the
    exchange is ~1/10^5 of the corpus."""
    import hashlib

    from ray.data.aggregate import Count, Min

    path = synth_media(sf_dir)
    ds = rd.read_parquet(path, columns=["doc_id", "media"])

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(b).hexdigest() for b in t["media"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "media_md5": pa.array(fps, pa.string())}
        )

    import pyarrow.compute as pc

    agg = (
        ds.map_batches(fp, batch_size=256, batch_format="pyarrow")
        .groupby("media_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "media_md5": t["media_md5"],
                "dup_count": pc.cast(t["dup_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


QUERIES = {
    "media_features": media_features,
    "media_frame_sample": frame_sample,
    "media_dedup_exact": media_dedup_exact,
}

ORACLE_SQL: dict[str, str] = {}
