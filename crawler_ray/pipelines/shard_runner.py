"""Resumable partitioned output for embarrassingly-parallel stages.

The 100-TB operational requirement (BASELINE/brief): a failed curation run
must not redo finished work. For per-document stages (token stats, quality
scores, fingerprints, language ID, sampling — anything with no cross-doc
state), the input's file list is hash-assigned to ``shards`` groups; each
shard runs as its own small Dataset pipeline and writes
``out_dir/shard=K/`` with an atomic ``_DONE`` marker (rows + wall time)
written only after the parquet lands. A rerun — after a crash, an OOM kill
or a preemption — skips every marked shard and recomputes only the rest.

This is deliberately the same contract as the crawl's per-generation
checkpoints (``pipelines/crawl.py``): data first, marker last, marker
presence = unit of completed work, re-entry deletes unmarked partial
output before re-running (Ray's ``write_parquet`` appends rather than
overwrites — see ADVICE r1).

Shard-level, not task-level, recovery: WITHIN a run Ray already retries
failed tasks; this covers whole-driver failures, where the object store
and any un-checkpointed Dataset are gone.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from collections.abc import Callable

import ray.data as rd


def shard_files(files: list[str], shards: int) -> list[list[str]]:
    """Deterministic file → shard assignment (crc32 of basename, so the
    layout survives a move of the input directory)."""
    out: list[list[str]] = [[] for _ in range(shards)]
    for f in sorted(files):
        out[zlib.crc32(os.path.basename(f).encode()) % shards].append(f)
    return out


def sharded_run(
    files: list[str],
    stage_fn: Callable[[rd.Dataset], rd.Dataset],
    out_dir: str,
    shards: int = 16,
) -> dict:
    """Run ``stage_fn`` over ``files`` with per-shard resumability.

    Returns a manifest dict {shard: {"rows": n, "sec": s, "skipped": bool}}.
    ``stage_fn`` must be per-row/per-batch pure (no cross-shard state) —
    that is what makes shard = unit-of-restart sound.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest: dict[int, dict] = {}
    for k, group in enumerate(shard_files(files, shards)):
        sdir = os.path.join(out_dir, f"shard={k}")
        marker = os.path.join(sdir, "_DONE")
        if os.path.exists(marker):
            with open(marker) as fh:
                manifest[k] = {**json.load(fh), "skipped": True}
            continue
        # unmarked partial output from a crashed run must not survive —
        # write_parquet appends uuid-named files instead of overwriting
        shutil.rmtree(sdir, ignore_errors=True)
        if not group:
            os.makedirs(sdir, exist_ok=True)
            with open(marker + ".tmp", "w") as fh:
                json.dump({"rows": 0, "sec": 0.0}, fh)
            os.replace(marker + ".tmp", marker)
            manifest[k] = {"rows": 0, "sec": 0.0, "skipped": False}
            continue
        t0 = time.time()
        ds = stage_fn(rd.read_parquet(group))
        ds.write_parquet(sdir)
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
            for f in os.listdir(sdir)
            if f.endswith(".parquet")
        )
        entry = {"rows": rows, "sec": round(time.time() - t0, 3)}
        with open(marker + ".tmp", "w") as fh:
            json.dump(entry, fh)
        os.replace(marker + ".tmp", marker)
        manifest[k] = {**entry, "skipped": False}
    return manifest
