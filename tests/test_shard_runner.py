"""Resumable sharded output: crash mid-run, rerun, nothing redone twice."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from crawler_ray.pipelines.shard_runner import shard_files, sharded_run

SF = "/root/testdata/sf0.001"


def _inputs(tmp_path, n_files: int = 6, rows_per: int = 40) -> list[str]:
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    files = []
    for i in range(n_files):
        part = src.slice(i * rows_per, rows_per)
        p = str(tmp_path / f"in_{i}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _stage(ds):
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars2": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _all_rows(out_dir: str) -> set[tuple[int, int]]:
    rows = set()
    for root, _, fs in os.walk(out_dir):
        for f in fs:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f))
                rows.update(zip(t["doc_id"].to_pylist(), t["n_chars2"].to_pylist()))
    return rows


def test_resume_skips_completed_shards(ray_session, tmp_path):
    files = _inputs(tmp_path)
    out = str(tmp_path / "out")
    shards = 4

    # simulate a crash: a first run that dies after finishing ONE shard —
    # run the real thing on a copy of the shard-0 file group only, then
    # leave a partial (unmarked) parquet in another shard's dir
    groups = shard_files(files, shards)
    first_done = next(k for k, g in enumerate(groups) if g)
    m1 = sharded_run(files=groups[first_done], stage_fn=_stage, out_dir=out, shards=1)
    os.rename(os.path.join(out, "shard=0"), os.path.join(out, f"shard={first_done}"))
    assert m1[0]["skipped"] is False

    partial_k = next(k for k, g in enumerate(groups) if g and k != first_done)
    pdir = os.path.join(out, f"shard={partial_k}")
    os.makedirs(pdir)
    pq.write_table(
        pa.table({"doc_id": pa.array([999999], pa.int64()), "n_chars2": pa.array([1], pa.int64())}),
        os.path.join(pdir, "partial-garbage.parquet"),
    )  # unmarked partial output from the "crashed" run

    before = {
        f: os.path.getmtime(os.path.join(out, f"shard={first_done}", f))
        for f in os.listdir(os.path.join(out, f"shard={first_done}"))
    }

    manifest = sharded_run(files=files, stage_fn=_stage, out_dir=out, shards=shards)

    # completed shard untouched and skipped; partial shard rebuilt clean
    assert manifest[first_done]["skipped"] is True
    after = {
        f: os.path.getmtime(os.path.join(out, f"shard={first_done}", f))
        for f in os.listdir(os.path.join(out, f"shard={first_done}"))
    }
    assert before == after
    assert manifest[partial_k]["skipped"] is False

    # output equals a direct single-pass run (and the garbage row is gone)
    direct = _stage(__import__("ray").data.read_parquet(files))
    want = {
        (r["doc_id"], r["n_chars2"])
        for b in direct.to_pandas().to_dict("records")
        for r in [b]
    }
    got = _all_rows(out)
    assert got == want
    assert (999999, 1) not in got

    # a rerun on a COMPLETE out_dir does nothing at all
    m3 = sharded_run(files=files, stage_fn=_stage, out_dir=out, shards=shards)
    assert all(v["skipped"] for v in m3.values())
