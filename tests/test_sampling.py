"""Semantics pins for the deterministic samplers on constructed skewed
corpora (the DuckDB oracle gate covers the uniform sf tables, where
temperature rebalancing is a no-op by construction)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _write_sources(tmp_path, sizes: dict[str, int]):
    ids, srcs = [], []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            ids.append(i)
            srcs.append(s)
            i += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_temperature_mix_rebalances_skewed_sources(ray_session, tmp_path):
    """alpha=1/2 mixing on a 100:1 skew: the rare source keeps ~everything
    (probability caps at 1), the dominant source is downsampled toward the
    sqrt-share, and realized keep counts track the integer thresholds."""
    from crawler_ray.pipelines.sampling import _M32, _h32, temperature_mix_docs
    import numpy as np

    # mid sits above the cap boundary (N/2W)^2 so all three branches are
    # exercised: rare caps at 1, mid and mega downsample monotonically
    sizes = {"mega": 40000, "mid": 9000, "rare": 100}
    sf = _write_sources(tmp_path, sizes)
    kept = temperature_mix_docs(sf).to_pandas()
    rates = (kept.source.value_counts() / pa.array(list(sizes.values())).to_pandas().set_axis(list(sizes))).to_dict()
    # expected integer thresholds, same arithmetic as the op
    total = sum(sizes.values())
    n_target = total // 2
    w = {s: math.isqrt(n) for s, n in sizes.items()}
    wsum = sum(w.values())
    thr = {s: min(_M32, (_M32 * w[s] * n_target) // (wsum * sizes[s])) for s in sizes}
    # rare source's probability caps at 1 -> kept in full
    assert thr["rare"] == _M32
    assert rates["rare"] == 1.0
    # dominant source downsampled hardest; monotone in source size
    assert rates["mega"] < rates["mid"] < 1.0
    # exact realized counts: every kept id satisfies the hash rule and no
    # qualifying id is missing
    ids = np.arange(total, dtype=np.int64)
    srcs = np.repeat(list(sizes), list(sizes.values()))
    lim = np.fromiter((thr[s] for s in srcs), np.uint64, total)
    want = set(ids[_h32(ids) < lim].tolist())
    assert set(kept.doc_id) == want
