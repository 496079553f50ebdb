"""Shared execution helpers for the query pipelines."""

from __future__ import annotations

import os

import ray
import ray.data as rd


def emb_matrix(col) -> "np.ndarray":
    """(rows, dim) float64 from a ``list<float>`` column via the zero-copy
    flat-values path — ~6× faster than ``np.vstack`` over per-row object
    arrays, bit-identical output. Assumes fixed-length, null-free lists
    (the embeddings-table contract)."""
    import numpy as np

    import pyarrow.compute as pc

    ca = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    flat = ca.flatten().to_numpy(zero_copy_only=False)
    if len(ca):
        if ca.null_count:
            raise ValueError("embedding column has null rows")
        vl = pc.list_value_length(ca)
        if pc.min(vl).as_py() != pc.max(vl).as_py():
            # a ragged column whose total happens to divide evenly would
            # otherwise reshape into silently misaligned rows
            raise ValueError("embedding lists are ragged")
    return flat.reshape(len(ca), -1).astype(np.float64)


def dpart_of(ids, parts: int):
    """Coarse doc-hash partition codes (Knuth multiplicative, the idiom the
    co-group/tag-union stages share) as an int32 pyarrow array."""
    import numpy as np
    import pyarrow as pa

    u = ids.astype(np.uint64)
    return pa.array(((u * np.uint64(2654435761)) % np.uint64(parts)).astype(np.int32))


def effective_cpus(default: int = 8) -> int:
    """The Data executor's real CPU budget: cluster CPUs clamped by any
    ``execution_options.resource_limits.cpu`` cap (bench.py sets one on this
    sandbox because memory bandwidth saturates past ~16 workers)."""
    cpus = default
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", default))
    try:
        lim = rd.DataContext.get_current().execution_options.resource_limits.cpu
        if lim:
            cpus = min(cpus, int(lim))
    except Exception:
        pass
    return cpus


def shuffle_cut(ds: rd.Dataset, threshold: int = 8) -> rd.Dataset:
    """Adaptive materialize-cut between an expensive ``map_batches`` and a
    sort-based groupby.

    Fused with the Sort, the streaming executor reserves resources for the
    downstream all-to-all and throttles the upstream map to ~1 concurrent
    task when the CPU budget is small (measured 31 s fused vs 5 s split at
    8 cpus on 240k docs). At larger budgets the reservation leaves enough
    headroom and the extra materialization only costs wall clock (the
    round-2 dedup_exact bench regressed 1.4 s → 3.0 s at 32 cpus from an
    unconditional cut), so the cut applies only when ``effective_cpus() <=
    threshold``. ``CRAWLER_RAY_SHUFFLE_CUT=0/1`` forces either behavior.
    """
    force = os.environ.get("CRAWLER_RAY_SHUFFLE_CUT")
    if force is not None:
        return ds.materialize() if force != "0" else ds
    return ds.materialize() if effective_cpus() <= threshold else ds
