"""The adaptive driver cuts must agree with their distributed fallbacks.

Every size-adaptive tail added for bench-scale fixed costs keeps a
distributed path for corpus-scale inputs; these tests force that path via
the cut env knobs (0 disables the driver shortcut) and pin it row-for-row
against the default path, so the fallback branches cannot silently rot
while all test corpora sit below the cuts."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run(fn, monkeypatch, env: dict[str, str]) -> pd.DataFrame:
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    try:
        res = fn(SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return _norm(df)
    finally:
        for k in env:
            monkeypatch.delenv(k, raising=False)


@pytest.mark.parametrize(
    "qual,env",
    [
        ("dedup.simhash_dups", {"CRAWLER_RAY_PAIR_CUT": "0"}),
        ("dedup.minhash_lsh_dups", {"CRAWLER_RAY_CAND_CUT": "0"}),
        ("dedup.minhash_dedup_keep", {"CRAWLER_RAY_PAIR_CUT": "0"}),
        ("multimodal.media_dedup_near", {"CRAWLER_RAY_PAIR_CUT": "0"}),
        ("text.ccnet_buckets", {"CRAWLER_RAY_BCAST_ROWS": "0"}),
        ("relational.q22_dormant_customers", {"CRAWLER_RAY_BCAST_ROWS": "0"}),
        ("prep.prep_training_corpus", {"CRAWLER_RAY_BCAST_ROWS": "0"}),
    ],
)
def test_distributed_fallback_matches_driver_cut(ray_session, monkeypatch, qual, env):
    import importlib

    mod_name, fn_name = qual.split(".")
    mod = importlib.import_module(f"crawler_ray.pipelines.{mod_name}")
    fn = getattr(mod, fn_name)

    default = _run(fn, monkeypatch, {})
    forced = _run(fn, monkeypatch, env)
    pd.testing.assert_frame_equal(default, forced)
