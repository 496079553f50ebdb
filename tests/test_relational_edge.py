"""Edge cases for the histogram-refinement exact-quantile operator.

The DuckDB oracle gate pins ``price_quantiles`` on the sf tables; these pin
the degenerate shapes the sf data never produces: a single-value column
(histogram width 1, every rank in one bucket) and n=1, plus rank placement
on a tiny n where ceil(q*n) sits exactly on bucket boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.pipelines.relational import price_quantiles

QS = (25, 50, 75, 90, 99)


def _write_lineitem(tmp_path, prices):
    pq.write_table(
        pa.table({"l_extendedprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def _expected(prices):
    cents = np.sort(np.round(np.asarray(prices) * 100).astype(np.int64))
    n = len(cents)
    return {q: int(cents[-((-q * n) // 100) - 1]) for q in QS}


def _check(tmp_path, prices):
    out = price_quantiles(_write_lineitem(tmp_path, prices))
    got = dict(zip(out["q_pct"].to_pylist(), out["value_c"].to_pylist()))
    assert got == _expected(prices)


def test_all_equal_values(ray_session, tmp_path):
    _check(tmp_path, [7.77] * 100)


def test_single_row(ray_session, tmp_path):
    _check(tmp_path, [123.45])


def test_tiny_n_boundary_ranks(ray_session, tmp_path):
    # n=4: ceil(q*n) = 1,2,3,4,4 — exercises every boundary placement
    _check(tmp_path, [40.0, 10.0, 30.0, 20.0])


def test_lookup_join_paths(ray_session, monkeypatch):
    """The adaptive join must produce identical results on its broadcast
    path, its duplicate-key fallback, and its over-threshold fallback."""
    import pandas as pd
    import ray.data as rd

    from crawler_ray.pipelines import relational as rel

    left = pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                     "x": pa.array([10, 20, 21, 30, 50], pa.int64())})
    right_uniq = pa.table({"rk": pa.array([2, 3, 4], pa.int64()),
                           "p": pa.array(["b", "c", "d"], pa.string())})
    right_dup = pa.table({"rk": pa.array([2, 2, 3], pa.int64()),
                          "p": pa.array(["b1", "b2", "c"], pa.string())})

    def run(right):
        out = rel._lookup_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", "rk", ["p"]
        ).to_pandas()
        return out.sort_values(["k", "x", "p"]).reset_index(drop=True)

    def expected(right):
        m = left.to_pandas().merge(
            right.to_pandas(), left_on="k", right_on="rk"
        )[["k", "x", "p"]]
        return m.sort_values(["k", "x", "p"]).reset_index(drop=True)

    # broadcast path (small, unique)
    pd.testing.assert_frame_equal(run(right_uniq)[["k", "x", "p"]], expected(right_uniq))
    # duplicate-key fallback must route through Dataset.join
    pd.testing.assert_frame_equal(run(right_dup)[["k", "x", "p"]], expected(right_dup))
    # over-threshold fallback
    monkeypatch.setattr(rel, "_BROADCAST_JOIN_ROWS", 1)
    pd.testing.assert_frame_equal(run(right_uniq)[["k", "x", "p"]], expected(right_uniq))


def test_skewed_two_cluster(ray_session, tmp_path):
    # 99% of mass in one narrow cluster, the p99 rank in the far tail
    rng = np.random.default_rng(7)
    prices = np.concatenate(
        [rng.uniform(10.0, 10.5, 990), rng.uniform(90000.0, 90001.0, 10)]
    )
    _check(tmp_path, prices.tolist())


def _write_part(tmp_path, brands, prices):
    pq.write_table(
        pa.table(
            {
                "p_brand": pa.array(brands, pa.string()),
                "p_retailprice": pa.array(prices, pa.float64()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    return str(tmp_path)


def test_brand_quantiles_disc_rule(ray_session, tmp_path):
    """percentile_disc rule: idx = ceil(q*n) (1-based) within each key."""
    from crawler_ray.pipelines.relational import brand_price_quantiles

    sf = _write_part(
        tmp_path,
        ["A"] * 4 + ["B"],
        [0.10, 0.20, 0.30, 0.40, 0.05],
    )
    df = brand_price_quantiles(sf).to_pandas().set_index("p_brand")
    # A: n=4 -> p50 = 2nd value (20c), p90 = ceil(3.6)=4th (40c)
    assert df.loc["A", "p50_c"] == 20 and df.loc["A", "p90_c"] == 40
    assert df.loc["B", "p50_c"] == 5 and df.loc["B", "p90_c"] == 5
    assert df.loc["A", "n"] == 4 and df.loc["B", "n"] == 1


def test_hopping_window_membership(ray_session, tmp_path):
    """An event belongs to exactly size/hop windows whose starts are the
    preceding hop-aligned instants."""
    from crawler_ray.pipelines.relational import hopping_window_counts

    ts = pa.array([np.datetime64("2024-01-01T01:07:30.000000", "us")],
                  pa.timestamp("us"))
    pq.write_table(
        pa.table({"ts": ts, "event_type": pa.array(["view"]),
                  "value": pa.array([2.0], pa.float64())}),
        str(tmp_path / "events.parquet"),
    )
    df = hopping_window_counts(str(tmp_path)).to_pandas().sort_values("window_start")
    base = int(np.datetime64("2024-01-01T01:00:00", "s").astype("int64"))
    assert list(df.window_start) == [base - 2700, base - 1800, base - 900, base]
    assert (df.n_events == 1).all() and (df.sum_value_c == 200).all()


def test_late_data_window_counts_watermark(ray_session, tmp_path):
    """Constructed out-of-order stream: the watermark is the running max of
    event-time over ARRIVAL order, and only events lagging it by more than
    the allowed lateness drop — including across range-partition carry-ins
    (nparts=3 over 6 events forces the prefix chain to matter)."""
    from crawler_ray.pipelines.relational import late_data_window_counts

    h = 3_600
    # arrival order: ts seconds relative to epoch
    ts_s = [
        0 * h,          # e0: watermark None -> kept
        2 * h,          # e1: wm 0h -> kept (advances wm to 2h)
        2 * h - 300,    # e2: 300s behind wm, within 600s lateness -> kept
        0 * h + 10,     # e3: ~2h behind wm -> LATE
        2 * h + 5,      # e4: ahead -> kept
        1 * h,          # e5: 1h behind wm 2h+5s -> LATE
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": pa.array(
                    np.array(ts_s, dtype="int64") * 1_000_000, pa.timestamp("us")
                ),
                "event_type": pa.array(["click"] * 6),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = (
        late_data_window_counts(str(tmp_path), nparts=3)
        .to_pandas()
        .set_index("window_start")
        .sort_index()
    )
    assert df.loc[0 * h, "n_kept"] == 1 and df.loc[0 * h, "n_late"] == 1
    assert df.loc[1 * h, "n_kept"] == 1 and df.loc[1 * h, "n_late"] == 1
    assert df.loc[2 * h, "n_kept"] == 2 and df.loc[2 * h, "n_late"] == 0
