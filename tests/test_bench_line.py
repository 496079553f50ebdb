"""The bench summary line must fit the recorder's stdout tail.

The harness that records bench output keeps only the last ~2000 chars of
stdout and parses the final line as JSON; round 4's one-line form outgrew
that and was recorded as nothing. ``bench.summary_line`` guarantees the
printed line fits and still parses, trimming fastest-query walls first.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def _out(timings):
    return {
        "metric": "e2e_bench_sec",
        "value": 123.45,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "num_cpus": 32,
        "crawl": {
            "sec": 15.49, "iterations": 4, "scheduled": 379884,
            "items": 267740, "urls_per_sec": 24526.4,
            "pages_in_corpus": 320000, "multiplier": 64,
        },
        "recrawl_only_sec": 4.03,
    }


def test_small_result_passes_through_untrimmed():
    t = {"crawl": 15.49, "q1": 0.5}
    line = bench.summary_line(_out(t), t, sidecar="BENCH_full_local.json")
    d = json.loads(line)
    assert d["queries"] == t and "queries_elided" not in d


def test_full_query_list_fits_and_keeps_slowest():
    # worst case: every bench query present with a wide wall value
    t = {name: 100.0 + i * 0.01 for i, name in enumerate(bench.BENCH_QUERIES)}
    t["crawl"] = 999.99
    line = bench.summary_line(_out(t), t, sidecar="BENCH_full_local.json")
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["metric"] == "e2e_bench_sec" and d["crawl"]["sec"] == 15.49
    assert d["queries_elided"] + len(d["queries"]) == len(t)
    # trimming keeps the slowest entries: the max wall always survives
    assert d["queries"]["crawl"] == 999.99
    kept_min = min(d["queries"].values())
    dropped = set(t) - set(d["queries"])
    assert all(t[k] <= kept_min for k in dropped)


def test_pathologically_many_queries_still_fit():
    t = {f"operator_with_a_long_name_{i:04d}": float(i) for i in range(500)}
    line = bench.summary_line(_out(t), t, sidecar="BENCH_full_local.json")
    assert len(line) <= 1800
    assert json.loads(line)["queries_elided"] > 0
