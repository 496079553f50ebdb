"""Unit tests: politeness admission ordering and robots filtering."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.stages.politeness import PolitenessConfig, admit_fn, robots_filter_fn


def _cfg(budget: int = 3) -> PolitenessConfig:
    return PolitenessConfig(default_budget=budget, default_disallow=("/private",))


def test_admit_order_matches_raw_bytes_sort():
    """The numpy fixed-width-padded sort must equal python's raw-bytes
    tuple sort (the oracle's order) for 4-byte-multiple seq keys."""
    rng = np.random.default_rng(5)
    rows = []
    for i in range(500):
        depth = int(rng.integers(1, 4))
        seq = b"".join(int(rng.integers(0, 256)).to_bytes(1, "big") * 4 for _ in range(depth))
        rows.append(
            {
                "host": "h",
                "key": f"k{i}",
                "seq": seq,
                "priority": int(rng.integers(0, 3)),
                "url": f"https://h/{i}",
            }
        )
    g = pd.DataFrame(rows)
    out = admit_fn(_cfg(budget=50))(g)
    admitted = out[out.admitted]
    expected = sorted(rows, key=lambda r: (-r["priority"], r["seq"]))[:50]
    assert list(admitted["key"]) == [r["key"] for r in expected]


def test_admit_prefix_sorts_before_zero_extension():
    """A seq must sort strictly before its own zero-byte extension (Python
    bytes order), not tie with it under 0x00 padding — the length tie-break
    closes the r1 latent ordering trap (ADVICE r1)."""
    rows = [
        {"host": "h", "key": "ext", "seq": b"\x01" + b"\x00" * 4, "priority": 0, "url": "https://h/e"},
        {"host": "h", "key": "pre", "seq": b"\x01", "priority": 0, "url": "https://h/p"},
    ]
    out = admit_fn(_cfg(budget=1))(pd.DataFrame(rows))
    assert list(out[out.admitted]["key"]) == ["pre"]
    expected = sorted(rows, key=lambda r: (-r["priority"], r["seq"]))
    out_all = admit_fn(_cfg(budget=10))(pd.DataFrame(rows))
    assert list(out_all["key"]) == [r["key"] for r in expected]


def test_admit_dedups_within_iteration_keep_first():
    g = pd.DataFrame(
        {
            "host": ["h"] * 3,
            "key": ["a", "a", "b"],
            "seq": [b"\x00\x00\x00\x02", b"\x00\x00\x00\x01", b"\x00\x00\x00\x03"],
            "priority": [0, 0, 0],
            "url": ["u1", "u2", "u3"],
        }
    )
    out = admit_fn(_cfg())(g)
    # duplicate key 'a': the earlier-ordered row (seq 01) wins
    assert sorted(out["seq"]) == [b"\x00\x00\x00\x01", b"\x00\x00\x00\x03"]


def test_admit_budget_defers_rest():
    g = pd.DataFrame(
        {
            "host": ["h"] * 5,
            "key": [f"k{i}" for i in range(5)],
            "seq": [i.to_bytes(4, "big") for i in range(5)],
            "priority": [0] * 5,
            "url": [f"u{i}" for i in range(5)],
        }
    )
    out = admit_fn(_cfg(budget=2))(g)
    assert out["admitted"].sum() == 2
    assert list(out[out.admitted]["key"]) == ["k0", "k1"]


def test_robots_filter_drops_disallowed_paths():
    cfg = _cfg()
    t = pa.table(
        {
            "url": [
                "https://h1.example.com/private/1",
                "https://h1.example.com/public/1",
                "https://h2.example.com/private/x",
            ],
            "host": ["h1.example.com", "h1.example.com", "h2.example.com"],
        }
    )
    out = robots_filter_fn(cfg)(t)
    assert out.column("url").to_pylist() == ["https://h1.example.com/public/1"]


def test_politeness_config_roundtrip(tmp_path):
    cfg = {
        "default": {"max_per_iter": 7, "disallow": ["/x"]},
        "hosts": {"big.com": {"max_per_iter": 99, "disallow": ["/y"]}},
        "max_depth": 4,
        "max_attempts": 2,
    }
    p = tmp_path / "politeness.json"
    p.write_text(json.dumps(cfg))
    c = PolitenessConfig.from_json(str(p))
    assert c.budget("big.com") == 99
    assert c.budget("other.com") == 7
    assert c.disallowed_prefixes("big.com") == ("/y",)
    assert c.disallowed_prefixes("other.com") == ("/x",)
    assert c.max_depth == 4


def test_partition_admit_equals_per_host_admit():
    """admit_partition_fn over a mixed-host partition decides exactly what
    admit_fn decides per host."""
    import numpy as np

    from crawler_ray.stages.politeness import admit_fn, admit_partition_fn

    rng = np.random.default_rng(13)
    rows = []
    for i in range(400):
        host = f"h{int(rng.integers(0, 7))}"
        seq = bytes(rng.integers(0, 256, size=4 * int(rng.integers(1, 4)), dtype=np.uint8))
        rows.append({"host": host, "key": f"{host}/k{int(rng.integers(0, 40))}",
                     "seq": seq, "priority": int(rng.integers(0, 3)),
                     "url": f"https://{host}/{i}"})
    g = pd.DataFrame(rows)
    cfg = _cfg(budget=4)
    part_out = admit_partition_fn(cfg)(g)
    got = {(r.host, r.key, r.seq): r.admitted for r in part_out.itertuples()}
    expect = {}
    for host, sub in g.groupby("host"):
        out = admit_fn(cfg)(sub.copy())
        for r in out.itertuples():
            expect[(r.host, r.key, r.seq)] = r.admitted
    assert got == expect


def test_parse_robots_txt():
    from crawler_ray.stages.politeness import parse_robots_txt

    body = """
# comments ignored
User-agent: fancybot
Disallow: /fancy-only

User-agent: *
Disallow: /private
Disallow: /tmp/
Disallow:
Crawl-delay: 2.5
Sitemap: https://x.test/sitemap.xml
"""
    dis, delay = parse_robots_txt(body)
    assert dis == ("/private", "/tmp/")
    assert delay == 2.5
    # exact agent group wins over *
    dis_f, delay_f = parse_robots_txt(body, agent="FancyBot")
    assert dis_f == ("/fancy-only",)
    assert delay_f is None
    assert parse_robots_txt("") == ((), None)


def test_robots_config_feeds_politeness():
    from crawler_ray.stages.politeness import robots_config, robots_filter_fn

    cfg = robots_config(
        {"slow.test": "User-agent: *\nDisallow: /no\nCrawl-delay: 10\n",
         "open.test": "User-agent: *\nDisallow:\n"},
        window_seconds=60, default_budget=5,
    )
    assert cfg.budget("slow.test") == 6  # 60s / 10s delay
    assert cfg.budget("open.test") == 5  # default
    assert cfg.disallowed_prefixes("slow.test") == ("/no",)
    # and the vectorized filter honors the parsed prefixes
    t = pa.table({
        "url": ["https://slow.test/no/x", "https://slow.test/ok", "https://open.test/no/x"],
        "host": ["slow.test", "slow.test", "open.test"],
    })
    out = robots_filter_fn(cfg)(t)
    assert out["url"].to_pylist() == ["https://slow.test/ok", "https://open.test/no/x"]
