"""Graph operators over the crawl link graph: distributed PageRank.

The iterative-algorithm shape on Ray Data: each power iteration is one
hash-partitioned join (edges ⋈ ranks on src) plus one groupby-sum on dst
and one left-outer join back onto the node table, materialized per
iteration so lineage stays flat. All per-node state lives in datasets; the
only driver-side values are scalars (node count, dangling mass — one float
per iteration). The dangling-node indicator is carried as a column on the
rank table, so no extra join runs inside the loop.

Ray 2.49 gotcha encoded here: a hash-join output can contain empty
partitions whose blocks carry no schema, and feeding such a dataset into a
*second* join fails in Acero ("no match for key field") — any join output
that later joins again goes through ``repartition(n)`` (an all-to-all
block rebuild that restores a uniform schema) before ``materialize()``.

At 100 TB the edge list dwarfs the rank vector; the join keys both sides
by the same column every iteration, so a real cluster run pins the edge
partitioning once and re-shuffles only the rank table. Rows-only for the
driver gate (iterative float fixpoint isn't SQL-hashable); exactness is
pinned by pytest against a dense numpy power iteration on the same edges.

The reference has no graph surface — this is a "beyond the reference"
link-analysis operator (its crawl stops at emitting links,
/root/reference/parse/doubangroup/douban_group.go:33-55).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_JOIN_PARTS = 4


def pagerank_edges(
    edges: rd.Dataset, iters: int = 10, damping: float = 0.85
) -> rd.Dataset:
    """PageRank over an (src_url, dst_url) edge dataset; returns
    (url, rank) with ranks summing to 1. Fixed iteration count keeps the
    computation deterministic (no convergence predicate on floats)."""
    edges = edges.materialize()

    # distinct nodes as a DATASET (groupby-distinct, never a driver list —
    # the node set scales with the corpus)
    nodes_ds = (
        edges.select_columns(["src_url"])
        .rename_columns({"src_url": "url"})
        .union(edges.select_columns(["dst_url"]).rename_columns({"dst_url": "url"}))
        .groupby("url")
        .count()
        .select_columns(["url"])
        .materialize()
    )
    n = nodes_ds.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )

    # out-degree per src, joined into the edge table once (contribution =
    # rank/outdeg reuses it every iteration)
    outdeg = (
        edges.groupby("src_url")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"src_url": t["src_url"], "outdeg": pc.cast(t["count()"], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    )
    edges_d = (
        edges.join(outdeg, join_type="inner", num_partitions=_JOIN_PARTS, on=("src_url",))
        .repartition(_JOIN_PARTS)
        .materialize()
    )

    # node table with a dangling mask m (1.0 for nodes with no outlinks):
    # their rank mass redistributes uniformly each iteration, and carrying
    # m as a column means the loop needs no anti/semi join to find them
    nodes_m = (
        nodes_ds.join(
            outdeg.rename_columns({"src_url": "url"}),
            join_type="left_outer",
            num_partitions=_JOIN_PARTS,
            on=("url",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t["url"],
                    "m": pc.if_else(pc.is_null(t["outdeg"]), 1.0, 0.0),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(_JOIN_PARTS)
        .materialize()
    )

    ranks = nodes_m.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "rank": pa.array(np.full(t.num_rows, 1.0 / n)),
                "m": t["m"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # dangling mass: one streamed scalar, no join
        dangling = sum(
            pc.sum(pc.multiply(b["rank"], b["m"])).as_py() or 0.0
            for b in ranks.iter_batches(batch_format="pyarrow")
        )

        contrib = edges_d.join(
            ranks.rename_columns({"url": "src_url"}),
            join_type="inner",
            num_partitions=_JOIN_PARTS,
            on=("src_url",),
        ).map_batches(
            lambda t: pa.table(
                {"url": t["dst_url"], "c": pc.divide(t["rank"], t["outdeg"])}
            ),
            batch_format="pyarrow",
        )
        sums = contrib.groupby("url").sum("c").repartition(_JOIN_PARTS)
        base = (1.0 - damping) / n + damping * dangling / n

        ranks = (
            nodes_m.join(
                sums, join_type="left_outer", num_partitions=_JOIN_PARTS, on=("url",)
            )
            .map_batches(
                lambda t, b=base: pa.table(
                    {
                        "url": t["url"],
                        "rank": pc.add(
                            b,
                            pc.multiply(
                                damping, pc.coalesce(t["sum(c)"], pa.scalar(0.0))
                            ),
                        ),
                        "m": t["m"],
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(_JOIN_PARTS)
            .materialize()
        )
    return ranks.select_columns(["url", "rank"])


def pagerank(sf_dir: str, iters: int = 10, damping: float = 0.85) -> rd.Dataset:
    """PageRank over the synthetic corpus link graph (see
    ``crawl_queries.link_graph``); returns (url, rank_micro) with integer
    micro-ranks for a stable driver schema."""
    from crawler_ray.pipelines.crawl_queries import link_graph

    ranks = pagerank_edges(link_graph(sf_dir), iters=iters, damping=damping)
    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "rank_micro": pc.cast(
                    pc.round(pc.multiply(t["rank"], 1_000_000.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


QUERIES = {"pagerank": pagerank}
ORACLE_SQL: dict[str, str] = {}
