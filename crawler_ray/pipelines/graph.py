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


def connected_components(
    edges: rd.Dataset, src: str = "u", dst: str = "v", max_iters: int = 50
) -> rd.Dataset:
    """Connected components by min-label propagation; returns
    (node, component) with component = min node id in the component.

    Each round is one hash join (edges ⋈ labels on src) + groupby-min on
    dst + one left-outer join back — O(diameter) rounds, which is the
    right trade for near-dup clusters (tiny diameters); a web-graph-scale
    CC would add pointer-jumping (large-star/small-star) to cut rounds to
    O(log n). Convergence is detected by a streamed changed-row count (one
    scalar per round on the driver, never the label table)."""
    und = edges.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [t[src].combine_chunks(), t[dst].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t[dst].combine_chunks(), t[src].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    labels = (
        und.groupby("u")
        .count()
        .map_batches(
            lambda t: pa.table({"u": t["u"], "label": t["u"]}),
            batch_format="pyarrow",
        )
        .repartition(_JOIN_PARTS)
        .materialize()
    )
    if labels.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )

    for _ in range(max_iters):
        inc = (
            und.join(labels, join_type="inner", num_partitions=_JOIN_PARTS, on=("u",))
            .map_batches(
                lambda t: pa.table({"u": t["v"], "nbr": t["label"]}),
                batch_format="pyarrow",
            )
            .groupby("u")
            .min("nbr")
            .repartition(_JOIN_PARTS)
        )
        new_labels = (
            labels.join(inc, join_type="left_outer", num_partitions=_JOIN_PARTS, on=("u",))
            .map_batches(
                lambda t: pa.table(
                    {
                        "u": t["u"],
                        "label": pc.min_element_wise(
                            t["label"], pc.coalesce(t["min(nbr)"], t["label"])
                        ),
                        "changed": pc.cast(
                            pc.less(
                                pc.coalesce(t["min(nbr)"], t["label"]), t["label"]
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(_JOIN_PARTS)
            .materialize()
        )
        changed = sum(
            pc.sum(b["changed"]).as_py() or 0
            for b in new_labels.iter_batches(batch_format="pyarrow")
        )
        labels = new_labels.select_columns(["u", "label"]).materialize()
        if changed == 0:
            break
    return labels.rename_columns({"u": "node", "label": "component"})


def dedup_clusters(sf_dir: str, min_jacc: int = 50) -> rd.Dataset:
    """Near-duplicate clusters: connected components over the
    ``prefix_jaccard_pairs`` similarity edges at ``min_jacc`` percent.
    Returns (doc_id, cluster_id, cluster_size) for every doc in at least
    one qualifying pair; cluster_id = smallest doc_id in the cluster, the
    canonical representative a keep-one dedup pass would retain."""
    from crawler_ray.pipelines.dedup import prefix_jaccard_pairs

    pairs = prefix_jaccard_pairs(sf_dir).map_batches(
        lambda t, mj=min_jacc: t.filter(pc.greater_equal(t["jacc_pct"], mj)),
        batch_format="pyarrow",
    )
    comp = connected_components(pairs, src="a_id", dst="b_id")
    sizes = (
        comp.groupby("component")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"component": t["component"], "cluster_size": pc.cast(t["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .repartition(_JOIN_PARTS)
    )
    return (
        comp.join(sizes, join_type="inner", num_partitions=_JOIN_PARTS, on=("component",))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["node"],
                    "cluster_id": t["component"],
                    "cluster_size": t["cluster_size"],
                }
            ),
            batch_format="pyarrow",
        )
    )


QUERIES = {"pagerank": pagerank, "dedup_clusters": dedup_clusters}

ORACLE_SQL: dict[str, str] = {
    "dedup_clusters": """
        WITH RECURSIVE tok AS (
            SELECT doc_id, SUBSTR(text, 1, 100) AS p,
                   LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS toks
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY SUBSTR(text, 1, 100)
                                       ORDER BY doc_id) <= 256),
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM tok a JOIN tok b ON a.p = b.p AND a.doc_id < b.doc_id
            WHERE CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) > 0
                  THEN (100 * LEN(LIST_INTERSECT(a.toks, b.toks)))
                       // LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
                  ELSE 0 END >= 50),
        edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                  UNION SELECT b_id, a_id FROM pairs),
        reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS doc_id, CAST(MIN(v) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY u)
        SELECT c.doc_id, c.cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
                   AS cluster_size
        FROM comp c
    """,
}
