"""Driver-contract pins for __ray_entry__: the explicit 50-entry priority
window must stay intact (every name resolves, no duplicates) and every
oracled window entry must have SQL."""

from __future__ import annotations


def test_priority_window_contract():
    import __ray_entry__ as E

    q = E.queries()
    names = list(q)
    # the curated list itself must be duplicate-free and fully resolvable
    # (dict construction would silently dedup/skip otherwise)
    assert len(E._PRIORITY) == 50
    assert len(set(E._PRIORITY)) == 50
    assert set(E._PRIORITY) <= set(names)
    window = names[:50]
    assert window == E._PRIORITY
    # the flagship families the driver must see
    for must in [
        "crawl_items", "crawl_order", "multitask_crawl_order", "recrawl_items",
        "dedup_exact", "strip_dup_spans", "minhash_dedup_keep", "semdedup",
        "pagerank", "dedup_clusters", "triangle_count", "kmeans_clusters",
        "ann_bruteforce_topk", "gopher_quality", "ccnet_buckets",
        "bpe_merges", "prep_training_corpus", "temperature_mix_docs",
    ]:
        assert must in window, must
    o = E.oracle_sql()
    # every oracle key corresponds to a real query
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # the window carries a strong oracled core
    assert sum(1 for n in window if n in o) >= 28
