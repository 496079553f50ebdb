"""Distributed BPE merge training over the ``documents`` table.

The tokenizer-training step of an LLM data pipeline, in the shape every
production trainer (SentencePiece, HF tokenizers) uses: the corpus reduces
ONCE to a word-frequency table (Heaps-bounded — types grow ~N^0.5, not N),
and Lloyd-style supersteps then run over word TYPES, never tokens.  The
Ray layout is the repo's BSP actor pattern (graph.py): words hash-partition
once via a push shuffle into per-partition actors; every merge round is

    count:  each actor returns its pair→count dict, maintained
            INCREMENTALLY (only words containing the last merged pair
            were re-counted), so a round after the first costs
            O(affected types), not O(all types);
    select: the driver sums the bounded dicts and picks the globally
            most frequent pair (ties: lexicographically smallest merged
            string — deterministic);
    apply:  the winning pair broadcasts back and each actor rewrites
            only the words its pair→words index lists.

Words never move after the setup shuffle; per-round traffic is the pair
dicts (vocab²-bounded in principle, types×len-bounded in practice; at a
10^9-type corpus you would prune each partition's dict to counts above
global_max_candidate/P, which preserves exactness of the argmax).  Raw
actors are justified here exactly as for PageRank: an iterative algorithm
over mutable partitioned state the Dataset API cannot hold across rounds.

Oracle: a pure single-process reference BPE (same tokenizer, same greedy
left-to-right merge scan, same tie-break) pinned by pytest; the driver
gate records the rows-only check (iterative BPE is not SQL-expressible).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from crawler_ray.pipelines.text import _TOKEN_RE


def _merge_word(sym: tuple, a: int, b: int, new: int) -> tuple:
    """Greedy left-to-right single-pair merge — the standard BPE scan
    ('aaa' + (a,a) → (aa, a))."""
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pairs(sym: tuple):
    return zip(sym, sym[1:])


@ray.remote
class _BpePart:
    """One hash(word) partition of the type table: word symbol sequences +
    counts, a pair→count Counter, and a pair→word-index posting map for
    incremental updates. Zero num_cpus: rounds are turn-based barriers."""

    def __init__(self) -> None:
        self._wc: Counter = Counter()
        self._seen_keys: set = set()

    def accept(self, key: str, words: list, counts: list) -> None:
        # idempotent by batch key: a Ray task retry (worker death mid-push,
        # or lineage re-execution) re-sends the same batches — without the
        # guard the side effect double-counts and the merge table silently
        # diverges. Keys are deterministic (doc-id range of the batch), so
        # the retry maps to the same key and is dropped here.
        if key in self._seen_keys:
            return
        self._seen_keys.add(key)
        for w, c in zip(words, counts):
            self._wc[w] += c

    def chars(self) -> set:
        out = set()
        for w in self._wc:
            out.update(w)
        return out

    def build(self, char_to_id: dict) -> int:
        self.words = [tuple(char_to_id[ch] for ch in w) for w in self._wc]
        self.counts = np.fromiter(self._wc.values(), np.int64, len(self._wc))
        self._wc = Counter()
        self.pair_counts: Counter = Counter()
        self.pair_words: dict = {}
        for wi, sym in enumerate(self.words):
            c = int(self.counts[wi])
            for p in _pairs(sym):
                self.pair_counts[p] += c
                self.pair_words.setdefault(p, set()).add(wi)
        return len(self.words)

    def get_pair_counts(self) -> dict:
        return dict(self.pair_counts)

    def apply_merge(self, a: int, b: int, new: int) -> None:
        hit = self.pair_words.pop((a, b), set())
        for wi in hit:
            old = self.words[wi]
            c = int(self.counts[wi])
            for p in _pairs(old):
                self.pair_counts[p] -= c
                if self.pair_counts[p] == 0:
                    del self.pair_counts[p]
                s = self.pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del self.pair_words[p]
            sym = _merge_word(old, a, b, new)
            self.words[wi] = sym
            for p in _pairs(sym):
                self.pair_counts[p] += c
                self.pair_words.setdefault(p, set()).add(wi)


def train_bpe(sf_dir: str, n_merges: int = 64, nparts: int | None = None) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per merge:
    (rank, left, right, merged, pair_count)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    from crawler_ray.pipelines.common import effective_cpus

    # size the actor pool to the corpus: word TYPES grow ~sqrt(tokens)
    # (Heaps), so a small table needs 2 partitions, not 16 cold actor
    # spawns (measured: 16 actors cost ~10 s of spawn+import inside a
    # busy 32-worker session for a 5k-doc table)
    path = f"{sf_dir}/documents.parquet"
    files = _glob.glob(_os.path.join(path, "*.parquet")) if _os.path.isdir(path) else [path]
    nrows = sum(_pq.read_metadata(f).num_rows for f in files)
    P = nparts or max(2, min(effective_cpus(), 16, nrows // 4000 + 1))
    actors = [_BpePart.options(num_cpus=0).remote() for _ in range(P)]

    def push(t: pa.Table, _actors=actors, _P=P) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized word-frequency reduce: split on non-alnum runs ≡
        # findall([a-z0-9]+) on the lowered text (boundary empties filtered)
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern="[^a-z0-9]+")
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        words = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(words):
            # deterministic batch identity for the actors' retry guard:
            # doc_ids are unique per row, so the (min, max, n) triple pins
            # this block across task retries but never collides between
            # distinct blocks (even on a corpus of identical texts)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            bkey = f"{int(ids.min())}:{int(ids.max())}:{len(ids)}"
            part = (pd.util.hash_array(words) % np.uint64(_P)).astype(np.int32)
            pending = [
                _actors[int(q)].accept.remote(
                    f"{bkey}:{int(q)}",
                    list(words[part == q]),
                    [int(x) for x in counts[part == q]],
                )
                for q in np.unique(part)
            ]
            ray.get(pending)  # backpressure
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(push, batch_size=4096, batch_format="pyarrow").materialize()

    chars = sorted(set().union(*ray.get([a.chars.remote() for a in actors])))
    char_to_id = {ch: i for i, ch in enumerate(chars)}
    vocab = list(chars)  # id → string
    ray.get([a.build.remote(char_to_id) for a in actors])

    rows = []
    for rank in range(n_merges):
        total: Counter = Counter()
        for d in ray.get([a.get_pair_counts.remote() for a in actors]):
            total.update(d)
        if not total:
            break
        # most frequent; ties → smallest (merged, left, right) strings —
        # (left, right) uniquely identifies a pair, so the argmin is total
        # regardless of Counter insertion order (two DISTINCT pairs can
        # share the same merged string, e.g. a+bc and ab+c)
        best = min(
            total.items(),
            key=lambda kv: (
                -kv[1],
                vocab[kv[0][0]] + vocab[kv[0][1]],
                vocab[kv[0][0]],
                vocab[kv[0][1]],
            ),
        )
        (a_id, b_id), cnt = best
        new_id = len(vocab)
        vocab.append(vocab[a_id] + vocab[b_id])
        ray.get([a.apply_merge.remote(a_id, b_id, new_id) for a in actors])
        rows.append(
            {
                "rank": rank,
                "left": vocab[a_id],
                "right": vocab[b_id],
                "merged": vocab[new_id],
                "pair_count": int(cnt),
            }
        )
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged", "pair_count"])


def bpe_merges(sf_dir: str, n_merges: int = 64) -> pa.Table:
    """``queries()`` surface for the distributed BPE trainer."""
    df = train_bpe(sf_dir, n_merges=n_merges)
    return pa.table(
        {
            "rank": pa.array(df["rank"].to_numpy(np.int64) if len(df) else [], pa.int64()),
            "left": pa.array(df["left"].tolist(), pa.string()),
            "right": pa.array(df["right"].tolist(), pa.string()),
            "merged": pa.array(df["merged"].tolist(), pa.string()),
            "pair_count": pa.array(
                df["pair_count"].to_numpy(np.int64) if len(df) else [], pa.int64()
            ),
        }
    )


def reference_bpe(texts: list, n_merges: int) -> pd.DataFrame:
    """Single-process reference implementation (the pytest oracle): same
    tokenizer, same greedy merge scan, same (count, merged-string)
    tie-break — shared here so the test exercises only the DISTRIBUTION,
    not a reimplementation drift."""
    wc: Counter = Counter()
    for s in texts:
        wc.update(_TOKEN_RE.findall((s or "").lower()))
    chars = sorted({ch for w in wc for ch in w})
    char_to_id = {ch: i for i, ch in enumerate(chars)}
    vocab = list(chars)
    words = {tuple(char_to_id[ch] for ch in w): c for w, c in wc.items()}
    rows = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for sym, c in words.items():
            for p in _pairs(sym):
                pc[p] += c
        if not pc:
            break
        best = min(
            pc.items(),
            key=lambda kv: (
                -kv[1],
                vocab[kv[0][0]] + vocab[kv[0][1]],
                vocab[kv[0][0]],
                vocab[kv[0][1]],
            ),
        )
        (a_id, b_id), cnt = best
        new_id = len(vocab)
        vocab.append(vocab[a_id] + vocab[b_id])
        words = {
            _merge_word(sym, a_id, b_id, new_id): c for sym, c in words.items()
        }
        rows.append(
            {
                "rank": rank,
                "left": vocab[a_id],
                "right": vocab[b_id],
                "merged": vocab[new_id],
                "pair_count": int(cnt),
            }
        )
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged", "pair_count"])


QUERIES = {
    "bpe_merges": bpe_merges,
}
