"""Distributed BPE tokenizer training (Sennrich et al. 2016, the GPT-2
recipe): learn the first N byte-pair merges from the corpus.

Architecture — the part that touches the corpus is ONE distributed pass:

  1. pre-tokenize every doc with the engine's BPE-ish pre-tokenizer
     (letter runs / digit runs / single punctuation — the same regex the
     oracle-gated ``text_bpe_tokens`` counts with) and count words via
     per-batch Counter partials → small (word, count) groupby — the
     shuffle moves one row per (word, batch), never per occurrence;
  2. the merge loop then runs over the word-frequency TABLE (vocab-sized,
     not corpus-sized) on the driver — exactly how reference BPE trainers
     (subword-nmt, HuggingFace tokenizers) train after their single
     corpus pass.  At 100 TB the distributed pass is the cost; the loop is
     O(vocab × merges) integer work.

Determinism: the best pair each round is (count DESC, left ASC, right ASC)
— a total order, so any partitioning of the corpus yields identical
merges.  No SQL oracle (the merge recursion re-tokenizes every word each
round — not expressible); pinned instead by a hand-computed fixture and
partition-independence tests, like ``pagerank`` before its oracle landed.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def word_counts(ds, text_col: str = "text"):
    """Corpus pass: (word, count) via per-batch Counter partials → one
    vocabulary-sized groupby Sum."""
    import re

    from ray.data.aggregate import Sum

    from .textstats import BPE_PRETOKEN_PATTERN

    pat = re.compile(BPE_PRETOKEN_PATTERN)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(pat.findall(t or ""))
        words = list(c.keys())
        return pa.table({"word": pa.array(words, pa.string()),
                         "cnt": pa.array([c[w] for w in words], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("cnt", alias_name="count")))


def learn_merges(word_count_rows: list[tuple[str, int]],
                 n_merges: int = 20) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a (word, count) table: each round count
    every adjacent symbol pair weighted by word frequency, merge the best
    (count DESC, left ASC, right ASC), re-segment. Returns
    [(left, right, pair_count)] in merge order."""
    segs: dict[tuple, int] = {}
    for w, c in word_count_rows:
        key = tuple(w)  # start from characters
        segs[key] = segs.get(key, 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seg, c in segs.items():
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        new: dict[tuple, int] = {}
        for seg, c in segs.items():
            out = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == l and seg[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        segs = new
    return merges


def bpe_train(ds, n_merges: int = 20, text_col: str = "text",
              min_count: int = 1, max_vocab: int = 1_000_000) -> pa.Table:
    """End-to-end BPE training: distributed word counts, then the merge
    loop over the vocab table. Returns (rank, left, right, pair_count) —
    one row per learned merge, rank 0-based in merge order.

    ``min_count`` prunes singleton noise before the table leaves the
    cluster (the subword-nmt ``--min-frequency`` knob); ``max_vocab``
    RAISES rather than silently training on a driver-breaking vocabulary
    — the ``unigram_rarity`` guard discipline."""
    wc = word_counts(ds, text_col)
    if min_count > 1:
        wc = wc.filter(expr=f"count >= {int(min_count)}")
    rows = [(r["word"], int(r["count"])) for r in wc.take_all()]
    if len(rows) > max_vocab:
        raise ValueError(
            f"bpe_train: vocabulary {len(rows)} exceeds max_vocab="
            f"{max_vocab}; raise min_count (prune rare words) or max_vocab")
    rows.sort()  # deterministic loop input regardless of block order
    merges = learn_merges(rows, n_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


class BpeTokenizeStage:
    """Actor-pool apply side of the trained tokenizer — at 100 TB this,
    not training, is the scale job. Merges (a tiny ranked list) ship in
    the constructor, once per actor; a per-actor word→token-count LRU
    exploits natural text's heavy word repetition so each distinct word
    is segmented once per actor, not once per occurrence.

    With an empty merge list every pre-token stays one symbol-run, so
    ``n_bpe_tokens`` equals the oracle-gated ``text_bpe_tokens`` count —
    the anchor tests use."""

    def __init__(self, merges: list[tuple[str, str]],
                 id_col: str = "doc_id", text_col: str = "text",
                 cache_size: int = 65536):
        import re

        from collections import OrderedDict

        from .textstats import BPE_PRETOKEN_PATTERN

        self.rank = {tuple(m[:2]): i for i, m in enumerate(merges)}
        self.pat = re.compile(BPE_PRETOKEN_PATTERN)
        self.id_col = id_col
        self.text_col = text_col
        self._lru: OrderedDict[str, int] = OrderedDict()
        self._cap = cache_size

    def _word_tokens(self, w: str) -> int:
        n = self._lru.get(w)
        if n is not None:
            self._lru.move_to_end(w)
            return n
        seg = list(w)
        while len(seg) > 1:
            best, best_i = None, -1
            for i in range(len(seg) - 1):
                r = self.rank.get((seg[i], seg[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            seg[best_i: best_i + 2] = [seg[best_i] + seg[best_i + 1]]
        n = len(seg)
        if len(self._lru) >= self._cap:
            self._lru.popitem(last=False)
        self._lru[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        for t in batch[self.text_col].to_pylist():
            counts.append(sum(self._word_tokens(w)
                              for w in self.pat.findall(t or "")))
        return pa.table({self.id_col: batch[self.id_col],
                         "n_bpe_tokens": pa.array(counts, pa.int64())})


def bpe_tokenize(ds, merges, *, id_col: str = "doc_id",
                 text_col: str = "text",
                 concurrency: tuple[int, int] | int = (1, 8),
                 batch_size: int = 256):
    """documents → (id, n_bpe_tokens) under a trained merge list: the
    distributed apply pass (actor pool, merges built once per actor)."""
    return ds.map_batches(
        BpeTokenizeStage,
        fn_constructor_kwargs=dict(merges=list(merges), id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ship by value so workers never import the package from disk
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
