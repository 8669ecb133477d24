"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting, token histograms.

All vectorized per batch; aggregations pre-combine inside ``map_batches``
(one partial row per key per batch) before the small ``groupby`` — the
shuffle moves partials, not tokens (ray_guide "Aggregation at scale").
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"\d")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "en"},
    "zh": set(),  # no-latin-stopword language: falls through to charset rule
}


# the ONE definition of the BPE pre-tokenization split: letter runs,
# digit runs, single punctuation. Shared by bpe_token_count_batch, the
# text_bpe_tokens oracle, and ops/bpe train+apply — these must stay
# byte-identical or the zero-merge anchor silently breaks
BPE_PRETOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

_BPE_ISH = None  # compiled once per worker process


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish subword-boundary token count: letter runs, digit runs, and
    single punctuation marks each count as one token (the pre-tokenization
    split a byte-pair encoder starts from). Pattern chosen to behave
    identically under Python re and DuckDB's RE2 so the oracle is exact."""
    global _BPE_ISH
    if _BPE_ISH is None:
        import re

        _BPE_ISH = re.compile(BPE_PRETOKEN_PATTERN)
    texts = batch["text"].to_pylist()
    return pa.table(
        {"doc_id": batch["doc_id"],
         "bpe_tokens": pa.array([len(_BPE_ISH.findall(t or ""))
                                 for t in texts], pa.int64())}
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id,text → token_count, distinct_tokens, n_chars (whitespace
    tokenizer — the SQL-oracle-matched definition: string_split on ' ')."""
    texts = batch["text"].to_pylist()
    tc, dc, nc = [], [], []
    for t in texts:
        toks = (t or "").split(" ")
        tc.append(len(toks))
        dc.append(len(set(toks)))
        nc.append(len(t or ""))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(tc, pa.int64()),
            "distinct_tokens": pa.array(dc, pa.int64()),
            "n_chars": pa.array(nc, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring signals (length/punct/digit/stopword ratios).
    Ratios are ×1e6-rounded integers so the DuckDB oracle can reproduce
    them exactly (float-hash-stable)."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    out = {
        "doc_id": batch["doc_id"],
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        "token_count": pa.array([len((t or "").split(" ")) for t in texts], pa.int64()),
        "punct_chars": pa.array(
            [len(_PUNCT_RE.findall(t or "")) for t in texts], pa.int64()
        ),
        "digit_chars": pa.array(
            [len(_DIGIT_RE.findall(t or "")) for t in texts], pa.int64()
        ),
    }
    return pa.table(out)


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: stopword-profile voting with a CJK charset
    gate. Deterministic; rows-only oracle (not SQL-expressible)."""
    texts = batch["text"].to_pylist()
    preds = []
    for t in texts:
        t = t or ""
        if any("一" <= c <= "鿿" for c in t[:200]):
            preds.append("zh")
            continue
        toks = t.lower().split(" ")
        best, best_n = "en", -1
        for lang, sw in STOPWORDS.items():
            if not sw:
                continue
            hits = sum(1 for w in toks if w in sw)
            if hits > best_n:
                best, best_n = lang, hits
        preds.append(best)
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())})


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: rolling polynomial hash over
    tokens, minimum per window, xor-folded to one int64. Deterministic."""
    texts = batch["text"].to_pylist()
    fps = []
    MOD = (1 << 61) - 1
    B = 1_000_003
    for t in texts:
        toks = (t or "").split(" ")
        hs = []
        h = 0
        for w in toks:
            h = (h * B + (hash_str(w))) % MOD
            hs.append(h)
        if not hs:
            fps.append(0)
            continue
        mins = [min(hs[i: i + window]) for i in range(0, len(hs), window)]
        acc = 0
        for m in mins:
            acc ^= m
        fps.append(acc & 0x7FFF_FFFF_FFFF_FFFF)
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.int64())})


_FP_MOD = (1 << 61) - 1  # Mersenne prime: HUGEINT-safe products in DuckDB
_FP_B = 1_000_003


def fingerprint_poly_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Exactly-gated sibling of :func:`fingerprint_batch`: the same
    winnowing shape (rolling polynomial hash over tokens, min per
    non-overlapping ``window`` chunk, xor-fold) but with the per-token
    hash swapped from the crc32 ``hash_str`` to ``md5`` lower-half
    little-endian — DuckDB's ``md5_number_lower`` — so the whole kernel
    replays bit-for-bit in SQL (recursive-CTE ``B^i``/``B^-i`` power
    tables + a windowed prefix-sum restatement of the recurrence
    ``h_i = (h_{i-1}·B + th_i) mod 2^61-1``).

    Reference parity: the fingerprint role in the reference is the
    content-hash dedup key (crawler.py content_hash); this op is the
    LLM-pipeline extension (near-dup resistant doc fingerprint). Token
    md5s are memoized per batch (documents share vocabulary), the
    recurrence itself is a per-token Python-int loop — mod-2^61 products
    overflow int64, so numpy can't carry it; acceptable for the oracle
    sibling while the crc32 production kernel stays the hot path."""
    import hashlib

    texts = batch["text"].to_pylist()
    memo: dict[str, int] = {}
    fps = []
    for t in texts:
        toks = (t or "").split(" ")
        hs = []
        h = 0
        for w in toks:
            th = memo.get(w)
            if th is None:
                th = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[8:16], "little") % _FP_MOD
                memo[w] = th
            h = (h * _FP_B + th) % _FP_MOD
            hs.append(h)
        mins = [min(hs[i: i + window]) for i in range(0, len(hs), window)]
        acc = 0
        for m in mins:
            acc ^= m
        fps.append(acc & 0x7FFF_FFFF_FFFF_FFFF)
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fps, pa.int64())})


def hash_str(s: str) -> int:
    """Stable 64-bit string hash (Python's hash() is salted per process).
    crc32 (C speed) finished with a 64-bit odd-constant multiply — this is
    the hot kernel of shingling/simhash/fingerprints; a per-byte Python
    loop here dominates whole pipelines."""
    import zlib

    b = s.encode()
    c = zlib.crc32(b) ^ (len(b) << 16)
    return (c * 0x9E3779B97F4A7C15 + 0xCBF29CE484222325) & 0xFFFFFFFFFFFFFFFF


def token_histogram(ds, top_n: int = 20):
    """Token frequency top-N: per-batch Counter partials → small groupby
    Sum → sort. The shuffle moves one row per (token, batch), not one per
    token occurrence."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update((t or "").split(" "))
        toks = list(c.keys())
        return pa.table(
            {"token": pa.array(toks, pa.string()),
             "cnt": pa.array([c[t] for t in toks], pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("token").aggregate(
        Sum("cnt", alias_name="occurrences")
    )
    return agg.sort(["occurrences", "token"], descending=[True, False]).limit(top_n)


def _doc_chunks(text: str, chunk_tokens: int) -> list[str]:
    """Non-overlapping ``chunk_tokens``-token blocks (last block partial);
    tokens = split on a single space, the SQL-oracle-matched definition.
    An empty text yields one empty chunk (''.split(' ') == [''])."""
    toks = (text or "").split(" ")
    n = (len(toks) + chunk_tokens - 1) // chunk_tokens
    return [" ".join(toks[i * chunk_tokens: (i + 1) * chunk_tokens])
            for i in range(n)]


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM_RE = r"[0-9]{9,}"


def pii_scrub_batch(batch: pa.Table, *, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """C4-style PII scrub: replace email addresses with ``<EMAIL>`` and
    9+-digit runs (account/phone-shaped identifiers) with ``<ID>``, emails
    first. Patterns are RE2-compatible (no backrefs/lookaround) so the
    DuckDB oracle's ``regexp_replace(..., 'g')`` applies the IDENTICAL
    semantics; counts are taken before replacement. Stateless vectorizable
    batch fn — the scrub a training corpus runs over every document."""
    import re as _re

    em = _re.compile(PII_EMAIL_RE)
    ln = _re.compile(PII_LONGNUM_RE)
    ids = batch[id_col].to_pylist()
    out_t, n_em, n_id = [], [], []
    for t in batch[text_col].to_pylist():
        t = t or ""
        n_em.append(len(em.findall(t)))
        t2 = em.sub("<EMAIL>", t)
        n_id.append(len(ln.findall(t2)))
        out_t.append(ln.sub("<ID>", t2))
    return pa.table({
        "doc_id": batch[id_col].cast(pa.int64()),
        "clean_text": pa.array(out_t, pa.string()),
        "n_emails": pa.array(n_em, pa.int64()),
        "n_ids": pa.array(n_id, pa.int64()),
    })


def repeated_chunk_removal(ds, chunk_tokens: int = 20, min_df: int = 2,
                           max_hot: int = 1_000_000):
    """C4/CCNet-style repeated-boilerplate removal: delete every
    ``chunk_tokens``-token chunk whose document frequency is ≥ ``min_df``
    (nav bars, cookie banners, licence footers — and planted near-dup
    text in the synthetic corpus). Two passes over the corpus:

    1. df: per-batch Counter over each doc's DISTINCT chunk md5s → one
       (hash, df) partial row per chunk per batch → small ``groupby``
       Sum. The shuffle moves 32-B hashes, never chunk text.
    2. The hot set (df ≥ min_df) is driver-collected and broadcast ONCE
       via ``ray.put`` — boilerplate is by definition a tiny fraction of
       a corpus's distinct chunks, and ``max_hot`` guards the assumption:
       the build raises rather than silently materializing an unexpectedly
       huge blocklist (raise the cap or min_df if it fires).

    Returns (doc_id, kept_text, n_chunks, n_removed); removal keeps chunk
    order, so kept_text is the document minus its boilerplate blocks.
    Exactly SQL-expressible (md5 chunks + doc-frequency join) — the
    ``text_chunk_dedup`` oracle gates it end to end."""
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update({hashlib.md5(ch.encode()).hexdigest()
                      for ch in _doc_chunks(t, chunk_tokens)})
        hs = list(c.keys())
        return pa.table({"h": pa.array(hs, pa.string()),
                         "df": pa.array([c[h] for h in hs], pa.int64())})

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("h").aggregate(Sum("df", alias_name="df"))
             .filter(expr=f"df >= {int(min_df)}"))
    hot_rows = df_ds.take(max_hot + 1)
    if len(hot_rows) > max_hot:
        raise ValueError(
            f"repeated_chunk_removal: >{max_hot} chunks with df>={min_df}; "
            "raise max_hot or min_df — the broadcast-blocklist design "
            "assumes boilerplate is a small fraction of distinct chunks")
    hot_ref = ray.put(frozenset(r["h"] for r in hot_rows))

    def remove(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        kept, n_chunks, n_removed = [], [], []
        for t in batch["text"].to_pylist():
            cs = _doc_chunks(t, chunk_tokens)
            flags = [hashlib.md5(c.encode()).hexdigest() in hot for c in cs]
            kept.append(" ".join(c for c, f in zip(cs, flags) if not f))
            n_chunks.append(len(cs))
            n_removed.append(sum(flags))
        return pa.table(
            {"doc_id": batch["doc_id"],
             "kept_text": pa.array(kept, pa.string()),
             "n_chunks": pa.array(n_chunks, pa.int64()),
             "n_removed": pa.array(n_removed, pa.int64())}
        )

    return ds.map_batches(remove, batch_format="pyarrow")


def host_template_removal(ds, host_col: str = "host",
                          chunk_tokens: int = 20, min_share_pct: int = 50,
                          min_df: int = 2, max_hot: int = 1_000_000,
                          max_hosts: int = 1_000_000):
    """HOST-scoped boilerplate (site-chrome) removal: delete every
    ``chunk_tokens``-token chunk that appears in ≥ ``min_share_pct`` %
    of ITS OWN host's documents (and ≥ ``min_df`` absolute). Site chrome
    — nav menus, cookie banners, footers — is host-local at web scale:
    a GLOBAL df threshold (``repeated_chunk_removal``) misses the chrome
    of small sites and over-fires on common cross-site idioms; the
    share-of-host rule is scale-free per site (the CCNet/C4 practice of
    deduplicating boilerplate within a source).

    Same two-pass shape as the global op, keyed by (host, chunk-md5):
    per-batch distinct-per-doc Counter partials → small groupby Sum (32-B
    hashes cross the shuffle, never chunk text); per-host doc counts are
    a second tiny aggregate (guarded by ``max_hosts``); the hot
    (host, hash) set — df ≥ min_df ∧ 100·df ≥ share·host_docs, pure
    integer cross-multiplication — broadcasts ONCE via ``ray.put`` under
    the ``max_hot`` raise-guard; the strip pass is shuffle-free.

    Returns (doc_id, host, kept_text, n_chunks, n_removed), chunk order
    preserved. Exactly SQL-expressible — the ``host_chunk_dedup`` oracle
    gates it end to end."""
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        nd: Counter = Counter()
        for host, t in zip(batch[host_col].to_pylist(),
                           batch["text"].to_pylist()):
            h = host or ""
            nd[h] += 1
            c.update({(h, hashlib.md5(ch.encode()).hexdigest())
                      for ch in _doc_chunks(t, chunk_tokens)})
        keys = list(c.keys())
        return pa.table({
            "host": pa.array([k[0] for k in keys], pa.string()),
            "h": pa.array([k[1] for k in keys], pa.string()),
            "df": pa.array([c[k] for k in keys], pa.int64())})

    def ndocs_partial(batch: pa.Table) -> pa.Table:
        nd: Counter = Counter(
            (h or "") for h in batch[host_col].to_pylist())
        hosts = list(nd.keys())
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "n": pa.array([nd[h] for h in hosts], pa.int64())})

    nd_rows = (ds.map_batches(ndocs_partial, batch_format="pyarrow")
               .groupby("host").aggregate(Sum("n", alias_name="n"))
               .take(max_hosts + 1))
    if len(nd_rows) > max_hosts:
        raise ValueError(
            f"host_template_removal: >{max_hosts} hosts; raise max_hosts "
            "— the per-host doc-count table is assumed driver-small")
    host_docs = {r["host"]: r["n"] for r in nd_rows}

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby(["host", "h"]).aggregate(Sum("df", alias_name="df"))
             .filter(expr=f"df >= {int(min_df)}"))
    cand = df_ds.take(max_hot + 1)
    if len(cand) > max_hot:
        raise ValueError(
            f"host_template_removal: >{max_hot} chunks with df>={min_df}; "
            "raise max_hot or min_df — the broadcast-blocklist design "
            "assumes chrome is a small fraction of distinct chunks")
    hot_ref = ray.put(frozenset(
        (r["host"], r["h"]) for r in cand
        if 100 * r["df"] >= min_share_pct * host_docs[r["host"]]))

    def remove(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        kept, n_chunks, n_removed = [], [], []
        hosts = [h or "" for h in batch[host_col].to_pylist()]
        for host, t in zip(hosts, batch["text"].to_pylist()):
            cs = _doc_chunks(t, chunk_tokens)
            flags = [(host, hashlib.md5(c.encode()).hexdigest()) in hot
                     for c in cs]
            kept.append(" ".join(c for c, f in zip(cs, flags) if not f))
            n_chunks.append(len(cs))
            n_removed.append(sum(flags))
        return pa.table(
            {"doc_id": batch["doc_id"],
             "host": pa.array(hosts, pa.string()),
             "kept_text": pa.array(kept, pa.string()),
             "n_chunks": pa.array(n_chunks, pa.int64()),
             "n_removed": pa.array(n_removed, pa.int64())}
        )

    return ds.map_batches(remove, batch_format="pyarrow")


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    "Scaling Language Models", quality-filter table): duplicate-line and
    duplicate-paragraph fractions plus the most-frequent word-bigram's mass.
    All outputs are raw INTEGER numerators/denominators (not floats) so the
    DuckDB oracle hashes bit-identically; a consumer derives the Gopher
    fractions as dup_lines/n_lines, dup_line_chars/n_chars, etc.

    Per row:
      n_lines / dup_lines        — lines split on '\\n'; dup = occurrences
                                   beyond the first of each distinct line
      dup_line_chars             — sum((count-1) * len(line)) over lines
      n_paras / dup_paras        — same on '\\n\\n' paragraph blocks
      top_bigram_count           — count of the most frequent token bigram
                                   (ties → lexicographically smallest)
      top_bigram_chars           — count * len(bigram string)
      keep_repetition            — 0/1 Gopher gate: dup-line frac < 0.30
                                   AND dup-para frac < 0.30 AND top-bigram
                                   char mass < 0.20 of n_chars (integer
                                   cross-multiplied, no float compare)

    Stateless vectorizable batch fn; tokenization is the corpus-wide
    split-on-' ' convention shared with token_stats_batch so every text op
    agrees with the same SQL oracle tokenizer."""
    ids = batch["doc_id"]
    texts = batch["text"].to_pylist()
    n_lines, dup_lines, dup_line_chars = [], [], []
    n_paras, dup_paras = [], []
    tb_count, tb_chars, keep = [], [], []
    for t in texts:
        t = t or ""
        lines = t.split("\n")
        lc = Counter(lines)
        n_lines.append(len(lines))
        dup_lines.append(sum(c - 1 for c in lc.values() if c > 1))
        dup_line_chars.append(
            sum((c - 1) * len(l) for l, c in lc.items() if c > 1))
        paras = t.split("\n\n")
        pc = Counter(paras)
        n_paras.append(len(paras))
        dup_paras.append(sum(c - 1 for c in pc.values() if c > 1))
        toks = t.split(" ")
        if len(toks) >= 2:
            bc = Counter(a + " " + b for a, b in zip(toks, toks[1:]))
            best = min(bc.items(), key=lambda kv: (-kv[1], kv[0]))
            tb_count.append(best[1])
            tb_chars.append(best[1] * len(best[0]))
        else:
            tb_count.append(0)
            tb_chars.append(0)
        nch = len(t)
        keep.append(int(dup_lines[-1] * 10 < 3 * n_lines[-1]
                        and dup_paras[-1] * 10 < 3 * n_paras[-1]
                        and tb_chars[-1] * 5 < max(nch, 1)))
    return pa.table({
        "doc_id": ids,
        "n_lines": pa.array(n_lines, pa.int64()),
        "dup_lines": pa.array(dup_lines, pa.int64()),
        "dup_line_chars": pa.array(dup_line_chars, pa.int64()),
        "n_paras": pa.array(n_paras, pa.int64()),
        "dup_paras": pa.array(dup_paras, pa.int64()),
        "top_bigram_count": pa.array(tb_count, pa.int64()),
        "top_bigram_chars": pa.array(tb_chars, pa.int64()),
        "keep_repetition": pa.array(keep, pa.int64()),
    })


def c4_line_filter_batch(batch: pa.Table) -> pa.Table:
    """C4-style line/document cleaning (Raffel et al. 2020 §2.2): keep only
    lines with ≥5 whitespace tokens that end in terminal punctuation
    ('.', '!', '?', '"'); then gate the document — keep iff ≥3 lines
    survived, the retained text contains no '{' (code/markup tell) and no
    'lorem ipsum' (placeholder tell, case-insensitive). Emits the retained
    text plus integer counters and the 0/1 gate; stateless vectorizable
    batch fn, exactly reproduced by the DuckDB list-comprehension oracle."""
    ids = batch["doc_id"]
    texts = batch["text"].to_pylist()
    n_lines, kept_lines, kept_text, keep = [], [], [], []
    for t in texts:
        t = t or ""
        lines = t.split("\n")
        ks = [l for l in lines
              if len(l.split(" ")) >= 5 and l.endswith((".", "!", "?", '"'))]
        kt = "\n".join(ks)
        n_lines.append(len(lines))
        kept_lines.append(len(ks))
        kept_text.append(kt)
        keep.append(int(len(ks) >= 3 and "{" not in kt
                        and "lorem ipsum" not in kt.lower()))
    return pa.table({
        "doc_id": ids,
        "n_lines": pa.array(n_lines, pa.int64()),
        "kept_lines": pa.array(kept_lines, pa.int64()),
        "kept_text": pa.array(kept_text, pa.string()),
        "keep_c4": pa.array(keep, pa.int64()),
    })


def gram_compressibility_batch(batch: pa.Table) -> pa.Table:
    """Distinct-4-gram compressibility proxy — the ORACLE-EXPRESSIBLE
    primary of the compression-quality family (r5; replaces zlib as the
    gated metric): repetitive boilerplate has few distinct character
    4-grams relative to its length, prose has many — the same signal
    corpus filters read off a deflate ratio, restated as pure counting so
    DuckDB can replay it exactly (lateral ``range`` → substr 4-grams →
    count / count-distinct). Emits per doc: character count, total
    4-grams (= max(n_chars-3, 0)), distinct 4-grams, and
    distinct_ppm = floor(1e6 · distinct / total) (0 when no grams).
    The zlib deflate ratio stays available as ``compression_stats_batch``
    (rows-only: DEFLATE has no SQL restatement)."""
    texts = batch["text"].to_pylist()
    n_chars, total, distinct, ppm = [], [], [], []
    for t in texts:
        t = t or ""
        n = len(t)
        tg = max(n - 3, 0)
        dg = len({t[i:i + 4] for i in range(tg)}) if tg else 0
        n_chars.append(n)
        total.append(tg)
        distinct.append(dg)
        ppm.append(dg * 1_000_000 // tg if tg else 0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, pa.int64()),
        "total_grams": pa.array(total, pa.int64()),
        "distinct_grams": pa.array(distinct, pa.int64()),
        "distinct_ppm": pa.array(ppm, pa.int64()),
    })


def compression_stats_batch(batch: pa.Table) -> pa.Table:
    """Compression-ratio quality proxy (entropy stand-in used by several
    published corpus filters: highly repetitive boilerplate compresses far
    below prose): zlib level-6 deflate length over the UTF-8 bytes, plus
    ratio_ppm = floor(1e6 · zlib_len / max(n_bytes, 1)). Deterministic
    (zlib output is fully specified by input + level) but not
    SQL-expressible — rows-only driver check with determinism tests."""
    import zlib

    texts = batch["text"].to_pylist()
    n_bytes, z_len, ppm = [], [], []
    for t in texts:
        b = (t or "").encode("utf-8")
        z = len(zlib.compress(b, 6))
        n_bytes.append(len(b))
        z_len.append(z)
        ppm.append(z * 1_000_000 // max(len(b), 1))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bytes": pa.array(n_bytes, pa.int64()),
        "zlib_len": pa.array(z_len, pa.int64()),
        "ratio_ppm": pa.array(ppm, pa.int64()),
    })


def normalize_text_batch(batch: pa.Table) -> pa.Table:
    """CCNet-style pre-LM text normalization: lowercase + accent folding
    (NFD decompose, drop combining marks — the same fold DuckDB's
    ``strip_accents`` applies, verified char-for-char for latin accents,
    so the ``lower(strip_accents(text))`` oracle is exact). Emits the
    normalized text plus a 0/1 ``changed`` flag (fold altered something
    beyond plain lowercasing). Stateless vectorizable batch fn."""
    import unicodedata

    texts = batch["text"].to_pylist()
    norm, changed = [], []
    for t in texts:
        t = t or ""
        nfd = unicodedata.normalize("NFD", t)
        n = "".join(c for c in nfd if not unicodedata.combining(c)).lower()
        norm.append(n)
        changed.append(int(n != t.lower()))
    return pa.table({
        "doc_id": batch["doc_id"],
        "norm_text": pa.array(norm, pa.string()),
        "changed": pa.array(changed, pa.int64()),
    })


def unigram_rarity(ds, max_vocab: int = 5_000_000):
    """CCNet-style corpus-LM rarity proxy: score each document by the
    corpus-wide frequency of its own unigrams (a document of rare tokens
    has low mean document frequency — the cheap stand-in for the KenLM
    perplexity CCNet buckets on). Two passes:

    1. Vocabulary: per-batch Counter partials (one (token, n) row per
       token per batch) → small groupby Sum — the shuffle moves partials,
       never documents.
    2. The vocabulary is driver-collected and broadcast ONCE via
       ``ray.put`` (the CCNet pattern: the LM is a model artifact shipped
       to every worker, not a join side). ``max_vocab`` guards the
       broadcast assumption — a corpus whose distinct-token count exceeds
       it should prune with a min-count cut or switch to the
       hash-partitioned PartitionedLookup used by minhash dedup
       (raycrawl/ops/dedup.py) rather than silently shipping gigabytes.

    Returns (doc_id, n_tokens, sum_token_freq) — integer-exact; mean
    token document-frequency = sum_token_freq / n_tokens. Oracle-gated
    end to end by the ``text_rarity`` SQL (explode → count → join → sum)."""
    import ray
    from ray.data.aggregate import Sum

    def vocab_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update((t or "").split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array([c[k] for k in toks], pa.int64())})

    vocab_ds = (ds.map_batches(vocab_partial, batch_format="pyarrow")
                .groupby("token").aggregate(Sum("n", alias_name="n")))
    rows = vocab_ds.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"unigram_rarity: vocabulary exceeds {max_vocab} tokens; apply "
            "a min-count prune or switch to a PartitionedLookup join")
    vocab_ref = ray.put({r["token"]: r["n"] for r in rows})

    def score(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        n_toks, sums = [], []
        for t in batch["text"].to_pylist():
            toks = (t or "").split(" ")
            n_toks.append(len(toks))
            sums.append(sum(vocab[w] for w in toks))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n_toks, pa.int64()),
                         "sum_token_freq": pa.array(sums, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_coverage(ds, min_count: int = 2, max_vocab: int = 5_000_000,
                    train_ds=None):
    """KenLM-lite bigram-coverage quality proxy: score each document by
    the fraction of its word bigrams that the corpus LM "knows" (total
    corpus occurrences ≥ ``min_count``). CCNet buckets documents by KenLM
    perplexity; perplexity itself is a float product that no SQL engine
    reproduces bit-for-bit, so the integer-exact stand-in is hit RATE
    against the same n-gram table a backoff LM is built from — fluent
    text is made of bigrams the corpus has seen repeatedly, OCR noise and
    boilerplate mash-ups are not (the same signal, one integer per doc).

    Same two-pass shape (and broadcast guard) as ``unigram_rarity``:

    1. Bigram table: per-batch Counter partials (one (bigram, n) row per
       distinct bigram per batch) → groupby Sum → filter n ≥ min_count —
       the shuffle moves partials, never documents.
    2. The surviving hot set is broadcast ONCE via ``ray.put`` (bounded
       by ``max_vocab``; at 100 TB prune harder or switch to the
       PartitionedLookup join) and the doc pass is shuffle-free.

    Returns (doc_id, n_bigrams, n_known, known_ppm) — all int64;
    known_ppm = n_known·10⁶ // n_bigrams (0 for docs with no bigram).

    With ``train_ds`` the bigram table trains on a DIFFERENT corpus and
    ``ds`` is only scored — the cross-corpus form is the domain-shift /
    novelty screen (CCNet trains its LM on Wikipedia and scores Common
    Crawl; same shape): text that the reference corpus has never
    phrased scores low."""
    import ray
    from ray.data.aggregate import Sum

    def bigram_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            toks = (t or "").split(" ")
            c.update(toks[i] + " " + toks[i + 1]
                     for i in range(len(toks) - 1))
        grams = list(c.keys())
        return pa.table({"bigram": pa.array(grams, pa.string()),
                         "n": pa.array([c[g] for g in grams], pa.int64())})

    src = train_ds if train_ds is not None else ds
    hot_ds = (src.map_batches(bigram_partial, batch_format="pyarrow")
              .groupby("bigram").aggregate(Sum("n", alias_name="n"))
              .filter(lambda r: r["n"] >= min_count))
    rows = hot_ds.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"bigram_coverage: hot bigram set exceeds {max_vocab}; raise "
            "min_count or switch to a PartitionedLookup join")
    hot_ref = ray.put(frozenset(r["bigram"] for r in rows))

    def score(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        n_bi, n_known, ppm = [], [], []
        for t in batch["text"].to_pylist():
            toks = (t or "").split(" ")
            grams = [toks[i] + " " + toks[i + 1]
                     for i in range(len(toks) - 1)]
            k = sum(g in hot for g in grams)
            n_bi.append(len(grams))
            n_known.append(k)
            ppm.append(k * 1_000_000 // len(grams) if grams else 0)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bigrams": pa.array(n_bi, pa.int64()),
                         "n_known": pa.array(n_known, pa.int64()),
                         "known_ppm": pa.array(ppm, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(ds):
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020 §4.3):
    rank every document by the corpus-LM fluency proxy — mean corpus
    frequency of its own tokens (``unigram_rarity``'s integers, as one
    floored ppm per doc) — and cut the ranking into terciles. CCNet keeps
    `head` (lowest perplexity ≈ highest mean token frequency here) as the
    premium slice; `tail` is the first candidate for dropping.

    Scale shape: the rarity pass is the guarded two-pass unigram_rarity;
    the tercile cut is the ``pack_offsets`` discipline — ONE
    range-partitioned sort of fixed-width (doc_id, freq_ppm) rows, per-
    block counts to the driver (O(blocks) scalars), exclusive scan, ranks
    and buckets finalized where the rows live. Ties break by doc_id.

    Returns (doc_id, freq_ppm, rank, bucket) — rank 0-based in
    (freq_ppm desc, doc_id asc) order; bucket ∈ {head, middle, tail} by
    rank·3 < n / < 2n."""
    import ray
    import ray.data as rd

    rarity = unigram_rarity(ds)

    def score(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_tokens"], np.int64)
        s = np.asarray(batch["sum_token_freq"], np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "freq_ppm": pa.array(s * 1_000_000 // np.maximum(n, 1),
                                 pa.int64()),
        })

    from .grouping import sorted_block_refs

    blocks, rows = sorted_block_refs(
        rarity.map_batches(score, batch_format="pyarrow")
        .sort(["freq_ppm", "doc_id"], descending=[True, False]),
        ["freq_ppm", "doc_id"], [True, False])
    if not blocks:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "freq_ppm": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string())}))
    total = int(sum(rows))
    offsets = np.concatenate(([0], np.cumsum(rows, dtype=np.int64)[:-1]))

    @ray.remote
    def _finalize(t: pa.Table, off: int, n: int) -> pa.Table:
        rank = np.arange(off, off + t.num_rows, dtype=np.int64)
        bucket = np.where(rank * 3 < n, "head",
                          np.where(rank * 3 < 2 * n, "middle", "tail"))
        return pa.table({"doc_id": t["doc_id"], "freq_ppm": t["freq_ppm"],
                         "rank": pa.array(rank),
                         "bucket": pa.array(bucket.tolist(), pa.string())})

    return rd.from_arrow_refs(
        [_finalize.remote(b, int(o), total)
         for b, o in zip(blocks, offsets)])


def vocab_drift(old_ds, new_ds, n_parts: int | None = None):
    """Vocabulary drift between two crawl epochs: the tokens the NEW
    epoch introduces (present in new, absent from old) with their
    new-epoch document frequency. This is the index-maintenance cost
    signal a recrawl produces — every new token is a new postings list
    (``index.postings_merge`` pays it) — and a drift monitor for
    training-data distribution shift.

    Scale shape: both sides reduce to distinct-token rows inside
    ``map_batches`` (old: (token); new: (token, doc) partials → a Sum
    groupby for df) — documents never cross an exchange; the novelty
    test is ONE hash-partitioned ``left_anti`` join on the token string.
    Returns (token, n_docs)."""
    from ray.data.aggregate import Sum

    from ..ops.grouping import resolve_parts

    width = resolve_parts(n_parts)

    def old_tokens(batch: pa.Table) -> pa.Table:
        s = set()
        for t in batch["text"].to_pylist():
            s.update((t or "").split(" "))
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    def new_partials(batch: pa.Table) -> pa.Table:
        toks, ns = [], []
        for t in batch["text"].to_pylist():
            for tok in set((t or "").split(" ")):
                toks.append(tok)
                ns.append(1)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n_docs": pa.array(ns, pa.int64())})

    old_t = (old_ds.map_batches(old_tokens, batch_format="pyarrow")
             .groupby("token").count()
             .map_batches(lambda t: t.select(["token"]),
                          batch_format="pyarrow"))
    new_df = (new_ds.map_batches(new_partials, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n_docs",
                                              alias_name="n_docs")))
    # strip zero-row blocks (Acero rejects them as join sides) and
    # short-circuit fully-empty epochs instead of joining them
    import ray.data as rd

    from ..ops.grouping import nonempty_refs

    df_schema = pa.schema([("token", pa.string()), ("n_docs", pa.int64())])
    new_live, _ = nonempty_refs(new_df)
    if not new_live:
        return rd.from_arrow(df_schema.empty_table())
    new_df = rd.from_arrow_refs(new_live)
    old_live, _ = nonempty_refs(old_t)
    if not old_live:
        return new_df  # empty old epoch: everything is new
    return new_df.join(rd.from_arrow_refs(old_live), join_type="left_anti",
                       num_partitions=width, on=("token",))


def distinct_token_count(ds):
    """Exact corpus-wide distinct-token count, fully distributed: per-batch
    DISTINCT partials (one row per token per batch) → groupby → count of
    groups. The shuffle moves (token) keys once per batch they appear in,
    never per occurrence. Returns a 1-row (n_distinct) table; the SQL
    oracle is COUNT(DISTINCT token)."""
    def tok_partial(batch: pa.Table) -> pa.Table:
        s = set()
        for t in batch["text"].to_pylist():
            s.update((t or "").split(" "))
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    n = (ds.map_batches(tok_partial, batch_format="pyarrow")
         .groupby("token").count().count())
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def hll_distinct_tokens(ds, p: int = 12):
    """HyperLogLog distinct-token estimate — the sketch path for corpus
    vocabulary stats at scales where even the exact distinct shuffle is
    unwelcome. Deterministic: token → md5 64-bit int, register = top ``p``
    bits, rho = leading zeros of the rest + 1. Per-batch partials emit one
    dense 2^p-byte register row; registers merge by elementwise max —
    commutative/associative, so any partition or fold order gives the
    identical sketch. The driver folds O(blocks) 4-KB rows (the same cost
    class as the crawl counters). Standard HLL bias correction; expected
    error ≈ 1.04/sqrt(2^p) ≈ 1.6% at p=12 (pinned against the exact count
    in tests). Oracle-gated (r4): registers replay integer-exactly in
    DuckDB (byte-swapped md5_number_upper, printf('%b') bit lengths)."""
    import hashlib

    m = 1 << p

    def sketch_partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        seen: set[str] = set()
        for t in batch["text"].to_pylist():
            seen.update((t or "").split(" "))
        for w in seen:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            rho = (64 - p) - rest.bit_length() + 1
            if rho > regs[idx]:
                regs[idx] = rho
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    regs = np.zeros(m, dtype=np.uint8)
    for row in ds.map_batches(sketch_partial,
                              batch_format="pyarrow").take_all():
        regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.uint8))

    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range linear counting
    return pa.table({"est_distinct": pa.array([int(round(est))], pa.int64())})


def cms_token_topk(ds, *, top_n: int = 20, width: int = 2048,
                   depth: int = 4):
    """Count-min-sketch heavy hitters: the fixed-memory sibling of
    ``token_histogram`` (which is exact but shuffles one row per distinct
    token per batch — at open-web vocabulary scale even that exchange is
    unwelcome; the sketch is ``depth×width`` int64 counters, period).

    Deterministic md5 probes: row ``r`` uses hex chars ``[8r, 8r+8)`` of
    ``md5(token)`` mod ``width`` — the four rows exactly consume the
    digest, and each probe is SQL-expressible, so the sketch counters
    (sums over hash-colliding tokens) and therefore the estimates are
    EXACTLY oracle-gateable, overestimates included. Per-batch partials
    emit one dense ``depth·width·8``-byte register row; registers merge
    by elementwise SUM — commutative, so any partition/fold order yields
    the identical sketch (HLL-register discipline). The driver folds
    O(blocks) 64-KB rows.

    Returns the exact top-``top_n`` tokens (count desc, token asc — the
    ``token_histogram`` order) with both the exact count and the CMS
    estimate: ``(token, occurrences, cms_estimate)``,
    ``cms_estimate >= occurrences`` always."""
    import hashlib

    if not 1 <= depth <= 4:
        raise ValueError(
            f"cms_token_topk: depth={depth} unsupported — each row consumes "
            "8 hex chars of the 32-char md5 digest, so depth must be 1..4")

    def probes(tok: str):
        h = hashlib.md5(tok.encode()).hexdigest()
        return [int(h[8 * r: 8 * r + 8], 16) % width for r in range(depth)]

    def sketch_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update((t or "").split(" "))
        regs = np.zeros((depth, width), dtype=np.int64)
        for tok, n in c.items():
            for r, p in enumerate(probes(tok)):
                regs[r, p] += n
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    regs = np.zeros((depth, width), dtype=np.int64)
    for row in ds.map_batches(sketch_partial,
                              batch_format="pyarrow").take_all():
        regs += np.frombuffer(row["regs"], dtype=np.int64).reshape(
            depth, width)

    top = token_histogram(ds, top_n).take_all()
    toks = [r["token"] for r in top]
    ests = [int(min(regs[r, p] for r, p in enumerate(probes(t))))
            for t in toks]
    return pa.table({
        "token": pa.array(toks, pa.string()),
        "occurrences": pa.array([r["occurrences"] for r in top], pa.int64()),
        "cms_estimate": pa.array(ests, pa.int64()),
    })


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_doc_gate_batch(batch: pa.Table, *, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Gopher document-quality rule battery (Rae et al. 2021, §A1.1) —
    the doc-level sibling of ``repetition_batch``'s repetition gates.
    Words are a single-space split of the text with newlines folded to
    spaces; lines split on newline. All seven rules are integer
    cross-multiplied so the DuckDB oracle is bit-exact:

      1. 50 ≤ n_words ≤ 100 000
      2. mean word length in [3, 10]:  3·n ≤ Σlen(w) ≤ 10·n
      3. hash/ellipsis symbol-to-word ratio ≤ 0.1:  10·sym ≤ n
      4. ≤10% of lines start with a bullet '- ':  10·bullet ≤ n_lines
      5. ≤30% of lines end with '...':  10·ellipsis ≤ 3·n_lines
      6. ≥80% of words contain an alphabetic char:  10·alpha ≥ 8·n
      7. ≥2 distinct Gopher stop words (the/be/to/of/and/that/have/with)

    Stateless vectorizable batch fn; emits every counter so downstream
    funnels can re-weight rules without recomputing."""
    ids = batch[id_col]
    n_words, sum_len, alpha, stops = [], [], [], []
    n_lines, bullets, ellips, syms, keep = [], [], [], [], []
    for t in batch[text_col].to_pylist():
        t = t or ""
        words = t.replace("\n", " ").split(" ")
        lines = t.split("\n")
        nw = len(words)
        sl = sum(len(w) for w in words)
        al = sum(1 for w in words if any(c.isalpha() and c.isascii()
                                         for c in w))
        st = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
        nl = len(lines)
        bu = sum(1 for ln in lines if ln[:2] == "- ")
        el = sum(1 for ln in lines if ln.endswith("..."))
        sy = t.count("#") + t.count("...")
        ok = (50 <= nw <= 100_000
              and 3 * nw <= sl <= 10 * nw
              and 10 * sy <= nw
              and 10 * bu <= nl
              and 10 * el <= 3 * nl
              and 10 * al >= 8 * nw
              and st >= 2)
        n_words.append(nw); sum_len.append(sl); alpha.append(al)
        stops.append(st); n_lines.append(nl); bullets.append(bu)
        ellips.append(el); syms.append(sy); keep.append(1 if ok else 0)
    i64 = pa.int64()
    return pa.table({
        id_col: ids,
        "n_words": pa.array(n_words, i64),
        "sum_word_len": pa.array(sum_len, i64),
        "alpha_words": pa.array(alpha, i64),
        "stop_hits": pa.array(stops, i64),
        "n_lines": pa.array(n_lines, i64),
        "bullet_lines": pa.array(bullets, i64),
        "ellipsis_lines": pa.array(ellips, i64),
        "sym_count": pa.array(syms, i64),
        "keep": pa.array(keep, i64),
    })


_CLF_DIGIT_RE = re.compile(r"[0-9]")


def _clf_weak_label(text: str) -> int:
    """Weak quality label the classifier trains on: ≥30 whitespace tokens
    and digit characters under 1/5 of the text (the cheap heuristic a
    human would seed a fastText quality model with). ASCII ``[0-9]`` (not
    ``\\d``) so Python and DuckDB's RE2 count the same characters."""
    t = text or ""
    return int(len(t.split(" ")) >= 30
               and 5 * len(_CLF_DIGIT_RE.findall(t)) < len(t))


def quality_classifier(ds, max_vocab: int = 5_000_000,
                       scale: int = 1_000_000_000):
    """fastText-style hashed-free linear quality classifier (the CCNet /
    LLaMA "trained quality filter" tier; Joulin et al. 2017 supervised
    fastText, Wenzek et al. 2020 §4.4): self-train token weights from a
    weak heuristic label, then score every document with the learned
    linear model. Log-free so SQL replays it bit-for-bit: a token's
    weight is its scaled class-frequency difference

        w[tok] = cnt_pos·scale // N_pos  −  cnt_neg·scale // N_neg

    (occurrence counts; N_* = total occurrences per class) — the sign of
    the multinomial Naive-Bayes log-ratio without the log, integer-exact
    under floor division. A document's score is the sum of w over its
    token OCCURRENCES; keep = score > 0.

    Distribution shape mirrors ``unigram_rarity``: one counting pass of
    per-batch (token, cnt_pos, cnt_neg) Counter partials → small groupby
    Sum (the shuffle moves partials, never text); the learned weight
    table is a model artifact broadcast ONCE via ``ray.put`` (guarded by
    ``max_vocab`` — prune by min-count or switch to the PartitionedLookup
    join past it); the scoring pass is shuffle-free. Weight magnitudes
    are ≤ ``scale`` so a doc's int64 score headroom is ~9·10⁹ tokens.

    Returns (doc_id, clf_score, clf_keep) — all int64. Oracle-gated end
    to end by the ``quality_classifier`` SQL (label CASE → exploded
    HUGEINT class counts → floor-division weights → occurrence-sum)."""
    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        cp, cn = Counter(), Counter()
        for t in batch["text"].to_pylist():
            (cp if _clf_weak_label(t) else cn).update((t or "").split(" "))
        toks = list(cp.keys() | cn.keys())
        return pa.table({"token": pa.array(toks, pa.string()),
                         "cp": pa.array([cp[k] for k in toks], pa.int64()),
                         "cn": pa.array([cn[k] for k in toks], pa.int64())})

    vocab_ds = (ds.map_batches(count_partial, batch_format="pyarrow")
                .groupby("token")
                .aggregate(Sum("cp", alias_name="cp"),
                           Sum("cn", alias_name="cn")))
    rows = vocab_ds.take(max_vocab + 1)
    if len(rows) > max_vocab:
        raise ValueError(
            f"quality_classifier: vocabulary exceeds {max_vocab} tokens; "
            "apply a min-count prune or switch to a PartitionedLookup join")
    n_pos = sum(r["cp"] for r in rows)
    n_neg = sum(r["cn"] for r in rows)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "quality_classifier: one label class is empty — the weak "
            "label separates nothing on this corpus; adjust the heuristic")
    weights = {r["token"]: r["cp"] * scale // n_pos - r["cn"] * scale // n_neg
               for r in rows}
    w_ref = ray.put(weights)

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        scores = []
        for t in batch["text"].to_pylist():
            scores.append(sum(w.get(tok, 0) for tok in (t or "").split(" ")))
        return pa.table({
            "doc_id": batch["doc_id"],
            "clf_score": pa.array(scores, pa.int64()),
            "clf_keep": pa.array([int(s > 0) for s in scores], pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()


def heaps_curve(ds, n_points: int = 10, id_col: str = "doc_id",
                text_col: str = "text"):
    """Vocabulary-growth (Heaps' law) curve: distinct-vocabulary size
    after the first k/n_points of the corpus in doc-id order, for
    k = 1..n_points — the sizing input for tokenizer vocab budgets,
    postings-dictionary memory, and the drift check that a crawl's new
    epochs still grow vocabulary sublinearly (V ≈ K·nᵝ; a linear jump
    flags boilerplate or spam mass).

    Scale shape: ONE pass emits per-batch DISTINCT (token, min doc_id)
    partials → token-keyed Min groupby (the shuffle moves each token
    once per batch it appears in, never per occurrence — the
    ``distinct_token_count`` discipline); each token then reduces to a
    10-bin histogram by ``searchsorted`` over the threshold ladder, and
    the driver cumulates ``n_points`` integers. Thresholds are
    ``t_k = (N·k)//n_points`` over the dense 0..N-1 doc ids
    (TESTDATA.md contract). Returns (point, n_docs, vocab)."""
    import pandas as pd

    from ray.data.aggregate import Min, Sum

    total = ds.count()
    if total == 0:
        return pa.table({"point": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "vocab": pa.array([], pa.int64())})
    thresholds = np.array(
        [(total * k) // n_points for k in range(1, n_points + 1)],
        dtype=np.int64)

    def first_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        best: dict = {}
        for d, t in zip(ids, batch[text_col].to_pylist()):
            for tok in (t or "").split(" "):
                if tok not in best or d < best[tok]:
                    best[tok] = d
        toks = sorted(best)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "first_doc": pa.array([best[t] for t in toks], pa.int64())})

    firsts = (ds.map_batches(first_partial, batch_format="pyarrow")
              .groupby("token").aggregate(Min("first_doc",
                                              alias_name="first_doc")))

    def hist_partial(batch: pa.Table) -> pa.Table:
        fd = np.asarray(batch["first_doc"], np.int64)
        # token counted at point k iff first_doc < t_k, i.e. from the
        # first threshold strictly above first_doc onward
        idx = np.searchsorted(thresholds, fd, side="right")
        cnt = np.bincount(idx, minlength=len(thresholds) + 1)
        return pa.table({
            "point": pa.array(np.arange(len(thresholds)), pa.int64()),
            "c": pa.array(cnt[: len(thresholds)], pa.int64())})

    rows = (firsts.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("point").aggregate(Sum("c", alias_name="c"))
            .take_all())
    acc = np.zeros(len(thresholds), dtype=np.int64)
    for r in rows:
        acc[r["point"]] += r["c"]
    vocab = np.cumsum(acc)
    return pa.table({
        "point": pa.array(np.arange(1, n_points + 1), pa.int64()),
        "n_docs": pa.array(thresholds, pa.int64()),
        "vocab": pa.array(vocab, pa.int64())})


def lang_fertility(docs_ds, *, text_col: str = "text",
                   lang_col: str = "lang"):
    """Per-language tokenizer-fertility report — the corpus-balancing
    diagnostic a multilingual training mix needs (languages whose
    whitespace tokens carry more characters consume proportionally more
    subword budget; the mix designer weights by tokens, not docs). One
    row per language: (lang, n_docs, n_tokens, n_chars,
    chars_per_token_ppm, tokens_per_doc_ppm), all integer-exact
    (×1e6-floored ratios).

    Scale shape: token/char counts reduce to per-(lang) partials inside
    each batch; the ONE exchange is a #languages-row Sum groupby."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        langs = [lg or "" for lg in batch[lang_col].to_pylist()]
        texts = batch[text_col].to_pylist()
        toks = np.array([len((t or "").split(" ")) for t in texts],
                        np.int64)
        chars = np.array([len(t or "") for t in texts], np.int64)
        pdf = pd.DataFrame({"lang": langs, "n_docs": 1,
                            "n_tokens": toks, "n_chars": chars})
        out = pdf.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens"),
                      Sum("n_chars", alias_name="n_chars")))

    def ratios(batch: pa.Table) -> pa.Table:
        nd = np.asarray(batch["n_docs"], np.int64)
        nt = np.asarray(batch["n_tokens"], np.int64)
        nc = np.asarray(batch["n_chars"], np.int64)
        return pa.table({
            "lang": batch["lang"],
            "n_docs": pa.array(nd, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_chars": pa.array(nc, pa.int64()),
            "chars_per_token_ppm": pa.array(
                1_000_000 * nc // np.maximum(nt, 1), pa.int64()),
            "tokens_per_doc_ppm": pa.array(
                1_000_000 * nt // np.maximum(nd, 1), pa.int64())})

    return agg.map_batches(ratios, batch_format="pyarrow")


def zipf_fit(docs_ds, *, text_col: str = "text", top_n: int = 1000):
    """Zipf rank-frequency fit over the corpus unigram distribution:
    least-squares slope of ln(freq) on ln(rank) across the ``top_n``
    most frequent tokens (rank ties broken token-asc). Natural text
    sits near slope −1 (Zipf's law); a corpus drifting flat signals
    boilerplate flooding, one drifting steep signals vocabulary
    collapse — the sibling diagnostic to ``heaps_curve``'s vocabulary
    growth. Returns ONE row: (n_tokens_fit, slope, intercept), floats
    (the driver compare rounds at 1e-6; both engines sum ~1e3 ln terms
    in float64, agreeing to ~1e-12).

    Scale shape: token counts reduce per-batch (pandas groupby
    combiner), ONE Sum groupby over distinct tokens, a fixed-width
    (count, token) sort + ``limit(top_n)``, and an O(top_n) driver
    closed form."""
    import numpy as np
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        toks: dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for w in (t or "").split(" "):
                toks[w] = toks.get(w, 0) + 1
        return pa.table({
            "token": pa.array(list(toks.keys()), pa.string()),
            "c": pa.array(list(toks.values()), pa.int64())})

    top = (docs_ds.map_batches(counts, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("c", alias_name="c"))
           .sort(["c", "token"], descending=[True, False])
           .limit(top_n).take_all())
    if len(top) < 2:
        raise ValueError(
            "zipf_fit: need at least 2 distinct tokens to fit a slope "
            f"(corpus has {len(top)})")
    freqs = np.array([r["c"] for r in top], np.float64)
    ranks = np.arange(1, len(freqs) + 1, dtype=np.float64)
    x, y = np.log(ranks), np.log(freqs)
    xm, ym = x.mean(), y.mean()
    slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
    return pa.table({
        "n_tokens_fit": pa.array([len(freqs)], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([float(ym - slope * xm)], pa.float64())})
