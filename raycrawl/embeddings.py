"""Embedding generation tier (reference parity: T6).

Mirrors the reference's provider architecture —
``meilisearchcrawler/embeddings.py:12-36`` (``EmbeddingProvider`` ABC),
``:76-196`` (HTTP inference provider with LRU cache, batching, timeout and
dim verification), ``:199-217`` (``NoEmbeddingProvider``), ``:220-268``
(factory) — re-expressed for Ray Data: the provider is held by a STATEFUL
actor-pool stage (``EmbedStage``), constructed once per actor in
``__init__`` and applied per Arrow batch in ``__call__``; the per-actor LRU
deduplicates repeated texts before they ever reach the provider.

The sandbox has no network and no model weights, so the default provider is
``FakeHashEmbeddingProvider`` — a deterministic stand-in whose component
values are md5-derived integers. It is NOT a stub: the Ray-side plumbing
(actor pool, cache, batching, fixed-size-list output schema) is identical
to what a real TEI/Gemini provider would use, and its determinism gives the
DuckDB oracle an exact target:

    component_int(text, i) = int(md5(f"{text}:{i}".hexdigest())[:8], 16)
    float value            = component_int / 2^32            (in [0, 1))

which DuckDB reproduces bit-exactly on the integer form via
``('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT``.
"""

from __future__ import annotations

import hashlib
from abc import ABC, abstractmethod
from collections import OrderedDict

import numpy as np
import pyarrow as pa


class EmbeddingProvider(ABC):
    """Abstract embedding provider (ref ``embeddings.py:12-36``)."""

    def __init__(self, model_name: str):
        self.model_name = model_name
        self.embedding_dim: int | None = None

    @abstractmethod
    def encode(self, texts: list[str]) -> list[list[float] | None]:
        """Embed a list of texts; None marks a failed row (ref returns
        None-filled results on batch errors, ``embeddings.py:144-187``)."""

    @abstractmethod
    def get_embedding_dim(self) -> int: ...

    @abstractmethod
    def get_provider_name(self) -> str: ...

    def get_model_name(self) -> str:
        return self.model_name


class FakeHashEmbeddingProvider(EmbeddingProvider):
    """Deterministic md5-derived embeddings (sandbox stand-in for TEI).

    encode() is exact and stateless: component i of a text's vector is
    ``int(md5(text + ':' + i)[:8], 16) / 2**32``. ``calls``/``texts_encoded``
    counters let tests assert the LRU actually deduplicated."""

    def __init__(self, dim: int = 8, model_name: str = "fake-md5"):
        super().__init__(model_name)
        self.embedding_dim = dim
        self.calls = 0
        self.texts_encoded = 0

    @staticmethod
    def component_int(text: str, i: int) -> int:
        h = hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:8]
        return int(h, 16)

    def encode(self, texts: list[str]) -> list[list[float] | None]:
        self.calls += 1
        self.texts_encoded += len(texts)
        out = []
        for t in texts:
            out.append([self.component_int(t, i) / 2.0**32
                        for i in range(self.embedding_dim)])
        return out

    def get_embedding_dim(self) -> int:
        return self.embedding_dim

    def get_provider_name(self) -> str:
        return "fake"


class RemoteAPIEmbeddingProvider(EmbeddingProvider):
    """TEI-style HTTP provider (ref ``embeddings.py:76-196``): POSTs
    ``{"inputs": batch, "normalize": true, "truncate": true}``, verifies the
    served dimension on first use, tolerates per-batch failures by leaving
    those rows None. ``post_fn(url, json, timeout) -> list[list[float]]`` is
    injectable so the retry/None semantics are unit-testable offline."""

    def __init__(self, model_name: str, api_url: str, post_fn=None,
                 timeout: float = 10.0, expected_dim: int | None = None):
        super().__init__(model_name)
        self.api_url = api_url
        self.timeout = timeout
        self.embedding_dim = expected_dim
        if post_fn is None:
            def post_fn(url, json, timeout):  # pragma: no cover - needs net
                import requests

                r = requests.post(url, json=json, timeout=timeout,
                                  headers={"Content-Type": "application/json"})
                r.raise_for_status()
                return r.json()
        self._post = post_fn

    def encode(self, texts: list[str]) -> list[list[float] | None]:
        if not texts:
            return []
        try:
            vecs = self._post(self.api_url,
                              {"inputs": texts, "normalize": True,
                               "truncate": True},
                              self.timeout)
        except Exception:
            return [None] * len(texts)
        if self.embedding_dim is None and vecs and vecs[0]:
            # dim auto-detection (ref embeddings.py:123-132)
            self.embedding_dim = len(vecs[0])
        out: list[list[float] | None] = []
        for v in vecs:
            if v and (self.embedding_dim is None
                      or len(v) == self.embedding_dim):
                out.append(v)
            else:
                out.append(None)  # dim-mismatch rows dropped, not mangled
        return out

    def get_embedding_dim(self) -> int:
        return self.embedding_dim or 0

    def get_provider_name(self) -> str:
        return "huggingface"


class GeminiEmbeddingProvider(EmbeddingProvider):
    """Gemini API provider (ref ``embeddings.py:39-75``): fixed 768-dim,
    one ``embed_content`` call per batch, batch errors degrade to
    empty-list rows (NOT None — the reference returns ``[[] for _ in
    texts]`` on error, embeddings.py:63-65). ``client`` is injectable
    (an object with ``models.embed_content(model=, contents=)``); the
    default constructor path needs the ``google-genai`` package, absent in
    this sandbox, and raises ImportError exactly like the reference."""

    def __init__(self, api_key: str, model_name: str = "text-embedding-004",
                 client=None):
        super().__init__(model_name)
        self.embedding_dim = 768
        if client is None:  # pragma: no cover - package absent in sandbox
            try:
                from google import genai
            except ImportError as e:
                raise ImportError(
                    "'google-genai' package is required for Gemini"
                ) from e
            client = genai.Client(api_key=api_key)
        self.client = client

    def encode(self, texts: list[str]) -> list[list[float] | None]:
        try:
            result = self.client.models.embed_content(
                model=f"models/{self.model_name}", contents=texts
            )
            return [e.values for e in result.embeddings]
        except Exception:
            return [[] for _ in texts]

    def get_embedding_dim(self) -> int:
        return self.embedding_dim

    def get_provider_name(self) -> str:
        return "gemini"


class NoEmbeddingProvider(EmbeddingProvider):
    """Disabled tier (ref ``embeddings.py:199-217``)."""

    def __init__(self):
        super().__init__("none")
        self.embedding_dim = 0

    def encode(self, texts: list[str]) -> list[list[float] | None]:
        return [[] for _ in texts]

    def get_embedding_dim(self) -> int:
        return 0

    def get_provider_name(self) -> str:
        return "none"


def create_embedding_provider(provider_name: str | None = None,
                              **kwargs) -> EmbeddingProvider:
    """Factory (ref ``embeddings.py:220-268``); unknown/unavailable
    providers degrade to the no-op provider rather than fail the crawl."""
    name = (provider_name or "fake").lower().strip()
    if name == "fake":
        return FakeHashEmbeddingProvider(**kwargs)
    if name == "gemini":
        # no api_key → disabled, init failure → disabled (ref :238-249)
        if not kwargs.get("api_key"):
            return NoEmbeddingProvider()
        try:
            return GeminiEmbeddingProvider(**kwargs)
        except Exception:
            return NoEmbeddingProvider()
    if name == "huggingface":
        try:
            return RemoteAPIEmbeddingProvider(
                kwargs.pop("model_name", "e5-small"),
                kwargs.pop("api_url", "http://localhost:8081/embed"),
                **kwargs)
        except Exception:
            return NoEmbeddingProvider()
    return NoEmbeddingProvider()


class _LRU:
    """Minimal LRU (cachetools isn't in the container; ref uses
    ``LRUCache(maxsize=2048)``, embeddings.py:96)."""

    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, k):
        v = self._d.get(k)
        if v is not None:
            self._d.move_to_end(k)
            self.hits += 1
        else:
            self.misses += 1
        return v

    def put(self, k, v):
        self._d[k] = v
        self._d.move_to_end(k)
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)


class EmbedStage:
    """Actor-pool map_batches stage: text column → fixed-size-list<float>
    embedding column.

    Pass the CLASS to ``ds.map_batches(EmbedStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` — the provider (model/client) is built
    once per actor here in ``__init__``; ``__call__`` only encodes. The LRU
    sits in front of the provider exactly like the reference's request path
    (``embeddings.py:144-159``: cache probe → batched encode of misses →
    cache fill)."""

    def __init__(self, provider: str = "fake", dim: int = 8,
                 text_col: str = "text", out_col: str = "embedding",
                 cache_size: int = 2048, encode_batch: int = 16,
                 provider_kwargs: dict | None = None):
        kw = dict(provider_kwargs or {})
        if provider == "fake":
            kw.setdefault("dim", dim)
        self.provider = create_embedding_provider(provider, **kw)
        self.dim = self.provider.get_embedding_dim() or dim
        self.text_col = text_col
        self.out_col = out_col
        self.encode_batch = encode_batch
        self.cache = _LRU(cache_size)

    def _encode_cached(self, texts: list[str]) -> list[list[float] | None]:
        results: list[list[float] | None] = [None] * len(texts)
        miss_idx: dict[str, list[int]] = {}
        for i, t in enumerate(texts):
            v = self.cache.get(t)
            if v is not None:
                results[i] = v
            else:
                miss_idx.setdefault(t, []).append(i)
        miss_texts = list(miss_idx)  # unique, insertion-ordered
        for lo in range(0, len(miss_texts), self.encode_batch):
            chunk = miss_texts[lo: lo + self.encode_batch]
            vecs = self.provider.encode(chunk)
            for t, v in zip(chunk, vecs):
                for idx in miss_idx[t]:
                    results[idx] = v
                if v is not None:
                    self.cache.put(t, v)
        return results

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        vecs = self._encode_cached(texts)
        flat = np.zeros(len(texts) * self.dim, dtype=np.float32)
        valid = np.zeros(len(texts), dtype=bool)
        for i, v in enumerate(vecs):
            if v is not None and len(v) == self.dim:
                flat[i * self.dim: (i + 1) * self.dim] = v
                valid[i] = True
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.dim)
        return batch.append_column(
            self.out_col, arr
        ).append_column("embed_ok", pa.array(valid))


def embed_dataset(ds, provider: str = "fake", dim: int = 8,
                  text_col: str = "text", out_col: str = "embedding",
                  concurrency: tuple[int, int] | int = (1, 8),
                  batch_size: int = 256, **stage_kwargs):
    """documents → documents + embedding (fixed_size_list<float32>[dim]).

    Actor-pool stage: provider/model state loads once per actor, batches
    stream through with backpressure — the Ray-native replacement for the
    reference's TEI monitor + inline awaits (``crawler.py`` embed path)."""
    return ds.map_batches(
        EmbedStage,
        fn_constructor_kwargs=dict(provider=provider, dim=dim,
                                   text_col=text_col, out_col=out_col,
                                   **stage_kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class RefreshEmbedStage(EmbedStage):
    """Selective-encode stage for incremental refresh: a row whose joined
    ``prev_hash`` equals the md5 of its CURRENT text reuses the previous
    epoch's vector — the provider never sees it; modified/new rows (hash
    mismatch or no previous row) encode through the actor's provider+LRU.
    One actor pool, one pass; batches mix reused and fresh rows freely."""

    def __init__(self, id_col: str = "doc_id", **kw):
        super().__init__(**kw)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        prev_h = batch["prev_hash"].to_pylist()
        pcol = batch["prev_emb"]
        pcol = (pcol.combine_chunks()
                if isinstance(pcol, pa.ChunkedArray) else pcol)
        reuse = [ph is not None
                 and ph == hashlib.md5(t.encode()).hexdigest()
                 and pcol[i].is_valid
                 for i, (t, ph) in enumerate(zip(texts, prev_h))]
        miss = [i for i, r in enumerate(reuse) if not r]
        vecs = self._encode_cached([texts[i] for i in miss]) if miss else []
        flat = np.zeros(len(texts) * self.dim, dtype=np.float32)
        ok = np.zeros(len(texts), dtype=bool)
        for i, r in enumerate(reuse):
            if r:
                flat[i * self.dim: (i + 1) * self.dim] = np.frombuffer(
                    pcol[i].as_py(), dtype=np.float32)
                ok[i] = True
        for j, i in enumerate(miss):
            v = vecs[j]
            if v is not None and len(v) == self.dim:
                flat[i * self.dim: (i + 1) * self.dim] = v
                ok[i] = True
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.dim)
        return pa.table({
            self.id_col: batch[self.id_col],
            "refreshed": pa.array(
                [0 if r else 1 for r in reuse], pa.int64()),
            self.out_col: arr,
            "embed_ok": pa.array(ok),
        })


def embed_refresh(current_ds, prev_ds, *, provider: str = "fake",
                  dim: int = 8, id_col: str = "doc_id",
                  text_col: str = "text",
                  concurrency: tuple[int, int] | int = (1, 8),
                  batch_size: int = 256, n_parts: int | None = None,
                  **stage_kwargs):
    """Incremental embedding refresh for a recrawl epoch: documents whose
    text is UNCHANGED vs the previous epoch reuse their stored vector
    (the encoder is bypassed entirely); only modified/new documents
    encode. At 100 TB a recrawl typically touches a few percent of the
    corpus — this is the difference between re-embedding everything and
    embedding the diff (the pattern behind the reference's
    should_skip_page: unchanged docs are never re-indexed, so their
    ``_vectors`` persist — crawler.py:399-401, 682-758).

    ``prev_ds``: (id_col, text_hash md5-hex of the previous text,
    embedding list<float>/fixed-size-list<float32>). Previous vectors
    cross ONE partitioned hash join packed as fixed_size_binary (Acero
    rejects list payloads — the ``queryside.join_embeddings`` discipline);
    the fused RefreshEmbedStage actor pool then encodes only hash-miss
    rows, so no second pass, no stream split, no materialization.
    Returns (id, refreshed 0/1, embedding, embed_ok)."""
    from .ops.grouping import resolve_parts

    from .ops.grouping import drop_empty_blocks

    def pack_prev(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # reshape(0, -1) is undefined: emit typed empty
            return pa.table({id_col: pa.array([], pa.int64()),
                             "prev_hash": pa.array([], pa.string()),
                             "prev_emb": pa.array([], pa.binary(dim * 4))})
        arr = b["embedding"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        mat = np.ascontiguousarray(
            np.asarray(arr.flatten(), dtype=np.float32)
        ).reshape(len(b), -1)
        bin_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mat.shape[1] * 4), len(mat),
            [None, pa.py_buffer(mat.tobytes())])
        return pa.table({id_col: b[id_col].cast(pa.int64()),
                         "prev_hash": b["text_hash"],
                         "prev_emb": bin_arr})

    # empty prev blocks (a filtered batch, an empty Parquet fragment)
    # skip map_batches UDFs and reach the join with a stale schema that
    # Acero rejects — strip them; a fully-empty previous epoch (first
    # refresh ever) short-circuits to the everything-encodes path
    packed = drop_empty_blocks(
        prev_ds.map_batches(pack_prev, batch_format="pyarrow"),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("prev_hash", pa.string()),
                                ("prev_emb", pa.binary(dim * 4))]))
    if packed.count() == 0:
        def null_prev(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return (b.append_column("prev_hash",
                                    pa.array([None] * n, pa.string()))
                     .append_column("prev_emb",
                                    pa.array([None] * n, pa.binary(dim * 4))))

        joined = current_ds.map_batches(null_prev, batch_format="pyarrow")
    else:
        joined = current_ds.join(packed, join_type="left_outer",
                                 num_partitions=resolve_parts(n_parts),
                                 on=(id_col,))
    return joined.map_batches(
        RefreshEmbedStage,
        fn_constructor_kwargs=dict(provider=provider, dim=dim,
                                   id_col=id_col, text_col=text_col,
                                   **stage_kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def embedding_components_ppm(emb_ds, dim: int, id_col: str = "doc_id",
                             emb_col: str = "embedding"):
    """Exploded exact-checkable form of an ``embed_dataset`` output: one row
    per (id, dim_idx) with ``floor(float64(float32_component) * 1e6)`` as
    int64. With the fake md5 provider the DuckDB oracle reproduces this
    bit-exactly — both sides round h/2^32 to the nearest float32
    (``::REAL``), widen to float64, multiply by 1e6 and floor, so the
    oracle gates the REAL actor-pool embed stage end-to-end, not a
    recomputation. Used by the ``crawl_embeddings`` driver query."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch[id_col], dtype=np.int64)
        v = np.asarray(batch[emb_col].combine_chunks().flatten(),
                       dtype=np.float32).reshape(n, dim)
        comp = np.floor(v.astype(np.float64) * 1_000_000.0).astype(np.int64)
        return pa.table(
            {id_col: pa.array(np.repeat(ids, dim), pa.int64()),
             "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64), n),
                                 pa.int64()),
             "comp_ppm": pa.array(comp.reshape(-1), pa.int64())}
        )

    return emb_ds.map_batches(explode, batch_format="pyarrow")


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
