"""Embedding generation tier (T6): provider semantics, per-actor LRU,
actor-pool state discipline, and the fake↔oracle determinism contract
(ref meilisearchcrawler/embeddings.py:12-268)."""

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycrawl.embeddings import (  # noqa: E402
    EmbedStage,
    FakeHashEmbeddingProvider,
    NoEmbeddingProvider,
    RemoteAPIEmbeddingProvider,
    create_embedding_provider,
    embed_dataset,
)


def test_fake_provider_deterministic_and_dim():
    p = create_embedding_provider("fake", dim=8)
    v1 = p.encode(["hello world"])[0]
    v2 = p.encode(["hello world"])[0]
    assert v1 == v2 and len(v1) == 8 == p.get_embedding_dim()
    h = int(hashlib.md5(b"hello world:0").hexdigest()[:8], 16)
    assert v1[0] == h / 2.0**32


def test_factory_fallbacks():
    assert isinstance(create_embedding_provider("none"), NoEmbeddingProvider)
    assert isinstance(create_embedding_provider("nonsense"),
                      NoEmbeddingProvider)
    # gemini without an api_key → disabled (ref embeddings.py:238-241);
    # with a key but no google-genai package → init failure → disabled
    assert isinstance(create_embedding_provider("gemini"),
                      NoEmbeddingProvider)
    assert isinstance(create_embedding_provider("gemini", api_key="k"),
                      NoEmbeddingProvider)


def test_gemini_provider_with_injected_client():
    """Gemini branch parity (ref embeddings.py:39-75): 768-dim, per-batch
    embed_content, errors degrade to empty-list rows (not None)."""
    from types import SimpleNamespace

    from raycrawl.embeddings import GeminiEmbeddingProvider

    class FakeModels:
        def __init__(self):
            self.calls = []

        def embed_content(self, model, contents):
            self.calls.append((model, list(contents)))
            if contents and contents[0] == "boom":
                raise RuntimeError("api error")
            return SimpleNamespace(embeddings=[
                SimpleNamespace(values=[float(len(t))] * 4) for t in contents
            ])

    fm = FakeModels()
    p = create_embedding_provider(
        "gemini", api_key="k", client=SimpleNamespace(models=fm))
    assert isinstance(p, GeminiEmbeddingProvider)
    assert p.get_provider_name() == "gemini"
    assert p.get_embedding_dim() == 768
    out = p.encode(["ab", "abcd"])
    assert out == [[2.0] * 4, [4.0] * 4]
    assert fm.calls[0][0] == "models/text-embedding-004"
    assert p.encode(["boom"]) == [[]]  # error → empty rows, crawl continues


def test_lru_dedups_provider_calls():
    """Repeated texts must hit the per-actor cache, not the provider
    (ref embeddings.py:144-159: cache probe → encode misses → fill)."""
    stage = EmbedStage(provider="fake", dim=4, cache_size=64, encode_batch=16)
    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["a", "b", "a"])})
    out1 = stage(batch)
    assert stage.provider.texts_encoded == 2  # "a" deduped within the batch
    # second pass: everything cached
    stage(batch)
    assert stage.provider.texts_encoded == 2
    assert stage.cache.hits >= 3
    emb = out1["embedding"]
    assert emb.type == pa.list_(pa.float32(), 4)
    a0 = emb[0].as_py()
    a2 = emb[2].as_py()
    assert a0 == a2  # identical text → identical vector


def test_encode_batching_respects_batch_size():
    stage = EmbedStage(provider="fake", dim=2, encode_batch=3)
    texts = [f"t{i}" for i in range(10)]
    stage(pa.table({"text": pa.array(texts)}))
    # 10 unique misses in chunks of 3 → 4 provider calls
    assert stage.provider.calls == 4
    assert stage.provider.texts_encoded == 10


def test_remote_provider_failure_and_dim_check():
    calls = []

    def post_ok(url, json, timeout):
        calls.append(json["inputs"])
        assert json["normalize"] is True and json["truncate"] is True
        return [[1.0, 0.0] for _ in json["inputs"]]

    p = RemoteAPIEmbeddingProvider("m", "http://x/embed", post_fn=post_ok)
    out = p.encode(["a", "b"])
    assert out == [[1.0, 0.0], [1.0, 0.0]]
    assert p.get_embedding_dim() == 2  # auto-detected (ref :123-132)

    def post_mixed(url, json, timeout):
        return [[1.0, 0.0], [1.0]]  # second row has wrong dim

    p2 = RemoteAPIEmbeddingProvider("m", "http://x/embed", post_fn=post_mixed,
                                    expected_dim=2)
    out = p2.encode(["a", "b"])
    assert out[0] == [1.0, 0.0] and out[1] is None

    def post_boom(url, json, timeout):
        raise ConnectionError("down")

    p3 = RemoteAPIEmbeddingProvider("m", "http://x/embed", post_fn=post_boom)
    assert p3.encode(["a", "b"]) == [None, None]


def test_embed_stage_marks_failed_rows():
    class FlakyProvider(FakeHashEmbeddingProvider):
        def encode(self, texts):
            out = super().encode(texts)
            return [None if t == "bad" else v for t, v in zip(texts, out)]

    stage = EmbedStage(provider="fake", dim=4)
    stage.provider = FlakyProvider(4)
    out = stage(pa.table({"text": pa.array(["ok", "bad"])}))
    assert out["embed_ok"].to_pylist() == [True, False]
    assert out["embedding"][1].as_py() == [0.0, 0.0, 0.0, 0.0]


def test_embed_dataset_actor_pool(ray_session, tmp_path):
    """embed_dataset runs EmbedStage as an actor pool: provider constructed
    once per actor (not per batch), vectors deterministic across actors."""
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array(list(range(64)), pa.int64()),
                    "text": pa.array([f"doc text {i % 8}" for i in range(64)])})
    out = embed_dataset(rd.from_arrow(tbl).repartition(8), provider="fake",
                        dim=8, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 64 and out["embed_ok"].all()
    # determinism across actors/batches: same text → same vector
    by_text = {}
    for t, v in zip(out["text"], out["embedding"]):
        key = tuple(np.asarray(v).tolist())
        assert by_text.setdefault(t, key) == key
    # exactness vs the md5 definition
    h = int(hashlib.md5(b"doc text 3:0").hexdigest()[:8], 16)
    row = out[out["text"] == "doc text 3"].iloc[0]
    assert row["embedding"][0] == np.float32(h / 2.0**32)


def test_refresh_stage_bypasses_encoder_for_unchanged(ray_session):
    """RefreshEmbedStage: rows whose prev_hash matches the current text
    reuse the joined vector VERBATIM (poisoned previous vectors survive,
    and the provider never encodes them); hash-miss and no-previous rows
    encode fresh. Checked by direct __call__ (no actor indirection)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from raycrawl.embeddings import RefreshEmbedStage

    stage = RefreshEmbedStage(provider="fake", dim=4)
    texts = ["alpha beta", "gamma delta", "epsilon"]
    poisoned = np.arange(4, dtype=np.float32) + 0.5
    prev_hash = [hashlib.md5(texts[0].encode()).hexdigest(),  # unchanged
                 hashlib.md5(b"old text").hexdigest(),        # modified
                 None]                                        # new
    prev_emb = [poisoned.tobytes(), np.zeros(4, np.float32).tobytes(), None]
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts),
        "prev_hash": pa.array(prev_hash, pa.string()),
        "prev_emb": pa.array(prev_emb, pa.binary(16)),
    })
    out = stage(batch)
    assert out["refreshed"].to_pylist() == [0, 1, 1]
    assert out["embed_ok"].to_pylist() == [True, True, True]
    vecs = np.asarray(out["embedding"].combine_chunks().flatten(),
                      dtype=np.float32).reshape(3, 4)
    # the poisoned previous vector passed through bit-identically — it was
    # never recomputed (the fake provider could not produce 0.5, 1.5, ...)
    assert (vecs[0] == poisoned).all()
    # the provider encoded ONLY the two refresh rows
    assert stage.provider.texts_encoded == 2
    # modified/new rows carry fresh fake-provider vectors of CURRENT text
    fresh = stage.provider.encode([texts[1], texts[2]])
    assert np.allclose(vecs[1], np.array(fresh[0], np.float32))
    assert np.allclose(vecs[2], np.array(fresh[1], np.float32))


def test_embed_refresh_end_to_end_counts(ray_session):
    """embed_refresh over a 60-doc corpus with a planted previous epoch:
    refreshed flags follow the plant (new %7, modified %3), every row
    gets a vector, partition counts don't change the result."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.embeddings import (FakeHashEmbeddingProvider,
                                     embed_refresh)

    comp = FakeHashEmbeddingProvider.component_int
    ids = list(range(60))
    texts = [f"document number {i} body" for i in ids]
    cur = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    pi, ph, pv = [], [], []
    for i, t in zip(ids, texts):
        if i % 7 == 0:
            continue
        pt = t + " (v1)" if i % 3 == 0 else t
        pi.append(i)
        ph.append(hashlib.md5(pt.encode()).hexdigest())
        pv.append([np.float32((comp(pt, k) + 7) / 2.0**32)
                   for k in range(4)])
    prev = pa.table({"doc_id": pa.array(pi, pa.int64()),
                     "text_hash": pa.array(ph, pa.string()),
                     "embedding": pa.array(pv, pa.list_(pa.float32()))})
    out = embed_refresh(rd.from_arrow(cur).repartition(4),
                        rd.from_arrow(prev).repartition(3),
                        provider="fake", dim=4,
                        concurrency=(1, 2)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    want_ref = [1 if (i % 7 == 0 or i % 3 == 0) else 0 for i in ids]
    assert out["refreshed"].tolist() == want_ref
    assert out["embed_ok"].all()


def test_embed_refresh_empty_previous_epoch(ray_session):
    """Review regression: a fully-empty previous epoch (first refresh
    ever) and empty prev blocks must not crash the join — everything
    encodes fresh."""
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.embeddings import embed_refresh

    cur = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["alpha", "beta"])})
    prev = pa.table({"doc_id": pa.array([], pa.int64()),
                     "text_hash": pa.array([], pa.string()),
                     "embedding": pa.array([], pa.list_(pa.float32()))})
    out = embed_refresh(rd.from_arrow(cur), rd.from_arrow(prev),
                        provider="fake", dim=4,
                        concurrency=1).to_pandas()
    assert out["refreshed"].tolist() == [1, 1]
    assert out["embed_ok"].all()
