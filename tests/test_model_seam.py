"""Real-model seam tests (M2/M4): the env-gated hooks load a real
encoder/NER into the same UDF slots, the substitutes stay in charge by
default, and the executor-local singleton is resolved lazily. The real
libraries are absent in this container, so the hooks are exercised with
fake modules injected into sys.modules (driver-side function level —
worker processes resolve the same code path from their own env)."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from cs_5542_lab_6_spark.functions import embedding, ner


@pytest.fixture(autouse=True)
def _reset_singletons(monkeypatch):
    monkeypatch.setattr(embedding, "_ENCODER", None)
    monkeypatch.setattr(ner, "_EXTRACTOR", None)
    yield
    embedding._ENCODER = None
    ner._EXTRACTOR = None


def test_default_encoder_is_hash_projection(monkeypatch):
    monkeypatch.delenv(embedding.EMBED_MODEL_ENV, raising=False)
    enc = embedding._get_encoder()
    mat = enc(["spark joins data", ""])
    assert mat.shape == (2, embedding.EMBED_DIM)
    assert abs(np.linalg.norm(mat[0]) - 1.0) < 1e-9  # L2 contract
    assert np.all(mat[1] == 0.0)  # empty text → zero vector


def test_real_encoder_hook_via_fake_module(monkeypatch):
    calls = {}

    class FakeModel:
        def __init__(self, name):
            calls["model"] = name

        def encode(self, texts, batch_size=None, normalize_embeddings=None):
            calls["batch_size"] = batch_size
            calls["normalized"] = normalize_embeddings
            out = np.zeros((len(texts), 768))
            out[:, 0] = 1.0  # unit vectors, fixed dim like the real model
            return out

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)
    monkeypatch.setenv(embedding.EMBED_MODEL_ENV, "fake/all-mpnet-base-v2")

    enc = embedding._get_encoder()
    mat = enc(["a", "b", "c"])
    assert calls["model"] == "fake/all-mpnet-base-v2"
    assert calls["batch_size"] == 64  # reference batches of 64
    assert calls["normalized"] is True  # L2-normalize at embed time (F10)
    assert mat.shape == (3, 768)
    # M3: the query embedder rides the same seam (shared model contract)
    q = embedding.embed_query("any question")
    assert len(q) == 768 and q[0] == 1.0
    # M6: singleton — second resolve returns the same callable
    assert embedding._get_encoder() is enc


def test_default_extractor_is_token_split(monkeypatch):
    monkeypatch.delenv(ner.NER_MODEL_ENV, raising=False)
    assert not ner.ner_active()
    assert ner._get_extractor()("Spark joins  data") == ["Spark", "joins", "data"]
    assert ner._get_extractor()("") == []


def test_real_ner_hook_via_fake_module(monkeypatch):
    class Ent:
        def __init__(self, text):
            self.text = text

    class FakeNlp:
        def __call__(self, text):
            doc = types.SimpleNamespace()
            doc.ents = [Ent(w) for w in text.split() if w.istitle()]
            return doc

    fake = types.ModuleType("spacy")
    fake.load = lambda name: calls.setdefault("model", name) and FakeNlp() or FakeNlp()
    calls: dict = {}
    monkeypatch.setitem(sys.modules, "spacy", fake)
    monkeypatch.setenv(ner.NER_MODEL_ENV, "en_core_sci_sm")

    assert ner.ner_active()
    extract = ner._get_extractor()
    assert calls["model"] == "en_core_sci_sm"
    assert extract("Apache Spark processes data") == ["Apache", "Spark"]
    assert ner._get_extractor() is extract  # M6 singleton
