"""Multimodal plumbing invariants: payload determinism, decode-UDF batch
shape, feature contract (fixed dim, normalized histogram)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import pandas as pd

from cs_5542_lab_6_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode_batch,
    _fake_decode_features,
    assets,
    multimodal_decode_features,
)

FCOLS = [f"f{k}" for k in range(FEATURE_DIM)]


def _vec(row):
    return [row[c] for c in FCOLS]


def test_assets_payload_deterministic(spark, sf_dir):
    a1 = assets(spark, sf_dir).select("doc_id", F.sha2("payload", 256).alias("h"))
    a2 = assets(spark, sf_dir).select("doc_id", F.sha2("payload", 256).alias("h"))
    assert a1.exceptAll(a2).count() == 0
    sizes = assets(spark, sf_dir).select(F.min("n_bytes"), F.max("n_bytes")).first()
    assert sizes[0] == sizes[1] == 128


def test_fake_decode_pinned_expected_value():
    # bytes 0..127: every nibble value 0..15 occurs exactly 8 times,
    # so each histogram bin is exactly 8/128 = 0.0625.
    payload = bytes(range(128))
    assert _fake_decode_features(payload) == [0.0625] * FEATURE_DIM
    # all-zero bytes: everything lands in bin 0
    assert _fake_decode_features(bytes(64)) == [1.0] + [0.0] * (FEATURE_DIM - 1)


def test_fake_decode_batch_matches_reference():
    payloads = pd.Series([bytes(range(128)), bytes(64) * 2, b"\xff" * 128])
    batch = _fake_decode_batch(payloads)
    for i, p in enumerate(payloads):
        assert list(batch.iloc[i]) == _fake_decode_features(p)


def test_fake_decode_batch_empty():
    out = _fake_decode_batch(pd.Series([], dtype=object))
    assert len(out) == 0
    assert list(out.columns) == FCOLS


def test_decode_features_contract(spark, sf_dir):
    feats = multimodal_decode_features(spark, sf_dir)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        v = _vec(r)
        assert len(v) == FEATURE_DIM
        assert math.isclose(sum(v), 1.0, rel_tol=1e-9)
        assert all(x >= 0 for x in v)
    # batch path == per-payload reference implementation, row by row
    by_id = {r["doc_id"]: _vec(r) for r in feats.collect()}
    for row in assets(spark, sf_dir).limit(5).collect():
        assert by_id[row["doc_id"]] == _fake_decode_features(bytes(row["payload"]))
    # deterministic across runs
    again = {
        r["doc_id"]: _vec(r)
        for r in multimodal_decode_features(spark, sf_dir).collect()
    }
    assert by_id == again


def test_decode_real_via_injected_image_module():
    """The real-decode seam (PIL-if-present): with an image module
    injected, _decode_real decodes -> grayscale -> 16x16 resize ->
    normalized FEATURE_DIM-bin histogram, honoring the same output
    contract as the fake (fixed dim, non-negative, sums to 1)."""
    import numpy as np

    from cs_5542_lab_6_spark.operators import multimodal

    seen: dict = {}

    class FakeImg:
        def convert(self, mode):
            seen["mode"] = mode
            return self

        def resize(self, size):
            seen["size"] = size
            return self

        def __array__(self, dtype=None, copy=None):
            arr = (np.arange(256) % 256).reshape(16, 16)
            return arr.astype(dtype or np.uint8)

    class FakeImageModule:
        @staticmethod
        def open(fp):
            seen["n_bytes"] = len(fp.read())
            return FakeImg()

    payload = b"\x89PNG-fake-bytes" * 8
    feats = multimodal._decode_real(payload, image_module=FakeImageModule)
    assert seen == {"n_bytes": len(payload), "mode": "L", "size": (16, 16)}
    assert len(feats) == FEATURE_DIM
    assert math.isclose(sum(feats), 1.0, rel_tol=1e-9)
    # 0..255 ramp -> exactly uniform 16-bin histogram
    assert all(math.isclose(x, 1.0 / FEATURE_DIM, rel_tol=1e-9) for x in feats)


def test_decode_real_raises_without_media_libs():
    from cs_5542_lab_6_spark.operators import multimodal

    if multimodal._PIL_IMAGE is None:
        with pytest.raises(NotImplementedError):
            multimodal._decode_real(b"xx")
