"""Multimodal plumbing invariants: payload determinism, decode-UDF batch
shape, feature contract (fixed dim, normalized histogram)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.multimodal import (
    FEATURE_DIM,
    assets,
    multimodal_decode_features,
)


def test_assets_payload_deterministic(spark, sf_dir):
    a1 = assets(spark, sf_dir).select("doc_id", F.sha2("payload", 256).alias("h"))
    a2 = assets(spark, sf_dir).select("doc_id", F.sha2("payload", 256).alias("h"))
    assert a1.exceptAll(a2).count() == 0
    sizes = assets(spark, sf_dir).select(F.min("n_bytes"), F.max("n_bytes")).first()
    assert sizes[0] == sizes[1] == 128


def test_decode_features_contract(spark, sf_dir):
    feats = multimodal_decode_features(spark, sf_dir)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert math.isclose(sum(r["feature"]), 1.0, rel_tol=1e-9)
        assert all(v >= 0 for v in r["feature"])
    # deterministic across runs
    a = {(r["doc_id"], tuple(r["feature"])) for r in feats.collect()}
    b = {(r["doc_id"], tuple(r["feature"])) for r in multimodal_decode_features(spark, sf_dir).collect()}
    assert a == b
