"""Multimodal (image/audio/video) column plumbing.

The reference declares but never populates a figures table
(RAW.FIGURES, sql/01_create_schema.sql:34-40) — multimodal is an
acknowledged gap. Here the engine treats media as opaque ``binary``
payload columns with typed metadata (north-star extras): the Spark-side
plumbing — schema, deterministic payload synthesis, Arrow-batched
``mapInPandas`` decode, frame sampling — is real and tested; only the
actual image/audio codec call is stubbed (the container has no media
libraries), behind an import-try with a deterministic byte-level fake.

Scale design: payloads stay in executors end to end (never collected);
decode/feature-extraction is ``mapInPandas`` over Arrow batches — one
Python worker per core, vectorized numpy per batch, no per-row pickling.
At 100 TB the payload column lives in parquet with the metadata columns,
so pruning a metadata predicate skips entire row groups of bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

FEATURE_DIM = 16
FRAME_BYTES = 32  # "video" frame = 32-byte window of the payload
FRAME_SAMPLE_EVERY = 4

# Real decoder hook: resolved once per Python worker. The container has no
# media libraries, so this stays None and the deterministic byte-level
# fake below is used; with PIL installed, _decode_real takes over.
try:  # pragma: no cover - media libs absent in this environment
    from PIL import Image as _PIL_IMAGE  # type: ignore
except Exception:  # noqa: BLE001
    _PIL_IMAGE = None


def assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assets table: documents re-materialized as binary media
    payloads with typed metadata (RAW.FIGURES analogue, populated).

    Payload = sha256(text) hex repeated 4× and unhexed ⇒ 128 deterministic
    bytes per asset; format/width/height derive from doc_id. All pure
    Catalyst — the fixture plays the role of a real media scan."""
    docs = load_table(spark, sf_dir, "documents")
    payload_hex = F.repeat(F.sha2("text", 256), 4)
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("mp4")
    )
    return docs.select(
        "doc_id",
        fmt.alias("format"),
        (F.lit(64) + (F.col("doc_id") % 8) * 32).cast("int").alias("width"),
        (F.lit(64) + (F.col("doc_id") % 5) * 32).cast("int").alias("height"),
        F.unhex(payload_hex).alias("payload"),
    ).withColumn("n_bytes", F.length("payload").cast("int"))


@query(
    "multimodal_metadata",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'png'
                  WHEN doc_id % 3 = 1 THEN 'jpeg'
                  ELSE 'mp4' END AS format,
             CAST(64 + (doc_id % 8) * 32 AS INTEGER) AS width,
             CAST(64 + (doc_id % 5) * 32 AS INTEGER) AS height,
             unhex(repeat(sha256(text), 4)) AS payload
      FROM documents
    )
    SELECT doc_id, format, width, height,
           CAST(octet_length(payload) AS INTEGER) AS n_bytes,
           sha256(lower(hex(payload))) AS payload_sha
    FROM a
    ORDER BY doc_id
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: the query surface a media
    corpus needs before any decode (format/shape filters, byte sizes,
    content addressing). payload_sha (sha256 over the
    lowercase hex of the bytes — DuckDB sha256 is VARCHAR-only) proves the
    binary payloads are identical cross-engine without raw bytes in the
    comparison."""
    return (
        assets(spark, sf_dir)
        .select(
            "doc_id",
            "format",
            "width",
            "height",
            "n_bytes",
            F.sha2(F.lower(F.hex("payload")), 256).alias("payload_sha"),
        )
        .orderBy("doc_id")
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for image/audio decode + feature extraction:
    a normalized 16-bin byte histogram. Same contract as a real extractor
    (fixed-dim float vector per asset). Reference implementation for the
    vectorized batch path (pinned equal in tests/test_multimodal.py)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype("float64")
    total = hist.sum()
    return list(hist / total if total else hist)


def _fake_decode_batch(payloads: "pd.Series") -> "pd.DataFrame":
    """Vectorized fake decode over a whole Arrow batch: one concatenated
    uint8 buffer, one reshape (payloads are fixed-size), 16 vectorized
    bin counts — no per-row Python. Falls back to per-row bincount only
    for ragged batches (never hit with the current asset synthesis)."""
    import numpy as np

    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    if n > 0 and lens.min() == lens.max() and lens[0] > 0:
        mat = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(n, lens[0])
        nib = mat % FEATURE_DIM
        hist = np.stack([(nib == k).sum(axis=1) for k in range(FEATURE_DIM)], axis=1)
        feats = hist / lens[:, None].astype("float64")
    elif n == 0:
        feats = np.zeros((0, FEATURE_DIM))
    else:  # pragma: no cover - ragged payloads
        feats = np.stack([np.array(_fake_decode_features(p)) for p in payloads])
    return pd.DataFrame(
        {f"f{k}": feats[:, k] for k in range(FEATURE_DIM)},
        index=payloads.index,
    )


def _decode_real(payload: bytes, image_module=None) -> list[float]:
    """Real decode path (PIL-if-present): decode the bytes, grayscale,
    resize to 16x16, and emit the same FEATURE_DIM-bin normalized pixel
    histogram contract as the fake — so warehouse schemas and downstream
    consumers are identical whichever branch ran. ``image_module`` is
    injectable for tests (the container ships no PIL)."""
    import io

    import numpy as np

    image = image_module if image_module is not None else _PIL_IMAGE
    if image is None:
        raise NotImplementedError("media libraries not available")
    img = image.open(io.BytesIO(payload)).convert("L").resize((16, 16))
    arr = np.asarray(img, dtype=np.uint8).ravel()
    hist = np.bincount(arr // (256 // FEATURE_DIM), minlength=FEATURE_DIM).astype(
        "float64"
    )
    total = hist.sum()
    return list(hist / total if total else hist)


# DuckDB twin of the fake decode: payload byte k mod 16 is the *low hex
# nibble* of byte k, i.e. hex char 2k+2 (1-indexed) of the 256-char hex
# string — so the byte histogram is pure SQL over substr() nibbles.
_DUCK_FEATURE_COLS = ",\n           ".join(
    f"CAST(SUM(CASE WHEN v = {k} THEN 1 ELSE 0 END) AS DOUBLE) / 128.0 AS f{k}"
    for k in range(FEATURE_DIM)
)


@query(
    "multimodal_decode_features",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'png'
                  WHEN doc_id % 3 = 1 THEN 'jpeg'
                  ELSE 'mp4' END AS format,
             repeat(sha256(text), 4) AS hx
      FROM documents
    ),
    nib AS (
      SELECT doc_id, CAST(concat('0x', substr(hx, 2 * i.i, 1)) AS INTEGER) AS v
      FROM a, (SELECT unnest(range(1, 129)) AS i) i
    )
    SELECT a.doc_id, a.format, CAST(128 AS INTEGER) AS n_bytes,
           {_DUCK_FEATURE_COLS}
    FROM nib JOIN a USING (doc_id)
    GROUP BY a.doc_id, a.format
    ORDER BY a.doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``: the
    executor-side pattern for media (M2's batch-inference shape,
    data/ingestion.py:238-277, applied to bytes). Emits one scalar column
    per feature dimension (f0..f15) — hash-checkable by the driver and
    value-identical to the DuckDB nibble-histogram oracle (count/128 is a
    power-of-two division, exact in IEEE double on both engines)."""
    a = assets(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = (
                _fake_decode_batch(pdf["payload"])
                if _PIL_IMAGE is None
                else pd.DataFrame(
                    [_decode_real(p) for p in pdf["payload"]],
                    columns=[f"f{k}" for k in range(FEATURE_DIM)],
                    index=pdf.index,
                )
            )
            out = pdf[["doc_id", "format", "n_bytes"]].copy()
            yield pd.concat([out, feats], axis=1)

    schema = "doc_id long, format string, n_bytes int, " + ", ".join(
        f"f{k} double" for k in range(FEATURE_DIM)
    )
    return a.mapInPandas(decode, schema).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, repeat(sha256(text), 4) AS payload_hex
      FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT doc_id, f.f AS frame_idx,
             substring(payload_hex, f.f * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}) AS frame_hex
      FROM a, (SELECT unnest(range(0, {128 // FRAME_BYTES})) AS f) f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           sha256(frame_hex) AS frame_sha
    FROM frames
    WHERE frame_idx % {FRAME_SAMPLE_EVERY} = 0
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for "video" assets (format mp4): slice the payload
    into fixed-size frames, keep every {FRAME_SAMPLE_EVERY}th — the byte-level
    shape of video frame extraction, content-addressed per frame (frames
    sliced on the hex form — DuckDB 1.0 has no BLOB substring). Narrow
    explode, no shuffle; at scale the frame explosion is where
    ``spark.sql.files.maxPartitionBytes`` keeps partitions bounded."""
    vids = assets(spark, sf_dir).filter(F.col("format") == "mp4")
    n_frames = 128 // FRAME_BYTES
    hx = 2 * FRAME_BYTES  # one frame = 2*FRAME_BYTES hex chars
    frames = vids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
        F.lower(F.hex("payload")).alias("payload_hex"),
    ).select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(payload_hex, frame_idx * {hx} + 1, {hx})").alias("frame_hex"),
    )
    return (
        frames.filter(F.col("frame_idx") % FRAME_SAMPLE_EVERY == 0)
        .select("doc_id", "frame_idx", F.sha2("frame_hex", 256).alias("frame_sha"))
        .orderBy("doc_id", "frame_idx")
    )
