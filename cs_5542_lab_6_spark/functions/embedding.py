"""Deterministic hash-projection embedder (M2/M3 substitute).

The reference embeds chunks with a SentenceTransformer in batches of 64
(data/ingestion.py:238-277) and the query with the same model driver-side
(tools.py:63-64). The engine keeps both shapes with a deterministic
substitute that has the identical contract — fixed dim, L2-normalized,
text-sensitive (SURVEY §4.3-2):

- ``embed_text_udf`` — Arrow-batched ``pandas_udf``: token hashes via
  sha256 (executor-local, no model download), then one vectorized numpy
  projection ``((h·Aᵢ + Bᵢ) mod P)/P − ½`` summed over tokens. This is
  the real M2 execution shape: per-executor batch inference, columnar
  transfer, no per-row Python. A real sentence-transformer drops into
  ``_embed_one``'s slot with a lazy executor-local model global.
- ``embed_query`` — the driver-side replica (M3): byte-for-byte the same
  arithmetic in plain Python, so a query vector literal matches what the
  executors produce for identical text.

An earlier pure-Catalyst version (aggregate/transform lambdas) was
correct but interpreted per (token × dim) — higher-order functions do not
enter whole-stage codegen, and at sf0.1 the flagship query timed out.
The vectorized UDF embeds the same corpus in seconds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64  # matches the fixture embedding dimensionality
_P = 2_147_483_647

# Fixed projection parameters (independent of corpus — the "model").
_A = np.array([(104729 * (i + 1)) % _P for i in range(EMBED_DIM)], dtype=np.int64)
_B = np.array([(15485863 * (i + 1)) % _P for i in range(EMBED_DIM)], dtype=np.int64)


def _token_h(tok: str) -> int:
    """60-bit sha256-derived token hash (same scheme as text.token_hash60)."""
    return int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big") >> 4


def _embed_one(text: str, cache: dict[str, int]) -> np.ndarray:
    toks = text.lower().split()
    if not toks:
        return np.zeros(EMBED_DIM)
    hs = np.fromiter(
        (cache.get(t) or cache.setdefault(t, _token_h(t)) for t in toks),
        dtype=np.int64,
        count=len(toks),
    )
    # int64 wrap-around in h*A is deterministic (two's complement); the
    # modulus folds it back to [0, P).
    m = (hs[:, None] * _A[None, :] + _B[None, :]) % _P
    v = (m / _P - 0.5).sum(axis=0)
    n = float(np.sqrt((v * v).sum()))
    return v / n if n > 0 else v


# explicit DataType (a DDL string would need an active SparkSession at
# import time)
@pandas_udf(T.ArrayType(T.DoubleType()))
def embed_text_udf(texts: pd.Series) -> pd.Series:
    """Batch embedding (M2): one vectorized projection per Arrow batch.
    A per-batch token-hash cache plays the role of the executor-local
    model singleton (M6, tools.py:32-38)."""
    cache: dict[str, int] = {}
    return texts.map(lambda t: list(_embed_one(t or "", cache)))


def embed_text(col: Column | str) -> Column:
    """Embedding column with the M2 contract: {EMBED_DIM}-dim, L2-normalized,
    deterministic. Cast to float to match the fixture embedding type."""
    c = F.col(col) if isinstance(col, str) else col
    return embed_text_udf(c).cast("array<float>")


def embed_query(text: str) -> list[float]:
    """Driver-side query embedding (M3, tools.py:63-64): identical
    arithmetic to the executor UDF, returned as a plain list for use as a
    broadcast literal."""
    return [float(x) for x in _embed_one(text, {})]
