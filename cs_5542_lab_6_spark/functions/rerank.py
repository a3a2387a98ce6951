"""Cross-encoder rerank seam — stage two of two-stage retrieval.

Production retrieval is retrieve-then-rerank: a cheap first stage (BM25 /
ANN) narrows the corpus to k candidates, then a cross-encoder scores each
(query, document) PAIR jointly — far more accurate than bi-encoder cosine,
and affordable precisely because it only ever sees k rows per query. The
reference stops at single-stage retrieval (tools.py:45-92); this seam
completes the pipeline the same way the embedding/NER seams do
(functions/embedding.py, functions/ner.py):

- default: a deterministic sha-derived pair score (text- and
  query-sensitive, exact in DuckDB — oracle-checkable end to end);
- ``$SPARK_GRAFT_RERANK_MODEL``: a real ``sentence_transformers``
  CrossEncoder dropped into the SAME Arrow-batched pandas-UDF slot —
  executor-local lazy singleton, batch inference, config-keyed
  re-resolution under worker reuse.

Exactness of the default: score = h / 2⁶⁰ where h is the 60-bit
sha256 prefix of ``query + '|' + text[:128]`` (the token_hash60 scheme,
functions/text.py). h exceeds 2⁵³, so the int→double conversion rounds —
but both engines perform the identical IEEE conversion and divide by the
exactly-representable 2⁶⁰, so the doubles match bit-for-bit (rounded to
6 digits in query output regardless).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

RERANK_MODEL_ENV = "SPARK_GRAFT_RERANK_MODEL"

_HEAD_CHARS = 128  # score the document head, like a truncated encoder input
_TWO_60 = float(1 << 60)

# executor-local lazy scorer singleton (M6 idiom), keyed by env value
_SCORER = None
_SCORER_KEY: str | None = None


def _pair_h(query: str, text: str) -> int:
    """60-bit sha256 prefix of the joined pair (token_hash60 scheme)."""
    payload = f"{query}|{(text or '')[:_HEAD_CHARS]}".encode()
    return int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") >> 4


def _hash_score(pairs: list[tuple[str, str]]) -> np.ndarray:
    """Default deterministic scorer: uniform-looking [0, 1) pair scores."""
    return np.fromiter(
        (_pair_h(q, t) / _TWO_60 for q, t in pairs),
        dtype=np.float64,
        count=len(pairs),
    )


def _load_artifact_scorer(path: str):
    """Cross-encoder loaded from a local ``.npz`` artifact (``weights``
    matrix of shape (n_buckets, dim)) — the same from-disk non-fake
    branch the embedding seam has (functions/embedding.py): both sides
    of the pair hash-bag into the projection, the score is the pair's
    cosine mapped to [0, 1]. Real file I/O, per-worker lazy init, batch
    matmul — everything the library path does except the network."""
    data = np.load(path)
    weights = np.asarray(data["weights"], dtype=np.float64)
    n_buckets, _dim = weights.shape

    def embed(text: str) -> np.ndarray:
        toks = (text or "").lower().split()
        if not toks:
            return np.zeros(weights.shape[1])
        rows = np.fromiter(
            (
                (int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big") >> 4)
                % n_buckets
                for t in toks
            ),
            dtype=np.int64,
            count=len(toks),
        )
        return weights[rows].sum(axis=0)

    def score(pairs: list[tuple[str, str]]) -> np.ndarray:
        out = np.zeros(len(pairs))
        for i, (q, t) in enumerate(pairs):
            a, b = embed(q), embed(t[:_HEAD_CHARS])
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            out[i] = 0.5 * (1.0 + a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0
        return out

    return score


def _load_real_scorer():
    """Real cross-encoder when $SPARK_GRAFT_RERANK_MODEL is set; None
    otherwise (the hash scorer stays in charge). A path to an existing
    ``.npz`` file loads the from-disk artifact scorer; any other value
    is treated as a sentence-transformers CrossEncoder name."""
    name = os.environ.get(RERANK_MODEL_ENV)
    if not name:
        return None
    if name.endswith(".npz"):
        # a configured .npz path is ALWAYS an artifact path — never fall
        # through to CrossEncoder (which would surface a confusing
        # model-download error for what is a missing file)
        if not os.path.exists(name):
            raise FileNotFoundError(
                f"{RERANK_MODEL_ENV} points to a missing artifact: {name}"
            )
        return _load_artifact_scorer(name)
    from sentence_transformers import CrossEncoder  # lazy heavy import

    model = CrossEncoder(name)

    def score(pairs: list[tuple[str, str]]) -> np.ndarray:
        return np.asarray(model.predict(list(pairs), batch_size=64), dtype=np.float64)

    return score


def _get_scorer():
    global _SCORER, _SCORER_KEY
    key = os.environ.get(RERANK_MODEL_ENV, "")
    if _SCORER is None or key != _SCORER_KEY:
        _SCORER = _load_real_scorer() or _hash_score
        _SCORER_KEY = key
    return _SCORER


@pandas_udf(T.DoubleType())
def rerank_score_udf(queries: pd.Series, texts: pd.Series) -> pd.Series:
    """Batch pair scoring: one scorer call per Arrow batch — the
    cross-encoder execution shape (k candidate rows per query, never the
    corpus)."""
    scores = _get_scorer()(list(zip(queries, texts)))
    return pd.Series(scores, index=queries.index)


def rerank_score(query: Column | str, text: Column | str) -> Column:
    q = F.col(query) if isinstance(query, str) else query
    t = F.col(text) if isinstance(text, str) else text
    return rerank_score_udf(q, t)


def duck_rerank_score(query_literal: str, text_expr: str) -> str:
    """DuckDB twin of the default scorer for a constant query string."""
    # SQL-escape the literal (' -> '') so a query containing a quote can't
    # produce a syntactically broken or semantically wrong oracle.
    escaped = query_literal.replace("'", "''")
    pair = f"concat('{escaped}', '|', substr({text_expr}, 1, {_HEAD_CHARS}))"
    return (
        f"CAST(concat('0x', substr(sha256({pair}), 1, 15)) AS BIGINT)"
        f" / {_TWO_60!r}"
    )
