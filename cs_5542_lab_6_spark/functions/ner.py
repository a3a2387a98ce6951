"""Real-NER seam (M4 contract, data/ingestion.py:306-353).

The reference extracts entities per chunk with scispaCy
(``nlp(text).ents``) and then applies a normalize-and-filter contract
(lowercase, strip non-alnum, min length 3 — data/ingestion.py:325-331).
The engine's default substitute keeps extraction in pure Catalyst
(whitespace tokens — see pipeline/corpus.chunk_entities_df) so the KG
build stays oracle-checkable. Setting $SPARK_GRAFT_NER_MODEL to a spaCy
model name swaps a real NER into the same slot: an Arrow-batched pandas
UDF with an executor-local lazy model singleton (M6), emitting mention
arrays that flow through the IDENTICAL downstream normalize → length
filter → first-seen dedup pipeline. Real-model mode is intentionally not
oracle-checkable; correctness runs leave the env unset.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

NER_MODEL_ENV = "SPARK_GRAFT_NER_MODEL"

# executor-local lazy extractor singleton: str -> list[str] mentions
_EXTRACTOR = None


def ner_active() -> bool:
    """True when a real NER model is configured for this run."""
    return bool(os.environ.get(NER_MODEL_ENV))


def _load_real_extractor():
    """Real spaCy pipeline when $SPARK_GRAFT_NER_MODEL names a model;
    None otherwise (the Catalyst tokenizer substitute stays in charge)."""
    name = os.environ.get(NER_MODEL_ENV)
    if not name:
        return None
    import spacy  # lazy heavy import, resolved once per Python worker

    nlp = spacy.load(name)

    def extract(text: str) -> list[str]:
        return [ent.text for ent in nlp(text or "").ents]

    return extract


def _token_mentions(text: str) -> list[str]:
    """Substitute extractor with the same signature: whitespace tokens
    (the downstream contract — normalize, length-filter, first-seen — is
    shared with the real path, so only mention *generation* differs)."""
    return (text or "").split()


def _get_extractor():
    """Executor-local lazy init (M6): resolved once per Python worker."""
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = _load_real_extractor() or _token_mentions
    return _EXTRACTOR


@pandas_udf(T.ArrayType(T.StringType()))
def extract_mentions_udf(texts: pd.Series) -> pd.Series:
    """Batch mention extraction (M4): one model call per row inside an
    Arrow batch; the model itself is loaded once per worker."""
    extract = _get_extractor()
    return texts.map(lambda t: extract(t or ""))
