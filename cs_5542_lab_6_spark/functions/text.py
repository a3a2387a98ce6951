"""Text / string / id column expressions (SURVEY §2.8 F1–F6, F14).

All pure Catalyst expressions — no Python UDFs. The reference does these
with per-row ``re.sub`` / f-string loops in pandas
(data/ingestion.py:67-77,199,212,328-331); here they vectorize inside
whole-stage codegen and therefore scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_text(col: Column | str) -> Column:
    """LaTeX / URL / whitespace stripping — the reference's 6 chained
    ``re.sub`` passes (data/ingestion.py:67-77) as chained
    ``regexp_replace``:

    1. display math ``$$..$$``      4. bare latex commands ``\\cmd``
    2. inline math ``$..$``         5. URLs ``http\\S+``
    3. latex commands ``\\cmd{..}`` 6. whitespace runs → single space
    """
    c = _c(col)
    c = F.regexp_replace(c, r"\$\$[^$]*\$\$", " ")
    c = F.regexp_replace(c, r"\$[^$]*\$", " ")
    c = F.regexp_replace(c, r"\\[a-zA-Z]+\{[^}]*\}", " ")
    c = F.regexp_replace(c, r"\\[a-zA-Z]+", " ")
    c = F.regexp_replace(c, r"http\S+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def words(col: Column | str) -> Column:
    """Whitespace tokenization matching Python's ``str.split()``
    (empty-string → empty array, not ['']).

    Leading/trailing whitespace is stripped with a regex, not trim():
    trim only removes ASCII spaces, so tab/newline-edged text would emit
    an empty-string token — diverging from the ``len(text.split())``
    contract the reference uses (data/ingestion.py:117-120). The DuckDB
    twins strip the same way."""
    c = F.regexp_replace(_c(col), r"^\s+|\s+$", "")
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def word_count(col: Column | str) -> Column:
    """``len(text.split())`` (reference: data/ingestion.py:117-120,196)."""
    return F.size(words(col))


def normalize_entity(col: Column | str) -> Column:
    """Entity normalization: lowercase + strip non-[a-z0-9 ] + trim.

    The reference has a lower/upper inconsistency between ingestion and
    the backend (data/ingestion.py:329-330 vs backend/retrieval.py:42,
    flagged in docs/AGENT_ARCHITECTURE_ANALYSIS.md:38). The engine
    standardizes on the ingestion-side lowercase form everywhere
    (SURVEY §4.4).
    """
    return F.trim(F.regexp_replace(F.lower(_c(col)), "[^a-z0-9 ]", ""))


def normalize_entity_py(name: str) -> str:
    """Driver-side replica of ``normalize_entity`` for query-time entity
    lists (the agent's tool-3 contract extracts entities from the user's
    question and normalizes them with the same ingestion rules,
    tools.py:175-176)."""
    import re

    return re.sub(r"[^a-z0-9 ]", "", name.lower()).strip()


def slugify(col: Column | str) -> Column:
    """Section-name slug: lowercase, non-alnum → '_'
    (reference: data/ingestion.py:199)."""
    return F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]", "_")


# Modulus for token / rolling hashes: 2^31 - 1 keeps every intermediate of
# ``acc*31 + h`` under 2^37 — no bigint overflow in Spark or DuckDB.
HASH_P = 2_147_483_647

# DuckDB-side twin of ``token_hash`` (format with {t} = token expression).
DUCK_TOKEN_HASH = (
    "CAST(concat('0x', substr(sha256({t}), 1, 15)) AS BIGINT) % " + str(HASH_P)
)

# 60-bit variant (no modulus) for operators that need more bit entropy
# (SimHash signatures).
DUCK_TOKEN_HASH60 = "CAST(concat('0x', substr(sha256({t}), 1, 15)) AS BIGINT)"


def token_hash60(col: Column | str) -> Column:
    """Full 60-bit sha256-derived hash (positive bigint, no modulus)."""
    return F.conv(F.substring(F.sha2(_c(col), 256), 1, 15), 16, 10).cast("long")


def token_hash(col: Column | str) -> Column:
    """Deterministic 31-bit token hash: first 15 hex chars of sha256 as a
    bigint, reduced mod 2^31-1 — mirrored exactly by ``DUCK_TOKEN_HASH``
    so hash-derived operators (fingerprints, MinHash, SimHash) stay
    oracle-checkable across engines."""
    return (
        F.conv(F.substring(F.sha2(_c(col), 256), 1, 15), 16, 10).cast("long") % HASH_P
    )


def sha_id(*cols: Column | str, prefix: str | None = None) -> Column:
    """Deterministic surrogate id: sha256 over '|'-joined parts.

    Replaces the reference's ``uuid.uuid4()`` ids
    (data/ingestion.py:349,381) so every generated row is hash-check
    stable (SURVEY §4.3 item 2).
    """
    h = F.sha2(F.concat_ws("|", *[_c(c) for c in cols]), 256)
    return F.concat(F.lit(prefix), h) if prefix else h
