from .vectors import cosine_score, dot, l2_norm, l2_normalize
from .text import (
    clean_text,
    normalize_entity,
    sha_id,
    slugify,
    word_count,
    words,
)

__all__ = [
    "cosine_score",
    "dot",
    "l2_norm",
    "l2_normalize",
    "clean_text",
    "normalize_entity",
    "sha_id",
    "slugify",
    "word_count",
    "words",
]
