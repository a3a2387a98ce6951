"""Python UDTF surface demo (§2.11) — the one UDF kind the engine's hot
paths deliberately avoid.

The chunker (M1) is the engine's UDTF-*shaped* operator, implemented as
JVM ``sequence``+``posexplode`` precisely because a row-at-a-time Python
UDTF serializes every row through the Python worker. This test registers
a real ``@udtf`` doing the same explode contract and proves (a) the API
works end-to-end on this Spark, and (b) its output matches the
JVM-native expression it should be replaced by — documenting the
"UDTF exists, posexplode is the scale path" guidance executably.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, sentence string")
class SentenceSplit:
    """Split on sentence-ending punctuation; emit (position, sentence)."""

    def eval(self, text: str):
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text or "")]
        for i, p in enumerate(p for p in parts if p):
            yield i, p


def test_python_udtf_matches_jvm_posexplode(spark):
    spark.udtf.register("sentence_split", SentenceSplit)
    rows = [
        ("d1", "First point. Second point! Third?"),
        ("d2", "No terminal punctuation at all"),
        ("d3", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.createOrReplaceTempView("udtf_docs")

    got = spark.sql(
        """
        SELECT u.doc_id, s.pos, s.sentence
        FROM udtf_docs u, LATERAL sentence_split(u.text) s
        ORDER BY u.doc_id, s.pos
        """
    ).collect()

    # The JVM-native twin: regex split + filter + posexplode — what the
    # engine's chunker actually uses (pipeline/corpus.py M1).
    native = (
        df.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(
                        F.split("text", r"[.!?]+"), lambda s: F.trim(s)
                    ),
                    lambda s: s != "",
                )
            ).alias("pos", "sentence"),
        )
        .orderBy("doc_id", "pos")
        .collect()
    )

    assert [tuple(r) for r in got] == [tuple(r) for r in native]
    assert len(got) == 4  # 3 sentences from d1 + 1 from d2, none from d3
