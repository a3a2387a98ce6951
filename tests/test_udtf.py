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


def test_grouped_agg_gini_udaf_matches_relational_plan(spark, sf_dir):
    """§2.11 UDAF surface: the GROUPED_AGG pandas UDF (one Arrow batch
    per group -> one scalar) computes the same Gini as the registered
    JVM-side ordered-fold query AND a pure-Python replica, to the
    rounded surface."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.functions.udafs import gini_py, gini_udaf
    from cs_5542_lab_6_spark.operators.windows import priority_price_gini
    from cs_5542_lab_6_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    via_udaf = {
        r["priority"]: round(r["g"], 6)
        for r in o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(gini_udaf(F.col("o_totalprice").cast("double")).alias("g"))
        .collect()
    }
    via_plan = {
        r["priority"]: r["gini"]
        for r in priority_price_gini(spark, sf_dir).collect()
    }
    assert via_udaf == via_plan
    # replica spot check on one group
    some_priority = next(iter(via_plan))
    vals = [
        r["x"]
        for r in o.filter(F.col("o_orderpriority") == some_priority)
        .select(F.col("o_totalprice").cast("double").alias("x"))
        .collect()
    ]
    assert round(gini_py(vals), 6) == via_plan[some_priority]


def test_gini_degenerate_groups_yield_null(spark):
    """Degenerate groups (empty / all-zero values) must yield NULL, not
    ZeroDivisionError, through both the replica and the UDAF (ADVICE
    r7): gini is a public aggregate usable on arbitrary columns."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.functions.udafs import gini_py, gini_udaf

    assert gini_py([]) is None
    assert gini_py([0.0, 0.0, 0.0]) is None
    assert gini_py([1.0, 1.0]) == 0.0  # equal shares -> 0, still defined

    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0), ("ok", 1.0), ("ok", 3.0)], "k string, x double"
    )
    got = {
        r["k"]: r["g"]
        for r in df.groupBy("k").agg(gini_udaf("x").alias("g")).collect()
    }
    assert got["z"] is None
    assert got["ok"] == gini_py([1.0, 3.0])
