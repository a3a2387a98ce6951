"""SQL script splitter: ';' terminates statements only outside string
literals, quoted identifiers, and comments (the reference's runner splits
naively on every ';', scripts/run_sql_file.py:24)."""

from __future__ import annotations

from cs_5542_lab_6_spark.sources.sql_runner import split_sql_statements


def test_plain_split_and_whitespace():
    assert split_sql_statements("SELECT 1; SELECT 2 ;; ") == [
        "SELECT 1",
        "SELECT 2",
    ]


def test_semicolon_inside_string_literal():
    script = "SELECT 'a;b' AS x; SELECT 2"
    assert split_sql_statements(script) == ["SELECT 'a;b' AS x", "SELECT 2"]


def test_escaped_quote_inside_literal():
    script = "SELECT 'it''s;fine'; SELECT 2"
    assert split_sql_statements(script) == ["SELECT 'it''s;fine'", "SELECT 2"]


def test_semicolon_inside_quoted_identifier():
    script = 'SELECT 1 AS "a;b"; SELECT 2'
    assert split_sql_statements(script) == ['SELECT 1 AS "a;b"', "SELECT 2"]


def test_semicolon_inside_comments():
    script = "SELECT 1 -- trailing; not a split\n; SELECT /* block; comment */ 2"
    assert split_sql_statements(script) == [
        "SELECT 1 -- trailing; not a split",
        "SELECT /* block; comment */ 2",
    ]


def test_backslash_escaped_quote_inside_literal():
    # Spark's default parser (escapedStringLiterals=false) honors \' as an
    # escaped quote INSIDE the literal — the splitter must not close there
    script = "SELECT 'don\\'t; stop' AS v; SELECT 2"
    assert split_sql_statements(script) == ["SELECT 'don\\'t; stop' AS v", "SELECT 2"]


def test_nested_block_comments():
    # Spark supports nested bracketed comments (SPARK-28880)
    script = "SELECT /* outer /* inner */ ; still comment */ 1; SELECT 2"
    assert split_sql_statements(script) == [
        "SELECT /* outer /* inner */ ; still comment */ 1",
        "SELECT 2",
    ]


def test_runner_executes_statements(spark, sf_dir):
    from cs_5542_lab_6_spark.sources.sql_runner import run_sql_script
    from cs_5542_lab_6_spark.sources import register_views

    register_views(spark, sf_dir)
    out = run_sql_script(
        spark,
        "CREATE OR REPLACE TEMP VIEW t_semi AS SELECT 'x;y' AS v;"
        "SELECT COUNT(*) AS n FROM t_semi WHERE v = 'x;y'",
    )
    assert out.first()["n"] == 1


def test_parameterized_script_binds_named_markers(spark, sf_dir):
    """Named :params bind as typed literals (injection-safe — the
    reference interpolates user text into SQL via f-strings;
    tools.py:96-118)."""
    from cs_5542_lab_6_spark.sources.sql_runner import run_sql_script_params
    from cs_5542_lab_6_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    out = run_sql_script_params(
        spark,
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :floor AND o_orderstatus = :status
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        {"floor": 100000.0, "status": "F"},
    )
    rows = out.collect()
    assert len(rows) >= 1

    # a malicious "value" stays a literal — it cannot close the quote and
    # inject a predicate; it just matches no status and returns 0 groups
    evil = run_sql_script_params(
        spark,
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :status",
        {"status": "F' OR '1'='1"},
    )
    assert evil.collect()[0]["n"] == 0


def test_procedural_script_restores_scripting_conf(spark, sf_dir):
    """sql_script_procedural_threshold must not leak
    spark.sql.scripting.enabled into the shared session (ADVICE r7):
    whatever the conf was before the call, it is identical after."""
    from cs_5542_lab_6_spark.sources.sql_runner import (
        sql_script_procedural_threshold,
    )

    key = "spark.sql.scripting.enabled"
    before = spark.conf.get(key, None)
    out = sql_script_procedural_threshold(spark, sf_dir)
    assert out.count() == 1
    assert spark.conf.get(key, None) == before

    # and with an explicit prior value, that exact value is restored
    spark.conf.set(key, "false")
    try:
        sql_script_procedural_threshold(spark, sf_dir).collect()
        assert spark.conf.get(key) == "false"
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)
