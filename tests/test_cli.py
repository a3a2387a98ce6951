"""CLI surface tests (`python -m cs_5542_lab_6_spark`)."""

from __future__ import annotations

import subprocess
import sys

import pytest


def test_cli_list_names_every_registered_query(capsys):
    from cs_5542_lab_6_spark.__main__ import main
    from cs_5542_lab_6_spark.registry import all_oracles, all_queries

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(all_queries())
    markers = dict(line.split("\t") for line in out)
    oracles = all_oracles()
    for name, marker in markers.items():
        assert marker == ("oracle" if name in oracles else "rows-only")


@pytest.mark.slow
def test_cli_query_runs_in_subprocess(sf_dir):
    # subprocess: main() owns (and stops) its SparkSession, which must
    # not take down the test suite's shared session.
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "cs_5542_lab_6_spark",
            "query",
            "corpus_chunk_ratio",
            "--sf-dir",
            sf_dir,
            "-n",
            "5",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "chunks_per_paper" in res.stdout or "n_chunks" in res.stdout

    bad = subprocess.run(
        [sys.executable, "-m", "cs_5542_lab_6_spark", "query", "nope"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert bad.returncode == 2
