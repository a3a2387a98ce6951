"""Warehouse snapshot manifests: content-addressed build receipts.

The reference's verification stops at row counts printed to stdout
(data/ingestion.py:511-551). A multi-replica 100 TB warehouse needs a
durable, comparable receipt per build: which stages exist, how many rows,
and an order-independent content checksum per stage — so two replicas (or
a replica and its disaster-recovery copy) can be compared with one
manifest diff instead of a full data scan, and a partially-failed rebuild
is detectable by checksum drift rather than discovered by a downstream
query.

Checksums reuse the engine's anti-entropy primitive (sum of sha-derived
per-row key hashes — ``table_keyset_checksums``): commutative, so
partitioning/order/file-layout differences (e.g. after compaction) do NOT
change the checksum, while any row-level difference does.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_hash

MANIFEST_NAME = "MANIFEST.json"


def _content_checksum(df: DataFrame, cols: list[str]) -> str:
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols]
    )
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(token_hash(key).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("c"),
    ).collect()[0]
    return f"{row['n']}:{row['c']}"


def write_manifest(spark: SparkSession, out_dir: str) -> dict[str, dict[str, object]]:
    """Snapshot every completed stage checkpoint under ``out_dir`` into
    ``out_dir/MANIFEST.json``: rows + order-independent content checksum
    over the stage's non-partition columns. Returns the manifest dict."""
    entries: dict[str, dict[str, object]] = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            continue
        df = spark.read.parquet(path)
        # timestamp-at-write columns vary per build by design; exclude
        # them so two builds of identical data compare equal
        cols = [c for c, t in df.dtypes if c != "ingested_at"]
        checksum = _content_checksum(df, cols)
        n, _, csum = checksum.partition(":")
        entries[name] = {"rows": int(n), "checksum": csum, "columns": cols}
    manifest_path = os.path.join(out_dir, MANIFEST_NAME)
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(entries, f, indent=2, sort_keys=True)
    return entries


def read_manifest(out_dir: str) -> dict[str, dict[str, object]]:
    with open(os.path.join(out_dir, MANIFEST_NAME), encoding="utf-8") as f:
        return json.load(f)


def diff_manifests(
    a: dict[str, dict[str, object]], b: dict[str, dict[str, object]]
) -> dict[str, str]:
    """Stage-level differences between two manifests: 'missing_in_a'/'_b',
    'row_count' or 'checksum' drift. Empty dict == replicas identical."""
    out: dict[str, str] = {}
    for name in sorted(set(a) | set(b)):
        if name not in a:
            out[name] = "missing_in_a"
        elif name not in b:
            out[name] = "missing_in_b"
        elif a[name]["rows"] != b[name]["rows"]:
            out[name] = "row_count"
        elif a[name]["checksum"] != b[name]["checksum"]:
            out[name] = "checksum"
    return out
