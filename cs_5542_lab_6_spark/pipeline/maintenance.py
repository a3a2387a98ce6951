"""Table-maintenance operators: small-file compaction.

The reference never manages physical layout (its warehouse is a managed
service; the pandas writer emits one file per upload,
data/ingestion.py:430-504). A self-managed 100 TB lakehouse accumulates
small files from streaming micro-batches and incremental ingests until
scan planning (file listing + footer reads) dominates query time;
periodic compaction is the standard fix (the OPTIMIZE idiom).

Design:
- Sizing is decided from the *actual on-disk bytes* (driver-side file
  listing — metadata only, no data read), not row counts, because row
  width varies wildly across tables.
- The rewrite uses ``coalesce`` (narrow, shuffle-free): reducing N small
  files to K big ones needs no redistribution, so the job is a pure
  scan→write at input-read speed. ``repartition`` would add a full
  shuffle of every byte — only worth it when skew between output files
  matters more than the shuffle (exposed via ``shuffle=True``).
- At 100 TB compaction runs per partition directory (each is an
  independent coalesce job, trivially parallel across a cluster), never
  as one global job; ``compact_table`` takes the directory to compact, so
  callers map it over partitions.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _parquet_files(path: str) -> list[str]:
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return out


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    shuffle: bool = False,
) -> dict[str, int]:
    """Rewrite ``in_path``'s parquet files into ``out_path`` with file
    count sized so each output file approaches ``target_file_bytes``.
    Returns an audit dict (files/bytes before, files after). Content is
    preserved row-for-row — callers verify with the engine's
    order-independent key-set checksums (``table_keyset_checksums``
    idiom), not by ordering, which a compaction never guarantees."""
    files = _parquet_files(in_path)
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    df = spark.read.parquet(in_path)
    sized = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    sized.write.mode("overwrite").parquet(out_path)
    return {
        "files_in": len(files),
        "bytes_in": bytes_in,
        "files_out": len(_parquet_files(out_path)),
    }


def compact_partitioned_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, dict[str, int]]:
    """Compact a hive-partitioned table directory (``key=value`` subdirs)
    one partition at a time — each partition is an independent
    scan→coalesce→write job, which is exactly how compaction parallelizes
    at 100 TB (one job per partition across the cluster, no partition
    ever rewrites another's data). Returns per-partition audit dicts."""
    out: dict[str, dict[str, int]] = {}
    for entry in sorted(os.listdir(in_path)):
        src = os.path.join(in_path, entry)
        if not os.path.isdir(src) or "=" not in entry:
            continue
        out[entry] = compact_table(
            spark, src, os.path.join(out_path, entry), target_file_bytes
        )
    return out


def cluster_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    sort_cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite a table range-clustered on ``sort_cols`` — the sort-on-write
    maintenance pass that turns parquet row-group min/max statistics into
    a data-skipping index (the plain-parquet analogue of Delta/Iceberg
    OPTIMIZE ... ZORDER for the single-dimension case).

    ``repartitionByRange`` + ``sortWithinPartitions`` gives globally
    disjoint per-file key ranges: a reader filtering on the cluster key
    then prunes whole files/row-groups from the footer stats alone,
    before any data page is read. At 100 TB this is the difference
    between scanning a full event table and touching the two files a
    time-range predicate selects. Returns the compaction audit dict plus
    the cluster column list length for the manifest."""
    files = _parquet_files(in_path)
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    df = spark.read.parquet(in_path)
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_out, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return {
        "files_in": len(files),
        "bytes_in": bytes_in,
        "files_out": len(_parquet_files(out_path)),
        "cluster_cols": len(sort_cols),
    }


def _spread16(x):
    """Morton bit-spread: 16-bit value -> 32 bits with one empty bit
    between every payload bit (the classic magic-number interleave,
    expressed as Catalyst bitwise ops so it stays in codegen)."""
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(a, b, a_min: int, a_max: int, b_min: int, b_max: int):
    """Interleaved 32-bit Morton code of two numeric columns, each
    min/max-scaled to 16 bits. Deterministic given the bounds. NULL
    values scale to bucket 0 (nulls-first) — without the explicit
    branch they would fall through ``least``'s null-skipping to bucket
    65535 and co-locate with the max values, poisoning the top
    row-group's min/max envelope."""

    def scale(c, mn, mx):
        if mn is None or mx is None or mx <= mn:
            return F.lit(0).cast("long")
        scaled = ((c.cast("double") - float(mn)) * (65535.0 / (float(mx) - float(mn))))
        return F.when(c.isNull(), F.lit(0)).otherwise(
            F.least(F.floor(scaled).cast("long"), F.lit(65535).cast("long"))
        )

    return _spread16(scale(a, a_min, a_max)).bitwiseOR(
        F.shiftleft(_spread16(scale(b, b_min, b_max)), 1)
    )


def zorder_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    col_a: str,
    col_b: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite a table Z-ORDER clustered on two numeric columns — the
    multi-dimension completion of ``cluster_table``. A single-column
    sort gives perfect pruning on ONE predicate dimension and none on
    the other; interleaving both columns' bits into a Morton code and
    range-sorting on it narrows row-group min/max envelopes on BOTH
    columns simultaneously, so footer-stats skipping works for filters
    on either (or both) — Delta/Iceberg's OPTIMIZE ... ZORDER BY,
    expressed on plain parquet.

    Bounds for the 16-bit scaling come from one metadata-grade min/max
    aggregation. The Morton key is a pure bitwise Catalyst expression
    (codegen, no UDF), used only for placement and dropped before the
    write. At 100 TB the rewrite runs per partition directory like
    ``compact_table``; the sort is ``repartitionByRange`` on the key —
    a sampled range exchange, not a global sort barrier."""
    files = _parquet_files(in_path)
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    df = spark.read.parquet(in_path)
    bounds = df.agg(
        F.min(col_a).alias("amn"), F.max(col_a).alias("amx"),
        F.min(col_b).alias("bmn"), F.max(col_b).alias("bmx"),
    ).collect()[0]
    z = zorder_value(
        F.col(col_a), F.col(col_b),
        bounds["amn"], bounds["amx"], bounds["bmn"], bounds["bmx"],
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_out, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return {
        "files_in": len(files),
        "bytes_in": bytes_in,
        "files_out": len(_parquet_files(out_path)),
        "cluster_cols": 2,
    }


# ---------------------------------------------------------------------------
# Table snapshots: copy-on-write versions + time travel on plain parquet
# ---------------------------------------------------------------------------

_SNAP_POINTER = "_CURRENT_VERSION"


def snapshot_table(spark: SparkSession, table_path: str, snap_root: str) -> int:
    """Write the table's current content as the next immutable version
    under ``snap_root/v=N/`` and advance the ``_CURRENT_VERSION``
    pointer — the copy-on-write snapshot idiom (Iceberg/Delta's
    metadata-pointer commit, expressed on plain parquet). Readers that
    resolved a version keep a consistent view forever; the pointer file
    write is the single atomic commit point. Returns the new version.

    At 100 TB a snapshot would not copy bytes — it would record the
    current file manifest (pipeline/manifest.py) under v=N and share
    unchanged files across versions; the read path below is identical
    either way, which is what the test pins."""
    import json

    os.makedirs(snap_root, exist_ok=True)
    current = read_current_version(snap_root)
    version = current + 1
    df = spark.read.parquet(table_path)
    df.write.mode("errorifexists").parquet(os.path.join(snap_root, f"v={version}"))
    tmp = os.path.join(snap_root, _SNAP_POINTER + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, os.path.join(snap_root, _SNAP_POINTER))  # atomic commit
    return version


def read_current_version(snap_root: str) -> int:
    import json

    p = os.path.join(snap_root, _SNAP_POINTER)
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return int(json.load(fh)["version"])


def read_snapshot(spark: SparkSession, snap_root: str, version: int | None = None):
    """Time travel: read version N (default: the committed current
    version). Uncommitted or missing versions fail loudly."""
    v = read_current_version(snap_root) if version is None else version
    path = os.path.join(snap_root, f"v={v}")
    if v < 1 or not os.path.exists(path):
        raise ValueError(f"snapshot v={v} does not exist under {snap_root}")
    if v > read_current_version(snap_root):
        raise ValueError(f"snapshot v={v} is not committed")
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Snapshot diff as a registry query (driver-checkable time travel)
# ---------------------------------------------------------------------------

SNAP_CUT_V1 = "1995-06-01"
SNAP_CUT_V2 = "1996-06-01"


def _register_snapshot_diff() -> None:
    # local import: registry imports this module, so the decorator import
    # happens lazily to avoid a cycle at module-load time
    from ..registry import query
    from ..sources.tables import load_table

    @query(
        "corpus_snapshot_diff",
        oracle=f"""
        WITH v1 AS (SELECT * FROM orders WHERE o_orderdate < DATE '{SNAP_CUT_V1}'),
        v2 AS (SELECT * FROM orders WHERE o_orderdate < DATE '{SNAP_CUT_V2}'),
        added AS (
          SELECT o_orderstatus, COUNT(*) AS n_orders
          FROM v2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v1)
          GROUP BY o_orderstatus
        ),
        removed AS (
          SELECT o_orderstatus, COUNT(*) AS n_orders
          FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v2)
          GROUP BY o_orderstatus
        )
        SELECT 'added' AS change, o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders
        FROM added
        UNION ALL
        SELECT 'removed' AS change, o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders
        FROM removed
        ORDER BY change, o_orderstatus
        """,
    )
    def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> "DataFrame":
        """Time travel made driver-checkable: materialize the orders table
        at two points of its ingest history (everything before
        {SNAP_CUT_V1}, then before {SNAP_CUT_V2}), commit each as an
        immutable copy-on-write snapshot (v=1, v=2 with the atomic
        ``_CURRENT_VERSION`` pointer), then diff the two FROZEN versions
        through the ``read_snapshot`` reader — per-status counts of
        orders added/removed between versions. The oracle recomputes the
        same diff relationally from the base table, so the whole
        snapshot-write → pointer-commit → versioned-read path is
        value-checked, not just unit-tested.

        Scale shape: at 100 TB a snapshot records the file manifest
        instead of copying bytes (see ``snapshot_table``), and the diff
        is a left-anti join per direction on the snapshot key — shuffle
        on o_orderkey, map-side-combinable count agg. Fixture-scale
        copies here keep the read path identical."""
        import shutil
        import tempfile

        o = load_table(spark, sf_dir, "orders")
        root = tempfile.mkdtemp(prefix="snap_diff_")
        table_path = os.path.join(root, "orders_live")
        snap_root = os.path.join(root, "snaps")
        try:
            o.filter(F.col("o_orderdate") < SNAP_CUT_V1).write.mode(
                "overwrite"
            ).parquet(table_path)
            v1 = snapshot_table(spark, table_path, snap_root)
            o.filter(F.col("o_orderdate") < SNAP_CUT_V2).write.mode(
                "overwrite"
            ).parquet(table_path)
            v2 = snapshot_table(spark, table_path, snap_root)
            s1 = read_snapshot(spark, snap_root, v1)
            s2 = read_snapshot(spark, snap_root, v2)

            def _counts(df, label):
                return df.groupBy("o_orderstatus").agg(
                    F.count("*").cast("long").alias("n_orders")
                ).select(F.lit(label).alias("change"), "o_orderstatus", "n_orders")

            added = s2.join(s1.select("o_orderkey"), "o_orderkey", "left_anti")
            removed = s1.join(s2.select("o_orderkey"), "o_orderkey", "left_anti")
            out = (
                _counts(added, "added")
                .unionAll(_counts(removed, "removed"))
                .orderBy("change", "o_orderstatus")
            )
            # materialize before the snapshot files vanish: the caller
            # (driver/parity harness) collects AFTER this function returns,
            # when the temp dir is gone — localCheckpoint pins the result
            out = out.localCheckpoint(eager=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return out


_register_snapshot_diff()
