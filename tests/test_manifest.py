"""Warehouse manifest receipts: build → snapshot → diff, checksum
stability under re-layout (compaction), drift detection on row changes,
and partition-wise compaction."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.pipeline.ingest import build_corpus
from cs_5542_lab_6_spark.pipeline.maintenance import (
    compact_partitioned_table,
    compact_table,
)
from cs_5542_lab_6_spark.pipeline.manifest import (
    diff_manifests,
    read_manifest,
    write_manifest,
)


def _build(spark, sf_dir, root) -> str:
    out = str(root / os.path.basename(sf_dir.rstrip("/")))
    build_corpus(spark, sf_dir, out, resume=False)
    return out


@pytest.mark.slow
def test_manifest_roundtrip_and_replica_equality(spark, sf_dir, tmp_path):
    a = _build(spark, sf_dir, tmp_path / "wh_a")
    b = _build(spark, sf_dir, tmp_path / "wh_b")
    ma, mb = write_manifest(spark, a), write_manifest(spark, b)
    from cs_5542_lab_6_spark.pipeline.ingest import STAGES

    assert set(ma) == {name for name, _, _ in STAGES}
    assert read_manifest(a) == ma
    # two builds of the same fixture are content-identical replicas
    # (ingested_at is excluded from checksums by design)
    assert diff_manifests(ma, mb) == {}


@pytest.mark.slow
def test_manifest_checksum_survives_compaction_but_not_row_drift(
    spark, sf_dir, tmp_path
):
    wh = _build(spark, sf_dir, tmp_path / "wh")
    before = write_manifest(spark, wh)

    # re-layout: compact the chunks stage in place (different file count,
    # same rows) — the order-independent checksum must not move
    chunks = os.path.join(wh, "chunks")
    tmp_out = str(tmp_path / "chunks_compact")
    compact_table(spark, chunks, tmp_out, target_file_bytes=1 << 30)
    spark.read.parquet(tmp_out).write.mode("overwrite").parquet(chunks)
    after_layout = write_manifest(spark, wh)
    assert diff_manifests(before, after_layout) == {}

    # row drift: drop one chunk — checksum (and rows) must flag it
    pruned = spark.read.parquet(chunks)
    first_id = pruned.select(F.min("chunk_id")).collect()[0][0]
    pruned.filter(F.col("chunk_id") != first_id).write.mode("overwrite").parquet(
        str(tmp_path / "chunks_pruned")
    )
    spark.read.parquet(str(tmp_path / "chunks_pruned")).write.mode(
        "overwrite"
    ).parquet(chunks)
    drifted = write_manifest(spark, wh)
    assert diff_manifests(before, drifted) == {"chunks": "row_count"}


@pytest.mark.slow
def test_compact_partitioned_table_per_partition(spark, sf_dir, tmp_path):
    wh = _build(spark, sf_dir, tmp_path / "wh2")
    papers = os.path.join(wh, "papers")  # partitioned by publication_year
    out = str(tmp_path / "papers_compacted")
    audit = compact_partitioned_table(spark, papers, out, target_file_bytes=1 << 30)
    assert len(audit) == 5  # five year partitions
    for part, a in audit.items():
        assert part.startswith("publication_year=")
        assert a["files_out"] == 1
    # content preserved per partition
    n_before = spark.read.parquet(papers).count()
    n_after = sum(
        spark.read.parquet(os.path.join(out, p)).count() for p in audit
    )
    assert n_after == n_before


def test_snapshot_time_travel(spark, sf_dir, tmp_path):
    """Copy-on-write snapshots: each version is immutable, the pointer
    advances atomically, old versions stay readable after the source
    table changes (time travel), and uncommitted/missing versions fail
    loudly."""
    import pytest as _pytest

    from cs_5542_lab_6_spark.pipeline.maintenance import (
        read_current_version,
        read_snapshot,
        snapshot_table,
    )

    src = str(tmp_path / "orders_tbl")
    snaps = str(tmp_path / "orders_snaps")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.write.parquet(src)

    v1 = snapshot_table(spark, src, snaps)
    assert v1 == 1 and read_current_version(snaps) == 1
    n1 = read_snapshot(spark, snaps).count()
    assert n1 == orders.count()

    # mutate the live table (delete half) and snapshot again — cut the
    # lineage first (localCheckpoint) so the overwrite doesn't read the
    # files it is replacing
    halved = (
        spark.read.parquet(src)
        .filter("o_orderkey % 2 = 0")
        .localCheckpoint(eager=True)
    )
    halved.write.mode("overwrite").parquet(src)
    v2 = snapshot_table(spark, src, snaps)
    assert v2 == 2

    # time travel: v1 still sees the pre-delete rows; v2 sees the delete
    assert read_snapshot(spark, snaps, 1).count() == n1
    assert read_snapshot(spark, snaps, 2).count() < n1
    assert read_snapshot(spark, snaps).count() == read_snapshot(spark, snaps, 2).count()

    with _pytest.raises(ValueError):
        read_snapshot(spark, snaps, 3)
    with _pytest.raises(ValueError):
        read_snapshot(spark, snaps, 0)
