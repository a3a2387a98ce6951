"""Fixture-drift canary (round-4 postmortem).

The driver regenerates ``/root/testdata`` between rounds and has already
flipped ``events.ts`` between TIMESTAMP(NANOS) and TIMESTAMP(MICROS),
which silently corrupted every time-windowed query for a full round.
These tests compare ``load_table``'s output against the parquet file
itself (via pyarrow, the independent reader), so any future physical-type
drift fails loudly here — naming the table and unit — instead of
producing 19 wrong-answer rows downstream.
"""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow as pa
import pyarrow.dataset as ds
import pytest
from pyspark.sql import functions as F

from cs_5542_lab_6_spark.sources.tables import _SCHEMAS, events_ts_unit, load_table

_SF_DIRS = sorted(
    d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)
)


@pytest.mark.parametrize("sf", _SF_DIRS)
def test_events_ts_range_matches_parquet(spark, sf):
    """load_table's min/max ts must equal pyarrow's read of the same file.

    This is the exact failure mode of round 4: the loader divided
    microseconds by 1000 and collapsed a 30-day range into 43 minutes of
    1970 while every schema check stayed green.
    """
    unit = events_ts_unit(sf)
    tbl = ds.dataset(f"{sf}/events.parquet", format="parquet").to_table(columns=["ts"])
    col = tbl.column("ts")
    import pyarrow.compute as pc

    lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
    if not isinstance(lo, datetime.datetime):
        # raw epoch INT64 fixture (nanos era): convert to µs-precision datetimes
        lo = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=lo // 1000)
        hi = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=hi // 1000)
    elif lo.tzinfo is not None:
        lo, hi = lo.replace(tzinfo=None), hi.replace(tzinfo=None)

    row = (
        load_table(spark, sf, "events")
        .select(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert row["lo"] == lo, (
        f"{sf}/events.parquet (unit={unit}): load_table min ts {row['lo']} != "
        f"parquet min {lo} — fixture timestamp unit drifted"
    )
    assert row["hi"] == hi, (
        f"{sf}/events.parquet (unit={unit}): load_table max ts {row['hi']} != "
        f"parquet max {hi} — fixture timestamp unit drifted"
    )


@pytest.mark.parametrize("name", sorted(_SCHEMAS))
def test_declared_schema_matches_parquet(spark, sf_dir, name):
    """Every declared StructType must stay reconcilable with the physical
    file: same field names in order, and for events a timestamp-typed `ts`
    after loading regardless of the on-disk unit."""
    phys = ds.dataset(f"{sf_dir}/{name}.parquet", format="parquet").schema
    df = load_table(spark, sf_dir, name)
    assert [f.name for f in df.schema.fields] == phys.names, (
        f"{name}: declared column order {df.schema.fieldNames()} != "
        f"parquet columns {phys.names}"
    )
    assert df.schema == _SCHEMAS[name] or name == "events", name
    if name == "events":
        assert df.schema["ts"].dataType.typeName() == "timestamp", (
            "events.ts must load as TimestampType whatever the file stores"
        )


def test_events_row_count_matches_parquet(spark, sf_dir):
    """Unit bugs that drop or duplicate rows (e.g. a bad filter on a
    mis-scaled column) get caught by an independent count."""
    n_parquet = ds.dataset(f"{sf_dir}/events.parquet", format="parquet").count_rows()
    assert load_table(spark, sf_dir, "events").count() == n_parquet
