"""Fixture table sources (SURVEY §2.1 S1–S7).

The reference loads data via a streaming HF dataset iterator plus
parquet checkpoints (reference: data/ingestion.py:101-137,141) and scans
warehouse tables with explicit column lists (tools.py:69-73). Here every
source is a parquet scan with a *declared* schema: Catalyst gets pushdown
and pruning for free, and schema drift fails loudly instead of silently
(SURVEY §1.3).

At 100 TB these parquet files become partitioned/bucketed table roots;
nothing in the call sites changes — only the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Declared schemas for the driver-generated fixtures (FIXTURES.md §A).
# Parquet is self-describing, but declaring the expectation makes every
# query schema-stable and documents the contract.
_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts unit varies across fixture generations (TIMESTAMP(MICROS)
    # today, TIMESTAMP(NANOS) historically) — load_table sniffs the parquet
    # footer and picks the right read path; this is the MICROS-era schema.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(_SCHEMAS)

# The NANOS-era fixture needs the physical INT64 read (Spark's parquet
# reader rejects TIMESTAMP(NANOS) outright) plus exact integer division.
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Sniff the logical timestamp unit of ``events.ts`` from the parquet
    footer (driver-side metadata read, cached per directory).

    Fixture regenerations have flipped the physical type between
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS); hardcoding either assumption
    silently corrupts every time-windowed query, so the loader asks the
    file. ``pyarrow.dataset`` handles both single-file and directory
    parquet layouts.
    """
    if sf_dir not in _TS_UNIT_CACHE:
        import pyarrow as pa
        import pyarrow.dataset as ds

        t = ds.dataset(f"{sf_dir}/events.parquet", format="parquet").schema.field("ts").type
        if pa.types.is_timestamp(t):
            _TS_UNIT_CACHE[sf_dir] = t.unit
        elif pa.types.is_integer(t):
            # Raw epoch INT64 with no logical annotation: the only fixture
            # generation that shipped this stored nanoseconds.
            _TS_UNIT_CACHE[sf_dir] = "ns"
        else:
            raise TypeError(
                f"events.ts in {sf_dir} has unsupported parquet type {t}; "
                "expected a timestamp or int64 epoch column"
            )
    return _TS_UNIT_CACHE[sf_dir]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with declared schema (columnar, pushdown-eligible).

    Mirrors the reference's full-table / explicit-column scans
    (tools.py:69-73, backend/app.py:131-136) — Catalyst prunes to the
    columns each query actually selects.
    """
    if name not in _SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events" and events_ts_unit(sf_dir) == "ns":
        df = spark.read.schema(_EVENTS_NANOS_SCHEMA).parquet(f"{sf_dir}/{name}.parquet")
        # nanos → micros is integer division (exact); matches DuckDB's
        # TIMESTAMP (µs) coercion of the same column.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Rebalance an unsplittable scan across the cluster before a
    CPU-dense derivation (shingling, per-token hashing, window chunking).

    A small parquet file is one row group → one scan partition, so any
    expensive narrow transform chained onto it runs on a single core while
    the rest of the cluster idles. Shuffling the *raw* rows first (before
    the heavy expressions — Spark pipelines narrow transforms into the
    map side of the next exchange, so the repartition must come first)
    spreads that work over every core for the cost of moving the source
    bytes once.

    No-op when the scan already yields at least the default parallelism —
    the 100 TB case, where file splits dominate and an extra full-data
    shuffle would be the bottleneck. Keying by a stable id keeps the
    placement deterministic and rebalances per-document size skew.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    if cols:
        return df.repartition(sc.defaultParallelism, *[F.col(c) for c in cols])
    return df.repartition(sc.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for the SQL API
    (reference analogue: USE DATABASE session context, tools.py:67-68 —
    set once, not per query)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
