"""Raw-file ingestion: JSONL and CSV readers with declared schemas and
quarantined corrupt rows.

The reference ingests documents from a JSON HTTP API and never handles a
malformed record (data/ingestion.py:101-110 trusts the feed). At 100 TB
raw data arrives as JSONL/CSV drops where some fraction of rows is always
broken, and silently dropping them (Spark's default DROPMALFORMED) turns
data loss invisible. These readers therefore:

- require a DECLARED schema (inference is a full extra pass over 100 TB
  and nondeterministic under schema drift);
- read in PERMISSIVE mode with an explicit ``_corrupt_record`` column, so
  every malformed row survives as (null..., raw_text) instead of
  vanishing;
- expose ``split_corrupt`` to fork the stream into (clean, quarantine) —
  the quarantine side is written next to the target table, preserving
  row-level provenance for replay after an upstream fix.

Both paths are plain DataFrameReader plans: the parse runs inside the
scan (JacksonParser / UnivocityParser in the JVM), predicate pushdown and
column pruning still apply to the clean side, and nothing here adds a
shuffle.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Declared schema + the quarantine column (idempotent)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """One JSON object per line, declared schema, corrupt rows kept."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with declared schema, corrupt rows kept (type-mismatch or
    column-count rows land in the quarantine column, not on the floor)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantined_raw_rows).

    The parsed relation is cache()d first: Spark refuses to answer
    queries that reference ONLY the corrupt column of a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    prunes the data columns away and the corrupt predicate would be
    meaningless), and both forks re-reading the raw files would parse
    100 TB twice anyway. MEMORY_AND_DISK, spills instead of OOMing; at
    scale callers checkpoint the forks and unpersist."""
    from pyspark import StorageLevel

    parsed = df.persist(StorageLevel.MEMORY_AND_DISK)
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return clean, quarantine


@contextmanager
def corrupt_split(df: DataFrame):
    """Scoped ``split_corrupt``: yields (clean, quarantine) and ALWAYS
    unpersists the backing cache on exit, so ingest jobs in a long-lived
    session leave the cache ledger untouched (the r5 cache-hygiene
    contract). Consume or checkpoint both forks inside the block."""
    clean, quarantine = split_corrupt(df)
    try:
        yield clean, quarantine
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# ORC interchange (the other splittable columnar format Spark ships)
# ---------------------------------------------------------------------------


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC reader with a DECLARED schema — same contract as the JSONL/CSV
    readers. ORC is self-describing, so there is no corrupt-row mode —
    but Spark's reader does NOT enforce the declared schema: a declared
    column absent from the files comes back silently NULL-filled. This
    helper therefore checks the declared fields against the footer
    schema (a metadata-only read, no data pass) and fails loudly on
    drift instead of letting all-NULL columns flow downstream."""
    footer = {f.name: f.dataType for f in spark.read.orc(path).schema.fields}
    missing = [f.name for f in schema.fields if f.name not in footer]
    if missing:
        raise ValueError(
            f"ORC files at {path} are missing declared columns {missing}; "
            "refusing to NULL-fill schema drift"
        )
    # name presence alone is only half the drift contract: a declared
    # column whose file type diverges would otherwise flow through a
    # silent (possibly lossy) cast — fail loudly on LOSSY drift, but
    # admit what the declared read handles losslessly: nullability
    # differences (containsNull/valueContainsNull/nullable are metadata,
    # not layout) and safe numeric widening (file int read as declared
    # bigint, float as double) — rejecting those broke previously valid
    # datasets (r10 advice).
    mismatched = [
        f"{f.name} (declared {f.dataType.simpleString()}, "
        f"files {footer[f.name].simpleString()})"
        for f in schema.fields
        if not _lossless_orc_drift(footer[f.name], f.dataType)
    ]
    if mismatched:
        raise ValueError(
            f"ORC files at {path} have type drift on declared columns: "
            f"{mismatched}; refusing to cast schema drift silently"
        )
    return spark.read.schema(schema).orc(path)


# file type -> declared types it widens into without loss
_ORC_SAFE_WIDEN = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def _strip_nullability(dt: T.DataType) -> T.DataType:
    """The same type with every nullable/containsNull/valueContainsNull
    flag normalized to True, recursively — drift comparison cares about
    layout, not null metadata."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    return dt


def _lossless_orc_drift(file_dt: T.DataType, declared_dt: T.DataType) -> bool:
    f, d = _strip_nullability(file_dt), _strip_nullability(declared_dt)
    return _widens_losslessly(f, d)


def _widens_losslessly(f: T.DataType, d: T.DataType) -> bool:
    """True iff a file column of type ``f`` reads losslessly as declared
    type ``d`` — equality, safe numeric widening, or the same widening
    NESTED inside arrays/maps/structs (file array<int> declared
    array<bigint> is exactly as lossless as the top-level case; r11
    advice). Struct widening requires identical field names in order —
    reordering or renaming is drift, not widening."""
    if f == d:
        return True
    if isinstance(f, T.ArrayType) and isinstance(d, T.ArrayType):
        return _widens_losslessly(f.elementType, d.elementType)
    if isinstance(f, T.MapType) and isinstance(d, T.MapType):
        return _widens_losslessly(f.keyType, d.keyType) and _widens_losslessly(
            f.valueType, d.valueType
        )
    if isinstance(f, T.StructType) and isinstance(d, T.StructType):
        return len(f.fields) == len(d.fields) and all(
            ff.name == df_.name and _widens_losslessly(ff.dataType, df_.dataType)
            for ff, df_ in zip(f.fields, d.fields)
        )
    return d.simpleString() in _ORC_SAFE_WIDEN.get(f.simpleString(), set())


def write_orc(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """ORC writer (snappy, the splittable default). Partitioning mirrors
    the parquet warehouse writer so either format slots into the same
    layout; predicate pushdown and column pruning work identically
    (OrcScan supports the same filter API as ParquetScan)."""
    w = df.write.mode("overwrite").format("orc")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
