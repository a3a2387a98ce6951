"""Custom Python DataSource mirroring the reference's streaming-iterator
ingestion (S1: ``load_dataset(..., streaming=True)`` → iterate the first
N valid records, data/ingestion.py:101-137).

The reference's iterator is single-process: one Python loop pulls pages
from the hub until N records arrive. The Spark-native expression of the
same source is a PySpark 4 custom DataSource whose ``partitions()``
splits the offset range into pages — every page becomes an independent
task, so a 1000-executor cluster pulls 1000 pages concurrently and the
"iterate N records" stage stops being the single-threaded bottleneck the
SURVEY flags (§3.3). Filters/projections still run in Spark above the
source; the source's job is only parallel record delivery.

Record content is the engine's standard deterministic fake (sha-derived
token sequences — same idea as the hash embedder): offset-addressable,
so any page can be produced independently on any executor, which is
precisely the property a paginated HTTP/hub API has. A REAL hub client
drops into ``_fetch_page``'s slot (import-gated, per-executor), exactly
like the embedding/NER/rerank model seams.

Usage:
    spark.dataSource.register(CorpusApiDataSource)
    df = (spark.read.format("corpus_api")
          .option("n", 200).option("page_size", 50).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SOURCE_NAME = "corpus_api"
DEFAULT_N = 100
DEFAULT_PAGE_SIZE = 25

_VOCAB = (
    "graph neural network training corpus spark shuffle partition join "
    "embedding retrieval transformer attention quantization streaming "
    "watermark dedup minhash entropy gradient distributed executor"
).split()

# every ~7th record is deliberately invalid (empty abstract) so the
# quality filter above the source has something to drop — the reference
# iterator skips invalid hub records the same way (ingestion.py:117-120)
_INVALID_EVERY = 7


def _words(seed: str, n: int) -> str:
    """Deterministic token sequence: sha-derived vocabulary picks."""
    out = []
    h = b""
    while len(out) < n:
        h = hashlib.sha256(seed.encode() + h).digest()
        out.extend(_VOCAB[b % len(_VOCAB)] for b in h)
    return " ".join(out[:n])


def _fetch_page(start: int, end: int) -> Iterator[tuple[int, str, str, str]]:
    """One page of records [start, end) — the seam a real hub/API client
    replaces. Offset-addressable and deterministic, like a paginated
    HTTP endpoint with a stable ordering; ``idx`` is the record offset
    (the API's cursor key, which is what makes range pushdown exact)."""
    for i in range(start, end):
        paper_id = f"arxiv_{i:06d}"
        title = _words(f"title:{i}", 6)
        abstract = "" if i % _INVALID_EVERY == 3 else _words(f"abs:{i}", 40)
        yield (i, paper_id, title, abstract)


class _Page(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CorpusApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", DEFAULT_N))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.lo = 0          # narrowed by pushFilters
        self.hi = self.n

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Range/equality predicates on ``idx`` (the API cursor) narrow
        the offset window BEFORE partitions() pages it — so a filtered
        read fetches only the pages the predicate selects, the
        source-level analogue of parquet footer pruning. Narrowing is
        exact for these operators, so consumed filters need no Spark
        re-evaluation; everything else is returned for Spark to apply
        above the scan."""
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("idx",) and isinstance(f.value, int):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        return [
            _Page(p, min(p + self.page_size, hi))
            for p in range(lo, hi, self.page_size)
        ] or [_Page(0, 0)]

    def read(self, partition: _Page) -> Iterator[tuple]:
        # executes on the executor that owns this page — N concurrent
        # page fetches across the cluster, zero driver-side iteration
        yield from _fetch_page(partition.start, partition.end)


class CorpusApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "idx int, paper_id string, title string, abstract string"

    def reader(self, schema) -> CorpusApiReader:
        return CorpusApiReader(self.options)

    def simpleStreamReader(self, schema) -> "CorpusApiStreamReader":
        return CorpusApiStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: the same paginated source as a micro-batch stream
# ---------------------------------------------------------------------------


class CorpusApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the paginated API: offset = next record
    index; each batch pulls one page; when the source is exhausted the
    offset stops advancing, so ``processAllAvailable``/availableNow
    terminate. ``readBetweenOffsets`` regenerates any committed range
    deterministically — the replay path after a crash, and the reason
    offset-addressable sources give exactly-once semantics for free."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", DEFAULT_N))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = min(lo + self.page_size, self.n)
        return iter(list(_fetch_page(lo, hi))), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_fetch_page(start["offset"], end["offset"])))


# ---------------------------------------------------------------------------
# Writer flavor: JSONL sink with a two-phase task commit protocol
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class JsonlCommitWriter(DataSourceWriter):
    """Executor tasks write to ``_staging/``; the DRIVER publishes in
    ``commit()`` by renaming every staged file into place and writing a
    ``_MANIFEST.json`` (file list + row counts) — readers treat the
    manifest as the commit record, so a job that dies mid-write leaves
    only invisible staging files for ``abort()`` to sweep. This is the
    minimal honest version of the commit protocol every real sink
    (FileCommitProtocol, Iceberg snapshots) implements; at 100 TB the
    renames become metadata-only manifest pointers, same shape."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        rows = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                rows += 1
        return _FileCommit(staged, rows)

    def commit(self, messages) -> None:
        import json
        import os

        published = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged, final)
            published.append({"file": os.path.basename(final), "rows": m.rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump({"files": published, "total_rows": sum(p["rows"] for p in published)}, fh)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlCommitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> JsonlCommitWriter:
        return JsonlCommitWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlCommitStreamWriter":
        return JsonlCommitStreamWriter(self.options)


class JsonlCommitStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the commit-protocol sink: every micro-batch
    publishes into its own ``batch_id=N/`` directory with a per-batch
    manifest, keyed by the engine's batchId — so a replayed batch
    REPLACES its directory instead of appending a second copy (the same
    idempotence idiom as streaming/stream.write_metrics_stream_idempotent,
    now expressed inside the sink where it belongs)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        return JsonlCommitWriter({"path": self.path}).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        import shutil

        batch_dir = os.path.join(self.path, f"batch_id={batchId}")
        shutil.rmtree(batch_dir, ignore_errors=True)  # replay replaces
        os.makedirs(batch_dir)
        published = []
        for i, m in enumerate(messages):
            final = os.path.join(batch_dir, f"part-{i:05d}.jsonl")
            os.replace(m.staged, final)
            published.append({"file": os.path.basename(final), "rows": m.rows})
        with open(os.path.join(batch_dir, "_MANIFEST.json"), "w") as fh:
            json.dump(
                {
                    "batch_id": batchId,
                    "files": published,
                    "total_rows": sum(p["rows"] for p in published),
                },
                fh,
            )

    def abort(self, messages, batchId: int) -> None:
        JsonlCommitWriter({"path": self.path}).abort(messages)
