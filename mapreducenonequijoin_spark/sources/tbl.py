"""Positional '|'-delimited text records ("TPC-H .tbl" layout) as a
Spark 4 Python DataSource — the Spark-native equivalent of the custom
Hadoop InputFormat a MapReduce engine uses for its row-oriented text
tables (SURVEY.md §1.1: the reference's physical layout is exactly
this — one record per line, fields positional, schema implicit in the
parse code).

The DataSource API gives the same contract an InputFormat gave Hadoop:
`partitions()` enumerates splits (one per file here, the
FileInputFormat whole-file analogue), `read(partition)` is the record
reader, and `pushFilters()` is the predicate-pushdown hook Spark calls
at planning time so the source can drop rows before they ever reach
the engine — implemented here for equality/range/membership/null
filters on top-level columns, with everything unsupported handed back
to Spark (which then applies it as a residual Filter; correctness
never depends on the source's filter support).

Registration is per-session: ``spark.dataSource.register(TblDataSource)``.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_NULL_TOKEN = ""  # empty field = NULL, like Hive's default text serde


def _caster(simple_type: str):
    if simple_type in ("tinyint", "smallint", "int", "bigint"):
        return int
    if simple_type in ("float", "double"):
        return float
    if simple_type == "boolean":
        return lambda s: s.lower() == "true"
    if simple_type == "date":
        import datetime

        return datetime.date.fromisoformat
    if simple_type == "timestamp":
        import datetime

        return datetime.datetime.fromisoformat
    if simple_type.startswith("decimal"):
        import decimal

        return decimal.Decimal
    if simple_type in ("string", "varchar", "char") or simple_type.startswith(
        ("varchar(", "char(")
    ):
        return str
    # nested/binary types have no positional-text encoding: reject at
    # planning time instead of silently yielding raw strings
    raise ValueError(f"tbl source cannot parse column type {simple_type!r}")


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class TblReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tbl source requires a 'path' option")
        if os.path.isdir(path):
            # recursive listing (epoch=N/ subdirs from the stream sink,
            # hive-ish layouts); _ and . files/dirs are metadata
            found = []
            for root, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                found += [
                    os.path.join(root, f)
                    for f in files
                    if not f.startswith(("_", "."))
                ]
            self._files = sorted(found)
        else:
            self._files = [path]
        self._schema = schema
        self._casts = [_caster(f.dataType.simpleString()) for f in schema.fields]
        self._col_idx = {f.name: i for i, f in enumerate(schema.fields)}
        self._pushed: list[Filter] = []

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        supported = (
            EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
            LessThanOrEqual, In, IsNull, IsNotNull,
        )
        for f in filters:
            col = getattr(f, "attribute", None)
            if (
                isinstance(f, supported)
                and col is not None
                and len(col) == 1  # top-level column only
                and col[0] in self._col_idx
            ):
                self._pushed.append(f)
            else:
                yield f  # unsupported → Spark applies it as residual

    def _keep(self, row: tuple) -> bool:
        for f in self._pushed:
            v = row[self._col_idx[f.attribute[0]]]
            if isinstance(f, IsNull):
                if v is not None:
                    return False
            elif isinstance(f, IsNotNull):
                if v is None:
                    return False
            elif v is None:
                return False  # comparisons with NULL never match
            elif isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, GreaterThan):
                if not v > f.value:
                    return False
            elif isinstance(f, GreaterThanOrEqual):
                if not v >= f.value:
                    return False
            elif isinstance(f, LessThan):
                if not v < f.value:
                    return False
            elif isinstance(f, LessThanOrEqual):
                if not v <= f.value:
                    return False
            elif isinstance(f, In):
                if v not in f.values:
                    return False
        return True

    def partitions(self) -> List[InputPartition]:
        return [_FilePartition(f) for f in self._files]

    def read(self, partition: _FilePartition) -> Iterator[Tuple]:
        casts = self._casts
        n_fields = len(casts)
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("|")
                # canonical TPC-H .tbl lines end every record with a
                # trailing '|' → one empty extra field; trim it
                if len(parts) == n_fields + 1 and parts[-1] == "":
                    parts = parts[:-1]
                if len(parts) != n_fields:
                    raise ValueError(
                        f"{partition.path}: record has {len(parts)} fields, "
                        f"schema expects {n_fields}: {line[:120]!r}"
                    )
                row = tuple(
                    None if p == _NULL_TOKEN else casts[i](p)
                    for i, p in enumerate(parts)
                )
                if self._keep(row):
                    yield row


class TblDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tbl"

    def schema(self):
        raise ValueError(
            "tbl source has no embedded schema (positional text): pass one "
            "via spark.read.format('tbl').schema(...)"
        )

    def reader(self, schema: StructType) -> TblReader:
        return TblReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "TblWriter":
        return TblWriter(self.options, schema, overwrite)


class _TblCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str) -> None:
        self.tmp_file = tmp_file


class TblWriter(DataSourceWriter):
    """The OutputFormat/OutputCommitter half of the format: each task
    writes its rows to a private temp file (``write`` = the record
    writer), and only the driver-side ``commit`` renames them into
    place — task-failure atomicity by two-phase commit, exactly the
    contract Hadoop's FileOutputCommitter gives a MapReduce job.
    ``abort`` removes the orphaned temps."""

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tbl sink requires a 'path' option")
        self._path = path
        self._overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _TblCommit:
        import uuid

        tmp = os.path.join(self._path, f"_tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    "|".join(
                        _NULL_TOKEN if v is None else str(v) for v in row
                    )
                    + "\n"
                )
        return _TblCommit(tmp)

    def commit(self, messages) -> None:
        import uuid

        if self._overwrite:
            for f in os.listdir(self._path):
                if not f.startswith("_tmp-"):
                    os.remove(os.path.join(self._path, f))
        # committed names carry a per-job token: deterministic
        # part-NNNNN names would silently os.rename OVER a previous
        # job's files in append mode (overwrite=False), replacing data
        # an append must preserve — the FileOutputCommitter jobId
        # analogue
        job = uuid.uuid4().hex[:12]
        for i, msg in enumerate(m for m in messages if m is not None):
            os.rename(
                msg.tmp_file,
                os.path.join(self._path, f"part-{i:05d}-{job}.tbl"),
            )

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.tmp_file):
                os.remove(msg.tmp_file)


class _CounterRows:
    """Picklable iterator over the deterministic counter rows."""

    def __init__(self, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi

    def __iter__(self) -> "_CounterRows":
        return self

    def __next__(self) -> Tuple[int, int]:
        if self.lo >= self.hi:
            raise StopIteration
        x = self.lo
        self.lo += 1
        return (x, x % 10)


class CounterStreamReader(SimpleDataSourceStreamReader):
    """Offset-based replayable micro-batch source (the Python
    streaming-source half of the custom-format story): each ``read``
    emits the next chunk of a deterministic integer sequence and
    advances the offset; ``readBetweenOffsets`` regenerates any
    past range as a PURE FUNCTION of the offsets, which is the whole
    exactly-once contract — a failed/replayed micro-batch reproduces
    byte-identical rows. A real connector (Kafka, CDC log) implements
    the same three methods against its log positions."""

    def __init__(self, options) -> None:
        self._end = int(options.get("end", "1000"))
        self._step = int(options.get("step", "100"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        # the engine's prefetch cache calls next() on the returned
        # object AND pickles it for replay — so it must be a PICKLABLE
        # ITERATOR (a generator can't pickle, a list isn't an iterator)
        return _CounterRows(lo, hi)

    def read(self, start: dict):
        i = int(start["i"])
        j = min(i + self._step, self._end)
        return self._rows(i, j), {"i": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))


class CounterStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "counterstream"

    def schema(self) -> str:
        return "i long, bucket int"

    def simpleStreamReader(self, schema: StructType) -> CounterStreamReader:
        return CounterStreamReader(self.options)


class TblStreamSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tblsink"

    def streamWriter(self, schema: StructType, overwrite: bool) -> "TblStreamWriter":
        return TblStreamWriter(self.options, schema)


class TblStreamWriter(DataSourceStreamWriter):
    """Streaming sink for the format with PER-EPOCH two-phase commit:
    tasks write private temps, and commit(messages, batchId) renames
    them to ``epoch=<batchId>/part-*.tbl`` — so a replayed micro-batch
    (same batchId) overwrites its own epoch directory instead of
    appending duplicates. That idempotent-by-epoch layout is exactly
    how exactly-once file sinks (and Delta's txn log) absorb
    micro-batch retries."""

    def __init__(self, options, schema: StructType) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tbl stream sink requires a 'path' option")
        self._path = path
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _TblCommit:
        import uuid

        tmp = os.path.join(self._path, f"_tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    "|".join(_NULL_TOKEN if v is None else str(v) for v in row)
                    + "\n"
                )
        return _TblCommit(tmp)

    def commit(self, messages, batchId: int) -> None:
        import shutil

        epoch_dir = os.path.join(self._path, f"epoch={batchId}")
        if os.path.exists(epoch_dir):  # replayed epoch: idempotent redo
            shutil.rmtree(epoch_dir)
        os.makedirs(epoch_dir)
        for i, msg in enumerate(m for m in messages if m is not None):
            os.rename(msg.tmp_file, os.path.join(epoch_dir, f"part-{i:05d}.tbl"))

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.tmp_file):
                os.remove(msg.tmp_file)
