"""Spark 4 Python Data Source API: the Delta log client as a REAL
``spark.read.format("pydelta")`` source.

Why this exists alongside `DeltaTable.read` (which plans JVM parquet
scans): the Python Data Source API (SPARK-44076, public since 4.0;
filter pushdown since 4.1) is the sanctioned way to plug a pure-Python
table format into Spark's planner — registration, schema discovery,
partition planning, and filter pushdown all flow through the engine
instead of around it:

- one **InputPartition per active data file** — Spark schedules file
  reads across executors exactly like a native scan (the driver ships
  each partition's path + partition values + deletion-vector positions);
- the ``where`` option drives **log-stats file pruning** (same prover
  as ``DeltaTable.read(where=...)``) plus exact row-level application
  with pyarrow.compute — see the in-class note for why Spark 4.1's
  relation-level scan caching makes ``pushFilters`` unsound here;
- each partition reads its parquet with **pyarrow and yields Arrow
  RecordBatches** (the API's zero-copy path), applies deletion vectors
  by row position, renames physical->logical columns (column mapping),
  and injects typed partition values.

The source is four-way: batch read (`PyDeltaReader`), LOG-TAILING
streaming read (`PyDeltaStreamReader` — offsets are log versions,
exactly-once recovery from the checkpointed version, streams
partitioned AND column-mapped tables), batch write (`PyDeltaBatchWriter`
— executors stage parquet + stats, the driver publishes one atomic
commit), and a TRANSACTIONAL streaming sink (`PyDeltaStreamWriter` —
``txn``-keyed micro-batch commits, replays detected in the log).

Options: ``path`` (table root, required); reads: ``versionAsOf``,
``timestampAsOf`` (ms epoch), ``where`` (simple-conjunction predicate
for file pruning + exact row filtering — batch, batch-CDF, and
STREAMING, where data commits also stats-prune and CDF batches
row-filter only), ``startingVersion`` (streaming); writes:
``partitionBy`` (comma-separated), ``txnAppId`` (streaming-sink
idempotence key). Register once per session with
``pyds.register(spark)``.

Scale notes: the JVM parquet path remains the default for raw scan
throughput (vectorized reader, codegen); this source is the
INTEROPERABILITY surface — e.g. running the whole engine against a
Delta table from a pure-Python environment where the scan cost is
dominated by Python anyway, or testing reader semantics in-process.
"""

from __future__ import annotations

import hashlib
import json
import os
import urllib.parse
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from . import dv as _dv
from .shredding import _is_shredded_layout, unshred_struct_array
from .delta import (
    ConcurrentWriteError,
    DeltaTable,
    _phys_path_fn,
    _as_dict,
    _file_stats,
    _arrow_names_differ,
    _arrow_to_logical_names,
    _file_may_match,
    _parse_conjuncts_strict,
    _HIVE_NULL,
)


class PyDeltaPartition(InputPartition):
    """One data file read task: everything an executor needs, pickled.
    ``dv_rows`` EXCLUDES positions (deletion vectors); ``keep_rows``,
    when set, RESTRICTS to positions (change-feed delete deltas);
    ``change_type``/``commit_version`` tag change-feed rows."""

    def __init__(
        self,
        file_path: str,
        phys_to_logical: dict[str, str],
        part_values: dict[str, object],
        dv_rows: list[int],
        conjuncts: list[tuple[str, str, object]],
        keep_rows: list[int] | None = None,
        change_type: str | None = None,
        commit_version: int | None = None,
        field_ids: dict[str, int] | None = None,
        size_hint: int = 0,
    ) -> None:
        self.file_path = file_path
        self.phys_to_logical = phys_to_logical
        self.part_values = part_values
        self.dv_rows = dv_rows
        self.conjuncts = conjuncts
        self.keep_rows = keep_rows
        self.change_type = change_type
        self.commit_version = commit_version
        # id-mode column mapping: logical data column -> parquet field
        # id; the executor resolves each file's ARBITRARY column names
        # through its own footer ids (names match nothing in id mode)
        self.field_ids = field_ids
        # logged file size, consumed only by the driver-side bin-packer
        self.size_hint = size_hint


class PyDeltaMultiPartition(InputPartition):
    """Several file-read tasks executed by ONE executor slot: the
    bin-packed form of `PyDeltaPartition`. Exists because the Python
    data source pays a worker round-trip per input partition — a
    many-small-files table (streaming micro-batch appends before
    OPTIMIZE) planned one-partition-per-file turns into thousands of
    per-task spin-ups that dwarf the reads. Packing follows Spark's own
    FileSourceScan policy, so at 100 TB with ~128 MiB files it
    degenerates to one file per partition (today's plan), while a
    10k-tiny-file table plans O(bytes), not O(files)."""

    def __init__(self, tasks: list[PyDeltaPartition]) -> None:
        self.tasks = tasks


#: Spark's spark.sql.files.* defaults — the policy this planner mirrors.
_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_OPEN_COST_BYTES = 4 * 1024 * 1024


def _pack_partitions(tasks: list, opts: dict) -> list:
    """Greedy bin-pack of per-file read tasks into executor partitions,
    mirroring Spark's FilePartition planning: each file costs
    ``size + openCostInBytes`` and bins close at ``maxSplitBytes =
    min(maxPartitionBytes, max(openCost, totalCost/defaultParallelism))``
    — the parallelism floor keeps small tables from collapsing into one
    task, the byte ceiling keeps partitions executor-memory-sized.
    Options (lowercased): ``maxpartitionbytes``, ``opencostinbytes``,
    ``defaultparallelism`` (default 32, the engine's local target; a
    cluster deployment passes its core count)."""
    if len(tasks) <= 1:
        return tasks
    max_pb = int(opts.get("maxpartitionbytes", _MAX_PARTITION_BYTES))
    open_cost = int(opts.get("opencostinbytes", _OPEN_COST_BYTES))
    par = max(1, int(opts.get("defaultparallelism", 32)))
    costs = [
        max(0, int(getattr(t, "size_hint", 0) or 0)) + open_cost
        for t in tasks
    ]
    split = min(max_pb, max(open_cost, sum(costs) // par + 1))
    bins: list[list] = []
    cur: list = []
    cur_cost = 0
    for t, c in zip(tasks, costs):
        if cur and cur_cost + c > split:
            bins.append(cur)
            cur, cur_cost = [], 0
        cur.append(t)
        cur_cost += c
    if cur:
        bins.append(cur)
    return [
        b[0] if len(b) == 1 else PyDeltaMultiPartition(b) for b in bins
    ]


def _coerce_partition_value(raw, dt: T.DataType):
    """Hive-encoded partition string -> a Python value pyarrow can build
    an array of the column's arrow type from. Unsupported partition
    types fail HERE at planning time, loudly — a string fallback would
    produce a column whose type mismatches the declared schema."""
    import datetime
    import decimal

    if raw is None or raw == _HIVE_NULL:
        return None
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(raw)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dt, T.BooleanType):
        return raw == "true"
    if isinstance(dt, T.StringType):
        return raw
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(raw)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(raw)
    if isinstance(dt, T.DecimalType):
        return decimal.Decimal(raw)
    raise NotImplementedError(
        f"partition column type {dt.simpleString()} is not supported by the "
        "pydelta source"
    )


def _spark_to_arrow_type(dt: T.DataType):
    """Arrow type for a Spark type, or None when no cast should be
    attempted (complex/unknown types pass through as read)."""
    import pyarrow as pa

    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    return {
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.StringType(): pa.string(),
        T.BooleanType(): pa.bool_(),
        T.DateType(): pa.date32(),
        # Spark's Arrow bridge rejects NANOSECOND timestamps (the unit
        # pyarrow reads from ns-precision parquet): microseconds is the
        # engine's timestamp unit
        T.TimestampType(): pa.timestamp("us", tz="UTC"),
        T.TimestampNTZType(): pa.timestamp("us"),
    }.get(dt)


def _resolve_version(table: DeltaTable, opts: dict) -> int | None:
    """Time-travel target from lowercased options; specifying both
    version and timestamp is ambiguous and refused (delta-spark does
    the same)."""
    version = opts.get("versionasof")
    ts = opts.get("timestampasof")
    if version is not None and ts is not None:
        raise ValueError("specify versionAsOf OR timestampAsOf, not both")
    if ts is not None:
        return table.version_at_timestamp(int(ts))
    return int(version) if version is not None else None


def _lower_opts(options: dict) -> dict:
    # Spark hands options through a case-insensitive dict whose plain
    # dict() view is lowercased — normalize every lookup
    return {str(k).lower(): v for k, v in dict(options).items()}


class PyDeltaReader(DataSourceReader):
    def __init__(
        self, options: dict, schema: T.StructType, snapshot=None
    ) -> None:
        opts = _lower_opts(options)
        self._pack_opts = opts
        self._root = opts["path"]
        table = DeltaTable(self._root)
        if snapshot is not None:
            _version, meta, adds = snapshot
        else:
            version = _resolve_version(table, opts)
            meta, adds = table._snapshot_state(version)
        self._meta = meta
        self._adds = adds
        self._schema = schema
        if DeltaTable._has_variant(schema):
            raise NotImplementedError(
                "the pydelta source cannot read VARIANT columns as "
                "variants (pyarrow does not recognize the parquet VARIANT "
                "logical type); use the Spark read path — or, when the "
                "table is SHREDDED (variantShredding), pass an explicit "
                ".schema(...) declaring the column as a struct of its "
                "shredded typed paths and this source serves them from "
                "the typed_value leaves"
            )
        self._mapping = table._column_mapping(meta) or {}
        self._part_cols = meta.get("partitionColumns") or []
        self._cdf = str(opts.get("readchangefeed", "")).lower() == "true"
        # id-mode column mapping: ship (logical -> field id) to every
        # partition; executors resolve THEIR file's arbitrary column
        # names through its footer ids (`_read_partition`)
        self._field_ids: dict[str, int] | None = None
        if (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode"
        ) == "id":
            log_schema_ids = T.StructType.fromJson(
                json.loads(meta["schemaString"])
            )
            self._field_ids = {
                f.name: int((f.metadata or {})["delta.columnMapping.id"])
                for f in log_schema_ids.fields
                if f.name not in self._part_cols
            }
        where = opts.get("where")
        # STRICT parse: this reader's row filtering IS the conjunct list
        # (nothing re-applies the predicate above the scan), so a
        # predicate that does not fully decompose must error, never
        # silently under-filter
        self._conjuncts: list[tuple[str, str, object]] = (
            _parse_conjuncts_strict(where) if where else []
        )
        # arrow types per column, precomputed ONCE (read() must not
        # re-parse the schema JSON per field per file on executors)
        log_schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        self._arrow_types = {
            f.name: _spark_to_arrow_type(f.dataType) for f in log_schema.fields
        }
        self._spark_types = {f.name: f.dataType for f in log_schema.fields}
        self._col_order = [f.name for f in log_schema.fields]
        # shredded-variant read mode: the LOG declares VARIANT but the
        # caller's .schema(...) declares a STRUCT for the column -> the
        # executor unshreds the files' typed_value leaves into that
        # struct (sources/shredding.py; residual binaries refuse there)
        for f in schema.fields:
            if isinstance(
                self._spark_types.get(f.name), T.VariantType
            ) and isinstance(f.dataType, T.StructType):
                if self._mapping or self._field_ids:
                    # mirrors the to_pandas gate: under column mapping
                    # the files carry physical nested names, so
                    # _is_shredded_layout would miss the layout and the
                    # positional logical-name rebuild would map
                    # metadata/value/typed_value onto the declared
                    # struct fields — silent garbage when types line up
                    raise NotImplementedError(
                        "shredded-variant reads on a column-mapped "
                        "table are not supported by the pydelta source; "
                        "unmap the table first"
                    )
                self._spark_types[f.name] = f.dataType
                self._arrow_types[f.name] = _spark_to_arrow_type(f.dataType)
        self._cdf_parts: list | None = None
        if self._cdf:
            # batch change feed (delta-spark's
            # .option("readChangeFeed", true).option("startingVersion", N)
            # [.option("endingVersion", M)]): one bounded range of the
            # same diff plan the streaming CDF source runs per
            # micro-batch (`_plan_cdf_partitions`)
            if opts.get("versionasof") is not None or opts.get(
                "timestampasof"
            ) is not None:
                raise ValueError(
                    "readChangeFeed cannot be combined with versionAsOf/"
                    "timestampAsOf; scope the feed with startingVersion/"
                    "endingVersion"
                )
            start_opt = opts.get("startingversion")
            if start_opt is None:
                raise ValueError(
                    "readChangeFeed requires startingVersion (delta-spark "
                    "semantics: an unbounded start would replay the whole "
                    "history implicitly)"
                )
            start_v = int(start_opt)
            latest = table.latest_version()
            end_v = int(opts.get("endingversion", latest))
            if start_v > latest:
                raise ValueError(
                    f"startingVersion {start_v} is after the latest "
                    f"commit {latest} of {self._root}"
                )
            if end_v < start_v or end_v > latest:
                raise ValueError(
                    f"endingVersion {end_v} out of range "
                    f"[{start_v}, {latest}]"
                )
            import pyarrow as pa

            self._arrow_types["_change_type"] = pa.string()
            self._arrow_types["_commit_version"] = pa.int64()
            self._col_order += ["_change_type", "_commit_version"]
            phys = lambda c: self._mapping.get(c, c)  # noqa: E731
            data_cols = {
                phys(f.name): f.name
                for f in schema.fields
                if f.name not in self._part_cols
                and f.name not in ("_change_type", "_commit_version")
            }
            spark_types = self._spark_types

            def part_values_of(add: dict) -> dict:
                pv_raw = _as_dict(add.get("partitionValues"))
                return {
                    c: _coerce_partition_value(pv_raw.get(phys(c)), spark_types[c])
                    for c in self._part_cols
                }

            # planned eagerly (driver-side, like partitions()); the range
            # is [startingVersion, endingVersion] INCLUSIVE of the start —
            # the shared planner's half-open contract takes start-1
            self._cdf_parts = _plan_cdf_partitions(
                table,
                self._root,
                data_cols,
                part_values_of,
                start_v - 1,
                end_v,
                field_ids=self._field_ids,
                # `where` composes with the change feed as ROW filtering
                # only (change partitions carry no file stats to prune
                # on; the executor conjunct filter is exact)
                conjuncts=self._conjuncts,
            )

    # ----------------------------------------------------------- planning

    # NOTE — deliberate absence of pushFilters(): Spark 4.1's
    # PlanPythonDataSourceScan caches the planned scan (partitions +
    # read function) on the shared relation node WITHOUT keying it on
    # the pushed-filter set. Reproduced here: with pushFilters
    # implemented, count() -> 80, filter(day='d1').count() -> 26, then
    # count() again -> 26 (!) — the filtered scan is silently reused for
    # the unfiltered query, whether the filters are claimed or returned.
    # Until the engine keys that cache correctly, the ONLY sound reader
    # is filter-independent; per-load pruning is offered through the
    # explicit `where` option instead (each load() is a fresh relation,
    # so the scan it plans is scoped to it by construction).

    def partitions(self):
        if self._cdf_parts is not None:
            out = self._cdf_parts
            self._cdf_parts = None
            self._adds = []
            self._meta = {}
            return _pack_partitions(out, self._pack_opts)
        phys = lambda c: self._mapping.get(c, c)  # noqa: E731
        adds = self._adds
        conjuncts = self._conjuncts
        if conjuncts:
            phys_path = _phys_path_fn(self._meta)
            adds = [
                a
                for a in adds
                if _file_may_match(a, conjuncts, self._part_cols, phys_path)
            ]
        out = []
        types = self._spark_types
        phys_to_logical = {
            phys(f.name): f.name
            for f in self._schema.fields
            if f.name not in self._part_cols
        }
        for a in adds:
            pv_raw = a.get("partitionValues") or {}
            part_values = {}
            for c in self._part_cols:
                raw = pv_raw.get(phys(c))
                part_values[c] = _coerce_partition_value(raw, types[c])
            dv_rows: list[int] = []
            if a.get("deletionVector"):
                # module captured at import time: runtime relative imports
                # would fail inside the planner's Python worker, where the
                # package is shipped by value, not installed
                dv_rows = _dv.resolve_dv_rows(self._root, a["deletionVector"])
            out.append(
                PyDeltaPartition(
                    os.path.join(
                        self._root, urllib.parse.unquote(a["path"])
                    ),
                    phys_to_logical,
                    part_values,
                    dv_rows,
                    conjuncts,
                    field_ids=self._field_ids,
                    size_hint=a.get("size") or 0,
                )
            )
        # the planner pickles (partitions, read function) for executors
        # AFTER this call: drop the driver-only state so each task does
        # not redundantly carry the whole add list + stats JSON (linear
        # in table size times task count)
        self._adds = []
        self._meta = {}
        return _pack_partitions(out, self._pack_opts)

    # ---------------------------------------------------------- execution

    def read(self, partition) -> Iterator:
        tasks = (
            partition.tasks
            if isinstance(partition, PyDeltaMultiPartition)
            else [partition]
        )
        for t in tasks:
            yield from _read_partition(
                t, self._arrow_types, self._spark_types, self._col_order
            )


def _read_partition(
    partition: PyDeltaPartition, arrow_types, spark_types, col_order
) -> Iterator:
    """Executor-side read of one data file: schema-directed pyarrow
    read, physical->logical rename (nested included), DV application by
    row position, typed partition-value injection, arrow-type conforming,
    exact conjunct filtering, declared-order output. Shared by the batch
    reader and the log-tailing STREAM reader (same file semantics; the
    stream just scopes partitions to a commit range)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition is None:
        # partitions() pruned every file (e.g. a where-option literal
        # matching nothing): Spark still schedules one task with a
        # None partition — the correct output is zero batches
        return

    # schema-directed read: a pre-evolution file lacks columns added
    # later (merge_schema); request only what the footer has and
    # null-fill the rest — requesting a missing column would crash
    # the whole scan (ArrowInvalid), where Delta semantics say NULL
    # one ParquetFile open serves both the footer schema and the read
    pf = pq.ParquetFile(partition.file_path)
    if getattr(partition, "field_ids", None):
        # id mode: the file's column NAMES are arbitrary — resolve each
        # logical column through the footer's PARQUET:field_id metadata
        # (Spark's fieldId.read twin); an id absent from this footer is
        # a pre-evolution file -> null-fill like a missing column
        by_id: dict[int, str] = {}
        for fld in pf.schema_arrow:
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = fld.name
        file_to_logical = {}
        missing = []
        for logical, fid in partition.field_ids.items():
            fc = by_id.get(fid)
            if fc is None:
                missing.append(logical)
            else:
                file_to_logical[fc] = logical
    else:
        present = set(pf.schema_arrow.names)
        file_to_logical = {
            p: l for p, l in partition.phys_to_logical.items() if p in present
        }
        missing = [
            l
            for p, l in partition.phys_to_logical.items()
            if p not in present
        ]
    tbl = pf.read(columns=list(file_to_logical))
    tbl = tbl.rename_columns(
        [file_to_logical[c] for c in tbl.column_names]
    )
    # shredded variant columns (the reader declared a struct for a
    # log-VARIANT column): rebuild the struct from the typed_value
    # leaves BEFORE any name conforming — the file's {metadata, value,
    # typed_value} group is physical layout, not logical shape
    for idx, name in enumerate(tbl.column_names):
        dt = spark_types.get(name)
        if isinstance(dt, T.StructType) and _is_shredded_layout(
            tbl.column(idx).type
        ):
            arr = unshred_struct_array(
                tbl.column(idx).combine_chunks(), dt, _spark_to_arrow_type
            )
            tbl = tbl.set_column(idx, pa.field(name, arr.type), arr)
    # nested struct fields still carry PHYSICAL names after the
    # top-level rename — rebuild positionally to logical (column
    # mapping; same contract as DeltaTable.to_pandas)
    for idx, name in enumerate(tbl.column_names):
        dt = spark_types.get(name)
        if dt is not None and _arrow_names_differ(tbl.column(idx).type, dt):
            arr = _arrow_to_logical_names(
                tbl.column(idx).combine_chunks(), dt
            )
            tbl = tbl.set_column(idx, pa.field(name, arr.type), arr)
    for logical in missing:
        tbl = tbl.append_column(
            logical,
            pa.nulls(
                tbl.num_rows,
                type=arrow_types.get(logical) or pa.string(),
            ),
        )
    if partition.dv_rows:
        mask = np.ones(tbl.num_rows, dtype=bool)
        gone = np.asarray(partition.dv_rows, dtype=np.int64)
        mask[gone[gone < tbl.num_rows]] = False
        tbl = tbl.filter(pa.array(mask))
    if getattr(partition, "keep_rows", None) is not None:
        mask = np.zeros(tbl.num_rows, dtype=bool)
        kp = np.asarray(partition.keep_rows, dtype=np.int64)
        mask[kp[kp < tbl.num_rows]] = True
        tbl = tbl.filter(pa.array(mask))
    for name, val in partition.part_values.items():
        tbl = tbl.append_column(
            name,
            pa.array(
                [val] * tbl.num_rows,
                type=arrow_types.get(name) or pa.string(),
            ),
        )
    # conform every column to the Spark schema's arrow types (e.g.
    # ns->us timestamps); unknown types pass through untouched
    fields = []
    changed = False
    for fld in tbl.schema:
        want = arrow_types.get(fld.name)
        if want is not None and want != fld.type:
            fields.append(pa.field(fld.name, want))
            changed = True
        else:
            fields.append(fld)
    if changed:
        tbl = tbl.cast(pa.schema(fields))
    if getattr(partition, "change_type", None) is not None:
        tbl = tbl.append_column(
            "_change_type",
            pa.array([partition.change_type] * tbl.num_rows, type=pa.string()),
        )
    if getattr(partition, "commit_version", None) is not None:
        # decoupled from change_type: a spec CDC file CARRIES its own
        # _change_type column, but the commit version is always ours
        tbl = tbl.append_column(
            "_commit_version",
            pa.array(
                [partition.commit_version] * tbl.num_rows, type=pa.int64()
            ),
        )
    # claimed filters are OURS to enforce exactly (Spark no longer
    # re-evaluates them): vectorized arrow compute per conjunct
    if partition.conjuncts:
        import pyarrow.compute as pc

        for col, op, val in partition.conjuncts:
            field = pc.field(*col.split("."))
            expr = {
                "=": field == val,
                "<": field < val,
                "<=": field <= val,
                ">": field > val,
                ">=": field >= val,
            }[op]
            tbl = tbl.filter(expr)
    # Spark consumes these batches POSITIONALLY (the worker validates
    # names as a set but never reorders): null-filled and partition
    # columns were appended at the end, so the table MUST be put in
    # declared-schema order or values silently land in the wrong
    # columns (reproduced: a middle-column evolution swapped fields)
    tbl = tbl.select(col_order)
    yield from tbl.to_batches()


def _plan_cdf_partitions(
    table: DeltaTable,
    root: str,
    data_cols: dict[str, str],
    part_values_of,
    start_version: int,
    end_version: int,
    field_ids: dict[str, int] | None = None,
    conjuncts: list | None = None,
) -> list:
    """Change-feed read plan for versions in (start_version,
    end_version]: the SAME diff semantics as `DeltaTable.read_changes` —
    adds are inserts minus their own DV, a DV-carrying re-add of a live
    path emits only the newly-dead positions as deletes, a remove
    without re-add emits the file's then-live rows as deletes, and
    ``dataChange=false`` (OPTIMIZE) commits emit nothing. Commits that
    staged spec ``cdc`` actions are consumed EXCLUSIVELY from their
    ``_change_data/`` files (true update pre/post images). Shared by the
    streaming CDF source (per micro-batch) and the batch
    ``readChangeFeed`` reader (one [startingVersion, endingVersion]
    range).

    Per-path prior state replays from version 0 — O(log tail)
    driver-side JSON; a long-lived production stream would cache the
    live-set per checkpointed offset."""
    # mirror DeltaTable.read_changes: the prior-state replay is only
    # correct if every commit JSON up to end_version still exists —
    # after cleanup_metadata expires the prefix, a DV re-add of a
    # pre-checkpoint file would find prior=None and be emitted as a
    # full-file insert (double-reading live rows), and a remove of such
    # a file would emit no delete. A silently wrong feed is worse than
    # a loud refusal.
    missing = sorted(
        set(range(end_version + 1)) - set(table._commit_versions())
    )
    if missing:
        raise ValueError(
            f"change feed over versions 0..{end_version} needs every "
            f"commit JSON, but "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''} "
            "are not in the log (expired by cleanup_metadata?)"
        )
    live: dict[str, dict] = {}
    for v in table._commit_versions():
        if v > start_version:
            break
        for action in table._read_commit(v):
            if "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)

    def dv_rows(a: dict) -> set[int]:
        d = a.get("deletionVector")
        return set(_dv.resolve_dv_rows(root, d)) if d else set()

    out: list = []

    def part(add, v, change, keep=None, drop=()):
        out.append(
            PyDeltaPartition(
                os.path.join(root, urllib.parse.unquote(add["path"])),
                data_cols,
                part_values_of(add),
                sorted(drop),
                # row-level conjuncts only: change partitions carry no
                # file stats, so there is nothing sound to prune on —
                # the executor filter is exact either way
                list(conjuncts or []),
                keep_rows=sorted(keep) if keep is not None else None,
                change_type=change,
                commit_version=v,
                field_ids=field_ids,
                size_hint=add.get("size") or 0,
            )
        )

    for v in range(start_version + 1, end_version + 1):
        removed: dict[str, dict] = {}
        actions_v = table._read_commit(v)
        # spec cdc actions provide the commit's change rows directly
        # (incl. update pre/post images); use them EXCLUSIVELY and
        # only maintain file state from the add/remove actions
        cdc_in_commit = [a["cdc"] for a in actions_v if "cdc" in a]
        for action in actions_v:
            if "remove" in action:
                path = action["remove"]["path"]
                prior = live.pop(path, None)
                if prior is not None and action["remove"].get(
                    "dataChange", True
                ):
                    removed[path] = prior
        for action in actions_v:
            if "add" not in action:
                continue
            a = action["add"]
            prior = removed.pop(a["path"], None)
            live[a["path"]] = a
            if cdc_in_commit or not a.get("dataChange", True):
                continue
            new_dead = dv_rows(a)
            if prior is not None:
                delta = new_dead - dv_rows(prior)
                if delta:
                    part(a, v, "delete", keep=delta)
            else:
                part(a, v, "insert", drop=new_dead)
        if cdc_in_commit:
            cdc_cols = dict(data_cols)
            cdc_cols["_change_type"] = "_change_type"
            for c in cdc_in_commit:
                out.append(
                    PyDeltaPartition(
                        os.path.join(root, urllib.parse.unquote(c["path"])),
                        cdc_cols,
                        part_values_of(c),
                        [],
                        list(conjuncts or []),
                        change_type=None,  # the file carries its own
                        commit_version=v,
                        size_hint=c.get("size") or 0,
                    )
                )
            continue
        for _path, prior in sorted(removed.items()):
            part(prior, v, "delete", drop=dv_rows(prior))
    return out


class PyDeltaStreamReader(DataSourceStreamReader):
    """Log-tailing STREAMING source: ``spark.readStream.format("pydelta")``.

    This is the real Delta streaming-source shape (delta-spark's
    ``DeltaSource``): the OFFSET is the log version, each micro-batch
    reads exactly the commits in ``(start, end]``, and recovery replays
    from the checkpointed version — exactly-once across restarts comes
    from the log's version monotonicity, no file-listing heuristics.
    Unlike the file-stream twin (`DeltaTable.read_stream`), this source
    streams PARTITIONED and column-MAPPED tables too, because each
    partition ships its typed partition values and the physical->logical
    rename from the log instead of trusting directory layout.

    Append-only contract (delta-spark's default): a commit carrying
    data-changing ``remove`` actions or a DV re-add is refused
    mid-stream rather than silently resurrecting or double-reading
    rows. ``startingVersion`` (default 0) scopes the tail. Three
    relaxations, all delta-spark streaming-source semantics:

    - **Layout commits are skipped automatically** — a commit whose
      adds/removes all carry ``dataChange=false`` (OPTIMIZE / Z-ORDER /
      row-tracking backfill) rearranges bytes, not rows, so the stream
      emits nothing for it and keeps tailing (no option required;
      delta-spark's source does the same).
    - ``ignoreDeletes=true`` skips commits that ONLY delete data
      (dataChange removes, no dataChange adds — DELETE without DVs,
      partition drops, GDPR erasure). Rewrite commits still refuse.
    - ``skipChangeCommits=true`` skips ENTIRE commits that rewrite data
      (dataChange removes alongside adds — UPDATE/MERGE/DV deletes):
      their adds are NOT emitted, so downstream never double-reads a
      row that already streamed. The deprecated delta-spark
      ``ignoreChanges`` (which re-emits rewritten rows as duplicates)
      is refused with a pointer here — silent duplicates are the bug
      that option is deprecated for.

    ``where`` (simple-conjunction predicate, STRICT-parsed — a
    predicate that does not fully decompose errors up front, because on
    a stream silent under-filtering means wrong rows forever): data
    commits prune whole files by their logged footer stats AND filter
    rows exactly executor-side, the batch reader's contract; change-feed
    batches (``readChangeFeed=true``) filter rows only (change files
    carry no stats contract to prune on). The filter composes AFTER
    commit admission — skipped/refused-commit semantics are unchanged.

    Rate limiting (delta-spark's ``maxFilesPerTrigger`` /
    ``maxBytesPerTrigger``): each micro-batch admits whole commits until
    the file/byte budget is hit, always at least one commit (commit
    atomicity — a version never splits across batches, so a batch is
    still an exactly-once unit). This is the admission control that
    keeps steady-state tailing from ballooning: a burst of commits
    drains as several bounded batches instead of one huge one whose
    shuffle/state must fit in memory at once. Scope, documented rather
    than hidden (traced against Spark 4.1's runner): the Python
    DataSource API hands ``latestOffset`` no start offset and calls it
    BEFORE ``initialOffset``, so the admission cursor is only known
    from the second micro-batch of a run onward — the FIRST batch of
    every run (fresh or restart) is unbounded, and a
    ``trigger(availableNow=True)`` drain is a single unbounded batch
    (Spark's wrapper captures one end offset up front). Bounding the
    unknown-cursor case from ``startingVersion`` instead would be
    WRONG, not just weaker: on a restart it can emit an offset behind
    the checkpoint, and the next batch would replay committed rows.
    delta-spark's JVM source bounds every batch via ReadLimit — an API
    surface the Python DS lacks; semantics here are identical
    (exactly-once, no loss) with coarser admission.
    """

    def __init__(self, options: dict, schema: T.StructType) -> None:
        opts = _lower_opts(options)
        self._pack_opts = opts
        self._root = opts["path"]
        table = DeltaTable(self._root)
        meta, _adds = table._snapshot_state(None)  # validates protocol
        # id-mode column mapping: same per-file field-id resolution as
        # the batch reader — ship (logical -> field id) to every
        # partition, executors resolve through their file's footer
        self._field_ids: dict[str, int] | None = None
        if (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode"
        ) == "id":
            part_cols_id = meta.get("partitionColumns") or []
            self._field_ids = {
                f.name: int((f.metadata or {})["delta.columnMapping.id"])
                for f in T.StructType.fromJson(
                    json.loads(meta["schemaString"])
                ).fields
                if f.name not in part_cols_id
            }
        # options that would be SILENTLY ignored must refuse instead
        for bad in ("versionasof", "timestampasof"):
            if opts.get(bad) is not None:
                raise NotImplementedError(
                    f"option {bad!r} is not supported on the pydelta "
                    "STREAMING source (use startingVersion to scope the "
                    "tail, or the batch reader for point-in-time reads)"
                )
        # stream `where`: STRICT conjunct parse (the row filter below IS
        # the only application — a predicate that does not fully
        # decompose must error, never silently under-filter, which on a
        # stream means silently-wrong rows forever). Data commits prune
        # by file stats AND filter rows exactly; change-feed batches
        # filter rows only (change files carry no stats contract).
        where = opts.get("where")
        self._conjuncts: list[tuple[str, str, object]] = (
            _parse_conjuncts_strict(where) if where else []
        )
        self._phys_path = _phys_path_fn(meta)
        self._table = table
        self._schema = schema
        if DeltaTable._has_variant(schema):
            raise NotImplementedError(
                "the pydelta source cannot stream VARIANT columns "
                "(pyarrow does not recognize the parquet VARIANT logical "
                "type); use the Spark read path"
            )
        self._mapping = table._column_mapping(meta) or {}
        self._part_cols = meta.get("partitionColumns") or []
        self._start_version = int(opts.get("startingversion", "0"))
        self._cdf = str(opts.get("readchangefeed", "")).lower() == "true"
        self._ignore_deletes = (
            str(opts.get("ignoredeletes", "")).lower() == "true"
        )
        self._skip_change_commits = (
            str(opts.get("skipchangecommits", "")).lower() == "true"
        )
        if opts.get("ignorechanges") is not None:
            raise NotImplementedError(
                "ignoreChanges re-emits rewritten rows as silent "
                "duplicates (the behavior delta-spark deprecated it "
                "for); use skipChangeCommits=true, which skips rewrite "
                "commits entirely"
            )
        mft = opts.get("maxfilespertrigger")
        mbt = opts.get("maxbytespertrigger")
        self._max_files = int(mft) if mft is not None else None
        self._max_bytes = int(mbt) if mbt is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        if self._max_bytes is not None and self._max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        #: admission cursor: highest version already returned by
        #: latestOffset or planned by partitions (None until learned)
        self._pos: int | None = None
        log_schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        self._arrow_types = {
            f.name: _spark_to_arrow_type(f.dataType) for f in log_schema.fields
        }
        self._spark_types = {f.name: f.dataType for f in log_schema.fields}
        self._col_order = [f.name for f in log_schema.fields]
        if self._cdf:
            import pyarrow as pa

            self._arrow_types["_change_type"] = pa.string()
            self._arrow_types["_commit_version"] = pa.int64()
            self._col_order += ["_change_type", "_commit_version"]

    # ----------------------------------------------------------- offsets

    def initialOffset(self) -> dict:
        self._pos = self._start_version - 1
        return {"version": self._start_version - 1}

    def latestOffset(self) -> dict:
        latest = self._table.latest_version()
        if latest is None:
            return {"version": -1}
        if (
            (self._max_files is None and self._max_bytes is None)
            or self._pos is None  # restart: cursor unknown (see class doc)
            or self._pos >= latest
        ):
            self._pos = max(self._pos or -1, latest)
            return {"version": latest}
        # admit whole commits until the budget is spent; always >= 1
        files = bytes_ = 0
        end = self._pos
        for v in range(self._pos + 1, latest + 1):
            n = sz = 0
            for action in self._table._read_commit(v):
                add = action.get("add")
                # layout rewrites (dataChange=false) never emit rows, so
                # they must not eat the admission budget either
                if add is not None and add.get("dataChange", True):
                    n += 1
                    sz += int(add.get("size") or 0)
            if v > self._pos + 1 and (
                (self._max_files is not None and files + n > self._max_files)
                or (self._max_bytes is not None
                    and bytes_ + sz > self._max_bytes)
            ):
                break
            files += n
            bytes_ += sz
            end = v
            if (self._max_files is not None and files >= self._max_files) or (
                self._max_bytes is not None and bytes_ >= self._max_bytes
            ):
                break
        self._pos = end
        return {"version": end}

    def _data_cols_map(self) -> dict[str, str]:
        phys = lambda c: self._mapping.get(c, c)  # noqa: E731
        return {
            phys(f.name): f.name
            for f in self._schema.fields
            if f.name not in self._part_cols
            and f.name not in ("_change_type", "_commit_version")
        }

    def _part_values_of(self, add: dict) -> dict:
        phys = lambda c: self._mapping.get(c, c)  # noqa: E731
        pv_raw = _as_dict(add.get("partitionValues"))
        return {
            c: _coerce_partition_value(pv_raw.get(phys(c)), self._spark_types[c])
            for c in self._part_cols
        }

    def _cdf_partitions(self, start: dict, end: dict):
        """Change-feed micro-batch plan for versions (start, end] —
        shared diff semantics in `_plan_cdf_partitions` (the batch CDF
        reader plans through the same function)."""
        return _plan_cdf_partitions(
            self._table,
            self._root,
            self._data_cols_map(),
            self._part_values_of,
            start["version"],
            end["version"],
            field_ids=self._field_ids,
            # `where` composes with the change feed as ROW filtering
            # only — same contract as the batch CDF reader (change
            # partitions carry no file stats to prune on; the executor
            # conjunct filter is exact)
            conjuncts=self._conjuncts,
        )

    def partitions(self, start: dict, end: dict):
        # learn the cursor from the planned range (covers checkpoint
        # restarts, where initialOffset is never consulted)
        self._pos = max(self._pos if self._pos is not None else -1,
                        end["version"])
        if self._cdf:
            return _pack_partitions(
                self._cdf_partitions(start, end), self._pack_opts
            )
        out = []
        for v in range(start["version"] + 1, end["version"] + 1):
            actions = list(self._table._read_commit(v))
            # dataChange=false adds/removes (OPTIMIZE / Z-ORDER /
            # row-tracking backfill) rearrange bytes, not rows — the
            # streaming source never emits them (delta-spark semantics)
            removes_dc = [
                a["remove"]
                for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            adds_dc = [
                a["add"]
                for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            if removes_dc:
                if self._skip_change_commits:
                    continue  # skip the whole commit, adds included
                if self._ignore_deletes and not adds_dc:
                    continue  # delete-only commit (no rewritten rows)
                raise NotImplementedError(
                    f"commit {v} of {self._root} "
                    + (
                        "rewrites data (remove + add in one commit: "
                        "UPDATE/MERGE/DV delete); set "
                        "skipChangeCommits=true to skip rewrite commits, "
                        if adds_dc
                        else "deletes data; set ignoreDeletes=true to "
                        "skip delete-only commits, "
                    )
                    + "or re-stream from a fresh startingVersion"
                )
            for add in adds_dc:
                if add.get("deletionVector"):
                    # spec-compliant writers always pair a DV re-add
                    # with a remove (caught above); a bare one would
                    # double-read rows, so refuse defensively
                    raise NotImplementedError(
                        f"commit {v} adds a deletion vector without a "
                        "paired remove; streaming would double-read "
                        "rows — use the batch read path"
                    )
                if self._conjuncts and not _file_may_match(
                    add, self._conjuncts, self._part_cols, self._phys_path
                ):
                    # data-commit adds carry full footer stats: pruning
                    # here is the same soundness as the batch reader
                    # (a pruned file PROVABLY holds no matching row)
                    continue
                out.append(
                    PyDeltaPartition(
                        os.path.join(
                            self._root, urllib.parse.unquote(add["path"])
                        ),
                        self._data_cols_map(),
                        self._part_values_of(add),
                        [],
                        self._conjuncts,
                        field_ids=self._field_ids,
                        size_hint=add.get("size") or 0,
                    )
                )
        return _pack_partitions(out, self._pack_opts)

    def commit(self, end: dict) -> None:
        # offsets are durable in the query checkpoint; the log needs no
        # acknowledgement (reads are side-effect-free)
        return

    # ---------------------------------------------------------- execution

    def read(self, partition) -> Iterator:
        tasks = (
            partition.tasks
            if isinstance(partition, PyDeltaMultiPartition)
            else [partition]
        )
        for t in tasks:
            yield from _read_partition(
                t, self._arrow_types, self._spark_types, self._col_order
            )


# ------------------------------------------------------------------ writes


class PyDeltaCommitMessage(WriterCommitMessage):
    """Per-task result: the add-file payloads this task staged."""

    def __init__(self, adds: list[dict]) -> None:
        self.adds = adds


def _contains_struct(type_json) -> bool:
    if not isinstance(type_json, dict):
        return False
    if type_json.get("type") == "struct":
        return True
    if type_json.get("type") == "array":
        return _contains_struct(type_json.get("elementType"))
    if type_json.get("type") == "map":
        return _contains_struct(type_json.get("keyType")) or _contains_struct(
            type_json.get("valueType")
        )
    return False


def _phys_field_meta(md: dict, id_mode: bool) -> dict | None:
    if not id_mode:
        return None
    fid = md.get("delta.columnMapping.id")
    return (
        {b"PARQUET:field_id": str(fid).encode()} if fid is not None else None
    )


def _phys_array(arr, type_json, id_mode: bool):
    """Rebuild an arrow array with struct fields renamed logical ->
    PHYSICAL at every depth (and, id mode, parquet field ids stamped) —
    the write-direction twin of `delta._arrow_to_logical_names`. Struct
    children resolve BY LOGICAL NAME from the incoming frame (the
    schema-match validation already pinned names and order); structs
    inside ARRAY/MAP elements rebuild around the container's own
    validity/offset buffers, mirroring the read-direction rebuild —
    zero row data copied."""
    import pyarrow as pa

    if not isinstance(type_json, dict):
        return arr
    t = type_json.get("type")
    if t == "struct":
        children, fields = [], []
        for f in type_json.get("fields", []):
            md = f.get("metadata") or {}
            child = _phys_array(
                arr.field(f["name"]), f["type"], id_mode
            )
            children.append(child)
            fields.append(
                pa.field(
                    md.get("delta.columnMapping.physicalName", f["name"]),
                    child.type,
                    nullable=True,
                    metadata=_phys_field_meta(md, id_mode),
                )
            )
        mask = None
        if arr.null_count:
            import pyarrow.compute as pc

            mask = pc.is_null(arr)
        return pa.StructArray.from_arrays(children, fields=fields, mask=mask)
    if t == "array" and _contains_struct(type_json.get("elementType")) and (
        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
    ):
        values = _phys_array(arr.values, type_json["elementType"], id_mode)
        ef = arr.type.value_field
        mk = pa.large_list if pa.types.is_large_list(arr.type) else pa.list_
        new_type = mk(pa.field(ef.name, values.type, nullable=ef.nullable))
        return pa.Array.from_buffers(
            new_type,
            len(arr),
            arr.buffers()[:2],
            offset=arr.offset,
            children=[values],
        )
    if t == "map" and pa.types.is_map(arr.type) and (
        _contains_struct(type_json.get("keyType"))
        or _contains_struct(type_json.get("valueType"))
    ):
        keys = _phys_array(arr.keys, type_json["keyType"], id_mode)
        items = _phys_array(arr.items, type_json["valueType"], id_mode)
        new_type = pa.map_(keys.type, items.type)
        entries = pa.StructArray.from_arrays(
            [keys, items],
            fields=[
                pa.field("key", keys.type, nullable=False),
                pa.field("value", items.type, nullable=True),
            ],
        )
        return pa.Array.from_buffers(
            new_type,
            len(arr),
            arr.buffers()[:2],
            offset=arr.offset,
            children=[entries],
        )
    return arr


def _physical_table(tbl, schema_json: dict, id_mode: bool):
    """The whole-table form of `_phys_array`: every column lands under
    its physical name with physical nested fields (+ field ids in id
    mode), ready for `pq.write_table` — the staged footer then matches
    what the mapped readers (Spark positional cast, `to_pandas`,
    pydelta) resolve."""
    import pyarrow as pa

    cols, fields = [], []
    for f in schema_json["fields"]:
        md = f.get("metadata") or {}
        arr = tbl.column(f["name"]).combine_chunks()
        out = _phys_array(arr, f["type"], id_mode)
        cols.append(out)
        fields.append(
            pa.field(
                md.get("delta.columnMapping.physicalName", f["name"]),
                out.type,
                nullable=True,
                metadata=_phys_field_meta(md, id_mode),
            )
        )
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


def _check_constraint_violations(tbl, conjuncts) -> int:
    """Rows where the ANDed conjuncts evaluate FALSE — SQL CHECK
    semantics: a NULL comparison passes (Kleene), only a definite
    False violates."""
    import pyarrow as pa
    import pyarrow.compute as pc

    mask = None
    for col, op, val in conjuncts:
        arr = tbl.column(col)
        cmp = {
            "=": pc.equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }[op](arr, pa.scalar(val))
        mask = cmp if mask is None else pc.and_kleene(mask, cmp)
    if mask is None:
        return 0
    return pc.sum(
        pc.fill_null(pc.invert(mask.combine_chunks()), False)
    ).as_py() or 0


def _write_task_files(
    batches, root: str, partition_by: list[str],
    mapping_spec: tuple[str, bool] | None = None,
    constraints: list[tuple[str, list]] | None = None,
) -> list[dict]:
    """Executor-side: write this task's arrow batches as parquet data
    files DIRECTLY under the table root (Delta visibility == log
    membership, so there is no rename dance — an uncommitted file is
    invisible and vacuum reaps it) and return their ``add`` payloads.
    Partitioned tables get one file per partition tuple in this task,
    under the hive directory layout the batch reader expects.
    ``mapping_spec`` = (table schemaString, id_mode) for column-mapped
    targets: applied before anything touches disk, so file columns
    (nested struct fields included), footer stats keys, partitionValues
    keys, and hive directory segments are all PHYSICAL names — and in
    id mode every field carries its parquet field id."""
    import json
    import time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    batches = list(batches)
    if not batches:
        return []
    tbl = pa.Table.from_batches(batches)
    for cname, conjs in constraints or []:
        n_bad = _check_constraint_violations(tbl, conjs)
        if n_bad:
            raise ValueError(
                f"CHECK constraint {cname!r} violated by {n_bad} row(s) "
                "in this write (validated executor-side; nothing was "
                "committed)"
            )
    if mapping_spec is not None:
        schema_json = json.loads(mapping_spec[0])
        tbl = _physical_table(tbl, schema_json, mapping_spec[1])
        rename = {
            f["name"]: (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )
            for f in schema_json["fields"]
        }
        partition_by = [rename.get(c, c) for c in partition_by]
    now_ms = int(time.time() * 1000)
    adds: list[dict] = []

    def write_one(sub, rel_dir: str, part_values: dict) -> None:
        fname = f"part-{_uuid.uuid4().hex}.parquet"
        rel = f"{rel_dir}/{fname}" if rel_dir else fname
        dst = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        data = sub.drop_columns(partition_by) if partition_by else sub
        pq.write_table(data, dst)
        adds.append(
            {
                "path": urllib.parse.quote(rel, safe="/="),
                "partitionValues": part_values,
                "size": os.path.getsize(dst),
                "modificationTime": now_ms,
                "dataChange": True,
                "stats": json.dumps(_file_stats(pq.ParquetFile(dst).metadata)),
            }
        )

    if not partition_by:
        write_one(tbl, "", {})
        return adds
    cols = [tbl.column(c).to_pylist() for c in partition_by]
    groups: dict[tuple, list[int]] = {}
    for i, vals in enumerate(zip(*cols)):
        groups.setdefault(vals, []).append(i)
    for vals, idxs in sorted(groups.items(), key=lambda kv: str(kv[0])):
        sub = tbl.take(pa.array(idxs, type=pa.int64()))
        segs, pv = [], {}
        for c, v in zip(partition_by, vals):
            if v is None:
                segs.append(f"{c}={_HIVE_NULL}")
                pv[c] = None
            else:
                text = str(v)
                segs.append(f"{c}={urllib.parse.quote(text, safe='')}")
                pv[c] = text
        write_one(sub, "/".join(segs), pv)
    return adds


def _commit_written(
    root: str,
    messages,
    *,
    schema: T.StructType,
    partition_by: list[str],
    overwrite: bool,
    txn: tuple[str, int] | None,
) -> None:
    """Driver-side commit of the adds every task staged. With ``txn``
    (the streaming sink), a replayed batch is detected IN THE LOG and
    its staged files are deleted instead of committed — the delta-spark
    streaming-sink exactly-once protocol. A lost commit race on an
    APPEND retries against the new tail iff the interleaved commits are
    themselves pure appends (the JVM write path's blind-append rule —
    per attempt the version, txn replay check, and row-tracking ranges
    all re-derive against the fresh tail); overwrites and non-append
    interleavings surface `ConcurrentWriteError`, and the staged files
    are then orphans that `vacuum` reaps (same recovery story as a
    crashed writer)."""
    import json
    import time
    import uuid as _uuid

    adds = [a for m in messages if m is not None for a in m.adds]
    table = DeltaTable(root)

    def discard_staged() -> None:
        for a in adds:
            fp = os.path.join(root, urllib.parse.unquote(a["path"]))
            if os.path.exists(fp):
                os.remove(fp)

    n_rows = sum(json.loads(a["stats"])["numRecords"] for a in adds)
    for _attempt in range(20):
        last = table.latest_version()
        if txn is not None and last is not None:
            applied = table.last_txn_version(txn[0])
            if applied is not None and applied >= txn[1]:
                discard_staged()  # replayed batch: table unchanged
                return
        now_ms = int(time.time() * 1000)
        version = 0 if last is None else last + 1
        actions: list[dict] = []
        if txn is not None:
            actions.append(
                {
                    "txn": {
                        "appId": txn[0],
                        "version": txn[1],
                        "lastUpdated": now_ms,
                    }
                }
            )
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "WRITE",
                    "operationParameters": {
                        "mode": "Overwrite" if overwrite else "Append"
                    },
                    "operationMetrics": {
                        "numFiles": str(len(adds)),
                        "numOutputRows": str(n_rows),
                    },
                }
            }
        )
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": _uuid.uuid4().hex,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema.json(),
                        "partitionColumns": partition_by,
                        "configuration": {},
                        "createdTime": now_ms,
                    }
                }
            )
        if overwrite and last is not None:
            _meta, prior_adds = table._snapshot_state(None)
            for a in prior_adds:
                actions.append(
                    {
                        "remove": {
                            "path": a["path"],
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                        }
                    }
                )
        if last is not None:
            meta_rt, _a, _p, domains = table._snapshot_state_full(
                None, with_domains=True
            )
            if DeltaTable._row_tracking_enabled(meta_rt):
                # spec writer duty on row-tracking tables: every add
                # carries a fresh baseRowId range and the same commit
                # advances the high-water-mark domain (stable ids derive
                # as baseRowId + position); re-stamped per attempt so a
                # retry allocates above the WINNER's ranges
                hwm = table._stamp_fresh_row_ids(
                    adds, DeltaTable._rt_hwm(domains), version
                )
                actions.append(DeltaTable._rt_domain_action(hwm))
        actions.extend({"add": a} for a in adds)
        try:
            table._publish_or_conflict(version, actions, "WRITE")
            return
        except ConcurrentWriteError:
            if overwrite:
                discard_staged()
                raise
            latest = table.latest_version()
            for v2 in range(version, (latest or 0) + 1):
                for action in table._read_commit(v2):
                    if any(
                        k in action
                        for k in ("metaData", "protocol", "remove")
                    ):
                        discard_staged()
                        raise ConcurrentWriteError(
                            f"pydelta append on {root} conflicts with a "
                            f"concurrent non-append commit at version "
                            f"{v2}; rerun from a fresh snapshot"
                        )
            # pure-append tail: rebuild against it and retry
        except Exception:
            discard_staged()
            raise
    discard_staged()
    raise ConcurrentWriteError(
        f"pydelta append on {root} lost {20} consecutive commit races"
    )


def _validate_write_target(
    root: str, schema: T.StructType, partition_by: list[str],
    *, overwrite: bool = False,
) -> tuple[tuple[str, bool] | None, list[tuple[str, list]]]:
    """Fail fast ON THE DRIVER before any task runs: schema and
    partitioning must match an existing table exactly (the pydelta write
    path has no evolution support — `DeltaTable.write` does), and
    partition columns must exist in the frame. The same protocol gates
    every DeltaTable mutation enforces apply here too: a table fenced by
    a writer feature this client does not implement refuses the write,
    and an overwrite of a delta.appendOnly table is refused (it would
    silently remove every prior file). Returns the
    (schemaString, id_mode) mapping spec for column-mapped targets
    (None otherwise); the staging tasks apply it so file columns at
    every struct depth, stats, partitionValues, and hive dirs land
    under physical names — with parquet field ids in id mode."""
    if DeltaTable._has_variant(schema):
        raise NotImplementedError(
            "the pydelta writers cannot stage VARIANT columns (pyarrow "
            "has no parquet VARIANT encoder); use DeltaTable.write"
        )
    for c in partition_by:
        if c not in schema.fieldNames():
            raise ValueError(
                f"partition column {c!r} not in schema {schema.fieldNames()}"
            )
    table = DeltaTable(root)
    if table.latest_version() is None:
        return None, []
    meta, _, protocol = table._snapshot_state_full(None)
    DeltaTable._refuse_unknown_writer_features(protocol, "pydelta WRITE")
    if overwrite:
        DeltaTable._refuse_if_append_only(meta, "pydelta overwrite WRITE")
    mapping_spec: tuple[str, bool] | None = None
    mode = DeltaTable._mapping_mode(meta)
    if mode in ("name", "id"):
        # struct fields inside ARRAY/MAP elements rename too: both
        # rebuild directions now recurse through list/map children
        # (delta._arrow_to_logical_names / _phys_array), so no gate
        mapping_spec = (meta["schemaString"], mode == "id")
    conf = meta.get("configuration") or {}
    constraints: list[tuple[str, list]] = []
    for k in sorted(conf):
        if not k.startswith("delta.constraints."):
            continue
        expr = conf[k]
        try:
            conjs = _parse_conjuncts_strict(expr)
        except Exception:
            raise NotImplementedError(
                f"pydelta writes validate only simple-conjunction CHECK "
                f"constraints (col OP literal AND ...); {k!r} = {expr!r} "
                "does not decompose — a non-validating write would "
                "silently break the invariant; use DeltaTable.write"
            ) from None
        constraints.append((k[len("delta.constraints."):], conjs))
    if DeltaTable._generation_exprs(meta):
        raise NotImplementedError(
            "pydelta writes to tables with GENERATED columns are not "
            "supported (this writer neither computes nor validates "
            "generation expressions); use DeltaTable.write"
        )
    # row-tracked targets are supported: _commit_written stamps fresh
    # baseRowId ranges on the staged adds and bumps the high-water-mark
    # domain in the same commit (the spec's writer duty)
    prior = T.StructType.fromJson(json.loads(meta["schemaString"]))
    strip = DeltaTable._strip_meta
    if [
        (f.name, strip(f.dataType)) for f in prior.fields
    ] != [(f.name, strip(f.dataType)) for f in schema.fields]:
        raise ValueError(
            f"schema mismatch: table has {prior.simpleString()}, "
            f"write has {schema.simpleString()} (pydelta writes do not "
            "evolve schemas; use DeltaTable.write(merge_schema=True))"
        )
    table_parts = meta.get("partitionColumns") or []
    if partition_by != table_parts:
        raise ValueError(
            f"partitionBy {partition_by} != table's {table_parts}"
        )
    return mapping_spec, constraints


def _opt_partition_by(opts: dict) -> list[str]:
    return [c.strip() for c in opts.get("partitionby", "").split(",") if c.strip()]


class PyDeltaBatchWriter(DataSourceArrowWriter):
    """``df.write.format("pydelta")`` — append or overwrite, committed
    as ONE Delta transaction after every task reports its staged files
    (all-or-nothing: a failed task aborts and the staged files are
    removed; readers never observe a partial write)."""

    def __init__(
        self, options: dict, schema: T.StructType, overwrite: bool
    ) -> None:
        opts = _lower_opts(options)
        self._root = opts["path"]
        self._overwrite = overwrite
        self._partition_by = _opt_partition_by(opts)
        self._schema = schema
        self._mapspec, self._constraints = _validate_write_target(
            self._root, schema, self._partition_by, overwrite=overwrite
        )

    def write(self, iterator) -> PyDeltaCommitMessage:
        return PyDeltaCommitMessage(
            _write_task_files(
                iterator, self._root, self._partition_by, self._mapspec,
                self._constraints,
            )
        )

    def commit(self, messages) -> None:
        _commit_written(
            self._root,
            messages,
            schema=self._schema,
            partition_by=self._partition_by,
            overwrite=self._overwrite,
            txn=None,
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for a in m.adds:
                fp = os.path.join(self._root, urllib.parse.unquote(a["path"]))
                if os.path.exists(fp):
                    os.remove(fp)


class PyDeltaStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("pydelta")`` — the TRANSACTIONAL Delta
    streaming sink through the sanctioned API: every micro-batch commits
    with a ``txn`` action keyed (``txnAppId`` option, batchId), so a
    batch replayed after a crash between the Delta commit and the
    streaming checkpoint is detected in the log and skipped —
    exactly-once without foreachBatch. ``txnAppId`` defaults to a value
    DERIVED FROM THE CHECKPOINT LOCATION (delta-spark's sink keys on the
    per-query checkpoint the same way): a shared constant default would
    make two independent streams appending to the same table share the
    (appId, batchId) dedupe key, so whichever stream's batchId lagged
    would see its commits skipped as replays — silent data loss. With no
    checkpoint in the options either, the option is required."""

    def __init__(self, options: dict, schema: T.StructType) -> None:
        opts = _lower_opts(options)
        self._root = opts["path"]
        self._partition_by = _opt_partition_by(opts)
        self._schema = schema
        app_id = opts.get("txnappid")
        if app_id is None:
            ckpt = opts.get("checkpointlocation")
            if ckpt:
                app_id = "pydelta-stream-" + hashlib.sha256(
                    os.path.abspath(ckpt).encode("utf-8")
                ).hexdigest()[:16]
            else:
                raise ValueError(
                    "pydelta streaming sink needs an idempotence key "
                    "unique to this query: set .option('txnAppId', ...) "
                    "(no checkpointLocation option was visible to derive "
                    "one from)"
                )
        self._app_id = app_id
        self._mapspec, self._constraints = _validate_write_target(
            self._root, schema, self._partition_by
        )

    def write(self, iterator) -> PyDeltaCommitMessage:
        return PyDeltaCommitMessage(
            _write_task_files(
                iterator, self._root, self._partition_by, self._mapspec,
                self._constraints,
            )
        )

    def commit(self, messages, batchId: int) -> None:
        _commit_written(
            self._root,
            messages,
            schema=self._schema,
            partition_by=self._partition_by,
            overwrite=False,
            txn=(self._app_id, batchId),
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for a in m.adds:
                fp = os.path.join(self._root, urllib.parse.unquote(a["path"]))
                if os.path.exists(fp):
                    os.remove(fp)


def register(spark) -> None:
    """Register the source with a session: ``spark.read.format("pydelta")``.

    Data-source classes ship to Python workers via cloudpickle, which
    pickles classes BY REFERENCE when their module looks importable —
    but this engine is typically run from a repo path the workers don't
    have on sys.path. Registering the involved modules for BY-VALUE
    pickling makes the shipped source self-contained (the worker needs
    only pyspark/pyarrow/numpy, all installed)."""
    import sys

    from pyspark import cloudpickle

    from . import delta as _delta_mod
    from . import dv as _dv_mod
    from . import shredding as _shred_mod

    # EVERY module this one references at top level must be here: a
    # by-reference pickle of any of them reaches the worker as
    # "import cryptopulse_...", which fails off-repo (caught live when
    # the round-10 shredding import shipped without registration)
    for mod in (sys.modules[__name__], _delta_mod, _dv_mod, _shred_mod):
        cloudpickle.register_pickle_by_value(mod)
    spark.dataSource.register(PyDeltaDataSource)


class PyDeltaDataSource(DataSource):
    """``spark.read.format("pydelta")`` — register via
    :func:`register` (handles by-value pickling of this module)."""

    @classmethod
    def name(cls) -> str:
        return "pydelta"

    def schema(self) -> T.StructType:
        opts = _lower_opts(self.options)
        table = DeltaTable(opts["path"])
        if table.latest_version() is None:
            # a WRITE target that does not exist yet: the framework still
            # asks for a schema, but the writer takes the frame's own —
            # report empty rather than failing the whole write plan
            self._snapshot = None
            return T.StructType([])
        # resolve at the TRAVELED version: a schema-evolved table read at
        # an old version must expose that version's columns (the latest
        # schema would send executors after columns the old files lack)
        version = _resolve_version(table, opts)
        meta, adds = table._snapshot_state(version)
        # stash the replayed snapshot: reader() (same instance, possibly
        # pickled with this state) can then skip a second log replay
        self._snapshot = (version, meta, adds)
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        if str(opts.get("readchangefeed", "")).lower() == "true":
            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.LongType(), False),
                ]
            )
        return schema

    def reader(self, schema: T.StructType) -> PyDeltaReader:
        snap = getattr(self, "_snapshot", None)
        # clear the stash: the read-function closure pickles this
        # DataSource instance into every executor task, and the snapshot
        # holds the full adds list (linear in table size)
        self._snapshot = None
        return PyDeltaReader(dict(self.options), schema, snapshot=snap)

    def streamReader(self, schema: T.StructType) -> PyDeltaStreamReader:
        self._snapshot = None  # stream reads tail the log, never a snapshot
        return PyDeltaStreamReader(dict(self.options), schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> PyDeltaBatchWriter:
        self._snapshot = None
        return PyDeltaBatchWriter(dict(self.options), schema, overwrite)

    def streamWriter(
        self, schema: T.StructType, overwrite: bool
    ) -> PyDeltaStreamWriter:
        self._snapshot = None
        return PyDeltaStreamWriter(dict(self.options), schema)
