"""Spark 4 Python DataSource reading the engine's versioned CDC/KV store.

The streaming upsert sinks (``streaming/runner.foreach_batch_upsert`` and
friends) commit state as ``{path}__v{ver}`` parquet directories named by an
atomically-replaced ``{path}.version`` pointer, plus a convenience mirror at
``{path}`` that can be torn mid-rebuild.  This connector is the CORRECT
reader surface: it resolves the pointer once per query plan and scans only
the committed version — never the mirror — so a reader racing a writer's
mirror rebuild still sees a complete, consistent snapshot.

Reference parity: the read side of the serving export
(``dfs-serving/zetadex-serving.py:25-235`` materializes gold tables into
DynamoDB; here the same committed snapshot is directly queryable in Spark).

Scale design: one :class:`InputPartition` per committed parquet file, so the
scan parallelizes across executors exactly like a native file source;
``pushFilters`` claims the comparison/null/IN predicates and evaluates them
as pyarrow dataset filters (row groups whose statistics exclude the
predicate are skipped — real pushdown, not post-filter), returning the rest
to Spark.  Batches are yielded as Arrow record batches (vectorized, no
per-row Python).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualNullSafe,
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
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _committed_dir(path: str) -> str:
    ptr = path + ".version"
    if not os.path.exists(ptr):
        raise FileNotFoundError(
            f"no committed version for versioned store at {path!r} "
            f"(missing pointer {ptr!r}); the store is created by "
            "foreach_batch_upsert / foreach_batch_topk"
        )
    with open(ptr) as fh:
        ver = fh.read().strip()
    vdir = f"{path}__v{ver}"
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"pointer names version {ver!r} but {vdir!r} is missing — "
            "store was vacuumed or moved out from under the pointer"
        )
    return vdir


def _list_parquet(vdir: str) -> list[str]:
    return sorted(
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _normalized_arrow_schema(files: list[str]):
    """Arrow schema of the store with timestamps coerced to microseconds —
    Spark's Arrow batch transfer rejects NANOSECOND (the unit pyarrow
    surfaces for Spark-written TIMESTAMP_NTZ parquet); truncation matches
    the engine-wide ns→us rule (datasets.load_table)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    sch = pads.dataset(files[0], format="parquet").schema
    # Heterogeneous part files would make read()'s cast fail or mis-coerce
    # at scan time with an opaque error (ADVICE r6): a committed generation
    # is written by independent tasks, and the snapshot writer tolerates
    # schema change ACROSS generations — validate all parts of THIS
    # generation against files[0] up front and fail with a clear message.
    for other in files[1:]:
        osch = pads.dataset(other, format="parquet").schema
        if osch.names != sch.names or any(
            a.type != b.type for a, b in zip(sch, osch)
        ):
            raise ValueError(
                f"versioned_store: committed generation has heterogeneous "
                f"part-file schemas: {files[0]} has {sch.names} "
                f"({[str(f.type) for f in sch]}), {other} has {osch.names} "
                f"({[str(f.type) for f in osch]}); the generation is "
                f"corrupt — restore a prior version"
            )
    fields = []
    for f in sch:
        t = f.type
        if pa.types.is_timestamp(t) and t.unit != "us":
            t = pa.timestamp("us", t.tz)
        fields.append(pa.field(f.name, t, f.nullable))
    return pa.schema(fields)


def _collect_file_stats(path: str) -> dict:
    """Per-column min/max/null-count for one part file, read from the
    parquet footer (no data scan).  Only top-level integer and string
    columns are recorded — the two types whose values round-trip JSON with
    ordering intact; floats (NaN ordering), timestamps, and binaries stay
    unrecorded and therefore never pruned on.  A column missing statistics
    in ANY row group is dropped (pruning on partial stats is unsound)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    per_col: dict[str, dict] = {}
    dropped: set[str] = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            name = col.path_in_schema
            if "." in name or name in dropped:
                continue  # nested leaves stay unpruned
            st = col.statistics
            if st is None or not st.has_null_count:
                dropped.add(name)
                per_col.pop(name, None)
                continue
            mn = st.min if st.has_min_max else None
            mx = st.max if st.has_min_max else None
            ok = (mn is None and mx is None) or (
                type(mn) in (int, str) and type(mx) in (int, str)
            )
            if not ok:
                dropped.add(name)
                per_col.pop(name, None)
                continue
            cur = per_col.setdefault(
                name, {"min": None, "max": None, "nulls": 0}
            )
            cur["nulls"] += st.null_count
            if mn is not None:
                cur["min"] = mn if cur["min"] is None else min(cur["min"], mn)
                cur["max"] = mx if cur["max"] is None else max(cur["max"], mx)
    return {"rows": md.num_rows, "columns": per_col}


def _stats_exclude_file(f, stats: dict) -> bool:
    """True iff the claimed filter ``f`` provably matches NO row of a file
    with footer ``stats`` — the file-level data-skipping predicate (what
    Delta/Iceberg evaluate against per-file stats before scheduling a scan
    task).  Conservative: any doubt (missing column, cross-type compare)
    keeps the file."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return False
    cs = stats["columns"].get(attr[0])
    if cs is None:
        return False
    mn, mx, nulls, rows = cs["min"], cs["max"], cs["nulls"], stats["rows"]
    try:
        if isinstance(f, IsNull):
            return nulls == 0
        if isinstance(f, IsNotNull):
            return nulls == rows
        if isinstance(f, EqualNullSafe) and f.value is None:
            return nulls == 0
        if mn is None or mx is None:
            return False  # all-null column: only null-ness is decidable
        if isinstance(f, (EqualTo, EqualNullSafe)):
            return f.value < mn or f.value > mx
        if isinstance(f, GreaterThan):
            return mx <= f.value
        if isinstance(f, GreaterThanOrEqual):
            return mx < f.value
        if isinstance(f, LessThan):
            return mn >= f.value
        if isinstance(f, LessThanOrEqual):
            return mn > f.value
        if isinstance(f, In):
            vals = [v for v in f.value if v is not None]
            return all(v < mn or v > mx for v in vals)
    except TypeError:
        return False  # JSON value type ≠ filter value type — keep the file
    return False


@dataclass
class _FilePartition(InputPartition):
    path: str


class VersionedStoreReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("versioned_store requires .option('path', ...)")
        # pin the committed snapshot ONCE per query plan: every partition
        # reads the same version and a half-written dir is never visible
        # (the pointer only ever names complete dirs).  Pinning does NOT
        # keep files alive against a concurrent writer's vacuum — the
        # writer therefore retains one superseded generation (see
        # VersionedStoreWriter.commit); scans outliving TWO commits need a
        # longer retention policy, the same seam Delta's VACUUM exposes.
        vdir = _committed_dir(path)
        self._files = _list_parquet(vdir)
        self._arrow_schema = (
            _normalized_arrow_schema(self._files) if self._files else None
        )
        self._filter_expr = None  # pyarrow expression, built in pushFilters
        self._claimed: list[Filter] = []  # for file-level stats pruning
        # footer-stats sidecar written at commit ({file → min/max/nulls});
        # stores committed before the sidecar existed simply never prune
        self._file_stats: dict[str, dict] = {}
        stats_path = os.path.join(vdir, "_stats.json")
        if os.path.exists(stats_path):
            import json

            try:
                with open(stats_path) as fh:
                    self._file_stats = json.load(fh)
            except (OSError, ValueError):
                self._file_stats = {}

    def pushFilters(self, filters: list[Filter]):
        # EAGER, not a generator (ADVICE r6): with a lazy generator,
        # self._filter_expr is only assigned once Spark fully drains the
        # returned iterator — partial consumption by a future Spark version
        # would silently drop claimed filters (wrong results, no error).
        # Build both lists up front and return the unclaimed list.
        import pyarrow.compute as pc

        claimed = None
        unclaimed: list[Filter] = []
        for f in filters:
            expr = self._arrow_expr(pc, f)
            if expr is None:
                unclaimed.append(f)  # unsupported — Spark evaluates post-scan
            else:
                claimed = expr if claimed is None else claimed & expr
                self._claimed.append(f)
        self._filter_expr = claimed
        return unclaimed

    def _is_floating(self, name: str) -> bool:
        import pyarrow as pa

        if self._arrow_schema is None:
            return True  # no schema → refuse, stay Spark-side
        field = self._arrow_schema.field(name) if name in self._arrow_schema.names else None
        return field is None or pa.types.is_floating(field.type)

    def _arrow_expr(self, pc, f: Filter):
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:
            return None  # nested paths stay Spark-side
        # NEVER claim predicates on floating-point columns: Spark orders
        # NaN greater than every value and treats NaN = NaN as true,
        # while pyarrow follows IEEE (NaN compares false) — claiming the
        # filter would silently drop NaN rows Spark must keep (verified
        # live in review).  Float predicates stay Spark-side.
        if self._is_floating(attr[0]):
            return None
        field = pc.field(attr[0])
        if isinstance(f, EqualNullSafe):
            # attr <=> NULL is TRUE for null rows in Spark; pyarrow's
            # `field == None` evaluates null and would DROP them (ADVICE
            # r6) — map the null case to is_null explicitly
            if f.value is None:
                return field.is_null()
            return field == f.value
        if isinstance(f, EqualTo):
            # attr = NULL matches nothing in Spark; decline rather than
            # rely on pyarrow null propagation matching that exactly
            if f.value is None:
                return None
            return field == f.value
        if isinstance(f, GreaterThan):
            return field > f.value
        if isinstance(f, GreaterThanOrEqual):
            return field >= f.value
        if isinstance(f, LessThan):
            return field < f.value
        if isinstance(f, LessThanOrEqual):
            return field <= f.value
        if isinstance(f, In):
            return field.isin(list(f.value))
        if isinstance(f, IsNull):
            return field.is_null()
        if isinstance(f, IsNotNull):
            return ~field.is_null()
        return None

    def partitions(self):
        if not self._files:
            return [_FilePartition("")]  # one empty split keeps read() simple
        # file-level data skipping: drop whole part files whose footer
        # stats prove no row can match the claimed filters — the task is
        # never scheduled, the footer is never even opened executor-side
        # (Delta/Iceberg data skipping; at 100 TB this is the difference
        # between "scan the key range's files" and "open every footer")
        files = self._files
        if self._claimed and self._file_stats:
            files = [
                p
                for p in files
                if not any(
                    _stats_exclude_file(f, st)
                    for st in (self._file_stats.get(os.path.basename(p)),)
                    if st is not None
                    for f in self._claimed
                )
            ]
        if not files:
            return [_FilePartition("")]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        import pyarrow.dataset as pads

        ds = pads.dataset(partition.path, format="parquet")
        for batch in ds.to_batches(filter=self._filter_expr):
            yield batch.cast(self._arrow_schema)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    n_rows: int
    stats: dict | None = None


class VersionedStoreWriter(DataSourceArrowWriter):
    """Two-phase-commit snapshot publisher (the batch write side of the
    store): each task streams its Arrow batches into a parquet file under a
    job-private staging dir and reports it in the commit message; the
    driver's ``commit`` promotes the staged files to a fresh
    ``{path}__v{ver}`` dir, rebuilds the convenience mirror, and publishes
    with the same atomic pointer replace the streaming sinks use — readers
    see the old snapshot or the new one, never a mix.  ``abort`` removes
    the staging dir, so failed jobs leave the committed snapshot untouched.
    This is the same task-stage / driver-publish protocol a real
    distributed object-store sink commits with.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("versioned_store requires .option('path', ...)")
        if not overwrite:
            raise ValueError(
                "versioned_store writes are snapshot publishes — use "
                "mode('overwrite'); incremental merge is the streaming "
                "upsert sink's job (foreach_batch_upsert)"
            )
        import uuid

        self._path = path
        self._staging = f"{path}__staging_{uuid.uuid4().hex}"

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self._staging, exist_ok=True)
        out = os.path.join(self._staging, f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            n += batch.num_rows
        if writer is None:
            return _StagedFile(path="", n_rows=0)  # empty task, nothing staged
        writer.close()
        # footer stats ride the commit message task→driver (a metadata-only
        # read of the file this task just wrote) and become the generation's
        # _stats.json — the reader's file-skipping index
        return _StagedFile(path=out, n_rows=n, stats=_collect_file_stats(out))

    def commit(self, messages):
        """Publish the staged task files as a new committed generation.

        MULTI-WRITER safe (r8, closing the ADVICE r6 single-writer
        contract): the whole publish — debris heal, generation promote,
        mirror rebuild, pointer replace, vacuum — runs under an exclusive
        ``flock`` on ``{path}.commitlock``, the same serialization the
        Pipeline generation writer uses.  Task-side data writes (the
        expensive part) stay unlocked and job-private; the critical section
        is metadata + one mirror copy.  Concurrent commits serialize:
        last-committer-wins on the pointer (snapshot publishes carry no
        read dependency, so there is nothing to CAS against), each
        writer's generation survives at least one subsequent commit
        (reader-pin retention), and the lock dies with its process.
        Cross-host deployments replace this seam with a transaction log
        (Delta/Iceberg) — documented, same as Pipeline._seal_and_publish."""
        import fcntl
        import shutil
        import uuid

        base = os.path.basename(self._path)
        parent = os.path.dirname(self._path) or "."
        with open(self._path + ".commitlock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            self._commit_locked(messages, base, parent, shutil, uuid)

    def _commit_locked(self, messages, base, parent, shutil, uuid):
        # heal crash debris from a previous commit before touching anything:
        # a crash between the two mirror renames leaves __mirror_old (which
        # would make os.replace below fail with ENOTEMPTY) and a crash
        # during copytree leaves a stranded uuid __mirror_* tmp dir.  Safe
        # under concurrency: commits are serialized by the flock, so no
        # OTHER writer can be inside its mirror window now.
        for d in os.listdir(parent):
            if d.startswith(f"{base}__mirror"):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)

        staged = {m.path: m.stats for m in messages if m and m.path}
        ver = f"w{uuid.uuid4().hex[:12]}"
        new_dir = f"{self._path}__v{ver}"
        os.makedirs(new_dir, exist_ok=True)
        stats_map: dict[str, dict] = {}
        for i, src in enumerate(sorted(staged)):
            final = f"part-{i:05d}.parquet"
            os.replace(src, os.path.join(new_dir, final))
            if staged[src] is not None:
                stats_map[final] = staged[src]
        if stats_map:
            import json

            with open(os.path.join(new_dir, "_stats.json"), "w") as fh:
                json.dump(stats_map, fh)
        shutil.rmtree(self._staging, ignore_errors=True)
        # mirror before pointer: a torn mirror is recoverable from the
        # committed version, a torn version dir named by the pointer is not
        mirror_tmp = f"{self._path}__mirror_{uuid.uuid4().hex[:8]}"
        shutil.copytree(new_dir, mirror_tmp)
        old_mirror = f"{self._path}__mirror_old"
        if os.path.isdir(self._path):
            os.replace(self._path, old_mirror)
        os.replace(mirror_tmp, self._path)
        shutil.rmtree(old_mirror, ignore_errors=True)
        ptr = self._path + ".version"
        old_ver = None
        if os.path.exists(ptr):
            with open(ptr) as fh:
                old_ver = fh.read().strip()
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(ver)
        os.replace(tmp, ptr)  # atomic publish
        # retention: keep the immediately superseded generation alive so a
        # reader that pinned it mid-commit can finish its scan; vacuum only
        # generations older than that (reader-side contract above)
        keep = {f"{base}__v{ver}"}
        if old_ver is not None:
            keep.add(f"{base}__v{old_ver}")
        for d in os.listdir(parent):
            if d.startswith(f"{base}__v") and d not in keep:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class VersionedStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_store"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _list_parquet(_committed_dir(self.options["path"]))
        if not files:
            raise ValueError(
                "committed version is empty; pass .schema(...) explicitly"
            )
        return from_arrow_schema(_normalized_arrow_schema(files))

    def reader(self, schema: StructType) -> VersionedStoreReader:
        return VersionedStoreReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> VersionedStoreWriter:
        return VersionedStoreWriter(dict(self.options), overwrite)


def write_versioned_store(df: DataFrame, path: str) -> None:
    """Publish ``df`` as the store's next committed snapshot (two-phase:
    task-staged parquet + driver-side atomic pointer replace)."""
    spark = df.sparkSession
    spark.dataSource.register(VersionedStoreDataSource)
    (
        df.write.format("versioned_store")
        .mode("overwrite")
        .option("path", path)
        .save()
    )


def read_versioned_store(
    spark: SparkSession, path: str, delete_predicate: str | None = None
) -> DataFrame:
    """Load the committed snapshot of a versioned store.

    ``delete_predicate`` mirrors the sink's ``apply_as_deletes``: tombstones
    persist in the store (so late rows cannot resurrect a deleted key) and
    are filtered only at this reader surface, NULL predicate = kept — the
    same contract the mirror applies.

    SIDE EFFECT: enables ``spark.sql.python.filterPushdown.enabled``
    SESSION-WIDE (Spark hard-errors on any reader implementing pushFilters
    while it is off).  ``session.get_spark`` sets it at build time; this
    runtime set covers externally created sessions (e.g. the driver
    harness).  It changes behavior only for Python data sources that
    implement pushFilters — the built-in file sources ignore it.

    ONE-FRAME-PER-QUERY contract (found live in r7, pinned by
    tests/test_versioned_store_source.py::test_upstream_scan_cache_hazard):
    Spark's python-data-source planner caches the planned scan on the
    loaded relation and REUSES it for a later query on the same DataFrame
    when that query pushes no filters — including the previous query's
    claimed filters and pruned file list baked into the cache.  A reused
    frame answering ``df.where("k = 5")`` and then ``df.count()`` returns
    a filtered count.  Queries that carry any filter re-plan from a fresh
    reader and are unaffected.  This function builds a fresh relation per
    call, so the safe pattern is simply to call it per query (what every
    engine surface does); it cannot be fixed reader-side because the
    stale-reuse path never re-enters Python.
    """
    spark.dataSource.register(VersionedStoreDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("versioned_store").option("path", path).load()
    if delete_predicate:
        df = df.filter(~F.coalesce(F.expr(delete_predicate), F.lit(False)))
    return df


def _generation_dirs(path: str) -> tuple[str, str | None]:
    """(current_dir, previous_dir) resolved from ONE pointer read — a
    commit landing between two separate reads could pair a fresh current
    with a just-vacuumed previous (TOCTOU, review finding)."""
    base = os.path.basename(path)
    parent = os.path.dirname(path) or "."
    with open(path + ".version") as fh:
        cur = fh.read().strip()
    cur_dir = os.path.join(parent, f"{base}__v{cur}")
    gens = [
        d
        for d in os.listdir(parent)
        if d.startswith(f"{base}__v") and d != f"{base}__v{cur}"
    ]
    if len(gens) > 1:
        raise RuntimeError(
            f"multiple superseded generations for {path!r}: {sorted(gens)} — "
            "a crashed commit left debris; vacuum manually"
        )
    prev_dir = os.path.join(parent, gens[0]) if gens else None
    return cur_dir, prev_dir


def diff_versioned_store(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    delete_predicate: str | None = None,
) -> DataFrame:
    """Change feed between the two retained generations of a store: one row
    per key that was ADDED, REMOVED, or CHANGED by the latest publish
    (``change`` column), with every non-key column carried in ``old_`` /
    ``new_`` pairs left NULL on the missing side.

    Presence is tracked with explicit marker columns, NOT value null-ness
    (an all-NULL row and an absent row are different things), so all-key
    stores and NULL-valued rows classify correctly.  ``delete_predicate``
    applies the sink's tombstone contract to BOTH generations: a key
    tombstoned by the latest publish reports as ``removed``.  Column sets
    may differ between generations (the snapshot writer permits schema
    change); columns missing on one side read as NULL there.

    Scale: a full outer join on the key columns — shuffles both snapshot
    sides on the key, no driver-side state.  Raises if no previous
    generation is retained (first publish, or debris from a crashed
    commit).
    """
    cur_dir, prev_dir = _generation_dirs(path)
    if prev_dir is None:
        raise FileNotFoundError(
            f"no superseded generation retained for {path!r} (first publish?)"
        )
    new = spark.read.parquet(cur_dir)
    old = spark.read.parquet(prev_dir)
    if delete_predicate:
        from pyspark.errors import AnalysisException

        alive = ~F.coalesce(F.expr(delete_predicate), F.lit(False))
        # a generation written before the tombstone column existed has no
        # tombstones — skip the filter on a side that can't resolve it
        for name in ("new", "old"):
            df = new if name == "new" else old
            try:
                df = df.filter(alive)
            except AnalysisException:
                continue
            if name == "new":
                new = df
            else:
                old = df
    val_cols = sorted(
        (set(new.columns) | set(old.columns)) - set(keys)
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [
            (F.col(c) if c in df.columns else F.lit(None)).alias(f"{tag}_{c}")
            for c in val_cols
        ]
        return df.select(*keys, *cols, F.lit(True).alias(f"_{tag}_present"))

    j = side(old, "old").join(side(new, "new"), list(keys), "full_outer")
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    old_p = F.coalesce(F.col("_old_present"), F.lit(False))
    new_p = F.coalesce(F.col("_new_present"), F.lit(False))
    change = (
        F.when(~old_p & new_p, "added")
        .when(old_p & ~new_p, "removed")
        .when(changed, "changed")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .drop("_old_present", "_new_present")
    )
