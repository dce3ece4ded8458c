"""The versioned-store Python DataSource must read the COMMITTED snapshot
(not the tearable mirror), honor the tombstone contract, and push
comparison filters into the Arrow scan."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from zeta_etl_spark.sources.json_source import read_json
from zeta_etl_spark.sources.versioned_store import (
    VersionedStoreReader,
    read_versioned_store,
)
from zeta_etl_spark.streaming.runner import foreach_batch_upsert

SCHEMA = "k string, ts timestamp, v double, deleted boolean"


def _write_json(path, rows, name):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _build_store(spark, tmp_path, deletes=None):
    src = str(tmp_path / "src")
    target = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_json(
        src,
        [
            {"k": "a", "ts": "2024-01-01 00:00:00", "v": 1.0, "deleted": False},
            {"k": "b", "ts": "2024-01-01 00:00:00", "v": 2.0, "deleted": False},
        ],
        "w1.json",
    )
    stream = read_json(spark, src, SCHEMA, streaming=True)
    foreach_batch_upsert(
        stream, target, ckpt, keys=["k"], sequence_by=["ts"],
        spark=spark, apply_as_deletes=deletes,
    )
    _write_json(
        src,
        [
            {"k": "a", "ts": "2024-01-02 00:00:00", "v": 10.0, "deleted": False},
            {"k": "c", "ts": "2024-01-02 00:00:00", "v": 3.0, "deleted": False},
            {"k": "b", "ts": "2024-01-02 00:00:00", "v": 0.0, "deleted": True},
        ],
        "w2.json",
    )
    stream = read_json(spark, src, SCHEMA, streaming=True)
    foreach_batch_upsert(
        stream, target, ckpt, keys=["k"], sequence_by=["ts"],
        spark=spark, apply_as_deletes=deletes,
    )
    return target


def test_reads_committed_snapshot_equals_mirror(spark, tmp_path):
    target = _build_store(spark, tmp_path)
    got = {
        r["k"]: r["v"] for r in read_versioned_store(spark, target).collect()
    }
    mirror = {
        r["k"]: r["v"] for r in spark.read.parquet(target).collect()
    }
    assert got == mirror == {"a": 10.0, "b": 0.0, "c": 3.0}


def test_survives_torn_mirror(spark, tmp_path):
    target = _build_store(spark, tmp_path)
    # tear the mirror mid-"rebuild": connector must not notice
    shutil.rmtree(target)
    os.makedirs(target)
    got = {
        r["k"]: r["v"] for r in read_versioned_store(spark, target).collect()
    }
    assert got == {"a": 10.0, "b": 0.0, "c": 3.0}


def test_tombstone_contract(spark, tmp_path):
    target = _build_store(spark, tmp_path, deletes="deleted")
    # raw committed store KEEPS the tombstone (late rows must not
    # resurrect the key) …
    raw = {
        r["k"]: r["deleted"]
        for r in read_versioned_store(spark, target).collect()
    }
    assert raw["b"] is True and len(raw) == 3
    # … and the reader-surface predicate filters it, matching the mirror
    filtered = {
        r["k"]
        for r in read_versioned_store(
            spark, target, delete_predicate="deleted"
        ).collect()
    }
    mirror = {r["k"] for r in spark.read.parquet(target).collect()}
    assert filtered == mirror == {"a", "c"}


def test_filter_pushdown_claims_and_filters(spark, tmp_path):
    target = _build_store(spark, tmp_path)
    df = read_versioned_store(spark, target).filter(F.col("k") == "a")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["v"] == 10.0
    # range predicate crosses the arrow boundary too
    df2 = read_versioned_store(spark, target).filter(F.col("v") >= 3.0)
    assert {r["k"] for r in df2.collect()} == {"a", "c"}

    # unit: the reader claims comparison/null/IN filters, returns the rest
    from pyspark.sql.datasource import EqualTo, StringContains

    reader = VersionedStoreReader({"path": target})
    remaining = list(
        reader.pushFilters(
            [EqualTo(("k",), "a"), StringContains(("k",), "x")]
        )
    )
    assert len(remaining) == 1
    assert isinstance(remaining[0], StringContains)
    assert reader._filter_expr is not None


def test_one_partition_per_committed_file(spark, tmp_path):
    target = _build_store(spark, tmp_path)
    reader = VersionedStoreReader({"path": target})
    parts = reader.partitions()
    ptr = open(target + ".version").read().strip()
    vdir = f"{target}__v{ptr}"
    n_files = len(
        [f for f in os.listdir(vdir) if f.endswith(".parquet")]
    )
    assert len(parts) == n_files >= 1


def test_writer_round_trip_and_atomic_republish(spark, tmp_path):
    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    path = str(tmp_path / "wstore")
    df1 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    write_versioned_store(df1, path)
    got = {r["k"]: r["v"] for r in read_versioned_store(spark, path).collect()}
    assert got == {i: 2 * i for i in range(100)}
    # plain-parquet readers get the mirror
    assert spark.read.parquet(path).count() == 100
    ver1 = open(path + ".version").read().strip()

    # second publish atomically supersedes: new pointer; the superseded
    # generation is RETAINED (readers that pinned it mid-commit finish
    # their scan), no staging dirs stranded
    df2 = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_versioned_store(df2, path)
    ver2 = open(path + ".version").read().strip()
    assert ver2 != ver1
    assert os.path.isdir(f"{path}__v{ver1}")  # one-generation retention
    got = {r["k"]: r["v"] for r in read_versioned_store(spark, path).collect()}
    assert got == {i: 3 * i for i in range(10)}
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if "__staging_" in d]

    # third publish vacuums generations older than the previous one
    write_versioned_store(df2, path)
    ver3 = open(path + ".version").read().strip()
    assert not os.path.isdir(f"{path}__v{ver1}")
    assert os.path.isdir(f"{path}__v{ver2}")
    assert os.path.isdir(f"{path}__v{ver3}")


def test_writer_interops_with_streaming_store(spark, tmp_path):
    """A batch publish over a store created by the STREAMING sink keeps the
    same pointer protocol — the committed snapshot simply advances."""
    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    target = _build_store(spark, tmp_path)
    snap = read_versioned_store(spark, target)
    replacement = snap.withColumn("v", F.col("v") + 100.0)
    write_versioned_store(replacement, target)
    got = {r["k"]: r["v"] for r in read_versioned_store(spark, target).collect()}
    assert got == {"a": 110.0, "b": 100.0, "c": 103.0}


def test_writer_rejects_append_mode(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "astore")
    spark.dataSource.register(
        __import__(
            "zeta_etl_spark.sources.versioned_store", fromlist=["x"]
        ).VersionedStoreDataSource
    )
    df = spark.range(3).select(F.col("id").alias("k"))
    with _pytest.raises(Exception, match="overwrite"):
        df.write.format("versioned_store").mode("append").option(
            "path", path
        ).save()


def test_float_predicates_not_pushed_nan_safe(spark, tmp_path):
    """Spark orders NaN above every double; pyarrow follows IEEE.  Float
    predicates must therefore stay Spark-side: the connector's result for
    v >= 2.0 over a store containing NaN must equal plain-parquet Spark
    semantics (NaN kept)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, EqualTo

    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    path = str(tmp_path / "nanstore")
    df = spark.createDataFrame(
        [("a", 1.0), ("b", float("nan")), ("c", 3.0)], "k string, v double"
    )
    write_versioned_store(df, path)
    got = {r["k"] for r in
           read_versioned_store(spark, path).filter(F.col("v") >= 2.0).collect()}
    want = {r["k"] for r in
            spark.read.parquet(path).filter(F.col("v") >= 2.0).collect()}
    assert got == want == {"b", "c"}  # NaN > 2.0 under Spark ordering

    # unit: float comparisons are returned to Spark, non-float ones claimed
    reader = VersionedStoreReader({"path": path})
    remaining = list(reader.pushFilters([
        GreaterThanOrEqual(("v",), 2.0), EqualTo(("k",), "a"),
    ]))
    assert len(remaining) == 1 and remaining[0].attribute == ("v",)
    assert reader._filter_expr is not None  # the k filter was claimed


def test_commit_heals_mirror_crash_debris(spark, tmp_path):
    """A crash between the two mirror renames leaves __mirror_old; the next
    commit must heal it instead of failing with ENOTEMPTY."""
    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    path = str(tmp_path / "healstore")
    df = spark.range(5).select(F.col("id").alias("k"))
    write_versioned_store(df, path)
    # simulate the crash window: a stranded old mirror and a stranded tmp
    os.makedirs(path + "__mirror_old")
    open(path + "__mirror_old/garbage", "w").write("x")
    os.makedirs(path + "__mirror_deadbeef")
    write_versioned_store(df, path)  # must not raise
    assert not os.path.isdir(path + "__mirror_old")
    assert not os.path.isdir(path + "__mirror_deadbeef")
    assert read_versioned_store(spark, path).count() == 5


def test_diff_versioned_store_change_feed(spark, tmp_path):
    """The generation diff must classify added/removed/changed keys between
    the retained previous snapshot and the committed one, and ignore
    unchanged keys."""
    from zeta_etl_spark.sources.versioned_store import (
        diff_versioned_store,
        write_versioned_store,
    )

    path = str(tmp_path / "dstore")
    v1 = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k string, v double"
    )
    write_versioned_store(v1, path)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        diff_versioned_store(spark, path, keys=["k"])  # no prior generation

    v2 = spark.createDataFrame(
        [("a", 1.0), ("b", 20.0), ("d", 4.0)], "k string, v double"
    )
    write_versioned_store(v2, path)
    diff = {
        r["k"]: (r["change"], r["old_v"], r["new_v"])
        for r in diff_versioned_store(spark, path, keys=["k"]).collect()
    }
    assert diff == {
        "b": ("changed", 2.0, 20.0),
        "c": ("removed", 3.0, None),
        "d": ("added", None, 4.0),
    }


def test_diff_handles_null_rows_tombstones_and_schema_change(spark, tmp_path):
    """Review regressions: presence comes from markers (an all-NULL row is
    not an absent row); tombstoned keys report as removed; a column added
    by the new generation reads as NULL on the old side."""
    from zeta_etl_spark.sources.versioned_store import (
        diff_versioned_store,
        write_versioned_store,
    )

    path = str(tmp_path / "nstore")
    v1 = spark.createDataFrame(
        [("a", None), ("b", 2.0), ("c", 3.0)], "k string, v double"
    )
    write_versioned_store(v1, path)
    # v2: 'a' (all-NULL values) removed; 'b' tombstoned; new column w added
    v2 = spark.createDataFrame(
        [("b", 2.0, True, 9.0), ("c", 3.0, False, 1.0)],
        "k string, v double, deleted boolean, w double",
    )
    write_versioned_store(v2, path)
    diff = {
        r["k"]: r["change"]
        for r in diff_versioned_store(
            spark, path, keys=["k"], delete_predicate="deleted"
        ).collect()
    }
    # 'a' existed with NULL v → its removal must be visible;
    # 'b' is tombstoned in v2 → removed; 'c' gained columns → changed
    assert diff == {"a": "removed", "b": "removed", "c": "changed"}


def test_equal_null_safe_null_maps_to_is_null(spark, tmp_path):
    """ADVICE r6: `attr <=> NULL` keeps NULL rows in Spark; the pushed
    pyarrow form must be is_null, never `field == None` (which evaluates
    null and drops them)."""
    import pyarrow.compute as pc

    from zeta_etl_spark.sources.versioned_store import EqualNullSafe, EqualTo

    target = _build_store(spark, tmp_path)
    reader = VersionedStoreReader({"path": target})
    expr = reader._arrow_expr(pc, EqualNullSafe(attribute=("k",), value=None))
    assert expr is not None and "is_null" in str(expr)
    # attr = NULL matches nothing in Spark — decline rather than translate
    assert reader._arrow_expr(pc, EqualTo(attribute=("k",), value=None)) is None


def test_push_filters_is_eager_not_generator(spark, tmp_path):
    """ADVICE r6: pushFilters must assign the claimed expression BEFORE the
    caller consumes the returned unclaimed list — a lazy generator would
    silently drop claimed filters under partial consumption."""
    from zeta_etl_spark.sources.versioned_store import EqualTo

    target = _build_store(spark, tmp_path)
    reader = VersionedStoreReader({"path": target})
    result = reader.pushFilters([EqualTo(attribute=("k",), value="a")])
    # NOT consumed yet — the claimed filter must already be installed
    assert reader._filter_expr is not None
    assert list(result) == []  # fully claimed


def test_heterogeneous_generation_schema_rejected(spark, tmp_path):
    """ADVICE r6: part files with diverging schemas inside one committed
    generation must fail loudly at reader construction, not mis-coerce at
    scan time."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    target = _build_store(spark, tmp_path)
    ptr = target + ".version"
    with open(ptr) as fh:
        ver = fh.read().strip()
    gen_dir = f"{target}__v{ver}"
    # plant a part file whose k column is an int, not a string
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64())}),
        os.path.join(gen_dir, "part-zz-bad.parquet"),
    )
    with pytest.raises(ValueError, match="heterogeneous"):
        VersionedStoreReader({"path": target})


# --- file-level data skipping (footer-stats sidecar) -------------------------


def _mk_range_store(spark, tmp_path):
    """4 part files with disjoint k ranges (range partitioning → tight
    per-file min/max), committed with the _stats.json sidecar."""
    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    path = str(tmp_path / "skipstore")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    ).repartitionByRange(4, "k")
    write_versioned_store(df, path)
    return path


def _reader_partitions(path, filters):
    reader = VersionedStoreReader({"path": path})
    unclaimed = reader.pushFilters(list(filters))
    return reader.partitions(), list(unclaimed)


def test_stats_sidecar_written_and_prunes_files(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNull

    path = _mk_range_store(spark, tmp_path)
    ver = open(path + ".version").read().strip()
    sidecar = os.path.join(f"{path}__v{ver}", "_stats.json")
    assert os.path.exists(sidecar)
    stats = json.load(open(sidecar))
    assert len(stats) == 4
    for st in stats.values():
        assert set(st["columns"]) >= {"k", "name"}
        assert st["columns"]["k"]["nulls"] == 0

    # point lookup: exactly one of the four range files can hold k=250
    parts, unclaimed = _reader_partitions(path, [EqualTo(("k",), 250)])
    assert unclaimed == []
    assert len(parts) == 1

    # open range: only the upper files survive
    parts, _ = _reader_partitions(path, [GreaterThan(("k",), 390)])
    assert len(parts) == 1

    # IsNull on a null-free column prunes EVERYTHING → one empty split
    parts, _ = _reader_partitions(path, [IsNull(("k",))])
    assert len(parts) == 1 and parts[0].path == ""


def test_skipped_scan_results_still_correct(spark, tmp_path):
    """End-to-end through the Spark surface: pruned scans return exactly
    the rows an unpruned scan would."""
    path = _mk_range_store(spark, tmp_path)
    df = read_versioned_store(spark, path)
    got = sorted(r.k for r in df.where("k >= 395 OR k = 7").collect())
    assert got == [7, 395, 396, 397, 398, 399]
    assert df.where("k = -5").count() == 0  # below every file's min
    assert df.where("k IS NULL").count() == 0


def test_stats_pruning_conservative_on_strings_and_in(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, In

    path = _mk_range_store(spark, tmp_path)
    # string stats recorded: name in [u0..u399] lexicographic — 'zzz' is
    # beyond every file's max, so all files prune
    parts, _ = _reader_partitions(path, [EqualTo(("name",), "zzz")])
    assert len(parts) == 1 and parts[0].path == ""
    # IN with one in-range value keeps that file
    parts, _ = _reader_partitions(path, [In(("k",), (9999, 5))])
    assert len(parts) == 1 and parts[0].path != ""
    # cross-type compare (str filter on int col) must keep every file
    parts, _ = _reader_partitions(path, [EqualTo(("k",), "250")])
    assert len(parts) == 4


def test_streaming_store_without_sidecar_unpruned(spark, tmp_path):
    """Stores committed by the foreachBatch sinks predate the sidecar —
    the reader must keep all files and still answer correctly."""
    from pyspark.sql.datasource import EqualTo

    target = _build_store(spark, tmp_path)
    parts, _ = _reader_partitions(target, [EqualTo(("k",), "a")])
    assert all(p.path for p in parts)
    df = read_versioned_store(spark, target)
    assert df.where("k = 'a'").count() == 1


def test_upstream_scan_cache_hazard(spark, tmp_path):
    """Pin the upstream python-data-source behavior the reader contract is
    written around: a FILTERLESS query on a reused DataFrame reuses the
    JVM-cached scan of the frame's previous FILTERED query (claimed
    filters + pruned files baked in), while per-query fresh frames and
    filtered queries always re-plan correctly.  If a Spark upgrade fixes
    the stale reuse, the first assertion flips and the one-frame-per-query
    warning in read_versioned_store can be dropped."""
    from zeta_etl_spark.sources.versioned_store import write_versioned_store

    path = str(tmp_path / "cachestore")
    df = spark.range(0, 100).select(F.col("id").alias("k")).repartition(4)
    write_versioned_store(df, path)

    reused = read_versioned_store(spark, path)
    assert reused.where("k = 5").count() == 1
    stale_total = reused.count()  # upstream: reuses the k=5 scan
    assert stale_total in (0, 1)  # NOT 100 — the documented hazard

    # filtered queries on the same frame re-plan and stay correct
    assert reused.where("k = 7").count() == 1
    assert reused.where("k >= 90").count() == 10

    # the engine pattern — fresh frame per query — is always correct
    assert read_versioned_store(spark, path).count() == 100
