"""Pluggable key-value serving sink — the engine's replacement for the
reference's DynamoDB export layer (dfs-serving/zetadex-serving.py:25-235,
zetadex-serving-v2.py:25-235).

The reference creates DynamoDB tables with composite keys (`timestamp#asset`,
`metric#timePeriod`), LSIs/GSIs, converts timestamps to unix seconds, adds a
TTL column, and batch-writes.  Here the key design is explicit metadata; the
default backend materializes the exact serving frame to parquet plus a JSON
sidecar describing the table/keys/indexes, and the write seam
(`KeyValueSink.write`) is where a boto3/DynamoDB (or Redis/Cassandra) backend
plugs in.

Scale notes: the export frame is repartitioned by partition key so a real KV
writer gets key-local batches (no hot-partition fan-in); `write_batch_size`
and `throughput` mirror the reference's knobs (:199-200) and are forwarded to
backends as hints.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zeta_etl_spark.operators.reshape import (
    camel_case_columns,
    timestamps_to_unix,
    to_camel_case,
)


@dataclass
class KVTableSpec:
    table_name: str
    partition_key: Sequence[str]  # columns concatenated with '#'
    sort_key: Sequence[str] = ()
    local_secondary_indexes: dict[str, Sequence[str]] = field(default_factory=dict)
    global_secondary_indexes: dict[str, Sequence[str]] = field(default_factory=dict)
    ttl: str | None = None  # interval expr, e.g. "interval 2 weeks" (S10)
    # the timestamp column TTL is anchored to — REQUIRED when ttl is set (the
    # reference anchors TTL to a specific column, zetadex-serving.py:457;
    # inferring "first timestamp column" would silently depend on schema order)
    ttl_anchor: str | None = None
    write_batch_size: int = 25
    throughput: int = 100


def build_export_frame(df: DataFrame, spec: KVTableSpec) -> DataFrame:
    """Reshape a gold frame into the KV export layout: composite pk/sk,
    camelCase attributes, unix timestamps, TTL column."""
    out = df
    if spec.ttl:
        if not spec.ttl_anchor:
            raise ValueError(
                f"KVTableSpec({spec.table_name!r}): ttl={spec.ttl!r} requires "
                "an explicit ttl_anchor column — picking the first timestamp "
                "column would make expiry depend on schema order"
            )
        if spec.ttl_anchor not in df.columns:
            raise ValueError(
                f"KVTableSpec({spec.table_name!r}): ttl_anchor "
                f"{spec.ttl_anchor!r} not in frame columns {df.columns}"
            )
        out = out.withColumn(
            "expiry", F.col(spec.ttl_anchor) + F.expr(spec.ttl)
        )
    # unix-convert first so composite keys serialize epoch seconds, matching
    # the reference's `timestamp#asset` key encoding (zetadex-serving.py:353)
    out = timestamps_to_unix(out)
    pk = F.concat_ws("#", *[F.col(c).cast("string") for c in spec.partition_key])
    out = out.withColumn("pk", pk)
    if spec.sort_key:
        sk = F.concat_ws("#", *[F.col(c).cast("string") for c in spec.sort_key])
        out = out.withColumn("sk", sk)
    return camel_case_columns(out)


class KeyValueSink:
    """Backend seam: subclass and override ``write`` for a real KV store."""

    def write(self, export_df: DataFrame, spec: KVTableSpec, target: str) -> None:
        raise NotImplementedError


class ParquetKVSink(KeyValueSink):
    """Default backend: parquet + key-design sidecar, repartitioned by pk.

    ``mode="put"`` (default) reproduces DynamoDB's actual write semantic:
    PutItem overwrites PER KEY, so a repeated serving export MERGES into
    the existing table — incoming items replace same-key items, all other
    items survive (the reference re-exports gold slices on a schedule,
    dfs-serving/zetadex-serving.py:224-232; on DynamoDB that accumulates
    by key, it does not truncate the table).  ``mode="recreate"`` is the
    explicit delete-table-and-rewrite path.

    The merge is one left-anti join of the existing table against the
    incoming keys plus a union — at serving scale (bounded gold exports)
    the incoming side broadcasts; the table side never shuffles."""

    def write(
        self,
        export_df: DataFrame,
        spec: KVTableSpec,
        target: str,
        mode: str = "put",
    ) -> None:
        if mode not in ("put", "recreate"):
            raise ValueError(f"mode must be put|recreate, got {mode!r}")
        path = os.path.join(target, spec.table_name)
        # crash recovery: a kill between the two swap renames below
        # leaves the table only at __old — restore it BEFORE reading,
        # or the merge base would silently vanish
        _old = path + "__old"
        if not os.path.exists(path) and os.path.exists(_old):
            os.rename(_old, path)
        keys = ["pk"] + (["sk"] if spec.sort_key else [])
        # duplicate keys INSIDE one export are rejected, exactly as
        # DynamoDB's BatchWriteItem rejects duplicate keys in one call —
        # silently keeping "one of them" would be nondeterministic
        dup = (
            export_df.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"export contains duplicate primary keys (e.g. "
                f"{tuple(dup[0][k] for k in keys)}); de-duplicate per "
                "key before exporting — BatchWriteItem semantics"
            )
        out = export_df
        # merge gate is the TABLE's existence, not the sidecar's: a crash
        # in an older writer between the swap and the (then post-swap)
        # sidecar write left a live table without its sidecar, and gating
        # on the sidecar silently TRUNCATED that table on the next put
        if mode == "put" and os.path.exists(path):
            spark = export_df.sparkSession
            existing = spark.read.parquet(path)
            survivors = existing.join(
                F.broadcast(export_df.select(*keys).distinct()),
                on=keys,
                how="left_anti",
            )
            out = survivors.unionByName(export_df, allowMissingColumns=False)
        # rewrite via a side directory: the source scan (existing) reads
        # the live path, so writing over it in place would clobber inputs
        tmp = path + "__putting"
        (
            out.repartition(F.col("pk"))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # the sidecar travels WITH the data — written into the staging dir
        # before the swap, so no crash point can leave a live table missing
        # it (Spark's parquet reader ignores underscore-prefixed files)
        meta = {
            "table_name": spec.table_name,
            "partition_key": list(spec.partition_key),
            "sort_key": list(spec.sort_key),
            "lsi": {k: list(v) for k, v in spec.local_secondary_indexes.items()},
            "gsi": {k: list(v) for k, v in spec.global_secondary_indexes.items()},
            "ttl": spec.ttl,
            "write_batch_size": spec.write_batch_size,
            "throughput": spec.throughput,
        }
        with open(os.path.join(tmp, "_kv_table_spec.json"), "w") as f:
            json.dump(meta, f, indent=2)
        import shutil

        # two-rename swap (not rmtree-then-replace): every crash point
        # leaves either the old table or the verified rewrite on disk;
        # the residual __old dir is cleaned up by the next write
        old = path + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)


def estimate_write_plan(export_df: DataFrame, spec: KVTableSpec) -> dict:
    """Distributed write-plan accounting for a real DynamoDB backend —
    the numbers a boto3 ``foreachPartition`` writer needs BEFORE it
    starts, computed Spark-side (one aggregation, nothing collected but
    the scalars):

    - ``wcu_per_item`` = ceil(item_bytes / 1024) (DynamoDB writes bill
      1 WCU per 1 KB; item size estimated as the JSON rendering of the
      full attribute map — the same order of magnitude the wire format
      bills);
    - ``n_batches`` = per-pk-partition chunks of ``write_batch_size``
      (BatchWriteItem takes at most 25 items, and the export frame is
      pk-repartitioned so batches are key-local);
    - ``est_seconds_at_provisioned`` = total_wcu / throughput — the
      floor any throttling-respecting writer pays at the table's
      provisioned write capacity.

    Items over DynamoDB's 400 KB hard cap are counted in
    ``n_oversize_items`` — a real backend must reject them, so a
    non-zero count here fails the export before any network call."""
    bs = spec.write_batch_size
    sized = export_df.select(
        F.col("pk"),
        F.length(
            F.to_json(F.struct(*[F.col(c) for c in export_df.columns]))
        ).alias("item_bytes"),
    )
    row = (
        sized.groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.ceil(F.col("item_bytes") / 1024.0)).alias("wcu"),
            F.sum(
                F.when(F.col("item_bytes") > 400 * 1024, 1).otherwise(0)
            ).alias("oversize"),
            F.max("item_bytes").alias("max_bytes"),
        )
        .agg(
            F.sum("n").alias("n_items"),
            F.sum(F.ceil(F.col("n") / float(bs))).alias("n_batches"),
            F.sum("wcu").alias("total_wcu"),
            F.sum("oversize").alias("n_oversize_items"),
            F.max("max_bytes").alias("max_item_bytes"),
        )
        .first()
    )
    total_wcu = int(row["total_wcu"] or 0)
    return {
        "n_items": int(row["n_items"] or 0),
        "n_batches": int(row["n_batches"] or 0),
        "total_wcu": total_wcu,
        "max_item_bytes": int(row["max_item_bytes"] or 0),
        "n_oversize_items": int(row["n_oversize_items"] or 0),
        "write_batch_size": bs,
        "provisioned_throughput": spec.throughput,
        "est_seconds_at_provisioned": total_wcu / float(spec.throughput),
    }


def export_to_kv(
    df: DataFrame,
    spec: KVTableSpec,
    target: str,
    sink: KeyValueSink | None = None,
    mode: str = "put",
) -> DataFrame:
    """Reshape and write.  ``mode`` reaches backends that support it
    (the parquet backend's per-key put-merge vs recreate); custom seams
    with the bare ``write(df, spec, target)`` signature still work."""
    import inspect

    export_df = build_export_frame(df, spec)
    chosen = sink or ParquetKVSink()
    if "mode" in inspect.signature(chosen.write).parameters:
        chosen.write(export_df, spec, target, mode=mode)
    else:
        chosen.write(export_df, spec, target)
    return export_df


class KVReader:
    """DynamoDB-shaped read surface over a :class:`ParquetKVSink` table —
    the serving-side half of the S9 parity story (the reference only writes
    from Spark; its consumers issue GetItem/Query against DynamoDB,
    zetadex-serving.py's tables are read by the dapp).  Semantics mirrored:

    - ``get_item``: point read by full primary key (pk [+ sk]).
    - ``query``: all items of one partition key, optionally narrowed by a
      sort-key condition (``begins_with`` / ``between``), ordered by sk
      (``ascending=False`` = DynamoDB's ScanIndexForward=false), bounded
      by ``limit`` AFTER ordering.
    - ``query_index``: same via an LSI/GSI declared in the table spec
      sidecar (key columns are camelCased like the exported attributes).
    - TTL is lazy, like DynamoDB's: items whose ``expiry`` has passed
      ``now_epoch`` are filtered at read time, not physically deleted.

    Point reads stay cheap at scale for the same reason they are cheap in
    a KV store: the export layout is repartitioned by pk, and the pk
    equality predicate reaches the parquet scan (PushedFilters), so a
    GetItem touches the row groups whose pk-range covers the key, not the
    table.  Results return driver-side as dicts — this is a SERVING read
    (bounded by limit/partition size), not an analytics scan.
    """

    def __init__(self, spark, target: str, table_name: str) -> None:
        self._path = os.path.join(target, table_name)
        with open(os.path.join(self._path, "_kv_table_spec.json")) as f:
            self.spec = json.load(f)
        self._spark = spark

    def _df(self) -> DataFrame:
        return self._spark.read.parquet(self._path)

    @staticmethod
    def _composite(values) -> str:
        if isinstance(values, (list, tuple)):
            return "#".join(str(v) for v in values)
        return str(values)

    def _ttl_filter(self, df: DataFrame, now_epoch: int | None) -> DataFrame:
        if self.spec.get("ttl") and now_epoch is not None and "expiry" in df.columns:
            df = df.where(
                F.col("expiry").isNull() | (F.col("expiry") > F.lit(now_epoch))
            )
        return df

    def get_item(
        self, pk, sk=None, now_epoch: int | None = None
    ) -> dict | None:
        df = self._df().where(F.col("pk") == self._composite(pk))
        if sk is not None:
            df = df.where(F.col("sk") == self._composite(sk))
        rows = self._ttl_filter(df, now_epoch).limit(2).collect()
        if not rows:
            return None
        if len(rows) > 1 and sk is None and self.spec.get("sort_key"):
            raise ValueError(
                "get_item: table has a sort key and multiple items share "
                "this pk — pass sk= or use query()"
            )
        return rows[0].asDict()

    def query(
        self,
        pk,
        begins_with: str | None = None,
        between: tuple | None = None,
        ascending: bool = True,
        limit: int | None = None,
        now_epoch: int | None = None,
    ) -> list[dict]:
        df = self._df().where(F.col("pk") == self._composite(pk))
        df = self._ttl_filter(df, now_epoch)
        if begins_with is not None:
            df = df.where(F.col("sk").startswith(begins_with))
        if between is not None:
            lo, hi = between
            df = df.where(
                (F.col("sk") >= self._composite(lo))
                & (F.col("sk") <= self._composite(hi))
            )
        if "sk" in df.columns:
            df = df.orderBy(
                F.col("sk").asc() if ascending else F.col("sk").desc()
            )
        if limit is not None:
            df = df.limit(limit)
        return [r.asDict() for r in df.collect()]

    def batch_get_items(
        self, keys: Sequence, now_epoch: int | None = None
    ) -> list[dict]:
        """BatchGetItem: point multi-read.  ``keys`` is a sequence of pk
        values, or of ``(pk, sk)`` pairs when the table has a sort key.
        DynamoDB caps a BatchGetItem call at 100 keys — same hard error
        here, so callers chunk exactly as they would against the real
        API.  One scan with an IN/OR predicate over the keys (it pushes
        down to the pk-partitioned parquet), never one job per key."""
        if len(keys) > 100:
            raise ValueError(
                f"BatchGetItem takes at most 100 keys, got {len(keys)} — "
                "chunk the request"
            )
        has_sk = bool(self.spec.get("sort_key"))
        if has_sk:
            # exact (pk, sk) tuple match — never a separator-joined string
            # compare: DynamoDB string keys may contain ANY character, so a
            # key embedding the separator could alias a different pair
            from functools import reduce

            pairs = [
                (self._composite(pk), self._composite(sk)) for pk, sk in keys
            ]
            pred = reduce(
                lambda a, b: a | b,
                [
                    (F.col("pk") == F.lit(p)) & (F.col("sk") == F.lit(s))
                    for p, s in pairs
                ],
            )
            df = self._df().where(pred)
        else:
            df = self._df().where(
                F.col("pk").isin([self._composite(k) for k in keys])
            )
        return [r.asDict() for r in self._ttl_filter(df, now_epoch).collect()]

    def query_index(
        self,
        index_name: str,
        key_value,
        ascending: bool = True,
        limit: int | None = None,
        now_epoch: int | None = None,
    ) -> list[dict]:
        idx = {**self.spec.get("lsi", {}), **self.spec.get("gsi", {})}.get(
            index_name
        )
        if idx is None:
            raise KeyError(
                f"index {index_name!r} not declared in table spec "
                f"(have: {sorted({**self.spec.get('lsi', {}), **self.spec.get('gsi', {})})})"
            )
        key_col = to_camel_case(idx[0])
        df = self._df().where(
            F.col(key_col) == F.lit(key_value)
        )
        df = self._ttl_filter(df, now_epoch)
        order = [to_camel_case(c) for c in idx[1:]] or ["pk"]
        df = df.orderBy(
            *[F.col(c).asc() if ascending else F.col(c).desc() for c in order]
        )
        if limit is not None:
            df = df.limit(limit)
        return [r.asDict() for r in df.collect()]
