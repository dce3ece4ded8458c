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
    """Default backend: parquet + key-design sidecar, repartitioned by pk."""

    def write(self, export_df: DataFrame, spec: KVTableSpec, target: str) -> None:
        path = os.path.join(target, spec.table_name)
        (
            export_df.repartition(F.col("pk"))
            .write.mode("overwrite")
            .parquet(path)
        )
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
        with open(os.path.join(path, "_kv_table_spec.json"), "w") as f:
            json.dump(meta, f, indent=2)


def export_to_kv(
    df: DataFrame,
    spec: KVTableSpec,
    target: str,
    sink: KeyValueSink | None = None,
) -> DataFrame:
    export_df = build_export_frame(df, spec)
    (sink or ParquetKVSink()).write(export_df, spec, target)
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
