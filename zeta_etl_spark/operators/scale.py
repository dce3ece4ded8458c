"""Scale utilities: skew-salted joins and bucketed (co-located) joins.

These are the knobs the brief's 100 TB posture calls for beyond AQE's
automatic handling:

- **Salting** splits a hot key across ``salt_factor`` shuffle partitions when
  even AQE's skew-join splitting can't help (e.g. a single key whose build
  side also explodes).  The small side is replicated per salt; the big side
  gets a random-but-seeded salt per row.
- **Bucketing** pre-shuffles tables once at write time on the join key so
  repeated joins/aggregations on that key need no exchange at read time —
  the open-source equivalent of the reference's z-order + partition layout
  tuning (SURVEY §1.3) for join locality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi join with key salting: big side gets ``salt = rand(seed)*N``,
    small side is exploded ×N, join on (keys..., salt).  Row multiplicity is
    preserved (each big row matches exactly one replica).

    Only ``inner`` and ``left`` are semantics-safe: for right/full joins the
    replicated small side would emit each UNMATCHED small row once per salt
    replica (matched rows are fine — exactly one replica matches).  Guarded
    here rather than silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full would duplicate unmatched small-side rows once per "
            "salt replica — de-salt or use a plain join for outer semantics"
        )
    big_s = big.withColumn(
        "_salt", (F.rand(seed) * salt_factor).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = big_s.join(small_s, [*keys, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] = (),
) -> None:
    """Materialize as a bucketed session-catalog table: one shuffle now, zero
    exchanges for every future join/agg on ``bucket_cols``."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables — plans as SortMergeJoin with no
    Exchange on either side (verify with .explain())."""
    return spark.table(left_table).join(spark.table(right_table), list(keys), how)
