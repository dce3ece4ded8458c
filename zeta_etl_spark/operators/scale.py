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


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    m_bits: int = 65536,
    how: str = "inner",
) -> DataFrame:
    """Equi join with a Bloom semi-join reduction: build a k=4, ``m_bits``
    Bloom bitmap over the dim side's join keys (one aggregate), broadcast
    it as a single map row, and filter the fact side BEFORE the join.

    This is the third point on the join-reduction spectrum the engine
    offers: broadcast-semi (dim fits in memory raw), bloom-prefilter (dim
    too big to broadcast raw, its bitmap isn't — a 10⁸-key dim is a
    ~8 MB bitmap at 1 bit/16 keys FP≈2%), shuffle join (nothing fits).
    At 100 TB the win is shuffle volume: only fact rows that *probably*
    match ship to the join exchange; false positives (bounded by the m/n
    ratio) are eliminated by the exact join that follows, so the RESULT is
    identical to the plain join — the bitmap only prunes.

    Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter.*)
    does this adaptively for built-in sources; this operator is the
    deterministic, engine-controlled form that also works on Python data
    sources and inside foreachBatch bodies where runtime filters don't
    reach.  Hashing: 4 disjoint 32-bit slices of ONE md5 per key (the
    engine's cross-engine hashing rule — one digest per row, k positions).

    ``how`` is restricted to inner/left_semi: outer joins need unmatched
    fact rows, which the prefilter would drop.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prefilter_join: how={how!r} unsupported — outer joins "
            "keep unmatched fact rows, which the bloom prefilter drops"
        )
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    key_sql = "concat_ws('\\u001f', " + ", ".join(
        f"cast({k} as string)" for k in keys
    ) + ")"
    dig = f"md5({key_sql})"
    pos_exprs = [
        f"cast(conv(substr({dig}, {1 + 8 * i}, 8), 16, 10) as bigint) "
        f"% {m_bits}"
        for i in range(4)
    ]

    words = (
        dim.select(
            F.explode(F.array(*[F.expr(p) for p in pos_exprs])).alias("pos")
        )
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("b")
        )
    )
    bloom = words.agg(
        F.map_from_arrays(
            F.collect_list("w"), F.collect_list("b")
        ).alias("_bloom")
    )

    hit = " AND ".join(
        f"(coalesce(element_at(_bloom, cast(({p}) div 64 as int)), 0L) "
        f"& shiftleft(1L, cast(({p}) % 64 as int))) != 0"
        for p in pos_exprs
    )
    pruned = scalar_frame_crossjoin(fact, bloom).where(hit).drop("_bloom")
    return pruned.join(dim, list(keys), how)
