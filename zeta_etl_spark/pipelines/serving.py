"""Serving export pipeline — re-expression of dfs-serving/zetadex-serving-v2.py:
gold hourly table → latest-complete-hour snapshot (injectable clock) →
per-asset rollup with grand-total row (+ struct components serialized onto the
total row) → all-time global aggregate with constant backfill offsets →
metric×period unpivot → camelCase/unix/TTL → pluggable KV sink.

Reference parity map (zetadex-serving-v2.py):
- current_timestamp snapshot filter: :579,620 → injectable clock (clock.py)
- rollup + ALL_ASSETS + collect_list(struct) on the total row: :617-632
- all-time global agg + hardcoded v1 constants: :634-647
- 11-frame loop-union unpivot: :495-554 → native unpivot
- camelCase + unix-ts conversion: :18-22,212-221,557-558
- DynamoDB table/key design + TTL: :334-361,417-427,598 → sinks/kv_sink
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeta_etl_spark.clock import data_as_of, latest_complete_hour
from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.reshape import rollup_with_total, unpivot_metrics
from zeta_etl_spark.plans.graph import Pipeline
from zeta_etl_spark.sinks.kv_sink import KVTableSpec, export_to_kv

# hardcoded v1 backfill constants (zetadex-serving-v2.py:635-636)
V1_VOLUME = 455_316_870.85
V1_TRADES = 200_322


def build_serving_pipeline(
    spark: SparkSession,
    base_path: str,
    hourly_gold: DataFrame,
    export_target: str,
    as_of=None,
) -> Pipeline:
    """``hourly_gold``: (timestamp, asset, trade_count, volume) gold table."""
    p = Pipeline("zetadex_serving", base_path)

    @p.table(quality="gold")
    def hourly(pl) -> DataFrame:
        return hourly_gold

    @p.table(quality="gold")
    def snapshot_rollup(pl) -> DataFrame:
        h = pl.read("hourly")
        clock = as_of if as_of is not None else data_as_of(h, "timestamp")
        snap = h.filter(F.col("timestamp") == latest_complete_hour(clock))
        rolled = rollup_with_total(
            snap,
            "asset",
            aggs=[
                F.sum("trade_count").cast("bigint").alias("trade_count"),
                dec_sum("volume", "volume"),
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(
                                ":",
                                "asset",
                                F.col("trade_count").cast("string"),
                            )
                        )
                    ),
                    ",",
                ).alias("asset_components"),
            ],
            total_label="ALL_ASSETS",
        )
        return rolled.withColumn(
            "timestamp", F.lit(None).cast("timestamp_ntz")
        ).withColumn("time_period", F.lit("latestHour"))

    @p.table(quality="gold")
    def all_time_totals(pl) -> DataFrame:
        h = pl.read("hourly")
        return h.agg(
            (F.sum("trade_count").cast("bigint") + F.lit(V1_TRADES)).alias(
                "trade_count"
            ),
            (dec_sum("volume") + F.lit(V1_VOLUME)).alias("volume"),
        ).select(
            F.lit("ALL_ASSETS").alias("asset"),
            "trade_count",
            "volume",
            F.lit("").alias("asset_components"),
            F.lit(None).cast("timestamp_ntz").alias("timestamp"),
            F.lit("allTime").alias("time_period"),
        )

    @p.table(quality="gold")
    def metrics_long(pl) -> DataFrame:
        combined = pl.read("snapshot_rollup").unionByName(
            pl.read("all_time_totals")
        )
        wide = combined.select(
            "asset",
            "time_period",
            F.col("trade_count").cast("double").alias("trade_count"),
            F.col("volume"),
        )
        return unpivot_metrics(
            wide,
            ids=["asset", "time_period"],
            metrics=["trade_count", "volume"],
            var_name="metric",
            value_name="metric_value",
        )

    def export(pl_result: DataFrame) -> DataFrame:
        spec = KVTableSpec(
            table_name="zetadex_stats",
            partition_key=["metric", "time_period"],
            sort_key=["asset"],
            global_secondary_indexes={"byAsset": ["asset"]},
            write_batch_size=25,
            throughput=100,
        )
        return export_to_kv(pl_result, spec, export_target)

    p.export = export  # driver calls p.export(metrics_long_df) after run
    return p
