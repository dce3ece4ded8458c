"""Variant type on native Delta tables (delta.io PROTOCOL.md "Variant
Data Type", feature ``variantType``): Spark's VariantType IS the open
variant binary layout the spec stores (value/metadata binary pair), so
schemaString ``variant`` round-trips through the explicit read schema,
DML flows through the same seams, and variant columns carry no stats
(unprunable — always safe).  variantShredding stays refused."""

from __future__ import annotations

import json
import os

import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _replay,
    delete_delta,
    merge_delta,
    read_delta,
    write_checkpoint,
    cleanup_log,
    write_delta,
)


def _mk(spark, tmp_path, name="vt"):
    t = str(tmp_path / name)
    df = spark.sql("""
        SELECT id AS k,
               parse_json(to_json(named_struct('n', id, 'tag',
                   concat('t', id)))) AS payload
        FROM range(6)
    """)
    write_delta(df, t, mode="append")
    return t


def test_variant_roundtrip_and_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _, meta, live, _ = _replay(t)
    fields = {f["name"]: f["type"]
              for f in json.loads(meta["schemaString"])["fields"]}
    assert fields["payload"] == "variant"
    back = read_delta(spark, t)
    assert dict(back.dtypes)["payload"] == "variant"
    got = {
        r["k"]: (r["n"], r["tag"])
        for r in back.selectExpr(
            "k",
            "variant_get(payload, '$.n', 'long') AS n",
            "variant_get(payload, '$.tag', 'string') AS tag",
        ).collect()
    }
    assert got == {i: (i, f"t{i}") for i in range(6)}
    # no stats recorded for the variant column (binary pair, no order);
    # numRecords still exact per file (Spark-counted fallback)
    per_file = [json.loads(a["stats"]) for a in live.values()]
    assert all("payload" not in s["minValues"] for s in per_file)
    assert sum(s["numRecords"] for s in per_file) == 6


def test_variant_dml_and_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path)
    delete_delta(spark, t, [("k", "<", 2)], mode="rewrite")
    src = spark.sql("""
        SELECT id AS k, parse_json(concat('{"n": ', id * 100, '}'))
            AS payload
        FROM range(4, 8)
    """)
    merge_delta(
        spark, t, src, on=["k"],
        when_matched_update="*", when_not_matched_insert="*",
    )
    write_checkpoint(t)
    cleanup_log(t)
    got = {
        r["k"]: r["n"]
        for r in read_delta(spark, t).selectExpr(
            "k", "variant_get(payload, '$.n', 'long') AS n"
        ).collect()
    }
    assert got == {2: 2, 3: 3, 4: 400, 5: 500, 6: 600, 7: 700}


def test_foreign_variant_feature_table(spark, tmp_path):
    # feature-era declaration, reader 3 / writer 7: reads and appends
    t = _mk(spark, tmp_path, "vtf")
    log = os.path.join(t, "_delta_log")
    v0 = os.path.join(log, f"{0:020d}.json")
    lines = open(v0).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["variantType"],
                "writerFeatures": ["variantType"],
            }
        out.append(json.dumps(a))
    with open(v0, "w") as fh:
        fh.write("\n".join(out))
    assert read_delta(spark, t).count() == 6
    write_delta(
        spark.sql(
            "SELECT CAST(99 AS bigint) AS k, "
            "parse_json('{\"n\": -1}') AS payload"
        ),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 7


def test_variant_shredding_stays_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, "vts")
    log = os.path.join(t, "_delta_log")
    v0 = os.path.join(log, f"{0:020d}.json")
    lines = open(v0).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["variantType",
                                   "variantShredding-preview"],
                "writerFeatures": ["variantType",
                                   "variantShredding-preview"],
            }
        out.append(json.dumps(a))
    with open(v0, "w") as fh:
        fh.write("\n".join(out))
    with pytest.raises(DeltaUnsupported, match="variantShredding"):
        read_delta(spark, t)


def test_partitioned_variant_counts_exact(spark, tmp_path):
    # a partitioned write reuses one task's part-file NAME across every
    # partition dir it writes — the Spark-counted stats fallback must
    # key by full path, or per-file numRecords collide across partitions
    t = str(tmp_path / "vtp")
    df = spark.sql("""
        SELECT CAST(id % 3 AS string) AS g,
               parse_json(concat('{"n": ', id, '}')) AS payload
        FROM range(9)
    """).coalesce(1)
    write_delta(df, t, mode="append", partition_by=["g"])
    _, _, live, _ = _replay(t)
    per_file = {
        p: json.loads(a["stats"])["numRecords"] for p, a in live.items()
    }
    assert len(per_file) == 3
    assert all(n == 3 for n in per_file.values()), per_file
    got = sorted(
        r["n"]
        for r in read_delta(spark, t)
        .selectExpr("variant_get(payload, '$.n', 'long') AS n")
        .collect()
    )
    assert got == list(range(9))
