"""Deletion vectors: decode, read-path integration, DV-aware rewrites.

No FOREIGN DV-writing engine exists in this environment (delta-spark is
uninstallable), so every fixture here is hand-built from the public
specs: the roaring SERIALIZER lives in this test (written from the
roaringbitmap.org portable format doc, independent of the module's
de/serializers — since r12 the module has its OWN writer for
``delete_delta(mode='dv')``, which this test-side serializer keeps
honest), DV files follow PROTOCOL.md's ``<version byte> <int32 BE size>
<data> <int32 BE crc>`` layout, and the log actions are authored as
literal JSON."""

from __future__ import annotations

import json
import os
import struct
import urllib.parse
import uuid
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zeta_etl_spark.sinks.delta_dv import (
    DV_MAGIC,
    deserialize_dv_bitmap,
    dv_file_path,
    z85_decode,
    z85_encode,
)
from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    read_delta,
    table_changes,
    write_checkpoint,
    write_delta,
)


# ------------------------------------------------- test-side serializer

def _serialize_roaring32(values: list[int], force_bitmap=False,
                         runs: list[tuple[int, int]] | None = None) -> bytes:
    """Independent portable-format writer (array / bitmap / run
    containers), used only to author fixtures."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = bytearray()
    if runs is not None:
        # run-container path: single container of (start, len) runs
        assert n == 1
        out += struct.pack("<i", 12347 | ((n - 1) << 16))
        out += bytes([1])  # run flag bitset: container 0 is a run
        card = sum(r[1] + 1 for r in runs)
        out += struct.pack("<HH", keys[0], card - 1)
        if n >= 4:
            out += b"\x00" * (4 * n)
        out += struct.pack("<H", len(runs))
        for start, length in runs:
            out += struct.pack("<HH", start, length)
        return bytes(out)
    out += struct.pack("<i", 12346)
    out += struct.pack("<i", n)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # offsets header (always present with the no-run cookie)
    pos = 4 + 4 + 4 * n + 4 * n
    offsets = []
    for k in keys:
        offsets.append(pos)
        vals = by_key[k]
        pos += 8192 if (len(vals) > 4096 or force_bitmap) else 2 * len(vals)
    for off in offsets:
        out += struct.pack("<i", off)
    for k in keys:
        vals = by_key[k]
        if len(vals) > 4096 or force_bitmap:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def _serialize_dv(values: list[int], **kw) -> bytes:
    by_high: dict[int, list[int]] = {}
    for v in sorted(values):
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<i", DV_MAGIC))
    out += struct.pack("<q", len(by_high))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += _serialize_roaring32(by_high[high], **kw)
    return bytes(out)


# --------------------------------------------------------------- codecs

def test_z85_rfc32_vector():
    # ZeroMQ RFC 32's published test vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) \
        == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not a multiple of 5


@pytest.mark.parametrize(
    "values",
    [
        [0, 1, 5, 70000, (3 << 32) | 7],  # array containers, two highs
        list(range(5000)),  # dense -> bitmap container
        [],
    ],
)
def test_roaring_roundtrip(values):
    assert deserialize_dv_bitmap(_serialize_dv(values)) == sorted(values)


def test_roaring_bitmap_and_run_containers():
    # portable format: a non-run container is a BITMAP iff card > 4096
    vals = list(range(0, 8194, 2))  # 4097 values -> bitmap container
    data = _serialize_dv(vals)
    assert deserialize_dv_bitmap(data) == vals
    # run container: rows 10..14 and 100..100, hand-assembled
    # (single high word, single container with the run flag set)
    out = bytearray(struct.pack("<i", DV_MAGIC)) + struct.pack("<q", 1)
    out += struct.pack("<i", 0) + _serialize_roaring32(
        [0], runs=[(10, 4), (100, 0)]
    )
    assert deserialize_dv_bitmap(bytes(out)) == [10, 11, 12, 13, 14, 100]


def test_roaring_property_random_sets():
    import random

    rnd = random.Random(7)
    for trial in range(5):
        vals = sorted(
            set(
                rnd.randrange(0, 1 << 20) | (rnd.randrange(2) << 32)
                for _ in range(rnd.randrange(1, 3000))
            )
        )
        assert deserialize_dv_bitmap(_serialize_dv(vals)) == vals


# ------------------------------------------------------ golden DV tables

_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {}},
        ],
    }
)


def _protocol_v3() -> str:
    return json.dumps(
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        }
    )


def _meta_action() -> str:
    return json.dumps(
        {
            "metaData": {
                "id": "11111111-1111-1111-1111-111111111111",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_JSON,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        }
    )


def _dv_table(table: str, descriptor: dict, second_clean=True) -> None:
    """v0: two plain files; v1: file A re-added with ``descriptor`` (the
    spec's remove+add DV update, remove FIRST is not guaranteed — the add
    is written before the remove here on purpose)."""
    os.makedirs(os.path.join(table, "_delta_log"))
    pq.write_table(
        pa.table({"id": list(range(10)), "v": [float(i) for i in range(10)]}),
        os.path.join(table, "a.parquet"),
    )
    pq.write_table(
        pa.table({"id": [100, 101], "v": [1.5, 2.5]}),
        os.path.join(table, "b.parquet"),
    )

    def _add(path, n, dv=None):
        body = {
            "path": path,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": json.dumps(
                {"numRecords": n, "minValues": {}, "maxValues": {},
                 "nullCount": {}}
            ),
        }
        if dv:
            body["deletionVector"] = dv
        return json.dumps({"add": body})

    v0 = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        _protocol_v3(),
        _meta_action(),
        _add("a.parquet", 10),
    ]
    if second_clean:
        v0.append(_add("b.parquet", 2))
    v1 = [
        json.dumps({"commitInfo": {"timestamp": 2, "operation": "DELETE"}}),
        _add("a.parquet", 10, dv=descriptor),
        json.dumps(
            {
                "remove": {
                    "path": "a.parquet",
                    "deletionTimestamp": 2,
                    "dataChange": True,
                }
            }
        ),
    ]
    for ver, lines in ((0, v0), (1, v1)):
        with open(
            os.path.join(table, "_delta_log", f"{ver:020d}.json"), "w"
        ) as fh:
            fh.write("\n".join(lines) + "\n")


def test_inline_dv_filters_rows(spark, tmp_path):
    t = str(tmp_path / "dvi")
    deleted = [1, 3, 4]
    data = _serialize_dv(deleted)
    pad = (-len(data)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data) + pad,
        "cardinality": len(deleted),
    }
    # NOTE: Z85 needs length % 4 == 0; delta pads inline DVs — but then
    # the deserializer must tolerate trailing bytes after the bitmaps,
    # which it does (it reads exactly n_bitmaps)
    _dv_table(t, desc)
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [
        0, 2, 5, 6, 7, 8, 9, 100, 101,
    ]
    # time travel to v0 (pre-DV) still shows everything
    assert read_delta(spark, t, version=0).count() == 12
    # predicates compose with the DV filter
    assert sorted(
        r["id"]
        for r in read_delta(spark, t, predicate=[("id", "<", 5)]).collect()
    ) == [0, 2]


def test_file_backed_dv_u_storage(spark, tmp_path):
    t = str(tmp_path / "dvu")
    deleted = [0, 9]
    data = _serialize_dv(deleted)
    uid = uuid.UUID("22222222-2222-2222-2222-222222222222")
    desc = {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(uid.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    _dv_table(t, desc)
    # PROTOCOL.md DV file layout: version byte, then size/data/crc frames
    with open(os.path.join(t, f"deletion_vector_{uid}.bin"), "wb") as fh:
        fh.write(b"\x01")
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">i", zlib.crc32(data) & 0x7FFFFFFF))
    assert dv_file_path(desc, t) == os.path.join(
        t, f"deletion_vector_{uid}.bin"
    )
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [
        1, 2, 3, 4, 5, 6, 7, 8, 100, 101,
    ]
    # corrupt CRC must fail loudly, never resurrect/keep silently (the
    # decode runs EXECUTOR-side, so the failure surfaces as a Spark job
    # error wrapping the ValueError)
    with open(os.path.join(t, f"deletion_vector_{uid}.bin"), "r+b") as fh:
        fh.seek(5)
        fh.write(b"\xff")
    with pytest.raises(Exception, match="CRC|magic"):
        read_delta(spark, t).collect()


def _inline_desc(deleted):
    data = _serialize_dv(deleted)
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data) + pad,
        "cardinality": len(deleted),
    }


def test_dv_aware_optimize_materializes_minus_dv(spark, tmp_path):
    """r11 verdict #4: OPTIMIZE on a DV table rewrites rows-minus-DV and
    drops the descriptor — rows unchanged (dataChange stays False),
    deleted rows stay deleted, history intact."""
    from zeta_etl_spark.sinks.delta_log import _replay, optimize

    t = str(tmp_path / "dvo")
    _dv_table(t, _inline_desc([2]))
    expected = [0, 1, 3, 4, 5, 6, 7, 8, 9, 100, 101]
    v = optimize(spark, t)
    assert v == 2
    _, _, live, _ = _replay(t)
    assert live and not any(
        a.get("deletionVector") for a in live.values()
    ), "rewrite must drop the deletion vectors"
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == expected
    # the OPTIMIZE commit is dataChange:false throughout
    log = os.path.join(t, "_delta_log", f"{v:020d}.json")
    for line in open(log):
        a = json.loads(line)
        body = a.get("add") or a.get("remove")
        if body:
            assert body["dataChange"] is False
    # time travel to the pre-rewrite version still applies the DV
    assert (
        sorted(r["id"] for r in read_delta(spark, t, version=1).collect())
        == expected
    )
    # checkpointing now works (no live descriptors left to drop)
    write_checkpoint(t)


def test_dv_aware_merge_rewrites_clean_files(spark, tmp_path):
    """MERGE on a DV table: deleted rows never match (they are gone),
    touched DV'd files are rewritten clean, untouched deletions stay
    deleted."""
    from zeta_etl_spark.sinks.delta_log import _replay, merge_delta

    t = str(tmp_path / "dvm")
    _dv_table(t, _inline_desc([2]))
    m = merge_delta(
        spark, t,
        spark.createDataFrame(
            [(1, 9.0), (2, 4.0)], "id bigint, v double"
        ),
        on=["id"], when_matched_update="*", when_not_matched_insert="*",
    )
    # id=2 was DV-deleted, so it does NOT match: it INSERTS as a new row
    assert m["rows_updated"] == 1 and m["rows_inserted"] == 1
    rows = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows[1] == 9.0 and rows[2] == 4.0
    assert sorted(rows) == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 101]
    _, _, live, _ = _replay(t)
    assert not any(a.get("deletionVector") for a in live.values())
    # CDF over the MERGE commit reads its cdc files (no fabricated
    # delete+insert for the copied rows of the rewritten DV'd file)
    ch = table_changes(spark, t, m["version"], m["version"])
    kinds = {
        (r["id"], r["_change_type"]) for r in ch.collect()
    }
    assert kinds == {
        (1, "update_preimage"), (1, "update_postimage"), (2, "insert")
    }
    # CDF over the DV commit derives the row-level delete from the
    # descriptor delta (r12): exactly id=2, nothing fabricated
    dv_ch = table_changes(spark, t, 1, 1)
    assert [(r["id"], r["_change_type"]) for r in dv_ch.collect()] \
        == [(2, "delete")]


def test_dv_table_checkpoint_carries_descriptors(spark, tmp_path):
    """r12: the classic checkpoint written here carries live
    deletionVector descriptors, so cleanup past the checkpoint can never
    resurrect deleted rows."""
    from zeta_etl_spark.sinks.delta_log import cleanup_log

    t = str(tmp_path / "dvc")
    _dv_table(t, _inline_desc([2]))
    # plain appends remain fine (no live file is rewritten)
    write_delta(
        spark.createDataFrame([(500, 5.0)], "id bigint, v double"),
        t,
        mode="append",
    )
    v = write_checkpoint(t)
    assert cleanup_log(t) == list(range(v))
    got = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert got == [0, 1, 3, 4, 5, 6, 7, 8, 9, 100, 101, 500]
    # the checkpointed descriptor round-trips byte-identically
    from zeta_etl_spark.sinks.delta_log import _replay

    _, _, live, _ = _replay(t)
    descs = [a["deletionVector"] for a in live.values()
             if a.get("deletionVector")]
    assert len(descs) == 1 and descs[0]["cardinality"] == 1


def test_reader_features_outside_subset_still_refuse(spark, tmp_path):
    t = str(tmp_path / "cm")
    os.makedirs(os.path.join(t, "_delta_log"))
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors",
                                           "collations"],
                    }
                }
            )
            + "\n"
            + _meta_action()
            + "\n"
        )
    with pytest.raises(DeltaUnsupported, match="collations"):
        read_delta(spark, t)


def test_dv_table_under_uri_escaped_path(spark, tmp_path):
    """r11 review finding #1: Spark URI-escapes _metadata.file_path
    (space -> %20), so the anti-join key must come from Spark's own
    rendering — a table path containing a space must still filter the
    deleted rows (the broken version silently resurrected ALL of them)."""
    t = str(tmp_path / "dv dir with spaces" / "t")
    os.makedirs(os.path.dirname(t))
    deleted = [1, 3]
    data = _serialize_dv(deleted)
    pad = (-len(data)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data) + pad,
        "cardinality": 2,
    }
    _dv_table(t, desc)
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [
        0, 2, 4, 5, 6, 7, 8, 9, 100, 101,
    ]
