"""domainMetadata actions (PROTOCOL.md "Domain Metadata"): last-writer
reconciliation with removed tombstones, survival through BOTH checkpoint
layouts + log cleanup, and writer acceptance of tables declaring the
feature (modern engines stamp e.g. ``delta.clustering`` on real
tables — refusing them made every such table untouchable)."""

from __future__ import annotations

import json
import os

from zeta_etl_spark.sinks.delta_log import (
    cleanup_log,
    domain_metadata,
    enable_v2_checkpoints,
    read_delta,
    write_checkpoint,
    write_delta,
)


def _golden_domains(table):
    """Hand-authored foreign table: v0 creates with two domains, v1
    updates one and removes the other + adds a third."""
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    v0 = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "CREATE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["domainMetadata"]}},
        {"metaData": {
            "id": "33333333-3333-3333-3333-333333333333",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": "{\"cols\":[\"k\"]}",
                            "removed": False}},
        {"domainMetadata": {"domain": "engine.scratch",
                            "configuration": "{\"x\":1}",
                            "removed": False}},
    ]
    v1 = [
        {"commitInfo": {"timestamp": 1700000001000, "operation": "X"}},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": "{\"cols\":[\"k\",\"v\"]}",
                            "removed": False}},
        {"domainMetadata": {"domain": "engine.scratch",
                            "configuration": "",
                            "removed": True}},
        {"domainMetadata": {"domain": "engine.other",
                            "configuration": "{\"y\":2}",
                            "removed": False}},
    ]
    for v, actions in ((0, v0), (1, v1)):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions))


EXPECT = {
    "delta.clustering": "{\"cols\":[\"k\",\"v\"]}",
    "engine.other": "{\"y\":2}",
}


def test_domain_reconciliation_last_writer_and_tombstone(spark, tmp_path):
    t = str(tmp_path / "dm")
    _golden_domains(t)
    assert domain_metadata(t) == EXPECT
    assert domain_metadata(t, version=0) == {
        "delta.clustering": "{\"cols\":[\"k\"]}",
        "engine.scratch": "{\"x\":1}",
    }


def test_domains_survive_classic_checkpoint_and_writes(spark, tmp_path):
    t = str(tmp_path / "dmc")
    _golden_domains(t)
    # the feature-declaring table accepts ordinary writes now
    write_delta(
        spark.createDataFrame([(1,), (2,)], "k bigint"), t, mode="append"
    )
    v = write_checkpoint(t)  # no longer refuses domainMetadata tables
    cleanup_log(t)
    assert domain_metadata(t) == EXPECT
    assert read_delta(spark, t, version=v).count() == 2


def test_domains_survive_v2_checkpoint(spark, tmp_path):
    t = str(tmp_path / "dmv2")
    _golden_domains(t)
    write_delta(
        spark.createDataFrame([(1,)], "k bigint"), t, mode="append"
    )
    enable_v2_checkpoints(t)
    write_checkpoint(t, format="v2")
    cleanup_log(t)
    assert domain_metadata(t) == EXPECT
    assert read_delta(spark, t).count() == 1


def test_clustered_table_optimize_uses_declared_columns(spark, tmp_path):
    """A clusteredTable (Liquid) foreign table: appends accepted, and
    OPTIMIZE without explicit columns clusters on the delta.clustering
    domain's declared columns — per-file k-ranges tighten so skipping
    prunes, which only happens if the clustering actually applied."""
    import json as _json

    from zeta_etl_spark.sinks.delta_log import _replay, optimize

    t = str(tmp_path / "liquid")
    log = os.path.join(t, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "s", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    actions = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "CREATE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["domainMetadata",
                                         "clusteredTable"]}},
        {"metaData": {
            "id": "44444444-4444-4444-4444-444444444444",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        # string column declared too: skipped for z-order, not refused
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": _json.dumps(
                                {"clusteringColumns": [["k"], ["s"]]}),
                            "removed": False}},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    # interleaved appends: every file spans nearly the full k range
    for i in range(3):
        write_delta(
            spark.createDataFrame(
                [(k, f"s{k}") for k in range(i, 3000, 3)],
                "k bigint, s string",
            ).coalesce(1),
            t, mode="append",
        )
    v = optimize(spark, t, target_file_rows=1000)
    _, _, live, _ = _replay(t)
    spans = []
    for add in live.values():
        st = json.loads(add["stats"])
        spans.append(st["maxValues"]["k"] - st["minValues"]["k"])
    # clustered output: tight disjoint ranges (pre-optimize spans ~3000)
    assert len(spans) >= 2
    assert max(spans) < 1500
    assert domain_metadata(t) != {}
    assert read_delta(spark, t, version=v).count() == 3000


def test_set_domain_metadata_api(spark, tmp_path):
    import pytest as _pytest

    from zeta_etl_spark.sinks.delta_log import (
        DeltaUnsupported,
        _replay,
        set_domain_metadata,
    )

    t = str(tmp_path / "setdm")
    write_delta(spark.createDataFrame([(1,)], "k bigint"), t)
    set_domain_metadata(t, "myapp.cursor", '{"pos": 5}')
    assert domain_metadata(t) == {"myapp.cursor": '{"pos": 5}'}
    protocol, _, _, _ = _replay(t)
    assert "domainMetadata" in protocol["writerFeatures"]
    # last writer wins; tombstone drops
    set_domain_metadata(t, "myapp.cursor", '{"pos": 9}')
    assert domain_metadata(t) == {"myapp.cursor": '{"pos": 9}'}
    set_domain_metadata(t, "myapp.cursor", removed=True)
    assert domain_metadata(t) == {}
    # delta.clustering accepted (declares clusteredTable too)...
    set_domain_metadata(
        t, "delta.clustering", '{"clusteringColumns": [["k"]]}'
    )
    protocol, _, _, _ = _replay(t)
    assert "clusteredTable" in protocol["writerFeatures"]
    # ...but other spec-reserved domains refuse
    with _pytest.raises(DeltaUnsupported, match="reserved"):
        set_domain_metadata(t, "delta.rowTracking", "{}")
