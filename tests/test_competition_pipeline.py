"""Competition pipeline tests: seeded team determinism across runs, rank
tie-break determinism, team totals = sum of member totals."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.competition import build_competition_pipeline

SCHEMA = "block_time timestamp_ntz, authority string, volume double, pnl double"


def _trades():
    ts = datetime(2024, 3, 1, 12)
    rows = []
    for i in range(20):
        auth = f"trader_{i:02d}"
        rows.append((ts, auth, 1000.0 + i, 10.0 * (i % 7) - 20.0))
        rows.append((ts, auth, 500.0, 5.0))
    # exact pnl tie between two traders → pubkey tie-break observable
    rows.append((ts, "tie_a", 100.0, 42.0))
    rows.append((ts, "tie_b", 100.0, 42.0))
    return rows


@pytest.fixture()
def trades_df(spark):
    return spark.createDataFrame(_trades(), SCHEMA)


def test_team_assignment_deterministic(spark, trades_df, tmp_path):
    def run(base):
        p = build_competition_pipeline(spark, base, trades_df)
        out = p.run(spark, targets=["team_assignment"])["team_assignment"]
        return {r["authority"]: (r["team"], r["username"]) for r in out.collect()}

    a = run(str(tmp_path / "r1"))
    b = run(str(tmp_path / "r2"))
    assert a == b
    assert len({t for t, _ in a.values()}) > 1


def test_rank_tiebreak_and_team_totals(spark, trades_df, tmp_path):
    p = build_competition_pipeline(spark, str(tmp_path / "p"), trades_df)
    out = p.run(spark, targets=["individual_leaderboard", "team_leaderboard"])
    ind = out["individual_leaderboard"]
    ranks = {r["authority"]: r["rank"] for r in ind.collect()}
    # equal pnl+roi → authority asc breaks the tie deterministically
    assert ranks["tie_a"] == ranks["tie_b"] - 1
    team = out["team_leaderboard"]
    total_members = team.agg(F.sum("n_members")).first()[0]
    assert total_members == ind.count()
    tv = team.agg(F.sum("team_volume")).first()[0]
    iv = ind.agg(F.sum("volume")).first()[0]
    assert abs(tv - iv) < 1e-6
