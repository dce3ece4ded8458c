"""Oracle-parity spot check for a named set of registry queries at one or
more scale dirs — the per-change verification loop of the optimization
rounds (every touched query must stay row/value-identical to its DuckDB
oracle before commit).

Usage:
    python scripts/oracle_check.py name1 name2 ... \
        [--sf-dirs /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zeta_etl_spark.queries import REGISTRY  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402
from zeta_etl_spark.testing import (  # noqa: E402
    assert_frames_match,
    duck_connection,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf-dirs",
        nargs="+",
        default=[
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
    )
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()
    os.environ.setdefault("SPARK_GRAFT_CPUS", args.cpus)
    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    for sf_dir in args.sf_dirs:
        con = duck_connection(sf_dir)
        for name in args.names:
            q = REGISTRY[name]
            try:
                spdf = q.fn(spark, sf_dir).toPandas()
                dupdf = con.execute(q.oracle).fetchdf()
                assert_frames_match(spdf, dupdf, name)
                print(f"PASS {os.path.basename(sf_dir)} {name} "
                      f"({len(spdf)} rows)")
            except Exception as exc:  # noqa: BLE001
                n_fail += 1
                print(f"FAIL {os.path.basename(sf_dir)} {name}: {exc}")
        con.close()
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
