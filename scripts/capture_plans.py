"""Capture explain("formatted") for bench-suite queries → $SPARK_GRAFT_PLANS_OUT (default plans/r14/).

Usage: python scripts/capture_plans.py before|after [key1,key2,...]

Runs each query callable at $SPARK_GRAFT_SF_DIR (default sf0.1) and
writes plans/r13/<key>_<tag>.txt.  Plans are captured from the
RETURNED DataFrame — for write-path probes that is the read-back plan,
which is what the bench's timed `.count()` executes last.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(os.environ.get("SPARK_GRAFT_PLANS_OUT", "/root/repo/plans/r14"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from bench import HEADLINE, HEADLINE_V2
    from component_delta_lake_writer_spark import get_spark
    from component_delta_lake_writer_spark.plans import QUERIES

    keys = only if only else HEADLINE + HEADLINE_V2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)

    for key in keys:
        fn = QUERIES[key]
        try:
            df = fn(spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture failure visibly
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        (OUT / f"{key}_{tag}.txt").write_text(txt)
        print(f"{key}: {len(txt)} chars")


if __name__ == "__main__":
    main()
