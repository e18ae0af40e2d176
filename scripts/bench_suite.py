"""Suite-only bench: the v1+v2 timed portions of bench.py with the
identical methodology (idle gate, host warm-up, cold query per key,
timed `.count()`), skipping the envelopes and curves — the fast
iteration loop for the optimization rounds.

Usage: python scripts/bench_suite.py [v1|v2|all] [--keys k1,k2]
Prints per-query seconds and totals; writes nothing the driver reads.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from bench import (  # noqa: E402
    HEADLINE,
    HEADLINE_V2,
    _await_idle_host,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    only = None
    if "--keys" in sys.argv:
        only = sys.argv[sys.argv.index("--keys") + 1].split(",")

    from component_delta_lake_writer_spark import get_spark
    from component_delta_lake_writer_spark.plans import QUERIES

    load, waited = _await_idle_host()
    print(f"# loadavg {load} (waited {waited}s)", file=sys.stderr)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    # same host warm-up as bench.main(): page-cache the inputs + one
    # untimed scan per table
    t0 = time.perf_counter()
    for p in sorted(Path(SF_DIR).glob("*.parquet")):
        with open(p, "rb") as fh:
            while fh.read(1 << 22):
                pass
        spark.read.parquet(str(p)).count()
    print(f"# warm-up {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    keys: list[str] = []
    if only:
        keys = only
    else:
        if which in ("v1", "all"):
            keys += HEADLINE
        if which in ("v2", "all"):
            keys += ["__v2_warmer__"] + HEADLINE_V2

    total = 0.0
    out = {}
    for key in keys:
        if key == "__v2_warmer__":
            t0 = time.perf_counter()
            try:
                QUERIES["stream_cdf_bootstrap"](spark, SF_DIR).count()
                print(f"# v2 streaming warmer (untimed): "
                      f"{time.perf_counter() - t0:.3f}s", file=sys.stderr)
            except Exception as exc:
                print(f"# warmer failed: {exc}", file=sys.stderr)
            continue
        fn = QUERIES[key]
        spark.sparkContext.setJobDescription(f"bench:{key}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        out[key] = round(dt, 3)
        total += dt
        print(f"{key}: {dt:.3f}s ({n} rows)")
    print(f"TOTAL: {total:.3f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
