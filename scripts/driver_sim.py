"""Simulate the verify driver's correctness gate locally.

Runs the first N registry keys (driver budget: 50/round) at sf0.01,
comparing Spark result vs DuckDB oracle with the same canonicalization
the driver uses, and times each key.  Also enforces the probe-shape
rules the driver's pandas canonicalizer implies: no DECIMAL and no
array/struct/map output columns.

Usage: python scripts/driver_sim.py [N] [--keys k1,k2,...] [--sf DIR]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, types as T  # noqa: E402

from component_delta_lake_writer_spark.plans import ORACLES, QUERIES  # noqa: E402
from tests.oracle import compare, duckdb_conn  # noqa: E402

# per-probe wall-clock ceiling in a SEQUENTIAL sim run. The driver's
# own budget is ~10 s under parallel load; keys here run one at a
# time on an otherwise-idle host, so the bar is stricter to leave
# contention headroom (r8: stream_cdf_source sat at 9.41 s and only
# the judge noticed).
PROBE_CEILING_S = 10.0


def main() -> None:
    n = 50
    keys = None
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--keys":
            keys = args[i + 1].split(",")
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            n = int(args[i])
            i += 1
    if keys is None:
        keys = list(QUERIES)[:n]

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)

    results = {}
    t_all = time.time()
    for key in keys:
        t0 = time.time()
        try:
            df = QUERIES[key](spark, sf_dir)
            for f in df.schema.fields:
                if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
                    raise AssertionError(
                        f"non-scalar output column {f.name}: {f.dataType.simpleString()}"
                    )
            if key in ORACLES:
                compare(df, con, ORACLES[key], key)
                status = "pass"
            else:
                cnt = df.count()
                status = f"rows-only:{cnt}"
            err = None
        except Exception as e:  # noqa: BLE001
            status = "FAIL"
            err = f"{type(e).__name__}: {e}"
        dt_s = time.time() - t0
        results[key] = {"status": status, "sec": round(dt_s, 2), "err": err}
        print(f"{key:40s} {status:12s} {dt_s:6.2f}s" + (f"  {err[:160]}" if err else ""), flush=True)

    total = time.time() - t_all
    fails = {k: v for k, v in results.items() if v["status"] == "FAIL"}
    # Probe latency ceiling (VERDICT r8 task 2): the driver's gate
    # runs under parallel host load where sim times roughly double —
    # a probe near 10 s in sim risks a driver timeout. ENFORCED, not
    # observed: the sweep fails naming the probe, so a regression in
    # streaming fixtures / probe fixtures is a red sweep the same day
    # it lands, not a judge finding two rounds later.
    slow = {
        k: v["sec"] for k, v in results.items() if v["sec"] > PROBE_CEILING_S
    }
    print(f"\ntotal {total:.1f}s over {len(keys)} keys; {len(fails)} FAIL; "
          f"{len(slow)} over the {PROBE_CEILING_S:.0f}s ceiling")
    with open("/root/repo/scripts/driver_sim_out.json", "w") as fh:
        json.dump(results, fh, indent=1)
    if slow:
        print("PROBE CEILING EXCEEDED: "
              + ", ".join(f"{k}={s:.1f}s" for k, s in sorted(slow.items())))
    if fails:
        print(json.dumps(fails, indent=1))
    if fails or slow:
        sys.exit(1)


if __name__ == "__main__":
    main()
