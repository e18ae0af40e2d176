"""Profile streaming probes: per-micro-batch durationMs breakdown.

Monkeypatches the shared drain to capture StreamingQuery.recentProgress
so the fixed micro-batch machinery (planning, state commit, sink add)
is attributed per phase — guide §1 (measure first) for the streaming
keys whose probe time is dominated by per-batch cost.

Usage: python scripts/profile_stream.py key1,key2 [--sf DIR] [--repeat N]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    keys = sys.argv[1].split(",")
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    global SF_DIR
    if "--sf" in sys.argv:
        SF_DIR = sys.argv[sys.argv.index("--sf") + 1]

    from component_delta_lake_writer_spark import get_spark
    from component_delta_lake_writer_spark.plans import QUERIES
    from component_delta_lake_writer_spark.streaming import structured

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    orig = structured._drain_to_memory

    def instrumented(spark, df, name, output_mode, state_partitions,
                     checkpoint=None):
        t0 = time.perf_counter()
        with structured.scoped_state_partitions(spark, state_partitions):
            writer = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
            )
            if checkpoint:
                writer = writer.option("checkpointLocation", checkpoint)
            t1 = time.perf_counter()
            q = writer.start()
            t2 = time.perf_counter()
            try:
                q.awaitTermination()
            except Exception:
                q.stop()
                raise
            t3 = time.perf_counter()
            prog = [json.loads(p.json) for p in q.recentProgress]
        print(f"  drain[{name}]: build={t1-t0:.3f} start={t2-t1:.3f} "
              f"await={t3-t2:.3f} batches={len(prog)}")
        for p in prog:
            dur = p.get("durationMs", {})
            so = p.get("stateOperators", [])
            st = "; ".join(
                f"op{i}: commit={s.get('commitTimeMs')}ms rows={s.get('numRowsTotal')}"
                for i, s in enumerate(so))
            print(f"    batch {p.get('batchId')}: rows={p.get('numInputRows')} "
                  f"dur={dur} {st}")
        return spark.table(name)

    structured._drain_to_memory = instrumented
    # also patch call sites that imported the symbol directly
    for mod_name, mod in list(sys.modules.items()):
        if mod_name.startswith("component_delta_lake_writer_spark") and \
                getattr(mod, "_drain_to_memory", None) is orig:
            mod._drain_to_memory = instrumented

    for key in keys:
        for i in range(repeat):
            t0 = time.perf_counter()
            n = QUERIES[key](spark, SF_DIR).count()
            print(f"{key} run{i}: {time.perf_counter()-t0:.3f}s ({n} rows)")


if __name__ == "__main__":
    main()
