"""Profile the upsert_mor frozen-suite query phase by phase.

Round-7 perf triage: BENCH_r05 1.763 s -> BENCH_r06 2.597 s after the
round-6 deletion-vector mirror work. This script separates the write,
the MOR upsert (delete-set publish), the DV materialization inside the
commit, and the read-back, so the optimization targets the real cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from component_delta_lake_writer_spark.session import get_spark  # noqa: E402
from component_delta_lake_writer_spark.sinks.managed_table import (  # noqa: E402
    ManagedTable,
)
from component_delta_lake_writer_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark()
    import shutil

    base = "/tmp/profile_upsert_mor"
    shutil.rmtree(base, ignore_errors=True)

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderstatus",
    )
    o = o.cache()
    o.count()  # warm

    # Monkeypatch timing around _compute_dv_updates
    orig = ManagedTable._compute_dv_updates
    dv_times = []

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        r = orig(self, *a, **kw)
        dv_times.append(time.perf_counter() - t0)
        return r

    ManagedTable._compute_dv_updates = timed

    for trial in range(3):
        path = os.path.join(base, f"t{trial}")
        t = ManagedTable(spark, path)
        dv_times.clear()

        t0 = time.perf_counter()
        t.write(o, mode="overwrite", primary_key=["o_orderkey"])
        t_write = time.perf_counter() - t0

        mx = o.agg(F.max("o_orderkey")).first()[0]
        upd = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "price", F.lit(-1.0)
        )
        new = o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + F.lit(mx + 1)).alias("o_orderkey"),
            F.lit(999.0).alias("price"),
            "o_orderstatus",
        )
        src = upd.unionByName(new)
        src.count()  # warm the source plan

        write_dv = list(dv_times)
        dv_times.clear()
        t0 = time.perf_counter()
        t.upsert(src, ["o_orderkey"], strategy="merge-on-read")
        t_upsert = time.perf_counter() - t0
        upsert_dv = list(dv_times)

        t0 = time.perf_counter()
        t.read().count()
        t_read = time.perf_counter() - t0

        print(
            f"trial {trial}: write={t_write:.3f}s "
            f"(dv_in_write={sum(write_dv):.3f}) "
            f"upsert={t_upsert:.3f}s (dv_in_upsert={sum(upsert_dv):.3f}) "
            f"read={t_read:.3f}s"
        )

    spark.stop()


if __name__ == "__main__":
    main()
