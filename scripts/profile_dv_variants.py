"""Compare DV matched-pair computation strategies on the probe shape."""

import os
import shutil
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
    base = "/tmp/profile_dv_variants"
    shutil.rmtree(base, ignore_errors=True)

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderstatus",
    ).cache()
    o.count()
    t = ManagedTable(spark, os.path.join(base, "t"))
    t.write(
        o, mode="overwrite", primary_key=["o_orderkey"],
        properties={"mirror.dvMode": "deferred"},
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "price", F.lit(-1.0)
    )
    c = t.upsert(upd, ["o_orderkey"], strategy="merge-on-read")
    ds = c.delete_sets[0]
    ds_dir = os.path.join(t._deletes_dir, ds["path"])
    units = [u for u in ds["units"] if u in set(c.data_units)]
    unit_paths = [os.path.join(t._data_dir, u) for u in units]

    import pyarrow.dataset as pads

    def timeit(label, fn, n=4):
        best = None
        for i in range(n):
            t0 = time.perf_counter()
            r = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{label:34s} best={best:.3f}s  result={r}")

    def v_read_distinct():
        dels = spark.read.parquet(ds_dir)
        scan = spark.read.parquet(*unit_paths).select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_ri"),
            *[F.col(x) for x in dels.columns],
        )
        m = scan.join(
            F.broadcast(dels.distinct()), dels.columns, "left_semi"
        ).select("_fp", "_ri")
        return len(m.collect())

    def v_local_build():
        dels = spark.read.parquet(ds_dir)
        tbl = pads.dataset(ds_dir, format="parquet").to_table()
        local = spark.createDataFrame(tbl)
        scan = spark.read.parquet(*unit_paths).select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_ri"),
            *[F.col(x) for x in dels.columns],
        )
        m = scan.join(
            F.broadcast(local), dels.columns, "left_semi"
        ).select("_fp", "_ri")
        return len(m.collect())

    def v_local_build_toarrow():
        dels = spark.read.parquet(ds_dir)
        tbl = pads.dataset(ds_dir, format="parquet").to_table()
        local = spark.createDataFrame(tbl)
        scan = spark.read.parquet(*unit_paths).select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_ri"),
            *[F.col(x) for x in dels.columns],
        )
        m = scan.join(
            F.broadcast(local), dels.columns, "left_semi"
        ).select("_fp", "_ri")
        at = m.toArrow()
        return at.num_rows

    def v_driver_numpy():
        import numpy as np
        import pyarrow.parquet as pq

        keys = pads.dataset(ds_dir, format="parquet").to_table()
        kset = keys.column(0).to_numpy()
        n = 0
        for up in unit_paths:
            dset = pads.dataset(up, format="parquet")
            for frag in dset.get_fragments():
                col = pq.read_table(
                    frag.path, columns=["o_orderkey"]
                ).column(0).to_numpy()
                mask = np.isin(col, kset)
                n += int(mask.sum())
        return n

    timeit("read+distinct (orig)", v_read_distinct)
    timeit("local build (new)", v_local_build)
    timeit("local build + toArrow", v_local_build_toarrow)
    timeit("driver pyarrow+numpy", v_driver_numpy)

    spark.stop()


if __name__ == "__main__":
    main()
