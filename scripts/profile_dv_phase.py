"""Break down _compute_dv_updates cost on a fresh MOR-upsert state."""

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
    base = "/tmp/profile_dv_phase"
    shutil.rmtree(base, ignore_errors=True)

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderstatus",
    ).cache()
    o.count()

    # Build the table but DEFER dv so the state has pending sets
    t = ManagedTable(spark, os.path.join(base, "t"))
    t.write(
        o, mode="overwrite", primary_key=["o_orderkey"],
        properties={"mirror.dvMode": "deferred"},
    )
    mx = o.agg(F.max("o_orderkey")).first()[0]
    upd = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "price", F.lit(-1.0)
    )
    new = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + F.lit(mx + 1)).alias("o_orderkey"),
        F.lit(999.0).alias("price"),
        "o_orderstatus",
    )
    c = t.upsert(
        upd.unionByName(new), ["o_orderkey"], strategy="merge-on-read"
    )

    from component_delta_lake_writer_spark.sinks import deletion_vectors as DV
    from component_delta_lake_writer_spark.sinks.delta_log import (
        _log_has_dv_config,
        live_dv_descriptors,
    )
    from urllib.parse import unquote, urlparse

    for trial in range(3):
        marks = [("start", time.perf_counter())]

        log_dir = os.path.join(t.path, "_delta_log")
        _log_has_dv_config(log_dir)
        marks.append(("log_has_dv_config", time.perf_counter()))

        current_dvs = live_dv_descriptors(t.path)
        marks.append(("live_dv_descriptors", time.perf_counter()))

        ds = c.delete_sets[0]
        ds_dir = os.path.join(t._deletes_dir, ds["path"])

        import pyarrow.parquet as pq

        total = 0
        for dirpath, _d, files in os.walk(ds_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(dirpath, fn)
                    ).metadata.num_rows
        marks.append((f"ds_rows_footer({total})", time.perf_counter()))

        dels = spark.read.parquet(ds_dir)
        units = [u for u in ds["units"] if u in set(c.data_units)]
        scan = spark.read.parquet(
            *[os.path.join(t._data_dir, u) for u in units]
        ).select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_ri"),
            *[F.col(x) for x in dels.columns],
        )
        matched = scan.join(
            F.broadcast(dels.distinct()), dels.columns, "left_semi"
        ).select("_fp", "_ri")
        rows = matched.collect()
        marks.append((f"scan_join_collect({len(rows)})", time.perf_counter()))

        grouped: dict[str, set] = {}
        for r in rows:
            fp, i = r["_fp"], int(r["_ri"])
            grouped.setdefault(fp, set()).add(i)
        new_bitmaps = {}
        for fp, idx in grouped.items():
            rel = os.path.relpath(unquote(urlparse(fp).path), t.path)
            new_bitmaps[rel] = sorted(idx)
        marks.append(("group_driver", time.perf_counter()))

        DV.write_dv_file(t.path, new_bitmaps)
        marks.append(("write_dv_file", time.perf_counter()))

        out = []
        for i in range(1, len(marks)):
            out.append(f"{marks[i][0]}={marks[i][1] - marks[i-1][1]:.3f}")
        print(f"trial {trial}: " + " ".join(out))

    spark.stop()


if __name__ == "__main__":
    main()
