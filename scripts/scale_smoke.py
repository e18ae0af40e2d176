"""10× scale smoke for the dedup/similarity family (BASELINE.md §4).

Replicates the sf0.1 documents table N× by id-offset union (duplicated
text → a worst-case near-dup workload: every replica is a true dup of
its original), materializes it to /tmp parquet once, then times the
rewritten operators end-to-end. Wall-clock staying near-flat vs the
row multiple is the behavior that extrapolates to a 1000-executor
cluster — these plans are parallelism-bound, not data-bound, at local
scale.

Usage: python scripts/scale_smoke.py [N]   (default 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from component_delta_lake_writer_spark import get_spark  # noqa: E402
from component_delta_lake_writer_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    work = tempfile.mkdtemp(prefix="scale_smoke_")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10**9))
            for i in range(scale)
        ],
    )
    path = os.path.join(work, "docs_big.parquet")
    big.write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    print(f"# corpus: {n0} docs x{scale} -> {big.count()}", file=sys.stderr)

    from component_delta_lake_writer_spark.operators import dedup as D
    from component_delta_lake_writer_spark.operators.clusters import (
        dedup_clusters,
    )
    from component_delta_lake_writer_spark.operators.text import (
        winnow_fingerprints,
    )

    def timed(name, fn):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.1f}s ({n} rows)")

    pairs = None

    def run_minhash():
        nonlocal pairs
        pairs = D.minhash_dedup(big, threshold=0.5).persist()
        return pairs.count()

    timed("minhash_dedup", run_minhash)
    timed("cluster_resolve", lambda: dedup_clusters(pairs).count())
    timed("exact_dedup", lambda: D.exact_dedup(big).count())
    timed(
        "ngram_jaccard",
        lambda: D.ngram_jaccard_dedup(big, threshold=0.5).count(),
    )
    timed("simhash_signatures", lambda: D.simhash_signatures(big).count())
    timed("winnow_fingerprints", lambda: winnow_fingerprints(big).count())
    pairs.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
