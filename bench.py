"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is total wall-clock over the suite; per-query
seconds let BASELINE.md comparisons track individual operators.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family (scan, agg, join, merge,
# window, sort, events, text, dedup, similarity, write path)
HEADLINE = [
    "parquet_scan",
    "agg_returnflag",
    "join_inner_pk",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_volume",
    "merge_upsert",
    "window_topk_per_group",
    "sort_limit_topk",
    "events_hourly_agg",
    "sessionize_events",
    "text_quality_score",
    "lang_id_ngram",
    "exact_dedup_docs",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "winnow_fingerprint_match",
    "cosine_topk",
    "ann_lsh_bucket_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "multimodal_meta",
    "streaming_hourly_agg",
    "tpch_q6_revenue_filter",
    "tpch_q18_large_orders",
    "pipeline_clean_corpus",
    "write_append",
    "upsert_write",
]


def main() -> None:
    from component_delta_lake_writer_spark import get_spark
    from component_delta_lake_writer_spark.plans import QUERIES

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing cache with a trivial action
    spark.range(1).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for key in HEADLINE:
        fn = QUERIES[key]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution
        dt = time.perf_counter() - t0
        per_query[key] = round(dt, 3)
        total += dt
        print(f"# {key}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
