"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed with a count-style action (results are not
collected to the driver — we measure engine time, not pickling). A warmup
run of the flagship amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from banking_streaming_etl_spark import registry
from banking_streaming_etl_spark.session import get_spark

#: headline set — flagship + the heaviest operator families. Queries not
#: yet registered are skipped silently so bench.py never breaks mid-build.
HEADLINE = [
    "approval_pipeline",
    "q1_pricing_summary",
    "perf_stats_by_modality",
    "perf_temporal_hourly",
    "order_enrichment",
    "zscore_per_payer",
    "top_k_recent",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: JVM, codegen, parquet footer caches
    queries["approval_pipeline"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {n} rows in {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
