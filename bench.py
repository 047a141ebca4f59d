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
    "revenue_by_nation",
    "perf_stats_by_modality",
    "perf_temporal_hourly",
    "order_enrichment",
    "zscore_per_payer",
    "sessionize_events",
    "top_k_recent",
    "asof_balance_at_tx",
    "dedup_exact_documents",
    "near_dup_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
    "tfidf_terms",
]

#: round-4 extension families, timed as a SEPARATE group so HEADLINE (and
#: its round-over-round total) stays comparable across rounds. Skipped
#: silently when not registered, like HEADLINE.
EXTENDED = [
    "cms_heavy_hitters",
    "bloom_filter_screen",
    "hybrid_retrieval_rrf",
    "ann_ivf_pq_topk",
    "psi_value_drift",
    "seasonal_decompose_hourly",
    "pit_balance_feature_join",
    "bpe_pair_counts",
    "source_ngram_overlap",
    "k_anonymity_report",
]


def _warm_streaming(spark, sf_dir: str) -> None:
    """One tiny replay (2 chunks of the sf0.001 events) before the
    measured one: the first streaming query in a session pays one-time
    micro-batch machinery + codegen costs (measured 3+ extra seconds,
    pure startup noise). BASELINE.md's reference number is steady-state
    micro-batch throughput, so the comparable measurement is the warmed
    one — same reasoning as the batch-side flagship warmup."""
    import shutil
    import tempfile

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.sources import stream as stream_src
    from banking_streaming_etl_spark.streaming import pipeline as spipe

    small_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(small_sf):
        small_sf = sf_dir
    work = tempfile.mkdtemp(prefix="bench_stream_warm_")
    try:
        stream_src.write_replay_chunks(
            spark, small_sf, f"{work}/chunks", n_chunks=2
        )
        tx = stream_src.read_transaction_stream(
            spark, f"{work}/chunks", max_files_per_trigger=2
        )
        out = spipe.approval_stream(
            tx,
            datamodel.users(spark, small_sf),
            datamodel.regions(spark, small_sf),
        )
        q = spipe.start_multi_sink(
            out,
            history_dir=f"{work}/hist",
            scores_dir=f"{work}/scores",
            checkpoint_dir=f"{work}/ckpt",
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_streaming_replay(spark, sf_dir: str) -> tuple[float, float, list[int]]:
    """Replay the whole events table through the streaming approval pipeline
    (file-stream source -> watermark -> joins -> scores -> parquet sink via
    foreachBatch) and return (elapsed_sec, rows_per_sec, batch_ms) — the
    numbers BASELINE.md compares (~1000 tx/s micro-batched on the
    reference, ~1000 ms steady-state micro-batch duration). batch_ms is
    the per-batch triggerExecution duration of every non-empty batch."""
    import shutil
    import tempfile

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.sources import stream as stream_src
    from banking_streaming_etl_spark.streaming import pipeline as spipe

    # q.recentProgress is capped by spark.sql.streaming.numRecentProgressUpdates
    # (default 100): a replay with more non-empty micro-batches than that
    # would silently report p50/p95 over only the most recent ones. Raise
    # the cap well above any replay length this bench produces.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        n_rows = stream_src.write_replay_chunks(
            spark, sf_dir, f"{work}/chunks", n_chunks=16
        )
        tx = stream_src.read_transaction_stream(
            spark, f"{work}/chunks", max_files_per_trigger=4
        )
        out = spipe.approval_stream(
            tx,
            datamodel.users(spark, sf_dir),
            datamodel.regions(spark, sf_dir),
        )
        t0 = time.perf_counter()
        q = spipe.start_multi_sink(
            out,
            history_dir=f"{work}/hist",
            scores_dir=f"{work}/scores",
            checkpoint_dir=f"{work}/ckpt",
        )
        q.processAllAvailable()
        elapsed = time.perf_counter() - t0
        batch_ms = [
            int((p.get("durationMs") or {}).get("triggerExecution", 0) or 0)
            for p in q.recentProgress
            if int(p.get("numInputRows", 0) or 0) > 0
        ]
        q.stop()
        return elapsed, n_rows / elapsed, batch_ms
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _warm(spark, queries, sf_dir: str) -> None:
    """Amortize one-time costs out of the per-query numbers: JVM/codegen
    (flagship run) and the session-shared shingle scans both dedup
    headliners read (operators/dedup.shared_shingle_hashes/_sizes) —
    materializing the shared INPUT once keeps each query's timing about
    ITS operator (banding vs brute join), not about who ran first."""
    if "approval_pipeline" in queries:
        queries["approval_pipeline"].fn(spark, sf_dir).count()
    if "near_dup_jaccard" in queries or "dedup_minhash_lsh" in queries:
        from banking_streaming_etl_spark.operators import dedup as _dedup

        _dedup.shared_shingle_hashes(spark, sf_dir).count()
        _dedup.shared_shingle_sizes(spark, sf_dir).count()


def _time_headline(spark, queries, names, sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {n} rows in {timings[name]:.3f}s", file=sys.stderr)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # unconventional dir name; still emit the JSON line
    spark = get_spark(app_name="bench")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]

    _warm(spark, queries, sf_dir)
    timings = _time_headline(spark, queries, names, sf_dir)

    # streaming replay runs BEFORE the scale-curve pass: streaming_tx_per_s
    # is the round-over-round comparable metric, so it must be measured
    # under the same session state every round — not after a second sf's
    # cached relations and codegen have piled up.
    _warm_streaming(spark, sf_dir)
    stream_sec, tx_per_s, batch_ms = bench_streaming_replay(spark, sf_dir)
    timings["streaming_replay"] = round(stream_sec, 4)

    # scale-curve datapoint: the same headline set one decade down
    # (sf0.01), so the design-for-scale claim carries an empirical slope —
    # near-linear scaling expected; a super-linear query is a red flag.
    sf001_total = None
    timings_sf001: dict[str, float] = {}
    sf001_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if os.path.isdir(sf001_dir) and os.path.abspath(sf001_dir) != os.path.abspath(
        sf_dir.rstrip("/")
    ):
        print(f"# scale curve: re-running headline at {sf001_dir}", file=sys.stderr)
        _warm(spark, queries, sf001_dir)
        timings_sf001 = _time_headline(spark, queries, names, sf001_dir)
        sf001_total = round(sum(timings_sf001.values()), 4)

    # extension families LAST: headline totals and the streaming replay
    # keep their round-over-round session state untouched.
    ext_names = [n for n in EXTENDED if n in queries]
    print("# extension families", file=sys.stderr)
    ext_timings = _time_headline(spark, queries, ext_names, sf_dir)
    ext_total = round(sum(ext_timings.values()), 4)
    batch_sorted = sorted(batch_ms)

    def _pct(q: float) -> int:
        if not batch_sorted:
            return 0
        return batch_sorted[min(len(batch_sorted) - 1, int(q * len(batch_sorted)))]

    print(
        f"# streaming_replay: {stream_sec:.3f}s ({tx_per_s:,.0f} tx/s, "
        f"batch p50={_pct(0.5)}ms p95={_pct(0.95)}ms)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # the BASELINE.md comparison numbers: the reference's
                # published ceiling is ~1,000 tx/s micro-batched
                # (maxOffsetsPerTrigger) at ~1,000 ms steady-state batches
                "streaming_tx_per_s": round(tx_per_s, 1),
                "streaming_batch_ms_p50": _pct(0.5),
                "streaming_batch_ms_p95": _pct(0.95),
                # one decade down the scale curve (None when the sibling
                # sf0.01 dir is absent or IS the target dir)
                "headline_sf001_total": sf001_total,
                "queries_sf001": timings_sf001,
                # round-4 extension families (separate group: HEADLINE
                # stays round-over-round comparable)
                "extended_total": ext_total,
                "queries_extended": ext_timings,
            }
        )
    )


if __name__ == "__main__":
    main()
