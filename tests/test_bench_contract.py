"""Driver-contract pin for bench.py's ONE stdout JSON line.

Round 5 lost its comparable bench metric: the line outgrew the verify
driver's ~2,000-char stdout-tail capture and BENCH_r05.json recorded
"parsed": null. These tests pin the compact-line contract so the class
cannot recur: the worst-case payload bench.py can emit stays under
JSON_LINE_BUDGET, and the emitter degrades (drops the per-query map,
keeps every scalar) rather than overflow if a future edit fattens it.
"""

from __future__ import annotations

import json

import bench


def _worst_case_payload() -> dict:
    # every HEADLINE query (plus streaming_replay) at a 4-digit-seconds
    # timing — far beyond any observed value — and maximal-width scalars
    queries = {name: 9999.99 for name in bench.HEADLINE}
    queries["streaming_replay"] = 9999.99
    return {
        "metric": "headline_queries_total",
        "value": 99999.9999,
        "unit": "sec",
        "sf": 0.1,
        "timing": "median_of_3",
        "clean": False,
        "queries": queries,
        "streaming_tx_per_s": 999999.9,
        "streaming_batch_ms_p50": 99999,
        "streaming_batch_ms_p95": 99999,
        "headline_sf001_total": 99999.9999,
        "extended_total": 99999.9999,
        "extra_core_total": 99999.9999,
        "ann_ivf_pq_build": 9999.9999,
        "ann_ivf_pq_search": 9999.9999,
    }


def test_json_line_fits_driver_tail_capture():
    line = bench.emit_json_line(_worst_case_payload())
    assert len(line) < bench.JSON_LINE_BUDGET, (len(line), line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    # round-13 verdict #5: the hygiene verdict must survive into the
    # driver-parsed artifact
    assert parsed["clean"] is False
    assert "queries" in parsed  # compact form keeps the per-query map


def test_emitter_degrades_instead_of_overflowing():
    payload = _worst_case_payload()
    # simulate a future fattening: a per-query map far past the budget
    payload["queries"] = {f"query_with_a_long_name_{i}": 9999.99
                          for i in range(200)}
    line = bench.emit_json_line(payload)
    assert len(line) < bench.JSON_LINE_BUDGET
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["value"] == payload["value"]
    assert parsed["streaming_tx_per_s"] == payload["streaming_tx_per_s"]


def test_headline_list_is_stable():
    """CLAUDE.md invariant: the HEADLINE set (and so the comparable
    headline total) must not drift between rounds; extensions go to
    EXTENDED/EXTRA."""
    assert bench.HEADLINE == [
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


def test_quiet_host_gate_bounded_and_nonfatal(monkeypatch, capsys):
    """The startup quiet-host gate (round-10): on a busy host it must
    WAIT (bounded by SPARK_GRAFT_BENCH_LOAD_WAIT), never refuse — the
    driver's one-line JSON artifact must always be produced — and it
    must warn loudly when starting dirty."""
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (5.0, 5.0, 5.0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_WAIT", "0")
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    bench._await_quiet_host()  # returns instead of raising/exiting
    assert sleeps == []  # budget 0: no waiting at all
    err = capsys.readouterr().err
    assert "DIRTY" in err and "loadavg1m=5.0" in err

    # quiet host: no wait, no warning
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.2, 0.2))
    bench._await_quiet_host()
    assert capsys.readouterr().err == ""

    # busy then quiet: waits in 15s polls until the load drops
    loads = iter([(3.0,) * 3, (2.0,) * 3, (0.5,) * 3])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_WAIT", "300")
    bench._await_quiet_host()
    assert sleeps == [15.0, 15.0]
    assert "WARNING" not in capsys.readouterr().err


def test_detail_write_is_hygiene_gated(tmp_path, monkeypatch):
    """Round-11 verdict task #1: two post-snapshot dev runs (sf0.001,
    one beside a live pytest JVM) clobbered the committed clean
    BENCH_DETAIL.md because every invocation rewrote it unconditionally.
    Pin the gate: only a solo-at-start-AND-finish, quiet-host,
    default-SF run writes BENCH_DETAIL.md; everything else diverts to
    the gitignored BENCH_SCRATCH.md."""
    # the predicate, case by case
    assert bench._is_clean_run(1, 1, 0.5, 0.1)
    assert not bench._is_clean_run(2, 2, 0.5, 0.1)      # concurrent Spark JVM
    assert not bench._is_clean_run(1, 2, 0.5, 0.1)      # pytest launched mid-run
    assert not bench._is_clean_run(1, 1, 1.2, 0.1)      # busy host at start
    assert not bench._is_clean_run(1, 1, 0.5, 0.001)    # dev SF, not comparable
    assert not bench._is_clean_run(1, 1, -1.0, 0.1)     # loadavg unknowable
    assert not bench._is_clean_run(-1, 1, 0.5, 0.1)     # JVM count unknowable

    payload = {"metric": "headline_queries_total", "value": 1.0}
    clean_path = bench._write_detail(payload, clean=True, out_dir=str(tmp_path))
    assert clean_path.endswith("BENCH_DETAIL.md")
    dirty_path = bench._write_detail(payload, clean=False, out_dir=str(tmp_path))
    assert dirty_path.endswith("BENCH_SCRATCH.md")
    # the dirty write must not have touched the committed-artifact name
    detail = (tmp_path / "BENCH_DETAIL.md").read_text()
    scratch = (tmp_path / "BENCH_SCRATCH.md").read_text()
    assert "headline_queries_total" in detail and "headline_queries_total" in scratch

    # BENCH_SCRATCH.md must stay out of git (the whole point of the divert)
    import os
    gitignore = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                             ".gitignore")
    with open(gitignore) as f:
        assert "BENCH_SCRATCH.md" in f.read().split()

    # round-12 verdict task #3: every detail write self-labels its
    # origin so a driver-regenerated BENCH_DETAIL.md is distinguishable
    # from the builder's adjudicated run in the working-tree diff
    assert "# run_origin: external/unlabeled" in detail
    # monkeypatch.setenv restores any pre-set shell value on teardown
    # (round-13 advice: a bare os.environ set/del clobbered it)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ORIGIN", "builder-gated")
    bench._write_detail(payload, clean=True, out_dir=str(tmp_path))
    labeled = (tmp_path / "BENCH_DETAIL.md").read_text()
    assert "# run_origin: builder-gated" in labeled


def test_extra_rotating_media_rows_keep_even_parity():
    """ADVICE round-11: the two media rows must sit on EVEN rotation
    indices so the even slice (which alternates with the odd one per
    round) times them together; an insertion above them would silently
    flip the parity and the rows would be skipped with no failure."""
    assert bench.EXTRA_ROTATING.index("media_byte_entropy") % 2 == 0
    assert bench.EXTRA_ROTATING.index("media_body_dedup") % 2 == 0
