"""Degenerate-corpus engine-parity sweep (round 8).

A 3-row slice of every table is the adversarial input for a whole
divergence class the normal gates never reach: one-class populations,
singleton groups, zero variances, zero-mass resamples. There Spark's
ANSI mode THROWS on x/0 while DuckDB silently emits NaN/inf (and
conversely DuckDB ERRORS on LN(0)/SQRT(-eps) where Spark yields
NULL/NaN) — so every statistic needs an explicit denominator/domain
guard that makes BOTH dialects emit NULL for the undefined case. The
round-8 sweep found and fixed 18 such sites; this module keeps the
class closed:

- the GUARDED list re-verifies each fixed query against its oracle on
  the tiny corpus every run;
- the REJECT list pins the queries whose builders are SUPPOSED to fail
  loudly here: they rank the scored frame under the explicit
  nulls="reject" policy, and the 3-row corpus breaks referential
  integrity (missing dims -> NULL scores), so the assert_true guard
  firing IS the contract;
- SPARK_GRAFT_DEGEN_SWEEP=1 runs the FULL oracle registry against the
  tiny corpus (~6 min) — the round-8 acceptance state is 214 matching
  + the 7 reject-policy raisers.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from banking_streaming_etl_spark import registry
from banking_streaming_etl_spark.oracle import compare, duckdb_connect

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: queries whose degenerate-input guards were added in round 8 — each
#: must MATCH its oracle (NULL statistics, never an engine divergence)
GUARDED = [
    "hill_tail_index",
    "ks_test_value_by_approval",
    "cohens_kappa_flags",
    "js_divergence_value_by_approval",
    "loo_target_encode_modality",
    "mannwhitney_value_by_approval",
    "anova_value_by_modality",
    "stratified_ate_balance_gate",
    "two_proportion_approval_test",
    "cramers_v_modality_approval",
    "brown_forsythe_value_by_modality",
    "cochran_armitage_trend",
    "classification_report_gate",
    "mad_outliers_per_modality",
    "bootstrap_mean_ci",
    "naive_bayes_approval",
    "neyman_allocation",
    "embedding_dimension_drift",
    "conformal_risk_thresholds",
    "conformal_by_modality",
    "hhi_by_region",
]

#: queries whose builders rank the scored frame under nulls="reject":
#: on this corpus the dims are missing, scores are NULL, and the
#: assert_true guard MUST fire (silently ranking NULL scores would
#: pollute every top-K / decile cell — the round-6/7 policy)
REJECTS = [
    "risk_score_auc",
    "spearman_value_score",
    "isotonic_calibration_bins",
    "calibration_error_metrics",
    "roc_curve_deciles",
    "score_calibration_deciles",
    "precision_recall_at_k",
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sfdegen")
    for t in TABLES:
        tbl = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(tbl.slice(0, 3), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_duck(degen_dir):
    con = duckdb_connect(degen_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", GUARDED)
def test_guarded_query_matches_oracle_on_degenerate_corpus(
    spark, degen_dir, degen_duck, name
):
    q = registry.all_queries()[name]
    report = compare(q.fn(spark, degen_dir), degen_duck, q.oracle)
    assert report["match"], f"{name}: {report}"


def test_reject_policy_queries_fail_loudly(spark, degen_dir):
    """One representative per family is enough — they all route through
    the same with_global_* nulls='reject' assert_true guard."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    q = registry.all_queries()["risk_score_auc"]
    with pytest.raises((CapturedException, Py4JJavaError)):
        q.fn(spark, degen_dir).collect()


def test_hill_all_ties_yields_null_alpha_in_both_engines(
    spark, tmp_path_factory
):
    """The 3-row corpus exercises k+1 > N; this pins the OTHER hill
    degenerate: enough rows to rank, but every tail value tied to the
    threshold, so soma_log is exactly 0 and the alpha division is x/0
    (Spark ANSI throws, DuckDB emits inf) unless guarded to NULL."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sfties")
    for t in TABLES:
        tbl = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "events":
            tbl = tbl.slice(0, 8)
            idx = tbl.schema.get_field_index("value")
            const = pa.array(
                [7.25] * tbl.num_rows,
                type=tbl.schema.field("value").type,
            )
            tbl = tbl.set_column(idx, tbl.schema.field("value"), const)
        else:
            tbl = tbl.slice(0, 3)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    con = duckdb_connect(str(d))
    try:
        q = registry.all_queries()["hill_tail_index"]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], report
        row = q.fn(spark, str(d)).collect()[0]
        assert row["soma_log"] == 0.0 and row["alfa_hill"] is None
    finally:
        con.close()


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_DEGEN_SWEEP"),
    reason="full ~6 min sweep; set SPARK_GRAFT_DEGEN_SWEEP=1 to run",
)
def test_full_registry_degenerate_sweep(spark, degen_dir, degen_duck):
    bad = []
    for name, q in registry.all_queries().items():
        if q.oracle is None:
            continue
        try:
            r = compare(q.fn(spark, degen_dir), degen_duck, q.oracle)
            if not r["match"]:
                bad.append((name, "MISMATCH"))
        except Exception as e:
            if name not in REJECTS:
                bad.append((name, repr(e)[:120]))
        spark.catalog.clearCache()
    assert bad == [], bad
