"""Query plans: the reference's query surfaces as named Spark queries.

`register_all()` populates the central registry; keep it cheap (imports
only — DataFrame construction happens when a query is invoked).
"""

from __future__ import annotations

_REGISTERED = False


def register_all() -> None:
    global _REGISTERED
    if _REGISTERED:
        return

    from banking_streaming_etl_spark.registry import register
    from banking_streaming_etl_spark.plans import approval

    register(
        "approval_pipeline",
        approval.approval_pipeline,
        approval.ORACLE_SQL,
        "flagship: enrich + risk scores + approval flags "
        "(streaming_etl.py:90-175)",
    )
    register(
        "approval_scores_output",
        approval.approval_scores_output,
        approval.ORACLE_SCORES_SQL,
        "transacoes_scores side-output projection (streaming_etl.py:209-219)",
    )

    _REGISTERED = True
