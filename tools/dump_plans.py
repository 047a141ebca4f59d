"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py [--tag r14] [--suffix before] [--sf DIR] [names... | --timed]

--timed dumps the bench's timed sets (HEADLINE + EXTENDED + EXTRA_CORE +
EXTRA_ROTATING). Also writes a summary TSV (exchanges, joins, python-eval
nodes per plan) to plans/<tag>/_summary_<suffix>.tsv for triage.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from banking_streaming_etl_spark import registry
from banking_streaming_etl_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


MARKERS = [
    ("exchange", r"\bExchange\b"),
    ("bhj", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("window", r"\bWindow\b"),
    ("py_eval", r"BatchEvalPython|ArrowEvalPython"),
    ("map_in_py", r"MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas"),
    ("codegen", r"WholeStageCodegen"),
    ("scan", r"Scan parquet"),
]


def summarize(text: str) -> dict[str, int]:
    return {k: len(re.findall(pat, text)) for k, pat in MARKERS}


def main() -> None:
    args = sys.argv[1:]
    tag, suffix = "r14", "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    timed = False
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        elif a == "--timed":
            timed = True
        else:
            names.append(a)
    if timed:
        import bench

        names = bench.HEADLINE + bench.EXTENDED + bench.EXTRA
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    queries = registry.all_queries()
    rows = []
    for name in names:
        if name not in queries:
            print(f"# skip (unregistered): {name}", file=sys.stderr)
            continue
        try:
            df = queries[name].fn(spark, sf_dir)
            text = plan_text(df)
        except Exception as e:  # noqa: BLE001 — triage tool, keep going
            print(f"# ERROR {name}: {e}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        s = summarize(text)
        rows.append((name, s))
        print(f"# {name}: " + " ".join(f"{k}={v}" for k, v in s.items() if v))
    with open(os.path.join(out_dir, f"_summary_{suffix}.tsv"), "w") as f:
        f.write("name\t" + "\t".join(k for k, _ in MARKERS) + "\n")
        for name, s in rows:
            f.write(name + "\t" + "\t".join(str(s[k]) for k, _ in MARKERS) + "\n")


if __name__ == "__main__":
    main()
