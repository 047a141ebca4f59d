"""CLI runner: list and execute registered queries from the shell.

    python -m banking_streaming_etl_spark --list
    python -m banking_streaming_etl_spark top_k_recent
    python -m banking_streaming_etl_spark cms_heavy_hitters --explain
    python -m banking_streaming_etl_spark bm25_topk --oracle --sf-dir /root/testdata/sf0.01

The operational entry a user of the reference (who drives everything
from scripts and dashboards) would reach for first. `--oracle` runs the
query's DuckDB twin side-by-side through the same comparator the
correctness gate uses.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="banking_streaming_etl_spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    ap.add_argument("--show", type=int, default=20, metavar="N",
                    help="rows to print (default 20)")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the DuckDB oracle and report the match")
    args = ap.parse_args(argv)

    from banking_streaming_etl_spark import registry

    qs = registry.all_queries()
    if args.list or not args.query:
        width = max(len(n) for n in qs)
        for n, q in qs.items():
            mark = "oracle" if q.oracle else "rows-only"
            print(f"{n:<{width}}  [{mark}] {q.doc}")
        return 0
    if args.query not in qs:
        print(f"unknown query: {args.query!r} (see --list)", file=sys.stderr)
        return 2

    from banking_streaming_etl_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    try:
        df = qs[args.query].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            # persist: show / the row-count footer / the oracle compare
            # would otherwise each re-execute the full plan
            df.persist()
            df.show(args.show, truncate=False)
            print(f"# {df.count()} rows", file=sys.stderr)
        if args.oracle:
            sql = qs[args.query].oracle
            if sql is None:
                print("# no oracle registered (rows-only query)",
                      file=sys.stderr)
            else:
                from banking_streaming_etl_spark.oracle import (
                    compare,
                    duckdb_connect,
                )

                report = compare(df, duckdb_connect(args.sf_dir), sql)
                print(f"# oracle match: {report['match']} ({report})",
                      file=sys.stderr)
                if not report["match"]:
                    return 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
