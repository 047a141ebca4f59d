"""Driver-mimic CLI: re-run the external verify driver's bit-strict
DuckDB comparison locally, on a PLAIN SparkSession (default confs, no
engine tuning) — the highest-fidelity local reproduction of the
per-round CORRECTNESS gate.

The external driver imports `__spark_entry__` with its own session and
hash-checks the FIRST 50 registered queries against `oracle_sql()` at
sf0.01. This script mimics that exactly (including the raw-float64-bit
compare `oracle.compare` has carried since round 9, which catches the
signed-zero class the driver's value hash sees), and generalizes it:

    python tools/drive_mimic.py                  # the 50-slot window
    python tools/drive_mimic.py --all            # every oracle-backed query
    python tools/drive_mimic.py name1 name2 ...  # an explicit list
    python tools/drive_mimic.py --sf-dir /root/testdata/sf0.1 --all

Exit code 0 iff every compared query matches. Used per round for the
post-rotation / end-of-round window drives and for pre-vetting rotation
shortlists (COVERAGE.md records the runs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*",
                    help="explicit query names (default: the 50-slot window)")
    ap.add_argument("--all", action="store_true",
                    help="every oracle-backed registered query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table directory (default: the driver's sf0.01)")
    ap.add_argument("--master", default="local[8]",
                    help="plain-session master (default local[8])")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # deliberately NO engine confs: the point is the driver's session
    spark = SparkSession.builder.master(args.master).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from banking_streaming_etl_spark.oracle import duckdb_connect, compare

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    if args.names:
        unknown = [n for n in args.names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        names = args.names
    elif args.all:
        names = [n for n in qs if n in oq]
    else:
        names = list(qs)[:50]

    con = duckdb_connect(args.sf_dir)
    bad: list[str] = []
    t_all = time.time()
    for i, n in enumerate(names, 1):
        if n not in oq:
            print(f"{i:3d} {n}: SKIP (rows-only, no oracle)", flush=True)
            continue
        t0 = time.time()
        r = compare(qs[n](spark, args.sf_dir), con, oq[n])
        status = "OK" if r["match"] else f"MISMATCH {r}"
        print(f"{i:3d} {n}: {status} ({time.time() - t0:.1f}s)", flush=True)
        if not r["match"]:
            bad.append(n)
    print(f"{len(names) - len(bad)}/{len(names)} green "
          f"in {time.time() - t_all:.0f}s; BAD: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
