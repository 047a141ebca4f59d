"""Z-order data layout: multi-dimensional file skipping for selective scans.

A parquet scan prunes files (and row groups) whose column min/max stats
don't overlap the predicate. A layout sorted on ONE column gives perfect
skipping on that column and none on any other; at 100 TB, dashboards that
slice the history by (user, time) or (region, value) need BOTH dimensions
to prune. Z-ordering interleaves the bits of the two keys into one sort
value, so files cover small rectangles of the 2-D key space instead of
thin slices — every file's min/max box is tight in both columns, and a
selective 2-D box predicate overlaps only a handful of files.

All JVM bit arithmetic (shiftright/&/|, a sum of shiftleft terms —
whole-stage-codegen'd, no UDF). The write is one repartitionByRange on
the z-value (a range shuffle — same cost as any sorted write) followed by
sortWithinPartitions, so the layout pays one shuffle at write time, like
operators/bucketing.py pays its one-time bucket shuffle.

The reference has no layout management (its history lands append-only via
JDBC, SURVEY.md §2.2 K2); this is the at-scale organization of that same
history table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2*Z_BITS total bits in the z-value. 16 bits per
#: dimension = 65536 cells per axis — far finer than any realistic file
#: count, so file boundaries land on cell boundaries, never inside one.
Z_BITS = 16


def _normalized(col: str, lo: Column, hi: Column) -> Column:
    """Scale a numeric column to an integer grid coordinate in
    [0, 2^Z_BITS): rank-free min/max normalization (two scalar stats, no
    global sort)."""
    span = (hi - lo).cast("double")
    unit = (F.col(col).cast("double") - lo.cast("double")) / F.when(
        span > 0, span
    ).otherwise(F.lit(1.0))
    grid = F.floor(unit * F.lit((1 << Z_BITS) - 1))
    return grid.cast("long")


def _interleave(x: Column, y: Column) -> Column:
    """Bit-interleave two Z_BITS-wide integers into the z-value:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def with_zvalue(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Attach the z-value column `_z` for (col_x, col_y).

    Min/max are computed once and broadcast as a 1-row frame (no driver
    collect) — the same scalar-broadcast pattern as the dashboard's exact
    p99 trim."""
    stats = df.agg(
        F.min(col_x).alias("_xlo"),
        F.max(col_x).alias("_xhi"),
        F.min(col_y).alias("_ylo"),
        F.max(col_y).alias("_yhi"),
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_z",
            _interleave(
                _normalized(col_x, F.col("_xlo"), F.col("_xhi")),
                _normalized(col_y, F.col("_ylo"), F.col("_yhi")),
            ),
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
) -> None:
    """Write parquet z-ordered on (col_x, col_y): one range shuffle on the
    z-value, one sort within each output file, stats-tight files in both
    dimensions."""
    (
        with_zvalue(df, col_x, col_y)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_overlap_fraction(
    path: str, col_x: str, col_y: str, box: tuple[float, float, float, float]
) -> float:
    """Fraction of data files whose (col_x, col_y) min/max stats overlap
    the query box (x_lo, x_hi, y_lo, y_hi) — the file-skipping measure a
    stats-pruning reader achieves on this layout. Footer-stats only;
    reads no data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    x_lo, x_hi, y_lo, y_hi = box
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ix, iy = schema_names.index(col_x), schema_names.index(col_y)
        stats = [
            (md.row_group(g).column(ix).statistics,
             md.row_group(g).column(iy).statistics)
            for g in range(md.num_row_groups)
        ]
        if any(sx is None or sy is None for sx, sy in stats):
            # no stats -> a pruning reader must scan the file: count a hit
            hit += 1
            continue
        xmin = min(sx.min for sx, _ in stats)
        xmax = max(sx.max for sx, _ in stats)
        ymin = min(sy.min for _, sy in stats)
        ymax = max(sy.max for _, sy in stats)
        if xmax >= x_lo and xmin <= x_hi and ymax >= y_lo and ymin <= y_hi:
            hit += 1
    return hit / max(len(files), 1)
