"""THE engine-portable hash ladder, defined once.

Every oracle-backed operator that needs reproducible pseudo-randomness
(KMV / CMS / Bloom sketches, DP noise, sampled order statistics,
curriculum shuffles, semantic-dedup seeding) derives it from this one
closed form:

    h(x) = ((x % M31) * a + b) % M31        M31 = 2^31

because (a) DuckDB can re-derive it bit-identically (unlike xxhash64 /
murmur), (b) the inner % bounds every multiply below 2^63 so ANSI mode
can never overflow-throw, and (c) for odd `a` the map is a BIJECTION of
the residue class (odd multiplier mod a power of two — pinned by a
hypothesis test), so "distinct keys -> distinct hashes" is a
construction guarantee.

Both dialects live here side by side so they cannot drift: a change to
one constant or one paren propagates to every Spark plan AND every
DuckDB oracle at once (CLAUDE.md's portable-randomness invariant).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the ladder's modulus (2^31).
M31 = 2147483648

#: default (glibc) LCG constants; the sketch family indexes the wider
#: table in operators/sketches._HASH_CONSTANTS for its independent rows.
LCG_A = 1103515245
LCG_B = 12345


def lcg_hash(col: Column, a: int = LCG_A, b: int = LCG_B) -> Column:
    """((x % M31) * a + b) % M31 as a Spark expression."""
    return ((col % F.lit(M31)) * F.lit(a) + F.lit(b)) % F.lit(M31)


def lcg_hash_sql(expr: str, a: int = LCG_A, b: int = LCG_B) -> str:
    """The same ladder as DuckDB SQL text."""
    return f"(({expr} % {M31}) * {a} + {b}) % {M31}"


def md5_48(col: Column) -> Column:
    """Engine-portable STRING hash: first 48 bits of md5 as a bigint.
    For when the key is text (the LCG ladder needs an integer input):
    both engines compute the identical value, so even hash COLLISIONS
    are consistent — a count of distinct md5_48 keys is oracle-exact at
    any corpus size (the hash-embed bucket recipe, widened to a shared
    helper for shingle-overlap counting)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def md5_48_sql(expr: str) -> str:
    """The same 48-bit md5 prefix as DuckDB SQL text."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 12)) AS BIGINT)"


def lcg_bucket(col: Column, a: int, b: int, width: int) -> Column:
    """Hash then reduce into [0, width) — sketch cell / bit coordinates."""
    return lcg_hash(col, a, b) % F.lit(width)


def lcg_bucket_sql(expr: str, a: int, b: int, width: int) -> str:
    return f"({lcg_hash_sql(expr, a, b)}) % {width}"
