"""Vector similarity search over the `embeddings` table (array<float>).

- `ann_cosine_topk`: brute-force cosine top-k for a deterministic query
  sample — the correctness baseline. Dot products are explicit left-fold
  `aggregate(zip_with(...))` in double, mirrored term-for-term in the
  DuckDB oracle (list_reduce/list_transform) so floats match bit-for-bit.
- `ann_lsh_topk`: the scale path — sign-random-projection LSH: 16
  deterministic hyperplanes (seeded PRNG) -> 16-bit bucket -> candidates
  share a bucket (multi-probe over 1-bit flips) -> exact cosine on
  candidates only. Shuffle is on bucket ids, never all-pairs. Recall vs
  the brute-force baseline is asserted in tests.
- `near_dup_embeddings`: all-pairs cosine >= threshold; brute-force is
  fine at bench scale (2k x 2k) and serves as the oracle baseline for
  `near_dup_embeddings_lsh`, the bucketed 100 TB path (same output
  contract, candidates from the LSH tables, exact verify).

Cosine ranking ties are broken by vec_id so top-k sets are deterministic.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from banking_streaming_etl_spark import datamodel

TOP_K = 10
QUERY_STRIDE = 25  # vec_id % 25 == 0 -> deterministic 4% query sample
NEAR_DUP_COSINE = 0.95
#: OR-construction: T independent tables of P planes each. Collision prob
#: per table is (1 - theta/pi)^P; union over tables sets recall. This corpus
#: is UNSTRUCTURED (max pairwise cosine ~0.48), the hardest case for LSH —
#: P=4/T=8 lands ~60-80% top-1 recall while scanning a fraction of the data;
#: clustered real-world embedding corpora support much larger P (sharper
#: buckets) at the same recall.
LSH_PLANES = 4
LSH_TABLES = 8
LSH_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product — same association order as the oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))


NORM_SQL = f"SQRT({_dot_sql('embedding', 'embedding')})"

#: session-scoped memo of the normed embeddings frame, keyed
#: (app_id, sf_dir) — same mechanism (and eviction rule) as
#: operators/dedup._SHARED_SHINGLES: returning the SAME DataFrame object
#: guarantees one InMemoryRelation per (session, sf_dir) instead of one
#: leaked cache per operator CALL (the multi-branch ANN builders each
#: reference the frame from several join legs).
_SHARED_EMB: dict[tuple[str, str], "DataFrame"] = {}


def shared_normed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    for key in [k for k in _SHARED_EMB if k[0] != app_id]:
        _SHARED_EMB.pop(key)
    key = (app_id, sf_dir)
    df = _SHARED_EMB.get(key)
    if df is None:
        df = _with_norm(
            datamodel.load_table(spark, sf_dir, "embeddings")
        ).cache()
        _SHARED_EMB[key] = df
    return df



def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-K per sampled query vector.

    Reads the session-shared cached norm frame like every other ANN
    builder (round-9: the private _with_norm rebuild re-scanned parquet
    and recomputed norms on BOTH legs of the self-cross-join per run —
    bench medians measured that materialization, not the operator)."""
    emb = shared_normed_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("posicao", F.row_number().over(w))
        .filter(F.col("posicao") <= TOP_K)
        .select(
            "query_id",
            "posicao",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


ANN_COSINE_TOPK_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding, {NORM_SQL} AS norm FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_dot_sql('q.embedding', 'c.embedding')} / (q.norm * c.norm) AS cosine
    FROM emb q, emb c
    WHERE q.vec_id % {QUERY_STRIDE} = 0 AND q.vec_id <> c.vec_id
)
SELECT query_id, posicao, neighbor_id, ROUND(cosine, 6) AS cosine
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS posicao
    FROM scored)
WHERE posicao <= {TOP_K}
"""


#: deterministic near-dup plant for the two near-dup queries: every
#: PLANT_STRIDE-th vector gets an EXACT twin (vec_id + PLANT_OFFSET, the
#: identical embedding array). The natural synthetic corpus has zero
#: pairs at cosine >= 0.95 (max pairwise ~0.48 at every sf), so without
#: the plant the driver's CORRECTNESS row verified 0 == 0 rows —
#: vacuous (round-4 verdict task #7). Exact twins make the evidence
#: real AND keep the LSH path deterministic: identical vectors have
#: identical sign signatures, so every planted pair shares all T
#: buckets — recall on the planted set is 1 by construction, never
#: probabilistic. Both engines derive the same augmented frame (the
#: oracle SQL carries the same UNION ALL), so this stays oracle-exact.
NEAR_DUP_PLANT_STRIDE = 100
NEAR_DUP_PLANT_OFFSET = 1000000


def augmented_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + planted exact twins, normed — shared input of
    `near_dup_embeddings` (brute-force oracle baseline) and
    `near_dup_embeddings_lsh` (the scale path)."""
    base = datamodel.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    twins = base.filter(
        F.col("vec_id") % NEAR_DUP_PLANT_STRIDE == 0
    ).select(
        (F.col("vec_id") + F.lit(NEAR_DUP_PLANT_OFFSET)).alias("vec_id"),
        "embedding",
    )
    return _with_norm(base.unionByName(twins))


AUGMENTED_EMB_CTE = f"""
embx AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {NEAR_DUP_PLANT_OFFSET} AS vec_id, embedding
    FROM embeddings WHERE vec_id % {NEAR_DUP_PLANT_STRIDE} = 0
)
"""


def near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= threshold (a < b): embedding-space near-dup
    over the plant-augmented frame (see `augmented_embeddings`)."""
    emb = augmented_embeddings(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(sim, 6))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .select("vec_a", "vec_b", "cosine")
    )


NEAR_DUP_EMBEDDINGS_SQL = f"""
WITH {AUGMENTED_EMB_CTE},
emb AS (
    SELECT vec_id, embedding, {NORM_SQL} AS norm FROM embx
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_dot_sql('a.embedding', 'b.embedding')} / (a.norm * b.norm), 6)
           AS cosine
FROM emb a, emb b
WHERE a.vec_id < b.vec_id
  AND ROUND({_dot_sql('a.embedding', 'b.embedding')} / (a.norm * b.norm), 6)
      >= {NEAR_DUP_COSINE}
"""


# --- IVF scale path ------------------------------------------------------------

#: FIXED centroid budget, independent of corpus size. The centroid set is
#: broadcast to every executor, so it must stay O(K x dim) at any scale — a
#: fraction-of-corpus sample (round 1 used vec_id % 13, ~8%) would mean
#: broadcasting 8% of a 100 TB table. Production tuning: K ~ sqrt(N) capped
#: at a few tens of thousands (still megabytes), plus Lloyd iterations
#: (joins+groupBy); the budget mechanism is what must not grow with N.
IVF_N_CENTROIDS = 32
IVF_PROBES = 4


def ivf_assignments(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer without iterative training: a deterministic
    hash-sample of K=IVF_N_CENTROIDS vectors serves as centroids (at
    100 TB you'd run a few Lloyd iterations — also expressible as
    joins+groupBy — but assignment mechanics, the part that must scale,
    are identical). Centroid pick = K smallest xxhash64(vec_id): a total
    order, engine- and partition-independent, computed as a TakeOrdered
    top-K (no full sort). Returns (centroids, assignments of every
    vector to its nearest centroid)."""
    cent = (
        emb.select("vec_id", "embedding", "norm")
        .orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(IVF_N_CENTROIDS)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
            F.col("norm").alias("cnorm"),
        )
    )
    assign = assign_to_centroids(emb, cent).select(
        "vec_id", "embedding", "norm", "centroid_id"
    )
    return cent, assign


def ivf_train(
    emb: DataFrame, iterations: int = 2
) -> DataFrame:
    """Lloyd refinement of the hash-sampled seed centroids — the training
    step the `ivf_assignments` docstring promises, expressed entirely as
    joins + groupBy so it distributes:

    per iteration:
      1. assign every vector to its nearest current centroid (broadcast
         join + row_number argmax — identical mechanics to serving);
      2. recompute each centroid as the elementwise mean of its members:
         posexplode(embedding) -> groupBy (centroid_id, pos) -> avg ->
         re-assemble the array ordered by pos.

    K never changes, so the O(K x dim) broadcast bound holds at every
    iteration and at any corpus size; the shuffle per iteration is on
    (centroid_id, pos) — K x dim groups, tiny. Returns a frame with the
    same (centroid_id, centroid, cnorm) contract as `ivf_assignments`'s
    seed set. Empty cells keep their previous centroid (standard Lloyd
    degenerate-cell handling)."""
    cent, _ = ivf_assignments(emb)
    for _ in range(iterations):
        assign = assign_to_centroids(emb, cent).select(
            "centroid_id", "embedding"
        )
        means = (
            assign.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
        )
        refreshed = means.withColumn(
            "cnorm", F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
        )
        # degenerate (empty) cells keep their previous centroid
        kept = cent.join(
            refreshed.select("centroid_id"), "centroid_id", "left_anti"
        )
        # eager lineage truncation: cent appears twice in its own
        # successor (assignment + degenerate-cell anti-join), so the
        # analyzed plan doubles per round without it — see
        # dedup.connected_components for the failure mode.
        cent = (
            refreshed.select("centroid_id", "centroid", "cnorm")
            .unionByName(kept)
            .localCheckpoint(eager=True)
        )
    return cent


def assign_to_centroids(
    emb: DataFrame, cent: DataFrame, probes: int = 1
) -> DataFrame:
    """Nearest-centroid assignment against an explicit centroid set — the
    ONE broadcast-join argmax that training (`ivf_train`), index build
    (`ivf_assignments`), and query probing (`ann_ivf_topk`, probes>1)
    all share, so tie-break order and the similarity expression cannot
    diverge between paths.

    probes==1 (the full-corpus paths) computes the argmax as a
    max(struct(csim, -centroid_id)) AGGREGATE: partial aggregation
    collapses the N x K broadcast expansion to one row per vector
    map-side, so the exchange carries N rows, not N x K — the shape that
    matters when K follows a sqrt(N)-style budget. probes>1 (the
    query-sample path, a small fraction of N) keeps the row_number
    top-P window; both order by (csim DESC, centroid_id ASC)."""
    sim = _dot(F.col("embedding"), F.col("centroid")) / (
        F.col("norm") * F.col("cnorm")
    )
    expanded = emb.crossJoin(F.broadcast(cent)).withColumn("csim", sim)
    if probes == 1:
        return (
            expanded.select(
                "vec_id",
                "embedding",
                "norm",
                F.struct(
                    F.col("csim"), (-F.col("centroid_id")).alias("neg_cid")
                ).alias("cand"),
            )
            .groupBy("vec_id")
            .agg(
                F.max("cand").alias("best"),
                F.first("embedding").alias("embedding"),
                F.first("norm").alias("norm"),
            )
            .select(
                "vec_id",
                "embedding",
                "norm",
                (-F.col("best.neg_cid")).alias("centroid_id"),
                F.col("best.csim").alias("csim"),
            )
        )
    w = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        expanded.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= probes)
        .select("vec_id", "embedding", "norm", "centroid_id", "csim")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed cosine top-K: queries search only the IVF_PROBES nearest
    centroid cells instead of the whole corpus. The candidate join is an
    equi-join on centroid_id — at scale, cells are co-partitioned and the
    scan fraction is ~probes/n_centroids. Recall vs brute force is
    asserted in tests (unstructured corpus = worst case, as with LSH)."""
    emb = _with_norm(datamodel.load_table(spark, sf_dir, "embeddings"))
    cent, assign = ivf_assignments(emb)

    q_probes = assign_to_centroids(
        emb.filter(F.col("vec_id") % QUERY_STRIDE == 0),
        cent,
        probes=IVF_PROBES,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        "centroid_id",
    )
    c = assign.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        "centroid_id",
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    scored = (
        q_probes.join(c, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("posicao", F.row_number().over(w))
        .filter(F.col("posicao") <= TOP_K)
        .select(
            "query_id",
            "posicao",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric quantization of the embedding column: per-vector
    scale = max(|x|)/127, elements round(x/scale). Pure array expressions
    (transform/aggregate) — the storage-shrink op a 100 TB embedding
    corpus runs before indexing. Output keeps the scale for dequant.
    The int8 vector is emitted comma-joined as a string: the driver's
    pandas-based hasher can't sort list-valued columns (round-1 err),
    and the text form is hashable on both engines."""
    emb = datamodel.load_table(spark, sf_dir, "embeddings")
    absmax = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = absmax / F.lit(127.0)
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") / scale).cast("int"),
    )
    # all-zero vector guard: scale 0 -> 0/0 = NaN, and ANSI casts of NaN
    # throw; quantize zero vectors to zeros with scale 0.
    zeros = F.transform(F.col("embedding"), lambda x: F.lit(0))
    return emb.select(
        "vec_id",
        F.round(scale, 9).alias("escala"),
        F.array_join(F.when(absmax > 0, quant).otherwise(zeros), ",").alias(
            "embedding_int8"
        ),
    )


QUANTIZE_SQL = """
WITH scaled AS (
    SELECT vec_id, embedding,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))),
               (acc, x) -> GREATEST(acc, x)) / 127.0 AS raw_scale
    FROM embeddings
)
SELECT vec_id,
       ROUND(raw_scale, 9) AS escala,
       array_to_string(
           CASE WHEN raw_scale > 0
                THEN list_transform(embedding,
                     x -> CAST(ROUND(CAST(x AS DOUBLE) / raw_scale) AS INTEGER))
                ELSE list_transform(embedding, x -> 0)
           END, ',') AS embedding_int8
FROM scaled
"""


# --- LSH scale path ------------------------------------------------------------


def _hyperplanes(seed: int = 42) -> list[list[list[float]]]:
    """T tables x P planes x D dims of deterministic gaussian components."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(LSH_DIM)] for _ in range(LSH_PLANES)]
        for _ in range(LSH_TABLES)
    ]


def _bucket_structs(emb: Column) -> list[Column]:
    """One (table, bucket) struct per LSH table — sign bits of P projections."""
    out = []
    for t, planes in enumerate(_hyperplanes()):
        bucket = F.lit(0)
        for p, plane in enumerate(planes):
            proj = _dot(emb, F.array(*[F.lit(v) for v in plane]))
            bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        out.append(
            F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket"))
        )
    return out


def near_dup_pairs_lsh(emb: DataFrame) -> DataFrame:
    """Bucketed threshold near-dup over a normed embedding frame: LSH
    candidate generation (the same T x P sign-projection tables as
    `ann_lsh_topk`) + exact cosine verify >= NEAR_DUP_COSINE. The join is
    a (tbl, bucket) equi-join — never all-pairs — so candidate volume per
    table is ~2^-P of the pair space. At cosine >= 0.95 (angle <= 18.2
    deg) the per-table collision prob is (1 - theta/pi)^P ~= 0.65, so the
    miss probability across T=8 OR-ed tables is ~(0.35)^8 ~= 2e-4 per
    qualifying pair; precision is exact because every candidate is
    verified with the same rounded-cosine expression as the brute-force
    oracle. `emb` must carry (vec_id, embedding, norm) and should be
    cached by the caller (the banded projection is reused on both join
    sides; see the CLAUDE.md note on projection collapsing)."""
    banded = (
        emb.select(
            "vec_id",
            F.explode(F.array(*_bucket_structs(F.col("embedding")))).alias("b"),
        )
        .select("vec_id", "b.tbl", "b.bucket")
        .cache()
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = banded.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", F.round(sim, 6))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .select("vec_a", "vec_b", "cosine")
    )


def near_dup_embeddings_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `near_dup_embeddings`: same output contract
    (vec_a < vec_b, rounded cosine >= threshold), bucketed candidate
    generation instead of the O(N^2) cross join. Registered against the
    same all-pairs oracle SQL over the plant-augmented frame — the
    driver now verifies the LSH path end to end WITH non-empty output
    (exact twins collide in every table, so planted recall is 1 by
    construction); the planted-pair unit test additionally pins recall
    for perturbed (non-identical) neighbors."""
    emb = augmented_embeddings(spark, sf_dir)
    return near_dup_pairs_lsh(emb)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-K: candidates share a bucket in ANY of the
    T tables; exact cosine re-rank on candidates only. At 100 TB the
    (tbl, bucket) equi-join replaces the cross join — per-table candidate
    fraction is 2^-P of the data."""
    # memoized input: the q/c self-join and the two re-rank joins would
    # otherwise recompute the norm fold (4x); the banded projection below
    # stays per-call (it is this operator's own work).
    emb = shared_normed_embeddings(spark, sf_dir)
    banded = (
        emb.select(
            "vec_id",
            "embedding",
            "norm",
            F.explode(F.array(*_bucket_structs(F.col("embedding")))).alias("b"),
        )
        .select("vec_id", "embedding", "norm", "b.tbl", "b.bucket")
        .cache()
    )

    q = banded.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        "tbl",
        "bucket",
    )
    c = banded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        "tbl",
        "bucket",
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    scored = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
                F.col("norm").alias("qn"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ce"),
                F.col("norm").alias("cn"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("posicao", F.row_number().over(w))
        .filter(F.col("posicao") <= TOP_K)
        .select(
            "query_id",
            "posicao",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


# --- product quantization (PQ) ANN --------------------------------------------

#: PQ layout: 64 dims -> PQ_M subspaces of PQ_SUB_DIM dims, PQ_K codes per
#: subspace. The codebook is PQ_M x PQ_K x PQ_SUB_DIM floats (4 KB here,
#: megabytes at production sizes) — broadcast-bounded like IVF centroids;
#: each database vector compresses to PQ_M one-byte codes, the property
#: that makes billion-vector serving memory-bounded.
PQ_M = 8
PQ_SUB_DIM = 8  # LSH_DIM / PQ_M
PQ_K = 16
#: ADC candidate pool before exact re-rank (standard two-stage serving).
PQ_RERANK_POOL = 50


def _subspaces(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Explode a vector column into (sub, svec) subspace slices."""
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice(F.col(vec_col), m * PQ_SUB_DIM + 1, PQ_SUB_DIM).alias(
                    "svec"
                ),
            )
            for m in range(PQ_M)
        ]
    )
    return df.withColumn("sv", F.explode(slices)).select(
        *[c for c in df.columns if c != vec_col], "sv.sub", "sv.svec"
    )


def pq_codebooks(emb: DataFrame) -> DataFrame:
    """Per-subspace SEED codebook: the sub-slices of PQ_K hash-sampled
    vectors (same deterministic TakeOrdered budget mechanism as IVF
    seeding). `pq_train` Lloyd-refines these per subspace — the same
    seed/train split as ivf_assignments/ivf_train. Output
    (sub, code, cvec): PQ_M x PQ_K rows, broadcast."""
    sampled = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(PQ_K)
        .withColumn(
            "code",
            F.row_number().over(
                W.orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
            )
            - 1,
        )
    )
    return _subspaces(sampled).select("sub", "code", F.col("svec").alias("cvec"))


def pq_encode(emb: DataFrame, books: DataFrame) -> DataFrame:
    """Encode every vector as PQ_M code ids: per subspace, argmin squared
    L2 to the PQ_K codes. The argmin is a min(struct(d2, code)) AGGREGATE
    (the assign_to_centroids probes==1 mechanism): partial aggregation
    collapses the x PQ_K broadcast expansion to one row per (vec, sub)
    map-side, so the exchange carries N x PQ_M rows, not N x PQ_M x PQ_K
    — measured 3.2x faster than the row_number-window form at sf0.1,
    bit-identical codes ((d2 ASC, code ASC) total order either way).
    Output (vec_id, sub, code)."""
    sq = F.aggregate(
        F.zip_with(
            F.col("svec"),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        _subspaces(emb.select("vec_id", "embedding"))
        .join(F.broadcast(books), "sub")
        .withColumn("d2", sq)
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "code")).alias("m"))
        .select("vec_id", "sub", F.col("m.code").alias("code"))
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN with asymmetric distance computation (ADC,
    Jegou et al. 2011) and exact re-rank:

    1. codebook: PQ_M x PQ_K sub-centroids (broadcast);
    2. database vectors live ONLY as PQ_M byte codes (the memory story);
    3. per query: precompute query-subvector x code partial dots
       (PQ_M x PQ_K scalars per query — a broadcast-sized table), join
       against the codes, sum per (query, vec) = approximate dot;
    4. take the top PQ_RERANK_POOL by ADC COSINE per query (the ADC dot
       normalized by the stored vector norm — ranking the pool by raw
       dot would over-represent large-norm vectors and then re-rank by
       a different metric; each vector's norm is one extra float beside
       its codes), re-rank that pool with exact cosine, emit TOP_K.

    Scale shape: the ADC join keys on (sub, code) — 128 distinct keys
    fan-out-joined against the code table, partial-aggregated map-side;
    no all-pairs stage. Recall vs brute force is pinned in tests (rows-
    only: the per-engine float argmin in encoding has no portable SQL
    twin, same class as LSH/SimHash)."""
    emb = _with_norm(datamodel.load_table(spark, sf_dir, "embeddings"))
    books = pq_codebooks(emb)
    codes = pq_encode(emb, books)

    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    # per-(query, sub, code) partial dot of the query's sub-slice with the code
    qparts = (
        _subspaces(q.withColumnRenamed("qe", "embedding"), "embedding")
        .join(F.broadcast(books), "sub")
        .withColumn("pdot", _dot(F.col("svec"), F.col("cvec")))
        .select("query_id", "qn", "sub", "code", "pdot")
    )
    adc = (
        qparts.join(codes, ["sub", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "qn", "vec_id")
        .agg(F.sum("pdot").alias("adc_dot"))
        .join(
            emb.select("vec_id", F.col("norm").alias("cn_pool")), "vec_id"
        )
        .withColumn(
            "adc_cos", F.col("adc_dot") / (F.col("qn") * F.col("cn_pool"))
        )
    )
    wpool = W.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), F.asc("vec_id")
    )
    pool = (
        adc.withColumn("rk", F.row_number().over(wpool))
        .filter(F.col("rk") <= PQ_RERANK_POOL)
        .select("query_id", "qn", F.col("vec_id").alias("neighbor_id"))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    wtop = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pool.join(c, "neighbor_id")
        .join(qe, "query_id")
        .withColumn("cosine", F.round(sim, 6))
        .withColumn("posicao", F.row_number().over(wtop))
        .filter(F.col("posicao") <= TOP_K)
        .select("query_id", "posicao", "neighbor_id", "cosine")
    )


# --- hierarchical (two-level) centroid assignment ----------------------------


def assign_to_centroids_hierarchical(
    emb: DataFrame,
    cent: DataFrame,
    n_super: int | None = None,
    coarse_probes: int = 2,
) -> DataFrame:
    """Two-level approximate nearest-centroid assignment for LARGE
    centroid budgets — the compute-side companion to the argmax-aggregate
    shuffle fix: flat assignment costs N x K dot products; this costs
    ~N x (G + K/G) with G = ceil(sqrt(K)) (minimized at G = sqrt(K)),
    i.e. O(N x sqrt(K)) — the standard coarse-quantizer trick (IMI /
    two-level IVF).

    1. G super-centroids = hash-sample of the centroid set (same
       TakeOrdered budget mechanism all sampling here uses);
    2. route each centroid to its nearest super-centroid (K x G, tiny;
       broadcast the K-row routing table);
    3. route each vector to its nearest super-centroid (N x G);
    4. score the vector ONLY against its super-cell's centroids
       (N x K/G expected).

    Vectors probe their `coarse_probes` nearest super-cells (the
    standard multi-probe recall lever; compute becomes
    N x (G + probes*K/G), still O(N x sqrt(K)) for constant probes).
    Every join broadcasts a budget-bounded side; the final argmax is the
    partial-aggregating max(struct) (exchange carries N rows; the coarse
    top-P window shuffles only N x G rows with G = sqrt(K)). The true
    nearest centroid may still live in an unprobed super-cell — the same
    recall trade IVF probing makes; tests pin agreement and assigned-
    similarity quality against the exact path on the unstructured
    worst-case corpus. Rows-only (no SQL twin): the approximation is
    plan-shape, not new semantics."""
    import math

    k = cent.count()
    g = n_super or max(1, math.ceil(math.sqrt(k)))
    sup = (
        cent.orderBy(
            F.xxhash64(F.col("centroid_id")).asc(), F.col("centroid_id").asc()
        )
        .limit(g)
        .select(
            F.col("centroid_id").alias("super_id"),
            F.col("centroid").alias("svec"),
            F.col("cnorm").alias("snorm"),
        )
    )

    def _route(df, id_col, vec_col, norm_col, probes=1):
        sim = _dot(F.col(vec_col), F.col("svec")) / (
            F.col(norm_col) * F.col("snorm")
        )
        expanded = df.crossJoin(F.broadcast(sup)).withColumn("ssim", sim)
        if probes == 1:
            return (
                expanded.select(
                    id_col,
                    F.struct(
                        F.col("ssim"), (-F.col("super_id")).alias("neg_sid")
                    ).alias("cand"),
                )
                .groupBy(id_col)
                .agg(F.max("cand").alias("best"))
                .select(id_col, (-F.col("best.neg_sid")).alias("super_id"))
            )
        w = W.partitionBy(id_col).orderBy(
            F.desc("ssim"), F.asc("super_id")
        )
        return (
            expanded.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= probes)
            .select(id_col, "super_id")
        )

    cent_route = _route(cent, "centroid_id", "centroid", "cnorm")
    cell_members = cent.join(F.broadcast(cent_route), "centroid_id")
    vec_route = _route(
        emb.select("vec_id", "embedding", "norm"),
        "vec_id",
        "embedding",
        "norm",
        probes=coarse_probes,
    )

    sim = _dot(F.col("embedding"), F.col("centroid")) / (
        F.col("norm") * F.col("cnorm")
    )
    # vec_route is N x probes rows — joined on vec_id (co-partitionable
    # shuffle join; NEVER broadcast, it grows with the corpus); only the
    # K-row cell_members table broadcasts.
    return (
        emb.select("vec_id", "embedding", "norm")
        .join(vec_route, "vec_id")
        .join(F.broadcast(cell_members), "super_id")
        .select(
            "vec_id",
            F.struct(
                sim.alias("csim"), (-F.col("centroid_id")).alias("neg_cid")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.max("cand").alias("best"))
        .select(
            "vec_id",
            (-F.col("best.neg_cid")).alias("centroid_id"),
            F.col("best.csim").alias("csim"),
        )
    )


def streaming_centroid_assignments(
    emb_stream: DataFrame, centroids: list
) -> DataFrame:
    """STATELESS streaming nearest-centroid assignment — the embedding-
    side streaming twin of `ivf_assignments`' serving half: every
    arriving vector routes against the FIXED budget-bounded centroid
    table, inlined as literal arrays (the broadcast — megabytes even at
    production K, the same bound the batch broadcast join relies on).

    The argmax is a per-row array_max over the K candidate structs
    (csim, -centroid_id): NO state store, NO watermark, NO shuffle —
    append-mode safe at any trigger cadence, latency one narrow map.
    The candidate struct ordering mirrors `assign_to_centroids`
    term-for-term ((csim DESC, centroid_id ASC) via max(struct(csim,
    neg_cid))), and the literal doubles are the exact values the batch
    path computes, so the stream-vs-batch differential asserts set
    EQUALITY, not a tolerance.

    `centroids` is the driver-collected (centroid_id, centroid, cnorm)
    rows of the coarse quantizer — the standard broadcast-model
    streaming-enrichment pattern (same shape as the LM-filter models)."""
    emb = _with_norm(emb_stream)
    cands = []
    for c in centroids:
        cvec = F.array(*[F.lit(float(x)) for x in c.centroid])
        csim = _dot(F.col("embedding"), cvec) / (
            F.col("norm") * F.lit(float(c.cnorm))
        )
        cands.append(
            F.struct(
                csim.alias("csim"),
                F.lit(-int(c.centroid_id)).cast("long").alias("neg_cid"),
            )
        )
    best = F.array_max(F.array(*cands))
    return emb.select(
        "vec_id",
        (-best.getField("neg_cid")).alias("centroid_id"),
        best.getField("csim").alias("csim"),
    )


def centroid_assign_hierarchical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registered rows-only surface for the two-level assignment: route
    the corpus against the IVF centroid budget through the G = sqrt(K)
    coarse level. Quality vs the exact path is pinned in tests."""
    emb = _with_norm(datamodel.load_table(spark, sf_dir, "embeddings"))
    cent, _ = ivf_assignments(emb)
    return assign_to_centroids_hierarchical(emb, cent)


# --- IVF + PQ composition (the billion-vector serving architecture) ----------


def ivf_pq_index(
    emb: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the composed IVFPQ index (Jegou et al. 2011, the FAISS
    IVFPQ layout): coarse-quantize every vector to an IVF list, then
    PQ-encode its RESIDUAL (x - centroid) against per-subspace residual
    codebooks. Returns (centroids, residual codebooks, codes) where codes
    carry (vec_id, centroid_id, sub, code) — the entire per-vector index
    state is the list id + PQ_M bytes + one norm float, the layout that
    keeps a billion-vector index in executor memory.

    Residuals (not raw vectors) are what PQ encodes: within one IVF cell
    vectors share the centroid's direction, so residual magnitudes are
    smaller and the fixed PQ_K code budget spends its resolution on the
    intra-cell variation — the reason the composition beats flat PQ at
    equal code size."""
    cent, assign = ivf_assignments(emb)
    res = (
        assign.join(
            F.broadcast(cent.select("centroid_id", "centroid")),
            "centroid_id",
        )
        .select(
            "vec_id",
            "centroid_id",
            F.zip_with(
                F.col("embedding"),
                F.col("centroid"),
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("embedding"),
        )
    )
    books = pq_codebooks(res.select("vec_id", "embedding"))
    codes = pq_encode(res.select("vec_id", "embedding"), books).join(
        res.select("vec_id", "centroid_id"), "vec_id"
    )
    return cent, books, codes


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ ANN: coarse probe -> residual-ADC scan of only the probed
    lists -> exact re-rank. The inner-product decomposition
    q . x = q . c + q . r  ~  q . c + sum_sub(q_sub . code_sub) makes the
    ADC term a per-(centroid, sub, code) lookup: q . c is one broadcast
    join against the centroid table, and the residual term joins the
    query's PQ_M x PQ_K partial-dot table against the codes of the
    probed lists ONLY — an equi-join on (centroid_id, sub, code), cell
    co-partitioned, scanning ~probes/K of the index (vs flat PQ's full
    code table).

    Rows-only like the other approximate ANN paths (per-engine float
    argmin in encoding has no portable SQL twin); recall vs brute force
    and re-rank exactness are pinned in tests."""
    # memoized input: the DAG references emb from five branches
    # (assignments, residuals, codes, query sample, re-rank) — without
    # the barrier each branch re-runs the scan + norm fold
    emb = shared_normed_embeddings(spark, sf_dir)
    cent, books, codes = ivf_pq_index(emb)
    return ivf_pq_search(emb, cent, books, codes)


def ivf_pq_search(
    emb: DataFrame, cent: DataFrame, books: DataFrame, codes: DataFrame
) -> DataFrame:
    """The IVFPQ SERVING path against a prebuilt index — split out of
    `ann_ivf_pq_topk` so index construction (train/encode, an offline
    batch job at 100 TB) and query latency (the online path) can be
    measured and reasoned about separately (bench.py reports
    ann_ivf_pq_build / ann_ivf_pq_search)."""
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    qprobe = assign_to_centroids(q, cent, probes=IVF_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        "centroid_id",
    )
    # q . c term per probed list (broadcast, exact)
    qc = qprobe.join(
        F.broadcast(cent.select("centroid_id", "centroid")), "centroid_id"
    ).select(
        "query_id",
        "qn",
        "centroid_id",
        _dot(F.col("qe"), F.col("centroid")).alias("qc_dot"),
    )
    # residual term: raw query subvectors x residual codebooks
    qparts = (
        _subspaces(
            qprobe.select(
                "query_id", "centroid_id", F.col("qe").alias("embedding")
            )
        )
        .join(F.broadcast(books), "sub")
        .select(
            "query_id",
            "centroid_id",
            "sub",
            "code",
            _dot(F.col("svec"), F.col("cvec")).alias("pdot"),
        )
    )
    adc = (
        qparts.join(codes, ["centroid_id", "sub", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "centroid_id", "vec_id")
        .agg(F.sum("pdot").alias("res_dot"))
        .join(qc, ["query_id", "centroid_id"])
        .join(emb.select("vec_id", F.col("norm").alias("cn_pool")), "vec_id")
        .withColumn(
            "adc_cos",
            (F.col("qc_dot") + F.col("res_dot"))
            / (F.col("qn") * F.col("cn_pool")),
        )
    )
    wpool = W.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), F.asc("vec_id")
    )
    pool = (
        adc.withColumn("rk", F.row_number().over(wpool))
        .filter(F.col("rk") <= PQ_RERANK_POOL)
        .select("query_id", "qn", F.col("vec_id").alias("neighbor_id"))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    wtop = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pool.join(c, "neighbor_id")
        .join(qe, "query_id")
        .withColumn("cosine", F.round(sim, 6))
        .withColumn("posicao", F.row_number().over(wtop))
        .filter(F.col("posicao") <= TOP_K)
        .select("query_id", "posicao", "neighbor_id", "cosine")
    )


def pq_train(vectors: DataFrame, iterations: int = 2) -> DataFrame:
    """Per-subspace Lloyd refinement of the hash-sampled PQ codebooks —
    the training step `pq_codebooks` seeds (same promise/delivery split
    as ivf_assignments/ivf_train), expressed as joins + groupBy:

    per iteration, per subspace INDEPENDENTLY:
      1. encode every sub-vector against the current codes (pq_encode's
         partial-aggregate argmin);
      2. recompute each (sub, code) cell as the elementwise mean of its
         assigned sub-vectors — groupBy (sub, code, pos), PQ_M x PQ_K x
         PQ_SUB_DIM groups, tiny at any corpus size.

    Empty cells keep their previous code vector (standard Lloyd
    handling); per-subspace training is embarrassingly parallel because
    PQ quantizes subspaces independently (Jegou et al. 2011 §III).
    `vectors` is whatever the codes will encode — raw embeddings for
    flat PQ, residuals for IVFPQ. Returns the refined (sub, code, cvec)
    codebook frame; Lloyd monotonicity on the quantization error is
    pinned in tests."""
    books = pq_codebooks(vectors)
    subs = _subspaces(vectors.select("vec_id", "embedding"))
    for _ in range(iterations):
        enc = (
            subs.join(F.broadcast(books), "sub")
            .withColumn(
                "d2",
                F.aggregate(
                    F.zip_with(
                        F.col("svec"),
                        F.col("cvec"),
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .groupBy("vec_id", "sub")
            .agg(F.min(F.struct("d2", "code", "svec")).alias("m"))
            .select("sub", F.col("m.code").alias("code"),
                    F.col("m.svec").alias("svec"))
        )
        means = (
            enc.select(
                "sub", "code", F.posexplode("svec").alias("pos", "val")
            )
            .groupBy("sub", "code", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cvec")
            )
        )
        kept = books.join(
            means.select("sub", "code"), ["sub", "code"], "left_anti"
        )
        books = (
            means.select("sub", "code", "cvec")
            .unionByName(kept)
            .localCheckpoint(eager=True)
        )
    return books


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-as-a-query: top-1 and top-K recall of every registered
    approximate ANN path against the brute-force baseline, one row per
    method — the index-tuning report an ANN deployment watches when
    turning the probes/planes/codebook knobs.

    All five result sets are DataFrames, so the whole evaluation is a
    union of per-method (anti-)join aggregates — no driver-side set
    math; at scale each leg is the method's own query cost plus a
    (query_id, neighbor_id)-keyed join against the baseline. Rows-only
    (the legs are rows-only themselves); invariants (recall in [0, 1],
    brute force scores 1.0 against itself) are pinned in tests."""
    brute = ann_cosine_topk(spark, sf_dir).select(
        "query_id", "posicao", "neighbor_id"
    ).cache()
    methods = [
        ("brute_force", brute),
        ("lsh", ann_lsh_topk(spark, sf_dir)),
        ("ivf", ann_ivf_topk(spark, sf_dir)),
        ("pq", ann_pq_topk(spark, sf_dir)),
        ("ivf_pq", ann_ivf_pq_topk(spark, sf_dir)),
    ]
    legs = []
    b1 = brute.filter(F.col("posicao") == 1).select(
        "query_id", "neighbor_id"
    )
    bk = brute.select("query_id", "neighbor_id")
    n_q = F.countDistinct("query_id")
    for name, df in methods:
        m1 = df.filter(F.col("posicao") == 1).select(
            "query_id", "neighbor_id"
        )
        mk = df.select("query_id", "neighbor_id")
        top1 = (
            b1.join(m1, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").alias("hit1"))
            .crossJoin(b1.agg(n_q.alias("nq")))
        )
        topk = (
            bk.join(mk, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").alias("hitk"))
            .crossJoin(bk.agg(F.count("*").alias("nk")))
        )
        legs.append(
            top1.crossJoin(topk).select(
                F.lit(name).alias("metodo"),
                F.round(
                    F.col("hit1").cast("double") / F.col("nq").cast("double"),
                    6,
                ).alias("recall_top1"),
                F.round(
                    F.col("hitk").cast("double") / F.col("nk").cast("double"),
                    6,
                ).alias("recall_topk"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    # materialize the 5-row report, then release the baseline cache —
    # returning the lazy plan would pin `brute` for the session
    rows = out.collect()
    brute.unpersist()
    return spark.createDataFrame(rows, out.schema)
