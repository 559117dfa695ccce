"""Semantic clustering + semantic dedup over ``embeddings`` —
distributed Lloyd's k-means expressed as ordinary DataFrame aggregations,
then SemDeDup-style cluster-local near-duplicate detection.

Why this exists: near-dup detection by *meaning* (paraphrases, re-encodes,
translations) can't come from shingle overlap; the production recipe
(SemDeDup, Abbas et al. 2023) is (1) k-means the embedding space, then
(2) search for high-cosine pairs ONLY within a cluster. Step 2's candidate
generation is an equi-join on the cluster id — the same bucketed-join
shape as the MinHash/SimHash band joins in
:mod:`gluettalax_spark.operators.dedup`.

Scale design (100 TB):

* **Assignment is zero-shuffle.** Centroids are a k×d constant — they
  ride a broadcast join; every partition scores its local vectors
  against all k centroids and picks the argmin with one
  ``min(struct(dist, cluster_id))`` aggregation per vector (no window).
* **The Lloyd update is one groupBy.** Per-component sums via
  ``posexplode`` → ``groupBy(cluster, pos)`` — N·d rows through a
  (k·d)-key shuffle, then a k-row array re-assembly. Nothing driver-side
  except the k×d centroid table itself (constant size, like the IVF
  centroid matrix in :mod:`gluettalax_spark.operators.ann`).
* **Cross-engine exactness without float-order luck.** Distributed
  ``sum(double)`` is order-dependent, so the centroid update quantizes
  each component to an exact integer first: ``floor(x·2³⁰)`` is exact
  IEEE arithmetic (a power-of-two scale only shifts the exponent), and
  integer sums are order-independent. Both engines then divide the same
  integers — bit-identical centroids, so the DuckDB oracle replays the
  whole 2-iteration refinement exactly. Distances fold sequentially
  (``F.aggregate`` ↔ ``list_sum(list_transform(...))``) like the
  similarity family, and comparisons order by the ROUNDED distance with
  a cluster-id tiebreak, so argmin never depends on sub-ulp noise.
* **Cluster-local pair join is capped.** k is fixed per run (here 8;
  production ~100k, chosen ∝ corpus size), so one mega-cluster would
  make the pair join quadratic — the band-bucket cap from
  :func:`gluettalax_spark.operators.dedup._cap_band_buckets` degrades
  over-cap clusters to verified star pairs, same contract as the
  MinHash/fuzzy joins.

Reference parity: the reference engine (``/root/reference``) has no
embedding ops at all — this module is part of the LLM-training-data
surface the brief adds on top (SURVEY.md §2 F-north).
"""

from __future__ import annotations

from gluettalax_spark.memory import CKPT_LEVEL

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.operators.dedup import MAX_BAND_BUCKET, _cap_band_buckets
from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

DIM = 64
# Seed clusters: vec_id 0..K-1 (deterministic init). SemDeDup chooses
# k ∝ corpus size (≈√N keeps the cluster-local pair join ~linear); the
# oracle replays the same K, so the constant is part of the algorithm
# spec. K=8 on the near-orthogonal fixture: seed-based assignment is
# skewed enough that larger K was measured to add assignment cost
# without shrinking the pair join.
K = 8
CSCALE = 1 << 30      # exact power-of-two quantizer for centroid sums
# Pair-scoring quantizer: 2^20 keeps a 64-dim int dot ≤ 2^46 (int64- and
# double-exact); centroids use the finer CSCALE because they only sum.
QSCALE = 1 << 20
# Fixture embeddings are near-orthogonal (max pairwise cosine ≈ 0.51);
# the dedup threshold sits where the fixture has pairs. Real corpora: ~0.95.
SEMDEDUP_COS = 0.45


def _sqdist(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 — same left-to-right summation as the
    oracle's ``list_sum``, so both engines produce the identical double."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _seed_centroids(emb: DataFrame) -> DataFrame:
    """(cluster_id, c_emb) — the first K vectors by vec_id. Deterministic
    k-means++-free init keeps the oracle replayable; swap in sampled or
    pre-trained centroids at production scale (same plan)."""
    return emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("c_emb")
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Append (cluster_id, dist) = nearest centroid by squared L2.

    Broadcast-crossJoin the k-row centroid table, then ONE aggregation
    ``min(struct(dist, cluster_id))`` per vector — no window, no extra
    shuffle beyond the groupBy on vec_id (which AQE coalesces; at scale
    this is the narrowest possible reduction: k candidate rows per key).
    Distances are rounded to 4 dp BEFORE the argmin so the winner never
    depends on sub-ulp float noise; ties break on cluster_id — identical
    to the oracle's ``ORDER BY dist, cluster_id``."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        F.struct(
            F.round(_sqdist(F.col("embedding"), F.col("c_emb")), 4).alias("dist"),
            F.col("cluster_id"),
        ).alias("_cand"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min("_cand").alias("_best"), F.first("embedding").alias("embedding")
    )
    return best.select(
        "vec_id",
        "embedding",
        F.col("_best.cluster_id").alias("cluster_id"),
        F.col("_best.dist").alias("dist"),
    )


def lloyd_update(assigned: DataFrame) -> DataFrame:
    """One exact Lloyd centroid update: mean of member vectors per
    cluster, with components quantized to ``floor(x·2³⁰)`` integers so
    the distributed sum is order-independent (see module docstring).

    posexplode → groupBy(cluster, pos) → sorted re-assembly. The
    collect_list here holds exactly DIM entries per cluster (never data-
    sized); the output is k rows."""
    comp = assigned.select(
        "cluster_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "cluster_id",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(float(CSCALE))).cast("long").alias("q"),
    )
    means = comp.groupBy("cluster_id", "pos").agg(
        (F.sum("q").cast("double") / (F.count(F.lit(1)) * F.lit(float(CSCALE)))).alias("c")
    )
    return means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("c_emb")
    )


# --------------------------------------------------------------------------
# Oracle SQL building blocks
# --------------------------------------------------------------------------

def _duck_sqdist(v: str, c: str) -> str:
    """Sequential-fold squared L2 in DuckDB, 1-based list indexing."""
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
        f"(CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
        f" * (CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))))"
    )


_DUCK_SEEDS = f"""
seeds AS (
  SELECT vec_id AS cluster_id, embedding AS c_emb
  FROM embeddings WHERE vec_id < {K}
)
"""

_DUCK_ASSIGN1 = f"""
scored1 AS (
  SELECT v.vec_id, s.cluster_id,
         round({_duck_sqdist('v.embedding', 's.c_emb')}, 4) AS dist
  FROM embeddings v CROSS JOIN seeds s
),
a1 AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM scored1
),
assign1 AS (SELECT vec_id, cluster_id, dist FROM a1 WHERE rn = 1)
"""


_ASSIGN_ORACLE = f"""
WITH {_DUCK_SEEDS.strip()},
{_DUCK_ASSIGN1.strip()}
SELECT vec_id, cluster_id, dist FROM assign1 ORDER BY vec_id
"""


@register(
    "semantic_cluster_assign",
    _ASSIGN_ORACLE,
    doc=f"nearest-of-{K}-seed-centroids assignment (squared L2, broadcast argmin)",
)
def semantic_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment step against the deterministic seed centroids.
    Plan: broadcast nested-loop of a k-row constant + one groupBy —
    nothing data-sized shuffles except the vec_id reduction itself."""
    emb = load(spark, sf_dir, "embeddings")
    out = assign_clusters(emb.select("vec_id", "embedding"), _seed_centroids(emb))
    return out.select("vec_id", "cluster_id", "dist").orderBy("vec_id")


_REFINE_ORACLE = f"""
WITH {_DUCK_SEEDS.strip()},
{_DUCK_ASSIGN1.strip()},
comp AS (
  SELECT a.cluster_id, i.i AS pos,
         CAST(floor(CAST(v.embedding[i.i] AS DOUBLE) * {CSCALE}) AS BIGINT) AS q
  FROM assign1 a
  JOIN embeddings v USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS i) i
),
cent2 AS (
  SELECT cluster_id, pos,
         CAST(sum(q) AS DOUBLE) / (count(*) * {CSCALE}.0) AS c
  FROM comp GROUP BY cluster_id, pos
),
cent2v AS (
  SELECT cluster_id, list(c ORDER BY pos) AS c_emb
  FROM cent2 GROUP BY cluster_id
),
scored2 AS (
  SELECT v.vec_id, s.cluster_id,
         round({_duck_sqdist('v.embedding', 's.c_emb')}, 4) AS dist
  FROM embeddings v CROSS JOIN cent2v s
),
a2 AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM scored2
)
SELECT vec_id, cluster_id, dist FROM a2 WHERE rn = 1 ORDER BY vec_id
"""


@register(
    "semantic_cluster_refine",
    _REFINE_ORACLE,
    doc="one full Lloyd iteration (exact quantized update) + reassignment",
)
def semantic_cluster_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assign(seeds) → exact centroid update → reassign. Every seed
    cluster is non-empty by construction (its seed vector is at distance
    0 from itself), so no empty-cluster repair branch is needed. Further
    Lloyd iterations are the same two lines in a loop — the oracle pins
    one full round, which exercises every moving part."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a1 = assign_clusters(emb, _seed_centroids(load(spark, sf_dir, "embeddings")))
    cent2 = lloyd_update(a1)
    a2 = assign_clusters(emb, cent2)
    return a2.select("vec_id", "cluster_id", "dist").orderBy("vec_id")


# Pair scoring is integer-quantized (floor(x·2²⁰) — exact IEEE scale
# shift) so the dot product is an ORDER-INDEPENDENT int sum: Spark can
# score cliques with a vectorized numpy int64 matmul and still match
# this SQL (and any other engine) bit-for-bit; ≤ 2^46 fits double-exact.
_SEMDEDUP_ORACLE = f"""
WITH {_DUCK_SEEDS.strip()},
{_DUCK_ASSIGN1.strip()},
members AS (
  SELECT a.vec_id, a.cluster_id,
         list_transform(v.embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE}.0) AS BIGINT)) AS qe
  FROM assign1 a JOIN embeddings v USING (vec_id)
),
-- the over-cap degradation is part of the operator SPEC: clusters wider
-- than the band cap emit only star pairs around their min vec_id
-- (engaged from sf1.0 up; round-7 lesson — caps replay in the oracle)
sizes AS (
  SELECT cluster_id, count(*) AS bucket_n, min(vec_id) AS rep
  FROM members GROUP BY cluster_id
),
normed AS (
  SELECT vec_id, cluster_id, qe,
         sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm
  FROM members
),
pairs AS (
  SELECT x.cluster_id, x.vec_id AS vec_a, y.vec_id AS vec_b,
         round(
           CAST(list_sum(list_transform(range(1, {DIM + 1}),
             i -> x.qe[i] * y.qe[i])) AS DOUBLE)
           / (x.nrm * y.nrm), 4) AS cosine
  FROM normed x
  JOIN normed y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
  JOIN sizes s ON s.cluster_id = x.cluster_id
  WHERE s.bucket_n <= {MAX_BAND_BUCKET} OR x.vec_id = s.rep
)
SELECT cluster_id, vec_a, vec_b, cosine
FROM pairs WHERE cosine >= {SEMDEDUP_COS}
ORDER BY cluster_id, vec_a, vec_b
"""


@register(
    "semantic_dedup",
    _SEMDEDUP_ORACLE,
    doc=f"SemDeDup: cluster-local cosine near-dup pairs (cos ≥ {SEMDEDUP_COS})",
)
def semantic_dedup(
    spark: SparkSession, sf_dir: str, max_bucket: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Candidate pairs ONLY within a k-means cluster: the pair join is an
    equi-join on cluster_id, never all-pairs. Because k is FIXED per run,
    the bucket cap is load-bearing (same argument as
    text_fuzzy_prefix_pairs): an over-cap cluster degrades to verified
    star pairs around its min vec_id instead of a quadratic clique (the
    fixture stays under the cap through sf0.1, so the oracle replays the
    exact clique output).

    Scoring is INTEGER-QUANTIZED and vectorized: vectors become
    floor(x·2²⁰) longs (an exact IEEE scale shift), so the pairwise dot
    is an order-independent int64 sum — which lets the within-cluster
    clique be scored as ONE numpy int matmul per cluster group
    (applyInPandas keyed on cluster_id; group size is bounded by the cap,
    so the matrix is ≤ cap² — bounded memory per task) while remaining
    bit-identical to the oracle's sequential SQL fold and to the
    JVM-side fold used for the star pairs. The earlier float form needed
    a per-pair interpreted 64-element array fold — ~2× the runtime at
    sf0.1 with zero cross-engine-exactness benefit."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a1 = assign_clusters(emb, _seed_centroids(load(spark, sf_dir, "embeddings")))
    qe = F.expr(f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE}.0) AS BIGINT))")
    members = a1.select(
        "vec_id", "cluster_id", qe.alias("qe")
    ).persist(CKPT_LEVEL)

    kept, star, _spill = _cap_band_buckets(members, ["cluster_id"], "vec_id", max_bucket)

    def clique_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"cluster_id": [], "vec_a": [], "vec_b": [], "cosine": []})
        pdf = pdf.sort_values("vec_id")
        Q = np.asarray(pdf["qe"].tolist(), dtype=np.int64)      # (n, DIM)
        ids = pdf["vec_id"].to_numpy()
        G = Q @ Q.T                                             # exact int64
        nrm = np.sqrt(np.diag(G).astype(np.float64))
        iu, ju = np.triu_indices(n, k=1)
        cos = np.round(G[iu, ju].astype(np.float64) / (nrm[iu] * nrm[ju]), 4)
        keep = cos >= SEMDEDUP_COS
        return pd.DataFrame(
            {
                "cluster_id": pdf["cluster_id"].iloc[0],
                "vec_a": ids[iu[keep]],
                "vec_b": ids[ju[keep]],
                "cosine": cos[keep],
            }
        )

    clique = kept.groupBy("cluster_id").applyInPandas(
        clique_pairs, "cluster_id long, vec_a long, vec_b long, cosine double"
    )

    # Star pairs from over-cap clusters: re-fetch quantized vectors by id
    # and score with the SAME int arithmetic, JVM-side (star volume is
    # linear in the bucket, no matmul needed).
    qa = members.select(
        F.col("vec_id").alias("_star_a"), F.col("cluster_id"), F.col("qe").alias("qe_a")
    )
    qb = members.select(F.col("vec_id").alias("_star_b"), F.col("qe").alias("qe_b"))
    idot = F.aggregate(
        F.zip_with(F.col("qe_a"), F.col("qe_b"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inrm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x * x).cast("double")
    )
    star_scored = (
        star.join(qa, "_star_a")
        .join(qb, "_star_b")
        .select(
            "cluster_id",
            F.col("_star_a").alias("vec_a"),
            F.col("_star_b").alias("vec_b"),
            F.round(idot.cast("double") / (inrm(F.col("qe_a")) * inrm(F.col("qe_b"))), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDEDUP_COS)
    )

    return clique.unionByName(star_scored).orderBy("cluster_id", "vec_a", "vec_b")


# --------------------------------------------------------------------------
# Simplified silhouette score per cluster (clustering-quality readout)
# --------------------------------------------------------------------------

_SILHOUETTE_ORACLE = f"""
WITH {_DUCK_SEEDS.strip()},
scored1 AS (
  SELECT v.vec_id, s.cluster_id,
         round({_duck_sqdist('v.embedding', 's.c_emb')}, 4) AS dist
  FROM embeddings v CROSS JOIN seeds s
),
ranked AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM scored1
),
ab AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cluster_id END) AS cluster_id,
         max(CASE WHEN rn = 1 THEN dist END) AS a,
         max(CASE WHEN rn = 2 THEN dist END) AS b
  FROM ranked WHERE rn <= 2 GROUP BY vec_id
),
s AS (
  SELECT cluster_id,
         CAST(round(a * 10000.0) AS BIGINT) AS a_e4,
         CASE WHEN greatest(a, b) = 0 THEN 0
              ELSE CAST(floor(1000000.0 * ((b - a) / greatest(a, b))) AS BIGINT)
         END AS s_e6
  FROM ab
)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(s_e6) AS BIGINT) AS sum_s_e6,
       round(CAST(sum(s_e6) AS DOUBLE) / count(*) / 1000000.0, 6) AS silhouette,
       round(CAST(sum(a_e4) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_intra_dist
FROM s
GROUP BY cluster_id
ORDER BY cluster_id
"""


@register(
    "similarity_silhouette",
    _SILHOUETTE_ORACLE,
    doc="simplified silhouette (centroid-based) per seed cluster — clustering quality",
)
def similarity_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (Hruschka et al.): per point,
    s = (b − a)/max(a, b) with a = distance to the OWN centroid and
    b = distance to the nearest OTHER centroid — the O(N·k) form of the
    O(N²) classic, the only one that exists at corpus scale. Rolled up
    per cluster: the standard "which clusters are real" readout over
    `semantic_cluster_assign`'s seed clustering (near-orthogonal fixture
    ⇒ weak clusters ⇒ silhouette near 0, except the seeds themselves —
    a=0, s=1 — which the unit test pins).

    Exactness: a and b reuse the assignment's rounded-to-4dp distances
    and (dist, cluster_id) comparator (sub-ulp-noise-free); each point's
    s floor-quantizes to 1e-6 BEFORE the sum (the PSI recipe), so
    ``sum_s_e6`` is an exact integer; the per-cluster means are single
    IEEE divisions.

    Scale: the k-row centroid table broadcasts; per-vector work is one
    k-element sorted collect (k ≤ 8 here, ~100k in production — still a
    bounded aggregate); one cluster-grain rollup. No window over data."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = _seed_centroids(emb)
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.struct(
            F.round(_sqdist(F.col("embedding"), F.col("c_emb")), 4).alias("dist"),
            F.col("cluster_id"),
        ).alias("cand"),
    )
    ab = (
        scored.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list("cand")).alias("cands"))
        .select(
            F.col("cands")[0]["cluster_id"].alias("cluster_id"),
            F.col("cands")[0]["dist"].alias("a"),
            F.col("cands")[1]["dist"].alias("b"),
        )
    )
    s = ab.select(
        "cluster_id",
        F.expr("CAST(round(a * 10000.0) AS BIGINT)").alias("a_e4"),
        F.expr(
            "CASE WHEN greatest(a, b) = 0 THEN 0"
            " ELSE CAST(floor(1000000.0 * ((b - a) / greatest(a, b))) AS BIGINT) END"
        ).alias("s_e6"),
    )
    return (
        s.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("s_e6").cast("long").alias("sum_s_e6"),
            F.round(F.sum("s_e6").cast("double") / F.count(F.lit(1)) / 1000000.0, 6).alias(
                "silhouette"
            ),
            F.round(F.sum("a_e4").cast("double") / F.count(F.lit(1)) / 10000.0, 4).alias(
                "avg_intra_dist"
            ),
        )
        .orderBy("cluster_id")
    )
