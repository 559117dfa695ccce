"""IVF approximate nearest neighbor — trained coarse quantizer over the
embedding column (the scale path beyond deterministic sign-LSH).

IVF(-flat): k-means the corpus into nlist coarse cells; each vector is
indexed under its nearest centroid; a query scores only the vectors in
its nprobe nearest cells. Candidate generation is an equi-join on the
cell id — the same shuffle-shape as similarity_topk_lsh, but with
*learned* cells that adapt to the data distribution (higher recall per
probed candidate than fixed hyperplanes).

KMeans training is not SQL-expressible, so this registers with NO oracle
(rows-only driver check, per the __spark_entry__ contract for iterative
algorithms); recall against the brute-force truth is asserted in
tests/test_ann.py instead.

Scale: training samples the corpus (kmeans on a fraction is standard —
centroid quality degrades slowly with sampling); assignment is one
broadcast of nlist×dim floats; the probe join shuffles only cell ids and
candidates, never all-pairs. At 100 TB: persist the centroid table and
the cell-assigned corpus as a bucketed table keyed on cell id, making
every later query a pruned scan + local re-rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.operators.similarity import N_QUERIES, TOPK, _dot, _norm
from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

NLIST = 16  # coarse cells
NPROBE = 4  # cells scored per query
SEED = 42


def _assignments(spark: SparkSession, sf_dir: str):
    """(vec_id, embedding, cell) + the fitted centroid list."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings")
    feats = emb.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    km = KMeans(k=NLIST, seed=SEED, maxIter=10, featuresCol="features", predictionCol="cell")
    model = km.fit(feats)
    assigned = model.transform(feats).select("vec_id", "embedding", "cell")
    return assigned, model.clusterCenters()


@register("similarity_topk_ivf", None, doc=f"IVF({NLIST},nprobe={NPROBE}) cosine top-{TOPK} (trained quantizer)")
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queries probe their NPROBE nearest cells; scoring joins on the cell
    id. The probe list is built driver-side from the centroid matrix
    (nlist×dim floats — constant size, independent of corpus scale)."""
    import numpy as np

    assigned, centers = _assignments(spark, sf_dir)
    centers = np.asarray(centers)

    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # nprobe cells per query, computed from the centroid matrix: the rows
    # here are (query_id, cell) pairs — N_QUERIES×NPROBE rows, broadcast.
    q_rows = q.collect()  # N_QUERIES rows — the query SET is small by contract
    probe_pairs = []
    for r in q_rows:
        v = np.asarray(r["q_emb"], dtype=np.float64)
        d = ((centers - v) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:NPROBE]:
            probe_pairs.append((r["query_id"], int(cell)))
    probes = spark.createDataFrame(probe_pairs, "query_id long, cell int")

    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v_emb"))
        .join(F.broadcast(q), "query_id")
    )
    cos = _dot(F.col("q_emb"), F.col("v_emb")) / (_norm(F.col("q_emb")) * _norm(F.col("v_emb")))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )
