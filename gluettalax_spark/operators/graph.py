"""Iterative graph operators — near-dup pairs → duplicate CLUSTERS.

A dedup pipeline doesn't stop at pairs: (a,b) and (b,c) must collapse into
one group with one canonical keeper. That's connected components over the
similarity graph — the canonical iterative-algorithm workload a training-
data pipeline runs after MinHash/SimHash candidate generation.

The reference has no graph code (its only iteration is service polling,
``gluettalax.py:220-224``); this is part of the LLM-pipeline extension
surface (BASELINE.json north star).

Scale design: label propagation by repeated min-join. Each round is one
shuffled join + aggregate; rounds needed = graph diameter (near-dup
clusters are shallow — a handful). Lineage is cut per round with
``localCheckpoint`` (cluster analog: checkpoint to storage) so the plan
doesn't grow with iterations. At extreme scale, swap the loop body for the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same join primitive, provably fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.operators.dedup import _NGRAM_ORACLE, dedup_ngram_jaccard
from gluettalax_spark.registry import register

_MAX_ROUNDS = 25


def connected_components(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Pure DataFrame iteration — no RDDs, no collect of data
    (only a 1-row convergence count per round crosses to the driver).
    """
    sym = edges.selectExpr(f"{src} AS u", f"{dst} AS v").unionByName(
        edges.selectExpr(f"{dst} AS u", f"{src} AS v")
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_MAX_ROUNDS):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("lab").alias("component"))


_CC_ORACLE = f"""
WITH RECURSIVE {_NGRAM_ORACLE.strip().split("WITH", 1)[1].rsplit("SELECT doc_a", 1)[0].rstrip().rstrip(")").rstrip()}
),
pairs AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
verts AS (SELECT DISTINCT u AS doc FROM edges),
reach(doc, lab) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
),
comp AS (
  SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component
  FROM reach GROUP BY doc
)
SELECT
  c.doc_id,
  c.component,
  s.cluster_size,
  CASE WHEN c.doc_id = c.component THEN TRUE ELSE FALSE END AS is_keeper
FROM comp c
JOIN (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component) s
  USING (component)
ORDER BY c.component, c.doc_id
"""


@register(
    "dedup_clusters",
    _CC_ORACLE,
    doc="connected components over near-dup pairs → cluster id + keeper flag",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (blocked n-gram Jaccard ≥ 0.3) → connected
    components via iterative min-label propagation. The oracle replays the
    exact semantics with a recursive CTE (transitive closure + min) —
    different algorithm, identical fixpoint, which is the point: the
    result is algorithm-independent."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (F.col("doc_id") == F.col("component")).alias("is_keeper"),
        )
        .orderBy("component", "doc_id")
    )
